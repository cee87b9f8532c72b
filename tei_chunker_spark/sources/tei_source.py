"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
``format("tei_corpus")`` — the deterministic interleaved-span corpus as a
first-class, PARTITIONED source instead of a range+mapInPandas bolt-on.

Why a real DataSource and not just ``corpus_df``: the DataSource API is
the extension point a user of this engine reaches for when the input is a
system Spark has no connector for (an internal document store, a feed
API).  This module exercises the whole surface — schema declaration,
option handling, partition planning (each ``InputPartition`` is an
independent doc_id range, so the scan parallelizes and would distribute
across executors at 100 TB), and the per-partition row iterator (plain
tuples; Spark handles Arrow conversion).

The emitted rows are byte-identical to ``corpus.make_rows`` (pinned by
tests/test_tei_source.py) — same pure-function-of-doc_id contract the
golden fixtures rely on.
"""
from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..corpus import INPUT_SCHEMA_DDL, doc_to_row


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, profile: str):
        self.start = start
        self.end = end
        self.profile = profile


class TeiCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.profile = options.get("profile", "default")

    def partitions(self):
        n = max(1, min(self.n_partitions, self.n_docs))
        step = -(-self.n_docs // n)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_docs), self.profile)
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _RangePartition):
        for d in range(partition.start, partition.end):
            row = doc_to_row(str(d), partition.profile)
            yield (
                row["doc_id"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in row["spans"]
                ],
            )


class TeiCorpusDataSource(DataSource):
    """Usage::

        spark.dataSource.register(TeiCorpusDataSource)
        df = (spark.read.format("tei_corpus")
              .option("n_docs", 1000).option("n_partitions", 32).load())
    """

    @classmethod
    def name(cls) -> str:
        return "tei_corpus"

    def schema(self) -> str:
        return INPUT_SCHEMA_DDL

    def reader(self, schema) -> TeiCorpusReader:
        return TeiCorpusReader(self.options)
