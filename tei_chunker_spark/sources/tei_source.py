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

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


class _SpanSinkCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, n_rows: int):
        self.tmp_file = tmp_file
        self.n_rows = n_rows


class SpanSinkWriter(DataSourceWriter):
    """JSONL span sink with the two-phase commit contract a real external
    sink needs: each task writes to a UNIQUE temp file and returns a
    commit message; only the DRIVER's ``commit`` publishes (atomic rename
    into place) — so a re-executed/speculated task leaves an orphan temp
    file, never a duplicate or torn output.  ``abort`` removes the temps.
    This mirrors how a JDBC/object-store sink gets effectively-once on
    top of Spark's at-least-once task execution.

    Save-mode semantics (round-3 advisory: the flag used to be ignored,
    so a second overwrite with fewer tasks left stale part files mixed
    with the new run's): ``overwrite`` clears prior part-*.jsonl and
    _SUCCESS inside ``commit`` — temps land first, the destructive step
    happens only once the new run's data is safely on disk, then the
    renames publish.  ``append`` numbers new parts after the existing
    ones so nothing is clobbered."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("span_sink requires option 'path'")

    def write(self, iterator) -> _SpanSinkCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _SpanSinkCommit(tmp, n)

    def commit(self, messages) -> None:
        messages = list(messages)  # iterated twice (tmp ownership + publish)
        os.makedirs(self.path, exist_ok=True)
        existing = sorted(
            f
            for f in os.listdir(self.path)
            if f.startswith("part-") and f.endswith(".jsonl")
        )
        start = 0
        # _tmp-*.jsonl orphans from a crashed prior run (abort never ran)
        # would otherwise accumulate forever; anything not owned by THIS
        # run's commit messages is stale.  Runs in BOTH modes — an
        # append-mode commit after a crashed prior run must reclaim the
        # crash's temps too (round-4 advisory + round-5 follow-up).
        # CONTRACT (round-6 advisory): one writer per output path at a
        # time.  A second CONCURRENT append writer's in-flight temps are
        # indistinguishable from crash orphans and would be reclaimed
        # here, failing that writer's commit at os.replace.  Serialize
        # writers per path (the job driver already does) or give each
        # writer its own path.
        ours = {os.path.basename(m.tmp_file) for m in messages}
        for f in os.listdir(self.path):
            if (
                f.startswith("_tmp-")
                and f.endswith(".jsonl")
                and f not in ours
            ):
                os.remove(os.path.join(self.path, f))
        if self.overwrite:
            for f in existing:
                os.remove(os.path.join(self.path, f))
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        elif existing:
            start = max(int(f[len("part-") : -len(".jsonl")]) for f in existing) + 1
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{start + i:05d}.jsonl")
            os.replace(m.tmp_file, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total, "parts": len(messages)}))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class SpanSinkDataSource(DataSource):
    """``df.write.format("span_sink").option("path", dir).save()`` —
    custom Python DataSource WRITER counterpart of TeiCorpusDataSource's
    reader (registration: ``spark.dataSource.register(SpanSinkDataSource)``)."""

    @classmethod
    def name(cls) -> str:
        return "span_sink"

    def writer(self, schema, overwrite: bool) -> SpanSinkWriter:
        return SpanSinkWriter(self.options, overwrite)


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
