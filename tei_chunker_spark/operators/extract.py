"""The extraction stage: interleaved-span documents -> ordered output spans.

Physical plan (see SURVEY.md §4.3):

    Scan -> Project(doc_id, spans) -> Exchange(hash(salt), P) ->
    MapInPandas(extract) -> Sink

One wide dependency total.  The shuffle key is a salt derived from doc_id
(``pmod(xxhash64(doc_id), P)``) rather than doc_id itself: with 10^12 rows
the *count* per partition is uniform either way, but routing through an
explicit narrow-domain salt keeps the partitioning reusable (the same
bucket id doubles as the checkpoint/resume key in the manifest) and is the
documented defense against per-row cost skew — oversized papers land in
different buckets, and small Arrow batches bound how long one straggler
document can hold a batch (AQE cannot see inside the Python stage, so this
must be explicit; SURVEY.md §4.2).

The Python stage is the sanctioned vectorized path: data crosses the
JVM<->Python boundary in columnar Arrow batches via ``mapInPandas``; the
per-document parse is necessarily scalar inside the batch loop (the
reference semantics are a whole-document fold — reference chunking.py:185-265),
but there is no row-at-a-time ``udf()`` anywhere.
"""
from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ChunkerConfig, JobConfig
from ..core import extract_spans

SPAN_SCHEMA_DDL = "doc_id string, offset int, kind string, text string, media_ref string"


def make_batch_extractor(cfg: ChunkerConfig):
    """Arrow-batch extraction fn for ``mapInPandas`` (1 doc row -> N span rows)."""

    def extract_batches(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            doc_ids, offsets, kinds, texts, refs = [], [], [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                span_tuples = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
                ]
                for sp in extract_spans(doc_id, span_tuples, cfg):
                    doc_ids.append(sp.doc_id)
                    offsets.append(sp.offset)
                    kinds.append(sp.kind)
                    texts.append(sp.text)
                    refs.append(sp.media_ref)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "offset": pd.array(offsets, dtype="int32"),
                    "kind": kinds,
                    "text": texts,
                    "media_ref": refs,
                }
            )

    return extract_batches


def salt_column(num_partitions: int, col: str = "doc_id") -> Column:
    """Salt bucket for shuffle + checkpoint granularity."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(num_partitions)).cast("int")


def extract_pipeline(df: DataFrame, job: JobConfig) -> DataFrame:
    """documents(doc_id, spans) -> spans_out(doc_id, offset, kind, text, media_ref).

    Output row order within a document is the semantic ``offset``; global
    order is undefined (it's a distributed table — verification sorts).
    """
    p = job.shuffle_partitions
    salted = (
        df.select("doc_id", "spans")
        .withColumn("_salt", salt_column(p))
        .repartition(p, "_salt")
        .drop("_salt")
    )
    return salted.mapInPandas(make_batch_extractor(job.chunker), SPAN_SCHEMA_DDL)
