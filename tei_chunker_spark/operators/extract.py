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
from ..core import chunk_tei, section_meta

SPAN_SCHEMA_DDL = "doc_id string, offset int, kind string, text string, media_ref string"
SECTION_SCHEMA_DDL = (
    "doc_id string, section_idx int, title string, level int, "
    "length int, subsection_count int"
)


def reassembled(df: DataFrame) -> DataFrame:
    """JVM-side document reassembly: spans array -> (doc_id, xml, media).

    Converting ``array<struct>`` through Arrow into Python dicts costs more
    than the extraction itself (measured ~4x the chunker's own CPU), so the
    span plumbing stays in WholeStageCodegen: sort by offset, concatenate
    the text spans into one XML string, project the media refs into a plain
    string array.  Python then receives two flat columns — the fast Arrow
    path.  Media passthrough order (input offset order) is preserved by the
    same sort, matching core.extract_spans (FIXTURES.md §1.2)."""
    ordered = F.array_sort(
        F.col("spans"),
        lambda l, r: F.when(l["offset"] < r["offset"], -1)
        .when(l["offset"] > r["offset"], 1)
        .otherwise(0),
    )
    text_of = lambda s: s["text"]  # noqa: E731
    empty = F.array().cast("array<string>")
    return df.select(
        "doc_id",
        F.concat_ws(
            "",
            F.transform(
                F.filter(ordered, lambda s: (s["kind"] == "text") & s["text"].isNotNull()),
                text_of,
            ),
        ).alias("xml"),
        # coalesce: a NULL spans array must degrade like malformed XML does
        # (zero output spans), not crash the Python stage iterating media.
        F.coalesce(
            F.transform(
                F.filter(ordered, lambda s: s["kind"] == "media"),
                lambda s: s["media_ref"],
            ),
            empty,
        ).alias("media"),
    )


def make_batch_extractor(cfg: ChunkerConfig):
    """Arrow-batch extraction fn for ``mapInPandas`` (1 doc row -> N span rows).

    Input batches carry (doc_id, xml, media) from :func:`reassembled`; the
    whole-document fold (reference chunking.py:185-265) runs per row, text
    chunks first, then media passthrough spans — identical observable
    output to core.extract_spans (pinned by tests/test_pipeline.py)."""

    def extract_batches(batches: Iterable) -> Iterator:
        import pandas as pd

        cap = cfg.max_doc_chars
        for pdf in batches:
            doc_ids, offsets, kinds, texts, refs = [], [], [], [], []
            for doc_id, xml, media in zip(pdf["doc_id"], pdf["xml"], pdf["media"]):
                offset = 0
                chunks = [] if (cap is not None and len(xml) > cap) else chunk_tei(xml, cfg)
                for chunk in chunks:
                    doc_ids.append(doc_id)
                    offsets.append(offset)
                    kinds.append("text")
                    texts.append(chunk)
                    refs.append(None)
                    offset += 1
                for ref in media:
                    doc_ids.append(doc_id)
                    offsets.append(offset)
                    kinds.append("media_ref")
                    texts.append(None)
                    refs.append(ref)
                    offset += 1
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


def _salted(df: DataFrame, job: JobConfig) -> DataFrame:
    """The shared head of every extraction-family pipeline.

    Salt + shuffle FIRST, reassemble AFTER: the concat/sort codegen then
    runs in the p-way wide stage instead of the scan stage, whose task
    count is bounded by input splits (a handful of parquet files must not
    cap CPU parallelism).  The scan stage does nothing but read + shuffle.
    If the table is already bucketed on the salt key (Iceberg
    bucket(P, doc_id) layout), skip the shuffle entirely — at 100 TB the
    repartition would otherwise move every input byte once for nothing."""
    if job.assume_bucketed_input:
        return df.select("doc_id", "spans")
    p = job.shuffle_partitions
    return (
        df.select("doc_id", "spans")
        .withColumn("_salt", salt_column(p))
        .repartition(p, "_salt")
        .drop("_salt")
    )


def extract_pipeline(df: DataFrame, job: JobConfig) -> DataFrame:
    """documents(doc_id, spans) -> spans_out(doc_id, offset, kind, text, media_ref).

    Output row order within a document is the semantic ``offset``; global
    order is undefined (it's a distributed table — verification sorts).
    """
    return reassembled(_salted(df, job)).mapInPandas(
        make_batch_extractor(job.chunker), SPAN_SCHEMA_DDL
    )


def media_ref_pipeline(df: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, media_ref): every media span's
    ref, one row each — the media-only projection of ``extract_pipeline``.

    The full pipeline parses and chunks every document's TEXT and then a
    media-only consumer filters kind == 'media_ref', throwing the chunks
    away — at 100 TB that is a full XML-parse pass for nothing (guide
    §1.2: don't compute things you discard).  Media passthrough is
    unconditional in the chunker (reference semantics: media spans are
    emitted even when the XML is malformed and yields zero text chunks),
    and a media-only consumer ignores the offset column, so the multiset
    of (doc_id, media_ref) rows is exactly the input's media spans —
    computable as a NARROW projection: no salt shuffle, no XML reassembly,
    no Python stage.  Identity with the filtered full pipeline is pinned
    by test_media_ref_pipeline_matches_filtered_extract."""
    refs = F.coalesce(
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "media"),
            lambda s: s["media_ref"],
        ),
        F.array().cast("array<string>"),
    )
    return df.select("doc_id", F.explode(refs).alias("media_ref"))


def section_metadata_pipeline(df: DataFrame, job: JobConfig) -> DataFrame:
    """documents(doc_id, spans) -> per-document top-level section metadata.

    Parity surface for the reference service's JSON ``sections`` response
    array (reference service.py:37-44): one output row per top-level
    section — (doc_id, section_idx, title, level, length,
    subsection_count), length = direct content only.  Same physical shape
    as extract_pipeline: scan -> one salted exchange -> mapInPandas."""
    salted = _salted(df, job)
    cap = job.chunker.max_doc_chars

    def meta_batches(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            doc_ids, idxs, titles, levels, lengths, counts = [], [], [], [], [], []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                rows = [] if (cap is not None and len(xml) > cap) else section_meta(xml)
                for i, title, level, length, n_subs in rows:
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    titles.append(title)
                    levels.append(level)
                    lengths.append(length)
                    counts.append(n_subs)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "section_idx": pd.array(idxs, dtype="int32"),
                    "title": titles,
                    "level": pd.array(levels, dtype="int32"),
                    "length": pd.array(lengths, dtype="int32"),
                    "subsection_count": pd.array(counts, dtype="int32"),
                }
            )

    # select() before the Python stage: the section walk never reads the
    # media array, and the projection lets Catalyst prune the media
    # filter/transform out of the plan AND off the Arrow wire.
    return (
        reassembled(salted)
        .select("doc_id", "xml")
        .mapInPandas(meta_batches, SECTION_SCHEMA_DDL)
    )
