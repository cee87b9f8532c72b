"""Multimodal plumbing tests: binary payload schema, Arrow-batched stub
decode determinism, and the explicit NotImplementedError boundary."""
from __future__ import annotations

import pytest

from tei_chunker_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    refs = [("d1", "fig://d1/0"), ("d1", "img://d1/2"), ("d2", "tbl://d2/1")]
    return multimodal.attach_payloads(
        spark.createDataFrame(refs, "doc_id string, media_ref string")
    )


def test_payload_schema_and_determinism(spark, media_df):
    rows = {r.media_ref: r for r in media_df.collect()}
    assert set(rows) == {"fig://d1/0", "img://d1/2", "tbl://d2/1"}
    assert rows["fig://d1/0"].media_kind == "fig"
    assert isinstance(rows["fig://d1/0"].payload, (bytes, bytearray))
    assert len(rows["fig://d1/0"].payload) == 32  # sha2-256
    again = {r.media_ref: r.payload for r in media_df.collect()}
    assert all(again[k] == rows[k].payload for k in rows)


def test_media_features_stub(spark, media_df):
    feats = {r.media_ref: r for r in multimodal.media_features(media_df).collect()}
    f = feats["img://d1/2"]
    assert f.byte_len == 32
    assert 64 <= f.feat_width <= 64 + 255 and 64 <= f.feat_height <= 64 + 255
    assert len(f.feat_checksum) == 32  # md5 hex of payload, deterministic
    # rerun -> identical (deterministic fake decode)
    again = {r.media_ref: r.feat_checksum for r in multimodal.media_features(media_df).collect()}
    assert again == {k: v.feat_checksum for k, v in feats.items()}


def test_real_decode_is_explicitly_unimplemented(media_df):
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.media_features(media_df, decode_fn=None)


def test_media_ref_pipeline_matches_filtered_extract(spark):
    """The r7 media-only projection (no chunker pass) must produce the
    exact multiset the full pipeline's kind == 'media_ref' filter does —
    including malformed-XML docs (media passthrough is unconditional)
    and NULL spans (degrade to zero rows)."""
    from tei_chunker_spark.config import ChunkerConfig, JobConfig
    from tei_chunker_spark.corpus import INPUT_SCHEMA_DDL, make_rows
    from tei_chunker_spark.operators.extract import (
        extract_pipeline,
        media_ref_pipeline,
    )

    rows = make_rows([f"mr{i}" for i in range(40)])
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    job = JobConfig(chunker=ChunkerConfig(500, 50), shuffle_partitions=8)
    full = sorted(
        (r.doc_id, r.media_ref)
        for r in extract_pipeline(df, job)
        .filter("kind = 'media_ref'")
        .select("doc_id", "media_ref")
        .collect()
    )
    narrow = sorted(
        (r.doc_id, r.media_ref) for r in media_ref_pipeline(df).collect()
    )
    assert full == narrow and len(full) > 0
