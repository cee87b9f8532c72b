"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode/feature step STUBBED (this container ships no image/audio codecs).

What is REAL and tested here — the Spark-side plumbing that matters at
100 TB:

* schema: media rows carry ``payload: binary`` plus typed metadata
  (media_kind, byte_len), exactly how image/audio/video travel in practice
  (never materialized as Python strings on the driver);
* batching: feature extraction is ``mapInPandas`` over Arrow record
  batches, bytes stay in Arrow buffers end-to-end;
* partitioning: payload rows are salted the same way as documents so a
  few giant videos can't straggle one task.

What is FAKE and clearly marked: ``_decode_stub`` derives deterministic
pseudo-features from the payload bytes (so tests are reproducible).  Wire a
real codec by replacing ``decode_fn`` — the signature is
``bytes -> dict`` and everything else stays unchanged.  Passing
``decode_fn=None`` raises NotImplementedError at plan time, documenting the
boundary.
"""
from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "media_ref string, media_kind string, byte_len int, "
    "feat_checksum string, feat_width int, feat_height int"
)


def attach_payloads(media_refs: DataFrame) -> DataFrame:
    """(doc_id, media_ref) -> + (media_kind, payload binary).

    Payload is a deterministic pseudo-blob derived from the ref (sha2 hex
    -> binary) standing in for object-store fetch; on a real cluster this
    is a scan of the blob column / a vectorized fetch, same schema."""
    kind = F.split(F.col("media_ref"), "://").getItem(0)
    return media_refs.select(
        "doc_id",
        "media_ref",
        kind.alias("media_kind"),
        F.to_binary(F.sha2(F.col("media_ref"), 256), F.lit("hex")).alias("payload"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic FAKE decode. NOT a real codec — see module docstring."""
    digest = hashlib.md5(payload).digest()
    return {
        "feat_checksum": digest.hex(),
        "feat_width": 64 + digest[0],
        "feat_height": 64 + digest[1],
    }


FRAME_SCHEMA = "media_ref string, frame_idx int, frame_checksum string"


def media_frame_sample(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """STUB frame sampler: one media row -> N frame rows (the video
    frame-sampling shape: Arrow-batched ``mapInPandas``, per-payload
    fan-out decided by the payload itself, bytes never leave Arrow until
    the per-frame slice).

    FAKE but deterministic, like ``_decode_stub``: 'frames' are fixed
    8-byte windows of the payload and the frame count is
    ``1 + payload[0] % max_frames`` — a real codec replaces the slicing
    with actual frame extraction and everything else (schema, batching,
    fan-out, checksum audit) stays.  Checksums hash the frame's lowercase
    hex so the DuckDB oracle can reproduce them (DuckDB md5 takes VARCHAR
    only)."""

    def sample(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            refs, idxs, cks = [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                n = 1 + (b[0] % max_frames) if b else 1
                for i in range(n):
                    frame = b[i * 8 : (i + 1) * 8]
                    refs.append(ref)
                    idxs.append(i)
                    cks.append(hashlib.md5(frame.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_checksum": cks,
                }
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)


def media_features(
    media: DataFrame,
    decode_fn: Optional[Callable[[bytes], dict]] = _decode_stub,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    if decode_fn is None:
        raise NotImplementedError(
            "real media decode requires image/audio codecs not present in "
            "this environment; pass decode_fn (bytes -> dict) to enable"
        )

    def extract(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_fn(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "byte_len": pd.array(
                        [len(bytes(p)) for p in pdf["payload"]], dtype="int32"
                    ),
                    "feat_checksum": [f["feat_checksum"] for f in feats],
                    "feat_width": pd.array([f["feat_width"] for f in feats], dtype="int32"),
                    "feat_height": pd.array([f["feat_height"] for f in feats], dtype="int32"),
                }
            )

    return media.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)
