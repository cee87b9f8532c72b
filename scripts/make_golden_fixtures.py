"""Precompute golden outputs for the extraction-family DuckDB oracles.

The interleaved corpus is a pure function of doc_id (corpus.doc_to_row),
so the exact expected output of the Spark extraction pipeline is
computable ahead of time with the pure-Python core (whose behavior is
itself pinned char-for-char to the reference by scripts/parity_check.py).
This script materializes those expectations as parquet fixtures that the
``oracle_sql()`` strings read back via DuckDB ``read_parquet`` — closing
the "no_oracle" gap for the whole-document-fold queries that plain SQL
cannot express.

Fixtures (checked in, zstd, covering doc_ids 0..4999 = the sf0.1 superset;
oracle SQL joins against the per-SF ``documents`` view to restrict):

* tests/fixtures/golden_spans.parquet          — extract_spans per doc
  (flagship config max_chunk_size=500, overlap_size=50)
* tests/fixtures/golden_sections.parquet       — section_meta per doc
* tests/fixtures/golden_media_features.parquet — media payload stub
  features per media_ref

Regenerate after ANY semantic change to core.py / corpus.py / the
flagship config: python scripts/make_golden_fixtures.py
"""
from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tei_chunker_spark.config import ChunkerConfig  # noqa: E402
from tei_chunker_spark.core import extract_spans, section_meta  # noqa: E402
from tei_chunker_spark.corpus import doc_to_row  # noqa: E402
from tei_chunker_spark.operators.multimodal import _decode_stub  # noqa: E402

N_DOCS = 5000  # sf0.1 doc_id domain (0..4999); smaller SFs are prefixes
FLAGSHIP_CFG = ChunkerConfig(max_chunk_size=500, overlap_size=50)
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    span_cols = {k: [] for k in ("doc_id", "offset", "kind", "text", "media_ref")}
    sec_cols = {
        k: []
        for k in ("doc_id", "section_idx", "title", "level", "length", "subsection_count")
    }
    med_cols = {
        k: []
        for k in (
            "doc_id",
            "media_ref",
            "media_kind",
            "byte_len",
            "feat_checksum",
            "feat_width",
            "feat_height",
        )
    }

    for i in range(N_DOCS):
        doc_id = str(i)
        row = doc_to_row(doc_id)
        spans_in = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        for span in extract_spans(doc_id, spans_in, FLAGSHIP_CFG):
            span_cols["doc_id"].append(span.doc_id)
            span_cols["offset"].append(span.offset)
            span_cols["kind"].append(span.kind)
            span_cols["text"].append(span.text)
            span_cols["media_ref"].append(span.media_ref)
            if span.kind == "media_ref":
                # Mirror multimodal.attach_payloads + _decode_stub exactly:
                # payload = raw bytes of sha256-hex(media_ref).
                payload = bytes.fromhex(
                    hashlib.sha256(span.media_ref.encode()).hexdigest()
                )
                feats = _decode_stub(payload)
                med_cols["doc_id"].append(doc_id)
                med_cols["media_ref"].append(span.media_ref)
                med_cols["media_kind"].append(span.media_ref.split("://", 1)[0])
                med_cols["byte_len"].append(len(payload))
                med_cols["feat_checksum"].append(feats["feat_checksum"])
                med_cols["feat_width"].append(feats["feat_width"])
                med_cols["feat_height"].append(feats["feat_height"])
        xml = "".join(
            s["text"] for s in row["spans"] if s["kind"] == "text" and s["text"]
        )
        for idx, title, level, length, n_subs in section_meta(xml):
            sec_cols["doc_id"].append(doc_id)
            sec_cols["section_idx"].append(idx)
            sec_cols["title"].append(title)
            sec_cols["level"].append(level)
            sec_cols["length"].append(length)
            sec_cols["subsection_count"].append(n_subs)

    def write(name: str, cols: dict, int32_cols: set) -> None:
        arrays, fields = [], []
        for k, v in cols.items():
            if k in int32_cols:
                arrays.append(pa.array(v, type=pa.int32()))
                fields.append(pa.field(k, pa.int32()))
            else:
                arrays.append(pa.array(v, type=pa.string()))
                fields.append(pa.field(k, pa.string()))
        table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        path = os.path.join(OUT_DIR, name)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows, {os.path.getsize(path) // 1024} KiB")

    write("golden_spans.parquet", span_cols, {"offset"})
    write("golden_sections.parquet", sec_cols, {"section_idx", "level", "length", "subsection_count"})
    write(
        "golden_media_features.parquet",
        med_cols,
        {"byte_len", "feat_width", "feat_height"},
    )


if __name__ == "__main__":
    main()
