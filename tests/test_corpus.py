"""Corpus generator invariants: determinism, schema shape, skew/malformed
tails, reconstructability (text spans concatenate back to the XML)."""
from __future__ import annotations

from tei_chunker_spark.corpus import doc_to_row, make_rows, synth_tei


def test_deterministic_per_doc_id():
    a = doc_to_row("doc-42")
    b = doc_to_row("doc-42")
    assert a == b
    assert synth_tei("doc-42") == synth_tei("doc-42")
    assert synth_tei("doc-42") != synth_tei("doc-43")


def test_row_shape_and_reconstruction():
    rows = make_rows([f"r{i}" for i in range(200)])
    for row in rows:
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        for s in row["spans"]:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["kind"] == "media"
                assert s["text"] is None and s["media_ref"]
        xml = "".join(s["text"] for s in row["spans"] if s["kind"] == "text")
        assert xml == synth_tei(row["doc_id"])


def test_tails_present_at_scale():
    docs = [synth_tei(f"doc-{i:012d}") for i in range(3000)]
    malformed = sum(1 for d in docs if not d.startswith("<TEI xmlns"))
    sizes = sorted(len(d) for d in docs)
    median = sizes[len(sizes) // 2]
    oversized = sum(1 for s in sizes if s > 10 * median)
    assert 0 < malformed < len(docs) * 0.03
    assert 0 < oversized < len(docs) * 0.03
