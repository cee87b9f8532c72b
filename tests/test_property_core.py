"""Property-based tests (hypothesis) for the extraction core.

The 3001-pair parity battery samples a fixed generator; hypothesis adds
adversarial breadth (empty titles, whitespace-only paragraphs, deep
nesting, degenerate configs) WITH shrinking — a failing tree minimizes to
the smallest counterexample instead of a 2 kB random doc.

Two layers:
* engine-invariant properties that hold for every input (run anywhere);
* char-for-char parity vs the actual reference implementation (runs only
  where /root/reference exists, like test_reference_parity).
"""
from __future__ import annotations

import os
from xml.sax.saxutils import escape

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tei_chunker_spark.config import ChunkerConfig
from tei_chunker_spark.core import chunk_tei

REFERENCE = "/root/reference"

# Deliberately includes XML-escapable chars (<, &, ") — escape() is
# applied at render time, so both parsers see identical unescaped text —
# plus whitespace pathologies ('' and ' ' titles/paragraphs).
_WORD = st.text(
    alphabet="abcdefgh XYZ0189$#<&\"'.\n", min_size=0, max_size=14
)


@st.composite
def _section(draw, depth: int):
    title = draw(_WORD)
    paras = draw(st.lists(_WORD, min_size=0, max_size=3))
    formulas = draw(st.lists(_WORD, min_size=0, max_size=2))
    children = (
        draw(st.lists(_section(depth - 1), min_size=0, max_size=3))
        if depth > 0
        else []
    )
    return (title, paras, formulas, children)


def _render_div(sec) -> str:
    title, paras, formulas, children = sec
    body = [f"<head>{escape(title)}</head>"] if title else []
    for p in paras:
        body.append(f"<p>{escape(p)}</p>")
    for f in formulas:
        body.append(f"<formula>{escape(f)}</formula>")
    for c in children:
        body.append(_render_div(c))
    return "<div>" + "".join(body) + "</div>"


@st.composite
def tei_doc(draw) -> str:
    abstract = draw(st.one_of(st.none(), _WORD))
    sections = draw(st.lists(_section(2), min_size=0, max_size=4))
    abs_xml = (
        f"<profileDesc><abstract><p>{escape(abstract)}</p></abstract></profileDesc>"
        if abstract is not None
        else ""
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<TEI xmlns="http://www.tei-c.org/ns/1.0">'
        f"<teiHeader>{abs_xml}</teiHeader>"
        "<text><body>"
        + "".join(_render_div(s) for s in sections)
        + "</body></text></TEI>"
    )


_CONFIGS = [
    ChunkerConfig(max_chunk_size=500, overlap_size=50),
    ChunkerConfig(max_chunk_size=60, overlap_size=20),
    ChunkerConfig(max_chunk_size=1, overlap_size=10),
]


@settings(max_examples=80, deadline=None)
@given(xml=tei_doc())
def test_chunks_never_whitespace_and_deterministic(xml: str):
    for cfg in _CONFIGS:
        chunks = chunk_tei(xml, cfg)
        # O8: the whitespace-chunk filter is total
        assert all(c.strip() for c in chunks)
        # pure function of (xml, cfg)
        assert chunks == chunk_tei(xml, cfg)


@settings(max_examples=60, deadline=None)
@given(xml=tei_doc())
def test_every_paragraph_word_survives_into_some_chunk(xml: str):
    """No silent data loss: every word of every paragraph/abstract appears
    in at least one chunk (the duplication invariant guarantees >= 1)."""
    cfg = ChunkerConfig(max_chunk_size=120, overlap_size=20)
    chunks = chunk_tei(xml, cfg)
    joined = "\n\n".join(chunks)
    import re
    import xml.etree.ElementTree as ET

    ns = {"tei": "http://www.tei-c.org/ns/1.0"}
    root = ET.fromstring(xml)
    words = []
    for p in root.iterfind(".//tei:p", ns):
        words.extend((p.text or "").split())
    for f in root.iterfind(".//tei:formula", ns):
        words.extend((f.text or "").split())
    for w in words:
        assert w in joined or re.sub(r"\s+", " ", w) in joined


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "tei_chunker")),
    reason="reference checkout not available",
)
@settings(max_examples=60, deadline=None)
@given(xml=tei_doc())
def test_property_parity_vs_reference(xml: str):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_reference_parity import _load_reference

    HierarchicalChunker = _load_reference()
    for cfg in _CONFIGS:
        ours = chunk_tei(xml, cfg)
        ref = HierarchicalChunker(
            max_chunk_size=cfg.max_chunk_size, overlap_size=cfg.overlap_size
        )
        theirs = ref.chunk_document(ref.parse_grobid_xml(xml))
        assert ours == theirs
