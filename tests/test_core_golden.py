"""Golden-fixture tests for the extraction core.

Every expected value below is a literal recorded from executing the
reference implementation (/root/reference/tei_chunker/chunking.py) in this
workspace — NOT computed by our code — so any semantic drift in core.py
fails here even if it is self-consistent.  Fixture provenance: FIXTURES.md
§2 (F1/F2 from the reference's own test corpus; F3* edge battery).
"""
from __future__ import annotations

from tei_chunker_spark.config import ChunkerConfig
from tei_chunker_spark.core import (
    SectionNode,
    chunk_tei,
    extract_spans,
    pack_chunks,
    parse_tei,
)

CFG_500 = ChunkerConfig(max_chunk_size=500, overlap_size=50)
CFG_SVC = ChunkerConfig(max_chunk_size=20000, overlap_size=200)  # service.py:17

F1 = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
    <teiHeader><fileDesc><titleStmt><title>Test Paper</title></titleStmt></fileDesc></teiHeader>
    <text><body>
        <div><head>Introduction</head><p>Test introduction content.</p><formula>E = mc^2</formula></div>
        <div><head>Methods</head><p>Test methods content.</p></div>
    </body></text>
</TEI>"""

F2 = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
  <teiHeader/>
  <text><body>
    <div><head>Introduction</head><p>This is an introduction paragraph.</p><p>This is another paragraph.</p>
      <div><head>Background</head><p>Some background information.</p><formula>E = mc^2</formula></div>
    </div>
    <div><head>Methods</head><p>Our methodology is described here.</p>
      <div><head>Data Collection</head><p>We collected data as follows.</p></div>
      <div><head>Analysis</head><p>Analysis was performed using...</p></div>
    </div>
  </body></text>
</TEI>"""


def test_f1_flat_doc_div_level_formula_bare():
    golden = [
        "# Introduction\n\nTest introduction content.\n\nE = mc^2\n\n# Methods\n\nTest methods content."
    ]
    assert chunk_tei(F1, CFG_500) == golden
    assert chunk_tei(F1, CFG_SVC) == golden


def test_f2_nested_doc_duplication_invariant():
    golden = [
        "# Introduction\n\nThis is an introduction paragraph.\n\nThis is another paragraph.\n\n"
        "## Background\n\nSome background information.\n\nE = mc^2\n\n"
        "## Background\n\nSome background information.\n\nE = mc^2\n\n"
        "# Methods\n\nOur methodology is described here.\n\n"
        "## Data Collection\n\nWe collected data as follows.\n\n"
        "## Analysis\n\nAnalysis was performed using...\n\n"
        "## Data Collection\n\nWe collected data as follows.\n\n"
        "## Analysis\n\nAnalysis was performed using..."
    ]
    assert chunk_tei(F2, CFG_500) == golden
    assert chunk_tei(F2, CFG_SVC) == golden


def test_f3a_abstract_anywhere_with_ref():
    doc = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc><abstract>'
        "<div><p>We study things <ref>1</ref> deeply.</p></div><div><p>Second abstract para.</p></div>"
        "</abstract></profileDesc></teiHeader><text><body><div><head>S</head><p>Body.</p></div></body></text></TEI>"
    )
    assert chunk_tei(doc, CFG_500) == [
        "# Abstract\n\nWe study things [1] deeply. Second abstract para.\n\n# S\n\nBody."
    ]


def test_f3bc_p_nested_formula_and_empty_formula():
    doc = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><div><head>X</head>'
        "<p>Before <formula>x+y</formula> after.</p><p>After <formula/>.</p></div></body></text></TEI>"
    )
    assert chunk_tei(doc, CFG_500) == ["# X\n\nBefore $$x+y$$ after.\n\nAfter $$$$ ."]


def test_f3de_untitled_and_unstripped_partial_head():
    doc = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>'
        "<div><p>no head here</p></div><div><head/><p>empty head</p></div>"
        "<div><head>Part <hi>One</hi></head><p>partial head</p></div></body></text></TEI>"
    )
    assert chunk_tei(doc, CFG_500) == [
        "# Untitled Section\n\nno head here\n\n# Untitled Section\n\nempty head\n\n# Part \n\npartial head"
    ]


def test_f3f_div_level_figure_dropped_inline_figure_flattened():
    doc = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><div><head>F</head>'
        "<figure><figDesc>dropped figure</figDesc></figure>"
        "<p>with <figure><figDesc>inline fig</figDesc></figure> inside</p>"
        "<formula>a=b</formula><table><row>nope</row></table></div></body></text></TEI>"
    )
    # div-level figure and table dropped entirely; inline figure flattened
    # to bare text; div-level formula bare (no $$).
    assert chunk_tei(doc, CFG_500) == ["# F\n\nwith inline fig inside\n\na=b"]


def test_f3g_word_split_with_overlap():
    secs = [SectionNode("Large Section", "word " * 40, 1, ())]
    # 40 * 5 + header > 100 -> word-split path; overlap carry = (-50)//10 = 5
    golden = [
        "# Large Section word word word word word word word word word word word word word word word word",
        "word word word word word word word word word word word word word word word word word word word word",
        "word word word word word word word word word word word word word word",
    ]
    assert pack_chunks(secs, 100, 50) == golden


def test_f3h_single_word_longer_than_max_carried():
    secs = [SectionNode("T", "x" * 200, 1, ())]
    # The oversized word is never dropped: it rides the overlap carry, so
    # chunk 1 is just the header and chunk 2 exceeds max_chunk_size.
    assert pack_chunks(secs, 100, 50) == ["# T", "# T " + "x" * 200]


def test_f3i_exact_boundary_fits():
    body = "y" * (100 - len("# T\n\n"))
    secs = [SectionNode("T", body, 1, ())]
    assert pack_chunks(secs, 100, 50) == ["# T\n\n" + body]


def test_f3j_malformed_xml_zero_sections():
    assert parse_tei("<invalid>xml") == []
    assert chunk_tei("<invalid>xml", CFG_500) == []


def test_f3k_empty_body_no_abstract():
    doc = '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body/></text></TEI>'
    assert chunk_tei(doc, CFG_500) == []


def test_whitespace_normalization_and_unstripped_title():
    doc = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><div><head>  W  </head>\n'
        "       <p>\n         line one\n         line two  <ref> r1 </ref>   tail text\n       </p></div></body></text></TEI>"
    )
    # title kept raw ('  W  '); newlines INSIDE one text node preserved;
    # inter-node whitespace collapsed to single spaces.
    assert chunk_tei(doc, CFG_500) == [
        "#   W  \n\nline one\n         line two [r1] tail text"
    ]


def test_no_namespace_doc_yields_nothing():
    doc = "<TEI><text><body><div><head>NoNS</head><p>hi</p></div></body></text></TEI>"
    assert chunk_tei(doc, CFG_500) == []


def test_overlap_floor_division_semantics():
    # carry slice start is (-overlap)//10: overlap 55 -> -6 (six words),
    # NOT -(55//10) = -5.  Pinned via exact reference behavior.
    words = " ".join(f"w{i:02d}" for i in range(40))
    secs = [SectionNode("T", words, 1, ())]
    out55 = pack_chunks(secs, 60, 55)
    out50 = pack_chunks(secs, 60, 50)
    assert out55 != out50
    # chunk 2 of the 55-config starts with the last 6 words of chunk 1
    c1_words = out55[0].split()
    assert out55[1].split()[:6] == c1_words[-6:]
    assert out50[1].split()[:5] == out50[0].split()[-5:]


def test_overlap_zero_carries_everything():
    # [-0:] pathology: slice start 0 -> whole accumulated list is carried.
    secs = [SectionNode("T", "a b c d e f g h i j", 1, ())]
    out = pack_chunks(secs, 12, 0)
    # every chunk after the first must contain the full previous chunk as a
    # prefix (monotone growth)
    for prev, cur in zip(out, out[1:]):
        assert cur.startswith(prev)


def test_extract_spans_media_passthrough_order():
    spans_in = [
        ("media", None, "fig://d1/0", 5),
        ("text", F1[: len(F1) // 2], None, 0),
        ("text", F1[len(F1) // 2 :], None, 10),
        ("media", None, "fig://d1/1", 7),
    ]
    out = extract_spans("d1", spans_in, CFG_500)
    kinds = [(s.kind, s.media_ref) for s in out]
    assert kinds == [
        ("text", None),
        ("media_ref", "fig://d1/0"),
        ("media_ref", "fig://d1/1"),
    ]
    assert [s.offset for s in out] == [0, 1, 2]
    assert out[0].text.startswith("# Introduction")


def test_extract_spans_malformed_doc_keeps_media():
    spans_in = [("text", "<broken", None, 0), ("media", None, "img://x", 1)]
    out = extract_spans("d2", spans_in, CFG_500)
    assert [(s.kind, s.media_ref) for s in out] == [("media_ref", "img://x")]
