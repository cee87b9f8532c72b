"""The reference's own 9 unit tests (reference tests/test_chunking.py:56-162)
re-expressed against our core API, with the same inputs and assertions.
"""
from __future__ import annotations

import pytest

from tei_chunker_spark.config import ChunkerConfig
from tei_chunker_spark.core import (
    SectionNode,
    outline,
    pack_chunks,
    parse_tei,
    render_markdown,
)


@pytest.fixture
def sample_xml() -> str:
    # reference tests/test_chunking.py:12-47
    return """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
    <teiHeader>
        <fileDesc>
            <titleStmt>
                <title level="a" type="main">Test Paper</title>
            </titleStmt>
        </fileDesc>
    </teiHeader>
    <text>
        <body>
            <div xmlns="http://www.tei-c.org/ns/1.0">
                <head>Introduction</head>
                <p>This is an introduction paragraph.</p>
                <p>This is another paragraph.</p>
                <div xmlns="http://www.tei-c.org/ns/1.0">
                    <head>Background</head>
                    <p>Some background information.</p>
                    <formula>E = mc^2</formula>
                </div>
            </div>
            <div xmlns="http://www.tei-c.org/ns/1.0">
                <head>Methods</head>
                <p>Our methodology is described here.</p>
                <div xmlns="http://www.tei-c.org/ns/1.0">
                    <head>Data Collection</head>
                    <p>We collected data as follows.</p>
                </div>
                <div xmlns="http://www.tei-c.org/ns/1.0">
                    <head>Analysis</head>
                    <p>Analysis was performed using...</p>
                </div>
            </div>
        </body>
    </text>
</TEI>"""


CFG = ChunkerConfig(max_chunk_size=500, overlap_size=50)


def test_section_creation():  # ref :56-62
    s = SectionNode(title="Test", body="Content", depth=1, children=())
    assert s.title == "Test"
    assert s.body == "Content"
    assert s.depth == 1
    assert len(s.children) == 0


def test_section_hierarchy():  # ref :65-78
    sub = SectionNode("Subsection", "Sub content", 2, ())
    main = SectionNode("Main", "Main content", 1, (sub,))
    assert main.children[0] == sub
    assert "Main" in render_markdown(main)
    assert "Sub content" in render_markdown(main)


def test_parse_xml(sample_xml):  # ref :81-91
    sections = parse_tei(sample_xml)
    assert len(sections) >= 2
    intro = next((s for s in sections if s.title == "Introduction"), None)
    assert intro is not None
    assert "introduction paragraph" in intro.body


def test_formula_handling(sample_xml):  # ref :94-102
    sections = parse_tei(sample_xml)
    intro = next((s for s in sections if s.title == "Introduction"), None)
    assert intro is not None
    assert len(intro.children) > 0
    background = intro.children[0]
    assert "E = mc^2" in background.body


def test_chunking_small_document():  # ref :105-117
    sections = [SectionNode("Small Section", "This is a small section.", 1, ())]
    chunks = pack_chunks(sections, CFG.max_chunk_size, CFG.overlap_size)
    assert len(chunks) >= 1
    assert "Small Section" in chunks[0]


def test_chunking_large_section():  # ref :120-129
    large_content = "word " * 200
    sections = [SectionNode("Large Section", large_content, 1, ())]
    chunks = pack_chunks(sections, 100, CFG.overlap_size)
    assert len(chunks) > 1
    assert any("Large Section" in c for c in chunks)


def test_chunking_with_subsections():  # ref :132-148
    sections = [
        SectionNode(
            "Main",
            "Main content",
            1,
            (
                SectionNode("Sub A", "A content", 2, ()),
                SectionNode("Sub B", "B content", 2, ()),
            ),
        )
    ]
    chunks = pack_chunks(sections, CFG.max_chunk_size, CFG.overlap_size)
    assert any("Main content" in c for c in chunks)
    assert any("Sub A" in c for c in chunks)
    assert any("Sub B" in c for c in chunks)


def test_invalid_xml():  # ref :151-155
    assert parse_tei("<invalid>xml") == []


def test_empty_sections():  # ref :158-162
    assert pack_chunks([], CFG.max_chunk_size, CFG.overlap_size) == []


def test_outline_format():  # ref get_section_structure, chunking.py:267-284
    sub = SectionNode("Sub", "sub body", 2, ())
    main = SectionNode("Main", "main body", 1, (sub,))
    text = outline([main])
    lines = text.split("\n")
    assert lines[0] == f"Main ({len(render_markdown(main))} chars, 1 subsections)"
    assert lines[1] == f"  Sub ({len(render_markdown(sub))} chars, 0 subsections)"
