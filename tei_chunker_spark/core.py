"""Faithful extraction core: TEI XML -> section tree -> ordered chunk spans.

Pure Python, zero Spark imports — this module is shipped to executors and
runs inside the ``mapInPandas`` batch loop (one call per document).  Its
observable behavior is pinned, char-for-char, to the reference
implementation at ``/root/reference/tei_chunker/chunking.py`` (dmarx/
tei-chunker @ 2025-03-02); every branch below cites the reference line it
must agree with.  It is a re-derivation, not a port: sections are immutable
tuples, the pack loop is an explicit-stack preorder walk, and there is no
service/class surface — but outputs are bit-equal (see
tests/test_reference_parity.py and tests/test_core_golden.py).

Semantic traps intentionally reproduced (verified against the reference):

* subsection duplication: a section's rendered form includes all its
  subsections (chunking.py:34-40), and the pack loop then recurses into the
  same subsections (chunking.py:253-255), so subsection text appears at
  least twice in the chunk stream.
* div-level ``<formula>`` renders bare; a formula nested inside ``<p>``
  renders ``$$...$$`` (chunking.py:120-122 vs 158-163).
* titles are NOT stripped, and only ``head.text`` before the first child is
  used (chunking.py:154); missing/empty head -> "Untitled Section".
* overlap carry is ``words[-overlap_size // 10:]`` with Python floor
  division and the ``[-0:]`` degenerate (chunking.py:228-230): overlap 0
  carries the WHOLE accumulated word list; overlap 55 carries 6 words
  (``-55 // 10 == -6``), not 5.
* emitted word-split chunks may legally exceed max_chunk_size
  (chunking.py:231-232 re-adds carried words plus the new word).
* boundary is inclusive: a section exactly max_chunk_size chars fits
  (``<=`` at chunking.py:242, ``>`` at chunking.py:209).
* malformed XML -> empty section list, swallowed (chunking.py:101-103).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, NamedTuple, Optional, Sequence, Tuple

from .config import ChunkerConfig

_TEI = "{http://www.tei-c.org/ns/1.0}"
_TEI_LEN = len(_TEI)
_FORMULA_TAG = _TEI + "formula"
_REF_TAG = _TEI + "ref"


class SectionNode(NamedTuple):
    """One node of the section tree (reference Section, chunking.py:15-48).

    ``body`` is the direct content only (subsections excluded), already
    rendered to text: "\\n\\n"-joined p/formula texts in document order.
    """

    title: str
    body: str
    depth: int
    children: Tuple["SectionNode", ...]


class Span(NamedTuple):
    """One output span. kind is 'text' (a chunk) or 'media_ref'."""

    doc_id: str
    offset: int
    kind: str
    text: Optional[str]
    media_ref: Optional[str]


def flatten_text(element: Optional[ET.Element]) -> str:
    """Recursive text extraction with inline-markup projection.

    Agrees with reference ``_get_element_text`` (chunking.py:105-137):
    each text/tail piece is stripped and pieces are " "-joined; a *direct
    child* tagged ``formula`` contributes ``$$<its .text stripped>$$``
    (children of the formula are ignored; empty text -> ``$$$$``); a direct
    child tagged ``ref`` contributes ``[<its .text stripped>]``; any other
    child is recursed and contributes only if non-empty.
    """
    if element is None:
        return ""
    pieces: List[str] = []
    append = pieces.append
    t = element.text
    if t:
        t = t.strip()
        if t:
            append(t)
    for child in element:
        # Inlined _local_tag with a TEI-prefix fast path (this loop is the
        # hottest line of the parse; the semantics are unchanged).
        tag = child.tag
        if tag.startswith(_TEI):
            tag = tag[_TEI_LEN:]
        elif "}" in tag:
            tag = tag.rsplit("}", 1)[1]
        if tag == "formula":
            ct = child.text
            append("$$%s$$" % (ct.strip() if ct else ""))
        elif tag == "ref":
            ct = child.text
            append("[%s]" % (ct.strip() if ct else ""))
        else:
            inner = flatten_text(child)
            if inner:
                append(inner)
        t = child.tail
        if t:
            t = t.strip()
            if t:
                append(t)
    return " ".join(pieces)


def _walk_divs(element: ET.Element, depth: int = 1) -> List[SectionNode]:
    """Recursive div walk (reference ``_process_divs``, chunking.py:139-183).

    Only direct ``p``/``formula`` children contribute to a div's own body
    (everything else at div level — figure, table, note, head — is dropped;
    chunking.py:158-165).  NOTE the div-level formula goes through
    :func:`flatten_text` *applied to the formula element itself*, whose own
    tag never hits the formula branch, so it renders bare (no ``$$``).
    """
    out: List[SectionNode] = []
    div_tag = _TEI + "div"
    head_tag = _TEI + "head"
    # Direct child-tag scans instead of findall("./tei:div")/find("./tei:head"):
    # identical match semantics (namespaced direct children, document order)
    # without ElementPath's per-call selector machinery (~20% of parse time).
    for div in element:
        if div.tag != div_tag:
            continue
        head = next((c for c in div if c.tag == head_tag), None)
        # Raw head.text (unstripped; text before the first child element
        # only) — chunking.py:154.
        title = head.text if (head is not None and head.text) else "Untitled Section"
        paragraphs: List[str] = []
        for child in div:
            # Inlined _local_tag (TEI-prefix fast path; semantics unchanged).
            tag = child.tag
            if tag.startswith(_TEI):
                tag = tag[_TEI_LEN:]
            elif "}" in tag:
                tag = tag.rsplit("}", 1)[1]
            if tag == "p" or tag == "formula":
                text = flatten_text(child)
                if text:
                    paragraphs.append(text)
        out.append(
            SectionNode(
                title=title,
                body="\n\n".join(paragraphs),
                depth=depth,
                children=tuple(_walk_divs(div, depth + 1)),
            )
        )
    return out


def parse_tei(xml_text: str) -> List[SectionNode]:
    """TEI XML string -> top-level section list (chunking.py:67-103).

    The first ``abstract`` found anywhere becomes a depth-1 "Abstract"
    section (its nested structure flattened to one string) ahead of the
    body sections; a parse error yields ``[]`` — callers cannot distinguish
    malformed from empty, exactly like the reference.
    """
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    nodes: List[SectionNode] = []
    # ".//tag" means first matching DESCENDANT in document order (the root
    # itself excluded) — root.iter includes the root, so skip it explicitly.
    abstract = next(
        (e for e in root.iter(_TEI + "abstract") if e is not root), None
    )
    if abstract is not None:
        abstract_text = flatten_text(abstract)
        if abstract_text:
            nodes.append(SectionNode("Abstract", abstract_text, 1, ()))
    body = next((e for e in root.iter(_TEI + "body") if e is not root), None)
    if body is not None:
        nodes.extend(_walk_divs(body))
    return nodes


def render_markdown(node: SectionNode) -> str:
    """Markdown rendering incl. subsections (Section.full_content,
    chunking.py:34-40): ``'#'*depth + ' ' + title + '\\n\\n' + body`` per
    node, blocks "\\n\\n"-joined in preorder."""
    blocks: List[str] = []
    stack = [node]
    while stack:
        cur = stack.pop()
        blocks.append("%s %s\n\n%s" % ("#" * cur.depth, cur.title, cur.body))
        stack.extend(reversed(cur.children))
    return "\n\n".join(blocks)


def _render_memo(nodes: Sequence[SectionNode]) -> dict:
    """id(node) -> render_markdown(node) for every node, built bottom-up.

    The pack loop renders EVERY node it visits, and render_markdown walks
    the node's whole subtree — O(size x depth) string bytes when called per
    node.  Building renders post-order instead reuses each child's finished
    string ("\\n\\n".join of header + child renders is byte-identical to the
    preorder block join), cutting the copies to O(total rendered bytes).
    Keyed by id(): nodes are immutable tuples live for the dict's lifetime.
    """
    memo: dict = {}
    stack = [(n, False) for n in nodes]
    while stack:
        node, expanded = stack.pop()
        children = node.children
        if expanded or not children:
            head = "%s %s\n\n%s" % ("#" * node.depth, node.title, node.body)
            if children:
                memo[id(node)] = "\n\n".join(
                    [head] + [memo[id(c)] for c in children]
                )
            else:
                memo[id(node)] = head
        else:
            stack.append((node, True))
            stack.extend((c, False) for c in children)
    return memo


def pack_chunks(
    nodes: Sequence[SectionNode], max_chunk_size: int, overlap_size: int
) -> List[str]:
    """Greedy hierarchical bin packing (chunk_document, chunking.py:185-265).

    Preorder walk; per node the FULL rendered subtree is considered:
    oversized -> flush accumulator then word-split with overlap carry;
    fits -> append to accumulator; else -> flush and start fresh.  Children
    are then visited regardless (the duplication invariant).  Finally
    whitespace-only chunks are dropped (chunking.py:265).
    """
    if not nodes:
        return []
    # Reference computes `current_words[-self.overlap_size // 10:]` — unary
    # minus binds before floor division, so the slice start is
    # (-overlap_size) // 10, NOT -(overlap_size // 10).  overlap 0 -> [-0:]
    # -> the whole list (pathological growth), overlap 55 -> [-6:].
    carry_from = (-overlap_size) // 10

    chunks: List[str] = []
    acc: List[str] = []
    acc_size = 0

    rendered_of = _render_memo(nodes)
    stack: List[SectionNode] = list(reversed(nodes))
    while stack:
        node = stack.pop()
        rendered = rendered_of[id(node)]
        size = len(rendered)

        if size > max_chunk_size:  # strict >, chunking.py:209
            if acc:
                chunks.append("\n\n".join(acc))
                acc = []
                acc_size = 0
            buf: List[str] = []
            buf_append = buf.append
            buf_size = 0
            for word in rendered.split():
                step = len(word) + 1  # +1 for the joining space
                if buf_size + step > max_chunk_size:
                    # A first word that alone exceeds max while buf is empty
                    # is dropped here, exactly as in the reference
                    # (chunking.py:223-232: the empty-buf overflow arm does
                    # nothing) — reachable only when the header token itself
                    # exceeds max_chunk_size.
                    if buf:
                        chunks.append(" ".join(buf))
                        buf = buf[carry_from:]
                        buf.append(word)
                        buf_append = buf.append
                        buf_size = len(buf) + sum(map(len, buf))
                else:
                    buf_append(word)
                    buf_size += step
            if buf:
                chunks.append(" ".join(buf))
        elif acc_size + size <= max_chunk_size:  # inclusive, chunking.py:242
            acc.append(rendered)
            acc_size += size
        else:
            if acc:
                chunks.append("\n\n".join(acc))
            acc = [rendered]
            acc_size = size

        stack.extend(reversed(node.children))

    if acc:
        chunks.append("\n\n".join(acc))

    return [c for c in chunks if c.strip()]


def outline(nodes: Sequence[SectionNode], indent: str = "") -> str:
    """Readable structure outline (get_section_structure, chunking.py:267-284).

    Diagnostic only — same "{indent}{title} ({n} chars, {k} subsections)"
    format, nested blocks indented two spaces."""
    lines: List[str] = []
    for node in nodes:
        lines.append(
            "%s%s (%d chars, %d subsections)"
            % (indent, node.title, len(render_markdown(node)), len(node.children))
        )
        if node.children:
            lines.append(outline(node.children, indent + "  "))
    return "\n".join(lines)


def section_meta(xml_text: str) -> List[Tuple[int, str, int, int, int]]:
    """Top-level section metadata, exactly the reference service's JSON
    ``sections`` array (reference service.py:37-44): one row per TOP-LEVEL
    section, ``(section_idx, title, level, length, subsection_count)``
    where length = len(direct content, subsections excluded) — the
    reference uses ``section.content``, not ``full_content``.  Malformed
    XML -> [] (parse_tei swallows the ParseError)."""
    return [
        (i, n.title, n.depth, len(n.body), len(n.children))
        for i, n in enumerate(parse_tei(xml_text))
    ]


def chunk_tei(xml_text: str, cfg: ChunkerConfig) -> List[str]:
    """parse + pack in one call (the reference's service path,
    service.py:29-30)."""
    return pack_chunks(parse_tei(xml_text), cfg.max_chunk_size, cfg.overlap_size)


def extract_spans(
    doc_id: str,
    spans_in: Sequence[Tuple[str, Optional[str], Optional[str], int]],
    cfg: ChunkerConfig,
) -> List[Span]:
    """Whole-document transform: interleaved input spans -> ordered output.

    ``spans_in`` rows are ``(kind, text, media_ref, offset)`` per the input
    table schema (BASELINE.json input_hint).  The document XML is
    reassembled by concatenating kind='text' spans in offset order; chunks
    are emitted first as kind='text' output spans, then each input
    kind='media' span passes through as one kind='media_ref' span in input
    offset order (FIXTURES.md §1.2 — the reference drops figures, so media
    passthrough position is our documented, fixed rule).
    """
    ordered = sorted(spans_in, key=lambda s: s[3])
    xml_text = "".join(s[1] for s in ordered if s[0] == "text" and s[1] is not None)

    out: List[Span] = []
    for chunk in chunk_tei(xml_text, cfg):
        out.append(Span(doc_id, len(out), "text", chunk, None))
    for kind, _text, media_ref, _offset in ordered:
        if kind == "media":
            out.append(Span(doc_id, len(out), "media_ref", None, media_ref))
    return out
