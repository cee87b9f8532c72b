"""Randomized char-for-char parity vs the actual reference implementation.

Runs only where /root/reference is present (the build sandbox); the rest of
the suite pins semantics via literal goldens, so this is belt-and-braces.
"""
from __future__ import annotations

import os
import random
import sys
import types

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "tei_chunker")),
    reason="reference checkout not available",
)


def _load_reference():
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        stub.logger = _Logger()
        sys.modules["loguru"] = stub
    sys.path.insert(0, REFERENCE)
    from tei_chunker.chunking import HierarchicalChunker

    return HierarchicalChunker


@pytest.mark.parametrize(
    "max_chunk_size,overlap_size",
    [(20000, 200), (500, 50), (100, 50), (100, 200), (80, 5), (137, 55), (1, 10)],
)
def test_randomized_parity(max_chunk_size, overlap_size):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.parity_check import rand_doc, F1, F2, EDGE

    from tei_chunker_spark.config import ChunkerConfig
    from tei_chunker_spark.core import chunk_tei

    HierarchicalChunker = _load_reference()
    ref = HierarchicalChunker(max_chunk_size=max_chunk_size, overlap_size=overlap_size)
    cfg = ChunkerConfig(max_chunk_size=max_chunk_size, overlap_size=overlap_size)

    rng = random.Random(1234 + max_chunk_size * 7 + overlap_size)
    docs = [F1, F2, *EDGE] + [rand_doc(rng) for _ in range(60)]
    for doc in docs:
        expected = ref.chunk_document(ref.parse_grobid_xml(doc))
        assert chunk_tei(doc, cfg) == expected
