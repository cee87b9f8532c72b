"""Python UDTF surface: table-valued functions where one input row fans
out to a variable number of typed output rows.

The engine avoids Python in hot paths (everything in textstats/dedup is
JVM-side Catalyst), but the UDTF is a distinct API surface a user of the
engine would reach for when per-row fan-out logic genuinely needs Python
(custom tokenizers, format-specific splitters).  This module exercises
that surface end-to-end with an Arrow-optimized UDTF whose semantics are
simple enough to oracle exactly in SQL: fixed-width token segmentation
(the same shape a tokenizer shard step produces).

Scale shape: a UDTF runs inside the scan stage — per-row fan-out, no
shuffle introduced; Arrow batches amortize the Python boundary the same
way mapInPandas does in extract.py.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

# the engine-wide ASCII whitespace definition (functions/columns.py::
# WS_CLASS) — NOT str.split(), which also splits on Unicode whitespace
# (NBSP, U+2028, ...) and would diverge from the SQL oracle on any
# corpus containing it (round-4 review find)
_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


@udtf(returnType="seg_idx: int, seg_text: string, n_tokens: int", useArrow=True)
class SegmentSplit:
    """Fixed-width token segmenter: ASCII-whitespace-split the text, emit
    one row per consecutive ``width``-token window (tail partial window
    included).  Whitespace-only text emits no rows — identical to the
    engine-wide token_count guard."""

    def eval(self, text: str, width: int):  # noqa: D102
        toks = [t for t in _WS_RE.split(text or "") if t]
        for i in range(0, len(toks), width):
            seg = toks[i : i + width]
            yield i // width, " ".join(seg), len(seg)


def doc_segments(
    spark: SparkSession, documents: DataFrame, width: int = 20
) -> DataFrame:
    """(doc_id, seg_idx, seg_text, n_tokens): every document split into
    consecutive ``width``-token segments via the SegmentSplit UDTF in a
    LATERAL correlated position (the table-function join Spark turns into
    a per-row generate — no shuffle)."""
    spark.udtf.register("segment_split", SegmentSplit)
    documents.createOrReplaceTempView("_udtf_docs_in")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.seg_idx, s.seg_text, s.n_tokens
        FROM _udtf_docs_in d,
        LATERAL segment_split(d.text, {int(width)}) s
        """
    )
