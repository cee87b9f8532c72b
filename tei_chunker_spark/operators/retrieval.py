"""Full-text retrieval over the corpus: exact-integer BM25 top-k.

The missing half of the similarity family (similarity.py/kmeans.py cover
dense ANN; this covers sparse lexical ranking).  No counterpart in the
reference (a single-doc TEI chunker, chunking.py) — this extends
SURVEY.md §2's training-pipeline inventory with the retrieval operator a
data-curation stack uses for targeted corpus probes ("find the documents
most about X") and hard-negative mining.

Determinism device (same family as the integer-Lloyd k-means and the
integer-LUT ADC in quantize.py): the ranking key is computed entirely in
exact integer arithmetic so the DuckDB oracle is bit-for-bit.

* Classic BM25 idf is ln((N - df + 0.5)/(df + 0.5)); ln is transcendental
  and its last ulp is engine-defined, so it CANNOT be in a cross-engine
  ORDER BY (same reasoning as corpusops.doc_top_terms).  We rank by the
  RATIONAL-idf variant: idf_r = (N - df + 0.5)/(df + 0.5) used directly
  (= exp of the classic idf; positive for every df <= N, which also
  removes classic BM25's negative-idf pathology).  Display columns can
  carry the ln form; the rank never does.
* The length normalization dl/avgdl is quantized once per doc:
  dlq = (10^6 * dl * N) div L  (exact integer; L = total corpus tokens).
* Per-term weight, k1 = 6/5 and b = 3/4 folded in exactly:
      w = (idf_num * 22'000'000 * tf * SCALE)
          div (idf_den * (10'000'000 * tf + 3'000'000 + 9 * dlq))
  with idf_num = 2N - 2df + 1, idf_den = 2df + 1.  All products stay in
  decimal(38,0); Spark's `div` and DuckDB's hugeint `//` both produce the
  exact integral quotient (verified).  Overflow envelope: the numerator is
  bounded by 2N * 2.2e7 * tf * SCALE — at N = 10^12 docs and tf <= 10^7
  that is ~4e32, five orders under the 10^38 decimal ceiling.
* Document score = SUM of per-term integer weights; ties break on doc_id.

Shape at 100 TB: the posting scan filters to the query's terms BEFORE the
(doc, term) aggregate, so the shuffled tf table is sized by the matching
postings, not the corpus; N/L fold to ONE global aggregate row
(cross-join broadcast); per-term df is a tiny aggregate broadcast back;
the global top-k is TakeOrderedAndProject (per-partition heads merged on
the driver), never a full sort.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import WS_CLASS, token_count, tokens

SCALE = 10**6
_D38 = "decimal(38,0)"


def query_terms(query: str) -> list[str]:
    """Distinct whitespace terms of the query, sorted (the split uses the
    same explicit ASCII class as the corpus tokenizer)."""
    return sorted({t for t in re.split(f"[{WS_CLASS}]+", query.strip()) if t})


def bm25_topk(documents: DataFrame, query: str, k: int = 15) -> DataFrame:
    """Top-``k`` documents for ``query`` under exact-integer rational-idf
    BM25 (module docstring).  Output: doc_id, n_terms_matched,
    score_micro (the exact integer rank key, SCALE = 10^6), and bm25 (the
    same value as a display double)."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    lengths = documents.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("dl")
    )
    glob = documents.agg(
        F.count(F.lit(1)).cast(_D38).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast(_D38).alias("total_tokens"),
    )
    tf = (
        documents.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast(_D38).alias("tf"))
    )
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).cast(_D38).alias("df"))
    scored = (
        tf.join(F.broadcast(dfx), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "dlq",
            F.expr(f"cast(1000000 as {_D38}) * cast(dl as {_D38}) * n_docs")
            .cast(_D38),
        )
        .withColumn("dlq", F.expr("dlq div total_tokens").cast(_D38))
        .withColumn(
            "w",
            F.expr(
                "((2 * n_docs - 2 * df + 1) * cast(22000000 as decimal(38,0))"
                " * tf * cast(1000000 as decimal(38,0)))"
                " div ((2 * df + 1) * (cast(10000000 as decimal(38,0)) * tf"
                " + cast(3000000 as decimal(38,0))"
                " + cast(9 as decimal(38,0)) * dlq))"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.sum("w").cast("long").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_terms_matched",
            "score_micro",
            F.round(F.col("score_micro") / SCALE, 6).alias("bm25"),
        )
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )
