"""Similarity search over an embedding column (array<float>).

* ``ann_bruteforce_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, rank per query.  The corpus side never shuffles;
  this is the correctness baseline and the right plan whenever |queries| is
  broadcastable.
* ``ann_ivf_topk`` — the scale path: restrict each query to its coarse
  cell (inverted-file probe).  Here the cell id is the stored ``label``
  column (standing in for a trained k-means codebook assignment); at 100 TB
  the corpus is bucketed/partitioned by cell so a probe reads only its
  cell's files — partition pruning does the fan-out reduction.

Ranking is deterministic: (cosine desc, candidate vec_id asc), cosine
computed in double precision in element order so the DuckDB oracle
reproduces values bit-for-bit before rounding.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import cosine

# Stage-1 fan-out of the two-stage top-k: how many ways each query's
# candidate stream is split before the final merge.  Scale knob only —
# the result is invariant to it (the union of per-salt top-k always
# contains the global top-k).
N_SALTS = 16


def _ranked(
    pairs: DataFrame, k: int, extra_cols: Sequence[str] = ()
) -> DataFrame:
    """Deterministic TWO-STAGE top-``k`` per query over scored candidate
    ``pairs`` — the scale-safe replacement for a single
    ``Window.partitionBy("query_id")`` (round-3 verdict).

    Why two stages: Spark's rank-filter pushdown already inserts a
    PARTIAL WindowGroupLimit below the exchange, so only ~k rows per
    query survive each map partition — but the FINAL window still lands
    every query's survivors (k x P rows at P upstream partitions; ~10^7
    at 100 TB) on ONE task.  Stage 1 therefore ranks within
    (query_id, salt) where salt = xxhash64(neighbor_id) mod N_SALTS:
    each of a query's stage-1 partitions handles ~k x P / N_SALTS rows
    and they run in parallel (the partial WindowGroupLimit applies here
    too, so the stage-1 shuffle itself carries <= k rows per (query,
    salt) per map partition).  Stage 2 merges the <= k x N_SALTS
    survivors per query — a bounded, O(k x N_SALTS) task regardless of
    corpus size.  Correctness is salt-invariant: every candidate ranked
    in stage 2 was fully ranked against its salt group, and the global
    top-k is contained in the union of per-salt top-k.

    Ordering (cos_sim_raw desc, neighbor_id asc) is a total order
    (neighbor_id unique per query), so both stages are deterministic and
    the output is bit-identical to the single-window formulation.
    """
    order = [F.col("cos_sim_raw").desc(), F.col("neighbor_id").asc()]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        pairs.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(N_SALTS))
        )
        .withColumn("_pr", F.row_number().over(w1))
        .filter(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            *extra_cols,
            "rank",
            F.round(F.col("cos_sim_raw"), 6).alias("cos_sim"),
        )
    )


def ann_bruteforce_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors of each query vector (excluding itself)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim_raw", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    return _ranked(pairs, k)


def ann_ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """IVF-style top-k: probe only the query's own coarse cell (label)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("cell"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("label").alias("cell"),
    )
    pairs = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim_raw", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    return _ranked(pairs, k)
