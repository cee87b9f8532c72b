"""Two-stage salted top-k — the engine's standard device for ranking
within a LOW-cardinality partition key (ANN query ids, languages) without
ever landing one key's full candidate set on a single task.

Why two stages: Spark's rank-filter pushdown already inserts a PARTIAL
WindowGroupLimit below the exchange, so only ~k rows per key survive each
map partition — but the FINAL window still merges every key's survivors
(k x P rows at P upstream partitions; ~10^7 at 100 TB) on ONE task.
Stage 1 ranks within (key, salt) where salt = xxhash64(salt_col) mod
``n_salts``: each of a key's stage-1 partitions handles ~k x P / n_salts
rows in parallel (the partial WindowGroupLimit applies here too).  Stage 2
merges the <= k x n_salts survivors per key — bounded regardless of input
size.

Correctness is salt-invariant: every row ranked in stage 2 was fully
ranked against its salt group, the global top-k is contained in the union
of per-salt top-k, and the caller's ordering must be a TOTAL order (tie
keys included) so both stages are deterministic — the output is
bit-identical to the single-window formulation (plan shape pinned by
tests/test_plans.py::test_ann_ranking_is_two_stage_topk).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stage-1 fan-out default: how many ways each key's candidate stream is
# split before the final merge.  Scale knob only — results are invariant.
N_SALTS = 16


def two_stage_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    salt_col: str,
    k: int,
    rank_alias: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """``df`` + ``rank_alias`` (row_number <= ``k`` per ``part_cols``
    under ``order_cols``), computed salted-then-merged as described in
    the module docstring.  ``salt_col`` must be part of the ordering's
    total order (typically the unique id column)."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(int(n_salts)))
    w1 = Window.partitionBy(*part_cols, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_pr", F.row_number().over(w1))
        .filter(F.col("_pr") <= k)
        .withColumn(rank_alias, F.row_number().over(w2))
        .filter(F.col(rank_alias) <= k)
        .drop("_salt", "_pr")
    )
