"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key — the standard enrichment join for event streams that
plain SQL-92 lacks (SURVEY.md §2.2 joins row).

Spark-first implementation: the classic union + last-value-over-window
composition — no UDFs, one shuffle on (key, ts):

  1. tag right rows (carrying payload) and left rows (payload NULL);
  2. union, window per key ordered by (ts, tag) with right rows sorting
     BEFORE left rows at equal ts (so a same-timestamp right row matches);
  3. ``last(payload, ignorenulls)`` over the running window gives every
     left row the most recent right payload;
  4. keep the left rows.

Scale: one exchange + one in-partition sort; skewed keys salt the same way
the extraction pipeline does.  Equivalent to DuckDB's native ``ASOF JOIN``
(the oracle uses it directly).
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: List[str],
    validate: bool = False,
) -> DataFrame:
    """Enrich ``left`` with the latest ``right`` payload at-or-before
    ``left_ts`` per ``key``.  Right rows must be unique per (key, ts) —
    with duplicates the ``last(...)`` pick at step 3 would be arbitrary
    within the tied group; ``validate=True`` enforces the precondition
    with one cheap aggregate on the (small) right side and raises on
    violation instead of returning a nondeterministic answer.
    ``payload_cols`` must not collide with any left column name (the
    output is left columns + payload columns; a collision would produce
    ambiguous duplicate columns, so it is rejected up front)."""
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload_cols {sorted(clash)} collide with left columns; "
            "rename or prefix the right-side payload"
        )
    if validate:
        dup = (
            right.groupBy(key, right_ts)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"asof_join: right side has duplicate ({key}, {right_ts}) "
                "rows — the at-or-before match would be nondeterministic; "
                "deduplicate or aggregate the right side first"
            )
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # rights first at equal ts
        payload.alias("_payload"),
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    merged = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).select("_row.*", "_match.*")
    return out
