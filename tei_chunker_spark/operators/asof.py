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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: List[str],
    bucket_seconds: int = 86400,
    validate: bool = False,
) -> DataFrame:
    """Scale-safe as-of join for LOW-cardinality keys, output-identical
    to ``asof_join``.

    The plain union + last-over-window shape partitions on the join key
    alone — correct, but with a handful of key values (instrument
    symbols, event types) one key's ENTIRE history lands on one task at
    100 TB.  This variant applies the engine's two-level device
    (seq_pack's): windows run per (key, time bucket) — splittable by
    ``bucket_seconds`` — and the cross-bucket dependency is carried by a
    per-key census pass over buckets, a table with one row per (key,
    active bucket), orders of magnitude smaller than the data:

      1. bucket both sides: b = floor(epoch_micros / bucket
         width) (pmod-corrected integer floor — exact, sign-safe);
      2. rights-per-bucket LAST payload: one hash aggregate
         (``max_by(payload, ts)``; rights unique per (key, ts));
      3. carry-in per (key, bucket) over the census of ALL active
         buckets (either side): last non-null bucket-final payload from
         any EARLIER bucket — the only per-key ordered window, over the
         census, never the data;
      4. within each (key, bucket): the same union + last-ignorenulls
         window as the plain shape, then coalesce with the carry-in.

    A left row's match is the within-bucket last right if one precedes
    it, else the carry-in — exactly the global last-at-or-before.
    ``bucket_seconds`` sizes the stage-4 partitions: pick data-span /
    bucket_seconds >> cores (correctness is invariant to it —
    test_asof_bucketed_equals_plain sweeps widths)."""
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
                f"asof_join_bucketed: right side has duplicate ({key}, "
                f"{right_ts}) rows — deduplicate or aggregate first"
            )
    width_us = int(bucket_seconds) * 1_000_000

    def bucketed(df: DataFrame, ts: str) -> DataFrame:
        # exact floor for any sign, pure integer arithmetic: (us - pmod)
        # is a multiple of W, `div` keeps it in long — no 2^53 double
        # precision cliff (same idiom as seq_pack's round-3 fix)
        return (
            df.withColumn("_us", F.unix_micros(F.col(ts).cast("timestamp")))
            .withColumn(
                "_b", F.expr(f"(_us - pmod(_us, {width_us})) div {width_us}")
            )
            .drop("_us")
        )

    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = bucketed(
        right.select(
            F.col(key).alias("_k"),
            F.col(right_ts).alias("_ts"),
            F.lit(0).alias("_side"),
            payload.alias("_payload"),
        ),
        "_ts",
    )
    l = bucketed(  # noqa: E741
        left.select(
            F.col(key).alias("_k"),
            F.col(left_ts).alias("_ts"),
            F.lit(1).alias("_side"),
            F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
            F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        ),
        "_ts",
    )
    # (2) bucket-final right payload, one hash agg (map-side partials).
    # The ordering value is a struct ranking NULL ts SMALLEST (matching
    # the plain shape's NULLS-FIRST (ts, side) order) — a bare
    # max_by(_payload, _ts) silently DROPS rows whose ts is NULL, so the
    # NULL bucket's payload would never reach the carry-in even though
    # the plain shape propagates it to every later row (round-4 advisory,
    # verified divergence).
    rlast = r.groupBy("_k", "_b").agg(
        F.max_by(
            "_payload", F.struct(F.col("_ts").isNotNull(), F.col("_ts"))
        ).alias("_bucket_last")
    )
    # (3) census of active buckets on either side; carry-in = last
    # bucket-final payload from any strictly earlier bucket.  The ONLY
    # per-key ordered window, over the census table.
    # null-safe: NULL-key / NULL-bucket rights are real groups (the
    # plain shape's NULLS-FIRST ordering matches them) and a standard
    # equality join would strand their bucket-final payloads
    rlast_r = rlast.select(
        F.col("_k").alias("_rk"), F.col("_b").alias("_rb"), "_bucket_last"
    )
    census = (
        r.select("_k", "_b")
        .unionByName(l.select("_k", "_b"))
        .distinct()
        .join(
            rlast_r,
            F.col("_k").eqNullSafe(F.col("_rk"))
            & F.col("_b").eqNullSafe(F.col("_rb")),
            "left",
        )
        .drop("_rk", "_rb")
    )
    w_census = (
        Window.partitionBy("_k").orderBy("_b").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    carry = census.select(
        "_k",
        "_b",
        F.last("_bucket_last", ignorenulls=True).over(w_census).alias("_carry"),
    )
    # (4) per-(key, bucket) window + carry coalesce.  The carry attach
    # must be a NULL-SAFE left join: left rows with a NULL key or NULL
    # timestamp (NULL bucket) are real rows the plain shape keeps — a
    # plain inner equi-join would silently drop them (round-4 review
    # find, verified).  Window partitioning and the census distinct both
    # group NULLs, so the NULL-keyed census rows exist to match; the
    # NULL bucket sorts FIRST in the census order, mirroring the plain
    # shape's NULLS-FIRST (ts, side) ordering.
    merged = r.withColumn(
        "_row", F.lit(None).cast(l.schema["_row"].dataType)
    ).unionByName(l)
    w = (
        Window.partitionBy("_k", "_b")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry_r = carry.select(
        F.col("_k").alias("_ck"), F.col("_b").alias("_cb"), "_carry"
    )
    filled = (
        merged.withColumn("_local", F.last("_payload", ignorenulls=True).over(w))
        .join(
            carry_r,
            F.col("_k").eqNullSafe(F.col("_ck"))
            & F.col("_b").eqNullSafe(F.col("_cb")),
            "left",
        )
        .withColumn("_match", F.coalesce("_local", "_carry"))
    )
    return filled.filter(F.col("_side") == 1).select("_row.*", "_match.*")
