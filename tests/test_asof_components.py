"""Unit tests for the as-of join and connected-components operators."""
from __future__ import annotations

from datetime import datetime

from tei_chunker_spark.operators.asof import asof_join
from tei_chunker_spark.operators.dedup import connected_components


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),  # before any right -> null
            (2, "a", _ts("2024-01-01 11:00:00")),  # equal ts -> matches r1
            (3, "a", _ts("2024-01-01 11:30:00")),  # between -> r1
            (4, "a", _ts("2024-01-01 12:05:00")),  # after r2 -> r2
            (5, "b", _ts("2024-01-01 12:00:00")),  # other key -> rb
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 11:00:00"), 10.0),
            ("a", _ts("2024-01-01 12:00:00"), 20.0),
            ("b", _ts("2024-01-01 11:59:00"), 99.0),
        ],
        "k string, rts timestamp, v double",
    )
    out = {
        r.id: r.v
        for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    }
    assert out == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: 99.0}


def test_connected_components(spark):
    # two chains and one isolated pair: {1,2,3,4}, {10,11}, {20,21,22}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "a_id long, b_id long",
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_long_chain_converges(spark):
    # a path graph of 12 nodes: diameter forces multiple iterations
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "a_id long, b_id long"
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {100}
    assert len(comp) == 12


def test_connected_components_log_rounds(spark):
    """Alternating large-star/small-star must converge in O(log n) rounds:
    a 200-node path graph (diameter 199) under a 12-iteration budget —
    plain min-label propagation would need ~200 rounds and raise."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000, 1199)], "a_id long, b_id long"
    )
    comp = {
        r.node: r.comp
        for r in connected_components(pairs, max_iterations=12).collect()
    }
    assert set(comp.values()) == {1000}
    assert len(comp) == 200


def test_asof_payload_collision_rejected(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 09:00:00"), 1.0)], "k string, rts timestamp, id double"
    )
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "ts", "rts", ["id"])


def test_asof_bucketed_equals_plain_across_widths(spark):
    """asof_join_bucketed must be row-identical to the plain shape for
    ANY bucket width (the width is a physical knob): swept from
    one-bucket-per-hour through one-bucket-for-everything, on the real
    events table keyed by the 5-value event_type — exactly the
    low-cardinality case the bucketed variant exists for."""
    from pyspark.sql import functions as F

    from tei_chunker_spark.operators.asof import asof_join, asof_join_bucketed

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hourly = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.avg("value").alias("avg_v"))
        .withColumn("hour_end", F.col("hour") + F.expr("INTERVAL 1 HOUR"))
        .select("event_type", "hour_end", "avg_v")
    )
    lefts = events.select("event_id", "ts", "event_type")
    plain = asof_join(
        lefts, hourly, key="event_type", left_ts="ts", right_ts="hour_end",
        payload_cols=["avg_v"],
    )
    want = sorted(map(tuple, plain.collect()))
    for width in (3600, 86400, 10**9):
        got = asof_join_bucketed(
            lefts, hourly, key="event_type", left_ts="ts",
            right_ts="hour_end", payload_cols=["avg_v"],
            bucket_seconds=width,
        )
        assert sorted(map(tuple, got.collect())) == want, width


def test_asof_bucketed_carry_across_empty_buckets(spark):
    """A left row several empty buckets after the last right must still
    match it (carry-in threads through bucket gaps); a left before any
    right gets NULL."""
    from tei_chunker_spark.operators.asof import asof_join_bucketed

    right = spark.createDataFrame(
        [("k", 1_000, 1.0), ("k", 2_000, 2.0)], "k string, rts long, pay double"
    )
    left = spark.createDataFrame(
        [("k", 500), ("k", 1_500), ("k", 900_000_000), ("x", 5_000)],
        "k string, lts long",
    )
    got = {
        (r.k, r.lts): r.pay
        for r in asof_join_bucketed(
            left, right, key="k", left_ts="lts", right_ts="rts",
            payload_cols=["pay"], bucket_seconds=60,
        ).collect()
    }
    assert got[("k", 500)] is None          # before any right
    assert got[("k", 1_500)] == 1.0          # within-bucket last
    assert got[("k", 900_000_000)] == 2.0    # carried across ~170 empty buckets
    assert got[("x", 5_000)] is None         # key with no rights at all


def test_asof_bucketed_plan_has_no_bare_key_window_over_data(spark):
    """The data-side window must be partitioned (key, bucket); the only
    bare-key window runs over the bucket census (input: an aggregate +
    distinct, not the event scan)."""
    import re

    from pyspark.sql import functions as F

    from tei_chunker_spark.operators.asof import asof_join_bucketed

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hourly = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.avg("value").alias("avg_v"))
        .withColumn("hour_end", F.col("hour") + F.expr("INTERVAL 1 HOUR"))
        .select("event_type", "hour_end", "avg_v")
    )
    out = asof_join_bucketed(
        events.select("event_id", "ts", "event_type"), hourly,
        key="event_type", left_ts="ts", right_ts="hour_end",
        payload_cols=["avg_v"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"windowspecdefinition\((_k#\d+(?:, _b#\d+L?)?),", plan)
    assert sorted(k.count("_b") for k in keys) == [0, 1], keys


def test_asof_bucketed_keeps_null_key_and_null_ts_rows(spark):
    """Left rows with NULL key or NULL timestamp are real rows the plain
    shape keeps (NULLS-FIRST ordering matches them against NULL-ts
    rights of the same key); the bucketed variant must keep them too —
    its carry attach is a null-safe LEFT join for exactly this reason
    (round-4 review find: a plain inner join dropped them)."""
    from tei_chunker_spark.operators.asof import asof_join, asof_join_bucketed

    right = spark.createDataFrame(
        [("a", 50, 1.0), ("a", None, 0.5), (None, 10, 9.0)],
        "k string, rts long, pay double",
    )
    left = spark.createDataFrame(
        [(1, "a", 100), (2, None, 150), (3, "a", None), (4, "b", 100),
         # id 5: its ONLY at-or-before right is the NULL-ts one, and it
         # sits in a LATER bucket than the NULL bucket — the carry-in
         # must propagate the NULL-ts payload (round-4 advisory: a bare
         # max_by(_payload, _ts) drops NULL-ts rows, so the NULL
         # bucket's _bucket_last was NULL and this row got NULL instead
         # of 0.5)
         (5, "a", 20)],
        "id long, k string, lts long",
    )
    kw = dict(key="k", left_ts="lts", right_ts="rts", payload_cols=["pay"])
    plain = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    assert (5, "a", 20, 0.5) in plain  # the case the carry must cover
    for width in (60, 7, 10**9):
        bucketed = sorted(
            map(
                tuple,
                asof_join_bucketed(
                    left, right, bucket_seconds=width, **kw
                ).collect(),
            )
        )
        assert bucketed == plain, width
        assert len(bucketed) == 5  # every left row survives
