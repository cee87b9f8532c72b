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
