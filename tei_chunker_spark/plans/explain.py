"""Plan-shape assertions: cheap guardrails that keep the 100 TB plan from
silently regressing (used by tests and ad-hoc inspection).
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (excludes broadcasts and reuse)."""
    return sum(
        1
        for line in executed_plan(df).splitlines()
        if "Exchange" in line and "Reused" not in line and "Broadcast" not in line
    )


def count_broadcasts(df: DataFrame) -> int:
    return sum(
        1
        for line in executed_plan(df).splitlines()
        if "BroadcastExchange" in line
    )


def scan_read_schemas(df: DataFrame) -> List[str]:
    """ReadSchema fragments of every scan — verifies column pruning."""
    return [
        line.strip()
        for line in executed_plan(df).splitlines()
        if "ReadSchema" in line
    ]
