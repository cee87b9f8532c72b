"""Table registry over the driver-provided parquet test data.

``load(spark, sf_dir, name)`` is the single entry point used by queries,
tests, and bench; on a cluster the same names resolve through the Iceberg
catalog instead (format chosen by JobConfig.input_format).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
