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


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a BUCKETED (and optionally per-bucket sorted)
    data-source table: ``bucketBy(n, key)`` writes each task's rows into
    hash(key)-addressed files and records the layout in the catalog, so
    downstream equi-joins and aggregations on ``key`` between tables
    bucketed the same way need NO shuffle — the co-location was paid once
    at write time.  This is the parquet-native analogue of the Iceberg
    ``bucket(P, doc_id)`` layout the extraction pipeline elides its
    shuffle on (scripts/iceberg_e2e.py), and the standard device for a
    fact table that will be joined on the same key by many queries at
    100 TB.  ``sortBy`` additionally orders rows inside each bucket file,
    letting a sort-merge join skip its per-partition sort when each
    bucket holds one file.

    Plain ``path``-based parquet cannot carry bucket metadata — the
    catalog table is what makes the layout visible to the planner —
    hence saveAsTable with an explicit external-table path."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).mode("overwrite").format("parquet").saveAsTable(
        table
    )
