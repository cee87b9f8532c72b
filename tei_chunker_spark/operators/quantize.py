"""Scalar quantization of an embedding column — the storage/IO half of
vector search at scale (operators/similarity.py is the compute half).

SQ8 (per-dimension min/max, 8-bit codes) is the standard first
compression step before ANN serving: 4x smaller than float32 with
near-lossless recall, and the decode is two flops per dimension.  The
reference has no vector surface at all; this belongs to the
LLM-data-pipeline family the task sheet requires (SURVEY.md §2.2 /
§2.4 embeddings rows).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embed_quantize(embeddings: DataFrame, levels: int = 255) -> DataFrame:
    """Per-dimension min/max scalar quantization of ``array<float>``
    embeddings to integer codes in ``[0, levels]``, plus the per-vector
    max reconstruction error.

    Code formula (computed in double on every engine):
    ``c_i = floor((x_i - mn_i) / (mx_i - mn_i) * levels + 0.5)`` —
    explicit ``floor(+0.5)``, NOT ``round()``: round() is HALF_UP in
    Spark SQL, banker's in pandas, and its own thing per engine, while
    floor in pure IEEE-double arithmetic is the one spelling every
    engine computes bit-identically (same reasoning as columns.py's
    WS_CLASS: never lean on an engine-defined default).  Constant
    dimensions (mx == mn) code to 0.  Reconstruction
    ``x̂_i = mn_i + c_i * (mx_i - mn_i) / levels``; ``max_err`` is the
    per-vector L∞ reconstruction error (order-independent max, so
    engine-exact before the final round).

    Output: ``(vec_id, codes: array<int>, max_err: double)``.

    Shape at 100 TB: stage 1 (per-dimension bounds) posexplodes to
    n×d rows but groupBy(dim) partial aggregation collapses each task's
    stream to d rows BEFORE the exchange — the shuffle carries
    tasks×d rows, never n×d.  Stage 2 folds the d-row bounds table into
    ONE row of two d-length arrays and broadcast-crosses it into the
    scan (the same 1-row-bounds device as relational.py's minmax
    normalize); codes and error are then pure scan-stage projections —
    one tiny shuffle total, no driver collect.  Higher-order functions
    are interpreted in Spark 4, but they run once per row over the
    broadcast arrays — no join re-inlining risk (the HOF sits above the
    generator-free cross join, not inside a filter)."""
    lv = F.lit(float(levels))
    dims = (
        embeddings.select(F.posexplode("embedding").alias("d", "_x"))
        .groupBy("d")
        .agg(
            F.min(F.col("_x").cast("double")).alias("mn"),
            F.max(F.col("_x").cast("double")).alias("mx"),
        )
    )
    # d rows -> 1 row of aligned arrays (sort_array on struct(d,..) keys
    # the order by dimension index)
    bounds = dims.agg(
        F.sort_array(F.collect_list(F.struct("d", "mn", "mx"))).alias("_b")
    ).select(F.col("_b.mn").alias("_mns"), F.col("_b.mx").alias("_mxs"))

    def _mn(i):
        return F.get("_mns", i)  # 0-based, accepts a Column index

    def _mx(i):
        return F.get("_mxs", i)

    def _code(x, i):
        return (
            F.when(
                _mx(i) > _mn(i),
                F.floor((x.cast("double") - _mn(i)) / (_mx(i) - _mn(i)) * lv + 0.5),
            )
            .otherwise(F.lit(0))
            .cast("int")
        )

    def _err(x, i):
        return F.abs(
            x.cast("double")
            - (_mn(i) + _code(x, i).cast("double") * (_mx(i) - _mn(i)) / lv)
        )

    return embeddings.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        F.transform("embedding", _code).alias("codes"),
        F.round(F.array_max(F.transform("embedding", _err)), 6).alias("max_err"),
    )
