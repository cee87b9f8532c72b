"""Corpus-curation batch driver: the end-to-end training-data job the
individual operators compose into.

    python -m tei_chunker_spark.curate \
        --input /data/documents --eval /data/benchmarks \
        --output /data/curated [--quality-min 0.5] \
        [--contamination-max 0.2] [--budget 256]

Stages (each is an already-oracled operator; this driver only wires
them):

1. exact dedup — keep the min-id copy of each byte-identical text
   (dedup.exact_dedup's grouping, applied as a semi-join);
2. quality floor — textstats.doc_quality composite >= --quality-min
   (NULL-scored degenerate docs fail);
3. decontamination — corpusops.contamination_stats trigram overlap vs
   the --eval set <= --contamination-max;
4. sequence packing — corpusops.seq_pack offsets over the survivors;
5. write survivors + packing columns as parquet, plus a one-row JSON
   census (the curation_census gate counts) next to it.

Shape at 100 TB: every stage is the operator's documented plan; gate
survivor id-tables are narrow; the packing output is written partitioned
by pack bucket so a downstream trainer reads aligned splits.  On a
cluster, swap the parquet read/write for the Iceberg table path —
operator plans are scan-agnostic (tests/test_iceberg.py).
"""
from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from .operators.corpusops import contamination_stats, seq_pack
from .operators.textstats import doc_quality
from .sources.session import get_spark


def curate(
    spark,
    documents,
    eval_docs,
    quality_min: float = 0.5,
    contamination_max: float = 0.2,
    budget: int = 256,
):
    """Run the funnel; returns (packed_survivors_df, census_dict).

    The census counts are collected from the narrow id-tables (four
    scalar aggregates), mirroring corpusops.curation_census."""
    n_input = documents.count()
    keep1 = (
        documents.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    g1 = documents.join(keep1, "doc_id", "left_semi")
    keep2 = (
        doc_quality(g1)
        .filter(F.col("quality") >= quality_min)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    g2 = g1.join(keep2, "doc_id", "left_semi")
    keep3 = (
        contamination_stats(g2, eval_docs, n=3)
        .filter(
            F.coalesce(F.col("contamination"), F.lit(0.0)) <= contamination_max
        )
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    g3 = g2.join(keep3, "doc_id", "left_semi")
    packed = g3.join(seq_pack(g3, budget=budget), "doc_id")
    census = {
        "input": n_input,
        "after_exact_dedup": keep1.count(),
        "after_quality": keep2.count(),
        "after_decontamination": keep3.count(),
    }
    return packed, census


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--eval", required=True, help="benchmark/eval parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--contamination-max", type=float, default=0.2)
    ap.add_argument("--budget", type=int, default=256)
    args = ap.parse_args(argv)

    spark = get_spark("tei-curate")
    docs = spark.read.parquet(args.input)
    eval_docs = spark.read.parquet(args.eval)
    packed, census = curate(
        spark,
        docs,
        eval_docs,
        quality_min=args.quality_min,
        contamination_max=args.contamination_max,
        budget=args.budget,
    )
    packed.withColumn(
        "pack_bucket", F.expr("first_pack div 1024")
    ).write.mode("overwrite").partitionBy("pack_bucket").parquet(args.output)
    with open(os.path.join(args.output, "_census.json"), "w") as fh:
        fh.write(json.dumps(census))
    print(f"census: {census}")
    print(f"done: {args.output}")


if __name__ == "__main__":
    main()
