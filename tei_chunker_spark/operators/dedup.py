"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the 100 TB story):

* ``exact_dedup`` is one hash-aggregate on md5(text) — map-side partial
  aggregation makes the shuffle carry one row per distinct hash.
* MinHash/LSH: signatures are per-row scalar expressions (no shuffle);
  candidate generation shuffles once on the *band key* — the whole point of
  LSH is that this join key is selective, so the shuffle is tiny relative
  to a naive pairwise join.  Verification (exact Jaccard) runs only on
  candidates.
* SimHash pairs join on the 64/16-bit signature — again a key-equality
  shuffle, never a cross join.
* n-gram Jaccard joins on shared shingles; at corpus scale you'd cap the
  per-shingle posting list (drop shingles with document frequency above a
  threshold — stopword shingles contribute no discrimination anyway).
  ``max_shingle_df`` implements that cap.
* embedding near-dup buckets by a coarse key (here: the label/IVF cell) so
  the quadratic verify runs per-bucket only.

The LSH/minhash hash domain is lexicographic md5 strings — deliberately
portable so the DuckDB oracles reproduce results exactly.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import cosine, tokens, word_ngrams
from .textstats import simhash16

MINHASH_SEEDS = ("s0/", "s1/", "s2/", "s3/")


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Group identical texts; canonical doc = min doc_id per group."""
    return (
        documents.select(F.md5("text").alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _tokens_materialized(documents: DataFrame) -> DataFrame:
    """(doc_id, tok: array<string>) with the split FORCED to happen once.

    ``explode(array(split(...)))`` is a generator, and projection collapsing
    cannot inline expressions through a generator boundary — without it,
    Catalyst substitutes the ``split`` subtree into every ``element_at``
    reference and interpreted higher-order functions re-split the text per
    element (measured: a 5k-row band join took 38 s because each probe
    re-evaluated ~200 splits; with this barrier the same join is <1 s)."""
    return documents.select(
        "doc_id", F.explode(F.array(tokens(F.col("text")))).alias("tok")
    )


def shingle_table(documents: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, shingle) distinct word-n-gram postings."""
    return _tokens_materialized(documents).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("tok"), n))).alias("shingle"),
    )


def minhash_signatures(documents: DataFrame, n: int = 2) -> DataFrame:
    """k=4 MinHash signature: per seed, the lexicographic min of
    md5(seed || shingle) over the doc's word-n-gram set.

    Computed as a hash aggregate over the posting table (map-side partial
    min -> one narrow row per doc), which also materializes the signature:
    downstream band joins touch plain columns, never the shingle
    expression tree.  Docs with zero shingles drop out here — they can't
    produce candidates anyway (the expression-version would carry NULLs
    into the band join, where they'd be dropped by the equi-join)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(seed), F.col("shingle")))).alias(f"mh{i}")
        for i, seed in enumerate(MINHASH_SEEDS)
    ]
    return shingle_table(documents, n).groupBy("doc_id").agg(*aggs)


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame = None,
    threshold: float = 0.5,
    max_shingle_df: int = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for doc pairs (a_id < b_id).

    With ``candidates`` (a_id, b_id) the verify is restricted to those
    pairs; otherwise all pairs sharing >= 1 shingle are scored.
    ``max_shingle_df`` drops shingles whose document frequency exceeds the
    cap before pairing (posting-list guillotine for scale)."""
    if max_shingle_df is not None:
        keep = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        shingles = shingles.join(keep, "shingle")
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    if candidates is not None:
        # Verify-only-candidates: route the posting join THROUGH the pair
        # list instead of exploding all co-occurring docs — |pairs| x
        # |shingles-per-doc| instead of sum(df^2).  This is what makes LSH
        # verification linear-ish at corpus scale.
        a = shingles.select(F.col("doc_id").alias("a_id"), "shingle")
        b = shingles.select(F.col("doc_id").alias("b_id"), "shingle")
        inter = (
            candidates.join(a, "a_id")
            .join(b, ["b_id", "shingle"])
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # All-pairs mode: postings with document frequency 1 can never
        # produce a pair — drop them from the JOIN side only (sizes above
        # already counted them, so Jaccard is unchanged).
        paired = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= 2)
            .select("shingle")
        )
        joinable = shingles.join(paired, "shingle")
        a = joinable.alias("a")
        b = joinable.alias("b")
        inter = (
            a.join(b, on=(F.col("a.shingle") == F.col("b.shingle")))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("set_size", "a_size")
    sb = sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("set_size", "b_size")
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("inter") / (F.col("a_size") + F.col("b_size") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    documents: DataFrame, n: int = 2, threshold: float = 0.5
) -> DataFrame:
    """LSH candidate pairs (2 bands x 2 rows) verified by exact Jaccard."""
    sig = minhash_signatures(documents, n)
    # F.concat (not concat_ws): NULL-propagating like SQL ||, so a doc with
    # no shingles gets a NULL band and drops out of the equi-join cleanly.
    bands = sig.select(
        "doc_id",
        F.concat("mh0", F.lit("|"), "mh1").alias("band0"),
        F.concat("mh2", F.lit("|"), "mh3").alias("band1"),
    )
    cands = None
    for band in ("band0", "band1"):
        x = bands.alias("x")
        y = bands.alias("y")
        c = (
            x.join(y, F.col(f"x.{band}") == F.col(f"y.{band}"))
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    return jaccard_pairs(shingle_table(documents, n), cands, threshold)


def simhash_pairs(documents: DataFrame) -> DataFrame:
    """Doc pairs with identical 16-bit simhash (hamming distance 0)."""
    sig = simhash16(documents)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, F.col("a.simhash") == F.col("b.simhash"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("simhash"),
        )
    )


def connected_components(
    pairs: DataFrame, max_iterations: int = 50, checkpoint_every: int = 5
) -> DataFrame:
    """Cluster near-duplicate pairs into components: (node, comp) where
    comp = min node id in the connected component.

    The step after pair-finding in every dedup pipeline — duplicates are
    transitive, so keep one canonical doc per COMPONENT, not per pair.
    Iterative min-label propagation (small-star style): each round every
    node takes the min label among itself and its neighbors; converges in
    O(component diameter) rounds.  ``localCheckpoint`` every few rounds
    truncates the lineage so plans stay bounded (the standard Spark
    iterative-algorithm discipline).  Deterministic output.
    """
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("_changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    # Silent non-convergence would split one duplicate cluster into several
    # "canonical" docs — fail loudly instead (raise, don't approximate).
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(component diameter exceeds the iteration budget); raise "
        "max_iterations"
    )


def embedding_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, bucket_col: str = "label"
) -> DataFrame:
    """Near-duplicate vectors: cosine >= threshold within a coarse bucket.

    The bucket join bounds the quadratic blow-up; at scale the bucket is an
    IVF cell id from a trained codebook — here the provided label column
    plays that role."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    return (
        a.join(b, F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
