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
from .textstats import simhash64

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


def minhash_signatures_from(shingles: DataFrame) -> DataFrame:
    """k=4 MinHash signature from a (doc_id, shingle) posting table: per
    seed, the lexicographic min of md5(seed || shingle) over the doc's
    word-n-gram set.

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
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_signatures(documents: DataFrame, n: int = 2) -> DataFrame:
    return minhash_signatures_from(shingle_table(documents, n))


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
        # The capped posting table feeds sizes + the intersection join:
        # materialize it once (eager local checkpoint) instead of
        # re-tokenizing the corpus per reference.  localCheckpoint (not
        # persist) on purpose: its RDD blocks are ContextCleaner-managed
        # and freed when the result is garbage-collected, whereas a
        # Dataset persist stays in the CacheManager until an explicit
        # unpersist — a leak across a long session.  On a real cluster
        # with executor loss, use reliable checkpointing or a table write
        # between stages instead.
        shingles = shingles.join(keep, "shingle").localCheckpoint(eager=True)
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
    """LSH candidate pairs (2 bands x 2 rows) verified by exact Jaccard.

    The posting table feeds BOTH the signature build and the exact-Jaccard
    verify; it is materialized once (eager local checkpoint, whose RDD
    blocks the ContextCleaner frees on GC — unlike a Dataset persist,
    which the CacheManager holds until explicit unpersist) so the corpus
    is tokenized/shingled ONCE per invocation instead of twice (at 10^12
    docs the duplicate expression tree would re-read every document).
    Construction is therefore partially EAGER: the posting build runs when
    this function is called, not at the first action."""
    sh = shingle_table(documents, n).localCheckpoint(eager=True)
    sig = minhash_signatures_from(sh)
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
    return jaccard_pairs(sh, cands, threshold)


def simhash_pairs(documents: DataFrame) -> DataFrame:
    """Doc pairs with identical 64-bit simhash (hamming distance 0).

    A plain key-equality shuffle on the full signature.  With 64-bit keys
    the bucket domain is 2^64, so (unlike the 16-bit round-1 version,
    whose 65,536 buckets degenerated toward per-bucket cartesian joins as
    the corpus grows) group sizes stay proportional to true duplicate
    clusters at any corpus size."""
    sig = simhash64(documents)
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


def simhash_banded_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash with hamming distance <=
    ``max_hamming`` (default 3) — the actual point of simhash: near-misses,
    not just identical signatures.

    Banding argument (pigeonhole): split the signature into 4 disjoint
    16-bit bands; any pair differing in <= 3 bits must agree EXACTLY on at
    least one band, so the union of the four per-band equi-joins contains
    every qualifying pair.  Physically: one posexplode to a (band_idx,
    band_val) posting table, ONE shuffle on the compound band key, then an
    exact bit_count(xor) verify on the candidates.  Requires
    max_hamming <= 3 (4 bands recall-complete only up to 3 differing bits).
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("4x16-bit banding is recall-complete only for max_hamming <= 3")
    sig = simhash64(documents)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), i -> shiftright(simhash, 16 * i) & 65535)"
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.expr("cast(bit_count(sim_a ^ sim_b) as int)")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    """Undirected edge set as both directed rows, deduped, no self-loops."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")).filter(
                F.col("u") != F.col("v")
            )
        )
        .distinct()
    )


def _star(sym: DataFrame, larger: bool) -> DataFrame:
    """One star operation (Kiveris et al., "Connected Components in
    MapReduce and Beyond", algorithms 3/4).

    Per node u with neighborhood G(u) and m = min(G(u) + {u}):
    large-star connects every STRICTLY LARGER neighbor to m,
    small-star every neighbor <= u; both also connect u itself to m.
    Input/output are symmetric edge sets."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    j = sym.join(mins, "u").select(
        "u", "v", F.least(F.col("u"), F.col("mn")).alias("m")
    )
    cond = (F.col("v") > F.col("u")) if larger else (F.col("v") <= F.col("u"))
    out = j.filter(cond).select(F.col("v").alias("u"), F.col("m").alias("v"))
    out = out.unionByName(j.select("u", F.col("m").alias("v")).distinct())
    return _symmetric(out)


def connected_components(
    pairs: DataFrame, max_iterations: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """Cluster near-duplicate pairs into components: (node, comp) where
    comp = min node id in the connected component.

    The step after pair-finding in every dedup pipeline — duplicates are
    transitive, so keep one canonical doc per COMPONENT, not per pair.
    Alternating large-star/small-star contraction (Kiveris et al.): each
    round halves long chains toward stars centered at the component
    minimum, converging in O(log n) rounds — unlike plain min-label
    propagation, whose round count is the component DIAMETER (a 10^6-long
    near-dup chain at corpus scale would need 10^6 barriers).
    ``localCheckpoint`` per round truncates lineage (standard Spark
    iterative discipline); convergence = the symmetric edge set reaches
    its fixed point (disjoint min-centered stars).  Deterministic output.
    """
    edges = pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    nodes = (
        edges.select("u")
        .unionByName(edges.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
    )
    sym = _symmetric(edges).localCheckpoint(eager=True)
    for i in range(max_iterations):
        new_sym = _star(_star(sym, larger=True), larger=False)
        if (i + 1) % checkpoint_every == 0:
            new_sym = new_sym.localCheckpoint(eager=True)
        # Fixed point iff the symmetric sets are equal; both are distinct
        # sets, so equality == same count AND empty difference.
        changed = (
            new_sym.count() != sym.count()
            or new_sym.subtract(sym).limit(1).count() > 0
        )
        sym = new_sym
        if not changed:
            mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
            return nodes.join(
                mins, nodes.node == mins.u, "left"
            ).select(
                "node",
                F.least(
                    F.col("node"), F.coalesce(F.col("mn"), F.col("node"))
                ).alias("comp"),
            )
    # Silent non-convergence would split one duplicate cluster into several
    # "canonical" docs — fail loudly instead (raise, don't approximate).
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "raise max_iterations"
    )


def canonical_assignment(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """End-to-end dedup decision table: every document mapped to the
    canonical doc of its near-duplicate component.

    (doc_id, canonical_id, is_canonical): docs in no pair are their own
    canonical; in a component the min doc_id wins (transitively, via
    connected_components — pairwise 'keep a, drop b' rules are wrong the
    moment duplicates chain).  This is the table a 100 TB curation job
    joins back against the corpus to filter."""
    comps = connected_components(pairs)
    return (
        documents.select("doc_id")
        .join(comps, documents["doc_id"] == comps["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
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
