"""Skew-proofing tests for the band-key candidate joins (round-2 verdict
item 1): exact-dup pre-collapse must be output-identical, must survive an
adversarial hot cluster (>= 5k byte-identical docs) that would give the
uncollapsed band join B^2/2 candidate rows in the expensive verify stage,
and the per-band df cap must drop non-identical hot bands explicitly."""
from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tei_chunker_spark.operators.dedup import (
    _assert_star_forest,
    _collapse_exact,
    minhash_lsh_pairs,
    simhash_banded_pairs,
)


def _mixed_corpus(spark):
    """Unique docs + two exact-dup groups + a near-dup pair + a short doc
    whose exact twin has zero shingles (the NULL-band edge case)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "an entirely different document about spark physical planning"),
        (3, "duplicated boilerplate header text shared by many documents here"),
        (4, "duplicated boilerplate header text shared by many documents here"),
        (5, "duplicated boilerplate header text shared by many documents here"),
        (6, "the quick brown fox jumps over the lazy dog again and again"),
        (7, "the quick brown fox jumps over the lazy dog again and again today"),
        (8, "word"),  # one token -> zero 2-gram shingles
        (9, "word"),  # exact twin of 8: must NOT pair via minhash (no band)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collapse_exact_mapping(spark):
    mapping, reps = _collapse_exact(_mixed_corpus(spark))
    m = {r.doc_id: r.rep_id for r in mapping.collect()}
    assert m == {1: 1, 2: 2, 3: 3, 4: 3, 5: 3, 6: 1, 7: 7, 8: 8, 9: 8}
    assert sorted(r.doc_id for r in reps.collect()) == [1, 2, 3, 7, 8]


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_minhash_collapse_output_identical(spark, threshold):
    docs = _mixed_corpus(spark)
    got = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=threshold).collect())
    )
    want = sorted(
        map(
            tuple,
            minhash_lsh_pairs(docs, threshold=threshold, collapse_exact=False).collect(),
        )
    )
    assert got == want
    # sanity: the exact groups do pair at jaccard 1.0, the shingle-less
    # twins (8, 9) do not.
    ids = {(a, b) for a, b, _ in got}
    assert {(3, 4), (3, 5), (4, 5), (1, 6)} <= ids
    assert (8, 9) not in ids


def test_simhash_banded_collapse_output_identical(spark):
    docs = _mixed_corpus(spark)
    got = sorted(map(tuple, simhash_banded_pairs(docs).collect()))
    want = sorted(
        map(tuple, simhash_banded_pairs(docs, collapse_exact=False).collect())
    )
    assert got == want
    # identical one-token docs share a signature -> hamming 0 via collapse.
    assert (8, 9, 0) in got


def test_hot_cluster_minhash_bounded(spark):
    """>= 5k byte-identical docs: the uncollapsed band join would route
    ~12.5M candidate pairs x ~10 shingles each through the exact-Jaccard
    verify (hundreds of millions of posting rows — minutes to OOM); with
    the collapse the verify sees ONE representative and the quadratic part
    is only the final (correct) answer expansion."""
    n = 5000
    boiler = "identical boilerplate paragraph repeated verbatim across the corpus"
    rows = [(100000 + i, boiler) for i in range(n)]
    rows += [(i, f"unique filler document number {i} speaking of topic {i * 17}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.time()
    out = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = out.count()
    wall = time.time() - t0
    assert n_pairs == n * (n - 1) // 2
    # Generous bound: the collapsed plan runs in a few seconds; the
    # uncollapsed plan does not finish in minutes.
    assert wall < 120, f"hot-cluster LSH took {wall:.0f}s — skew defense regressed"
    # and all expanded pairs carry the degenerate exact score
    assert out.filter(F.col("jaccard") != 1.0).limit(1).count() == 0


def test_hot_cluster_simhash_banded_bounded(spark):
    n = 5000
    boiler = "identical boilerplate paragraph repeated verbatim across the corpus"
    rows = [(100000 + i, boiler) for i in range(n)]
    rows += [(i, f"unique filler document number {i} about subject {i * 13}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.time()
    n_pairs = simhash_banded_pairs(docs).count()
    wall = time.time() - t0
    assert n_pairs >= n * (n - 1) // 2
    assert wall < 120, f"hot-cluster banded simhash took {wall:.0f}s"


def test_max_band_df_caps_non_identical_hot_band(spark):
    """Docs with DIFFERENT texts but identical shingle sets defeat the
    exact-dup collapse; the per-band df cap is the explicit (recall-traded)
    guillotine for that residual case."""
    rows = [(i, "alpha beta " * (i + 2)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(docs, threshold=0.5).count()
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_band_df=10).count()
    assert uncapped == 50 * 49 // 2  # same shingle set -> jaccard 1.0
    assert capped == 0  # the one hot band exceeded the cap and was dropped


def test_star_forest_assertion_rejects_chain(spark):
    """_assert_star_forest must reject a symmetric edge set that is not a
    disjoint min-centered star forest (here: the path 1-2-3)."""
    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="star forest"):
        _assert_star_forest(sym)
    stars = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (7, 9), (9, 7)], "u long, v long"
    )
    _assert_star_forest(stars)  # must not raise
