"""Property-based tests (hypothesis) for the invariants the example
tests can only spot-check: packing prefix-sum contiguity, exact-cents /
decimal agreement, the winnowing detection guarantee, and LM score
bounds.  Small example counts — every example is a Spark job."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    lens=st.lists(st.integers(0, 25), min_size=1, max_size=10),
    bucket=st.sampled_from([2, 5, 64]),
)
@settings(**_SETTINGS)
def test_seq_pack_prefix_sum_property(spark, lens, bucket):
    """For ANY corpus and ANY bucket_size, start offsets are the exact
    prefix sums of token counts in doc_id order."""
    from tei_chunker_spark.operators.corpusops import seq_pack

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = sorted(
        seq_pack(docs, budget=7, bucket_size=bucket).collect(),
        key=lambda r: r.doc_id,
    )
    off = 0
    for r, n in zip(rows, lens):
        assert r.n_tokens == n
        assert r.start_offset == off
        off += n


@given(
    cents=st.lists(st.integers(-10**7, 10**7), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_csum_equals_dsum_for_two_decimal_values(spark, cents):
    """For values with <= 2 true decimal places the fast integer-cents
    sum equals the exact decimal(25,10) sum — the csum docstring's
    contract, over random ledgers including negatives."""
    from tei_chunker_spark.operators.relational import csum, dsum

    df = spark.createDataFrame(
        [(c / 100.0,) for c in cents], "v double"
    )
    r = df.agg(
        csum(F.col("v"), 2).alias("c"), dsum(F.col("v"), 2).alias("d")
    ).collect()[0]
    assert r.c == r.d


@given(
    noise_a=st.integers(0, 8),
    noise_b=st.integers(0, 8),
    run_len=st.integers(6, 10),  # >= k + w - 1 = 6
    data=st.data(),
)
@settings(**_SETTINGS)
def test_winnow_guarantee_property(spark, noise_a, noise_b, run_len, data):
    """Winnowing's paper guarantee, randomized: ANY shared token run of
    length >= k + w - 1 yields at least one identical selected
    fingerprint in both documents, wherever the run sits."""
    from tei_chunker_spark.operators.textstats import winnow_fingerprint_census

    run = [f"r{i}" for i in range(run_len)]
    a_toks = [f"a{i}" for i in range(noise_a)]
    b_toks = [f"b{i}" for i in range(noise_b)]
    pos_a = data.draw(st.integers(0, len(a_toks)))
    pos_b = data.draw(st.integers(0, len(b_toks)))
    doc_a = " ".join(a_toks[:pos_a] + run + a_toks[pos_a:])
    doc_b = " ".join(b_toks[:pos_b] + run + b_toks[pos_b:])
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in winnow_fingerprint_census(docs).collect()}
    assert out[1].n_shared_fp >= 1
    assert out[2].n_shared_fp >= 1


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_lm_score_bounds_property(spark, texts):
    """Laplace-smoothed transition ppm is always in (0, 10^6] for docs
    with transitions, NULL otherwise — no corpus can overflow or zero
    it."""
    from tei_chunker_spark.operators.corpusops import lm_bigram_score

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for r in lm_bigram_score(docs).collect():
        if r.n_transitions == 0:
            assert r.score_ppm is None
        else:
            assert 0 < r.score_ppm <= 10**6
