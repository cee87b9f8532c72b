"""Round-6 operator tests: salted decile tie-groups on degenerate
fixed-length corpora, NULL-lang decile slices, merge_upsert op-domain
validation, and null-source budget sampling."""
from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tei_chunker_spark.functions.columns import token_count
from tei_chunker_spark.operators import corpusops, relational

SF = "/root/testdata/sf0.001"


# --- doc_length_deciles hardening -------------------------------------------


def _native_ntile_census(docs, k=10):
    base = docs.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return (
        base.withColumn(
            "decile",
            F.ntile(k).over(
                Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
            ),
        )
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def test_deciles_fixed_length_corpus_splits_tie_window(spark):
    """Adversarial corpus: 10^5 identical-length docs in ONE language —
    exactly what boilerplate/dedup outputs produce.  The old tie window
    partitioned by (lang, n_tokens) would put ALL rows on one task; the
    md5-salted sub-bucket must split it, and the census must still equal
    native ntile's."""
    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("alpha beta gamma").alias("text"),
    )
    out = relational.doc_length_deciles(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the salted data-side window exists ...
    assert "_sb#" in plan
    got = {(r.lang, r.decile): r for r in out.collect()}
    # ... and the ntile census is exact: 10 deciles x 10^4 docs, all at
    # the constant length 3
    assert len(got) == 10
    assert all(
        r.n_docs == 10_000 and r.min_tokens == 3 and r.max_tokens == 3
        for r in got.values()
    )


def test_deciles_null_lang_slice_kept(spark):
    """NULL-lang documents form their own decile partition (native
    ntile-partition-by semantics); the census joins must be null-safe
    instead of silently dropping the slice (round-5 advisory)."""
    rows = [(i, "w " * (i % 7 + 1), None if i % 3 == 0 else "en") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = relational.doc_length_deciles(docs)
    naive = _native_ntile_census(docs)
    assert got.filter(F.col("lang").isNull()).count() > 0
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_deciles_salt_knob_invariance(spark):
    """The output census is invariant to n_salt_nibbles — the salt only
    re-buckets interchangeable tie members."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = relational.doc_length_deciles(docs, n_salt_nibbles=1)
    b = relational.doc_length_deciles(docs, n_salt_nibbles=3)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# --- merge_upsert op domain -------------------------------------------------


def test_merge_upsert_rejects_out_of_domain_op(spark):
    from tei_chunker_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", "s")], "doc_id long, text string, source string"
    )
    for bad in ["update", "Upsert", None]:
        changes = spark.createDataFrame(
            [(1, bad, "b", "s")],
            "doc_id long, op string, text string, source string",
        )
        with pytest.raises(ValueError, match="op values outside"):
            merge_upsert(base, changes)


def test_merge_upsert_valid_ops_still_work(spark):
    from tei_chunker_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s")],
        "doc_id long, text string, source string",
    )
    changes = spark.createDataFrame(
        [(1, "delete", None, None), (3, "upsert", "c", "t")],
        "doc_id long, op string, text string, source string",
    )
    got = {r.doc_id: r for r in merge_upsert(base, changes).collect()}
    assert set(got) == {2, 3}
    assert got[3].text == "c" and got[3].source == "t"


# --- budget_sample_census null source ----------------------------------------


def test_budget_sample_null_source_kept(spark):
    """A NULL source must flow through the offset broadcast join (null-safe)
    and land in the census with the default budget applied."""
    rows = [(str(i), None if i < 5 else "web", "tok " * (i + 1)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = corpusops.budget_sample_census(docs, {"web": 10}, default_budget=4)
    rows = {r.source: r for r in out.collect()}
    assert None in rows and rows[None].n_docs == 5
    assert rows[None].budget == 4 and rows[None].n_kept >= 1
    assert rows["web"].n_docs == 5


# --- curate CLI: string ids + cluster-safe census ----------------------------


def test_curate_string_ids_dispatch_and_contiguous_offsets(spark):
    """The north-rule input table has doc_id: string — curate must route
    packing through seq_pack_by_hash (seq_pack's `doc_id div 64` casts a
    non-numeric string to NULL, collapsing every doc into ONE window
    task).  Offsets must still tile the token stream contiguously, and
    the hash bucketing must actually produce multiple buckets."""
    from tei_chunker_spark.curate import curate, pick_packer
    from tei_chunker_spark.operators.corpusops import (
        seq_pack,
        seq_pack_by_hash,
    )

    rows = [
        (f"doc-é{i}-x", "web", "tok " * (i % 9 + 3)) for i in range(80)
    ] + [("zzz-unicode-中文", "web", "a b c")]
    docs = spark.createDataFrame(
        rows, "doc_id string, source string, text string"
    ).withColumn("lang", F.lit("en"))
    assert pick_packer(docs) is seq_pack_by_hash
    ints = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    assert pick_packer(ints) is seq_pack

    packed, census = curate(spark, docs, docs.limit(0), quality_min=-1.0)
    assert census["input"] == 81
    got = sorted(packed.collect(), key=lambda r: r.start_offset)
    assert len(got) == census["after_decontamination"] > 0
    off = 0
    for r in got:
        assert r.start_offset == off, (r.doc_id, r.start_offset, off)
        off += r.n_tokens
    # the hash packer really multi-buckets this corpus (no NULL collapse)
    n_buckets = (
        seq_pack_by_hash(docs).select("bucket").distinct().count()
    )
    assert n_buckets > 1


def test_curate_census_written_via_hadoop_fs(spark, tmp_path):
    """--output as a file: URI (any Hadoop-supported scheme) — the census
    must land through the FileSystem API; a local open() on a URI path
    would raise ENOENT after the whole job had already run."""
    import json
    import os

    from tei_chunker_spark.curate import main

    out_dir = str(tmp_path / "curated_uri")
    src = f"{SF}/documents.parquet"
    main(["--input", src, "--eval", src, "--output", f"file:{out_dir}"])
    with open(os.path.join(out_dir, "_census.json")) as fh:
        c = json.load(fh)
    assert c["after_decontamination"] == 0  # eval == train: all removed
    assert c["input"] > 0


# --- bpe_train ---------------------------------------------------------------


def test_bpe_train_iterates_merges_over_merged_symbols(spark):
    """Step 2 must count pairs over the POST-step-1 segmentation: with
    'the' dominant, step 1 merges (h,e) [tie with (t,h) broken
    alphabetically] and step 2 merges (t,he) — a pair that only exists
    after step 1.  Counts are overlap-inclusive adjacent pairs weighted
    by word frequency."""
    from tei_chunker_spark.operators.corpusops import bpe_train

    docs = spark.createDataFrame(
        [(1, "the theme thesis"), (2, "the the band"), (3, "x")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=2).collect()]
    assert got == [(1, "h", "e", "he", 5), (2, "t", "he", "the", 5)]


def test_bpe_train_greedy_overlap_and_exhaustion(spark):
    """'aaa' counts the overlapping (a,a) twice but merges greedily
    left-to-right to [aa, a]; once every word is one symbol the loop
    stops early instead of erroring."""
    from tei_chunker_spark.operators.corpusops import bpe_train

    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    # step 1: (a,a) x2 overlap x freq 2 = 4 -> 'aa'; vocab ['aa','a']
    # step 2: (aa,a) x freq 2 = 2 -> 'aaa'; then no pairs remain
    assert got == [(1, "a", "a", "aa", 4), (2, "aa", "a", "aaa", 2)]


def test_bpe_segment_census_applies_trained_merges(spark):
    """With merges (h,e) then (t,he) trained from this corpus, 'the'
    segments to 1 symbol and 'theme' to [the, m, e] = 3; per-doc BPE
    token counts must reflect the final segmentation."""
    from tei_chunker_spark.operators.corpusops import bpe_segment_census

    docs = spark.createDataFrame(
        [(1, "the theme thesis"), (2, "the the band"), (3, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_segment_census(docs, n_merges=2).collect()}
    # doc 1: the=1, theme=[the,m,e]=3, thesis=[the,s,i,s]=4 -> 8
    assert got[1].n_words == 3 and got[1].n_bpe_tokens == 8
    # doc 2: the=1, the=1, band=4 -> 6
    assert got[2].n_words == 3 and got[2].n_bpe_tokens == 6
    assert got[3].n_words == 1 and got[3].n_bpe_tokens == 1
