"""Driver-contract tests: a fast subset of __spark_entry__ queries checked
against their DuckDB oracles at sf0.001 (the full battery runs at sf0.01
via scripts/check_oracles.py and the round driver)."""
from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tei_chunker_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver test data not available"
)

FAST_ORACLED = [
    "extract_spans_pipeline",
    "extract_doc_metrics",
    "extract_sections",
    "media_features_stub",
    "media_frame_sample",
    "doc_stats",
    "doc_quality",
    "doc_langid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_banded",
    "ann_ivf_trained",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "resume_anti_join",
    "metrics_rollup",
    "top_docs_per_lang",
    "events_hourly",
    "events_sessionize",
    "events_quantiles",
    "events_value_mad",
    "events_asof_enrich",
    "pricing_summary",
    "revenue_by_nation",
    "revenue_filter_agg",
    "top_orders_by_revenue",
    "dedup_components",
    "dedup_canonical",
    "pii_scrub",
    "hash_split_census",
    "events_range_join",
    "events_interval_overlap",
    "user_event_paths",
    "supplier_census",
    "part_type_stats",
    # round-4 additions
    "seq_pack_hash",
    "decontaminate",
    "doc_repetition",
    "events_asof_bucketed",
    "curation_census",
    # round-5 additions
    "vocab_coverage",
    "source_stats",
    "embed_quantize",
    "pq_encode",
    "pq_adc_topk",
    "dedup_normalized",
    "snapshot_diff",
    "merge_upsert",
    "bpe_pairs",
    "budget_sample",
    "rollup_merge",
    "ivf_pq_topk",
    "ivf_pq_multiprobe",
    "revenue_grouping_sets",
    "doc_length_deciles",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


from tei_chunker_spark.testing import normalize_for_compare as _normalize


@pytest.mark.parametrize("name", FAST_ORACLED)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.sql(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    pd.testing.assert_frame_equal(
        _normalize(sdf), _normalize(odf), check_dtype=False, rtol=0, atol=0
    )


def test_every_query_has_oracle():
    """Every queries() entry has a DuckDB oracle — the whole-document-fold
    queries via the precomputed golden fixtures (scripts/
    make_golden_fixtures.py), everything else via plain SQL."""
    qs = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert oracled == qs


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["doc_id", "offset", "kind", "text", "media_ref"]
    n = df.count()
    assert n > 1000
