"""Checkpoint/resume tests: kill after a wave, rerun, assert no duplicate
and no missing spans vs a single-shot run (BASELINE.md resumability row).
"""
from __future__ import annotations

import pytest

from tei_chunker_spark.config import ChunkerConfig, JobConfig
from tei_chunker_spark.corpus import INPUT_SCHEMA_DDL, make_rows
from tei_chunker_spark.manifest import (
    completed_buckets,
    read_manifest,
    resume_filter,
    run_resumable,
)
from tei_chunker_spark.operators.extract import extract_pipeline

JOB = JobConfig(
    chunker=ChunkerConfig(max_chunk_size=500, overlap_size=50),
    num_buckets=8,
    shuffle_partitions=8,
)


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "input")
    rows = make_rows([f"m{i}" for i in range(150)])
    spark.createDataFrame(rows, INPUT_SCHEMA_DDL).write.parquet(path)
    return path


def _spans_set(spark, path):
    return {
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref)
        for r in spark.read.parquet(path).drop("bucket").collect()
    }


def test_crash_then_resume_no_dupes_no_gaps(spark, corpus_path, tmp_path):
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    manifest = str(tmp_path / "manifest")

    # single-shot truth
    run_resumable(spark, corpus_path, out_a, str(tmp_path / "m_a"), JOB, job_id="truth")
    truth = _spans_set(spark, out_a)
    assert truth

    # crashed run: dies after 1 wave of 3 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            spark, corpus_path, out_b, manifest, JOB,
            job_id="crashy", wave_size=3, fail_after_waves=1,
        )
    done_after_crash = completed_buckets(spark, manifest, "crashy")
    assert 0 < len(done_after_crash) < JOB.num_buckets

    # resume completes the rest, skipping finished buckets
    run_resumable(spark, corpus_path, out_b, manifest, JOB, job_id="crashy", wave_size=3)
    assert _spans_set(spark, out_b) == truth  # no dupes, no gaps

    m = read_manifest(spark, manifest).filter("job_id = 'crashy'")
    per_bucket = {r.bucket for r in m.filter("status = 'done'").collect()}
    assert per_bucket == set(range(JOB.num_buckets))
    # lineage recorded
    assert all("num_buckets" in r.lineage_json for r in m.collect())
    # metrics add up to the true span count
    latest = {}
    for r in m.collect():
        if r.bucket not in latest or r.attempt > latest[r.bucket].attempt:
            latest[r.bucket] = r
    assert sum(r.span_count for r in latest.values()) == len(truth)
    # input accounting covers every input doc (incl. zero-output docs)
    total_in = sum(r.input_doc_count for r in latest.values())
    n_input = spark.read.parquet(corpus_path).count()
    assert total_in == n_input
    assert all(r.doc_count <= r.input_doc_count for r in latest.values())


def test_rerun_completed_job_is_noop(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest")
    run_resumable(spark, corpus_path, out, manifest, JOB, job_id="j2")
    n_manifest = read_manifest(spark, manifest).count()
    run_resumable(spark, corpus_path, out, manifest, JOB, job_id="j2")
    assert read_manifest(spark, manifest).count() == n_manifest  # nothing re-done


def test_resume_filter_is_anti_join(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    kept = resume_filter(df, [0, 1], JOB.num_buckets)
    from tei_chunker_spark.manifest import bucket_column

    remaining_buckets = {
        r.bucket for r in kept.select(bucket_column(JOB.num_buckets)).distinct().collect()
    }
    assert remaining_buckets.isdisjoint({0, 1})
    assert kept.count() < df.count()
    assert kept.columns == df.columns
