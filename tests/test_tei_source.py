"""Custom Python DataSource (format("tei_corpus")) tests: registration,
option handling, partition planning, and row-identity vs the reference
generator."""
from __future__ import annotations

from tei_chunker_spark.corpus import make_rows
from tei_chunker_spark.sources.tei_source import TeiCorpusDataSource


def _register(spark):
    spark.dataSource.register(TeiCorpusDataSource)


def test_source_rows_equal_reference_generator(spark):
    _register(spark)
    df = (
        spark.read.format("tei_corpus")
        .option("n_docs", 40)
        .option("n_partitions", 4)
        .load()
    )
    got = {
        r.doc_id: [tuple(s) for s in r.spans] for r in df.collect()
    }
    want = {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
        for row in make_rows([str(i) for i in range(40)])
    }
    assert got == want


def test_source_partitioning_and_pruned_projection(spark):
    _register(spark)
    df = (
        spark.read.format("tei_corpus")
        .option("n_docs", 10)
        .option("n_partitions", 3)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    # projection through the Python source still yields correct columns
    assert df.select("doc_id").count() == 10


def test_source_feeds_extraction_pipeline(spark):
    """The source composes with the flagship pipeline end-to-end."""
    from tei_chunker_spark.config import ChunkerConfig, JobConfig
    from tei_chunker_spark.operators.extract import extract_pipeline

    _register(spark)
    df = (
        spark.read.format("tei_corpus")
        .option("n_docs", 20)
        .option("n_partitions", 2)
        .load()
    )
    job = JobConfig(chunker=ChunkerConfig(500, 50), shuffle_partitions=8)
    out = extract_pipeline(df, job)
    assert out.count() > 0


def test_span_sink_writer_two_phase_commit(spark, tmp_path):
    """Custom DataSource WRITER: rows land as published part files plus a
    _SUCCESS manifest; content round-trips; no temp files survive."""
    import json
    import os

    from tei_chunker_spark.sources.tei_source import SpanSinkDataSource

    spark.dataSource.register(SpanSinkDataSource)
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", "text", f"body {i}") for i in range(30)],
        "span_id long, doc_id string, kind string, text string",
    ).repartition(4)
    out = str(tmp_path / "span_sink_out")
    # Python data sources accept only Append/Overwrite save modes
    df.write.format("span_sink").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert not [f for f in files if f.startswith("_tmp-")]
    rows = []
    for f in files:
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh]
    assert len(rows) == 30
    assert {r["span_id"] for r in rows} == set(range(30))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 30
