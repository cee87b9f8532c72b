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

def test_span_sink_overwrite_clears_stale_parts(spark, tmp_path):
    """mode('overwrite') must leave ONLY the new run's parts: a first run
    with 4 tasks then an overwrite with 1 task used to strand stale
    part-00001..3 next to the new part-00000 (round-3 advisory)."""
    import json
    import os

    from tei_chunker_spark.sources.tei_source import SpanSinkDataSource

    spark.dataSource.register(SpanSinkDataSource)
    out = str(tmp_path / "span_sink_ovw")
    big = spark.createDataFrame(
        [(i, "old") for i in range(40)], "span_id long, tag string"
    ).repartition(4)
    big.write.format("span_sink").option("path", out).mode("overwrite").save()
    assert len([f for f in os.listdir(out) if f.endswith(".jsonl")]) == 4

    small = spark.createDataFrame(
        [(i, "new") for i in range(5)], "span_id long, tag string"
    ).coalesce(1)
    small.write.format("span_sink").option("path", out).mode("overwrite").save()
    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert parts == ["part-00000.jsonl"], parts
    rows = [json.loads(l) for l in open(os.path.join(out, "part-00000.jsonl"))]
    assert {r["tag"] for r in rows} == {"new"} and len(rows) == 5
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 5 and manifest["parts"] == 1


def test_span_sink_append_does_not_clobber(spark, tmp_path):
    """mode('append') numbers new parts after the existing ones; both
    runs' rows survive."""
    import json
    import os

    from tei_chunker_spark.sources.tei_source import SpanSinkDataSource

    spark.dataSource.register(SpanSinkDataSource)
    out = str(tmp_path / "span_sink_app")
    for tag in ("a", "b"):
        df = spark.createDataFrame(
            [(i, tag) for i in range(3)], "span_id long, tag string"
        ).coalesce(1)
        df.write.format("span_sink").option("path", out).mode("append").save()
    parts = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert parts == ["part-00000.jsonl", "part-00001.jsonl"], parts
    rows = []
    for p in parts:
        rows += [json.loads(l) for l in open(os.path.join(out, p))]
    assert sorted((r["span_id"], r["tag"]) for r in rows) == sorted(
        (i, t) for t in ("a", "b") for i in range(3)
    )


def test_span_sink_append_reclaims_crashed_run_orphans(spark, tmp_path):
    """A _tmp-*.jsonl stranded by a crashed prior run (abort never ran)
    must be swept by the NEXT commit in append mode too, not only in
    overwrite mode (round-5 advisory)."""
    import os

    from tei_chunker_spark.sources.tei_source import SpanSinkDataSource

    spark.dataSource.register(SpanSinkDataSource)
    out = str(tmp_path / "span_sink_orphan")
    os.makedirs(out)
    orphan = os.path.join(out, "_tmp-deadbeef.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"span_id": 999}\n')

    df = spark.createDataFrame(
        [(i, "x") for i in range(3)], "span_id long, tag string"
    ).coalesce(1)
    df.write.format("span_sink").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert not [f for f in files if f.startswith("_tmp-")], files
    assert "part-00000.jsonl" in files
