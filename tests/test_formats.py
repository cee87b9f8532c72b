"""File-format breadth: the engine's outputs round-trip through the
standard Spark formats a downstream consumer might demand (ORC, CSV,
JSON), and malformed JSON ingestion follows the PERMISSIVE
corrupt-record contract instead of failing the job.

Parquet is the engine's native format (everything else in the suite);
these tests pin that nothing in the span/event schemas is
parquet-only."""
from __future__ import annotations

from pyspark.sql import functions as F

SPAN_SCHEMA = "doc_id string, offset int, kind string, text string, media_ref string"


def _spans(spark):
    rows = [
        ("d1", 0, "text", "alpha, with comma", None),
        ("d1", 1, "media", None, "img://1"),
        ("d2", 0, "text", 'quoted "text" and\nnewline', None),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_orc_round_trip(spark, tmp_path):
    df = _spans(spark)
    p = str(tmp_path / "spans_orc")
    df.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_round_trip_with_schema(spark, tmp_path):
    """CSV needs the explicit schema and quote/escape care (embedded
    commas, quotes, newlines) — the exact traps a naive exporter hits."""
    df = _spans(spark)
    p = str(tmp_path / "spans_csv")
    df.write.option("header", True).option("escape", '"').option(
        "multiLine", True
    ).csv(p)
    back = spark.read.schema(SPAN_SCHEMA).option("header", True).option(
        "escape", '"'
    ).option("multiLine", True).csv(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_round_trip(spark, tmp_path):
    df = _spans(spark)
    p = str(tmp_path / "spans_json")
    df.write.json(p)
    back = spark.read.schema(SPAN_SCHEMA).json(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_corrupt_record_permissive(spark, tmp_path):
    """Ingestion contract for dirty feeds: PERMISSIVE mode lands broken
    lines in _corrupt_record (job survives, bad rows auditable);
    FAILFAST raises.  The quarantine split is the pattern a 100 TB
    ingest uses to route rejects to a dead-letter sink."""
    src = tmp_path / "feed"
    src.mkdir()
    (src / "part-0.json").write_text(
        '{"doc_id": "a", "offset": 0}\n'
        "this is not json\n"
        '{"doc_id": "b", "offset": 1}\n'
    )
    schema = "doc_id string, offset int, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
    )
    rows = df.cache().collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in good} == {"a", "b"}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record
    df.unpersist()

    import pytest

    with pytest.raises(Exception):
        spark.read.schema("doc_id string, offset int").option(
            "mode", "FAILFAST"
        ).json(str(src)).collect()
