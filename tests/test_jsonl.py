"""JSONL source/sink: round trip, corrupt handling, shard count."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = "doc_id long, text string, score double"


def test_roundtrip_gzip(spark, tmp_path):
    rows = [(i, f"doc {i}", i / 7.0) for i in range(100)] + [(100, None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, compression="gzip", num_files=4)
    parts = glob.glob(f"{out}/part-*.json.gz")
    assert len(parts) == 4
    back = read_jsonl(spark, out, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_corrupt_lines(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "score": 1.0}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "score": 2.0}\n'
    )
    dropped = read_jsonl(spark, str(p), SCHEMA)
    assert dropped.count() == 2
    kept = read_jsonl(spark, str(p), SCHEMA, keep_corrupt=True)
    bad = kept.where(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "THIS IS NOT JSON"
    assert kept.count() == 3


def test_schema_required_and_string_form(spark, tmp_path):
    p = tmp_path / "s"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps({"doc_id": 5, "text": "x", "score": 0.5}) + "\n")
    got = read_jsonl(spark, str(p), SCHEMA).collect()
    assert got == [(5, "x", 0.5)]
    with pytest.raises(TypeError):
        read_jsonl(spark, str(p))  # schema is mandatory
