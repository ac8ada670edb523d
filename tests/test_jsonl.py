"""JSONL interchange via nestedframe.io: round trip, corrupt lines, shards."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.nestedframe.io import read_jsonl, to_jsonl

SCHEMA = "doc_id long, text string, score double"


def test_roundtrip_gzip_shards(spark, tmp_path):
    rows = [(i, f"doc {i}", i / 7.0) for i in range(100)] + [(100, None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "corpus")
    to_jsonl(df, out, compression="gzip", num_files=4)
    assert len(glob.glob(f"{out}/part-*.json.gz")) == 4
    back = read_jsonl(spark, out, schema=SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_corrupt_line_handling(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "score": 1.0}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "score": 2.0}\n'
    )
    dropped = read_jsonl(spark, str(p), schema=SCHEMA, mode="DROPMALFORMED")
    assert dropped.count() == 2
    kept = read_jsonl(
        spark, str(p),
        schema=SCHEMA + ", _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    bad = kept.where(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "THIS IS NOT JSON"
    assert kept.count() == 3


def test_nested_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [{"t": 1.0, "f": 2.0}, {"t": 3.0, "f": 4.0}])],
        "id long, series array<struct<t: double, f: double>>",
    )
    out = str(tmp_path / "nested")
    to_jsonl(df, out)
    back = read_jsonl(
        spark, out, schema="id long, series array<struct<t: double, f: double>>"
    )
    assert back.collect() == df.collect()


def test_columns_and_filters(spark, tmp_path):
    p = tmp_path / "cf"
    p.mkdir()
    lines = [json.dumps({"doc_id": i, "text": f"d{i}", "score": i * 1.0})
             for i in range(10)]
    (p / "a.jsonl").write_text("\n".join(lines) + "\n")
    got = read_jsonl(
        spark, str(p), schema=SCHEMA, columns=["doc_id"], filters="score >= 5"
    )
    assert got.columns == ["doc_id"]
    assert got.count() == 5
