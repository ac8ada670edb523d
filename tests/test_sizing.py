"""Output sizing (sources/sizing.py write_sized_parquet)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.sources.sizing import (
    estimate_bytes_per_row,
    write_sized_parquet,
)


def _files(path):
    return [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True)]


def test_small_target_splits_files(spark, tmp_path):
    df = spark.range(0, 20_000).withColumn(
        "payload", F.expr("repeat(uuid(), 8)"))
    out = str(tmp_path / "sized")
    stats = write_sized_parquet(df, out, target_mb=1, sample_rows=2_000)
    files = _files(out)
    assert stats["n_files"] == len(files) > 1
    # target 1 MiB: files land within a loose band around it
    sizes = [os.path.getsize(f) for f in files]
    assert max(sizes) < 3 * 1024 * 1024
    assert spark.read.parquet(out).count() == 20_000


def test_large_target_single_file(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "one")
    stats = write_sized_parquet(df, out, target_mb=512)
    assert stats["n_files"] == 1 and len(_files(out)) == 1


def test_partition_by_and_validation(spark, tmp_path):
    df = spark.range(0, 100).withColumn("p", F.col("id") % 2)
    out = str(tmp_path / "parts")
    write_sized_parquet(df, out, target_mb=64, partition_by=["p"])
    assert os.path.isdir(os.path.join(out, "p=0"))
    with pytest.raises(ValueError, match="target_mb"):
        write_sized_parquet(df, str(tmp_path / "x"), target_mb=0)


def test_estimate_empty_frame(spark):
    df = spark.range(0, 0)
    assert estimate_bytes_per_row(df) == 0.0
