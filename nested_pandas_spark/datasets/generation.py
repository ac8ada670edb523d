"""Synthetic data generation, mirroring the reference's toy generator.

Reference: ``generate_data`` (``src/nested_pandas/datasets/generation.py:6-57``):
base columns ``a, b`` uniform; nested column with ``t, flux, flux_error,
band``. Generated distributed with ``spark.range`` + ``F.rand(seed)`` — no
driver-side materialization, scales to any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_data(
    spark: SparkSession, n_base: int, n_layer: int, seed: int | None = None
) -> DataFrame:
    """Base table (id, a, b) with a nested column of n_layer (t, flux,
    flux_error, band) rows per base row."""
    s = seed if seed is not None else 42
    base = (
        spark.range(n_base)
        .withColumnRenamed("id", "id")
        .withColumn("a", F.rand(s))
        .withColumn("b", F.rand(s + 1) * 2)
    )
    layer = (
        spark.range(n_base * n_layer)
        .withColumn("pid", F.col("id") % n_base)
        .withColumn("t", F.rand(s + 2) * 20)
        .withColumn("flux", F.rand(s + 3) * 100)
        .withColumn("flux_error", F.lit(1.0))
        .withColumn("band", F.when(F.rand(s + 4) < 0.5, "r").otherwise("g"))
        .drop("id")
    )
    from ..operators.packer import join_nested

    return join_nested(
        base,
        layer.withColumnRenamed("pid", "id"),
        "nested",
        on="id",
        how="left",
        sort_within=["t"],
    )


def generate_parquet_file(
    spark: SparkSession, n_base: int, n_layer: int, path: str, seed: int | None = None
) -> None:
    generate_data(spark, n_base, n_layer, seed).write.mode("overwrite").parquet(path)
