"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set against the corpus; dot products via ``zip_with``+``aggregate``
  HOFs (JVM, codegen'd — no UDF); per-query top-k via window rank.
* SRP-LSH bucketed ANN — the scale path: sign-random-projection bucket keys
  from deterministic md5-derived hyperplanes; candidates only join within a
  bucket, then exact re-rank. Sub-linear candidate generation at 100 TB; the
  planes are pseudo-random but fully deterministic (seeded by plane index),
  so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "dot", "norm", "brute_force_topk", "srp_bucket", "lsh_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus rows.

    Output: (query_id, neighbor_id, cos_sim, rank). The query side is
    broadcast (it's the small side by construction); the corpus streams
    through map-side — total cost one corpus scan, no corpus shuffle except
    the final per-query top-k, which is a partial ``rank <= k`` window.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("__qv").cast("array<double>"), F.col("__cv").cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _plane_component(plane: Column | int, dim_idx: Column) -> Column:
    """Deterministic ±1 hyperplane entry from md5(plane:dim)."""
    p = F.lit(plane) if isinstance(plane, int) else plane
    h = F.conv(
        F.substring(F.md5(F.concat(p.cast("string"), F.lit(":"), dim_idx.cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def srp_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (0 .. 2^num_planes - 1).

    bit p = sign(dot(vec, plane_p)) with ±1 pseudo-random planes. Pure HOFs.
    """
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda v, i: v.cast("double") * _plane_component(p, i),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
            > 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: SRP bucket equi-join then exact cosine re-rank.

    Recall improves with fewer planes (bigger buckets) or multiple tables;
    this single-table variant is the building block. The bucket column is a
    precomputable corpus-side key — at scale, write it at ingest and bucket
    the table by it so queries touch only matching buckets (partition
    pruning instead of a full scan).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        srp_bucket(F.col(vec_col), num_planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        srp_bucket(F.col(vec_col), num_planes).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), on="__bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("__qv").cast("array<double>"), F.col("__cv").cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
