"""2D crossmatch: nearest-neighbor join of two point catalogs within a
radius — the astronomy companion operator to the reference's nested model
(object catalogs are crossmatched before their time series are packed; cf.
the LSDB/HATS ecosystem the reference README points at).

Algorithm (the standard distributed spatial bin join):

1. Grid the plane with cell size = ``radius``.
2. The LEFT side maps each point to its home cell (one row per point).
3. The RIGHT side replicates each point to its 3x3 cell neighborhood
   (9 rows per point) — any left point's matches within ``radius`` are
   guaranteed to share one of those cells.
4. Shuffle equi-join on the cell key, exact distance filter, per-left rank
   by (distance, right id), keep the k nearest.

Scale properties: each side shuffles ONCE on the cell key; no all-pairs,
no broadcast requirement (both catalogs can be huge); cost is
sum-over-cells of |left_cell| x |right_neighborhood|, bounded by point
density. Dense-sky cells skew the join — AQE's skew-join splitting handles
moderate skew; for pathological density reduce ``radius`` or pre-filter.
The 9x replication is of the SMALLER projection (id + coords only, not the
full payload) — join back for payload columns afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.nested import quote

__all__ = ["crossmatch"]


def crossmatch(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    x: str = "x",
    y: str = "y",
    radius: float = 1.0,
    k: int = 1,
) -> DataFrame:
    """K-nearest crossmatch of ``left`` against ``right`` within ``radius``.

    Output: (``left_id``, ``right_id``, ``dist``, ``rank``) — up to ``k``
    rows per left point, rank 1 = nearest, ties broken by ``right_id``
    ascending. When both sides use the same id column name, the right one
    is emitted as ``{right_id}_right`` (the as-of join convention). Left
    points with no right neighbor within ``radius`` emit nothing (inner
    semantics; LEFT-join the result back for keep-all).

    Both inputs need columns ``x`` and ``y`` (planar coordinates; for
    small-angle sky regions use projected coordinates). Column names may
    collide between the two inputs — each side is projected and renamed
    before the join.

    Examples
    --------
    >>> from nested_pandas_spark.operators.crossmatch import crossmatch
    >>> cat_a = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    >>> cat_b = spark.createDataFrame(
    ...     [(7, 0.3, 0.4), (8, 5.0, 5.0)], "id long, x double, y double")
    >>> [m] = crossmatch(cat_a, cat_b, "id", "id", radius=1.0).collect()
    >>> (m["id"], m["id_right"], round(m["dist"], 3), m["rank"])
    (1, 7, 0.5, 1)
    """
    if radius <= 0:
        raise ValueError("radius must be > 0")
    if k < 1:
        raise ValueError("k must be >= 1")
    r = float(radius)

    def cell(col):
        return F.floor(col / F.lit(r)).cast("long")

    l = left.select(
        F.col(quote(left_id)).alias("__lid"),
        F.col(quote(x)).cast("double").alias("__lx"),
        F.col(quote(y)).cast("double").alias("__ly"),
    ).withColumn("__cx", cell(F.col("__lx"))).withColumn("__cy", cell(F.col("__ly")))

    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    rt = (
        right.select(
            F.col(quote(right_id)).alias("__rid"),
            F.col(quote(x)).cast("double").alias("__rx"),
            F.col(quote(y)).cast("double").alias("__ry"),
        )
        .withColumn("__dx", off)
        .withColumn("__dy", off)
        .withColumn("__cx", cell(F.col("__rx")) + F.col("__dx"))
        .withColumn("__cy", cell(F.col("__ry")) + F.col("__dy"))
        .drop("__dx", "__dy")
    )

    # dx*dx (not pow(dx, 2)): plain multiplication is IEEE-exact and
    # reproducible across engines for oracle comparison
    dx = F.col("__lx") - F.col("__rx")
    dy = F.col("__ly") - F.col("__ry")
    cand = l.join(rt, on=["__cx", "__cy"]).withColumn(
        "dist", F.sqrt(dx * dx + dy * dy)
    ).where(F.col("dist") <= r)

    w = Window.partitionBy("__lid").orderBy(F.col("dist").asc(), F.col("__rid").asc())
    right_out = f"{right_id}_right" if right_id == left_id else right_id
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_out),
            "dist",
            "rank",
        )
    )
