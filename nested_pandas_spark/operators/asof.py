"""As-of and range joins — time-series operators Spark lacks natively.

The reference library has none of these (it is a pandas extension), but any
time-series engine at scale needs them; they are first-class here.

``asof_join`` uses the union-and-carry-forward pattern: tag both inputs,
union them, and carry the latest right-side payload forward over an
event-time window partitioned by key. ONE shuffle (the window partition), no
range-condition join explosion — this is the scalable formulation; a naive
``left.ts >= right.ts`` join is O(n*m) per key and falls over at 100 TB.

``range_join`` expresses bounded-interval matching with a bucketized
equi-join so Catalyst gets an equality condition to hash on instead of a
pure theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (or ``<`` when ``strict``) within the same key.

    ``ts`` must be a numeric/orderable column present in both inputs.
    ``tolerance``: maximum allowed ``left.ts - right.ts`` (same units as
    ``ts``); older matches are nulled out.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns if c not in set(keys) | {ts}]

    l_tag = left.withColumn("__is_left", F.lit(1))
    for c in rcols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(dict(
            (f.name, f.dataType) for f in right.schema.fields)[c]))
    l_tag = l_tag.withColumn("__r_ts", F.lit(None).cast(dict(
        (f.name, f.dataType) for f in right.schema.fields)[ts]))

    r_tag = right.select(
        *keys,
        F.col(ts),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(ts).alias("__r_ts"),
    )
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(
                (f.name, f.dataType) for f in left.schema.fields)[c]))

    unioned = l_tag.select(*left_cols, "__is_left", "__r_ts",
                           *[f"__r_{c}" for c in rcols]).unionByName(
        r_tag.select(*left_cols, "__is_left", "__r_ts",
                     *[f"__r_{c}" for c in rcols])
    )

    # inclusive: right rows sort BEFORE left rows at equal ts so the carry
    # includes them; strict: left first so an equal-ts right is never seen
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    # deterministic tie-break among right rows sharing a ts: order by the
    # (orderable) payload columns so the same row wins on every run/partition
    from pyspark.sql.types import AtomicType

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    payload_tie = [
        F.col(f"__r_{c}").asc_nulls_first()
        for c in rcols
        if isinstance(rtypes[c], AtomicType)
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), tie, *payload_tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
    )
    out = carried.where(F.col("__is_left") == 1)
    if tolerance is not None:
        in_range = (F.col(ts) - F.col("__m_ts")) <= tolerance
        sel = [F.when(in_range, F.col(f"__m_{c}")).alias(f"{c}{suffix}") for c in rcols]
        sel.append(F.when(in_range, F.col("__m_ts")).alias(f"{ts}{suffix}"))
    else:
        sel = [F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in rcols]
        sel.append(F.col("__m_ts").alias(f"{ts}{suffix}"))
    return out.select(*[F.col(c) for c in left_cols], *sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket: int,
) -> DataFrame:
    """Join left rows to right intervals containing them
    (``right_start <= left_ts < right_end``) with bucketized equi-keys.

    Each right interval is exploded to the ``bucket``-sized time buckets it
    spans; left rows join on (key, bucket) with equality, then the exact
    range predicate filters. Pick ``bucket`` near the typical interval
    length: the explode factor stays ~O(1) and the join hashes instead of
    becoming a cartesian theta join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("__bk", (F.col(left_ts) / bucket).cast("long"))
    r = right.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket).cast("long"),
                (F.col(right_end) / bucket).cast("long"),
            )
        ),
    )
    joined = l.join(r, on=[*keys, "__bk"], how="inner").where(
        (F.col(right_start) <= F.col(left_ts)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("__bk")
