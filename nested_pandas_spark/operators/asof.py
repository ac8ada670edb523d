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
from pyspark.sql import types as T

from ..functions.nested import quote
from .timeseries import _floor_bin_sql

__all__ = ["asof_join", "range_join", "interval_join"]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _col_type(df: DataFrame, col: str) -> T.DataType:
    return {f.name: f.dataType for f in df.schema.fields}[col]


def _check_int_bucket(bucket, *dtypes: T.DataType) -> bool:
    """True when ALL axis columns are integral — the exact-int64 path.

    On that path ``bucket`` must be a positive integer: int64-ns axes
    (~1.7e18) exceed double's 2^53 exact range, so a fractional bucket
    would force the inexact double path (and ``int(bucket)`` truncation
    would silently change the bucket width — the rebin/phase_fold lesson).

    ALL, not ANY (round-4 advice fix): callers pass every axis column
    that feeds a join's bucket expressions, across BOTH sides, so one
    global decision guarantees both sides bucket with the same
    arithmetic. With any(), a mixed integral/double axis pair routed
    ``greatest(bigint, double)`` (type double) into the int64 ``DIV``
    path, which Spark rejects with DATATYPE_MISMATCH — and even a
    per-side decision would bucket the two sides of an equi-join with
    different rounding. Mixed axes now take the double path end to end.
    """
    integral = all(isinstance(t, _INTEGRAL) for t in dtypes)
    if integral and (bucket != int(bucket) or int(bucket) <= 0):
        raise ValueError(
            f"bucket must be a positive integer for integral axis columns, got {bucket!r}"
        )
    return integral


def _bucket_sql(col_sql: str, bucket, integral: bool) -> str:
    """Exact ``floor(col / bucket)`` as SQL. Integral columns never pass
    through double: epoch-nanosecond magnitudes exceed 2^53, where double
    division is inexact (ulp ~256 ns) and a boundary row can land one
    bucket off its containing interval — the same bug class fixed in
    ``with_event_time`` (streaming/events.py) and ``rebin``."""
    return _floor_bin_sql(col_sql, bucket, 0, integral)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: int | None = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the as-of matching right row within the
    same key — ``pandas.merge_asof`` semantics at Spark scale.

    ``direction``: ``'backward'`` (default) matches the most recent right
    row with ``right.ts <= left.ts``; ``'forward'`` the earliest with
    ``right.ts >= left.ts``; ``'nearest'`` whichever of the two is closer
    in ``ts`` (ties -> the backward match, as in pandas). ``strict``
    excludes equal timestamps. ``tolerance``: maximum allowed ``|left.ts -
    right.ts|`` (same units as ``ts``); farther matches are nulled out.

    ``ts`` must be a numeric/orderable column present in both inputs.
    ``'nearest'`` costs one extra within-partition sort (the reversed
    window), NOT an extra shuffle — both carries share the one key
    partitioning.

    Examples
    --------
    >>> trades = spark.createDataFrame([("A", 3), ("A", 7)], "sym string, ts long")
    >>> quotes = spark.createDataFrame(
    ...     [("A", 2, 1.0), ("A", 5, 2.0)], "sym string, ts long, px double")
    >>> out = asof_join(trades, quotes, on="sym", ts="ts")
    >>> sorted((r["ts"], r["px_right"]) for r in out.collect())
    [(3, 1.0), (7, 2.0)]
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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

    # carry the matched right row as ONE struct, not per-column
    # last(ignorenulls): a per-column carry conflates "left-row
    # placeholder NULL" with "right row whose value IS NULL" and would
    # stitch the match together from DIFFERENT right rows (a NULL px at
    # the matched ts inheriting a stale px from an older quote). The
    # struct is non-null exactly for right rows, so NULL fields ride
    # along with their own row atomically.
    unioned = unioned.withColumn(
        "__r_all",
        F.when(
            F.col("__is_left") == 0,
            F.struct(F.col("__r_ts"), *[F.col(f"__r_{c}") for c in rcols]),
        ),
    )

    def _carry(prefix: str, backward: bool) -> list:
        """last-right-row carry over the key partition in one time order."""
        order_ts = F.col(ts).asc() if backward else F.col(ts).desc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(order_ts, tie, *payload_tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried_row = F.last("__r_all", ignorenulls=True).over(w)
        return [
            carried_row.getField("__r_ts").alias(f"{prefix}ts"),
            *[
                carried_row.getField(f"__r_{c}").alias(f"{prefix}{c}")
                for c in rcols
            ],
        ]

    dirs = {"backward": [True], "forward": [False], "nearest": [True, False]}[direction]
    carry_cols = []
    for backward in dirs:
        carry_cols += _carry("__b_" if backward else "__f_", backward)
    carried = unioned.select("*", *carry_cols)
    out = carried.where(F.col("__is_left") == 1)

    def _valid(prefix: str, backward: bool):
        mts = F.col(f"{prefix}ts")
        v = mts.isNotNull()
        if tolerance is not None:
            diff = (F.col(ts) - mts) if backward else (mts - F.col(ts))
            v = v & (diff <= tolerance)
        return v

    if direction == "nearest":
        use_b = _valid("__b_", True) & (
            ~_valid("__f_", False)
            | ((F.col(ts) - F.col("__b_ts")) <= (F.col("__f_ts") - F.col(ts)))
        )
        use_f = _valid("__f_", False) & ~use_b
        sel = [
            F.when(use_b, F.col(f"__b_{c}")).when(use_f, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in rcols
        ]
        sel.append(
            F.when(use_b, F.col("__b_ts")).when(use_f, F.col("__f_ts"))
            .alias(f"{ts}{suffix}")
        )
    else:
        prefix = "__b_" if direction == "backward" else "__f_"
        ok = _valid(prefix, direction == "backward")
        sel = [
            F.when(ok, F.col(f"{prefix}{c}")).alias(f"{c}{suffix}") for c in rcols
        ]
        sel.append(F.when(ok, F.col(f"{prefix}ts")).alias(f"{ts}{suffix}"))
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
    # floor division, not truncation: truncation toward zero mis-buckets
    # negative timestamps (-1 and +1 would share bucket 0 and boundary
    # intervals would miss their matches). Integral axes stay in exact
    # int64 arithmetic end to end — see _bucket_sql.
    # ONE global integral decision across every axis column on both sides:
    # the equi-join on __bk requires identical bucket arithmetic everywhere
    # (see _check_int_bucket — mixed axes fall back to the double path)
    axis_int = _check_int_bucket(
        bucket,
        _col_type(left, left_ts),
        _col_type(right, right_start),
        _col_type(right, right_end),
    )
    # Double-path boundary guard (round-5 advice): mixed integral/double
    # axes bucket through double division, where an int64-ns value within
    # ~1 ulp of a bucket boundary can round into the adjacent bucket and a
    # true match would silently miss the equi-join. Widening the interval
    # span by one bucket each way means a miss now needs TWO simultaneous
    # opposite-direction rounding errors (~ulp^2 — not constructible from
    # one boundary); the exact range predicate below keeps the output
    # precise regardless. Axes needing guaranteed exactness should be
    # integral on both sides (the int64 DIV path, zero rounding).
    pad = 0 if axis_int else 1
    l = left.withColumn(
        "__bk", F.expr(_bucket_sql(quote(left_ts), bucket, axis_int)).cast("long")
    )
    r = right.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.expr(_bucket_sql(quote(right_start), bucket, axis_int)).cast("long") - pad,
                F.expr(_bucket_sql(quote(right_end), bucket, axis_int)).cast("long") + pad,
            )
        ),
    )
    joined = l.join(r, on=[*keys, "__bk"], how="inner").where(
        (F.col(right_start) <= F.col(left_ts)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("__bk")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: int,
) -> DataFrame:
    """Join interval pairs that OVERLAP (half-open:
    ``l_start < r_end AND r_start < l_end``) sharing the equi-key(s) —
    the interval x interval companion of :func:`range_join`.

    Both sides explode to the ``bucket``-sized time buckets they span and
    join with hash equality on (key, bucket); the exact overlap predicate
    then filters. A pair overlapping several shared buckets would emit
    duplicates — instead of a ``distinct`` (a full extra shuffle), each
    pair is kept only in the bucket containing ``greatest(l_start,
    r_start)``, the first bucket where both intervals are live: exactly
    one emission per pair, dedup for free.

    Pick ``bucket`` near the typical interval length (explode factor ~O(1)).
    At 100 TB this is the standard time-bucketed interval join: one
    shuffle per side, no theta/cartesian fallback, AQE splits hot buckets.

    Non-key column names shared by both inputs (e.g. both sides carrying
    ``start``/``end``) come back with a ``_right`` suffix on the right
    side, the same convention as ``asof_join``/``crossmatch``.

    Examples
    --------
    >>> from nested_pandas_spark.operators.asof import interval_join
    >>> a = spark.createDataFrame([(1, 0, 0, 10)], "aid long, k long, s long, e long")
    >>> b = spark.createDataFrame([(2, 0, 5, 15), (3, 0, 20, 30)],
    ...                           "bid long, k long, s long, e long")
    >>> [(r["aid"], r["bid"]) for r in
    ...  interval_join(a, b, "k", "s", "e", "s_right", "e_right",
    ...                bucket=8).collect()]
    [(1, 2)]
    """
    keys = [on] if isinstance(on, str) else list(on)

    # disambiguate non-key collisions up front (identical start/end names
    # on both sides would make every downstream reference ambiguous)
    collisions = [
        c for c in right.columns if c in set(left.columns) and c not in keys
    ]
    renames = {c: f"{c}_right" for c in collisions}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    right_start = renames.get(right_start, right_start)
    right_end = renames.get(right_end, right_end)

    # ONE global integral decision across all four axis columns: the
    # equi-join on __bk and the first-live dedup bucket must use the same
    # arithmetic on both sides, and greatest(bigint, double) is double —
    # routing it into the int64 DIV path is an analysis error (round-4
    # advice). Mixed axes take the double path end to end.
    axis_int = _check_int_bucket(
        bucket,
        _col_type(left, left_start),
        _col_type(left, left_end),
        _col_type(right, right_start),
        _col_type(right, right_end),
    )

    # same double-path boundary guard as range_join: widen each span by
    # one bucket so a single rounding error can't hide a truly-overlapping
    # pair from the equi-join (the exact overlap predicate still filters);
    # the first-live dedup is unaffected — widening only ADDS buckets, and
    # exactly one of them equals the first-live bucket
    pad = 0 if axis_int else 1

    def spans(df, s, e):
        return df.withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.expr(_bucket_sql(quote(s), bucket, axis_int)).cast("long") - pad,
                    F.expr(_bucket_sql(quote(e), bucket, axis_int)).cast("long") + pad,
                )
            ),
        )

    l = spans(left, left_start, left_end)
    r = spans(right, right_start, right_end)
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    first_live = F.expr(
        _bucket_sql(
            f"greatest({quote(left_start)}, {quote(right_start)})", bucket, axis_int
        )
    ).cast("long")
    return (
        l.join(r, on=[*keys, "__bk"], how="inner")
        .where(overlap & (F.col("__bk") == first_live))
        .drop("__bk")
    )
