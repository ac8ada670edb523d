"""Time-series operators over nested (``array<struct<...>>``) light-curve
columns: per-cell rebinning and phase folding.

The reference library's motivating domain is time-domain astronomy — a base
table of objects, each owning a nested table of time-stamped measurements
(reference ``README.md:15-21``). The two canonical downstream operations on
such light curves are (1) **rebinning** — aggregate the measurements of each
object into fixed-width time bins — and (2) **phase folding** — map each
timestamp onto its phase within a known period. The reference leaves both to
user ``map_rows`` lambdas; here they are first-class, expressed entirely with
higher-order functions so they run per-row inside whole-stage codegen with
**zero shuffle**.

Scale notes (100 TB):

* ``rebin`` is O(bins x elements) per cell — a deliberate trade: the explode
  -> groupBy(key, bin) -> repack alternative costs TWO shuffles of the full
  measurement volume, while the HOF form costs none. Nested cells are small
  by construction (thousands of elements, tens of bins); the quadratic term
  is bounded per row and embarrassingly parallel across rows. For extreme
  cells (~10^4+ elements) pass ``engine='explode'`` on ``rebin`` /
  ``nest_rolling`` / ``nest_cum`` / ``nest_ewm``: the same operator routed
  through explode -> window/groupBy -> order-preserving repack, linear per
  cell, result-identical (use ``pack`` + ``count_nested`` to find the mega
  cells first).
* ``phase_fold`` is a pure per-element ``transform`` — one pass, no shuffle.
* Integer (int64-nanosecond) timestamps never pass through ``double``:
  epoch-nano magnitudes (~1.7e18) exceed double's 2^53 exact range, so all
  integral bin arithmetic uses exact int64 floor division (the q47 lesson —
  see ADVICE r2 on ``with_event_time``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.nested import nested_field_names, quote, struct_sql
from ..nestedframe.expr import _sql_literal

__all__ = ["rebin", "phase_fold", "nest_diff", "nest_rolling", "sigma_clip",
           "trend_slope", "nest_zscore", "nest_topk", "nest_wmean", "nest_interp",
           "nest_corr", "nest_describe", "nest_ewm", "nest_cum", "nest_dedup",
           "nest_decimate", "nest_sample", "periodogram", "stetson_jk",
           "freq_grid", "nest_acf", "structure_function", "theil_sen", "lightcurve_features", "nest_align"]


def _time_kind(df: DataFrame, nest: str, time_field: str) -> str:
    """'int' | 'float' | 'timestamp' for the nested time field.

    TIMESTAMP fields are handled on the exact int64 path via
    ``unix_micros`` (micro-second grain — Spark's native timestamp
    resolution), with ``width`` / ``origin`` / ``period`` interpreted in
    microseconds. Integral fields (e.g. the testdata's int64-nano layout)
    use the caller's units as-is.
    """
    for f in df.schema.fields:
        if f.name == nest:
            elem = f.dataType.elementType
            t = elem[time_field].dataType
            if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
                return "timestamp"
            if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                return "int"
            return "float"
    raise KeyError(f"No such column: '{nest}'")


def _int_param(name: str, value, positive: bool = False) -> int:
    """Validate a caller parameter on the exact-int64 path.

    ``int()`` alone would silently truncate (width=1.9 bins as 1) or
    collapse to zero (width=0.5 -> ANSI divide-by-zero at runtime); a
    fractional parameter on an integral time axis is always a caller
    mistake, so reject it loudly.
    """
    try:
        ok = value == int(value)
    except (TypeError, ValueError):
        ok = False
    if not ok or (positive and int(value) <= 0):
        kind = "a positive integer" if positive else "an integer"
        raise ValueError(
            f"{name} must be {kind} when the time field is integral "
            f"(int64 units are exact; fractions cannot be honored), got {value!r}"
        )
    return int(value)


def _floor_bin_sql(expr: str, width, origin, integral: bool) -> str:
    """Floor-division bin index as exact SQL.

    Integral path stays in int64 (``DIV`` truncates toward zero, so a CASE
    corrects negatives to true floor semantics); float path uses ``floor``.
    """
    if integral:
        w = _int_param("width", width, positive=True)
        o = _int_param("origin", origin)
        shifted = f"(({expr}) - {o})"
        return (
            f"(({shifted} DIV {w}) - (CASE WHEN ({shifted} % {w}) < 0 "
            f"THEN 1 ELSE 0 END))"
        )
    return f"CAST(floor((({expr}) - CAST({origin} AS DOUBLE)) / CAST({width} AS DOUBLE)) AS BIGINT)"


def _stamped(df: DataFrame) -> DataFrame:
    """Row-id-stamped, eagerly SNAPSHOTTED frame for the explode engine.

    ``monotonically_increasing_id`` is deterministic only for one physical
    execution of one plan; the explode engine references the stamped frame
    from two plan branches (the exploded side and the join-back side), so
    it must be materialized once before branching or a recomputation could
    renumber rows and silently mis-join.

    ``localCheckpoint(eager=True)`` rather than ``persist`` (round-4
    advice): a persist rides in the CacheManager until someone calls
    ``unpersist`` — but the lazy result needs the stamp on EVERY action,
    so no safe unpersist point exists inside the operator, and repeated
    explode-engine calls accumulated cached mega-cell frames for the
    session lifetime. The local checkpoint is a one-time eager snapshot
    (also immune to cache eviction-then-recompute renumbering) whose
    blocks the ContextCleaner releases as soon as the result DataFrame is
    garbage-collected — lifetime tied to the result, not the session.
    The snapshot is the price of the escape hatch — the explode engine is
    for mega-cell frames where per-cell O(n^2) HOFs are the bigger cost.
    """
    stamped = df.withColumn("__rid", F.monotonically_increasing_id())
    return stamped.localCheckpoint(eager=True)


def _check_engine(engine: str) -> None:
    if engine not in ("hof", "explode"):
        raise ValueError(f"engine must be 'hof' or 'explode', got {engine!r}")


def _repack_elements(flat, fields: list[str], out_field, val_col) -> "DataFrame":
    """(__rid, __pos, __e, <val_col>) -> (__rid, __packed): the original
    element structs with ``out_field`` appended, re-assembled in element
    order (array_sort on the unique ``__pos`` key)."""
    newe = F.struct(
        *[F.col("__e").getField(f).alias(f) for f in fields],
        val_col.alias(out_field),
    )
    return (
        flat.select(
            "__rid",
            F.struct(F.col("__pos").alias("p"), newe.alias("e")).alias("__pe"),
        )
        .groupBy("__rid")
        .agg(F.array_sort(F.collect_list("__pe")).alias("__arr"))
        .select(
            "__rid", F.expr("transform(__arr, __s -> __s.e)").alias("__packed")
        )
    )


def _join_back_elements(
    stamped: DataFrame, packed: DataFrame, nest: str, fields: list[str],
    out_field: str,
) -> DataFrame:
    """Re-attach per-row packed arrays; NULL cells stay NULL and empty
    cells come back empty (with the new field) — posexplode dropped both,
    so they fall through to the typed fallback."""
    qn = quote(nest)
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = "CAST(NULL AS DOUBLE)"
    fallback = (
        f"CASE WHEN {qn} IS NULL THEN NULL "
        f"ELSE transform({qn}, __x -> {struct_sql(keep)}) END"
    )
    return (
        stamped.join(packed, "__rid", "left")
        .withColumn(nest, F.coalesce(F.col("__packed"), F.expr(fallback)))
        .drop("__rid", "__packed")
    )


def _rebin_explode(
    df, nest, time_field, width, value_fields, origin, stats, out,
    kind, integral,
) -> DataFrame:
    """Mega-cell path for :func:`rebin`: explode -> groupBy(row, bin) ->
    repack. Two shuffles of element rows + a snapshot of the stamped
    input, but O(n) work per cell instead of O(bins x elements) — wins
    when cells hold ~10^4+ elements. Bit-identical to the HOF engine:
    a single row's elements never split across input partitions, so the
    partial aggregate folds values in array order, exactly like the HOF
    fold (0.0 + v1 + ... with the same final division for the mean)."""
    stamped = _stamped(df)
    if kind == "timestamp":
        t_sql = f"unix_micros(CAST(__e.{quote(time_field)} AS TIMESTAMP))"
    else:
        t_sql = f"__e.{quote(time_field)}"
    flat = (
        stamped.select("__rid", F.explode(F.col(nest)).alias("__e"))
        .where(F.expr(f"{t_sql} IS NOT NULL"))
        .withColumn(
            "__bin",
            F.expr(_floor_bin_sql(t_sql, width, origin, integral)).cast("long"),
        )
    )
    aggs = [F.count("*").cast("long").alias("n")]
    names: list[str] = []
    for vf in value_fields:
        v = F.col("__e").getField(vf).cast("double")
        for stat in stats:
            name = f"{vf}_{stat}"
            names.append(name)
            if stat == "mean":
                aggs.append((F.sum(v) / F.count(v)).alias(name))
            elif stat == "sum":
                aggs.append(F.sum(v).alias(name))
            elif stat == "min":
                aggs.append(F.min(v).alias(name))
            else:
                aggs.append(F.max(v).alias(name))
    per_bin = flat.groupBy("__rid", "__bin").agg(*aggs)
    bin_struct = F.struct(
        F.col("__bin").alias("bin"), F.col("n"),
        *[F.col(n) for n in names],
    )
    packed = (
        per_bin.groupBy("__rid")
        .agg(F.array_sort(F.collect_list(bin_struct)).alias("__binned"))
    )
    ddl = "array<struct<bin: bigint, n: bigint, " + ", ".join(
        f"`{n}`: double" for n in names
    ) + ">>"
    qn = quote(nest)
    fallback = F.when(
        F.col(nest).isNull(), F.lit(None).cast(ddl)
    ).otherwise(F.expr("array()").cast(ddl))
    return (
        stamped.join(packed, "__rid", "left")
        .withColumn(out, F.coalesce(F.col("__binned"), fallback))
        .drop("__rid", "__binned")
    )


def rebin(
    df: DataFrame,
    nest: str,
    time_field: str,
    width,
    value_fields: list[str] | None = None,
    origin=0,
    stats: tuple[str, ...] = ("mean", "min", "max"),
    out: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Aggregate each nested cell's elements into fixed-width time bins.

    Adds a nested column ``out`` (default ``{nest}_binned``) of
    ``array<struct<bin: bigint, n: bigint, {field}_{stat}: double, ...>>``,
    sorted by ``bin``. ``bin = floor((t - origin) / width)``; element rows
    whose ``time_field`` is NULL are ignored. TIMESTAMP time fields are
    reduced to exact epoch microseconds (``unix_micros``), so ``width`` and
    ``origin`` are then in microseconds; integral/float fields use the
    caller's units unchanged. Per value field, ``mean`` /
    ``min`` / ``max`` / ``sum`` are computed over non-NULL values (NULL when
    the bin has none), matching SQL aggregate semantics so results are
    oracle-checkable against ``explode -> GROUP BY (key, bin)``.

    Implementation: per-cell HOFs only — ``array_sort(array_distinct(
    transform(...)))`` enumerates the cell's occupied bins, then a
    ``transform`` over those bins computes each stat with ``filter`` +
    ``aggregate``. No shuffle, no UDF; the whole thing is one codegen'd
    projection. See module docstring for the O(bins x elements) trade.

    Examples
    --------
    >>> from nested_pandas_spark import pack, rebin
    >>> child = spark.createDataFrame(
    ...     [(0, 0.1, 1.0), (0, 0.9, 3.0), (0, 1.5, 10.0)],
    ...     "id long, t double, flux double")
    >>> nf = pack(child, "lc", on="id")
    >>> [row] = rebin(nf, "lc", "t", width=1.0).collect()
    >>> [(b["bin"], b["n"], b["flux_mean"]) for b in row["lc_binned"]]
    [(0, 2, 2.0), (1, 1, 10.0)]
    """
    allowed = {"mean", "min", "max", "sum"}
    bad = set(stats) - allowed
    if bad:
        raise ValueError(f"Unsupported stats {sorted(bad)}; allowed: {sorted(allowed)}")
    _check_engine(engine)
    fields = nested_field_names(df, nest)
    if time_field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{time_field}'")
    if value_fields is None:
        value_fields = [f for f in fields if f != time_field]
    missing = [f for f in value_fields if f not in fields]
    if missing:
        raise KeyError(f"Nested column '{nest}' has no fields {missing}")
    out = out or f"{nest}_binned"

    kind = _time_kind(df, nest, time_field)
    integral = kind != "float"
    if engine == "explode":
        return _rebin_explode(df, nest, time_field, width, value_fields,
                              origin, stats, out, kind, integral)
    qn = quote(nest)
    if kind == "timestamp":
        t_of = lambda var: f"unix_micros(CAST({var}.{quote(time_field)} AS TIMESTAMP))"  # noqa: E731
    else:
        t_of = lambda var: f"{var}.{quote(time_field)}"  # noqa: E731
    bin_of = lambda var: _floor_bin_sql(t_of(var), width, origin, integral)  # noqa: E731

    # Staged through temp columns: HOF lambdas defeat Spark's codegen
    # common-subexpression elimination, so a single inlined expression
    # re-evaluates the per-bin filter once PER STAT (measured ~6x slower at
    # sf0.1). Each stage materializes its array once; later stages only
    # walk already-materialized (small) per-bin arrays.
    timed_c, groups_c, vals_c = "__rb_timed", "__rb_groups", "__rb_vals"
    staged = df.withColumn(
        timed_c, F.expr(f"filter({qn}, __x -> {t_of('__x')} IS NOT NULL)")
    )
    # 1. occupied bins (ascending) -> 2. one (bin, elements) group per bin:
    # the O(bins x elements) filter runs exactly once per bin here.
    bins = (
        f"array_sort(array_distinct(transform({quote(timed_c)}, "
        f"__x -> {bin_of('__x')})))"
    )
    staged = staged.withColumn(
        groups_c,
        F.expr(
            f"transform({bins}, __b -> struct(__b AS bin, "
            f"filter({quote(timed_c)}, __x -> {bin_of('__x')} = __b) AS es))"
        ),
    )
    # 3. per value field, the non-NULL doubles of each bin — materialized
    # once so every stat below is a pass over a small double array.
    val_fields: dict[str, str] = {
        "bin": "__g.bin",
        "n": "CAST(size(__g.es) AS BIGINT)",
    }
    for vf in value_fields:
        val_fields[f"v_{vf}"] = (
            f"transform(filter(__g.es, __x -> __x.{quote(vf)} IS NOT NULL), "
            f"__x -> CAST(__x.{quote(vf)} AS DOUBLE))"
        )
    staged = staged.withColumn(
        vals_c,
        F.expr(f"transform({quote(groups_c)}, __g -> {struct_sql(val_fields)})"),
    )
    # 4. stats from the materialized per-bin value arrays.
    struct_fields: dict[str, str] = {"bin": "__g.bin", "n": "__g.n"}
    for vf in value_fields:
        vals = f"__g.{quote(f'v_{vf}')}"
        cnt = f"size({vals})"
        total = (
            f"aggregate({vals}, CAST(0.0 AS DOUBLE), "
            f"(__acc, __v) -> __acc + __v)"
        )
        for stat in stats:
            name = f"{vf}_{stat}"
            if stat == "mean":
                struct_fields[name] = f"CASE WHEN {cnt} > 0 THEN {total} / {cnt} END"
            elif stat == "sum":
                struct_fields[name] = f"CASE WHEN {cnt} > 0 THEN {total} END"
            elif stat == "min":
                struct_fields[name] = f"array_min({vals})"
            else:  # max
                struct_fields[name] = f"array_max({vals})"
    out_expr = (
        f"transform({quote(vals_c)}, __g -> {struct_sql(struct_fields)})"
    )
    return (
        staged.withColumn(out, F.expr(out_expr))
        .drop(timed_c, groups_c, vals_c)
    )


def phase_fold(
    df: DataFrame,
    nest: str,
    time_field: str,
    period,
    t0=0,
    out_field: str = "phase",
) -> DataFrame:
    """Add a ``phase`` in [0, 1) to every element of a nested time series.

    ``phase = ((t - t0) mod period) / period`` with a positive (floored)
    modulus, so pre-``t0`` timestamps fold correctly. Integral timestamps
    (int64 nanoseconds) use exact integer remainders — the value entering
    ``double`` is already reduced below ``period``, inside 2^53, so no
    precision is lost (epoch nanos themselves never touch a double).

    Pure per-element ``transform`` rebuilding the struct with one extra
    field — zero shuffle, codegen'd. Classic use: fold a variable star's
    light curve on its known period before binning with :func:`rebin`.
    """
    fields = nested_field_names(df, nest)
    if time_field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{time_field}'")
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    kind = _time_kind(df, nest, time_field)
    qn = quote(nest)
    raw = f"__x.{quote(time_field)}"
    t = f"unix_micros(CAST({raw} AS TIMESTAMP))" if kind == "timestamp" else raw
    if kind != "float":
        p = _int_param("period", period, positive=True)
        o = _int_param("t0", t0)
        rem = f"(((({t}) - {o}) % {p} + {p}) % {p})"
        phase = f"CAST({rem} AS DOUBLE) / {p}"
    else:
        rem = (
            f"(((({t}) - CAST({t0} AS DOUBLE)) % CAST({period} AS DOUBLE)) "
            f"+ CAST({period} AS DOUBLE)) % CAST({period} AS DOUBLE)"
        )
        phase = f"({rem}) / CAST({period} AS DOUBLE)"
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = f"CASE WHEN {t} IS NOT NULL THEN {phase} END"
    body = struct_sql(keep)
    return df.withColumn(nest, F.expr(f"transform({qn}, __x -> {body})"))


def nest_diff(
    df: DataFrame,
    nest: str,
    field: str,
    out_field: str | None = None,
) -> DataFrame:
    """Per-cell consecutive differences: adds ``{field}_diff`` where element
    i holds ``x[i].field - x[i-1].field`` (NULL for the first element and
    wherever either operand is NULL).

    The classic cadence/inter-observation-gap feature on a packed time
    series — meaningful when elements are time-ordered (pack with
    ``sort_within=`` or ``sort_values("nest.t")`` first).

    Pure indexed ``transform`` over the array — zero shuffle, codegen'd;
    the CASE guard keeps the ``[i-1]`` subscript from ever evaluating at
    i=0 (ANSI mode raises on invalid array subscripts).

    Examples
    --------
    >>> from nested_pandas_spark import nest_diff, pack
    >>> child = spark.createDataFrame(
    ...     [(0, 1.0), (0, 4.0), (0, 9.0)], "id long, t double")
    >>> nf = pack(child, "lc", on="id", sort_within=["t"])
    >>> [row] = nest_diff(nf, "lc", "t").collect()
    >>> [e["t_diff"] for e in row["lc"]]
    [None, 3.0, 5.0]
    """
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out_field = out_field or f"{field}_diff"
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    qn, qf = quote(nest), quote(field)
    # TIMESTAMP fields diff as exact epoch-microsecond longs (a raw
    # timestamp subtraction would yield INTERVAL, useless downstream)
    if _time_kind(df, nest, field) == "timestamp":
        cur = f"unix_micros(CAST(__x.{qf} AS TIMESTAMP))"
        prev = f"unix_micros(CAST({qn}[__i - 1].{qf} AS TIMESTAMP))"
    else:
        cur = f"__x.{qf}"
        prev = f"{qn}[__i - 1].{qf}"
    diff = (
        f"CASE WHEN __i >= 1 AND __x.{qf} IS NOT NULL AND "
        f"{qn}[__i - 1].{qf} IS NOT NULL THEN {cur} - {prev} END"
    )
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = diff
    body = struct_sql(keep)
    return df.withColumn(nest, F.expr(f"transform({qn}, (__x, __i) -> {body})"))


def nest_rolling(
    df: DataFrame,
    nest: str,
    field: str,
    window: int,
    stat: str = "mean",
    out_field: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Per-cell trailing rolling statistic: element i gets ``stat`` of
    ``field`` over the last ``window`` elements ending at i (fewer at the
    start — pandas ``rolling(window, min_periods=1)`` semantics). NULL
    values inside the window are ignored; an all-NULL window yields NULL.

    ``stat``: 'mean' | 'min' | 'max' | 'sum'. Zero shuffle: an indexed
    ``transform`` whose body aggregates a ``slice`` of the same array —
    O(n x window) per cell, the right trade against exploding the corpus
    into a shuffled window function (see :func:`rebin`'s module note).

    ``engine='explode'``: the mega-cell escape hatch — posexplode ->
    sliding ROWS window partitioned by row id -> repack in element order.
    Costs one snapshot + two shuffles of element rows, but O(n x window)
    total work spread across tasks instead of concentrated per row; use
    it when cells hold ~10^4+ elements. Bit-identical results: the
    sliding window frame folds the same non-NULL doubles in the same
    order as the HOF slice.

    Examples
    --------
    >>> from nested_pandas_spark import nest_rolling, pack
    >>> child = spark.createDataFrame(
    ...     [(0, 2.0), (0, 4.0), (0, 6.0)], "id long, v double")
    >>> nf = pack(child, "s", on="id", sort_within=["v"])
    >>> [row] = nest_rolling(nf, "s", "v", window=2).collect()
    >>> [e["v_roll_mean"] for e in row["s"]]
    [2.0, 3.0, 5.0]
    """
    allowed = {"mean", "min", "max", "sum"}
    if stat not in allowed:
        raise ValueError(f"stat must be one of {sorted(allowed)}")
    if window < 1:
        raise ValueError("window must be >= 1")
    _check_engine(engine)
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out_field = out_field or f"{field}_roll_{stat}"
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    if engine == "explode":
        from pyspark.sql import Window as W

        stamped = _stamped(df)
        flat = stamped.select(
            "__rid", F.posexplode(F.col(nest)).alias("__pos", "__e")
        )
        v = F.col("__e").getField(field).cast("double")
        w = (
            W.partitionBy("__rid").orderBy("__pos")
            .rowsBetween(-(window - 1), 0)
        )
        if stat == "mean":
            cnt = F.count(v).over(w)
            val = F.when(cnt > 0, F.sum(v).over(w) / cnt)
        elif stat == "sum":
            val = F.when(F.count(v).over(w) > 0, F.sum(v).over(w))
        elif stat == "min":
            val = F.min(v).over(w)
        else:
            val = F.max(v).over(w)
        packed = _repack_elements(flat, fields, out_field, val)
        return _join_back_elements(stamped, packed, nest, fields, out_field)
    qn, qf = quote(nest), quote(field)
    # 1-based slice of the last `window` elements ending at 0-based index i
    start = f"greatest(1, __i + 2 - {window})"
    length = f"(__i + 1) - {start} + 1"
    sl = f"slice({qn}, {start}, {length})"
    present = f"filter({sl}, __e -> __e.{qf} IS NOT NULL)"
    cnt = f"size({present})"
    total = (
        f"aggregate({present}, CAST(0.0 AS DOUBLE), "
        f"(__acc, __e) -> __acc + CAST(__e.{qf} AS DOUBLE))"
    )
    if stat == "mean":
        val = f"CASE WHEN {cnt} > 0 THEN {total} / {cnt} END"
    elif stat == "sum":
        val = f"CASE WHEN {cnt} > 0 THEN {total} END"
    elif stat == "min":
        val = f"array_min(transform({present}, __e -> CAST(__e.{qf} AS DOUBLE)))"
    else:
        val = f"array_max(transform({present}, __e -> CAST(__e.{qf} AS DOUBLE)))"
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = val
    body = struct_sql(keep)
    return df.withColumn(nest, F.expr(f"transform({qn}, (__x, __i) -> {body})"))


def sigma_clip(
    df: DataFrame,
    nest: str,
    field: str,
    sigma: float = 3.0,
    out: str | None = None,
    iters: int = 1,
) -> DataFrame:
    """Per-cell sigma clipping: drop elements whose ``field`` deviates from
    the CELL's mean by more than ``sigma`` sample standard deviations — the
    standard outlier-rejection step before fitting a light curve.

    One pass computes each cell's mean/std (``aggregate`` HOFs), a second
    ``filter`` keeps elements within the band; elements with NULL ``field``
    are kept (they carry no evidence). Cells with < 2 usable values (std
    undefined or 0) pass through unclipped. Replaces ``nest`` in place
    unless ``out`` names a new column. Zero shuffle.

    ``iters``: astropy-style iterative clipping — mean/std are recomputed
    over the SURVIVORS and the band re-applied, ``iters`` times (astropy's
    ``maxiters``; a cell that stops losing elements is a fixed point, so
    extra iterations are no-ops on it). Iterations compose through
    :func:`_let` bindings so the expression grows LINEARLY with ``iters``
    — chaining projections instead would let projection-collapse inline
    each round into every reference of the next, exponentially (measured:
    iters=2 built a 1.3 MB task binary and fell out of codegen). Still
    one projection, zero shuffle.
    """
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out = out or nest
    expr = quote(nest)
    for i in range(iters):
        expr = _sigma_clip_sql(expr, field, sigma, tag=i)
    return df.withColumn(out, F.expr(expr))


def _let(val: str, var: str, body: str) -> str:
    """SQL 'let' binding via a single-element HOF:
    ``element_at(transform(array(val), var -> body), 1)`` evaluates
    ``val`` ONCE and binds it to ``var`` inside ``body``. Lambda
    variables are cheap references, so multi-use never re-evaluates
    (HOF lambdas defeat codegen CSE) and composed expressions reference
    their input exactly once."""
    return f"element_at(transform(array({val}), {var} -> {body}), 1)"


def _sigma_clip_sql(arr: str, field: str, sigma: float, tag: int = 0) -> str:
    """One clip round as a pure SQL expression over an array-of-structs
    expression ``arr`` (referenced exactly once — see :func:`_let`).
    ``tag`` uniquifies the lambda variable names across composed rounds.
    ANSI mode: cells with n < 2 never reach a division."""
    qf = quote(field)
    a, v, m, s = (f"__sc{tag}_a", f"__sc{tag}_v", f"__sc{tag}_m", f"__sc{tag}_s")
    vals = (
        f"transform(filter({a}, __x -> __x.{qf} IS NOT NULL), "
        f"__x -> CAST(__x.{qf} AS DOUBLE))"
    )
    mean = (
        f"CASE WHEN size({v}) > 0 THEN "
        f"aggregate({v}, CAST(0.0 AS DOUBLE), (__a, __v) -> __a + __v) "
        f"/ size({v}) END"
    )
    # sample variance via sum of squared deviations from the cell mean
    ssd = (
        f"aggregate({v}, CAST(0.0 AS DOUBLE), "
        f"(__a, __v) -> __a + (__v - {m}) * (__v - {m}))"
    )
    std = f"CASE WHEN size({v}) >= 2 THEN sqrt({ssd} / (size({v}) - 1)) END"
    clipped = (
        f"CASE WHEN size({v}) >= 2 AND {s} > 0 THEN "
        f"filter({a}, __x -> __x.{qf} IS NULL OR "
        f"abs(CAST(__x.{qf} AS DOUBLE) - {m}) <= {sigma} * {s}) "
        f"ELSE {a} END"
    )
    body = _let(std, s, clipped)
    body = _let(mean, m, body)
    body = _let(vals, v, body)
    return _let(arr, a, body)


def trend_slope(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    out: str | None = None,
    time_scale: float = 1.0,
) -> DataFrame:
    """Per-cell OLS slope of ``value_field`` against ``time_field`` — the
    cheapest per-object trend/variability statistic.

    ``slope = sum((x - x_mean)(y - y_mean)) / sum((x - x_mean)^2)`` over the
    cell's elements with both values non-NULL; NULL when < 2 such elements
    or the times are constant. ``time_scale`` divides the time axis first
    (e.g. ``86_400e9`` turns an int64-nano axis into days, so the slope is
    per-day and the centered sums stay well inside double precision).

    Centered two-pass form, not the raw-moment formula: epoch-scale x
    values square to ~1e36 where doubles keep only ~1e20 of resolution —
    centering first keeps every term small. All HOF arithmetic, zero
    shuffle, one new base column ``out`` (default ``{nest}_slope``).
    """
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_slope"
    qn = quote(nest)
    qt, qv = quote(time_field), quote(value_field)
    # TIMESTAMP axes reduce to epoch microseconds first (time_scale is then
    # in microseconds), mirroring rebin/phase_fold
    if _time_kind(df, nest, time_field) == "timestamp":
        t_sql = f"unix_micros(CAST(__x.{qt} AS TIMESTAMP))"
    else:
        t_sql = f"__x.{qt}"
    pairs_c = "__ts_pairs"
    # (x, y) pairs with both present; x pre-scaled
    staged = df.withColumn(
        pairs_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qt} IS NOT NULL AND "
            f"__x.{qv} IS NOT NULL), __x -> struct("
            f"CAST({t_sql} AS DOUBLE) / CAST({time_scale} AS DOUBLE) AS x, "
            f"CAST(__x.{qv} AS DOUBLE) AS y))"
        ),
    )
    qp = quote(pairs_c)
    n = f"size({qp})"
    xm_c, ym_c = "__ts_xm", "__ts_ym"
    staged = staged.withColumn(
        xm_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qp}, CAST(0.0 AS DOUBLE), "
               f"(__a, __p) -> __a + __p.x) / {n} END"),
    ).withColumn(
        ym_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qp}, CAST(0.0 AS DOUBLE), "
               f"(__a, __p) -> __a + __p.y) / {n} END"),
    )
    qxm, qym = quote(xm_c), quote(ym_c)
    sxy = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__a, __p) -> __a + (__p.x - {qxm}) * (__p.y - {qym}))"
    )
    sxx = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__a, __p) -> __a + (__p.x - {qxm}) * (__p.x - {qxm}))"
    )
    slope = f"CASE WHEN {n} >= 2 AND {sxx} > 0 THEN {sxy} / {sxx} END"
    return staged.withColumn(out, F.expr(slope)).drop(pairs_c, xm_c, ym_c)


def nest_zscore(
    df: DataFrame,
    nest: str,
    field: str,
    out_field: str | None = None,
) -> DataFrame:
    """Per-cell z-score: adds ``{field}_z = (v - cell_mean) / cell_std``
    (sample std) to every element — the standard per-object normalization
    before featurizing heterogeneous series for ML. NULL where the value
    is NULL or the cell has < 2 usable values or zero spread.

    Same staged mean/std computation as :func:`sigma_clip`; zero shuffle.
    """
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out_field = out_field or f"{field}_z"
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    qn, qf = quote(nest), quote(field)
    vals_c, m_c, s_c = "__nz_vals", "__nz_mean", "__nz_std"
    staged = df.withColumn(
        vals_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qf} IS NOT NULL), "
            f"__x -> CAST(__x.{qf} AS DOUBLE))"
        ),
    )
    qv = quote(vals_c)
    n = f"size({qv})"
    staged = staged.withColumn(
        m_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qv}, CAST(0.0 AS DOUBLE), "
               f"(__a, __v) -> __a + __v) / {n} END"),
    )
    qm = quote(m_c)
    staged = staged.withColumn(
        s_c,
        F.expr(f"CASE WHEN {n} >= 2 THEN sqrt(aggregate({qv}, "
               f"CAST(0.0 AS DOUBLE), (__a, __v) -> __a + (__v - {qm}) * "
               f"(__v - {qm})) / ({n} - 1)) END"),
    )
    qs = quote(s_c)
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = (
        f"CASE WHEN __x.{qf} IS NOT NULL AND {qs} IS NOT NULL AND {qs} > 0 "
        f"THEN (CAST(__x.{qf} AS DOUBLE) - {qm}) / {qs} END"
    )
    body = struct_sql(keep)
    return (
        staged.withColumn(nest, F.expr(f"transform({qn}, __x -> {body})"))
        .drop(vals_c, m_c, s_c)
    )


def nest_topk(
    df: DataFrame,
    nest: str,
    field: str,
    k: int,
    ascending: bool = False,
    out: str | None = None,
) -> DataFrame:
    """Keep each cell's k extreme elements by ``field`` — the per-group
    ``nlargest``/``nsmallest`` idiom without explode, window, or shuffle.

    Elements sort by ``field`` (descending by default = k largest), NULLs
    last, ties broken by original position stably via ``array_sort``'s
    stable comparator; the first k survive in sorted order. Replaces
    ``nest`` unless ``out`` is given.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out = out or nest
    qn, qf = quote(nest), quote(field)
    lt, gt = ("-1", "1") if ascending else ("1", "-1")
    cmp = (
        f"(__l, __r) -> CASE "
        f"WHEN __l.{qf} IS NULL AND __r.{qf} IS NULL THEN 0 "
        f"WHEN __l.{qf} IS NULL THEN 1 WHEN __r.{qf} IS NULL THEN -1 "
        f"WHEN __l.{qf} < __r.{qf} THEN {lt} "
        f"WHEN __l.{qf} > __r.{qf} THEN {gt} ELSE 0 END"
    )
    return df.withColumn(out, F.expr(f"slice(array_sort({qn}, {cmp}), 1, {k})"))


def nest_wmean(
    df: DataFrame,
    nest: str,
    value_field: str,
    error_field: str,
    out: str | None = None,
) -> DataFrame:
    """Per-cell inverse-variance weighted mean: the standard combination of
    measurements with per-point uncertainties (``flux`` + ``flux_error``
    in the reference's own generated schema, ``datasets/generation.py``).

    ``wmean = sum(v / e^2) / sum(1 / e^2)`` over elements where both value
    and a POSITIVE error are present; NULL when no such element. Adds base
    column ``out`` (default ``{nest}_wmean``); pure HOFs, zero shuffle.
    """
    fields = nested_field_names(df, nest)
    for f_ in (value_field, error_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_wmean"
    qn = quote(nest)
    qv, qe = quote(value_field), quote(error_field)
    pairs_c = "__wm_pairs"
    staged = df.withColumn(
        pairs_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qv} IS NOT NULL AND "
            f"__x.{qe} IS NOT NULL AND CAST(__x.{qe} AS DOUBLE) > 0), "
            f"__x -> struct(CAST(__x.{qv} AS DOUBLE) AS v, "
            f"CAST(__x.{qe} AS DOUBLE) AS e))"
        ),
    )
    qp = quote(pairs_c)
    num = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__a, __p) -> __a + __p.v / (__p.e * __p.e))"
    )
    den = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__a, __p) -> __a + CAST(1.0 AS DOUBLE) / (__p.e * __p.e))"
    )
    wmean = f"CASE WHEN size({qp}) > 0 THEN ({num}) / ({den}) END"
    return staged.withColumn(out, F.expr(wmean)).drop(pairs_c)


def nest_interp(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    grid: list,
    out: str | None = None,
) -> DataFrame:
    """Per-cell linear interpolation of ``value_field`` onto fixed ``grid``
    time points — regularize irregularly-sampled series (the step before
    feeding light curves or event streams to fixed-width models).

    Adds a nested column ``out`` (default ``{nest}_interp``) of
    ``array<struct<t: double, v: double>>``, one element per grid point:
    linear between the bracketing observations, exact at coincident
    times, NULL outside the cell's observed range (no extrapolation) or
    when the cell has no usable points. Elements with NULL time or value
    are ignored. The grid is a plan literal — pass times in the same
    units as ``time_field`` (TIMESTAMP fields: epoch microseconds).

    Per grid point the bracketing pair comes from ``element_at(filter(
    sorted, t <= g), -1)`` / ``element_at(filter(sorted, t >= g), 1)`` over
    the cell sorted by (t, original order) — O(grid x elements) per cell,
    zero shuffle, the same trade as :func:`rebin`. Ties on t resolve to
    the LAST element in cell order below and the FIRST above.
    """
    if not grid:
        raise ValueError("grid must be non-empty")
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_interp"
    qn = quote(nest)
    qt, qv = quote(time_field), quote(value_field)
    if _time_kind(df, nest, time_field) == "timestamp":
        t_sql = f"CAST(unix_micros(CAST(__x.{qt} AS TIMESTAMP)) AS DOUBLE)"
    else:
        t_sql = f"CAST(__x.{qt} AS DOUBLE)"
    pts_c = "__ni_pts"
    # usable (t, v) pairs, sorted by t (stable: equal t keeps cell order)
    pairs = (
        f"transform(filter({qn}, __x -> __x.{qt} IS NOT NULL AND "
        f"__x.{qv} IS NOT NULL), __x -> struct({t_sql} AS t, "
        f"CAST(__x.{qv} AS DOUBLE) AS v))"
    )
    cmp = (
        "(__l, __r) -> CASE WHEN __l.t < __r.t THEN -1 "
        "WHEN __l.t > __r.t THEN 1 ELSE 0 END"
    )
    staged = df.withColumn(pts_c, F.expr(f"array_sort({pairs}, {cmp})"))
    qp = quote(pts_c)
    grid_sql = "array(" + ", ".join(
        f"CAST({float(g)} AS DOUBLE)" for g in grid
    ) + ")"
    # try_element_at: empty bracket side -> NULL (ANSI element_at raises)
    before = f"try_element_at(filter({qp}, __p -> __p.t <= __g), -1)"
    after = f"try_element_at(filter({qp}, __p -> __p.t >= __g), 1)"
    # two-stage: materialize the bracketing pair once per grid point, then
    # compute the interpolant from the materialized structs
    bracket = (
        f"transform({grid_sql}, __g -> struct(__g AS t, {before} AS b, "
        f"{after} AS a))"
    )
    interp = (
        "CASE "
        "WHEN __s.b IS NULL OR __s.a IS NULL THEN CAST(NULL AS DOUBLE) "
        "WHEN __s.a.t = __s.b.t THEN __s.b.v "
        "ELSE __s.b.v + (__s.a.v - __s.b.v) * (__s.t - __s.b.t) "
        "/ (__s.a.t - __s.b.t) END"
    )
    expr = (
        f"transform({bracket}, __s -> struct(__s.t AS t, {interp} AS v))"
    )
    return staged.withColumn(out, F.expr(expr)).drop(pts_c)


def nest_corr(
    df: DataFrame,
    nest: str,
    field_a: str,
    field_b: str,
    out: str | None = None,
) -> DataFrame:
    """Per-cell Pearson correlation between two nested fields (e.g. flux
    in two bands, value vs. uncertainty) — NULL when fewer than 2 complete
    pairs or either field is constant.

    Same centered two-pass HOF shape as :func:`trend_slope`:
    ``corr = sum((a - am)(b - bm)) / sqrt(sum((a - am)^2) sum((b - bm)^2))``.
    Zero shuffle; adds base column ``out`` (default ``{nest}_corr``).
    """
    fields = nested_field_names(df, nest)
    for f_ in (field_a, field_b):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_corr"
    qn = quote(nest)
    qa, qb = quote(field_a), quote(field_b)
    pairs_c, am_c, bm_c = "__nc_pairs", "__nc_am", "__nc_bm"
    staged = df.withColumn(
        pairs_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qa} IS NOT NULL AND "
            f"__x.{qb} IS NOT NULL), __x -> struct("
            f"CAST(__x.{qa} AS DOUBLE) AS a, CAST(__x.{qb} AS DOUBLE) AS b))"
        ),
    )
    qp = quote(pairs_c)
    n = f"size({qp})"
    staged = staged.withColumn(
        am_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qp}, CAST(0.0 AS DOUBLE), "
               f"(__s, __p) -> __s + __p.a) / {n} END"),
    ).withColumn(
        bm_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qp}, CAST(0.0 AS DOUBLE), "
               f"(__s, __p) -> __s + __p.b) / {n} END"),
    )
    qam, qbm = quote(am_c), quote(bm_c)
    sab = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__s, __p) -> __s + (__p.a - {qam}) * (__p.b - {qbm}))"
    )
    saa = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__s, __p) -> __s + (__p.a - {qam}) * (__p.a - {qam}))"
    )
    sbb = (
        f"aggregate({qp}, CAST(0.0 AS DOUBLE), "
        f"(__s, __p) -> __s + (__p.b - {qbm}) * (__p.b - {qbm}))"
    )
    corr = (
        f"CASE WHEN {n} >= 2 AND {saa} > 0 AND {sbb} > 0 "
        f"THEN ({sab}) / sqrt(({saa}) * ({sbb})) END"
    )
    return staged.withColumn(out, F.expr(corr)).drop(pairs_c, am_c, bm_c)


def nest_describe(
    df: DataFrame,
    nest: str,
    field: str,
    prefix: str | None = None,
) -> DataFrame:
    """Per-CELL summary of one nested field as base columns:
    ``{p}_n`` (non-NULL count), ``{p}_mean``, ``{p}_std`` (sample),
    ``{p}_min``, ``{p}_max`` — the row-wise counterpart of the
    table-level :func:`operators.aggregates.describe`, and the
    bread-and-butter featurization of a packed series (amplitude = max
    - min, etc.). All HOFs over a once-materialized value array; zero
    shuffle. ``prefix`` defaults to ``{nest}_{field}``.
    """
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    p = prefix or f"{nest}_{field}"
    qn, qf = quote(nest), quote(field)
    vals_c, m_c = "__nd_vals", f"{p}_mean"
    staged = df.withColumn(
        vals_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qf} IS NOT NULL), "
            f"__x -> CAST(__x.{qf} AS DOUBLE))"
        ),
    )
    qv = quote(vals_c)
    n = f"size({qv})"
    # NULL cells count as 0 (the count_nested zero-fill convention); their
    # stats stay NULL
    staged = staged.withColumn(
        f"{p}_n", F.expr(f"CAST(COALESCE({n}, 0) AS BIGINT)")
    )
    staged = staged.withColumn(
        m_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qv}, CAST(0.0 AS DOUBLE), "
               f"(__a, __v) -> __a + __v) / {n} END"),
    )
    qm = quote(m_c)
    staged = staged.withColumn(
        f"{p}_std",
        F.expr(f"CASE WHEN {n} >= 2 THEN sqrt(aggregate({qv}, "
               f"CAST(0.0 AS DOUBLE), (__a, __v) -> __a + (__v - {qm}) * "
               f"(__v - {qm})) / ({n} - 1)) END"),
    )
    staged = staged.withColumn(f"{p}_min", F.expr(f"array_min({qv})"))
    staged = staged.withColumn(f"{p}_max", F.expr(f"array_max({qv})"))
    return staged.drop(vals_c)


def _ewm_explode(
    df: DataFrame, nest: str, field: str, a: float, out_field: str,
    fields: list[str],
) -> DataFrame:
    """Mega-cell path for :func:`nest_ewm`: per-cell (pos, value) rows ->
    applyInPandas O(n) fold -> pos-aligned array -> rebuild the nest with
    ``element_at``. See nest_ewm's docstring for the parity contract."""
    import pandas as pd

    onema = 1.0 - a
    stamped = _stamped(df)
    flat = (
        stamped.select("__rid", F.posexplode(F.col(nest)).alias("__pos", "__e"))
        .select(
            "__rid", "__pos",
            F.col("__e").getField(field).cast("double").alias("__v"),
        )
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__pos")
        s = None
        outv = []
        for v in pdf["__v"]:
            if pd.isna(v):
                outv.append(None)
            else:
                v = float(v)
                s = v if s is None else a * v + onema * s
                outv.append(s)
        pdf = pdf[["__rid", "__pos"]].copy()
        pdf["__ewm"] = outv
        return pdf

    ew = flat.groupBy("__rid").applyInPandas(
        fold, schema="__rid long, __pos int, __ewm double"
    )
    packed = ew.groupBy("__rid").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__pos").alias("p"),
                                    F.col("__ewm").alias("v")))
        ).alias("__evals")
    )
    keep = {f: f"__x.{quote(f)}" for f in fields}
    keep[out_field] = "element_at(__evals, __i + 1).v"
    body = struct_sql(keep)
    qn = quote(nest)
    rebuilt = (
        f"CASE WHEN {qn} IS NULL THEN NULL "
        f"ELSE transform({qn}, (__x, __i) -> {body}) END"
    )
    return (
        stamped.join(packed, "__rid", "left")
        .withColumn(nest, F.expr(rebuilt))
        .drop("__rid", "__evals")
    )


def nest_ewm(
    df: DataFrame,
    nest: str,
    field: str,
    alpha: float,
    out_field: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Per-cell exponentially weighted mean trail — pandas
    ``groupby(...).ewm(alpha, adjust=False, ignore_na=True).mean()``
    semantics: element i gets ``s_i = alpha*v_i + (1-alpha)*s_{i-1}``
    over the cell's NON-NULL values in element order (NULL elements keep
    a NULL ewm and do not advance the state — ``ignore_na=True``).

    Implemented as the LITERAL recursion: per element, a sequential
    ``aggregate`` fold ``s = a*v + (1-a)*s`` over the preceding non-NULL
    values (init = first value) — O(n^2) per cell like
    :func:`nest_rolling`, zero shuffle, and bit-identical to a recursive
    SQL replay (same two flops per step, same order), so the oracle
    needs no fp tolerance.

    ``engine='explode'``: the mega-cell escape hatch — the recursion has
    no windowed-SQL form, so each cell's (pos, value) rows run through an
    ``applyInPandas`` group that replays the identical fold in an O(n)
    Python loop with the same IEEE double operations (``a*v + (1-a)*s``),
    then repacks in element order. Bit-identical to the HOF engine except
    for genuine NaN inputs (Arrow transports SQL NULL as NaN, so the
    explode engine treats NaN values as missing, like pandas; the HOF
    engine folds them like SQL).
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    _check_engine(engine)
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out_field = out_field or f"{field}_ewm"
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    if engine == "explode":
        return _ewm_explode(df, nest, field, float(alpha), out_field, fields)
    qn, qf = quote(nest), quote(field)
    a = float(alpha)
    # non-NULL values among elements 0..i (inclusive), in order
    prior = (
        f"transform(filter(slice({qn}, 1, __i + 1), "
        f"__e -> __e.{qf} IS NOT NULL), __e -> CAST(__e.{qf} AS DOUBLE))"
    )
    vals_of = "__w.vs"
    m = f"(size({vals_of}) - 1)"
    # the literal recursion: fold s = a*v + (1-a)*s over values 2..k with
    # init = value 1 (aggregate evaluates the array strictly in order)
    ewm_val = (
        f"CASE WHEN size({vals_of}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE aggregate(slice({vals_of}, 2, greatest({m}, 0)), "
        f"element_at({vals_of}, 1), "
        f"(__acc, __v) -> {a}D * __v + {1 - a}D * __acc) END"
    )
    keep = {f: f"__w.__x.{quote(f)}" for f in fields}
    keep[out_field] = (
        f"CASE WHEN __w.__x.{qf} IS NOT NULL THEN {ewm_val} END"
    )
    body = struct_sql(keep)
    staged = (
        f"transform(transform({qn}, (__x, __i) -> "
        f"struct(__x AS __x, {prior} AS vs)), __w -> {body})"
    )
    return df.withColumn(nest, F.expr(staged))


def nest_cum(
    df: DataFrame,
    nest: str,
    field: str,
    stat: str = "sum",
    out_field: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Per-cell cumulative trail — pandas ``groupby(...).cumsum/cummin/
    cummax`` semantics: element i gets the running ``stat`` of the cell's
    non-NULL values through position i (NULL elements keep NULL and do
    not advance the state).

    A sequential ``aggregate`` fold per element (O(n^2) per cell, zero
    shuffle). The left-to-right fold makes cumulative sums bit-identical
    to a ``ROWS UNBOUNDED PRECEDING`` window replay — which is exactly
    what ``engine='explode'`` runs (posexplode -> running window ->
    repack): the mega-cell escape hatch, O(n) total work per cell at the
    cost of a snapshot + two element shuffles. Results are bit-identical
    between engines (same additions in the same order).
    """
    allowed = {"sum", "min", "max"}
    if stat not in allowed:
        raise ValueError(f"stat must be one of {sorted(allowed)}")
    _check_engine(engine)
    fields = nested_field_names(df, nest)
    if field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{field}'")
    out_field = out_field or f"{field}_cum{stat}"
    if out_field in fields:
        raise ValueError(f"Nested column '{nest}' already has field '{out_field}'")
    if engine == "explode":
        from pyspark.sql import Window as W

        stamped = _stamped(df)
        flat = stamped.select(
            "__rid", F.posexplode(F.col(nest)).alias("__pos", "__e")
        )
        v = F.col("__e").getField(field).cast("double")
        w = (
            W.partitionBy("__rid").orderBy("__pos")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        run = {"sum": F.sum, "min": F.min, "max": F.max}[stat](v).over(w)
        val = F.when(v.isNotNull(), run)
        packed = _repack_elements(flat, fields, out_field, val)
        return _join_back_elements(stamped, packed, nest, fields, out_field)
    qn, qf = quote(nest), quote(field)
    prior = (
        f"transform(filter(slice({qn}, 1, __i + 1), "
        f"__e -> __e.{qf} IS NOT NULL), __e -> CAST(__e.{qf} AS DOUBLE))"
    )
    vals = "__w.vs"
    if stat == "sum":
        val = (
            f"aggregate(slice({vals}, 2, greatest(size({vals}) - 1, 0)), "
            f"element_at({vals}, 1), (__acc, __v) -> __acc + __v)"
        )
    elif stat == "min":
        val = f"array_min({vals})"
    else:
        val = f"array_max({vals})"
    keep = {f: f"__w.__x.{quote(f)}" for f in fields}
    keep[out_field] = (
        f"CASE WHEN __w.__x.{qf} IS NOT NULL AND size({vals}) > 0 "
        f"THEN {val} END"
    )
    body = struct_sql(keep)
    staged = (
        f"transform(transform({qn}, (__x, __i) -> "
        f"struct(__x AS __x, {prior} AS vs)), __w -> {body})"
    )
    return df.withColumn(nest, F.expr(staged))


def nest_dedup(
    df: DataFrame,
    nest: str,
    by: str | list[str] | None = None,
    out: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Per-cell element deduplication: keep each cell's FIRST element for
    every distinct value of ``by`` (one field, several, or None = the
    whole element) — pandas ``drop_duplicates(keep='first')`` at element
    grain. Classic use: collapse repeated measurements before fitting.

    An indexed ``filter`` keeps element i iff no earlier element shares
    its key (``exists`` over the preceding slice) — O(n^2) per cell, zero
    shuffle, order-preserving. NULL keys deduplicate like any other value
    (SQL ``IS NOT DISTINCT FROM``).

    ``engine='explode'``: the mega-cell escape hatch — posexplode ->
    ``row_number`` per (row, key) -> keep the first -> order-preserving
    repack. Linear per cell (snapshot + two element shuffles, as with
    :func:`nest_rolling`); identical results (window PARTITION BY groups
    NULL keys together, matching ``IS NOT DISTINCT FROM``).
    """
    _check_engine(engine)
    fields = nested_field_names(df, nest)
    if by is None:
        keys = list(fields)
    else:
        keys = [by] if isinstance(by, str) else list(by)
        missing = [k for k in keys if k not in fields]
        if missing:
            raise KeyError(f"Nested column '{nest}' has no fields {missing}")
    out = out or nest
    if engine == "explode":
        from pyspark.sql import Window as W

        stamped = _stamped(df)
        flat = stamped.select(
            "__rid", F.posexplode(F.col(nest)).alias("__pos", "__e")
        )
        w = W.partitionBy(
            "__rid", *[F.col("__e").getField(k) for k in keys]
        ).orderBy("__pos")
        kept = flat.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") == 1
        )
        packed = (
            kept.select(
                "__rid",
                F.struct(F.col("__pos").alias("p"),
                         F.col("__e").alias("e")).alias("__pe"),
            )
            .groupBy("__rid")
            .agg(F.array_sort(F.collect_list("__pe")).alias("__arr"))
            .select("__rid",
                    F.expr("transform(__arr, __s -> __s.e)").alias("__packed"))
        )
        return (
            stamped.join(packed, "__rid", "left")
            .withColumn(out, F.coalesce(F.col("__packed"), F.col(nest)))
            .drop("__rid", "__packed")
        )
    qn = quote(nest)
    same = " AND ".join(
        f"(__p.{quote(k)} IS NOT DISTINCT FROM __x.{quote(k)})" for k in keys
    )
    dup_before = (
        f"exists(slice({qn}, 1, __i), __p -> {same})"
    )
    return df.withColumn(
        out, F.expr(f"filter({qn}, (__x, __i) -> NOT {dup_before})")
    )


def nest_decimate(
    df: DataFrame,
    nest: str,
    k: int,
    offset: int = 0,
    out: str | None = None,
) -> DataFrame:
    """Per-cell decimation: keep every k-th element (positions ``offset``,
    ``offset+k``, ...) — the deterministic downsample for oversampled
    series (plot thinning, cheap sketches, bandwidth-matched exports).
    Order-preserving indexed ``filter``, zero shuffle, O(n) per cell.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0 <= offset < k:
        raise ValueError("offset must be in [0, k)")
    nested_field_names(df, nest)  # validates the column
    out = out or nest
    qn = quote(nest)
    return df.withColumn(
        out, F.expr(f"filter({qn}, (__x, __i) -> (__i % {k}) = {offset})")
    )


def nest_sample(
    df: DataFrame,
    nest: str,
    fraction: float,
    key_field: str,
    salt: str = "",
    out: str | None = None,
) -> DataFrame:
    """Deterministic per-cell element sampling: keep an element iff
    ``md5(key ':' salt)`` maps below ``fraction`` of the 32-bit hash space
    — every engine (and every rerun) selects the SAME elements, unlike
    ``rand()``-based sampling. Vary ``salt`` for an independent draw.

    The keep decision depends only on the element's own key, so the
    sample is consistent ACROSS cells and tables: the same measurement id
    is kept everywhere it appears (exactly what joins downstream of a
    sample need). Pure per-element ``filter``, zero shuffle.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    fields = nested_field_names(df, nest)
    if key_field not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{key_field}'")
    out = out or nest
    qn, qk = quote(nest), quote(key_field)
    threshold = int(fraction * 4294967296)
    salt_sql = _sql_literal(f":{salt}") if salt else "':'"
    h = (
        f"CAST(conv(substring(md5(concat(CAST(__x.{qk} AS STRING), "
        f"{salt_sql})), 1, 8), 16, 10) AS BIGINT)"
    )
    return df.withColumn(
        out,
        F.expr(
            f"filter({qn}, __x -> __x.{qk} IS NOT NULL AND {h} < {threshold})"
        ),
    )


def _let_sql(val_sql: str, var: str, body_sql: str) -> str:
    """SQL let-binding: evaluate ``val_sql`` ONCE, bind it to ``var``, and
    use it in ``body_sql`` — emulated with a single-element ``transform``.
    Spark SQL lambdas have no local bindings, and re-inlining a
    subexpression that itself contains an ``aggregate`` would re-scan the
    cell once per mention; this keeps every staged reduction single-pass.
    """
    return f"element_at(transform(array({val_sql}), {var} -> {body_sql}), 1)"


def periodogram(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    freqs,
    out: str | None = None,
    time_scale: float = 1.0,
    normalization: str = "standard",
    best: bool = False,
) -> DataFrame:
    """Per-cell Lomb-Scargle periodogram (Scargle 1982; Zechmeister &
    Kurster 2009 eq. 1-3 without the floating mean) — THE period-finding
    statistic for the irregularly-sampled light curves the reference's
    astronomy users hold in nested columns (reference ``README.md:15-21``
    motivates exactly this workload; the reference leaves it to user
    ``reduce`` lambdas over astropy).

    For each frequency ``f`` (cycles per scaled time unit) with
    ``w = 2*pi*f`` and the cell's usable points ``(t_i, y_i)``:

    * ``tau``: ``atan2(sum sin(2wt), sum cos(2wt)) / (2w)`` — the phase
      shift that makes the sine/cosine bases orthogonal,
    * ``P_raw = 0.5 * [ (sum yc*cos(w(t-tau)))^2 / sum cos^2(w(t-tau))
      + (sum yc*sin(w(t-tau)))^2 / sum sin^2(w(t-tau)) ]`` with ``yc``
      mean-centered,
    * ``normalization='standard'`` rescales to ``2*P_raw / chi2_ref``
      (``chi2_ref = sum yc^2``) so power lies in [0, 1] like astropy's
      ``standard``; ``'none'`` returns ``P_raw``.

    Adds ``out`` (default ``{nest}_pgram``) = ``array<struct<freq,
    power>>``; power is NULL per freq when the cell has < 2 usable points
    or zero variance. ``best=True`` also adds ``{out}_freq`` /
    ``{out}_power`` (argmax; first freq wins ties — the grid is scanned
    in order).

    Numerical shape: element times are centered on the cell's min IN
    INT64 (exact for epoch-nano axes; the q47 lesson) before the cast to
    double and ``time_scale`` division, so trig arguments stay small.
    TIMESTAMP axes reduce to epoch microseconds first (``time_scale`` is
    then in microseconds). Values are mean-centered per cell.

    Scale shape: pure HOFs — zero shuffle, O(n_freq * n) per cell, one
    pass per staged reduction (see :func:`_let_sql`), embarrassingly
    parallel across rows; the frequency grid is a plan literal of
    O(n_freq) nodes. This is the textbook dense-grid evaluation; for
    > ~10^4 frequencies chunk the grid across several calls.
    """
    freqs = [float(f) for f in freqs]
    if not freqs:
        raise ValueError("freqs must be a non-empty sequence")
    for f_ in freqs:
        if not (f_ > 0.0) or f_ != f_ or f_ == float("inf"):
            raise ValueError(f"every frequency must be finite and > 0, got {f_!r}")
    if not (float(time_scale) > 0.0):
        raise ValueError(f"time_scale must be > 0, got {time_scale!r}")
    if normalization not in ("standard", "none"):
        raise ValueError(
            f"normalization must be 'standard' or 'none', got {normalization!r}")
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_pgram"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    if _time_kind(df, nest, time_field) == "timestamp":
        t_sql = f"unix_micros(CAST(__x.{qt} AS TIMESTAMP))"
    else:
        t_sql = f"__x.{qt}"

    raw_c, xy_c, ym_c, p_c, chi_c = (
        "__pg_raw", "__pg_xy", "__pg_ym", "__pg_p", "__pg_chi2")
    staged = df.withColumn(
        raw_c,
        F.expr(
            f"transform(filter({qn}, __x -> __x.{qt} IS NOT NULL AND "
            f"__x.{qv} IS NOT NULL), __x -> struct({t_sql} AS t, "
            f"CAST(__x.{qv} AS DOUBLE) AS y))"
        ),
    )
    qr = quote(raw_c)
    # exact centering on the cell's min BEFORE any double cast
    staged = staged.withColumn(
        xy_c,
        F.expr(
            f"{_let_sql(f'array_min(transform({qr}, __p -> __p.t))', '__t0', f'transform({qr}, __p -> struct(CAST(__p.t - __t0 AS DOUBLE) / CAST({float(time_scale)!r} AS DOUBLE) AS x, __p.y AS y))')}"
        ),
    )
    qxy = quote(xy_c)
    n = f"size({qxy})"
    staged = staged.withColumn(
        ym_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qxy}, 0.0D, "
               f"(__a, __p) -> __a + __p.y) / {n} END"),
    )
    qym = quote(ym_c)
    staged = staged.withColumn(
        p_c,
        F.expr(f"transform({qxy}, __p -> struct(__p.x AS x, "
               f"__p.y - {qym} AS y))"),
    )
    qp = quote(p_c)
    staged = staged.withColumn(
        chi_c,
        F.expr(f"aggregate({qp}, 0.0D, (__a, __p) -> __a + __p.y * __p.y)"),
    )
    qchi = quote(chi_c)

    sc_val = (
        f"aggregate({qp}, named_struct('s', 0.0D, 'c', 0.0D), "
        f"(__a, __q) -> named_struct("
        f"'s', __a.s + sin(2.0D * __w * __q.x), "
        f"'c', __a.c + cos(2.0D * __w * __q.x)))"
    )
    tau_val = (
        f"CASE WHEN __sc.s = 0.0D AND __sc.c = 0.0D THEN 0.0D "
        f"ELSE atan2(__sc.s, __sc.c) / (2.0D * __w) END"
    )
    s4_val = (
        f"aggregate({qp}, named_struct("
        f"'yc', 0.0D, 'ys', 0.0D, 'cc', 0.0D, 'ss', 0.0D), "
        f"(__a, __q) -> named_struct("
        f"'yc', __a.yc + __q.y * cos(__w * (__q.x - __tau)), "
        f"'ys', __a.ys + __q.y * sin(__w * (__q.x - __tau)), "
        f"'cc', __a.cc + cos(__w * (__q.x - __tau)) * cos(__w * (__q.x - __tau)), "
        f"'ss', __a.ss + sin(__w * (__q.x - __tau)) * sin(__w * (__q.x - __tau))))"
    )
    raw_power = (
        f"0.5D * ((CASE WHEN __s4.cc > 0.0D THEN "
        f"__s4.yc * __s4.yc / __s4.cc ELSE 0.0D END) + "
        f"(CASE WHEN __s4.ss > 0.0D THEN "
        f"__s4.ys * __s4.ys / __s4.ss ELSE 0.0D END))"
    )
    if normalization == "standard":
        final = f"({raw_power}) * 2.0D / {qchi}"
    else:
        final = f"({raw_power})"
    power = _let_sql(
        "2.0D * pi() * __f", "__w",
        _let_sql(sc_val, "__sc",
                 _let_sql(tau_val, "__tau",
                          _let_sql(s4_val, "__s4", final))))
    freq_lit = "array(" + ", ".join(f"CAST({f!r} AS DOUBLE)" for f in freqs) + ")"
    staged = staged.withColumn(
        out,
        F.expr(
            f"CASE WHEN {n} >= 2 AND {qchi} > 0.0D THEN "
            f"transform({freq_lit}, __f -> "
            f"named_struct('freq', __f, 'power', {power})) "
            f"ELSE transform({freq_lit}, __f -> "
            f"named_struct('freq', __f, 'power', CAST(NULL AS DOUBLE))) END"
        ),
    )
    if best:
        qo = quote(out)
        best_val = (
            f"aggregate({qo}, named_struct("
            f"'f', CAST(NULL AS DOUBLE), 'p', CAST(NULL AS DOUBLE)), "
            f"(__a, __e) -> CASE WHEN __e.power IS NOT NULL AND "
            f"(__a.p IS NULL OR __e.power > __a.p) THEN "
            f"named_struct('f', __e.freq, 'p', __e.power) ELSE __a END)"
        )
        # materialize the argmax struct ONCE in its own projection, then
        # pick .f/.p from it — inlining best_val into both output columns
        # would scan the periodogram array twice per row (HOF lambdas
        # defeat codegen CSE, the hazard this module's comments warn about)
        best_c = "__pg_best"
        staged = (
            staged.withColumn(best_c, F.expr(best_val))
            .withColumn(f"{out}_freq", F.col(best_c).getField("f"))
            .withColumn(f"{out}_power", F.col(best_c).getField("p"))
            .drop(best_c)
        )
    return staged.drop(raw_c, xy_c, ym_c, p_c, chi_c)


def stetson_jk(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    err_field: str | None = None,
    out_prefix: str | None = None,
) -> DataFrame:
    """Per-cell Stetson J and K variability indices (Stetson 1996 eq. 1-3
    with unit weights and the straight mean — the common non-iterated
    form) over a nested light curve: the standard robust "is this object
    variable?" statistics the reference's users compute via ``reduce``.

    With points sorted by ``(time, value)`` and the relative errors
    ``d_i = sqrt(n/(n-1)) * (v_i - mean) / sigma_i``:

    * ``J = sum_k sign(P_k) * sqrt(|P_k|) / (n-1)`` over the ``n-1``
      CONSECUTIVE pairs ``P_k = d_k * d_{k+1}`` (correlated wander in
      adjacent observations -> J > 0; pure noise -> J ~ 0),
    * ``K = (sum|d|/n) / sqrt(sum d^2 / n)`` (kurtosis proxy: 0.798 for
      a Gaussian, -> 0 for a single spike).

    ``sigma_i`` is the element's ``err_field`` when given (elements with
    NULL or non-positive error are dropped); otherwise the cell's sample
    standard deviation (then J/K are scale-free shape statistics). Adds
    ``{prefix}_j`` / ``{prefix}_k`` (default prefix ``{nest}_stetson``);
    NULL when fewer than 2 usable points, or (std path) when the cell
    has zero spread, or (K) when all deltas are zero.

    Pure HOFs: one ``array_sort``, staged single-pass reductions, zero
    shuffle, O(n log n) per cell.
    """
    fields = nested_field_names(df, nest)
    need = [time_field, value_field] + ([err_field] if err_field else [])
    for f_ in need:
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    prefix = out_prefix or f"{nest}_stetson"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    cond = f"__x.{qt} IS NOT NULL AND __x.{qv} IS NOT NULL"
    if err_field:
        qe = quote(err_field)
        cond += f" AND __x.{qe} IS NOT NULL AND CAST(__x.{qe} AS DOUBLE) > 0.0D"
        e_sql = f"CAST(__x.{qe} AS DOUBLE)"
    else:
        e_sql = "CAST(NULL AS DOUBLE)"
    # struct field order (t, v, e): array_sort's lexicographic comparator
    # gives the (time, value)-sorted order J's consecutive pairs need
    sorted_c, m_c, s_c, d_c = "__st_sorted", "__st_mean", "__st_std", "__st_d"
    staged = df.withColumn(
        sorted_c,
        F.expr(
            f"array_sort(transform(filter({qn}, __x -> {cond}), "
            f"__x -> struct(__x.{qt} AS t, CAST(__x.{qv} AS DOUBLE) AS v, "
            f"{e_sql} AS e)))"
        ),
    )
    qs = quote(sorted_c)
    n = f"size({qs})"
    staged = staged.withColumn(
        m_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qs}, 0.0D, "
               f"(__a, __p) -> __a + __p.v) / {n} END"),
    )
    qm = quote(m_c)
    if err_field:
        sigma = "__p.e"
        staged = staged.withColumn(s_c, F.lit(None).cast("double"))
    else:
        staged = staged.withColumn(
            s_c,
            F.expr(f"CASE WHEN {n} >= 2 THEN sqrt(aggregate({qs}, 0.0D, "
                   f"(__a, __p) -> __a + (__p.v - {qm}) * (__p.v - {qm})) "
                   f"/ ({n} - 1)) END"),
        )
        sigma = quote(s_c)
    qstd = quote(s_c)
    usable = f"{n} >= 2" + ("" if err_field else f" AND {qstd} > 0.0D")
    staged = staged.withColumn(
        d_c,
        F.expr(
            f"CASE WHEN {usable} THEN transform({qs}, __p -> "
            f"sqrt(CAST({n} AS DOUBLE) / ({n} - 1)) * (__p.v - {qm}) / {sigma}) "
            f"END"
        ),
    )
    qd = quote(d_c)
    pk = (f"zip_with(slice({qd}, 1, {n} - 1), slice({qd}, 2, {n} - 1), "
          f"(__a, __b) -> __a * __b)")
    j_sql = (
        f"CASE WHEN {qd} IS NOT NULL THEN "
        f"aggregate({pk}, 0.0D, (__a, __p) -> "
        f"__a + sign(__p) * sqrt(abs(__p))) / ({n} - 1) END"
    )
    sum_abs = f"aggregate({qd}, 0.0D, (__a, __v) -> __a + abs(__v))"
    sum_sq = f"aggregate({qd}, 0.0D, (__a, __v) -> __a + __v * __v)"
    k_sql = (
        f"CASE WHEN {qd} IS NOT NULL AND {sum_sq} > 0.0D THEN "
        f"({sum_abs} / {n}) / sqrt({sum_sq} / {n}) END"
    )
    return (
        staged.withColumn(f"{prefix}_j", F.expr(j_sql))
        .withColumn(f"{prefix}_k", F.expr(k_sql))
        .drop(sorted_c, m_c, s_c, d_c)
    )


def freq_grid(baseline, n_points: int, oversample: float = 5.0) -> list[float]:
    """Astropy-style autofrequency grid for :func:`periodogram`: frequencies
    ``df, 2*df, ...`` with ``df = 1 / (oversample * baseline)`` up to the
    average-Nyquist-ish limit ``n_points / (2 * baseline)``.

    ``baseline`` is the time span (max - min) in the same scaled units the
    periodogram will see; ``n_points`` the typical per-cell element count.
    Plain driver-side helper — the grid becomes a plan literal, so keep it
    to ~10^3-10^4 points (chunk across calls beyond that).
    """
    if not (baseline > 0):
        raise ValueError("baseline must be > 0")
    if n_points < 2:
        raise ValueError("n_points must be >= 2")
    if not (oversample > 0):
        raise ValueError("oversample must be > 0")
    df_ = 1.0 / (oversample * float(baseline))
    f_max = n_points / (2.0 * float(baseline))
    n = max(1, int(f_max / df_))
    return [df_ * (i + 1) for i in range(n)]


def nest_acf(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    lags,
    out: str | None = None,
) -> DataFrame:
    """Per-cell sample autocorrelation at the given INDEX lags, elements
    taken in ``(time, value)`` order: ``acf(k) = sum_i yc_i * yc_{i+k} /
    sum_i yc_i^2`` with ``yc`` mean-centered — the standard
    equal-spacing ACF (for irregular sampling, :func:`periodogram` is the
    principled tool; this matches what users compute with ``np.correlate``
    after resampling or on cadence-regular surveys).

    Adds ``out`` (default ``{nest}_acf``) = ``array<struct<lag int,
    acf double>>``; ``acf`` is NULL for a lag when the cell has fewer
    than ``lag + 1`` usable points or zero variance. Pure HOFs — one
    ``array_sort`` + one ``zip_with`` per lag, zero shuffle.
    """
    lags = [int(k) for k in lags]
    if not lags:
        raise ValueError("lags must be a non-empty sequence")
    if any(k < 1 for k in lags):
        raise ValueError("every lag must be >= 1")
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_acf"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    sorted_c, m_c, d_c, chi_c = "__ac_sorted", "__ac_mean", "__ac_d", "__ac_chi"
    staged = df.withColumn(
        sorted_c,
        F.expr(
            f"array_sort(transform(filter({qn}, __x -> __x.{qt} IS NOT NULL "
            f"AND __x.{qv} IS NOT NULL), __x -> struct(__x.{qt} AS t, "
            f"CAST(__x.{qv} AS DOUBLE) AS v)))"
        ),
    )
    qs = quote(sorted_c)
    n = f"size({qs})"
    staged = staged.withColumn(
        m_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qs}, 0.0D, "
               f"(__a, __p) -> __a + __p.v) / {n} END"),
    )
    qm = quote(m_c)
    staged = staged.withColumn(
        d_c, F.expr(f"transform({qs}, __p -> __p.v - {qm})")
    )
    qd = quote(d_c)
    staged = staged.withColumn(
        chi_c, F.expr(f"aggregate({qd}, 0.0D, (__a, __v) -> __a + __v * __v)")
    )
    qchi = quote(chi_c)
    lag_lit = "array(" + ", ".join(f"CAST({k} AS INT)" for k in lags) + ")"
    num = (
        f"aggregate(zip_with(slice({qd}, 1, {n} - __k), "
        f"slice({qd}, 1 + __k, {n} - __k), (__a, __b) -> __a * __b), "
        f"0.0D, (__s, __p) -> __s + __p)"
    )
    staged = staged.withColumn(
        out,
        F.expr(
            f"transform({lag_lit}, __k -> named_struct('lag', __k, 'acf', "
            f"CASE WHEN {n} >= __k + 1 AND {qchi} > 0.0D "
            f"THEN {num} / {qchi} END))"
        ),
    )
    return staged.drop(sorted_c, m_c, d_c, chi_c)


def structure_function(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    width,
    origin=0,
    out: str | None = None,
) -> DataFrame:
    """Per-cell first-order structure function — the AGN/quasar
    variability statistic: for every PAIR of observations, bin the time
    lag ``t_j - t_i`` (``(t, v)``-ordered, so lags are non-negative) by
    ``bin = floor((lag - origin) / width)`` and report the mean squared
    value difference per occupied lag bin.

    Adds ``out`` (default ``{nest}_sf``) =
    ``array<struct<bin: bigint, n: bigint, sf: double>>`` sorted by bin,
    where ``n`` counts pairs and ``sf = mean((v_j - v_i)^2)`` (the
    common SF^2 convention; take ``sqrt`` downstream for the magnitude
    form). Cells with < 2 usable points get an empty array.

    Exactness: integral (e.g. epoch-nano) time axes bin via exact int64
    floor division — the pair lag is formed BEFORE any double cast;
    TIMESTAMP axes reduce to epoch microseconds (``width``/``origin``
    then in microseconds).

    Scale shape: pure HOFs, zero shuffle — but per-cell cost is
    O(n^2) pairs (+ bins x pairs for the per-bin reduction). Fine for
    the reference domain's cells (hundreds-to-thousands of points);
    for mega-cells, explode the pairs yourself (explode -> self-join on
    the cell key with AQE -> groupBy (key, bin)) — the docstring trade
    documented for the other quadratic per-cell operators applies.
    """
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out = out or f"{nest}_sf"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    kind = _time_kind(df, nest, time_field)
    if kind == "timestamp":
        t_sql = f"unix_micros(CAST(__x.{qt} AS TIMESTAMP))"
        integral = True
    else:
        t_sql = f"__x.{qt}"
        integral = kind == "int"
    sorted_c, pairs_c, bins_c = "__sf_sorted", "__sf_pairs", "__sf_bins"
    staged = df.withColumn(
        sorted_c,
        F.expr(
            f"array_sort(transform(filter({qn}, __x -> __x.{qt} IS NOT NULL "
            f"AND __x.{qv} IS NOT NULL), __x -> struct({t_sql} AS t, "
            f"CAST(__x.{qv} AS DOUBLE) AS v)))"
        ),
    )
    qs = quote(sorted_c)
    n = f"size({qs})"
    lag = "(element_at({s}, __j).t - element_at({s}, __i).t)".format(s=qs)
    bin_sql = _floor_bin_sql(lag, width, origin, integral)
    dv = (f"(element_at({qs}, __j).v - element_at({qs}, __i).v)")
    staged = staged.withColumn(
        pairs_c,
        F.expr(
            f"CASE WHEN {n} >= 2 THEN flatten(transform(sequence(1, {n} - 1), "
            f"__i -> transform(sequence(__i + 1, {n}), __j -> "
            f"struct({bin_sql} AS b, {dv} * {dv} AS d2)))) "
            f"ELSE CAST(array() AS array<struct<b: bigint, d2: double>>) END"
        ),
    )
    qp = quote(pairs_c)
    staged = staged.withColumn(
        bins_c,
        F.expr(f"array_sort(array_distinct(transform({qp}, __p -> __p.b)))"),
    )
    qb = quote(bins_c)
    bin_body = (
        "named_struct('bin', __bb, 'n', CAST(size(__f) AS BIGINT), "
        "'sf', aggregate(__f, 0.0D, (__a, __p) -> __a + __p.d2) / size(__f))"
    )
    per_bin = (
        f"transform({qb}, __bb -> "
        f"{_let_sql(f'filter({qp}, __p -> __p.b = __bb)', '__f', bin_body)})"
    )
    staged = staged.withColumn(out, F.expr(per_bin))
    return staged.drop(sorted_c, pairs_c, bins_c)


def theil_sen(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    out: str | None = None,
    time_scale: float = 1.0,
) -> DataFrame:
    """Per-cell Theil-Sen slope: the MEDIAN of all pairwise slopes
    ``(v_j - v_i) / (x_j - x_i)`` — the robust companion to
    :func:`trend_slope` (OLS), immune to ~29% outlier contamination; the
    estimator astronomers reach for on glitchy photometry.

    ``x`` is the time axis divided by ``time_scale`` (TIMESTAMP axes
    reduce to epoch microseconds first); pairs with equal times are
    skipped. Median convention: even pair counts average the two middle
    slopes (interpolated median — matches SQL ``median()``). Adds
    ``out`` (default ``{nest}_ts_slope``); NULL when fewer than 2
    usable points or all times equal.

    Pure HOFs, zero shuffle; O(n^2) pairs + an O(p log p) ``array_sort``
    per cell (same documented trade as :func:`structure_function`).
    """
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    if not (float(time_scale) > 0.0):
        raise ValueError(f"time_scale must be > 0, got {time_scale!r}")
    out = out or f"{nest}_ts_slope"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    if _time_kind(df, nest, time_field) == "timestamp":
        t_sql = f"unix_micros(CAST(__x.{qt} AS TIMESTAMP))"
    else:
        t_sql = f"__x.{qt}"
    pts_c, sl_c = "__th_pts", "__th_slopes"
    # center on the cell-min time BEFORE the double cast (the q47 /
    # periodogram lesson): slopes are translation-invariant, and at
    # epoch-nano magnitude (~1.7e18, ulp ~256ns) a raw cast loses up to
    # ~512ns per pair denominator — distinct times could round equal and
    # silently drop the pair from the slope median
    raw = (
        f"transform(filter({qn}, __x -> __x.{qt} IS NOT NULL "
        f"AND __x.{qv} IS NOT NULL), __x -> struct({t_sql} AS t, "
        f"CAST(__x.{qv} AS DOUBLE) AS y))"
    )
    centered = (
        f"array_sort(transform(__r, __p -> struct("
        f"CAST(__p.t - __t0 AS DOUBLE) / CAST({float(time_scale)!r} AS DOUBLE) AS x, "
        f"__p.y AS y)))"
    )
    staged = df.withColumn(
        pts_c,
        F.expr(
            _let_sql(
                raw, "__r",
                _let_sql("array_min(transform(__r, __p -> __p.t))", "__t0",
                         centered),
            )
        ),
    )
    qp = quote(pts_c)
    n = f"size({qp})"
    pair_slopes = (
        f"CASE WHEN {n} >= 2 THEN array_sort(flatten(transform("
        f"sequence(1, {n} - 1), __i -> filter(transform("
        f"sequence(__i + 1, {n}), __j -> CASE WHEN "
        f"element_at({qp}, __j).x <> element_at({qp}, __i).x THEN "
        f"(element_at({qp}, __j).y - element_at({qp}, __i).y) / "
        f"(element_at({qp}, __j).x - element_at({qp}, __i).x) END), "
        f"__s -> __s IS NOT NULL)))) "
        f"ELSE CAST(array() AS array<double>) END"
    )
    staged = staged.withColumn(sl_c, F.expr(pair_slopes))
    qs = quote(sl_c)
    p = f"size({qs})"
    median = (
        f"CASE WHEN {p} = 0 THEN CAST(NULL AS DOUBLE) "
        f"WHEN {p} % 2 = 1 THEN element_at({qs}, CAST(({p} + 1) DIV 2 AS INT)) "
        f"ELSE (element_at({qs}, CAST({p} DIV 2 AS INT)) + "
        f"element_at({qs}, CAST({p} DIV 2 + 1 AS INT))) / 2.0D END"
    )
    return staged.withColumn(out, F.expr(median)).drop(pts_c, sl_c)


def lightcurve_features(
    df: DataFrame,
    nest: str,
    time_field: str,
    value_field: str,
    time_scale: float = 1.0,
    out_prefix: str | None = None,
) -> DataFrame:
    """The standard per-object variability feature vector (the FEETS /
    Richards et al. 2011 basics) in ONE pass of per-cell HOFs — what the
    reference's users assemble from a dozen ``reduce`` lambdas before
    classification. Adds, with ``prefix = out_prefix or f"{nest}_feat"``
    and points ``(t, v)``-ordered, values non-NULL:

    * ``{p}_n`` — usable point count (bigint; 0 for empty cells)
    * ``{p}_amp`` — amplitude ``(max - min) / 2`` (NULL when n == 0)
    * ``{p}_mad`` — median absolute deviation from the median
      (interpolated even-count median, same convention as
      :func:`theil_sen`; NULL when n == 0)
    * ``{p}_beyond1`` — fraction of points beyond 1 sample-std of the
      mean (NULL when n < 2 or zero spread)
    * ``{p}_eta`` — von Neumann ratio ``mean((v[i+1]-v[i])^2) /
      sample_variance`` (NULL when n < 2 or zero spread)
    * ``{p}_skew`` — moment skewness ``m3 / m2^1.5`` (population
      moments; NULL when n < 2 or zero spread)
    * ``{p}_kurt`` — excess kurtosis ``m4 / m2^2 - 3`` (same guards)
    * ``{p}_maxslope`` — max |consecutive slope| on the
      ``time_scale``-divided axis (NULL when no pair has distinct times)

    Zero shuffle; two ``array_sort``s (time order + value order) plus
    single-pass staged reductions. TIMESTAMP axes reduce to epoch
    microseconds; centered moments keep epoch-scale magnitudes out of
    the sums (:func:`trend_slope`'s lesson).
    """
    fields = nested_field_names(df, nest)
    for f_ in (time_field, value_field):
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    if not (float(time_scale) > 0.0):
        raise ValueError(f"time_scale must be > 0, got {time_scale!r}")
    p = out_prefix or f"{nest}_feat"
    qn, qt, qv = quote(nest), quote(time_field), quote(value_field)
    if _time_kind(df, nest, time_field) == "timestamp":
        t_sql = f"unix_micros(CAST(__x.{qt} AS TIMESTAMP))"
    else:
        t_sql = f"__x.{qt}"
    s_c, v_c, m_c, sd_c, med_c = ("__lf_s", "__lf_v", "__lf_m", "__lf_sd",
                                  "__lf_med")
    # center times on the cell min BEFORE the double cast (the q47 /
    # periodogram lesson): maxslope's consecutive diffs are
    # translation-invariant, and raw epoch-nano casts can round distinct
    # times equal (dropping the pair) or lose ~512ns per denominator
    raw = (
        f"transform(filter({qn}, __x -> __x.{qt} IS NOT NULL "
        f"AND __x.{qv} IS NOT NULL), __x -> struct({t_sql} AS t, "
        f"CAST(__x.{qv} AS DOUBLE) AS v))"
    )
    centered = (
        f"array_sort(transform(__r, __p -> struct("
        f"CAST(__p.t - __t0 AS DOUBLE) / CAST({float(time_scale)!r} AS DOUBLE) AS x, "
        f"__p.v AS v)))"
    )
    staged = df.withColumn(
        s_c,
        F.expr(
            _let_sql(
                raw, "__r",
                _let_sql("array_min(transform(__r, __p -> __p.t))", "__t0",
                         centered),
            )
        ),
    ).withColumn(v_c, F.expr("array_sort(transform(__lf_s, __p -> __p.v))"))
    qs, qvv = quote(s_c), quote(v_c)
    n = f"size({qs})"

    def med_of(arr: str) -> str:
        m = f"size({arr})"
        return (
            f"CASE WHEN {m} = 0 THEN CAST(NULL AS DOUBLE) "
            f"WHEN {m} % 2 = 1 THEN element_at({arr}, CAST(({m} + 1) DIV 2 AS INT)) "
            f"ELSE (element_at({arr}, CAST({m} DIV 2 AS INT)) + "
            f"element_at({arr}, CAST({m} DIV 2 + 1 AS INT))) / 2.0D END"
        )

    staged = staged.withColumn(
        m_c,
        F.expr(f"CASE WHEN {n} > 0 THEN aggregate({qvv}, 0.0D, "
               f"(__a, __v) -> __a + __v) / {n} END"),
    ).withColumn(med_c, F.expr(med_of(qvv)))
    qm, qmed = quote(m_c), quote(med_c)
    staged = staged.withColumn(
        sd_c,
        F.expr(f"CASE WHEN {n} >= 2 THEN sqrt(aggregate({qvv}, 0.0D, "
               f"(__a, __v) -> __a + (__v - {qm}) * (__v - {qm})) "
               f"/ ({n} - 1)) END"),
    )
    qsd = quote(sd_c)
    absdev = f"array_sort(transform({qvv}, __v -> abs(__v - {qmed})))"
    m_k = {
        k: (f"aggregate({qvv}, 0.0D, (__a, __v) -> __a + "
            + " * ".join([f"(__v - {qm})"] * k) + f") / {n}")
        for k in (2, 3, 4)
    }
    diffs = (f"zip_with(slice({qs}, 2, {n} - 1), slice({qs}, 1, {n} - 1), "
             f"(__b, __a) -> struct(__b.v - __a.v AS dv, __b.x - __a.x AS dx))")
    eta_num = (f"aggregate({diffs}, 0.0D, (__a, __d) -> __a + __d.dv * __d.dv)"
               f" / ({n} - 1)")
    maxslope = (
        f"array_max(transform(filter({diffs}, __d -> __d.dx <> 0.0D), "
        f"__d -> abs(__d.dv / __d.dx)))"
    )
    ok2 = f"{n} >= 2 AND {qsd} > 0.0D"
    exprs = {
        f"{p}_n": f"CAST({n} AS BIGINT)",
        f"{p}_amp": (f"CASE WHEN {n} > 0 THEN "
                     f"(array_max({qvv}) - array_min({qvv})) / 2.0D END"),
        f"{p}_mad": med_of(absdev),
        f"{p}_beyond1": (
            f"CASE WHEN {ok2} THEN CAST(size(filter({qvv}, "
            f"__v -> abs(__v - {qm}) > {qsd})) AS DOUBLE) / {n} END"),
        f"{p}_eta": f"CASE WHEN {ok2} THEN ({eta_num}) / ({qsd} * {qsd}) END",
        f"{p}_skew": (f"CASE WHEN {ok2} THEN ({m_k[3]}) / "
                      f"pow({m_k[2]}, 1.5D) END"),
        f"{p}_kurt": (f"CASE WHEN {ok2} THEN ({m_k[4]}) / "
                      f"(({m_k[2]}) * ({m_k[2]})) - 3.0D END"),
        f"{p}_maxslope": f"CASE WHEN {n} >= 2 THEN {maxslope} END",
    }
    for name, sql in exprs.items():
        staged = staged.withColumn(name, F.expr(sql))
    return staged.drop(s_c, v_c, m_c, sd_c, med_c)


def _nest_align_explode(
    df, left_nest, right_nest, time_field, rt, rv, tolerance, out_field,
    lkind, rkind, t_type, v_type, lfields,
) -> DataFrame:
    """Mega-cell path for :func:`nest_align`: posexplode both series and
    route the per-cell nearest match through
    :func:`~nested_pandas_spark.operators.asof.asof_join`
    (direction='nearest', keyed on the row id), then repack in element
    order. Linear per cell (snapshot + element shuffles) instead of the
    HOF engine's O(n_left x n_right) — wins on ~10^4+ element cells.

    Bit-identical to the HOF engine: right elements sharing one time
    collapse to the FIRST in array order (the HOF argmin's tie rule)
    before the as-of join, whose 'nearest' tie rule (backward wins) is
    exactly the HOF's earlier-time-wins."""
    from .asof import asof_join  # function-level: asof imports this module

    ql = quote(left_nest)
    qlt, qrt, qrv = quote(time_field), quote(rt), quote(rv)

    def t_sql(kind: str, var: str, field: str) -> str:
        if kind == "timestamp":
            return f"unix_micros(CAST({var}.{field} AS TIMESTAMP))"
        return f"{var}.{field}"

    stamped = _stamped(df)
    lflat = stamped.select(
        "__rid", F.posexplode(F.col(left_nest)).alias("__pos", "__x")
    ).withColumn("__t", F.expr(f"CAST({t_sql(lkind, '__x', qlt)} AS {t_type})"))
    rflat = (
        stamped.select(
            "__rid", F.posexplode(F.col(right_nest)).alias("__rpos", "__y")
        )
        .where(F.expr(f"__y.{qrt} IS NOT NULL"))
        .select(
            "__rid",
            F.expr(f"CAST({t_sql(rkind, '__y', qrt)} AS {t_type})").alias("__t"),
            F.expr(f"__y.{qrv}").alias("__v"),
            F.col("__rpos"),
        )
        # HOF tie rule among equal right times: first in array order wins
        .groupBy("__rid", "__t")
        .agg(F.min(F.struct("__rpos", "__v")).alias("__m"))
        .select("__rid", "__t", F.col("__m").getField("__v").alias("__v"))
    )
    matched = asof_join(
        lflat.where(F.col("__t").isNotNull()),
        rflat,
        on="__rid",
        ts="__t",
        right_cols=["__v"],
        suffix="_r",
        tolerance=tolerance,
        direction="nearest",
    ).select("__rid", "__pos", "__x", "__t", "__v_r", "__t_r")
    unmatched = lflat.where(F.col("__t").isNull()).select(
        "__rid",
        "__pos",
        "__x",
        "__t",
        F.expr(f"CAST(NULL AS {v_type})").alias("__v_r"),
        F.expr(f"CAST(NULL AS {t_type})").alias("__t_r"),
    )
    allrows = matched.unionByName(unmatched)
    newe = F.struct(
        *[F.col("__x").getField(f).alias(f) for f in lfields],
        F.col("__v_r").alias(out_field),
        F.expr("__t_r - __t").alias(f"{out_field}_dt"),
    )
    packed = (
        allrows.select(
            "__rid",
            F.struct(F.col("__pos").alias("p"), newe.alias("e")).alias("__pe"),
        )
        .groupBy("__rid")
        .agg(F.array_sort(F.collect_list("__pe")).alias("__arr"))
        .select(
            "__rid", F.expr("transform(__arr, __s -> __s.e)").alias("__packed")
        )
    )
    keep_null = {f: f"__x.{quote(f)}" for f in lfields}
    keep_null[out_field] = f"CAST(NULL AS {v_type})"
    keep_null[f"{out_field}_dt"] = f"CAST(NULL AS {t_type})"
    fallback = (
        f"CASE WHEN {ql} IS NULL THEN NULL ELSE "
        f"transform({ql}, __x -> {struct_sql(keep_null)}) END"
    )
    return (
        stamped.join(packed, "__rid", "left")
        .withColumn(left_nest, F.coalesce(F.col("__packed"), F.expr(fallback)))
        .drop("__rid", "__packed")
    )


def nest_align(
    df: DataFrame,
    left_nest: str,
    right_nest: str,
    time_field: str,
    value_field: str,
    right_time_field: str | None = None,
    right_value_field: str | None = None,
    tolerance=None,
    out_field: str | None = None,
    engine: str = "hof",
) -> DataFrame:
    """Per-cell NEAREST-TIME alignment of two nested series in the same
    row — the in-row as-of join astronomers run to build color curves
    (each g-band point matched to the nearest r-band point) and ops
    teams run to pair two metric streams of one entity.

    For every element of ``left_nest``, find the ``right_nest`` element
    whose time is nearest (ties: the EARLIER right time wins —
    deterministic); append its value as ``out_field`` (default
    ``{right_value_field}_near``) and the signed time delta
    ``{out_field}_dt`` (right minus left) to the left element struct.
    ``tolerance`` (same units as the time axis) nulls matches farther
    than the bound. Left elements with NULL time, cells with no usable
    right elements, and right values that are NULL all yield NULL
    matches.

    Exactness: integral axes compare and subtract in int64 (epoch-nano
    safe); TIMESTAMP axes reduce to epoch microseconds (``tolerance``
    then in microseconds, ``_dt`` in microseconds). Mixed
    integral/float axes are rejected.

    Scale shape: pure HOFs, zero shuffle, O(n_left * n_right) per cell
    — the documented per-cell quadratic trade (cells are small by
    construction). ``engine='explode'``: the mega-cell escape hatch —
    posexplode both series and route the match through
    :func:`~nested_pandas_spark.operators.asof.asof_join`
    (direction='nearest') keyed on a snapshotted row id, then repack in
    element order; linear per cell at the cost of element shuffles, and
    bit-identical to the HOF engine (see :func:`_nest_align_explode`).
    """
    _check_engine(engine)
    rt = right_time_field or time_field
    rv = right_value_field or value_field
    for nest, f_ in ((left_nest, time_field), (left_nest, value_field),
                     (right_nest, rt), (right_nest, rv)):
        fields = nested_field_names(df, nest)
        if f_ not in fields:
            raise KeyError(f"Nested column '{nest}' has no field '{f_}'")
    out_field = out_field or f"{rv}_near"
    lfields = nested_field_names(df, left_nest)
    if out_field in lfields:
        raise ValueError(
            f"Nested column '{left_nest}' already has field '{out_field}'")
    lkind = _time_kind(df, left_nest, time_field)
    rkind = _time_kind(df, right_nest, rt)
    if {lkind, rkind} == {"int", "float"}:
        raise ValueError(
            "left and right time axes must share a kind (both integral or "
            f"both float), got {lkind!r} vs {rkind!r}")
    integral = "float" not in (lkind, rkind)
    if tolerance is not None:
        if integral:
            tolerance = _int_param("tolerance", tolerance, positive=True)
        else:
            tolerance = float(tolerance)
            if not (tolerance > 0):
                raise ValueError("tolerance must be > 0")
    ql, qr = quote(left_nest), quote(right_nest)
    qlt, qrt, qrv = quote(time_field), quote(rt), quote(rv)
    # SQL type names for the CAST(NULL AS ...) accumulator seeds
    t_type = "BIGINT" if integral else "DOUBLE"
    v_type = None
    for f_ in df.schema.fields:
        if f_.name == right_nest:
            v_type = f_.dataType.elementType[rv].dataType.simpleString()
    assert v_type is not None

    if engine == "explode":
        return _nest_align_explode(
            df, left_nest, right_nest, time_field, rt, rv, tolerance,
            out_field, lkind, rkind, t_type, v_type, lfields,
        )

    def t_sql(kind: str, var: str, field: str) -> str:
        if kind == "timestamp":
            return f"unix_micros(CAST({var}.{field} AS TIMESTAMP))"
        return f"{var}.{field}"

    # usable right candidates staged once per row: struct(t, v)
    cand_c = "__na_r"
    staged = df.withColumn(
        cand_c,
        F.expr(
            f"transform(filter({qr}, __y -> __y.{qrt} IS NOT NULL), "
            f"__y -> struct(CAST({t_sql(rkind, '__y', qrt)} AS {t_type}) AS t, "
            f"__y.{qrv} AS v))"
        ),
    )
    qc = quote(cand_c)
    absd = "abs(__y.t - __lt)"
    pick = (
        f"aggregate({qc}, named_struct("
        f"'t', CAST(NULL AS {t_type}), 'v', CAST(NULL AS {v_type}), "
        f"'d', CAST(NULL AS {t_type})), "
        f"(__a, __y) -> CASE WHEN __a.d IS NULL OR {absd} < __a.d OR "
        f"({absd} = __a.d AND __y.t < __a.t) THEN "
        f"named_struct('t', __y.t, 'v', __y.v, 'd', {absd}) ELSE __a END)"
    )
    tol_guard = "" if tolerance is None else f" AND __b.d <= {tolerance!r}"
    lt = t_sql(lkind, "__x", qlt)
    # bind left time, then the single-pass argmin, then build the element
    keep_inner = {f: f"__x.{quote(f)}" for f in lfields}
    keep_inner[out_field] = (
        f"CASE WHEN __b.d IS NOT NULL{tol_guard} THEN __b.v END")
    keep_inner[f"{out_field}_dt"] = (
        f"CASE WHEN __b.d IS NOT NULL{tol_guard} THEN __b.t - __lt END")
    with_match = _let_sql(pick, "__b", struct_sql(keep_inner))
    keep_null = {f: f"__x.{quote(f)}" for f in lfields}
    keep_null[out_field] = f"CAST(NULL AS {v_type})"
    keep_null[f"{out_field}_dt"] = f"CAST(NULL AS {t_type})"
    body = (
        f"CASE WHEN __x.{qlt} IS NOT NULL AND size({qc}) > 0 THEN "
        f"{_let_sql(f'CAST({lt} AS {t_type})', '__lt', with_match)} "
        f"ELSE {struct_sql(keep_null)} END"
    )
    staged = staged.withColumn(
        left_nest, F.expr(f"transform({ql}, __x -> {body})")
    )
    return staged.drop(cand_c)
