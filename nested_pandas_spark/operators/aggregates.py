"""Aggregations over base + nested layers.

Reference: ``NestedFrame.min/max`` (``core.py:949-1097``), ``describe``
(``core.py:1099-1219``), ``count_nested`` (``utils/utils.py:8-102``).

Design notes for scale:

* per-cell reductions (count_nested, per-row mean) are higher-order
  ``size`` / ``aggregate`` calls — per-row, zero shuffle, codegen'd. This is
  the Spark analogue of the reference's njit offset-kernels.
* global min/max/describe are single-pass partial aggregations (map-side
  combine), one tiny shuffle to the final reducer.
* ``describe`` uses EXACT ``percentile`` (not ``percentile_approx``) for
  oracle parity, as the reference uses pandas' exact quantiles. At 100 TB
  swap in ``percentile_approx`` via ``exact=False``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.nested import is_nested_type, nested_field_names, quote
from ..nestedframe.expr import _sql_literal

__all__ = ["count_nested", "nest_lengths", "minmax", "describe", "nest_agg", "profile", "group_describe", "value_counts", "histogram", "discover_values"]

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
            T.DecimalType)

#: cap on auto-discovered pivot categories (count_nested(by=...) /
#: split(values=None)) — each discovered value becomes a COLUMN, so a
#: mistakenly-pivoted high-cardinality field would otherwise build a
#: million-column frame. Generous for real categoricals (bands, labels,
#: flags); override per call with max_values=.
DEFAULT_MAX_PIVOT_VALUES = 256


def discover_values(df: DataFrame, col, what: str,
                    max_values: int | None,
                    on_null: str = "ignore") -> list:
    """Distinct non-null values of ``col``, sorted — the category set for
    a pivot-to-columns operator. Fetches at most ``max_values + 1``
    distinct values (LIMIT is pushed below the collect, so a runaway
    column never floods the driver) and raises with guidance when the cap
    is exceeded. ``on_null="raise"`` reports a NULL category value instead
    of silently skipping it (reference count_nested dropna semantics,
    GH#494)."""
    limit = DEFAULT_MAX_PIVOT_VALUES if max_values is None else int(max_values)
    if limit < 1:
        raise ValueError("max_values must be >= 1")
    rows = df.select(col).distinct().limit(limit + 1).collect()
    if on_null == "raise" and any(r[0] is None for r in rows):
        raise ValueError(
            f"{what}: the by-column contains null values — pass dropna=True "
            "to ignore them (reference nested-pandas GH#494 semantics)"
        )
    vals = sorted(r[0] for r in rows if r[0] is not None)
    if len(vals) > limit:
        raise ValueError(
            f"{what}: more than {limit} distinct categories discovered — "
            "each one becomes a column, so this is almost always a "
            "mistakenly-pivoted high-cardinality field. Pass values=[...] "
            "to pivot a chosen subset, or raise max_values= if the "
            "cardinality is intentional."
        )
    return vals


def count_nested(
    df: DataFrame,
    nest: str,
    by: str | None = None,
    values: list[str] | None = None,
    join: bool = True,
    max_values: int | None = None,
    dropna: bool = False,
) -> DataFrame:
    """Per-row element count of a nested column, optionally split by a
    categorical sub-column (one zero-filled count column per category).

    ``n_{nest}`` or ``n_{nest}_{value}`` columns, appended when ``join=True``
    (reference ``utils/utils.py:8-102``). All per-row expressions — no shuffle
    except the optional distinct-value discovery when ``values`` is None.
    """
    fields = nested_field_names(df, nest)
    out = df if join else df.select(quote(nest))
    if by is None:
        return out.withColumn(f"n_{nest}", F.coalesce(F.size(quote(nest)), F.lit(0)))
    if by not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{by}'")
    if values is None:
        values = discover_values(
            df,
            F.explode(F.expr(f"transform({quote(nest)}, __x -> __x.{quote(by)})")),
            f"count_nested(by={by!r})",
            max_values,
            on_null="ignore" if dropna else "raise",
        )
    for v in values:
        lit = _sql_literal(str(v))
        out = out.withColumn(
            f"n_{nest}_{v}",
            F.coalesce(
                F.size(F.expr(f"filter({quote(nest)}, __x -> __x.{quote(by)} = {lit})")),
                F.lit(0),
            ),
        )
    return out


def nest_lengths(df: DataFrame, nest: str, alias: str | None = None) -> Column:
    """Per-row element count (``nest.len`` / ``list_lengths``,
    reference ``accessor.py:168-175``)."""
    return F.size(F.col(quote(nest))).alias(alias or f"n_{nest}")


def _numeric_targets(df: DataFrame, include_nested: bool = True) -> list[tuple[str, Column, str]]:
    """(label, column-or-flattened-expr, kind) for every numeric base column and
    nested numeric sub-column. kind is 'base' | 'nested'."""
    out: list[tuple[str, Column, str]] = []
    for f in df.schema.fields:
        if is_nested_type(f.dataType):
            if not include_nested:
                continue
            for sf in f.dataType.elementType.fields:
                if isinstance(sf.dataType, _NUMERIC):
                    label = f"{f.name}.{sf.name}"
                    arr = F.expr(f"transform({quote(f.name)}, __x -> __x.{quote(sf.name)})")
                    out.append((label, arr, "nested"))
        elif isinstance(f.dataType, _NUMERIC):
            out.append((f.name, F.col(quote(f.name)), "base"))
    return out


def minmax(df: DataFrame, kind: str = "min", columns: list[str] | None = None,
           exclude_nest: bool = False) -> DataFrame:
    """Column-wise min/max across base and nested sub-columns, one output row
    with ``nested.col``-prefixed labels (reference ``core.py:949-1097``;
    ``exclude_nest=True`` restricts to base columns as there).

    Nested columns reduce per-row with ``array_min``/``array_max`` first, then
    globally — a single partial-agg pass, no explode.
    """
    assert kind in ("min", "max")
    aggs: list[Column] = []
    for label, col, knd in _numeric_targets(df):
        if columns is not None and label not in columns:
            continue
        if exclude_nest and knd == "nested":
            continue
        if knd == "nested":
            per_row = F.array_min(col) if kind == "min" else F.array_max(col)
        else:
            per_row = col
        agg = F.min(per_row) if kind == "min" else F.max(per_row)
        aggs.append(agg.alias(label))
    if not aggs:
        raise ValueError("No numeric columns to aggregate")
    return df.agg(*aggs)


def _pct_labels(qs: list[float]) -> list[str]:
    """Column labels for percentile outputs; raises on integer-percent
    collisions (e.g. 0.124 and 0.125 both label p12) instead of emitting
    ambiguous duplicate columns."""
    labels = [f"p{round(q * 100):d}" for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"percentiles {qs} collide at integer-percent labels {labels}; "
            "use percents that differ by >= 0.01"
        )
    return labels


def describe(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    percentiles: list[float] | None = None,
    exclude_nest: bool = False,
) -> DataFrame:
    """count/mean/std/min/percentiles/max over base + nested numeric columns.

    Output: one row per target column: (column, count, mean, std, min,
    p25, p50, p75, max) — or ``p{int(q*100)}`` columns for custom
    ``percentiles`` (pandas ``describe(percentiles=)`` parity). Exact
    percentiles by default for pandas/duckdb parity (``percentile``); pass
    ``exact=False`` for ``percentile_approx`` at scale.
    """
    qs = percentiles if percentiles is not None else [0.25, 0.5, 0.75]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"percentile {q} outside [0, 1]")
    labels = _pct_labels(qs)
    frames: list[DataFrame] = []
    for label, col, knd in _numeric_targets(df):
        if columns is not None and label not in columns:
            continue
        if exclude_nest and knd == "nested":
            continue
        if knd == "nested":
            vals = df.select(F.explode(col).alias("__v"))
        else:
            vals = df.select(col.alias("__v"))
        pct = "percentile" if exact else "percentile_approx"
        frames.append(
            vals.agg(
                F.lit(label).alias("column"),
                F.count("__v").alias("count"),
                F.avg("__v").alias("mean"),
                F.stddev("__v").alias("std"),
                F.min("__v").alias("min"),
                *[
                    F.expr(f"{pct}(__v, {q!r})").alias(lbl)
                    for q, lbl in zip(qs, labels)
                ],
                F.max("__v").alias("max"),
            )
        )
    if not frames:
        raise ValueError("No numeric columns to describe")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def nest_agg(df: DataFrame, nest: str, field: str, how: str, alias: str | None = None) -> Column:
    """Per-row reduction of one nested sub-column via higher-order functions.

    ``how`` in {sum, mean, min, max, count, n_distinct, first, last, any,
    all}. This is the fast path the reference reaches with numba kernels
    (``njit_funcs.py``) — here it's a codegen'd
    ``aggregate``/``array_min``/``array_max`` over the cell.
    """
    arr = f"transform({quote(nest)}, __x -> __x.{quote(field)})"
    name = alias or f"{how}_{nest}_{field}"
    if how == "count":
        return F.size(F.expr(arr)).alias(name)
    if how == "n_distinct":
        # pandas nunique semantics: NULL elements don't count
        return F.size(
            F.expr(f"array_distinct(filter({arr}, __v -> __v IS NOT NULL))")
        ).alias(name)
    if how == "first":
        return F.expr(f"try_element_at({arr}, 1)").alias(name)
    if how == "last":
        return F.expr(f"try_element_at({arr}, -1)").alias(name)
    if how == "any":
        return F.expr(f"exists({arr}, __v -> __v)").alias(name)
    if how == "all":
        return F.expr(f"forall({arr}, __v -> __v)").alias(name)
    if how == "min":
        return F.array_min(F.expr(arr)).alias(name)
    if how == "max":
        return F.array_max(F.expr(arr)).alias(name)
    if how == "sum":
        return F.expr(
            f"aggregate({arr}, CAST(0.0 AS DOUBLE), (__a, __v) -> __a + coalesce(__v, 0.0))"
        ).alias(name)
    if how == "mean":
        notnull = f"filter({arr}, __v -> __v IS NOT NULL)"
        return F.expr(
            f"CASE WHEN size({notnull}) > 0 THEN "
            f"aggregate({notnull}, CAST(0.0 AS DOUBLE), (__a, __v) -> __a + __v)"
            f" / size({notnull}) END"
        ).alias(name)
    raise ValueError(f"Unsupported reduction: {how}")


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Column-level data-quality profile: one output row per column with
    ``(column, dtype, n_rows, n_nulls, n_distinct)`` — the corpus-health
    check run before/after every pipeline stage (did the join explode the
    row count? did a cast null out a column? did dedup collapse ids?).

    Complex-typed columns (arrays/structs/maps — e.g. nested columns) are
    profiled for nulls but get ``n_distinct = NULL`` (element-level stats
    belong to :func:`describe` / :func:`count_nested`).

    ``exact=True`` uses ``count_distinct`` (oracle-reproducible);
    ``exact=False`` switches to ``approx_count_distinct`` (HLL sketch,
    one pass, bounded memory) — the right call at 100 TB where an exact
    distinct of a high-cardinality column is its own shuffle per column.

    Scale shape: ONE aggregation pass computes every counter (partial
    aggs combine map-side); the single result row pivots driver-side into
    the per-column frame — a bounded, ncols-sized collect.
    """
    cols = df.columns if columns is None else columns
    dtypes = dict(df.dtypes)
    simple = {
        c: not any(dtypes[c].startswith(p) for p in ("array", "struct", "map"))
        for c in cols
    }
    cd = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(quote(c)).alias(f"__nn_{c}"))
        if simple[c]:
            aggs.append(cd(F.col(quote(c))).alias(f"__nd_{c}"))
    row = df.agg(*aggs).first()
    out = [
        (c, dtypes[c], row["__n"], row["__n"] - row[f"__nn_{c}"],
         row[f"__nd_{c}"] if simple[c] else None)
        for c in cols
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, n_distinct long",
    )


def group_describe(
    df: DataFrame,
    by: str | list[str],
    columns: list[str] | None = None,
    exact: bool = True,
    percentiles: list[float] | None = None,
    exclude_nest: bool = False,
) -> DataFrame:
    """Grouped :func:`describe`: per-(group, column) count/mean/std/min/
    percentiles/max over base + nested numeric columns — the per-source /
    per-language corpus-analysis twin of the global describe.

    Scale shape: ONE scan unpivots every target column into
    ``(group, column, value)`` rows (nested targets flatten in the same
    projection), then ONE hash-keyed aggregation on (group, column)
    computes every statistic — never a scan or a job per column. Exact
    ``percentile`` by default (oracle parity); ``exact=False`` switches
    to ``percentile_approx``, which at 100 TB is the difference between
    a sketch merge and a per-group sort.
    """
    keys = [by] if isinstance(by, str) else list(by)
    qs = percentiles if percentiles is not None else [0.25, 0.5, 0.75]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"percentile {q} outside [0, 1]")
    labels = _pct_labels(qs)
    arrays: list[Column] = []
    for label, col, knd in _numeric_targets(df):
        if columns is not None and label not in columns:
            continue
        if exclude_nest and knd == "nested":
            continue
        if label in keys:
            continue
        if knd == "nested":
            nest, fld = label.split(".", 1)
            arrays.append(F.expr(
                f"transform({quote(nest)}, __x -> named_struct("
                f"'c', '{label}', 'v', CAST(__x.{quote(fld)} AS DOUBLE)))"
            ))
        else:
            arrays.append(F.array(F.struct(
                F.lit(label).alias("c"), col.cast("double").alias("v"))))
    if not arrays:
        raise ValueError("No numeric columns to describe")
    vals = df.select(
        *[F.col(quote(k)) for k in keys],
        F.explode(F.concat(*[F.coalesce(a, F.array()) for a in arrays])
                  ).alias("__cv"),
    ).select(*keys, F.col("__cv.c").alias("column"), F.col("__cv.v").alias("__v"))
    pct = "percentile" if exact else "percentile_approx"
    return vals.groupBy(*keys, "column").agg(
        F.count("__v").alias("count"),
        F.avg("__v").alias("mean"),
        F.stddev("__v").alias("std"),
        F.min("__v").alias("min"),
        *[F.expr(f"{pct}(__v, {q!r})").alias(lbl)
          for q, lbl in zip(qs, labels)],
        F.max("__v").alias("max"),
    )


def value_counts(
    df: DataFrame,
    column: str,
    normalize: bool = False,
    dropna: bool = True,
    sort: bool = True,
) -> DataFrame:
    """Frequency table of a base column or a dotted nested sub-column —
    ``pd.Series.value_counts`` parity for both layers.

    ``"nested.band"`` counts ELEMENTS across all cells (the flat view's
    value_counts, reference ``nest.to_flat()['band'].value_counts()``
    idiom). Output: (value, count [, fraction]); ``sort=True`` orders by
    count desc then value asc (pandas tie order is insertion-dependent —
    value asc makes it deterministic for hashing).

    Scale: one partial-agg shuffle on the value (map-side combine first);
    the nested path explodes ONLY the single sub-column being counted —
    sibling fields and payloads are pruned at the scan. ``normalize``
    reuses the already-aggregated counts (a one-row total broadcast back,
    not a second scan and not a global window).

    Examples
    --------
    >>> from nested_pandas_spark import value_counts
    >>> df = spark.createDataFrame([("a",), ("b",), ("a",)], "x string")
    >>> [(r["value"], r["count"]) for r in value_counts(df, "x").collect()]
    [('a', 2), ('b', 1)]
    """
    if "." in column and column.split(".", 1)[0] in {
        f.name for f in df.schema.fields if is_nested_type(f.dataType)
    }:
        nest, field = column.split(".", 1)
        if field not in nested_field_names(df, nest):
            raise KeyError(f"Nested column '{nest}' has no field '{field}'")
        src = df.select(
            F.explode(
                F.expr(f"transform({quote(nest)}, __x -> __x.{quote(field)})")
            ).alias("value")
        )
    else:
        if column not in df.columns:
            raise KeyError(f"No such column: '{column}'")
        src = df.select(F.col(quote(column)).alias("value"))
    if dropna:
        src = src.where(F.col("value").isNotNull())
    out = src.groupBy("value").agg(F.count("*").alias("count"))
    if normalize:
        # one-row total broadcast-joined back — NOT a global window, which
        # would funnel every distinct value through a single task
        total = out.agg(F.sum("count").alias("__total"))
        out = (
            out.crossJoin(F.broadcast(total))
            .withColumn("fraction", F.col("count") / F.col("__total"))
            .drop("__total")
        )
    if sort:
        out = out.orderBy(F.col("count").desc(), F.col("value").asc())
    return out


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram of a numeric base column or dotted nested
    sub-column: (bin, lo, hi, count), empty bins zero-filled.

    With explicit ``lo``/``hi`` the whole thing is ONE scan + one tiny
    partial-agg shuffle (pass them at 100 TB). Without bounds, a first
    min/max aggregation runs (a second scan — documented driver collect of
    a single row). Values at ``hi`` fall into the last bin (pandas/numpy
    convention); out-of-range values are dropped.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if "." in column and column.split(".", 1)[0] in {
        f.name for f in df.schema.fields if is_nested_type(f.dataType)
    }:
        nest, field = column.split(".", 1)
        src = df.select(
            F.explode(
                F.expr(f"transform({quote(nest)}, __x -> __x.{quote(field)})")
            ).alias("v")
        )
    else:
        src = df.select(F.col(quote(column)).alias("v"))
    src = src.where(F.col("v").isNotNull()).select(F.col("v").cast("double").alias("v"))
    if lo is None or hi is None:
        row = src.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
        # empty/all-NULL input leaves whichever bound came from the agg as
        # None — fall back per bound, so ONE explicit bound plus an empty
        # column still yields a well-formed (zero-count) histogram
        if lo is None:
            lo = hi - 1.0 if hi is not None else 0.0
        if hi is None:
            hi = lo + 1.0
    if not hi > lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    binned = (
        src.where((F.col("v") >= lo) & (F.col("v") <= hi))
        .select(
            F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
                F.lit(bins - 1).cast("long"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("count"))
    )
    spark = df.sparkSession
    edges = spark.range(bins).select(
        F.col("id").alias("bin"),
        (F.lit(lo) + F.col("id") * F.lit(width)).alias("lo"),
        (F.lit(lo) + (F.col("id") + 1) * F.lit(width)).alias("hi"),
    )
    return (
        edges.join(binned, on="bin", how="left")
        .withColumn("count", F.coalesce(F.col("count"), F.lit(0)))
        .orderBy("bin")
    )
