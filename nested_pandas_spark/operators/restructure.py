"""Unpack / restructure operators: explode, split, to_flat, to_lists,
to_flatten_inner.

All of these are per-row expression rewrites (no shuffle): ``inline`` /
``posexplode`` generate rows inside the same partition; ``transform`` /
``flatten`` rebuild arrays in place. At 100 TB explode multiplies row count
but not partition count — pair with AQE / a post-explode repartition only if
a downstream wide operation needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.nested import (
    is_nested_type,
    nested_field_names,
    quote,
    struct_sql,
)
from ..nestedframe.expr import _sql_literal

__all__ = ["to_flat", "to_lists", "frame_explode", "split", "to_flatten_inner"]


def to_flat(df: DataFrame, nest: str, columns: list[str] | None = None,
            keys: list[str] | None = None) -> DataFrame:
    """Nested column -> long/flat child table, base key columns repeated.

    Reference: ``nest.to_flat`` (``series/accessor.py:93-157``). Rows with a
    NULL or empty cell produce no output rows (same as the flat view of an
    empty list).
    """
    fields = nested_field_names(df, nest)
    if columns is not None:
        missing = [c for c in columns if c not in fields]
        if missing:
            raise KeyError(f"Nested column '{nest}' has no fields {missing}")
        fields = columns
    key_cols = keys if keys is not None else [
        f.name for f in df.schema.fields if not is_nested_type(f.dataType)
    ]
    elem = F.explode(F.col(quote(nest))).alias("__elem")
    out = df.select(*[F.col(quote(k)) for k in key_cols], elem)
    return out.select(
        *[F.col(quote(k)) for k in key_cols],
        *[F.col("__elem").getField(f).alias(f) for f in fields],
    )


def to_lists(df: DataFrame, nest: str, columns: list[str] | None = None) -> DataFrame:
    """Nested column -> one top-level ``array<T>`` column per field.

    Reference: ``nest.to_lists`` (``accessor.py:44-91``) — the struct-of-lists
    storage view, produced here with per-field ``transform`` (zero shuffle).
    """
    fields = nested_field_names(df, nest)
    if columns is not None:
        fields = [c for c in columns if c in fields] or columns
    others = [c for c in df.columns if c != nest]
    projs = [
        F.expr(f"transform({quote(nest)}, __x -> __x.{quote(f)})").alias(f) for f in fields
    ]
    return df.select(*[F.col(quote(c)) for c in others], *projs)


def frame_explode(df: DataFrame, columns: str | list[str],
                  validate_lengths: bool = True,
                  ignore_index: bool = False) -> DataFrame:
    """Frame-level explode of one or more nested/list columns in lockstep.

    Reference: ``NestedFrame.explode`` (``core.py:1221-1349``). Multiple
    columns must have matching per-row lengths — the reference raises on
    mismatch (``core.py:1320-1334``); Spark's posexplode would silently
    NULL-pad, so we validate with ``assert_true`` when asked (stays inside
    codegen; at scale disable for a known-aligned layout).

    Single nested column uses ``inline`` (struct fields become columns);
    list (non-struct) columns keep their name.

    ``ignore_index=True`` mirrors the reference's RangeIndex reset
    (``core.py:1221``): the result gains an ``index`` column of unique,
    ascending int64 ids (``monotonically_increasing_id``). They are NOT
    contiguous — contiguity requires a global total order, which is a full
    -data shuffle at scale; the reference's own use of ``ignore_index`` only
    needs row identity, which this provides shuffle-free. The default
    (``False``) keeps the key columns as row identity, matching the
    reference's repeated parent index.
    """
    cols = [columns] if isinstance(columns, str) else list(columns)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise KeyError(f"No such column: '{c}'")
        if not isinstance(schema[c], T.ArrayType):
            raise ValueError(f"Column '{c}' is not list-valued; cannot explode")

    if validate_lengths and len(cols) > 1:
        first = cols[0]
        for c in cols[1:]:
            # assert_true returns NULL on success; keeping it inside a filter
            # predicate keeps it in the data path (a projected-then-dropped
            # column would be pruned by Catalyst and never evaluated).
            check = F.assert_true(
                F.coalesce(F.size(quote(c)), F.lit(-1))
                == F.coalesce(F.size(quote(first)), F.lit(-1)),
                F.lit(f"explode: per-row lengths of '{c}' and '{first}' differ"),
            )
            df = df.where(check.isNull())

    others = [c for c in df.columns if c not in set(cols)]
    first = cols[0]
    pos = F.posexplode(F.col(quote(first))).alias("__pos", "__e0")
    out = df.select(*[F.col(quote(c)) for c in others],
                    *[F.col(quote(c)) for c in cols[1:]], pos)
    # align the remaining columns by position (try_element_at: 1-based)
    aligned: list[Column] = []
    exploded_names: list[tuple[str, Column]] = [(first, F.col("__e0"))]
    for i, c in enumerate(cols[1:], start=1):
        exploded_names.append(
            (c, F.expr(f"try_element_at({quote(c)}, __pos + 1)"))
        )
    final_cols: list[Column] = [F.col(quote(c)) for c in others]
    for name, col in exploded_names:
        dt = schema[name]
        if isinstance(dt.elementType, T.StructType):
            for sf in dt.elementType.fields:
                final_cols.append(col.getField(sf.name).alias(sf.name))
        else:
            final_cols.append(col.alias(name))
    result = out.select(*final_cols)
    if ignore_index:
        result = result.withColumn("index", F.monotonically_increasing_id())
    return result


def split(
    df: DataFrame,
    nest: str,
    by: str,
    values: list[str] | None = None,
    drop_by_col: bool = False,
    drop_nested: bool = True,
    empty_as_null: bool = True,
    max_values: int | None = None,
) -> DataFrame:
    """Split one nested column into several by a categorical sub-column.

    Reference: ``NestedFrame.split`` (``core.py:860-947``): one new nested
    column ``{nest}_{value}`` per distinct value of ``nest.by``. Cells with
    no matching elements become NULL, matching the reference (verified in
    test_reference_parity.py); pass ``empty_as_null=False`` for empty arrays.

    ``values=None`` discovers distinct values with one extra (cheap, pushed
    down to the single sub-column) pass — at 100 TB prefer passing ``values``
    explicitly to avoid the scan.
    """
    fields = nested_field_names(df, nest)
    if by not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{by}'")
    if values is None:
        from .aggregates import discover_values

        values = discover_values(
            df,
            F.explode(F.expr(f"transform({quote(nest)}, __x -> __x.{quote(by)})")),
            f"split(by={by!r})",
            max_values,
        )
    out = df
    for v in values:
        lit = _sql_literal(str(v))
        filtered = f"filter({quote(nest)}, __x -> __x.{quote(by)} = {lit})"
        if drop_by_col:
            keep = [f for f in fields if f != by]
            body = struct_sql({f: f"__y.{quote(f)}" for f in keep})
            filtered = f"transform({filtered}, __y -> {body})"
        expr = F.expr(filtered)
        if empty_as_null:
            expr = F.when(F.size(expr) > 0, expr)
        out = out.withColumn(f"{nest}_{v}", expr)
    if drop_nested:
        out = out.drop(nest)
    return out


def to_flatten_inner(df: DataFrame, nest: str, inner: str) -> DataFrame:
    """Un-nest one level of a doubly-nested column.

    ``outer: array<struct<..., inner: array<struct<...>>>>`` becomes
    ``array<struct<...outer fields..., ...inner fields...>>`` with outer
    sibling values repeated per inner element.

    Reference: ``nest.to_flatten_inner`` (``series/accessor.py:859-986``).
    Implemented with nested higher-order lambdas + ``flatten`` — per-row,
    no shuffle, fully codegen'd.
    """
    fields = nested_field_names(df, nest)
    if inner not in fields:
        raise KeyError(f"Nested column '{nest}' has no field '{inner}'")
    # figure out inner struct fields from the schema
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[nest]
    inner_dt = dict((f.name, f.dataType) for f in dt.elementType.fields)[inner]
    if not (isinstance(inner_dt, T.ArrayType) and isinstance(inner_dt.elementType, T.StructType)):
        raise ValueError(f"Field '{inner}' of '{nest}' is not itself nested")
    inner_fields = [f.name for f in inner_dt.elementType.fields]
    outer_keep = [f for f in fields if f != inner]
    body_fields: dict[str, str] = {f: f"__o.{quote(f)}" for f in outer_keep}
    for f in inner_fields:
        # inner fields shadow outer ones on collision, like a join suffix-free merge
        body_fields[f] = f"__i.{quote(f)}"
    body = struct_sql(body_fields)
    # outer elements with a NULL inner cell are skipped (a NULL element from
    # the inner transform would null the whole flatten result)
    sql = (
        f"flatten(transform(filter({quote(nest)}, __o -> __o.{quote(inner)} IS NOT NULL), "
        f"__o -> transform(__o.{quote(inner)}, __i -> {body})))"
    )
    return df.withColumn(nest, F.expr(sql))
