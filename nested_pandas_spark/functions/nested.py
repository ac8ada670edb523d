"""Low-level builders for nested (``array<struct<...>>``) columns.

All helpers generate declarative Spark SQL / Column expressions (higher-order
functions ``filter`` / ``transform`` / ``aggregate``), so every nested
operation stays inside Catalyst + whole-stage codegen with no Python in the
hot path and no shuffle: a nested-element filter or sub-column rewrite is a
per-row map over the array buffer, exactly like the reference's offset-only
repack (reference: ``src/nested_pandas/nestedframe/core.py:1638-1648``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "is_nested_type",
    "nested_field_names",
    "nested_columns",
    "base_columns",
    "quote",
    "struct_sql",
    "rebuild_struct_sql",
    "nest_filter",
    "nest_transform_add",
    "nest_select_fields",
    "nest_drop_fields",
    "empty_to_null",
    "field_array",
]


def quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def is_nested_type(dtype: T.DataType) -> bool:
    """A 'nested column' is exactly an array of structs."""
    return isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType)


def nested_field_names(df: DataFrame, column: str) -> list[str]:
    """Struct field names of a nested column (order-preserving)."""
    for f in df.schema.fields:
        if f.name == column:
            if not is_nested_type(f.dataType):
                raise ValueError(f"Column '{column}' is not a nested (array<struct>) column")
            return [sf.name for sf in f.dataType.elementType.fields]
    raise KeyError(f"No such column: '{column}'")


def nested_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if is_nested_type(f.dataType)]


def base_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if not is_nested_type(f.dataType)]


def struct_sql(field_exprs: dict[str, str]) -> str:
    """``struct(expr AS name, ...)`` from a name->SQL mapping."""
    inner = ", ".join(f"{sql} AS {quote(name)}" for name, sql in field_exprs.items())
    return f"struct({inner})"


def rebuild_struct_sql(
    fields: list[str],
    lambda_var: str = "__x",
    drop: set[str] | None = None,
    override: dict[str, str] | None = None,
    extra: dict[str, str] | None = None,
) -> str:
    """Struct-rebuild expression for use inside ``transform(nest, v -> ...)``.

    Keeps existing fields (minus ``drop``), replaces those in ``override``,
    appends ``extra`` — the Spark equivalent of the reference's sub-column
    set/drop kernels (``ext_array.py:1072-1232``).
    """
    drop = drop or set()
    override = override or {}
    extra = extra or {}
    parts: dict[str, str] = {}
    for f in fields:
        if f in drop:
            continue
        parts[f] = override.get(f, f"{lambda_var}.{quote(f)}")
    for name, sql in extra.items():
        parts[name] = sql
    if not parts:
        raise ValueError("Cannot drop all fields of a nested column")
    return struct_sql(parts)


def nest_filter(nest: str, predicate_sql: str, lambda_var: str = "__x") -> Column:
    """Element-level filter: ``filter(nest, x -> predicate)``. No shuffle."""
    return F.expr(f"filter({quote(nest)}, {lambda_var} -> {predicate_sql})")


def nest_transform_add(
    df: DataFrame,
    nest: str,
    new_fields: dict[str, str],
    lambda_var: str = "__x",
) -> Column:
    """Add/replace sub-columns: ``transform(nest, x -> struct(..., expr AS new))``."""
    fields = nested_field_names(df, nest)
    override = {k: v for k, v in new_fields.items() if k in fields}
    extra = {k: v for k, v in new_fields.items() if k not in fields}
    body = rebuild_struct_sql(fields, lambda_var, override=override, extra=extra)
    return F.expr(f"transform({quote(nest)}, {lambda_var} -> {body})")


def nest_select_fields(df: DataFrame, nest: str, keep: list[str]) -> Column:
    """Project a nested column down to a subset of its fields."""
    fields = nested_field_names(df, nest)
    missing = [f for f in keep if f not in fields]
    if missing:
        raise KeyError(f"Nested column '{nest}' has no fields {missing}")
    body = struct_sql({f: f"__x.{quote(f)}" for f in keep})
    return F.expr(f"transform({quote(nest)}, __x -> {body})")


def nest_drop_fields(df: DataFrame, nest: str, drop: list[str]) -> Column:
    fields = nested_field_names(df, nest)
    missing = [f for f in drop if f not in fields]
    if missing:
        # reference parity: `del nf["nested.not_a_field"]` / drop of a
        # missing sub-column raises KeyError (test_nestedframe.py
        # test_delitem_base_and_nested)
        raise KeyError(f"Nested column '{nest}' has no fields {missing}")
    keep = [f for f in fields if f not in set(drop)]
    if not keep:
        raise ValueError(f"Cannot drop all fields of nested column '{nest}'")
    return nest_select_fields(df, nest, keep)


def empty_to_null(col: Column | str) -> Column:
    """Frame-level query semantics: emptied cells become NULL

    (reference keeps base rows and nullifies empty cells,
    ``core.py:1526``/``packer.py`` empty-list handling).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.size(c) > 0, c)


def field_array(nest: str, fld: str) -> Column:
    """One sub-column as a top-level ``array<T>`` (the 'to_lists' view)."""
    return F.expr(f"transform({quote(nest)}, __x -> __x.{quote(fld)})")
