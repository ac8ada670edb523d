"""NA handling targeted at the base layer or inside one nested layer.

Reference: ``NestedFrame.dropna`` (``core.py:1699-1849``) and ``fillna``
(``core.py:1351-1434``). Nested variants are element-level rewrites via the
``filter`` / ``transform`` higher-order functions — per-row, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.nested import (
    is_nested_type,
    nested_field_names,
    quote,
    rebuild_struct_sql,
)

__all__ = ["dropna", "fillna"]


def _split_subset(df: DataFrame, subset: list[str]) -> tuple[list[str], dict[str, list[str]]]:
    """Split ``subset`` into base column names and {nest: [fields]}."""
    nested = {f.name for f in df.schema.fields if is_nested_type(f.dataType)}
    base: list[str] = []
    per_nest: dict[str, list[str]] = {}
    for s in subset:
        if "." in s and s.split(".", 1)[0] in nested:
            nest, fld = s.split(".", 1)
            per_nest.setdefault(nest, []).append(fld)
        elif s in nested:
            # a bare nest name in subset treats the layer as a base column:
            # ROW removal where the cell is NULL (reference
            # test_dropna_layer_as_base_column); element-level dropna over
            # all fields is requested via on_nested= instead
            base.append(s)
        else:
            base.append(s)
    return base, per_nest


def dropna(
    df: DataFrame,
    subset: str | list[str] | None = None,
    how: str = "any",
    on_nested: str | None = None,
    drop_empty_cells: bool = False,
    thresh: int | None = None,
) -> DataFrame:
    """Drop NA rows at the base layer or NA *elements* inside one nested layer.

    * base subset -> ``df.na.drop`` (row removal);
    * ``subset="nested.t"`` or ``on_nested="nested"`` -> remove elements whose
      targeted fields are NULL inside each cell (base rows are kept);
    * ``thresh=N`` (pandas semantics, overrides ``how``): keep rows/elements
      with at least N non-null values among the targeted columns;
    * the reference enforces a single target layer per call
      (``core.py:1650-1697``) — so do we.
    """
    if subset is None and on_nested is None:
        if thresh is not None:
            return df.na.drop(thresh=thresh)
        return df.na.drop(how=how)
    subset_list = [subset] if isinstance(subset, str) else list(subset or [])
    base, per_nest = _split_subset(df, subset_list)
    if on_nested:
        per_nest.setdefault(on_nested, [])
    if base and per_nest:
        raise ValueError("dropna can only target one layer (base or one nested column) per call")
    if len(per_nest) > 1:
        raise ValueError("dropna can only target one nested column per call")
    if base:
        if thresh is not None:
            return df.na.drop(thresh=thresh, subset=base)
        return df.na.drop(how=how, subset=base)
    nest, flds = next(iter(per_nest.items()))
    fields = flds or nested_field_names(df, nest)
    if thresh is not None:
        notnull_count = " + ".join(
            f"(CASE WHEN __x.{quote(f)} IS NOT NULL THEN 1 ELSE 0 END)" for f in fields
        )
        keep_pred = f"({notnull_count}) >= {int(thresh)}"
    else:
        joiner = " OR " if how == "any" else " AND "
        null_pred = joiner.join(f"__x.{quote(f)} IS NULL" for f in fields)
        keep_pred = f"NOT ({null_pred})"
    out = df.withColumn(nest, F.expr(f"filter({quote(nest)}, __x -> {keep_pred})"))
    if drop_empty_cells:
        out = out.where(F.size(F.col(quote(nest))) > 0)
    return out


def fillna(
    df: DataFrame,
    value: object | dict[str, object],
) -> DataFrame:
    """Fill NaNs in base columns and inside nested cells.

    Dict keys of the form ``"nested.d"`` route to sub-columns, rebuilt with
    ``transform`` + ``coalesce`` (reference ``core.py:1351-1434``).
    A scalar ``value`` fills every base column and every nested sub-column of
    compatible type.
    """
    nested = {f.name for f in df.schema.fields if is_nested_type(f.dataType)}

    if not isinstance(value, dict):
        out = df.na.fill(value)  # type: ignore[arg-type]
        for nest in nested:
            fields = nested_field_names(out, nest)
            override = {f: f"coalesce(__x.{quote(f)}, {_sql_lit(value)})" for f in fields}
            body = rebuild_struct_sql(fields, "__x", override=override)
            out = out.withColumn(nest, F.expr(f"transform({quote(nest)}, __x -> {body})"))
        return out

    base_fill = {k: v for k, v in value.items() if "." not in k or k.split(".", 1)[0] not in nested}
    out = df.na.fill(base_fill) if base_fill else df
    per_nest: dict[str, dict[str, object]] = {}
    for k, v in value.items():
        if "." in k and k.split(".", 1)[0] in nested:
            nest, fld = k.split(".", 1)
            per_nest.setdefault(nest, {})[fld] = v
    for nest, fills in per_nest.items():
        fields = nested_field_names(out, nest)
        override = {
            f: f"coalesce(__x.{quote(f)}, {_sql_lit(v)})" for f, v in fills.items() if f in fields
        }
        body = rebuild_struct_sql(fields, "__x", override=override)
        out = out.withColumn(nest, F.expr(f"transform({quote(nest)}, __x -> {body})"))
    return out


def _sql_lit(v: object) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise ValueError(f"Unsupported fill value: {v!r}")
