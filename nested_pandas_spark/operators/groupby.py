"""Grouped operations on NestedFrames — the ``nf.groupby("c")`` surface.

Reference: the nested-pandas groupby tutorial
(``docs/tutorials/groupby_doc.ipynb``): pandas ``groupby`` on a NestedFrame
works on BASE columns only; ``count`` treats a nested column as one object
per row (non-null cells), ``describe`` flattens nested columns, ``min``/
``max``/``mean`` raise TypeError on nested columns, and ``apply`` runs a
custom function per group.

Spark-first shape: every built-in here is ONE hash aggregation on the group
keys — nested sub-columns aggregate through per-row higher-order-function
partials (``array_min`` / ``aggregate`` / ``size`` inside the projection)
that combine in the same group agg, so packed data is NEVER exploded and the
only shuffle is the groupBy itself. ``apply`` is `applyInPandas`
(:func:`map_groups`); custom logic that only needs flat rows should
``to_flat`` first and use a plain Spark agg instead.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.nested import is_nested_type, quote
from . import aggregates
from .map_rows import map_groups

__all__ = ["NestedGroupBy"]

_AGG_FUNCS = ("min", "max", "sum", "mean", "count")


def _flat_agg_expr(nest: str, fld: str, func: str) -> str:
    """Group-aggregate one nested sub-column WITHOUT exploding: a per-row
    HOF partial (runs in the scan projection) combined by the group agg —
    the same partial-aggregate shape Spark uses map-side."""
    arr = f"transform({quote(nest)}, __x -> __x.{quote(fld)})"
    nn = f"filter({arr}, __v -> __v IS NOT NULL)"
    dbl = (f"aggregate({nn}, CAST(0.0 AS DOUBLE), "
           f"(__a, __v) -> __a + CAST(__v AS DOUBLE))")
    if func == "min":
        return f"min(array_min({arr}))"
    if func == "max":
        return f"max(array_max({arr}))"
    if func == "sum":
        return f"sum({dbl})"
    if func == "count":
        return f"sum(size({nn}))"
    if func == "mean":
        return f"sum({dbl}) / sum(size({nn}))"
    raise ValueError(f"Unsupported aggregate '{func}'")


class NestedGroupBy:
    """Returned by :meth:`NestedFrame.groupby`. Group keys must be BASE
    columns (the reference's rule: nested values are unhashable group
    keys)."""

    def __init__(self, nf, keys: str | list[str]):
        self._nf = nf
        self._keys = [keys] if isinstance(keys, str) else list(keys)
        df = nf.df
        nested = {f.name for f in df.schema.fields if is_nested_type(f.dataType)}
        bad = [k for k in self._keys if k in nested]
        if bad:
            raise TypeError(
                f"Cannot group by nested column(s) {bad} — group by base "
                "columns, or extract a scalar first (reference groupby rule)"
            )
        missing = [k for k in self._keys if k not in df.columns]
        if missing:
            raise KeyError(f"No such columns: {missing}")
        self._df = df
        self._nested = nested

    # -- pandas-parity built-ins ------------------------------------------
    def count(self) -> DataFrame:
        """Per-group non-null count of every other column. A nested column
        counts as ONE object per row (its non-null cells), exactly the
        pandas behavior the tutorial documents."""
        aggs = [
            F.count(self._df[c]).alias(c)
            for c in self._df.columns if c not in self._keys
        ]
        return self._df.groupBy(*[self._df[k] for k in self._keys]).agg(*aggs)

    def _base_only(self, func: str, exclude_nest: bool) -> DataFrame:
        if self._nested and not exclude_nest:
            # reference parity: pandas groupby min/max/mean raise TypeError
            # on nested columns — point at the Spark-first alternatives
            raise TypeError(
                f"Cannot compute {func} on nested columns — use "
                f".agg({{'nest.field': '{func}'}}) to aggregate the flat "
                "elements, .describe() for flattened stats, or pass "
                "exclude_nest=True for base columns only"
            )
        aggs = [
            getattr(F, "avg" if func == "mean" else func)(self._df[c]).alias(c)
            for f_ in self._df.schema.fields
            for c in [f_.name]
            if c not in self._keys and not is_nested_type(f_.dataType)
            and (func in ("min", "max")
                 or isinstance(f_.dataType, T.NumericType))
        ]
        return self._df.groupBy(*[self._df[k] for k in self._keys]).agg(*aggs)

    def min(self, exclude_nest: bool = False) -> DataFrame:
        return self._base_only("min", exclude_nest)

    def max(self, exclude_nest: bool = False) -> DataFrame:
        return self._base_only("max", exclude_nest)

    def mean(self, exclude_nest: bool = False) -> DataFrame:
        return self._base_only("mean", exclude_nest)

    def describe(self, **kwargs) -> DataFrame:
        """Per-(group, column) stats with nested columns flattened —
        delegates to :func:`aggregates.group_describe` (one scan, one
        aggregation; the tutorial's 'describe works as expected')."""
        return aggregates.group_describe(self._df, self._keys, **kwargs)

    # -- beyond-reference: declarative nested aggregation ------------------
    def agg(self, spec: dict[str, str | list[str]]) -> DataFrame:
        """``{"a": "mean", "items.l_quantity": ["min", "mean"]}`` — dotted
        nested targets aggregate their flat elements per group WITHOUT an
        explode: per-row HOF partials combine inside the single group
        aggregation (the operation pandas groupby fails on for nested
        columns). Output columns are ``{col}_{func}`` with dots as ``_``.
        """
        aggs: list[Column] = []
        for col, funcs in spec.items():
            for func in [funcs] if isinstance(funcs, str) else list(funcs):
                if func not in _AGG_FUNCS:
                    raise ValueError(
                        f"Unsupported aggregate '{func}' (use one of "
                        f"{_AGG_FUNCS})")
                alias = f"{col.replace('.', '_')}_{func}"
                if "." in col and col.split(".", 1)[0] in self._nested:
                    nest, fld = col.split(".", 1)
                    aggs.append(
                        F.expr(_flat_agg_expr(nest, fld, func)).alias(alias))
                elif col in self._df.columns:
                    fn = {"mean": "avg"}.get(func, func)
                    aggs.append(F.expr(f"{fn}({quote(col)})").alias(alias))
                else:
                    raise KeyError(f"No such column: {col}")
        if not aggs:
            raise ValueError("agg spec is empty")
        return self._df.groupBy(*[self._df[k] for k in self._keys]).agg(*aggs)

    def apply(self, func: Callable, schema: str | T.StructType) -> DataFrame:
        """Custom per-group function via ``applyInPandas`` (the tutorial's
        ``.apply``) — declared output schema, Arrow-batched. Nested cells
        arrive as lists of element dicts; flatten with ``to_flat`` BEFORE
        grouping when only flat rows are needed."""
        return map_groups(self._df, self._keys, func, schema)
