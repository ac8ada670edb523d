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
        nested = set(nf.nested_columns)
        bad = [k for k in self._keys if k in nested]
        if bad:
            raise TypeError(
                f"Cannot group by nested column(s) {bad} — group by base "
                "columns, or extract a scalar first (reference groupby rule)"
            )
        known = set(nf.base_columns) | nested | nf._pending_agg_aliases()
        missing = [k for k in self._keys if k not in known]
        if missing:
            raise KeyError(f"No such columns: {missing}")
        self._nested = nested

    @property
    def _df(self) -> DataFrame:
        # materializes pending packs at PLAN level; agg() avoids touching
        # this entirely when every nested target is still pending
        return self._nf.df

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
        parsed: list[tuple[str, str, str]] = []  # (col, func, alias)
        for col, funcs in spec.items():
            for func in [funcs] if isinstance(funcs, str) else list(funcs):
                if func not in _AGG_FUNCS:
                    raise ValueError(
                        f"Unsupported aggregate '{func}' (use one of "
                        f"{_AGG_FUNCS})")
                parsed.append((col, func, f"{col.replace('.', '_')}_{func}"))
        if not parsed:
            raise ValueError("agg spec is empty")
        flat = self._pending_flat_agg(parsed)
        if flat is not None:
            return flat
        aggs: list[Column] = []
        for col, func, alias in parsed:
            if "." in col and col.split(".", 1)[0] in self._nested:
                nest, fld = col.split(".", 1)
                if fld not in self._nf.nested_fields(nest):
                    raise KeyError(
                        f"Nested column '{nest}' has no field '{fld}'")
                aggs.append(
                    F.expr(_flat_agg_expr(nest, fld, func)).alias(alias))
            elif col in self._df.columns:
                fn = {"mean": "avg"}.get(func, func)
                aggs.append(F.expr(f"{fn}({quote(col)})").alias(alias))
            else:
                raise KeyError(f"No such column: {col}")
        return self._df.groupBy(*[self._df[k] for k in self._keys]).agg(*aggs)

    def _pending_flat_agg(self, parsed) -> DataFrame | None:
        """PENDING-pack rewrite: when every nested target's pack is still
        deferred, aggregate the FLAT child directly — the collect_list
        arrays are never built at all. Plan: child (pushed preds kept,
        null-key contract kept) JOIN base(join keys + group keys) →
        ONE hash agg on the group keys; base-column targets aggregate
        the base alone (no fan-out through the join); a left join on the
        group keys stitches the small grouped results. Cell semantics
        are identical to the packed HOF path — childless groups yield
        NULL aggregates either way (tests pin both paths equal)."""
        from .packer import null_key_guard

        nf = self._nf
        pending = dict(getattr(nf, "_pending", {}) or {})
        base_df = nf._base_df
        nested_targets = [(c, f, a) for c, f, a in parsed if "." in c
                          and c.split(".", 1)[0] in self._nested]
        base_targets = [(c, f, a) for c, f, a in parsed
                        if (c, f, a) not in nested_targets]
        if not nested_targets:
            return None
        by_nest: dict[str, list[tuple[str, str, str]]] = {}
        for c, f, a in nested_targets:
            by_nest.setdefault(c.split(".", 1)[0], []).append((c, f, a))
        if not all(n in pending for n in by_nest):
            return None  # some target already materialized — single-agg path
        if any(k not in base_df.columns for k in self._keys):
            return None  # group key is a pending-agg alias etc.
        if any(c not in base_df.columns for c, _f, _a in base_targets):
            return None
        for nest, items in by_nest.items():
            fields = set(pending[nest].fields())
            for c, _f, _a in items:
                fld = c.split(".", 1)[1]
                if fld not in fields:
                    raise KeyError(
                        f"Nested column '{nest}' has no field '{fld}'")

        keys = self._keys
        if base_targets:
            spine = base_df.groupBy(*[base_df[k] for k in keys]).agg(*[
                F.expr(f"{({'mean': 'avg'}.get(f, f))}({quote(c)})").alias(a)
                for c, f, a in base_targets
            ])
        else:
            spine = base_df.select(*[base_df[k] for k in keys]).distinct()
        out = spine
        for nest, items in by_nest.items():
            sp = pending[nest]
            child = null_key_guard(sp.child, sp.keys, sp.drop_null_keys)
            if sp.preds:
                child = child.where(
                    " AND ".join(f"({p})" for p in sp.preds))
            sel = list(dict.fromkeys(list(sp.keys) + keys))
            joined = child.join(base_df.select(*sel), on=list(sp.keys))
            aggs = []
            for c, func, alias in items:
                fld = quote(c.split(".", 1)[1])
                dbl = f"sum(CAST({fld} AS DOUBLE))"
                # NULL alignment with the packed HOF path (pandas
                # conventions): a group whose elements are all NULL sums
                # to 0.0 and means to NaN; an entirely childless group is
                # absent here and arrives NULL via the left join, exactly
                # like a NULL cell in the packed path
                expr = {
                    "min": f"min({fld})",
                    "max": f"max({fld})",
                    "sum": f"coalesce({dbl}, CAST(0.0 AS DOUBLE))",
                    "count": f"count({fld})",
                    "mean": (f"CASE WHEN count({fld}) = 0 THEN double('NaN') "
                             f"ELSE {dbl} / count({fld}) END"),
                }[func]
                aggs.append(F.expr(expr).alias(alias))
            grouped = joined.groupBy(*keys).agg(*aggs)
            out = out.join(grouped, on=keys, how="left")
        return out.select(*keys, *[a for _c, _f, a in parsed])

    def apply(self, func: Callable, schema: str | T.StructType) -> DataFrame:
        """Custom per-group function via ``applyInPandas`` (the tutorial's
        ``.apply``) — declared output schema, Arrow-batched. Nested cells
        arrive as lists of element dicts; flatten with ``to_flat`` BEFORE
        grouping when only flat rows are needed."""
        return map_groups(self._df, self._keys, func, schema)
