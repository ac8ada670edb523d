"""NestedFrame: a thin facade over a Spark DataFrame with nested columns.

A nested column IS a Spark ``array<struct<...>>`` column — no wrapper type,
no custom storage (the reference needs a pandas ExtensionArray + three Arrow
storage views, ``src/nested_pandas/series/ext_array.py:222``; Spark's native
columnar format subsumes all three). The facade only adds the reference's
API surface: dotted-name access, query/eval strings, layer-targeted verbs.

Every method returns a new NestedFrame (immutable, like Spark). The wrapped
DataFrame is always available as ``.df`` — users can drop to raw Spark at any
point and come back with ``NestedFrame(df)``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.nested import (
    base_columns,
    empty_to_null,
    is_nested_type,
    nest_drop_fields,
    nest_select_fields,
    nested_columns,
    nested_field_names,
    quote,
    rebuild_struct_sql,
    struct_sql,
)
from ..operators import aggregates, cleaning, packer, restructure, sorting
from .expr import (QueryCompileError, _sql_literal, compile_expr,
                   reduction_literal, split_assignment)
from ..plans.lazy_pack import PendingPack as _PendingPack

__all__ = ["NestedFrame"]


def _infer_ddl(value: Any) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "bigint"
    if isinstance(value, float):
        return "double"
    return "string"



class NestedFrame:
    """Spark-backed analogue of ``nested_pandas.NestedFrame``
    (reference ``src/nested_pandas/nestedframe/core.py:35``)."""

    def __init__(self, df: DataFrame, _pending: dict[str, _PendingPack] | None = None):
        self._base_df = df
        self._pending: dict[str, _PendingPack] = _pending or {}
        self._materialized: DataFrame | None = None

    # -- plumbing ---------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        """The wrapped DataFrame, with any pending packs materialized
        (plan construction only — nothing executes until an action)."""
        if not self._pending:
            return self._base_df
        if self._materialized is None:
            out = self._base_df
            for name, spec in self._pending.items():
                child = spec.child
                if spec.preds:
                    child = child.where(" AND ".join(f"({p})" for p in spec.preds))
                packed = packer.pack(
                    child, name, on=spec.keys, columns=spec.columns,
                    sort_within=spec.sort_within,
                    extra_aggs=[(a, sql) for a, sql, _ in spec.aggs],
                    drop_null_keys=spec.drop_null_keys,
                )
                if spec.broadcast_packed:
                    packed = F.broadcast(packed)
                out = out.join(packed, on=spec.keys, how="left")
                for alias, _, zero_fill in spec.aggs:
                    if zero_fill:
                        out = out.withColumn(
                            alias, F.coalesce(F.col(quote(alias)), F.lit(0))
                        )
            self._materialized = out
        return self._materialized

    @property
    def _df(self) -> DataFrame:  # backward-compat internal alias
        return self.df

    def _wrap(self, df: DataFrame) -> "NestedFrame":
        return NestedFrame(df)

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def nested_columns(self) -> list[str]:
        """Reference ``core.py:97-105``. Includes pending (lazy) packs."""
        return nested_columns(self._base_df) + list(self._pending)

    @property
    def base_columns(self) -> list[str]:
        return base_columns(self._base_df)

    @property
    def all_columns(self) -> dict[str, list[str]]:
        """{'base': [...], nest: [fields...]} (reference ``core.py:86-95``)."""
        out = {"base": self.base_columns}
        for n in self.nested_columns:
            out[n] = self.nested_fields(n)
        return out

    def get_subcolumns(self, nested_columns: str | list[str] = "all") -> list[str]:
        """Dotted sub-column names of the given (default: all) nested columns
        (reference ``core.py:346-381``)."""
        if nested_columns == "all":
            nested_columns = self.nested_columns
        elif isinstance(nested_columns, str):
            nested_columns = [nested_columns]
        return [
            f"{n}.{f}" for n in nested_columns for f in self.nested_fields(n)
        ]

    def nest(self, column: str):
        """Series-level ``.nest`` accessor (reference accessor.py surface)."""
        from .accessor import NestAccessor

        return NestAccessor(self, column)

    def nested_fields(self, nest: str) -> list[str]:
        if nest in self._pending:
            return self._pending[nest].fields()
        return nested_field_names(self._base_df, nest)

    def _nested_field_map(self) -> dict[str, set[str]]:
        return {n: set(self.nested_fields(n)) for n in self.nested_columns}

    def _pending_agg_aliases(self) -> set[str]:
        """Aliases of aggregates registered on pending packs (e.g. ``n_items``
        from a lazy ``count_nested``). Visible columns of ``.df`` but not of
        ``self._base_df`` — query/eval compile must know them."""
        return {a for spec in self._pending.values() for (a, _, _) in spec.aggs}

    def _known_columns(self) -> set[str]:
        return (set(self.base_columns) | set(self.nested_columns)
                | self._pending_agg_aliases())

    def __repr__(self) -> str:
        return f"NestedFrame[{self._df.schema.simpleString()}]"

    def show(self, *a: Any, **kw: Any) -> None:
        self._df.show(*a, **kw)

    def count(self) -> int:
        return self._df.count()

    def collect(self):
        return self._df.collect()

    def toPandas(self):
        return self._df.toPandas()

    def to_pandas(self, list_struct: bool = False, large_list: bool = False):
        """Convert to pandas with reference-compatible nested cells
        (reference ``core.py:2547-2584``).

        Nested columns become ``pd.ArrowDtype`` series: struct-of-lists cells
        (``{'t': array([...]), ...}``) by default — the layout the reference's
        ``NestedFrame`` constructor re-casts to NestedDtype — or
        list-of-structs with ``list_struct=True``. ``large_list`` switches to
        int64 offsets (needed past ~2.1B total elements).

        Collects through Arrow in one pass; ``toPandas()`` stays the
        Spark-native (list-of-Row cells) variant.
        """
        import pandas as pd
        import pyarrow as pa

        from .io import list_struct_to_struct_of_lists

        df = self.df
        table = df.toArrow()
        nests = nested_columns(df)
        base_cols = [c for c in table.column_names if c not in nests]
        pdf = table.select(base_cols).to_pandas() if base_cols else pd.DataFrame(
            index=range(table.num_rows)
        )
        for c in nests:
            col = table.column(c)
            if list_struct:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                if large_list:
                    arr = arr.cast(pa.large_list(arr.type.value_type))
            else:
                arr = list_struct_to_struct_of_lists(col, large_list=large_list)
            pdf[c] = pd.arrays.ArrowExtensionArray(arr)
        return pdf[list(table.column_names)]

    def explain(self, *a: Any, **kw: Any) -> None:
        self._df.explain(*a, **kw)

    def limit(self, n: int) -> "NestedFrame":
        return self._wrap(self._df.limit(n))

    def head(self, n: int = 5) -> "NestedFrame":
        return self.limit(n)

    # set operations (reference relies on pd.concat; Spark natives)
    def union(self, other: "NestedFrame | DataFrame") -> "NestedFrame":
        o = other.df if isinstance(other, NestedFrame) else other
        return self._wrap(self._df.unionByName(o))

    def intersect(self, other: "NestedFrame | DataFrame") -> "NestedFrame":
        o = other.df if isinstance(other, NestedFrame) else other
        return self._wrap(self._df.intersect(o))

    def except_all(self, other: "NestedFrame | DataFrame") -> "NestedFrame":
        o = other.df if isinstance(other, NestedFrame) else other
        return self._wrap(self._df.exceptAll(o))

    @classmethod
    def concat(cls, frames: "list[NestedFrame | DataFrame]",
               join: str = "outer") -> "NestedFrame":
        """Stack frames vertically with schema alignment — the analogue of
        ``pd.concat(axis=0)``, which the reference leans on for combining
        NestedFrames (e.g. reference ``core.py:740,1338,2136``).

        ``join='outer'`` (pandas default): the result carries the union of
        columns; missing top-level columns AND missing nested struct fields
        are NULL-padded (Spark's ``unionByName(allowMissingColumns=True)``
        aligns ``array<struct>`` element fields by name recursively).
        ``join='inner'``: only columns present in every frame survive, and
        each surviving nested column is narrowed to the fields present in
        every frame before the union.

        Scale: a union is plan-level concatenation — no shuffle, no data
        movement; each input's partitions stream straight through.
        """
        if not frames:
            raise ValueError("concat needs at least one frame")
        if join not in ("outer", "inner"):
            raise ValueError(f"join must be 'outer' or 'inner', got {join!r}")
        dfs = [f.df if isinstance(f, NestedFrame) else f for f in frames]
        if join == "inner":
            common = [c for c in dfs[0].columns
                      if all(c in d.columns for d in dfs[1:])]
            if not common:
                raise ValueError("concat(join='inner'): no common columns")
            pruned = []
            for d in dfs:
                cols = []
                for c in common:
                    if is_nested_type(d.schema[c].dataType):
                        keep = [fld for fld in nested_field_names(d, c)
                                if all(fld in nested_field_names(o, c)
                                       for o in dfs if is_nested_type(
                                           o.schema[c].dataType))]
                        if not keep:
                            raise ValueError(
                                f"concat(join='inner'): nested column '{c}' "
                                "has no fields common to every frame"
                            )
                        cols.append(nest_select_fields(d, c, keep).alias(c))
                    else:
                        cols.append(F.col(quote(c)))
                pruned.append(d.select(*cols))
            dfs = pruned
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=(join == "outer"))
        return cls(out)

    @staticmethod
    def from_seq(spark, seq, name: str = "nested", key: str = "id"):
        """Build a frame with one nested cell per element of ``seq`` — the
        analogue of the reference's ``pack_seq`` (``packer.py:120-154``).

        ``seq``: iterable of (key, rows) where rows is a list of dicts (or
        None for a NULL cell). Driver-side literals; meant for small inputs
        and tests, not bulk data.
        """
        import pandas as pd

        records = []
        for k, rows in seq:
            if rows is None:
                records.append({key: k, name: None})
            else:
                records.append({key: k, name: [tuple(r.values()) for r in rows]})
        first_rows = next(rows for _, rows in seq if rows)
        fields = list(first_rows[0].keys())
        inner = ", ".join(f"{f}: {_infer_ddl(first_rows[0][f])}" for f in fields)
        schema = f"{key} bigint, {name} array<struct<{inner}>>"
        return NestedFrame(spark.createDataFrame(pd.DataFrame(records), schema=schema))

    def select(self, *cols: Any) -> "NestedFrame":
        return self._wrap(self._df.select(*cols))

    def withColumn(self, name: str, col: Column) -> "NestedFrame":
        return self._wrap(self._df.withColumn(name, col))

    def filter(self, cond: Any) -> "NestedFrame":
        return self._wrap(self._df.filter(cond))

    # -- dotted access ----------------------------------------------------
    def __getitem__(self, key: str | list[str]) -> "NestedFrame | Column":
        """``ndf["nested.t"]`` -> flat sub-column reference (a Column usable
        on the exploded view); ``ndf[["a", "b"]]`` -> projected frame.
        Reference ``core.py:251-282``."""
        if isinstance(key, list):
            cols: list[Column] = []
            for k in key:
                cols.append(self._dotted_col(k).alias(k) if "." in k else F.col(quote(k)))
            return self._wrap(self._df.select(*cols))
        if "." in key:
            nest, fld = key.split(".", 1)
            if nest in self.nested_columns:
                # flat series view: explode the single sub-column
                return self._wrap(
                    self._df.select(
                        F.explode(
                            F.expr(f"transform({quote(nest)}, __x -> __x.{quote(fld)})")
                        ).alias(fld)
                    )
                )
        return self._wrap(self._df.select(quote(key)))

    def __setitem__(self, key: str, value: Any) -> None:
        """Bracket assignment, reference ``core.py:284-340``: dotted keys
        set/replace a nested sub-column (strings are eval expressions, a
        Column must be a per-row ``array<T>``); plain keys set a base column
        (a Column is used as-is, a string is an eval expression, any other
        scalar broadcasts). The wrapper mutates in place — the underlying
        plan is still immutable, we just rebind it."""
        if isinstance(value, NestedFrame):
            raise TypeError(
                "assigning a frame packs it — use join_nested(child, name, on=...)"
            )
        if "." in key:
            nf = self.set_nested_field(key, value)
        elif isinstance(value, str):
            nf = self.eval(f"{key} = {value}")
        elif isinstance(value, Column):
            nf = self._wrap(self._df.withColumn(key, value))
        else:
            nf = self._wrap(self._df.withColumn(key, F.lit(value)))
        self._base_df = nf._base_df
        self._pending = nf._pending
        self._materialized = None

    def _dotted_col(self, key: str) -> Column:
        nest, fld = key.split(".", 1)
        if nest not in self.nested_columns:
            raise KeyError(f"'{nest}' is not a nested column")
        return F.expr(f"transform({quote(nest)}, __x -> __x.{quote(fld)})")

    def set_nested_field(self, target: str, value: Column | str) -> "NestedFrame":
        """Dotted assignment ``ndf["nested.c"] = expr`` — add/replace a
        sub-column. ``value`` may be a SQL string in eval syntax (supports
        ``nested.x`` refs and base broadcast) or a Column producing an
        ``array<T>`` aligned per row. Reference ``core.py:284-340`` and
        ``nest.set_flat/list/filled_column`` (``accessor.py:305-491``)."""
        if "." not in target:
            raise ValueError("set_nested_field target must be 'nest.field'")
        nest, fld = target.split(".", 1)
        if target.count(".") > 1:
            raise ValueError("Only one level of nesting is supported")  # core.py:317-318
        if isinstance(value, str):
            return self.eval(f"{target} = {value}")
        # Column of array<T>: zip into the struct by position
        if nest not in self.nested_columns:
            raise KeyError(f"'{nest}' is not a nested column")
        fields = nested_field_names(self._df, nest)
        tmp = "__newvals"
        df = self._df.withColumn(tmp, value)
        body = rebuild_struct_sql(
            fields,
            "__x",
            override={fld: f"try_element_at({quote(tmp)}, __i + 1)"} if fld in fields else None,
            extra=None if fld in fields else {fld: f"try_element_at({quote(tmp)}, __i + 1)"},
        )
        sql = f"transform({quote(nest)}, (__x, __i) -> {body})"
        return self._wrap(df.withColumn(nest, F.expr(sql)).drop(tmp))

    def drop(self, columns: str | list[str]) -> "NestedFrame":
        """Drop base columns or dotted sub-columns (reference
        ``core.py:745-858``)."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        df = self._df
        nested = set(self.nested_columns)
        per_nest: dict[str, list[str]] = {}
        flat: list[str] = []
        for c in cols:
            if "." in c and c.split(".", 1)[0] in nested:
                nest, fld = c.split(".", 1)
                per_nest.setdefault(nest, []).append(fld)
            else:
                flat.append(c)
        for nest, flds in per_nest.items():
            df = df.withColumn(nest, nest_drop_fields(df, nest, flds))
        if flat:
            missing = [c for c in flat if c not in df.columns]
            if missing:
                raise KeyError(f"No such columns: {missing}")
            df = df.drop(*flat)
        return self._wrap(df)

    def rename(self, columns: dict[str, str]) -> "NestedFrame":
        """pandas-style rename of base columns and dotted sub-columns —
        ``{"nested.a": "b"}`` renames field ``a`` inside the struct (the
        new name may be given bare or as ``"nested.b"``). Pure projection,
        zero shuffle (reference relies on pandas ``rename``; sub-column
        renames there go through the same struct rebuild as set/drop,
        ``ext_array.py:1072-1232``)."""
        df = self._df
        nested = set(self.nested_columns)
        for old, new in columns.items():
            if "." in old and old.split(".", 1)[0] in nested:
                nest, fld = old.split(".", 1)
                new_f = new.split(".", 1)[1] if "." in new else new
                if "." in new and new.split(".", 1)[0] != nest:
                    raise ValueError(
                        f"cannot rename '{old}' into a different nest '{new}'"
                    )
                fields = nested_field_names(df, nest)
                if fld not in fields:
                    raise KeyError(f"Nested column '{nest}' has no field '{fld}'")
                if new_f != fld and new_f in fields:
                    raise ValueError(
                        f"cannot rename '{old}' to existing field "
                        f"'{nest}.{new_f}' — drop it first"
                    )
                parts = {
                    (new_f if f == fld else f): f"__x.{quote(f)}" for f in fields
                }
                df = df.withColumn(
                    nest,
                    F.expr(f"transform({quote(nest)}, __x -> {struct_sql(parts)})"),
                )
            else:
                if old not in df.columns:
                    raise KeyError(f"No such column: {old}")
                if new != old and new in df.columns:
                    raise ValueError(
                        f"cannot rename '{old}' to existing column '{new}'"
                        " — drop it first"
                    )
                df = df.withColumnRenamed(old, new)
        return self._wrap(df)

    def astype(self, dtype: dict[str, str]) -> "NestedFrame":
        """Cast base columns or dotted sub-columns:
        ``ndf.astype({"nested.flux": "double", "id": "string"})``. Element
        casts rebuild the struct in place (one projection, zero shuffle).
        ANSI mode applies — a failing cast raises like the reference's
        ``astype``; use an eval expression with ``try_cast`` semantics via
        ``set_nested_field`` for the permissive form."""
        df = self._df
        nested = set(self.nested_columns)
        for col, typ in dtype.items():
            if "." in col and col.split(".", 1)[0] in nested:
                nest, fld = col.split(".", 1)
                fields = nested_field_names(df, nest)
                if fld not in fields:
                    raise KeyError(f"Nested column '{nest}' has no field '{fld}'")
                body = rebuild_struct_sql(
                    fields, "__x",
                    override={fld: f"CAST(__x.{quote(fld)} AS {typ})"},
                )
                df = df.withColumn(
                    nest, F.expr(f"transform({quote(nest)}, __x -> {body})")
                )
            else:
                if col not in df.columns:
                    raise KeyError(f"No such column: {col}")
                df = df.withColumn(col, F.col(quote(col)).cast(typ))
        return self._wrap(df)

    # -- restructuring ----------------------------------------------------
    def join_nested(
        self,
        child: "NestedFrame | DataFrame",
        name: str,
        on: str | list[str],
        how: str = "left",
        columns: list[str] | None = None,
        sort_within: list[str | tuple[str, bool]] | None = None,
        broadcast_packed: bool = False,
        drop_null_keys: bool = True,
    ) -> "NestedFrame":
        """Pack ``child`` rows under each base row as nested column ``name``
        (reference ``core.py:385-467``). Left joins defer the pack — later
        element filters push down to the child scan before materializing.

        Examples
        --------
        >>> base = spark.createDataFrame([(1, "A"), (2, "B")], "k long, s string")
        >>> child = spark.createDataFrame(
        ...     [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, qty double")
        >>> ndf = NestedFrame(base).join_nested(child, "items", on="k")
        >>> sorted((r["k"], len(r["items"])) for r in ndf.df.collect())
        [(1, 2), (2, 1)]
        """
        cdf = child.df if isinstance(child, NestedFrame) else child
        if how == "left":
            # defer the pack: element predicates from subsequent query()
            # calls then push down to the child scan (see _PendingPack)
            keys = [on] if isinstance(on, str) else list(on)
            spec = _PendingPack(cdf, keys, columns, sort_within, broadcast_packed,
                                drop_null_keys=drop_null_keys)
            return NestedFrame(self.df, {**self._pending, name: spec})
        return self._wrap(
            packer.join_nested(
                self.df, cdf, name, on=on, how=how, columns=columns,
                sort_within=sort_within, broadcast_packed=broadcast_packed,
                drop_null_keys=drop_null_keys,
            )
        )

    # deprecated alias kept for API parity (reference core.py:385-467)
    add_nested = join_nested

    @staticmethod
    def from_flat(
        df: DataFrame,
        base_columns: list[str],
        on: str | list[str],
        nested_columns: list[str] | None = None,
        name: str = "nested",
        drop_null_keys: bool = False,
    ) -> "NestedFrame":
        return NestedFrame(packer.from_flat(df, base_columns, on, nested_columns,
                                            name, drop_null_keys))

    @staticmethod
    def from_lists(
        df: DataFrame,
        list_columns: list[str] | None = None,
        base_columns: list[str] | None = None,
        name: str = "nested",
    ) -> "NestedFrame":
        return NestedFrame(packer.from_lists(df, list_columns, base_columns, name))

    def nest_lists(self, columns: list[str], name: str = "nested") -> "NestedFrame":
        return self._wrap(packer.nest_lists(self._df, columns, name))

    def explode(self, columns: str | list[str], validate_lengths: bool = True,
                ignore_index: bool = False) -> "NestedFrame":
        if isinstance(columns, str) and columns in self._pending:
            out = self._flat_from_pending(columns, None, None)
            if ignore_index:
                out = self._wrap(
                    out.df.withColumn("index", F.monotonically_increasing_id())
                )
            return out
        return self._wrap(
            restructure.frame_explode(self._df, columns, validate_lengths, ignore_index)
        )

    def to_flat(self, nest: str, columns: list[str] | None = None,
                keys: list[str] | None = None) -> "NestedFrame":
        if nest in self._pending:
            return self._flat_from_pending(nest, columns, keys)
        return self._wrap(restructure.to_flat(self._df, nest, columns, keys))

    def _flat_from_pending(self, nest: str, columns: list[str] | None,
                           keys: list[str] | None) -> "NestedFrame":
        """pack-then-explode collapses to a plain inner join: rows that share
        a key ARE the exploded view, and NULL/empty cells contribute nothing
        either way. Skips the collect_list aggregation entirely — the single
        biggest rewrite at scale (no shuffle when the join broadcasts or the
        tables are co-partitioned)."""
        spec = self._pending[nest]
        child = spec.child
        if spec.preds:
            child = child.where(" AND ".join(f"({p})" for p in spec.preds))
        fields = [c for c in spec.fields() if columns is None or c in columns]
        base = self._base_df
        # materialize any OTHER pending packs first
        others = {k: v for k, v in self._pending.items() if k != nest}
        if others:
            base = NestedFrame(base, others).df
        if spec.aggs:
            # registered aggregates (count_nested/nest_agg) become base
            # columns on the eager path, so to_flat/explode must keep them:
            # compute them in a narrow agg (no collect_list) and join first
            agg_df = child.groupBy(*[F.col(quote(k)) for k in spec.keys]).agg(
                *[F.expr(sql).alias(a) for a, sql, _ in spec.aggs]
            )
            base = base.join(agg_df, on=spec.keys, how="left")
            for alias, _, zero_fill in spec.aggs:
                if zero_fill:
                    base = base.withColumn(
                        alias, F.coalesce(F.col(quote(alias)), F.lit(0))
                    )
        key_cols = keys if keys is not None else [
            c for c in base.columns
            if not is_nested_type(dict((f.name, f.dataType) for f in base.schema.fields)[c])
        ]
        # keep the pack NULL-key contract through the rewrite: the join itself
        # would silently drop NULL-key child rows where pack would raise
        child_sel = packer.null_key_guard(
            child, spec.keys, spec.drop_null_keys
        ).select(*spec.keys, *fields)
        joined = base.join(child_sel, on=spec.keys, how="inner")
        out_keys = [k for k in key_cols]
        return self._wrap(joined.select(*[F.col(quote(c)) for c in out_keys],
                                        *[F.col(quote(f)) for f in fields
                                          if f not in out_keys]))

    def select_nested_fields(self, nest: str, fields: list[str]) -> "NestedFrame":
        if nest in self._pending:
            spec = self._pending[nest]
            missing = [f for f in fields if f not in spec.fields()]
            if missing:
                raise KeyError(f"Nested column '{nest}' has no fields {missing}")
            narrowed = spec.replace(columns=list(fields))
            return NestedFrame(self._base_df, {**self._pending, nest: narrowed})
        return self._wrap(self._df.withColumn(nest, nest_select_fields(self._df, nest, fields)))

    def to_lists(self, nest: str, columns: list[str] | None = None) -> "NestedFrame":
        return self._wrap(restructure.to_lists(self._df, nest, columns))

    def split(self, nest: str, by: str, values: list[str] | None = None,
              drop_by_col: bool = False, drop_nested: bool = True,
              max_values: int | None = None) -> "NestedFrame":
        return self._wrap(restructure.split(
            self._df, nest, by, values, drop_by_col, drop_nested,
            max_values=max_values))

    def to_flatten_inner(self, nest: str, inner: str) -> "NestedFrame":
        return self._wrap(restructure.to_flatten_inner(self._df, nest, inner))

    def _bind_reductions(self, compiled):
        """Fold global Series reductions (``nested.c.median()``, ``a.max()``
        — reference pandas-eval semantics, test_eval_funcs /
        test_mixed_eval_funcs) into the compiled expression as literals.

        The scalars come from ONE distributed aggregation job per source
        layer (map-side partial aggregation; the driver receives a single
        row), and literal substitution keeps every downstream pushdown
        intact — an element predicate comparing against a global mean still
        reaches the parquet scan as a plain literal comparison.
        """
        from dataclasses import replace as _dc_replace

        by_nest: dict[str | None, list[tuple[str, str, str]]] = {}
        for token, (agg, nest, colname) in compiled.reductions.items():
            by_nest.setdefault(nest, []).append((token, agg, colname))
        df = self.df
        values: dict[str, object] = {}
        for nest, items in by_nest.items():
            if nest is None:
                src = df
                aggs = [F.expr(f"{agg}({quote(c)})").alias(f"r{i}")
                        for i, (_t, agg, c) in enumerate(items)]
            else:
                # flat-series view of the nest: NULL/empty cells contribute
                # no elements, same as the reference's flat series
                src = df.select(F.explode(df[nest]).alias("__e"))
                aggs = [F.expr(f"{agg}(__e.{quote(c)})").alias(f"r{i}")
                        for i, (_t, agg, c) in enumerate(items)]
            row = src.agg(*aggs).first()
            for i, (token, _agg, _c) in enumerate(items):
                values[token] = row[f"r{i}"]
        sql = compiled.sql
        for token, v in values.items():
            sql = sql.replace(token, reduction_literal(v))
        return _dc_replace(compiled, sql=sql, reductions={})

    # -- query / eval -----------------------------------------------------
    def query(self, expr: str, env: dict[str, object] | None = None) -> "NestedFrame":
        """Row filter (base expression) or element filter (nested expression).

        Nested semantics match the reference frame-level ``query``
        (``core.py:1526-1636``): base rows are KEPT, cells that become empty
        become NULL. Expressions may mix sub-columns of ONE nest with base
        columns (base values broadcast into the lambda — they are in scope as
        outer references).

        Examples
        --------
        >>> base = spark.createDataFrame([(1,), (2,)], "k long")
        >>> child = spark.createDataFrame(
        ...     [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, qty double")
        >>> ndf = NestedFrame(base).join_nested(child, "items", on="k")
        >>> out = ndf.query("items.qty > 15")
        >>> sorted((r["k"], None if r["items"] is None
        ...         else [x["qty"] for x in r["items"]])
        ...        for r in out.df.collect())
        [(1, [20.0]), (2, None)]
        """
        compiled = compile_expr(expr, self._nested_field_map(), self._known_columns(), env)
        if compiled.reductions:
            compiled = self._bind_reductions(compiled)
        if not compiled.nests:
            # base predicate: with only pending left-packs outstanding it is
            # safe (and cheaper) to filter the base BEFORE the joins — unless
            # the predicate references a pending nest or a pending agg alias,
            # neither of which exists on the base yet
            refs_pending = compiled.base_cols & (
                set(self._pending) | self._pending_agg_aliases()
            )
            if self._pending and not refs_pending:
                return NestedFrame(
                    self._base_df.filter(F.expr(compiled.render())),
                    dict(self._pending),
                )
            return self._wrap(self.df.filter(F.expr(compiled.render())))
        nest = compiled.nest
        assert nest is not None
        if (nest in self._pending and not compiled.base_cols
                and not self._pending[nest].aggs):
            # NOTE: refuse pushdown once aggregates are registered — at
            # materialization preds filter the child BEFORE the aggs run, so
            # pushing a later query() under an earlier count_nested/nest_agg
            # would violate program order (counts would see post-filter
            # elements). Mirrors the replace guard in eval().
            # pushdown: apply the element predicate to the flat child before
            # packing — it reaches the parquet scan and shrinks the shuffle
            spec = self._pending[nest].with_pred(compiled.render_flat())
            return NestedFrame(self._base_df, {**self._pending, nest: spec})
        pred = compiled.render("__x")
        filtered = F.expr(f"filter({quote(nest)}, __x -> {pred})")
        return self._wrap(self.df.withColumn(nest, empty_to_null(filtered)))

    def query_drop_empty(self, expr: str, env: dict[str, object] | None = None) -> "NestedFrame":
        """Series-level query semantics: rows whose cell becomes empty are
        DROPPED (reference ``accessor.py:600-638``)."""
        out = self.query(expr, env)
        compiled = compile_expr(expr, self._nested_field_map(), self._known_columns(), env)
        if compiled.nests:
            nest = compiled.nest
            return out._wrap(out._df.where(F.size(F.col(quote(nest))) > 0))
        return out

    def eval(self, expr: str, env: dict[str, object] | None = None,
             empty_cells: str = "null") -> "NestedFrame":
        """Evaluate an expression, with assignment support.

        * ``"c = a + b"``            -> new base column
        * ``"nested.c = nested.a*2"``-> new sub-column inside ``nested``
        * ``"newnest.c = nested.a+b"``-> new nested column packed like
          ``nested`` (reference ``core.py:1436-1491``)
        * no assignment              -> projected result column ``__result``

        ``empty_cells``: what a NULL nested cell becomes when an assignment
        repacks its nest. ``"null"`` (default) keeps NULL — consistent with
        every other operator here; ``"reference"`` converts it to an EMPTY
        cell, matching the side effect of the reference's flatten->repack
        (reference ``core.py:1436-1491``) so migrated workloads can keep
        bit-identical cell conventions.

        Examples
        --------
        >>> base = spark.createDataFrame([(1,)], "k long")
        >>> child = spark.createDataFrame(
        ...     [(1, 10.0), (1, 20.0)], "k long, qty double")
        >>> ndf = NestedFrame(base).join_nested(child, "items", on="k",
        ...                                     sort_within=["qty"])
        >>> out = ndf.eval("items.rev = items.qty * 2")
        >>> [x["rev"] for x in out.df.collect()[0]["items"]]
        [20.0, 40.0]
        """
        if empty_cells not in ("null", "reference"):
            raise ValueError(
                f"empty_cells must be 'null' or 'reference', got {empty_cells!r}"
            )
        target, rhs = split_assignment(expr)
        fieldmap = self._nested_field_map()
        compiled = compile_expr(rhs, fieldmap, self._known_columns(), env)
        if compiled.reductions:
            compiled = self._bind_reductions(compiled)

        if target is None:
            if compiled.nests:
                nest = compiled.nest
                body = compiled.render("__x")
                return self._wrap(
                    self._df.select(
                        F.expr(f"transform({quote(nest)}, __x -> {body})").alias("__result")
                    )
                )
            return self._wrap(self._df.select(F.expr(compiled.render()).alias("__result")))

        if "." not in target:
            if compiled.nests:
                raise QueryCompileError(
                    f"Cannot assign nested-layer expression to base column '{target}'"
                )
            return self._wrap(self._df.withColumn(target, F.expr(compiled.render())))

        tgt_nest, tgt_field = target.split(".", 1)
        if "." in tgt_field:
            raise QueryCompileError("Only one level of nesting is supported")  # core.py:317
        if compiled.nests and compiled.nest != tgt_nest and tgt_nest in fieldmap:
            raise QueryCompileError(
                "Queries cannot target multiple structs/layers"
            )
        if (
            tgt_nest in self._pending
            and (not compiled.nests or compiled.nest == tgt_nest)
            and not compiled.base_cols
            # reference empty-cell conversion needs the materialized array
            # form; skip the flat-child pushdown for that mode
            and empty_cells == "null"
            # REPLACING a field is only safe when no earlier pushed
            # predicate/aggregate/sort could see the old value (they apply
            # to the final child at materialization, i.e. after this eval)
            and (
                tgt_field not in self._pending[tgt_nest].fields()
                or not (
                    self._pending[tgt_nest].preds
                    or self._pending[tgt_nest].aggs
                    or self._pending[tgt_nest].sort_within
                )
            )
        ):
            # pushdown: add/replace the field on the FLAT child before the
            # pack — keeps the pack pending so later query/agg pushdowns
            # still compose (e.g. eval -> nest_agg never builds an array)
            spec = self._pending[tgt_nest]
            new_child = spec.child.withColumn(tgt_field, F.expr(compiled.render_flat()))
            new_columns = spec.columns
            if new_columns is not None and tgt_field not in new_columns:
                new_columns = list(new_columns) + [tgt_field]
            new_spec = spec.replace(child=new_child, columns=new_columns)
            return NestedFrame(self._base_df, {**self._pending, tgt_nest: new_spec})
        if tgt_nest in fieldmap:
            # add/replace field inside existing nest
            src = compiled.nest or tgt_nest
            fields = nested_field_names(self._df, tgt_nest)
            body = rebuild_struct_sql(
                fields, "__x",
                override={tgt_field: compiled.render("__x")} if tgt_field in fields else None,
                extra=None if tgt_field in fields else {tgt_field: compiled.render("__x")},
            )
            tx = f"transform({quote(tgt_nest)}, __x -> {body})"
            if empty_cells == "reference":
                # NULL cell -> empty cell, as the reference's repack does;
                # coalesce coerces the untyped array() literal to the
                # transform's element type
                tx = f"coalesce({tx}, array())"
            return self._wrap(self._df.withColumn(tgt_nest, F.expr(tx)))
        # brand-new nest: RHS must reference exactly one existing nest to
        # define the packing (reference behavior: new nests align to source)
        if not compiled.nests:
            raise QueryCompileError(
                f"Cannot create new nested column '{tgt_nest}' from a base-only expression"
            )
        src = compiled.nest
        body = f"struct({compiled.render('__x')} AS {quote(tgt_field)})"
        tx = f"transform({quote(src)}, __x -> {body})"
        if empty_cells == "reference":
            tx = f"coalesce({tx}, array())"
        return self._wrap(self._df.withColumn(tgt_nest, F.expr(tx)))

    # -- cleaning ---------------------------------------------------------
    def dropna(self, subset: str | list[str] | None = None, how: str = "any",
               on_nested: str | None = None, drop_empty_cells: bool = False,
               thresh: int | None = None) -> "NestedFrame":
        """Nested-target dropna always materializes pending packs first, BY
        DESIGN: pushing the element filter onto the flat child would turn a
        cell whose elements all drop into a NULL cell (vanished group),
        where the eager path leaves an EMPTY array — and telling those
        apart afterwards would need a pre-drop presence aggregate (an extra
        shuffle) that costs more than the rewrite saves. Base-subset dropna
        with pending left-packs filters the base early like query()."""
        if self._pending and subset is not None and on_nested is None:
            subset_list = [subset] if isinstance(subset, str) else list(subset)
            pending_names = set(self._pending) | self._pending_agg_aliases()
            base_only = all(
                "." not in s and s not in pending_names and s in self.base_columns
                for s in subset_list
            )
            if base_only:
                dropped = (
                    self._base_df.na.drop(thresh=thresh, subset=subset_list)
                    if thresh is not None
                    else self._base_df.na.drop(how=how, subset=subset_list)
                )
                return NestedFrame(dropped, dict(self._pending))
        return self._wrap(
            cleaning.dropna(self._df, subset, how, on_nested, drop_empty_cells, thresh)
        )

    def _fill_pushable(self, spec: _PendingPack) -> bool:
        # a fill rewrites existing child values; anything registered earlier
        # (preds/aggs/sort) must have seen the UNfilled values — mirror the
        # eval() replace guard
        return not (spec.preds or spec.aggs or spec.sort_within)

    def fillna(self, value: object | dict[str, object]) -> "NestedFrame":
        if not self._pending:
            return self._wrap(cleaning.fillna(self._df, value))
        if isinstance(value, dict):
            per_pending: dict[str, dict[str, object]] = {}
            rest: dict[str, object] = {}
            for k, v in value.items():
                nest = k.split(".", 1)[0] if "." in k else None
                if nest is not None and nest in self._pending:
                    per_pending.setdefault(nest, {})[k.split(".", 1)[1]] = v
                else:
                    rest[k] = v
            if (
                per_pending
                and not (set(rest) & self._pending_agg_aliases())
                and all(self._fill_pushable(self._pending[n]) for n in per_pending)
            ):
                # push fills onto the flat children: value-level rewrite
                # before the pack, keeps every later pushdown composing
                pending = dict(self._pending)
                for nest, fills in per_pending.items():
                    spec = pending[nest]
                    child = spec.child
                    for f, v in fills.items():
                        if f in spec.fields():
                            child = child.withColumn(
                                f,
                                F.expr(f"coalesce({quote(f)}, {_sql_literal(v)})"),
                            )
                    pending[nest] = spec.replace(child=child)
                base = cleaning.fillna(self._base_df, rest) if rest else self._base_df
                return NestedFrame(base, pending)
            return self._wrap(cleaning.fillna(self._df, value))
        # scalar fill targets every layer; push into each pending child when
        # program order allows, else materialize
        if all(self._fill_pushable(s) for s in self._pending.values()):
            pending = {}
            for nest, spec in self._pending.items():
                child = spec.child
                for f in spec.fields():
                    child = child.withColumn(
                        f, F.expr(f"coalesce({quote(f)}, {_sql_literal(value)})")
                    )
                pending[nest] = spec.replace(child=child)
            return NestedFrame(cleaning.fillna(self._base_df, value), pending)
        return self._wrap(cleaning.fillna(self._df, value))

    # -- aggregation ------------------------------------------------------
    def count_nested(self, nest: str, by: str | None = None,
                     values: list[str] | None = None, join: bool = True,
                     max_values: int | None = None,
                     dropna: bool = False) -> "NestedFrame":
        if nest in self._pending and join:
            # compute counts in the pack's own groupBy (collect_list prunes
            # away if the array itself is never consumed downstream)
            spec = self._pending[nest]
            if by is None:
                spec = spec.with_agg(f"n_{nest}", "count(*)", True)
            else:
                if by not in spec.fields():
                    raise KeyError(f"Nested column '{nest}' has no field '{by}'")
                if values is None:
                    # discover on the pred-filtered child so the zero-filled
                    # column set matches the eager (post-filter) path
                    disc = spec.child
                    if spec.preds:
                        disc = disc.where(" AND ".join(f"({p})" for p in spec.preds))
                    values = aggregates.discover_values(
                        disc, F.col(quote(by)),
                        f"count_nested(by={by!r})", max_values,
                        on_null="ignore" if dropna else "raise",
                    )
                for v in values:
                    lit = _sql_literal(str(v))
                    spec = spec.with_agg(
                        f"n_{nest}_{v}",
                        f"count(CASE WHEN {quote(by)} = {lit} THEN 1 END)",
                        True,
                    )
            return NestedFrame(self._base_df, {**self._pending, nest: spec})
        return self._wrap(aggregates.count_nested(
            self._df, nest, by, values, join, max_values=max_values,
            dropna=dropna))

    def min(self, columns: list[str] | None = None,
            exclude_nest: bool = False) -> DataFrame:
        return aggregates.minmax(self._df, "min", columns, exclude_nest)

    def max(self, columns: list[str] | None = None,
            exclude_nest: bool = False) -> DataFrame:
        return aggregates.minmax(self._df, "max", columns, exclude_nest)

    def describe(self, columns: list[str] | None = None, exact: bool = True,
                 percentiles: list[float] | None = None,
                 exclude_nest: bool = False) -> DataFrame:
        return aggregates.describe(self._df, columns, exact, percentiles, exclude_nest)

    def groupby(self, keys: str | list[str]):
        """Grouped operations on base-column keys (reference groupby
        tutorial, ``docs/tutorials/groupby_doc.ipynb``): ``count`` /
        ``describe`` / ``apply`` match the pandas behaviors; ``min`` /
        ``max`` / ``mean`` raise TypeError on nested columns exactly as
        pandas does, with ``agg({'nest.field': 'mean'})`` as the
        Spark-first alternative that aggregates flat elements per group
        WITHOUT exploding (per-row HOF partials in one group agg).
        """
        from ..operators.groupby import NestedGroupBy

        return NestedGroupBy(self, keys)

    def profile(self, columns: list[str] | None = None,
                exact: bool = True) -> DataFrame:
        """Per-column (dtype, rows, nulls, distinct) in one aggregation
        pass — see :func:`operators.aggregates.profile`."""
        return aggregates.profile(self._df, columns, exact)

    def rebin(self, nest: str, time_field: str, width, **kw) -> "NestedFrame":
        """Per-cell fixed-width time binning — see
        :func:`operators.timeseries.rebin`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.rebin(self.df, nest, time_field, width, **kw))

    def phase_fold(self, nest: str, time_field: str, period, **kw) -> "NestedFrame":
        """Per-element phase folding — see
        :func:`operators.timeseries.phase_fold`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.phase_fold(self.df, nest, time_field, period, **kw))

    def nest_diff(self, nest: str, field: str, **kw) -> "NestedFrame":
        """Per-cell consecutive deltas — see
        :func:`operators.timeseries.nest_diff`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.nest_diff(self.df, nest, field, **kw))

    def nest_rolling(self, nest: str, field: str, window: int, **kw) -> "NestedFrame":
        """Per-cell trailing rolling stat — see
        :func:`operators.timeseries.nest_rolling`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.nest_rolling(self.df, nest, field, window, **kw))

    def sigma_clip(self, nest: str, field: str, sigma: float = 3.0, **kw) -> "NestedFrame":
        """Per-cell outlier rejection — see
        :func:`operators.timeseries.sigma_clip`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.sigma_clip(self.df, nest, field, sigma, **kw))

    def trend_slope(self, nest: str, time_field: str, value_field: str,
                    **kw) -> "NestedFrame":
        """Per-cell OLS slope — see
        :func:`operators.timeseries.trend_slope`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.trend_slope(self.df, nest, time_field, value_field, **kw)
        )

    def periodogram(self, nest: str, time_field: str, value_field: str,
                    freqs, **kw) -> "NestedFrame":
        """Per-cell Lomb-Scargle periodogram — see
        :func:`operators.timeseries.periodogram`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.periodogram(self.df, nest, time_field, value_field,
                                   freqs, **kw)
        )

    def stetson_jk(self, nest: str, time_field: str, value_field: str,
                   **kw) -> "NestedFrame":
        """Per-cell Stetson J/K variability indices — see
        :func:`operators.timeseries.stetson_jk`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.stetson_jk(self.df, nest, time_field, value_field, **kw)
        )

    def nest_acf(self, nest: str, time_field: str, value_field: str,
                 lags, **kw) -> "NestedFrame":
        """Per-cell autocorrelation at index lags — see
        :func:`operators.timeseries.nest_acf`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.nest_acf(self.df, nest, time_field, value_field,
                                lags, **kw)
        )

    def structure_function(self, nest: str, time_field: str,
                           value_field: str, width, **kw) -> "NestedFrame":
        """Per-cell first-order structure function — see
        :func:`operators.timeseries.structure_function`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.structure_function(self.df, nest, time_field,
                                          value_field, width, **kw)
        )

    def theil_sen(self, nest: str, time_field: str, value_field: str,
                  **kw) -> "NestedFrame":
        """Per-cell Theil-Sen robust slope — see
        :func:`operators.timeseries.theil_sen`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.theil_sen(self.df, nest, time_field, value_field, **kw)
        )

    def lightcurve_features(self, nest: str, time_field: str,
                            value_field: str, **kw) -> "NestedFrame":
        """Per-cell variability feature vector — see
        :func:`operators.timeseries.lightcurve_features`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.lightcurve_features(self.df, nest, time_field,
                                           value_field, **kw)
        )

    def nest_align(self, left_nest: str, right_nest: str, time_field: str,
                   value_field: str, **kw) -> "NestedFrame":
        """Per-cell nearest-time alignment of two nested series — see
        :func:`operators.timeseries.nest_align`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.nest_align(self.df, left_nest, right_nest,
                                  time_field, value_field, **kw)
        )

    def nest_zscore(self, nest: str, field: str, **kw) -> "NestedFrame":
        """Per-cell z-score — see
        :func:`operators.timeseries.nest_zscore`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.nest_zscore(self.df, nest, field, **kw))

    def nest_topk(self, nest: str, field: str, k: int, **kw) -> "NestedFrame":
        """Per-cell k extreme elements — see
        :func:`operators.timeseries.nest_topk`."""
        from ..operators import timeseries

        return NestedFrame(timeseries.nest_topk(self.df, nest, field, k, **kw))

    def nest_wmean(self, nest: str, value_field: str, error_field: str,
                   **kw) -> "NestedFrame":
        """Per-cell inverse-variance weighted mean — see
        :func:`operators.timeseries.nest_wmean`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.nest_wmean(self.df, nest, value_field, error_field, **kw)
        )

    def nest_interp(self, nest: str, time_field: str, value_field: str,
                    grid: list, **kw) -> "NestedFrame":
        """Per-cell linear interpolation onto ``grid`` — see
        :func:`operators.timeseries.nest_interp`."""
        from ..operators import timeseries

        return NestedFrame(
            timeseries.nest_interp(self.df, nest, time_field, value_field, grid, **kw)
        )

    def value_counts(self, column: str, **kw) -> DataFrame:
        """Frequency table of a base or dotted nested column — see
        :func:`operators.aggregates.value_counts`."""
        return aggregates.value_counts(self.df, column, **kw)

    def histogram(self, column: str, bins: int = 10, **kw) -> DataFrame:
        """Equal-width histogram — see
        :func:`operators.aggregates.histogram`."""
        return aggregates.histogram(self.df, column, bins, **kw)

    def nest_agg(self, nest: str, field: str, how: str, alias: str | None = None) -> "NestedFrame":
        name = alias or f"{how}_{nest}_{field}"
        if nest in self._pending:
            spec = self._pending[nest]
            if field not in spec.fields():
                raise KeyError(f"Nested column '{nest}' has no field '{field}'")
            # child-side aggregate semantics matched to the post-pack HOFs:
            # HOF sum treats an existing cell's nulls as 0 (coalesce inside
            # the group); missing groups stay NULL via the left join.
            agg_sql = {
                "sum": f"coalesce(sum({quote(field)}), CAST(0.0 AS DOUBLE))",
                "mean": f"avg({quote(field)})",
                "min": f"min({quote(field)})",
                "max": f"max({quote(field)})",
                "count": "count(*)",
                "n_distinct": f"count(DISTINCT {quote(field)})",
            }.get(how)
            if agg_sql is None:
                # reductions with no shuffle-side equivalent (first/last
                # depend on cell order; any/all differ from bool_or/bool_and
                # on NULL elements): materialize the pack, use the per-cell
                # HOF. Unknown reductions raise inside aggregates.nest_agg.
                col = aggregates.nest_agg(self._df, nest, field, how, alias)
                return self._wrap(self._df.withColumn(name, col))
            # no zero-fill: the eager path's size(NULL cell) is NULL too
            spec = spec.with_agg(name, agg_sql, False)
            return NestedFrame(self._base_df, {**self._pending, nest: spec})
        col = aggregates.nest_agg(self._df, nest, field, how, alias)
        return self._wrap(self._df.withColumn(name, col))

    # -- sorting ----------------------------------------------------------
    def sort_values(self, by: str | list[str], ascending: bool | list[bool] = True,
                    na_position: str = "last") -> "NestedFrame":
        keys = [by] if isinstance(by, str) else list(by)
        ascs = [ascending] * len(keys) if isinstance(ascending, bool) else list(ascending)
        nests = {k.split(".", 1)[0] for k in keys if "." in k}
        if len(nests) == 1 and (nest := next(iter(nests))) in self._pending and all(
            "." in k and k.split(".", 1)[0] == nest for k in keys
        ):
            # push the element sort into the pack's own sort_within
            spec = self._pending[nest]
            fields = spec.fields()
            sort_keys = []
            for k, asc in zip(keys, ascs):
                fld = k.split(".", 1)[1]
                if fld not in fields:
                    raise KeyError(f"Nested column '{nest}' has no field '{fld}'")
                sort_keys.append((fld, asc))
            new_spec = spec.replace(sort_within=sort_keys)
            return NestedFrame(self._base_df, {**self._pending, nest: new_spec})
        return self._wrap(sorting.sort_values(self._df, by, ascending, na_position))

    # -- UDF --------------------------------------------------------------
    def map_rows(self, func: Callable, columns: list[str], *args: Any, **kwargs: Any):
        from ..operators.map_rows import map_rows as _map_rows

        return NestedFrame(_map_rows(self._df, func, columns, *args, **kwargs))

    def reduce(
        self,
        func: Callable,
        *args: str,
        infer_nesting: bool = True,
        append_columns: bool = False,
        **kwargs: Any,
    ) -> "NestedFrame":
        """Reference-signature UDF verb (reference ``core.py:1981-2008``):
        positional args are COLUMN NAMES (base name -> scalar per row,
        ``"nest.field"`` -> numpy array per cell); extra function arguments
        go as keywords. Thin shim over :meth:`map_rows`, which takes the
        same selectors as a list."""
        bad = [a for a in args if not isinstance(a, str)]
        if bad:
            raise TypeError(
                "reduce positional arguments must be column-name strings "
                f"(got {bad[0]!r}); pass function arguments as keywords"
            )
        return self.map_rows(
            func, list(args), infer_nesting=infer_nesting,
            append_columns=append_columns, **kwargs,
        )

    # -- I/O ----------------------------------------------------------------
    def to_parquet(self, path: str, mode: str = "overwrite",
                   partition_by: str | list[str] | None = None,
                   layout: str = "list_struct",
                   **options: Any) -> None:
        """Write parquet; nested columns store natively as list-of-structs by
        default. ``layout="struct_of_lists"`` writes the reference's on-disk
        layout instead (``core.py:2586-2631``) — the file then loads directly
        into a reference ``NestedFrame`` via its ``read_parquet``, and this
        engine's ``read_parquet`` auto-casts it back, so either engine reads
        either layout.

        ``partition_by``: hive-style directory partitioning — reads that
        filter on these columns prune whole directories before any I/O
        (``PartitionFilters`` in the scan), the first lever for 100 TB
        layouts. For shuffle-free repacking on the join key, use
        ``sources.bucketing`` (bucketBy needs a table catalog, not a bare
        path).
        """
        from .io import write_parquet as _write_parquet

        _write_parquet(self._df, path, mode=mode, partition_by=partition_by,
                       layout=layout, **options)
