"""``.nest`` accessor: series-level API parity.

Reference users write ``series.nest.to_flat()`` / ``.nest.query(...)``
(``src/nested_pandas/series/accessor.py``); here the same surface hangs off
``NestedFrame.nest("column")`` so code reads almost unchanged. Every method
delegates to the frame-level operators (and therefore inherits the lazy-pack
pushdowns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["NestAccessor"]


class NestAccessor:
    """Bound view of one nested column of a NestedFrame."""

    def __init__(self, frame, column: str):
        if column not in frame.nested_columns:
            raise KeyError(f"'{column}' is not a nested column")
        self._frame = frame
        self._col = column

    @property
    def fields(self) -> list[str]:
        """Sub-column names (reference ``accessor.py`` ``.nest.fields``)."""
        return self._frame.nested_fields(self._col)

    @property
    def columns(self) -> list[str]:
        """Alias of :attr:`fields` (reference ``accessor.py:186-189``)."""
        return self.fields

    def to_flat(self, columns: list[str] | None = None):
        """Reference ``accessor.py:93-157``."""
        return self._frame.to_flat(self._col, columns=columns)

    def to_lists(self, columns: list[str] | None = None):
        """Reference ``accessor.py:44-91``."""
        return self._frame.to_lists(self._col, columns=columns)

    def query(self, expr: str, env: dict | None = None):
        """Series-level query: drops rows whose cell empties
        (reference ``accessor.py:600-638``)."""
        return self._frame.query_drop_empty(expr, env=env)

    def query_flat(self, expr: str, env: dict | None = None):
        """Alias of :meth:`query` (reference ``accessor.py:568-598``)."""
        return self.query(expr, env=env)

    def with_field(self, name: str, expr: str):
        """Sub-column add/replace from an expression over this nest's fields
        and base columns (reference ``accessor.py:203-491`` ``with_field`` /
        ``with_flat_field`` / ``with_filled_field`` — in the expression-based
        model a flat value, a broadcast base value, and a computed value are
        all the same ``transform`` rebuild, so one method covers the family)."""
        return self._frame.set_nested_field(f"{self._col}.{name}", expr)

    # reference with_*/set_* family: identical semantics here (see with_field)
    # — including the list variants (accessor.py:343-411 with_list_field /
    # set_list_column): a Column value is a per-row array<T> zipped in by
    # position, which IS the list-field contract.
    with_flat_field = with_field
    with_filled_field = with_field
    with_list_field = with_field
    set_column = with_field
    set_flat_column = with_field
    set_filled_column = with_field
    set_list_column = with_field

    def get_flat_series(self, field: str, keys: list[str] | None = None) -> DataFrame:
        """One field's flat values with the parent keys repeated (reference
        ``accessor.py:669-724`` returns an index-repeated pd.Series; the
        keys-as-index model returns the (keys, field) DataFrame)."""
        if field not in self.fields:
            raise KeyError(f"'{self._col}' has no field '{field}'")
        return self._frame.to_flat(self._col, columns=[field], keys=keys).df

    def get_list_series(self, field: str) -> DataFrame:
        """One field as a per-row list column (reference
        ``accessor.py:726-780``)."""
        if field not in self.fields:
            raise KeyError(f"'{self._col}' has no field '{field}'")
        return self._frame.to_lists(self._col, columns=[field]).df

    def drop(self, fields: str | list[str]):
        """Reference ``accessor.py:528-562``."""
        flds = [fields] if isinstance(fields, str) else list(fields)
        return self._frame.drop([f"{self._col}.{f}" for f in flds])

    def without_field(self, fields: str | list[str]):
        """Alias of :meth:`drop` (reference ``accessor.py:497-526``)."""
        return self.drop(fields)

    def clear(self) -> None:
        """Reference parity (``accessor.py:852-857``): deleting every field
        of a nested column is not a meaningful operation — always raises."""
        raise NotImplementedError("Cannot delete fields from nested series")

    def len(self) -> Column:
        """Per-row element count (reference ``accessor.py:168-175``)."""
        return F.size(F.col(self._col)).alias(f"n_{self._col}")

    # reference accessor.py:164-175 ``list_lengths``: same per-row counts
    list_lengths = len

    def flat_length(self) -> int:
        """Total element count across all rows (reference
        ``ext_array.py:1002-1014``)."""
        row = self._frame.df.select(
            F.sum(F.coalesce(F.size(self._col), F.lit(0)))
        ).collect()[0]
        return int(row[0] or 0)

    def flat_index(self, keys: list[str] | None = None) -> DataFrame:
        """The parent identity repeated once per nested element (reference
        ``accessor.py:192-197`` ``nest.flat_index``, a ``pd.Index``).

        In the keys-as-index model the "index" is the base key column(s), so
        this returns a DataFrame of those columns with one row per element.
        ``keys`` defaults to every base (non-nested) column; pass the actual
        key subset for a narrower result. NULL/empty cells contribute no
        rows, exactly like the reference's flattened index.
        """
        key_cols = keys if keys is not None else self._frame.base_columns
        df = self._frame.to_flat(self._col, columns=self.fields[:1], keys=key_cols).df
        return df.select(*[F.col(c) for c in key_cols])

    # reference accessor.py:644-650 ``get_flat_index()``: method form
    get_flat_index = flat_index

    def to_flatten_inner(self, inner: str):
        """Reference ``accessor.py:859-986``."""
        return self._frame.to_flatten_inner(self._col, inner)

    def __getitem__(self, fields: str | list[str]):
        if isinstance(fields, str):
            return self._frame[f"{self._col}.{fields}"]
        return self._frame.select_nested_fields(self._col, fields)

    def __setitem__(self, field: str, value) -> None:
        """``ndf.nest("n")["x"] = ...`` — in-place sub-column assignment
        (reference ``accessor.py:803-851``); mutates the bound frame."""
        self._frame[f"{self._col}.{field}"] = value
