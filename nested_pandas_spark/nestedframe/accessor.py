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

    def with_field(self, name: str, expr: str):
        """``set_flat_column``-style sub-column add/replace
        (reference ``accessor.py:305-491``)."""
        return self._frame.set_nested_field(f"{self._col}.{name}", expr)

    def drop(self, fields: str | list[str]):
        """Reference ``accessor.py:528-562``."""
        flds = [fields] if isinstance(fields, str) else list(fields)
        return self._frame.drop([f"{self._col}.{f}" for f in flds])

    def len(self) -> Column:
        """Per-row element count (reference ``accessor.py:168-175``)."""
        return F.size(F.col(self._col)).alias(f"n_{self._col}")

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

    def to_flatten_inner(self, inner: str):
        """Reference ``accessor.py:859-986``."""
        return self._frame.to_flatten_inner(self._col, inner)

    def __getitem__(self, fields: str | list[str]):
        if isinstance(fields, str):
            return self._frame[f"{self._col}.{fields}"]
        return self._frame.select_nested_fields(self._col, fields)
