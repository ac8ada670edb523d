"""Z-order (Morton) clustering for multi-column data skipping.

Hive-style ``partition_by`` prunes on ONE column hierarchy; sorting the
file layout by a Morton interleave of several columns gives parquet
row-group min/max statistics locality in ALL of them at once, so scans
filtered on any interleaved column skip most row groups. This is the
standard lakehouse layout trick (Delta/Iceberg ``ZORDER BY``), expressed
here with nothing but built-in bit arithmetic — the z-value is a plain
column expression, so it stays in whole-stage codegen and any engine
(the DuckDB oracle included) computes the identical value.

Scale shape: ``write_zordered`` is one range shuffle on the z-value (the
same cost as any global sort) paid once at ingest; every later filtered
scan gets row-group pruning for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_sql", "write_zordered"]


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each column.

    Columns are masked to their low bits first (so negative values
    contribute their two's-complement low bits, identically in any
    engine), then bit ``b`` of column ``i`` lands at output position
    ``b * n_cols + i``. With the default 16 bits over 2 columns the
    z-value fits in 32 bits; ``bits * n_cols`` must stay <= 63.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits * n_cols = {bits * n} exceeds 63")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit(mask)
        )
        for b in range(bits):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + ci)
    return z


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The same Morton interleave as :func:`zorder_value`, as an ANSI-SQL
    expression string (runs unchanged on Spark SQL and DuckDB — used by
    the q46 oracle)."""
    n = len(cols)
    mask = (1 << bits) - 1
    # every term fully parenthesized: SQL gives `+` higher precedence
    # than `<<`, so a bare `x << 5 + y << 3` would parse as x << (5+y) << 3
    terms = [
        f"(((({c} & {mask}) >> {b}) & 1) << {b * n + ci})"
        for ci, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    mode: str = "overwrite",
    **options,
) -> None:
    """Write parquet clustered by the Morton order of ``cols``: range
    partition on the z-value (one shuffle), sort within partitions, drop
    the helper column. Filtered reads on ANY of ``cols`` then skip row
    groups via parquet min/max stats."""
    spark = df.sparkSession
    from ..session import default_parallelism

    par = default_parallelism(spark)
    out = (
        df.withColumn("__z", zorder_value(cols, bits))
        .repartitionByRange(max(par, 2), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).options(**options).parquet(path)
