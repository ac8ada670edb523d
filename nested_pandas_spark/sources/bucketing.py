"""Bucketed storage for shuffle-free packing and co-located joins.

At 100 TB the dominant cost of ``join_nested`` is shuffling the child table
on the join key. If the child is WRITTEN bucketed by that key (Spark
``bucketBy`` + ``sortBy``), the ``groupBy(key).agg(collect_list(...))`` and
the subsequent equi-join read pre-partitioned data: no exchange at query
time, for every query that packs or joins on the bucket key. This is the
Spark analogue of the reference's "index is already sorted" fast path
(``series/packer.py:98-99``) — the sort/partition cost is paid once at
ingest instead of per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    Bucketed tables must be saved through the catalog (``saveAsTable``);
    pass ``path`` for an external table location.
    """
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort_by:
        sort_keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)
