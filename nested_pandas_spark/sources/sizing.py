"""Right-sized parquet output — the small-files / giant-files guard.

Beyond-reference (the reference, ``/root/reference/src/nested_pandas``,
writes single local files): at cluster scale the dominant sink mistake
is writing one parquet file per shuffle partition — 10⁵ tiny files
murder the downstream scan (driver-side listing, per-file open cost,
no row-group parallelism), while too few giant files serialize the
write. The standard recipe sizes the partition count from measured
bytes-per-row, not guesses.

``write_sized_parquet`` measures compressed bytes/row by writing a
bounded sample (compression-aware — schema-based estimates are off by
the codec ratio), computes ``ceil(total_bytes / target)`` partitions,
and writes with a round-robin ``repartition`` (uniform file sizes).
Costs one extra bounded sample write + one count; at 100 TB that is
noise next to the write itself, and the repartition shuffle replaces
the skewed-output alternative.
"""

from __future__ import annotations

import math
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["estimate_bytes_per_row", "write_sized_parquet"]


def _fs_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under ``path`` via the Hadoop FileSystem API.

    Works for whatever filesystem the path resolves to (local, HDFS,
    S3A, ...) — unlike a driver-local ``os.walk``, which silently
    returns 0 on any deployment where the default FS is not the
    driver's disk, collapsing the sizing decision to one giant file.
    Skips metadata files (``_SUCCESS``, hidden/checksum files).
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            total += st.getLen()
    return int(total)


def _fs_rm(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    fs.delete(p, True)


def estimate_bytes_per_row(
    df: DataFrame, sample_rows: int = 10_000, compression: str = "snappy"
) -> float:
    """Measured compressed parquet bytes per row of ``df``.

    Writes ``sample_rows`` rows to a temp dir and measures the files —
    the only honest estimator under columnar compression (dictionary/
    RLE make schema-based guesses wrong by 5-50x). Returns 0.0 for an
    empty frame.
    """
    spark = df.sparkSession
    tmp = os.path.join(tempfile.gettempdir(), f"__sizing_{uuid.uuid4().hex}")
    try:
        sample = df.limit(int(sample_rows)).coalesce(1)
        sample.write.mode("overwrite").option(
            "compression", compression
        ).parquet(tmp)
        n = spark.read.parquet(tmp).count()
        if n == 0:
            return 0.0
        measured = _fs_bytes(spark, tmp)
        if measured == 0:
            # A non-empty parquet write can never be 0 bytes; a zero
            # here means the measurement path is wrong (e.g. looking at
            # the wrong filesystem). Failing loudly beats silently
            # funneling the whole dataset into one file.
            raise RuntimeError(
                f"sizing sample wrote {n} rows to {tmp} but the "
                "filesystem reports 0 data bytes — bytes-per-row "
                "measurement failed; refusing to size the output"
            )
        return measured / n
    finally:
        try:
            _fs_rm(spark, tmp)
        except Exception:
            pass


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 512,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
    compression: str = "snappy",
    partition_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as parquet with files sized ~``target_mb`` each.

    Returns the sizing decision: ``{"rows", "bytes_per_row",
    "est_total_mb", "n_files"}``. With ``partition_by`` the file count
    is per directory tree (round-robin within partitions keeps sizes
    uniform; a skew-heavy partition column still dominates its own
    directory — that is a data property, not a sink bug).
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be > 0, got {target_mb}")
    rows = df.count()
    bpr = estimate_bytes_per_row(df, sample_rows, compression) if rows else 0.0
    est_total = rows * bpr
    n_files = max(1, math.ceil(est_total / (target_mb * 1024 * 1024)))
    writer = (
        df.repartition(n_files)
        .write.mode(mode)
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return {
        "rows": rows,
        "bytes_per_row": round(bpr, 2),
        "est_total_mb": round(est_total / (1024 * 1024), 3),
        "n_files": n_files,
    }
