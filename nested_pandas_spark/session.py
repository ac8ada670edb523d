"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-planning, skew-join handling), Arrow on (fast pandas UDF
path), UTC session timezone (oracle parity), shuffle partitions sized
to the parallelism instead of the 200 default.

At 100 TB these same knobs matter: AQE coalesces post-shuffle
partitions and splits skewed ones; ``spark.sql.files.maxPartitionBytes``
keeps scan tasks bounded; nested-schema pruning keeps parquet reads of
``array<struct>`` columns down to the referenced leaves.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "nested-pandas-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # NOTE (round 11): round 10 floored scan parallelism here
        # (files.minPartitionNum = cores, openCostInBytes = 512 KiB) so
        # small-relative-to-cluster tables fanned out to ~one split per
        # core. The driver's round-10 32-core bench regressed ~21%
        # geomean against round 9 across DOZENS of small-input queries
        # (untouched zero-shuffle ones included) while its 8-core run
        # was healthy — a cluster-wide floor multiplies every tiny scan
        # into `cores` near-empty tasks, and on a contended host that
        # scheduling tax dwarfs the work. REVERTED: operators whose
        # per-row work is heavy enough to justify widening a tiny scan
        # (codecs, register hashing, shingling) apply the data-aware
        # `_ensure_parallelism` rescue at their own boundary instead
        # (pipeline/dedup.py), sized by input bytes, not cluster width.
        # At 100 TB both choices are identical no-ops: size-based
        # splitting already yields far more splits than cores.
        # session contract: parquet TIMESTAMP(NANOS) columns (one testdata
        # layout of events.ts) read as int64 nanos instead of erroring.
        # Set HERE, at session build, never inside an operator — flipping it
        # mid-session would retype every later parquet read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    try:
        spark.sparkContext.setLogLevel("WARN")
    except Exception:  # Spark Connect: no sparkContext on the client
        pass
    return spark


def default_parallelism(spark: SparkSession) -> int:
    """Cluster parallelism, Spark-Connect-safe.

    Classic sessions report ``sparkContext.defaultParallelism``; Connect
    sessions have no SparkContext, so fall back to the session's shuffle
    partition count (the same knob every wide operator in this package
    sizes against).
    """
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the client
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
