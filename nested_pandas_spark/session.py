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
        # parallelism FLOOR for splittable scans: when a table is small
        # relative to the cluster (one 11 MB parquet on 32 cores = 3
        # scan tasks under the default maxPartitionBytes/openCost alone,
        # so the whole scan->shuffle-write runs 3-wide), ask for at
        # least one split per core. minPartitionNum scales with CLUSTER
        # size, not data size; openCostInBytes must drop with it or its
        # 4 MB floor re-caps the split size (maxSplitBytes =
        # min(maxPartitionBytes, max(openCost, bytes/minPartitionNum))).
        # Both are no-ops at 100 TB — size-based splitting already
        # yields orders of magnitude more partitions than cores and the
        # 128 MB cap dominates; they only widen the small-input case.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
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
