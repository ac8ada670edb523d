"""Plan observability: summarize the scale-relevant features of a query's
physical plan so "will this survive 100x?" is a one-call check instead of
reading `explain` output by eye.

The counters are the ones that matter at cluster scale: exchanges
(shuffles) dominate cost; broadcast joins mean a dimension stayed small;
pushed filters / partition filters mean the scan skips data; whole-stage
codegen spans mean expressions run fused in the JVM; cartesian products
and row-at-a-time Python UDFs are almost always mistakes in a hot path.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = ["explain_text", "plan_summary"]


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Counts of scale-relevant physical-plan features.

    Keys: ``exchanges`` (shuffle boundaries), ``broadcasts`` (broadcast
    joins/exchanges), ``scans``, ``pushed_filters`` (scans with non-empty
    parquet PushedFilters), ``partition_filters`` (scans with non-empty
    PartitionFilters), ``codegen_stages`` (whole-stage codegen spans),
    ``cartesian`` (CartesianProduct / BroadcastNestedLoopJoin — red flag),
    ``python_evals`` (BatchEvalPython = row-at-a-time Python — red flag;
    Arrow-batched pandas UDFs show as ArrowEvalPython/MapInArrow and are
    counted under ``arrow_evals``).

    Example (a packed count is one shuffle, no red flags):

    >>> df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    >>> from nested_pandas_spark.operators.packer import pack
    >>> s = plan_summary(pack(df, "items", on="k"))
    >>> s["cartesian"], s["python_evals"]
    (0, 0)
    """
    p = explain_text(df, "formatted")
    simple = explain_text(df, "simple")

    def count(pattern: str, text: str = p) -> int:
        return len(re.findall(pattern, text))

    scans = count(r"Scan parquet|FileScan|BatchScan|Scan ExistingRDD")
    pushed = len([
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", p) if m.strip()
    ])
    part = len([
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
        if m.strip()
    ])
    codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", simple)))
    # NOTE: \bExchange\b does NOT match "BroadcastExchange" (no word
    # boundary inside the identifier), so this counts shuffle exchanges only
    return {
        "exchanges": count(r"\bExchange\b"),
        "broadcasts": count(r"BroadcastExchange|BroadcastHashJoin"),
        "scans": scans,
        "pushed_filters": pushed,
        "partition_filters": part,
        "codegen_stages": codegen,
        "cartesian": count(r"CartesianProduct|BroadcastNestedLoopJoin"),
        "python_evals": count(r"BatchEvalPython"),
        "arrow_evals": count(r"ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas"),
    }
