"""Plan-shape assertions: the optimizations this engine promises must be
visible in the physical plan, not just fast by accident.

These tests guard the PendingPack rewrite rules (plans/lazy_pack.py) and the
Catalyst behaviors the design relies on.
"""

import pytest

from nested_pandas_spark import NestedFrame
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pending(spark, objects, sources):
    return NestedFrame(objects).join_nested(sources, "nested", on="id")


def test_count_only_prunes_collect_list(pending):
    out = pending.count_nested("nested").df.select("id", "n_nested")
    assert "collect_list" not in _plan(out)


def test_agg_only_prunes_collect_list(pending):
    out = pending.nest_agg("nested", "flux", "mean", alias="m").df.select("id", "m")
    plan = _plan(out)
    assert "collect_list" not in plan
    assert "avg(flux" in plan


def test_array_use_keeps_collect_list(pending):
    out = pending.count_nested("nested").df.select("id", "n_nested", F.size("nested"))
    assert "collect_list" in _plan(out)


def test_element_filter_below_aggregate(pending):
    import re

    out = pending.query("nested.flux > 5.0")
    assert re.search(r"flux#\d+ > 5\.0", _plan(out.df))


def test_base_filter_before_join(pending):
    plan = _plan(pending.query("a > 0.5").df)
    # the base filter must appear on the scan side, not above the join:
    # locate the Filter on column `a` and check it sits under the join
    lines = plan.splitlines()
    join_idx = next(i for i, l in enumerate(lines) if "Join" in l)
    filt_idx = next(i for i, l in enumerate(lines) if "Filter" in l and "a#" in l)
    assert filt_idx > join_idx  # deeper in the printed tree = below the join


def test_flatten_skips_aggregation(pending):
    out = pending.to_flat("nested")
    plan = _plan(out.df)
    assert "collect_list" not in plan
    assert "Join" in plan


def test_narrowed_fields_not_packed(pending):
    out = pending.select_nested_fields("nested", ["t"])
    agg_lines = [l for l in _plan(out.df).splitlines() if "collect_list" in l]
    assert agg_lines and all("flux" not in l for l in agg_lines)


def test_single_shuffle_for_pack(spark, objects, sources):
    """The child shuffles exactly once: aggregation exchange; join reuses it
    (or broadcasts)."""
    out = NestedFrame(objects).join_nested(sources, "nested", on="id").df
    plan = _plan(out)
    # at most: one child exchange + one base exchange (sort-merge) or a
    # broadcast exchange; never two child-side hash exchanges
    assert plan.count("Exchange hashpartitioning") <= 2


def test_eval_pushdown_keeps_pack_pending(pending):
    """eval on a pending nest adds the field to the flat child; a following
    reduce then computes in the pack's groupBy with collect_list pruned."""
    out = pending.eval("nested.double_flux = nested.flux * 2")
    reduced = out.nest_agg("nested", "double_flux", "sum", alias="s")
    plan = _plan(reduced.df.select("id", "s"))
    assert "collect_list" not in plan
    rows = {r["id"]: r["s"] for r in reduced.df.select("id", "s").collect()}
    assert rows[0] == pytest.approx(2 * (0.0 + 1.0 + 2.0))


def test_eval_replace_guard(pending):
    """Replacing a field after a pushed predicate must NOT reorder: the
    eager path takes over and results stay correct."""
    q = pending.query("nested.flux > 1.0")
    replaced = q.eval("nested.flux = nested.flux * 0")
    rows = {r["id"]: r["nested"] for r in replaced.df.collect()}
    # elements were filtered on the ORIGINAL flux, then zeroed
    assert rows[0] is not None and len(rows[0]) == 1
    assert rows[0][0]["flux"] == 0.0


def test_sort_pushdown_into_pack(pending):
    out = pending.sort_values("nested.flux", ascending=False)
    # the sort landed in the pending spec (applied inside the pack), and the
    # pack stays deferred for further pushdowns
    assert out._pending["nested"].sort_within == [("flux", False)]
    rows = {r["id"]: [e["flux"] for e in r["nested"]] for r in out.df.collect()}
    assert rows[0] == [2.0, 1.0, 0.0]


def test_zorder_value_matches_python_morton(spark):
    from nested_pandas_spark.sources.zorder import zorder_sql, zorder_value

    def morton(x, y, bits=16):
        m = (1 << bits) - 1
        x, y = x & m, y & m
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (-1, 7), (40000, 123)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r["z"]
        for r in df.select(zorder_value(["x", "y"]).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    want = [morton(x, y) for x, y in sorted(rows)]
    assert got == want
    # the SQL-string form computes the identical value
    got_sql = [
        r["z"]
        for r in df.selectExpr(f"{zorder_sql(['x', 'y'])} AS z", "x", "y")
        .orderBy("x", "y")
        .collect()
    ]
    assert got_sql == want


def test_write_zordered_skips_row_groups(spark, tmp_path):
    """Z-ordered layout: a point filter on either interleaved column must
    touch a minority of parquet row groups (min/max pruning evidence)."""
    import glob

    import pyarrow.parquet as pq

    from nested_pandas_spark.sources.zorder import write_zordered

    df = spark.range(0, 40000).select(
        (F.col("id") % 200).alias("a"),
        (F.col("id") / 200).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z")
    write_zordered(
        df, path, ["a", "b"], bits=8,
        **{"parquet.block.size": "65536"},
    )
    spans = []  # (a_min, a_max, b_min, b_max) per row group
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            cols = {
                md.row_group(rg).column(i).path_in_schema:
                    md.row_group(rg).column(i).statistics
                for i in range(md.row_group(rg).num_columns)
            }
            spans.append(
                (cols["a"].min, cols["a"].max, cols["b"].min, cols["b"].max)
            )
    assert len(spans) >= 8, f"need multiple row groups, got {len(spans)}"
    hit_a = sum(1 for lo, hi, _, _ in spans if lo <= 7 <= hi)
    hit_b = sum(1 for _, _, lo, hi in spans if lo <= 7 <= hi)
    assert hit_a <= len(spans) / 2, (hit_a, len(spans))
    assert hit_b <= len(spans) / 2, (hit_b, len(spans))
    # and the data itself round-trips
    assert spark.read.parquet(path).count() == 40000


def test_plan_summary_counts(spark):
    from nested_pandas_spark.operators.packer import pack
    from nested_pandas_spark.plans.inspect import plan_summary

    df = spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 1.0)],
                               "k long, v double")
    s = plan_summary(pack(df, "items", on="k"))
    assert s["exchanges"] >= 1          # the pack's one shuffle
    assert s["cartesian"] == 0 and s["python_evals"] == 0

    # a broadcast join registers under broadcasts, not exchanges-only
    from pyspark.sql import functions as F
    dim = spark.createDataFrame([(1, "a")], "k long, tag string")
    joined = df.join(F.broadcast(dim), "k")
    s2 = plan_summary(joined)
    assert s2["broadcasts"] >= 1

    # a crossJoin is flagged
    s3 = plan_summary(df.crossJoin(dim.select("tag")))
    assert s3["cartesian"] >= 1


def test_plan_summary_pushed_filters(spark, tmp_path):
    from nested_pandas_spark.plans.inspect import plan_summary

    p = str(tmp_path / "t.parquet")
    spark.range(100).withColumnRenamed("id", "x").write.parquet(p)
    s = plan_summary(spark.read.parquet(p).where("x > 50"))
    assert s["pushed_filters"] >= 1
    assert s["scans"] >= 1
