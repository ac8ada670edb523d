"""Reference edge-case scenarios (SURVEY §5): empty frames, all-null cells,
duplicate/non-unique keys, composite (MultiIndex-analogue) keys.

Reference models: test_nestedframe.py empty/edge regressions
(test_issue193:2551, test_issue294:2680), packer MultiIndex round-trips
(series/test_packer.py), duplicate-index explode (core.py:1301-1349).
"""

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark import NestedFrame


def test_join_nested_empty_child(spark, objects):
    child = spark.createDataFrame([], "id long, flux double")
    ndf = NestedFrame(objects).join_nested(child, "nested", on="id")
    rows = {r["id"]: r["nested"] for r in ndf.df.collect()}
    assert len(rows) == 3
    assert all(v is None for v in rows.values())
    # count_nested zero-fills missing cells
    counted = ndf.count_nested("nested")
    assert {r["n_nested"] for r in counted.df.collect()} == {0}


def test_query_on_all_null_cells(spark, objects):
    child = spark.createDataFrame([], "id long, flux double")
    ndf = NestedFrame(objects).join_nested(child, "nested", on="id")
    out = ndf.query("nested.flux > 1.0")
    rows = {r["id"]: r["nested"] for r in out.df.collect()}
    # keep-rows convention: base rows survive, cells stay NULL
    assert len(rows) == 3
    assert all(v is None for v in rows.values())


def test_explode_empty_frame(spark):
    base = spark.createDataFrame([], "id long, nested array<struct<t:double>>")
    out = NestedFrame(base).explode("nested")
    assert out.df.count() == 0
    assert set(out.columns) == {"id", "t"}


def test_sort_values_empty_frame(spark):
    base = spark.createDataFrame([], "id long, a double")
    out = NestedFrame(base).sort_values("a")
    assert out.df.count() == 0


def test_join_nested_composite_keys(spark):
    base = spark.createDataFrame(
        [(0, "x", 1.0), (0, "y", 2.0), (1, "x", 3.0)], "k1 long, k2 string, val double"
    )
    child = spark.createDataFrame(
        [(0, "x", 10.0), (0, "x", 11.0), (0, "y", 20.0), (1, "z", 99.0)],
        "k1 long, k2 string, m double",
    )
    ndf = NestedFrame(base).join_nested(child, "nested", on=["k1", "k2"],
                                        sort_within=["m"])
    cells = {(r["k1"], r["k2"]): r["nested"] for r in ndf.df.collect()}
    assert [e["m"] for e in cells[(0, "x")]] == [10.0, 11.0]
    assert [e["m"] for e in cells[(0, "y")]] == [20.0]
    assert cells[(1, "x")] is None  # (1,'z') child matches nothing


def test_duplicate_base_keys_share_cells(spark, sources):
    # non-unique index analogue: both base rows with id=0 get the same cell
    base = spark.createDataFrame(
        [(0, "first"), (0, "second"), (1, "third")], "id long, tag string"
    )
    ndf = NestedFrame(base).join_nested(sources, "nested", on="id",
                                        sort_within=["t"])
    rows = ndf.df.collect()
    assert len(rows) == 3
    by_tag = {r["tag"]: r["nested"] for r in rows}
    assert by_tag["first"] == by_tag["second"]
    assert len(by_tag["first"]) == 3


def test_count_nested_on_duplicate_keys(spark, sources):
    base = spark.createDataFrame([(0,), (0,), (2,)], "id long")
    counted = NestedFrame(base).join_nested(sources, "nested", on="id").count_nested("nested")
    vals = sorted(r["n_nested"] for r in counted.df.collect())
    assert vals == [3, 3, 3]


def test_eval_on_empty_frame(spark):
    base = spark.createDataFrame([], "id long, nested array<struct<t:double>>")
    out = NestedFrame(base).eval("nested.u = nested.t * 2")
    assert out.df.count() == 0
    assert "u" in out.nested_fields("nested")


def test_fillna_all_null_cells(spark, objects):
    child = spark.createDataFrame([], "id long, flux double")
    ndf = NestedFrame(objects).join_nested(child, "nested", on="id")
    out = ndf.fillna({"nested.flux": 0.0})
    # NULL cells stay NULL (fill rewrites element values, not missing cells)
    assert all(r["nested"] is None for r in out.df.collect())


def test_pipeline_ops_on_empty_corpus(spark):
    """Every corpus/dedup/text/similarity operator must run (and return
    zero rows or all-zero stats) on an EMPTY input — at scale a filter
    chain can legitimately empty a partition-pruned read, and a crash here
    kills the whole job."""
    from pyspark.sql import functions as F

    from nested_pandas_spark.pipeline import dedup as dd
    from nested_pandas_spark.pipeline import similarity as sim
    from nested_pandas_spark.pipeline import text as tx
    from nested_pandas_spark.pipeline.corpus import (
        decontaminate,
        mixture_weights,
        pack_sequences,
        source_stats,
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame([], "doc_id long, text string, source string, n_chars long")
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")

    assert dd.exact_dedup(docs, "doc_id").count() == 0
    assert dd.lsh_candidate_pairs(docs, "doc_id", num_hashes=8, bands=4).count() == 0
    assert dd.simhash_near_pairs(docs, "doc_id", max_hamming=3).count() == 0
    assert strip_boilerplate_lines(docs, min_df=2).count() == 0
    assert source_stats(docs).count() == 0
    assert pack_sequences(docs, 128, tokens_col="n_chars").count() == 0
    assert mixture_weights(docs, {"src0": 1.0}, by="source",
                           tokens_col="n_chars").count() == 0
    assert decontaminate(docs, docs).count() == 0
    assert docs.select(tx.quality_score("text")).count() == 0
    assert sim.brute_force_topk(emb, emb, k=3).count() == 0
    assert sim.lsh_topk(emb, emb, k=3, num_planes=2).count() == 0


def test_timeseries_ops_on_empty_and_degenerate_frames(spark):
    """The per-cell series operators must survive an empty frame and a
    frame whose every cell is NULL — both arise naturally after
    aggressive filters."""
    from nested_pandas_spark import (
        nest_corr, nest_cum, nest_decimate, nest_dedup, nest_describe,
        nest_diff, nest_ewm, nest_interp, nest_rolling, nest_topk,
        nest_wmean, nest_zscore, phase_fold, rebin, sigma_clip, trend_slope,
    )

    empty = spark.createDataFrame(
        [], "id long, nested array<struct<t: double, flux: double>>"
    )
    allnull = spark.createDataFrame(
        [(1, None)], "id long, nested array<struct<t: double, flux: double>>"
    )
    for frame, want in ((empty, 0), (allnull, 1)):
        assert rebin(frame, "nested", "t", width=1.0).count() == want
        assert phase_fold(frame, "nested", "t", period=1.0).count() == want
        assert sigma_clip(frame, "nested", "flux").count() == want
        assert trend_slope(frame, "nested", "t", "flux").count() == want
        assert nest_diff(frame, "nested", "t").count() == want
        assert nest_rolling(frame, "nested", "flux", 2).count() == want
        assert nest_zscore(frame, "nested", "flux").count() == want
        assert nest_topk(frame, "nested", "flux", 2).count() == want
        assert nest_wmean(frame, "nested", "flux", "t").count() == want
        assert nest_interp(frame, "nested", "t", "flux", grid=[0.5]).count() == want
        assert nest_corr(frame, "nested", "t", "flux").count() == want
        assert nest_describe(frame, "nested", "flux").count() == want
        assert nest_ewm(frame, "nested", "flux", alpha=0.5).count() == want
        assert nest_cum(frame, "nested", "flux").count() == want
        assert nest_dedup(frame, "nested", by="t").count() == want
        assert nest_decimate(frame, "nested", k=2).count() == want
    # NULL cells pass through as NULL (not empty arrays, not errors)
    [r] = sigma_clip(allnull, "nested", "flux").collect()
    assert r["nested"] is None


def test_joins_on_empty_inputs(spark):
    from nested_pandas_spark.operators.asof import interval_join
    from nested_pandas_spark.operators.crossmatch import crossmatch
    from nested_pandas_spark.pipeline.dedup import fuzzy_pairs

    pts = spark.createDataFrame([], "id long, x double, y double")
    assert crossmatch(pts, pts, "id", "id", radius=1.0).count() == 0
    iv = spark.createDataFrame([], "id long, k long, s long, e long")
    assert interval_join(iv, iv, "k", "s", "e", "s", "e", bucket=10).count() == 0
    strs = spark.createDataFrame([], "id long, s string")
    assert fuzzy_pairs(strs, "id", "s").count() == 0
