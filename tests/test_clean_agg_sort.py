"""dropna / fillna / count_nested / min-max / describe / sort_values tests
(reference core.py:1699 dropna, :1351 fillna, utils.py:8 count_nested,
core.py:949 min/max, :1099 describe, :1851 sort_values)."""

import math

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark import NestedFrame


@pytest.fixture(scope="module")
def dirty(spark):
    """F6: nulls + empties."""
    df = spark.createDataFrame(
        [
            (0, 1.0, [(1.0, 2.0), (None, 3.0)]),
            (1, None, [(4.0, None)]),
            (2, 3.0, []),
            (3, 4.0, None),
        ],
        "id long, a double, nested array<struct<d double, e double>>",
    )
    return NestedFrame(df)


def test_dropna_base(dirty):
    out = dirty.dropna(subset="a")
    assert sorted(r["id"] for r in out.collect()) == [0, 2, 3]


def test_dropna_nested_elements(dirty):
    out = dirty.dropna(subset="nested.d")
    rows = {r["id"]: r["nested"] for r in out.collect()}
    assert len(rows) == 4  # base rows kept
    assert len(rows[0]) == 1  # (None, 3.0) element removed
    assert rows[0][0]["d"] == 1.0
    assert len(rows[1]) == 1  # d=4.0 kept (e is null but not targeted)
    assert rows[2] == []
    assert rows[3] is None


def test_dropna_whole_nest_any(dirty):
    out = dirty.dropna(on_nested="nested")
    rows = {r["id"]: r["nested"] for r in out.collect()}
    assert len(rows[0]) == 1  # both elements with any-null dropped
    assert len(rows[1]) == 0


def test_dropna_single_layer_rule(dirty):
    with pytest.raises(ValueError, match="one layer"):
        dirty.dropna(subset=["a", "nested.d"])


def test_fillna_dict(dirty):
    out = dirty.fillna({"a": -1.0, "nested.d": 0.0})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["a"] == -1.0
    assert rows[0]["nested"][1]["d"] == 0.0
    assert rows[0]["nested"][1]["e"] == 3.0


def test_fillna_scalar(dirty):
    out = dirty.fillna(0.0)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["nested"][0]["e"] == 0.0


def test_count_nested(packed):
    out = packed.count_nested("nested")
    assert all(r["n_nested"] == 3 for r in out.collect())


def test_count_nested_by(packed):
    out = packed.count_nested("nested", by="band")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["n_nested_r"] == 2
    assert rows[0]["n_nested_g"] == 1


def test_count_nested_by_max_values_guard(spark):
    """Auto-discovered pivot categories are capped (each becomes a COLUMN;
    a mistakenly-pivoted high-cardinality field must raise, not build a
    million-column frame). Explicit values= or a raised cap still work."""
    base = spark.createDataFrame(
        [(i, [(f"cat{j}",) for j in range(4)]) for i in range(3)],
        "id long, nested array<struct<band string>>",
    )
    ndf = NestedFrame(base)
    with pytest.raises(ValueError, match="max_values"):
        ndf.count_nested("nested", by="band", max_values=3).collect()
    ok = ndf.count_nested("nested", by="band", max_values=4)
    assert sorted(c for c in ok.columns if c.startswith("n_")) == [
        f"n_nested_cat{j}" for j in range(4)
    ]
    # eager path (no pending pack) takes the operators.aggregates route
    from nested_pandas_spark.operators.restructure import split as split_op

    with pytest.raises(ValueError, match="max_values"):
        split_op(base, "nested", "band", max_values=2)
    assert len(split_op(base, "nested", "band", max_values=8).columns) == 5


def test_count_nested_null_cell(spark, sources):
    base = spark.createDataFrame([(0, 1.0, 1.0), (99, 1.0, 1.0)], "id long, a double, b double")
    ndf = NestedFrame(base).join_nested(sources, "nested", on="id")
    out = ndf.count_nested("nested", by="band", values=["r", "g"])
    rows = {r["id"]: r for r in out.collect()}
    assert rows[99]["n_nested_r"] == 0  # zero-filled, not NULL


def test_minmax(packed):
    mx = packed.max().collect()[0]
    assert mx["b"] == 1.8
    assert mx["nested.flux"] == 22.0
    mn = packed.min().collect()[0]
    assert mn["nested.t"] == 0.0


def test_describe_exact_quantiles(packed):
    out = packed.describe(columns=["nested.flux"]).collect()[0]
    assert out["count"] == 9
    assert out["mean"] == pytest.approx(11.0)
    assert out["p50"] == pytest.approx(11.0)
    assert out["min"] == 0.0 and out["max"] == 22.0


def test_describe_approx_matches_exact_at_small_n(packed):
    # the 100 TB path: percentile_approx is a mergeable sketch (no global
    # sort); at tiny n with default accuracy it is EXACT, so the two modes
    # must agree to the digit here
    exact = packed.describe(columns=["nested.flux"]).collect()[0]
    approx = packed.describe(columns=["nested.flux"], exact=False).collect()[0]
    for c in ("count", "mean", "min", "max", "p25", "p50", "p75"):
        assert approx[c] == pytest.approx(exact[c]), c


def test_sort_values_base(packed):
    out = packed.sort_values("a", ascending=False)
    assert [r["id"] for r in out.collect()] == [2, 1, 0]


def test_sort_values_nested(packed):
    out = packed.sort_values("nested.flux", ascending=False)
    rows = {r["id"]: r["nested"] for r in out.collect()}
    assert [e["flux"] for e in rows[0]] == [2.0, 1.0, 0.0]


def test_sort_values_nested_multikey(packed):
    out = packed.sort_values(["nested.band", "nested.t"], ascending=[True, False])
    rows = {r["id"]: r["nested"] for r in out.collect()}
    assert [(e["band"], e["t"]) for e in rows[0]] == [("g", 1.0), ("r", 2.0), ("r", 0.0)]


def test_sort_values_cross_layer_rejected(packed):
    with pytest.raises(ValueError, match="same layer"):
        packed.sort_values(["a", "nested.t"])


def test_sort_nulls_last(spark):
    df = spark.createDataFrame(
        [(0, [(None,), (2.0,), (1.0,)])], "id long, n array<struct<v double>>"
    )
    out = NestedFrame(df).sort_values("n.v")
    vals = [e["v"] for e in out.collect()[0]["n"]]
    assert vals == [1.0, 2.0, None]


def test_nest_agg(packed):
    out = packed.nest_agg("nested", "flux", "mean", alias="mean_flux")
    rows = {r["id"]: r["mean_flux"] for r in out.collect()}
    assert rows[0] == pytest.approx(1.0)
    assert rows[2] == pytest.approx(21.0)


def test_dropna_thresh_base(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (1.0, None), (None, None)], "a double, b double"
    )
    out = NestedFrame(df).dropna(subset=["a", "b"], thresh=1)
    assert out.count() == 2
    assert NestedFrame(df).dropna(subset=["a", "b"], thresh=2).count() == 1


def test_dropna_thresh_nested(spark, objects):
    child = spark.createDataFrame(
        [(0, 1.0, 2.0), (0, None, 3.0), (0, None, None)],
        "id long, x double, y double",
    )
    ndf = NestedFrame(objects).join_nested(child, "nested", on="id")
    # thresh=1: keep elements with >=1 non-null among (x, y)
    out = ndf.dropna(subset=["nested.x", "nested.y"], thresh=1)
    cells = {r["id"]: r["nested"] for r in out.df.collect()}
    assert len(cells[0]) == 2
    out2 = ndf.dropna(subset=["nested.x", "nested.y"], thresh=2)
    cells2 = {r["id"]: r["nested"] for r in out2.df.collect()}
    assert len(cells2[0]) == 1


def test_describe_custom_percentiles(packed):
    out = packed.describe(columns=["nested.flux"], percentiles=[0.1, 0.9])
    row = out.collect()[0]
    assert "p10" in out.columns and "p90" in out.columns
    assert row["p10"] <= row["p90"]
    with pytest.raises(ValueError):
        packed.describe(percentiles=[1.5])


def test_exclude_nest(packed):
    m = packed.min(exclude_nest=True).collect()[0].asDict()
    assert all(not k.startswith("nested.") for k in m)
    d = packed.describe(exclude_nest=True)
    assert all(not r["column"].startswith("nested.") for r in d.collect())


def test_get_subcolumns(packed):
    subs = packed.get_subcolumns()
    assert "nested.flux" in subs and "nested.band" in subs
    assert packed.get_subcolumns("nested") == subs


def test_accessor_aliases(packed):
    acc = packed.nest("nested")
    assert acc.columns == acc.fields
    # query_flat == query (drop-empty semantics)
    a = sorted(r["id"] for r in acc.query("nested.flux > 10").collect())
    b = sorted(r["id"] for r in acc.query_flat("nested.flux > 10").collect())
    assert a == b
    flat = acc.get_flat_series("flux")
    assert set(flat.columns) == {"id", "a", "b", "flux"}
    assert flat.count() == 9
    lst = acc.get_list_series("flux")
    assert "flux" in lst.columns
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        acc.clear()
    with _pytest.raises(KeyError):
        acc.get_flat_series("nope")
    dropped = acc.without_field("flux_error")
    assert "flux_error" not in dropped.nested_fields("nested")
    added = acc.set_flat_column("flux2", "nested.flux * 2")
    assert "flux2" in added.nested_fields("nested")


def test_nest_agg_extended_reducers(spark):
    df = spark.createDataFrame(
        [
            (0, [(1.0, True), (2.0, True), (1.0, None)]),
            (1, [(5.0, False)]),
            (2, None),
        ],
        "id long, n array<struct<v double, f boolean>>",
    )
    ndf = NestedFrame(df)
    out = (
        ndf.nest_agg("n", "v", "n_distinct", alias="nd")
        .nest_agg("n", "v", "first", alias="fst")
        .nest_agg("n", "v", "last", alias="lst")
        .nest_agg("n", "f", "any", alias="any_f")
        .nest_agg("n", "f", "all", alias="all_f")
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["nd"] == 2 and rows[0]["fst"] == 1.0 and rows[0]["lst"] == 1.0
    assert rows[0]["any_f"] is True
    assert rows[1]["nd"] == 1 and rows[1]["any_f"] is False and rows[1]["all_f"] is False
    assert rows[2]["nd"] is None and rows[2]["fst"] is None


def test_nest_agg_n_distinct_lazy_matches_eager(spark):
    """n_distinct through the pending-pack pushdown (count(DISTINCT) on the
    flat child) must equal the per-cell HOF on the materialized pack."""
    base = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    child = spark.createDataFrame(
        [(0, 1.0), (0, 1.0), (0, 2.0), (1, None), (1, 3.0)],
        "id long, v double",
    )
    lazy = (
        NestedFrame(base)
        .join_nested(child, "n", on="id")
        .nest_agg("n", "v", "n_distinct", alias="nd")
    )
    lazy_rows = {r["id"]: r["nd"] for r in lazy.df.select("id", "nd").collect()}
    eager = NestedFrame(
        NestedFrame(base).join_nested(child, "n", on="id").df
    ).nest_agg("n", "v", "n_distinct", alias="nd")
    eager_rows = {r["id"]: r["nd"] for r in eager.df.select("id", "nd").collect()}
    assert lazy_rows == eager_rows
    assert lazy_rows[0] == 2 and lazy_rows[1] == 1


def test_profile_counts_and_complex_types(spark):
    from nested_pandas_spark.operators.aggregates import profile

    df = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, None, []), (2, "b", None)],
        "id long, tag string, arr array<int>",
    )
    out = {r["column"]: r for r in profile(df).collect()}
    assert out["id"]["n_rows"] == 3
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 2
    assert out["tag"]["n_nulls"] == 1 and out["tag"]["n_distinct"] == 2
    # complex column: nulls counted, distinct deferred to element-level ops
    assert out["arr"]["n_nulls"] == 1 and out["arr"]["n_distinct"] is None
    assert out["arr"]["dtype"] == "array<int>"
    # approx mode runs and agrees on tiny cardinalities
    approx = {r["column"]: r for r in profile(df, exact=False).collect()}
    assert approx["id"]["n_distinct"] == 2


def test_group_describe_base_and_nested(spark):
    from nested_pandas_spark.operators.aggregates import group_describe
    from nested_pandas_spark.operators.packer import pack
    from pyspark.sql import functions as F

    child = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, 10.0)], "g long, v double")
    base = spark.createDataFrame(
        [(1, "a", 5.0), (1, "a", 7.0), (2, "b", 1.0)],
        "g long, grp string, x double")
    # base-column stats per group
    out = {(r["grp"], r["column"]): r
           for r in group_describe(base, by="grp").collect()}
    assert out[("a", "x")]["count"] == 2
    assert out[("a", "x")]["mean"] == 6.0
    assert out[("a", "x")]["p50"] == 6.0  # exact interpolated median
    # nested sub-column stats per group (flattened in the same pass)
    packed = pack(child, "items", on="g").join(
        base.select("g", "grp").distinct(), "g")
    outn = {(r["grp"], r["column"]): r
            for r in group_describe(packed, by="grp",
                                    columns=["items.v"]).collect()}
    assert outn[("a", "items.v")]["count"] == 2
    assert outn[("a", "items.v")]["p50"] == 2.0
    assert outn[("b", "items.v")]["max"] == 10.0


def test_percentile_label_collision_raises(spark):
    import pytest as _pytest

    from nested_pandas_spark.operators.aggregates import describe, group_describe

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, g string, v double")
    with _pytest.raises(ValueError):
        describe(df, columns=["v"], percentiles=[0.124, 0.125])
    with _pytest.raises(ValueError):
        group_describe(df, by="g", percentiles=[0.124, 0.125])


def test_count_nested_null_by_raises_and_dropna(spark):
    """NULL values in the by-column are reported, not silently dropped;
    dropna=True opts into ignoring them (reference utils test
    test_count_nested_by_with_nulls, GH#494)."""
    from nested_pandas_spark import NestedFrame

    base = spark.createDataFrame([(0, 1), (1, 2)], "id long, a long")
    child = spark.createDataFrame(
        [(0, 1.0, None), (0, 2.0, "g"), (0, 3.0, "r"),
         (1, 4.0, "g"), (1, 5.0, "r"), (1, 6.0, "g")],
        "id long, flux double, band string")
    nf = NestedFrame(base).join_nested(child, "nested", on="id")
    with pytest.raises(ValueError, match="null values"):
        nf.count_nested("nested", by="band")
    out = nf.count_nested("nested", by="band", dropna=True)
    rows = {r["id"]: (r["n_nested_g"], r["n_nested_r"])
            for r in out.df.collect()}
    assert rows == {0: (1, 1), 1: (2, 1)}
    # the lazy (pending-pack) path enforces the same contract
    lazy = NestedFrame(base).join_nested(child, "nested", on="id")
    assert lazy._pending  # still pending
    with pytest.raises(ValueError, match="null values"):
        lazy.count_nested("nested", by="band").df.columns
    lazy2 = NestedFrame(base).join_nested(child, "nested", on="id")
    out2 = lazy2.count_nested("nested", by="band", dropna=True)
    rows2 = {r["id"]: (r["n_nested_g"], r["n_nested_r"])
             for r in out2.df.collect()}
    assert rows2 == rows
