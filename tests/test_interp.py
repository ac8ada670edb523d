"""nest_interp: per-cell linear interpolation onto a fixed grid, checked
against numpy.interp."""

import numpy as np
import pytest

from nested_pandas_spark import nest_interp, pack


def test_nest_interp_matches_numpy(spark):
    rng = np.random.RandomState(9)
    t = np.sort(rng.uniform(0, 10, 15))
    v = np.sin(t) * 3 + rng.randn(15) * 0.1
    rows = [(0, float(a), float(b)) for a, b in zip(t, v)]
    child = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(child, "nested", on="id")
    grid = [0.5, 2.5, 5.0, 9.9]
    [row] = nest_interp(nf, "nested", "t", "flux", grid=grid).collect()
    got = {e["t"]: e["v"] for e in row["nested_interp"]}
    for g in grid:
        if t.min() <= g <= t.max():
            assert got[g] == pytest.approx(float(np.interp(g, t, v)), rel=1e-12)


def test_nest_interp_outside_range_and_exact_hits(spark):
    rows = [(0, 1.0, 10.0), (0, 3.0, 30.0)]
    child = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(child, "nested", on="id")
    grid = [0.0, 1.0, 2.0, 3.0, 4.0]
    [row] = nest_interp(nf, "nested", "t", "flux", grid=grid).collect()
    got = {e["t"]: e["v"] for e in row["nested_interp"]}
    assert got[0.0] is None and got[4.0] is None  # no extrapolation
    assert got[1.0] == 10.0 and got[3.0] == 30.0  # exact observation times
    assert got[2.0] == pytest.approx(20.0)


def test_nest_interp_nulls_and_empty(spark):
    rows = [(0, None, 5.0), (0, 2.0, None), (1, 1.0, 7.0)]
    child = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(child, "nested", on="id")
    out = {r["id"]: r["nested_interp"]
           for r in nest_interp(nf, "nested", "t", "flux",
                                grid=[1.0]).collect()}
    # cell 0 has no usable (t, v) pair -> all-NULL interpolants
    assert [e["v"] for e in out[0]] == [None]
    # cell 1: single point, grid hits it exactly
    assert [e["v"] for e in out[1]] == [7.0]
    with pytest.raises(ValueError):
        nest_interp(nf, "nested", "t", "flux", grid=[])


def test_nest_interp_unsorted_input_cells(spark):
    # elements arrive unsorted: the operator sorts internally
    rows = [(0, 5.0, 50.0), (0, 1.0, 10.0), (0, 3.0, 30.0)]
    child = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(child, "nested", on="id")  # no sort_within
    [row] = nest_interp(nf, "nested", "t", "flux", grid=[2.0, 4.0]).collect()
    got = {e["t"]: e["v"] for e in row["nested_interp"]}
    assert got[2.0] == pytest.approx(20.0)
    assert got[4.0] == pytest.approx(40.0)
