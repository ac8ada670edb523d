"""Link graph (pipeline/graph.py pagerank, degree_stats; pipeline/web.py
extract_links): parity with a NumPy power iteration, structural cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.graph import degree_stats, pagerank
from nested_pandas_spark.pipeline.web import extract_links


def _np_pagerank(edge_list, iters, d=0.85):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in set(edge_list):
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[outdeg == 0].sum()
        nxt += d * dangling / n
        for s, t in set(edge_list):
            nxt[idx[t]] += d * r[idx[s]] / outdeg[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def _spark_pr(spark, edge_list, iters):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in pagerank(e, iters=iters).collect()
    }


def test_matches_numpy_power_iteration(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 2), (0, 2), (4, 0), (2, 0)]
    got = _spark_pr(spark, edges, iters=7)
    expect = _np_pagerank(edges, iters=7)
    assert set(got) == set(expect)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-12


def test_dangling_mass_conserved(spark):
    # node 2 has no out-edges: without redistribution ranks leak
    edges = [(0, 1), (1, 2)]
    got = _spark_pr(spark, edges, iters=10)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    expect = _np_pagerank(edges, iters=10)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-12


def test_duplicate_edges_and_self_loop(spark):
    edges = [(0, 1), (0, 1), (1, 1), (1, 0)]
    got = _spark_pr(spark, edges, iters=5)
    expect = _np_pagerank(edges, iters=5)  # reference dedups too
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-12


def test_zero_iters_uniform_and_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=0).collect()}
    assert got == {0: 0.5, 1: 0.5}
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=-1)


def test_degree_stats(spark):
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (0, 1)], "src long, dst long")
    rows = {r["node"]: (r["out_degree"], r["in_degree"])
            for r in degree_stats(e).collect()}
    assert rows == {0: (2, 0), 1: (1, 1), 2: (0, 2)}


def test_extract_links_resolution(spark):
    html = (
        '<a href="https://x.org/abs">abs</a> '
        "<a class='c' href='/root'>r</a> "
        '<A HREF="//cdn.x.org/p">proto</A> '
        '<a href="sub/page.html">rel</a> '
        '<a href="#frag">skip</a> <a href="mailto:a@b.c">skip</a>'
    )
    df = spark.createDataFrame(
        [(1, html, "https://ex.com/dir/page.html?q=1")],
        "id long, html string, url string",
    )
    links = [r["link"] for r in
             extract_links(df, "html", base_url_col="url").collect()]
    assert links == [
        "https://x.org/abs",
        "https://ex.com/root",
        "https://cdn.x.org/p",
        "https://ex.com/dir/sub/page.html",
    ]


def test_extract_links_no_base(spark):
    df = spark.createDataFrame(
        [(1, '<a href="https://a.b/c">x</a><p>no links</p>')],
        "id long, html string",
    )
    assert [r["link"] for r in extract_links(df, "html").collect()] == [
        "https://a.b/c"
    ]
    empty = spark.createDataFrame([(2, "<p>none</p>")], "id long, html string")
    assert extract_links(empty, "html").count() == 0
