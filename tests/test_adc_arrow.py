"""Arrow ADC scan vs the SQL expression twin.

The shipped PQ/IVFPQ candidate scan (``impl="arrow"``,
``similarity._adc_scan_topk_arrow``) must return exactly the rows the
pure-expression path returns — same LUT doubles (same per-dimension fold
order), same tournament total order (distance asc, id asc), same
self-exclusion. These tests pin the bit-level equality contract that lets
the DuckDB oracles keep gating the arrow path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16)])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pq_topk_arrow_equals_sql(emb):
    q = emb.where(F.col("vec_id") < 5)
    kw = dict(k=4, n_sub=4, n_centroids=8, refine=3, n_iters=1)
    assert _rows(sim.pq_topk(emb, q, impl="arrow", **kw)) == _rows(
        sim.pq_topk(emb, q, impl="sql", **kw))


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_topk_arrow_equals_sql(emb, residual):
    q = emb.where(F.col("vec_id") < 5)
    kw = dict(k=4, n_centroids=4, n_probe=2, n_sub=4, pq_centroids=8,
              refine=3, n_iters=1, pq_iters=1, residual=residual)
    assert _rows(sim.ivfpq_topk(emb, q, impl="arrow", **kw)) == _rows(
        sim.ivfpq_topk(emb, q, impl="sql", **kw))


def test_pq_adc_scores_bit_identical_per_method(emb):
    """arrow and sql produce bit-identical distances for each method;
    lut vs recon differ only by FP association (subspace-grouped vs
    full-dimension summation)."""
    q = emb.where(F.col("vec_id") < 3)
    cbs = sim.pq_codebooks(emb, n_sub=4, n_centroids=8, n_iters=1)
    enc = sim.pq_encode(emb, cbs).select("vec_id", "pq_code")

    def scores(method, impl):
        return {
            (r["query_id"], r["neighbor_id"]): r["adc_dist"]
            for r in sim.pq_adc_scores(
                enc, q, cbs, method=method, impl=impl).collect()
        }

    for method in ("lut", "recon"):
        a, s = scores(method, "arrow"), scores(method, "sql")
        assert a.keys() == s.keys() and len(a) == 3 * 300
        assert all(a[k] == s[k] for k in a), method

    lut, recon = scores("lut", "arrow"), scores("recon", "arrow")
    assert all(abs(lut[k] - recon[k]) <= 1e-9 * max(1.0, abs(lut[k]))
               for k in lut)


def test_ivfpq_search_store_arrow_equals_sql(emb, tmp_path, spark):
    from nested_pandas_spark.sources.ivf_store import (
        ivfpq_search,
        write_ivfpq_index,
    )

    path = str(tmp_path / "idx")
    write_ivfpq_index(emb, path, n_centroids=4, n_iters=1, n_sub=4,
                      pq_centroids=8, residual=True)
    q = emb.where(F.col("vec_id") < 5)
    a = _rows(ivfpq_search(spark, path, q, k=4, n_probe=2, impl="arrow"))
    s = _rows(ivfpq_search(spark, path, q, k=4, n_probe=2, impl="sql"))
    assert a == s and len(a) == 20


def test_append_rejects_wrong_dim_and_schema(emb, tmp_path, spark):
    from nested_pandas_spark.sources.ivf_store import (
        append_ivf_index,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_centroids=4, n_iters=1)
    bad_dim = emb.select(
        "vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    with pytest.raises(ValueError, match="dimensions"):
        append_ivf_index(bad_dim, path)
    bad_cols = emb.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="column set"):
        append_ivf_index(bad_cols, path)
