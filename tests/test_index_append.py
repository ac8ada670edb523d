"""Incremental ANN index maintenance: append without re-train.

The equivalence contract: with the SAME centroids/codebooks/planes,
(write half, append the other half, search) must return exactly what
(write everything at once, search) returns — assignment depends only on
the stored parameters, which append never changes. Plus the physical
proof: an append touches ONLY the partition directories its vectors are
assigned to."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline import similarity as sim


def _clustered(spark, n_clusters=4, per_cluster=25, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4
    rows = []
    for i in range(n_clusters * per_cluster):
        c = centers[i % n_clusters]
        rows.append((i, (c + rng.randn(dim) * 0.5).astype(float).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ranks(df):
    return {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in df.collect()}


def _part_dirs(path, prefix="__cid="):
    return sorted(d for d in os.listdir(path) if d.startswith(prefix))


def _dir_files(path, d):
    return sorted(f for f in os.listdir(os.path.join(path, d))
                  if f.endswith(".parquet"))


def test_ivf_append_equals_write_all(spark, tmp_path):
    from nested_pandas_spark.sources.ivf_store import (
        append_ivf_index,
        ivf_cell_stats,
        ivf_search,
        write_ivf_index,
    )

    emb = _clustered(spark)
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    q = emb.where(F.col("vec_id") < 6)
    cents = sim.ivf_centroids(emb, n_centroids=4, n_iters=2)

    full = str(tmp_path / "full")
    grown = str(tmp_path / "grown")
    write_ivf_index(emb, full, centroids=cents)
    write_ivf_index(a, grown, centroids=cents)
    counts = append_ivf_index(b, grown)

    assert sum(n for _, n in counts) == b.count()
    assert _ranks(ivf_search(spark, grown, q, k=3, n_probe=2)) == _ranks(
        ivf_search(spark, full, q, k=3, n_probe=2)
    )
    # cell stats match the full store's occupancy
    sf = {r["cid"]: r["n"] for r in ivf_cell_stats(spark, full).collect()}
    sg = {r["cid"]: r["n"] for r in ivf_cell_stats(spark, grown).collect()}
    assert sf == sg


def test_ivf_append_touches_only_assigned_partitions(spark, tmp_path):
    from nested_pandas_spark.sources.ivf_store import (
        append_ivf_index,
        write_ivf_index,
    )

    emb = _clustered(spark)
    cents = sim.ivf_centroids(emb, n_centroids=4, n_iters=2)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, path, centroids=cents)
    before = {d: _dir_files(path, d) for d in _part_dirs(path)}

    # one new vector, landing in exactly one cell
    new = spark.createDataFrame(
        [(10_000, [float(x) for x in cents[2][1]])],
        "vec_id long, embedding array<float>",
    )
    counts = append_ivf_index(new, path)
    assert counts == [(2, 1)]

    after = {d: _dir_files(path, d) for d in _part_dirs(path)}
    assert set(after) == set(before)  # no new partition directories
    for d in after:
        if d == "__cid=2":
            assert len(after[d]) > len(before[d])
        else:
            assert after[d] == before[d]  # untouched


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_append_equals_write_all(spark, tmp_path, residual):
    from nested_pandas_spark.sources.ivf_store import (
        append_ivfpq_index,
        ivfpq_search,
        write_ivfpq_index,
    )

    emb = _clustered(spark)
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    q = emb.where(F.col("vec_id") < 6)

    full = str(tmp_path / f"full_{residual}")
    grown = str(tmp_path / f"grown_{residual}")
    cents, cbs = write_ivfpq_index(
        emb, full, n_centroids=4, n_iters=2, n_sub=4, pq_centroids=8,
        residual=residual,
    )
    write_ivfpq_index(
        a, grown, n_sub=4, pq_centroids=8, residual=residual,
        centroids=cents, codebooks=cbs,
    )
    counts = append_ivfpq_index(b, grown)
    assert sum(n for _, n in counts) == b.count()
    assert _ranks(ivfpq_search(spark, grown, q, k=3, n_probe=2)) == _ranks(
        ivfpq_search(spark, full, q, k=3, n_probe=2)
    )


def test_lsh_append_equals_write_all(spark, tmp_path):
    from nested_pandas_spark.sources.lsh_store import (
        append_lsh_index,
        lsh_search,
        write_lsh_index,
    )

    emb = _clustered(spark)
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    q = emb.where(F.col("vec_id") < 6)

    full = str(tmp_path / "full")
    grown = str(tmp_path / "grown")
    write_lsh_index(emb, full, num_planes=4, num_tables=2)
    write_lsh_index(a, grown, num_planes=4, num_tables=2)
    n = append_lsh_index(b, grown)
    assert n == b.count() * 2  # one posting per table

    assert _ranks(lsh_search(spark, grown, q, k=3, multi_probe=1)) == _ranks(
        lsh_search(spark, full, q, k=3, multi_probe=1)
    )
    # appended buckets are a subset of the full store's posting lists
    assert set(_part_dirs(grown, "__tbl=")) <= set(_part_dirs(full, "__tbl="))
