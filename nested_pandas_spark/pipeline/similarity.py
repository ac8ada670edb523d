"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set against the corpus; dot products via ``zip_with``+``aggregate``
  HOFs (JVM, codegen'd — no UDF); per-query top-k via window rank.
* SRP-LSH bucketed ANN — the scale path: sign-random-projection bucket keys
  from deterministic md5-derived hyperplanes; candidates only join within a
  bucket, then exact re-rank. Sub-linear candidate generation at 100 TB; the
  planes are pseudo-random but fully deterministic (seeded by plane index),
  so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.nested import quote

__all__ = [
    "cosine", "dot", "norm", "brute_force_topk", "srp_bucket",
    "quantize_embeddings", "dequantize_embeddings", "quantized_topk",
    "random_projection",
    "srp_probe_buckets", "lsh_topk",
    "ivf_centroids", "ivf_topk", "kmeans_refine",
    "pq_codebooks", "pq_encode", "pq_decode", "pq_topk", "ivfpq_topk",
    "pq_adc_scores",
    "with_ivf_residuals",
    "knn_join", "hard_negatives", "recall_at_k", "semantic_decontaminate",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _per_query_topk(
    scored: DataFrame,
    k: int,
    partial_buckets: int | None = None,
    score_col: str = "cos_sim",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Two-stage tournament top-k over (query_id, ``id_col``, ``score_col``).

    A single ``Window.partitionBy("query_id")`` would funnel EVERY scored row
    for a query through one task — with 10 queries over a 100 TB corpus that
    is 10 tasks holding the world. Stage 1 ranks within (query_id, salt)
    slices — the full scored volume shuffles once but spreads over
    ``queries x partial_buckets`` tasks, and only k rows survive per slice.
    Stage 2 ranks the <= k*partial_buckets survivors per query — a tiny
    shuffle. Exact top-k is invariant under the tournament, so results are
    identical to the single-window plan.
    """
    if partial_buckets is None:
        from ..session import default_parallelism

        partial_buckets = default_parallelism(scored.sparkSession) * 4
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy("query_id", "__salt").orderBy(*order)
    pre = (
        scored.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_buckets)),
        )
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return pre.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    partial_buckets: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus rows.

    Output: (query_id, neighbor_id, cos_sim, rank). The query side is
    broadcast (it's the small side by construction); the corpus streams
    through map-side — total cost one corpus scan, then the two-stage
    tournament top-k (:func:`_per_query_topk`, no per-query hotspot task).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("__qv").cast("array<double>"), F.col("__cv").cast("array<double>")
        ).alias("cos_sim"),
    )
    return _per_query_topk(scored, k, partial_buckets)


def _lit_double_array(values) -> Column:
    """Literal ``array<double>`` in ONE py4j call (a parsed SQL
    expression). Building constant arrays element-by-element
    (``F.array(*[F.lit(x) ...])``) costs a py4j round trip per element —
    a 16-plane x 256-dim SRP plane set is ~8000 round trips, seconds of
    DRIVER time per query build before Spark ever sees the plan. ``repr``
    of a Python float round-trips exactly and Java's Double.parseDouble
    is correctly rounded, so the literal doubles are bit-identical to the
    F.lit formulation."""
    return F.expr(
        "array(" + ",".join(repr(float(v)) + "D" for v in values) + ")")


def _lit_double_matrix(rows) -> Column:
    """Literal ``array<array<double>>`` in one py4j call (see
    :func:`_lit_double_array`)."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in row) + ")"
            for row in rows
        ) + ")")


def plane_component(plane: int, dim_idx: int) -> float:
    """Deterministic ±1 hyperplane entry from md5('plane:dim') parity.

    Computed driver-side once per (plane, dim) — NOT per row. The DuckDB
    oracle reproduces the identical value from the same md5 formula.
    """
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim_idx}".encode()).hexdigest()[:4], 16)
    return 1.0 if h % 2 == 0 else -1.0


@functools.lru_cache(maxsize=4096)
def _plane_literal(plane: int, n_dims: int) -> Column:
    """Cached literal array for SRP plane ``plane`` over ``n_dims``
    dimensions. The plane set is deterministic (md5 parity), so the
    Column is memoized — repeated LSH query builds (every lsh_topk /
    knn_join / hard_negatives call) pay the md5 loop and expression
    parse once per (plane, n_dims) per process instead of per build."""
    return _lit_double_array(
        [plane_component(plane, i) for i in range(n_dims)])


@functools.lru_cache(maxsize=4096)
def _plane_sql(plane: int, n_dims: int) -> str:
    return ("array(" + ",".join(
        repr(plane_component(plane, i)) + "D" for i in range(n_dims)) + ")")


def _srp_bucket_sql(
    vec_sql: str, num_planes: int, n_dims: int, plane_offset: int,
) -> str:
    """The :func:`srp_bucket` expression as SQL TEXT over a column
    reference — parsed JVM-side in ONE py4j round trip. Column-object
    construction costs a round trip per node (~2-8 ms each on this
    gateway): a 2-table 8-plane bucket pair was multiple SECONDS of
    driver time per query build. The parsed tree is node-for-node the
    expression the Column form builds (same zip_with/aggregate fold,
    same casts), so values — and the DuckDB oracles — are unchanged."""
    bits = []
    for p in range(num_planes):
        d = (
            f"aggregate(zip_with({vec_sql}, "
            f"slice({_plane_sql(plane_offset + p, n_dims)}, 1, "
            f"size({vec_sql})), (v, c) -> CAST(v AS DOUBLE) * c), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {d} > 0 THEN {1 << p}L ELSE 0L END)")
    return "(" + " + ".join(bits) + ")"


def _srp_tables_expr(
    vec_sql: str, num_planes: int, num_tables: int, dim: int | None = None,
) -> Column:
    """``array<long>`` of one SRP bucket per table (what every LSH
    corpus/self-join side explodes), as one parsed expression."""
    n_dims = dim or 256
    return F.expr(
        "array(" + ",".join(
            _srp_bucket_sql(vec_sql, num_planes, n_dims, t * num_planes)
            for t in range(num_tables)
        ) + ")")


def _srp_probe_sql(
    vec_sql: str, num_planes: int, multi_probe: int, n_dims: int,
    plane_offset: int,
) -> str:
    """:func:`srp_probe_buckets` as SQL text (see
    :func:`_srp_bucket_sql`): own bucket plus the ``multi_probe``
    smallest-margin bit flips."""
    dots = []
    for p in range(num_planes):
        dots.append(
            f"aggregate(zip_with({vec_sql}, "
            f"slice({_plane_sql(plane_offset + p, n_dims)}, 1, "
            f"size({vec_sql})), (v, c) -> CAST(v AS DOUBLE) * c), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    bucket = "(" + " + ".join(
        f"(CASE WHEN {dots[p]} > 0 THEN {1 << p}L ELSE 0L END)"
        for p in range(num_planes)
    ) + ")"
    if multi_probe <= 0:
        return f"array({bucket})"
    flips = "array(" + ",".join(
        f"named_struct('m', abs({dots[p]}), 'b', ({bucket} ^ {1 << p}L))"
        for p in range(num_planes)
    ) + ")"
    probed = (
        f"transform(slice(array_sort({flips}), 1, "
        f"{min(multi_probe, num_planes)}), s -> s.b)"
    )
    return f"concat(array({bucket}), {probed})"


def srp_bucket(
    vec: Column, num_planes: int = 8, dim: int | None = None,
    plane_offset: int = 0,
) -> Column:
    """Sign-random-projection bucket id (0 .. 2^num_planes - 1).

    bit p = sign(dot(vec, plane_p)). Planes are ±1 literals baked into the
    plan (an 8x64 constant matrix costs nothing per row); without ``dim``
    the plane entry is looked up positionally from a literal array, handling
    any vector length up to 256 (pass ``dim`` for larger or exact sizing).
    ``plane_offset`` shifts into a disjoint plane set — table t of a
    multi-table LSH uses ``plane_offset=t*num_planes`` so its buckets are
    independent of table t-1's.
    """
    n_dims = dim or 256
    bits = []
    for p in range(num_planes):
        plane = _plane_literal(plane_offset + p, n_dims)
        d = F.aggregate(
            F.zip_with(vec, F.slice(plane, 1, F.size(vec)),
                       lambda v, c: v.cast("double") * c),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def seed_vectors(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int = 16,
) -> list[tuple[int, list[float]]]:
    """The ``n`` corpus vectors with the smallest md5(id) — the shared
    deterministic seeding rule of the whole ANN family (no RNG state,
    identical in any engine). ``orderBy(md5).limit(n)`` plans as a
    map-side partial top-k (TakeOrderedAndProject): no full sort, no
    extra shuffle, even over a 100 TB corpus. A PREFIX property holds:
    the first k of ``seed_vectors(n)`` equal ``seed_vectors(k)``, so one
    scan can seed both the IVF and the PQ codebooks (see
    :func:`ivfpq_topk`)."""
    rows = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(n)
        .collect()
    )
    return [(cid, r["__v"]) for cid, r in enumerate(rows)]


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 0,
    seeds: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF centroids: seeds are the ``n_centroids`` corpus
    vectors with the smallest md5(id) — a reproducible pseudo-random sample
    (no RNG state, identical in any engine). ``orderBy(md5).limit(n)``
    plans as a map-side partial top-k (TakeOrderedAndProject): no full
    sort, no extra shuffle, even over a 100 TB corpus.

    ``n_iters>0`` refines the seeds with that many Lloyd k-means rounds
    (:func:`kmeans_refine`, cosine assignment — the search metric): each
    round is one plan-literal assignment projection + one partial-agg
    shuffle of per-centroid dimension sums. Deterministic (HALF_UP-rounded
    means), so oracles can replay the refinement exactly.

    ``seeds``: pre-fetched :func:`seed_vectors` rows (a prefix slice is
    fine) — saves the seed scan when the caller already paid for one.
    """
    if seeds is None:
        seeds = seed_vectors(corpus, id_col, vec_col, n_centroids)
    else:
        seeds = list(seeds[:n_centroids])
    return kmeans_refine(
        corpus, seeds, n_iters, vec_expr=vec_col, metric="cosine"
    )


def _round_half_up(x: float, decimals: int) -> float:
    """Engine-portable HALF_UP rounding (Spark ROUND / DuckDB round both
    round halves away from zero; Python's built-in ``round`` is banker's and
    would disagree at exact halves)."""
    import decimal

    q = decimal.Decimal(1).scaleb(-decimals)
    return float(
        decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def kmeans_refine(
    corpus: DataFrame,
    seeds: list[tuple[int, list[float]]],
    n_iters: int = 2,
    vec_expr: Column | str = "embedding",
    metric: str = "cosine",
    decimals: int = 6,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means refinement of seed centroids, the Spark-native way.

    Each round is (a) nearest-centroid assignment as a plan-literal
    projection — zero shuffle at any corpus size — and (b) per-centroid
    means via ONE partial-aggregated shuffle: ``groupBy(cid).agg(count,
    sum(v[0]) .. sum(v[dim-1]))`` combines map-side, so only
    ``n_centroids x (dim+1)`` doubles per input partition cross the wire,
    never vectors. The n_centroids result rows collect to the driver and
    become the next round's plan literals.

    Determinism contract: means are rounded HALF_UP to ``decimals`` places
    each round, so the refinement is reproducible to the digit in any
    engine (the DuckDB oracles replay it; double-sum ordering differences
    across engines vanish at 1e-6 granularity). Empty clusters keep their
    previous centroid. ``metric`` is ``cosine`` (IVF's search metric) or
    ``l2`` (classic k-means / PQ's code metric).

    Production note (reference parity): the reference library has no ANN
    index at all — this is the beyond-reference scale path, and with
    ``n_iters>0`` the docstring promise of "production would refine with
    k-means" is now the shipped behavior.
    """
    if not seeds or n_iters <= 0:
        return seeds
    dim = len(seeds[0][1])
    vec = F.col(vec_expr) if isinstance(vec_expr, str) else vec_expr
    base = corpus.select(vec.cast("array<double>").alias("__v"))
    # every Lloyd round scans the full vector set: persist the projection
    # once (memory, spilling to disk) so rounds 2..n read cached columns
    # instead of re-decoding parquet — and lineage stays bounded
    from pyspark import StorageLevel

    persisted = n_iters > 1
    if persisted:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    cents = seeds
    # the per-dimension sums ride in ONE parsed expression: dim separate
    # F.sum(F.col("__v")[i]) Columns cost a py4j round trip each (~0.6 s
    # of pure driver time per round at dim=64) and re-enter analysis as
    # dim independent aggregate columns. array(sum(...), ...) is the same
    # dim aggregate functions (bit-identical per-sum folds) assembled
    # into one result array by a single driver call.
    sums_expr = F.expr(
        "array(" + ",".join(f"sum(__v[{i}])" for i in range(dim)) + ")"
    ).alias("__sums")
    for _ in range(n_iters):
        assigned = with_nearest_ids(
            base, F.col("__v"), cents, 1, "__cids", metric
        ).withColumn("__cid", F.col("__cids")[0])
        rows = (
            assigned
            .groupBy("__cid")
            .agg(F.count("*").alias("__n"), sums_expr)
            .collect()
        )
        by_cid = {r["__cid"]: r for r in rows}
        nxt = []
        for c, old in cents:
            r = by_cid.get(c)
            if r and r["__n"]:
                nxt.append(
                    (c, [_round_half_up(s / r["__n"], decimals)
                         for s in r["__sums"]])
                )
            else:
                nxt.append((c, old))
        cents = nxt
    if persisted:
        base.unpersist()
    return cents


def _nearest_centroids(
    vec: Column, centroids: list[tuple[int, list[float]]], n: int
) -> Column:
    """Ids of the ``n`` centroids nearest to ``vec`` by cosine (desc, ties to
    the smaller id). Centroids are plan literals, so this is a pure per-row
    projection — zero shuffle regardless of corpus size."""
    scored = F.array(
        *[
            F.struct(
                cosine(vec, _lit_double_array(cv)).alias("cs"),
                F.lit(-cid).cast("long").alias("ncid"),
            )
            for cid, cv in centroids
        ]
    )
    # ascending (cs, -cid) reversed = cs desc with ties broken to smaller cid
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
    return F.transform(top, lambda s: -s["ncid"])


# Above this many centroids (per codebook, for PQ) the plan-literal
# assignment expressions switch to a broadcast centroid TABLE: a literal
# F.array of n_centroids struct(vector) entries means O(n_centroids x dim)
# Column nodes — at the 10^4-10^5 centroids a real 100 TB IVF needs, the
# plan alone is tens of MB and whole-stage codegen overflows the JVM's
# 64KB method limit (the same failure random_projection hit with a literal
# out_dim x dim matrix). Below the threshold the literal path wins: the
# constants fold straight into codegen with no extra join node.
_LITERAL_CENTROID_MAX = 32


def _centroid_tbl_literal(centroids: list[tuple[int, list[float]]]) -> Column:
    """The centroid table (``array<struct<cid: long, v: array<double>>>``)
    as ONE parsed literal expression — the plan-literal twin of
    :func:`_centroid_table_df`'s broadcast row."""
    return F.expr(
        "array(" + ",".join(
            f"named_struct('cid', {int(cid)}L, 'v', array("
            + ",".join(repr(float(x)) + "D" for x in cv) + "))"
            for cid, cv in centroids
        ) + ")")


def _centroid_table_df(spark, centroids: list[tuple[int, list[float]]]):
    """ONE-row frame carrying the centroid table as
    ``array<struct<cid: long, v: array<double>>>`` — crossJoined broadcast
    (a BroadcastNestedLoopJoin of one row, i.e. a constant), so assignment
    stays a per-row projection with O(1) plan nodes at any centroid count.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(
            "__cent_tbl",
            T.ArrayType(T.StructType([
                T.StructField("cid", T.LongType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ])),
        )
    ])
    data = [([(int(cid), [float(x) for x in cv]) for cid, cv in centroids],)]
    return spark.createDataFrame(data, schema)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 as the same left fold every assignment path uses, so the
    literal and broadcast-table paths are bit-identical per centroid."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _nearest_ids_tbl(vec: Column, tbl: Column, n: int, metric: str) -> Column:
    """``array<long>`` of the n nearest centroid ids where ``tbl`` is a
    centroid-table COLUMN (``array<struct<cid, v>>``) instead of plan
    literals. Same per-centroid math and tie rules as the literal
    expressions (:func:`_nearest_centroids` / :func:`_nearest_l2_ids`), so the
    two paths agree bit-for-bit; the HOF form just keeps plan size O(1)."""
    if metric == "l2":
        scored = F.transform(
            tbl,
            lambda c: F.struct(
                _l2sq(vec, c["v"]).alias("d2"), c["cid"].alias("cid")
            ),
        )
        return F.transform(
            F.slice(F.array_sort(scored), 1, n), lambda s: s["cid"]
        )
    scored = F.transform(
        tbl,
        lambda c: F.struct(
            cosine(vec, c["v"]).alias("cs"), (-c["cid"]).alias("ncid")
        ),
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
    return F.transform(top, lambda s: -s["ncid"])


# Above this many centroids the broadcast-table HOF fold (interpreted
# per element: n_centroids x dim lambda evaluations PER ROW) becomes the
# CPU bottleneck — the third tier switches to Arrow-batched NumPy matmul
# (BLAS, the FAISS assignment shape): one (batch x dim) @ (dim x k) per
# batch. The HOF tier stays the default in 33..128 because it is
# bit-identical to the literal path (same fold order); the matmul tier is
# mathematically identical but sums in a different order, so exact ties
# between centroids could in principle break differently (measure-zero on
# real embeddings; tie rule is still smallest-cid on EXACT float ties).
_HOF_CENTROID_MAX = 128


def _with_nearest_ids_matmul(
    df: DataFrame,
    vec: Column,
    centroids: list[tuple[int, list[float]]],
    n: int,
    out: str,
    metric: str,
) -> DataFrame:
    """Vectorized nearest-centroid assignment: the centroid matrix ships
    once inside the serialized task (O(1) plan nodes, like the broadcast
    table) and every Arrow batch is one NumPy matmul + argsort — the
    10^4-10^5-centroid regime where interpreted HOF folds would burn
    n_centroids x dim lambda evaluations per row. NULL/empty vectors get
    a NULL id array."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    tagged = df.withColumn("__mmv", vec.cast("array<double>"))
    cids = np.asarray([int(c) for c, _ in centroids], np.int64)
    mat = np.asarray([v for _, v in centroids], np.float64)  # (k, dim)
    if metric == "cosine":
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
    else:
        c2 = (mat * mat).sum(axis=1)
    keep = [f for f in tagged.schema.fields if f.name != "__mmv"]
    schema = T.StructType(
        keep + [T.StructField(out, T.ArrayType(T.LongType()))]
    )
    names = [f.name for f in keep]

    def gen(batches):
        for pdf in batches:
            res = [None] * len(pdf)
            vecs = pdf["__mmv"]
            ok = [
                i for i, v in enumerate(vecs)
                if v is not None and len(v) == mat.shape[1]
            ]
            if ok:
                V = np.stack([np.asarray(vecs.iloc[i], np.float64)
                              for i in ok])
                if metric == "cosine":
                    vn = np.linalg.norm(V, axis=1)
                    vn[vn == 0] = 1.0
                    scores = -((V / vn[:, None]) @ matn.T)  # asc = best
                else:
                    scores = (V * V).sum(1)[:, None] - 2.0 * (V @ mat.T) + c2
                # stable sort: exact ties resolve to the smaller cid
                order = np.argsort(scores, axis=1, kind="stable")[:, :n]
                picked = cids[order]
                for j, i in enumerate(ok):
                    res[i] = picked[j].tolist()
            o = pdf[names].copy()
            o[out] = res
            yield o

    return tagged.mapInPandas(gen, schema=schema)


def _nearest_l2_ids(
    vec: Column, centroids: list[tuple[int, list[float]]], n: int
) -> Column:
    """n-ids generalization of :func:`_nearest_l2` (literal path)."""
    scored = F.array(
        *[
            F.struct(
                _l2sq(vec, _lit_double_array(cv)).alias("d2"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cv in centroids
        ]
    )
    return F.transform(F.slice(F.array_sort(scored), 1, n), lambda s: s["cid"])


def with_nearest_ids(
    df: DataFrame,
    vec: Column,
    centroids: list[tuple[int, list[float]]],
    n: int = 1,
    out: str = "__cids",
    metric: str = "cosine",
) -> DataFrame:
    """Add ``out`` = ``array<long>`` of the ``n`` nearest centroid ids to
    ``vec`` (cosine desc or squared-L2 asc; ties to the smaller id).

    The scale switch of the whole ANN family, three tiers:

    * <= ``_LITERAL_CENTROID_MAX`` (32): plan-literal projection —
      constants fold into codegen, zero extra plan nodes.
    * <= ``_HOF_CENTROID_MAX`` (128): the centroid matrix rides as ONE
      broadcast single-row table and the argmin is a HOF over that array
      column — O(1) plan nodes, bit-identical to the literal path (same
      fold order).
    * above: Arrow-batched NumPy matmul assignment
      (:func:`_with_nearest_ids_matmul`) — the FAISS shape; interpreted
      HOF folds would cost n_centroids x dim lambda evaluations per row,
      which at 10^4+ centroids dominates the whole scan.
    """
    if len(centroids) <= _LITERAL_CENTROID_MAX:
        # literal tier through the SAME HOF expression as the broadcast
        # tier, with the centroid table as ONE parsed literal — the
        # unrolled per-centroid expressions (_nearest_centroids /
        # _nearest_l2_ids) are bit-identical but cost a py4j round trip
        # per Column node to BUILD (~2-8 ms each on this gateway; dozens
        # of centroids = seconds of driver time per query construction)
        return df.withColumn(
            out, _nearest_ids_tbl(vec, _centroid_tbl_literal(centroids),
                                  n, metric)
        )
    if len(centroids) <= _HOF_CENTROID_MAX:
        tbl = _centroid_table_df(df.sparkSession, centroids)
        return (
            df.crossJoin(F.broadcast(tbl))
            .withColumn(
                out, _nearest_ids_tbl(vec, F.col("__cent_tbl"), n, metric)
            )
            .drop("__cent_tbl")
        )
    return _with_nearest_ids_matmul(df, vec, centroids, n, out, metric)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: assign every corpus vector to its nearest
    centroid (the inverted file); each query probes only its ``n_probe``
    nearest centroids' lists and exact-reranks those candidates.
    ``n_iters`` Lloyd rounds refine the md5-seeded centroids first
    (:func:`kmeans_refine`) — tighter clusters, better recall at the same
    probe budget.

    Scan cost per query drops from |corpus| to ~|corpus| * n_probe /
    n_centroids. The probe lists explode to (query, centroid) rows so the
    candidate join is a plain equi-join on centroid id — hash-partitioned,
    broadcastable when the query set is small, and prunable at the storage
    layer if the corpus is written partitioned/bucketed by ``centroid_id``.
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, n_iters)
    c = with_nearest_ids(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ),
        F.col("__cv"), cents, 1,
    ).select(
        "neighbor_id", "__cv", F.col("__cids")[0].alias("__cid")
    )
    q = with_nearest_ids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        ),
        F.col("__qv"), cents, n_probe,
    ).select(
        "query_id", "__qv", F.explode(F.col("__cids")).alias("__cid")
    )
    scored = (
        c.join(F.broadcast(q), on="__cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    return _per_query_topk(scored, k)


def _pq_refine_fused(
    corpus: DataFrame,
    books: list[list[list[float]]],
    n_iters: int,
    vec: Column,
    d_sub: int,
    decimals: int = 6,
) -> list[list[list[float]]]:
    """Lloyd refinement of ALL PQ subspace codebooks in ONE Spark job per
    iteration: each row explodes into ``n_sub`` (subspace, assigned-cid,
    subvector) entries and a single ``groupBy(s, cid)`` partial-agg
    shuffle carries ``n_sub * n_centroids * (d_sub + 1)`` doubles per
    input partition. Numerically identical to refining each subspace
    with :func:`kmeans_refine` (same literal assignment expressions,
    same HALF_UP-rounded means) — the sequential form costs ``n_sub``
    full corpus scans per iteration instead of one, which at small data
    is pure job-count overhead and at 100 TB is ``n_sub`` extra reads of
    the entire vector column."""
    from pyspark import StorageLevel

    n_sub = len(books)
    base = corpus.select(vec.alias("__v"))
    persisted = n_iters > 1
    if persisted:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(n_iters):
        entries = F.array(*[
            F.struct(
                F.lit(s).alias("s"),
                _nearest_ids_tbl(
                    F.slice(F.col("__v"), s * d_sub + 1, d_sub),
                    _centroid_tbl_literal(list(enumerate(books[s]))),
                    1, "l2",
                )[0].alias("cid"),
                F.slice(F.col("__v"), s * d_sub + 1, d_sub).alias("sv"),
            )
            for s in range(n_sub)
        ])
        rows = (
            base.select(F.explode(entries).alias("e"))
            .select(
                F.col("e.s").alias("s"),
                F.col("e.cid").alias("cid"),
                F.col("e.sv").alias("sv"),
            )
            .groupBy("s", "cid")
            .agg(
                F.count("*").alias("__n"),
                # one parsed expression for all d_sub sums (the
                # kmeans_refine py4j lesson); per-sum folds unchanged
                F.expr(
                    "array("
                    + ",".join(f"sum(sv[{i}])" for i in range(d_sub))
                    + ")"
                ).alias("__sums"),
            )
            .collect()
        )
        by = {(r["s"], r["cid"]): r for r in rows}
        for s in range(n_sub):
            nxt = []
            for cid, old in enumerate(books[s]):
                r = by.get((s, cid))
                if r and r["__n"]:
                    nxt.append(
                        [_round_half_up(sv / r["__n"], decimals)
                         for sv in r["__sums"]]
                    )
                else:
                    nxt.append(old)
            books[s] = nxt
    if persisted:
        base.unpersist()
    return books


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    n_centroids: int = 8,
    n_iters: int = 0,
    seeds: list[tuple[int, list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``codebooks[s][c]``
    starts as the subspace-``s`` slice of the ``c``-th seed vector (the
    ``n_centroids`` corpus vectors with the smallest md5(id), exactly the
    IVF seeding rule — reproducible in any engine, no RNG state).

    ``n_iters>0`` then refines EACH subspace codebook independently with
    that many Lloyd rounds over the corpus' subvector slices
    (squared-L2 assignment — the same metric ``pq_encode`` uses for code
    assignment). All subspaces refine in ONE job per round
    (:func:`_pq_refine_fused`): a single partial-agg shuffle of
    ``n_sub x n_centroids x (d_sub+1)`` doubles per input partition —
    the sequential per-subspace form would re-scan the corpus ``n_sub``
    times per round. Above the plan-literal centroid tier the
    per-subspace :func:`kmeans_refine` fallback keeps plan size bounded.
    The code layout is unchanged either way.

    ``seeds``: pre-fetched :func:`seed_vectors` (prefix slice fine).
    """
    if seeds is None:
        seeds = seed_vectors(corpus, id_col, vec_col, n_centroids)
    else:
        seeds = list(seeds[:n_centroids])
    dim = len(seeds[0][1])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d_sub = dim // n_sub
    books = [
        [vec[s * d_sub:(s + 1) * d_sub] for _, vec in seeds]
        for s in range(n_sub)
    ]
    if n_iters > 0:
        vec = F.col(vec_col).cast("array<double>")
        if n_centroids <= _LITERAL_CENTROID_MAX:
            books = _pq_refine_fused(corpus, books, n_iters, vec, d_sub)
        else:
            for s in range(n_sub):
                sub_seeds = list(enumerate(books[s]))
                refined = kmeans_refine(
                    corpus, sub_seeds, n_iters,
                    vec_expr=F.slice(vec, s * d_sub + 1, d_sub),
                    metric="l2",
                )
                books[s] = [cv for _, cv in refined]
    return books


def _pq_code_expr(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of per-subspace nearest-centroid ids (squared-L2,
    ties to the smaller id). Codebooks are plan literals — pure per-row
    projection, zero shuffle at any corpus size."""
    n_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    codes = []
    for s, cb in enumerate(codebooks):
        sub = F.slice(vec, s * d_sub + 1, d_sub)
        scored = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sub, _lit_double_array(cvec),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0).cast("double"),
                        lambda acc, v: acc + v,
                    ).alias("d2"),
                    F.lit(cid).cast("long").alias("cid"),
                )
                for cid, cvec in enumerate(cb)
            ]
        )
        codes.append(F.array_sort(scored)[0]["cid"].cast("int"))
    return F.array(*codes)


def _codebook_table_df(spark, codebooks: list[list[list[float]]]):
    """ONE-row frame carrying the PQ codebooks as
    ``array<array<array<double>>>`` (``[subspace][centroid][dim]``) — the
    broadcast twin of the plan-literal codebook, same rationale as
    :func:`_centroid_table_df`."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(
            "__cb_tbl",
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
        )
    ])
    data = [([[list(map(float, cv)) for cv in cb] for cb in codebooks],)]
    return spark.createDataFrame(data, schema)


def _cb_literal(codebooks: list[list[list[float]]]) -> Column:
    """The codebooks as one literal nested-array expression (single
    parsed expression — one py4j call for the whole
    subspace x centroid x dim tensor)."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in cvec) + ")"
                for cvec in cb
            ) + ")"
            for cb in codebooks
        ) + ")"
    )


def _pq_code_expr_tbl(
    vec: Column, cbt: Column, n_sub: int, d_sub: int
) -> Column:
    """``array<int>`` of per-subspace nearest-centroid ids where ``cbt``
    is a codebook-table COLUMN — bit-identical math and tie rule (smaller
    id) to :func:`_pq_code_expr`, O(1) plan nodes at any centroid count."""
    return F.transform(
        cbt,
        lambda cb_s, s: F.array_sort(
            F.transform(
                cb_s,
                lambda cvec, c: F.struct(
                    _l2sq(
                        F.slice(vec, s * d_sub + 1, F.lit(d_sub)), cvec
                    ).alias("d2"),
                    c.cast("long").alias("cid"),
                ),
            )
        )[0]["cid"].cast("int"),
    )


def _with_pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec: Column,
    out: str,
) -> DataFrame:
    """Threshold switch for PQ code assignment: plan-literal codebooks at
    or below ``_LITERAL_CENTROID_MAX`` centroids per codebook, ONE
    broadcast single-row codebook table above (see
    :func:`with_nearest_ids` for why)."""
    n_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    if len(codebooks[0]) <= _LITERAL_CENTROID_MAX:
        # same HOF expression as the broadcast tier over a ONE-call
        # parsed codebook literal (see with_nearest_ids' literal tier) —
        # bit-identical codes, O(py4j calls) = O(1) instead of
        # O(n_sub * n_centroids)
        return df.withColumn(
            out, _pq_code_expr_tbl(vec, _cb_literal(codebooks),
                                   n_sub, d_sub))
    tbl = _codebook_table_df(df.sparkSession, codebooks)
    return (
        df.crossJoin(F.broadcast(tbl))
        .withColumn(out, _pq_code_expr_tbl(vec, F.col("__cb_tbl"), n_sub, d_sub))
        .drop("__cb_tbl")
    )


def _with_centroid_vec(
    df: DataFrame,
    cid: Column,
    centroids: list[tuple[int, list[float]]],
    out: str,
) -> DataFrame:
    """Add ``out`` = the centroid VECTOR for the id in ``cid`` — the
    lookup residual quantization needs (``v - centroid[cid]``). Centroid
    ids from :func:`ivf_centroids` are dense 0..n-1, so the lookup is one
    ``element_at(ordered_vectors, cid + 1)``: O(1) per row at any
    centroid count. Tiered like every other centroid access: plan-literal
    array at or below ``_LITERAL_CENTROID_MAX``, ONE broadcast single-row
    table above."""
    ordered = sorted(centroids, key=lambda c: c[0])
    if [c for c, _ in ordered] != list(range(len(ordered))):
        raise ValueError("centroid ids must be dense 0..n-1")
    idx = (cid + 1).cast("int")
    if len(ordered) <= _LITERAL_CENTROID_MAX:
        lit = _lit_double_matrix([cv for _, cv in ordered])
        return df.withColumn(out, F.element_at(lit, idx))
    tbl = _centroid_table_df(df.sparkSession, ordered)
    return (
        df.crossJoin(F.broadcast(tbl))
        .withColumn(
            out,
            F.element_at(
                F.transform(F.col("__cent_tbl"), lambda c: c["v"]), idx
            ),
        )
        .drop("__cent_tbl")
    )


def with_ivf_residuals(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
    residual_col: str = "residual",
) -> DataFrame:
    """Ingest-side IVF residual computation: add ``cid_col`` (nearest
    coarse centroid, cosine — the IVF assignment) and ``residual_col``
    (``v - centroid[cid]``) to every corpus row. This is what a 100 TB
    pipeline persists once so that residual-PQ search
    (:func:`ivfpq_topk` with ``residual=True``) never touches raw
    vectors in the scan phase. Pure per-row projection — zero shuffle."""
    vec = F.col(vec_col).cast("array<double>")
    assigned = with_nearest_ids(corpus, vec, centroids, 1, out="__cids")
    assigned = assigned.withColumn(cid_col, F.col("__cids")[0]).drop("__cids")
    assigned = _with_centroid_vec(assigned, F.col(cid_col), centroids, "__cv0")
    return assigned.withColumn(
        residual_col, F.zip_with(vec, F.col("__cv0"), lambda a, b: a - b)
    ).drop("__cv0")


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Compress each vector to ``n_sub`` small ints — the 100 TB storage
    story: a 64-dim float vector (256 B) becomes 4-16 code bytes, and search
    runs against codes + codebooks without touching raw vectors. Above
    ``_LITERAL_CENTROID_MAX`` centroids per codebook the assignment runs
    against a broadcast codebook table instead of plan literals."""
    return _with_pq_codes(
        corpus, codebooks, F.col(vec_col).cast("array<double>"), code_col
    )


def pq_decode(
    codes: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Reconstruction vector from PQ codes: concatenate each subspace's
    selected centroid. Codebook is a plan-literal nested array; the lookup
    is ``element_at`` per subspace — per-row, JVM-side."""
    cb_lit = _cb_literal(codebooks)
    n_sub = len(codebooks)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda s: F.element_at(
                F.element_at(cb_lit, (s + 1).cast("int")),
                (F.element_at(codes, (s + 1).cast("int")) + 1).cast("int"),
            ),
        )
    )


def _with_pq_lut(
    df: DataFrame,
    qvec: Column,
    codebooks: list[list[list[float]]],
    out: str,
) -> DataFrame:
    """Per-QUERY-row ADC lookup tables: ``out[s][c]`` = squared L2 between
    the query's subspace-``s`` slice and codebook entry ``c`` — the
    standard PQ asymmetric-distance table (Jégou et al. 2011 §III-B,
    FAISS's LUT scan). Computed ONCE per query row (queries are the small
    side by contract), so candidate scoring becomes O(n_sub) table
    lookups instead of an O(dim) reconstruction distance per (query,
    candidate) pair. Codebooks ride as plan literals below the threshold,
    as a broadcast table above."""
    n_sub = len(codebooks)
    d_sub = len(codebooks[0][0])

    def lut_expr(cbt: Column) -> Column:
        return F.transform(
            cbt,
            lambda cb_s, s: F.transform(
                cb_s,
                lambda cvec: _l2sq(
                    F.slice(qvec, s * d_sub + 1, F.lit(d_sub)), cvec
                ),
            ),
        )

    if len(codebooks[0]) <= _LITERAL_CENTROID_MAX:
        return df.withColumn(out, lut_expr(_cb_literal(codebooks)))
    tbl = _codebook_table_df(df.sparkSession, codebooks)
    return (
        df.crossJoin(F.broadcast(tbl))
        .withColumn(out, lut_expr(F.col("__cb_tbl")))
        .drop("__cb_tbl")
    )


def _pq_adc_expr(lut: Column, codes: Column) -> Column:
    """ADC distance from a per-query LUT and a candidate's codes:
    ``sum_s lut[s][codes[s]]`` — n_sub lookups + adds per pair. The
    subspace-grouped summation order is the contract the oracles replay
    (it differs from a full-dimension fold only in FP association)."""
    return F.aggregate(
        F.zip_with(
            lut, codes, lambda t, c: F.element_at(t, (c + 1).cast("int"))
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


# Default implementation for the PQ ADC scan phase. "arrow" scans codes
# in NumPy batches against driver-computed LUTs (bit-identical doubles,
# see _lut_numpy) — the shipped hot path; "sql" is the pure-expression
# twin the DuckDB oracles replay, kept selectable everywhere for the
# equality gate and as the plan-audit LUT proof.
_ADC_IMPL = "arrow"


def _lut_numpy(qv, codebooks: list[list[list[float]]]):
    """ADC lookup table for ONE query vector as a ``(n_sub, n_centroids)``
    float64 array — the NumPy twin of :func:`_with_pq_lut`'s SQL
    expression. Accumulates ``(q_j - c_j)^2`` per subspace dimension in
    the SAME left-to-right order as the SQL ``_l2sq`` fold (acc starts at
    0.0, one add per dimension), so every entry is bit-identical to what
    the expression path (and therefore the unrolled SQL oracle) computes.
    """
    import numpy as np

    n_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    q = np.asarray(qv, np.float64)
    cb = np.asarray(codebooks, np.float64)  # (n_sub, n_cent, d_sub)
    lut = np.zeros((n_sub, cb.shape[1]), np.float64)
    for s in range(n_sub):
        acc = np.zeros(cb.shape[1], np.float64)
        base = s * d_sub
        for j in range(d_sub):
            d = q[base + j] - cb[s, :, j]
            acc = acc + d * d
        lut[s] = acc
    return lut


def _adc_scan_topk_arrow(
    codes_df: DataFrame,
    entries: list[tuple[object, int | None, "object"]],
    per_q: int,
    id_col: str = "neighbor_id",
    code_col: str = "pq_code",
    cell_col: str | None = None,
    qid_type=None,
) -> DataFrame:
    """Arrow-batched ADC candidate scan: NumPy gather-adds over PQ codes
    against driver-shipped per-query LUTs, keeping only each batch's
    top-``per_q`` candidates per query.

    ``entries`` is the (small-by-contract) query side, collected on the
    driver: ``(query_id, cell_or_None, lut)`` with ``lut`` from
    :func:`_lut_numpy`. With ``cell_col`` set, a query scores only the
    batch rows in its probed cells (the IVFPQ shape — the broadcast
    ``__cid`` join becomes a closure lookup); without it every query
    scores every row (the flat PQ shape — the crossJoin disappears).

    Numbers are bit-identical to the SQL twin (:func:`_pq_adc_expr`):
    per pair the subspace terms accumulate left-to-right from 0.0 exactly
    like the fold, on the same LUT doubles. Candidate selection replays
    :func:`_per_query_topk`'s total order (distance asc, id asc), and
    per-batch truncation is tournament-exact: the global top-``per_q``
    is invariant as long as every batch keeps ``per_q`` survivors.

    At 100 TB this is the FAISS ADC scan shape: the scan reads
    (id, code[, cell]) only — never a raw vector — each Arrow batch costs
    ``n_sub`` vectorized gathers instead of interpreted per-row HOF
    folds, and ~``per_q`` rows per (query, batch) leave the scan instead
    of the full |queries| x |codes| pair blow-up.

    Rows with a NULL code or (when ``cell_col`` is set) a NULL cell are
    skipped — the SQL twin never ranks them either (null scores sort
    last; null cells don't survive the cid equi-join).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    nid_field0 = next(f for f in codes_df.schema.fields if f.name == id_col)
    if not entries:
        empty = T.StructType([
            T.StructField("query_id", qid_type or nid_field0.dataType),
            T.StructField("neighbor_id", nid_field0.dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ])
        return codes_df.sparkSession.createDataFrame([], empty)
    luts = np.stack([lut for _, _, lut in entries])
    qids = [qid for qid, _, _ in entries]
    n_sub = luts.shape[1]
    by_cell = cell_col is not None
    if by_cell:
        cell_entries: dict[int, list[int]] = {}
        for i, (_, cell, _) in enumerate(entries):
            cell_entries.setdefault(int(cell), []).append(i)
        cell_idx = {c: np.asarray(v, np.int64)
                    for c, v in cell_entries.items()}

    schema = T.StructType([
        T.StructField("query_id", qid_type or nid_field0.dataType),
        T.StructField("neighbor_id", nid_field0.dataType),
        T.StructField("cos_sim", T.DoubleType()),
    ])
    cols = [id_col, code_col] + ([cell_col] if by_cell else [])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ok = pdf[code_col].notna()
            if by_cell:
                ok &= pdf[cell_col].notna()
            pdf = pdf[ok]
            if not len(pdf):
                continue
            codes = np.asarray(
                [np.asarray(c, np.int64) for c in pdf[code_col]])
            ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []

            def block(es, rows):
                sub = codes[rows]
                d = np.zeros((len(es), len(rows)), np.float64)
                ls = luts[es]
                for s in range(n_sub):
                    d += ls[:, s][:, sub[:, s]]
                rid = ids[rows]
                order_id = np.argsort(rid, kind="stable")
                for ei in range(len(es)):
                    sel = order_id[np.argsort(d[ei][order_id],
                                              kind="stable")]
                    qid = qids[int(es[ei])]
                    sel = sel[rid[sel] != qid][:per_q]
                    out_q.extend([qid] * len(sel))
                    out_n.extend(rid[sel].tolist())
                    out_s.extend((-d[ei][sel]).tolist())

            if by_cell:
                cells = pdf[cell_col].to_numpy()
                for c in np.unique(cells):
                    es = cell_idx.get(int(c))
                    if es is not None:
                        block(es, np.nonzero(cells == c)[0])
            else:
                block(np.arange(len(entries)), np.arange(len(pdf)))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s})

    return codes_df.select(*cols).mapInPandas(gen, schema=schema)


def pq_adc_scores(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lut",
    impl: str | None = None,
) -> DataFrame:
    """All-pairs ADC distances between encoded corpus rows and query
    vectors — the scan phase of :func:`pq_topk` exposed on its own (no
    top-k truncation), for ADC-quality evaluation and as the bench /
    oracle measurement surface. Output ``(query_id, neighbor_id,
    adc_dist)`` over every (query, code row) pair.

    ``method="lut"`` scores via per-query lookup tables (Jégou 2011 ADC
    — n_sub lookups per pair); ``method="recon"`` reconstructs each
    code's vector and takes a full O(dim) squared-L2 (the pre-LUT
    formulation, kept as the efficiency comparator). ``impl="arrow"``
    runs NumPy Arrow batches (shipped path), ``impl="sql"`` the pure
    expression twin. For each method the two impls produce bit-identical
    distances (same fold orders; a test asserts it); lut and recon differ
    from each other only by FP association (subspace-grouped vs full-dim
    summation, ~1e-15 relative).
    """
    import numpy as np

    impl = impl or _ADC_IMPL
    codes = codes_df.select(
        F.col(id_col).alias("neighbor_id"), "pq_code")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    if impl == "arrow":
        import pandas as pd

        from pyspark.sql import types as T

        qrows = q.collect()
        nid_field = next(
            f for f in codes.schema.fields if f.name == "neighbor_id")
        qid_field = next(
            f for f in q.schema.fields if f.name == "query_id")
        schema = T.StructType([
            T.StructField("query_id", qid_field.dataType),
            T.StructField("neighbor_id", nid_field.dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ])
        if method == "lut":
            luts = np.stack(
                [_lut_numpy(r["__qv"], codebooks) for r in qrows])
            n_sub = luts.shape[1]
        else:
            cb = np.asarray(codebooks, np.float64)  # (n_sub, n_cent, d_sub)
            qmat = np.asarray([r["__qv"] for r in qrows], np.float64)
        qids = [r["query_id"] for r in qrows]

        def gen(batches):
            for pdf in batches:
                pdf = pdf[pdf["pq_code"].notna()]
                if not len(pdf):
                    continue
                c = np.asarray(
                    [np.asarray(x, np.int64) for x in pdf["pq_code"]])
                ids = pdf["neighbor_id"].to_numpy()
                if method == "lut":
                    d = np.zeros((len(qids), len(pdf)), np.float64)
                    for s in range(n_sub):
                        d += luts[:, s][:, c[:, s]]
                else:
                    # reconstruct then fold (q_j - r_j)^2 in dim order —
                    # the same association as the SQL _l2sq twin
                    recon = np.concatenate(
                        [cb[s][c[:, s]] for s in range(cb.shape[0])],
                        axis=1)  # (B, dim)
                    d = np.zeros((len(qids), len(pdf)), np.float64)
                    for j in range(recon.shape[1]):
                        dj = qmat[:, j][:, None] - recon[:, j][None, :]
                        d += dj * dj
                out = pd.DataFrame({
                    "query_id": np.repeat(qids, len(pdf)),
                    "neighbor_id": np.tile(ids, len(qids)),
                    "adc_dist": d.reshape(-1),
                })
                yield out

        return codes.mapInPandas(gen, schema=schema)

    if method == "lut":
        ql = _with_pq_lut(q, F.col("__qv"), codebooks, "__lut").select(
            "query_id", "__lut")
        return codes.crossJoin(F.broadcast(ql)).select(
            "query_id", "neighbor_id",
            _pq_adc_expr(F.col("__lut"), F.col("pq_code")).alias("adc_dist"),
        )
    recon = codes.withColumn(
        "__rv", pq_decode(F.col("pq_code"), codebooks))
    return recon.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id",
        _l2sq(F.col("__qv"), F.col("__rv")).alias("adc_dist"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_sub: int = 4,
    n_centroids: int = 8,
    refine: int = 4,
    partial_buckets: int | None = None,
    n_iters: int = 0,
    impl: str | None = None,
) -> DataFrame:
    """PQ approximate top-k with exact re-rank (asymmetric distance via
    per-query LUTs): each query row precomputes the ``n_sub x
    n_centroids`` table of subspace squared-L2s once (:func:`_with_pq_lut`
    — Jégou et al. 2011 §III-B, FAISS's ADC scan), so scoring a candidate
    is ``n_sub`` lookups + adds over its CODES — the scan phase reads
    (id, pq_code) only, never raw vectors or O(dim) reconstructions.
    Keep ``refine * k`` ADC candidates per query, then re-rank those few
    exactly. Output (query_id, neighbor_id, rank) by ascending exact
    squared-L2.

    At scale the corpus stores ``pq_code`` at ingest (pq_encode) and this
    search touches ~n_sub bytes/row instead of the full vector — the
    standard memory-bound ANN formulation alongside IVF's compute-bound one.

    ``impl`` selects the ADC scan engine: ``"arrow"`` (default — NumPy
    Arrow batches against driver-computed LUTs, bit-identical doubles,
    see :func:`_adc_scan_topk_arrow`) or ``"sql"`` (the pure-expression
    oracle twin). Both return the same rows.
    """
    impl = impl or _ADC_IMPL
    cbs = pq_codebooks(corpus, id_col, vec_col, n_sub, n_centroids, n_iters)
    encoded = pq_encode(corpus, cbs, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "pq_code"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    if impl == "arrow":
        qrows = qv.collect()
        entries = [
            (r["query_id"], None, _lut_numpy(r["__qv"], cbs)) for r in qrows
        ]
        adc = _adc_scan_topk_arrow(
            encoded, entries, refine * k,
            qid_type=qv.schema["query_id"].dataType,
        )
    else:
        q = _with_pq_lut(qv, F.col("__qv"), cbs, "__lut")
        adc = encoded.crossJoin(
            F.broadcast(q.select("query_id", "__lut"))
        ).where(
            F.col("query_id") != F.col("neighbor_id")
        ).select(
            "query_id",
            "neighbor_id",
            (-_pq_adc_expr(F.col("__lut"), F.col("pq_code"))).alias("cos_sim"),
        )

    def l2sq(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    cand = _per_query_topk(adc, refine * k, partial_buckets).select(
        "query_id", "neighbor_id"
    )
    exact = (
        cand.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__cv"),
            ),
            on="neighbor_id",
        )
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            (-l2sq(F.col("__qv"), F.col("__cv"))).alias("cos_sim"),
        )
    )
    out = _per_query_topk(exact, k)
    return out.select("query_id", "neighbor_id", "rank")


def srp_probe_buckets(
    vec: Column,
    num_planes: int = 8,
    multi_probe: int = 0,
    dim: int | None = None,
    plane_offset: int = 0,
) -> Column:
    """``array<long>`` of SRP buckets to probe for a QUERY vector: its own
    bucket plus the ``multi_probe`` Hamming-distance-1 neighbors whose
    plane margins are smallest — the standard multi-probe LSH trick: the
    planes the vector barely cleared are the ones a true neighbor most
    likely landed on the other side of. All plan-literal arithmetic (the
    same md5-derived planes as :func:`srp_bucket`), per-row, zero shuffle;
    the CORPUS side keeps exactly one ingest-precomputable bucket per
    table, so multi-probe buys recall without touching the index layout.
    """
    n_dims = dim or 256
    dots = []
    for p in range(num_planes):
        plane = _plane_literal(plane_offset + p, n_dims)
        dots.append(
            F.aggregate(
                F.zip_with(vec, F.slice(plane, 1, F.size(vec)),
                           lambda v, c: v.cast("double") * c),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
        )
    bucket = None
    for p, d in enumerate(dots):
        bit = F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    if multi_probe <= 0:
        return F.array(bucket)
    flips = F.array(
        *[
            F.struct(
                F.abs(dots[p]).alias("m"),
                bucket.bitwiseXOR(F.lit(1 << p).cast("long")).alias("b"),
            )
            for p in range(num_planes)
        ]
    )
    probed = F.transform(
        F.slice(F.array_sort(flips), 1, min(multi_probe, num_planes)),
        lambda s: s["b"],
    )
    return F.concat(F.array(bucket), probed)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 1,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: SRP bucket equi-join then exact cosine re-rank.

    Recall improves with fewer planes (bigger buckets), more hash tables
    (``num_tables`` disjoint plane sets — a candidate only needs to collide
    in ONE), or ``multi_probe`` (each query additionally probes that many
    smallest-margin bit-flip buckets per table — table-free recall, see
    :func:`srp_probe_buckets`). The corpus bucket columns are
    precomputable ingest-side keys — at scale, write them at ingest and
    bucket/partition the table by them so queries touch only matching
    buckets (partition pruning instead of a full scan).
    """

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.posexplode(
            _srp_tables_expr(quote(vec_col), num_planes, num_tables)
        ).alias("__tbl", "__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.posexplode(
            F.expr("array(" + ",".join(
                _srp_probe_sql(quote(vec_col), num_planes, multi_probe,
                               256, t * num_planes)
                for t in range(num_tables)
            ) + ")")
        ).alias("__tbl", "__probes"),
    ).select(
        "query_id", "__qv", "__tbl", F.explode("__probes").alias("__bucket")
    )
    scored = c.join(F.broadcast(q), on=["__tbl", "__bucket"]).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("__qv").cast("array<double>"), F.col("__cv").cast("array<double>")
        ).alias("cos_sim"),
    )
    # the same pair can collide in several tables; identical score → distinct
    scored = scored.distinct()
    return _per_query_topk(scored, k)


def knn_join(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 2,
) -> DataFrame:
    """Self similarity join: approximate top-k neighbors for EVERY corpus
    vector — the all-rows k-NN behind near-dup graph building and
    SemDeDup-style mining, where :func:`lsh_topk`'s broadcast-the-queries
    shape no longer applies because the query side IS the corpus.

    Same SRP bucket scheme as :func:`lsh_topk`; candidates are pairs
    sharing a (table, bucket) key, matched by a plain shuffle equi-join
    (both sides hash-partition on the bucket key — no broadcast), then
    exact cosine reranks and ranks 1..k per vector survive.

    Scale shape: cost is the sum of per-bucket sizes squared, summed over
    tables — ``num_planes`` controls bucket granularity (more planes →
    smaller buckets → cheaper join, lower recall; add tables to buy
    recall back). AQE splits skewed mega-buckets. Never all-pairs: the
    plan must contain no CartesianProduct (plan-audited). Like
    :func:`hard_negatives`, the bucket self-join and the collision dedup
    shuffle only (id, table, bucket) — embeddings never ride the
    ``num_tables``-way bucket explosion; they are fetched once, by
    id-keyed joins, for the (much smaller) deduped pair set, and each
    surviving pair's cosine is evaluated exactly once instead of once
    per colliding table (round 10, guide-§8 decide-small/move-big).

    Returns ``(query_id, neighbor_id, cos_sim, rank)`` with rank 1..k.
    """
    buckets = _srp_tables_expr(quote(vec_col), num_planes, num_tables)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(buckets).alias("__tbl", "__bucket"),
    )
    q = corpus.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(buckets).alias("__tbl", "__bucket"),
    )
    cand = (
        q.join(c, on=["__tbl", "__bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair can collide in several tables
    )
    qv = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        cand.join(qv, on="query_id")
        .join(cv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("__qv").cast("array<double>"),
                F.col("__cv").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    return _per_query_topk(scored, k)


def hard_negatives(
    corpus: DataFrame,
    label_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_sim: float | None = None,
    num_planes: int = 8,
    num_tables: int = 2,
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training (the DPR
    / SimCSE recipe): for EVERY corpus vector, the ``k`` most-similar
    vectors carrying a DIFFERENT ``label_col`` value.  ``max_sim`` caps
    the similarity of an admissible negative — the standard false-negative
    guard (a cross-label neighbor at cosine ~1.0 is almost certainly a
    mislabeled positive; dropping the top of the range keeps negatives
    hard but true).

    Same scale shape as :func:`knn_join` (this is its cross-label
    restriction): SRP bucket self-join on (table, bucket) — never
    all-pairs, never broadcast of the corpus — exact cosine on candidates
    only, tournament top-k.  Rows whose label is NULL produce no anchors
    and serve as no one's negative (their label is unknowable).

    Returns ``(query_id, query_label, neighbor_id, neighbor_label,
    cos_sim, rank)`` with rank 1..k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_sim is not None and not (-1.0 <= max_sim <= 1.0):
        raise ValueError("max_sim must be within [-1, 1]")

    buckets = _srp_tables_expr(quote(vec_col), num_planes, num_tables)
    labeled = corpus.where(F.col(label_col).isNotNull())
    c = labeled.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.posexplode(buckets).alias("__tbl", "__bucket"),
    )
    q = labeled.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.posexplode(buckets).alias("__tbl", "__bucket"),
    )
    # dedup BEFORE scoring: a pair can collide in several LSH tables, so
    # distinct-ing first means (a) each surviving pair's cosine is
    # evaluated exactly once instead of once per collision, (b) the
    # distinct shuffle carries four small key columns — no vectors and no
    # double, so float-representation dedup surprises are impossible by
    # construction — and (c) the bucket self-join above shuffles only
    # (id, label, table, bucket), never an embedding. Vectors are fetched
    # by id-keyed joins on the (much smaller) deduped pair set.
    cand = (
        q.join(c, on=["__tbl", "__bucket"])
        .where(F.col("query_label") != F.col("neighbor_label"))
        .select("query_id", "query_label", "neighbor_id", "neighbor_label")
        .distinct()
    )
    qv = labeled.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cv = labeled.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        cand.join(qv, on="query_id")
        .join(cv, on="neighbor_id")
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cosine(
                F.col("__qv").cast("array<double>"),
                F.col("__cv").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    if max_sim is not None:
        scored = scored.where(F.col("cos_sim") <= F.lit(float(max_sim)))
    return _per_query_topk(scored, k)


# -- int8 quantization -------------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str | None = None,
    scale_col: str | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """Symmetric per-row int8 quantization of an embedding column.

    ``scale = max(|x|) / 127``; ``code_i = floor(x_i / scale + 0.5)`` in
    [-127, 127], stored as ``array<tinyint>`` (``{vec}_q``) plus one double
    ``{vec}_scale`` per row. An all-zero vector gets scale 0 and all-zero
    codes. The float vector is dropped unless ``keep_vec=True``.

    Why it matters at 100 TB: an ANN corpus of float32[768] is ~3 KB/row;
    int8 codes + one scale are ~770 B — a 4x shrink of the dominant column,
    which is the difference between an in-memory scan and a spilling one.
    Cosine is scale-invariant, so ranking on raw codes needs no dequantize
    (:func:`quantized_topk`); reconstruction ``code * scale`` is within
    ``scale/2`` per component.

    Everything is built-in HOF arithmetic (one codegen'd projection, zero
    shuffle, no UDF) and IEEE-double deterministic, so a SQL oracle
    reproduces codes bit-for-bit.
    """
    code_col = code_col or f"{vec_col}_q"
    scale_col = scale_col or f"{vec_col}_scale"
    v = quote(vec_col)
    scale = (
        f"array_max(transform({v}, __x -> abs(CAST(__x AS DOUBLE)))) / 127.0D"
    )
    out = df.withColumn(scale_col, F.expr(scale))
    qs = quote(scale_col)
    code = (
        f"transform({v}, __x -> CAST(CASE WHEN {qs} = 0.0D THEN 0 ELSE "
        f"floor(CAST(__x AS DOUBLE) / {qs} + 0.5D) END AS TINYINT))"
    )
    out = out.withColumn(code_col, F.expr(code))
    return out if keep_vec else out.drop(vec_col)


def dequantize_embeddings(
    df: DataFrame,
    code_col: str = "embedding_q",
    scale_col: str = "embedding_scale",
    out: str = "embedding",
) -> DataFrame:
    """Reconstruct ``array<double>`` vectors as ``code * scale``."""
    expr = (
        f"transform({quote(code_col)}, __c -> CAST(__c AS DOUBLE) * "
        f"{quote(scale_col)})"
    )
    return df.withColumn(out, F.expr(expr))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    code_col: str = "embedding_q",
    k: int = 10,
    partial_buckets: int | None = None,
) -> DataFrame:
    """Cosine top-k directly on int8 codes — no dequantization.

    Cosine is invariant under the per-row positive scale, so ranking on raw
    codes equals ranking on the reconstructed vectors. The dot product and
    squared norms are EXACT int64 sums (|code| <= 127 => a 100k-dim dot
    stays far below 2^63); only the final ``dot / sqrt(na*nb)`` touches
    floating point. Same broadcast + tournament shape as
    :func:`brute_force_topk`, but the scanned corpus column is ~4x smaller.
    """
    def int_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(code_col).alias("__qc")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("__cc"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        (
            int_dot(F.col("__qc"), F.col("__cc"))
            / (
                F.sqrt(int_dot(F.col("__qc"), F.col("__qc")).cast("double"))
                * F.sqrt(int_dot(F.col("__cc"), F.col("__cc")).cast("double"))
            )
        ).alias("cos_sim"),
    )
    return _per_query_topk(scored, k, partial_buckets)


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out: str = "projected",
    dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a deterministic
    ±1 projection matrix: ``out[j] = sum_i R[j][i] * v[i] / sqrt(out_dim)``
    where ``R[j][i]`` is the same md5-parity sign the SRP bucketing uses
    (:func:`plane_component`), so results are reproducible anywhere and a
    SQL oracle replays them bit-for-bit.

    The sparse-free ±1 scheme (Achlioptas 2003) preserves pairwise
    distances within the JL bound while needing no stored matrix — each
    entry regenerates from (row, col). The matrix rides along as ONE
    broadcast single-row frame (array<array<double>>), NOT as an
    out_dim x dim expression tree: a literal-per-entry plan (~50k Column
    ops for 768->64) inflates analysis time and overflows the JVM's 64KB
    codegen method limit, silently falling back to interpreted
    evaluation. The projection itself is one nested
    ``transform``/``zip_with``/``aggregate`` expression — O(1) plan
    nodes, zero shuffle, codegen'd. Use before :func:`brute_force_topk` /
    :func:`quantize_embeddings` to cut the dominant column's bytes by
    ``dim/out_dim``.

    ``dim`` (input dimension) is read from the first row when omitted —
    pass it at scale to keep the call action-free.
    """
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("n")).first()
        if row is None or row["n"] is None:
            raise ValueError("cannot infer dim from an empty DataFrame; pass dim=")
        dim = row["n"]
    import math

    from pyspark.sql import types as T

    v = F.col(vec_col).cast("array<double>")
    # math.sqrt, not **0.5: correctly-rounded sqrt matches SQL sqrt() exactly
    scale = math.sqrt(float(out_dim))
    matrix = [
        [plane_component(j, i) for i in range(dim)] for j in range(out_dim)
    ]
    mat = df.sparkSession.createDataFrame(
        [(matrix,)],
        T.StructType([
            T.StructField(
                "__jl_R", T.ArrayType(T.ArrayType(T.DoubleType()))
            )
        ]),
    )
    # fold order matches the old literal chain exactly (0.0 + x0 == x0 and
    # x * ±1.0 is exact), so results are bit-identical to the oracle replay
    proj = F.transform(
        F.col("__jl_R"),
        lambda srow: F.aggregate(
            F.zip_with(v, srow, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(scale),
    )
    return df.crossJoin(F.broadcast(mat)).withColumn(out, proj).drop("__jl_R")


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """ANN quality evaluation: per-query recall of an approximate top-k
    result against an exact baseline (e.g. :func:`lsh_topk` / 
    :func:`ivf_topk` vs :func:`brute_force_topk` on a query sample).

    Returns ``(query_col, n_exact, n_hit, recall)`` with
    ``recall = |approx ∩ exact| / |exact|`` per query. This is how
    ``n_probe`` / ``bands`` / ``n_centroids`` get tuned at scale: run the
    exact baseline on a small query sample, sweep the ANN knob, keep the
    cheapest setting above the recall target.

    One hash join on (query, neighbor) + one partial-agg shuffle of
    id pairs — never vectors; queries with an empty approximate result
    still report (their recall is 0).
    """
    e = exact.select(F.col(query_col), F.col(id_col)).distinct()
    a = (
        approx.select(F.col(query_col), F.col(id_col))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        e.join(a, on=[query_col, id_col], how="left")
        .groupBy(query_col)
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall",
            F.col("n_hit").cast("double") / F.col("n_exact"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus row
    whose embedding has cosine similarity >= ``threshold`` to ANY
    benchmark embedding — the semantic companion to the n-gram
    :func:`~nested_pandas_spark.pipeline.corpus.decontaminate` (catches
    paraphrased/translated eval leakage that shares no n-grams).

    Returns the corpus ids plus ``max_bench_sim`` (highest cosine against
    the benchmark; NULL when the corpus vector is NULL or the benchmark
    is empty) and ``contaminated`` (boolean; false when NULL sim).

    Scale shape: evaluation benchmarks are small (10^3-10^5 vectors), so
    the benchmark collapses into ONE broadcast single-row frame of
    pre-normalized vectors; the corpus-side max-cosine is then a per-row
    HOF reduction over that array — zero shuffle, no join on the corpus
    side, one corpus scan. For benchmarks too big to broadcast, run
    :func:`lsh_bucket_join` / :func:`brute_force_topk` instead.
    """
    if not (0.0 < float(threshold) <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold!r}")
    bvec = bench_vec_col or vec_col
    # zero-norm vectors are dropped (bench) / yield NULL sim (corpus): a
    # single NaN-normalized benchmark vector would otherwise poison EVERY
    # corpus row's array_max
    bench_arr = (
        benchmark.where(F.col(bvec).isNotNull())
        .withColumn(
            "__bn",
            F.sqrt(F.aggregate(F.col(bvec).cast("array<double>"),
                               F.lit(0.0), lambda a, x: a + x * x)),
        )
        .where(F.col("__bn") > 0)
        .agg(
            F.collect_list(
                F.transform(F.col(bvec).cast("array<double>"),
                            lambda v: v / F.col("__bn"))
            ).alias("__bench")
        )
    )
    sim = (
        "CASE WHEN __v IS NOT NULL AND size(__bench) > 0 THEN "
        "array_max(transform(__bench, __b -> "
        "aggregate(zip_with(__v, __b, (__x, __y) -> __x * __y), 0.0D, "
        "(__a, __p) -> __a + __p))) END"
    )
    # stage the norm ONCE per row — normalizing inside the transform would
    # recompute the O(d) reduction per element (O(d^2) per corpus row)
    staged = (
        corpus.crossJoin(F.broadcast(bench_arr))
        .withColumn(
            "__nrm",
            F.expr(
                f"sqrt(aggregate(CAST({quote(vec_col)} AS array<double>), "
                f"0.0D, (__a, __y) -> __a + __y * __y))"
            ),
        )
        .withColumn(
            "__v",
            F.expr(
                f"CASE WHEN {quote(vec_col)} IS NOT NULL AND __nrm > 0.0D "
                f"THEN transform(CAST({quote(vec_col)} AS array<double>), "
                f"__x -> __x / __nrm) END"
            ),
        )
        .withColumn("max_bench_sim", F.expr(sim))
    )
    return staged.select(
        F.col(id_col),
        "max_bench_sim",
        F.coalesce(
            F.col("max_bench_sim") >= F.lit(float(threshold)), F.lit(False)
        ).alias("contaminated"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    pq_centroids: int = 8,
    refine: int = 4,
    n_iters: int = 0,
    pq_iters: int = 0,
    residual: bool = False,
    impl: str | None = None,
) -> DataFrame:
    """IVF + PQ composed ANN — the standard billion-scale index shape
    (FAISS ``IVFx,PQy``; Jégou et al. 2011): the inverted file prunes
    WHICH rows are scanned (each query touches ~n_probe/n_centroids of
    the corpus) and product quantization prunes WHAT is read per row
    (n_sub code bytes instead of the raw vector). ADC scoring runs
    against per-query LUTs inside the probed cells only; the
    ``refine * k`` survivors per query are re-ranked exactly. Output
    (query_id, neighbor_id, rank) by ascending exact squared-L2 —
    the same contract as :func:`pq_topk`.

    ``residual=False`` quantizes the raw vectors — the simplest
    replayable formulation. ``residual=True`` is FAISS's default IVFADC:
    codes quantize the CELL RESIDUAL ``v - centroid[cid]``, which
    concentrates the quantizer's dynamic range on the within-cell
    geometry and buys substantially better recall at the same code
    budget; the query-side LUT is then computed per (query, probed cell)
    against ``q - centroid[cid]`` — n_probe small LUTs per query instead
    of one. Both variants are exactly replayable (deterministic seeding,
    HALF_UP-rounded refinement means, fixed fold orders).

    At ingest the corpus would store ``centroid_id`` + ``pq_code``
    (:func:`with_ivf_residuals` + :func:`pq_encode`) so the search never
    touches raw vectors until the final re-rank of ~refine*k rows per
    query.
    """
    impl = impl or _ADC_IMPL
    # one seed scan serves both trainings (seed_vectors' prefix property);
    # the residual path still seeds its PQ on the residual frame itself
    shared_seeds = seed_vectors(
        corpus, id_col, vec_col, max(n_centroids, pq_centroids)
    )
    cents = ivf_centroids(
        corpus, id_col, vec_col, n_centroids, n_iters, seeds=shared_seeds
    )
    probed0 = with_nearest_ids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        ),
        F.col("__qv"), cents, n_probe,
    )
    if residual:
        resid = with_ivf_residuals(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__cv"),
            ),
            cents, vec_col="__cv", cid_col="__cid", residual_col="__rv",
        )
        cbs = pq_codebooks(resid, "neighbor_id", "__rv", n_sub,
                           pq_centroids, pq_iters)
        c = pq_encode(resid, cbs, "__rv").select(
            "neighbor_id", "pq_code", "__cid"
        )
    else:
        cbs = pq_codebooks(corpus, id_col, vec_col, n_sub,
                           pq_centroids, pq_iters, seeds=shared_seeds)
        c = with_nearest_ids(
            pq_encode(corpus, cbs, vec_col).select(
                F.col(id_col).alias("neighbor_id"),
                F.col("pq_code"),
                F.col(vec_col).cast("array<double>").alias("__cv"),
            ),
            F.col("__cv"), cents, 1,
        ).select("neighbor_id", "pq_code", F.col("__cids")[0].alias("__cid"))

    if impl == "arrow":
        # query side to the driver (small by contract): one LUT per
        # (query, probed cell) — residual LUTs over q - centroid[cid],
        # with the same elementwise subtraction the zip_with twin does
        import numpy as np

        rows = probed0.select("query_id", "__qv", "__cids").collect()
        centd = {cid: np.asarray(cv, np.float64) for cid, cv in cents}
        entries = []
        for r in rows:
            if not r["__cids"]:
                continue
            if residual:
                qvn = np.asarray(r["__qv"], np.float64)
                for cid in r["__cids"]:
                    entries.append(
                        (r["query_id"], cid,
                         _lut_numpy(qvn - centd[cid], cbs)))
            else:
                lut = _lut_numpy(r["__qv"], cbs)
                for cid in r["__cids"]:
                    entries.append((r["query_id"], cid, lut))
        adc = _adc_scan_topk_arrow(
            c, entries, refine * k, cell_col="__cid",
            qid_type=probed0.schema["query_id"].dataType,
        )
    elif residual:
        # per-(query, probed-cell) LUT over the query's own residual in
        # that cell — the residual IVFADC query path
        probed = probed0.select(
            "query_id", "__qv", F.explode(F.col("__cids")).alias("__cid")
        )
        probed = _with_centroid_vec(probed, F.col("__cid"), cents, "__cc")
        probed = probed.withColumn(
            "__qres", F.zip_with(F.col("__qv"), F.col("__cc"),
                                 lambda a, b: a - b)
        )
        q = _with_pq_lut(probed, F.col("__qres"), cbs, "__lut").select(
            "query_id", "__lut", "__cid"
        )
    else:
        q = _with_pq_lut(probed0, F.col("__qv"), cbs, "__lut").select(
            "query_id", "__lut", F.explode(F.col("__cids")).alias("__cid")
        )

    def l2sq(a: Column, b: Column) -> Column:
        return _l2sq(a, b)

    # each corpus row lives in exactly ONE cell, so the probe join yields
    # each (query, neighbor) pair at most once — no dedup needed. ADC is
    # LUT-based: the probed scan reads only (id, pq_code, cid) — never a
    # vector — and each pair costs n_sub lookups, not an O(dim) fold over
    # a pq_decode reconstruction.
    if impl != "arrow":
        adc = (
            c.join(F.broadcast(q), on="__cid")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                (-_pq_adc_expr(F.col("__lut"),
                               F.col("pq_code"))).alias("cos_sim"),
            )
        )
    cand = _per_query_topk(adc, refine * k).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    exact = (
        cand.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__cv"),
            ),
            on="neighbor_id",
        )
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            (-l2sq(F.col("__qv"), F.col("__cv"))).alias("cos_sim"),
        )
    )
    return _per_query_topk(exact, k).select("query_id", "neighbor_id", "rank")
