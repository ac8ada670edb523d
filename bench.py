"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The query set re-expresses the reference's ASV microbenchmarks and its ZTF
workflow notebook (BASELINE.md) on the driver's star schema:
  add_nested        ~ NestedFrameAddNested   (pack 600k lineitem under orders)
  query_nested      ~ NestedFrameQuery       (element filter)
  count_by          ~ CountNestedBy          (per-category counts)
  reduce_hof        ~ NestedFrameReduce      (per-row mean, HOF fast path)
  reduce_udf        ~ NestedFrameReduce      (per-row mean via pandas UDF)
  sort_nested       (element sort, array_sort comparator)
  explode_roundtrip (pack -> inline -> count)
  read_pruned       ~ ReadFewColumns         (nested-leaf parquet pruning)
  ztf_workflow      ~ docs/pre_executed/performance.ipynb end-to-end chain
  minhash_lsh       (dedup candidate pairs on documents)
  topk_cosine       (brute-force ANN baseline on embeddings)

Each query runs end-to-end (parquet scan -> operators -> small aggregate) and
is forced with a collect of a tiny result; times are per-query wall seconds
on a warmed session.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from nested_pandas_spark import NestedFrame, get_spark, read_parquet
    from nested_pandas_spark.pipeline import dedup as dd
    from nested_pandas_spark.pipeline import similarity as sim

    spark = get_spark("bench", cpus=cpus)

    def t(name):  # tables
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    def packed():
        li = t("lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        return NestedFrame(t("orders")).join_nested(li, "items", on="o_orderkey")

    # -- setup (untimed): a packed parquet for the pruned-read benchmark ----
    packed_path = "/tmp/bench_packed.parquet"
    packed().df.write.mode("overwrite").parquet(packed_path)

    # warm-up: JVM, parquet footers, codegen
    packed().df.select(F.sum(F.size("items"))).collect()
    # warm the Python worker fleet (process spawn + Arrow/pandas import per
    # worker) so UDF queries measure throughput, not one-time startup
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    queries = {}
    rows = {}
    checksums = {}

    # best-of-3: single-run wall times on a virtualized host vary up to 2x
    # on an identical plan (hypervisor noise); min-of-3 recovers the true
    # cost. Measured example: the same add_nested collect 4 times in one
    # session -> 2.34, 2.15, 2.00, 3.81 s.
    def bench(name, fn, runs=3):
        best = float("inf")
        res = None
        for _ in range(runs):
            start = time.perf_counter()
            res = fn()
            best = min(best, time.perf_counter() - start)
        queries[name] = round(best, 4)
        # result provenance: row count + value digest make round-over-round
        # regressions attributable (same digest == same work done)
        if isinstance(res, int):
            rows[name] = res
            checksums[name] = hashlib.md5(str(res).encode()).hexdigest()[:8]
        elif res is not None:
            rows[name] = len(res)
            checksums[name] = hashlib.md5(
                "|".join(sorted(repr(r) for r in res)).encode()
            ).hexdigest()[:8]

    bench("add_nested", lambda: packed().df.select(
        F.count("*"), F.sum(F.size("items"))).collect())

    bench("query_nested", lambda: packed()
          .query("items.l_quantity > 30")
          .df.select(F.sum(F.size("items"))).collect())

    bench("count_by", lambda: packed()
          .count_nested("items", by="l_returnflag", values=["A", "N", "R"])
          .df.select(F.sum("n_items_A"), F.sum("n_items_N"), F.sum("n_items_R"))
          .collect())

    bench("reduce_hof", lambda: packed()
          .nest_agg("items", "l_extendedprice", "mean", alias="m")
          .df.select(F.avg("m")).collect())

    def reduce_udf():
        import numpy as np

        out = packed().map_rows(
            lambda price: float(np.mean(price)) if price is not None and len(price) else None,
            columns=["items.l_extendedprice"],
            output_names=["m"],
            output_schema="m double",
            # no repartition: the pack's groupBy shuffle already spreads the
            # rows across the session's cores; a second full shuffle of the
            # packed arrays costs more than it buys (measured equal steady-
            # state at sf0.1, and strictly worse at scale)
        )
        return out.df.select(F.avg("m")).collect()

    bench("reduce_udf", reduce_udf)

    bench("sort_nested", lambda: packed()
          .sort_values(["items.l_shipdate", "items.l_linenumber"])
          .df.select(F.sum(F.expr("items[0].l_linenumber"))).collect())

    bench("explode_roundtrip", lambda: packed()
          .to_flat("items", keys=["o_orderkey"])
          .df.select(F.count("*"), F.sum("l_quantity")).collect())

    bench("read_pruned", lambda: read_parquet(
        spark, packed_path, columns=["o_orderkey", "items.l_quantity"])
        .select(F.sum(F.expr(
            "aggregate(transform(items, x -> x.l_quantity), CAST(0.0 AS DOUBLE), (a,v) -> a+v)"
        ))).collect())

    def ztf_workflow():
        # reference performance.ipynb chain: read 2 tables, pack, object
        # filter, element filter, per-band counts, count filter, amplitude
        ndf = packed().query("o_totalprice > 100000.0")
        ndf = ndf.query("items.l_quantity > 5")
        ndf = ndf.count_nested("items", by="l_returnflag", values=["A", "N", "R"])
        ndf = NestedFrame(ndf.df.where(F.col("n_items_A") >= 1))
        ndf = ndf.nest_agg("items", "l_extendedprice", "max", alias="mx")
        ndf = ndf.nest_agg("items", "l_extendedprice", "min", alias="mn")
        return ndf.df.select(F.avg(F.col("mx") - F.col("mn"))).collect()

    bench("ztf_workflow", ztf_workflow)

    bench("minhash_lsh", lambda: dd.lsh_candidate_pairs(
        t("documents"), "doc_id", num_hashes=8, bands=4, shingle_n=3).count())

    def topk():
        emb = t("embeddings")
        q = emb.where(F.col("vec_id") < 10)
        return sim.brute_force_topk(emb, q, k=5).count()

    bench("topk_cosine", topk)

    total = round(sum(queries.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "rows": rows,
        "checksums": checksums,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
