"""Capture physical plans for the engine's headline operators and assert the
scale-critical properties hold, writing the evidence to PLANS.md.

Checks (each one is a claim README/COVERAGE makes about 100 TB behavior):

1. nested-schema pruning   — reading one leaf of a packed parquet column
                             scans ONLY that leaf (ReadSchema).
2. element-filter pushdown — a query on a pending pack pushes the predicate
                             into the child parquet scan (PushedFilters).
3. single-shuffle pack     — join_nested plans exactly one Exchange (the
                             child groupBy); the base side joins without
                             re-shuffling.
4. aggregate pruning       — a count-only query on a pending pack contains
                             no collect_list at all; the partial aggregate
                             runs map-side before the exchange.
5. broadcast join          — a small dimension joins as BroadcastHashJoin,
                             not SortMergeJoin.
6. zero-shuffle element ops— element filter + eval + sort on an already
                             packed frame add no Exchange.
7. whole-stage codegen     — the hot path is inside WholeStageCodegen spans.

Run: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
Exit code 1 if any assertion fails; PLANS.md is (re)written either way.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from nested_pandas_spark import NestedFrame, get_spark, read_parquet

    spark = get_spark(cpus=8)
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    failures: list[str] = []
    sections: list[tuple[str, str, str]] = []  # (title, commentary, plan)

    def check(name: str, ok: bool, detail: str = "") -> None:
        if not ok:
            failures.append(f"{name}: {detail}")

    # -- 1. nested-schema pruning ------------------------------------------
    packed_path = f"{spark.conf.get('spark.sql.warehouse.dir')}/__audit_packed"
    NestedFrame(orders).join_nested(li, "items", on="o_orderkey").to_parquet(
        packed_path, mode="overwrite"
    )
    pruned = read_parquet(spark, packed_path, columns=["o_orderkey", "items.l_quantity"])
    p1 = explain_str(pruned.select(F.explode("items.l_quantity")))
    read_schema = next((ln for ln in p1.splitlines() if "ReadSchema" in ln), "")
    check(
        "nested-schema pruning",
        "l_quantity" in read_schema
        and "l_extendedprice" not in read_schema
        and "o_custkey" not in read_schema,
        read_schema,
    )
    sections.append((
        "Nested-schema pruning",
        "`read_parquet(path, columns=['items.l_quantity'])` — the parquet scan "
        "reads exactly one leaf of the `array<struct>` column (plus the key), "
        "not the whole struct. At 100 TB this is the difference between "
        "scanning 1 column and scanning 16.",
        read_schema.strip(),
    ))

    # -- 2. element-filter pushdown through the pending pack ---------------
    # (left pack: pushdown is semantics-preserving — all-fail parents keep a
    # NULL cell either way. On an INNER pack the rewrite correctly refuses
    # to push, since parents must survive an element filter.)
    nf = NestedFrame(orders).join_nested(li, "items", on="o_orderkey")
    q = nf.query("items.l_quantity > 30")
    p2 = explain_str(q.df)
    pushed = [ln for ln in p2.splitlines() if "PushedFilters" in ln and "l_quantity" in ln]
    check("element-filter pushdown", bool(pushed), "no PushedFilters with l_quantity")
    sections.append((
        "Element-filter pushdown",
        "`query('items.l_quantity > 30')` on a *pending* pack rewrites to a "
        "filter on the flat child BEFORE the pack's shuffle, and Catalyst "
        "pushes it into the parquet scan — rows that can't survive never "
        "leave the data source.",
        "\n".join(pushed[:2]),
    ))

    # -- 2b. reduction-literal pushdown ------------------------------------
    # a global Series reduction (`items.l_quantity.mean()`) binds to a
    # literal scalar BEFORE compilation finishes, so the element predicate
    # it appears in is still an ordinary literal compare — and still pushes
    # through the pending pack into the child scan
    nf_red = NestedFrame(orders).join_nested(li, "items", on="o_orderkey")
    q_red = nf_red.query("items.l_quantity > items.l_quantity.mean()")
    p2b = explain_str(q_red.df)
    pushed_red = [
        ln for ln in p2b.splitlines()
        if "PushedFilters" in ln and "GreaterThan(l_quantity" in ln
    ]
    check("reduction-literal pushdown", bool(pushed_red),
          "no PushedFilters with GreaterThan(l_quantity,...)")
    sections.append((
        "Reduction-literal pushdown",
        "`query('items.l_quantity > items.l_quantity.mean()')` — the global "
        "reduction runs as ONE separate distributed aggregate (map-side "
        "partials, one row to the driver) and folds into the predicate as a "
        "literal, so the element filter STILL reaches the child parquet "
        "scan's PushedFilters. A correlated-subquery formulation would have "
        "blocked pushdown and re-planned the aggregate under the join.",
        "\n".join(pushed_red[:2]),
    ))

    # -- 2c. grouped nested aggregation without arrays ---------------------
    # groupby(...).agg({'items.l_quantity': 'mean'}) on a PENDING pack must
    # aggregate the flat child directly: no collect_list anywhere in the plan
    nf_gb = NestedFrame(orders).join_nested(li, "items", on="o_orderkey")
    gb_df = nf_gb.groupby("o_orderpriority").agg(
        {"items.l_quantity": ["min", "mean", "count"]})
    p2c = explain_str(gb_df)
    check("groupby flat-path no arrays", "collect_list" not in p2c,
          "collect_list present in grouped-agg plan")
    sections.append((
        "Grouped nested aggregation without arrays",
        "`groupby('o_orderpriority').agg({'items.l_quantity': 'mean'})` on a "
        "pending pack never builds the packed arrays: the flat child joins "
        "the base keys and ONE hash aggregation computes every statistic — "
        "no collect_list in the plan. At 100 TB this removes the pack "
        "shuffle's array materialization entirely for aggregate-only "
        "consumers.",
        "\n".join(ln for ln in p2c.splitlines()
                  if "HashAggregate" in ln or "Exchange" in ln)[:900]
        or "(no aggregate/exchange lines captured)",
    ))

    # -- 3. single-shuffle pack + 4. aggregate pruning ---------------------
    # count-only projection: the nested array itself is unused, so the lazy
    # pack's collect_list must be pruned away entirely
    counted = nf.count_nested("items").df.select("o_orderkey", "n_items")
    p3 = explain_str(counted)
    n_exchanges = p3.count("Exchange hashpartitioning")
    check("single-shuffle pack", n_exchanges <= 2, f"{n_exchanges} hash exchanges")
    check("aggregate pruning", "collect_list" not in p3, "collect_list survived")
    check(
        "map-side partial agg",
        "partial_count" in p3 or "partial" in p3.lower(),
        "no partial aggregate before exchange",
    )
    agg_lines = [
        ln for ln in p3.splitlines()
        if "HashAggregate" in ln or "Exchange" in ln or "Join" in ln
    ]
    sections.append((
        "Pack + count: aggregate pruning, partial aggregation",
        "`join_nested(...).count_nested('items')` — the lazy pack folds the "
        "count into its own groupBy; the unused `collect_list` is pruned "
        "entirely (no array is ever built), the count runs map-side "
        "(partial) before its single exchange.",
        "\n".join(agg_lines[:8]),
    ))

    # -- 5. broadcast join --------------------------------------------------
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    p5 = explain_str(cust.join(nation, cust.c_nationkey == nation.n_nationkey))
    check("broadcast join", "BroadcastHashJoin" in p5, "dimension not broadcast")
    sections.append((
        "Broadcast join for small dimensions",
        "customer ⋈ nation: Catalyst broadcasts the 25-row dimension — no "
        "shuffle of the fact side. The engine leaves join-strategy choice to "
        "Catalyst/AQE everywhere; nothing in the API forces a shuffle join.",
        next(ln for ln in p5.splitlines() if "BroadcastHashJoin" in ln).strip(),
    ))

    # -- 6. zero-shuffle element ops ---------------------------------------
    packed_nf = NestedFrame(spark.read.parquet(packed_path))
    chained = (
        packed_nf.query("items.l_quantity > 10")
        .eval("items.rev = items.l_extendedprice * (1 - items.l_discount)")
        .sort_values("items.l_shipdate")
    )
    p6 = explain_str(chained.df)
    check("zero-shuffle element ops", "Exchange" not in p6, "element ops shuffled")
    sections.append((
        "Zero-shuffle element operators",
        "filter → eval → element-sort on an already-packed frame: the whole "
        "chain is per-row array rewriting (higher-order functions) — NO "
        "Exchange in the plan. At any scale these ops cost one scan.",
        "\n".join(p6.splitlines()[1:6]),
    ))

    # -- 7. whole-stage codegen --------------------------------------------
    # AQE wraps the plan in AdaptiveSparkPlan, which reports 0 codegen
    # subtrees until execution — probe with AQE off to see the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    p7 = explain_str(
        nf.count_nested("items").df.select("o_orderkey", "n_items"), "codegen"
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p7)
    check("whole-stage codegen", bool(m) and int(m.group(1)) >= 1,
          "no codegen subtrees reported")
    sections.append((
        "Whole-stage codegen",
        "The count query's hot path (scan → project → partial agg) compiles "
        "into WholeStageCodegen spans; no Python in the loop.",
        (m.group(0) if m else "") + "\n"
        + "\n".join(ln for ln in p7.splitlines() if ln.startswith("*("))[:400],
    ))

    # -- 8. decontaminate: bench set broadcasts, text never shuffles --------
    from nested_pandas_spark.pipeline.corpus import decontaminate, pack_sequences

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    p8 = explain_str(
        decontaminate(
            docs.where(F.col("doc_id") % 19 != 0),
            docs.where(F.col("doc_id") % 19 == 0),
            ngram_n=8,
        )
    )
    check(
        "decontaminate broadcast",
        "BroadcastHashJoin" in p8,
        "benchmark n-gram set not broadcast",
    )
    sections.append((
        "Decontamination: eval-set broadcast, id/hash-only shuffles",
        "decontaminate(train, bench): the benchmark's hashed n-gram set is "
        "the build side of a BroadcastHashJoin; the corpus side contributes "
        "only (id, 8-byte hash) pairs to the one count shuffle — document "
        "text never leaves its scan stage.",
        next(ln for ln in p8.splitlines() if "BroadcastHashJoin" in ln).strip(),
    ))

    # -- 9. pack_sequences: no single-task global window --------------------
    p9 = explain_str(pack_sequences(docs, capacity=1024))
    check(
        "pack_sequences parallel prefix sum",
        "Exchange SinglePartition" not in p9
        and "SinglePartition" not in p9,
        "global window funnels through one task",
    )
    sections.append((
        "Sequence packing: two-stage prefix sum, no SinglePartition exchange",
        "pack_sequences computes a global running token sum with range "
        "partitioning + per-partition windows + broadcast partition offsets. "
        "The naive `SUM() OVER (ORDER BY id)` plan would contain `Exchange "
        "SinglePartition` — this plan must not (and the oracle for q43 IS "
        "the naive form, so equivalence is hash-checked).",
        "\n".join(
            ln.strip()
            for ln in p9.splitlines()
            if "Exchange" in ln or "Window" in ln
        )[:600],
    ))

    # -- 10. BM25: query terms + df broadcast, postings shuffle once --------
    from nested_pandas_spark.pipeline.search import bm25_topk

    queries_df = spark.createDataFrame(
        [(1, "spark join"), (2, "vector stream")], "query_id long, query string"
    )
    p10 = explain_str(bm25_topk(docs, queries_df, k=10))
    n_bhj = p10.count("BroadcastHashJoin")
    check(
        "bm25 broadcast sides",
        n_bhj >= 2 and "BroadcastNestedLoopJoin" in p10,
        f"expected query-term + df broadcasts and 1-row stats cross join, "
        f"got {n_bhj} BroadcastHashJoin",
    )
    sections.append((
        "BM25 search: broadcast query terms / document frequencies / stats",
        "bm25_topk: the query-term table and the per-term document "
        "frequencies both broadcast (BroadcastHashJoin); the 1-row corpus "
        "stats aggregate joins as a BroadcastNestedLoopJoin. The only wide "
        "exchanges are the postings groupBy and the per-(query, doc) score "
        "sum — both carry ids and counts, never text.",
        "\n".join(
            ln.strip()
            for ln in p10.splitlines()
            if "Broadcast" in ln and "Join" in ln
        )[:600],
    ))

    # -- 11. assign_shards: prefix sum stays parallel -----------------------
    from nested_pandas_spark.pipeline.corpus import assign_shards

    p11 = explain_str(assign_shards(docs, 64000, tokens_col="n_chars"))
    check(
        "assign_shards parallel prefix sum",
        "SinglePartition" not in p11,
        "global window funnels through one task",
    )
    sections.append((
        "Balanced sharding: hash-shuffled prefix sum, no SinglePartition",
        "assign_shards orders the corpus by md5(id) (a deterministic "
        "shuffle) and reuses the pack_sequences two-stage prefix sum; the "
        "plan must stay free of `Exchange SinglePartition` — shard "
        "assignment at 100 TB is a fully parallel pass over (id, size) "
        "pairs (q48's oracle is the naive single-window form; equivalence "
        "is hash-checked).",
        "\n".join(
            ln.strip()
            for ln in p11.splitlines()
            if "Exchange" in ln or "Window" in ln
        )[:600],
    ))

    # -- 12. dedup_against: hash-only anti join, broadcastable ref ----------
    from nested_pandas_spark.pipeline.dedup import dedup_against

    ref = docs.where(F.col("doc_id") % 4 == 0)
    new = docs.where(F.col("doc_id") % 4 != 0)
    p12 = explain_str(dedup_against(new, ref, broadcast_ref=True))
    check(
        "dedup_against broadcast anti join",
        "BroadcastHashJoin" in p12 and "LeftAnti" in p12,
        "accepted-fingerprint set not broadcast for the anti join",
    )
    sections.append((
        "Incremental dedup: LEFT ANTI on fingerprints, broadcastable ref",
        "dedup_against collapses the accepted corpus to DISTINCT md5 "
        "fingerprints before a LEFT ANTI join — the join moves 32-hex-char "
        "hashes, never text. With broadcast_ref=True the fingerprint set "
        "ships to executors (BroadcastHashJoin LeftAnti): the incoming "
        "batch is deduped with ZERO shuffle of its own rows until the "
        "within-batch window.",
        "\n".join(
            ln.strip()
            for ln in p12.splitlines()
            if "Join" in ln or "Exchange" in ln or "HashAggregate" in ln
        )[:600],
    ))

    # -- 13. semantic_dedup: within-cluster pairing is an equi-join ---------
    from nested_pandas_spark.pipeline.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    p13 = explain_str(
        semantic_dedup(emb, n_centroids=4, n_iters=1, threshold=0.35)
    )
    check(
        "semantic_dedup no all-pairs",
        "CartesianProduct" not in p13
        and "BroadcastNestedLoopJoin" not in p13,
        "within-cluster comparison degenerated to an all-pairs join",
    )
    sections.append((
        "Semantic dedup: clustered pairwise pass, never all-pairs",
        "semantic_dedup assigns every vector to a plan-literal centroid "
        "(pure projection) and compares pairs through an equi-join on the "
        "cluster id — the plan must contain no CartesianProduct / "
        "BroadcastNestedLoopJoin. The quadratic cost is bounded per "
        "cluster, the dropped-id side of the final anti-style join is "
        "id-only, and AQE splits a skewed mega-cluster.",
        "\n".join(
            ln.strip()
            for ln in p13.splitlines()
            if "Join" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 14. split_by_cluster: narrow id-only component join ----------------
    from nested_pandas_spark.pipeline.corpus import split_by_cluster

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    p14 = explain_str(split_by_cluster(docs, pairs, "doc_id"))
    check(
        "split_by_cluster no all-pairs",
        "CartesianProduct" not in p14
        and "BroadcastNestedLoopJoin" not in p14,
        "component join degenerated to an all-pairs join",
    )
    sections.append((
        "Leakage-controlled split: one narrow component join + hash projection",
        "split_by_cluster joins the corpus to (node, component) bigint "
        "pairs — the only thing that moves for the split decision; the "
        "test/train bucket is a per-row md5 projection of the cluster "
        "representative. Document text never shuffles, and the join is "
        "broadcastable when the dup graph is small.",
        "\n".join(
            ln.strip()
            for ln in p14.splitlines()
            if "Join" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 15. strip_boilerplate_lines: hash-keyed df count + anti join -------
    from nested_pandas_spark.pipeline.corpus import strip_boilerplate_lines

    p15 = explain_str(strip_boilerplate_lines(docs, sep=" ", min_df=380))
    check(
        "strip_lines anti join",
        "LeftAnti" in p15,
        "boilerplate removal is not a left-anti join",
    )
    check(
        "strip_lines no all-pairs",
        "CartesianProduct" not in p15
        and "BroadcastNestedLoopJoin" not in p15,
        "line-df comparison degenerated to an all-pairs join",
    )
    sections.append((
        "Line-level dedup: hash-keyed df count, pruned anti join",
        "strip_boilerplate_lines counts document frequency on xxhash64 of "
        "the trimmed line, so pass 1 shuffles (hash, id) pairs — never "
        "line text. The boilerplate set is pruned to df >= min_df BEFORE "
        "the LEFT ANTI join (AQE broadcasts it when small); the only "
        "text shuffle is the per-doc reconstruction groupBy.",
        "\n".join(
            ln.strip()
            for ln in p15.splitlines()
            if "Join" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 16. vocab: top-k is TakeOrdered, never a full sort -----------------
    from nested_pandas_spark.pipeline.text import vocab

    p16 = explain_str(vocab(docs, top_k=20))
    check(
        "vocab top-k no full sort",
        "TakeOrderedAndProject" in p16,
        "vocab top-k compiled to a global Sort instead of TakeOrdered",
    )
    sections.append((
        "Vocabulary pass: partial-agg token counts, TakeOrdered top-k",
        "vocab explodes tokens once, counts occurrences and document "
        "frequency in one hash-keyed aggregation (map-side combine "
        "collapses each partition to its distinct tokens), and the top-k "
        "truncation must compile to TakeOrderedAndProject — a bounded "
        "per-partition heap + driver merge, never a full shuffle sort of "
        "the whole vocabulary.",
        "\n".join(
            ln.strip() for ln in p16.splitlines()
            if "TakeOrdered" in ln or "Exchange" in ln or "HashAggregate" in ln
        )[:600],
    ))

    # -- 17. profile: every counter in ONE aggregation pass -----------------
    from nested_pandas_spark.operators.aggregates import profile

    p17 = explain_str(docs.select(
        F.count(F.lit(1)).alias("__n"),
        F.count("doc_id").alias("__nn"),
        F.count_distinct(F.col("doc_id")).alias("__nd"),
    ), "simple")
    n_scans = p17.count("Scan parquet")
    check(
        "profile single scan",
        n_scans <= 1,
        f"profile-style agg read the table {n_scans} times",
    )
    # the operator itself must also run (bounded ncols-row collect)
    prof_rows = profile(docs).collect()
    check(
        "profile covers all columns",
        len(prof_rows) == len(docs.columns),
        f"profile returned {len(prof_rows)} rows for {len(docs.columns)} columns",
    )
    sections.append((
        "Data-quality profile: one scan computes every per-column counter",
        "profile builds count/null/distinct aggregates for ALL columns "
        "into a single agg projection — one table scan, partial aggs "
        "combining map-side, and an ncols-sized driver collect to pivot. "
        "Never one job per column.",
        "\n".join(
            ln.strip() for ln in p17.splitlines()
            if "Scan" in ln or "HashAggregate" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 18. knn_join: bucket equi-join, never all-pairs --------------------
    from nested_pandas_spark.pipeline.similarity import knn_join

    p18 = explain_str(knn_join(emb, k=3, num_planes=8, num_tables=2))
    check(
        "knn_join no all-pairs",
        "CartesianProduct" not in p18
        and "BroadcastNestedLoopJoin" not in p18,
        "self k-NN degenerated to an all-pairs join",
    )
    sections.append((
        "All-rows k-NN join: shuffle equi-join on SRP buckets",
        "knn_join matches candidate pairs through a plain equi-join on "
        "(table, bucket) — both sides hash-partition on the bucket key, "
        "no broadcast (the query side IS the corpus), and the plan must "
        "contain no CartesianProduct. Cost is per-bucket-size squared, "
        "bounded by the plane count; the tournament top-k avoids a "
        "single-task window.",
        "\n".join(
            ln.strip() for ln in p18.splitlines()
            if "Join" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 19. rebin / phase_fold: zero-shuffle per-cell time series ----------
    from nested_pandas_spark import pack, phase_fold, rebin

    ev = spark.read.parquet(f"{sf}/events.parquet").select("user_id", "ts", "value")
    packed_ev = pack(ev, "series", on="user_id")
    ts_ops = rebin(
        phase_fold(packed_ev, "series", "ts", period=7 * 86_400 * 10**6),
        "series", "ts", width=86_400 * 10**6, value_fields=["value"],
    )
    p19 = explain_str(ts_ops)
    n_ex19 = p19.count("Exchange hashpartitioning")
    check(
        "timeseries zero extra shuffle",
        n_ex19 <= 1,
        f"rebin/phase_fold added shuffles beyond the pack ({n_ex19})",
    )
    sections.append((
        "Time-series rebin + phase_fold: per-cell HOFs, no shuffle beyond the pack",
        "Binning and folding each user's series are pure transform/filter/"
        "aggregate lambdas over the packed array — the ONLY Exchange in the "
        "plan is the pack's own groupBy. The alternative (explode -> "
        "groupBy(user, bin) -> repack) would shuffle the full measurement "
        "volume twice more.",
        "\n".join(
            ln.strip() for ln in p19.splitlines()
            if "Exchange" in ln or "Aggregate" in ln or "Scan" in ln
        )[:600],
    ))

    # -- 20. concat: plan-level union, no data movement ---------------------
    cat = NestedFrame.concat([
        NestedFrame(orders.where(F.col("o_orderkey") % 2 == 0)),
        NestedFrame(orders.where(F.col("o_orderkey") % 2 == 1)),
    ])
    p20 = explain_str(cat.df)
    check("concat no shuffle", "Exchange" not in p20, "concat introduced a shuffle")
    sections.append((
        "concat: vertical stacking is plan concatenation",
        "NestedFrame.concat folds unionByName — each input's partitions "
        "stream straight into the output with zero Exchange; schema "
        "alignment (NULL-padding missing columns/fields) is a projection.",
        "\n".join(
            ln.strip() for ln in p20.splitlines()
            if "Union" in ln or "Scan" in ln or "Project" in ln
        )[:400],
    ))

    # -- 21. quantized_topk: broadcast + tournament, int codes --------------
    from nested_pandas_spark.pipeline.similarity import (
        quantize_embeddings, quantized_topk,
    )

    qemb = quantize_embeddings(emb)
    p21 = explain_str(
        quantized_topk(qemb, qemb.where(F.col("vec_id") < 3), k=3)
    )
    check(
        "quantized_topk broadcast",
        "BroadcastNestedLoopJoin" in p21 or "BroadcastExchange" in p21,
        "query side not broadcast",
    )
    check(
        "quantized_topk no single-task window",
        "partial_buckets" not in p21 and "Window" in p21,
        "tournament structure missing",
    )
    sections.append((
        "Quantized top-k: int8 codes scan 4x less, query side broadcasts",
        "The corpus side streams int8 codes (a quarter of the float32 "
        "bytes); the small query set broadcasts; ranking uses the same "
        "two-stage tournament as brute_force_topk, so no per-query "
        "hotspot task.",
        "\n".join(
            ln.strip() for ln in p21.splitlines()
            if "Join" in ln or "Window" in ln or "Exchange" in ln
        )[:600],
    ))

    # -- 22. periodogram + features: zero shuffle beyond the pack -----------
    from nested_pandas_spark import lightcurve_features, pack, periodogram

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "ts", "value")
    nfp = pack(ev, "lc", on="user_id", sort_within=["ts"])
    base_ex = explain_str(nfp).count("Exchange")
    p22 = explain_str(
        lightcurve_features(
            periodogram(nfp, "lc", "ts", "value", [0.5, 1.0]),
            "lc", "ts", "value")
    )
    check(
        "periodogram+features zero extra shuffle",
        p22.count("Exchange") == base_ex,
        f"exchanges {p22.count('Exchange')} != pack's {base_ex}",
    )
    sections.append((
        "Periodogram + feature extraction: zero shuffle beyond the pack",
        "The Lomb-Scargle sweep and the 8-feature vector are pure per-row "
        "HOF projections — the ONLY Exchange in the whole plan is the "
        "pack's own child groupBy. Trig sweeps over 100 TB of light "
        "curves add no data movement at all.",
        "\n".join(
            ln.strip() for ln in p22.splitlines()
            if "Exchange" in ln or "Scan" in ln or "HashAggregate" in ln
        )[:400],
    ))

    # -- 23. dedup_passages: map-side combine, no cartesian -----------------
    from nested_pandas_spark.pipeline.dedup import dedup_passages

    docs_df = spark.read.parquet(f"{sf}/documents.parquet")
    p23 = explain_str(dedup_passages(docs_df, window=8))
    check(
        "dedup_passages partial agg",
        "partial_count" in p23,
        "passage count not map-side combined (hot-passage skew hazard)",
    )
    check(
        "dedup_passages no cartesian",
        "CartesianProduct" not in p23,
        "cartesian product in passage dedup",
    )
    sections.append((
        "Exact substring dedup: partial-agg passage counts, hash-only shuffles",
        "Window hashes aggregate with map-side combine (partial_count "
        "before the Exchange), so a boilerplate passage repeated millions "
        "of times cannot hot-spot one reducer; only hashes and ids "
        "shuffle, the text column stays at doc grain.",
        "\n".join(
            ln.strip() for ln in p23.splitlines()
            if "HashAggregate" in ln or "Exchange" in ln
        )[:500],
    ))

    # -- 24. semantic_decontaminate: broadcast benchmark, no sort-merge -----
    from nested_pandas_spark.pipeline.similarity import semantic_decontaminate

    p24 = explain_str(
        semantic_decontaminate(
            emb.where(F.col("vec_id") % 20 != 0),
            emb.where(F.col("vec_id") % 20 == 0), 0.9)
    )
    check(
        "semantic_decontaminate broadcast",
        "BroadcastNestedLoopJoin" in p24 or "BroadcastExchange" in p24,
        "benchmark not broadcast",
    )
    check(
        "semantic_decontaminate no sort-merge join",
        "SortMergeJoin" not in p24,
        "corpus side shuffled for the benchmark join",
    )
    sections.append((
        "Semantic decontamination: benchmark broadcasts, corpus never shuffles",
        "The benchmark collapses to ONE row of pre-normalized vectors and "
        "broadcasts; the corpus-side max-cosine is a per-row HOF, so the "
        "scan streams straight through with no shuffle.",
        "\n".join(
            ln.strip() for ln in p24.splitlines()
            if "Join" in ln or "Exchange" in ln or "Scan" in ln
        )[:500],
    ))

    # -- 25. chunk_documents / winnow_fingerprints: zero shuffle ------------
    from nested_pandas_spark.pipeline.corpus import chunk_documents, quality_bins
    from nested_pandas_spark.pipeline.dedup import winnow_fingerprints

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    p25a = explain_str(chunk_documents(docs, 64, 48))
    p25b = explain_str(winnow_fingerprints(docs, k=3, window=4))
    check("chunk_documents zero shuffle", "Exchange" not in p25a,
          "chunker plans an Exchange")
    check("winnow_fingerprints zero shuffle", "Exchange" not in p25b,
          "winnowing plans an Exchange")
    sections.append((
        "Chunking & winnowing: pure projection + generate, zero Exchange",
        "Both operators are one let-bound HOF projection followed by an "
        "explode — text bytes never leave their partition; downstream "
        "matching shuffles only the 8-hex fingerprints.",
        "\n".join(
            ln.strip() for ln in (p25a + p25b).splitlines()
            if "Generate" in ln or "Exchange" in ln or "Scan" in ln
        )[:500],
    ))

    # -- 26. quality_bins: global ntile WITHOUT a single-task window --------
    scored = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.length("text").cast("double").alias("score"))
    p26 = explain_str(quality_bins(scored, "score", 5))
    check(
        "quality_bins no global window",
        "Exchange SinglePartition" not in p26,
        "global ntile funnels through one partition",
    )
    check(
        "quality_bins range partitioning",
        "rangepartitioning" in p26 or "REPARTITION_BY_NUM" in p26
        or "Exchange range" in p26,
        "prefix sum not range-partitioned",
    )
    sections.append((
        "quality_bins: exact global ntile via distributed prefix sum",
        "The global row index comes from range-partitioned per-partition "
        "running counts plus broadcast driver offsets — no `ntile() OVER "
        "(ORDER BY ...)` single-task Exchange anywhere in the plan; only "
        "(id, score) pairs shuffle. The join back to the input is id-keyed "
        "(broadcast at this toy scale; a co-partitioned hash join at 100 TB).",
        "\n".join(
            ln.strip() for ln in p26.splitlines()
            if "Exchange" in ln or "Window" in ln or "Join" in ln
        )[:500],
    ))

    # -- 27. classifier: broadcast weights, map-side-combined gradient ------
    from nested_pandas_spark.pipeline.classifier import (
        classifier_score,
        hashed_bow,
        train_quality_classifier,
    )

    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    wdf = train_quality_classifier(labeled, "y", dim=16, epochs=1, lr=1.0)
    p27 = explain_str(classifier_score(docs, wdf, dim=16))
    feats = hashed_bow(docs, dim=16).withColumnRenamed("doc_id", "__id")
    grad = (
        feats.join(F.broadcast(wdf), on="bucket", how="left")
        .groupBy("bucket")
        .agg(F.sum(F.col("weight") * F.col("x")).alias("g"))
    )
    p27g = explain_str(grad)
    check(
        "classifier_score broadcast weights",
        "BroadcastHashJoin" in p27,
        "weight join is not broadcast",
    )
    check(
        "classifier_score no nested-loop join",
        "CartesianProduct" not in p27
        and "BroadcastNestedLoopJoin" not in p27,
        "scoring plans an all-pairs join",
    )
    check(
        "classifier gradient partial agg",
        "partial" in p27g.lower() and "BroadcastHashJoin" in p27g,
        "gradient epoch lacks map-side combine or broadcast weight join",
    )
    sections.append((
        "Trained classifier: broadcast weight joins, combined gradients",
        "`classifier_score` joins hashed features against the dim+1 weight "
        "rows via BroadcastHashJoin (weights never shuffle the corpus); the "
        "per-epoch gradient of `train_quality_classifier` partial-aggregates "
        "map-side, so each task emits at most dim+1 rows regardless of "
        "corpus size — the driver only ever collects the dim+1-row gradient. "
        "The id-keyed join back to the input is a co-partitioned hash join "
        "(sort-merge here; both sides are corpus-sized at 100 TB, so "
        "broadcasting would be wrong).",
        "\n".join(
            ln.strip() for ln in (p27 + p27g).splitlines()
            if "Join" in ln or "Exchange" in ln or "HashAggregate" in ln
        )[:600],
    ))

    # -- 28. ANN assignment above the literal threshold ---------------------
    from nested_pandas_spark.pipeline import similarity as sim

    # mid tier (33..128): broadcast table + HOF, bit-identical to literal
    mid_cents = [
        (i, [123.456789 + i] + [float(i % 7)] * 63) for i in range(100)
    ]
    p28 = explain_str(
        sim.with_nearest_ids(
            emb, F.col("embedding").cast("array<double>"), mid_cents, 4
        )
    )
    p28a = sim.with_nearest_ids(
        emb, F.col("embedding").cast("array<double>"), mid_cents, 4
    )._jdf.queryExecution().analyzed().toString()
    check(
        "mid-tier centroid assignment not plan-literal",
        "123.456" not in p28a and len(p28a) < 20000,
        f"centroid coordinates leaked into the plan (len={len(p28a)})",
    )
    check(
        "mid-tier centroid assignment broadcasts the table",
        "BroadcastNestedLoopJoin" in p28 or "BroadcastExchange" in p28,
        "centroid table not broadcast",
    )
    # top tier (>128): Arrow matmul — no join at all, still no literals
    big_cents = [
        (i, [123.456789 + i] + [float(i % 7)] * 63) for i in range(256)
    ]
    big_df = sim.with_nearest_ids(
        emb, F.col("embedding").cast("array<double>"), big_cents, 4
    )
    p28b = big_df._jdf.queryExecution().analyzed().toString()
    p28bp = explain_str(big_df)
    check(
        "matmul-tier centroid assignment not plan-literal",
        "123.456" not in p28b and len(p28b) < 20000,
        f"centroid coordinates leaked into the plan (len={len(p28b)})",
    )
    check(
        "matmul-tier assignment is Arrow-batched (MapInPandas), no join",
        "MapInPandas" in p28bp and "Join" not in p28bp,
        "expected a join-free MapInPandas plan for the matmul tier",
    )
    sections.append((
        "ANN centroid assignment above 32 centroids: O(1) plan, three tiers",
        "Above `_LITERAL_CENTROID_MAX` (32) the centroid/codebook matrix "
        "never appears as plan literals: up to `_HOF_CENTROID_MAX` (128) "
        "it rides as ONE broadcast single-row table with a HOF argmin "
        "(bit-identical to the literal fold); above that the assignment is "
        "an Arrow-batched NumPy matmul (the FAISS shape) — one BLAS call "
        "per batch instead of n_centroids x dim interpreted lambda "
        "evaluations per row, which is what a 10^4-10^5-centroid 100 TB "
        "IVF needs. All tiers: no centroid coordinate in the plan, "
        "constant plan size in n_centroids.",
        "\n".join(
            ln.strip() for ln in (p28 + p28bp).splitlines()
            if "Join" in ln or "Exchange" in ln or "MapInPandas" in ln
        )[:600],
    ))

    # -- 29. PII / code-quality filters are map-only ------------------------
    from nested_pandas_spark.pipeline.code import with_code_signals
    from nested_pandas_spark.pipeline.pii import redact_pii

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    p29 = explain_str(redact_pii(docs, "text"))
    p29c = explain_str(with_code_signals(docs, "text"))
    check(
        "redact_pii adds no shuffle",
        "Exchange" not in p29,
        "PII scrub should be a pure projection",
    )
    check(
        "code signals add no shuffle",
        "Exchange" not in p29c,
        "code-quality signals should be a pure projection",
    )
    check(
        "PII/code filters never leave the JVM",
        all(
            marker not in p29 and marker not in p29c
            for marker in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython")
        ),
        "scrub/signal projections fell back to Python",
    )
    sections.append((
        "PII scrub and code-quality signals: map-only, JVM-side",
        "`redact_pii` (Luhn-gated) and `with_code_signals` plan as pure "
        "projections over the scan — zero Exchange, zero Python (the HOF "
        "pieces are CodegenFallback: interpreted Catalyst expressions, "
        "still JVM-side and fused into the scan stage) — so at 100 TB they "
        "ride along whatever stage reads the corpus.",
        "\n".join(
            ln.strip() for ln in (p29 + p29c).splitlines()
            if "Exchange" in ln or "WholeStageCodegen" in ln or "Scan" in ln
        )[:400],
    ))

    # -- 30. Bloom dedup: broadcast bitmap, no cartesian --------------------
    from nested_pandas_spark.pipeline.dedup import (
        BloomBitmap,
        bloom_dedup_against,
    )

    bloom = BloomBitmap([0] * (1 << 10), 1 << 16, 4)
    p30 = explain_str(
        bloom_dedup_against(docs, docs.limit(10), bloom=bloom)
    )
    check(
        "bloom bitmap is broadcast",
        "BroadcastExchange" in p30 or "BroadcastNestedLoopJoin" in p30,
        "the one-row bitmap frame should broadcast",
    )
    check(
        "bloom dedup no CartesianProduct",
        "CartesianProduct" not in p30,
        "bitmap cross join planned as a real cartesian",
    )
    sections.append((
        "Bloom-prefiltered dedup: broadcast bitmap, hash-only anti-join",
        "The bitmap rides as ONE broadcast single-row table (the "
        "random_projection pattern — never plan literals); definite-new rows "
        "skip the anti-join entirely, and only Bloom hits shuffle their "
        "32-hex fingerprints. Per-ingest cost at 100 TB: a map-only bit "
        "probe plus an anti-join whose left side is ~the true duplicates.",
        "\n".join(
            ln.strip() for ln in p30.splitlines()
            if "Join" in ln or "Exchange" in ln
        )[:400],
    ))

    # -- 31. PageRank: O(1) lineage across iterations -----------------------
    from nested_pandas_spark.pipeline.graph import pagerank

    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 13) % 100).alias("dst"),
    )
    pr2 = pagerank(edges, iters=2)
    pr5 = pagerank(edges, iters=5)
    p31a, p31b = explain_str(pr2), explain_str(pr5)
    check(
        "pagerank lineage is cut per iteration",
        "ExistingRDD" in p31b,
        "rank frame should scan the checkpointed RDD, not replay lineage",
    )
    check(
        "pagerank plan size is O(1) in iterations",
        len(p31b) < 1.5 * len(p31a) + 2000,
        f"plan grows with iterations ({len(p31a)} -> {len(p31b)} chars)",
    )
    check(
        "pagerank no CartesianProduct",
        "CartesianProduct" not in p31b,
        "dangling-mass fold planned as a real cartesian",
    )
    sections.append((
        "PageRank: checkpoint-cut lineage, broadcast dangling mass",
        "Each iteration's rank frame is eagerly localCheckpoint-ed, so the "
        "plan of iteration N reads ExistingRDD and its SIZE does not grow "
        "with N (no lineage replay, no codegen blowup at iters=50). The "
        "dangling-mass one-row aggregate folds back via broadcast; the only "
        "per-iteration shuffles are the contribution groupBy(dst) and the "
        "node join — the irreducible PageRank shape.",
        "\n".join(
            ln.strip() for ln in p31b.splitlines()
            if "Join" in ln or "Exchange" in ln or "ExistingRDD" in ln
        )[:500],
    ))

    # -- 32. Chat assembly: ONE shuffle -------------------------------------
    from nested_pandas_spark.pipeline.chat import (
        assemble_conversations,
        render_template,
        truncate_to_budget,
    )

    ev = spark.read.parquet(f"{sf}/events.parquet")
    conv = assemble_conversations(
        ev.withColumn("role", F.lit("user")).withColumn(
            "content", F.col("event_type")
        ),
        "user_id", "ts", "role", "content", tiebreak="event_id",
    ).select(
        "user_id",
        render_template("turns").alias("txt"),
        truncate_to_budget("turns", 64).alias("kept"),
    )
    p32 = explain_str(conv)
    n_exchanges = p32.count("Arguments: hashpartitioning")
    check(
        "chat assembly is one shuffle",
        n_exchanges == 1,
        f"expected exactly 1 hash exchange, saw {n_exchanges}",
    )
    check(
        "render/truncate add no shuffle or Python",
        "MapInPandas" not in p32 and "BatchEvalPython" not in p32,
        "template render / budget truncation left the JVM",
    )
    sections.append((
        "Conversation assembly: one groupBy shuffle, HOF render/truncate",
        "assemble_conversations plans exactly ONE hash exchange (the "
        "conversation-key groupBy; ordering happens inside array_sort in "
        "the aggregation buffer). Template rendering and keep-last budget "
        "truncation are pure HOF projections on the turns array — no "
        "second shuffle, no Python, no explode.",
        "\n".join(
            ln.strip() for ln in p32.splitlines()
            if "Exchange" in ln or "Aggregate" in ln
        )[:400],
    ))

    # -- 33. Sketches: partial agg caps the shuffle at sketch size ----------
    from nested_pandas_spark.pipeline.sketches import cms_sketch, hll_registers
    from nested_pandas_spark.pipeline.text import words as _words

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    p33 = explain_str(
        hll_registers(li, "l_partkey", b=6, by=["l_returnflag"])
    )
    check(
        "HLL partial max runs map-side before the exchange",
        "partial_max" in p33
        and p33.index("partial_max") > p33.index("Exchange"),
        "no map-side partial_max below the exchange in the HLL plan",
    )
    tokens = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.explode(_words(F.col("text"))).alias("w")
    )
    p33b = explain_str(cms_sketch(tokens, "w", depth=4, width=64))
    check(
        "CMS partial count runs map-side before the exchange",
        "partial_count" in p33b
        and p33b.index("partial_count") > p33b.index("Exchange"),
        "no map-side partial_count below the exchange in the CMS plan",
    )
    sections.append((
        "HLL / Count-Min sketches: the exchange carries cells, not values",
        "Both sketch builders aggregate with partial map-side functions "
        "(max of rho / count per cell), so each task contributes at most "
        "2^b (HLL) or depth*width (CMS) rows per group to the shuffle — "
        "the sketch property that makes cardinality/frequency monitoring "
        "affordable at 100 TB. (In 'formatted' explain the Exchange node "
        "prints above its input HashAggregate, hence the index check.)",
        "\n".join(
            ln.strip() for ln in p33.splitlines()
            if "Exchange" in ln or "partial" in ln or "Functions" in ln
        )[:400],
    ))

    # -- 34. span_corrupt: zero shuffles (round-10 array-HOF rewrite) -------
    from nested_pandas_spark.pipeline.masking import span_corrupt

    p34 = explain_str(
        span_corrupt(spark.read.parquet(f"{sf}/documents.parquet"), "text")
    )
    n_ex34 = p34.count("Arguments: hashpartitioning")
    check(
        "span_corrupt plans zero exchanges",
        n_ex34 == 0,
        f"expected 0 hash exchanges (per-row array HOFs), saw {n_ex34}",
    )
    sections.append((
        "T5 span corruption: zero exchanges, pure per-row array HOFs",
        "Every output value depends only on the document's own token "
        "list, so masked flags, span starts and both output strings are "
        "array higher-order functions over the tokenized text — no "
        "posexplode, no window, no re-group. Corpus text never crosses "
        "the wire at all (round 10; previously one shared doc_id "
        "exchange).",
        "\n".join(
            ln.strip() for ln in p34.splitlines()
            if "Exchange" in ln or "Project" in ln or "Scan" in ln
        )[:400],
    ))

    # -- 35. PCA transform: broadcast matrix, zero shuffle, pure JVM --------
    from nested_pandas_spark.pipeline.embeddings import pca_fit, pca_transform

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    model = pca_fit(emb, k=8, vec_col="embedding", dim=64)
    p35 = explain_str(pca_transform(emb, model, "embedding"))
    check(
        "PCA projection is broadcast + zero shuffle",
        "BroadcastExchange" in p35
        and p35.count("Arguments: hashpartitioning") == 0,
        "projection should broadcast the matrix row and add no exchange",
    )
    check(
        "PCA projection stays in the JVM",
        "MapInPandas" not in p35 and "BatchEvalPython" not in p35
        and "MapInArrow" not in p35,
        "the transform (not the fit) must be a pure HOF projection",
    )
    sections.append((
        "PCA/whitening projection: one broadcast matrix row, no Python",
        "pca_fit reduces each partition to one (n, sum, gram) moment row "
        "via mapInArrow (driver collects numPartitions rows, never data); "
        "the transform ships the (k x d) matrix as ONE broadcast row and "
        "projects with transform/zip_with/aggregate HOFs — O(1) plan "
        "nodes, zero shuffle, whole-stage codegen.",
        "\n".join(
            ln.strip() for ln in p35.splitlines()
            if "Broadcast" in ln or "Project" in ln
        )[:400],
    ))

    # -- 36. pq_topk ADC scan: LUT lookups over codes, no reconstruction ----
    q36 = emb.where(F.col("vec_id") < 10)
    pq_sql = sim.pq_topk(emb, q36, k=3, n_sub=4, n_centroids=8, refine=4,
                         impl="sql")
    p36a = pq_sql._jdf.queryExecution().analyzed().toString()
    check(
        "pq_topk SQL twin scores via per-query LUT, not reconstructions",
        "__lut" in p36a and "__recon" not in p36a,
        "expected a __lut column in the analyzed plan and no __recon",
    )
    pq_df = sim.pq_topk(emb, q36, k=3, n_sub=4, n_centroids=8, refine=4)
    p36b = pq_df._jdf.queryExecution().analyzed().toString()
    check(
        "pq_topk shipped scan is the Arrow kernel (no LUT expression tree,"
        " no code crossJoin)",
        "MapInPandas" in p36b and "__lut" not in p36b,
        "expected a MapInPandas ADC scan and no __lut column in the "
        "default plan",
    )
    sections.append((
        "PQ top-k: ADC scan reads codes only (per-query LUT)",
        "pq_topk's candidate scan scores each corpus row with n_sub "
        "lookups into a per-query LUT over its pq_code (Jégou 2011 ADC, "
        "same machinery as ivfpq_topk) — the scan never materializes an "
        "O(dim) reconstruction per (query, candidate) pair, so at 100 TB "
        "it touches ~n_sub bytes per corpus row. Raw vectors are read "
        "only for the refine*k exact re-rank per query. The shipped scan "
        "engine is an Arrow-batched NumPy kernel (MapInPandas: LUT "
        "gather-adds, per-batch tournament truncation — bit-identical "
        "doubles to the SQL twin, which stays selectable via impl='sql' "
        "as the oracle-replayable formulation).",
        "\n".join(
            ln.strip() for ln in p36a.splitlines() if "__lut" in ln
        )[:300] + "\n--- default (arrow) ---\n" + "\n".join(
            ln.strip() for ln in p36b.splitlines() if "MapInPandas" in ln
        )[:200],
    ))

    # -- 37. eTLD+1 lookup: zero shuffle, one literal map, codegen-sized ----
    from nested_pandas_spark.pipeline.web import with_registrable_domain

    docs37 = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.concat(F.lit("https://a.b.example"),
                           (F.col("doc_id") % 7).cast("string"),
                           F.lit(".co.uk/x")).alias("url"))
    rd = with_registrable_domain(docs37, url_col="url")
    p37 = explain_str(rd)
    p37x = rd._jdf.queryExecution().executedPlan().toString()
    check(
        "registrable_domain adds no shuffle",
        "Exchange" not in p37,
        "eTLD+1 lookup must be a map-only projection",
    )
    check(
        "registrable_domain plan stays codegen-sized",
        "*(1)" in p37x and len(p37x) < 40000
        and p37x.count("co.uk") <= 2,
        f"rule map inlined more than once (len={len(p37x)}, "
        f"occurrences={p37x.count('co.uk')}) — 64KB codegen limit risk",
    )
    sections.append((
        "eTLD+1 registrable domains: let-bound rule map, zero shuffle",
        "The public-suffix lookup is O(max_rule_depth) map probes per "
        "row with the rule map and label array LET-BOUND through a "
        "single-element transform lambda, so the ~560-entry snapshot "
        "map appears ONCE in the plan (inlining it at each of ~3*depth "
        "references overflowed the JVM 64KB codegen method limit and "
        "dropped the stage to interpreted mode). Above 1k rules (the "
        "full PSL via load_psl_rules) the map ships as one broadcast "
        "row instead. Either way: map-only, no exchange.",
        "\n".join(
            ln.strip() for ln in p37.splitlines()
            if "Project" in ln or "Scan" in ln
        )[:400],
    ))

    # -- 38. WordPiece encode: zero shuffle, vocab map bound once -----------
    from nested_pandas_spark.pipeline.wordpiece import wordpiece_encode

    docs38 = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text")
    pieces38 = (
        [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##he", "the", "##ue"]
    )
    wp = wordpiece_encode(docs38, pieces38)
    p38 = explain_str(wp)
    p38x = wp._jdf.queryExecution().executedPlan().toString()
    check(
        "wordpiece_encode adds no shuffle",
        "Exchange" not in p38,
        "greedy longest-match must be a map-only projection",
    )
    check(
        "wordpiece vocab map appears once in the plan",
        p38x.count("##he") <= 1,
        f"vocab inlined {p38x.count('##he')} times — let-binding broken",
    )
    sections.append((
        "WordPiece encode: let-bound vocab map, zero shuffle",
        "The greedy longest-match-first fold probes the piece map "
        "O(len * max_piece_len) times per word, but the ~60-entry map "
        "literal is LET-BOUND through a single-element transform lambda "
        "(the eTLD+1 plan-size guard) so it rides the plan ONCE. No "
        "exchange, no UDF, no join: token arrays never leave the row.",
        "\n".join(
            ln.strip() for ln in p38.splitlines()
            if "Project" in ln or "Scan" in ln
        )[:400],
    ))

    # -- 39. prefix-LM split: zero shuffle ----------------------------------
    from nested_pandas_spark.pipeline.masking import prefix_lm_split

    pl = prefix_lm_split(docs38)
    p39 = explain_str(pl)
    check(
        "prefix_lm_split adds no shuffle",
        "Exchange" not in p39,
        "the pivot is a per-row projection over the token array",
    )
    sections.append((
        "UL2 prefix-LM split: single projection, zero shuffle",
        "The S-denoiser pivot is computed per row from md5(seed:id) and "
        "the token array sliced in place — unlike span corruption (which "
        "needs a window over exploded tokens and costs its one exchange), "
        "the prefix objective never leaves the row.",
        "\n".join(
            ln.strip() for ln in p39.splitlines()
            if "Project" in ln or "Scan" in ln
        )[:400],
    ))

    # -- 40. exact top-k frequent: TakeOrderedAndProject, no window --------
    from nested_pandas_spark.pipeline.sketches import topk_frequent

    w40 = docs38.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    tk40 = topk_frequent(w40.where(F.col("w") != ""), "w", 5)
    p40 = tk40._jdf.queryExecution().executedPlan().toString()
    check(
        "global top-k frequent uses TakeOrderedAndProject",
        "TakeOrderedAndProject" in p40 and "Window" not in p40,
        "global candidate selection must not be a single-partition window",
    )
    check(
        "top-k phase-1 exchange carries fingerprints",
        "xxhash64" in p40,
        "expected the xxhash64 fingerprint in the aggregation key",
    )
    sections.append((
        "Exact top-k frequent: fingerprint shuffle + TakeOrderedAndProject",
        "Phase 1 aggregates 8-byte xxhash64 fingerprints (map-side "
        "partial counts; the exchange never carries the strings); global "
        "candidate selection compiles to TakeOrderedAndProject — each "
        "task keeps its local top-2k and the driver merges, no "
        "single-partition window shuffle. Phase 2 re-counts only the "
        "broadcast candidates' rows by actual value.",
        "\n".join(
            ln.strip() for ln in p40.splitlines()
            if "TakeOrdered" in ln or "Exchange" in ln
            or "BroadcastHashJoin" in ln
        )[:400],
    ))

    # -- 41. IVF append: only assigned partition dirs gain files; search
    #        over the grown store still partition-prunes ------------------
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from nested_pandas_spark.pipeline.similarity import ivf_centroids
    from nested_pandas_spark.sources.ivf_store import (
        append_ivf_index,
        ivf_search,
        write_ivf_index,
    )

    emb41 = spark.read.parquet(f"{sf}/embeddings.parquet")
    d41 = _tempfile.mkdtemp(prefix="plan41_ivf_")
    try:
        cents41 = ivf_centroids(emb41, n_centroids=4, n_iters=1)
        write_ivf_index(emb41.where(F.col("vec_id") % 2 == 0), d41,
                        centroids=cents41)
        before41 = {
            d: sorted(_os.listdir(_os.path.join(d41, d)))
            for d in _os.listdir(d41) if d.startswith("__cid=")
        }
        counts41 = append_ivf_index(
            emb41.where(F.col("vec_id") % 2 == 1), d41)
        touched = {f"__cid={cid}" for cid, _ in counts41}
        after41 = {
            d: sorted(_os.listdir(_os.path.join(d41, d)))
            for d in _os.listdir(d41) if d.startswith("__cid=")
        }
        untouched_ok = all(
            after41[d] == before41.get(d, []) for d in after41
            if d not in touched
        )
        check(
            "ivf append writes only the assigned partition dirs",
            set(after41) == set(before41) | touched and untouched_ok,
            f"dirs before={sorted(before41)} touched={sorted(touched)} "
            f"after={sorted(after41)}",
        )
        q41 = emb41.where(F.col("vec_id") == 0)
        s41 = ivf_search(spark, d41, q41, k=2, n_probe=1)
        p41 = s41._jdf.queryExecution().executedPlan().toString()
        check(
            "search over an appended store still partition-prunes",
            "PartitionFilters" in p41
            and "__cid" in p41.split("PartitionFilters")[1][:200],
            "expected a __cid PartitionFilter on the grown store's scan",
        )
        sections.append((
            "Incremental IVF append: partition-dir discipline + pruned search",
            "append_ivf_index assigns new vectors to the STORED sidecar "
            "centroids and appends with mode('append') + partitionBy — "
            "only directories that receive data are touched (verified "
            "above on the actual filesystem), so a daily append to a "
            "100 TB index rewrites nothing and invalidates no existing "
            "files. A search over the grown store plans the same literal "
            "__cid PartitionFilters as a freshly-written one: appends "
            "never degrade the planning-time pruning.",
            "\n".join(
                ln.strip() for ln in p41.splitlines()
                if "PartitionFilters" in ln or "Scan" in ln
            )[:400],
        ))
    finally:
        _shutil.rmtree(d41, ignore_errors=True)

    # -- write PLANS.md -----------------------------------------------------
    doc = [
        "# PLANS — physical-plan evidence for the scale claims",
        "",
        "Generated by `python tools/plan_audit.py` (re-run any time; the "
        "script FAILS if a claim stops holding). Each section: the claim, "
        "then the relevant lines of the actual `explain('formatted')` output "
        f"at `{sf}`.",
        "",
    ]
    for title, why, plan in sections:
        doc += [f"## {title}", "", why, "", "```", plan, "```", ""]
    if failures:
        doc += ["## FAILURES", ""] + [f"- {f}" for f in failures]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(doc))

    for f in failures:
        print(f"FAIL {f}")
    print("PLANS.md written;", "ALL PLAN CHECKS PASS" if not failures else f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
