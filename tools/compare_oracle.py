"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB over the same parquet dir;
compare row count, column names, and order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query_name ...]
       python tools/compare_oracle.py --json OUT.json [sf_dir] [query_name ...]

--json writes a machine-readable per-query verdict file (the durable
round artifact CORRECTNESS_full_r{N}.json — same shape as the driver's
CORRECTNESS_r{N}.json, covering ALL registered queries).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Per-query float tolerance overrides (absolute), applied on top of the
# default 1e-9 isclose. Rationale: for recurrence-valued queries both
# engines compute BIT-IDENTICAL doubles (same fold, same order — see
# nest_ewm), but the final round(x, 6) itself diverges on boundary
# values: Spark rounds via BigDecimal HALF_UP on the exact binary value,
# DuckDB via an x*1e6 floating multiply whose own rounding can push a
# ...4999999 across the .5 line. A value within ~1e-13 of a .5e-6
# boundary may therefore flip the 6th decimal in one engine only —
# measured at sf0.1: 6 of ~42k q97 rows, last digit only. One rounded
# ulp of tolerance absorbs exactly that class and nothing else (real
# defects move values by far more than 1.05e-6).
FLOAT_ATOL = {
    "q97_nest_ewm": 1.05e-6,
}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        # decimals etc -> float
        elif str(df[c].dtype) == "object":
            pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    af = a.astype(float)
                    bf = b.astype(float)
                    atol = FLOAT_ATOL.get(name, 1e-9)
                    bad = ~(np.isclose(af, bf, rtol=1e-9, atol=atol, equal_nan=True))
                else:
                    bad = ~((a == b) | (a.isna() & b.isna()))
            except Exception as exc:
                problems.append(f"col {c}: compare error {exc}")
                continue
            bad = np.asarray(bad)
            nbad = int(bad.sum())
            if nbad:
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {nbad} mismatches, first at {i}: "
                    f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as E
    from nested_pandas_spark import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            err = f"spark error: {str(exc).splitlines()[0][:200]}"
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": err}
            print(f"FAIL {name}: {err}")
            continue
        if name not in oracles:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None,
                             "spark_rows": len(spark_pdf),
                             "oracle_rows": None,
                             "err": "no oracle (rows-only check)"}
            print(f"SKIP {name}: no oracle (rows={len(spark_pdf)})")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            err = f"oracle error: {str(exc).splitlines()[0][:200]}"
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False,
                             "spark_rows": len(spark_pdf),
                             "oracle_rows": None, "err": err}
            print(f"FAIL {name}: {err}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        rows_ok = len(spark_pdf) == len(oracle_pdf)
        schema_ok = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
        results[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": not problems,
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(oracle_pdf),
            "err": "; ".join(problems[:4]) or None,
        }
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows)")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    # stop leftover streaming queries and the session cleanly so teardown
    # doesn't race in-flight tasks (spurious Broken pipe / accumulator noise)
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass
    spark.stop()
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
