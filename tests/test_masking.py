"""T5 span corruption: Python-reference parity, reconstruction, plan shape."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.masking import span_corrupt


def _py_span_corrupt(doc_id, text, p=0.15, seed=42):
    toks = [w for w in re.split(r"\s+", (text or "").lower()) if w]
    if not toks:
        return None
    thr = format(int(p * 16**8), "08x")
    masked = [
        hashlib.md5(f"{seed}:{doc_id}:{i}".encode()).hexdigest()[:8] < thr
        for i in range(len(toks))
    ]
    inp, tgt, k = [], [], 0
    for i, (w, m) in enumerate(zip(toks, masked)):
        if not m:
            inp.append(w)
        elif i == 0 or not masked[i - 1]:
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {w}")
            k += 1
        else:
            tgt.append(w)
    tgt.append(f"<extra_id_{k}>")
    return (doc_id, " ".join(inp), " ".join(tgt), k)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 31 + j) % 97}" for j in range((i % 40) + 1)))
        for i in range(200)
    ]
    rows += [(900, None), (901, ""), (902, "   "), (903, "single")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference(spark, docs):
    got = sorted(tuple(r) for r in span_corrupt(docs, "text").collect())
    pdf = docs.toPandas()
    want = sorted(
        r
        for r in (
            _py_span_corrupt(int(t.doc_id), t.text) for t in pdf.itertuples()
        )
        if r is not None
    )
    assert got == want


def test_empty_docs_dropped(spark, docs):
    ids = {r["doc_id"] for r in span_corrupt(docs, "text").select("doc_id").collect()}
    assert 900 not in ids and 901 not in ids and 902 not in ids
    assert 903 in ids


def test_reconstruction(spark, docs):
    """Interleaving input with target spans reproduces the original tokens."""
    for row in span_corrupt(docs, "text", noise_density=0.4).collect():
        spans = {}
        cur = None
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
        doc = docs.where(F.col("doc_id") == row["doc_id"]).collect()[0]
        orig = [w for w in re.split(r"\s+", doc["text"].lower()) if w]
        assert rebuilt == orig


def test_mask_rate_near_density(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(50))) for i in range(100)],
        "doc_id long, text string",
    )
    out = span_corrupt(df, "text", noise_density=0.15)
    # masked token count = total target tokens minus sentinel tokens
    masked = out.select(
        F.sum(
            F.size(F.split("target_text", " "))
            - (F.col("n_spans") + 1)
        ).alias("n")
    ).collect()[0]["n"]
    assert abs(masked / (100 * 50) - 0.15) < 0.02


def test_single_exchange_plan(spark, docs):
    plan = span_corrupt(docs, "text")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n = len([l for l in plan.splitlines() if l.startswith("(") and l.split(") ")[1].startswith("Exchange")])
    assert n == 1


def test_density_validation(spark, docs):
    with pytest.raises(ValueError):
        span_corrupt(docs, "text", noise_density=0.0)
    with pytest.raises(ValueError):
        span_corrupt(docs, "text", noise_density=1.5)
