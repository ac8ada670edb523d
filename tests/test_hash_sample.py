"""Deterministic hash sampling (pipeline/corpus.py hash_sample)."""

import hashlib

import pytest

from nested_pandas_spark.pipeline.corpus import hash_sample


def _py_keep(seed: int, doc_id: int, p: float) -> bool:
    if p >= 1.0:
        return True
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8]
    return h < format(int(p * 16**8), "08x")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(1000)],
        "doc_id long, lang string",
    )


def test_matches_python_replay(spark, docs):
    kept = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).collect()}
    expect = {i for i in range(1000) if _py_keep(7, i, 0.3)}
    assert kept == expect


def test_deterministic_and_roughly_uniform(spark, docs):
    a = hash_sample(docs, 0.5).count()
    b = hash_sample(docs, 0.5).count()
    assert a == b
    assert 400 < a < 600


def test_edge_fractions(spark, docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 1000


def test_per_stratum(spark, docs):
    out = hash_sample(docs, by="lang", fractions={"en": 1.0, "de": 0.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}
    # absent strata drop
    none = hash_sample(docs, by="lang", fractions={"fr": 1.0})
    assert none.count() == 0


def test_stratum_uses_own_threshold(spark, docs):
    out = hash_sample(docs, by="lang", fractions={"en": 0.2, "de": 0.9}, seed=3)
    rows = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in rows}
    expect_en = sum(1 for i in range(1000) if i % 3 and _py_keep(3, i, 0.2))
    expect_de = sum(1 for i in range(1000) if not i % 3 and _py_keep(3, i, 0.9))
    assert counts.get("en", 0) == expect_en
    assert counts.get("de", 0) == expect_de


def test_arg_validation(spark, docs):
    with pytest.raises(ValueError, match="exactly one"):
        hash_sample(docs)
    with pytest.raises(ValueError, match="exactly one"):
        hash_sample(docs, 0.5, by="lang", fractions={"en": 1.0})
    with pytest.raises(ValueError, match="needs by="):
        hash_sample(docs, fractions={"en": 1.0})
    with pytest.raises(ValueError, match="fraction must be"):
        hash_sample(docs, 1.5).count()
