"""Unigram tokenizer: pure-Python reference parity for the full pipeline."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.unigram import (
    _UNK_LOGP,
    unigram_encode,
    unigram_seed,
    unigram_train,
    viterbi_segment,
)


# -------------------------------------------------- pure-Python reference


def _py_words(texts):
    cnt = Counter()
    for t in texts:
        cnt.update(w for w in re.split(r"\s+", (t or "").lower()) if w)
    return cnt


def _py_seed(texts, seed_size, max_len=6):
    wc = _py_words(texts)
    counts = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                counts[w[i:j]] += n
    chars = {p: n for p, n in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    out = dict(chars)
    out.update(dict(multi))
    return out


def _py_norm(counts):
    total = sum(counts.values())
    return {p: math.log(n / total) for p, n in counts.items()}


def _py_train(texts, vocab_size, n_iters=4, min_count=2, max_len=6, seed_size=None):
    if seed_size is None:
        seed_size = max(vocab_size * 4, 64)
    wc = _py_words(texts)
    counts = _py_seed(texts, seed_size, max_len)
    logp = _py_norm(counts)
    for _ in range(n_iters):
        c = Counter()
        for w, n in wc.items():
            for p in viterbi_segment(w, logp, max_len):
                c[p] += n
        counts = {
            p: n for p, n in c.items() if len(p) == 1 or n >= min_count
        }
        logp = _py_norm(counts)
    chars = {p: n for p, n in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: max(0, vocab_size - len(chars))]
    final = dict(chars)
    final.update(dict(multi))
    return final, _py_norm(final)


TEXTS = [
    "internationalization and internal nationalization",
    "the national international union unionized nationally",
    "unions organize organization reorganized the organizers",
    "internal internals internally nation nations national",
    "the the the union unions organize organized",
    None,
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_seed_matches_python(spark, docs):
    got = {r["piece"]: r["n"] for r in unigram_seed(docs, 50).collect()}
    want = _py_seed(TEXTS, 50)
    assert got == want


def test_train_matches_python(spark, docs):
    vocab = unigram_train(docs, vocab_size=60, n_iters=3, min_count=2)
    got = {r["piece"]: (r["count"], r["logprob"]) for r in vocab.collect()}
    final, logp = _py_train(TEXTS, 60, n_iters=3, min_count=2)
    assert set(got) == set(final)
    for p in final:
        assert got[p][0] == final[p]
        assert got[p][1] == pytest.approx(logp[p], rel=1e-12)


def test_encode_matches_python(spark, docs):
    vocab = unigram_train(docs, vocab_size=60, n_iters=3, min_count=2)
    _, logp = _py_train(TEXTS, 60, n_iters=3, min_count=2)
    out = {
        r["doc_id"]: (r["pieces"], r["pieces_n"])
        for r in unigram_encode(docs, vocab).collect()
    }
    for i, t in enumerate(TEXTS):
        if t is None:
            assert out[i] == (None, None)
            continue
        want = []
        for w in re.split(r"\s+", t.lower()):
            if w:
                want.extend(viterbi_segment(w, logp, 6))
        assert out[i][0] == want
        assert out[i][1] == len(want)


def test_encode_reconstructs_text(spark, docs):
    """Concatenated pieces per word must reproduce the word exactly."""
    vocab = unigram_train(docs, vocab_size=40, n_iters=2, min_count=1)
    enc = unigram_encode(docs.where("text IS NOT NULL"), vocab)
    for r in enc.collect():
        rebuilt = "".join(r["pieces"])
        orig = "".join(w for w in re.split(r"\s+", r["text"].lower()) if w)
        assert rebuilt == orig


def test_viterbi_prefers_likely_pieces():
    logp = {"un": math.log(0.3), "ion": math.log(0.3), "u": math.log(0.1),
            "n": math.log(0.1), "i": math.log(0.1), "o": math.log(0.1)}
    assert viterbi_segment("union", logp, 6) == ["un", "ion"]


def test_viterbi_unk_fallback():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    segs = viterbi_segment("axb", logp, 6)
    assert segs == ["a", "x", "b"]
    assert _UNK_LOGP < math.log(0.5)


def test_oov_word_at_encode(spark, docs):
    vocab = unigram_train(docs, vocab_size=40, n_iters=2, min_count=1)
    extra = spark.createDataFrame([(99, "zzzq")], "doc_id long, text string")
    out = unigram_encode(extra, vocab).collect()[0]
    assert "".join(out["pieces"]) == "zzzq"


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        unigram_train(docs, vocab_size=0)
    with pytest.raises(ValueError):
        unigram_seed(docs, 0)
