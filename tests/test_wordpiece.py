"""WordPiece tokenizer: pure-Python reference parity for train + encode.

The Python reference implements the public algorithms directly —
likelihood-scored merges (HF ``tokenizers`` WordPiece trainer scoring
rule) and BERT's greedy longest-match-first WordpieceTokenizer — and the
Spark implementation must match it exactly on every fixture."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.wordpiece import (
    wordpiece_decode,
    wordpiece_encode,
    wordpiece_pieces,
    wordpiece_train,
)


# -------------------------------------------------- pure-Python reference


def _py_words(texts):
    cnt = Counter()
    for t in texts:
        cnt.update(w for w in re.split(r"\s+", (t or "").lower()) if w)
    return cnt


def _py_syms(word):
    return [word[0]] + ["##" + c for c in word[1:]]


def _py_train(texts, n_merges, min_pair_count=1):
    wc = _py_words(texts)
    vocab = {w: _py_syms(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pair_n = Counter()
        sym_n = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for s in syms:
                sym_n[s] += n
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] += n
        if not pair_n:
            break
        # deterministic tie-break: score desc, n desc, l asc, r asc
        cands = sorted(
            pair_n.items(),
            key=lambda kv: (
                # two-division form, same IEEE ops as the engine/oracle
                -((kv[1] / sym_n[kv[0][0]]) / sym_n[kv[0][1]]),
                -kv[1],
                kv[0][0],
                kv[0][1],
            ),
        )
        (l, r), n = cands[0]
        if n < min_pair_count:
            break
        merged = l + (r[2:] if r.startswith("##") else r)
        merges.append((step, l, r, merged, n, sym_n[l], sym_n[r]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _py_encode_word(word, pieces, unk="[UNK]"):
    maxp = max(
        (len(p) - 2 if p.startswith("##") else len(p)) for p in pieces
    )
    toks, pos = [], 0
    while pos < len(word):
        for ln in range(min(maxp, len(word) - pos), 0, -1):
            cand = word[pos : pos + ln]
            if pos > 0:
                cand = "##" + cand
            if cand in pieces:
                toks.append(cand)
                pos += ln
                break
        else:
            return [unk]
    return toks


def _py_encode(text, pieces, unk="[UNK]"):
    if text is None:
        return None
    out = []
    for w in re.split(r"\s+", text.lower()):
        if w:
            out.extend(_py_encode_word(w, pieces, unk))
    return out


TEXTS = [
    "low lower lowest",
    "new newer newest low",
    None,
    "zzz qqq low",
    "the quick brown fox jumps over the lazy dog",
    "a ab abc abcd abcde",
    "",
    "repeat repeat repeat repeat",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "id long, text string"
    )


def test_train_matches_python_reference(spark, docs):
    m, v = wordpiece_train(docs, 6)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["n"], r["lc"],
         r["rc"])
        for r in m.orderBy("step").collect()
    ]
    want, _ = _py_train(TEXTS, 6)
    v.unpersist()
    assert got == want


def test_merged_symbol_strips_continuation_prefix(spark, docs):
    m, v = wordpiece_train(docs, 4)
    v.unpersist()
    for r in m.collect():
        suffix = r["right"][2:] if r["right"].startswith("##") else r["right"]
        assert r["merged"] == r["left"] + suffix
        assert not r["merged"].startswith("####")


def test_pieces_cover_training_alphabet(spark, docs):
    m, v = wordpiece_train(docs, 3)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    chars = set()
    for t in TEXTS:
        for w in re.split(r"\s+", (t or "").lower()):
            if w:
                chars.add(w[0])
                chars.update("##" + c for c in w[1:])
    # every training char survives (merged or as a base piece) — encode of
    # the training corpus with these pieces must have zero UNKs
    enc = wordpiece_encode(docs, pieces)
    assert enc.agg(F.sum("tokens_unk")).collect()[0][0] == 0


def test_encode_matches_python_reference(spark, docs):
    m, v = wordpiece_train(docs, 5)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    got = {
        r["id"]: r["tokens"]
        for r in wordpiece_encode(docs, pieces).collect()
    }
    pset = set(pieces)
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_encode(t, pset), (i, t)


def test_encode_unk_whole_word(spark, docs):
    # drop every piece containing 'z': 'zzz' must become a single [UNK]
    m, v = wordpiece_train(docs, 3)
    pieces = [p for p in wordpiece_pieces(m, v) if "z" not in p]
    v.unpersist()
    row = (
        wordpiece_encode(docs, pieces)
        .where("id = 3")
        .collect()[0]
    )
    assert row["tokens"][0] == "[UNK]"
    assert row["tokens_unk"] == 1
    assert row["tokens"].count("[UNK]") == 1  # whole word, not per char


def test_encode_greedy_prefers_longest(spark):
    df = spark.createDataFrame([(0, "unaffable")], "id long, text string")
    pieces = ["un", "##aff", "##able", "##a", "##f", "##b", "##l", "##e",
              "u", "##n"]
    got = wordpiece_encode(df, pieces).collect()[0]["tokens"]
    assert got == ["un", "##aff", "##able"]  # BERT paper's example


def test_encode_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   ")], "id long, text string"
    )
    rows = {
        r["id"]: r
        for r in wordpiece_encode(df, ["a", "##a"]).collect()
    }
    assert rows[0]["tokens"] is None and rows[0]["tokens_n"] is None
    assert rows[1]["tokens"] == [] and rows[1]["tokens_n"] == 0
    assert rows[2]["tokens"] == [] and rows[2]["tokens_unk"] == 0


def test_decode_roundtrip(spark, docs):
    m, v = wordpiece_train(docs, 5)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    enc = wordpiece_encode(docs, pieces)
    rows = enc.select(
        "id", "text", wordpiece_decode("tokens").alias("dec")
    ).collect()
    for r in rows:
        if r["text"] is None:
            assert r["dec"] is None
        else:
            want = " ".join(
                w for w in re.split(r"\s+", r["text"].lower()) if w
            )
            assert r["dec"] == want


def test_encode_accepts_piece_dataframe(spark, docs):
    m, v = wordpiece_train(docs, 2)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    pdf = spark.createDataFrame([(p,) for p in pieces], "piece string")
    a = wordpiece_encode(docs, pieces).select("id", "tokens").collect()
    b = wordpiece_encode(docs, pdf).select("id", "tokens").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_encode_vocab_matches_literal(spark, docs):
    # the distinct-word-cache path must equal wordpiece_encode exactly,
    # including NULL text, empty text, and whole-word UNKs
    from nested_pandas_spark.pipeline.wordpiece import (
        wordpiece_encode_vocab,
    )

    m, v = wordpiece_train(docs, 5)
    pieces = [p for p in wordpiece_pieces(m, v) if "z" not in p]
    v.unpersist()
    a = {
        r["id"]: (r["tokens"], r["tokens_n"], r["tokens_unk"])
        for r in wordpiece_encode(docs, pieces).collect()
    }
    b = {
        r["id"]: (r["tokens"], r["tokens_n"], r["tokens_unk"])
        for r in wordpiece_encode_vocab(docs, pieces).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        wordpiece_encode_vocab(docs, [])


def test_train_validates_args(spark, docs):
    with pytest.raises(ValueError):
        wordpiece_train(docs, 0)
    with pytest.raises(ValueError):
        wordpiece_train(docs, 1, min_pair_count=0)
    with pytest.raises(ValueError):
        wordpiece_encode(docs, [])


def test_vocab_size_budget(spark, docs):
    from nested_pandas_spark.pipeline.wordpiece import (
        wordpiece_pieces, wordpiece_train,
    )

    # base alphabet of TEXTS, as the trainer counts it
    base = set()
    for t in TEXTS:
        for w in re.split(r"\s+", (t or "").lower()):
            if w:
                base.add(w[0])
                base.update("##" + c for c in w[1:])
    m, v = wordpiece_train(docs, vocab_size=len(base) + 3)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    assert m.count() == 3
    assert len(pieces) <= len(base) + 3  # merges can erase a symbol's
    # last free occurrence, so <= not ==
    with pytest.raises(ValueError, match="base alphabet"):
        m2, v2 = wordpiece_train(docs, vocab_size=3)
    with pytest.raises(ValueError, match="exactly one"):
        wordpiece_train(docs)
    with pytest.raises(ValueError, match="exactly one"):
        wordpiece_train(docs, 3, vocab_size=50)
