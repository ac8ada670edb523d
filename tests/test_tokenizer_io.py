"""Tokenizer artifact save/load: byte-stable JSON, encode-equality round
trips for all four families."""

import os

import pytest
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.tokenizer_io import (
    load_tokenizer,
    save_tokenizer,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest low"),
         (2, None), (3, "the lowest new low")],
        "doc_id long, text string",
    )


def _toks(df, col="tokens"):
    return sorted(
        (r["doc_id"], tuple(r[col]) if r[col] is not None else None)
        for r in df.collect()
    )


def test_bpe_roundtrip(spark, docs, tmp_path):
    from nested_pandas_spark.pipeline.text import bpe_encode, bpe_train

    m, _ = bpe_train(docs, 4, end_marker=None)
    p = str(tmp_path / "bpe.json")
    save_tokenizer(p, "bpe", m)
    fam, merges = load_tokenizer(p)
    assert fam == "bpe"
    a = _toks(bpe_encode(docs, m, end_marker=None))
    b = _toks(bpe_encode(docs, merges, end_marker=None))
    assert a == b


def test_byte_bpe_roundtrip(spark, docs, tmp_path):
    from nested_pandas_spark.pipeline.text import (
        byte_bpe_encode, byte_bpe_train,
    )

    m, v = byte_bpe_train(docs, 3)
    v.unpersist()
    p = str(tmp_path / "bbpe.json")
    save_tokenizer(p, "byte_bpe", m)
    fam, merges = load_tokenizer(p)
    assert fam == "byte_bpe"
    assert _toks(byte_bpe_encode(docs, m)) == _toks(
        byte_bpe_encode(docs, merges))


def test_wordpiece_roundtrip(spark, docs, tmp_path):
    from nested_pandas_spark.pipeline.wordpiece import (
        wordpiece_encode, wordpiece_pieces, wordpiece_train,
    )

    m, v = wordpiece_train(docs, 4)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    p = str(tmp_path / "wp.json")
    save_tokenizer(p, "wordpiece", pieces, unk="<unk>")
    fam, payload = load_tokenizer(p)
    assert fam == "wordpiece" and payload["unk"] == "<unk>"
    a = _toks(wordpiece_encode(docs, pieces, unk="<unk>"))
    b = _toks(wordpiece_encode(docs, payload["pieces"], unk=payload["unk"]))
    assert a == b


def test_unigram_roundtrip(spark, docs, tmp_path):
    from nested_pandas_spark.pipeline.unigram import (
        unigram_encode, unigram_train,
    )

    vocab = unigram_train(docs, vocab_size=30, n_iters=1, min_count=1)
    p = str(tmp_path / "ug.json")
    save_tokenizer(p, "unigram", vocab)
    fam, loaded = load_tokenizer(p, spark=spark)
    assert fam == "unigram"
    a = _toks(unigram_encode(docs, vocab), "pieces")
    b = _toks(unigram_encode(docs, loaded), "pieces")
    assert a == b
    with pytest.raises(ValueError, match="needs spark"):
        load_tokenizer(p)


def test_artifact_bytes_reproducible(spark, docs, tmp_path):
    from nested_pandas_spark.pipeline.wordpiece import (
        wordpiece_pieces, wordpiece_train,
    )

    m, v = wordpiece_train(docs, 2)
    pieces = wordpiece_pieces(m, v)
    v.unpersist()
    p1, p2 = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    save_tokenizer(p1, "wordpiece", pieces)
    save_tokenizer(p2, "wordpiece", list(reversed(pieces)))
    assert open(p1, "rb").read() == open(p2, "rb").read()
    assert not os.path.exists(p1 + ".tmp")


def test_rejects_garbage(spark, tmp_path):
    p = str(tmp_path / "x.json")
    with pytest.raises(ValueError, match="unknown tokenizer family"):
        save_tokenizer(p, "sentencepiece", [])
    open(p, "w").write('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a"):
        load_tokenizer(p)
    open(p, "w").write(
        '{"format": "nested-pandas-spark-tokenizer", "version": 9,'
        ' "family": "bpe", "merges": []}'
    )
    with pytest.raises(ValueError, match="unsupported version"):
        load_tokenizer(p)
