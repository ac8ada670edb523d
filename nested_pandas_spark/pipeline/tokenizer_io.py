"""Tokenizer artifact persistence: save a trained tokenizer (any of the
four families — char BPE, byte BPE, WordPiece, unigram-LM) as one JSON
file and load it back ready to encode.

A tokenizer is trained ONCE and then applied to every corpus snapshot,
usually from a different job (or cluster) than the one that trained it —
without an artifact format the merges/pieces live only in a driver
variable. The format is a single self-describing JSON object::

    {"format": "nested-pandas-spark-tokenizer", "version": 1,
     "family": "bpe" | "byte_bpe" | "wordpiece" | "unigram",
     ...family payload...}

* ``bpe`` / ``byte_bpe``: ``{"merges": [[left, right], ...]}`` in
  training order (byte-BPE symbols are the two-hex-char byte strings).
* ``wordpiece``: ``{"pieces": [...], "unk": "[UNK]"}``.
* ``unigram``: ``{"pieces": [[piece, logprob, count], ...]}``.

Driver-side by design: vocabularies are driver-sized (the largest
production tokenizers are ~10^5 entries, a few MB of JSON), and the
loaded artifact feeds encoders that broadcast or plan-literal it anyway.
Files written with a trailing newline and sorted keys so artifacts are
byte-reproducible and diff-friendly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_tokenizer", "load_tokenizer"]

_FORMAT = "nested-pandas-spark-tokenizer"
_FAMILIES = ("bpe", "byte_bpe", "wordpiece", "unigram")


def save_tokenizer(path: str, family: str, artifact, **extra) -> None:
    """Write a tokenizer artifact as JSON.

    ``artifact`` by family:

    * ``bpe`` / ``byte_bpe``: the merges DataFrame from
      ``bpe_train``/``byte_bpe_train`` (or collected rows / (left,
      right) tuples).
    * ``wordpiece``: the piece list from ``wordpiece_pieces`` (or a
      DataFrame with a ``piece`` column); pass ``unk=`` to override the
      default ``[UNK]``.
    * ``unigram``: the vocab DataFrame from ``unigram_train``
      (``piece, logprob, count``).
    """
    if family not in _FAMILIES:
        raise ValueError(f"unknown tokenizer family {family!r}")
    doc: dict = {"format": _FORMAT, "version": 1, "family": family}
    if family in ("bpe", "byte_bpe"):
        from .text import _normalize_merges

        doc["merges"] = [[l, r] for l, r in _normalize_merges(artifact)]
    elif family == "wordpiece":
        if isinstance(artifact, DataFrame):
            artifact = [r["piece"] for r in artifact.select("piece").collect()]
        doc["pieces"] = sorted(set(artifact))
        doc["unk"] = extra.pop("unk", "[UNK]")
    else:  # unigram
        rows = artifact.collect() if hasattr(artifact, "collect") else artifact
        doc["pieces"] = [
            [r["piece"], float(r["logprob"]), int(r["count"])] for r in rows
        ]
    doc.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, sort_keys=True, indent=1)
        f.write("\n")
    os.replace(tmp, path)


def load_tokenizer(path: str, spark: SparkSession | None = None):
    """Load a tokenizer artifact. Returns ``(family, payload)`` where
    payload is directly consumable by the family's encoder:

    * ``bpe`` / ``byte_bpe``: list of (left, right) merge tuples →
      ``bpe_encode`` / ``byte_bpe_encode``.
    * ``wordpiece``: ``{"pieces": [...], "unk": ...}`` →
      ``wordpiece_encode(docs, payload["pieces"], unk=payload["unk"])``.
    * ``unigram``: a ``piece, logprob, count`` DataFrame (needs
      ``spark``) → ``unigram_encode``.
    """
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("format") != _FORMAT:
        raise ValueError(f"{path}: not a {_FORMAT} artifact")
    if doc.get("version") != 1:
        raise ValueError(f"{path}: unsupported version {doc.get('version')}")
    family = doc.get("family")
    if family not in _FAMILIES:
        raise ValueError(f"{path}: unknown family {family!r}")
    if family in ("bpe", "byte_bpe"):
        return family, [(l, r) for l, r in doc["merges"]]
    if family == "wordpiece":
        return family, {"pieces": list(doc["pieces"]),
                        "unk": doc.get("unk", "[UNK]")}
    if spark is None:
        raise ValueError("loading a unigram artifact needs spark=")
    df = spark.createDataFrame(
        [(p, float(lp), int(n)) for p, lp, n in doc["pieces"]],
        "piece string, logprob double, count long",
    )
    return family, df
