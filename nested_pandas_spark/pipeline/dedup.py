"""Deduplication operators for training-data pipelines.

* exact            — hash-groupBy on a normalized fingerprint (one shuffle)
* minhash + LSH    — shingle -> k minhashes -> b bands -> bucket self-join;
                     only documents sharing a band bucket are compared, so the
                     candidate join is linear-ish in data size instead of the
                     quadratic all-pairs — the standard web-scale recipe.
* simhash          — 32-bit sign-aggregated token hashes; near-dups are pairs
                     within a small Hamming radius (bit_count(xor)).
* n-gram Jaccard   — exact Jaccard on shingle sets for candidate verification.
* embedding cosine — see pipeline.similarity (near-dup = cosine above a
                     threshold).

Hashing is md5-derived everywhere: bit-identical in Spark and DuckDB, so every
operator here is oracle-checkable. At 100 TB you'd swap md5 for xxhash64 (also
builtin, ~5x faster) — the structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, word_ngrams, words

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
]


def _h32(c: Column) -> Column:
    """Deterministic 32-bit-ish hash from md5 (engine-portable: DuckDB
    computes the identical value with ('0x'||substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", keep: str = "min"
) -> DataFrame:
    """Keep one representative row id per exact (normalized) duplicate group.

    Single hash-shuffle on the 32-hex-char fingerprint; with AQE the skewed
    'empty doc' bucket splits automatically.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(agg.alias(id_col), F.count("*").alias("n_dups"))
    )


def minhash_signature(
    text: Column | str, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """k-minhash signature over word-shingles as ``array<bigint>`` (length k).

    hash_i(s) = h32(i || ':' || s); signature[i] = min over shingles.
    Documents with fewer than ``shingle_n`` words get NULL (can't shingle).
    Pure HOF expression — per row, no shuffle, no UDF.
    """
    sh = word_ngrams(text, shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: _h32(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )
    return F.when(F.size(sh) > 0, sig)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs (id_a < id_b).

    signature -> ``bands`` bands of ``num_hashes/bands`` rows; band key =
    md5 of the band's slice; equi-self-join on (band_idx, band_key). The
    join is the only shuffle and it's keyed on the bucket, so cost scales
    with bucket sizes, not n^2.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(text_col, num_hashes, shingle_n).alias("__sig"),
    ).where(F.col("__sig").isNotNull())
    banded = sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("band_idx", "band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >= t).

    Without ``candidates`` this is an inverted-index join: explode distinct
    shingles, self-join on the shingle, count shared shingles per pair, then
    |A∩B| / (|A|+|B|-|A∩B|). The shingle join only pairs documents that share
    at least one shingle — still superlinear on common shingles, so at scale
    feed ``candidates`` from :func:`lsh_candidate_pairs` to verify only
    bucketed pairs.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(word_ngrams(text_col, shingle_n)).alias("__sh"),
    ).where(F.size("__sh") > 0)
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    exploded = sh.select("__id", F.explode("__sh").alias("s"))
    shared = (
        exploded.alias("l")
        .join(exploded.alias("r"), on=[F.col("l.s") == F.col("r.s"),
                                       F.col("l.__id") < F.col("r.__id")])
        .groupBy(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .agg(F.count("*").alias("__inter"))
    )
    if candidates is not None:
        shared = shared.join(candidates, on=["id_a", "id_b"], how="left_semi") if set(
            candidates.columns
        ) >= {"id_a", "id_b"} else shared
    out = (
        shared.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"),
                    on="id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"),
              on="id_b")
        .withColumn("jaccard", F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(text: Column | str, bits: int = 32, shingle_n: int = 2) -> Column:
    """SimHash over word-shingles: bit j of the hash is the sign of
    sum(+1/-1 votes of each shingle's hash bit j). Returns BIGINT.

    Expressed as aggregate-over-shingles of a per-bit vote array, then a
    bit-reassembly — all HOFs, engine-portable.
    """
    sh = word_ngrams(text, shingle_n)
    hashes = F.transform(sh, lambda s: _h32(s))
    # votes[j] = sum over shingles of (bit_j ? 1 : -1)
    votes = F.aggregate(
        hashes,
        F.expr(f"array_repeat(0L, {bits})"),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.when(h.bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), j)) != 0, 1)
                .otherwise(-1)
                .cast("long"),
            ),
            lambda a, v: a + v,
        ),
    )
    assembled = F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, j: F.when(v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )
    return F.when(F.size(sh) > 0, assembled)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 32,
    shingle_n: int = 2,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance.

    Blocked join: documents are bucketed by each of the ``bits/block_bits``
    blocks of their simhash (pigeonhole: two hashes within Hamming distance
    d < #blocks must agree on at least one full block), so the join is on
    block equality, never all-pairs.
    """
    n_blocks = bits // block_bits
    if max_hamming >= n_blocks:
        raise ValueError("need max_hamming < number of blocks for pigeonhole blocking")
    sh = df.select(
        F.col(id_col).alias("__id"), simhash(text_col, bits, shingle_n).alias("__sh")
    ).where(F.col("__sh").isNotNull())
    mask = (1 << block_bits) - 1
    blocked = sh.select(
        "__id",
        "__sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda b: F.call_function("shiftright", F.col("__sh"), b * block_bits).bitwiseAND(F.lit(mask)),
            )
        ).alias("blk_idx", "blk_key"),
    )
    pairs = (
        blocked.alias("l")
        .join(
            blocked.alias("r"),
            on=[
                F.col("l.blk_idx") == F.col("r.blk_idx"),
                F.col("l.blk_key") == F.col("r.blk_key"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.bit_count(F.col("l.__sh").bitwiseXOR(F.col("r.__sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
