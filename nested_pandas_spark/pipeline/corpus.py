"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs, built from the dedup/text primitives.

    raw documents
      -> text stats (tokens, language, quality, fingerprint)   [one scan]
      -> drop low-quality / wrong-language docs                [no shuffle]
      -> exact dedup on fingerprint                            [1 shuffle]
      -> near-dup candidates (MinHash-LSH)                     [bucket join]
      -> verify candidates (n-gram Jaccard)                    [candidate-only]
      -> cluster verified pairs (connected components)         [id-only shuffles]
      -> keep the smallest id of each duplicate group

Everything stays declarative; at 100 TB each stage is a bounded shuffle of
ids/hashes, never of full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _h32,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    resolve_duplicates,
    staged_shingle_hashes,
)
from .text import add_text_stats, word_ngrams

__all__ = ["clean_corpus", "decontaminate", "stratified_sample"]


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling — corpus rebalancing (e.g. cap the
    over-represented language) without a shuffle: ``sampleBy`` filters rows
    at scan time using only the stratum value and the seed.

    Strata missing from ``fractions`` get ``default_fraction`` (0 drops
    them, 1.0 keeps all). Exact per-stratum counts would need a window —
    at corpus scale Bernoulli fractions are the right tool.
    """
    fr = dict(fractions)
    if default_fraction:
        present = {
            r[0] for r in docs.select(strata_col).distinct().collect()
        }
        for v in present - set(fr):
            fr[v] = default_fraction
    return docs.sampleBy(strata_col, fractions=fr, seed=seed)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram_n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    at least ``min_hits`` distinct word ``ngram_n``-grams with an evaluation
    set — the standard train/test-overlap scrub run before pretraining.

    Returns ``(id_col, n_bench_ngrams, contaminated)`` with one row per
    input document (clean docs get ``n_bench_ngrams = 0``).

    Scale shape: eval benchmarks are small by construction (thousands of
    documents, not billions), so their distinct n-gram hash set broadcasts
    — the corpus side is one scan -> shingle-hash -> explode -> broadcast
    semi-join -> per-doc count (a single shuffle keyed on the doc id).
    Document text itself never shuffles; only (id, 8-byte hash) pairs do,
    and the broadcast join means the 100 TB side is never repartitioned by
    n-gram. N-grams are compared by the same md5-derived 32-bit hash the
    dedup family uses (engine-portable; collisions only ever ADD a flag,
    which is the conservative direction for decontamination).
    """
    bt = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(
                    F.transform(word_ngrams(F.col(bt), ngram_n), _h32)
                )
            ).alias("__g")
        ).distinct()
    )
    doc_grams = staged_shingle_hashes(docs, id_col, text_col, ngram_n)
    hits = (
        doc_grams.select(
            "__id", F.explode(F.array_distinct("__h")).alias("__g")
        )
        .join(F.broadcast(bench_grams), "__g")
        .groupBy("__id")
        .agg(F.count("*").alias("n_bench_ngrams"))
        .withColumnRenamed("__id", id_col)
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bench_ngrams", F.lit(0)).alias("n_bench_ngrams"),
            (F.coalesce("n_bench_ngrams", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.25,
    languages: list[str] | None = None,
    near_dup_threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Return the cleaned corpus (stats columns attached), with exact and
    verified near-duplicates removed (the lowest id of each group survives).
    """
    stats = add_text_stats(docs, text_col)
    kept = stats.where(F.col("quality") >= min_quality)
    if languages:
        kept = kept.where(F.col("lang_pred").isin(languages))

    # exact dedup: keep min id per fingerprint
    survivors = exact_dedup(kept, id_col, text_col).select(
        F.col(id_col).alias("__keep_id")
    )
    kept = kept.join(
        survivors, on=kept[id_col] == survivors["__keep_id"], how="left_semi"
    )

    # near-dup: LSH candidates -> exact Jaccard verify -> connected
    # components -> keep the smallest id per duplicate group. Pairwise
    # "drop id_b" would over-keep under transitivity (pairs (2,3),(1,3)
    # keep both 1 and 2); component-min resolves each group to exactly
    # one representative.
    candidates = lsh_candidate_pairs(
        kept, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n,
    )
    verified = ngram_jaccard_pairs(
        kept, id_col, text_col, shingle_n=shingle_n,
        threshold=near_dup_threshold, candidates=candidates,
    )
    return resolve_duplicates(kept, verified, id_col)
