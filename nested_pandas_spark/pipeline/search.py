"""Keyword search: inverted index + BM25 ranking over a document corpus.

The reference library has no text-search surface (it is a pandas
extension); a training-data engine needs one — "find the documents about
X" is the first ad-hoc query every corpus owner runs.

Scale shape: text tokenizes map-side and NEVER shuffles — the only wide
exchange is of (term, doc_id) pairs when postings aggregate. The query
side is tiny by construction and broadcasts, so scoring touches only the
postings of the query's terms (classic inverted-index pruning), and the
per-query top-k is the same two-stage tournament the ANN operators use
(:func:`..similarity._per_query_topk` — no single-task window). Corpus
statistics (N, avgdl) stay in the plan as a broadcast 1-row aggregate
instead of a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _per_query_topk
from .text import words

__all__ = ["build_postings", "bm25_topk"]


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: one row per (term, doc) with the term
    frequency and the document's token length.

    Materialize this once (e.g. ``to_parquet`` partitioned/bucketed by
    term) and every subsequent search skips the tokenize+explode scan.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("__w")
    ).withColumn("dl", F.size("__w").cast("long"))
    return (
        d.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    partial_buckets: int | None = None,
) -> DataFrame:
    """BM25 top-k: for each query string, the ``k`` best-matching documents.

    Output: ``(query_id, doc_id, score, rank)``, ties broken by doc id.
    ``postings``: pass a precomputed :func:`build_postings` frame to skip
    re-tokenizing the corpus (the ingest-time materialization path).

    Scoring is Robertson/Sparck-Jones BM25::

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Document frequencies are computed AFTER pruning postings to the
    query's terms, so the df aggregation and everything downstream is
    proportional to the matched postings, not the corpus.
    """
    if postings is None:
        postings = build_postings(docs, id_col, text_col)

    # corpus stats as a broadcast 1-row aggregate — no driver collect
    stats = docs.select(
        F.count("*").alias("__N"),
        F.avg(F.size(words(F.col(text_col)))).alias("__avgdl"),
    )

    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(words(F.col(query_col)))).alias("term"),
    )

    matched = postings.join(F.broadcast(qt), "term")
    # df per term over matched postings only; one (term, doc) row each, so
    # count(*) after dropping the query fan-out IS the document frequency
    df_t = (
        matched.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("__df"))
    )
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__s").alias("score"))
    )
    out = _per_query_topk(
        scored, k, partial_buckets, score_col="score", id_col="doc_id"
    )
    return out.select("query_id", "doc_id", "score", "rank")
