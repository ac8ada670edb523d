"""Deterministic denoising-objective data prep (T5 span corruption).

``span_corrupt`` turns a clean corpus into (inputs, targets) pairs for a
T5-style denoising objective (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §3.1.4): randomly chosen token spans are replaced in
the input by ``<extra_id_k>`` sentinels; the target lists each sentinel
followed by the tokens it hid, closed by one final sentinel.

Randomness is the repo's engine-portable md5-threshold idiom (see
``corpus.hash_sample``): token ``i`` of document ``d`` is masked iff
``md5(seed:d:i)``'s first 8 hex chars sort below ``hex(floor(p * 16^8))``.
Adjacent masked tokens merge into one span (the run-collapse that makes
this *span* corruption rather than i.i.d. token masking). Everything is
replayable bit-for-bit in DuckDB, so the operator is oracle-gated.

Scale: one exchange. Tokens are windowed and re-grouped on the SAME key
(``id_col``), so Catalyst reuses the window's hash partitioning for the
final ``groupBy`` — the plan has a single Exchange regardless of corpus
size, and state per document is its own token list only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words

__all__ = ["span_corrupt"]


def _hex_threshold(p: float) -> str:
    if not 0.0 < p < 1.0:
        raise ValueError(f"noise_density must be in (0, 1), got {p}")
    return format(int(p * 16**8), "08x")


def span_corrupt(
    docs: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    noise_density: float = 0.15,
    seed: int = 42,
) -> DataFrame:
    """(id, input_text, target_text, n_spans) per non-empty document.

    ``input_text``: original tokens with each masked run replaced by one
    ``<extra_id_k>`` (k in document order, 0-based).
    ``target_text``: ``<extra_id_0> hid tokens <extra_id_1> ... <extra_id_n>``
    — the final sentinel closes the target, per the T5 convention.
    """
    thr = _hex_threshold(noise_density)
    tk = docs.select(
        F.col(id_col),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"),
    ).withColumn(
        "masked",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(int(seed))),
                    F.col(id_col).cast("string"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            8,
        )
        < F.lit(thr),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tk = tk.withColumn(
        "is_start",
        F.col("masked") & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
    ).withColumn(
        "span_id", F.sum(F.col("is_start").cast("int")).over(run) - F.lit(1)
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("span_id").cast("string"), F.lit(">")
    )
    in_piece = (
        F.when(~F.col("masked"), F.col("w"))
        .when(F.col("is_start"), sentinel)
        .otherwise(F.lit(None))
    )
    tgt_piece = F.when(
        F.col("masked") & F.col("is_start"), F.concat(sentinel, F.lit(" "), F.col("w"))
    ).when(F.col("masked"), F.col("w"))
    pieces = tk.select(
        id_col,
        "pos",
        in_piece.alias("in_piece"),
        tgt_piece.alias("tgt_piece"),
        F.col("masked").cast("int").alias("m"),
        F.col("is_start").cast("int").alias("s"),
    )

    def _joined(col: str):
        # order by pos, drop the unmasked/skipped NULL slots, then join
        return F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col(col).alias("p")))
                    ),
                    lambda x: x["p"],
                ),
                lambda p: p.isNotNull(),
            ),
            " ",
        )

    agg = pieces.groupBy(id_col).agg(
        _joined("in_piece").alias("input_text"),
        _joined("tgt_piece").alias("__tgt_body"),
        F.sum("s").alias("n_spans"),
    )
    closing = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    target = F.when(F.col("n_spans") > 0, F.concat(F.col("__tgt_body"), F.lit(" "), closing)).otherwise(
        closing
    )
    return agg.select(
        id_col,
        "input_text",
        target.alias("target_text"),
        F.col("n_spans").cast("int").alias("n_spans"),
    )
