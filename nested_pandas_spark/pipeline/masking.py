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

__all__ = ["span_corrupt", "prefix_lm_split", "ul2_mix"]


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


def prefix_lm_split(
    docs: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    min_frac: float = 0.25,
    max_frac: float = 0.75,
) -> DataFrame:
    """Prefix-LM pairs (UL2's S-denoiser, Tay et al. 2022): each
    document's tokens split at a deterministic pivot — the input is the
    prefix (the bidirectionally-visible context), the target is the
    suffix to generate. The pivot fraction is uniform in
    ``[min_frac, max_frac)`` derived from ``md5(seed:id)`` (the repo's
    engine-portable randomness idiom), clamped so BOTH sides are
    non-empty whenever the document has >= 2 tokens (a single-token
    document goes entirely to the target: pivot 0).

    Returns ``(id, input_text, target_text, n_tokens, pivot)``.
    Zero-window plan: one projection computes the split per row from
    the token array — no explode, no shuffle at all."""
    if not 0.0 <= min_frac < max_frac <= 1.0:
        raise ValueError("need 0 <= min_frac < max_frac <= 1")
    ws = words(F.col(text_col))
    n = F.size(ws)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(int(seed))),
                                  F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    frac = F.lit(min_frac) + u * F.lit(max_frac - min_frac)
    pivot = F.when(n <= 1, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.least(n - 1, F.floor(frac * n.cast("double")).cast("int")),
        )
    )
    out = docs.where(F.size(ws) > 0).select(
        F.col(id_col),
        ws.alias("__ws"),
        n.alias("n_tokens"),
        pivot.alias("pivot"),
    )
    return out.select(
        id_col,
        F.array_join(F.slice(F.col("__ws"), 1, F.col("pivot")), " ")
        .alias("input_text"),
        F.array_join(
            F.expr("slice(__ws, pivot + 1, n_tokens - pivot)"), " "
        ).alias("target_text"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("pivot").cast("int").alias("pivot"),
    )


# (mode_token, objective, noise_density) triples; objective is "span"
# (R/X denoisers — span corruption at the given density) or "prefix"
# (S denoiser — prefix LM, density ignored). The UL2 defaults: regular
# R at 0.15, extreme X at 0.5, sequential S.
UL2_DEFAULT_MIX = (
    ("[R]", "span", 0.15),
    ("[S]", "prefix", None),
    ("[X]", "span", 0.5),
)


def ul2_mix(
    docs: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    mix: tuple = UL2_DEFAULT_MIX,
) -> DataFrame:
    """Mixture-of-denoisers data prep (UL2, Tay et al. 2022): every
    document is deterministically assigned ONE denoiser —
    ``md5(seed:mix:id) mod len(mix)`` — and transformed by it; the
    mode token (``[R]``/``[S]``/``[X]``) is prepended to the input so
    the model conditions on the objective, per the paper.

    Returns ``(id, denoiser, input_text, target_text, n_spans)`` —
    ``n_spans`` is NULL for prefix-LM rows. Each branch runs only on
    its assigned subset and the branches union: the corpus is read
    once per branch with the assignment filter pushed to the scan
    (len(mix) scans, each over ~1/len(mix) of the rows after the
    filter; an alternative single-scan CASE plan would forfeit
    span_corrupt's reusable-exchange shape)."""
    if not mix:
        raise ValueError("mix must be non-empty")
    assign = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(int(seed))), F.lit("mix"),
                                  F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(len(mix)),
    )
    parts = []
    for i, (token, objective, density) in enumerate(mix):
        sub = docs.where(assign == i)
        if objective == "span":
            part = span_corrupt(
                sub, text_col, id_col=id_col,
                noise_density=float(density), seed=seed,
            ).select(
                id_col,
                F.lit(token).alias("denoiser"),
                F.concat(F.lit(token + " "), F.col("input_text"))
                .alias("input_text"),
                "target_text",
                F.col("n_spans"),
            )
        elif objective == "prefix":
            part = prefix_lm_split(
                sub, text_col, id_col=id_col, seed=seed
            ).select(
                id_col,
                F.lit(token).alias("denoiser"),
                F.concat(F.lit(token + " "), F.col("input_text"))
                .alias("input_text"),
                "target_text",
                F.lit(None).cast("int").alias("n_spans"),
            )
        else:
            raise ValueError(f"unknown objective {objective!r}")
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
