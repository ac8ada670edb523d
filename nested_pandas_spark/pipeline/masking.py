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

Scale: ZERO exchanges. The whole computation is per-document, so it runs
as array higher-order functions over each document's own token list — no
explode, no window, no re-group, nothing shuffles (round 10 rewrote the
original explode + window + collect_list plan, which pushed the corpus's
full token volume through one Exchange). Per-document cost is O(tokens):
masked runs are enumerated once (``__starts``) and each inter-start
segment is sliced exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    Zero-shuffle: every value depends only on the document's own token
    list, so the masked flags, span starts and both output strings are
    array-HOF projections — no explode, no window, no Exchange. A run of
    masked tokens can only start at position 0 or right after an unmasked
    token, and every token before the first start is unmasked, so the
    document splits into disjoint inter-start segments each sliced once:
    O(tokens) per document.
    """
    thr = _hex_threshold(noise_density)
    ws = words(F.col(text_col))
    base = docs.where(F.size(ws) > 0).select(F.col(id_col), ws.alias("__ws"))
    # masked flag per 0-based position — the same md5(seed:id:pos) rule the
    # exploded plan used, evaluated in place via transform's index lambda
    m = base.select(
        id_col,
        "__ws",
        F.transform(
            "__ws",
            lambda _, i: F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(int(seed))),
                        F.col(id_col).cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            )
            < F.lit(thr),
        ).alias("__m"),
    )
    # 0-based positions where a masked run starts (masked, and not
    # preceded by a masked token); __seq = [0 .. n-1] reused for slicing
    s = m.select(
        id_col,
        "__ws",
        "__m",
        F.expr("sequence(0, size(__ws) - 1)").alias("__seq"),
    ).select(
        id_col,
        "__ws",
        "__m",
        "__seq",
        F.expr(
            "filter(__seq, i -> __m[i] and if(i = 0, true, not __m[i - 1]))"
        ).alias("__starts"),
    )
    # Per start j (0-based sentinel number): the segment runs from the
    # start to the next start (or end of document). Input keeps one
    # sentinel plus the segment's unmasked tail; target keeps the
    # sentinel + first hidden token plus the rest of the masked run.
    seg_end = "if(j + 1 < size(__starts), __starts[j + 1], size(__ws))"
    in_arr = (
        "concat("
        "  if(size(__starts) = 0, __ws, slice(__ws, 1, __starts[0])),"
        "  flatten(transform(__starts, (s, j) -> concat("
        "    array(concat('<extra_id_', cast(j as string), '>')),"
        f"   transform(filter(slice(__seq, s + 2, {seg_end} - s - 1),"
        "                     i -> not __m[i]),"
        "              i -> __ws[i])))))"
    )
    tgt_arr = (
        "flatten(transform(__starts, (s, j) -> concat("
        "  array(concat('<extra_id_', cast(j as string), '> ', __ws[s])),"
        f" transform(filter(slice(__seq, s + 2, {seg_end} - s - 1),"
        "                   i -> __m[i]),"
        "            i -> __ws[i]))))"
    )
    agg = s.select(
        id_col,
        F.expr(f"array_join({in_arr}, ' ')").alias("input_text"),
        F.expr(f"array_join({tgt_arr}, ' ')").alias("__tgt_body"),
        F.size("__starts").alias("n_spans"),
    )
    closing = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    target = F.when(
        F.col("n_spans") > 0, F.concat(F.col("__tgt_body"), F.lit(" "), closing)
    ).otherwise(closing)
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
