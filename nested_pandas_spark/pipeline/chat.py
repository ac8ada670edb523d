"""Conversation assembly for instruction-tuning corpora.

Beyond-reference (the reference, ``/root/reference/src/nested_pandas``,
stops at the nested data model): supervised fine-tuning pipelines turn
event/message logs into rendered training conversations — group
messages by conversation key, order by time, attach roles, render with
a chat template, and trim the oldest turns to fit a context window
(keeping the most recent context, the standard SFT truncation rule).

The nested data model is the natural home for this: a conversation IS
an ``array<struct<role, content>>`` cell. Assembly is ONE shuffle
(groupBy key + ``array_sort(collect_list(...))``); template rendering
and budget truncation are pure HOF expressions over the turns array —
no second shuffle, no UDF, no per-turn explode. At 100 TB the plan is
a single hash aggregation keyed by conversation id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "assemble_conversations",
    "render_template",
    "truncate_to_budget",
]

# ChatML-ish default template pieces.
_TPL_OPEN = "<|{role}|>\n"
_TPL_CLOSE = "<|end|>"


def _turn_tokens(turn: Column) -> Column:
    """Whitespace token count of one turn's content (NULL content = 0)."""
    return F.size(
        F.filter(
            F.split(F.coalesce(turn["content"], F.lit("")), r"\s+"),
            lambda w: w != "",
        )
    )


def assemble_conversations(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    role_col: str,
    content_col: str,
    tiebreak: str | None = None,
    out: str = "turns",
) -> DataFrame:
    """Collect per-key ordered ``array<struct<role, content>>`` turns.

    Ordering is (``ts_col``, ``tiebreak``) via ``array_sort`` over
    structs whose leading fields are the sort key — the sort happens
    inside the aggregation buffer, so the only shuffle is the groupBy.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sort_fields = [F.col(ts_col).alias("__ts")]
    if tiebreak is not None:
        sort_fields.append(F.col(tiebreak).alias("__tb"))
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                *sort_fields,
                F.col(role_col).alias("role"),
                F.col(content_col).alias("content"),
            )
        )
    )
    turns = F.transform(
        packed, lambda t: F.struct(t["role"].alias("role"), t["content"].alias("content"))
    )
    return df.groupBy(*keys).agg(turns.alias(out))


def render_template(
    turns: Column | str,
    open_fmt: str = _TPL_OPEN,
    close: str = _TPL_CLOSE,
    sep: str = "\n",
) -> Column:
    """Render a turns array to one training string.

    Each turn becomes ``open_fmt.format(role=...)`` + content + close;
    turns are joined with ``sep``. Pure ``transform``/``array_join``.
    """
    col = F.col(turns) if isinstance(turns, str) else turns
    pre, _, post = open_fmt.partition("{role}")
    return F.array_join(
        F.transform(
            col,
            lambda t: F.concat(
                F.lit(pre),
                F.coalesce(t["role"], F.lit("")),
                F.lit(post),
                F.coalesce(t["content"], F.lit("")),
                F.lit(close),
            ),
        ),
        sep,
    )


def truncate_to_budget(
    turns: Column | str, budget: int, out_tokens: bool = False
) -> Column | tuple[Column, Column]:
    """Keep the LAST consecutive turns whose total whitespace-token
    count fits ``budget`` (the SFT rule: recent context survives).

    Reverse the array, build the running token sum with an ``aggregate``
    fold (``try_element_at`` keeps the empty-accumulator probe legal
    under ANSI mode), count how many fit, slice, reverse back. All HOF —
    evaluated inside the row, no shuffle.
    """
    col = F.col(turns) if isinstance(turns, str) else turns
    rev = F.reverse(col)
    toks = F.transform(rev, _turn_tokens)
    cums = F.aggregate(
        toks,
        F.array().cast("array<int>"),
        lambda acc, x: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x),
        ),
    )
    n_keep = F.size(F.filter(cums, lambda c: c <= F.lit(budget)))
    kept = F.reverse(F.slice(rev, F.lit(1), n_keep))
    if out_tokens:
        # nullif: index 0 is invalid even for try_element_at
        total = F.coalesce(
            F.try_element_at(cums, F.nullif(n_keep, F.lit(0))), F.lit(0)
        )
        return kept, total
    return kept
