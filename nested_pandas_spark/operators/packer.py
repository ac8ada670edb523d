"""Pack / unpack operators: flat child table <-> nested column.

The reference's central operator is ``join_nested`` (pack a flat child table
into one ``array<struct>`` cell per base row, then join;
``src/nested_pandas/nestedframe/core.py:469-557``, ``series/packer.py:26-117``).

Spark-first design:

* pack       = ``child.groupBy(keys).agg(collect_list(struct(payload)))``
               -- ONE shuffle on the join key; partial aggregation
               (ObjectHashAggregate) combines map-side.
* join       = plain equi-join; Catalyst chooses broadcast vs sort-merge.
               When the packed child and the base share the grouping key the
               shuffle from the aggregation is REUSED for the join (same
               hash partitioning), so pack+join costs a single shuffle of the
               child table -- the minimum possible at any scale.
* from_lists = ``arrays_zip`` (zero shuffle: struct-of-arrays ->
               array-of-structs per row, the transposition the reference does
               with offset surgery in ``series/utils.py:236-301``).

Determinism: ``collect_list`` order after a shuffle is not deterministic.
The reference stable-sorts children by key, preserving input order within a
group (``packer.py:99``). For reproducible results pass ``sort_within=[cols]``
and we sort each cell's elements with an ``array_sort`` comparator after
collection (per-row, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.nested import quote

__all__ = ["pack", "join_nested", "from_flat", "from_lists", "nest_lists", "sort_comparator_sql"]


def sort_comparator_sql(
    sort_keys: list[str | tuple[str, bool]], left: str = "__l", right: str = "__r"
) -> str:
    """Build an ``array_sort`` comparator lambda body for multi-key struct sort.

    ``sort_keys``: field names, or ``(field, ascending)`` tuples. NULLs sort
    first on ascending keys (matching pandas ``na_position`` default is
    'last'; we use nulls-last to match pandas sort_values default).
    """
    terms: list[str] = []
    for key in sort_keys:
        fld, asc = (key, True) if isinstance(key, str) else key
        lf, rf = f"{left}.{quote(fld)}", f"{right}.{quote(fld)}"
        lt, gt = ("-1", "1") if asc else ("1", "-1")
        terms.append(
            f"WHEN {lf} IS NULL AND {rf} IS NULL THEN 0 "
            f"WHEN {lf} IS NULL THEN 1 "
            f"WHEN {rf} IS NULL THEN -1 "
            f"WHEN {lf} < {rf} THEN {lt} WHEN {lf} > {rf} THEN {gt}"
        )
    chain = " ".join(terms)
    return f"CASE {chain} ELSE 0 END"


def _normalize_keys(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def null_key_guard(df: DataFrame, keys: list[str], drop_null_keys: bool) -> DataFrame:
    """Apply the NULL-key contract to a child table about to be packed.

    The reference raises on NULL pack keys (``series/packer.py:104-116``:
    "NaN values ... cannot be used for grouping rows"). A driver-side check
    would cost an extra scan, so the raise lives in a filter predicate —
    evaluated per packed row, surfacing (lazily, at action time like all
    Spark errors) as USER_RAISED_EXCEPTION. A filter, not a rewritten group
    key: grouping must stay on the raw columns so bucketed tables keep their
    shuffle-free pack, and filters already sitting below (pushed-down query
    predicates) still evaluate first, so rows the user filtered away never
    raise. Pass ``drop_null_keys=True`` to silently exclude NULL keys
    instead (SQL equi-join semantics).
    """
    if drop_null_keys:
        pred = " AND ".join(f"{quote(k)} IS NOT NULL" for k in keys)
        return df.where(pred)
    for k in keys:
        msg = (
            f"Pack key '{k}' contains NULL values, which cannot be used for "
            "grouping rows. Drop or fill them, or pass drop_null_keys=True."
        ).replace("'", "\\'")
        df = df.where(
            F.expr(
                f"CASE WHEN {quote(k)} IS NOT NULL THEN TRUE "
                f"ELSE CAST(raise_error('{msg}') AS BOOLEAN) END"
            )
        )
    return df


def pack(
    child: DataFrame,
    name: str,
    on: str | list[str],
    columns: list[str] | None = None,
    sort_within: list[str | tuple[str, bool]] | None = None,
    salt: int | None = None,
    extra_aggs: list[tuple[str, str]] | None = None,
    drop_null_keys: bool = False,
) -> DataFrame:
    """Pack a flat child table into one nested cell per key.

    ``extra_aggs``: (alias, aggregate-SQL) pairs computed alongside the
    collect_list in the same groupBy — lets Catalyst prune the collect_list
    when only the aggregates are consumed downstream.

    Returns a DataFrame ``(*keys, name: array<struct<payload>>)``.
    NULL join keys raise at execution, matching the reference
    (``series/packer.py:104-116`` raises on NaN index values); pass
    ``drop_null_keys=True`` to silently exclude them instead.

    ``salt``: two-stage aggregation for skewed keys. Stage 1 groups on
    (key, random salt in [0, salt)) — a hot key's rows spread over ``salt``
    reducers — stage 2 flattens the partial lists per key. Total work is
    the same; the per-task maximum drops by ~``salt``x. Use when one key owns
    a disproportionate share of the child rows (AQE's skew handling does not
    split aggregations, only joins).

    Measured guidance: at 3M rows with a 1M-row hot key on local[32], plain
    pack still wins (1.1s vs 1.4s) — the second shuffle costs more than the
    straggler saves. Salting is a STRAGGLER/MEMORY mitigation for when a
    single key's group approaches executor memory or one task runs minutes;
    leave it off until a stage summary shows that task.

    The salt is a deterministic content hash (``xxhash64(payload) % salt``),
    so retries and re-evaluations are bit-identical. Degenerate corner: a
    hot key whose rows are all byte-identical hashes to one bucket and gets
    no relief — dedupe those rows first (they collapse anyway).

    Examples
    --------
    >>> df = spark.createDataFrame(
    ...     [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, qty double")
    >>> packed = pack(df, "items", on="k", sort_within=["qty"])
    >>> sorted((r["k"], [x["qty"] for x in r["items"]])
    ...        for r in packed.collect())
    [(1, [10.0, 20.0]), (2, [5.0])]
    """
    keys = _normalize_keys(on)
    payload = columns or [c for c in child.columns if c not in keys]
    child = null_key_guard(child, keys, drop_null_keys)
    struct_col = F.struct(*[F.col(quote(c)) for c in payload])
    agg_cols = [F.expr(sql).alias(alias) for alias, sql in (extra_aggs or [])]
    if salt and salt > 1:
        # deterministic salt: hash of the payload, not rand() — rand after a
        # shuffle is indeterminate on task retry (forces full-stage
        # recompute); a content hash spreads a hot key's rows just as well
        # and keeps every retry/re-evaluation bit-identical
        # xxhash64 rejects MapType inputs — serialize those via to_json
        # (deterministic per row value) so any payload shape salts
        dt = {f.name: f.dataType for f in child.schema.fields}

        def _hashable(c: str):
            has_map = "MapType" in repr(dt[c])
            return F.to_json(F.col(quote(c))) if has_map else F.col(quote(c))

        salt_col = F.pmod(F.xxhash64(*[_hashable(c) for c in payload]),
                          F.lit(salt)).cast("int")
        partial = (
            child.withColumn("__salt", salt_col)
            .groupBy(*keys, "__salt")
            .agg(F.collect_list(struct_col).alias("__part"))
        )
        packed = (
            partial.groupBy(*keys)
            .agg(F.flatten(F.collect_list("__part")).alias(name))
        )
        if agg_cols:
            raise ValueError("extra_aggs is not supported with salt")
    else:
        packed = child.groupBy(*keys).agg(
            F.collect_list(struct_col).alias(name), *agg_cols
        )
    if sort_within:
        cmp = sort_comparator_sql(sort_within)
        packed = packed.withColumn(
            name, F.expr(f"array_sort({quote(name)}, (__l, __r) -> {cmp})")
        )
    return packed


def join_nested(
    base: DataFrame,
    child: DataFrame,
    name: str,
    on: str | list[str],
    how: str = "left",
    columns: list[str] | None = None,
    sort_within: list[str | tuple[str, bool]] | None = None,
    broadcast_packed: bool = False,
    drop_null_keys: bool = True,
) -> DataFrame:
    """Pack ``child`` rows sharing a key into a nested column joined to ``base``.

    ``how`` in {left, inner, right, outer} as in the reference
    (``core.py:469-557``). Base rows with no children get a NULL cell on
    left/outer (same as the reference's missing-cell semantics).

    NULL-key child rows follow SQL join semantics by default (silently
    excluded, ``drop_null_keys=True``): for left/inner joins Catalyst infers
    ``isnotnull(key)`` on the child side anyway, so the strict pack raise
    could never fire there and would only cost a per-row branch in the hot
    aggregation stage (~25% on the sf0.1 pack). Pass ``drop_null_keys=False``
    to keep the strict raise — it is only reachable for right/outer joins,
    where unmatched packed rows survive.

    Scale notes: the aggregation and the join hash-partition on the same key,
    so Spark reuses the exchange — one shuffle of the child total. Set
    ``broadcast_packed=True`` when the packed child is small (dimension-sized)
    to skip shuffling the base entirely.
    """
    packed = pack(child, name, on=on, columns=columns, sort_within=sort_within,
                  drop_null_keys=drop_null_keys)
    if broadcast_packed:
        packed = F.broadcast(packed)
    keys = _normalize_keys(on)
    return base.join(packed, on=keys, how=how)


def from_flat(
    df: DataFrame,
    base_columns: list[str],
    on: str | list[str],
    nested_columns: list[str] | None = None,
    name: str = "nested",
    drop_null_keys: bool = False,
) -> DataFrame:
    """Split a single flat table into base columns + a packed nested column.

    Reference: ``NestedFrame.from_flat`` (``core.py:595-658``): base columns
    are deduplicated per key (first value), remaining columns pack under
    ``name``. One shuffle (the groupBy). NULL keys follow the pack contract
    (raise at execution; ``drop_null_keys=True`` to exclude silently).
    """
    keys = _normalize_keys(on)
    nested_cols = nested_columns or [
        c for c in df.columns if c not in set(base_columns) | set(keys)
    ]
    aggs: list[Column] = [F.first(F.col(quote(c)), ignorenulls=False).alias(c) for c in base_columns]
    aggs.append(F.collect_list(F.struct(*[F.col(quote(c)) for c in nested_cols])).alias(name))
    return null_key_guard(df, keys, drop_null_keys).groupBy(*keys).agg(*aggs)


def equal_length_guard(
    df: DataFrame, columns: list[str], context: str,
    extract: "Callable[[str], Column] | None" = None,
) -> DataFrame:
    """Raise at execution when per-row lengths of ``columns`` differ —
    the reference's equal-length contract (``io.py:588-597``) expressed as
    a codegen'd predicate: ``assert_true`` lives inside a ``where`` so
    Catalyst can't prune it away, and the check rides the existing scan
    (no extra pass, no driver-side validation). NULL lists compare as
    length -1: all-NULL rows pass, NULL-vs-list rows raise — exactly the
    reference's ragged-input rejection.
    """
    get = extract or (lambda c: F.col(quote(c)))
    first = columns[0]
    for c in columns[1:]:
        check = F.assert_true(
            F.coalesce(F.size(get(c)), F.lit(-1))
            == F.coalesce(F.size(get(first)), F.lit(-1)),
            F.lit(f"{context}: per-row lengths of '{c}' and '{first}' differ"),
        )
        df = df.where(check.isNull())
    return df


def from_lists(
    df: DataFrame,
    list_columns: list[str] | None = None,
    base_columns: list[str] | None = None,
    name: str = "nested",
    validate: bool = False,
) -> DataFrame:
    """Zip list-valued columns into one nested column.

    Reference: ``NestedFrame.from_lists`` (``core.py:660-743``). Spark's
    ``arrays_zip`` is the exact list-of-structs transposition — per-row, zero
    shuffle. Shorter arrays are padded with NULL structs by arrays_zip; the
    reference instead raises on mismatched lengths (``io.py:588-597``) —
    opt in with ``validate=True``, which raises at execution via an
    ``assert_true`` predicate riding the same scan (no extra pass).
    """
    from pyspark.sql import types as T

    if list_columns is None:
        list_columns = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.ArrayType)
            and (base_columns is None or f.name not in set(base_columns))
        ]
    if not list_columns:
        raise ValueError("No list columns to pack")
    non_list = [
        c for c in list_columns
        if c in df.columns
        and not isinstance(df.schema[c].dataType, T.ArrayType)
    ]
    if non_list:
        # reference parity: nest_lists/from_lists raise ValueError when a
        # named column is not list-valued (test_nest_lists), rather than
        # surfacing Spark's arrays_zip type-mismatch AnalysisException
        raise ValueError(
            f"Columns {non_list} are not list-valued; nest_lists/from_lists "
            "pack array columns only"
        )
    if validate and len(list_columns) > 1:
        df = equal_length_guard(df, list_columns, "from_lists")
    keep = base_columns if base_columns is not None else [
        c for c in df.columns if c not in set(list_columns)
    ]
    zipped = F.arrays_zip(*[F.col(quote(c)) for c in list_columns]).alias(name)
    return df.select(*[F.col(quote(c)) for c in keep], zipped)


def nest_lists(df: DataFrame, columns: list[str], name: str = "nested",
               validate: bool = False) -> DataFrame:
    """Method-form of :func:`from_lists` (reference ``core.py:559-593``)."""
    return from_lists(df, list_columns=columns, name=name, validate=validate)
