"""Logical-plan layer: deferred (lazy) pack specifications.

``join_nested`` does not build the collect_list aggregation immediately; it
records a :class:`PendingPack`. Subsequent operators rewrite the spec instead
of the physical plan:

* ``query``      -> element predicate pushed onto the flat child (reaches the
                    parquet scan, shrinks the pack shuffle)
* ``select_nested_fields`` -> narrows the packed payload (column pruning)
* ``to_flat`` / ``explode`` -> pack+flatten collapses to a plain join
* ``count_nested`` / ``nest_agg`` -> aggregates computed in the pack's own
                    groupBy; Catalyst prunes the collect_list when the array
                    itself is never consumed

This is the engine's optimizer surface: a handful of rewrite rules over one
logical node, everything else delegated to Catalyst.
"""

from __future__ import annotations

__all__ = ["PendingPack"]


class PendingPack:
    """A not-yet-materialized ``join_nested``: child table + keys + any
    element predicates accumulated from subsequent ``query()`` calls.

    Deferring the pack until the plan is actually needed lets an element
    filter that immediately follows packing be applied to the FLAT child
    *before* the ``collect_list`` shuffle — the predicate then pushes down
    to the parquet scan and the shuffle moves only surviving rows. The two
    orders are semantically identical for left joins: an order whose
    elements all fail yields an empty group -> NULL cell either way.
    """

    __slots__ = ("child", "keys", "columns", "sort_within", "broadcast_packed",
                 "preds", "aggs", "drop_null_keys")

    def __init__(self, child, keys, columns, sort_within, broadcast_packed,
                 preds=(), aggs=(), drop_null_keys=False):
        self.child = child
        self.keys = keys
        self.columns = columns
        self.sort_within = sort_within
        self.broadcast_packed = broadcast_packed
        self.preds = tuple(preds)
        # (alias, aggregate-SQL over child cols, zero_fill) — computed in the
        # SAME groupBy as the collect_list, so if downstream never touches the
        # packed array Catalyst prunes the collect_list from the aggregate,
        # and a count/sum query never materializes a single array.
        self.aggs = tuple(aggs)
        self.drop_null_keys = drop_null_keys

    def replace(self, **kw) -> "PendingPack":
        """Copy with the given fields replaced."""
        vals = {s: getattr(self, s) for s in self.__slots__}
        vals.update(kw)
        return PendingPack(
            vals["child"], vals["keys"], vals["columns"], vals["sort_within"],
            vals["broadcast_packed"], vals["preds"], vals["aggs"],
            vals["drop_null_keys"],
        )

    def with_pred(self, pred_sql: str) -> "PendingPack":
        return self.replace(preds=self.preds + (pred_sql,))

    def with_agg(self, alias: str, agg_sql: str, zero_fill: bool) -> "PendingPack":
        return self.replace(aggs=self.aggs + ((alias, agg_sql, zero_fill),))

    def fields(self) -> list[str]:
        if self.columns is not None:
            return list(self.columns)
        return [c for c in self.child.columns if c not in set(self.keys)]
