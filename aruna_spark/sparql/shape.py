"""Static union-safety analysis for distributed (fan-out) queries.

The reference fans realm-wide queries out to every node and merges rows
by exact-row dedup union; that merge is only correct for queries whose
result is a *set union* of per-node results. The accepted shape
(``operations/src/metadata/api.rs:2092-2140``): ``SELECT DISTINCT`` over
a single triple pattern, or UNIONs of single triple patterns, each leaf
optionally under ``GRAPH``, optionally under a zero-offset slice.
Document-/graph-scoped queries are exempt (they run on one node).

In the Spark engine a realm-wide query runs as ONE distributed job, so
the check is not needed for correctness — but the predicate itself is
part of the reference's observable API surface (shape-rejected queries
error), so the sharded-evaluation path (``sparql_distributed_ask``-style
fan-out) applies the same rule.
"""

from __future__ import annotations

from aruna_spark.sparql import algebra as A


def _is_single_pattern_leaf(p) -> bool:
    if isinstance(p, A.GraphPattern):
        return _is_single_pattern_leaf(p.pattern)
    return (
        isinstance(p, A.Bgp)
        and len(p.patterns) == 1
        and isinstance(p.patterns[0].p, (A.Var, A.Iri))
    )


def _is_union_of_leaves(p) -> bool:
    if isinstance(p, A.Union):
        return _is_union_of_leaves(p.left) and _is_union_of_leaves(p.right)
    return _is_single_pattern_leaf(p)


def is_union_safe(q: "A.SelectQuery") -> bool:
    """True iff ``q`` may be fanned out and dedup-union merged
    (api.rs:2092-2140): SELECT DISTINCT, zero offset, no grouping/
    aggregation/ordering-dependent semantics beyond the slice, and a
    pattern that is a single triple pattern or a UNION tree of them
    (each optionally GRAPH-wrapped)."""
    if not isinstance(q, A.SelectQuery):
        return False
    if not q.distinct:
        return False
    if q.offset:
        return False  # zero-offset slice only (LIMIT alone is fine)
    if q.group_by or q.having:
        return False
    if q.projection is not None and any(
        expr is not None for _v, expr in q.projection
    ):
        return False  # computed projections change per-node rows
    return _is_union_of_leaves(q.pattern)
