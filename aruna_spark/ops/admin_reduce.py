"""Admin-document path reduction: the causal per-path LWW-with-
conflicts reducer behind group/realm admin documents.

Reference: ``core/src/admin_document_reducer.rs``. Every admin
operation touches one or more string *paths* (``operation_paths``,
rs:1538-1624 — e.g. ``group.display_name``, ``group.roles.<role>``,
``group.roles.<role>.assigned_users.<user>``) and carries a causal
*dot* (origin node, origin sequence) plus the ``observed`` clock of
the origin at emission (``apply_operation``, rs:355-372: origin_seq =
observed[own node] + 1). Per path, ``reduce_value`` (rs:1371-1423)
converges to:

- if one event supersedes all others (every other dot is observed —
  ``event_observes_dot``, rs:1533-1536: the event's clock covers the
  dot, or same origin with a later sequence), its value wins; a None
  value is a tombstone (the path drops from the materialization —
  ``apply_group_field``, rs:1133-1144);
- concurrent events with EQUAL values merge their dots into one
  version (rs:1385-1400, 1421-1422) — no conflict;
- concurrent events with DIFFERING values fail closed: the path is
  removed from the materialized state and every live value is
  recorded under ``conflicts`` (rs:1404-1419, 1504-1519).

That convergent outcome is exactly the *maximal antichain* of the
per-path event set under the observes-dot order, which is how this
module computes it — no sequential replay, no state machine:

1. an event is DOMINATED if any event on the same path observes its
   dot (a self-join on the path key; an event never dominates itself
   because its own observed clock stops at origin_seq - 1);
2. the live (undominated) events group per path: one distinct value →
   winner (possibly a tombstone), several → conflict.

Spark design (100 TB): both the domination semi-join and the final
groupBy shuffle on the (target, path) key — maximal cardinality,
corpus-linear, no window. Events per path are bounded by the write
fan-in of one admin field (single digits in practice), so the
self-join is a within-group cross of tiny groups, never all-pairs
across the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sentinel for tombstone values when counting distinct live values —
#: NULL never equals NULL, so conflicts between a remove and a set must
#: compare through a non-null marker.
_TOMBSTONE = "\x00tombstone"


def _domination_join(
    events: DataFrame, key_cols: list[str], how: str
) -> DataFrame:
    """Join each event against same-path dominators (events whose
    clock observes its dot). ``left_anti`` keeps the live frontier
    (the maximal antichain); ``left_semi`` keeps the dominated
    complement — the versions every replica has already superseded."""
    key = list(key_cols)
    a = events.alias("a")
    b = events.select(
        *key, "path", "origin_node", "origin_seq", "observed"
    ).alias("b")
    same_path = [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in key
    ] + [F.col("a.path") == F.col("b.path")]
    observes = (
        F.coalesce(
            F.element_at(F.col("b.observed"), F.col("a.origin_node")),
            F.lit(0),
        )
        >= F.col("a.origin_seq")
    ) | (
        (F.col("b.origin_node") == F.col("a.origin_node"))
        & (F.col("b.origin_seq") > F.col("a.origin_seq"))
    )
    return a.join(b, on=[*same_path, observes], how=how)


def dominated_admin_events(
    events: DataFrame, key_cols: list[str]
) -> DataFrame:
    """The events the live frontier superseded. Reducing THIS subset
    again yields the last value every replica agreed on before a
    conflicted frontier — the quota the stored document keeps when
    ``apply_reducer_quota`` (operations/src/set_realm_quota.rs:365-377)
    sees a conflict on the ``realm_config.quota`` path."""
    return _domination_join(events, key_cols, "left_semi")


def reduce_admin_paths(
    events: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Reduce an admin-document event feed to per-path outcomes.

    ``events`` schema: ``key_cols`` (the document target) + ``path`` +
    ``value`` (string, NULL = tombstone) + ``origin_node`` +
    ``origin_seq`` (long) + ``observed`` (map<string,long> — the
    origin's clock BEFORE the event, so observed[origin_node] ==
    origin_seq - 1, matching apply_operation rs:360-366).

    Returns one row per (key, path) that saw at least one live event:
    ``value`` (NULL when conflicted or tombstoned), ``is_conflict``,
    ``is_live`` (a usable materialized value exists), ``n_dots`` (live
    dots merged into the winning version — >1 when concurrent equal
    values merged, rs:1421-1422).
    """
    key = list(key_cols)
    live = _domination_join(events, key, "left_anti")
    per_path = live.groupBy(*key, "path").agg(
        F.count(F.lit(1)).alias("n_dots"),
        F.countDistinct(
            F.coalesce(F.col("value"), F.lit(_TOMBSTONE))
        ).alias("__n_vals"),
        F.max("value").alias("__val"),
    )
    conflict = F.col("__n_vals") > 1
    value = F.when(~conflict, F.col("__val"))
    return per_path.select(
        *key,
        "path",
        value.alias("value"),
        conflict.alias("is_conflict"),
        (~conflict & value.isNotNull()).alias("is_live"),
        "n_dots",
    )


def reduce_admin_paths_py(events: list[dict]) -> dict[tuple, dict]:
    """Pure-Python reference model for property tests: same antichain
    reduction, keyed by (key tuple..., path)."""
    def observes(b: dict, a: dict) -> bool:
        return (b.get("observed") or {}).get(
            a["origin_node"], 0
        ) >= a["origin_seq"] or (
            b["origin_node"] == a["origin_node"]
            and b["origin_seq"] > a["origin_seq"]
        )

    by_path: dict[tuple, list[dict]] = {}
    for e in events:
        by_path.setdefault(tuple(e["key"]) + (e["path"],), []).append(e)
    out: dict[tuple, dict] = {}
    for path_key, evs in by_path.items():
        live = [
            a
            for a in evs
            if not any(b is not a and observes(b, a) for b in evs)
        ]
        if not live:
            continue
        vals = {e.get("value") for e in live}
        conflict = len(vals) > 1
        value = None if conflict else next(iter(vals))
        out[path_key] = {
            "value": value,
            "is_conflict": conflict,
            "is_live": not conflict and value is not None,
            "n_dots": len(live),
        }
    return out
