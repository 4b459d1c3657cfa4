"""Notification inbox placement: per-user holder resolution.

Reference: ``operations/src/notifications/placement.rs`` — each
user's inbox lands on the SINGLE top-ranked eligible holder of their
domain-tagged inbox topic (``inbox_topic_id``, rs:13-18) under the
realm's weighted placement view, with a fixed replica-1 /
non-distinct-locations / no-affinity strategy (rs:22-31). Holder is
never stored: every dispatch re-resolves so deliveries re-rank when
the eligible set changes (core notification.rs:207-208). A node also
filters replicated watch subscriptions down to the ones whose
owner's inbox it currently holds, flagging the stale rest for
re-publication (``filter_locally_held_watch_subscriptions``,
rs:44-59).

At replica 1 the distinct-locations switch is inert, so this reuses
the exact two-level rendezvous plan of ``placement_resolve_holders``
(the walk claims the first location's best eligible member and
stops). Same cluster fixture; subjects are the domain-tagged
``inbox:<user_id>`` topics of customers ``c_custkey % 37 == 5``;
the local-held filter runs for ``node-05``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.placement import (
    ROLE_LOCATION,
    ROLE_NODE,
    duck_neg_log2_cte,
    duck_precedes_sql,
    duck_selector_hash,
)
from aruna_spark.queries import register
from aruna_spark.queries.placement import _NODES_SQL, load_nodes, resolve_holders
from aruna_spark.queries.shard_verify import _PRECEDES_LOC, _PRECEDES_NODE

LOCAL_NODE = "node-05"
INBOX_DOMAIN = "inbox"  # NOTIFICATION_INBOX_TOPIC_DOMAIN, rs:11


def _inbox_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .filter(c % 37 == 5)
        .select(
            F.concat(F.lit("user-"), c.cast("string")).alias("user_id"),
            F.concat(
                F.lit(f"{INBOX_DOMAIN}:user-"), c.cast("string")
            ).alias("subject"),
        )
    )


_SUBJECTS_SQL = f"""
    SELECT 'user-' || c_custkey AS user_id,
           '{INBOX_DOMAIN}:user-' || c_custkey AS subject
    FROM customer WHERE c_custkey % 37 = 5
"""


@register(
    "notify_inbox_holders",
    oracle=f"""
    WITH RECURSIVE nodes AS ({_NODES_SQL}),
    locs AS (
      SELECT location,
             CAST(SUM(CASE WHEN passes_filters THEN eff_weight
                      ELSE 0 END) AS BIGINT) AS w_loc
      FROM nodes GROUP BY location
    ),
    subjects AS ({_SUBJECTS_SQL}),
    pairs_n AS (
      SELECT s.subject, n.node_id FROM subjects s CROSS JOIN nodes n
    ),
    {duck_neg_log2_cte(
        "pairs_n",
        duck_selector_hash(ROLE_NODE, "subject", "node_id"),
        "subject, node_id",
        "nn",
    )},
    pairs_l AS (
      SELECT s.subject, l.location FROM subjects s CROSS JOIN locs l
    ),
    {duck_neg_log2_cte(
        "pairs_l",
        duck_selector_hash(ROLE_LOCATION, "subject", "location"),
        "subject, location",
        "ll",
    )},
    members AS (
      SELECT sc.subject, n.location, n.node_id, n.eff_weight, n.eligible,
             sc.l_score
      FROM nn_scored sc JOIN nodes n USING (node_id)
    ),
    best AS (
      SELECT m.subject, m.location, m.node_id
      FROM members m
      WHERE m.eligible AND NOT EXISTS (
        SELECT 1 FROM members o
        WHERE o.subject = m.subject AND o.location = m.location
          AND o.eligible AND o.node_id <> m.node_id
          AND {_PRECEDES_NODE}
      )
    ),
    qual AS (
      SELECT sc.subject, sc.location, l.w_loc, sc.l_score, b.node_id
      FROM ll_scored sc
      JOIN locs l USING (location)
      JOIN best b ON b.subject = sc.subject AND b.location = sc.location
      WHERE l.w_loc > 0
    ),
    top1 AS (
      SELECT q.subject, q.node_id, q.location
      FROM qual q
      WHERE NOT EXISTS (
        SELECT 1 FROM qual o
        WHERE o.subject = q.subject AND o.location <> q.location
          AND {_PRECEDES_LOC}
      )
    )
    SELECT s.user_id, t.node_id AS holder, t.location,
           t.node_id = '{LOCAL_NODE}' AS held_locally
    FROM subjects s JOIN top1 t USING (subject)
    """,
)
def notify_inbox_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's inbox holder under the realm view (replica 1,
    re-resolved per dispatch), with the node-05 locally-held flag the
    subscription filter uses. The oracle re-ranks through pairwise
    precedence counting — an independent mechanism."""
    # NOTE (r15): a localCheckpoint of the subject lane (it feeds the
    # rendezvous walk AND the final user join) was tried and REVERTED:
    # checkpointed relations lose their size estimates, so the
    # un-hinted joins downstream stopped broadcasting the tiny lane
    # and the query regressed 3.1 -> 5.8 s at sf1. The duplicate
    # customer scan is the cheaper evil.
    subjects = _inbox_subjects(spark, sf_dir)
    holders = resolve_holders(
        load_nodes(spark, sf_dir), subjects.select("subject"), 1
    )
    return (
        holders.join(subjects, "subject")
        .select(
            "user_id",
            F.col("node_id").alias("holder"),
            "location",
            (F.col("node_id") == LOCAL_NODE).alias("held_locally"),
        )
    )
