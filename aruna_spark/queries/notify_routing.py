"""Resource-event notification routing: role fan-out + suppression.

Reference: ``operations/src/notifications/routing.rs``
(``route_resource_event``, rs:37-112):

- ``GroupMemberAdded``: the affected user gets a Direct
  ``AddedToGroup`` UNLESS they acted on themselves (rs:48-58); every
  group admin gets ``GroupMemberAdded`` UNLESS the admin IS the
  affected user or IS the actor (rs:60-76, dedup'd sorted admin roll,
  rs:8-18).
- ``GroupMemberRemoved``: the same two-lane shape with
  ``RemovedFromGroup`` / ``GroupMemberRemoved`` (rs:78-94).
- ``NodeOnboarded``: every realm admin gets ``NodeOnboarded`` — no
  suppression lane (rs:95-109).

Spark mapping: the admin rolls are role-membership dimensions
(bounded per group); routing is the event batch joined against them
with the suppression predicates as filters, one union of three
lanes — no window, no per-event loop.

Modeled fixture: users are customers (``user-<c_custkey>``), group
membership ``grp-(c_custkey % 10)``, group admin iff
``c_custkey % 7 == 0 AND c_custkey <= 7000``, realm admin iff
``c_custkey % 499 == 3 AND c_custkey <= 4990`` (both bounded like
real admin rolls, so the fan-out lanes stay linear in events at
any sf).
Events from orders ``o_orderkey % 23 == 4``: kind by ``% 3``;
``affected = user-o_custkey``; the actor is the affected user when
``o_orderkey % 5 == 0`` (self-action → suppressed), the group's
SMALLEST admin when ``% 5 == 1`` (admin-is-actor → that admin
suppressed), an external ``user-0`` otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

REALM_ID = "realm-2"


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("user-"), c.cast("string")).alias("user_id"),
        F.concat(F.lit("grp-"), (c % 10).cast("string")).alias("group_id"),
        # admin rolls are BOUNDED sets in reality (a handful per group
        # or realm), so the fixture pins both to fixed id ranges
        # rather than residues that grow with the corpus — otherwise
        # the fan-out lanes scale events x admins (measured 6.9x /
        # 5.5x at sf1 with unbounded residues).
        ((c % 7 == 0) & (c <= 7_000)).alias("is_group_admin"),
        ((c % 499 == 3) & (c <= 4_990)).alias("is_realm_admin"),
    )


def load_resource_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 23 == 4
    )
    k, cust = F.col("o_orderkey"), F.col("o_custkey")
    min_admin = (
        _users(spark, sf_dir)
        .filter("is_group_admin")
        .groupBy("group_id")
        .agg(F.min("user_id").alias("min_admin"))
    )
    base = o.select(
        F.concat(F.lit("evt-"), k.cast("string")).alias("event_id"),
        F.when(k % 3 == 0, "member_added")
        .when(k % 3 == 1, "member_removed")
        .otherwise("node_onboarded")
        .alias("event_kind"),
        F.concat(F.lit("grp-"), (cust % 10).cast("string")).alias("group_id"),
        F.concat(F.lit("user-"), cust.cast("string")).alias("affected_user"),
        F.concat(F.lit("node-"), (k % 25).cast("string")).alias("node_id"),
        (k % 5).alias("__actor_sel"),
    )
    return base.join(min_admin, "group_id", "left").select(
        "event_id",
        "event_kind",
        "group_id",
        "affected_user",
        "node_id",
        F.when(F.col("__actor_sel") == 0, F.col("affected_user"))
        .when(F.col("__actor_sel") == 1, F.col("min_admin"))
        .otherwise(F.lit("user-0"))
        .alias("actor_user_id"),
    )


def route_resource_events(
    events: DataFrame, users: DataFrame
) -> DataFrame:
    """The three routing lanes of route_resource_event as one union."""
    member_events = events.filter(
        F.col("event_kind").isin("member_added", "member_removed")
    )
    direct = member_events.filter(
        F.col("affected_user") != F.col("actor_user_id")
    ).select(
        "event_id",
        F.col("affected_user").alias("recipient"),
        F.when(F.col("event_kind") == "member_added", "added_to_group")
        .otherwise("removed_from_group")
        .alias("kind"),
        F.col("group_id").alias("context"),
        "actor_user_id",
    )
    admins = users.filter("is_group_admin").select(
        "group_id", F.col("user_id").alias("recipient")
    )
    admin_lane = (
        member_events.join(admins, "group_id")
        .filter(
            (F.col("recipient") != F.col("affected_user"))
            & (F.col("recipient") != F.col("actor_user_id"))
        )
        .select(
            "event_id",
            "recipient",
            F.when(
                F.col("event_kind") == "member_added", "group_member_added"
            )
            .otherwise("group_member_removed")
            .alias("kind"),
            F.col("group_id").alias("context"),
            "actor_user_id",
        )
    )
    realm_admins = users.filter("is_realm_admin").select(
        F.col("user_id").alias("recipient")
    )
    onboarded = (
        events.filter(F.col("event_kind") == "node_onboarded")
        .crossJoin(realm_admins)
        .select(
            "event_id",
            "recipient",
            F.lit("node_onboarded").alias("kind"),
            F.col("node_id").alias("context"),
            F.lit(None).cast("string").alias("actor_user_id"),
        )
    )
    return direct.unionByName(admin_lane).unionByName(onboarded)


_USERS_SQL = """
    SELECT 'user-' || c_custkey AS user_id,
           'grp-' || (c_custkey % 10) AS group_id,
           c_custkey % 7 = 0 AND c_custkey <= 7000 AS is_group_admin,
           c_custkey % 499 = 3 AND c_custkey <= 4990 AS is_realm_admin
    FROM customer
"""

_EVENTS_SQL = """
    SELECT 'evt-' || o_orderkey AS event_id,
           CASE o_orderkey % 3 WHEN 0 THEN 'member_added'
                WHEN 1 THEN 'member_removed'
                ELSE 'node_onboarded' END AS event_kind,
           'grp-' || (o_custkey % 10) AS group_id,
           'user-' || o_custkey AS affected_user,
           'node-' || (o_orderkey % 25) AS node_id,
           CASE o_orderkey % 5
             WHEN 0 THEN 'user-' || o_custkey
             WHEN 1 THEN (SELECT MIN(u.user_id) FROM ({_U}) u
                          WHERE u.is_group_admin
                            AND u.group_id = 'grp-' || (o_custkey % 10))
             ELSE 'user-0' END AS actor_user_id
    FROM orders WHERE o_orderkey % 23 = 4
""".replace("{_U}", _USERS_SQL)


@register(
    "notify_route_resource_events",
    oracle=f"""
    WITH users AS ({_USERS_SQL}),
    events AS ({_EVENTS_SQL})
    SELECT event_id, affected_user AS recipient,
           CASE WHEN event_kind = 'member_added' THEN 'added_to_group'
                ELSE 'removed_from_group' END AS kind,
           group_id AS context, actor_user_id
    FROM events
    WHERE event_kind IN ('member_added', 'member_removed')
      AND affected_user <> actor_user_id
    UNION ALL
    SELECT e.event_id, u.user_id,
           CASE WHEN e.event_kind = 'member_added'
                THEN 'group_member_added' ELSE 'group_member_removed' END,
           e.group_id, e.actor_user_id
    FROM events e JOIN users u ON u.group_id = e.group_id
    WHERE e.event_kind IN ('member_added', 'member_removed')
      AND u.is_group_admin
      AND u.user_id <> e.affected_user
      AND u.user_id <> e.actor_user_id
    UNION ALL
    SELECT e.event_id, u.user_id, 'node_onboarded', e.node_id,
           CAST(NULL AS VARCHAR)
    FROM events e CROSS JOIN users u
    WHERE e.event_kind = 'node_onboarded' AND u.is_realm_admin
    """,
)
def notify_route_resource_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Route the modeled event batch: direct lane minus self-actions,
    group-admin fan-out minus the affected/acting admins, realm-admin
    fan-out for onboarded nodes. The oracle rebuilds every lane from
    the role dimensions independently."""
    return route_resource_events(
        load_resource_events(spark, sf_dir), _users(spark, sf_dir)
    )
