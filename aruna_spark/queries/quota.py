"""Realm quota resolution: effective group quotas/ceilings, the
group-quota dashboard status, the realm-wide QuotaGate usage sum, and
the per-user group-cap resolution.

Reference surface:

- ``QuotaConfig::effective_group_quota_bytes``
  (core/src/structs/realm.rs:226-239): the group override's
  ``quota_bytes`` when an override EXISTS — an override with
  ``quota_bytes: None`` means the group is EXPLICITLY unlimited — else
  the realm ``default_group_quota_bytes``; None = unlimited.
- ``QuotaConfig::effective_group_ceiling`` (realm.rs:241-259): the
  hard cap = effective quota × effective grace factor (the override's
  ``grace_factor_percent`` if present, else the global one) / 100.
- ``GroupQuotaStatus::resolve`` (api/src/routes/info.rs:1250-1270):
  the dashboard surface — ``warning`` is the FRACTIONAL threshold
  cross-multiplication ``usage · 100 ≥ quota · warn_threshold_percent``
  (no flooring — the reference's own
  ``group_quota_status_uses_fractional_warn_threshold_without_flooring``
  test), computed on CURRENT usage, always false when unlimited.
- ``QuotaGate`` (operations/src/usage_stats.rs:280-434): the enforced
  gate sums the group's realm-wide ``logical_bytes`` = the LOCAL live
  counter + remote node snapshots, skipping (a) the local node's own
  snapshot (the live counter already covers it, rs:394-399), (b)
  snapshots from nodes that are not sync-eligible members of the realm
  config (rs:401-406), and (c) snapshots whose EMBEDDED node id
  disagrees with their storage key (never trust those, rs:407-410);
  ``is_exceeded`` = projected (usage + pending delta) STRICTLY above
  the ceiling — at-ceiling passes, one byte over fails (rs:430-434).
- ``QuotaConfig::max_groups_for`` (realm.rs:216-224): the per-user
  group cap — the user override's ``max_groups`` (None = unlimited)
  when present, else ``max_groups_per_user`` (reference default 3,
  realm.rs:209) — the ``owner_cap`` that ``create_group.rs`` enforces
  (queries/create_group.py).

Spark shape: the quota config (overrides + globals) is config-sized
and broadcasts; the usage sum is one groupBy over the snapshot
relation after three cheap filters; everything else is column algebra
on the per-group aggregate. Integer-exact throughout (the reference's
u128 cross-multiplications fit BIGINT at the modeled magnitudes; a
guard test pins the bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

# Realm-level quota globals (QuotaConfig; grace/warn defaults are the
# reference's own — realm.rs:204-210).
DEFAULT_GROUP_QUOTA = 5_000_000_000
GRACE_PCT = 110
WARN_PCT = 85
MAX_GROUPS_PER_USER = 3  # realm.rs:209 default

#: Group overrides: (group_id, quota_bytes | None, grace_pct | None).
#: grp-5 is EXPLICITLY unlimited (override present, quota None); grp-9
#: carries its own grace factor. Magnitudes sized to the sf0.01 usage
#: band (3.5-4.1e9 bytes/group) so warned/unwarned and allowed/rejected
#: all occur; at sf0.001 usage is ~10x smaller and every limited group
#: sits far below quota (tests assert invariants, not lane counts).
GROUP_OVERRIDES = [
    ("grp-2", 5_600_000_000, None),  # raised quota, global grace
    ("grp-5", None, None),  # explicitly unlimited
    ("grp-8", 3_000_000_000, None),  # tight: rejects at sf0.01 usage
    ("grp-9", 3_500_000_000, 125),  # own grace factor: warned, allowed
]

#: User group-cap overrides: (user_id, max_groups | None).
USER_CAP_OVERRIDES = [
    ("user-7", 0),
    ("user-11", 10),
    ("user-13", None),  # explicitly unlimited
]

LOCAL_NODE = "node-1"
ACTIVE_NODES = ("node-0", "node-1", "node-2", "node-3")  # node-4 is not
INCOMING_DELTA = 2_500_000  # pending write's logical bytes

_OVERRIDES_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{g}', {q if q is not None else 'NULL'},"
        f" {gr if gr is not None else 'NULL'})"
        for g, q, gr in GROUP_OVERRIDES
    )
    + ") o(group_id, over_quota, over_grace)"
)


def load_overrides(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        GROUP_OVERRIDES,
        "group_id string, over_quota long, over_grace int",
    )


# ---------------------------------------------------------------- fixture
# Local live counters: one lane of lineitem rows per group; node
# snapshots: per (group, node j in 0..4) with deterministic bytes, an
# embedded-id mismatch lane, and node-4 outside the active set.
_GROUPS = 12  # 'grp-0'..'grp-11'


def load_local_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # filter modulus 7 is coprime to the 12-group selector (a % 3
    # filter would leave only 4 reachable groups — CRT); bytes derive
    # from INTEGER columns only — l_extendedprice is a parquet DOUBLE,
    # and double->BIGINT casts round in DuckDB but truncate in Spark
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    row_bytes = (k % 997) * 12_000 + F.col("l_linenumber") * 1_540
    return (
        li.filter(k % 7 == 1)
        .groupBy(
            F.concat(F.lit("grp-"), (k % _GROUPS).cast("string")).alias(
                "group_id"
            )
        )
        .agg(F.sum(row_bytes).cast("long").alias("local_bytes"))
    )


_LOCAL_SQL = f"""
    SELECT 'grp-' || (l_orderkey % {_GROUPS}) AS group_id,
           CAST(SUM((l_orderkey % 997) * 12000
                    + CAST(l_linenumber AS BIGINT) * 1540) AS BIGINT)
             AS local_bytes
    FROM lineitem WHERE l_orderkey % 7 = 1
    GROUP BY 1
"""


def load_node_snapshots(spark: SparkSession) -> DataFrame:
    """The USAGE_NODE_STATS rows for every (group, node) pair: key node
    id, EMBEDDED node id (disagrees on the (g+j) % 5 == 2 lane), and
    the snapshot's logical bytes."""
    rows = []
    for g in range(_GROUPS):
        for j in range(5):
            key_node = f"node-{j}"
            embedded = "node-9" if (g + j) % 5 == 2 else key_node
            snap_bytes = ((g * 7 + j) % 13) * 1_000_000
            rows.append((f"grp-{g}", key_node, embedded, snap_bytes))
    return spark.createDataFrame(
        rows,
        "group_id string, key_node string, embedded_node string,"
        " snap_bytes long",
    )


_SNAPSHOTS_SQL = f"""
    SELECT 'grp-' || g.i AS group_id,
           'node-' || j.i AS key_node,
           CASE WHEN (g.i + j.i) % 5 = 2 THEN 'node-9'
                ELSE 'node-' || j.i END AS embedded_node,
           CAST(((g.i * 7 + j.i) % 13) * 1000000 AS BIGINT) AS snap_bytes
    FROM range({_GROUPS}) g(i), range(5) j(i)
"""


# ------------------------------------------------------------- resolution
def quota_status(
    usage: Column,
    quota: Column,
    grace: Column,
    warn_pct: int = WARN_PCT,
) -> tuple[Column, Column]:
    """(ceiling_bytes, warning) — realm.rs:248-259 +
    info.rs:1250-1270."""
    ceiling = F.when(
        quota.isNotNull(), F.floor(quota * grace / 100).cast("long")
    )
    warning = F.when(
        quota.isNotNull(), usage * 100 >= quota * F.lit(warn_pct)
    ).otherwise(F.lit(False))
    return ceiling, warning


@register(
    "usage_quota_status_resolved",
    oracle=f"""
    WITH locals AS ({_LOCAL_SQL}),
    snaps AS ({_SNAPSHOTS_SQL}),
    overrides AS ({_OVERRIDES_SQL}),
    kept AS (
      SELECT group_id, CAST(SUM(snap_bytes) AS BIGINT) AS remote_bytes
      FROM snaps
      WHERE key_node <> '{LOCAL_NODE}'
        AND key_node IN {tuple(ACTIVE_NODES)}
        AND embedded_node = key_node
      GROUP BY group_id
    ),
    resolved AS (
      SELECT l.group_id,
             l.local_bytes,
             COALESCE(k.remote_bytes, 0) AS remote_bytes,
             l.local_bytes + COALESCE(k.remote_bytes, 0) AS usage_bytes,
             o.group_id IS NOT NULL AS has_override,
             CAST(CASE WHEN o.group_id IS NOT NULL THEN o.over_quota
                  ELSE {DEFAULT_GROUP_QUOTA} END AS BIGINT)
               AS quota_bytes,
             CAST(COALESCE(o.over_grace, {GRACE_PCT}) AS INT) AS grace_pct
      FROM locals l
      LEFT JOIN kept k USING (group_id)
      LEFT JOIN overrides o USING (group_id)
    )
    SELECT group_id, local_bytes, remote_bytes, usage_bytes,
           usage_bytes + {INCOMING_DELTA} AS projected_bytes,
           quota_bytes, grace_pct,
           CAST(CASE WHEN quota_bytes IS NOT NULL
                THEN quota_bytes * grace_pct // 100 END AS BIGINT)
             AS ceiling_bytes,
           CAST({WARN_PCT} AS INT) AS warn_threshold_percent,
           CASE WHEN quota_bytes IS NOT NULL
                THEN usage_bytes * 100 >= quota_bytes * {WARN_PCT}
                ELSE FALSE END AS warning,
           CASE WHEN quota_bytes IS NOT NULL
                THEN usage_bytes + {INCOMING_DELTA}
                     <= quota_bytes * grace_pct // 100
                ELSE TRUE END AS allowed
    FROM resolved
    """,
)
def usage_quota_status_resolved(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per group: the realm-wide QuotaGate usage sum (local counter +
    snapshot rows surviving the three skip rules), the resolved
    quota/grace/ceiling, the fractional dashboard warning on CURRENT
    usage, and the gate verdict on PROJECTED usage (at-ceiling passes;
    unlimited groups always pass with NULL ceiling)."""
    locals_ = load_local_counters(spark, sf_dir)
    snaps = load_node_snapshots(spark)
    kept = (
        snaps.filter(
            (F.col("key_node") != LOCAL_NODE)
            & F.col("key_node").isin(*ACTIVE_NODES)
            & (F.col("embedded_node") == F.col("key_node"))
        )
        .groupBy("group_id")
        .agg(F.sum("snap_bytes").alias("remote_bytes"))
    )
    overrides = load_overrides(spark).withColumn("__over", F.lit(True))
    r = (
        locals_.join(F.broadcast(kept), "group_id", "left")
        .join(F.broadcast(overrides), "group_id", "left")
        .withColumn("remote_bytes", F.coalesce("remote_bytes", F.lit(0)))
        .withColumn(
            "usage_bytes", F.col("local_bytes") + F.col("remote_bytes")
        )
        .withColumn(
            "quota_bytes",
            F.when(F.col("__over"), F.col("over_quota")).otherwise(
                F.lit(DEFAULT_GROUP_QUOTA).cast("long")
            ),
        )
        .withColumn(
            "grace_pct",
            F.coalesce(F.col("over_grace"), F.lit(GRACE_PCT)).cast("int"),
        )
    )
    ceiling, warning = quota_status(
        F.col("usage_bytes"), F.col("quota_bytes"), F.col("grace_pct")
    )
    projected = F.col("usage_bytes") + F.lit(INCOMING_DELTA)
    return r.select(
        "group_id",
        "local_bytes",
        "remote_bytes",
        "usage_bytes",
        projected.alias("projected_bytes"),
        "quota_bytes",
        "grace_pct",
        ceiling.alias("ceiling_bytes"),
        F.lit(WARN_PCT).cast("int").alias("warn_threshold_percent"),
        warning.alias("warning"),
        F.when(F.col("quota_bytes").isNotNull(), projected <= ceiling)
        .otherwise(F.lit(True))
        .alias("allowed"),
    )


_USER_OVERRIDES_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{u}', {c if c is not None else 'NULL'})"
        for u, c in USER_CAP_OVERRIDES
    )
    + ") o(user_id, over_cap)"
)


@register(
    "realm_user_group_caps",
    oracle=f"""
    WITH overrides AS ({_USER_OVERRIDES_SQL}),
    users AS (
      SELECT DISTINCT 'user-' || (o_orderkey % 40) AS user_id
      FROM orders WHERE o_orderkey % 13 = 5
    ),
    owned AS (
      SELECT 'user-' || (o_orderkey % 40) AS user_id,
             CAST(COUNT(*) AS BIGINT) AS owned
      FROM orders WHERE o_orderkey % 201 = 7 GROUP BY 1
    )
    SELECT u.user_id,
           CAST(CASE WHEN o.user_id IS NOT NULL THEN o.over_cap
                ELSE {MAX_GROUPS_PER_USER} END AS INT) AS max_groups,
           CASE WHEN o.user_id IS NOT NULL THEN 'override'
                ELSE 'realm_default' END AS cap_source,
           COALESCE(w.owned, 0) AS owned,
           CAST(CASE WHEN o.user_id IS NOT NULL AND o.over_cap IS NULL
                  THEN NULL
                WHEN o.user_id IS NOT NULL
                  THEN GREATEST(o.over_cap - COALESCE(w.owned, 0), 0)
                ELSE GREATEST({MAX_GROUPS_PER_USER}
                              - COALESCE(w.owned, 0), 0)
           END AS BIGINT) AS headroom
    FROM users u
    LEFT JOIN overrides o USING (user_id)
    LEFT JOIN owned w USING (user_id)
    """,
)
def realm_user_group_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_groups_for per actor of the create-group batch (realm.rs:
    216-224: override — None = unlimited — else the realm default 3),
    with the actor's owned-group count from the create_group owner
    index and the remaining headroom (NULL = unlimited). This is the
    resolution create_group.rs CONSUMES for its ``owner_cap`` — the
    two registered fixtures assign caps independently (this one by the
    override table, the gate's by its actor lane), so their cap values
    for one actor id intentionally differ; the coupling is the shared
    actor population and owner index, not the cap numbers."""
    from aruna_spark.queries.create_group import (
        load_create_requests,
        load_owner_index,
    )

    users = (
        load_create_requests(spark, sf_dir)
        .select(F.col("actor_id").alias("user_id"))
        .distinct()
    )
    overrides = spark.createDataFrame(
        USER_CAP_OVERRIDES, "user_id string, over_cap int"
    ).withColumn("__over", F.lit(True))
    owned = (
        load_owner_index(spark, sf_dir)
        .groupBy(F.col("actor_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("owned"))
    )
    cap = F.when(F.col("__over"), F.col("over_cap")).otherwise(
        F.lit(MAX_GROUPS_PER_USER)
    )
    return (
        users.join(F.broadcast(overrides), "user_id", "left")
        .join(F.broadcast(owned), "user_id", "left")
        .withColumn("owned", F.coalesce("owned", F.lit(0)))
        .select(
            "user_id",
            cap.cast("int").alias("max_groups"),
            F.when(F.col("__over"), "override")
            .otherwise("realm_default")
            .alias("cap_source"),
            "owned",
            F.when(
                cap.isNotNull(),
                F.greatest(cap - F.col("owned"), F.lit(0)),
            )
            .cast("long")
            .alias("headroom"),
        )
    )
