"""Group-create owner-cap gate.

Reference: ``operations/src/create_group.rs``.

- ``CreateGroupConfig.owner_cap`` (rs:35-42): ``None`` = unlimited —
  realm admins are exempt; the cap is checked INSIDE the write
  transaction so concurrent creates cannot slip past.
- ``handle_read_realm_config`` (rs:354-370): ``Some(0)`` fails with
  ``OwnedGroupLimitReached { limit: 0 }`` BEFORE any counting scan;
  ``Some(cap)`` proceeds to the bounded count; ``None`` skips straight
  to the create.
- ``emit_count_owned_groups`` (rs:80-90): the count is a prefix scan of
  the GROUP_OWNER_INDEX keyspace for the actor with ``limit: cap`` —
  the scan never reads past the cap, so the observed count is
  ``min(owned, cap)``.
- ``handle_count_owned_groups`` (rs:93-115): ``values.len() >= cap`` →
  ``OwnedGroupLimitReached { limit: cap }``; otherwise the group is
  created with the three default roles (admin/user/viewer — rs test
  ``test_group_creation``) and the owner index gains one entry
  (``emit_write_owner_index``, rs:392-404), which is what makes the
  in-transaction count see earlier same-batch creates.

Batch model: requests are ordered (request_id); because each
successful create writes an owner-index entry inside its transaction,
request *r* of an actor with *k* pre-owned groups and cap *c* succeeds
iff ``r <= c - k`` (successes are a prefix: once one request hits the
cap, every later one sees at least the same count). The classifier is
one left join against the per-actor owned count plus one PARTITIONED
window (rank within actor) — never a global window, never a per-request
scan; the owner-index count aggregates once per actor (map-side
combinable) and the reference's ``limit: cap`` bound shows up as the
``owned_seen`` clamp, not as a full-index read.

Scale: requests shuffle once on actor_id (join + window share the
partitioning); the owned-count relation is |actors|-sized and
broadcasts. At 100 TB the owner index is still per-actor-bounded —
nothing here scans it globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

#: Default roles seeded on every created group (create_group.rs:
#: ``GroupAuthorizationDocument::new_default_group_doc``; pinned by the
#: reference's ``test_group_creation`` — admin/user/viewer).
DEFAULT_GROUP_ROLES = ("admin", "user", "viewer")

#: Fixture cap ladder per actor lane (actor_n % 4): realm admin
#: (exempt), hard-zero, tight, roomy.
_CAP_LANES = (None, 0, 2, 5)


def classify_create_groups(
    requests: DataFrame, owner_index: DataFrame
) -> DataFrame:
    """Run a create-group batch through the owner-cap gate.

    ``requests``: request_id (orders the batch), actor_id, owner_cap
    (int, NULL = exempt), display_name. ``owner_index``: one row per
    (actor_id, group_id) the actor already owns.

    Emits the reference's decision surface per request: verdict
    ('created' | 'owned_limit'), ``limit`` (the cap echoed on
    rejection, rs:106), ``owned_seen`` (what the bounded ``limit: cap``
    scan returned — NULL for exempt actors and for the cap-0 short
    circuit that never scans), the minted group_id and the default
    role count on success.
    """
    owned = owner_index.groupBy("actor_id").agg(
        F.count(F.lit(1)).alias("__owned")
    )
    w = Window.partitionBy("actor_id").orderBy("request_id")
    ranked = (
        requests.join(F.broadcast(owned), "actor_id", "left")
        .withColumn("__owned", F.coalesce(F.col("__owned"), F.lit(0)))
        .withColumn("__rnk", F.row_number().over(w))
    )
    cap = F.col("owner_cap").cast("long")
    created = cap.isNull() | (F.col("__rnk") <= cap - F.col("__owned"))
    return ranked.select(
        "request_id",
        "actor_id",
        F.col("owner_cap").cast("int").alias("owner_cap"),
        F.when(created, F.lit("created"))
        .otherwise(F.lit("owned_limit"))
        .alias("verdict"),
        F.when(~created, cap).cast("int").alias("limit"),
        F.when(
            cap.isNotNull() & (cap > 0),
            F.when(created, F.col("__owned") + F.col("__rnk") - 1).otherwise(
                cap
            ),
        )
        .cast("long")
        .alias("owned_seen"),
        F.when(
            created, F.concat(F.lit("g-new-"), F.col("request_id"))
        ).alias("group_id"),
        F.when(created, F.lit(len(DEFAULT_GROUP_ROLES)))
        .cast("int")
        .alias("n_roles"),
    )


def create_group_gate(
    owner_cap: int | None, owned_count: int
) -> tuple[bool, int | None]:
    """Single-request gate for the API route — the rung order of
    create_group.rs:354-370 then 93-115: exempt (cap None) creates
    without counting; cap 0 rejects without counting; otherwise the
    bounded count decides. Returns (created, limit)."""
    if owner_cap is None:
        return True, None
    if owner_cap == 0:
        return False, 0
    if min(owned_count, owner_cap) >= owner_cap:
        return False, owner_cap
    return True, None


def load_create_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A create-group batch: ~1/13th of orders, actors spread over 40
    ids (coprime moduli — every actor lane is populated), each actor's
    cap fixed by its lane."""
    k = F.col("o_orderkey")
    actor_n = k % 40
    cap = (
        F.when(actor_n % 4 == 1, F.lit(0))
        .when(actor_n % 4 == 2, F.lit(2))
        .when(actor_n % 4 == 3, F.lit(5))
        .cast("int")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k % 13 == 5)
        .select(
            k.alias("request_id"),
            F.concat(F.lit("user-"), actor_n.cast("string")).alias(
                "actor_id"
            ),
            cap.alias("owner_cap"),
            F.concat(F.lit("grp-"), k.cast("string")).alias("display_name"),
        )
    )


def load_owner_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP_OWNER_INDEX keyspace: sparse pre-owned groups (~2 per
    actor on average, with empty and multi-owned actors both present)."""
    k = F.col("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k % 201 == 7)
        .select(
            F.concat(F.lit("user-"), (k % 40).cast("string")).alias(
                "actor_id"
            ),
            F.concat(F.lit("g-old-"), k.cast("string")).alias("group_id"),
        )
    )


@register(
    "registry_create_group_gate",
    oracle="""
    WITH reqs AS (
      SELECT o_orderkey AS request_id,
             o_orderkey % 40 AS actor_n,
             'user-' || (o_orderkey % 40) AS actor_id
      FROM orders WHERE o_orderkey % 13 = 5
    ),
    idx AS (
      SELECT 'user-' || (o_orderkey % 40) AS actor_id,
             CAST(COUNT(*) AS BIGINT) AS owned
      FROM orders WHERE o_orderkey % 201 = 7 GROUP BY 1
    ),
    ranked AS (
      SELECT r.request_id, r.actor_id,
             CASE WHEN r.actor_n % 4 = 1 THEN 0
                  WHEN r.actor_n % 4 = 2 THEN 2
                  WHEN r.actor_n % 4 = 3 THEN 5 END AS cap,
             COALESCE(i.owned, 0) AS owned,
             row_number() OVER (PARTITION BY r.actor_id
                                ORDER BY r.request_id) AS rnk
      FROM reqs r LEFT JOIN idx i USING (actor_id)
    ),
    v AS (
      SELECT *,
             cap IS NULL OR rnk <= cap - owned AS created
      FROM ranked
    )
    SELECT request_id, actor_id, CAST(cap AS INT) AS owner_cap,
           CASE WHEN created THEN 'created' ELSE 'owned_limit' END
             AS verdict,
           CAST(CASE WHEN NOT created THEN cap END AS INT) AS "limit",
           CAST(CASE WHEN cap IS NOT NULL AND cap > 0
                     THEN CASE WHEN created THEN owned + rnk - 1
                               ELSE cap END END AS BIGINT) AS owned_seen,
           CASE WHEN created THEN 'g-new-' || request_id END AS group_id,
           CAST(CASE WHEN created THEN 3 END AS INT) AS n_roles
    FROM v
    """,
)
def registry_create_group_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fixture batch through :func:`classify_create_groups` —
    exempt, cap-0, and both sides of the bounded-count rung all
    populated (create_group.rs:80-115,354-370; the reference's own
    ``owner_cap_blocks_creation_at_limit`` sequencing is pinned in
    tests/test_create_group.py)."""
    return classify_create_groups(
        load_create_requests(spark, sf_dir),
        load_owner_index(spark, sf_dir),
    )
