"""Onboarding-secret lifecycle — the enrollment keyspace's
query-shaped kernels (listing + prune, the reserve ladder, the consume
ladder). The bootstrap transport (key wrapping, sync tickets, node
proofs — bootstrap_onboarding_finalize.rs) stays excluded
orchestration; what is modeled is every state/validation decision.

Reference surface:

- ``core/src/onboarding.rs:14-60`` — ``OnboardingSecretRecord
  { enrollment_id, secret_hash, mode (Management|Server|Local),
  expires_at, claimed_node_id }``; ``OnboardingSecretState``:
  Available | Reserved { node_id, expires_at } | Finalizing
  { node_id } | Consumed { node_id } (a separate keyed state record,
  ``onboarding_secret_state.rs:10-27``).
- ``api/src/routes/onboarding.rs`` (``prune_stale_onboarding_secrets``
  + ``list_onboarding_secrets``) — every admin route first DELETES
  expired secrets UNLESS their state is Finalizing (a node mid-bootstrap
  must not lose its secret under it — the route test pins
  "list_prunes_expired_available_but_keeps_expired_finalizing");
  survivors list in ``expires_at`` order as the summary shape
  (enrollment, mode, expires_at, claimed_node_id).
- ``operations/src/reserve_onboarding_secret.rs:86-146`` — the reserve
  ladder: missing record → NotFound; hash mismatch → InvalidSecret;
  then by state — Available reserves unless the RECORD expired;
  Reserved by the same node re-reserves idempotently (no expiry
  check); Reserved by another node is AlreadyClaimed while the
  reservation is live (state.expires_at >= now), else the expired
  reservation is STOLEN (subject to record expiry); Finalizing /
  Consumed by the same node succeed WITHOUT a write (Ok(None));
  by another node → AlreadyClaimed. A successful reserve writes
  state Finalizing when the caller is finalizing, else Reserved
  stamped with the caller's reservation deadline (rs:246-258).
- ``operations/src/consume_onboarding_secret.rs:160-245`` — the
  consume ladder checks EXPIRY BEFORE THE HASH, with an engagement
  override: an expired record still consumes when the caller already
  holds it (Reserved by the caller with a live reservation, or
  Finalizing/Consumed by the caller) — an in-flight bootstrap must
  not die because the secret's own TTL lapsed mid-handshake; then
  hash → InvalidSecret; then state — Available or held-by-caller
  consume now, Consumed-by-caller is idempotent success with
  ``consumed_now = false``, any other claimant → AlreadyClaimed.

Spark mapping: the enrollment keyspace is tiny at any scale (one
record per pending node join); every ladder is one broadcast join +
CASE chain.

Fixture (customer ``% 8 == 1`` secrets; NOW = 50 000): expiry lane
k%7 (40 000 + 3 000·(k%7): 0-3 expired, 4-6 live), state lane k%9
(≤2 available, 3-4 reserved, 5-6 finalizing, else consumed), state
node ``nd<k%5>``, reservation deadline 44 000 + 1 000·(k%11)
(live iff k%11 ≥ 6). Request lanes: missing-secret (k%8 ∈ {5}/{7}),
caller-node mismatch (k%13 ≥ 8 / k%11 ≥ 7), bad hash (k%17 = 2 /
k%19 = 3), finalizing flag k%3 = 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

NOW = 50_000
RESERVATION_DEADLINE = 55_000  # the caller's requested reservation TTL

_SECRETS_SQL = """
    secrets AS (
      SELECT c_custkey AS enrollment_id,
             'h' || (c_custkey % 19) AS secret_hash,
             CASE c_custkey % 3 WHEN 0 THEN 'Management'
                  WHEN 1 THEN 'Server' ELSE 'Local' END AS mode,
             CAST(40000 + (c_custkey % 7) * 3000 AS BIGINT) AS expires_at,
             CASE WHEN c_custkey % 9 <= 2 THEN 'available'
                  WHEN c_custkey % 9 <= 4 THEN 'reserved'
                  WHEN c_custkey % 9 <= 6 THEN 'finalizing'
                  ELSE 'consumed' END AS state,
             CASE WHEN c_custkey % 9 > 2
                  THEN 'nd' || (c_custkey % 5) END AS state_node,
             CASE WHEN c_custkey % 9 IN (3, 4)
                  THEN CAST(44000 + (c_custkey % 11) * 1000 AS BIGINT)
             END AS reservation_expires_at
      FROM customer WHERE c_custkey % 8 = 1
    )
"""


def load_secrets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONBOARDING keyspace: secret records zipped with their
    resolved state records (list_onboarding_secrets.rs:83-188 — the
    record scan + state batch-read join). ``claimed_node_id`` mirrors
    the state's node: every claim path writes both."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 8 == 1
    )
    k = F.col("c_custkey")
    state = (
        F.when(k % 9 <= 2, "available")
        .when(k % 9 <= 4, "reserved")
        .when(k % 9 <= 6, "finalizing")
        .otherwise("consumed")
    )
    return c.select(
        k.alias("enrollment_id"),
        F.concat(F.lit("h"), (k % 19).cast("string")).alias("secret_hash"),
        F.when(k % 3 == 0, "Management")
        .when(k % 3 == 1, "Server")
        .otherwise("Local")
        .alias("mode"),
        (40_000 + (k % 7) * 3_000).cast("long").alias("expires_at"),
        state.alias("state"),
        F.when(
            k % 9 > 2, F.concat(F.lit("nd"), (k % 5).cast("string"))
        ).alias("state_node"),
        F.when(
            (k % 9).isin(3, 4),
            (44_000 + (k % 11) * 1_000).cast("long"),
        ).alias("reservation_expires_at"),
    )


@register(
    "onboarding_secret_listing",
    oracle=f"""
    WITH {_SECRETS_SQL}
    SELECT enrollment_id, mode, expires_at,
           state_node AS claimed_node_id, state, state_node
    FROM secrets
    WHERE expires_at >= {NOW} OR state = 'finalizing'
    """,
)
def onboarding_secret_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admin listing after the prune pass
    (onboarding.rs ``prune_stale_onboarding_secrets`` +
    ``list_onboarding_secrets``): expired secrets are deleted UNLESS
    mid-finalize — a bootstrapping node keeps its secret even past the
    TTL; survivors carry the summary shape plus the resolved state.
    The route sorts by ``expires_at`` (emitted — the order key IS a
    column, so order verifies through the hash)."""
    s = load_secrets(spark, sf_dir)
    return s.filter(
        (F.col("expires_at") >= NOW) | (F.col("state") == "finalizing")
    ).select(
        "enrollment_id",
        "mode",
        "expires_at",
        F.col("state_node").alias("claimed_node_id"),
        "state",
        "state_node",
    )


_RESERVE_REQS_SQL = """
    reserve_reqs AS (
      SELECT c_custkey AS request_id,
             c_custkey AS enrollment_id,
             'nd' || (CASE WHEN c_custkey % 13 < 8 THEN c_custkey % 5
                           ELSE (c_custkey + 1) % 5 END) AS node_id,
             CASE WHEN c_custkey % 17 = 2 THEN 'bad'
                  ELSE 'h' || (c_custkey % 19) END AS req_hash,
             c_custkey % 3 = 1 AS finalizing
      FROM customer WHERE c_custkey % 8 IN (1, 5)
    )
"""


@register(
    "onboarding_reserve_validate",
    oracle=f"""
    WITH {_SECRETS_SQL},
    {_RESERVE_REQS_SQL}
    SELECT q.request_id, q.enrollment_id, q.node_id, q.finalizing,
           CASE
             WHEN s.enrollment_id IS NULL THEN 'not_found'
             WHEN q.req_hash <> s.secret_hash THEN 'invalid_secret'
             WHEN s.state = 'available' THEN
               CASE WHEN s.expires_at < {NOW} THEN 'expired'
                    ELSE 'reserved' END
             WHEN s.state = 'reserved' AND s.state_node = q.node_id
               THEN 'reserved'
             WHEN s.state = 'reserved' THEN
               CASE WHEN s.reservation_expires_at >= {NOW}
                      THEN 'already_claimed'
                    WHEN s.expires_at < {NOW} THEN 'expired'
                    ELSE 'reserved' END
             WHEN s.state_node = q.node_id THEN 'noop'
             ELSE 'already_claimed'
           END AS outcome,
           CASE
             WHEN s.enrollment_id IS NULL
                  OR q.req_hash <> s.secret_hash THEN NULL
             WHEN (s.state = 'available' AND s.expires_at >= {NOW})
                  OR (s.state = 'reserved' AND s.state_node = q.node_id)
                  OR (s.state = 'reserved'
                      AND s.reservation_expires_at < {NOW}
                      AND s.expires_at >= {NOW})
               THEN CASE WHEN q.finalizing THEN 'finalizing'
                         ELSE 'reserved' END
           END AS written_state,
           CASE
             WHEN q.finalizing OR s.enrollment_id IS NULL
                  OR q.req_hash <> s.secret_hash THEN NULL
             WHEN (s.state = 'available' AND s.expires_at >= {NOW})
                  OR (s.state = 'reserved' AND s.state_node = q.node_id)
                  OR (s.state = 'reserved'
                      AND s.reservation_expires_at < {NOW}
                      AND s.expires_at >= {NOW})
               THEN CAST({RESERVATION_DEADLINE} AS BIGINT)
           END AS written_deadline
    FROM reserve_reqs q LEFT JOIN secrets s USING (enrollment_id)
    """,
)
def onboarding_reserve_validate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reserve ladder over a request batch
    (reserve_onboarding_secret.rs:86-146,246-258): NotFound →
    InvalidSecret → state. Available reserves unless the RECORD
    expired; the same node re-reserves with no expiry check (its
    claim is already durable); another node's live reservation
    rejects AlreadyClaimed, an expired one is stolen (subject to
    record expiry); Finalizing/Consumed by the caller are no-op
    successes (``Ok(None)`` — the record returns, nothing writes);
    by anyone else AlreadyClaimed. Successful reserves write
    Finalizing when the caller is mid-bootstrap, else Reserved
    stamped with the caller's deadline."""
    reqs = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 8).isin(1, 5))
        .select(F.col("c_custkey").alias("k"))
        .select(
            F.col("k").alias("request_id"),
            F.col("k").alias("enrollment_id"),
            F.concat(
                F.lit("nd"),
                F.when(F.col("k") % 13 < 8, F.col("k") % 5)
                .otherwise((F.col("k") + 1) % 5)
                .cast("string"),
            ).alias("node_id"),
            F.when(F.col("k") % 17 == 2, "bad")
            .otherwise(
                F.concat(F.lit("h"), (F.col("k") % 19).cast("string"))
            )
            .alias("req_hash"),
            (F.col("k") % 3 == 1).alias("finalizing"),
        )
    )
    s = load_secrets(spark, sf_dir)
    joined = reqs.join(F.broadcast(s), "enrollment_id", "left")
    return classify_reserve(joined).select(
        "request_id",
        "enrollment_id",
        "node_id",
        "finalizing",
        "outcome",
        "written_state",
        "written_deadline",
    )


def classify_reserve(
    joined: DataFrame,
    now: int = NOW,
    deadline: int = RESERVATION_DEADLINE,
) -> DataFrame:
    """Append the reserve ladder's verdict columns to a
    (request x secret) left-joined frame — the exact
    ``validate_record`` + ``reserve_state`` order
    (reserve_onboarding_secret.rs:86-146). Parameterized on the
    clock so tests can feed the reference's own vectors."""
    missing = F.col("secret_hash").isNull()
    bad_hash = F.col("req_hash") != F.col("secret_hash")
    record_expired = F.col("expires_at") < now
    same_node = F.col("state_node") == F.col("node_id")
    reservation_live = F.col("reservation_expires_at") >= now
    outcome = (
        F.when(missing, "not_found")
        .when(bad_hash, "invalid_secret")
        .when(
            F.col("state") == "available",
            F.when(record_expired, "expired").otherwise("reserved"),
        )
        .when((F.col("state") == "reserved") & same_node, "reserved")
        .when(
            F.col("state") == "reserved",
            F.when(reservation_live, "already_claimed")
            .when(record_expired, "expired")
            .otherwise("reserved"),
        )
        .when(same_node, "noop")
        .otherwise("already_claimed")
    )
    writes = (
        ((F.col("state") == "available") & ~record_expired)
        | ((F.col("state") == "reserved") & same_node)
        | (
            (F.col("state") == "reserved")
            & ~reservation_live
            & ~record_expired
        )
    )
    return joined.withColumn("outcome", outcome).withColumn(
        "written_state",
        F.when(
            ~missing & ~bad_hash & writes,
            F.when(F.col("finalizing"), "finalizing").otherwise("reserved"),
        ),
    ).withColumn(
        "written_deadline",
        F.when(
            ~F.col("finalizing") & ~missing & ~bad_hash & writes,
            F.lit(deadline),
        ).cast("long"),
    )


_CONSUME_REQS_SQL = """
    consume_reqs AS (
      SELECT c_custkey AS request_id,
             c_custkey AS enrollment_id,
             'nd' || (CASE WHEN c_custkey % 11 < 7 THEN c_custkey % 5
                           ELSE (c_custkey + 2) % 5 END) AS node_id,
             CASE WHEN c_custkey % 19 = 3 THEN 'bad'
                  ELSE 'h' || (c_custkey % 19) END AS req_hash
      FROM customer WHERE c_custkey % 8 IN (1, 7)
    )
"""


@register(
    "onboarding_consume_validate",
    oracle=f"""
    WITH {_SECRETS_SQL},
    {_CONSUME_REQS_SQL},
    laddered AS (
      SELECT q.request_id, q.enrollment_id, q.node_id,
             s.secret_hash IS NULL AS missing,
             s.expires_at < {NOW} AND NOT (
               (s.state = 'reserved' AND s.state_node = q.node_id
                AND s.reservation_expires_at >= {NOW})
               OR (s.state = 'finalizing' AND s.state_node = q.node_id)
               OR (s.state = 'consumed' AND s.state_node = q.node_id)
             ) AS expired_unengaged,
             q.req_hash <> s.secret_hash AS bad_hash,
             s.state, s.state_node
      FROM consume_reqs q LEFT JOIN secrets s USING (enrollment_id)
    )
    SELECT request_id, enrollment_id, node_id,
           CASE
             WHEN missing THEN 'not_found'
             WHEN expired_unengaged THEN 'expired'
             WHEN bad_hash THEN 'invalid_secret'
             WHEN state = 'available' THEN 'consumed'
             WHEN state IN ('reserved', 'finalizing')
                  AND state_node = node_id THEN 'consumed'
             WHEN state = 'consumed' AND state_node = node_id
               THEN 'idempotent'
             ELSE 'already_claimed'
           END AS outcome,
           CASE
             WHEN missing OR expired_unengaged OR bad_hash THEN NULL
             WHEN state = 'available'
                  OR (state IN ('reserved', 'finalizing')
                      AND state_node = node_id) THEN TRUE
             WHEN state = 'consumed' AND state_node = node_id THEN FALSE
           END AS consumed_now
    FROM laddered
    """,
)
def onboarding_consume_validate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The consume ladder (consume_onboarding_secret.rs:160-245) —
    the two rungs that differ from reserve, faithfully ordered:

    - EXPIRY IS CHECKED BEFORE THE HASH, and an expired record still
      passes when the caller already holds it (a live reservation,
      Finalizing, or Consumed — all by the caller): an in-flight
      bootstrap must not die because the secret's TTL lapsed
      mid-handshake;
    - Consumed-by-caller is an idempotent success with
      ``consumed_now = false`` (the transaction commits with no
      write); any other claimant rejects AlreadyClaimed.
    """
    reqs = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 8).isin(1, 7))
        .select(F.col("c_custkey").alias("k"))
        .select(
            F.col("k").alias("request_id"),
            F.col("k").alias("enrollment_id"),
            F.concat(
                F.lit("nd"),
                F.when(F.col("k") % 11 < 7, F.col("k") % 5)
                .otherwise((F.col("k") + 2) % 5)
                .cast("string"),
            ).alias("node_id"),
            F.when(F.col("k") % 19 == 3, "bad")
            .otherwise(
                F.concat(F.lit("h"), (F.col("k") % 19).cast("string"))
            )
            .alias("req_hash"),
        )
    )
    s = load_secrets(spark, sf_dir)
    joined = reqs.join(F.broadcast(s), "enrollment_id", "left")
    return classify_consume(joined).select(
        "request_id", "enrollment_id", "node_id", "outcome", "consumed_now"
    )


def classify_consume(joined: DataFrame, now: int = NOW) -> DataFrame:
    """Append the consume ladder's verdict columns — expiry BEFORE
    hash, with the engagement override
    (consume_onboarding_secret.rs:160-245)."""
    missing = F.col("secret_hash").isNull()
    same_node = F.col("state_node") == F.col("node_id")
    engaged = (
        (
            (F.col("state") == "reserved")
            & same_node
            & (F.col("reservation_expires_at") >= now)
        )
        | ((F.col("state") == "finalizing") & same_node)
        | ((F.col("state") == "consumed") & same_node)
    )
    expired_unengaged = (F.col("expires_at") < now) & ~engaged
    bad_hash = F.col("req_hash") != F.col("secret_hash")
    consumes = (F.col("state") == "available") | (
        F.col("state").isin("reserved", "finalizing") & same_node
    )
    idempotent = (F.col("state") == "consumed") & same_node
    return joined.withColumn(
        "outcome",
        F.when(missing, "not_found")
        .when(expired_unengaged, "expired")
        .when(bad_hash, "invalid_secret")
        .when(consumes, "consumed")
        .when(idempotent, "idempotent")
        .otherwise("already_claimed"),
    ).withColumn(
        "consumed_now",
        F.when(missing | expired_unengaged | bad_hash, F.lit(None))
        .when(consumes, F.lit(True))
        .when(idempotent, F.lit(False))
        .cast("boolean"),
    )


_INSPECT_REQS_SQL = """
    inspect_reqs AS (
      SELECT c_custkey AS request_id,
             c_custkey AS enrollment_id,
             'nd' || (CASE WHEN c_custkey % 23 < 15 THEN c_custkey % 5
                           ELSE (c_custkey + 1) % 5 END) AS node_id,
             CASE WHEN c_custkey % 29 = 5 THEN 'bad'
                  ELSE 'h' || (c_custkey % 19) END AS req_hash
      FROM customer WHERE c_custkey % 8 IN (1, 3)
    )
"""


@register(
    "onboarding_inspect_validate",
    oracle=f"""
    WITH {_SECRETS_SQL},
    {_INSPECT_REQS_SQL}
    SELECT q.request_id, q.enrollment_id, q.node_id,
           CASE
             WHEN s.enrollment_id IS NULL THEN 'not_found'
             WHEN s.state = 'finalizing' AND s.state_node <> q.node_id
               THEN 'already_claimed'
             WHEN s.expires_at < {NOW} AND NOT (
                  s.state = 'finalizing' AND s.state_node = q.node_id)
               THEN 'expired'
             WHEN q.req_hash <> s.secret_hash THEN 'invalid_secret'
             ELSE 'ok'
           END AS outcome,
           CASE
             WHEN s.enrollment_id IS NOT NULL
                  AND NOT (s.state = 'finalizing'
                           AND s.state_node <> q.node_id)
                  AND NOT (s.expires_at < {NOW} AND NOT (
                       s.state = 'finalizing'
                       AND s.state_node = q.node_id))
                  AND q.req_hash = s.secret_hash
               THEN s.mode END AS mode,
           CASE
             WHEN s.enrollment_id IS NOT NULL
                  AND NOT (s.state = 'finalizing'
                           AND s.state_node <> q.node_id)
                  AND NOT (s.expires_at < {NOW} AND NOT (
                       s.state = 'finalizing'
                       AND s.state_node = q.node_id))
                  AND q.req_hash = s.secret_hash
               THEN s.expires_at END AS expires_at,
           CASE
             WHEN s.enrollment_id IS NOT NULL
                  AND NOT (s.state = 'finalizing'
                           AND s.state_node <> q.node_id)
                  AND NOT (s.expires_at < {NOW} AND NOT (
                       s.state = 'finalizing'
                       AND s.state_node = q.node_id))
                  AND q.req_hash = s.secret_hash
               THEN s.state_node END AS claimed_node_id
    FROM inspect_reqs q LEFT JOIN secrets s USING (enrollment_id)
    """,
)
def onboarding_inspect_validate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The keyed inspect envelope over a request batch
    (inspect_onboarding_secret.rs:150-168 + the NotFound rung at
    rs:122-126) — a pure READ: state resolution without mutation,
    completing the onboarding admin surface (VERDICT r11 Next #4).
    The rung ORDER differs from both reserve and consume and is the
    point:

    - a secret another node is FINALIZING rejects ``already_claimed``
      FIRST — even before expiry (an expired foreign claim must not
      read as merely ``expired``: the inspecting node could retry a
      bootstrap that would then collide);
    - expiry rejects next, with the override narrowed to
      Finalizing-BY-CALLER only (reserve/consume honor wider
      engagement; inspect's caller holds nothing mid-flight unless it
      is the finalizing node itself);
    - the hash mismatch is checked LAST (rs:164), so a caller with a
      wrong secret still learns claim/expiry state — the route is
      admin-gated (routes/onboarding.rs), not an oracle for secret
      guessing;
    - survivors return the record itself (mode, expires_at,
      claimed_node_id), nothing writes.
    """
    reqs = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 8).isin(1, 3))
        .select(F.col("c_custkey").alias("k"))
        .select(
            F.col("k").alias("request_id"),
            F.col("k").alias("enrollment_id"),
            F.concat(
                F.lit("nd"),
                F.when(F.col("k") % 23 < 15, F.col("k") % 5)
                .otherwise((F.col("k") + 1) % 5)
                .cast("string"),
            ).alias("node_id"),
            F.when(F.col("k") % 29 == 5, "bad")
            .otherwise(
                F.concat(F.lit("h"), (F.col("k") % 19).cast("string"))
            )
            .alias("req_hash"),
        )
    )
    s = load_secrets(spark, sf_dir)
    joined = reqs.join(F.broadcast(s), "enrollment_id", "left")
    return classify_inspect(joined).select(
        "request_id",
        "enrollment_id",
        "node_id",
        "outcome",
        "mode",
        "expires_at",
        "claimed_node_id",
    )


def classify_inspect(joined: DataFrame, now: int = NOW) -> DataFrame:
    """Append the inspect ladder's verdict columns — AlreadyClaimed
    (foreign Finalizing) BEFORE expiry, the expiry override narrowed
    to Finalizing-by-caller, hash LAST
    (inspect_onboarding_secret.rs:150-168). Parameterized on the
    clock so tests can feed the reference's own vectors."""
    missing = F.col("secret_hash").isNull()
    finalizing = F.col("state") == "finalizing"
    same_node = F.col("state_node") == F.col("node_id")
    claimed = finalizing & ~same_node
    expired = (F.col("expires_at") < now) & ~(finalizing & same_node)
    bad_hash = F.col("req_hash") != F.col("secret_hash")
    ok = ~missing & ~claimed & ~expired & ~bad_hash
    out = joined.withColumn(
        "outcome",
        F.when(missing, "not_found")
        .when(claimed, "already_claimed")
        .when(expired, "expired")
        .when(bad_hash, "invalid_secret")
        .otherwise("ok"),
    )
    return (
        out.withColumn("mode", F.when(ok, F.col("mode")))
        .withColumn(
            "expires_at", F.when(ok, F.col("expires_at")).cast("long")
        )
        .withColumn("claimed_node_id", F.when(ok, F.col("state_node")))
    )
