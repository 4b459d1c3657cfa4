"""Bucket sync relationships + the mirror-repair queue drain — the
last query-shaped plane VERDICT r9 flagged as missing. The sync
TRANSPORT (mirroring bytes between nodes) stays excluded
orchestration; what's modeled is the relationship CATALOG, the
create-validation ladder, and the repair-queue DRAIN tick.

Reference surface:

- ``core/src/structs/sync_relationship.rs:59-118`` —
  ``SyncRelationship { id, source: ArunaArn, target: ArunaArn, mode
  (once|reference|continuous), reference_handling
  (materialize|preserve|skip), reference_serving, replicate_deletes,
  created_by, created_at, state, status }``; ``validate``: both
  endpoints canonical S3 ARNs with non-empty buckets, source ≠
  target, reference mode requires preserve handling, preserve
  requires serving capability.
- ``sync_relationship.rs:121-131`` — the OUT/IN keyspace key is
  ``bucket || 0x00 || id`` → list order is (bucket, id).
- ``operations/src/sync_relationship.rs:16-17,143-193`` — list page
  RELATIONSHIP_PAGE_SIZE 128; create scans the source bucket's prefix
  and rejects a Duplicate when an existing NON-Detached relationship
  shares (source, target, mode) — detached stubs must not block
  re-creating the same relationship.
- ``api/src/routes/sync.rs:249-306`` — the create route's ladder
  order: endpoint construction (invalid bucket rejects), source ≠
  target, permission (excluded), mode coercion (Reference forces
  Preserve handling; serving := handling == Preserve), duplicate scan.
- ``api/src/routes/sync.rs:955-975`` (``filter_relationships``) +
  ``sync.rs:901-907`` — the management listing hides Detached stubs
  and filters to the caller's own relationships; state maps to
  (state, failure_reason) (``sync.rs:998-1004``).
- ``operations/src/sync_mirror_repair.rs:35-38`` — repair-queue
  constants: REPAIR_PAGE_SIZE 128, REPAIR_BATCH_SIZE 64,
  RECONCILE_GRACE 30 s, retry 1 s.
- ``sync_mirror_repair.rs:46-70`` — ``SyncMirrorRepairRecord
  { relationship, intent: Reconcile|Delete, due_at_ms, attempts,
  last_error }``; keyed by relationship id (ONE pending repair per
  relationship); Reconcile stages due at now+grace, Delete due now.
- ``sync_mirror_repair.rs:368-409,553-612`` — one drain tick: scan
  the WHOLE repair keyspace (page 128), split due/future, sort due by
  (due_at_ms, key), ``has_more_due`` = due count > 64, truncate to
  64; per record: Reconcile re-reads the OUT record — Detached or
  NotFound means delete the mirror (never resurrect a stub),
  otherwise ensure it; Delete deletes local records + the mirror.
  Success clears the record; failure reschedules it with attempts+1
  due at now + queue backoff (``rs:625-646``). The result envelope's
  ``next_due_after`` is None when more work is due now (the kick
  re-arms), else the gap to the earliest FUTURE record.

Spark mapping: the catalog is a relation keyed (source_bucket, id);
the listing and the duplicate scan are broadcast-side lookups
(relationship catalogs are metadata-sized at any corpus scale); the
drain tick reuses :mod:`aruna_spark.ops.queue_drain` — a bounded
TakeOrderedAndProject page, a broadcast left join against the OUT
catalog for the Reconcile re-read, one CASE ladder for the
action/result columns, and the batch+1-probed envelope.

Fixture (customer; row selection ``% 4 == 1`` ⇒ discriminators must
avoid even mods — 3, 5, 7, 9, 11, 13, 17 used, all odd):

- relationship k: source ``bkt<k%3>`` (+ prefix ``p<k%5>/`` when
  k%9 ∈ {4,7}), target ``tgt<k%5>`` on ``node<k%7>``, mode by k%11
  (≤3 once, ≤7 continuous, else reference — reference rows carry
  preserve/serving, satisfying ``validate``), replicate_deletes
  k%5<2, created_by ``user-<k%7>``, state by k%9 (0 paused, 1 failed
  + reason, 2 detached, else enabled), counters from k%17/k%3;
- repair queue: staged for relationships with k%5 ∈ {0,1,2}, PLUS
  orphan records (k%4==3 ∧ k%5==1 — their OUT record is gone →
  NotFound lane); intent delete when k%11==4 else reconcile; due
  2000+k (due) or 80000+k when k%9==5 (future); attempts k%3;
  processing FAILS when k%13==6 → reschedule lane. NOW = 50 000.
  At sf0.01 ~200 records are due, so the 64 batch genuinely cuts and
  ``has_more_due`` is true (the false/next-due branch is pinned by a
  synthetic-queue unit test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.queue_drain import backoff_ms, drain_envelope, due_page
from aruna_spark.queries import register

RELATIONSHIP_PAGE_SIZE = 128  # sync_relationship.rs:16
REPAIR_PAGE_SIZE = 128  # sync_mirror_repair.rs:35
REPAIR_BATCH_SIZE = 64  # sync_mirror_repair.rs:36
RECONCILE_GRACE_MS = 30_000  # sync_mirror_repair.rs:37
MIRROR_REPAIR_RETRY_AFTER_MS = 1_000  # sync_mirror_repair.rs:38
NOW_MS = 50_000
LIST_USER = "user-3"


def load_sync_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SYNC_RELATIONSHIP_OUT keyspace: one VALID record per row
    (from_bytes re-validates on read, so stored records always pass
    ``SyncRelationship::validate`` — invalid combinations exist only
    in the create-request fixture)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 4 == 1
    )
    k = F.col("c_custkey")
    mode = (
        F.when(k % 11 <= 3, "once")
        .when(k % 11 <= 7, "continuous")
        .otherwise("reference")
    )
    handling = (
        F.when(k % 11 >= 8, "preserve")
        .when(k % 13 < 7, "materialize")
        .otherwise("skip")
    )
    state = (
        F.when(k % 9 == 0, "paused")
        .when(k % 9 == 1, "failed")
        .when(k % 9 == 2, "detached")
        .otherwise("enabled")
    )
    return c.select(
        k.alias("relationship_id"),
        F.concat(F.lit("bkt"), (k % 3).cast("string")).alias(
            "source_bucket"
        ),
        F.when(
            (k % 9).isin(4, 7),
            F.concat(F.lit("p"), (k % 5).cast("string"), F.lit("/")),
        ).alias("source_prefix"),
        F.concat(F.lit("node"), (k % 7).cast("string")).alias(
            "target_node"
        ),
        F.concat(F.lit("tgt"), (k % 5).cast("string")).alias(
            "target_bucket"
        ),
        mode.alias("mode"),
        handling.alias("reference_handling"),
        (k % 11 >= 8).alias("reference_serving"),
        (k % 5 < 2).alias("replicate_deletes"),
        F.concat(F.lit("user-"), (k % 7).cast("string")).alias(
            "created_by"
        ),
        state.alias("state"),
        F.when(k % 9 == 1, "mirror unreachable").alias("failure_reason"),
        (k + 1000).cast("long").alias("created_at_ms"),
        (k % 17).cast("long").alias("versions_synced"),
        ((k % 17) * 1024).cast("long").alias("bytes_synced"),
    )


_RELS_SQL = """
    rels AS (
      SELECT c_custkey AS relationship_id,
             'bkt' || (c_custkey % 3) AS source_bucket,
             CASE WHEN c_custkey % 9 IN (4, 7)
                  THEN 'p' || (c_custkey % 5) || '/' END AS source_prefix,
             'node' || (c_custkey % 7) AS target_node,
             'tgt' || (c_custkey % 5) AS target_bucket,
             CASE WHEN c_custkey % 11 <= 3 THEN 'once'
                  WHEN c_custkey % 11 <= 7 THEN 'continuous'
                  ELSE 'reference' END AS mode,
             CASE WHEN c_custkey % 11 >= 8 THEN 'preserve'
                  WHEN c_custkey % 13 < 7 THEN 'materialize'
                  ELSE 'skip' END AS reference_handling,
             c_custkey % 11 >= 8 AS reference_serving,
             c_custkey % 5 < 2 AS replicate_deletes,
             'user-' || (c_custkey % 7) AS created_by,
             CASE WHEN c_custkey % 9 = 0 THEN 'paused'
                  WHEN c_custkey % 9 = 1 THEN 'failed'
                  WHEN c_custkey % 9 = 2 THEN 'detached'
                  ELSE 'enabled' END AS state,
             CASE WHEN c_custkey % 9 = 1
                  THEN 'mirror unreachable' END AS failure_reason,
             CAST(c_custkey + 1000 AS BIGINT) AS created_at_ms,
             CAST(c_custkey % 17 AS BIGINT) AS versions_synced,
             CAST((c_custkey % 17) * 1024 AS BIGINT) AS bytes_synced
      FROM customer WHERE c_custkey % 4 = 1
    )
"""


@register(
    "sync_relationship_list",
    oracle=f"""
    WITH {_RELS_SQL}
    SELECT relationship_id, source_bucket, source_prefix, target_node,
           target_bucket, mode, reference_handling, reference_serving,
           replicate_deletes, state, failure_reason, created_at_ms,
           versions_synced, bytes_synced
    FROM rels
    WHERE state <> 'detached' AND created_by = '{LIST_USER}'
    ORDER BY source_bucket, relationship_id
    """,
)
def sync_relationship_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The management listing for one caller's outgoing relationships
    (``list_sync_relationships`` + ``filter_relationships``,
    sync.rs:955-975): Detached stubs are hidden exactly like removed
    relationships (sync.rs:901-907), the catalog filters to the
    caller's own records, and rows stream in keyspace order
    (bucket, id). One metadata-sized scan; the state → (state,
    failure_reason) response mapping is pure column algebra."""
    rels = load_sync_relationships(spark, sf_dir)
    return (
        rels.filter(
            (F.col("state") != "detached")
            & (F.col("created_by") == LIST_USER)
        )
        .drop("created_by")
        .orderBy("source_bucket", "relationship_id")
    )


def load_repair_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SYNC_MIRROR_REPAIR keyspace at the drain tick: records for
    live relationships (k%5 ∈ {0,1,2}) plus ORPHAN records whose OUT
    relationship is gone (k%4==3 lane) — the NotFound path the
    Reconcile intent must resolve by deleting the stale mirror."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    staged = c.filter(
        ((k % 4 == 1) & (k % 5).isin(0, 1, 2))
        | ((k % 4 == 3) & (k % 5 == 1))
    )
    return staged.select(
        k.alias("relationship_id"),
        F.when(k % 11 == 4, "delete").otherwise("reconcile").alias(
            "intent"
        ),
        F.when(k % 9 == 5, k + 80_000)
        .otherwise(k + 2_000)
        .cast("long")
        .alias("due_at_ms"),
        (k % 3).cast("int").alias("attempts"),
    )


_QUEUE_SQL = """
    repair_queue AS (
      SELECT c_custkey AS relationship_id,
             CASE WHEN c_custkey % 11 = 4 THEN 'delete'
                  ELSE 'reconcile' END AS intent,
             CAST(CASE WHEN c_custkey % 9 = 5 THEN c_custkey + 80000
                  ELSE c_custkey + 2000 END AS BIGINT) AS due_at_ms,
             CAST(c_custkey % 3 AS INT) AS attempts
      FROM customer
      WHERE (c_custkey % 4 = 1 AND c_custkey % 5 IN (0, 1, 2))
         OR (c_custkey % 4 = 3 AND c_custkey % 5 = 1)
    )
"""


def repair_drain_tick(
    queue: DataFrame,
    relationships: DataFrame,
    now_ms: int,
    fail: F.Column | None = None,
) -> DataFrame:
    """One mirror-repair drain batch (process_mirror_repairs,
    sync_mirror_repair.rs:368-409).

    The due page is the first REPAIR_BATCH_SIZE records in
    (due_at_ms, relationship_id) order — the reference scans the id-
    keyed keyspace then sorts due records by (due_at_ms, key) and
    truncates (rs:604-606). Each record resolves its action:

    - ``delete`` intent → ``delete_mirror`` (local records + mirror);
    - ``reconcile`` whose OUT record is missing or Detached →
      ``delete_mirror`` (never resurrect a stub, rs:512-521);
    - ``reconcile`` against a live record → ``ensure_mirror``.

    ``fail`` simulates a processing failure: the record reschedules
    with attempts+1 due at now + queue backoff (rs:625-646); success
    clears it. The envelope reports None (not 0) for next_due when
    more work is due — the drain kicks itself instead of the timer
    (rs:400-405)."""
    page = due_page(
        queue,
        now_ms,
        REPAIR_BATCH_SIZE,
        [F.col("due_at_ms"), F.col("relationship_id")],
    )
    out_state = relationships.select(
        "relationship_id", F.col("state").alias("__state")
    )
    resolved = page.join(F.broadcast(out_state), "relationship_id", "left")
    failing = fail if fail is not None else F.lit(False)
    action = (
        F.when(F.col("intent") == "delete", "delete_mirror")
        .when(
            F.col("__state").isNull() | (F.col("__state") == "detached"),
            "delete_mirror",
        )
        .otherwise("ensure_mirror")
    )
    bumped = F.col("attempts") + 1
    envelope = drain_envelope(
        queue, now_ms, REPAIR_BATCH_SIZE, zero_when_more=False
    )
    return resolved.select(
        "relationship_id",
        "intent",
        "attempts",
        action.alias("action"),
        F.when(failing, "rescheduled").otherwise("cleared").alias(
            "result"
        ),
        F.when(failing, bumped).cast("int").alias("next_attempts"),
        F.when(failing, F.lit(now_ms) + backoff_ms(bumped))
        .cast("long")
        .alias("next_due_at_ms"),
    ).crossJoin(F.broadcast(envelope))


@register(
    "sync_mirror_repair_drain",
    oracle=f"""
    WITH {_RELS_SQL}, {_QUEUE_SQL},
    due AS (
      SELECT *, row_number() OVER (ORDER BY due_at_ms, relationship_id)
               AS rn
      FROM repair_queue WHERE due_at_ms <= {NOW_MS}
    ),
    page AS (SELECT * FROM due WHERE rn <= {REPAIR_BATCH_SIZE}),
    env AS (
      SELECT (SELECT COUNT(*) FROM (
                SELECT 1 FROM repair_queue WHERE due_at_ms <= {NOW_MS}
                LIMIT {REPAIR_BATCH_SIZE + 1}))
               > {REPAIR_BATCH_SIZE} AS has_more_due
    )
    SELECT p.relationship_id, p.intent, p.attempts,
           CASE WHEN p.intent = 'delete' THEN 'delete_mirror'
                WHEN r.relationship_id IS NULL OR r.state = 'detached'
                  THEN 'delete_mirror'
                ELSE 'ensure_mirror' END AS action,
           CASE WHEN p.relationship_id % 13 = 6 THEN 'rescheduled'
                ELSE 'cleared' END AS result,
           CAST(CASE WHEN p.relationship_id % 13 = 6
                     THEN p.attempts + 1 END AS INT) AS next_attempts,
           CAST(CASE WHEN p.relationship_id % 13 = 6
                     THEN {NOW_MS} + LEAST(
                       250 * (1 << LEAST(p.attempts + 1, 7)), 30000)
                END AS BIGINT) AS next_due_at_ms,
           e.has_more_due,
           CAST(CASE WHEN e.has_more_due THEN NULL
                ELSE (SELECT MIN(due_at_ms) - {NOW_MS} FROM repair_queue
                      WHERE due_at_ms > {NOW_MS}) END AS BIGINT)
             AS next_due_after_ms
    FROM page p
    LEFT JOIN rels r USING (relationship_id)
    CROSS JOIN env e
    """,
)
def sync_mirror_repair_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One drain tick over the fixture repair queue; processing fails
    for relationship_id % 13 == 6 (odd mod, coprime to every lane).
    See :func:`repair_drain_tick` for the operator."""
    return repair_drain_tick(
        load_repair_queue(spark, sf_dir),
        load_sync_relationships(spark, sf_dir),
        NOW_MS,
        fail=F.col("relationship_id") % 13 == 6,
    )


def load_create_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create-route requests: mostly exact duplicates of stored
    tuples, with lanes for an empty target bucket (k%13==5), a
    source==target request (k%13==7 — the source node is the local
    ``node1``), and fresh targets (k%13 ∈ {9,11})."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 4 == 1
    )
    k = F.col("c_custkey")
    src_bucket = F.concat(F.lit("bkt"), (k % 3).cast("string"))
    src_prefix = F.when(
        (k % 9).isin(4, 7),
        F.concat(F.lit("p"), (k % 5).cast("string"), F.lit("/")),
    )
    mode = (
        F.when(k % 11 <= 3, "once")
        .when(k % 11 <= 7, "continuous")
        .otherwise("reference")
    )
    return c.select(
        k.alias("request_id"),
        src_bucket.alias("source_bucket"),
        src_prefix.alias("source_prefix"),
        F.when(k % 13 == 7, "node1")
        .otherwise(F.concat(F.lit("node"), (k % 7).cast("string")))
        .alias("target_node"),
        F.when(k % 13 == 5, "")
        .when(k % 13 == 7, src_bucket)
        .when(
            (k % 13).isin(9, 11),
            F.concat(F.lit("fresh"), (k % 5).cast("string")),
        )
        .otherwise(F.concat(F.lit("tgt"), (k % 5).cast("string")))
        .alias("target_bucket"),
        F.when(k % 13 == 7, src_prefix).alias("target_prefix"),
        mode.alias("mode"),
        F.when(k % 9 < 4, "materialize")
        .when(k % 9 < 7, "skip")
        .otherwise("preserve")
        .alias("req_handling"),
    )


_REQS_SQL = """
    reqs AS (
      SELECT c_custkey AS request_id,
             'bkt' || (c_custkey % 3) AS source_bucket,
             CASE WHEN c_custkey % 9 IN (4, 7)
                  THEN 'p' || (c_custkey % 5) || '/' END AS source_prefix,
             CASE WHEN c_custkey % 13 = 7 THEN 'node1'
                  ELSE 'node' || (c_custkey % 7) END AS target_node,
             CASE WHEN c_custkey % 13 = 5 THEN ''
                  WHEN c_custkey % 13 = 7 THEN 'bkt' || (c_custkey % 3)
                  WHEN c_custkey % 13 IN (9, 11)
                    THEN 'fresh' || (c_custkey % 5)
                  ELSE 'tgt' || (c_custkey % 5) END AS target_bucket,
             CASE WHEN c_custkey % 13 = 7 AND c_custkey % 9 IN (4, 7)
                  THEN 'p' || (c_custkey % 5) || '/' END AS target_prefix,
             CASE WHEN c_custkey % 11 <= 3 THEN 'once'
                  WHEN c_custkey % 11 <= 7 THEN 'continuous'
                  ELSE 'reference' END AS mode,
             CASE WHEN c_custkey % 9 < 4 THEN 'materialize'
                  WHEN c_custkey % 9 < 7 THEN 'skip'
                  ELSE 'preserve' END AS req_handling
      FROM customer WHERE c_custkey % 4 = 1
    )
"""


@register(
    "sync_create_validate",
    oracle=f"""
    WITH {_RELS_SQL}, {_REQS_SQL},
    staged AS (
      SELECT q.*,
             EXISTS (
               SELECT 1 FROM rels r
               WHERE r.state <> 'detached'
                 AND r.source_bucket = q.source_bucket
                 AND r.source_prefix IS NOT DISTINCT FROM q.source_prefix
                 AND r.target_node = q.target_node
                 AND r.target_bucket = q.target_bucket
                 AND r.mode = q.mode
             ) AS dup
      FROM reqs q
    )
    SELECT request_id,
           CASE WHEN target_bucket = '' THEN 'bad_endpoint'
                WHEN target_node = 'node1'
                     AND target_bucket = source_bucket
                     AND target_prefix IS NOT DISTINCT FROM source_prefix
                  THEN 'same_endpoint'
                WHEN dup THEN 'duplicate'
                ELSE 'accepted' END AS outcome,
           CASE WHEN target_bucket <> ''
                 AND NOT (target_node = 'node1'
                          AND target_bucket = source_bucket
                          AND target_prefix IS NOT DISTINCT FROM
                              source_prefix)
                 AND NOT dup
                THEN CASE WHEN mode = 'reference' THEN 'preserve'
                          ELSE req_handling END
           END AS reference_handling,
           CASE WHEN target_bucket <> ''
                 AND NOT (target_node = 'node1'
                          AND target_bucket = source_bucket
                          AND target_prefix IS NOT DISTINCT FROM
                              source_prefix)
                 AND NOT dup
                THEN (CASE WHEN mode = 'reference' THEN 'preserve'
                           ELSE req_handling END) = 'preserve'
           END AS reference_serving
    FROM staged
    """,
)
def sync_create_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The create route's validation ladder in check order
    (sync.rs:249-306): an endpoint that cannot build a canonical S3
    ARN (empty bucket) rejects first, then source == target (full ARN
    equality — node, bucket, prefix), then the duplicate scan against
    the existing NON-Detached catalog on (source, target, mode) —
    detached stubs never block re-creating the same relationship
    (sync_relationship.rs:168-174). Accepted requests carry the
    coerced reference handling: Reference mode forces Preserve, and
    serving capability follows Preserve (sync.rs:283-289).

    The duplicate scan is a broadcast left-semi-style join with
    null-safe prefix equality — the catalog side is metadata-sized at
    any corpus scale."""
    return validate_sync_creates(
        load_create_requests(spark, sf_dir),
        load_sync_relationships(spark, sf_dir),
    )


def validate_sync_creates(reqs: DataFrame, rels: DataFrame) -> DataFrame:
    """The ladder itself over ANY request/catalog relations — the
    registered query instantiates it on the fixtures, and the
    hypothesis property drives the SAME code over generated pairs
    against a literal port of the route."""
    existing = rels.filter(F.col("state") != "detached").select(
        F.col("source_bucket").alias("__sb"),
        F.col("source_prefix").alias("__sp"),
        F.col("target_node").alias("__tn"),
        F.col("target_bucket").alias("__tb"),
        F.col("mode").alias("__m"),
        F.lit(True).alias("__dup"),
    ).distinct()
    joined = reqs.join(
        F.broadcast(existing),
        (F.col("source_bucket") == F.col("__sb"))
        & F.col("source_prefix").eqNullSafe(F.col("__sp"))
        & (F.col("target_node") == F.col("__tn"))
        & (F.col("target_bucket") == F.col("__tb"))
        & (F.col("mode") == F.col("__m")),
        "left",
    )
    same = (
        (F.col("target_node") == "node1")
        & (F.col("target_bucket") == F.col("source_bucket"))
        & F.col("target_prefix").eqNullSafe(F.col("source_prefix"))
    )
    outcome = (
        F.when(F.col("target_bucket") == "", "bad_endpoint")
        .when(same, "same_endpoint")
        .when(F.col("__dup").isNotNull(), "duplicate")
        .otherwise("accepted")
    )
    coerced = F.when(F.col("mode") == "reference", "preserve").otherwise(
        F.col("req_handling")
    )
    accepted = outcome == "accepted"
    return joined.select(
        "request_id",
        outcome.alias("outcome"),
        F.when(accepted, coerced).alias("reference_handling"),
        F.when(accepted, coerced == "preserve").alias(
            "reference_serving"
        ),
    )


# ================================================= legacy sync migration
# One-time migration of legacy bucket-replication configs into sync
# relationships (``operations/src/replication/migration.rs:52-207``) —
# the last unmodeled query-shaped plane from VERDICT r9's missing
# list. The classification per legacy target, in reference order:
#
# 1. the source bucket is read from the bucket catalog — missing
#    bucket fails ALL of that config's targets (rs:70-75);
# 2. a workspace (``ws-``) source fails them too (rs:76-86 — the ARN
#    builds, then the ws guard rejects);
# 3. the target must build a canonical same-realm S3 ARN: a foreign
#    realm, a ``ws-`` target bucket, a stored ARN string that does not
#    round-trip to the same ARN, or target == source each fail THAT
#    target (rs:97-119);
# 4. an existing outgoing relationship with the same (source, target,
#    Continuous) — or the deterministic legacy id, which hashes that
#    same tuple (rs:209-219, blake3 over source||NUL||target; sha256
#    + '|' stand-in here) — skips the target idempotently, ANY state
#    including Detached (rs:122-131; unlike the create route, the
#    migration does not exempt detached stubs);
# 5. everything else migrates: a Continuous relationship with the
#    deterministic id, replicate_deletes from the legacy flag,
#    created_by/at from the bucket record (rs:133-145).
#
# ``marks_complete`` mirrors rs:205-207: the completion marker writes
# only when NOTHING failed, so a rerun retries the failures.
#
# Fixture (orders % 29 == 3; discriminators 9, 17, 19, 23 coprime to
# 29): missing-bucket lane k%17==2, ws-source k%19==0, target lanes
# k%9 (0 foreign realm, 1 ws target, 2 ARN mismatch, 3 self-target),
# forced-skip lane k%23 ∈ {11,17} pins the target tuple to catalog
# row customer 5 — k%4==1, k%9==5 (NO source prefix, so it passes the
# duplicate scan's prefix-null filter), k%11==5 (continuous), present
# at every sf: source bkt2 (5%3), target node5 (5%7) / tgt0 (5%5).

MIGRATION_PAGE_SIZE = 128  # migration.rs:26


def load_legacy_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 29 == 3
    )
    k = F.col("o_orderkey")
    forced = (k % 23).isin(11, 17)
    bucket = (
        F.when(k % 17 == 2, F.concat(F.lit("gone"), (k % 3).cast("string")))
        .when(k % 19 == 0, "ws-stage")
        .when(forced, "bkt2")
        .otherwise(F.concat(F.lit("bkt"), (k % 3).cast("string")))
    )
    return o.select(
        k.alias("legacy_id"),
        bucket.alias("bucket"),
        F.when(forced, "realmA")
        .when(k % 9 == 0, "realmB")
        .otherwise("realmA")
        .alias("target_realm"),
        F.when(forced, "node5")
        .when(k % 9 == 3, "node1")
        .otherwise(F.concat(F.lit("node"), (k % 7).cast("string")))
        .alias("target_node"),
        F.when(forced, "tgt0")
        .when(k % 9 == 1, "ws-mirror")
        .when(k % 9 == 3, bucket)
        .otherwise(F.concat(F.lit("tgt"), (k % 5).cast("string")))
        .alias("target_bucket"),
        (forced | (k % 9 != 2)).alias("arn_roundtrips"),
        (k % 2 == 0).alias("replicate_delete_markers"),
    )


_LEGACY_SQL = """
    legacy AS (
      SELECT o_orderkey AS legacy_id,
             CASE WHEN o_orderkey % 17 = 2 THEN 'gone' || (o_orderkey % 3)
                  WHEN o_orderkey % 19 = 0 THEN 'ws-stage'
                  WHEN o_orderkey % 23 IN (11, 17) THEN 'bkt2'
                  ELSE 'bkt' || (o_orderkey % 3) END AS bucket,
             CASE WHEN o_orderkey % 23 IN (11, 17) THEN 'realmA'
                  WHEN o_orderkey % 9 = 0 THEN 'realmB'
                  ELSE 'realmA' END AS target_realm,
             CASE WHEN o_orderkey % 23 IN (11, 17) THEN 'node5'
                  WHEN o_orderkey % 9 = 3 THEN 'node1'
                  ELSE 'node' || (o_orderkey % 7) END AS target_node,
             CASE WHEN o_orderkey % 23 IN (11, 17) THEN 'tgt0'
                  WHEN o_orderkey % 9 = 1 THEN 'ws-mirror'
                  WHEN o_orderkey % 9 = 3 THEN
                    CASE WHEN o_orderkey % 17 = 2
                           THEN 'gone' || (o_orderkey % 3)
                         WHEN o_orderkey % 19 = 0 THEN 'ws-stage'
                         ELSE 'bkt' || (o_orderkey % 3) END
                  ELSE 'tgt' || (o_orderkey % 5) END AS target_bucket,
             (o_orderkey % 23 IN (11, 17) OR o_orderkey % 9 <> 2)
               AS arn_roundtrips,
             o_orderkey % 2 = 0 AS replicate_delete_markers
      FROM orders WHERE o_orderkey % 29 = 3
    ),
    bucket_catalog AS (
      SELECT * FROM (VALUES
        ('bkt0', 'user-a'), ('bkt1', 'user-b'), ('bkt2', 'user-c'),
        ('ws-stage', 'user-w')) AS t(name, created_by)
    )
"""


@register(
    "sync_legacy_migration",
    oracle=f"""
    WITH {_RELS_SQL}, {_LEGACY_SQL},
    staged AS (
      SELECT l.*, b.created_by AS bucket_owner,
             CASE WHEN b.name IS NULL THEN 'bucket_missing'
                  WHEN starts_with(l.bucket, 'ws-') THEN 'ws_source'
                  WHEN l.target_realm <> 'realmA'
                    OR starts_with(l.target_bucket, 'ws-')
                    OR NOT l.arn_roundtrips
                    OR (l.target_node = 'node1'
                        AND l.target_bucket = l.bucket)
                    THEN 'invalid_target'
                  WHEN EXISTS (
                    SELECT 1 FROM rels r
                    WHERE r.mode = 'continuous'
                      AND r.source_bucket = l.bucket
                      AND r.source_prefix IS NULL
                      AND r.target_node = l.target_node
                      AND r.target_bucket = l.target_bucket
                  ) THEN 'skipped'
                  ELSE 'migrated' END AS cls
      FROM legacy l
      LEFT JOIN bucket_catalog b ON b.name = l.bucket
    ),
    summary AS (
      SELECT CAST(SUM(CASE WHEN cls = 'migrated' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_migrated,
             CAST(SUM(CASE WHEN cls = 'skipped' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_skipped,
             CAST(SUM(CASE WHEN cls NOT IN ('migrated', 'skipped')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
      FROM staged
    )
    SELECT s.legacy_id, s.bucket, s.target_node, s.target_bucket,
           CASE WHEN s.cls IN ('migrated', 'skipped') THEN s.cls
                ELSE 'failed' END AS outcome,
           CASE WHEN s.cls NOT IN ('migrated', 'skipped') THEN s.cls
           END AS reason,
           CASE WHEN s.cls = 'migrated' THEN substring(sha256(
             'aruna:legacy-s3-sync:v1|arn:aruna:realmA:node1:s3/'
             || s.bucket || '|arn:aruna:realmA:' || s.target_node
             || ':s3/' || s.target_bucket), 1, 26)
           END AS relationship_id,
           CASE WHEN s.cls = 'migrated' THEN 'continuous'
           END AS mode,
           CASE WHEN s.cls = 'migrated' THEN s.replicate_delete_markers
           END AS replicate_deletes,
           CASE WHEN s.cls = 'migrated' THEN s.bucket_owner
           END AS created_by,
           m.n_migrated, m.n_skipped, m.n_failed,
           m.n_failed = 0 AS marks_complete
    FROM staged s CROSS JOIN summary m
    """,
)
def sync_legacy_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The legacy replication configs through the migration
    classification (see the section comment). The bucket catalog and
    the existing-relationship catalog are broadcast sides; the summary
    is one crossJoined 1-row aggregate; ``marks_complete`` is the
    failed==0 completion-marker gate (rs:205-207)."""
    catalog = spark.createDataFrame(
        [("bkt0", "user-a"), ("bkt1", "user-b"), ("bkt2", "user-c"),
         ("ws-stage", "user-w")],
        "name string, created_by string",
    )
    return classify_legacy_targets(
        load_legacy_targets(spark, sf_dir),
        catalog,
        load_sync_relationships(spark, sf_dir),
    )


def classify_legacy_targets(
    legacy: DataFrame, catalog: DataFrame, rels: DataFrame
) -> DataFrame:
    """The classification itself over ANY (targets, bucket catalog,
    relationship catalog) — the registered query instantiates it on
    the fixtures, and the hypothesis property drives the SAME code
    over generated inputs against a literal port of migration.rs."""
    existing = (
        rels
        .filter(
            (F.col("mode") == "continuous")
            & F.col("source_prefix").isNull()
        )
        .select(
            F.col("source_bucket").alias("__sb"),
            F.col("target_node").alias("__tn"),
            F.col("target_bucket").alias("__tb"),
            F.lit(True).alias("__exists"),
        )
        .distinct()
    )
    staged = (
        legacy.join(
            F.broadcast(catalog.withColumnRenamed("name", "bucket")),
            "bucket",
            "left",
        )
        .withColumnRenamed("created_by", "bucket_owner")
        .join(
            F.broadcast(existing),
            (F.col("bucket") == F.col("__sb"))
            & (F.col("target_node") == F.col("__tn"))
            & (F.col("target_bucket") == F.col("__tb")),
            "left",
        )
    )
    invalid_target = (
        (F.col("target_realm") != "realmA")
        | F.col("target_bucket").startswith("ws-")
        | ~F.col("arn_roundtrips")
        | (
            (F.col("target_node") == "node1")
            & (F.col("target_bucket") == F.col("bucket"))
        )
    )
    cls = (
        F.when(F.col("bucket_owner").isNull(), "bucket_missing")
        .when(F.col("bucket").startswith("ws-"), "ws_source")
        .when(invalid_target, "invalid_target")
        .when(F.col("__exists").isNotNull(), "skipped")
        .otherwise("migrated")
    )
    staged = staged.withColumn("__cls", cls)
    migrated = F.col("__cls") == "migrated"
    rel_id = F.substring(
        F.sha2(
            F.concat(
                F.lit("aruna:legacy-s3-sync:v1|arn:aruna:realmA:node1:s3/"),
                F.col("bucket"),
                F.lit("|arn:aruna:realmA:"),
                F.col("target_node"),
                F.lit(":s3/"),
                F.col("target_bucket"),
            ),
            256,
        ),
        1,
        26,
    )
    summary = staged.agg(
        F.sum(migrated.cast("long")).alias("n_migrated"),
        F.sum((F.col("__cls") == "skipped").cast("long")).alias(
            "n_skipped"
        ),
        F.sum(
            (~F.col("__cls").isin("migrated", "skipped")).cast("long")
        ).alias("n_failed"),
    )
    return staged.select(
        "legacy_id",
        "bucket",
        "target_node",
        "target_bucket",
        F.when(
            F.col("__cls").isin("migrated", "skipped"), F.col("__cls")
        )
        .otherwise("failed")
        .alias("outcome"),
        F.when(
            ~F.col("__cls").isin("migrated", "skipped"), F.col("__cls")
        ).alias("reason"),
        F.when(migrated, rel_id).alias("relationship_id"),
        F.when(migrated, "continuous").alias("mode"),
        F.when(migrated, F.col("replicate_delete_markers")).alias(
            "replicate_deletes"
        ),
        F.when(migrated, F.col("bucket_owner")).alias("created_by"),
    ).crossJoin(
        F.broadcast(
            summary.select(
                "n_migrated",
                "n_skipped",
                "n_failed",
                (F.col("n_failed") == 0).alias("marks_complete"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Native reference serving — the source-side request ladder
# ---------------------------------------------------------------------------

# Buckets registered in the serving node's bucket catalog; 'bkt2'
# relationships exist but the bucket record is gone — the NotFound
# rung AFTER validate passes (native_reference.rs:326-340).
NATIVE_SERVE_BUCKETS = ("bkt0", "bkt1")


@register(
    "native_reference_serve",
    oracle=f"""
    WITH {_RELS_SQL},
    requests AS (
      SELECT c_custkey AS request_id,
             c_custkey AS relationship_id,
             c_custkey % 3 = 0 AS head,
             'node' || (CASE WHEN c_custkey % 23 = 7
                             THEN (c_custkey + 1) % 7
                             ELSE c_custkey % 7 END) AS peer,
             'bkt' || (CASE WHEN c_custkey % 23 = 11
                            THEN (c_custkey + 1) % 3
                            ELSE c_custkey % 3 END) AS bucket,
             CASE WHEN c_custkey % 23 = 15 THEN 'zz-' || c_custkey
                  WHEN c_custkey % 9 IN (4, 7)
                    THEN 'p' || (c_custkey % 5) || '/obj-' || c_custkey
                  ELSE 'obj-' || c_custkey END AS key
      FROM customer WHERE c_custkey % 4 IN (1, 3)
    ),
    laddered AS (
      SELECT q.request_id, q.head, q.peer, q.bucket, q.key,
             CASE
               WHEN r.relationship_id IS NULL THEN 'relationship'
               WHEN NOT r.reference_serving
                    OR r.state NOT IN ('enabled', 'detached')
                    OR r.target_node <> q.peer
                    OR r.source_bucket <> q.bucket
                    OR NOT (r.source_prefix IS NULL
                            OR starts_with(q.key, r.source_prefix))
                 THEN 'validate'
               WHEN q.bucket NOT IN ('bkt0', 'bkt1') THEN 'bucket'
               WHEN q.request_id % 17 = 3 THEN 'permission'
               WHEN q.request_id % 19 IN (5, 6) THEN 'object'
             END AS reject_stage
      FROM requests q
      LEFT JOIN rels r ON r.relationship_id = q.relationship_id
    )
    SELECT request_id, head, peer, bucket, key, reject_stage,
           CASE reject_stage
             WHEN 'relationship' THEN 'access_denied'
             WHEN 'validate' THEN 'access_denied'
             WHEN 'bucket' THEN 'not_found'
             WHEN 'permission' THEN 'access_denied'
             WHEN 'object' THEN 'not_found'
             ELSE 'content' END AS verdict
    FROM laddered
    """,
)
def native_reference_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source node's native-reference request ladder
    (``prepare_reference`` + ``validate_relationship``,
    native_reference.rs:313-440):

    1. relationship lookup — a MISSING relationship maps to
       AccessDenied, not NotFound (``map_relationship_error``,
       rs:441-446: existence must not leak through the reject);
    2. ``validate_relationship`` (rs:414-440) — must serve references
       (``reference_serving``), state Enabled OR Detached (a detached
       stub keeps serving the reference records the target retained —
       every other non-enabled state refuses), the requesting peer is
       the relationship's target node, the requested bucket is the
       relationship's source bucket, and the key passes the optional
       source prefix gate (``is_none_or(starts_with)``); the source
       realm/node equalities hold by construction here — the OUT
       keyspace only stores relationships the serving node owns;
    3. the bucket-info lookup — NotFound once validate passed
       (rs:326-340);
    4. the permission check at ``blob_object_permission_path`` with
       READ — denial also marks the relationship AccessDenied-failed
       (rs:341-364, the ``mark_access_denied`` side effect is the
       catalog update, not modeled in this projection);
    5. head/get — NoSuchKey / NoSuchVersion / DeleteMarker all map to
       NotFound (``map_get_error``/``map_head_error``, rs:447-475);
       both verbs share the reject mapping, so ``head`` only selects
       the verb.

    The relationship catalog is metadata-sized → broadcast build side;
    the ladder is one CASE chain over the joined row, exercised by
    mismatch lanes on every rung (missing rel, wrong peer, wrong
    bucket, prefix violation, missing bucket record via the ``bkt2``
    family, permission, object)."""
    k = F.col("c_custkey")
    requests = (
        load_table(spark, sf_dir, "customer")
        .filter((k % 4).isin(1, 3))
        .select(
            k.alias("request_id"),
            k.alias("relationship_id"),
            (k % 3 == 0).alias("head"),
            F.concat(
                F.lit("node"),
                F.when(k % 23 == 7, (k + 1) % 7)
                .otherwise(k % 7)
                .cast("string"),
            ).alias("peer"),
            F.concat(
                F.lit("bkt"),
                F.when(k % 23 == 11, (k + 1) % 3)
                .otherwise(k % 3)
                .cast("string"),
            ).alias("bucket"),
            F.when(k % 23 == 15, F.concat(F.lit("zz-"), k.cast("string")))
            .when(
                (k % 9).isin(4, 7),
                F.concat(
                    F.lit("p"),
                    (k % 5).cast("string"),
                    F.lit("/obj-"),
                    k.cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("obj-"), k.cast("string")))
            .alias("key"),
        )
    )
    rels = load_sync_relationships(spark, sf_dir).select(
        "relationship_id",
        "source_bucket",
        "source_prefix",
        "target_node",
        "reference_serving",
        "state",
    )
    joined = requests.join(F.broadcast(rels), "relationship_id", "left")
    validate_ok = (
        F.col("reference_serving")
        & F.col("state").isin("enabled", "detached")
        & (F.col("target_node") == F.col("peer"))
        & (F.col("source_bucket") == F.col("bucket"))
        & (
            F.col("source_prefix").isNull()
            | F.col("key").startswith(F.col("source_prefix"))
        )
    )
    stage = (
        F.when(F.col("source_bucket").isNull(), "relationship")
        .when(~validate_ok, "validate")
        .when(~F.col("bucket").isin(*NATIVE_SERVE_BUCKETS), "bucket")
        .when(F.col("request_id") % 17 == 3, "permission")
        .when((F.col("request_id") % 19).isin(5, 6), "object")
    )
    return joined.select(
        "request_id",
        "head",
        "peer",
        "bucket",
        "key",
        stage.alias("reject_stage"),
        F.when(stage.isin("relationship", "validate", "permission"),
               "access_denied")
        .when(stage.isin("bucket", "object"), "not_found")
        .otherwise("content")
        .alias("verdict"),
    )
