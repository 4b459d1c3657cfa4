"""Blob-replication job queue: identity-keyed dedup, the due-batch
drain, and the re-arm envelope (``operations/src/replication/
queue.rs``).

Reference surface:

- ``queue.rs:52-65`` — ``BlobReplicationJobRecord { input(mode,
  bucket, target, target_node_id), source_delete_marker, due_at_ms,
  attempts, last_error, relationship_id, enqueued_at_ms, ... }``.
- ``queue.rs:374-388`` — the storage key is the job's IDENTITY
  (mode, bucket, target, target_node_id, source_delete_marker,
  relationship_id, origin, upstream_sources) postcard-serialized —
  the queue dedups by identity, not by time; due_at lives in the
  VALUE, so the drain scans the whole keyspace.
- ``queue.rs:400-405`` (``blob_replication_job_preferred``) — among
  records with one identity the winner is the strictly greater
  ``(attempts, due_at_ms)`` tuple; the scan repairs losers away
  (rs:1983-2009: the preferred record is rewritten at its canonical
  key, every other copy deleted).
- ``queue.rs:1916-2034`` (``scan_due_blob_replication_jobs``) — walk
  key order in 512-key pages; collect due jobs (``due_at_ms <= now``)
  up to the batch limit — hitting the limit returns early with
  ``has_more_due = true``; future jobs fold into ``next_due_at_ms``
  (min) instead of the batch.
- ``queue.rs:1258-1328`` (``process_blob_replication_batch``) — batch
  limit REPLICATION_BATCH_SIZE = 64 (rs:44); per job: Succeeded and
  TerminalFailure both delete; a retriable error RESCHEDULES at
  ``now + queue_retry_after_ms(attempts+1)`` with ``attempts+1``
  (rs:2160-2196), and the retry due feeds the ``next_due_at`` min;
  the result envelope reports ``next_due_after = None`` when
  ``has_more_due`` (the drain timer re-kicks immediately), else the
  gap to the next maturing job (rs:2318-2328 equivalent block).

Spark mapping: the keyspace is a relation; identity dedup is a
groupBy-argmax (the reference's per-job duplicate rescan is an O(n²)
self-repair loop — relationally it is ONE shuffle on the identity
key); the scan position is a partitioned two-level rank
(:func:`aruna_spark.ops.ordering.global_scan_pos`), the batch cut a
BOUNDED 64-key TakeOrderedAndProject head over the due survivors,
never an unpartitioned window; the drain result is two 1-row
aggregates. Key order: postcard serializes the identity fields
in struct order, so (mode, bucket, target, target_node, delete-marker
byte, relationship id) is the modeled canonical-key sort — the exact
varint byte order is not reproduced, only its field significance.

Fixture (orders ``% 16 == 3``, NOW = 60 000): mode k%3, bucket k%7,
target k%11, node k%5, delete-marker lane k%9 (0 true / 1 false /
else absent), relationship id k%13 (relationship mode only), due
52 000 + (k%19)·1000 (due iff k%19 ≤ 8), attempts k%6, outcome lane
k%29 (<10 succeeded, <20 terminal failure, else retriable error).
Rows ``k % 21 == 10`` carry an identity DUPLICATE (job_id k+1) at
``due ± 700`` (k%35 decides the sign), so both preferred directions
populate. A second drain clock EARLY_NOW = 52 500 exercises the
uncapped envelope branch (due count < 64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.ordering import global_scan_pos
from aruna_spark.ops.queue_drain import backoff_ms
from aruna_spark.queries import register

REPLICATION_SCAN_PAGE_SIZE = 512  # queue.rs:43
REPLICATION_BATCH_SIZE = 64  # queue.rs:44
NOW_MS = 60_000
EARLY_NOW_MS = 52_500

_IDENTITY = ["mode", "bucket", "target", "target_node", "dm_key", "rel_key"]

_BLOB_JOBS_RAW_SQL = """
    blob_base AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 16 = 3
    ),
    blob_jobs_raw AS (
      SELECT CAST(k AS BIGINT) AS job_id,
             FALSE AS is_dup,
             CASE k % 3 WHEN 0 THEN 'on_demand'
                  WHEN 1 THEN 'relationship' ELSE 'live' END AS mode,
             'b' || (k % 7) AS bucket,
             'arn:' || (k % 11) AS target,
             'node' || (k % 5) AS target_node,
             CASE k % 9 WHEN 0 THEN 't' WHEN 1 THEN 'f' ELSE 'n' END
               AS dm_key,
             CASE WHEN k % 3 = 1 THEN 'rel-' || (k % 13) ELSE '' END
               AS rel_key,
             CAST(52000 + (k % 19) * 1000 AS BIGINT) AS due_at_ms,
             CAST(k % 6 AS INT) AS attempts,
             CAST(50000 + (k % 23) * 100 AS BIGINT) AS enqueued_at_ms,
             CASE WHEN k % 6 > 0 THEN 'e' || (k % 6) END AS last_error,
             k % 29 AS outcome_lane
      FROM blob_base
      UNION ALL
      SELECT CAST(k + 1 AS BIGINT), TRUE,
             CASE k % 3 WHEN 0 THEN 'on_demand'
                  WHEN 1 THEN 'relationship' ELSE 'live' END,
             'b' || (k % 7), 'arn:' || (k % 11), 'node' || (k % 5),
             CASE k % 9 WHEN 0 THEN 't' WHEN 1 THEN 'f' ELSE 'n' END,
             CASE WHEN k % 3 = 1 THEN 'rel-' || (k % 13) ELSE '' END,
             CAST(52000 + (k % 19) * 1000
                  + CASE WHEN k % 35 < 17 THEN 700 ELSE -700 END
                  AS BIGINT),
             CAST(k % 6 AS INT),
             CAST(50000 + (k % 23) * 100 + 60 AS BIGINT),
             CASE WHEN k % 6 > 0 THEN 'e' || (k % 6) END,
             k % 29
      FROM blob_base WHERE k % 21 = 10
    )
"""


def load_blob_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLOB_REPLICATION_JOB keyspace as stored — including the
    identity-duplicate rows the scan will repair away
    (queue.rs:1983-2009)."""
    k = F.col("k")
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 16 == 3)
        .select(F.col("o_orderkey").alias("k"))
    )

    def record(
        job_id: Column, is_dup: bool, due: Column, enq: Column
    ) -> list[Column]:
        return [
            job_id.cast("long").alias("job_id"),
            F.lit(is_dup).alias("is_dup"),
            F.when(k % 3 == 0, "on_demand")
            .when(k % 3 == 1, "relationship")
            .otherwise("live")
            .alias("mode"),
            F.concat(F.lit("b"), (k % 7).cast("string")).alias("bucket"),
            F.concat(F.lit("arn:"), (k % 11).cast("string")).alias(
                "target"
            ),
            F.concat(F.lit("node"), (k % 5).cast("string")).alias(
                "target_node"
            ),
            F.when(k % 9 == 0, "t")
            .when(k % 9 == 1, "f")
            .otherwise("n")
            .alias("dm_key"),
            F.when(
                k % 3 == 1,
                F.concat(F.lit("rel-"), (k % 13).cast("string")),
            )
            .otherwise("")
            .alias("rel_key"),
            due.cast("long").alias("due_at_ms"),
            (k % 6).cast("int").alias("attempts"),
            enq.cast("long").alias("enqueued_at_ms"),
            F.when(
                k % 6 > 0, F.concat(F.lit("e"), (k % 6).cast("string"))
            ).alias("last_error"),
            (k % 29).alias("outcome_lane"),
        ]

    due = F.lit(52_000) + (k % 19) * 1_000
    enq = F.lit(50_000) + (k % 23) * 100
    dup_due = due + F.when(k % 35 < 17, 700).otherwise(-700)
    return base.select(*record(k, False, due, enq)).unionByName(
        base.filter(k % 21 == 10).select(
            *record(k + 1, True, dup_due, enq + 60)
        )
    )


def survivors(jobs: DataFrame) -> DataFrame:
    """Identity dedup: the strictly greater ``(attempts, due_at_ms)``
    record wins (queue.rs:400-405); every other copy of the identity
    is repaired away. One identity-partitioned window — a single
    shuffle on the identity key, no per-job rescan loop. ``job_id``
    breaks exact ties deterministically (the fixture never produces
    one; the reference keeps the incumbent)."""
    w = Window.partitionBy(*_IDENTITY).orderBy(
        F.col("attempts").desc(),
        F.col("due_at_ms").desc(),
        F.col("job_id").desc(),
    )
    return jobs.withColumn(
        "is_preferred", F.row_number().over(w) == 1
    )


@register(
    "blob_replication_drain_plan",
    oracle=f"""
    WITH {_BLOB_JOBS_RAW_SQL.strip()},
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY mode, bucket, target, target_node, dm_key,
                            rel_key
               ORDER BY attempts DESC, due_at_ms DESC, job_id DESC
             ) = 1 AS is_preferred
      FROM blob_jobs_raw
    ),
    pos AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (
               ORDER BY mode, bucket, target, target_node, dm_key,
                        rel_key) AS BIGINT) AS scan_pos,
             CASE WHEN due_at_ms <= {NOW_MS} THEN
               ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN due_at_ms <= {NOW_MS}
                              THEN 1 ELSE 0 END
                 ORDER BY mode, bucket, target, target_node, dm_key,
                          rel_key)
             END AS due_pos
      FROM ranked WHERE is_preferred
    ),
    classified AS (
      SELECT job_id, is_dup, mode, bucket, target, target_node,
             attempts, due_at_ms, scan_pos,
             CASE
               WHEN due_at_ms > {NOW_MS} THEN 'future'
               WHEN due_pos > {REPLICATION_BATCH_SIZE}
                 THEN 'due_overflow'
               WHEN outcome_lane < 10 THEN 'batch_succeeded'
               WHEN outcome_lane < 20 THEN 'batch_terminal_failure'
               ELSE 'batch_rescheduled'
             END AS outcome
      FROM pos
    )
    SELECT job_id, is_dup, mode, bucket, target, target_node, attempts,
           due_at_ms, scan_pos, outcome,
           CASE WHEN outcome = 'batch_rescheduled'
                THEN CAST(attempts + 1 AS INT) END AS retry_attempts,
           CASE WHEN outcome = 'batch_rescheduled'
                THEN {NOW_MS} + LEAST(
                  250 * CAST(POWER(2, LEAST(attempts + 1, 7)) AS BIGINT),
                  30000) END AS retry_due_at_ms
    FROM classified
    UNION ALL
    SELECT job_id, is_dup, mode, bucket, target, target_node, attempts,
           due_at_ms, CAST(NULL AS BIGINT), 'superseded_duplicate',
           CAST(NULL AS INT), CAST(NULL AS BIGINT)
    FROM ranked WHERE NOT is_preferred
    """,
)
def blob_replication_drain_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One drain scan over the blob-replication job keyspace as a
    relation (queue.rs:1916-2034 + 1258-1328): identity losers are
    ``superseded_duplicate``; surviving records classify by the drain
    clock — ``future`` (feeds the re-arm min), ``due_overflow`` (due
    but past the 64-job batch cap → ``has_more_due``), or a batch
    outcome (``batch_succeeded`` / ``batch_terminal_failure`` both
    delete; ``batch_rescheduled`` rewrites the record with
    ``attempts+1`` due at ``now + queue_retry_after_ms(attempts+1)``).

    Scale shape: one shuffle on the identity key for the dedup, one
    two-level partitioned rank (mode leads the sort key) for the scan
    position — no unpartitioned window, no driver loop; the batch is
    O(64) regardless of queue depth.
    """
    return classify_drain(survivors(load_blob_jobs(spark, sf_dir)))


def classify_drain(
    jobs: DataFrame,
    now: int = NOW_MS,
    batch_size: int = REPLICATION_BATCH_SIZE,
) -> DataFrame:
    """The drain classification over a (deduped) job relation —
    parameterized on the clock and batch cap so tests can exercise
    the overflow lanes the sf0.001 fixture's due count (< 64) cannot
    reach; the sf0.01 oracle check runs the capped branch for real."""
    # r15: the loser/winner split, the rank's two reads, the batch head
    # and the classify join each re-derived the deduped relation (and
    # its identity window) — materialize the queue-sized frame once
    jobs = jobs.localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    losers = jobs.filter(~F.col("is_preferred"))
    winners = jobs.filter(F.col("is_preferred"))
    winners = global_scan_pos(
        winners,
        ["mode"],
        ["bucket", "target", "target_node", "dm_key", "rel_key"],
        out_col="scan_pos",
    )
    # the batch is a BOUNDED head (64 keys in scan order among the due
    # survivors — one TakeOrderedAndProject), so its id set broadcasts
    # at O(batch) regardless of backlog depth
    batch = (
        winners.filter(F.col("due_at_ms") <= now)
        .orderBy("mode", "bucket", "target", "target_node", "dm_key",
                 "rel_key")
        .limit(batch_size)
        .select("job_id", F.lit(True).alias("in_batch"))
    )
    classified = winners.join(F.broadcast(batch), "job_id", "left").select(
        "job_id",
        "is_dup",
        "mode",
        "bucket",
        "target",
        "target_node",
        "attempts",
        "due_at_ms",
        "scan_pos",
        F.when(F.col("due_at_ms") > now, "future")
        .when(F.col("in_batch").isNull(), "due_overflow")
        .when(F.col("outcome_lane") < 10, "batch_succeeded")
        .when(F.col("outcome_lane") < 20, "batch_terminal_failure")
        .otherwise("batch_rescheduled")
        .alias("outcome"),
    )
    rescheduled = F.col("outcome") == "batch_rescheduled"
    classified = classified.withColumn(
        "retry_attempts",
        F.when(rescheduled, F.col("attempts") + 1).cast("int"),
    ).withColumn(
        "retry_due_at_ms",
        F.when(
            rescheduled, F.lit(now) + backoff_ms(F.col("attempts") + 1)
        ).cast("long"),
    )
    return classified.unionByName(
        losers.select(
            "job_id",
            "is_dup",
            "mode",
            "bucket",
            "target",
            "target_node",
            "attempts",
            "due_at_ms",
            F.lit(None).cast("long").alias("scan_pos"),
            F.lit("superseded_duplicate").alias("outcome"),
            F.lit(None).cast("int").alias("retry_attempts"),
            F.lit(None).cast("long").alias("retry_due_at_ms"),
        )
    )


def _result_sql(now: int) -> str:
    return f"""
      SELECT CAST({now} AS BIGINT) AS now_ms,
             CAST(LEAST(COUNT(*) FILTER (WHERE due_at_ms <= {now}),
                        {REPLICATION_BATCH_SIZE}) AS BIGINT) AS processed,
             CAST(COUNT(*) FILTER (WHERE due_at_ms <= {now}
                    AND due_pos_{now} <= {REPLICATION_BATCH_SIZE}
                    AND outcome_lane < 10) AS BIGINT) AS succeeded,
             CAST(COUNT(*) FILTER (WHERE due_at_ms <= {now}
                    AND due_pos_{now} <= {REPLICATION_BATCH_SIZE}
                    AND outcome_lane >= 10) AS BIGINT) AS failed,
             COUNT(*) FILTER (WHERE due_at_ms <= {now})
               >= {REPLICATION_BATCH_SIZE} AS has_more_due,
             CASE WHEN COUNT(*) FILTER (WHERE due_at_ms <= {now})
                       >= {REPLICATION_BATCH_SIZE} THEN NULL
                  ELSE LEAST(
                    MIN(due_at_ms) FILTER (WHERE due_at_ms > {now}),
                    MIN(CASE WHEN due_at_ms <= {now}
                             AND due_pos_{now} <= {REPLICATION_BATCH_SIZE}
                             AND outcome_lane >= 20
                        THEN {now} + LEAST(250 * CAST(POWER(2,
                             LEAST(attempts + 1, 7)) AS BIGINT), 30000)
                        END)) - {now}
             END AS next_due_after_ms
      FROM pos
    """


def _drain_result(
    winners: DataFrame,
    now: int,
    batch_size: int = REPLICATION_BATCH_SIZE,
) -> DataFrame:
    """One ``BlobReplicationDrainResult`` row at the given clock
    (queue.rs:105-112, 1316-1327). Every leg is bounded or a partial
    aggregate: the cap probe reads batch+1 due keys, the batch is a
    64-key TakeOrderedAndProject, the future-min is one map-side
    combine — a drain tick costs O(batch) however deep the backlog."""
    due = winners.filter(F.col("due_at_ms") <= now)
    probe = due.limit(batch_size + 1).agg(
        F.least(
            F.count(F.lit(1)), F.lit(batch_size).cast("long")
        ).alias("processed"),
        (F.count(F.lit(1)) >= batch_size).alias("has_more_due"),
    )
    retry_due = F.lit(now) + backoff_ms(F.col("attempts") + 1)
    batch_stats = (
        due.orderBy(
            "mode", "bucket", "target", "target_node", "dm_key", "rel_key"
        )
        .limit(batch_size)
        .agg(
            F.coalesce(
                F.sum((F.col("outcome_lane") < 10).cast("long")), F.lit(0)
            ).alias("succeeded"),
            F.coalesce(
                F.sum((F.col("outcome_lane") >= 10).cast("long")), F.lit(0)
            ).alias("failed"),
            F.min(
                F.when(F.col("outcome_lane") >= 20, retry_due)
            ).alias("__retry_min"),
        )
    )
    future_min = winners.filter(F.col("due_at_ms") > now).agg(
        F.min("due_at_ms").alias("__future_min")
    )
    return (
        probe.crossJoin(F.broadcast(batch_stats))
        .crossJoin(F.broadcast(future_min))
        .select(
            F.lit(now).cast("long").alias("now_ms"),
            F.col("processed").cast("long"),
            F.col("succeeded").cast("long"),
            F.col("failed").cast("long"),
            "has_more_due",
            F.when(
                F.col("has_more_due"), F.lit(None).cast("long")
            )
            .otherwise(
                # both engines' LEAST/least skip NULL arguments
                (F.least("__future_min", "__retry_min") - now).cast("long")
            )
            .alias("next_due_after_ms"),
        )
    )


@register(
    "blob_replication_drain_result",
    oracle=f"""
    WITH {_BLOB_JOBS_RAW_SQL.strip()},
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY mode, bucket, target, target_node, dm_key,
                            rel_key
               ORDER BY attempts DESC, due_at_ms DESC, job_id DESC
             ) = 1 AS is_preferred
      FROM blob_jobs_raw
    ),
    pos AS (
      SELECT *,
             CASE WHEN due_at_ms <= {EARLY_NOW_MS} THEN
               ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN due_at_ms <= {EARLY_NOW_MS}
                              THEN 1 ELSE 0 END
                 ORDER BY mode, bucket, target, target_node, dm_key,
                          rel_key) END AS due_pos_{EARLY_NOW_MS},
             CASE WHEN due_at_ms <= {NOW_MS} THEN
               ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN due_at_ms <= {NOW_MS}
                              THEN 1 ELSE 0 END
                 ORDER BY mode, bucket, target, target_node, dm_key,
                          rel_key) END AS due_pos_{NOW_MS}
      FROM ranked WHERE is_preferred
    )
    {_result_sql(EARLY_NOW_MS)}
    UNION ALL
    {_result_sql(NOW_MS)}
    """,
)
def blob_replication_drain_result(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The drain's re-arm envelope at two clocks: EARLY_NOW (due count
    under the 64-job cap → ``has_more_due`` false, ``next_due_after``
    = the gap to the earliest of the next maturing job and the batch's
    own reschedules) and NOW (cap hit → ``next_due_after`` NULL, the
    drain timer re-kicks immediately — queue.rs:1316-1327)."""
    winners = (
        survivors(load_blob_jobs(spark, sf_dir))
        .filter(F.col("is_preferred"))
        # r15: both clock legs read this three ways each (cap probe,
        # batch head, future-min) — six derivations of the dedup window
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    return _drain_result(winners, EARLY_NOW_MS).unionByName(
        _drain_result(winners, NOW_MS)
    )


# ---------------------------------------------------------------------
# Relationship job stats (queue.rs:1170-1219): the sync-status route's
# per-relationship backlog probe — count queued jobs bound to the
# relationship and the oldest enqueue among them. The reference pages
# the whole keyspace (256/page) decoding every value; relationally it
# is one filter + groupBy over the RAW stored records (the scan does
# not dedup — a duplicated identity counts each stored copy).


@register(
    "blob_repl_relationship_stats",
    oracle=f"""
    WITH {_BLOB_JOBS_RAW_SQL.strip()}
    SELECT rel_key AS relationship_id,
           CAST(COUNT(*) AS BIGINT) AS pending,
           MIN(enqueued_at_ms) AS oldest_enqueued_ms
    FROM blob_jobs_raw
    WHERE rel_key <> ''
    GROUP BY rel_key
    """,
)
def blob_repl_relationship_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-relationship queued-job stats (queue.rs:1170-1219):
    ``(pending, oldest_enqueued_ms)`` for every relationship with
    bound jobs — one partial-aggregating groupBy over the keyspace,
    replacing the reference's full-scan-per-relationship with one
    pass serving every relationship at once."""
    jobs = load_blob_jobs(spark, sf_dir).filter(F.col("rel_key") != "")
    return jobs.groupBy(F.col("rel_key").alias("relationship_id")).agg(
        F.count(F.lit(1)).cast("long").alias("pending"),
        F.min("enqueued_at_ms").alias("oldest_enqueued_ms"),
    )


# ---------------------------------------------------------------------
# Live replication obligations (queue.rs:1607-1727, 1092-1125): every
# drain tick first reads ONE page (LIVE_REPLICATION_OBLIGATION_BATCH_
# SIZE = 64, rs:46) of the obligation keyspace in key order
# (bucket ‖ key ‖ version_id — rs:407-418); each obligation in the
# page mints replication jobs and then deletes; obligations past the
# page stay for the next tick (has_more re-kicks at Duration::ZERO —
# rs:1219-1224). The mint rule (write_live_jobs, rs:1727-1795):
#
# - an obligation whose ORIGIN hop count reached 4 mints nothing
#   (rs:1731-1736 — the sync-loop fuse);
# - the legacy bucket-config leg runs ONLY for locally-originated
#   obligations (origin is None — rs:1777-1793) and mints one Live
#   job per config target, SKIPPING the local node and, for delete
#   markers, targets that do not replicate markers
#   (live_replication_jobs_from_config, rs:1092-1125);
# - the RELATIONSHIP leg (relationship_job) mints against the sync
#   catalog — that admission ladder is modeled in its own plane
#   (queries/location_summary.py / sync_suite.py); with no
#   relationship targets here, filter_config's overlap subtraction
#   (rs:1780-1781) has nothing to subtract and is noted, not modeled.

LIVE_OBLIGATION_BATCH_SIZE = 64  # queue.rs:46
LOCAL_NODE = "node0"

_OBLIGATIONS_SQL = """
    obligations AS (
      SELECT 'b' || (o_orderkey % 7) AS bucket,
             'k' || (o_orderkey % 31) AS key,
             CAST(o_orderkey AS BIGINT) AS version_id,
             o_orderkey % 5 = 0 AS delete_marker,
             CASE WHEN o_orderkey % 13 >= 7
                  THEN CAST(o_orderkey % 13 - 6 AS INT) END AS origin_hops
      FROM orders WHERE o_orderkey % 24 = 7
    ),
    bucket_targets AS (
      SELECT 'b' || i AS bucket,
             'node' || ((i + j) % 5) AS target_node,
             (i + j) % 2 = 0 AS replicate_delete_markers
      FROM range(6) s(i), range(1, 4) t(j)
      WHERE j <= i % 3 + 1
    )
"""


def load_obligations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The obligation keyspace: one record per recent version write
    (bucket, key, version_id, delete_marker, origin hops — NULL for
    locally-originated writes). Bucket ``b6`` deliberately carries no
    replication config (the rs:1793 ``(_, None)`` lane)."""
    k = F.col("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k % 24 == 7)
        .select(
            F.concat(F.lit("b"), (k % 7).cast("string")).alias("bucket"),
            F.concat(F.lit("k"), (k % 31).cast("string")).alias("key"),
            k.cast("long").alias("version_id"),
            (k % 5 == 0).alias("delete_marker"),
            F.when(k % 13 >= 7, (k % 13 - 6).cast("int")).alias(
                "origin_hops"
            ),
        )
    )


def _targets_df(spark: SparkSession) -> DataFrame:
    """Per-bucket replication-config targets (BucketReplicationConfig
    — 1-3 targets per bucket, b0-b5 only; the local node appears in
    some lists to exercise the self-skip)."""
    rows = [
        (f"b{i}", f"node{(i + j) % 5}", (i + j) % 2 == 0)
        for i in range(6)
        for j in range(1, i % 3 + 2)
    ]
    return spark.createDataFrame(
        rows,
        "bucket string, target_node string, "
        "replicate_delete_markers boolean",
    )


@register(
    "blob_repl_obligation_sweep",
    oracle=f"""
    WITH {_OBLIGATIONS_SQL.strip()},
    paged AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (ORDER BY bucket, key, version_id)
                  AS BIGINT) AS scan_pos
      FROM obligations
    ),
    classified AS (
      SELECT p.bucket, p.key, p.version_id, p.delete_marker,
             p.origin_hops, p.scan_pos,
             CASE WHEN p.scan_pos > {LIVE_OBLIGATION_BATCH_SIZE}
                    THEN 'deferred'
                  WHEN p.origin_hops >= 4 THEN 'hop_capped'
                  WHEN p.origin_hops IS NOT NULL
                    THEN 'origin_skips_config'
                  ELSE 'processed' END AS outcome,
             CAST(COUNT(t.target_node) AS BIGINT) AS n_targets,
             CAST(COUNT(*) FILTER (WHERE t.target_node = '{LOCAL_NODE}')
                  AS BIGINT) AS n_skipped_self,
             CAST(COUNT(*) FILTER (WHERE t.target_node <> '{LOCAL_NODE}'
                    AND p.delete_marker
                    AND NOT t.replicate_delete_markers) AS BIGINT)
               AS n_skipped_marker,
             CAST(COUNT(*) FILTER (WHERE t.target_node <> '{LOCAL_NODE}'
                    AND (NOT p.delete_marker
                         OR t.replicate_delete_markers)) AS BIGINT)
               AS n_mintable
      FROM paged p LEFT JOIN bucket_targets t USING (bucket)
      GROUP BY ALL
    )
    SELECT bucket, key, version_id, delete_marker, origin_hops,
           scan_pos, outcome, n_targets, n_skipped_self,
           n_skipped_marker,
           CASE WHEN outcome = 'processed' THEN n_mintable
                WHEN outcome IN ('hop_capped', 'origin_skips_config')
                  THEN CAST(0 AS BIGINT)
                ELSE CAST(NULL AS BIGINT) END AS queued
    FROM classified
    """,
)
def blob_repl_obligation_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One obligation tick as a relation: the 64-obligation key-order
    page processes (each minting legacy-config Live jobs per the
    write_live_jobs gates, then deleting — queued counts the minted
    jobs, 0 for the hop-capped fuse and for synced-in origins whose
    config leg is skipped), the rest defer to the next tick with
    ``queued`` NULL. Skip lanes are counted so the mint rule's
    shrinkage is auditable; bucket b6 has no config (rs:1793 lane)."""
    return classify_obligations(
        load_obligations(spark, sf_dir), _targets_df(spark)
    )


def classify_obligations(
    obligations: DataFrame,
    targets: DataFrame,
    batch_size: int = LIVE_OBLIGATION_BATCH_SIZE,
) -> DataFrame:
    """The sweep classification, parameterized on the page size so
    tests can drive the capped lane at sf0.001 (62 obligations —
    under the reference's 64)."""
    paged = global_scan_pos(
        obligations, ["bucket"], ["key", "version_id"], out_col="scan_pos"
    )
    not_self = F.col("target_node") != LOCAL_NODE
    mints = not_self & (
        ~F.col("delete_marker") | F.col("replicate_delete_markers")
    )
    joined = paged.join(F.broadcast(targets), "bucket", "left")
    grouped = joined.groupBy(
        "bucket",
        "key",
        "version_id",
        "delete_marker",
        "origin_hops",
        "scan_pos",
    ).agg(
        F.count("target_node").cast("long").alias("n_targets"),
        F.coalesce(
            F.sum((~not_self).cast("long")), F.lit(0)
        ).alias("n_skipped_self"),
        F.coalesce(
            F.sum(
                (
                    not_self
                    & F.col("delete_marker")
                    & ~F.col("replicate_delete_markers")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_skipped_marker"),
        F.coalesce(F.sum(mints.cast("long")), F.lit(0)).alias(
            "__mintable"
        ),
    )
    outcome = (
        F.when(F.col("scan_pos") > batch_size, "deferred")
        .when(F.col("origin_hops") >= 4, "hop_capped")
        .when(F.col("origin_hops").isNotNull(), "origin_skips_config")
        .otherwise("processed")
    )
    return grouped.withColumn("outcome", outcome).select(
        "bucket",
        "key",
        "version_id",
        "delete_marker",
        "origin_hops",
        "scan_pos",
        "outcome",
        "n_targets",
        "n_skipped_self",
        "n_skipped_marker",
        F.when(F.col("outcome") == "processed", F.col("__mintable"))
        .when(
            F.col("outcome").isin("hop_capped", "origin_skips_config"),
            F.lit(0),
        )
        .cast("long")
        .alias("queued"),
    )
