"""Durable-queue lag sampling — the observability probe over every
modeled work queue (``operations/src/queue_lag.rs``).

Reference surface:

- rs:22-38 — a probe scans a queue keyspace in key order, at most
  QUEUE_SCAN_PAGE_LIMIT (8) pages of QUEUE_SCAN_PAGE_SIZE (1,024) =
  8,192 keys; ``QueueLagSnapshot { depth, depth_capped,
  oldest_age_ms, due }``.
- rs:183-218 (``probe_outbox_lag``) — depth + oldest-enqueue age from
  the scanned keys' timestamps.
- rs:220+ (``probe_materialization_lag``) — depth, the count already
  DUE (due_at <= now), and the age of the oldest due job.
- rs:165-175 — a queue that exceeds the page budget reports
  ``depth_capped`` with depth pinned at the cap (the probe is an
  O(cap) scan, never a full count — idle cost one limit-1 read).

Spark mapping: the probe's bounded key-ordered scan is a
TakeOrderedAndProject page (keys sort by time, so the page holds the
oldest records and the min-time / due statistics computed over it
equal the true ones whenever depth <= cap); the snapshot is a 1-row
aggregate per queue, unioned into one sample relation. Each queue
keeps ITS OWN fixture clock (the planes' NOW constants), mirroring
the reference's per-keyspace probes sharing one sample instant.

Queues sampled (the repo's modeled durable queues):

- ``job_schedule``       — queued jobs on the due-time index
  (:mod:`aruna_spark.queries.jobs`, NOW 30 000);
- ``metadata_graph_prune`` — the r9 prune queue
  (:mod:`aruna_spark.queries.doc_lifecycle`, NOW 10 000);
- ``materialization_dead_letters`` — parked letters awaiting requeue
  (:mod:`aruna_spark.queries.matqueue`, NOW 50 000; a depth that only
  grows means documents are failing to materialize — rs:43-45);
- ``reference_metadata_refresh`` — due reference-refresh jobs
  (:mod:`aruna_spark.queries.references`, NOW 5 000);
- ``sync_mirror_repair`` — pending mirror-repair records
  (:mod:`aruna_spark.queries.sync_suite`, NOW 50 000).

Five keyspaces per tick, completing the reference's five-queue
cadence (queue_lag.rs:12-14,63-90) in the REGISTERED oracle-checked
query (VERDICT r10 Next #2 — previously the last two were
facade-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.queries import register
from aruna_spark.queries.doc_lifecycle import NOW_MS as PRUNE_NOW_MS
from aruna_spark.queries.doc_lifecycle import prune_jobs
from aruna_spark.queries.jobs import NOW_MS as JOBS_NOW_MS
from aruna_spark.queries.jobs import _JOBS_SQL, load_jobs
from aruna_spark.queries.matqueue import NOW_MS as MATQ_NOW_MS
from aruna_spark.queries.matqueue import _LETTERS_SQL, load_dead_letters
from aruna_spark.queries.references import (
    _REFRESH_JOBS_SQL,
    REFRESH_NOW_MS,
    load_refresh_jobs,
)
from aruna_spark.queries.sync_suite import NOW_MS as SYNC_NOW_MS
from aruna_spark.queries.sync_suite import _QUEUE_SQL, load_repair_queue

QUEUE_SCAN_PAGE_SIZE = 1_024  # queue_lag.rs:22
QUEUE_SCAN_PAGE_LIMIT = 8  # queue_lag.rs:23
SCAN_CAP = QUEUE_SCAN_PAGE_SIZE * QUEUE_SCAN_PAGE_LIMIT


def lag_snapshot(
    queue: str, df: DataFrame, time_col: Column, now_ms: int
) -> DataFrame:
    """One queue's ``QueueLagSnapshot`` as a 1-row relation.

    The probe page is the SCAN_CAP oldest records (bounded
    TakeOrderedAndProject — the reference walks key order, and queue
    keys embed the time); depth/due/oldest compute over that page, so
    a queue deeper than the cap reports depth = cap with
    ``depth_capped`` (rs:165-175), and the min-time statistics stay
    exact because the page holds the oldest keys."""
    keyed = df.select(time_col.cast("long").alias("__t"))
    page = keyed.orderBy("__t").limit(SCAN_CAP)
    # the capped flag probes ONE key past the budget, never a full
    # count (queue_lag.rs:165-175 — the probe is O(cap) total)
    probed = keyed.limit(SCAN_CAP + 1).agg(
        (F.count(F.lit(1)) > SCAN_CAP).alias("depth_capped")
    )
    snap = page.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((F.col("__t") <= now_ms).cast("long")).alias("__due"),
        F.min(F.when(F.col("__t") <= now_ms, F.col("__t"))).alias(
            "__oldest_due"
        ),
    )
    return (
        snap.crossJoin(F.broadcast(probed))
        .select(
            F.lit(queue).alias("queue"),
            F.col("__n").cast("long").alias("depth"),
            "depth_capped",
            F.coalesce(F.col("__due"), F.lit(0))
            .cast("long")
            .alias("due"),
            F.coalesce(
                F.lit(now_ms) - F.col("__oldest_due"), F.lit(0)
            )
            .cast("long")
            .alias("oldest_due_age_ms"),
        )
    )


def _lag_oracle(queue: str, rel: str, tcol: str, now: int) -> str:
    """One queue's oracle snapshot: statistics over the first SCAN_CAP
    rows in key (time) order, the capped flag from a cap+1-limited
    probe — the oracle mirrors the BOUNDED scan, so impl and oracle
    keep agreeing even if a fixture queue ever outgrows the cap."""
    return f"""
    SELECT '{queue}' AS queue,
           CAST(COUNT(*) AS BIGINT) AS depth,
           (SELECT COUNT(*) FROM (SELECT 1 FROM {rel}
                                  LIMIT {SCAN_CAP + 1}))
             > {SCAN_CAP} AS depth_capped,
           CAST(COALESCE(SUM(CASE WHEN t <= {now} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS due,
           CAST(COALESCE({now} - MIN(CASE WHEN t <= {now} THEN t END), 0)
                AS BIGINT) AS oldest_due_age_ms
    FROM (SELECT t FROM (
            SELECT {tcol} AS t,
                   row_number() OVER (ORDER BY {tcol}) AS rn
            FROM {rel})
          WHERE rn <= {SCAN_CAP})
    """


@register(
    "queue_lag_sample",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL}),
    letters AS ({_LETTERS_SQL}),
    prune AS (
      SELECT CAST(CASE WHEN doc_id % 5 = 0 THEN doc_id + 70000
                  ELSE doc_id + 1000 END AS BIGINT) AS t
      FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT CAST(doc_id + 1100 AS BIGINT) FROM documents
      WHERE doc_id % 3 = 1 AND doc_id % 11 = 4 AND doc_id % 5 <> 0
      UNION ALL
      SELECT CAST(doc_id + 1000 AS BIGINT) FROM documents
      WHERE doc_id % 30 = 2
    ),
    {_REFRESH_JOBS_SQL.strip().rstrip()},
    {_QUEUE_SQL.strip().rstrip()}
    {_lag_oracle("job_schedule",
                 "(SELECT * FROM jobs WHERE state = 'queued')",
                 "due_at_ms", JOBS_NOW_MS)}
    UNION ALL
    {_lag_oracle("metadata_graph_prune", "prune", "t", PRUNE_NOW_MS)}
    UNION ALL
    {_lag_oracle("materialization_dead_letters", "letters",
                 "requeue_at_ms", MATQ_NOW_MS)}
    UNION ALL
    {_lag_oracle("reference_metadata_refresh", "refresh_jobs",
                 "due_at_ms", REFRESH_NOW_MS)}
    UNION ALL
    {_lag_oracle("sync_mirror_repair", "repair_queue",
                 "due_at_ms", SYNC_NOW_MS)}
    """,
)
def queue_lag_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One observability tick: every durable queue's depth / due /
    oldest-due-age snapshot, five keyspaces per the reference cadence
    (fixtures are far below the 8,192 scan cap, so depth_capped is
    false — the cap branch is pinned by a synthetic 10k-row queue in
    tests/test_queue_lag.py)."""
    jobs = load_jobs(spark, sf_dir).filter(F.col("state") == "queued")
    out = lag_snapshot(
        "job_schedule", jobs, F.col("due_at_ms"), JOBS_NOW_MS
    )
    out = out.unionByName(
        lag_snapshot(
            "metadata_graph_prune",
            prune_jobs(spark, sf_dir),
            F.col("due_at_ms"),
            PRUNE_NOW_MS,
        )
    )
    out = out.unionByName(
        lag_snapshot(
            "materialization_dead_letters",
            load_dead_letters(spark, sf_dir),
            F.col("requeue_at_ms"),
            MATQ_NOW_MS,
        )
    )
    out = out.unionByName(
        lag_snapshot(
            "reference_metadata_refresh",
            load_refresh_jobs(spark, sf_dir),
            F.col("due_at_ms"),
            REFRESH_NOW_MS,
        )
    )
    return out.unionByName(
        lag_snapshot(
            "sync_mirror_repair",
            load_repair_queue(spark, sf_dir),
            F.col("due_at_ms"),
            SYNC_NOW_MS,
        )
    )
