"""Job queue plane: drain paging, lost-attempt reconcile with
exponential backoff, and retention prune.

Reference surface:

- ``core/src/structs/job.rs:113-124,964-989`` — JobRecord { job_id,
  state (Queued … Succeeded/Failed/Cancelled), created/due/finished_at,
  attempts, claim (lease), retention } on a due-time schedule index.
- ``operations/src/jobs/drain.rs`` — the drain walks the schedule
  index in due order and takes the due page; future rows mint
  ``next_due_after`` so the timer re-arms exactly when the next job
  matures.
- ``operations/src/jobs/reconcile.rs`` — a Running job whose claim
  lease expired is a LOST attempt: it requeues with attempts+1 and the
  queue backoff ``min(250ms << min(attempts,7), 30s)``
  (``queue_backoff.rs:1-12`` — the doubling ladder capped at 30 s).
- ``operations/src/jobs/prune.rs:33-140`` — terminal jobs whose
  ``finished_at + retention`` elapsed prune in index order under a
  deletion cap, EXCEPT records a queued cleanup still needs
  (``cleanup_pending`` — deleting the fence would strand the backend
  attempt).

Spark mapping: the queue is a relation; drain/reconcile/prune are
filters + CASE algebra + bounded TakeOrderedAndProject pages — the
per-record state machines become columns, the schedule index becomes
the sort key the predicates push down on.

Modeled queue (from ``orders`` for variety — one job per order with
``o_orderkey % 9 == 2``): state from ``o_orderkey % 5``
(0 queued, 1 running, 2 succeeded, 3 failed, 4 cancelled),
created = o_orderkey, due = created + 10, attempts = o_orderkey % 4,
lease_expires = created + 40 (running only), finished = created + 50
(terminal only), retention 100, NOW = the 60th percentile-ish tick
30_000, cleanup pending iff o_orderkey % 45 == 12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

QUEUE_RETRY_BASE_MS = 250  # queue_backoff.rs:1
QUEUE_RETRY_MAX_MS = 30_000  # queue_backoff.rs:2
NOW_MS = 30_000
DRAIN_PAGE = 25


def backoff_ms(attempts: F.Column) -> F.Column:
    """``min(base << min(attempts, 7), max)`` — queue_backoff.rs:8-12."""
    return F.least(
        F.lit(QUEUE_RETRY_BASE_MS)
        * F.pow(F.lit(2.0), F.least(attempts, F.lit(7))).cast("long"),
        F.lit(QUEUE_RETRY_MAX_MS),
    )


def load_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 9 == 2
    )
    k = F.col("o_orderkey")
    state = (
        F.when(k % 5 == 0, "queued")
        .when(k % 5 == 1, "running")
        .when(k % 5 == 2, "succeeded")
        .when(k % 5 == 3, "failed")
        .otherwise("cancelled")
    )
    terminal = (k % 5).isin(2, 3, 4)
    return o.select(
        F.concat(F.lit("job-"), k.cast("string")).alias("job_id"),
        state.alias("state"),
        k.cast("long").alias("created_at_ms"),
        (k + 10).cast("long").alias("due_at_ms"),
        (k % 4).cast("int").alias("attempts"),
        F.when(k % 5 == 1, k + 40).cast("long").alias("lease_expires_ms"),
        F.when(terminal, k + 50).cast("long").alias("finished_at_ms"),
        F.lit(100).cast("long").alias("retention_ms"),
        (k % 45 == 12).alias("cleanup_pending"),
    )


_JOBS_SQL = """
    SELECT 'job-' || o_orderkey AS job_id,
           CASE o_orderkey % 5 WHEN 0 THEN 'queued' WHEN 1 THEN 'running'
                WHEN 2 THEN 'succeeded' WHEN 3 THEN 'failed'
                ELSE 'cancelled' END AS state,
           CAST(o_orderkey AS BIGINT) AS created_at_ms,
           CAST(o_orderkey + 10 AS BIGINT) AS due_at_ms,
           CAST(o_orderkey % 4 AS INT) AS attempts,
           CAST(CASE WHEN o_orderkey % 5 = 1 THEN o_orderkey + 40 END
                AS BIGINT) AS lease_expires_ms,
           CAST(CASE WHEN o_orderkey % 5 IN (2, 3, 4) THEN o_orderkey + 50
                END AS BIGINT) AS finished_at_ms,
           CAST(100 AS BIGINT) AS retention_ms,
           o_orderkey % 45 = 12 AS cleanup_pending
    FROM orders WHERE o_orderkey % 9 = 2
"""


@register(
    "jobs_drain_page",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL}),
    due AS (
      SELECT job_id, due_at_ms, attempts FROM jobs
      WHERE state = 'queued' AND due_at_ms <= {NOW_MS}
      ORDER BY due_at_ms, job_id LIMIT {DRAIN_PAGE}
    ),
    future AS (
      SELECT MIN(due_at_ms) AS nxt FROM jobs
      WHERE state = 'queued' AND due_at_ms > {NOW_MS}
    )
    SELECT d.job_id, d.due_at_ms, d.attempts,
           CAST((SELECT nxt FROM future) - {NOW_MS} AS BIGINT)
             AS next_due_after_ms
    FROM due d
    """,
)
def jobs_drain_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One drain tick: the due queued page in (due, job_id) order plus
    the re-arm interval to the next maturing job (drain.rs walk order;
    the timer envelope prune.rs also mints as next_due_after)."""
    jobs = load_jobs(spark, sf_dir)
    due = (
        jobs.filter(
            (F.col("state") == "queued") & (F.col("due_at_ms") <= NOW_MS)
        )
        .orderBy("due_at_ms", "job_id")
        .limit(DRAIN_PAGE)
        .select("job_id", "due_at_ms", "attempts")
    )
    nxt = (
        jobs.filter(
            (F.col("state") == "queued") & (F.col("due_at_ms") > NOW_MS)
        )
        .agg((F.min("due_at_ms") - NOW_MS).cast("long").alias("__n"))
    )
    return due.crossJoin(F.broadcast(nxt)).select(
        "job_id",
        "due_at_ms",
        "attempts",
        F.col("__n").alias("next_due_after_ms"),
    )


@register(
    "jobs_reconcile_lost",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL})
    SELECT job_id, attempts + 1 AS attempts,
           'queued' AS state,
           CAST({NOW_MS} + LEAST(250 * (1 << LEAST(attempts + 1, 7)), 30000)
                AS BIGINT) AS due_at_ms
    FROM jobs
    WHERE state = 'running' AND lease_expires_ms < {NOW_MS}
    """,
)
def jobs_reconcile_lost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost-attempt reconcile: every Running job whose claim lease
    expired requeues with attempts+1 and the exponential queue backoff
    (250 ms doubling, capped 30 s — queue_backoff.rs:1-12) from NOW."""
    jobs = load_jobs(spark, sf_dir)
    lost = jobs.filter(
        (F.col("state") == "running") & (F.col("lease_expires_ms") < NOW_MS)
    )
    bumped = F.col("attempts") + 1
    return lost.select(
        "job_id",
        bumped.cast("int").alias("attempts"),
        F.lit("queued").alias("state"),
        (F.lit(NOW_MS) + backoff_ms(bumped)).cast("long").alias("due_at_ms"),
    )


@register(
    "jobs_prune_page",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL})
    SELECT job_id, state, finished_at_ms,
           finished_at_ms + retention_ms AS expired_at_ms
    FROM jobs
    WHERE state IN ('succeeded', 'failed', 'cancelled')
      AND finished_at_ms + retention_ms <= {NOW_MS}
      AND NOT cleanup_pending
    ORDER BY expired_at_ms, job_id LIMIT {DRAIN_PAGE}
    """,
)
def jobs_prune_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One prune page: terminal jobs past retention in expiry order,
    SKIPPING records a queued cleanup still needs (prune.rs:87-90 —
    the fence outlives retention so the cleanup cannot strand)."""
    jobs = load_jobs(spark, sf_dir)
    expired = F.col("finished_at_ms") + F.col("retention_ms")
    return (
        jobs.filter(
            F.col("state").isin("succeeded", "failed", "cancelled")
            & (expired <= NOW_MS)
            & ~F.col("cleanup_pending")
        )
        .select(
            "job_id",
            "state",
            "finished_at_ms",
            expired.alias("expired_at_ms"),
        )
        .orderBy("expired_at_ms", "job_id")
        .limit(DRAIN_PAGE)
    )
