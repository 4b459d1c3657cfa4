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
from aruna_spark.ops.pagination import bounded_rank
from aruna_spark.ops.queue_drain import (  # noqa: F401 (re-exported)
    QUEUE_RETRY_BASE_MS,
    QUEUE_RETRY_MAX_MS,
    backoff_ms,
)
from aruna_spark.queries import register

NOW_MS = 30_000
DRAIN_PAGE = 25
JOB_HEARTBEAT_MS = 20_000  # jobs/mod.rs:24
# JOB_RECONCILE_REARM = heartbeat (jobs/mod.rs:47): an already-expired
# lease head re-arms at the heartbeat floor instead of zero so the
# drain cannot busy-loop on a lease row a reconciled attempt keeps.
BUDGET_IN_PROCESS = 6
BUDGET_EXTERNAL = 3


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
        # job.rs:602-610: the Execution payload is the sole
        # ExternalAttempt class; everything else runs InProcess. k%9==2
        # pins k%3==2, so the class discriminator must be coprime to 9.
        F.when(k % 10 < 3, "external")
        .otherwise("in_process")
        .alias("execution_class"),
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
           CASE WHEN o_orderkey % 10 < 3 THEN 'external'
                ELSE 'in_process' END AS execution_class,
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


@register(
    "jobs_drain_class_budget",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL}),
    due AS (
      SELECT job_id, execution_class, due_at_ms,
             row_number() OVER (PARTITION BY execution_class
                                ORDER BY due_at_ms, job_id) AS rn
      FROM jobs WHERE state = 'queued' AND due_at_ms <= {NOW_MS}
    ),
    marks AS (
      SELECT
        MAX(CASE WHEN execution_class = 'in_process'
                  AND rn = {BUDGET_IN_PROCESS} THEN due_at_ms END) AS l_ip,
        MAX(CASE WHEN execution_class = 'external'
                  AND rn = {BUDGET_EXTERNAL} THEN due_at_ms END) AS l_ex,
        MAX(CASE WHEN execution_class = 'in_process'
                  AND rn = {BUDGET_IN_PROCESS + 1} THEN due_at_ms END) AS o_ip,
        MAX(CASE WHEN execution_class = 'external'
                  AND rn = {BUDGET_EXTERNAL + 1} THEN due_at_ms END) AS o_ex
      FROM due
    ),
    env AS (
      SELECT
        ((o_ip IS NOT NULL AND (l_ip IS NULL OR l_ex IS NULL
                                OR o_ip < GREATEST(l_ip, l_ex)))
         OR (o_ex IS NOT NULL AND (l_ip IS NULL OR l_ex IS NULL
                                   OR o_ex < GREATEST(l_ip, l_ex))))
          AS deferred_saturated
      FROM marks
    ),
    nxt AS (
      SELECT MIN(due_at_ms) - {NOW_MS} AS d FROM jobs
      WHERE state = 'queued' AND due_at_ms > {NOW_MS}
    ),
    lease AS (
      SELECT CASE WHEN MIN(lease_expires_ms) IS NULL THEN NULL
                  WHEN MIN(lease_expires_ms) <= {NOW_MS}
                    THEN {JOB_HEARTBEAT_MS}
                  ELSE MIN(lease_expires_ms) - {NOW_MS} END AS d
      FROM jobs WHERE state = 'running'
    )
    SELECT d.job_id, d.execution_class, d.due_at_ms,
           CAST(d.rn AS INT) AS class_rank,
           (SELECT deferred_saturated FROM env) AS deferred_saturated,
           CAST((SELECT CASE
                   WHEN n.d IS NULL THEN l.d
                   WHEN l.d IS NULL THEN n.d
                   WHEN n.d < l.d THEN n.d ELSE l.d END
                 FROM nxt n, lease l) AS BIGINT) AS next_due_after_ms
    FROM due d
    WHERE (d.execution_class = 'in_process' AND d.rn <= {BUDGET_IN_PROCESS})
       OR (d.execution_class = 'external' AND d.rn <= {BUDGET_EXTERNAL})
    """,
)
def jobs_drain_class_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted drain tick with per-class claim budgets.

    ``claim_due_jobs`` (drain.rs:177-299) walks the due index in
    (due, job_id) order claiming each job against its OWN class budget
    (InProcess {6} / ExternalAttempt {3} here — job.rs:602-610 maps the
    Execution payload to ExternalAttempt, everything else InProcess); a
    due job whose class is saturated is SKIPPED without a write
    (drain.rs:261-264 — claiming it would only release it again) and
    the scan breaks once both budgets empty (drain.rs:269-272).

    Closed form: a job claims iff its per-class rank <= its class
    budget — every such job precedes the moment both budgets empty, so
    the claimed set needs only per-class bounded heads (budget+1 rows),
    never the full due relation. ``deferred_saturated`` is true iff a
    skipped job (class rank budget+1) was OBSERVED before the scan
    break: before the later of the two final claims, or anywhere when
    one class never exhausts (the scan then runs to the end of the due
    index). The model's due keys are unique (due = k+10), so the scan
    position IS the due timestamp. ``next_due_after_ms`` re-arms from
    the earliest future due head and the lease head with the 20 s
    reconcile floor for an already-expired lease (drain.rs:313-333,
    next_drain_delays; JOB_RECONCILE_REARM = heartbeat, mod.rs:24,47).

    Scale shape: two TakeOrderedAndProject heads of budget+1 rows plus
    three one-row aggregates broadcast onto the page — the due index
    never shuffles, exactly the iter_prefix_page discipline.
    """
    return drain_class_budget(
        load_jobs(spark, sf_dir), BUDGET_IN_PROCESS, BUDGET_EXTERNAL, NOW_MS
    )


def drain_class_budget(
    jobs: DataFrame, b_ip: int, b_ext: int, now_ms: int
) -> DataFrame:
    """Closed-form ``claim_due_jobs`` over any jobs relation (see
    :func:`jobs_drain_class_budget`). Scan positions are the full
    (due_at_ms, job_id) struct, so duplicate due timestamps order
    exactly like the reference's schedule index key. A zero budget
    means the class is saturated BEFORE the scan (drain.rs:185-188,
    261-264): its "last claim" sentinel sorts before every real key.
    Property-tested against a literal Python simulation of the
    drain.rs loop in ``tests/test_jobs_drain_property.py``."""
    due = jobs.filter(
        (F.col("state") == "queued") & (F.col("due_at_ms") <= now_ms)
    )

    def skey(due_c: F.Column, id_c: F.Column) -> F.Column:
        return F.struct(due_c.alias("d"), id_c.alias("i"))

    def head(cls: str, budget: int) -> DataFrame:
        h = (
            due.filter(F.col("execution_class") == cls)
            .orderBy("due_at_ms", "job_id")
            .limit(budget + 1)
            .select("job_id", "execution_class", "due_at_ms")
        )
        return bounded_rank(
            h, [F.col("due_at_ms"), F.col("job_id")], rank_name="__rn"
        )

    h_ip = head("in_process", b_ip)
    h_ex = head("external", b_ext)

    # sentinel for a zero-budget class: exhausted before any real key
    _SENTINEL = skey(F.lit(-(1 << 62)).cast("long"), F.lit(""))

    def marks(h: DataFrame, budget: int, tag: str) -> DataFrame:
        key = skey(F.col("due_at_ms"), F.col("job_id"))
        last = (
            _SENTINEL
            if budget == 0
            else F.max(F.when(F.col("__rn") == budget, key))
        )
        return h.agg(
            last.alias(f"__l_{tag}"),
            F.max(F.when(F.col("__rn") == budget + 1, key)).alias(
                f"__o_{tag}"
            ),
        )

    env = marks(h_ip, b_ip, "ip").crossJoin(marks(h_ex, b_ext, "ex"))
    l_ip, l_ex = F.col("__l_ip"), F.col("__l_ex")
    o_ip, o_ex = F.col("__o_ip"), F.col("__o_ex")
    ran_to_end = l_ip.isNull() | l_ex.isNull()
    cutoff = F.greatest(l_ip, l_ex)
    deferred = (
        o_ip.isNotNull() & (ran_to_end | (o_ip < cutoff))
    ) | (o_ex.isNotNull() & (ran_to_end | (o_ex < cutoff)))
    env = env.select(deferred.alias("deferred_saturated"))

    nxt = jobs.filter(
        (F.col("state") == "queued") & (F.col("due_at_ms") > now_ms)
    ).agg((F.min("due_at_ms") - now_ms).alias("__due_d"))
    lease = jobs.filter(F.col("state") == "running").agg(
        F.min("lease_expires_ms").alias("__ml")
    )
    lease_d = F.when(
        F.col("__ml").isNotNull(),
        F.when(F.col("__ml") <= now_ms, F.lit(JOB_HEARTBEAT_MS)).otherwise(
            F.col("__ml") - now_ms
        ),
    )
    claimed = h_ip.filter(F.col("__rn") <= b_ip).unionByName(
        h_ex.filter(F.col("__rn") <= b_ext)
    )
    return (
        claimed.crossJoin(F.broadcast(env))
        .crossJoin(F.broadcast(nxt))
        .crossJoin(F.broadcast(lease))
        .select(
            "job_id",
            "execution_class",
            "due_at_ms",
            F.col("__rn").cast("int").alias("class_rank"),
            "deferred_saturated",
            F.least(F.col("__due_d"), lease_d)
            .cast("long")
            .alias("next_due_after_ms"),
        )
    )


# queue_lag.rs:22-24 — page scan cap: first probe page limit 1 (idle
# probe costs one key read), then up to 7 pages of 1,024
QUEUE_SCAN_PAGE_SIZE = 1_024
QUEUE_SCAN_PAGE_LIMIT = 8
QUEUE_SCAN_CAP = 1 + (QUEUE_SCAN_PAGE_LIMIT - 1) * QUEUE_SCAN_PAGE_SIZE


@register(
    "jobs_queue_lag",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL}),
    sched_scan AS (
      SELECT due_at_ms FROM jobs WHERE state = 'queued'
      ORDER BY due_at_ms, job_id LIMIT {QUEUE_SCAN_CAP}
    ),
    sched AS (
      SELECT 'job_schedule' AS queue,
             CAST(COUNT(*) AS BIGINT) AS depth,
             (SELECT COUNT(*) FROM jobs WHERE state = 'queued')
               > {QUEUE_SCAN_CAP} AS depth_capped,
             CAST(COUNT(*) FILTER (WHERE due_at_ms <= {NOW_MS}) AS BIGINT)
               AS due,
             CAST(COALESCE({NOW_MS}
                  - MIN(due_at_ms) FILTER (WHERE due_at_ms <= {NOW_MS}), 0)
                  AS BIGINT) AS oldest_age_ms
      FROM sched_scan
    ),
    lease_scan AS (
      SELECT lease_expires_ms FROM jobs WHERE state = 'running'
      ORDER BY lease_expires_ms, job_id LIMIT {QUEUE_SCAN_CAP}
    ),
    lease AS (
      SELECT 'job_lease', CAST(COUNT(*) AS BIGINT),
             (SELECT COUNT(*) FROM jobs WHERE state = 'running')
               > {QUEUE_SCAN_CAP},
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM lease_scan
    ),
    cleanup_scan AS (
      SELECT created_at_ms FROM jobs
      WHERE state IN ('succeeded', 'failed', 'cancelled') AND cleanup_pending
      ORDER BY created_at_ms, job_id LIMIT {QUEUE_SCAN_CAP}
    ),
    cleanup AS (
      SELECT 'cleanup_pending', CAST(COUNT(*) AS BIGINT),
             (SELECT COUNT(*) FROM jobs
              WHERE state IN ('succeeded', 'failed', 'cancelled')
                AND cleanup_pending) > {QUEUE_SCAN_CAP},
             CAST(0 AS BIGINT),
             CAST(GREATEST(0, {NOW_MS} - COALESCE(MIN(created_at_ms),
                  {NOW_MS})) AS BIGINT)
      FROM cleanup_scan
    )
    SELECT * FROM sched UNION ALL SELECT * FROM lease
    UNION ALL SELECT * FROM cleanup
    """,
)
def jobs_queue_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable-queue lag probes (queue_lag.rs:270-292 probe_queue_depth,
    :225-268 probe_materialization_lag, :183-221 probe_outbox_lag).

    Each probe walks its index at most 1 + 7×1024 keys (first page
    limit 1 so an idle queue costs one read — queue_lag.rs:294-301),
    so ``depth`` counts SCANNED keys and ``depth_capped`` marks a scan
    that stopped mid-queue; ``due``/``oldest_age_ms`` follow the
    per-queue semantics: the schedule index counts already-due jobs and
    ages the oldest due (materialization-style, due-prefixed keys), the
    lease probe is depth-only, the cleanup fence ages the oldest
    record's enqueue timestamp (outbox-style, saturating at 0).

    Scale shape: three TakeOrderedAndProject heads bounded by the scan
    cap (never the full index) feeding one-row aggregates — the probe's
    idle cost discipline, as plans.
    """
    jobs = load_jobs(spark, sf_dir)

    def probe(
        name: str,
        rel: DataFrame,
        order: list[str],
        due_col: str | None,
        age_outbox: str | None,
    ) -> DataFrame:
        total = rel.agg(
            (F.count(F.lit(1)) > QUEUE_SCAN_CAP).alias("depth_capped")
        )
        scanned = rel.orderBy(*order).limit(QUEUE_SCAN_CAP)
        if due_col is not None:
            agg = scanned.agg(
                F.count(F.lit(1)).cast("long").alias("depth"),
                F.sum((F.col(due_col) <= NOW_MS).cast("long"))
                .cast("long")
                .alias("due"),
                F.coalesce(
                    F.lit(NOW_MS)
                    - F.min(
                        F.when(F.col(due_col) <= NOW_MS, F.col(due_col))
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("oldest_age_ms"),
            )
        elif age_outbox is not None:
            agg = scanned.agg(
                F.count(F.lit(1)).cast("long").alias("depth"),
                F.lit(0).cast("long").alias("due"),
                F.greatest(
                    F.lit(0),
                    F.lit(NOW_MS)
                    - F.coalesce(F.min(age_outbox), F.lit(NOW_MS)),
                )
                .cast("long")
                .alias("oldest_age_ms"),
            )
        else:
            agg = scanned.agg(
                F.count(F.lit(1)).cast("long").alias("depth"),
                F.lit(0).cast("long").alias("due"),
                F.lit(0).cast("long").alias("oldest_age_ms"),
            )
        return agg.crossJoin(F.broadcast(total)).select(
            F.lit(name).alias("queue"),
            "depth",
            "depth_capped",
            "due",
            "oldest_age_ms",
        )

    sched = probe(
        "job_schedule",
        jobs.filter(F.col("state") == "queued"),
        ["due_at_ms", "job_id"],
        "due_at_ms",
        None,
    )
    lease = probe(
        "job_lease",
        jobs.filter(F.col("state") == "running"),
        ["lease_expires_ms", "job_id"],
        None,
        None,
    )
    cleanup = probe(
        "cleanup_pending",
        jobs.filter(
            F.col("state").isin("succeeded", "failed", "cancelled")
            & F.col("cleanup_pending")
        ),
        ["created_at_ms", "job_id"],
        None,
        "created_at_ms",
    )
    return sched.unionByName(lease).unionByName(cleanup)


@register(
    "jobs_recovery_actions",
    oracle=f"""
    WITH jobs AS ({_JOBS_SQL}),
    lost AS (
      SELECT job_id, CAST(substr(job_id, 5) AS BIGINT) AS k
      FROM jobs
      WHERE state = 'running' AND lease_expires_ms < {NOW_MS}
        AND execution_class = 'external'
    ),
    ev AS (
      SELECT job_id,
        CASE WHEN k % 11 = 0 THEN 'tombstoned'
             WHEN k % 7 IN (0, 1, 2) THEN 'adoptable'
             WHEN k % 7 IN (3, 4) THEN 'unadoptable'
             WHEN k % 7 = 5 THEN 'unavailable'
             ELSE 'absent' END AS evidence,
        CASE WHEN k % 11 <> 0 AND k % 7 = 0 THEN 'submitted' END AS phase,
        CASE WHEN k % 11 <> 0 AND k % 7 = 0 THEN 'submit'
             WHEN k % 11 <> 0 AND k % 7 = 1 THEN 'stage'
             WHEN k % 11 <> 0 AND k % 7 = 2 THEN 'finalize' END AS resume,
        k % 11 <> 0 AND k % 7 = 3 AS exact_identity
      FROM lost
    )
    SELECT job_id, evidence, phase, resume, exact_identity,
      CASE
        WHEN evidence = 'tombstoned' THEN 'retire'
        WHEN evidence = 'adoptable' AND ((phase = 'submitted'
              AND resume = 'submit') OR resume IN ('stage', 'unsuspend'))
          THEN 'retry_same'
        WHEN evidence = 'adoptable' THEN 'observe'
        WHEN evidence = 'unadoptable' AND exact_identity THEN 'cleanup'
        WHEN evidence IN ('unadoptable', 'unavailable') THEN 'park'
        ELSE 'retry_same'
      END AS action
    FROM ev
    """,
)
def jobs_recovery_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost-external-attempt recovery decisions
    (``jobs/workflow/compute.rs:12-30`` recovery_action): the evidence
    the reconciler gathered about a lost container attempt maps to
    Observe / RetrySame / Cleanup / Retire / Park — Adoptable evidence
    retries from Submit/Stage/Unsuspend resume points and observes
    otherwise, an exact-identity unadoptable artifact cleans up, other
    unadoptable or unavailable evidence parks the job for a human, a
    tombstone retires it, absence retries. Evidence is modeled
    deterministically over the lost external attempts the
    ``jobs_reconcile_lost`` sweep surfaces (k%11 tombstone precedence,
    else k%7 buckets). Pure CASE algebra over one filter — the decision
    table IS the plan."""
    jobs = load_jobs(spark, sf_dir)
    lost = jobs.filter(
        (F.col("state") == "running")
        & (F.col("lease_expires_ms") < NOW_MS)
        & (F.col("execution_class") == "external")
    ).select(
        "job_id",
        F.substring("job_id", 5, 32).cast("long").alias("k"),
    )
    k = F.col("k")
    tomb = k % 11 == 0
    ev = lost.select(
        "job_id",
        F.when(tomb, "tombstoned")
        .when((k % 7).isin(0, 1, 2), "adoptable")
        .when((k % 7).isin(3, 4), "unadoptable")
        .when(k % 7 == 5, "unavailable")
        .otherwise("absent")
        .alias("evidence"),
        F.when(~tomb & (k % 7 == 0), "submitted").alias("phase"),
        F.when(~tomb & (k % 7 == 0), "submit")
        .when(~tomb & (k % 7 == 1), "stage")
        .when(~tomb & (k % 7 == 2), "finalize")
        .alias("resume"),
        (~tomb & (k % 7 == 3)).alias("exact_identity"),
    )
    retry_adopt = (
        (F.col("phase") == "submitted") & (F.col("resume") == "submit")
    ) | F.col("resume").isin("stage", "unsuspend")
    action = (
        F.when(F.col("evidence") == "tombstoned", "retire")
        .when(
            (F.col("evidence") == "adoptable")
            & F.coalesce(retry_adopt, F.lit(False)),
            "retry_same",
        )
        .when(F.col("evidence") == "adoptable", "observe")
        .when(
            (F.col("evidence") == "unadoptable") & F.col("exact_identity"),
            "cleanup",
        )
        .when(F.col("evidence").isin("unadoptable", "unavailable"), "park")
        .otherwise("retry_same")
    )
    return ev.select(
        "job_id", "evidence", "phase", "resume", "exact_identity",
        action.alias("action"),
    )
