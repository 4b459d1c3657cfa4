"""Metadata materialization queue: finish classification + dead letters.

Reference: ``operations/src/metadata/materialization_queue.rs``:

- **Finish classification** (``defer_materialization_job``,
  rs:1524-1549): only APPLICATION failures consume the budget
  (``MATERIALIZATION_MAX_FAILURES = 10``, rs:57 — infrastructure
  errors retry forever); a job at budget parks as a dead letter,
  otherwise it reschedules with ``attempts+1`` and the queue backoff
  on the incremented count (rs:730-735).
- **Supersession guard** (``materialization_retry_already_advanced``,
  rs:1876-1882): a finished job whose document status moved past it
  (a final status at the same-or-newer event, or more attempts at the
  same event) just deletes its rows — re-parking it would resurrect
  an obsolete event (rs:770-776).
- **Dead letter** (``parked_dead_letter``, rs:921-937): a re-parked
  job keeps ``max(previous.parks, job.parks) + 1`` so the requeue
  backoff keeps growing — doubling from 60 s capped at 1 h
  (rs:62-63, ``retry_after_ms(parks-1, base, max)``).
- **Requeue sweep** (``requeue_dead_letters``, rs:975-1060): due dead
  letters requeue with ``attempts = 0`` and ONE failure of remaining
  budget (``failures = MAX-1``, rs:1073 — a poison document re-parks
  fast), keeping their park count; a missing create event drops the
  letter; a status the document moved past (strictly newer event, or
  Materialized at the same event — ``dead_letter_superseded``,
  rs:1051-1059) drops instead of regressing.

Spark mapping: both sweeps are page-bounded queue relations
(512/batch, 256/requeue page); every per-record state machine above
is a CASE ladder over left-join flags, and the backoff ladders are
``least(shift, 7)`` integer expressions — no UDFs, no windows.

Modeled fixture: documents ``doc_id % 13 == 5`` are the finish
batch; ``% 13 == 7`` are the parked dead letters. NOW = 50_000.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.queue_drain import backoff_ms as retry_after_ms
from aruna_spark.queries import register

MAX_FAILURES = 10  # rs:57
DL_REQUEUE_BASE_MS = 60_000  # rs:62
DL_REQUEUE_MAX_MS = 3_600_000  # rs:63
Q_BASE_MS = 250  # queue_backoff.rs:1
Q_MAX_MS = 30_000  # queue_backoff.rs:2
NOW_MS = 50_000


def _final(state: Column) -> Column:
    return state.isin("materialized", "failed")


def load_finish_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(k % 13 == 5)
        .select(
            F.concat(F.lit("doc-"), k.cast("string")).alias("document_id"),
            (k % 7).cast("int").alias("event_n"),
            F.when(k % 5 < 2, "done")
            .when(k % 5 == 2, "infra_fail")
            .otherwise("app_fail")
            .alias("outcome"),
            (k % 6).cast("int").alias("attempts"),
            (k % 12).cast("int").alias("failures"),
            (k % 3).cast("int").alias("parks"),
            # current per-document status
            ((k % 7) + F.when(k % 9 == 0, 1).when(k % 9 == 1, -1).otherwise(0))
            .cast("int")
            .alias("status_event_n"),
            ((k % 6) + F.when(k % 8 == 2, 1).otherwise(0))
            .cast("int")
            .alias("status_attempts"),
            F.when(k % 4 == 1, "materialized")
            .when(k % 4 == 2, "failed")
            .otherwise("pending")
            .alias("status_state"),
            # previous dead letter for this (document, event)
            F.when(k % 6 == 3, (k % 4 + 2).cast("int")).alias("prev_parks"),
        )
    )


def classify_finish_batch(batch: DataFrame, now_ms: int) -> DataFrame:
    """Done / rescheduled / parked / dropped_superseded per job, with
    the minted due/requeue instants."""
    new_failures = F.col("failures") + F.when(
        F.col("outcome") == "app_fail", 1
    ).otherwise(0)
    advanced = (
        (F.col("status_event_n") >= F.col("event_n"))
        & _final(F.col("status_state"))
    ) | (
        (F.col("status_event_n") == F.col("event_n"))
        & (F.col("status_attempts") > F.col("attempts"))
    )
    new_parks = (
        F.greatest(F.coalesce(F.col("prev_parks"), F.lit(0)), F.col("parks"))
        + 1
    )
    verdict = (
        F.when(F.col("outcome") == "done", F.lit("done"))
        .when(advanced, F.lit("dropped_superseded"))
        .when(new_failures >= MAX_FAILURES, F.lit("parked"))
        .otherwise(F.lit("rescheduled"))
    )
    return batch.select(
        "document_id",
        "event_n",
        verdict.alias("verdict"),
        F.when(
            verdict == "rescheduled",
            F.lit(now_ms)
            + retry_after_ms(F.col("attempts") + 1, Q_BASE_MS, Q_MAX_MS),
        )
        .cast("long")
        .alias("next_due_at_ms"),
        F.when(
            verdict == "parked",
            F.lit(now_ms)
            + retry_after_ms(
                new_parks - 1, DL_REQUEUE_BASE_MS, DL_REQUEUE_MAX_MS
            ),
        )
        .cast("long")
        .alias("requeue_at_ms"),
        F.when(verdict == "parked", new_parks)
        .cast("int")
        .alias("new_parks"),
        F.when(verdict.isin("parked", "rescheduled"), new_failures)
        .cast("int")
        .alias("new_failures"),
    )


def load_dead_letters(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(k % 13 == 7)
        .select(
            F.concat(F.lit("doc-"), k.cast("string")).alias("document_id"),
            (k % 7).cast("int").alias("event_n"),
            (k % 4 + 1).cast("int").alias("parks"),
            (F.lit(49_000) + (k % 3) * 1_000).cast("long").alias(
                "requeue_at_ms"
            ),
            (k % 10 == 6).alias("event_missing"),
            ((k % 7) + F.when(k % 9 == 0, 1).when(k % 9 == 1, -1).otherwise(0))
            .cast("int")
            .alias("status_event_n"),
            F.when(k % 4 == 1, "materialized")
            .when(k % 4 == 2, "failed")
            .otherwise("pending")
            .alias("status_state"),
        )
    )


def requeue_sweep(letters: DataFrame, now_ms: int) -> DataFrame:
    """deferred / dropped_missing_event / dropped_superseded /
    requeued per dead letter, in the reference's check order."""
    superseded = (
        (F.col("status_event_n") >= F.col("event_n"))
        & _final(F.col("status_state"))
        & (
            (F.col("status_event_n") > F.col("event_n"))
            | (F.col("status_state") == "materialized")
        )
    )
    verdict = (
        F.when(F.col("requeue_at_ms") > now_ms, F.lit("deferred"))
        .when(F.col("event_missing"), F.lit("dropped_missing_event"))
        .when(superseded, F.lit("dropped_superseded"))
        .otherwise(F.lit("requeued"))
    )
    return letters.select(
        "document_id",
        verdict.alias("verdict"),
        F.when(verdict == "requeued", F.col("parks"))
        .cast("int")
        .alias("kept_parks"),
        F.when(verdict == "requeued", F.lit(MAX_FAILURES - 1))
        .cast("int")
        .alias("new_failures"),
        F.when(verdict == "requeued", F.lit(now_ms))
        .cast("long")
        .alias("due_at_ms"),
    )


_FINISH_SQL = """
    SELECT 'doc-' || doc_id AS document_id,
           CAST(doc_id % 7 AS INT) AS event_n,
           CASE WHEN doc_id % 5 < 2 THEN 'done'
                WHEN doc_id % 5 = 2 THEN 'infra_fail'
                ELSE 'app_fail' END AS outcome,
           CAST(doc_id % 6 AS INT) AS attempts,
           CAST(doc_id % 12 AS INT) AS failures,
           CAST(doc_id % 3 AS INT) AS parks,
           CAST(doc_id % 7 + CASE WHEN doc_id % 9 = 0 THEN 1
                WHEN doc_id % 9 = 1 THEN -1 ELSE 0 END AS INT)
             AS status_event_n,
           CAST(doc_id % 6 + CASE WHEN doc_id % 8 = 2 THEN 1 ELSE 0 END
             AS INT) AS status_attempts,
           CASE WHEN doc_id % 4 = 1 THEN 'materialized'
                WHEN doc_id % 4 = 2 THEN 'failed'
                ELSE 'pending' END AS status_state,
           CASE WHEN doc_id % 6 = 3 THEN CAST(doc_id % 4 + 2 AS INT) END
             AS prev_parks
    FROM documents WHERE doc_id % 13 = 5
"""


@register(
    "matq_finish_batch",
    oracle=f"""
    WITH batch AS ({_FINISH_SQL}),
    c AS (
      SELECT *,
             failures + CASE WHEN outcome = 'app_fail' THEN 1 ELSE 0 END
               AS nf,
             ((status_event_n >= event_n
               AND status_state IN ('materialized', 'failed'))
              OR (status_event_n = event_n
                  AND status_attempts > attempts)) AS advanced,
             GREATEST(COALESCE(prev_parks, 0), parks) + 1 AS np
      FROM batch
    ),
    v AS (
      SELECT *,
             CASE WHEN outcome = 'done' THEN 'done'
                  WHEN advanced THEN 'dropped_superseded'
                  WHEN nf >= {MAX_FAILURES} THEN 'parked'
                  ELSE 'rescheduled' END AS verdict
      FROM c
    )
    SELECT document_id, event_n, verdict,
           CAST(CASE WHEN verdict = 'rescheduled' THEN
             {NOW_MS} + LEAST({Q_BASE_MS} *
               (1 << LEAST(attempts + 1, 7)), {Q_MAX_MS})
             END AS BIGINT) AS next_due_at_ms,
           CAST(CASE WHEN verdict = 'parked' THEN
             {NOW_MS} + LEAST({DL_REQUEUE_BASE_MS} *
               (1 << LEAST(np - 1, 7)), {DL_REQUEUE_MAX_MS})
             END AS BIGINT) AS requeue_at_ms,
           CAST(CASE WHEN verdict = 'parked' THEN np END AS INT)
             AS new_parks,
           CAST(CASE WHEN verdict IN ('parked', 'rescheduled') THEN nf END
             AS INT) AS new_failures
    FROM v
    """,
)
def matq_finish_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One finish chunk through the budget/supersession ladder: done
    rows clear, advanced documents drop their stale jobs, exhausted
    budgets park with a growing requeue backoff, everything else
    reschedules on the queue ladder."""
    return classify_finish_batch(load_finish_batch(spark, sf_dir), NOW_MS)


_LETTERS_SQL = """
    SELECT 'doc-' || doc_id AS document_id,
           CAST(doc_id % 7 AS INT) AS event_n,
           CAST(doc_id % 4 + 1 AS INT) AS parks,
           CAST(49000 + (doc_id % 3) * 1000 AS BIGINT) AS requeue_at_ms,
           doc_id % 10 = 6 AS event_missing,
           CAST(doc_id % 7 + CASE WHEN doc_id % 9 = 0 THEN 1
                WHEN doc_id % 9 = 1 THEN -1 ELSE 0 END AS INT)
             AS status_event_n,
           CASE WHEN doc_id % 4 = 1 THEN 'materialized'
                WHEN doc_id % 4 = 2 THEN 'failed'
                ELSE 'pending' END AS status_state
    FROM documents WHERE doc_id % 13 = 7
"""


@register(
    "matq_requeue_sweep",
    oracle=f"""
    WITH letters AS ({_LETTERS_SQL}),
    v AS (
      SELECT *,
             CASE WHEN requeue_at_ms > {NOW_MS} THEN 'deferred'
                  WHEN event_missing THEN 'dropped_missing_event'
                  WHEN status_event_n >= event_n
                       AND status_state IN ('materialized', 'failed')
                       AND (status_event_n > event_n
                            OR status_state = 'materialized')
                    THEN 'dropped_superseded'
                  ELSE 'requeued' END AS verdict
      FROM letters
    )
    SELECT document_id, verdict,
           CAST(CASE WHEN verdict = 'requeued' THEN parks END AS INT)
             AS kept_parks,
           CAST(CASE WHEN verdict = 'requeued' THEN {MAX_FAILURES - 1} END
             AS INT) AS new_failures,
           CAST(CASE WHEN verdict = 'requeued' THEN {NOW_MS} END AS BIGINT)
             AS due_at_ms
    FROM v
    """,
)
def matq_requeue_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dead-letter requeue sweep: not-yet-due letters wait, a
    missing create event deletes the letter, moved-past documents
    drop instead of regressing, and the rest requeue immediately with
    one failure of remaining budget and their park count intact."""
    return requeue_sweep(load_dead_letters(spark, sf_dir), NOW_MS)


# The LIVE materialization job queue — keys are
# ``be64(due_at_ms) ‖ document_id ‖ event_id``
# (materialization_queue.rs:2037-2052 materialization_job_key_parts:
# a 40-byte key whose leading 8 bytes are the big-endian due
# timestamp), so the keyspace scans in due order. The lag probe
# (queue_lag.rs:225-268) counts the scanned page, the jobs already
# due, and ages the oldest due job. Fixture: documents % 13 == 3;
# due lane k%27 (40 000 + 800·(k%27): due iff k%27 ≤ 12 at the
# plane's NOW 50 000).
_MAT_JOBS_SQL = """
    mat_jobs AS (
      SELECT 'doc-' || doc_id AS document_id,
             CAST(doc_id % 7 AS INT) AS event_n,
             CAST(40000 + (doc_id % 27) * 800 AS BIGINT) AS due_at_ms,
             CAST(doc_id % 5 AS INT) AS attempts
      FROM documents WHERE doc_id % 13 = 3
    )
"""


def load_mat_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The METADATA_MATERIALIZATION_JOB keyspace: pending jobs on the
    due-prefixed key order."""
    k = F.col("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(k % 13 == 3)
        .select(
            F.concat(F.lit("doc-"), k.cast("string")).alias("document_id"),
            (k % 7).cast("int").alias("event_n"),
            (F.lit(40_000) + (k % 27) * 800).cast("long").alias(
                "due_at_ms"
            ),
            (k % 5).cast("int").alias("attempts"),
        )
    )
