"""Shared durable-queue drain primitives.

Every modeled queue drain (the job schedule, the materialization
queue, the metadata-graph prune queue, the reference-refresh sweep,
the sync mirror-repair queue) instantiates the same three shapes from
the reference's queue discipline:

- the exponential retry ladder ``min(base << min(n, 7), cap)``
  (``operations/src/queue_backoff.rs:1-12``) — one implementation,
  per-queue (base, cap) dials;
- the **bounded due page**: the first BATCH jobs in KEY order among
  the due ones — a distributed TakeOrderedAndProject, never a global
  row_number window (``prune_queue.rs:199-250`` walk order;
  ``jobs/drain.rs`` due index walk);
- the **drain envelope**: ``has_more_due`` (probed at batch+1 keys,
  never a full count) and ``next_due_after_ms`` (0 when more work is
  due NOW — the timer re-arms immediately — else the gap to the next
  maturing job, NULL on an empty future) — the re-arm contract every
  drain tick returns (``prune_queue.rs:226-250``).

At 100 TB the queue relations are metadata-sized; these helpers keep
every tick O(batch): the page is a bounded head, the probe reads
batch+1 keys, and the future-min is one partial aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUEUE_RETRY_BASE_MS = 250  # queue_backoff.rs:1
QUEUE_RETRY_MAX_MS = 30_000  # queue_backoff.rs:2


def backoff_ms(
    attempts: Column,
    base: int = QUEUE_RETRY_BASE_MS,
    cap: int = QUEUE_RETRY_MAX_MS,
) -> Column:
    """``min(base << min(attempts, 7), cap)`` — queue_backoff.rs:8-12."""
    return F.least(
        F.lit(base)
        * F.pow(F.lit(2.0), F.least(attempts, F.lit(7))).cast("long"),
        F.lit(cap),
    )


def due_page(
    jobs: DataFrame,
    now_ms: int,
    batch: int,
    key: Sequence[Column | str],
    due_col: str = "due_at_ms",
) -> DataFrame:
    """The first ``batch`` due jobs in key order — one bounded
    TakeOrderedAndProject head."""
    return jobs.filter(F.col(due_col) <= now_ms).orderBy(*key).limit(batch)


def drain_envelope(
    jobs: DataFrame,
    now_ms: int,
    batch: int,
    due_col: str = "due_at_ms",
    zero_when_more: bool = True,
) -> DataFrame:
    """1-row ``(has_more_due, next_due_after_ms)`` re-arm envelope.

    ``has_more_due`` probes ONE key past the batch budget;
    ``next_due_after_ms`` is the interval to the next maturing job
    (NULL when nothing is pending). When the queue still holds due
    work the prune drain re-arms at 0 (``prune_queue.rs:242-249``,
    ``zero_when_more=True``) while the mirror-repair drain reports
    None (``sync_mirror_repair.rs:400-405``, ``zero_when_more=False``)
    — both re-arm immediately through a separate kick."""
    probe = (
        jobs.filter(F.col(due_col) <= now_ms)
        .limit(batch + 1)
        .agg((F.count(F.lit(1)) > batch).alias("has_more_due"))
    )
    nxt = jobs.filter(F.col(due_col) > now_ms).agg(
        (F.min(due_col) - now_ms).cast("long").alias("__next")
    )
    when_more = (
        F.lit(0).cast("long") if zero_when_more
        else F.lit(None).cast("long")
    )
    return probe.crossJoin(F.broadcast(nxt)).select(
        "has_more_due",
        F.when(F.col("has_more_due"), when_more)
        .otherwise(F.col("__next"))
        .alias("next_due_after_ms"),
    )


def group_representative(
    page: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    count_name: str = "jobs_in_group",
) -> DataFrame:
    """Collapse a drain page to one representative row per group —
    max-by the given order (``prune_queue.rs:398-407``
    representative_job) — carrying the group's job count. The page is
    already batch-bounded, so the window runs over O(batch) rows."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        page.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            count_name,
            F.count(F.lit(1)).over(Window.partitionBy(*group_cols)),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
