"""Materialization queue finish/park/requeue (materialization_queue.rs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries.matqueue import (
    DL_REQUEUE_BASE_MS,
    DL_REQUEUE_MAX_MS,
    Q_BASE_MS,
    Q_MAX_MS,
    matq_finish_batch,
    matq_requeue_sweep,
    retry_after_ms,
)


def test_backoff_ladders_value_for_value(spark):
    """queue_backoff.rs's own test vectors, plus the dead-letter
    ladder doubling from 60 s to the 1 h cap."""
    queue_expected = [
        (0, 250), (1, 500), (2, 1_000), (3, 2_000), (4, 4_000),
        (5, 8_000), (6, 16_000), (7, 30_000), (8, 30_000), (100, 30_000),
    ]
    dl_expected = [
        (0, 60_000), (1, 120_000), (2, 240_000), (3, 480_000),
        (4, 960_000), (5, 1_920_000), (6, 3_600_000), (7, 3_600_000),
        (50, 3_600_000),
    ]
    df = spark.createDataFrame(
        [(a,) for a, _ in queue_expected], "attempts int"
    ).select(
        "attempts",
        retry_after_ms(F.col("attempts"), Q_BASE_MS, Q_MAX_MS).alias("ms"),
    )
    assert {(r["attempts"], r["ms"]) for r in df.collect()} == set(
        queue_expected
    )
    df2 = spark.createDataFrame(
        [(a,) for a, _ in dl_expected], "parks int"
    ).select(
        "parks",
        retry_after_ms(
            F.col("parks"), DL_REQUEUE_BASE_MS, DL_REQUEUE_MAX_MS
        ).alias("ms"),
    )
    assert {(r["parks"], r["ms"]) for r in df2.collect()} == set(dl_expected)


def test_finish_batch_branches_and_invariants(spark, sf_dir):
    rows = matq_finish_batch(spark, sf_dir).collect()
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"done", "dropped_superseded", "parked", "rescheduled"}
    for r in rows:
        if r["verdict"] == "parked":
            # parks grew and the requeue instant carries the DL ladder
            assert r["new_parks"] >= 1
            assert r["new_failures"] >= 10
            assert r["requeue_at_ms"] is not None
            assert r["next_due_at_ms"] is None
        elif r["verdict"] == "rescheduled":
            assert r["new_failures"] < 10
            assert r["next_due_at_ms"] is not None
        else:
            assert r["next_due_at_ms"] is None
            assert r["requeue_at_ms"] is None


def test_requeue_sweep_branches_and_budget(spark, sf_dir):
    rows = matq_requeue_sweep(spark, sf_dir).collect()
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {
        "deferred",
        "dropped_missing_event",
        "dropped_superseded",
        "requeued",
    }
    for r in rows:
        if r["verdict"] == "requeued":
            # rs:1073: one failure of remaining budget, parks kept
            assert r["new_failures"] == 9
            assert r["kept_parks"] >= 1
        else:
            assert r["new_failures"] is None
