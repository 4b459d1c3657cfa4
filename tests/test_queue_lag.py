"""Durable-queue lag probe (queue_lag.rs): snapshot semantics and the
8,192-key scan cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.queue_lag import (
    SCAN_CAP,
    lag_snapshot,
    queue_lag_sample,
)


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return {r.queue: r for r in queue_lag_sample(spark, sf_dir).collect()}


def test_sample_covers_every_modeled_queue(sample):
    assert set(sample) == {
        "job_schedule",
        "metadata_graph_prune",
        "materialization_dead_letters",
        "reference_metadata_refresh",
        "sync_mirror_repair",
    }
    for r in sample.values():
        assert r.depth > 0, "fixture queues must be non-empty"
        assert 0 <= r.due <= r.depth
        assert not r.depth_capped


def test_snapshot_matches_direct_counts(spark, sf_dir, sample):
    from aruna_spark.queries.doc_lifecycle import NOW_MS, prune_jobs

    jobs = prune_jobs(spark, sf_dir)
    r = sample["metadata_graph_prune"]
    assert r.depth == jobs.count()
    due = jobs.filter(F.col("due_at_ms") <= NOW_MS)
    assert r.due == due.count()
    oldest = due.agg(F.min("due_at_ms")).first()[0]
    assert r.oldest_due_age_ms == NOW_MS - oldest


def test_dead_letter_future_requeues_are_pending_not_due(sample):
    """Letters requeue at 49-51k around NOW=50k: some due, some
    pending — pending = depth - due (the reference's tracing line,
    queue_lag.rs:131-139)."""
    r = sample["materialization_dead_letters"]
    assert 0 < r.due < r.depth


def test_scan_cap_pins_depth_and_flags(spark):
    """A queue deeper than the 8-page budget reports depth == cap and
    depth_capped, while oldest-due age stays exact (the page holds
    the oldest keys) — queue_lag.rs:165-175."""
    n = SCAN_CAP + 500
    df = spark.range(n).select(
        (F.lit(1_000) + F.col("id")).alias("t")
    )
    row = lag_snapshot("synthetic", df, F.col("t"), 5_000).first()
    assert row.depth == SCAN_CAP
    assert row.depth_capped
    assert row.oldest_due_age_ms == 5_000 - 1_000
    assert row.due == 4_001  # t in [1000, 5000] within the page


def test_empty_queue_snapshot_is_zeroed(spark):
    df = spark.range(0).select(F.col("id").alias("t"))
    row = lag_snapshot("empty", df, F.col("t"), 1_000).first()
    assert row.depth == 0 and row.due == 0
    assert row.oldest_due_age_ms == 0 and not row.depth_capped
