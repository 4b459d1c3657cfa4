"""Durable-queue lag probe (queue_lag.rs): per-keyspace snapshot
semantics, the reference's five-queue list, and the 8,192-key scan
cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.queue_lag import (
    SCAN_CAP,
    depth_snapshot,
    due_snapshot,
    outbox_snapshot,
    queue_lag_sample,
)

REFERENCE_QUEUES = {
    # queue_lag.rs:41-48 DurableQueueLagSample field order
    "document_sync_outbox",
    "metadata_materialization",
    "metadata_materialization_dead_letters",
    "blob_replication",
    "reference_metadata_refresh",
}


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return {r.queue: r for r in queue_lag_sample(spark, sf_dir).collect()}


def test_sample_covers_reference_keyspaces_plus_labeled_extras(sample):
    """VERDICT r11 Next #2: the sample covers the reference's exact
    five keyspaces (queue_lag.rs:12-16); repo-modeled extras carry a
    ``repo:`` label so the parity surface stays unambiguous."""
    assert REFERENCE_QUEUES <= set(sample)
    extras = set(sample) - REFERENCE_QUEUES
    assert extras and all(q.startswith("repo:") for q in extras)
    for r in sample.values():
        assert r.depth > 0, "fixture queues must be non-empty"
        assert 0 <= r.due <= r.depth
        assert not r.depth_capped


def test_depth_only_probes_zero_age_and_due(sample):
    """probe_queue_depth (queue_lag.rs:270-292): the dead-letter,
    blob-replication and reference-refresh probes carry no record-age
    semantics — due and oldest_age_ms are 0 by contract."""
    for q in (
        "metadata_materialization_dead_letters",
        "blob_replication",
        "reference_metadata_refresh",
    ):
        assert sample[q].due == 0
        assert sample[q].oldest_age_ms == 0


def test_outbox_snapshot_ages_oldest_enqueue(spark, sf_dir, sample):
    """probe_outbox_lag (queue_lag.rs:183-221): oldest_age_ms = now −
    the scanned page's oldest ULID enqueue timestamp; due stays 0."""
    from aruna_spark.queries.sync_outbox import load_outbox_keys
    from aruna_spark.queries.sync_suite import NOW_MS

    keys = load_outbox_keys(spark, sf_dir)
    r = sample["document_sync_outbox"]
    assert r.depth == keys.count()
    oldest = keys.agg(F.min("enqueued_ms")).first()[0]
    assert r.oldest_age_ms == NOW_MS - oldest
    assert r.due == 0


def test_materialization_snapshot_counts_due(spark, sf_dir, sample):
    """probe_materialization_lag (queue_lag.rs:225-268): due counts
    mature jobs, oldest_age_ms ages the oldest due one."""
    from aruna_spark.queries.matqueue import NOW_MS, load_mat_jobs

    jobs = load_mat_jobs(spark, sf_dir)
    r = sample["metadata_materialization"]
    assert r.depth == jobs.count()
    due = jobs.filter(F.col("due_at_ms") <= NOW_MS)
    assert r.due == due.count()
    assert 0 < r.due < r.depth, "fixture holds both due and pending"
    oldest = due.agg(F.min("due_at_ms")).first()[0]
    assert r.oldest_age_ms == NOW_MS - oldest


def test_repo_extra_snapshot_matches_direct_counts(spark, sf_dir, sample):
    from aruna_spark.queries.doc_lifecycle import NOW_MS, prune_jobs

    jobs = prune_jobs(spark, sf_dir)
    r = sample["repo:metadata_graph_prune"]
    assert r.depth == jobs.count()
    due = jobs.filter(F.col("due_at_ms") <= NOW_MS)
    assert r.due == due.count()
    oldest = due.agg(F.min("due_at_ms")).first()[0]
    assert r.oldest_age_ms == NOW_MS - oldest


def test_scan_cap_pins_depth_and_flags(spark):
    """A queue deeper than the 8-page budget reports depth == cap and
    depth_capped, while oldest-due age stays exact (the page holds
    the oldest keys) — queue_lag.rs:165-175."""
    n = SCAN_CAP + 500
    df = spark.range(n).select(
        (F.lit(1_000) + F.col("id")).alias("t")
    )
    row = due_snapshot("synthetic", df, F.col("t"), 5_000).first()
    assert row.depth == SCAN_CAP
    assert row.depth_capped
    assert row.oldest_age_ms == 5_000 - 1_000
    assert row.due == 4_001  # t in [1000, 5000] within the page


def test_scan_cap_depth_only_probe(spark):
    df = spark.range(SCAN_CAP + 1).select(F.col("id").alias("x"))
    row = depth_snapshot("synthetic", df).first()
    assert row.depth == SCAN_CAP and row.depth_capped


def test_outbox_cap_ages_page_oldest_not_global(spark):
    """A capped outbox scan ages the oldest enqueue of the PAGE (key
    order, which is NOT time order) — exactly what the reference's
    bounded walk sees (queue_lag.rs:199-207)."""
    n = SCAN_CAP + 100
    df = spark.range(n).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("kind"),
        F.lit("").alias("origin_node"),
        F.lit(0).alias("origin_seq"),
        F.col("id").alias("outbox_id"),
        # enqueue time DESCENDS as keys ascend: the global oldest
        # enqueue lives on the keys past the cap
        (F.lit(100_000) - F.col("id")).alias("enqueued_ms"),
    )
    row = outbox_snapshot("synthetic", df, 200_000).first()
    assert row.depth == SCAN_CAP and row.depth_capped
    # page = first SCAN_CAP keys → min enqueue over the page is
    # 100_000 - (SCAN_CAP - 1), not the global min 100_000 - (n - 1)
    assert row.oldest_age_ms == 200_000 - (100_000 - (SCAN_CAP - 1))


def test_empty_queue_snapshot_is_zeroed(spark):
    df = spark.range(0).select(F.col("id").alias("t"))
    row = due_snapshot("empty", df, F.col("t"), 1_000).first()
    assert row.depth == 0 and row.due == 0
    assert row.oldest_age_ms == 0 and not row.depth_capped
