"""Blob-replication job queue (replication/queue.rs): identity dedup,
the due batch cut, the reschedule ladder, and the re-arm envelope.

The sf0.001 fixture's due count (~44) sits under the reference's
64-job cap, so the capped lanes are exercised here through the
parameterized helpers (batch_size=16); the sf0.01 driver/selfcheck
oracle run exercises the real 64 cut (due ≈ 445)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.blob_repl_queue import (
    EARLY_NOW_MS,
    NOW_MS,
    REPLICATION_BATCH_SIZE,
    _drain_result,
    classify_drain,
    load_blob_jobs,
    survivors,
)

load_all()

SMALL_BATCH = 16


@pytest.fixture(scope="module")
def winners(spark, sf_dir):
    return survivors(load_blob_jobs(spark, sf_dir)).filter(
        F.col("is_preferred")
    )


@pytest.fixture(scope="module")
def plan_rows(spark, sf_dir):
    rows = classify_drain(
        survivors(load_blob_jobs(spark, sf_dir)), batch_size=SMALL_BATCH
    ).collect()
    assert rows
    return rows


def test_every_classification_lane_populated(plan_rows):
    lanes = {r.outcome for r in plan_rows}
    assert lanes == {
        "superseded_duplicate",
        "batch_succeeded",
        "batch_terminal_failure",
        "batch_rescheduled",
        "due_overflow",
        "future",
    }


def test_batch_is_the_head_of_the_due_scan(plan_rows):
    batch = [r for r in plan_rows if r.outcome.startswith("batch_")]
    assert len(batch) == SMALL_BATCH
    overflow = [
        r.scan_pos for r in plan_rows if r.outcome == "due_overflow"
    ]
    # scan_pos orders ALL winners; within the due subset the batch is
    # its head, so every batch position precedes every overflow one
    assert max(r.scan_pos for r in batch) < min(overflow)


def test_registered_plan_uses_reference_cap(spark, sf_dir):
    fn, _ = REGISTRY["blob_replication_drain_plan"]
    rows = fn(spark, sf_dir).collect()
    batch = [r for r in rows if r.outcome.startswith("batch_")]
    due = batch + [r for r in rows if r.outcome == "due_overflow"]
    assert len(batch) == min(len(due), REPLICATION_BATCH_SIZE)
    assert {r.outcome for r in rows} >= {
        "superseded_duplicate",
        "batch_succeeded",
        "batch_terminal_failure",
        "batch_rescheduled",
        "future",
    }


def test_preferred_record_wins_identity(spark):
    """queue.rs:400-405 — strictly greater (attempts, due_at_ms)
    wins; attempts dominates."""
    rows = [
        # identity A: higher attempts wins despite earlier due
        (1, "on_demand", "b1", "t1", "n1", "n", "", 100, 5),
        (2, "on_demand", "b1", "t1", "n1", "n", "", 900, 2),
        # identity B: equal attempts → later due wins
        (3, "live", "b2", "t2", "n2", "n", "", 100, 1),
        (4, "live", "b2", "t2", "n2", "n", "", 200, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "job_id long, mode string, bucket string, target string, "
        "target_node string, dm_key string, rel_key string, "
        "due_at_ms long, attempts int",
    )
    won = {r.job_id for r in survivors(df).collect() if r.is_preferred}
    assert won == {1, 4}


def test_reschedule_follows_queue_backoff(plan_rows):
    """queue.rs:2160-2196 — retry due = now + min(250 << min(a+1, 7),
    30 000) with attempts+1 (the queue_backoff.rs:19-31 table)."""
    table = {1: 500, 2: 1000, 3: 2000, 4: 4000, 5: 8000, 6: 16000}
    seen = 0
    for r in plan_rows:
        if r.outcome == "batch_rescheduled":
            seen += 1
            assert r.retry_attempts == r.attempts + 1
            assert r.retry_due_at_ms == NOW_MS + table[r.retry_attempts]
        else:
            assert r.retry_attempts is None and r.retry_due_at_ms is None
    assert seen > 0


def test_duplicates_resolve_both_directions(spark, sf_dir):
    """The dup lane's ±700 due shift makes the duplicate win for some
    identities and lose for others — both repair directions covered
    (queue.rs:1983-2009)."""
    s = survivors(load_blob_jobs(spark, sf_dir))
    losers = s.filter(~F.col("is_preferred"))
    split = {
        bool(r.is_dup): r.n
        for r in losers.groupBy("is_dup")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert split.get(True, 0) > 0 and split.get(False, 0) > 0


def test_drain_result_envelope_branches(winners):
    # uncapped (batch bigger than the due set): the envelope re-arms
    # at the earliest of the next maturing job and the reschedules
    early = _drain_result(winners, EARLY_NOW_MS).first()
    assert not early.has_more_due
    assert early.next_due_after_ms is not None
    assert 0 < early.next_due_after_ms <= 500  # future job at +500
    assert early.succeeded + early.failed == early.processed
    # capped (batch smaller than the due set): has_more_due, no
    # re-arm interval — the drain kicks itself (queue.rs:1321-1326)
    late = _drain_result(winners, NOW_MS, batch_size=SMALL_BATCH).first()
    assert late.has_more_due
    assert late.processed == SMALL_BATCH
    assert late.next_due_after_ms is None
    assert late.succeeded + late.failed == late.processed


def test_registered_result_rows_consistent(spark, sf_dir):
    fn, _ = REGISTRY["blob_replication_drain_result"]
    rows = {r.now_ms: r for r in fn(spark, sf_dir).collect()}
    assert set(rows) == {EARLY_NOW_MS, NOW_MS}
    for r in rows.values():
        assert r.succeeded + r.failed == r.processed
        assert r.has_more_due == (r.next_due_after_ms is None) or (
            not r.has_more_due
        )


def test_plan_stays_jvm_side(spark, sf_dir):
    fn, _ = REGISTRY["blob_replication_drain_plan"]
    plan = (
        fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_relationship_stats_match_raw_records(spark, sf_dir):
    """queue.rs:1170-1219 — pending counts raw STORED records (the
    stats scan never dedups), oldest = min enqueue per relationship."""
    fn, _ = REGISTRY["blob_repl_relationship_stats"]
    stats = {r.relationship_id: r for r in fn(spark, sf_dir).collect()}
    raw = load_blob_jobs(spark, sf_dir).filter(F.col("rel_key") != "")
    direct = {
        r.rel_key: (r.n, r.old)
        for r in raw.groupBy("rel_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("enqueued_at_ms").alias("old"),
        )
        .collect()
    }
    assert {k: (v.pending, v.oldest_enqueued_ms) for k, v in stats.items()} == direct
    assert stats  # relationship-mode jobs exist


def test_obligation_sweep_lanes(spark, sf_dir):
    from aruna_spark.queries.blob_repl_queue import (
        classify_obligations,
        load_obligations,
        _targets_df,
    )

    rows = classify_obligations(
        load_obligations(spark, sf_dir), _targets_df(spark), batch_size=16
    ).collect()
    lanes = {r.outcome for r in rows}
    assert lanes == {
        "processed",
        "deferred",
        "hop_capped",
        "origin_skips_config",
    }
    for r in rows:
        if r.outcome == "deferred":
            assert r.queued is None
        elif r.outcome in ("hop_capped", "origin_skips_config"):
            assert r.queued == 0
        else:
            assert r.queued == r.n_targets - r.n_skipped_self - r.n_skipped_marker
    # self-skip and marker-skip lanes both fire somewhere
    assert any(r.n_skipped_self > 0 for r in rows)
    assert any(r.n_skipped_marker > 0 for r in rows)


def test_obligation_no_config_bucket_mints_nothing(spark, sf_dir):
    """rs:1793 — a bucket with no replication config mints zero
    legacy jobs (b6 carries no config; at sf0.001 the 62 obligations
    all fit the reference's 64-page, so b6 rows process)."""
    fn, _ = REGISTRY["blob_repl_obligation_sweep"]
    rows = fn(spark, sf_dir).collect()
    b6 = [r for r in rows if r.bucket == "b6" and r.outcome == "processed"]
    assert b6 and all(r.n_targets == 0 and r.queued == 0 for r in b6)
