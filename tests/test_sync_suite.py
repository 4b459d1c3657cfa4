"""Bucket sync relationships + mirror-repair drain
(sync_relationship.rs, sync_mirror_repair.rs, api/routes/sync.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.sync_suite import (
    NOW_MS,
    REPAIR_BATCH_SIZE,
    load_repair_queue,
    load_sync_relationships,
    repair_drain_tick,
    sync_create_validate,
    sync_mirror_repair_drain,
    sync_relationship_list,
)


@pytest.fixture(scope="module")
def rels(spark, sf_dir):
    return load_sync_relationships(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def drain_rows(spark, sf_dir):
    return sync_mirror_repair_drain(spark, sf_dir).collect()


def test_catalog_lanes_populated(rels):
    """Coprimality guard: every state/mode/handling lane alive at
    sf0.001."""
    assert {r.state for r in rels} == {
        "enabled", "paused", "failed", "detached",
    }
    assert {r.mode for r in rels} == {"once", "continuous", "reference"}
    assert {r.reference_handling for r in rels} == {
        "materialize", "preserve", "skip",
    }
    # stored records always satisfy SyncRelationship::validate
    for r in rels:
        if r.mode == "reference":
            assert r.reference_handling == "preserve"
        if r.reference_handling == "preserve":
            assert r.reference_serving
        assert r.source_bucket and r.target_bucket
        assert (r.failure_reason is not None) == (r.state == "failed")


def test_listing_hides_detached_and_foreign(spark, sf_dir, rels):
    listed = {r.relationship_id for r in
              sync_relationship_list(spark, sf_dir).collect()}
    mine = [r for r in rels if r.created_by == "user-3"]
    assert any(r.state == "detached" for r in mine), \
        "detached-exclusion branch must be alive"
    assert listed == {
        r.relationship_id for r in mine if r.state != "detached"
    }
    assert listed, "listing must be non-empty"


def test_drain_covers_every_lane(drain_rows, rels):
    assert {r.result for r in drain_rows} >= {"cleared", "rescheduled"}
    assert {r.action for r in drain_rows} == {
        "ensure_mirror", "delete_mirror",
    }
    by_id = {r.relationship_id: r for r in rels}
    reasons = set()
    for r in drain_rows:
        if r.action == "delete_mirror":
            if r.intent == "delete":
                reasons.add("intent")
            elif r.relationship_id not in by_id:
                reasons.add("missing")
            else:
                assert by_id[r.relationship_id].state == "detached"
                reasons.add("detached")
        else:
            assert r.intent == "reconcile"
            assert by_id[r.relationship_id].state != "detached"
    assert reasons == {"intent", "missing", "detached"}


def test_drain_reschedule_mints_backoff(drain_rows):
    for r in drain_rows:
        if r.result == "rescheduled":
            assert r.next_attempts == r.attempts + 1
            assert r.next_due_at_ms == NOW_MS + min(
                250 << min(r.attempts + 1, 7), 30_000
            )
        else:
            assert r.next_attempts is None and r.next_due_at_ms is None


def test_drain_page_is_bounded_and_ordered(spark, sf_dir, drain_rows):
    """The page is the first BATCH records in (due, id) order among
    the due ones (sync_mirror_repair.rs:604-606)."""
    queue = [r.asDict() for r in
             load_repair_queue(spark, sf_dir).collect()]
    due = sorted(
        (q for q in queue if q["due_at_ms"] <= NOW_MS),
        key=lambda q: (q["due_at_ms"], q["relationship_id"]),
    )
    expected = {q["relationship_id"] for q in due[:REPAIR_BATCH_SIZE]}
    assert {r.relationship_id for r in drain_rows} == expected
    has_more = len(due) > REPAIR_BATCH_SIZE
    assert all(r.has_more_due == has_more for r in drain_rows)
    if not has_more:
        future = [q["due_at_ms"] for q in queue if q["due_at_ms"] > NOW_MS]
        want = (min(future) - NOW_MS) if future else None
        assert all(r.next_due_after_ms == want for r in drain_rows)
    else:
        assert all(r.next_due_after_ms is None for r in drain_rows)


def test_envelope_none_when_more_due(spark):
    """A queue deeper than one batch reports has_more_due with a None
    re-arm (the drain kicks itself — rs:400-405); a shallow queue
    re-arms from the earliest future record."""
    n = REPAIR_BATCH_SIZE + 10
    deep = spark.range(n).select(
        F.col("id").alias("relationship_id"),
        F.lit("reconcile").alias("intent"),
        (F.lit(1_000) + F.col("id")).alias("due_at_ms"),
        F.lit(0).cast("int").alias("attempts"),
    )
    rels = spark.range(n).select(
        F.col("id").alias("relationship_id"),
        F.lit("enabled").alias("state"),
    )
    out = repair_drain_tick(deep, rels, 5_000).collect()
    assert len(out) == REPAIR_BATCH_SIZE
    assert all(r.has_more_due and r.next_due_after_ms is None for r in out)

    shallow = deep.filter(
        (F.col("relationship_id") < 5)
        | (F.col("relationship_id") == n - 1)
    ).withColumn(
        "due_at_ms",
        F.when(F.col("relationship_id") == n - 1, F.lit(9_000))
        .otherwise(F.col("due_at_ms")),
    )
    out = repair_drain_tick(shallow, rels, 5_000).collect()
    assert len(out) == 5
    assert all(
        not r.has_more_due and r.next_due_after_ms == 4_000 for r in out
    )


def test_drain_to_empty_conservation(spark, sf_dir):
    """Iterate drain ticks until the repair queue is empty: every
    staged record resolves exactly once (processed = cleared +
    rescheduled each tick, rescheduled records re-enter and
    eventually clear once the failure condition lapses), and nothing
    outside the due page is touched."""
    rels = load_sync_relationships(spark, sf_dir)
    queue = [r.asDict() for r in
             load_repair_queue(spark, sf_dir).collect()]
    staged_ids = {q["relationship_id"] for q in queue}
    schema = (
        "relationship_id long, intent string, due_at_ms long,"
        " attempts int"
    )
    cleared = set()
    now = NOW_MS
    for _ in range(40):
        if not queue:
            break
        due = sorted(
            (q for q in queue if q["due_at_ms"] <= now),
            key=lambda q: (q["due_at_ms"], q["relationship_id"]),
        )
        if not due:
            now = min(q["due_at_ms"] for q in queue)
            continue
        page_ids = {
            q["relationship_id"] for q in due[:REPAIR_BATCH_SIZE]
        }
        df = spark.createDataFrame(
            [
                (q["relationship_id"], q["intent"], q["due_at_ms"],
                 q["attempts"])
                for q in queue
            ],
            schema,
        )
        out = repair_drain_tick(
            df, rels, now, fail=F.col("attempts") < 2
        ).collect()
        assert {r.relationship_id for r in out} == page_ids
        next_queue = [
            q for q in queue if q["relationship_id"] not in page_ids
        ]
        for r in out:
            if r.result == "cleared":
                assert r.relationship_id not in cleared
                cleared.add(r.relationship_id)
            else:
                next_queue.append(
                    {
                        "relationship_id": r.relationship_id,
                        "intent": r.intent,
                        "due_at_ms": r.next_due_at_ms,
                        "attempts": r.next_attempts,
                    }
                )
        queue = next_queue
        now = max(
            now + 1,
            min((q["due_at_ms"] for q in queue), default=now) + 30_000,
        )
    assert not queue, "repair queue did not drain to empty"
    assert cleared == staged_ids


def test_create_validate_lanes(spark, sf_dir, rels):
    rows = sync_create_validate(spark, sf_dir).collect()
    assert {r.outcome for r in rows} == {
        "bad_endpoint", "same_endpoint", "duplicate", "accepted",
    }
    by_id = {r.relationship_id: r for r in rels}
    for r in rows:
        k = r.request_id
        if k % 13 == 5:
            assert r.outcome == "bad_endpoint"
        elif k % 13 == 7:
            assert r.outcome == "same_endpoint"
        elif k % 13 in (9, 11):
            assert r.outcome == "accepted"
        elif by_id[k].state == "detached":
            # re-creating over a detached stub is allowed
            # (sync_relationship.rs:168-174) — unless ANOTHER live
            # relationship shares the tuple (possible at large sf)
            assert r.outcome in ("accepted", "duplicate")
        else:
            assert r.outcome == "duplicate"
    detached_ok = [
        r for r in rows
        if r.outcome == "accepted" and r.request_id % 13 not in (9, 11)
    ]
    assert detached_ok, "detached-recreate lane must be alive"


def test_legacy_forced_skip_lane_hits_its_anchor(spark, sf_dir):
    """The forced-skip lane pins (bkt2, node5, tgt0) — catalog row
    customer 5, which is continuous with a NULL source prefix at
    every sf — so rows that survive the failure lanes MUST classify
    skipped, never by coincidence (the original bkt1/node0/tgt4
    anchor named customer 49, whose 'p4/' prefix the duplicate scan
    filters out)."""
    from aruna_spark.queries.sync_suite import sync_legacy_migration

    rows = sync_legacy_migration(spark, sf_dir).collect()
    forced = [
        r for r in rows
        if r.legacy_id % 23 in (11, 17) and r.outcome != "failed"
    ]
    assert forced, "forced lane must survive at sf0.001"
    for r in forced:
        assert r.outcome == "skipped"
        assert (r.bucket, r.target_node, r.target_bucket) \
            == ("bkt2", "node5", "tgt0")


def test_create_coerces_reference_handling(spark, sf_dir):
    rows = sync_create_validate(spark, sf_dir).collect()
    accepted = [r for r in rows if r.outcome == "accepted"]
    assert accepted
    for r in accepted:
        k = r.request_id
        if k % 11 >= 8:  # reference mode
            assert r.reference_handling == "preserve"
            assert r.reference_serving
        else:
            assert r.reference_serving == (
                r.reference_handling == "preserve"
            )
    rejected = [r for r in rows if r.outcome != "accepted"]
    assert all(
        r.reference_handling is None and r.reference_serving is None
        for r in rejected
    )


def test_legacy_migration_lanes(spark, sf_dir, rels):
    """migration.rs:52-207 classification: every lane alive at
    sf0.001, summary conserves, completion marker gates on zero
    failures."""
    from aruna_spark.queries.sync_suite import sync_legacy_migration

    rows = sync_legacy_migration(spark, sf_dir).collect()
    assert {r.outcome for r in rows} == {"migrated", "skipped", "failed"}
    reasons = {r.reason for r in rows if r.reason}
    assert reasons == {"bucket_missing", "ws_source", "invalid_target"}
    head = rows[0]
    assert head.n_migrated == sum(
        1 for r in rows if r.outcome == "migrated"
    )
    assert head.n_skipped == sum(
        1 for r in rows if r.outcome == "skipped"
    )
    assert head.n_failed == sum(1 for r in rows if r.outcome == "failed")
    # failures exist at every sf → the marker must not write (rerun
    # retries them, rs:205-207)
    assert head.n_failed > 0 and not head.marks_complete
    # skipped rows genuinely match an existing continuous relationship
    existing = {
        (r.source_bucket, r.target_node, r.target_bucket)
        for r in rels
        if r.mode == "continuous" and r.source_prefix is None
    }
    for r in rows:
        key = (r.bucket, r.target_node, r.target_bucket)
        if r.outcome == "skipped":
            assert key in existing
        if r.outcome == "migrated":
            assert key not in existing
            assert r.mode == "continuous"
            assert len(r.relationship_id) == 26
            assert r.created_by in ("user-a", "user-b", "user-c")
    # deterministic id: same tuple -> same id (idempotence carrier)
    by_tuple = {}
    for r in rows:
        if r.outcome == "migrated":
            key = (r.bucket, r.target_node, r.target_bucket)
            assert by_tuple.setdefault(key, r.relationship_id) \
                == r.relationship_id
