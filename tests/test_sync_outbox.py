"""Replication-plane kernels: placement normalization + LE-epoch key
order, the outbox drain plan's paging/grouping/sub-batch cuts, and the
apply-decision ladder — pinned against the reference's own unit tests
(sync_placement.rs:146-232, core/src/document.rs:1205-1250) plus the
branches the sf0.01 fixture cannot reach (multi-page grouping reset,
sub-batch overflow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.sync_outbox import (
    DRAIN_SUBBATCH_RECORDS,
    OUTBOX_DRAIN_BATCH_SIZE,
    apply_decision,
    drain_plan,
)

REC_SCHEMA = (
    "outbox_id long, kind string, origin_node string, origin_seq long, "
    "uses_shard_topic boolean, topic string, stamped_peers array<string>, "
    "holders array<string>, topic_held boolean, topic_exists boolean"
)


def _rec(
    outbox_id,
    kind="upsert",
    origin_node=None,
    origin_seq=None,
    shard=True,
    topic="t0",
    stamped=("node1",),
    holders=("node1", "node2"),
    held=True,
    exists=True,
):
    return (
        outbox_id,
        kind,
        origin_node,
        origin_seq,
        shard,
        topic,
        list(stamped),
        list(holders),
        held,
        exists,
    )


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, REC_SCHEMA)
    return {
        r["outbox_id"]: r.asDict() for r in drain_plan(df, **kw).collect()
    }


# ---------------------------------------------------------------------------
# key order (document_sync_outbox.rs:26-50)
# ---------------------------------------------------------------------------


def test_drain_key_orders_kind_then_admin_origin_then_ulid(spark):
    rows = [
        _rec(1, kind="upsert"),
        _rec(2, kind="delete"),
        # one origin's admin ops replay in origin_seq order even when
        # their outbox ULIDs arrived interleaved
        _rec(3, kind="admin-operation", origin_node="nodeB", origin_seq=1),
        _rec(4, kind="admin-operation", origin_node="nodeA", origin_seq=9),
        _rec(5, kind="admin-operation", origin_node="nodeA", origin_seq=2),
    ]
    plan = _plan(spark, rows)
    # kind bytes: 'admin-operation' < 'delete' < 'upsert'
    order = sorted(plan, key=lambda oid: plan[oid]["drain_pos"])
    assert order == [5, 4, 3, 2, 1]


def test_drain_ulid_fifo_within_kind(spark):
    rows = [_rec(i, kind="upsert") for i in (30, 10, 20)]
    plan = _plan(spark, rows)
    assert [plan[i]["drain_pos"] for i in (10, 20, 30)] == [1, 2, 3]


# ---------------------------------------------------------------------------
# classification (task_incoming.rs:293-341) + restamp (rs:753-771)
# ---------------------------------------------------------------------------


def test_shared_topic_always_publishes_even_unheld(spark):
    plan = _plan(
        spark,
        [_rec(1, shard=False, topic="realm", held=False, exists=False)],
    )
    assert plan[1]["action"] == "publish"


def test_unheld_topic_is_undeliverable_before_exists_check(spark):
    plan = _plan(spark, [_rec(1, held=False, exists=False)])
    assert plan[1]["action"] == "undeliverable"


def test_missing_genesis_defers_every_record_of_the_topic(spark):
    rows = [
        _rec(1, topic="tX", exists=False),
        _rec(2, topic="tX", exists=False),
        _rec(3, topic="tY", exists=True),
    ]
    plan = _plan(spark, rows)
    assert plan[1]["action"] == plan[2]["action"] == "defer"
    assert plan[3]["action"] == "publish"
    assert plan[1]["group_pos"] is None and plan[1]["subbatch_idx"] is None


def test_restamp_replaces_stale_peers_with_live_holders(spark):
    plan = _plan(
        spark,
        [_rec(1, stamped=("nodeZ",), holders=("node9", "node3"))],
    )
    assert plan[1]["peer_set"] == "node3,node9"  # byte-sorted


def test_restamp_keeps_empty_stamp_and_shared_topics_and_empty_holders(
    spark,
):
    rows = [
        _rec(1, stamped=(), holders=("node9",)),  # empty stamp kept
        _rec(2, shard=False, topic="realm", stamped=("nodeZ",)),
        _rec(3, stamped=("nodeZ",), holders=()),  # config gap keeps stamp
    ]
    plan = _plan(spark, rows)
    assert plan[1]["peer_set"] == ""
    assert plan[2]["peer_set"] == "nodeZ"
    assert plan[3]["peer_set"] == "nodeZ"


# ---------------------------------------------------------------------------
# grouping + sub-batches (task_incoming.rs:803-845, rs:110)
# ---------------------------------------------------------------------------


def test_publish_groups_by_sorted_peer_set_in_btree_order(spark):
    rows = [
        _rec(1, stamped=("node2", "node1"), holders=()),
        _rec(2, stamped=("node1", "node2"), holders=()),
        _rec(3, stamped=("node0",), holders=()),
    ]
    plan = _plan(spark, rows)
    # same peer SET → same group regardless of stamp order
    assert plan[1]["group_pos"] == plan[2]["group_pos"]
    # groups order by peer list: ["node0"] < ["node1","node2"]
    assert plan[3]["group_pos"] == 1
    assert plan[1]["group_pos"] == 2


def test_subbatch_cuts_every_n_records_within_a_group(spark):
    rows = [_rec(i, stamped=("node1",), holders=()) for i in range(1, 8)]
    plan = _plan(spark, rows, subbatch_records=3)
    by_pos = sorted(plan.values(), key=lambda r: r["drain_pos"])
    assert [r["subbatch_idx"] for r in by_pos] == [0, 0, 0, 1, 1, 1, 2]


def test_grouping_resets_per_drain_page(spark):
    # batch_size 2 → pages of two records; the publish-group map is
    # rebuilt per page (publish_groups lives inside the page loop)
    rows = [_rec(i, stamped=("node1",), holders=()) for i in range(1, 5)]
    plan = _plan(spark, rows, batch_size=2)
    assert [plan[i]["page"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert [plan[i]["subbatch_idx"] for i in (1, 2, 3, 4)] == [0, 0, 0, 0]
    assert [plan[i]["group_pos"] for i in (1, 2, 3, 4)] == [1, 1, 1, 1]


def test_drain_constants_match_reference():
    assert OUTBOX_DRAIN_BATCH_SIZE == 4 * 1024  # 4 × topic-batch limit
    assert DRAIN_SUBBATCH_RECORDS == 512


# ---------------------------------------------------------------------------
# apply decision (core/src/document.rs:276-307, tests rs:1205-1250)
# ---------------------------------------------------------------------------

DECISION_SCHEMA = (
    "local_present boolean, l_gen long, l_event long, l_kind string, "
    "i_gen long, i_event long, i_kind string, i_base_gen long, "
    "i_base_event long"
)


def _decide(spark, row):
    df = spark.createDataFrame([row], DECISION_SCHEMA)
    out = df.select(
        apply_decision(
            F.col("local_present"),
            F.col("l_gen"),
            F.col("l_event"),
            F.col("l_kind"),
            F.col("i_gen"),
            F.col("i_event"),
            F.col("i_kind"),
            F.col("i_base_gen"),
            F.col("i_base_event"),
        ).alias("d")
    ).collect()
    return out[0]["d"]


@pytest.mark.parametrize(
    "row,expected",
    [
        # no local change → Apply (rs:1210)
        ((False, None, None, None, 2, 20, "upsert", None, None), "apply"),
        # successor whose base IS the local current → Apply (rs:1214)
        ((True, 1, 10, "upsert", 2, 20, "upsert", 1, 10), "apply"),
        # identical revision, same kind → Apply (idempotent redelivery,
        # rs:1218)
        ((True, 1, 10, "upsert", 1, 10, "upsert", None, None), "apply"),
        # identical revision, kind flip → Conflict
        ((True, 1, 10, "upsert", 1, 10, "delete", None, None), "conflict"),
        # lower generation → SkipStale (rs:1230)
        ((True, 2, 20, "upsert", 1, 10, "upsert", None, None), "skip_stale"),
        # upsert over a tombstone without the tombstone as base →
        # SkipTombstoned, even at HIGHER generation (ladder order:
        # tombstone check precedes the generation race)
        (
            (True, 2, 20, "delete", 1, 10, "upsert", None, None),
            "skip_tombstoned",
        ),
        (
            (True, 2, 20, "delete", 9, 90, "upsert", 5, 50),
            "skip_tombstoned",
        ),
        # upsert rebased ON the tombstone → normal ladder → Apply
        ((True, 2, 20, "delete", 3, 30, "upsert", 2, 20), "apply"),
        # same generation, different event → Conflict (rs:1240)
        ((True, 1, 10, "upsert", 1, 11, "upsert", None, None), "conflict"),
        # higher generation, unobserved base → Conflict
        ((True, 1, 10, "upsert", 2, 20, "upsert", 0, 5), "conflict"),
        ((True, 1, 10, "upsert", 2, 20, "upsert", None, None), "conflict"),
        # delete-over-delete never hits the tombstone rung
        ((True, 2, 20, "delete", 1, 10, "delete", None, None), "skip_stale"),
    ],
)
def test_apply_decision_ladder(spark, row, expected):
    assert _decide(spark, row) == expected


# ---------------------------------------------------------------------------
# placement status (sync_placement.rs:146-232)
# ---------------------------------------------------------------------------


def test_placement_epoch_orders_little_endian(spark, sf_dir):
    from aruna_spark.queries.sync_outbox import sync_placement_status

    rows = sync_placement_status(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["realm_id"], r["strategy_id"]), []).append(r)
    checked = 0
    for group in by_key.values():
        group.sort(key=lambda r: r["scan_pos"])
        epochs = [r["epoch"] for r in group]
        # epoch 256 = LE bytes 00 01 scans BEFORE epoch 1 = 01 00
        if 1 in epochs and 256 in epochs:
            assert epochs.index(256) < epochs.index(1)
            checked += 1
    assert checked > 0  # the fixture actually exercises the inversion


def test_placement_drops_authoritative_and_dedups(spark):
    # sync_placement.rs:225-231: peers [n8, auth, n8, n9] with auth n7
    # → [n8, n9], missing 0 at desired 3 (2 peers + the holder)
    df = spark.createDataFrame(
        [("n7", ["n8", "n7", "n8", "n9"], 3), ("n1", ["n5", "n5"], 3)],
        "authoritative_node string, stamped array<string>, desired int",
    )
    auth = F.col("authoritative_node")
    peers = F.array_sort(
        F.array_distinct(F.filter(F.col("stamped"), lambda p: p != auth))
    )
    out = {
        r["authoritative_node"]: r.asDict()
        for r in df.select(
            auth,
            F.array_join(peers, ",").alias("peers"),
            F.greatest(
                F.col("desired") - (F.size(peers) + 1), F.lit(0)
            ).alias("missing"),
            (F.size(peers) + 1 >= F.col("desired")).alias("satisfied"),
        ).collect()
    }
    assert out["n7"]["peers"] == "n8,n9"
    assert out["n7"]["missing"] == 0 and out["n7"]["satisfied"]
    # rs:218-223: one peer + holder at desired 3 → missing 1
    assert out["n1"]["peers"] == "n5"
    assert out["n1"]["missing"] == 1 and not out["n1"]["satisfied"]


# ---------------------------------------------------------------------------
# placement reconcile sweep (process_placements.rs:344-540)
# ---------------------------------------------------------------------------


def test_reconcile_lane_coverage_and_envelope(spark, sf_dir):
    from aruna_spark.queries.sync_outbox import (
        PLACEMENT_RETRY_AFTER_MS,
        PULL_RETRY_AFTER_MS,
        RECONCILE_REALM,
        sync_placement_reconcile,
    )

    rows = sync_placement_reconcile(spark, sf_dir).collect()
    assert rows and all(r["realm_id"] == RECONCILE_REALM for r in rows)
    actions = {r["action"] for r in rows}
    # the sweep's full ladder is populated at the test scale
    assert {
        "dropped_not_holder",
        "kept_awaiting_genesis",
        "kept_membership_incomplete",
        "satisfied",
    } <= actions
    kept = [r for r in rows if r["action"].startswith("kept")]
    env = rows[0]
    assert env["n_kept"] == len(kept)
    assert env["retry_needed"] is True
    # a pending pull (awaiting genesis) wins the SHORT retry cadence
    assert env["retry_after_ms"] == PULL_RETRY_AFTER_MS
    assert PULL_RETRY_AFTER_MS == 250
    assert PLACEMENT_RETRY_AFTER_MS == 30_000


def test_reconcile_rank0_is_first_holder(spark, sf_dir):
    from aruna_spark.queries.sync_outbox import (
        RECONCILE_LOCAL,
        sync_placement_reconcile,
    )

    rows = sync_placement_reconcile(spark, sf_dir).collect()
    # rank0 ⇔ the local node leads the resolved holder list; solo
    # records (holders == [local]) are rank0 by construction
    for r in rows:
        if r["action"] == "dropped_not_holder":
            assert not r["rank0"]
        if r["action"] == "dropped_solo":
            assert r["rank0"] and r["co_holders"] == ""
    # co_holders never contain the local node
    assert all(
        RECONCILE_LOCAL not in r["co_holders"].split(",") for r in rows
    )
