"""Shard verification sweep (shard/verify.rs) — ladder edge cases."""

from __future__ import annotations

from aruna_spark.queries.shard_verify import (
    classify_held_shards,
    shard_verification_sweep,
)


def _holders(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, shard int, replica_rank int, node_id string"
    )


def test_registered_sweep_covers_all_verdicts(spark, sf_dir):
    rows = shard_verification_sweep(spark, sf_dir).collect()
    assert rows
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"already_verified", "newly_verified", "unverified"}
    # a marker always wins, whatever the co-holder state (rs:110-112)
    for r in rows:
        if r["shard"] % 5 == 0:
            assert r["verdict"] == "already_verified"


def test_sole_holder_gates_on_genesis(spark):
    """A sole holder is trivially consistent only once its local topic
    genesis exists (rs:156-185) — shard 1 has one, shard 9 (9%7==2)
    does not."""
    holders = _holders(
        spark,
        [("s1", 1, 1, "node-05"), ("s2", 9, 1, "node-05")],
    )
    got = {
        r["shard"]: r["verdict"]
        for r in classify_held_shards(holders, "node-05").collect()
    }
    assert got == {1: "newly_verified", 9: "unverified"}


def test_first_reachable_co_holder_ends_the_walk(spark):
    """The walk stops at the first REACHABLE co-holder: if it diverges
    within the retry budget the shard stays unverified — later
    co-holders are never consulted (rs:240-243). shard 13: rank-2
    node-04 unreachable, rank-3 node-02 reachable-but-diverged,
    rank-4 node-01 would converge."""
    holders = _holders(
        spark,
        [
            ("s", 13, 1, "node-05"),
            ("s", 13, 2, "node-04"),
            ("s", 13, 3, "node-02"),
            ("s", 13, 4, "node-01"),
        ],
    )
    rows = classify_held_shards(holders, "node-05").collect()
    assert len(rows) == 1
    assert rows[0]["co_holder"] == "node-02"
    assert rows[0]["verdict"] == "unverified"
