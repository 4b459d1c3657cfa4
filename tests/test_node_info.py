"""Node-info heartbeat utilization (node_info.rs): held-bucket
document counting, the NIL rule, and the load-permille guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.node_info import (
    NODE_INFO_PUBLISH_INTERVAL_S,
    SHARD_COUNT,
    STRATEGIES,
    held_buckets,
    load_registry_placements,
)
from aruna_spark.queries.placement import REPLICA_COUNT

load_all()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    fn, _ = REGISTRY["node_info_heartbeat"]
    out = fn(spark, sf_dir).collect()
    assert len(out) == 25  # one row per configured node, never fewer
    return out


def test_publish_cadence_constant():
    assert NODE_INFO_PUBLISH_INTERVAL_S == 60  # node_info.rs:31


def test_nil_documents_count_for_every_node(rows):
    """node_info.rs:212-215 — NIL placements are held by every local
    node: the same nil_docs lands in every row and documents_held
    decomposes exactly."""
    nils = {r.nil_docs for r in rows}
    assert len(nils) == 1 and nils.pop() > 0
    for r in rows:
        assert r.documents_held == r.bucket_docs + r.nil_docs


def test_held_buckets_cover_replica_count(spark, sf_dir):
    """Each shard topic resolves to at most REPLICA_COUNT holders and
    the held sets partition the resolved buckets."""
    held = held_buckets(spark, sf_dir)
    per_bucket = held.groupBy("strategy", "shard").count().collect()
    assert per_bucket
    assert all(1 <= r["count"] <= REPLICA_COUNT for r in per_bucket)
    assert len(per_bucket) <= len(STRATEGIES) * SHARD_COUNT


def test_bucket_docs_match_direct_membership(spark, sf_dir, rows):
    """Recount one node's bucket documents directly against the held
    set — the everywhere-replicated rule means a doc counts once per
    HOLDING node, not once per replica of the registry row."""
    node = max(rows, key=lambda r: r.bucket_docs).node_id
    held = {
        (r.strategy, r.shard)
        for r in held_buckets(spark, sf_dir)
        .filter(F.col("node_id") == node)
        .collect()
    }
    docs = load_registry_placements(spark, sf_dir).filter(
        ~F.col("is_nil")
    )
    direct = sum(
        1
        for r in docs.collect()
        if (r.strategy, r.shard) in held
    )
    want = next(r for r in rows if r.node_id == node)
    assert want.bucket_docs == direct
    assert want.held_buckets == len(held)


def test_load_permille_guard_rails(rows):
    """rs:232-253: zero cores → 0 (never a division), values clamp to
    0..=1000; all three lanes populated in the fixture."""
    assert all(0 <= r.load_permille <= 1000 for r in rows)
    zero_core = [r for r in rows if int(r.node_id[5:]) % 5 == 0]
    assert zero_core and all(r.load_permille == 0 for r in zero_core)
    assert any(r.load_permille == 1000 for r in rows)
    assert any(0 < r.load_permille < 1000 for r in rows)


def test_permille_rounding_matches_reference():
    """permille_of rounds half away from zero (Rust f64::round):
    load1 = 0.0625 on 25 cores → 2.5‰ → 3."""
    # integer form: (2*a + b) div (2*b) with a = load1_milli, b = cores
    a, b = 125, 50  # 0.125 load on 50 cores = 2.5 permille
    assert (2 * a + b) // (2 * b) == 3


def test_plan_stays_jvm_side(spark, sf_dir):
    fn, _ = REGISTRY["node_info_heartbeat"]
    plan = (
        fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
