"""Usage counter invariants: rollup consistency, dedup inequality."""

from __future__ import annotations

from aruna_spark.queries import REGISTRY, load_all

load_all()


def test_global_vs_group_rollup(spark, sf_dir):
    by_group = REGISTRY["usage_counters_by_group"][0](spark, sf_dir).collect()
    g = REGISTRY["usage_counters_global"][0](spark, sf_dir).collect()[0]
    assert sum(r.logical_bytes for r in by_group) == g.logical_bytes
    assert sum(r.referenced_bytes for r in by_group) == g.referenced_bytes
    assert sum(r.objects for r in by_group) == g.objects
    # content dedup across groups: global stored <= sum of per-group stored
    assert g.stored_blobs <= sum(r.stored_blobs for r in by_group)
    assert g.stored_bytes <= sum(r.stored_bytes for r in by_group)
    # and dedup is real in this data (shared sizes across groups)
    assert g.stored_blobs < sum(r.stored_blobs for r in by_group)


def test_quota_gate_consistency(spark, sf_dir):
    rows = REGISTRY["usage_quota_gate"][0](spark, sf_dir).collect()
    for r in rows:
        assert r.projected_bytes == r.stored_bytes + 50_000
        assert r.allowed == (r.projected_bytes <= r.quota_bytes)


def test_backend_counter_names_and_rollup(spark, sf_dir):
    """Per-backend rows carry exactly the six UsageCounters names
    (usage.rs:162-181) keyed on the backend dimension; logical bytes
    partition across backends (routing is a partition of versions), and
    stored dedup happens within each backend."""
    by_backend = REGISTRY["usage_counters_by_backend"][0](
        spark, sf_dir
    ).collect()
    g = REGISTRY["usage_counters_global"][0](spark, sf_dir).collect()[0]
    assert by_backend and {r.backend for r in by_backend} <= {
        "backend-0", "backend-1", "backend-2"
    }
    names = set(by_backend[0].asDict()) - {"backend"}
    assert names == {
        "buckets", "objects", "stored_blobs", "stored_bytes",
        "logical_bytes", "referenced_bytes",
    }
    # versions partition across backends exactly
    assert sum(r.logical_bytes for r in by_backend) == g.logical_bytes
    assert sum(r.referenced_bytes for r in by_backend) == g.referenced_bytes
    # blobs route whole: per-backend stored sums equal the global
    # (size % 3 is a function of the blob, so no blob spans backends)
    assert sum(r.stored_blobs for r in by_backend) == g.stored_blobs
    assert sum(r.stored_bytes for r in by_backend) == g.stored_bytes
