"""Realm quota resolution (realm.rs:216-259, info.rs:1250-1270,
usage_stats.rs:280-434; queries/quota.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.quota import (
    ACTIVE_NODES,
    GRACE_PCT,
    LOCAL_NODE,
    MAX_GROUPS_PER_USER,
    _GROUPS,
    load_node_snapshots,
    quota_status,
)

load_all()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    fn, _ = REGISTRY["usage_quota_status_resolved"]
    out = {r.group_id: r for r in fn(spark, sf_dir).collect()}
    assert len(out) == _GROUPS
    return out


def _status(spark, usage, quota, grace=GRACE_PCT, warn=85):
    df = spark.range(1).select(
        F.lit(usage).cast("long").alias("u"),
        F.lit(quota).cast("long").alias("q"),
        F.lit(grace).cast("int").alias("g"),
    )
    ceiling, warning = quota_status(
        F.col("u"), F.col("q"), F.col("g"), warn_pct=warn
    )
    r = df.select(ceiling.alias("c"), warning.alias("w")).collect()[0]
    return r.c, r.w


def test_fractional_warn_threshold_without_flooring(spark):
    """info.rs:1250-1270 + its own test: the threshold is the exact
    fraction quota * warn / 100 — quota 10, warn 85 -> 8.5: usage 8
    must NOT warn (a floored threshold of 8 would), usage 9 warns."""
    assert _status(spark, 8, 10)[1] is False
    assert _status(spark, 9, 10)[1] is True
    # at the exact fraction: usage*100 == quota*warn -> warned (>=)
    assert _status(spark, 85, 100)[1] is True


def test_unlimited_never_warns(spark):
    c, w = _status(spark, 10**12, None)
    assert c is None and w is False


def test_ceiling_folds_grace(spark):
    assert _status(spark, 0, 1000, grace=110)[0] == 1100
    assert _status(spark, 0, 1000, grace=150)[0] == 1500


def test_at_ceiling_passes_one_byte_over_fails(rows):
    """usage_stats.rs:430-434 — allowed is projected <= ceiling; the
    fixture rows obey it exactly."""
    for r in rows.values():
        if r.ceiling_bytes is None:
            assert r.allowed is True and r.warning is False
        else:
            assert r.allowed == (r.projected_bytes <= r.ceiling_bytes)
            assert r.warning == (
                r.usage_bytes * 100 >= r.quota_bytes * 85
            )


def test_override_resolution(rows):
    assert rows["grp-5"].quota_bytes is None  # explicitly unlimited
    assert rows["grp-8"].quota_bytes == 3_000_000_000
    assert rows["grp-9"].grace_pct == 125  # override grace
    assert rows["grp-2"].grace_pct == GRACE_PCT  # global grace
    assert rows["grp-0"].quota_bytes == 5_000_000_000  # realm default


def test_snapshot_skip_rules(spark, rows):
    """usage_stats.rs:393-411 — own node, inactive nodes, and
    embedded-id mismatches never contribute to the realm-wide sum."""
    snaps = load_node_snapshots(spark).collect()
    expected: dict[str, int] = {}
    for s in snaps:
        if s.key_node == LOCAL_NODE:
            continue
        if s.key_node not in ACTIVE_NODES:
            continue
        if s.embedded_node != s.key_node:
            continue
        expected[s.group_id] = expected.get(s.group_id, 0) + s.snap_bytes
    for gid, r in rows.items():
        assert r.remote_bytes == expected.get(gid, 0)
        assert r.usage_bytes == r.local_bytes + r.remote_bytes
    # each skip rule actually bites somewhere
    assert any(s.key_node == LOCAL_NODE and s.snap_bytes > 0 for s in snaps)
    assert any(
        s.key_node not in ACTIVE_NODES and s.snap_bytes > 0 for s in snaps
    )
    assert any(
        s.embedded_node != s.key_node and s.snap_bytes > 0 for s in snaps
    )


def test_user_group_caps(spark, sf_dir):
    fn, _ = REGISTRY["realm_user_group_caps"]
    rows = {r.user_id: r for r in fn(spark, sf_dir).collect()}
    assert rows["user-7"].max_groups == 0
    assert rows["user-7"].cap_source == "override"
    assert rows["user-7"].headroom == 0
    assert rows["user-11"].max_groups == 10
    assert rows["user-13"].max_groups is None  # explicitly unlimited
    assert rows["user-13"].headroom is None
    defaults = [r for r in rows.values() if r.cap_source == "realm_default"]
    assert defaults
    assert all(r.max_groups == MAX_GROUPS_PER_USER for r in defaults)
    # headroom never negative (realm.rs cap vs owned)
    assert all(
        r.headroom is None or r.headroom >= 0 for r in rows.values()
    )
