"""Replication location summary: relationship admission rule,
map_sync_key branches, delete-marker policy, queued pending copies
(replication/location_summary/*.rs + version_replication.rs:473-494)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.location_summary import (
    mapped_key,
    relationships_df,
    replication_location_summary,
)


@pytest.fixture(scope="module")
def summary(spark, sf_dir):
    return {
        r.key: r
        for r in replication_location_summary(spark, sf_dir).collect()
    }


def test_every_head_has_the_nofilter_target(summary):
    """rel-a (no prefixes, deletes on) admits every head — including
    delete markers — at node2:backup under the unchanged key."""
    assert summary
    for key, r in summary.items():
        assert f"node2:backup/{key}" in (r.rel_targets_csv or "")


def test_prefix_relationship_scopes_and_maps(summary):
    """rel-b: only data/src1/ keys, mapped under archive/, and OFF for
    delete markers (replicate_deletes false)."""
    hit = miss = marker_skip = 0
    for key, r in summary.items():
        targets = r.rel_targets_csv or ""
        if key.startswith("data/src1/") and not r.is_delete_marker:
            suffix = key[len("data/src1/"):]
            assert f"node3:mirror/archive/{suffix}" in targets
            hit += 1
        elif key.startswith("data/src1/") and r.is_delete_marker:
            assert "node3:" not in targets
            marker_skip += 1
        else:
            assert "node3:" not in targets
            miss += 1
    assert hit and miss and marker_skip


def test_slash_join_branch(summary):
    """rel-c: src_prefix 'data/src2' leaves a '/'-leading suffix and
    tgt_prefix 'm/' consumes exactly one slash."""
    for key, r in summary.items():
        if key.startswith("data/src2/") and not r.is_delete_marker:
            suffix = key[len("data/src2"):]  # '/en/doc-…'
            assert f"node2:backup2/m{suffix}" in r.rel_targets_csv
            return
    pytest.fail("no data/src2 head found")


def test_excluded_lanes_never_appear(summary):
    """disabled / oneshot / foreign-source / self-target / other-bucket
    relationships contribute nothing (target_of, relationships.rs)."""
    for r in summary.values():
        targets = r.rel_targets_csv or ""
        assert "node5:" not in targets  # rel-d/e/f/h all target node5
        assert "node1:" not in targets  # self target (rel-g)


def test_queued_nodes_are_pending_only(summary):
    lanes = {"node4": 0, "node5": 0}
    for key, r in summary.items():
        doc = int(key.rsplit("doc-", 1)[1].split(".")[0])
        if doc % 6 == 5:
            assert r.queued_nodes_csv == "node4"
            lanes["node4"] += 1
        elif doc % 6 == 2:
            assert r.queued_nodes_csv == "node5"
            lanes["node5"] += 1
        else:
            assert r.queued_nodes_csv is None and r.n_queued == 0
    assert all(lanes.values())


def test_map_sync_key_reference_vectors(spark):
    """map_sync_key (version_replication.rs:473-494) branch vectors."""
    rows = [
        # (key, src_prefix, tgt_prefix, expected)
        ("a/b.txt", None, None, "a/b.txt"),
        ("/lead/b", None, None, "lead/b"),
        ("p/x/y", "p/", None, "x/y"),
        ("p/x/y", "p", "t/", "t/x/y"),     # '/x/y' + 't/' drops one '/'
        ("p/x/y", "p/", "t", "t/x/y"),     # bare + bare joins with '/'
        ("p/x/y", "p/", "t/", "t/x/y"),
        ("q/x", "p/", "t", None),          # prefix miss → no target
        ("p/", "p/", "t", "t"),            # empty suffix → bare concat
    ]
    df = spark.createDataFrame(
        rows,
        "key string, src_prefix string, tgt_prefix string, want string",
    )
    got = df.select(
        "want", mapped_key(F.col("key")).alias("got")
    ).collect()
    for r in got:
        assert r.got == r.want, (r.want, r.got)


def test_relationship_fixture_lanes_complete(spark):
    rels = relationships_df(spark).collect()
    assert {r.rel_id for r in rels} == {
        "rel-a", "rel-b", "rel-c", "rel-d", "rel-e", "rel-f", "rel-g",
        "rel-h",
    }
