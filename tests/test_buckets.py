"""Bucket plane: ListBuckets group filter + keyset walk, GetBucketInfo
roll-up consistency (list_buckets.rs / get_bucket_info.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.api import Engine
from aruna_spark.queries.buckets import (
    bucket_rollups,
    list_buckets,
    load_buckets,
)
from aruna_spark.sources.objects import live_latest, load_object_versions


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_group_filter_and_name_order(spark, sf_dir):
    buckets = load_buckets(spark, sf_dir).cache()
    rollups = bucket_rollups(spark, sf_dir)
    page = list_buckets(buckets, rollups, "grp-main").collect()
    names = [r.name for r in page]
    assert names == sorted(names)
    assert "corpus" in names and "staging" in names
    other = {
        r.name for r in buckets.filter(F.col("group_id") == "grp-other").collect()
    }
    assert not other.intersection(names)


def test_keyset_walk_equals_full_listing(spark, sf_dir, engine):
    """Paged walk at max_buckets=2 == the unpaginated listing, no skip,
    no dup (the token is the last returned name, rs:139-145)."""
    full = [b.name for b in engine.list_buckets()["buckets"]]
    walked, token = [], None
    for _ in range(50):
        out = engine.list_buckets(continuation_token=token, max_buckets=2)
        walked.extend(b.name for b in out["buckets"])
        if not out["buckets"] or not out["buckets"][0].is_truncated:
            break
        token = out["continuation_token"]
    assert walked == full


def test_bucket_info_rollups_match_catalog(spark, sf_dir, engine):
    info = engine.get_bucket_info("corpus")
    assert info["status"] == 200 and info["group_id"] == "grp-main"
    versions = load_object_versions(spark, sf_dir).filter(
        F.col("bucket") == "corpus"
    )
    live = live_latest(versions)
    assert info["object_count"] == live.count()
    assert info["version_count"] == versions.count()
    assert info["total_bytes"] == live.agg(F.sum("size")).collect()[0][0]
    # empty archive bucket: registered, zero roll-ups
    arch = engine.list_buckets(prefix="archive-")["buckets"]
    assert arch and all(b.object_count == 0 for b in arch)
    # unknown bucket
    assert engine.get_bucket_info("nope")["status"] == 404


def test_prefix_filter(engine):
    out = engine.list_buckets(prefix="arch")["buckets"]
    assert out and all(b.name.startswith("archive-") for b in out)
