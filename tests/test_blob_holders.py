"""Blob-holder DHT maintenance (blob_holders.rs): the refresh sweep's
once-per-hash publish discipline and the holder lookup's
classification lanes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.blob_holders import (
    HOLDER_REFRESH_PAGE_SIZE,
    HOLDER_TTL_MS,
    SELF_NODE,
    load_dht_entries,
    load_locations,
)

load_all()


@pytest.fixture(scope="module")
def refresh_rows(spark, sf_dir):
    fn, _ = REGISTRY["blob_holders_refresh"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    return rows


@pytest.fixture(scope="module")
def get_rows(spark, sf_dir):
    fn, _ = REGISTRY["blob_holders_get"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    return rows


def test_refresh_publishes_once_per_distinct_hash(
    spark, sf_dir, refresh_rows
):
    """rs:144-152 — copies of one hash sort together and publish
    exactly once; refreshed == distinct hashes (rs:85-90)."""
    locs = load_locations(spark, sf_dir)
    n_hashes = locs.select("blob_hash").distinct().count()
    assert len(refresh_rows) == n_hashes
    assert sum(r.copies for r in refresh_rows) == locs.count()


def test_refresh_copy_lanes_all_populated(refresh_rows):
    by_copies = {r.copies for r in refresh_rows}
    assert {1, 2, 3} <= by_copies, "primary / replica / cold lanes"


def test_refresh_publish_order_and_pages(refresh_rows):
    ordered = sorted(refresh_rows, key=lambda r: r.blob_hash)
    assert [r.publish_pos for r in ordered] == list(
        range(1, len(ordered) + 1)
    )
    for r in refresh_rows:
        assert r.page == (r.first_scan_pos - 1) // HOLDER_REFRESH_PAGE_SIZE
        assert r.ttl_s == HOLDER_TTL_MS // 1000  # rs:341-357


def test_get_classification_lanes_all_populated(get_rows):
    assert any(r.n_wrong_realm > 0 for r in get_rows)
    assert any(r.n_expired > 0 for r in get_rows)
    assert any(r.n_self > 0 for r in get_rows)
    assert any(r.n_dup_collapsed > 0 for r in get_rows)
    assert any(r.n_holders > 0 for r in get_rows)
    for r in get_rows:
        assert (
            r.n_wrong_realm + r.n_expired + r.n_self <= r.n_entries
        )


def test_get_holders_sorted_deduped_self_excluded(get_rows):
    """rs:253-259 — node ids sort by byte representation, dedup, and
    never include SELF; rs tests:446-481 pin the same three
    properties."""
    for r in get_rows:
        holders = r.holders.split(",") if r.holders else []
        assert len(holders) == r.n_holders
        assert holders == sorted(holders)
        assert len(set(holders)) == len(holders)
        assert SELF_NODE not in holders


def test_get_entry_counts_match_fixture(spark, sf_dir, get_rows):
    entries = load_dht_entries(spark, sf_dir)
    total = entries.count()
    assert sum(r.n_entries for r in get_rows) == total
    # per-hash entry count = h % 4 + 1
    one = entries.groupBy("blob_hash", "h").agg(
        F.count(F.lit(1)).alias("n")
    )
    bad = one.filter(F.col("n") != F.col("h") % 4 + 1).count()
    assert bad == 0


def test_plans_stay_jvm_side(spark, sf_dir):
    for name in ("blob_holders_refresh", "blob_holders_get"):
        fn, _ = REGISTRY[name]
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
