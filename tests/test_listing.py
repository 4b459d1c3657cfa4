"""S3 listing invariants: delimiter grouping, token walk, versions."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.ops.listing import list_objects_v2
from aruna_spark.queries import load_all
from aruna_spark.sources.objects import load_object_versions

load_all()


def _latest(spark, sf_dir):
    return load_object_versions(spark, sf_dir).filter(F.col("is_latest")).cache()


def test_delimiter_groups_cover_all_keys(spark, sf_dir):
    latest = _latest(spark, sf_dir)
    total = latest.count()
    grouped = list_objects_v2(latest, prefix="data/", delimiter="/").collect()
    assert all(r.kind == "common_prefix" for r in grouped)
    assert sum(r.n_keys for r in grouped) == total


def test_token_walk_covers_everything_once(spark, sf_dir):
    """Walk pages with the (last_key, last_common_prefix) token; every
    entry appears exactly once and in lexicographic order."""
    latest = _latest(spark, sf_dir)
    entries = []
    last_key, last_cp = "", ""
    for _ in range(100):  # scan-round cap like list_objects_v2.rs:129
        page = list_objects_v2(
            latest,
            prefix="data/src0/",
            delimiter="/",
            start_after=last_key,
            after_common_prefix=last_cp,
            max_keys=3,
        ).collect()
        if not page:
            break
        entries.extend(r.entry for r in page)
        last = page[-1]
        last_key = last.entry
        last_cp = last.entry if last.kind == "common_prefix" else ""
    assert entries == sorted(entries)
    assert len(entries) == len(set(entries))
    # walk found every lang group under src0
    full = list_objects_v2(latest, prefix="data/src0/", delimiter="/").collect()
    assert set(entries) == {r.entry for r in full}


def test_exactly_one_latest_version_per_key(spark, sf_dir):
    v = load_object_versions(spark, sf_dir)
    per_key = v.groupBy("key").agg(
        F.sum(F.col("is_latest").cast("int")).alias("n_latest"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    bad = per_key.filter(
        (F.col("n_latest") != 1) | (F.col("n_versions") < 1)
    ).count()
    assert bad == 0


def test_listing_limit_rules():
    import pytest

    from aruna_spark.ops.listing import resolve_listing_limit

    assert resolve_listing_limit(None) == 50
    assert resolve_listing_limit(None, anonymous=True) == 50
    assert resolve_listing_limit(5_000) == 1_000
    assert resolve_listing_limit(5_000, anonymous=True) == 100
    assert resolve_listing_limit(75, anonymous=True) == 75
    with pytest.raises(ValueError):
        resolve_listing_limit(0)


def test_search_page_rules():
    import pytest

    from aruna_spark.ops.listing import resolve_search_page

    assert resolve_search_page(None) == 25
    assert resolve_search_page(500) == 100
    assert resolve_search_page(40, depth=900) == 40
    with pytest.raises(ValueError):
        resolve_search_page(40, depth=980)
    with pytest.raises(ValueError):
        resolve_search_page(-1)
