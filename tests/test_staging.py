"""Staging listing + autoindex parser invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.ops.staging import (
    list_source_level,
    parse_autoindex_pages,
    render_autoindex_pages,
)
from aruna_spark.sources.objects import live_latest, load_object_versions


def _keys(spark, sf_dir):
    # live heads only — delete-marker heads are hidden from staging
    # listings just like ListObjectsV2
    return (
        live_latest(load_object_versions(spark, sf_dir))
        .select("key", "size")
        .cache()
    )


def test_offset_walk_covers_everything_once(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    full = list_source_level(keys, "data", recursive=True, limit=10**6)
    total = full.count()
    seen = []
    offset, limit = 0, 7
    while True:
        page = list_source_level(
            keys, "data", recursive=True, offset=offset, limit=limit
        ).collect()
        seen.extend((r.name, r.kind) for r in page)
        nxt = next((r.next_offset for r in page), None)
        if not page or nxt is None:
            break
        offset = nxt
    assert len(seen) == total == len(set(seen))
    assert [n for n, _ in seen] == sorted(n for n, _ in seen)


def test_files_only_drops_dirs(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    page = list_source_level(
        keys, "data", recursive=True, files_only=True, limit=10**6
    )
    assert page.filter(F.col("kind") != "file").count() == 0
    assert page.count() == keys.count()


def test_autoindex_parser_drops_noise_anchors(spark, sf_dir):
    """Parent link, sort query link, and the ../escape anchor must not
    survive parsing (autoindex.rs:248,443)."""
    pages = render_autoindex_pages(_keys(spark, sf_dir))
    html = pages.limit(1).collect()[0].html
    assert '<a href="../">' in html and "?C=N;O=D" in html
    parsed = parse_autoindex_pages(pages)
    bad = parsed.filter(
        F.col("name").contains("..")
        | F.col("name").startswith("?")
        | (F.col("name") == "")
    )
    assert bad.count() == 0


def test_autoindex_roundtrip_sizes(spark, sf_dir):
    """File sizes survive the render→parse roundtrip; dirs have none."""
    keys = _keys(spark, sf_dir)
    parsed = parse_autoindex_pages(render_autoindex_pages(keys)).cache()
    assert parsed.filter(F.col("is_dir") & F.col("size").isNotNull()).count() == 0
    files = parsed.filter(~F.col("is_dir")).select(
        F.concat_ws(
            "/", F.when(F.col("dir") != "", F.col("dir")), F.col("name")
        ).alias("key"),
        F.col("size").alias("parsed_size"),
    )
    mismatch = files.join(keys, "key", "full").filter(
        (F.col("parsed_size") != F.col("size"))
        | F.col("parsed_size").isNull()
        | F.col("size").isNull()
    )
    assert mismatch.count() == 0
