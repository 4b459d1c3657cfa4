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


# -- the reference's real autoindex fixtures (VERDICT r14 Next #3) -----------
#
# blob/fixtures/autoindex_{nginx,apache_pre,apache_table}.html +
# non_index.html, expectations pinned from the reference's own inline
# tests (blob/src/autoindex.rs:656-749). Until r15 the parser was
# roundtrip-tested against synthetic rendered pages only; these pin the
# full-fidelity kernel (ops/autoindex.py) on the three real-world
# dialects: nginx pre, Apache pre, Apache fancy table.

import pathlib

import pytest

from aruna_spark.ops.autoindex import autoindex_entries, parse_autoindex

_BLOB_FIXDIR = pathlib.Path("/root/reference/blob/fixtures")

needs_blob_fixtures = pytest.mark.skipif(
    not _BLOB_FIXDIR.is_dir(), reason="reference blob fixtures not available"
)


def _fixture_html(name: str) -> str:
    return (_BLOB_FIXDIR / f"{name}.html").read_text()


@needs_blob_fixtures
def test_parses_nginx_autoindex_fixture():
    entries = parse_autoindex("/download/", _fixture_html("autoindex_nginx"))
    assert entries is not None and len(entries) == 4
    assert entries[0]["name"] == "patches"
    assert entries[0]["is_dir"] is True
    assert entries[0]["size"] is None
    assert entries[1]["name"] == "nginx-0.1.0.tar.gz"
    assert entries[1]["is_dir"] is False
    assert entries[1]["size"] == 220_038
    assert entries[1]["modified"] == 1_096_990_740
    assert entries[3]["name"] == "release notes.txt"
    assert entries[3]["size"] == 1_024


@needs_blob_fixtures
def test_parses_apache_pre_autoindex_fixture():
    entries = parse_autoindex(
        "/refseq/release/", _fixture_html("autoindex_apache_pre")
    )
    # The parent link and the absolute footer URL are not index rows.
    assert [e["name"] for e in entries] == [
        "announcements", "complete", "viral", "README", "RELEASE_NUMBER",
    ]
    assert entries[0]["is_dir"] is True
    assert entries[0]["modified"] == 1_783_601_880
    assert entries[3]["is_dir"] is False
    assert entries[3]["size"] == 18 * 1024
    assert entries[4]["size"] == 4


@needs_blob_fixtures
def test_parses_apache_table_autoindex_fixture():
    entries = parse_autoindex(
        "/pub/data/", _fixture_html("autoindex_apache_table")
    )
    # Sort links (?C=N;O=D) and the parent row are skipped.
    assert [e["name"] for e in entries] == [
        "genomes", "checksums.txt", "reads&meta.tsv",
    ]
    assert entries[0]["is_dir"] is True
    assert entries[0]["modified"] == 1_783_606_800
    assert entries[1]["size"] == int(2.5 * 1024)
    assert entries[2]["size"] == 731


@needs_blob_fixtures
def test_rejects_non_index_fixture():
    assert parse_autoindex("/", _fixture_html("non_index")) is None


def test_normalizes_hrefs_and_rejects_traversal():
    # autoindex.rs:722-749 — base-path resolution, traversal, schemes,
    # fragments, sort links, nested hrefs, percent-decoding.
    html = (
        '<html><head><title>Index of /base/dir</title></head><body><pre>\n'
        '<a href="../">../</a>\n'
        '<a href="../evil.txt">../evil.txt</a>\n'
        '<a href="%2e%2e/">dotdot</a>\n'
        '<a href="/outside/path/">outside</a>\n'
        '<a href="/base/dir/child2/">child2/</a>\n'
        '<a href="/base/dir/deep/nested.txt">nested</a>\n'
        '<a href="sub/dir.txt">nested relative</a>\n'
        '<a href="?C=N;O=D">sort</a>\n'
        '<a href="#section">fragment</a>\n'
        '<a href="mailto:admin@example.org">mail</a>\n'
        '<a href="https://other.example.org/file.txt">full url</a>\n'
        '<a href="./child/">child/</a>\n'
        '<a href="foo%20bar.txt">foo bar.txt</a>\n'
        '</pre></body></html>'
    )
    entries = parse_autoindex("/base/dir/", html)
    assert [(e["name"], e["is_dir"]) for e in entries] == [
        ("child2", True), ("child", True), ("foo bar.txt", False),
    ]


@needs_blob_fixtures
def test_spark_autoindex_entries_matches_kernel(spark):
    pages = [
        ("/download/", _fixture_html("autoindex_nginx")),
        ("/refseq/release/", _fixture_html("autoindex_apache_pre")),
        ("/pub/data/", _fixture_html("autoindex_apache_table")),
        ("/x/", _fixture_html("non_index")),  # contributes no rows
    ]
    df = spark.createDataFrame(pages, "dir string, html string")
    rows = autoindex_entries(df).collect()
    want = []
    for dir_, html in pages:
        parsed = parse_autoindex(dir_, html) or []
        for e in parsed:
            want.append((dir_, e["name"], e["is_dir"], e["size"], e["modified"]))
    assert sorted((r["dir"], r["name"], r["is_dir"], r["size"], r["modified"]) for r in rows) == sorted(want)
    assert len(want) == 4 + 5 + 3
