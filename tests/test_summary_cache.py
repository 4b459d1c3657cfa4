"""Cursor-keyed summary cache (metadata/summary_cache.rs)."""

from __future__ import annotations

from aruna_spark.ops.summary_cache import (
    SUMMARY_CACHE_BYTES,
    SUMMARY_CACHE_ENTRIES,
    SUMMARY_CACHE_TTL_S,
    SummaryCache,
)


def test_reference_constants_pinned():
    assert SUMMARY_CACHE_ENTRIES == 2_048
    assert SUMMARY_CACHE_BYTES == 32 * 1024 * 1024
    assert SUMMARY_CACHE_TTL_S == 30.0


def test_cursor_mismatch_never_serves_and_drops():
    c = SummaryCache()
    c.put("g1", "cur-1", "summary-1")
    assert c.get("g1", "cur-1") == "summary-1"
    # the document moved: the old entry must not serve, and is dropped
    assert c.get("g1", "cur-2") is None
    assert c.get("g1", "cur-1") is None
    assert len(c) == 0


def test_ttl_backstop_expires():
    now = [0.0]
    c = SummaryCache(ttl_s=30.0, clock=lambda: now[0])
    c.put("g1", "cur", "s")
    now[0] = 29.9
    assert c.get("g1", "cur") == "s"
    now[0] = 30.0
    assert c.get("g1", "cur") is None


def test_byte_cap_evicts_lru_and_oversize_skips():
    c = SummaryCache(max_entries=100, max_bytes=10)
    c.put("a", "1", "aaaa")  # 4 bytes
    c.put("b", "1", "bbbb")  # 8 total
    assert c.get("a", "1") == "aaaa"  # a is now most-recent
    c.put("c", "1", "cccc")  # 12 > 10: evicts LRU = b
    assert c.get("b", "1") is None
    assert c.get("a", "1") == "aaaa"
    assert c.resident_bytes <= 10
    c.put("huge", "1", "x" * 11)  # larger than the whole budget
    assert c.get("huge", "1") is None


def test_entry_cap_evicts_lru():
    c = SummaryCache(max_entries=2, max_bytes=1 << 20)
    c.put("a", "1", "s")
    c.put("b", "1", "s")
    c.put("c", "1", "s")
    assert c.get("a", "1") is None
    assert c.get("b", "1") == "s" and c.get("c", "1") == "s"


def test_invalidate_ahead_of_ttl():
    c = SummaryCache()
    c.put("g", "cur", "s")
    c.invalidate("g")
    assert c.get("g", "cur") is None


def test_route_serves_through_cache(spark, sf_dir):
    from aruna_spark.api import Engine
    from aruna_spark.ops.summary_cache import SummaryCache

    eng = Engine(spark, sf_dir)
    cache = SummaryCache()
    from aruna_spark.queries.ingest_suite import rocrate_export_summary

    giri = rocrate_export_summary(spark, sf_dir).limit(1).collect()[0][
        "graph_iri"
    ]
    miss = eng.rocrate_summary(giri, "cur-1", cache=cache)
    assert miss["cached"] is False and miss["summary"]["graph_iri"] == giri
    hit = eng.rocrate_summary(giri, "cur-1", cache=cache)
    assert hit["cached"] is True and hit["summary"] == miss["summary"]
    # a moved cursor recomputes (and never serves the old entry)
    moved = eng.rocrate_summary(giri, "cur-2", cache=cache)
    assert moved["cached"] is False
    assert eng.rocrate_summary("missing-graph", "c", cache=cache) == {
        "summary": None,
        "cached": False,
    }
