"""Cursor-keyed RO-Crate summary cache.

Reference: ``operations/src/metadata/summary_cache.rs`` — summaries
cache per ``graph_iri`` keyed by the document's ``last_event_id``
cursor:

- a hit requires the CURSOR to match (rs:31-33: a replicated cursor
  can lead the local graph content, so a stale entry must never
  serve); a lookup with a newer cursor drops the stale entry;
- capacity is bounded twice: entry count (2,048 — two maximum-size
  list pages) AND total bytes (32 MiB — a few unusually large
  summaries cannot grow the cache without bound, rs:8-12), evicting
  least-recently-used entries;
- a 30 s TTL backstops any coherence hole between the registry
  cursor and local graph content (rs:13-16), matching the query and
  visibility cache TTLs.

Pure driver-side state (the reference's cache is node-local too);
the Spark plan is only consulted on a miss.
"""

from __future__ import annotations

import time
from collections import OrderedDict

SUMMARY_CACHE_ENTRIES = 2_048  # rs:11
SUMMARY_CACHE_BYTES = 32 * 1024 * 1024  # rs:12
SUMMARY_CACHE_TTL_S = 30.0  # rs:16


class SummaryCache:
    """LRU keyed by graph_iri; values are (cursor, summary, expiry)."""

    def __init__(
        self,
        max_entries: int = SUMMARY_CACHE_ENTRIES,
        max_bytes: int = SUMMARY_CACHE_BYTES,
        ttl_s: float = SUMMARY_CACHE_TTL_S,
        clock=time.monotonic,
    ) -> None:
        self.max_entries = max(1, int(max_entries))
        self.max_bytes = int(max_bytes)
        self.ttl_s = float(ttl_s)
        self._clock = clock
        self._entries: OrderedDict[str, tuple[str, str, float]] = (
            OrderedDict()
        )
        self._bytes = 0

    def _drop(self, graph_iri: str) -> None:
        entry = self._entries.pop(graph_iri, None)
        if entry is not None:
            self._bytes -= len(entry[1].encode())

    def get(self, graph_iri: str, cursor: str) -> str | None:
        """The summary iff cached at exactly this cursor and unexpired.
        A mismatching cursor (the document moved) or an expired entry
        drops the row — never serves stale."""
        entry = self._entries.get(graph_iri)
        if entry is None:
            return None
        entry_cursor, summary, expires_at = entry
        if entry_cursor != cursor or self._clock() >= expires_at:
            self._drop(graph_iri)
            return None
        self._entries.move_to_end(graph_iri)
        return summary

    def put(self, graph_iri: str, cursor: str, summary: str) -> None:
        size = len(summary.encode())
        if size > self.max_bytes:
            return  # one summary larger than the whole budget: skip
        self._drop(graph_iri)
        self._entries[graph_iri] = (
            cursor,
            summary,
            self._clock() + self.ttl_s,
        )
        self._bytes += size
        while (
            len(self._entries) > self.max_entries
            or self._bytes > self.max_bytes
        ):
            oldest = next(iter(self._entries))
            self._drop(oldest)

    def invalidate(self, graph_iri: str) -> None:
        """Document sync invalidates ahead of the TTL (rs:31-33)."""
        self._drop(graph_iri)

    @property
    def resident_bytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._entries)


_DEFAULT: SummaryCache | None = None


def default_summary_cache() -> SummaryCache:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = SummaryCache()
    return _DEFAULT
