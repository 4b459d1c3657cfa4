"""Streaming plane: watch subscriptions, debounce, LWW merge, inbox.

The same transformation functions run over a batch DataFrame (for the
oracle-checked queries) or a streaming DataFrame (Structured Streaming) —
the idiomatic Spark pattern for keeping stream and batch semantics in
lockstep.
"""

from aruna_spark.streaming.watch import (
    DEFAULT_WATCHES,
    debounce_windows,
    lww_registry,
    match_watches,
    unread_counts,
    watches_df,
)

__all__ = [
    "DEFAULT_WATCHES",
    "debounce_windows",
    "lww_registry",
    "match_watches",
    "unread_counts",
    "watches_df",
]
