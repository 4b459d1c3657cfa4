"""Custom stateful operator: timer-after-first-write debounce.

The reference's publish debounce (``operations/src/notifications/watch/
interest.rs:32-37``) arms a timer **when the first dirty write of a burst
lands** and fires it ``DEBOUNCE`` later; writes arriving while the timer is
armed coalesce into that publish, and the next write after the fire starts
a new burst. That is *not* a session window (which extends per write) and
not a tumbling window (whose grid is epoch-aligned, not first-write-
aligned) — it needs real per-key state: the open burst and its deadline.

Spark form: ``applyInPandasWithState`` grouped by ``watch_id`` with an
**event-time timeout** at the burst's publish deadline. In-batch, later
events past the deadline close the burst eagerly; across batches, the
watermark passing the deadline fires the timeout and flushes the open
burst — exactly the reference's timer. State per key is one small tuple
(start, count, last_event_id), so state store size is O(watches), not
O(events): safe at any scale.

The greedy first-write-aligned fold is order-sequential per key, hence
not expressible in single-pass SQL (no oracle row; invariant tests in
``tests/test_stateful_debounce.py`` pin batch==stream==pure-Python).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEBOUNCE_US = 2_000_000  # interest.rs:32-37 (2 s)

OUT_SCHEMA = (
    "watch_id string, burst_start_us long, publish_at_us long, "
    "n_coalesced long, last_event_id long"
)
STATE_SCHEMA = "burst_start_us long, n long, last_event_id long"


def fold_bursts(
    rows: Iterable[tuple[int, int]],
    gap_us: int = DEBOUNCE_US,
    state: tuple[int, int, int] | None = None,
) -> tuple[list[tuple[int, int, int, int]], tuple[int, int, int] | None]:
    """Greedy timer fold over (ts_us, event_id) rows sorted by caller.

    Returns (closed bursts as (start, publish_at, n, last_event_id),
    open-burst state or None). ``state`` carries the open burst across
    micro-batches.
    """
    closed: list[tuple[int, int, int, int]] = []
    for ts_us, event_id in rows:
        if state is not None and ts_us < state[0] + gap_us:
            state = (state[0], state[1] + 1, max(state[2], event_id))
        else:
            if state is not None:
                closed.append((state[0], state[0] + gap_us, state[1], state[2]))
            state = (ts_us, 1, event_id)
    return closed, state


def debounce_timer_batch(
    matched: DataFrame, gap_us: int = DEBOUNCE_US
) -> DataFrame:
    """Batch form: one pandas fold per watch (state is per-watch, so a
    group is all of one watch's matches — fine, since the fold itself is
    O(rows) and emits only burst rows)."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(matched.sparkSession)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        closed, state = fold_bursts(
            zip(pdf["ts_us"], pdf["event_id"]), gap_us
        )
        if state is not None:
            closed.append((state[0], state[0] + gap_us, state[1], state[2]))
        wid = pdf["watch_id"].iloc[0]
        return pd.DataFrame(
            [(wid, *b) for b in closed],
            columns=[
                "watch_id", "burst_start_us", "publish_at_us",
                "n_coalesced", "last_event_id",
            ],
        )

    prepared = matched.select(
        "watch_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    return prepared.groupBy("watch_id").applyInPandas(fn, OUT_SCHEMA)


def debounce_timer_stream(
    matched: DataFrame, gap_us: int = DEBOUNCE_US
) -> DataFrame:
    """Streaming form over a watermarked matched stream.

    Emits closed bursts eagerly within a batch; the open burst is kept in
    state with an event-time timeout at its publish deadline, flushed when
    the watermark passes it (or superseded by the next batch's events)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(matched.sparkSession)

    def fn(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cols = [
            "watch_id", "burst_start_us", "publish_at_us",
            "n_coalesced", "last_event_id",
        ]
        wid = key[0]
        if state.hasTimedOut:
            closed = []
            if state.exists:
                s0, n, last = state.get
                closed.append((wid, s0, s0 + gap_us, n, last))
            state.remove()
            yield pd.DataFrame(closed, columns=cols)
            return
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["ts_us", "event_id"])
        carried = tuple(state.get) if state.exists else None
        closed, open_burst = fold_bursts(
            zip(pdf["ts_us"], pdf["event_id"]), gap_us, carried
        )
        if open_burst is not None:
            state.update(open_burst)
            # fire when the event-time watermark passes the deadline
            state.setTimeoutTimestamp((open_burst[0] + gap_us) // 1000)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            [(wid, *b) for b in closed], columns=cols
        )

    prepared = matched.select(
        "watch_id", "ts", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    return prepared.groupBy("watch_id").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def burst_invariants(bursts: list[Any], gap_us: int = DEBOUNCE_US) -> None:
    """Assert the structural contract of a timer-debounce result: per
    watch, burst starts are strictly increasing, consecutive starts are
    ≥ gap apart, and publish_at = start + gap."""
    by_watch: dict[str, list[Any]] = {}
    for b in bursts:
        by_watch.setdefault(b.watch_id, []).append(b)
    for rows in by_watch.values():
        rows.sort(key=lambda r: r.burst_start_us)
        for prev, cur in zip(rows, rows[1:]):
            assert cur.burst_start_us >= prev.burst_start_us + gap_us
        for r in rows:
            assert r.publish_at_us == r.burst_start_us + gap_us
            assert r.n_coalesced >= 1
