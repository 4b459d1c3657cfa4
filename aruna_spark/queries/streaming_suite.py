"""Oracle-checked batch semantics of the streaming plane.

Each query runs the SAME transformation functions the Structured
Streaming pipeline uses (:mod:`aruna_spark.streaming.watch`) over the
batch ``events`` table, so the stream's semantics are value-checked by
DuckDB here and exercised as a real stream in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.streaming.watch import (
    _COMPILED,
    debounce_windows,
    lww_registry,
    match_watches,
    unread_counts,
    watches_df,
)

_D_WATCHES = ", ".join(
    "('" + wid + "', '" + pat + "', [" + ", ".join(f"'{k}'" for k in kinds) + "])"
    for wid, pat, kinds in _COMPILED
)

_D_MATCHED = f"""
    watches(watch_id, pattern, kinds) AS (VALUES {_D_WATCHES}),
    ev AS (
      SELECT *, 'users/' || user_id || '/' || event_type AS path FROM events
    ),
    matched AS (
      SELECT e.*, w.watch_id
      FROM ev e JOIN watches w
        ON regexp_matches(e.path, w.pattern)
       AND list_contains(w.kinds, e.event_type)
    )
"""


def _matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    return match_watches(
        load_table(spark, sf_dir, "events"), watches_df(spark)
    )


@register(
    "stream_watch_matches",
    oracle=f"""
    WITH {_D_MATCHED}
    SELECT watch_id, COUNT(*) AS n_matched,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(epoch_us(ts)) AS first_ts_us, MAX(epoch_us(ts)) AS last_ts_us
    FROM matched GROUP BY watch_id
    """,
)
def stream_watch_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watch interest matching (glob + kind mask) summarized per watch."""
    from aruna_spark.streaming.watch import match_summary

    return match_summary(_matched(spark, sf_dir))


# Subscription birth times for the no-retroactive-delivery guard
# (route_watch_event, notifications/routing.rs:123-125): a watch never
# matches events that occurred before it existed. The events table
# spans 2024-01-01..30; w_clicks is born mid-window, w_errors late.
WATCH_CREATED_MS = {
    "w_clicks": 1_705_300_000_000,
    "w_user1x": 0,
    "w_errors": 1_706_400_000_000,
}

_D_WATCHES_CREATED = ", ".join(
    "('" + wid + "', '" + pat + "', ["
    + ", ".join(f"'{k}'" for k in kinds)
    + f"], {WATCH_CREATED_MS[wid]})"
    for wid, pat, kinds in _COMPILED
)


@register(
    "stream_watch_no_retroactive",
    oracle=f"""
    WITH watches(watch_id, pattern, kinds, created_at_ms) AS
      (VALUES {_D_WATCHES_CREATED}),
    ev AS (
      SELECT *, 'users/' || user_id || '/' || event_type AS path FROM events
    ),
    matched AS (
      SELECT e.*, w.watch_id
      FROM ev e JOIN watches w
        ON regexp_matches(e.path, w.pattern)
       AND list_contains(w.kinds, e.event_type)
       AND w.created_at_ms <= epoch_ms(e.ts)
    )
    SELECT watch_id, COUNT(*) AS n_matched,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(epoch_us(ts)) AS first_ts_us, MAX(epoch_us(ts)) AS last_ts_us
    FROM matched GROUP BY watch_id
    """,
)
def stream_watch_no_retroactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same interest match with subscription birth times: each
    watch only sees events from its creation onward, so the late-born
    error watch matches a strict suffix of ``stream_watch_matches``'s
    rows."""
    from aruna_spark.streaming.watch import match_summary, match_watches

    watches = spark.createDataFrame(
        [
            (wid, pat, kinds, WATCH_CREATED_MS[wid])
            for wid, pat, kinds in _COMPILED
        ],
        "watch_id string, pattern string, kinds array<string>,"
        " created_at_ms long",
    )
    return match_summary(
        match_watches(load_table(spark, sf_dir, "events"), watches)
    )


@register(
    "stream_debounce_windows",
    oracle=f"""
    WITH {_D_MATCHED}
    SELECT watch_id,
           (epoch_us(ts) // 2000000) * 2000000 AS window_start_us,
           COUNT(*) AS n_coalesced,
           MAX(event_id) AS last_event_id
    FROM matched GROUP BY watch_id, (epoch_us(ts) // 2000000) * 2000000
    """,
)
def stream_debounce_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 s debounce: one publish per (watch, tumbling window) — the batch
    form of the stream's watermarked window agg (epoch-aligned, so the
    integer-floor oracle reproduces Spark's window boundaries)."""
    d = debounce_windows(_matched(spark, sf_dir))
    return d.select(
        "watch_id",
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "n_coalesced",
        "last_event_id",
    )


@register(
    "stream_lww_registry",
    oracle="""
    SELECT user_id, last_event_id, ts_us, event_type FROM (
      SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS ts_us,
             event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_lww_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW merge per entity — what foreachBatch applies after the 300 s
    watermark defers late/skewed events."""
    r = lww_registry(load_table(spark, sf_dir, "events"))
    return r.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )


@register(
    "stream_unread_counts",
    oracle=f"""
    WITH {_D_MATCHED}
    SELECT watch_id, COUNT(*) AS n_delivered,
           CAST(SUM(CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unread
    FROM matched GROUP BY watch_id
    """,
)
def stream_unread_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outbox→inbox delivery with unread counts per watch."""
    return unread_counts(_matched(spark, sf_dir))


@register(
    "stream_dashboard_epoch",
    oracle="""
    WITH per_window AS (
      SELECT time_bucket(INTERVAL 2 seconds, ts) AS wstart,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type IN ('signup', 'purchase', 'error')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
      FROM events GROUP BY 1
    )
    SELECT epoch_us(wstart) AS window_start_us, n_events, n_relevant,
           n_relevant > 0 AS bumped,
           CAST(SUM(CASE WHEN n_relevant > 0 THEN 1 ELSE 0 END)
                OVER (ORDER BY wstart) AS BIGINT) AS epoch
    FROM per_window
    """,
)
def stream_dashboard_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard epoch watch (dashboard.rs:6-39): debounce windows where
    a dashboard-relevant change landed bump a monotonically increasing
    epoch. The running sum is over *windows* (bounded by the time span,
    not the event volume), so the single-partition window is safe at
    scale."""
    from aruna_spark.streaming.watch import dashboard_epochs

    return dashboard_epochs(load_table(spark, sf_dir, "events"))


@register(
    "stream_debounce_timer",
    oracle=f"""
    WITH RECURSIVE {_D_MATCHED},
    mts AS MATERIALIZED (
      -- MATERIALIZED: referenced from the recursive term, which would
      -- otherwise re-run the regex match join once per iteration
      SELECT watch_id, epoch_us(ts) AS ts_us, event_id FROM matched
    ),
    -- greedy first-write-aligned burst starts: the first event opens a
    -- burst; the next burst opens at the FIRST event with
    -- ts >= prev_start + gap. Single-pass window functions can't walk
    -- that chain, but each event's JUMP TARGET (the earliest event at
    -- least gap later) is one RANGE-frame window; the recursion then
    -- follows precomputed jumps via cheap equality joins instead of
    -- re-scanning events with an inequality join per iteration.
    jumps AS MATERIALIZED (
      SELECT watch_id, ts_us,
             MIN(ts_us) OVER (
               PARTITION BY watch_id ORDER BY ts_us
               RANGE BETWEEN 2000000 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_start_us
      FROM (SELECT DISTINCT watch_id, ts_us FROM mts)
    ),
    starts AS (
      SELECT watch_id, MIN(ts_us) AS burst_start_us FROM mts
      GROUP BY watch_id
      UNION
      SELECT j.watch_id, j.next_start_us AS burst_start_us
      FROM starts s JOIN jumps j
        ON j.watch_id = s.watch_id AND j.ts_us = s.burst_start_us
      WHERE j.next_start_us IS NOT NULL
    )
    SELECT s.watch_id, s.burst_start_us,
           s.burst_start_us + 2000000 AS publish_at_us,
           COUNT(*) AS n_coalesced,
           MAX(m.event_id) AS last_event_id
    FROM starts s JOIN mts m
      ON m.watch_id = s.watch_id
     AND m.ts_us >= s.burst_start_us
     AND m.ts_us < s.burst_start_us + 2000000
    GROUP BY s.watch_id, s.burst_start_us
    """,
)
def stream_debounce_timer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer-after-first-write debounce (interest.rs:32-37) — the custom
    stateful operator (:mod:`aruna_spark.streaming.stateful`). The greedy
    first-write-aligned fold is order-sequential per key (no SINGLE-PASS
    SQL form), but a recursive CTE walks the burst-start chain — each
    next start is the first event at or past the previous start plus the
    gap — so the fold IS oracle-checked since round 3 (previously the
    registry's one no-oracle exemption). Membership is then a plain
    range join: every event belongs to the latest burst start at or
    before it, by construction of the chain.
    batch==stream==pure-Python parity is separately pinned in
    ``tests/test_stateful_debounce.py``."""
    from aruna_spark.streaming.stateful import debounce_timer_batch

    return debounce_timer_batch(_matched(spark, sf_dir)).orderBy(
        "watch_id", "burst_start_us"
    )


@register(
    "stream_debounce_sessions",
    oracle=f"""
    WITH {_D_MATCHED},
    marked AS (
      SELECT watch_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY watch_id
                                                 ORDER BY ts, event_id)
                       >= 2000000
                  OR lag(epoch_us(ts)) OVER (PARTITION BY watch_id
                                             ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM matched
    ),
    grouped AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY watch_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS grp
      FROM marked
    )
    SELECT watch_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 2000000 AS session_end_us,
           COUNT(*) AS n_coalesced,
           MAX(event_id) AS last_event_id
    FROM grouped GROUP BY watch_id, grp
    """,
)
def stream_debounce_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window debounce: bursts with <2 s gaps coalesce into one
    publish per watch, closing 2 s after the LAST write — the
    gap-extending approximation of interest.rs:32-37 (the exact
    first-write-aligned timer is ``stream_debounce_timer``; sessions
    differ when steady writes arrive faster than the gap). Oracle =
    gaps-and-islands SQL."""
    from aruna_spark.streaming.watch import debounce_sessions

    s = debounce_sessions(_matched(spark, sf_dir))
    return s.select(
        "watch_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_coalesced",
        "last_event_id",
    )


@register(
    "stream_sliding_window_counts",
    oracle="""
    WITH starts AS (
      SELECT event_id, event_type, ts,
             UNNEST([time_bucket(INTERVAL 5 minutes, ts),
                     time_bucket(INTERVAL 5 minutes, ts) - INTERVAL 5 minutes])
               AS wstart
      FROM events
    )
    SELECT epoch_us(wstart) AS window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM starts GROUP BY wstart
    """,
)
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (10 min, slide 5 min) — a windowed
    aggregate the reference lacks entirely (SURVEY §2.9 'absent') but a
    monitoring plane needs; ``F.window`` assigns each event to its two
    overlapping panes, identically on a watermarked stream. The oracle
    expands the same two pane starts per event."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return ev.groupBy(w.alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
    ).select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "n_events",
        "n_errors",
    )


# ------------------------------------------------- inbox prune/retention
# Knobs dialed to the corpus so every prune path fires at test scale
# (the reference constants — 90 d / 30 d / cap 500, notification.rs:11-13
# — stay the library defaults; events span 30 days, ≤86 rows per user):
_P_DIRECT_TTL_MS = 20 * 24 * 60 * 60 * 1000  # direct expires past 20 d
_P_TRANSIENT_TTL_MS = 10 * 24 * 60 * 60 * 1000  # transient past 10 d
_P_CAP = 5  # newest 5 unexpired transients per recipient survive

_D_INBOX = """
    inbox AS (
      SELECT user_id AS recipient, event_id AS notification_id,
             CASE WHEN event_type IN ('click', 'view') THEN 'transient'
                  ELSE 'direct' END AS class,
             epoch_ms(ts) AS created_at_ms,
             event_id % 4 = 0 AS read
      FROM events
    )
"""


@register(
    "stream_inbox_prune",
    oracle=f"""
    WITH {_D_INBOX},
    now_t AS (SELECT MAX(created_at_ms) + 1 AS now_ms FROM inbox),
    flagged AS (
      SELECT i.*,
             i.created_at_ms
               + CASE WHEN i.class = 'transient'
                      THEN {_P_TRANSIENT_TTL_MS}
                      ELSE {_P_DIRECT_TTL_MS} END <= n.now_ms AS expired
      FROM inbox i CROSS JOIN now_t n
    ),
    walked AS (
      SELECT *,
             SUM(CASE WHEN class = 'transient' AND NOT expired
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY recipient
                     ORDER BY created_at_ms DESC, notification_id ASC
                     ROWS UNBOUNDED PRECEDING) AS tseen
      FROM flagged
    ),
    decided AS (
      SELECT *,
             (class = 'transient' AND NOT expired AND tseen > {_P_CAP})
               AS capped
      FROM walked
    )
    SELECT class,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT)
             AS n_expired,
           CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped,
           CAST(SUM(CASE WHEN NOT expired AND NOT capped THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN NOT expired AND NOT capped AND NOT read
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unread_after
    FROM decided GROUP BY class ORDER BY class
    """,
)
def stream_inbox_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbox retention sweep (prune.rs): per-class expiry (created +
    class TTL, read records expiring like unread) plus the per-recipient
    transient cap walked newest-first (the inverted-timestamp key order
    of notification.rs:232-238) — summarized before/after with the
    surviving unread count, pinning unread-after-prune consistency."""
    from aruna_spark.streaming.watch import (
        inbox_records,
        prune_inbox,
        prune_summary,
    )

    verdicts = prune_inbox(
        inbox_records(load_table(spark, sf_dir, "events")),
        direct_ttl_ms=_P_DIRECT_TTL_MS,
        transient_ttl_ms=_P_TRANSIENT_TTL_MS,
        per_user_cap=_P_CAP,
    )
    return prune_summary(verdicts)


# --------------------------------------------- inbox list / mark-read
_N_RECIPIENT = 7  # list pagination subject
_N_HORIZON_RECIPIENT = 12  # mark-read-by-time subject
_N_PAGE = 10
_N_UP_TO_MS = 1_705_276_800_000  # epoch ms of 2024-01-15T00:00:00Z


@register(
    "stream_notifications_page",
    oracle=f"""
    WITH {_D_INBOX},
    mine AS (SELECT * FROM inbox WHERE recipient = {_N_RECIPIENT}),
    page1 AS (
      SELECT * FROM mine
      ORDER BY created_at_ms DESC, notification_id ASC LIMIT {_N_PAGE}
    ),
    cur AS (
      SELECT created_at_ms AS c_ms, notification_id AS c_id FROM page1
      ORDER BY created_at_ms ASC, notification_id DESC LIMIT 1
    )
    SELECT m.recipient, m.notification_id, m.class, m.created_at_ms, m.read
    FROM mine m, cur c
    WHERE m.created_at_ms < c.c_ms
       OR (m.created_at_ms = c.c_ms AND m.notification_id > c.c_id)
    ORDER BY m.created_at_ms DESC, m.notification_id ASC LIMIT {_N_PAGE}
    """,
)
def stream_notifications_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListNotifications page 2 (list.rs): the recipient's inbox
    newest-first (created DESC, id ASC — the inverted-timestamp key
    order), resumed by the (created_at_ms, notification_id) keyset
    cursor the first page ends on (notification_inbox_cursor,
    list.rs:126-138). The oracle derives its cursor by the same walk."""
    from aruna_spark.streaming.watch import inbox_records, list_notifications

    inbox = inbox_records(load_table(spark, sf_dir, "events"))
    page1 = list_notifications(inbox, _N_RECIPIENT, limit=_N_PAGE).collect()
    cursor = (
        (page1[-1].created_at_ms, page1[-1].notification_id)
        if page1
        else None
    )
    return list_notifications(
        inbox, _N_RECIPIENT, cursor=cursor, limit=_N_PAGE
    )


# mark batch: explicit ids for recipient 7 (every 3rd notification id —
# some already read, which must NOT re-mark), a time horizon for
# recipient 12 (everything created up to 2024-01-15)
_D_MARKS = f"""
    SELECT recipient, notification_id, CAST(NULL AS BIGINT) AS up_to_ms
    FROM inbox
    WHERE recipient = {_N_RECIPIENT} AND notification_id % 3 = 0
    UNION ALL
    SELECT {_N_HORIZON_RECIPIENT}, CAST(NULL AS BIGINT), {_N_UP_TO_MS}
"""


@register(
    "stream_mark_read",
    oracle=f"""
    WITH {_D_INBOX},
    marks AS ({_D_MARKS}),
    ids AS (
      SELECT DISTINCT recipient, notification_id FROM marks
      WHERE notification_id IS NOT NULL
    ),
    horizons AS (
      SELECT recipient, MAX(up_to_ms) AS up_to_ms FROM marks
      WHERE up_to_ms IS NOT NULL GROUP BY recipient
    ),
    applied AS (
      SELECT i.*,
             (NOT i.read) AND (
               EXISTS (SELECT 1 FROM ids d
                       WHERE d.recipient = i.recipient
                         AND d.notification_id = i.notification_id)
               OR COALESCE(i.created_at_ms <= (SELECT h.up_to_ms
                                              FROM horizons h
                                              WHERE h.recipient = i.recipient),
                           FALSE)
             ) AS newly_marked
      FROM inbox i
    )
    SELECT recipient,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN NOT read THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unread_before,
           CAST(SUM(CASE WHEN newly_marked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_marked,
           CAST(SUM(CASE WHEN NOT read AND NOT newly_marked
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unread_after
    FROM applied
    WHERE recipient IN ({_N_RECIPIENT}, {_N_HORIZON_RECIPIENT})
    GROUP BY recipient ORDER BY recipient
    """,
)
def stream_mark_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MarkRead applied (mark_read.rs): explicit-id marks for one
    recipient (already-read rows never re-mark, rs:175-178) and an
    up_to_ms horizon for another — per-recipient marked counts and the
    unread before/after parity."""
    from aruna_spark.streaming.watch import inbox_records, mark_read

    inbox = inbox_records(load_table(spark, sf_dir, "events"))
    ids = inbox.filter(
        (F.col("recipient") == _N_RECIPIENT)
        & (F.col("notification_id") % 3 == 0)
    ).select(
        "recipient",
        "notification_id",
        F.lit(None).cast("long").alias("up_to_ms"),
    )
    horizon = spark.createDataFrame(
        [(_N_HORIZON_RECIPIENT, None, _N_UP_TO_MS)],
        "recipient long, notification_id long, up_to_ms long",
    )
    from aruna_spark.ops.mat import DISK_ONLY

    # the request-sized mark batch is read twice inside mark_read (the
    # explicit-id lane and the horizon lane); materialize it once so
    # neither broadcast build re-derives the inbox events scan
    marks = ids.unionByName(horizon).localCheckpoint(
        eager=True, storageLevel=DISK_ONLY
    )
    applied = mark_read(inbox, marks)
    return (
        applied.filter(
            F.col("recipient").isin(_N_RECIPIENT, _N_HORIZON_RECIPIENT)
        )
        .groupBy("recipient")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            # ``read`` was updated in place; before = after + marked
            F.sum(
                (F.col("newly_marked") | ~F.col("read")).cast("int")
            )
            .cast("long")
            .alias("n_unread_before"),
            F.sum(F.col("newly_marked").cast("int"))
            .cast("long")
            .alias("n_marked"),
            F.sum((~F.col("read")).cast("int"))
            .cast("long")
            .alias("n_unread_after"),
        )
        .orderBy("recipient")
    )
