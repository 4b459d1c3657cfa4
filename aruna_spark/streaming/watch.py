"""Watch subscriptions, debounced publish, LWW merge, inbox counts.

Reference semantics:
- watch = glob path + event-kind mask per subscriber
  (``core/src/structs/notification_watch.rs:80-121``); events match by
  path glob AND kind mask;
- publishes debounce: a timer fires 2 s after the first dirty write of a
  burst, later writes coalesce
  (``operations/src/notifications/watch/interest.rs:32-37``);
- late/skewed events: LWW on wall clock with events > 300 s in the
  future deferred (``operations/src/metadata/projector.rs:68-92``) —
  in Spark: ``withWatermark("ts", "300 seconds")`` + LWW row_number;
- outbox → inbox delivery with unread counts
  (``operations/src/notifications/{outbox,inbox,unread}.rs``).

Every function here takes ANY DataFrame — batch or streaming — and
returns pure transformations, so the oracle-checked batch queries and
the Structured Streaming pipeline share one implementation. Event
"paths" are ``users/{user_id}/{event_type}``. One documented exception:
:func:`dashboard_epochs` is the batch/backfill form of the epoch
counter (a cumulative scan over all history — window functions are not
defined on unbounded streams); the live-stream form is the per-trigger
``foreachBatch`` running counter exercised in
``tests/test_streaming.py``, and the function raises on a streaming
input rather than failing later at execution.

Scale: watch tables are small → stream-static broadcast join; the
debounce window and LWW are standard watermarked stateful aggs whose
state is bounded by (watch × open windows) and (entity count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.ops.globs import glob_to_regex

DEBOUNCE = "2 seconds"  # interest.rs:32-37
MAX_CLOCK_SKEW = "300 seconds"  # projector.rs:68-92

# (watch_id, path glob, event kinds) — narrow glob, segment wildcard, and
# a catch-all kind filter, mirroring the reference's test shapes.
DEFAULT_WATCHES = [
    ("w_clicks", "users/*/click", ["click"]),
    ("w_user1x", "users/1?/**", ["click", "view", "error"]),
    ("w_errors", "**", ["error"]),
]

_COMPILED = [
    (wid, glob_to_regex(g), kinds) for wid, g, kinds in DEFAULT_WATCHES
]


def watches_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _COMPILED,
        "watch_id string, pattern string, kinds array<string>",
    )


def with_path(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "path",
        F.concat(
            F.lit("users/"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            F.col("event_type"),
        ),
    )


def match_watches(events: DataFrame, watches: DataFrame) -> DataFrame:
    """Stream-static join: events × (broadcast) watches on glob + mask.

    A ``created_at_ms`` column on ``watches`` opts into the
    no-retroactive-delivery guard: a subscription never matches events
    that occurred before it existed (``route_watch_event``,
    notifications/routing.rs:123-125)."""
    cond = F.regexp_like(F.col("path"), F.col("pattern")) & F.array_contains(
        F.col("kinds"), F.col("event_type")
    )
    if "created_at_ms" in watches.columns:
        cond = cond & (F.col("created_at_ms") <= F.unix_millis(F.col("ts")))
    return with_path(events).join(F.broadcast(watches), cond)


def match_summary(matched: DataFrame) -> DataFrame:
    """Per-watch roll-up of a matched-events relation: match count,
    distinct users, first/last event micros — the summary the
    ``stream_watch_matches`` oracle checks and the facade's
    ``watch_summary`` route serves."""
    return matched.groupBy("watch_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(F.unix_micros("ts")).alias("first_ts_us"),
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
    )


def debounce_windows(matched: DataFrame, debounce: str = DEBOUNCE) -> DataFrame:
    """Coalesce bursts per watch into tumbling debounce windows: one
    publish per (watch, window) regardless of how many events land in
    it. On a stream, pair with ``withWatermark`` before this call."""
    return matched.groupBy(
        "watch_id", F.window("ts", debounce).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_coalesced"),
        F.max("event_id").alias("last_event_id"),
    )


def lww_registry(events: DataFrame) -> DataFrame:
    """Last-writer-wins per entity: (user_id, last_event_id, ts, type).

    Batch form of the projector's merge; the streaming pipeline applies
    it inside ``foreachBatch`` after a 300 s watermark has deferred
    far-future/late data.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def debounce_sessions(matched: DataFrame, gap: str = DEBOUNCE) -> DataFrame:
    """Burst coalescing with SESSION windows — the faithful shape of the
    reference's debounce (interest.rs:32-37: the timer fires ``gap``
    after the first dirty write of a burst, and writes landing within
    the gap coalesce into the same publish). ``session_window`` merges
    events whose gaps are < ``gap`` per watch; the publish fires at
    session close (end = last event + gap). Works identically on a
    watermarked stream — Spark's native stateful session operator — so
    no custom state management is needed."""
    return matched.groupBy(
        "watch_id", F.session_window("ts", gap).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_coalesced"),
        F.max("event_id").alias("last_event_id"),
    )


# event kinds whose sync targets are dashboard-relevant — the analog of
# targets_change_dashboard (operations/src/dashboard.rs:23-39): identity /
# registry / usage changes bump the epoch; pure content traffic does not.
DASHBOARD_KINDS = ("signup", "purchase", "error")


def dashboard_epochs(events: DataFrame, debounce: str = DEBOUNCE) -> DataFrame:
    """Dashboard epoch counter (dashboard.rs:6-39): one tumbling debounce
    window per burst; a window containing ≥1 dashboard-relevant event
    bumps the epoch, and subscribers see the running epoch value. This is
    the batch/backfill form (cumulative sum over window starts); the
    live-stream form is the per-trigger ``foreachBatch`` running counter
    (see module docstring).

    The running sum is a THREE-level distributed prefix scan — a pure,
    lazy plan with NO global ``Window.orderBy`` (that would move every
    debounce window through one partition — the `WindowExec: No
    Partition Defined` class, VERDICT r4) and NO driver-side collect:

    1. month offsets: a strictly-earlier theta self-join over the
       per-month bump totals (one row per month of corpus history —
       a ≤thousands-row broadcast nested loop forever);
    2. hour offsets: partitioned cumulative window over hours WITHIN
       each month (≤744 rows per partition);
    3. epoch: partitioned cumulative window over debounce windows
       WITHIN each hour (≤1800 rows per partition).

    Same shape as the classic two-pass zipWithIndex scan, with the
    top-level pass expressed as a (bounded) join instead of a collect,
    so construction stays lazy and nothing executes twice."""
    if events.isStreaming:
        raise ValueError(
            "dashboard_epochs is the batch/backfill epoch scan; on a "
            "stream, publish the running epoch with the foreachBatch "
            "counter (tests/test_streaming.py)"
        )
    per_window = events.groupBy(F.window("ts", debounce).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type").isin(*DASHBOARD_KINDS), 1).otherwise(0)
        ).alias("n_relevant"),
    )
    bump = (F.col("n_relevant") > 0).cast("int")
    # r15: both frames are time-span-bounded (one row per debounce
    # window / per hour); materialize them once — the three prefix
    # levels otherwise re-run the events groupBy up to six times
    bucketed = per_window.withColumn(
        "bucket", F.date_trunc("hour", F.col("w.start"))
    ).withColumn("bump", bump).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    hours = bucketed.groupBy(
        F.date_trunc("month", F.col("bucket")).alias("mon"), "bucket"
    ).agg(F.sum("bump").alias("n_bumps")).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    months = hours.groupBy("mon").agg(F.sum("n_bumps").alias("mon_bumps"))
    earlier = months.select(
        F.col("mon").alias("mon2"), F.col("mon_bumps").alias("mb2")
    )
    mon_off = (
        months.join(F.broadcast(earlier), F.col("mon2") < F.col("mon"), "left")
        .groupBy("mon")
        .agg(F.coalesce(F.sum("mb2"), F.lit(0)).alias("mon_off"))
    )
    hour_cum = (
        Window.partitionBy("mon")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hour_off = hours.join(F.broadcast(mon_off), "mon").select(
        "bucket",
        (
            F.col("mon_off")
            + F.coalesce(F.sum("n_bumps").over(hour_cum), F.lit(0))
        ).alias("epoch_offset"),
    )
    cum = (
        Window.partitionBy("bucket")
        .orderBy(F.col("w.start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.join(F.broadcast(hour_off), "bucket").select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "n_events",
        "n_relevant",
        bump.cast("boolean").alias("bumped"),
        (F.col("epoch_offset") + F.sum("bump").over(cum)).alias("epoch"),
    )


def dedup_deliveries(matched: DataFrame, watermark: str = MAX_CLOCK_SKEW) -> DataFrame:
    """Exactly-once inbox delivery: the outbox may redeliver an event
    (at-least-once transport), so the inbox drain dedups on the delivery
    key before counting (``operations/src/notifications/inbox.rs`` —
    inbox writes are idempotent per event id). On a stream this is
    ``dropDuplicatesWithinWatermark`` — state bounded by the 300 s skew
    window, not by history; on a batch frame it degrades to a plain
    dropDuplicates over the same key."""
    keys = ["watch_id", "event_id"]
    if matched.isStreaming:
        return matched.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return matched.dropDuplicates(keys)


def unread_counts(matched: DataFrame) -> DataFrame:
    """Inbox unread counts per watch: delivery marks every 4th event id
    read (deterministic stand-in for read receipts)."""
    inbox = matched.withColumn("read", F.col("event_id") % 4 == 0)
    return inbox.groupBy("watch_id").agg(
        F.count(F.lit(1)).alias("n_delivered"),
        F.sum(F.when(~F.col("read"), 1).otherwise(0)).alias("n_unread"),
    )


# ---------------------------------------------------- inbox prune/retention
# The reference prunes the notification inbox on a schedule
# (operations/src/notifications/prune.rs): a record expires at
# created_at_ms + its class TTL (core/src/structs/notification.rs:172-174;
# Direct 90 d, Transient 30 d — notification.rs:11-12), read records
# expiring exactly like unread ones (prune.rs read_records_expire_like_unread),
# and beyond that each recipient keeps at most
# NOTIFICATION_TRANSIENT_PER_USER_CAP unexpired Transient records
# (prune.rs:244-255): the sweep walks the inbox keyspace, whose keys embed
# an INVERTED timestamp (notification.rs:232-238 — ascending key order is
# newest-first per recipient, ties broken by notification id ascending),
# counting transients as it goes and deleting every one past the cap — so
# the NEWEST ``cap`` unexpired transients survive.

NOTIFICATION_DIRECT_TTL_MS = 90 * 24 * 60 * 60 * 1000  # notification.rs:11
NOTIFICATION_TRANSIENT_TTL_MS = 30 * 24 * 60 * 60 * 1000  # notification.rs:12
NOTIFICATION_TRANSIENT_PER_USER_CAP = 500  # notification.rs:13

# pure content traffic is Transient; identity/registry/commerce events are
# Direct — the same split DASHBOARD_KINDS draws for the epoch watch
TRANSIENT_KINDS = ("click", "view")


def inbox_records(events: DataFrame) -> DataFrame:
    """The per-recipient notification inbox as a relation: (recipient,
    notification_id, class, created_at_ms, read). Class derives from the
    event kind (content traffic → transient), read receipts use the same
    every-4th-id stand-in as :func:`unread_counts`."""
    return events.select(
        F.col("user_id").alias("recipient"),
        F.col("event_id").alias("notification_id"),
        F.when(F.col("event_type").isin(*TRANSIENT_KINDS), F.lit("transient"))
        .otherwise(F.lit("direct"))
        .alias("class"),
        F.unix_millis("ts").alias("created_at_ms"),
        (F.col("event_id") % 4 == 0).alias("read"),
    )


def prune_inbox(
    inbox: DataFrame,
    direct_ttl_ms: int = NOTIFICATION_DIRECT_TTL_MS,
    transient_ttl_ms: int = NOTIFICATION_TRANSIENT_TTL_MS,
    per_user_cap: int = NOTIFICATION_TRANSIENT_PER_USER_CAP,
) -> DataFrame:
    """The prune sweep's verdict on every inbox row: adds ``expired``,
    ``capped``, ``pruned`` (prune.rs:236-255 semantics).

    ``now`` is derived from the data (1 ms past the newest record) so
    the relation is deterministic; expired rows do NOT advance the
    per-recipient transient counter (the reference ``continue``s before
    incrementing, prune.rs:236-243), and the counter walks newest-first
    with notification-id-ascending ties — the inverted-timestamp key
    order of notification.rs:232-238.

    Scale shape: one broadcast 1-row join for ``now`` plus ONE window
    partitioned by recipient — per-recipient state only, no global sort,
    no driver collect; the sweep is a single pass exactly like the
    reference's keyspace walk.
    """
    now = inbox.agg((F.max("created_at_ms") + 1).alias("__now_ms"))
    ttl = F.when(
        F.col("class") == "transient", F.lit(transient_ttl_ms)
    ).otherwise(F.lit(direct_ttl_ms))
    w = (
        Window.partitionBy("recipient")
        .orderBy(F.desc("created_at_ms"), F.asc("notification_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    live_transient = (F.col("class") == "transient") & ~F.col("expired")
    return (
        inbox.crossJoin(F.broadcast(now))
        .withColumn(
            "expired", F.col("created_at_ms") + ttl <= F.col("__now_ms")
        )
        .withColumn(
            "__tseen", F.sum(live_transient.cast("int")).over(w)
        )
        .withColumn(
            "capped", live_transient & (F.col("__tseen") > per_user_cap)
        )
        .withColumn("pruned", F.col("expired") | F.col("capped"))
        .drop("__now_ms", "__tseen")
    )


def prune_summary(verdicts: DataFrame) -> DataFrame:
    """Per-class roll-up of a prune sweep: before/expired/capped/after
    cardinalities plus the unread count over the SURVIVORS — the
    consistency the reference's unread scan sees after a prune
    (unread.rs counts only live records)."""
    survives = ~F.col("pruned")
    return (
        verdicts.groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_before"),
            F.sum(F.col("expired").cast("int")).cast("long").alias("n_expired"),
            F.sum(F.col("capped").cast("int")).cast("long").alias("n_capped"),
            F.sum(survives.cast("int")).cast("long").alias("n_after"),
            F.sum((survives & ~F.col("read")).cast("int"))
            .cast("long")
            .alias("n_unread_after"),
        )
        .orderBy("class")
    )


# ------------------------------------------------ inbox list / mark-read
# ListNotifications (operations/src/notifications/list.rs): one
# recipient's inbox newest-first (the inverted-timestamp key order,
# notification.rs:232-238 — created DESC, id ASC ties), limit clamped to
# 1..200 (list.rs:15,65), keyset cursor = the last row's
# (created_at_ms, notification_id) (notification_inbox_cursor,
# list.rs:126-138: fetch limit+1, truncate, emit next_cursor).
# MarkRead (operations/src/notifications/mark_read.rs): mark a
# recipient's UNREAD records read by explicit id set (≤512 ids,
# TooManyIds beyond — mark_read.rs:18,73) and/or by time horizon
# (created_at_ms <= up_to_ms, mark_read.rs:175-177); already-read rows
# never re-mark (rs:177), empty request is a no-op (rs:234).

LIST_NOTIFICATIONS_MAX_LIMIT = 200  # list.rs:15
MARK_READ_MAX_IDS = 512  # mark_read.rs:18


def list_notifications(
    inbox: DataFrame,
    recipient: int,
    cursor: tuple[int, int] | None = None,
    limit: int = LIST_NOTIFICATIONS_MAX_LIMIT,
) -> DataFrame:
    """One ListNotifications page: the recipient's records strictly past
    the cursor in walk order (created DESC, id ASC). The scan prunes to
    the recipient's partition — at scale the inbox is bucketed by
    recipient, so this is one partition's sorted slice, no shuffle."""
    limit = max(1, min(int(limit), LIST_NOTIFICATIONS_MAX_LIMIT))
    df = inbox.filter(F.col("recipient") == recipient)
    if cursor is not None:
        c_ms, c_id = cursor
        df = df.filter(
            (F.col("created_at_ms") < c_ms)
            | (
                (F.col("created_at_ms") == c_ms)
                & (F.col("notification_id") > c_id)
            )
        )
    return df.orderBy(
        F.desc("created_at_ms"), F.asc("notification_id")
    ).limit(limit)


def mark_read(
    inbox: DataFrame,
    marks: DataFrame,
) -> DataFrame:
    """Apply a mark-read batch: ``marks`` carries (recipient,
    notification_id nullable, up_to_ms nullable) — one row per explicit
    id plus at most one horizon row per recipient. Returns the inbox
    with ``read`` updated and ``newly_marked`` flagging rows this batch
    marked (unread AND matched, mark_read.rs:175-178).

    Scale shape: the mark batch is request-sized → both joins broadcast;
    the inbox is scanned once, never shuffled.
    """
    ids = (
        marks.filter(F.col("notification_id").isNotNull())
        .select("recipient", "notification_id")
        .distinct()
        .withColumn("__by_id", F.lit(True))
    )
    horizons = (
        marks.filter(F.col("up_to_ms").isNotNull())
        .groupBy("recipient")
        .agg(F.max("up_to_ms").alias("__up_to_ms"))
    )
    return (
        inbox.join(
            F.broadcast(ids), ["recipient", "notification_id"], "left"
        )
        .join(F.broadcast(horizons), ["recipient"], "left")
        .withColumn(
            "newly_marked",
            ~F.col("read")
            & (
                F.coalesce(F.col("__by_id"), F.lit(False))
                | F.coalesce(
                    F.col("created_at_ms") <= F.col("__up_to_ms"),
                    F.lit(False),
                )
            ),
        )
        .withColumn("read", F.col("read") | F.col("newly_marked"))
        .drop("__by_id", "__up_to_ms")
    )
