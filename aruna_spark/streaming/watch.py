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
"paths" are ``users/{user_id}/{event_type}``.

Scale: watch tables are small → stream-static broadcast join; the
debounce window and LWW are standard watermarked stateful aggs whose
state is bounded by (watch × open windows) and (entity count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    """Stream-static join: events × (broadcast) watches on glob + mask."""
    return with_path(events).join(
        F.broadcast(watches),
        F.regexp_like(F.col("path"), F.col("pattern"))
        & F.array_contains(F.col("kinds"), F.col("event_type")),
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
    bumps the epoch, and subscribers see the running epoch value. Batch
    form = cumulative sum over window starts; the stream publishes the
    same bump per trigger.

    The running sum is a two-level distributed prefix scan, NOT a global
    ``Window.orderBy`` (which would move every debounce window through
    one partition — the `WindowExec: No Partition Defined` class,
    VERDICT r4): windows cum-sum WITHIN their hour bucket (partitioned
    window), and each bucket's exclusive offset comes from a driver-side
    scan over the per-bucket bump totals — one row per hour of corpus
    history (10 years ≈ 88k rows), broadcast-joined back. Same shape as
    Spark's own zipWithIndex two-pass."""
    per_window = events.groupBy(F.window("ts", debounce).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type").isin(*DASHBOARD_KINDS), 1).otherwise(0)
        ).alias("n_relevant"),
    )
    bump = (F.col("n_relevant") > 0).cast("int")
    bucketed = per_window.withColumn(
        "bucket", F.date_trunc("hour", F.col("w.start"))
    ).withColumn("bump", bump)
    totals = (
        bucketed.groupBy("bucket")
        .agg(F.sum("bump").alias("n_bumps"))
        .orderBy("bucket")
        .collect()
    )
    offset_rows, acc = [], 0
    for r in totals:
        offset_rows.append((r.bucket, acc))
        acc += int(r.n_bumps)
    offsets = bucketed.sparkSession.createDataFrame(
        offset_rows, "bucket timestamp, epoch_offset bigint"
    )
    cum = (
        Window.partitionBy("bucket")
        .orderBy(F.col("w.start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.join(F.broadcast(offsets), "bucket").select(
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
