"""Structured Streaming tests: the SAME transformations as the batch
oracle queries, run as a real stream (file source, availableNow trigger,
memory sink), plus watermark/foreachBatch behavior."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.streaming.watch import (
    debounce_windows,
    lww_registry,
    match_watches,
    unread_counts,
    watches_df,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events.parquet rewritten (ts normalized to TIMESTAMP) into a dir a
    file stream can read."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _run_to_memory(df, name, mode="complete"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_debounce_equals_batch(spark, sf_dir, events_stream_dir):
    watches = watches_df(spark)
    stream = _read_stream(spark, events_stream_dir)
    name = f"dbg_{uuid.uuid4().hex[:8]}"
    matched = match_watches(stream, watches).withWatermark("ts", "300 seconds")
    _run_to_memory(debounce_windows(matched), name)
    got = {
        (r.watch_id, r.w.start, r.n_coalesced, r.last_event_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = debounce_windows(
        match_watches(load_table(spark, sf_dir, "events"), watches)
    )
    want = {
        (r.watch_id, r.w.start, r.n_coalesced, r.last_event_id)
        for r in batch.collect()
    }
    assert got == want


def test_stream_unread_equals_batch(spark, sf_dir, events_stream_dir):
    watches = watches_df(spark)
    stream = _read_stream(spark, events_stream_dir)
    name = f"unread_{uuid.uuid4().hex[:8]}"
    _run_to_memory(unread_counts(match_watches(stream, watches)), name)
    got = {
        (r.watch_id, r.n_delivered, r.n_unread)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.watch_id, r.n_delivered, r.n_unread)
        for r in unread_counts(
            match_watches(load_table(spark, sf_dir, "events"), watches)
        ).collect()
    }
    assert got == want


def test_stream_lww_foreachbatch_merge(spark, sf_dir, events_stream_dir):
    """foreachBatch LWW merge across micro-batches converges to the batch
    answer — the projector's idempotent replay in streaming form."""
    state: dict[int, tuple] = {}

    def merge(batch_df, _bid):
        for r in lww_registry(batch_df).collect():
            cur = state.get(r.user_id)
            key = (r.ts, r.event_id)
            if cur is None or key > (cur[0], cur[1]):
                state[r.user_id] = (r.ts, r.event_id, r.event_type)

    stream = _read_stream(spark, events_stream_dir)
    q = (
        stream.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(120)
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type)
        for r in lww_registry(load_table(spark, sf_dir, "events")).collect()
    }
    assert state == want


def test_watermark_drops_too_late_events(spark, tmp_path):
    """An event older than (max seen ts - 300 s) arriving in a LATER
    micro-batch is excluded from the append-mode windowed result —
    the clock-skew guard of projector.rs:68-92."""
    d = str(tmp_path / "src")
    base = "2024-01-01 12:00:00"
    early = spark.createDataFrame(
        [(1, base, 10), (2, "2024-01-01 12:30:00", 11)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    late = spark.createDataFrame(
        [(3, "2024-01-01 11:00:00", 12), (4, "2024-01-01 12:30:01", 13)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    # two runs over one checkpoint force the late file into a LATER batch,
    # after the watermark advanced past (12:30 - 300 s)
    early.coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    ckpt = f"/tmp/ckpt_{uuid.uuid4().hex[:8]}"
    emitted: list = []

    def sink(batch_df, _bid):
        emitted.extend(batch_df.collect())

    def run():
        stream = spark.readStream.schema(schema).parquet(d)
        agg = (
            stream.withWatermark("ts", "300 seconds")
            .groupBy(F.window("ts", "60 seconds"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run()
    late.coalesce(1).write.mode("append").parquet(d)
    run()
    starts = {r.window.start.isoformat() for r in emitted}
    # the 11:00 event is > 300 s behind the advanced watermark; its window
    # must never be emitted (append mode only emits finalized windows)
    assert "2024-01-01T11:00:00" not in starts
    # the legitimate early windows were emitted once the watermark passed
    assert "2024-01-01T12:00:00" in starts


def test_stream_dashboard_bumps_equal_batch(spark, sf_dir, events_stream_dir):
    """Per-window dashboard bump decisions computed on a real stream match
    the batch dashboard_epochs derivation (the cumulative epoch itself is
    the publisher's foreachBatch running counter)."""
    from aruna_spark.streaming.watch import DASHBOARD_KINDS, dashboard_epochs

    stream = _read_stream(spark, events_stream_dir)
    per_window = (
        stream.withWatermark("ts", "300 seconds")
        .groupBy(F.window("ts", "2 seconds").alias("w"))
        .agg(
            F.sum(
                F.when(F.col("event_type").isin(*DASHBOARD_KINDS), 1)
                .otherwise(0)
            ).alias("n_relevant")
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            (F.col("n_relevant") > 0).alias("bumped"),
        )
    )
    _run_to_memory(per_window, "dash_stream")
    got = {
        (r.window_start_us, r.bumped)
        for r in spark.sql("SELECT * FROM dash_stream").collect()
    }
    want = {
        (r.window_start_us, r.bumped)
        for r in dashboard_epochs(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got == want


def test_stream_session_debounce_equals_batch(spark, sf_dir, events_stream_dir):
    """Session-window debounce on a real watermarked stream equals the
    batch derivation — Spark's native stateful session operator."""
    from aruna_spark.streaming.watch import (
        debounce_sessions,
        match_watches,
        watches_df,
    )

    watches = watches_df(spark)
    stream = _read_stream(spark, events_stream_dir).withWatermark(
        "ts", "300 seconds"
    )
    out = debounce_sessions(match_watches(stream, watches)).select(
        "watch_id",
        F.unix_micros(F.col("w.start")).alias("s"),
        F.unix_micros(F.col("w.end")).alias("e"),
        "n_coalesced",
        "last_event_id",
    )
    _run_to_memory(out, "sess_stream", mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_stream").collect()}
    want = {
        tuple(r)
        for r in debounce_sessions(
            match_watches(load_table(spark, sf_dir, "events"), watches)
        )
        .select(
            "watch_id",
            F.unix_micros(F.col("w.start")).alias("s"),
            F.unix_micros(F.col("w.end")).alias("e"),
            "n_coalesced",
            "last_event_id",
        )
        .collect()
    }
    assert got == want


def test_stream_exactly_once_inbox_delivery(spark, sf_dir, tmp_path):
    """At-least-once redelivery (the same events appended twice, landing
    in different micro-batches) must not double-count the inbox:
    dropDuplicatesWithinWatermark keys on (watch_id, event_id)."""
    from aruna_spark.streaming.watch import dedup_deliveries

    src = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src)
    events.write.mode("append").parquet(src)  # redelivery of every event

    watches = watches_df(spark)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = dedup_deliveries(match_watches(stream, watches))
    name = f"inbox_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.groupBy("watch_id")
        .count()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.watch_id, r["count"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.watch_id, r["count"])
        for r in match_watches(events, watches)
        .groupBy("watch_id")
        .count()
        .collect()
    }
    assert got == want


def test_dashboard_epochs_is_lazy_and_batch_only(spark, sf_dir):
    """dashboard_epochs builds a pure lazy plan: constructing it must
    not execute anything driver-side (no collect — the r5 review
    finding), and a streaming input raises immediately instead of
    failing later inside writeStream."""
    import pytest
    from pyspark.sql import DataFrame

    from aruna_spark.catalog import load_table
    from aruna_spark.streaming.watch import dashboard_epochs

    events = load_table(spark, sf_dir, "events")
    real_collect = DataFrame.collect

    def boom(self):
        raise AssertionError("collect() during plan construction")

    DataFrame.collect = boom
    try:
        plan = dashboard_epochs(events)
    finally:
        DataFrame.collect = real_collect
    # the lazy plan still computes the running epoch correctly
    rows = plan.orderBy("window_start_us").limit(2000).collect()
    epoch = 0
    for r in rows:
        if r.bumped:
            epoch += 1
        assert r.epoch == epoch
    # streaming input: explicit, early error (window functions are not
    # defined on unbounded streams; the live form is foreachBatch)
    schema = "ts timestamp, event_type string, user_id long, event_id long"
    stream = spark.readStream.schema(schema).parquet(sf_dir)
    with pytest.raises(ValueError, match="foreachBatch"):
        dashboard_epochs(stream)


def test_facade_watch_route_on_a_real_stream(spark, sf_dir, events_stream_dir):
    """The facade's watch() accepts a STREAMING events relation (the
    glob+mask match is a stream-static broadcast join): drive the route
    end-to-end through writeStream and compare against its own batch
    output — the subscribe surface works identically on either."""
    from pyspark.sql import functions as F

    from aruna_spark.api import Engine

    engine = Engine(spark, sf_dir)
    stream = _read_stream(spark, events_stream_dir)
    matched = engine.watch("users/*/click", ["click"], events=stream)
    assert matched.isStreaming
    counts = matched.groupBy("watch_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("event_id").alias("last")
    )
    _run_to_memory(counts, "facade_watch_stream")
    got = {
        (r.watch_id, r.n, r.last)
        for r in spark.sql("SELECT * FROM facade_watch_stream").collect()
    }
    batch = engine.watch("users/*/click", ["click"])
    want = {
        (r.watch_id, r.n, r.last)
        for r in batch.groupBy("watch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("event_id").alias("last"))
        .collect()
    }
    assert got == want and got


def test_no_retroactive_delivery_guard(spark, sf_dir):
    """A created_at_ms column on the watches opts into routing.rs's
    no-retroactive rule: late-born watches match a strict subset, the
    epoch-born watch is untouched, and every surviving match occurred
    at-or-after its watch's birth."""
    from aruna_spark.queries.streaming_suite import (
        WATCH_CREATED_MS,
        stream_watch_matches,
        stream_watch_no_retroactive,
    )

    base = {
        r["watch_id"]: r["n_matched"]
        for r in stream_watch_matches(spark, sf_dir).collect()
    }
    guarded_rows = stream_watch_no_retroactive(spark, sf_dir).collect()
    guarded = {r["watch_id"]: r["n_matched"] for r in guarded_rows}
    assert guarded["w_user1x"] == base["w_user1x"]
    assert 0 < guarded["w_clicks"] < base["w_clicks"]
    assert 0 < guarded["w_errors"] < base["w_errors"]
    for r in guarded_rows:
        assert r["first_ts_us"] >= WATCH_CREATED_MS[r["watch_id"]] * 1000
