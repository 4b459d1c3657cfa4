"""Timer-after-first-write debounce: batch == stream == pure-Python,
plus the semantic split from session windows."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.streaming.stateful import (
    DEBOUNCE_US,
    burst_invariants,
    debounce_timer_batch,
    debounce_timer_stream,
    fold_bursts,
)
from aruna_spark.streaming.watch import match_watches, watches_df


def _key(r):
    return (r.watch_id, r.burst_start_us, r.publish_at_us, r.n_coalesced,
            r.last_event_id)


def test_batch_fold_equals_pure_python(spark, sf_dir):
    matched = match_watches(
        load_table(spark, sf_dir, "events"), watches_df(spark)
    )
    got = debounce_timer_batch(matched).collect()
    burst_invariants(got)

    rows = matched.select(
        "watch_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    ).collect()
    want = set()
    by_watch: dict[str, list] = {}
    for r in rows:
        by_watch.setdefault(r.watch_id, []).append((r.ts_us, r.event_id))
    for wid, evs in by_watch.items():
        closed, state = fold_bursts(sorted(evs))
        if state is not None:
            closed.append((state[0], state[0] + DEBOUNCE_US, state[1], state[2]))
        want |= {(wid, *b) for b in closed}
    assert {_key(r) for r in got} == want


def test_timer_differs_from_session_semantics(spark):
    """Steady writes every 1.5 s: sessions merge them all into ONE
    publish; the reference's timer publishes every 2 s (interest.rs:32-37
    — the timer is armed by the FIRST write, not extended by later ones)."""
    evs = spark.createDataFrame(
        [(i, f"2024-01-01 00:00:{i * 1.5:06.3f}", 1, "click") for i in range(4)],
        "event_id long, ts_s string, user_id long, event_type string",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    matched = match_watches(evs, watches_df(spark)).filter(
        F.col("watch_id") == "w_clicks"
    )
    timer = debounce_timer_batch(matched).collect()
    # events at 0, 1.5, 3.0, 4.5 → bursts [0,2)={0,1.5}, [3,5)={3,4.5}
    assert sorted((r.burst_start_us, r.n_coalesced) for r in timer) == [
        (1704067200000000, 2),
        (1704067203000000, 2),
    ]
    from aruna_spark.streaming.watch import debounce_sessions

    sessions = debounce_sessions(matched).collect()
    assert len(sessions) == 1 and sessions[0].n_coalesced == 4


def test_stream_stateful_equals_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState over a real 2-batch stream == batch fold.
    A far-future sentinel (matching no watch) advances the watermark past
    every deadline so event-time timeouts flush the open bursts."""
    src = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    far = spark.createDataFrame(
        [(999_999_999, max_ts, 0, "noop")],
        events.select("event_id", "ts", "user_id", "event_type").schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    far.write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "300 seconds")
    )
    out = debounce_timer_stream(match_watches(stream, watches_df(spark)))
    name = f"timer_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(180)
    got = {_key(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}

    matched = match_watches(events, watches_df(spark))
    want = {_key(r) for r in debounce_timer_batch(matched).collect()}
    assert got == want
