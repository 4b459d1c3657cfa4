"""Blob reclaim sweep invariants (blob/reclaim.rs): pin-by-surviving-
version, retain safety, grace gating, and the freed set's genuine
unreferencedness; bucket create/delete route contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.api import Engine
from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.reclaim import (
    RECLAIM_GRACE,
    SWEEP_TIME,
    reclaim_sweep,
)

load_all()


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


@pytest.fixture(scope="module")
def sweep(spark, sf_dir):
    return REGISTRY["blob_reclaim_sweep"][0](spark, sf_dir).cache()


def test_verdict_partition(sweep):
    rows = sweep.collect()
    assert rows
    kinds = {r.verdict for r in rows}
    assert kinds <= {"dropped", "not_due", "pinned", "freed"}
    # retain backend never frees; its candidates are all dropped
    assert all(
        r.verdict == "dropped" for r in rows if r.backend == "backend-2"
    )
    # freed rows carry bytes, everything else carries NULL
    assert all(
        (r.freed_bytes is not None) == (r.verdict == "freed") for r in rows
    )
    # grace gating: not_due iff young (on reclaim backends)
    for r in rows:
        if r.backend != "backend-2" and r.verdict == "not_due":
            assert r.enqueued_at + RECLAIM_GRACE > SWEEP_TIME


def test_freed_blobs_are_genuinely_unreferenced(spark, sf_dir, sweep):
    """No surviving version (post-delete) still names a freed copy; every
    pinned candidate IS still named — the rs:565-587 contract."""
    from aruna_spark.queries.reclaim import _backend_of
    from aruna_spark.queries.s3_lifecycle import apply_deletes
    from aruna_spark.sources.objects import load_object_versions
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 2
    )
    deletes = docs.select(
        F.lit("corpus").alias("bucket"),
        F.concat(
            F.lit("data/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt"),
        ).alias("key"),
        F.lit("v0").alias("want_version_id"),
    )
    after = apply_deletes(load_object_versions(spark, sf_dir), deletes)
    locs = (
        after.filter(F.col("blob_hash").isNotNull())
        .select("blob_hash", _backend_of(F.col("size")).alias("backend"))
        .distinct()
    )
    freed = sweep.filter(F.col("verdict") == "freed").select(
        "backend", "blob_hash"
    )
    assert freed.join(locs, ["backend", "blob_hash"], "inner").count() == 0
    pinned = sweep.filter(F.col("verdict") == "pinned").select(
        "backend", "blob_hash"
    )
    assert pinned.join(locs, ["backend", "blob_hash"], "left_anti").count() == 0


def test_retain_strategy_never_frees(spark):
    """A candidate on a retain backend is dropped even when due and
    unreferenced (cleanup.rs:10-16 — the safe default)."""
    surviving = spark.createDataFrame(
        [], "blob_hash string, size long, is_delete_marker boolean"
    )
    cands = spark.createDataFrame(
        [("backend-0", "h1", 100, 0)],
        "backend string, blob_hash string, blob_size long, enqueued_at long",
    )
    strategies = spark.createDataFrame(
        [("backend-0", "retain", 0)], "backend string, strategy string, grace int"
    )
    out = reclaim_sweep(surviving, cands, strategies, 10_000).collect()
    assert out[0].verdict == "dropped"
    # an UNKNOWN backend resolves to retain too (rs:199: a missing
    # record resolves to retain)
    out2 = reclaim_sweep(
        surviving,
        cands,
        strategies.filter(F.col("backend") == "nope"),
        10_000,
    ).collect()
    assert out2[0].verdict == "dropped"


def test_bucket_create_delete_routes(engine):
    made = engine.create_bucket("fresh-bucket")
    assert made["status"] == 200 and made["created_at"] > 0
    assert engine.create_bucket("corpus")["error"] == "BucketAlreadyExists"
    assert engine.delete_bucket("nope")["status"] == 404
    # corpus/staging hold version history -> NotEmpty
    assert engine.delete_bucket("corpus")["error"] == "NotEmpty"
    assert engine.delete_bucket("staging")["error"] == "NotEmpty"
    # archive buckets are registered but empty -> 204
    arch = engine.list_buckets(prefix="archive-")["buckets"][0].name
    assert engine.delete_bucket(arch)["status"] == 204


# ---------------------------------------------------- storage routing
def test_routing_ladder_edges(spark, sf_dir):
    """Exact beats the longer unoffered-class prefix; the miss only
    surfaces when it outranked the winner; unmatched keys land on the
    group default (routing.rs:442-521)."""
    from aruna_spark.queries.routing import (
        _classes,
        _rules,
        resolve_backends,
        validate_rule_set,
    )

    rules, classes = _rules(spark, sf_dir), _classes(spark)
    validate_rule_set(rules)  # the deterministic set is well-formed
    exact_key = rules.filter(F.col("exact")).limit(1).collect()
    writes = spark.createDataFrame(
        [("data/src1/en/nothing-special.txt",), ("elsewhere/k.bin",)]
        + ([(exact_key[0].key_prefix,)] if exact_key else []),
        "key string",
    )
    out = {r.key: r for r in resolve_backends(writes, rules, classes, "b-group").collect()}
    r1 = out["data/src1/en/nothing-special.txt"]
    assert r1.backend == "b-src1" and r1.missed_class == "class-cold"
    r2 = out["elsewhere/k.bin"]
    assert r2.backend == "b-group" and r2.via == "group_default"
    assert r2.missed_class is None
    if exact_key:
        r3 = out[exact_key[0].key_prefix]
        assert r3.backend == "b-exact" and r3.via == "exact"
        # the class miss under src1/en does NOT outrank an exact winner
        if exact_key[0].key_prefix.startswith("data/src1/en/"):
            assert r3.missed_class is None


def test_routing_duplicate_rule_rejected(spark):
    from aruna_spark.queries.routing import validate_rule_set

    dup = spark.createDataFrame(
        [("a/", False, "backend", "b1"), ("a/", False, "backend", "b2")],
        "key_prefix string, exact boolean, target_kind string, target string",
    )
    with pytest.raises(ValueError, match="duplicate"):
        validate_rule_set(dup)
    bad = spark.createDataFrame(
        [("a/", False, "class", "Not_Valid!")],
        "key_prefix string, exact boolean, target_kind string, target string",
    )
    with pytest.raises(ValueError, match="invalid storage class"):
        validate_rule_set(bad)


# ------------------------------------------------------- job queue plane
def test_backoff_ladder_matches_reference_policy(spark):
    """queue_backoff.rs:19-31 pinned: 250ms doubling capped at 30s."""
    from aruna_spark.queries.jobs import backoff_ms

    df = spark.createDataFrame(
        [(a,) for a in [0, 1, 2, 3, 4, 5, 6, 7, 8, 40]], "attempts int"
    ).select("attempts", backoff_ms(F.col("attempts")).alias("ms"))
    got = {r.attempts: r.ms for r in df.collect()}
    assert got == {
        0: 250, 1: 500, 2: 1000, 3: 2000, 4: 4000,
        5: 8000, 6: 16000, 7: 30000, 8: 30000, 40: 30000,
    }


def test_prune_skips_pending_cleanup(spark, sf_dir):
    """A terminal-and-expired job with a queued cleanup never prunes
    (prune.rs:87-90)."""
    from aruna_spark.queries.jobs import NOW_MS, load_jobs
    from aruna_spark.queries import REGISTRY

    jobs = load_jobs(spark, sf_dir)
    held = jobs.filter(
        F.col("cleanup_pending")
        & F.col("state").isin("succeeded", "failed", "cancelled")
        & (F.col("finished_at_ms") + F.col("retention_ms") <= NOW_MS)
    ).select("job_id")
    pruned = REGISTRY["jobs_prune_page"][0](spark, sf_dir).select("job_id")
    assert pruned.join(held, "job_id", "inner").count() == 0
