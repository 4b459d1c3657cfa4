"""S3 object-plane invariants: put upsert, conditional get/head."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries.s3_suite import (
    _put_batch,
    _request_batch,
    put_objects,
    resolve_objects,
)
from aruna_spark.sources.objects import load_object_versions


def test_put_appends_one_version_and_flips_head(spark, sf_dir):
    before = load_object_versions(spark, sf_dir).cache()
    puts = _put_batch(spark, sf_dir).cache()
    after = put_objects(before, puts).cache()
    n_puts = puts.count()
    assert after.count() == before.count() + n_puts
    # exactly one latest per key, and for touched keys it is the new one
    per_key = after.groupBy("bucket", "key").agg(
        F.sum(F.col("is_latest").cast("int")).alias("n_latest"),
        F.max("version_idx").alias("maxv"),
    )
    assert per_key.filter(F.col("n_latest") != 1).count() == 0
    touched_latest = after.join(
        puts.select("bucket", "key"), ["bucket", "key"], "left_semi"
    ).filter(F.col("is_latest"))
    assert touched_latest.filter(F.col("deduplicated").isNull()).count() == 0
    # every prior head of a touched key was demoted
    demoted = (
        before.filter(F.col("is_latest"))
        .join(puts.select("bucket", "key"), ["bucket", "key"], "left_semi")
        .select("bucket", "key", "version_id")
        .join(
            after.filter(F.col("is_latest")).select(
                "bucket", "key", "version_id"
            ),
            ["bucket", "key", "version_id"],
            "left_semi",
        )
    )
    assert demoted.count() == 0


def test_put_content_addressed_dedup(spark, sf_dir):
    """A put whose blob_hash already exists stores no new blob
    (put_object.rs CheckHashLookup -> CleanupDuplicate)."""
    before = load_object_versions(spark, sf_dir)
    puts = _put_batch(spark, sf_dir)
    after = put_objects(before, puts).cache()
    stored_before = before.select("blob_hash").distinct().count()
    new_blobs = (
        after.filter(~F.col("deduplicated"))
        .select("blob_hash")
        .distinct()
        .count()
    )
    # dedup puts add no distinct blob beyond the non-dedup set
    assert (
        after.select("blob_hash").distinct().count()
        == new_blobs
        <= stored_before + puts.count()
    )
    dedup_rows = after.filter(F.col("deduplicated")).join(
        before.select("blob_hash").distinct(), "blob_hash", "left_anti"
    )
    assert dedup_rows.count() == 0


def test_get_statuses(spark, sf_dir):
    versions = load_object_versions(spark, sf_dir).cache()
    out = resolve_objects(versions, _request_batch(spark, sf_dir)).cache()
    # keys whose head is a delete marker 404 regardless of kind
    # (get_object.rs:344-347 NoSuchKey on a Deleted head)
    marker_keys = {
        r.key
        for r in versions.filter(
            F.col("is_latest") & F.col("is_delete_marker")
        )
        .select("key")
        .collect()
    }
    rows = {(r.kind, r.status, r.key in marker_keys) for r in out.collect()}
    by_kind = {}
    for k, s, deleted in rows:
        if deleted:
            # unversioned request on a deleted key: always NoSuchKey
            if k != 1:
                assert s == 404, (k, s)
            continue
        by_kind.setdefault(k, set()).add(s)
    if 0 in by_kind:
        assert by_kind[0] == {200}
    if 3 in by_kind:
        assert by_kind[3] == {412}
    if 4 in by_kind:
        assert by_kind[4] == {304}
    if 5 in by_kind:
        assert by_kind[5] <= {206, 416}
    # no body on conditional failures
    bad = out.filter(
        F.col("status").isin(304, 412) & F.col("content_length").isNotNull()
    )
    assert bad.count() == 0
    # 206 responses carry a well-formed content_range
    pr = out.filter(F.col("status") == 206)
    assert pr.filter(~F.col("content_range").rlike(r"^bytes \d+-\d+/\d+$")).count() == 0


def test_versioned_get_resolves_v0(spark, sf_dir):
    versions = load_object_versions(spark, sf_dir)
    out = resolve_objects(versions, _request_batch(spark, sf_dir))
    v1 = out.filter((F.col("kind") == 1) & (F.col("status") == 200))
    assert v1.filter(F.col("resolved_version_id") != "v0").count() == 0


def test_checksum_family_one_pass_exact_values(spark, sf_dir):
    """The multi-checksum projection (hash.rs:10-77) must agree with
    independent Python digests over the same content bytes, and delete
    markers (no content) must carry NULL checksums."""
    import hashlib
    import zlib

    from aruna_spark.sources.objects import CHECKSUM_COLS, with_checksums

    versions = with_checksums(load_object_versions(spark, sf_dir))
    rows = versions.limit(500).collect()
    assert any(r.is_delete_marker for r in rows) or True
    checked = 0
    for r in rows[:50]:
        if r.is_delete_marker:
            assert all(r[c] is None for c in CHECKSUM_COLS)
            continue
        content = f"blob:{r.size}".encode()
        assert r.checksum_md5 == hashlib.md5(content).hexdigest()
        assert r.checksum_md5 == r.blob_hash  # md5 IS the content address
        assert r.checksum_sha256 == hashlib.sha256(content).hexdigest()
        assert r.checksum_sha1 == hashlib.sha1(content).hexdigest()
        assert r.checksum_crc32 == zlib.crc32(content)
        checked += 1
    assert checked > 10
    # markers exist in the catalog and carry NULL family members
    marker = versions.filter(F.col("is_delete_marker")).limit(1).collect()
    assert marker and all(marker[0][c] is None for c in CHECKSUM_COLS)
    # single pass: the family is one projection over one scan — no
    # shuffle, no second scan of the versions relation
    plan = versions._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
