"""Multipart lifecycle invariants (create/upload-part/list-parts/
abort, operations/tests/multipart.rs flows): replacement collapse,
keyset pagination, abort atomicity, and upload/object-listing
separation."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries.s3_multipart import (
    _abort_batch,
    abort_results,
    abort_uploads,
    effective_parts,
    list_multipart_uploads,
    list_parts,
    load_part_events,
    load_uploads,
)


def test_effective_parts_collapse_last_wins(spark, sf_dir):
    events = load_part_events(spark, sf_dir).cache()
    parts = effective_parts(events).cache()
    # one row per (upload_id, part_number)
    assert (
        parts.groupBy("upload_id", "part_number").count().filter("count > 1")
    ).count() == 0
    # replaced parts carry the seq-2 payload, not the original
    redone = events.filter(F.col("seq") == 2).select(
        "upload_id", "part_number", "part_size", "part_etag"
    )
    eff = parts.filter(F.col("replaced")).select(
        "upload_id", "part_number", "part_size", "part_etag"
    )
    assert redone.exceptAll(eff).count() == 0
    assert eff.exceptAll(redone).count() == 0


def test_list_parts_keyset_walk(spark, sf_dir):
    parts = effective_parts(load_part_events(spark, sf_dir)).cache()
    uid = parts.select("upload_id").orderBy("upload_id").limit(1).collect()[0][0]
    full = list_parts(parts, uid, max_parts=10**6).collect()
    walked, marker = [], None
    while True:
        page = list_parts(
            parts, uid, part_number_marker=marker, max_parts=2
        ).collect()
        if not page:
            break
        walked.extend(page)
        marker = page[-1].part_number
    assert [tuple(r) for r in walked] == [tuple(r) for r in full]
    assert [r.part_number for r in walked] == sorted(
        r.part_number for r in walked
    )


def test_list_uploads_keyset_walk(spark, sf_dir):
    uploads = load_uploads(spark, sf_dir).cache()
    full = list_multipart_uploads(uploads, prefix="data/", max_uploads=10**6).collect()
    walked, marker = [], None
    while True:
        page = list_multipart_uploads(
            uploads,
            prefix="data/",
            key_marker=marker[0] if marker else None,
            upload_id_marker=marker[1] if marker else None,
            max_uploads=13,
        ).collect()
        if not page:
            break
        walked.extend(page)
        marker = (page[-1].key, page[-1].upload_id)
    assert [tuple(r) for r in walked] == [tuple(r) for r in full]


def test_abort_removes_upload_and_all_parts(spark, sf_dir):
    uploads = load_uploads(spark, sf_dir).cache()
    parts = load_part_events(spark, sf_dir).cache()
    aborts = _abort_batch(spark, sf_dir).cache()
    left_u, left_p = abort_uploads(uploads, parts, aborts)
    left_u, left_p = left_u.cache(), left_p.cache()
    # no aborted upload survives in either relation
    assert left_u.join(aborts, "upload_id", "left_semi").count() == 0
    assert left_p.join(aborts, "upload_id", "left_semi").count() == 0
    # untouched uploads keep every part
    assert (
        parts.join(aborts, "upload_id", "left_anti").exceptAll(left_p).count()
        == 0
    )
    # envelope: known ids 204, the unknown one 404
    res = abort_results(uploads, aborts).cache()
    assert res.filter(
        (F.col("upload_id") == "mpu-nope") & (F.col("status") != 404)
    ).count() == 0
    assert res.filter(F.col("status") == 204).count() == res.count() - 1


def test_uploads_never_in_object_listings(spark, sf_dir):
    """In-progress uploads are their own relation: no upload_id appears
    as an object version — uploads only become objects at complete."""
    from aruna_spark.sources.objects import load_object_versions

    uploads = load_uploads(spark, sf_dir)
    versions = load_object_versions(spark, sf_dir)
    assert (
        versions.join(
            uploads.select(F.col("upload_id").alias("version_id")),
            "version_id",
            "left_semi",
        ).count()
        == 0
    )
