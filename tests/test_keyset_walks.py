"""Keyset full-walk equality properties for the four paginated listings
added in r7 (VERDICT r7 Next #4): for RANDOM relations (with deliberate
tie mass at page boundaries) and random page sizes, the paged walk
visits exactly the unpaginated relation in its order — no skip, no dup
(the test_search keyset contract, generalized to list_parts,
list_multipart_uploads, list_object_versions, list_notifications)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.ops.listing import list_object_versions
from aruna_spark.queries.s3_multipart import (
    list_multipart_uploads,
    list_parts,
)
from aruna_spark.streaming.watch import list_notifications

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_list_parts_walk(spark):
    """ListParts: marker = last part_number; decoy uploads never leak."""

    @given(
        nums=st.sets(st.integers(1, 30), min_size=0, max_size=15),
        page=st.integers(1, 4),
    )
    @settings(**_SETTINGS)
    def prop(nums, page):
        rows = [("u1", n, n * 10, f"e{n}") for n in nums] + [
            ("u2", 1, 5, "x")
        ]
        parts = spark.createDataFrame(
            rows,
            "upload_id string, part_number long, part_size long, "
            "part_etag string",
        )
        seen, marker = [], None
        for _ in range(40):
            rows_out = list_parts(
                parts, "u1", part_number_marker=marker, max_parts=page
            ).collect()
            seen.extend(r.part_number for r in rows_out)
            if len(rows_out) < page:
                break
            marker = rows_out[-1].part_number
        assert seen == sorted(nums)

    prop()


def test_list_multipart_uploads_walk(spark):
    """ListMultipartUploads: (key_marker, upload_id_marker) keyset over
    (key, upload_id) order — multiple uploads per key force mid-key
    resumes at page boundaries."""

    @given(
        pairs=st.sets(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 9)),
            min_size=0,
            max_size=12,
        ),
        page=st.integers(1, 4),
    )
    @settings(**_SETTINGS)
    def prop(pairs, page):
        rows = [
            ("corpus", f"data/{k}.bin", f"mpu-{k}-{u}", u) for k, u in pairs
        ]
        uploads = spark.createDataFrame(
            rows or [("corpus", "x", "y", 0)],
            "bucket string, key string, upload_id string, created_seq long",
        )
        if not rows:
            uploads = uploads.limit(0)
        seen, km, um = [], None, None
        for _ in range(40):
            out = list_multipart_uploads(
                uploads,
                prefix="data/",
                key_marker=km,
                upload_id_marker=um,
                max_uploads=page,
            ).collect()
            seen.extend((r.key, r.upload_id) for r in out)
            if len(out) < page:
                break
            km, um = out[-1].key, out[-1].upload_id
        want = sorted(
            (f"data/{k}.bin", f"mpu-{k}-{u}") for k, u in pairs
        )
        assert seen == want

    prop()


def test_list_object_versions_walk(spark):
    """ListObjectVersions: (key_marker, version_idx_marker) resumes
    MID-KEY — (key ASC, version_idx DESC) order, markers included."""

    @given(
        vers=st.sets(
            st.tuples(st.sampled_from(["k1", "k2", "k3"]), st.integers(0, 6)),
            min_size=0,
            max_size=14,
        ),
        page=st.integers(1, 4),
    )
    @settings(**_SETTINGS)
    def prop(vers, page):
        rows = [
            ("b", f"data/{k}", v, f"v{v}", False, v % 2 == 0, 10 + v, f"e{v}")
            for k, v in vers
        ]
        versions = spark.createDataFrame(
            rows or [("b", "x", 0, "v0", False, False, 0, "e")],
            "bucket string, key string, version_idx long, version_id string, "
            "is_latest boolean, is_delete_marker boolean, size long, "
            "etag string",
        )
        if not rows:
            versions = versions.limit(0)
        seen, km, vm = [], None, None
        for _ in range(60):
            out = list_object_versions(
                versions,
                prefix="data/",
                key_marker=km,
                version_idx_marker=vm,
                max_keys=page,
            ).collect()
            seen.extend((r.key, r.version_id) for r in out)
            if len(out) < page:
                break
            km = out[-1].key
            vm = int(out[-1].version_id[1:])
        want = [
            (f"data/{k}", f"v{v}")
            for k, v in sorted(vers, key=lambda t: (t[0], -t[1]))
        ]
        assert seen == want

    prop()


def test_list_notifications_walk(spark):
    """ListNotifications: (created_at_ms, notification_id) cursor with
    created DESC, id ASC walk order — the tiny timestamp domain forces
    created_at ties across page boundaries."""

    @given(
        notes=st.sets(
            st.tuples(st.integers(0, 3), st.integers(0, 20)),
            min_size=0,
            max_size=14,
        ),
        page=st.integers(1, 4),
    )
    @settings(**_SETTINGS)
    def prop(notes, page):
        rows = [(7, i, 1000 + t) for t, i in notes] + [(8, 0, 999)]
        inbox = spark.createDataFrame(
            rows,
            "recipient long, notification_id long, created_at_ms long",
        )
        seen, cursor = [], None
        for _ in range(40):
            out = list_notifications(
                inbox, recipient=7, cursor=cursor, limit=page
            ).collect()
            seen.extend((r.created_at_ms, r.notification_id) for r in out)
            if len(out) < page:
                break
            cursor = (out[-1].created_at_ms, out[-1].notification_id)
        want = [
            (1000 + t, i)
            for t, i in sorted(notes, key=lambda p: (-p[0], p[1]))
        ]
        assert seen == want

    prop()
