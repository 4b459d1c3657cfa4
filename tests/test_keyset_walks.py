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


def test_list_buckets_walk(spark):
    """ListBuckets (r8): continuation_token = last returned name
    (list_buckets.rs:139-145); the full paged walk over random bucket
    sets and page sizes equals the group's name-ordered relation, and
    foreign-group buckets never leak."""
    from aruna_spark.queries.buckets import list_buckets

    @given(
        names=st.sets(
            st.text(alphabet="abc-", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        page=st.integers(1, 4),
    )
    @settings(**_SETTINGS)
    def prop(names, page):
        rows = [(n, "grp-main", 100, "admin") for n in names] + [
            ("zzz-foreign", "grp-other", 1, "x")
        ]
        buckets = spark.createDataFrame(
            rows, "name string, group_id string, created_at long,"
            " created_by string"
        )
        rollups = spark.createDataFrame(
            [(n, 1, 2, 10) for n in names],
            "name string, object_count long, version_count long,"
            " total_bytes long",
        )
        seen, token = [], None
        for _ in range(30):
            out = sorted(
                list_buckets(
                    buckets, rollups, "grp-main",
                    continuation_token=token, max_buckets=page,
                ).collect(),
                key=lambda r: r.name,
            )
            seen.extend(r.name for r in out)
            if not out or not out[0].is_truncated:
                break
            token = out[0].next_token
        assert seen == sorted(names)

    prop()


def test_drain_to_empty_conserves_queue(spark):
    """Budgeted drain ticked to exhaustion: every due job is claimed
    exactly once, never over a tick's class budget — the queue analog of
    the keyset no-skip/no-dup walk (claimed jobs leave the queue, the
    next tick re-scans)."""
    from aruna_spark.queries.jobs import drain_class_budget

    @given(
        jobs=st.lists(
            st.tuples(
                st.integers(995, 1005),  # due (ties likely), NOW=1000
                st.sampled_from(["in_process", "external"]),
            ),
            min_size=0,
            max_size=14,
        ),
        b_ip=st.integers(1, 3),
        b_ext=st.integers(1, 3),
    )
    @settings(**_SETTINGS)
    def prop(jobs, b_ip, b_ext):
        now = 1_000
        queue = {
            f"j{i:02d}": (due, cls) for i, (due, cls) in enumerate(jobs)
        }
        due_ids = {j for j, (d, _) in queue.items() if d <= now}
        schema = (
            "job_id string, state string, due_at_ms long,"
            " execution_class string, lease_expires_ms long"
        )
        claimed_all = []
        for _ in range(40):
            rows = [
                (j, "queued", d, c, None) for j, (d, c) in queue.items()
            ]
            df = spark.createDataFrame(
                rows or [("x", "queued", 0, "in_process", None)], schema
            )
            if not rows:
                df = df.limit(0)
            got = drain_class_budget(df, b_ip, b_ext, now).collect()
            if not got:
                break
            per_cls = {"in_process": 0, "external": 0}
            for r in got:
                per_cls[r.execution_class] += 1
                claimed_all.append(r.job_id)
                del queue[r.job_id]
            assert per_cls["in_process"] <= b_ip
            assert per_cls["external"] <= b_ext
        assert sorted(claimed_all) == sorted(due_ids)
        assert len(set(claimed_all)) == len(claimed_all)

    prop()
