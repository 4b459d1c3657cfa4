"""Hidden-blob sweep (hidden.rs) — independent-model + branch tests."""

from __future__ import annotations

from aruna_spark.queries.hidden import (
    NOW_MS,
    ORPHAN_GRACE_MS,
    blobs_hidden_sweep,
    load_hidden_entries,
    load_uploads_hidden,
    _jobs_annotated,
)


def _python_model(jobs, uploads, hidden):
    """Literal port of hidden.rs's two passes over collected rows."""
    active = {j["job_id"] for j in jobs if j["active"]}
    active_rocrate = {
        j["job_id"] for j in jobs if j["active"] and j["rocrate"]
    }
    referenced = set()
    for j in jobs:
        if j["active"] and j["rocrate"] and j["k"] % 2 == 0:
            referenced.add(f"_jobs/{j['job_id']}/input_01")
        if j["rocrate"] and j["state"] == "succeeded":
            referenced.add(f"_jobs/{j['job_id']}/artifact_01")
    swept = set()
    for u in uploads:  # upload_is_live, hidden.rs:200-205
        live = (
            u["claimed_by"] in active
            if u["claimed_by"] is not None
            else u["expires_at_ms"] > NOW_MS
        )
        (referenced if live else swept).add(u["key"])
    out = {}
    cutoff = NOW_MS - ORPHAN_GRACE_MS
    for h in hidden:  # is_orphaned, hidden.rs:207-223
        ns = h["key"].split("/")[1]
        if h["key"] in swept:
            v = "swept_upload"
        elif h["key"] in referenced:
            v = "referenced"
        elif ns in active_rocrate:
            v = "active_namespace"
        elif h["modified_at_ms"] <= cutoff:
            v = "orphaned"
        else:
            v = "young"
        out[h["key"]] = v
    return out


def test_sweep_matches_python_model_and_hits_every_branch(spark, sf_dir):
    jobs = [r.asDict() for r in _jobs_annotated(spark, sf_dir).collect()]
    uploads = [
        r.asDict() for r in load_uploads_hidden(spark, sf_dir).collect()
    ]
    hidden = [
        r.asDict() for r in load_hidden_entries(spark, sf_dir).collect()
    ]
    want = _python_model(jobs, uploads, hidden)
    got = {
        r["key"]: r["verdict"]
        for r in blobs_hidden_sweep(spark, sf_dir).collect()
    }
    assert got == want
    assert set(got.values()) == {
        "swept_upload",
        "referenced",
        "active_namespace",
        "orphaned",
        "young",
    }


def test_upload_claim_shapes_all_present(spark, sf_dir):
    """Self-claimed, vanished-claim, and unclaimed uploads all occur,
    and a vanished claim is never live (active-set membership gates,
    hidden.rs:201-203)."""
    jobs = {j["job_id"]: j for j in (
        r.asDict() for r in _jobs_annotated(spark, sf_dir).collect()
    )}
    uploads = [
        r.asDict() for r in load_uploads_hidden(spark, sf_dir).collect()
    ]
    shapes = set()
    for u in uploads:
        c = u["claimed_by"]
        if c is None:
            shapes.add("unclaimed")
        elif c in jobs:
            shapes.add("self")
        else:
            shapes.add("vanished")
    assert shapes == {"unclaimed", "self", "vanished"}


def test_protected_entries_survive_orphan_age(spark, sf_dir):
    """Referenced and active-namespace entries past the grace cutoff
    still survive — age alone never deletes a protected entry."""
    rows = blobs_hidden_sweep(spark, sf_dir).collect()
    cutoff = NOW_MS - ORPHAN_GRACE_MS
    old_protected = [
        r
        for r in rows
        if r["modified_at_ms"] <= cutoff
        and r["verdict"] in ("referenced", "active_namespace")
    ]
    assert old_protected, "fixture must age some protected entries"
    for r in rows:
        if r["verdict"] == "orphaned":
            assert r["modified_at_ms"] <= cutoff


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.queries.hidden import hidden_sweep

_rand_job = st.tuples(
    st.sampled_from(["queued", "running", "succeeded", "failed"]),
    st.booleans(),  # rocrate
    st.integers(min_value=0, max_value=3),  # k parity driver
)
_rand_upload = st.tuples(
    st.integers(min_value=0, max_value=5),  # claimed: job idx, 5=missing
    st.booleans(),  # unclaimed instead
    st.integers(min_value=29_000, max_value=31_000),  # expires vs NOW
)
_rand_extra = st.lists(
    st.integers(min_value=28_500, max_value=29_500),  # modified vs cutoff
    min_size=0,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_rand_job, min_size=1, max_size=4),
    st.lists(_rand_upload, min_size=0, max_size=4),
    _rand_extra,
)
def test_sweep_equals_model_on_random_relations(spark, jobs_s, uploads_s, extras):
    """hidden_sweep == the literal two-pass port over random job
    states, claim shapes, expiries, and orphan ages around every
    boundary (NOW=30_000, grace=1_000)."""
    jobs = [
        {
            "job_id": f"job-{i}",
            "state": state,
            "k": 2 * i + (kpar % 2),
            "active": state in ("queued", "running"),
            "rocrate": rc,
        }
        for i, (state, rc, kpar) in enumerate(jobs_s)
    ]
    uploads = []
    for i, (claim_idx, unclaimed, expires) in enumerate(uploads_s):
        claimed_by = None
        if not unclaimed:
            claimed_by = (
                f"job-{claim_idx}" if claim_idx < len(jobs) else "job-missing"
            )
        uploads.append(
            {
                "upload_id": f"upl-{i}",
                "key": f"_jobs/upl-{i}/input_01",
                "expires_at_ms": expires,
                "claimed_by": claimed_by,
            }
        )
    hidden = [
        {"key": u["key"], "modified_at_ms": 28_900 + i}
        for i, u in enumerate(uploads)
    ]
    for j in jobs:
        hidden.append(
            {
                "key": f"_jobs/{j['job_id']}/artifact_01",
                "modified_at_ms": 28_800 + j["k"] * 50,
            }
        )
        if j["k"] % 2 == 0:
            hidden.append(
                {
                    "key": f"_jobs/{j['job_id']}/input_01",
                    "modified_at_ms": 29_100,
                }
            )
    for i, m in enumerate(extras):
        hidden.append({"key": f"_jobs/orph-{i}/tmp_01", "modified_at_ms": m})

    want = _python_model(jobs, uploads, hidden)
    jdf = spark.createDataFrame(
        [(j["job_id"], j["state"], j["k"], j["active"], j["rocrate"])
         for j in jobs],
        "job_id string, state string, k long, active boolean,"
        " rocrate boolean",
    )
    udf = spark.createDataFrame(
        [(u["upload_id"], u["key"], u["expires_at_ms"], u["claimed_by"])
         for u in uploads] or [("u", "_jobs/none/input_01", 0, None)],
        "upload_id string, key string, expires_at_ms long,"
        " claimed_by string",
    )
    if not uploads:
        udf = udf.filter("upload_id <> 'u'")
        want.pop("_jobs/none/input_01", None)
    hdf = spark.createDataFrame(
        [(h["key"], h["modified_at_ms"]) for h in hidden],
        "key string, modified_at_ms long",
    )
    got = {
        r["key"]: r["verdict"]
        for r in hidden_sweep(hdf, udf, jdf, 30_000, 1_000).collect()
    }
    assert got == want
