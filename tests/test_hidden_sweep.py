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
