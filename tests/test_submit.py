"""Job submit dedup/cap ladder (jobs/submit.rs)."""

from __future__ import annotations

from aruna_spark.queries.submit import (
    classify_submits,
    jobs_submit_batch,
    load_dedup_index,
    load_submit_specs,
)


def test_all_verdicts_and_envelope_shape(spark, sf_dir):
    rows = jobs_submit_batch(spark, sf_dir).collect()
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"existing", "plan_conflict", "active_limit", "created"}
    for r in rows:
        if r["verdict"] == "existing":
            assert r["created"] is False and r["job_id"].startswith("job-")
        elif r["verdict"] == "created":
            assert r["created"] is True
            assert r["job_id"].startswith("job-new-")
        elif r["verdict"] == "plan_conflict":
            # the conflict names the existing job (rs:77)
            assert r["job_id"].startswith("job-")
            assert r["created"] is None
        else:
            assert r["limit"] == 2 and r["job_id"] is None


def test_dedup_scoped_per_owner(spark, sf_dir):
    """Equal logical keys from different owners never share a dedup
    row (submit.rs:765-783): the same dk value appears under several
    owners in the index with DIFFERENT existing jobs."""
    idx = [r.asDict() for r in load_dedup_index(spark, sf_dir).collect()]
    by_dk = {}
    for r in idx:
        by_dk.setdefault(r["dedup_key"], set()).add(
            (r["created_by"], r["existing_job_id"])
        )
    multi = [v for v in by_dk.values() if len({o for o, _ in v}) > 1]
    assert multi, "fixture must shard one dk across owners"
    for v in multi:
        assert len({j for _, j in v}) == len(v)


def test_dangling_entry_repoints_not_conflicts(spark, sf_dir):
    """A spec whose key points at a missing/undecodable record must
    create fresh and repoint — never 'existing', never a conflict."""
    specs = load_submit_specs(spark, sf_dir)
    idx = load_dedup_index(spark, sf_dir)
    dangling_keys = {
        (r["created_by"], r["dedup_key"])
        for r in idx.filter("record_missing OR record_undecodable").collect()
    }
    assert dangling_keys, "fixture must contain dangling entries"
    out = classify_submits(specs, idx, 2).collect()
    spec_keys = {
        r["spec_id"]: (r["created_by"], r["dedup_key"])
        for r in specs.collect()
    }
    hit_dangling = 0
    for r in out:
        if spec_keys[r["spec_id"]] in dangling_keys:
            hit_dangling += 1
            assert r["verdict"] in ("created", "active_limit")
            if r["verdict"] == "created":
                assert r["repoints_dedup"] is True
    assert hit_dangling, "fixture must submit against a dangling entry"
