"""Hypothesis properties for the round-12 operators, each compared
against a literal Python port of the reference logic over generated
inputs batched into ONE DataFrame evaluation:

- blob-replication identity dedup + due-batch cut
  (replication/queue.rs:400-405, 1916-2034);
- the onboarding inspect ladder (inspect_onboarding_secret.rs:150-168).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=15, deadline=None)


# ------------------------------------------ blob-replication drain

_job = st.fixed_dictionaries(
    {
        "mode": st.sampled_from(["on_demand", "live"]),
        "bucket": st.sampled_from(["b0", "b1"]),
        "target": st.sampled_from(["t0", "t1"]),
        "due_at_ms": st.integers(min_value=0, max_value=200),
        "attempts": st.integers(min_value=0, max_value=4),
    }
)


def _preferred_port(jobs):
    """queue.rs:400-405: per identity, max (attempts, due_at_ms);
    job_id breaks residual ties exactly as survivors() documents."""
    best = {}
    for j in jobs:
        key = (j["mode"], j["bucket"], j["target"])
        cur = best.get(key)
        cand = (j["attempts"], j["due_at_ms"], j["job_id"])
        if cur is None or cand > cur:
            best[key] = cand
    return {v[2] for v in best.values()}


@given(st.lists(_job, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_survivors_match_python_port(spark, jobs):
    from aruna_spark.queries.blob_repl_queue import survivors

    rows = [
        dict(j, job_id=i, target_node="n0", dm_key="n", rel_key="")
        for i, j in enumerate(jobs)
    ]
    df = spark.createDataFrame(
        [
            (
                r["job_id"],
                r["mode"],
                r["bucket"],
                r["target"],
                r["target_node"],
                r["dm_key"],
                r["rel_key"],
                r["due_at_ms"],
                r["attempts"],
            )
            for r in rows
        ],
        "job_id long, mode string, bucket string, target string, "
        "target_node string, dm_key string, rel_key string, "
        "due_at_ms long, attempts int",
    )
    got = {
        r.job_id for r in survivors(df).collect() if r.is_preferred
    }
    assert got == _preferred_port(rows)


@given(st.lists(_job, min_size=1, max_size=40), st.integers(0, 200))
@settings(**SETTINGS)
def test_drain_batch_is_key_ordered_head_of_due(spark, jobs, now):
    """The batch = the first batch_size DUE survivors in canonical
    key order; everything due beyond it overflows (queue.rs:1916-2034
    early-return discipline)."""
    from aruna_spark.queries.blob_repl_queue import (
        classify_drain,
        survivors,
    )

    rows = [
        dict(j, job_id=i, target_node="n0", dm_key="n", rel_key="",
             outcome_lane=i % 29, is_dup=False)
        for i, j in enumerate(jobs)
    ]
    df = spark.createDataFrame(
        [
            (
                r["job_id"], r["is_dup"], r["mode"], r["bucket"],
                r["target"], r["target_node"], r["dm_key"], r["rel_key"],
                r["due_at_ms"], r["attempts"], r["outcome_lane"],
            )
            for r in rows
        ],
        "job_id long, is_dup boolean, mode string, bucket string, "
        "target string, target_node string, dm_key string, "
        "rel_key string, due_at_ms long, attempts int, outcome_lane long",
    )
    batch_size = 3
    out = classify_drain(survivors(df), now=now, batch_size=batch_size)
    got = {r.job_id: r.outcome for r in out.collect()}

    surv = _preferred_port(rows)
    key = {
        r["job_id"]: (r["mode"], r["bucket"], r["target"], "n0", "n", "")
        for r in rows
    }
    due = sorted(
        (
            r["job_id"]
            for r in rows
            if r["job_id"] in surv and r["due_at_ms"] <= now
        ),
        key=lambda i: (key[i], i),
    )
    batch = set(due[:batch_size])
    for r in rows:
        jid = r["job_id"]
        if jid not in surv:
            assert got[jid] == "superseded_duplicate"
        elif r["due_at_ms"] > now:
            assert got[jid] == "future"
        elif jid in batch:
            assert got[jid].startswith("batch_")
        else:
            assert got[jid] == "due_overflow"


# ------------------------------------------ onboarding inspect ladder

_secret = st.fixed_dictionaries(
    {
        "present": st.booleans(),
        "state": st.sampled_from(
            ["available", "reserved", "finalizing", "consumed"]
        ),
        "state_node": st.sampled_from(["node-a", "node-b", None]),
        "expires_at": st.integers(0, 100),
        "good_hash": st.booleans(),
        "node": st.sampled_from(["node-a", "node-b"]),
        "now": st.integers(0, 100),
    }
)


def _normalize(s):
    """A claim state always carries its claiming node (every reference
    write path stamps both — load_secrets documents the invariant);
    only 'available' records have no state_node."""
    s = dict(s)
    if s["state"] != "available" and s["state_node"] is None:
        s["state_node"] = "node-a"
    if s["state"] == "available":
        s["state_node"] = None
    return s


def _inspect_port(s):
    """Literal port of inspect_onboarding_secret.rs:122-168."""
    if not s["present"]:
        return "not_found"
    finalizing_self = (
        s["state"] == "finalizing" and s["state_node"] == s["node"]
    )
    if s["state"] == "finalizing" and s["state_node"] != s["node"]:
        return "already_claimed"
    if s["expires_at"] < s["now"] and not finalizing_self:
        return "expired"
    if not s["good_hash"]:
        return "invalid_secret"
    return "ok"


@given(st.lists(_secret, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_inspect_ladder_matches_python_port(spark, secrets):
    from aruna_spark.queries.onboarding import classify_inspect

    # one shared clock per batch evaluation: split by now value
    by_now = {}
    for i, s in enumerate(secrets):
        by_now.setdefault(s["now"], []).append((i, _normalize(s)))
    for now, batch in by_now.items():
        rows = [
            (
                i,
                s["node"],
                "good" if s["good_hash"] else "bad",
                "good" if s["present"] else None,
                "Server" if s["present"] else None,
                s["expires_at"] if s["present"] else None,
                s["state"] if s["present"] else None,
                s["state_node"],
            )
            for i, s in batch
        ]
        df = spark.createDataFrame(
            rows,
            "enrollment_id long, node_id string, req_hash string, "
            "secret_hash string, mode string, expires_at long, "
            "state string, state_node string",
        )
        got = {
            r.enrollment_id: r.outcome
            for r in classify_inspect(df, now=now).collect()
        }
        for i, s in batch:
            assert got[i] == _inspect_port(s), (s, now)
