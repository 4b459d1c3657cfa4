"""Property test: the closed-form budgeted drain equals a literal
simulation of the reference claim loop.

``drain_class_budget`` computes the claimed page, the
``deferred_saturated`` flag, and ``next_due_after_ms`` from bounded
heads and one-row aggregates; ``claim_due_jobs`` (drain.rs:177-299)
walks the due index row by row against per-class budgets, skipping
saturated classes and breaking once both budgets empty. Over random
queues (duplicate due timestamps, arbitrary class mixes, zero budgets)
the two must agree row-for-row — including the flag's observation
window (a skip counts only if the scan reaches it before the break)
and the 20 s reconcile floor on an expired lease head
(drain.rs:313-333, mod.rs:24,47).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.queries.jobs import JOB_HEARTBEAT_MS, drain_class_budget

NOW = 1_000

_job = st.tuples(
    st.sampled_from(["queued", "running", "succeeded"]),
    st.integers(min_value=NOW - 6, max_value=NOW + 6),  # due (ties likely)
    st.sampled_from(["in_process", "external"]),
    st.integers(min_value=NOW - 3, max_value=NOW + 3),  # lease expiry
)


def _simulate(jobs, b_ip, b_ext):
    """Literal drain.rs claim_due_jobs + next_drain_delays."""
    budget = {"in_process": b_ip, "external": b_ext}
    claimed, deferred = [], False
    if b_ip == 0 and b_ext == 0:
        deferred = True  # drain.rs:185-188: saturated before the scan
    else:
        due = sorted(
            (j for j in jobs if j["state"] == "queued" and j["due"] <= NOW),
            key=lambda j: (j["due"], j["job_id"]),
        )
        for j in due:
            if budget[j["cls"]] == 0:
                deferred = True  # drain.rs:261-264: skip, no write
                continue
            budget[j["cls"]] -= 1
            claimed.append(j)
            if budget["in_process"] == 0 and budget["external"] == 0:
                break  # drain.rs:269-272
    ranks, seen = {}, {"in_process": 0, "external": 0}
    for j in claimed:
        seen[j["cls"]] += 1
        ranks[j["job_id"]] = seen[j["cls"]]
    future = [
        j["due"] - NOW
        for j in jobs
        if j["state"] == "queued" and j["due"] > NOW
    ]
    leases = [j["lease"] for j in jobs if j["state"] == "running"]
    delays = []
    if future:
        delays.append(min(future))
    if leases:
        m = min(leases)
        delays.append(JOB_HEARTBEAT_MS if m <= NOW else m - NOW)
    nxt = min(delays) if delays else None
    return claimed, ranks, deferred, nxt


@given(
    raw=st.lists(_job, min_size=0, max_size=16),
    b_ip=st.integers(min_value=0, max_value=4),
    b_ext=st.integers(min_value=0, max_value=4),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_drain_budget_equals_simulation(spark, raw, b_ip, b_ext):
    jobs = [
        {
            "job_id": f"j{i:02d}",
            "state": state,
            "due": due,
            "cls": cls,
            "lease": lease,
        }
        for i, (state, due, cls, lease) in enumerate(raw)
    ]
    rows = [
        (
            j["job_id"],
            j["state"],
            j["due"],
            j["cls"],
            j["lease"] if j["state"] == "running" else None,
        )
        for j in jobs
    ]
    schema = (
        "job_id string, state string, due_at_ms long,"
        " execution_class string, lease_expires_ms long"
    )
    df = spark.createDataFrame(rows or [("x", "queued", 0, "in_process", None)], schema)
    if not rows:
        df = df.limit(0)

    got = drain_class_budget(df, b_ip, b_ext, NOW).collect()
    claimed, ranks, deferred, nxt = _simulate(jobs, b_ip, b_ext)

    assert {r.job_id for r in got} == {j["job_id"] for j in claimed}
    for r in got:
        assert r.class_rank == ranks[r.job_id]
        assert r.deferred_saturated == deferred
        assert r.next_due_after_ms == nxt
