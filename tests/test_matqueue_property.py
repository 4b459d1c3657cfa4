"""Property tests: the materialization-queue CASE ladders equal a
literal Python port of materialization_queue.rs over random batches.

``classify_finish_batch`` and ``requeue_sweep`` compute verdicts and
minted backoff instants from join flags; the reference walks each
record through ``defer_materialization_job`` (rs:1524-1549),
``materialization_retry_already_advanced`` (rs:1876-1882),
``parked_dead_letter`` (rs:921-945), and ``requeue_dead_letters``
(rs:975-1060). Random batches force every branch boundary: failure
counts straddling the budget, statuses at equal/adjacent events with
equal/greater attempts, previous dead letters present or not, and
requeue instants straddling NOW.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.queries.matqueue import (
    DL_REQUEUE_BASE_MS,
    DL_REQUEUE_MAX_MS,
    MAX_FAILURES,
    Q_BASE_MS,
    Q_MAX_MS,
    classify_finish_batch,
    requeue_sweep,
)

NOW = 50_000


def _retry(n, base, cap):
    return min(base * (1 << min(n, 7)), cap)


_finish_row = st.tuples(
    st.integers(min_value=0, max_value=6),  # event_n
    st.sampled_from(["done", "infra_fail", "app_fail"]),
    st.integers(min_value=0, max_value=5),  # attempts
    st.integers(min_value=7, max_value=11),  # failures (straddles 10)
    st.integers(min_value=0, max_value=2),  # parks
    st.integers(min_value=-1, max_value=1),  # status event delta
    st.integers(min_value=0, max_value=1),  # status attempts delta
    st.sampled_from(["pending", "materialized", "failed"]),
    st.one_of(st.none(), st.integers(min_value=1, max_value=4)),  # prev parks
)


def _finish_model(r):
    (ev, outcome, attempts, failures, parks, sd, ad, state, prev) = r
    nf = failures + (1 if outcome == "app_fail" else 0)
    sev, sat = ev + sd, attempts + ad
    final = state in ("materialized", "failed")
    advanced = (sev >= ev and final) or (sev == ev and sat > attempts)
    if outcome == "done":
        return ("done", None, None, None, None)
    if advanced:
        return ("dropped_superseded", None, None, None, None)
    if nf >= MAX_FAILURES:
        np = max(prev or 0, parks) + 1
        return (
            "parked",
            None,
            NOW + _retry(np - 1, DL_REQUEUE_BASE_MS, DL_REQUEUE_MAX_MS),
            np,
            nf,
        )
    return (
        "rescheduled",
        NOW + _retry(attempts + 1, Q_BASE_MS, Q_MAX_MS),
        None,
        None,
        nf,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_finish_row, min_size=1, max_size=12))
def test_finish_batch_equals_literal_port(spark, rows):
    data = []
    for i, r in enumerate(rows):
        (ev, outcome, attempts, failures, parks, sd, ad, state, prev) = r
        data.append(
            (
                f"doc-{i}",
                ev,
                outcome,
                attempts,
                failures,
                parks,
                ev + sd,
                attempts + ad,
                state,
                prev,
            )
        )
    df = spark.createDataFrame(
        data,
        "document_id string, event_n int, outcome string, attempts int,"
        " failures int, parks int, status_event_n int, status_attempts int,"
        " status_state string, prev_parks int",
    )
    got = {
        r["document_id"]: (
            r["verdict"],
            r["next_due_at_ms"],
            r["requeue_at_ms"],
            r["new_parks"],
            r["new_failures"],
        )
        for r in classify_finish_batch(df, NOW).collect()
    }
    want = {f"doc-{i}": _finish_model(r) for i, r in enumerate(rows)}
    assert got == want


_letter_row = st.tuples(
    st.integers(min_value=0, max_value=6),  # event_n
    st.integers(min_value=1, max_value=4),  # parks
    st.integers(min_value=NOW - 2, max_value=NOW + 2),  # requeue_at
    st.booleans(),  # event_missing
    st.integers(min_value=-1, max_value=1),  # status event delta
    st.sampled_from(["pending", "materialized", "failed"]),
)


def _letter_model(r):
    ev, parks, at, missing, sd, state = r
    sev = ev + sd
    final = state in ("materialized", "failed")
    if at > NOW:
        return ("deferred", None, None, None)
    if missing:
        return ("dropped_missing_event", None, None, None)
    if sev >= ev and final and (sev > ev or state == "materialized"):
        return ("dropped_superseded", None, None, None)
    return ("requeued", parks, MAX_FAILURES - 1, NOW)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_letter_row, min_size=1, max_size=12))
def test_requeue_sweep_equals_literal_port(spark, rows):
    data = [
        (f"doc-{i}", r[0], r[1], r[2], r[3], r[0] + r[4], r[5])
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "document_id string, event_n int, parks int, requeue_at_ms long,"
        " event_missing boolean, status_event_n int, status_state string",
    )
    got = {
        r["document_id"]: (
            r["verdict"],
            r["kept_parks"],
            r["new_failures"],
            r["due_at_ms"],
        )
        for r in requeue_sweep(df, NOW).collect()
    }
    want = {f"doc-{i}": _letter_model(r) for i, r in enumerate(rows)}
    assert got == want
