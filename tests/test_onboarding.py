"""Onboarding-secret ladders pinned against the reference's own unit
tests (reserve_onboarding_secret.rs:370-503) plus the consume ladder's
two distinctive rungs (expiry-before-hash with the engagement
override; idempotent re-consume)."""

from __future__ import annotations

import pytest

from aruna_spark.queries.onboarding import (
    classify_consume,
    classify_reserve,
)

JOINED_SCHEMA = (
    "enrollment_id long, node_id string, req_hash string, "
    "finalizing boolean, secret_hash string, expires_at long, "
    "state string, state_node string, reservation_expires_at long"
)


def _reserve(spark, row, now):
    df = spark.createDataFrame([row], JOINED_SCHEMA)
    r = classify_reserve(df, now=now).collect()[0]
    return r["outcome"], r["written_state"]


def _consume(spark, row, now):
    df = spark.createDataFrame([row], JOINED_SCHEMA)
    r = classify_consume(df, now=now).collect()[0]
    return r["outcome"], r["consumed_now"]


SECRET = dict(secret_hash="abc", expires_at=100)


def _row(
    node="node-a",
    req_hash="abc",
    finalizing=False,
    state="available",
    state_node=None,
    res_expires=None,
    present=True,
):
    return (
        1,
        node,
        req_hash,
        finalizing,
        SECRET["secret_hash"] if present else None,
        SECRET["expires_at"] if present else None,
        state if present else None,
        state_node,
        res_expires,
    )


# --- reserve (rs:370-440: reserves_secret_idempotently_for_same_node) ---


def test_reserve_available_then_idempotent_then_other_claim(spark):
    # fresh secret, node-a reserves at now=10
    assert _reserve(spark, _row(), now=10) == ("reserved", "reserved")
    # node-a re-reserves at now=15 against its own live reservation
    assert _reserve(
        spark,
        _row(state="reserved", state_node="node-a", res_expires=20),
        now=15,
    ) == ("reserved", "reserved")
    # node-b at now=15: node-a's reservation (expires 20) is live
    assert _reserve(
        spark,
        _row(
            node="node-b",
            state="reserved",
            state_node="node-a",
            res_expires=20,
        ),
        now=15,
    ) == ("already_claimed", None)


def test_reserve_expired_reservation_reclaimed_before_secret_expiry(spark):
    # rs:446-503: node-b reclaims at now=21 once node-a's reservation
    # (expires 20) lapsed, the secret itself (expires 100) still live
    assert _reserve(
        spark,
        _row(
            node="node-b",
            state="reserved",
            state_node="node-a",
            res_expires=20,
        ),
        now=21,
    ) == ("reserved", "reserved")


@pytest.mark.parametrize(
    "row_kw,now,expected",
    [
        (dict(present=False), 10, ("not_found", None)),
        (dict(req_hash="wrong"), 10, ("invalid_secret", None)),
        # available but the RECORD expired (expires_at 100 < now)
        (dict(), 101, ("expired", None)),
        # stealing an expired reservation fails once the record expired
        (
            dict(
                node="node-b",
                state="reserved",
                state_node="node-a",
                res_expires=20,
            ),
            101,
            ("expired", None),
        ),
        # finalizing/consumed by the caller: success WITHOUT a write
        (
            dict(state="finalizing", state_node="node-a"),
            10,
            ("noop", None),
        ),
        (
            dict(state="consumed", state_node="node-a"),
            10,
            ("noop", None),
        ),
        (
            dict(node="node-b", state="finalizing", state_node="node-a"),
            10,
            ("already_claimed", None),
        ),
        (
            dict(node="node-b", state="consumed", state_node="node-a"),
            10,
            ("already_claimed", None),
        ),
    ],
)
def test_reserve_ladder_rungs(spark, row_kw, now, expected):
    assert _reserve(spark, _row(**row_kw), now=now) == expected


def test_reserve_finalizing_flag_selects_written_state(spark):
    assert _reserve(spark, _row(finalizing=True), now=10) == (
        "reserved",
        "finalizing",
    )


# --- consume ---


def test_consume_expiry_checked_before_hash(spark):
    # expired record + WRONG hash: expiry rejects first (the reference
    # checks record.expires_at before secret_hash, rs:176-206)
    assert _consume(spark, _row(req_hash="wrong"), now=101) == (
        "expired",
        None,
    )
    # live record + wrong hash → invalid_secret
    assert _consume(spark, _row(req_hash="wrong"), now=10) == (
        "invalid_secret",
        None,
    )


def test_consume_engagement_overrides_record_expiry(spark):
    # node-a holds a LIVE reservation (expires 200) on an EXPIRED
    # secret (expires 100 < now 150): the in-flight bootstrap consumes
    assert _consume(
        spark,
        _row(state="reserved", state_node="node-a", res_expires=200),
        now=150,
    ) == ("consumed", True)
    # finalizing by the caller also overrides
    assert _consume(
        spark, _row(state="finalizing", state_node="node-a"), now=150
    ) == ("consumed", True)
    # an expired reservation does NOT override
    assert _consume(
        spark,
        _row(state="reserved", state_node="node-a", res_expires=120),
        now=150,
    ) == ("expired", None)


def test_consume_idempotent_and_claimed_rungs(spark):
    assert _consume(
        spark, _row(state="consumed", state_node="node-a"), now=10
    ) == ("idempotent", False)
    assert _consume(
        spark,
        _row(node="node-b", state="consumed", state_node="node-a"),
        now=10,
    ) == ("already_claimed", None)
    assert _consume(spark, _row(), now=10) == ("consumed", True)
    assert _consume(spark, _row(present=False), now=10) == (
        "not_found",
        None,
    )


def test_listing_keeps_expired_finalizing_secret(spark, sf_dir):
    # api/routes/onboarding.rs test:
    # list_prunes_expired_available_but_keeps_expired_finalizing
    from aruna_spark.queries.onboarding import (
        NOW,
        onboarding_secret_listing,
    )

    rows = onboarding_secret_listing(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["expires_at"] >= NOW or r["state"] == "finalizing"
    # the expired-finalizing survivor lane is actually populated
    assert any(
        r["expires_at"] < NOW and r["state"] == "finalizing" for r in rows
    )


# --- inspect (inspect_onboarding_secret.rs:150-168 + tests:277-313) ---

INSPECT_SCHEMA = (
    "enrollment_id long, node_id string, req_hash string, "
    "secret_hash string, mode string, expires_at long, "
    "state string, state_node string"
)


def _inspect(spark, row, now):
    from aruna_spark.queries.onboarding import classify_inspect

    df = spark.createDataFrame([row], INSPECT_SCHEMA)
    r = classify_inspect(df, now=now).collect()[0]
    return r["outcome"], r["claimed_node_id"]


def _irow(
    node="node-a",
    req_hash="abc",
    state="available",
    state_node=None,
    expires=100,
    present=True,
):
    return (
        1,
        node,
        req_hash,
        "abc" if present else None,
        "Server" if present else None,
        expires if present else None,
        state if present else None,
        state_node,
    )


def test_inspect_expired_finalizing_secret_same_node_ok(spark):
    """rs tests:277-293 — expires_at 100, Finalizing by node-a,
    now 101: the finalizing node itself still inspects Ok and gets
    the record back."""
    row = _irow(state="finalizing", state_node="node-a")
    assert _inspect(spark, row, now=101) == ("ok", "node-a")


def test_inspect_expired_finalizing_secret_rejects_other_node(spark):
    """rs tests:296-313 — same secret inspected by node-b is
    AlreadyClaimed, NOT Expired: the foreign-claim rung precedes the
    expiry rung (rs:150-156)."""
    row = _irow(node="node-b", state="finalizing", state_node="node-a")
    assert _inspect(spark, row, now=101)[0] == "already_claimed"


def test_inspect_rung_order_distinctions(spark):
    # hash is checked LAST: a wrong secret still learns the claim /
    # expiry state (rs:164 sits after both rejections)
    row = _irow(req_hash="bad", state="finalizing", state_node="node-b")
    assert _inspect(spark, row, now=50)[0] == "already_claimed"
    row = _irow(req_hash="bad", expires=10)
    assert _inspect(spark, row, now=50)[0] == "expired"
    row = _irow(req_hash="bad")
    assert _inspect(spark, row, now=50)[0] == "invalid_secret"
    # the expiry override is Finalizing-by-caller ONLY — an expired
    # record held by the caller's own live RESERVATION still rejects
    # (unlike consume's wider engagement override)
    row = _irow(state="reserved", state_node="node-a", expires=10)
    assert _inspect(spark, row, now=50)[0] == "expired"
    # missing record
    assert _inspect(spark, _irow(present=False), now=50)[0] == "not_found"
    # consumed-by-caller is NOT a special case for inspect: it reads Ok
    row = _irow(state="consumed", state_node="node-a")
    assert _inspect(spark, row, now=50) == ("ok", "node-a")


def test_inspect_route_reads_without_mutation(spark, sf_dir):
    from aruna_spark.api import Engine

    eng = Engine(spark, sf_dir)
    made = eng.create_onboarding_secret("Server", 100, now_ms=0)
    eid, secret = made["enrollment_id"], made["secret"]
    before = dict(eng._onboarding()[eid])
    out = eng.inspect_onboarding_secret(eid, secret, "node-a", now_ms=50)
    assert out["status"] == 200
    assert out["record"]["mode"] == "Server"
    assert eng._onboarding()[eid] == before, "inspect must not write"
    assert (
        eng.inspect_onboarding_secret(eid, "wrong", "node-a", 50)["status"]
        == 403
    )
    assert (
        eng.inspect_onboarding_secret("nope", secret, "node-a", 50)[
            "status"
        ]
        == 404
    )
    # the reference's own fixture: reserve finalizing as node-a, let
    # the record expire — node-a inspects Ok, node-b AlreadyClaimed
    eng.reserve_onboarding_secret(
        eid, secret, "node-a", now_ms=10,
        reservation_expires_at=20, finalizing=True,
    )
    late = before["expires_at"] + 1
    same = eng.inspect_onboarding_secret(eid, secret, "node-a", late)
    assert same["status"] == 200
    assert same["record"]["claimed_node_id"] == "node-a"
    other = eng.inspect_onboarding_secret(eid, secret, "node-b", late)
    assert other == {"status": 409, "error": "AlreadyClaimed"}
