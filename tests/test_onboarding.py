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
