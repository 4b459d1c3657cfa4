"""S3 user-access credentials: listing, the path-restriction data-plane
gate, and revoke idempotency (create/list/revoke_user_access.rs +
api/src/s3/auth.rs:255-266)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.user_access import (
    LIST_USER,
    NOW_MS,
    access_gate,
    load_user_access,
    s3_user_access_gate,
    s3_user_access_list,
    s3_user_access_revoke,
)


@pytest.fixture(scope="module")
def creds(spark, sf_dir):
    return load_user_access(spark, sf_dir).collect()


def test_fixture_populates_every_lane(creds):
    """Coprimality guard: all status/restriction lanes alive at
    sf0.001."""
    assert any(r.revoked_at_ms is not None for r in creds)
    assert any(r.expiry_ms <= NOW_MS for r in creds)
    assert {r.restriction_lane for r in creds} == {None, 3, 7}
    # an ACTIVE credential exists in each restriction lane
    active = [
        r for r in creds
        if r.revoked_at_ms is None and r.expiry_ms > NOW_MS
    ]
    assert {r.restriction_lane for r in active} == {None, 3, 7}


def test_access_keys_are_alphanumeric(creds):
    """build_access_key (blob.rs:899-913) accepts only [A-Za-z0-9]."""
    assert all(r.access_key.isalnum() for r in creds)


def test_list_is_per_user_and_key_ordered(spark, sf_dir, creds):
    rows = s3_user_access_list(spark, sf_dir).collect()
    expected = sorted(
        r.access_key for r in creds if r.user_identity == LIST_USER
    )
    assert [r.access_key for r in rows] == expected
    assert len(rows) >= 2, "list fixture must exercise multi-credential"
    assert {"revoked", "expired", "active"} >= {r.status for r in rows}


@pytest.fixture(scope="module")
def gate(spark, sf_dir):
    rows = s3_user_access_gate(spark, sf_dir).collect()
    return {(r.access_key, r.key_path, r.action): r.allowed for r in rows}


def test_revoked_key_loses_read(creds, gate):
    """The VERDICT r8 done-criterion: a revoked credential is denied
    READ (and everything else) on every path, even ones its
    restrictions or group grant would otherwise allow."""
    revoked = [r for r in creds if r.revoked_at_ms is not None]
    assert revoked
    for r in revoked:
        assert not gate[(r.access_key, "data/src1/a.txt", "READ")]
        assert not any(
            v for (ak, _, _), v in gate.items() if ak == r.access_key
        )


def test_expired_key_fails_closed(creds, gate):
    expired = [
        r for r in creds
        if r.expiry_ms <= NOW_MS and r.revoked_at_ms is None
    ]
    assert expired
    for r in expired:
        assert not any(
            v for (ak, _, _), v in gate.items() if ak == r.access_key
        )


def test_unrestricted_active_key_passes_everywhere(creds, gate):
    free = [
        r for r in creds
        if r.restriction_lane is None
        and r.revoked_at_ms is None
        and r.expiry_ms > NOW_MS
    ]
    assert free
    for r in free:
        assert all(
            v for (ak, _, _), v in gate.items() if ak == r.access_key
        )


def test_readonly_restriction_semantics(creds, gate):
    """Lane 3 = READ on data/src1/**: read inside the subtree only;
    WRITE never; paths outside the whitelist never (whitelist, not
    grant union)."""
    lane3 = [
        r for r in creds
        if r.restriction_lane == 3
        and r.revoked_at_ms is None
        and r.expiry_ms > NOW_MS
    ]
    assert lane3
    for r in lane3:
        ak = r.access_key
        assert gate[(ak, "data/src1/a.txt", "READ")]
        assert gate[(ak, "data/src1/de/b.txt", "READ")]
        assert not gate[(ak, "data/src1/a.txt", "WRITE")]
        assert not gate[(ak, "data/src2/c.txt", "READ")]
        assert not gate[(ak, "logs/d.txt", "READ")]


def test_write_restriction_covers_read_and_deny_wins(creds, gate):
    """Lane 7 = WRITE on data/** minus DENY data/src1/de/**: WRITE ⊃
    READ (permission_rules.rs), DENY beats the broader grant."""
    lane7 = [
        r for r in creds
        if r.restriction_lane == 7
        and r.revoked_at_ms is None
        and r.expiry_ms > NOW_MS
    ]
    assert lane7
    for r in lane7:
        ak = r.access_key
        assert gate[(ak, "data/src1/a.txt", "WRITE")]
        assert gate[(ak, "data/src1/a.txt", "READ")]
        assert gate[(ak, "data/src2/c.txt", "WRITE")]
        assert not gate[(ak, "data/src1/de/b.txt", "READ")]
        assert not gate[(ak, "data/src1/de/b.txt", "WRITE")]
        assert not gate[(ak, "logs/d.txt", "READ")]


def test_revoke_is_idempotent(spark, sf_dir, creds):
    """revoke_user_access.rs:101-109 — already-revoked commits
    unchanged; fresh revokes stamp NOW."""
    rows = s3_user_access_revoke(spark, sf_dir).collect()
    by_key = {r.access_key: r for r in rows}
    batch = [r for r in creds if r.custkey % 5 == 2]
    assert set(by_key) == {r.access_key for r in batch}
    already = [r for r in batch if r.revoked_at_ms is not None]
    assert already, "batch must contain an already-revoked credential"
    for r in already:
        out = by_key[r.access_key]
        assert out.outcome == "already_revoked"
        assert out.revoked_at_ms == r.revoked_at_ms  # original survives
    fresh = [r for r in batch if r.revoked_at_ms is None]
    assert fresh
    for r in fresh:
        out = by_key[r.access_key]
        assert out.outcome == "revoked" and out.revoked_at_ms == NOW_MS


def test_gate_helper_composes_with_custom_requests(spark, sf_dir):
    """access_gate is the reusable operator — drive it with a fresh
    request set to show the whitelist anchors correctly (no substring
    leaks: data/src1x must not match data/src1/**)."""
    reqs = spark.createDataFrame(
        [("data/src1x/evil.txt", "READ")], "key_path string, action string"
    )
    out = access_gate(load_user_access(spark, sf_dir), reqs).collect()
    lane3 = {
        r.access_key
        for r in load_user_access(spark, sf_dir).collect()
        if r.restriction_lane == 3
    }
    for r in out:
        if r.access_key in lane3:
            assert not r.allowed
