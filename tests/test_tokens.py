"""Bearer-token validation ladder (operations/src/auth.rs)."""

from __future__ import annotations

from aruna_spark.ops.ed25519 import public_key, sign
from aruna_spark.ops.tokens import (
    ISSUER_KEY_CACHE_CAPACITY,
    ISSUER_KEY_CACHE_TTL_S,
    IssuerKeyCache,
    _b64e,
    bearer_token_hash,
    encode_token,
    validate_bearer_token,
)

REALM_SEED = bytes([7]) * 32
REALM_PUB = _b64e(public_key(REALM_SEED))
DELEGATE_SEED = bytes([9]) * 32
DELEGATE_PUB = _b64e(public_key(DELEGATE_SEED))
TRUSTED = {REALM_PUB}
NOW = 1_000_000.0


def _claims(**kw):
    base = {"iss": REALM_PUB, "sub": "user-1", "exp": NOW + 100}
    base.update(kw)
    return base


def _delegated_claims(**kw):
    sig = _b64e(sign(REALM_SEED, DELEGATE_PUB.encode()))
    return _claims(
        issuer_pubkey=DELEGATE_PUB, delegation_signature=sig, **kw
    )


def test_realm_token_validates():
    tok = encode_token(_claims(), REALM_SEED)
    status, claims = validate_bearer_token(tok, TRUSTED, set(), now=NOW)
    assert status == "ok" and claims["sub"] == "user-1"


def test_revocation_checks_before_anything():
    tok = encode_token(_claims(), REALM_SEED)
    status, _ = validate_bearer_token(
        tok, TRUSTED, {bearer_token_hash(tok)}, now=NOW
    )
    assert status == "token_revoked"


def test_expired_and_untrusted():
    tok = encode_token(_claims(exp=NOW - 1), REALM_SEED)
    assert validate_bearer_token(tok, TRUSTED, set(), now=NOW)[0] == "expired"
    tok2 = encode_token(_claims(), REALM_SEED)
    # the signature still verifies with the embedded key; trust fails
    assert (
        validate_bearer_token(tok2, set(), set(), now=NOW)[0]
        == "realm_not_trusted"
    )


def test_delegation_happy_and_mixed_and_forged():
    tok = encode_token(_delegated_claims(), DELEGATE_SEED)
    assert validate_bearer_token(tok, TRUSTED, set(), now=NOW)[0] == "ok"
    # both-or-neither: a lone issuer_pubkey is an invalid server token
    mixed = encode_token(
        _claims(issuer_pubkey=DELEGATE_PUB), REALM_SEED
    )
    assert (
        validate_bearer_token(mixed, TRUSTED, set(), now=NOW)[0]
        == "invalid_server_token"
    )
    # a delegation signature the realm never made
    forged = encode_token(
        _claims(
            issuer_pubkey=DELEGATE_PUB,
            delegation_signature=_b64e(
                sign(DELEGATE_SEED, DELEGATE_PUB.encode())
            ),
        ),
        DELEGATE_SEED,
    )
    assert (
        validate_bearer_token(forged, TRUSTED, set(), now=NOW)[0]
        == "invalid_server_token"
    )


def test_wrong_signature_rejected():
    tok = encode_token(_claims(), DELEGATE_SEED)  # signed by the wrong key
    assert (
        validate_bearer_token(tok, TRUSTED, set(), now=NOW)[0]
        == "invalid_signature"
    )


def test_untrusted_issuers_never_populate_the_cache():
    """auth.rs:90-92 — only trusted/delegated issuers reach the
    bounded cache; an attacker minting arbitrary issuers cannot evict
    trusted keys."""
    cache = IssuerKeyCache()
    ok_tok = encode_token(_claims(), REALM_SEED)
    validate_bearer_token(ok_tok, TRUSTED, set(), cache=cache, now=NOW)
    assert len(cache) == 1
    for seed_byte in range(30, 36):  # none collide with REALM_SEED
        seed = bytes([seed_byte]) * 32
        pub = _b64e(public_key(seed))
        tok = encode_token(
            {"iss": pub, "sub": "x", "exp": NOW + 9}, seed
        )
        status, _ = validate_bearer_token(
            tok, TRUSTED, set(), cache=cache, now=NOW
        )
        assert status == "realm_not_trusted"
    assert len(cache) == 1  # still only the trusted realm key


def test_cache_ttl_and_capacity():
    assert ISSUER_KEY_CACHE_CAPACITY == 1024
    assert ISSUER_KEY_CACHE_TTL_S == 3600.0
    clock = [0.0]
    c = IssuerKeyCache(capacity=2, ttl_s=10.0, clock=lambda: clock[0])
    a, b, d = (
        _b64e(public_key(bytes([i]) * 32)) for i in (1, 2, 3)
    )
    c.get_or_insert(a)
    c.get_or_insert(b)
    c.get_or_insert(a)  # refresh recency
    c.get_or_insert(d)  # evicts b (LRU)
    assert len(c) == 2
    clock[0] = 10.0
    c.get_or_insert(a)  # TTL elapsed: re-derives, stays cached
    assert len(c) <= 2


def test_create_token_roundtrips_both_capabilities():
    """create_token.rs: Management signs with the realm key, Server
    with the delegated issuer key; both validate through the ladder."""
    from aruna_spark.ops.tokens import create_token

    st, tok = create_token(
        NOW, None, "user-9", REALM_SEED, {"kind": "management"}
    )
    assert st == "ok"
    assert validate_bearer_token(tok, TRUSTED, set(), now=NOW)[0] == "ok"
    st, tok = create_token(
        NOW,
        NOW + 50,
        "user-9",
        REALM_SEED,
        {"kind": "server", "issuer_seed": DELEGATE_SEED},
    )
    assert st == "ok"
    status, claims = validate_bearer_token(tok, TRUSTED, set(), now=NOW)
    assert status == "ok" and claims["issuer_pubkey"] == DELEGATE_PUB


def test_create_token_refusals_and_default_expiry():
    from aruna_spark.ops.tokens import _add_12_months, create_token

    assert create_token(NOW, None, "u", REALM_SEED, {"kind": "local"}) == (
        "not_enough_capabilities",
        None,
    )
    assert create_token(
        NOW, NOW, "u", REALM_SEED, {"kind": "management"}
    ) == ("invalid_timestamp", None)
    # default expiry is +12 CALENDAR months; Feb 29 clamps to Feb 28
    from datetime import datetime, timezone

    leap = datetime(2024, 2, 29, 12, tzinfo=timezone.utc).timestamp()
    assert datetime.fromtimestamp(
        _add_12_months(leap), tz=timezone.utc
    ) == datetime(2025, 2, 28, 12, tzinfo=timezone.utc)
    st, tok = create_token(leap, None, "u", REALM_SEED, {"kind": "management"})
    assert st == "ok"
    from aruna_spark.ops.tokens import insecure_decode

    exp = insecure_decode(tok)["exp"]
    assert datetime.fromtimestamp(exp, tz=timezone.utc).year == 2025


def test_token_restrictions_flow_into_the_allows_ladder(spark):
    """End to end: a validated token's path restrictions become the
    whitelist permission_rules.rs layers on top of the caller's roles
    (TokenClaims.restrictions -> PermissionRules.restrictions)."""
    from pyspark.sql import functions as F

    from aruna_spark.ops.globs import glob_to_regex
    from aruna_spark.ops.tokens import create_token
    from aruna_spark.queries.permissions import allows

    st, tok = create_token(
        NOW, None, "carol", REALM_SEED, {"kind": "management"}
    )
    assert st == "ok"
    # the issued token carries a path whitelist
    claims = dict(_claims(sub="carol"))
    claims["restrictions"] = [("data/src1/**", "READ")]
    tok = encode_token(claims, REALM_SEED)
    status, got = validate_bearer_token(tok, TRUSTED, set(), now=NOW)
    assert status == "ok"

    paths = spark.createDataFrame(
        [("data/src1/a.txt",), ("data/src2/b.txt",)], "key string"
    )
    rules = spark.createDataFrame(
        [("carol", glob_to_regex("**"), "READ", True, False)],
        "subject_id string, pattern string, permission string,"
        " direct boolean, public boolean",
    )
    restr = spark.createDataFrame(
        [
            ("carol", glob_to_regex(g), p)
            for g, p in got["restrictions"]
        ],
        "subject_id string, pattern string, permission string",
    )
    decided = {
        r["key"]: r["allowed"]
        for r in allows(paths, rules, restr, "READ").collect()
    }
    # realm-wide READ role, whittled by the token to src1 only
    assert decided == {"data/src1/a.txt": True, "data/src2/b.txt": False}
