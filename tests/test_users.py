"""User resolution redaction + the profile-update ladder."""

from __future__ import annotations

from aruna_spark.queries.users import (
    SAFE_USER_ATTRIBUTE_KEYS,
    user_resolve_safe,
    user_update_validate,
)

SF01 = "/root/testdata/sf0.01"


def test_resolve_redacts_to_the_safe_allowlist(spark):
    rows = user_resolve_safe(spark, SF01).collect()
    assert rows
    keys = {r["attr_key"] for r in rows if r["attr_key"] is not None}
    # email is stamped on EVERY stored user and must never surface
    assert keys and keys <= set(SAFE_USER_ATTRIBUTE_KEYS)
    # every resolved user dropped at least the email attribute
    assert all(r["n_redacted"] >= 1 for r in rows)
    # users with no safe attrs still resolve (one NULL-attribute row)
    assert any(r["attr_key"] is None for r in rows)
    # missing ids (k%6==5) and foreign-realm users (k%17==3) skip
    ids = {r["user_id"] for r in rows}
    assert all(u % 6 == 1 for u in ids)
    assert all(u % 17 != 3 for u in ids)


def test_update_ladder_order_and_lanes(spark):
    rows = {
        r["request_id"]: r
        for r in user_update_validate(spark, SF01).collect()
    }
    outcomes = {r["outcome"] for r in rows.values()}
    assert outcomes == {
        "ok",
        "invalid_user_name",
        "invalid_key",
        "invalid_value",
        "too_many_attributes",
    }
    for r in rows.values():
        # a bad REMOVAL key rejects before the set payload is looked at
        if r["remove_key"] == "bad key" and r["outcome"] not in (
            "invalid_user_name",
        ):
            assert r["outcome"] == "invalid_key"
        # applied names are trimmed; rejected names never apply
        if r["applied_name"] is not None:
            assert r["applied_name"] == r["applied_name"].strip() != ""
        if r["outcome"] == "invalid_user_name":
            assert r["applied_name"] is None
