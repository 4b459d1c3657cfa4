"""Role-CRUD validation ladders: lane coverage + the group-integrity
guards (admin role undeletable; last-admin), against the sf0.01
fixture (sf0.001 is too thin for the CRT-gated last_admin lane)."""

from __future__ import annotations

from aruna_spark.queries.roles import role_mutation_validate

SF01 = "/root/testdata/sf0.01"


def test_every_op_and_rung_populates(spark):
    rows = role_mutation_validate(spark, SF01).collect()
    by_op: dict[str, set[str]] = {}
    for r in rows:
        by_op.setdefault(r["op"], set()).add(r["outcome"])
    assert set(by_op) == {
        "add_realm_role",
        "add_group_role",
        "remove_group_role",
        "add_user_to_group",
        "remove_user_from_group",
        "add_user_to_realm_role",
    }
    # payload ladder (reserved -> assignee -> public) on both add ops
    for op in ("add_realm_role", "add_group_role"):
        assert {
            "reserved_role_name",
            "invalid_assigned_user",
            "invalid_public_role",
            "ok",
        } <= by_op[op]
    # only the GROUP add checks the group record
    assert "group_not_found" in by_op["add_group_role"]
    assert "group_not_found" not in by_op["add_realm_role"]
    # group-integrity guards
    assert "admin_role_undeletable" in by_op["remove_group_role"]
    assert "last_admin" in by_op["remove_user_from_group"]
    # membership entry checks
    for op in (
        "add_user_to_group",
        "remove_user_from_group",
        "add_user_to_realm_role",
    ):
        assert {"invalid_user_id", "role_not_found", "ok"} <= by_op[op]


def test_reserved_names_are_scope_specific(spark):
    # 'realm_admin' only rejects realm-role creation; ' admin ' (the
    # trim lane) and 'user' only reject group-role creation
    rows = role_mutation_validate(spark, SF01).collect()
    for r in rows:
        if r["outcome"] == "reserved_role_name":
            assert r["op"] in ("add_realm_role", "add_group_role")
