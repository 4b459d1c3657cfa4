"""Realm/group role CRUD — the admin-plane validation ladders.

The six role operations (add_realm_role / add_group_role /
remove_group_role / add_user_to_group / remove_user_from_group /
add_user_to_realm_role) wrap one relational kernel each: a validation
ladder over the role catalog. The CRDT reducer transport behind them
(admin-document events, observed clocks, conflict parking) is the
replicated-write plane — its replay semantics are covered by
``crdt_orset_replay``/``registry_event_replay``; what this module
registers is every ACCEPT/REJECT decision, batch-classified and
oracle-checked.

Reference surface:

- ``operations/src/add_realm_role.rs:123-188`` — reserved realm role
  names = {"realm_admin"}, matched on the TRIMMED name; an assigned
  user that is nil but not nil-in-THIS-realm is invalid (the own-realm
  nil user is the legal PUBLIC marker); a public role (assigned to the
  own-realm nil user) may carry only READ permissions.
- ``operations/src/add_group_role.rs:158-199`` — the same ladder with
  the group reserved set {"admin", "user"} (trimmed), plus the group
  record read (NoGroupFound).
- ``operations/src/remove_group_role.rs:290-301`` — auth doc →
  RoleNotFound → ``role.name == "admin"`` → AdminRoleUndeletable (the
  admin role is the only guaranteed management entry point).
- ``operations/src/add_user_to_group.rs:260-274,606-609`` — a nil
  user id fails at START (before any read); then the group's auth doc
  (AuthDocNotFound), then every requested role must exist
  (RoleNotFound).
- ``operations/src/remove_user_from_group.rs:255-360`` — same entry
  checks (self-leave needs no admin permission — auth excluded here);
  the LAST-ADMIN guard: a group must always retain at least one
  admin, so a removal that would empty any "admin"-named role the
  user belongs to rejects LastAdmin — for a single-role removal that
  is exactly (requested role named "admin") ∧ (user assigned) ∧
  (assignment count 1).
- ``operations/src/add_user_to_realm_role.rs:96-110`` — nil user →
  InvalidUserId, realm auth doc, RoleNotFound.

Fixture (customer ``% 4 == 2``): one request per row, op ((k-2)%24)//4 (k ≡ 2 mod 4 — a plain k%6 or (k%12)//2
collapses to three ops under that congruence); the
role catalog is keyed 1:1 by the same key (role ``r<k>`` exists iff
k%13 < 10, named "admin" when k%9 ≤ 2, "user" when k%9 = 3; the
requested user is assigned iff k%5 > 0 (mod 3 collides
with the op selector's mod-24 congruence and would zero the lane); assignment count 1 + (k%6)//2);
groups ``g<k%7>`` exist for g0-g4. Payload lanes: new-role name k%23
(1 → "realm_admin", 2 → " admin " — the TRIM lane, 3 → "user"),
nil-other-realm assignee k%17 = 4, own-realm nil (public marker)
k%17 = 8, non-READ permission k%19 < 12, nil member user k%17 ∈
{4, 8}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

RESERVED_REALM_ROLE_NAMES = ("realm_admin",)  # add_realm_role.rs:123
RESERVED_GROUP_ROLE_NAMES = ("admin", "user")  # add_group_role.rs:158

_ROLES_ORACLE = """
WITH reqs AS (
  SELECT c_custkey AS k,
         CASE ((c_custkey - 2) % 24) // 4
           WHEN 0 THEN 'add_realm_role' WHEN 1 THEN 'add_group_role'
           WHEN 2 THEN 'remove_group_role' WHEN 3 THEN 'add_user_to_group'
           WHEN 4 THEN 'remove_user_from_group'
           ELSE 'add_user_to_realm_role' END AS op,
         'g' || (c_custkey % 7) AS group_id,
         'r' || c_custkey AS role_id,
         CASE c_custkey % 23 WHEN 1 THEN 'realm_admin'
              WHEN 2 THEN ' admin ' WHEN 3 THEN 'user'
              ELSE 'custom' || c_custkey END AS new_name,
         c_custkey % 17 = 4 AS has_foreign_nil_assignee,
         c_custkey % 17 = 8 AS is_public,
         c_custkey % 19 < 12 AS has_nonread_perm,
         c_custkey % 17 IN (4, 8) AS member_is_nil
  FROM customer WHERE c_custkey % 4 = 2
),
catalog AS (
  SELECT k,
         k % 13 < 10 AS role_exists,
         CASE WHEN k % 9 <= 2 THEN 'admin'
              WHEN k % 9 = 3 THEN 'user'
              ELSE 'custom' END AS role_name,
         k % 5 > 0 AS user_assigned,
         CAST(1 + (k % 6) // 2 AS INT) AS n_assignees
  FROM reqs
),
laddered AS (
  SELECT q.k AS request_id, q.op, q.group_id, q.role_id,
         q.group_id IN ('g0', 'g1', 'g2', 'g3', 'g4') AS group_exists,
         c.role_exists, c.role_name, c.user_assigned, c.n_assignees,
         CASE
           WHEN q.op = 'add_realm_role' THEN
             CASE WHEN trim(q.new_name) = 'realm_admin'
                    THEN 'reserved_role_name'
                  WHEN q.has_foreign_nil_assignee
                    THEN 'invalid_assigned_user'
                  WHEN q.is_public AND q.has_nonread_perm
                    THEN 'invalid_public_role'
                  ELSE 'ok' END
           WHEN q.op = 'add_group_role' THEN
             CASE WHEN trim(q.new_name) IN ('admin', 'user')
                    THEN 'reserved_role_name'
                  WHEN q.has_foreign_nil_assignee
                    THEN 'invalid_assigned_user'
                  WHEN q.is_public AND q.has_nonread_perm
                    THEN 'invalid_public_role'
                  WHEN q.group_id NOT IN ('g0', 'g1', 'g2', 'g3', 'g4')
                    THEN 'group_not_found'
                  ELSE 'ok' END
           WHEN q.op = 'remove_group_role' THEN
             CASE WHEN q.group_id NOT IN ('g0', 'g1', 'g2', 'g3', 'g4')
                    THEN 'group_not_found'
                  WHEN NOT c.role_exists THEN 'role_not_found'
                  WHEN c.role_name = 'admin' THEN 'admin_role_undeletable'
                  ELSE 'ok' END
           WHEN q.op = 'add_user_to_group' THEN
             CASE WHEN q.member_is_nil THEN 'invalid_user_id'
                  WHEN q.group_id NOT IN ('g0', 'g1', 'g2', 'g3', 'g4')
                    THEN 'auth_doc_not_found'
                  WHEN NOT c.role_exists THEN 'role_not_found'
                  ELSE 'ok' END
           WHEN q.op = 'remove_user_from_group' THEN
             CASE WHEN q.member_is_nil THEN 'invalid_user_id'
                  WHEN q.group_id NOT IN ('g0', 'g1', 'g2', 'g3', 'g4')
                    THEN 'auth_doc_not_found'
                  WHEN NOT c.role_exists THEN 'role_not_found'
                  WHEN c.role_name = 'admin' AND c.user_assigned
                       AND c.n_assignees = 1 THEN 'last_admin'
                  ELSE 'ok' END
           ELSE
             CASE WHEN q.member_is_nil THEN 'invalid_user_id'
                  WHEN NOT c.role_exists THEN 'role_not_found'
                  ELSE 'ok' END
         END AS outcome
  FROM reqs q JOIN catalog c USING (k)
)
SELECT request_id, op, group_id, role_id, outcome
FROM laddered
"""


@register("role_mutation_validate", oracle=_ROLES_ORACLE)
def role_mutation_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-classify the six role-CRUD operations' validation
    ladders (see module doc for the file:line map). Each op's rungs
    fire in the reference's order: the payload validation
    (reserved-name-on-TRIM → foreign-nil assignee → public-with-write)
    precedes the group read for the add ops; membership ops reject a
    nil user BEFORE any read, then the auth doc, then the role; the
    two group-integrity guards — the "admin" role is undeletable, and
    a removal may never empty an "admin" role (last-admin) — close
    the remove ladders. The role catalog broadcasts (metadata-sized
    at any scale); the classification is one CASE chain."""
    k = F.col("c_custkey")
    reqs = (
        load_table(spark, sf_dir, "customer")
        .filter(k % 4 == 2)
        .select(
            k.alias("k"),
            F.when((k - 2) % 24 == 0, "add_realm_role")
            .when((k - 2) % 24 == 4, "add_group_role")
            .when((k - 2) % 24 == 8, "remove_group_role")
            .when((k - 2) % 24 == 12, "add_user_to_group")
            .when((k - 2) % 24 == 16, "remove_user_from_group")
            .otherwise("add_user_to_realm_role")
            .alias("op"),
            F.concat(F.lit("g"), (k % 7).cast("string")).alias("group_id"),
            F.concat(F.lit("r"), k.cast("string")).alias("role_id"),
            F.when(k % 23 == 1, "realm_admin")
            .when(k % 23 == 2, " admin ")
            .when(k % 23 == 3, "user")
            .otherwise(F.concat(F.lit("custom"), k.cast("string")))
            .alias("new_name"),
            (k % 17 == 4).alias("has_foreign_nil_assignee"),
            (k % 17 == 8).alias("is_public"),
            (k % 19 < 12).alias("has_nonread_perm"),
            (k % 17).isin(4, 8).alias("member_is_nil"),
        )
    )
    catalog = reqs.select(
        "k",
        (F.col("k") % 13 < 10).alias("role_exists"),
        F.when(F.col("k") % 9 <= 2, "admin")
        .when(F.col("k") % 9 == 3, "user")
        .otherwise("custom")
        .alias("role_name"),
        (F.col("k") % 5 > 0).alias("user_assigned"),
        (1 + (F.col("k") % 6) / 2).cast("int").alias("n_assignees"),
    )
    j = reqs.join(F.broadcast(catalog), "k")
    group_exists = F.col("group_id").isin("g0", "g1", "g2", "g3", "g4")
    add_payload = (
        lambda reserved: F.when(
            F.trim(F.col("new_name")).isin(*reserved), "reserved_role_name"
        )
        .when(F.col("has_foreign_nil_assignee"), "invalid_assigned_user")
        .when(
            F.col("is_public") & F.col("has_nonread_perm"),
            "invalid_public_role",
        )
    )
    member_entry = F.when(F.col("member_is_nil"), "invalid_user_id").when(
        ~group_exists, "auth_doc_not_found"
    )
    outcome = (
        F.when(
            F.col("op") == "add_realm_role",
            add_payload(RESERVED_REALM_ROLE_NAMES).otherwise("ok"),
        )
        .when(
            F.col("op") == "add_group_role",
            add_payload(RESERVED_GROUP_ROLE_NAMES)
            .when(~group_exists, "group_not_found")
            .otherwise("ok"),
        )
        .when(
            F.col("op") == "remove_group_role",
            F.when(~group_exists, "group_not_found")
            .when(~F.col("role_exists"), "role_not_found")
            .when(F.col("role_name") == "admin", "admin_role_undeletable")
            .otherwise("ok"),
        )
        .when(
            F.col("op") == "add_user_to_group",
            member_entry.when(~F.col("role_exists"), "role_not_found")
            .otherwise("ok"),
        )
        .when(
            F.col("op") == "remove_user_from_group",
            member_entry.when(~F.col("role_exists"), "role_not_found")
            .when(
                (F.col("role_name") == "admin")
                & F.col("user_assigned")
                & (F.col("n_assignees") == 1),
                "last_admin",
            )
            .otherwise("ok"),
        )
        .otherwise(
            F.when(F.col("member_is_nil"), "invalid_user_id")
            .when(~F.col("role_exists"), "role_not_found")
            .otherwise("ok")
        )
    )
    return j.select(
        F.col("k").alias("request_id"),
        "op",
        "group_id",
        "role_id",
        outcome.alias("outcome"),
    )
