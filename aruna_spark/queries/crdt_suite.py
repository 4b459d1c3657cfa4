"""Oracle-checked CRDT replication queries.

Exercises :mod:`aruna_spark.ops.crdt` — the vector-clock comparator
(``core/src/metadata.rs:691-713``) and the observed-remove quad replay
(``MetadataQuadOp``, ``core/src/metadata.rs:715-736``) — over
deterministic clocks/op feeds derived from ``documents.parquet`` so
DuckDB reproduces the exact same answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ingest.doc_triples import DOC_NS, GRAPH_NS
from aruna_spark.ops.admin_reduce import reduce_admin_paths
from aruna_spark.ops.crdt import clock_relation, orset_replay
from aruna_spark.queries import register
from aruna_spark.sparql.terms import SCHEMA


# -- clock comparator over a derived clock feed ------------------------------
# Two actors a/b with counters derived from doc_id; a zero counter is
# OMITTED from the map (sparse clocks), exercising the missing-actor-as-0
# rule of compare_metadata_clocks.
@register(
    "crdt_clock_relation",
    oracle="""
    WITH clocks AS (
      SELECT doc_id,
             doc_id % 5 AS la, doc_id % 3 AS lb,
             doc_id % 4 AS ra, doc_id % 6 AS rb
      FROM documents
    ),
    rel AS (
      SELECT doc_id,
             CASE
               WHEN (la > ra OR lb > rb) AND (ra > la OR rb > lb)
                 THEN 'concurrent'
               WHEN (la > ra OR lb > rb) THEN 'local_ahead'
               WHEN (ra > la OR rb > lb) THEN 'remote_ahead'
               ELSE 'equal'
             END AS relation
      FROM clocks
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n
    FROM rel GROUP BY relation ORDER BY relation
    """,
)
def crdt_clock_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of clock relations over a sparse-clock feed — the
    comparator itself runs as a pure column expression on MapType
    columns (missing actor == 0, matching metadata.rs:696-699)."""
    docs = load_table(spark, sf_dir, "documents")

    def sparse_clock(*pairs) -> F.Column:
        m = F.map_from_arrays(
            F.array(*[F.lit(a) for a, _ in pairs]),
            F.array(*[c.cast("long") for _, c in pairs]),
        )
        return F.map_filter(m, lambda _, v: v > 0)

    clocks = docs.select(
        sparse_clock(
            ("a", F.col("doc_id") % 5), ("b", F.col("doc_id") % 3)
        ).alias("local"),
        sparse_clock(
            ("a", F.col("doc_id") % 4), ("b", F.col("doc_id") % 6)
        ).alias("remote"),
    )
    return (
        clocks.select(
            clock_relation(F.col("local"), F.col("remote")).alias("relation")
        )
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("relation")
    )


# -- observed-remove replay ---------------------------------------------------
# Deterministic op feed per document quad (subject schema:keywords kw-N):
#   add  dot ('a', 1)            for every doc
#   remove witnessed {a: 1}      for doc_id % 3 == 0  (observes the add)
#   add  dot ('a', 2)            for doc_id % 6 == 0  (re-add after remove)
#   add  dot ('b', 1)            for doc_id % 5 == 0  (concurrent: never
#                                                      witnessed by the remove)
# Expected survival: everything except doc_id % 3 == 0 docs that have
# neither the re-add (%6) nor the concurrent add (%5).
_ORSET_ORACLE = f"""
    WITH quads AS (
      SELECT doc_id,
             '{GRAPH_NS}' || doc_id AS graph_iri,
             '{DOC_NS}' || doc_id AS subject,
             '{SCHEMA}keywords' AS predicate,
             'kw-' || (doc_id % 10) AS object
      FROM documents
    ),
    adds AS (
      SELECT graph_iri, subject, predicate, object, 'a' AS actor,
             CAST(1 AS BIGINT) AS counter FROM quads
      UNION ALL
      SELECT graph_iri, subject, predicate, object, 'a', CAST(2 AS BIGINT)
      FROM quads WHERE doc_id % 6 = 0
      UNION ALL
      SELECT graph_iri, subject, predicate, object, 'b', CAST(1 AS BIGINT)
      FROM quads WHERE doc_id % 5 = 0
    ),
    removes AS (
      SELECT graph_iri, subject, predicate, object, 'a' AS actor,
             CAST(1 AS BIGINT) AS wcount
      FROM quads WHERE doc_id % 3 = 0
    ),
    witnessed AS (
      SELECT graph_iri, subject, predicate, object, actor,
             MAX(wcount) AS wcount
      FROM removes GROUP BY 1, 2, 3, 4, 5
    ),
    survived AS (
      SELECT a.* FROM adds a
      LEFT JOIN witnessed w
        ON  w.graph_iri = a.graph_iri AND w.subject = a.subject
        AND w.predicate = a.predicate AND w.object = a.object
        AND w.actor = a.actor
      WHERE a.counter > COALESCE(w.wcount, 0)
    )
    SELECT graph_iri, subject, predicate, object,
           CAST(COUNT(*) AS BIGINT) AS n_dots,
           CAST(MAX(counter) AS BIGINT) AS max_counter
    FROM survived GROUP BY 1, 2, 3, 4
"""


@register("crdt_orset_replay", oracle=_ORSET_ORACLE)
def crdt_orset_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the deterministic op feed through the observed-remove
    resolver: removed quads stay dead unless re-added with a fresh dot
    or concurrently added by an actor the remove never witnessed —
    convergence laws property-tested in tests/test_crdt.py."""
    docs = load_table(spark, sf_dir, "documents")
    quads = docs.select(
        "doc_id",
        F.concat(F.lit(GRAPH_NS), F.col("doc_id").cast("string")).alias(
            "graph_iri"
        ),
        F.concat(F.lit(DOC_NS), F.col("doc_id").cast("string")).alias(
            "subject"
        ),
        F.lit(SCHEMA + "keywords").alias("predicate"),
        F.concat(F.lit("kw-"), (F.col("doc_id") % 10).cast("string")).alias(
            "object"
        ),
    )
    empty_clock = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<bigint>")
    )

    def add(df: DataFrame, actor: str, counter: int) -> DataFrame:
        return df.select(
            "graph_iri", "subject", "predicate", "object",
            F.lit("add").alias("op"),
            F.lit(actor).alias("actor"),
            F.lit(counter).cast("long").alias("counter"),
            empty_clock.alias("witnessed"),
        )

    def remove(df: DataFrame, witnessed: dict[str, int]) -> DataFrame:
        clock = F.map_from_arrays(
            F.array(*[F.lit(a) for a in witnessed]),
            F.array(*[F.lit(c).cast("long") for c in witnessed.values()]),
        )
        return df.select(
            "graph_iri", "subject", "predicate", "object",
            F.lit("remove").alias("op"),
            F.lit(None).cast("string").alias("actor"),
            F.lit(None).cast("long").alias("counter"),
            clock.alias("witnessed"),
        )

    ops = (
        add(quads, "a", 1)
        .unionByName(remove(quads.filter(F.col("doc_id") % 3 == 0), {"a": 1}))
        .unionByName(add(quads.filter(F.col("doc_id") % 6 == 0), "a", 2))
        .unionByName(add(quads.filter(F.col("doc_id") % 5 == 0), "b", 1))
    )
    return orset_replay(ops)


# -- admin-document create-seed replay ----------------------------------------
# The group/realm-create operations seed a reduced admin document in the
# same transaction that writes the group (create_group.rs:181-252:
# GroupCreated + one GroupRoleCreated per default role sorted by name +
# GroupRoleUserAssignmentAdded(admin, owner); create_realm.rs:174-197 +
# claim_initial_realm_admin.rs: RealmRoleCreated(realm_admin) + the
# claimer's RealmRoleUserAssignmentAdded). Later mutations replay into
# the same per-path reducer (core/src/admin_document_reducer.rs). The
# fixture feeds one seeded group document per document row plus one of
# four mutation lanes (doc_id % 5 — documents has no row filter, so the
# selector is congruence-safe):
#   lane 1: a causally-later assignment ADD on the user role (n1
#           observed the whole seed) — one extra active assignment.
#   lane 2: a causally-later assignment REMOVE of the owner's admin
#           assignment — tombstone (reducer rs:1133-1144 value None).
#   lane 3: a CONCURRENT GroupCreated from n2 (observed nothing):
#           differing display_name -> fail-closed conflict
#           (rs:1404-1419), equal realm/owner -> merged dots, no
#           conflict (rs:1421-1422).
#   lane 4: a causally-later GroupRoleRemoved(admin) — the seed's
#           admin assignment stays live but materializes as inactive
#           because its role is gone (the active-role filter,
#           rs:775-801).
# plus the realm-create seed + initial-admin claim per realm.
_SEED_NODES = ("n0", "n1", "n2")


def _obs_map(**pairs) -> F.Column:
    if not pairs:
        return F.map_from_arrays(
            F.array().cast("array<string>"),
            F.array().cast("array<bigint>"),
        )
    return F.map_from_arrays(
        F.array(*[F.lit(n) for n in pairs]),
        F.array(*[F.lit(s).cast("long") for s in pairs.values()]),
    )


def _ev_struct(cond, path, value, node, seq, observed) -> F.Column:
    """One lane-conditional event struct (NULL when the lane misses —
    dropped by the explode's array filter)."""
    return F.when(
        cond,
        F.struct(
            path.cast("string").alias("path"),
            value.cast("string").alias("value"),
            F.lit(node).alias("origin_node"),
            F.lit(seq).cast("long").alias("origin_seq"),
            observed.alias("observed"),
        ),
    )


def _explode_events(frame: DataFrame, kind: str, target: F.Column,
                    events: F.Column) -> DataFrame:
    return frame.select(
        F.lit(kind).alias("target_kind"),
        target.alias("target_id"),
        F.explode(F.filter(events, lambda e: e.isNotNull())).alias("e"),
    ).select(
        "target_kind",
        "target_id",
        F.col("e.path").alias("path"),
        F.col("e.value").alias("value"),
        F.col("e.origin_node").alias("origin_node"),
        F.col("e.origin_seq").alias("origin_seq"),
        F.col("e.observed").alias("observed"),
    )


def _admin_seed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seed + mutation event feed, generated in ONE corpus scan
    (r15 optimization): each document row explodes its lane's event
    structs instead of one union branch (= one corpus scan) per event
    family — the r14 shape re-scanned ``documents`` 13 times for the
    group lanes alone and the plan replicated every scan through the
    domination self-join. Row multiset is identical by construction
    (same lane conditions, same literals)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    gid = F.concat(F.lit("grp-"), ds)
    owner = F.concat(F.lit("user-"), (d % 7).cast("string"))
    lane = d % 5
    obs = _obs_map
    ev = _ev_struct
    T = F.lit(True)
    admin_assign_path = F.concat(
        F.lit("group.roles.admin.assigned_users."), owner
    )
    extra_user = F.concat(F.lit("user-x"), ds)
    null_s = F.lit(None).cast("string")
    group_events = F.array(
        # GroupCreated (n0 seq 1) writes its three paths under one dot
        ev(T, F.lit("group.display_name"),
           F.concat(F.lit("name-"), ds), "n0", 1, obs()),
        ev(T, F.lit("group.realm_id"),
           F.concat(F.lit("realm-"), (d % 3).cast("string")),
           "n0", 1, obs()),
        ev(T, F.lit("group.owner"), owner, "n0", 1, obs()),
        # default roles, name-sorted (create_group.rs:475-483)
        ev(T, F.lit("group.roles.admin"), F.lit("role:admin"),
           "n0", 2, obs(n0=1)),
        ev(T, F.lit("group.roles.user"), F.lit("role:user"),
           "n0", 3, obs(n0=2)),
        ev(T, F.lit("group.roles.viewer"), F.lit("role:viewer"),
           "n0", 4, obs(n0=3)),
        # owner into admin (create_group.rs:214-226)
        ev(T, admin_assign_path, owner, "n0", 5, obs(n0=4)),
        # mutation lanes
        ev(lane == 1,
           F.concat(F.lit("group.roles.user.assigned_users."), extra_user),
           extra_user, "n1", 1, obs(n0=5)),
        ev(lane == 2, admin_assign_path, null_s, "n1", 1, obs(n0=5)),
        ev(lane == 3, F.lit("group.display_name"),
           F.concat(F.lit("alt-"), ds), "n2", 1, obs()),
        ev(lane == 3, F.lit("group.realm_id"),
           F.concat(F.lit("realm-"), (d % 3).cast("string")),
           "n2", 1, obs()),
        ev(lane == 3, F.lit("group.owner"), owner, "n2", 1, obs()),
        ev(lane == 4, F.lit("group.roles.admin"), null_s,
           "n1", 1, obs(n0=5)),
    )
    group_rows = _explode_events(docs, "group", gid, group_events)

    realms = docs.select(
        (d % 7).cast("string").alias("realm_n")
    ).distinct()
    claimer = F.concat(F.lit("user-r"), F.col("realm_n"))
    realm_events = F.array(
        ev(T, F.lit("realm.roles.realm_admin"), F.lit("role:realm_admin"),
           "n0", 1, obs()),
        ev(T, F.concat(F.lit("realm.roles.realm_admin.assigned_users."),
                       claimer),
           claimer, "n1", 1, obs(n0=1)),
    )
    realm_rows = _explode_events(
        realms, "realm",
        F.concat(F.lit("realm-"), F.col("realm_n")), realm_events,
    )

    # user-target seeds (register_or_get_oidc_user.rs:447-464:
    # UserNameSet then UserSubjectIdAdded under one origin); mutation
    # lanes: u % 3 == 1 renames (LWW supersede), u % 3 == 2 removes
    # the seeded subject (tombstone)
    users = docs.select(
        (d % 11).cast("string").alias("u")
    ).distinct()
    u = F.col("u")
    subject_path = F.concat(F.lit("user.subject_ids.oidc|sub-"), u)
    ulane = u.cast("int") % 3
    user_events = F.array(
        ev(T, F.lit("user.name"),
           F.concat(F.lit("Name "), u), "n0", 1, obs()),
        ev(T, subject_path,
           F.concat(F.lit("oidc|sub-"), u), "n0", 2, obs(n0=1)),
        ev(ulane == 1, F.lit("user.name"),
           F.concat(F.lit("Renamed "), u), "n1", 1, obs(n0=2)),
        ev(ulane == 2, subject_path, null_s, "n1", 1, obs(n0=2)),
    )
    user_rows = _explode_events(
        users, "user", F.concat(F.lit("user-u"), u), user_events
    )
    return group_rows.unionByName(realm_rows).unionByName(user_rows)


_ADMIN_SEED_ORACLE = """
    WITH groups AS (
      SELECT doc_id,
             'grp-' || doc_id AS target_id,
             'name-' || doc_id AS seed_name,
             'realm-' || (doc_id % 3) AS seed_realm,
             'user-' || (doc_id % 7) AS owner,
             doc_id % 5 AS lane
      FROM documents
    ),
    events AS (
      -- seed (n0 seq 1..5; observed = own clock before the event)
      SELECT 'group' AS target_kind, target_id, 'group.display_name' AS path,
             seed_name AS value, 'n0' AS origin_node, 1 AS origin_seq,
             0 AS obs_n0, 0 AS obs_n1, 0 AS obs_n2 FROM groups
      UNION ALL
      SELECT 'group', target_id, 'group.realm_id', seed_realm,
             'n0', 1, 0, 0, 0 FROM groups
      UNION ALL
      SELECT 'group', target_id, 'group.owner', owner,
             'n0', 1, 0, 0, 0 FROM groups
      UNION ALL
      SELECT 'group', target_id, 'group.roles.admin', 'role:admin',
             'n0', 2, 1, 0, 0 FROM groups
      UNION ALL
      SELECT 'group', target_id, 'group.roles.user', 'role:user',
             'n0', 3, 2, 0, 0 FROM groups
      UNION ALL
      SELECT 'group', target_id, 'group.roles.viewer', 'role:viewer',
             'n0', 4, 3, 0, 0 FROM groups
      UNION ALL
      SELECT 'group', target_id,
             'group.roles.admin.assigned_users.' || owner, owner,
             'n0', 5, 4, 0, 0 FROM groups
      -- lane 1: later assignment add on the user role
      UNION ALL
      SELECT 'group', target_id,
             'group.roles.user.assigned_users.user-x' || doc_id,
             'user-x' || doc_id, 'n1', 1, 5, 0, 0
      FROM groups WHERE lane = 1
      -- lane 2: later remove of the owner's admin assignment
      UNION ALL
      SELECT 'group', target_id,
             'group.roles.admin.assigned_users.' || owner, NULL,
             'n1', 1, 5, 0, 0 FROM groups WHERE lane = 2
      -- lane 3: concurrent GroupCreated from n2 (observed nothing)
      UNION ALL
      SELECT 'group', target_id, 'group.display_name', 'alt-' || doc_id,
             'n2', 1, 0, 0, 0 FROM groups WHERE lane = 3
      UNION ALL
      SELECT 'group', target_id, 'group.realm_id', seed_realm,
             'n2', 1, 0, 0, 0 FROM groups WHERE lane = 3
      UNION ALL
      SELECT 'group', target_id, 'group.owner', owner,
             'n2', 1, 0, 0, 0 FROM groups WHERE lane = 3
      -- lane 4: later GroupRoleRemoved(admin)
      UNION ALL
      SELECT 'group', target_id, 'group.roles.admin', NULL,
             'n1', 1, 5, 0, 0 FROM groups WHERE lane = 4
      -- realm-create seed + initial-admin claim
      UNION ALL
      SELECT 'realm', 'realm-' || realm_n, 'realm.roles.realm_admin',
             'role:realm_admin', 'n0', 1, 0, 0, 0
      FROM (SELECT DISTINCT doc_id % 7 AS realm_n FROM documents)
      UNION ALL
      SELECT 'realm', 'realm-' || realm_n,
             'realm.roles.realm_admin.assigned_users.user-r' || realm_n,
             'user-r' || realm_n, 'n1', 1, 1, 0, 0
      FROM (SELECT DISTINCT doc_id % 7 AS realm_n FROM documents)
      -- user-target seeds (register_or_get_oidc_user.rs:447-464)
      UNION ALL
      SELECT 'user', 'user-u' || u, 'user.name', 'Name ' || u,
             'n0', 1, 0, 0, 0
      FROM (SELECT DISTINCT doc_id % 11 AS u FROM documents)
      UNION ALL
      SELECT 'user', 'user-u' || u, 'user.subject_ids.oidc|sub-' || u,
             'oidc|sub-' || u, 'n0', 2, 1, 0, 0
      FROM (SELECT DISTINCT doc_id % 11 AS u FROM documents)
      UNION ALL
      SELECT 'user', 'user-u' || u, 'user.name', 'Renamed ' || u,
             'n1', 1, 2, 0, 0
      FROM (SELECT DISTINCT doc_id % 11 AS u FROM documents)
      WHERE u % 3 = 1
      UNION ALL
      SELECT 'user', 'user-u' || u, 'user.subject_ids.oidc|sub-' || u,
             NULL, 'n1', 1, 2, 0, 0
      FROM (SELECT DISTINCT doc_id % 11 AS u FROM documents)
      WHERE u % 3 = 2
    ),
    live AS (
      SELECT a.* FROM events a
      WHERE NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.target_kind = a.target_kind
          AND b.target_id = a.target_id AND b.path = a.path
          AND ((CASE a.origin_node WHEN 'n0' THEN b.obs_n0
                                   WHEN 'n1' THEN b.obs_n1
                                   ELSE b.obs_n2 END) >= a.origin_seq
               OR (b.origin_node = a.origin_node
                   AND b.origin_seq > a.origin_seq))
      )
    ),
    paths AS (
      SELECT target_kind, target_id, path,
             CAST(COUNT(*) AS BIGINT) AS n_dots,
             COUNT(DISTINCT COALESCE(value, '<tombstone>')) AS n_vals,
             MAX(value) AS mval
      FROM live GROUP BY 1, 2, 3
    ),
    reduced AS (
      SELECT target_kind, target_id, path,
             CASE WHEN n_vals = 1 THEN mval END AS value,
             n_vals > 1 AS is_conflict,
             n_vals = 1 AND mval IS NOT NULL AS is_live,
             n_dots,
             string_split(path, '.') AS parts
      FROM paths
    ),
    active_roles AS (
      SELECT target_kind, target_id, parts[3] AS role
      FROM reduced WHERE len(parts) = 3 AND parts[2] = 'roles' AND is_live
    ),
    assigns AS (
      SELECT target_kind, target_id, parts[3] AS role, value AS member
      FROM reduced
      WHERE len(parts) = 5 AND parts[4] = 'assigned_users' AND is_live
    ),
    active_assigns AS (
      SELECT s.* FROM assigns s
      JOIN active_roles r USING (target_kind, target_id, role)
    ),
    base AS (
      SELECT target_kind, target_id,
             MAX(CASE WHEN path = 'group.display_name' THEN value END)
               AS display_name,
             MAX(CASE WHEN path = 'group.owner' THEN value END) AS owner,
             MAX(CASE WHEN path = 'user.name' THEN value END) AS user_name,
             CAST(SUM(CASE WHEN len(parts) = 3
                            AND parts[2] = 'subject_ids' AND is_live
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_subjects,
             CAST(SUM(CASE WHEN is_conflict THEN 1 ELSE 0 END) AS BIGINT)
               AS n_conflict_paths,
             CAST(SUM(n_dots) AS BIGINT) AS n_dots_total
      FROM reduced GROUP BY 1, 2
    ),
    role_counts AS (
      SELECT target_kind, target_id, CAST(COUNT(*) AS BIGINT) AS n_roles
      FROM active_roles GROUP BY 1, 2
    ),
    assign_counts AS (
      SELECT target_kind, target_id,
             CAST(COUNT(*) AS BIGINT) AS n_assignments,
             BOOL_OR(role IN ('admin', 'realm_admin')) AS admin_assigned
      FROM active_assigns GROUP BY 1, 2
    )
    SELECT b.target_kind, b.target_id, b.display_name, b.owner,
           b.user_name, b.n_subjects,
           COALESCE(r.n_roles, 0) AS n_roles,
           COALESCE(a.n_assignments, 0) AS n_assignments,
           COALESCE(a.admin_assigned, FALSE) AS admin_assigned,
           b.n_conflict_paths, b.n_dots_total
    FROM base b
    LEFT JOIN role_counts r USING (target_kind, target_id)
    LEFT JOIN assign_counts a USING (target_kind, target_id)
"""


@register("crdt_admin_seed_replay", oracle=_ADMIN_SEED_ORACLE)
def crdt_admin_seed_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the create-seed + mutation event feed through the
    admin-document path reducer and materialize one envelope per
    group/realm document: the scalar fields (NULL when a concurrent
    write conflicted them), the active role count, the active
    assignment count with the admin-role membership flag (inactive
    roles filter their assignments — reducer rs:775-801), the
    conflict-path count, and the total merged dots (equal concurrent
    values merge instead of conflicting — rs:1421-1422)."""
    # Materialize the (tiny: ~8 rows/doc) event feed once — the
    # domination self-join reads it twice and localCheckpoint is
    # per-invocation (recomputed every call; nothing survives a run).
    events = _admin_seed_events(spark, sf_dir).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    reduced = reduce_admin_paths(
        events, ["target_kind", "target_id"]
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # feeds roles/assigns/base (3 subtrees)
    key = ["target_kind", "target_id"]
    # F.get (not []) — ANSI mode raises on out-of-range [] even behind
    # a size() filter (the projection can evaluate before the filter
    # prunes short paths); get() is the documented null-safe accessor
    reduced = reduced.withColumn("parts", F.split("path", "\\."))
    part = lambda i: F.get(F.col("parts"), i)  # noqa: E731
    is_role = (F.size("parts") == 3) & (part(1) == "roles")
    is_assign = (F.size("parts") == 5) & (part(3) == "assigned_users")
    active_roles = reduced.filter(is_role & F.col("is_live")).select(
        *key, part(2).alias("role")
    )
    assigns = reduced.filter(is_assign & F.col("is_live")).select(
        *key, part(2).alias("role"), F.col("value").alias("member")
    )
    active_assigns = assigns.join(active_roles, [*key, "role"])
    base = reduced.groupBy(*key).agg(
        F.max(
            F.when(F.col("path") == "group.display_name", F.col("value"))
        ).alias("display_name"),
        F.max(
            F.when(F.col("path") == "group.owner", F.col("value"))
        ).alias("owner"),
        F.max(
            F.when(F.col("path") == "user.name", F.col("value"))
        ).alias("user_name"),
        F.sum(
            (
                (F.size("parts") == 3)
                & (F.get(F.col("parts"), 1) == "subject_ids")
                & F.col("is_live")
            ).cast("long")
        ).alias("n_subjects"),
        F.sum(F.col("is_conflict").cast("long")).alias("n_conflict_paths"),
        F.sum("n_dots").alias("n_dots_total"),
    )
    role_counts = active_roles.groupBy(*key).agg(
        F.count(F.lit(1)).alias("n_roles")
    )
    assign_counts = active_assigns.groupBy(*key).agg(
        F.count(F.lit(1)).alias("n_assignments"),
        F.max(F.col("role").isin("admin", "realm_admin")).alias(
            "admin_assigned"
        ),
    )
    return (
        base.join(role_counts, key, "left")
        .join(assign_counts, key, "left")
        .select(
            *key,
            "display_name",
            "owner",
            "user_name",
            "n_subjects",
            F.coalesce(F.col("n_roles"), F.lit(0)).alias("n_roles"),
            F.coalesce(F.col("n_assignments"), F.lit(0)).alias(
                "n_assignments"
            ),
            F.coalesce(F.col("admin_assigned"), F.lit(False)).alias(
                "admin_assigned"
            ),
            "n_conflict_paths",
            "n_dots_total",
        )
    )


# -- realm_config.quota path through the admin reducer ------------------------
# RealmConfigQuotaSet (admin_document_reducer.rs:541-543) is an LWW path
# like the description: apply_realm_config_setting writes quota_value()
# (the supported_quota-NORMALIZED serialization, rs:1741-1753) under the
# REALM_CONFIG_QUOTA_PATH (rs:1530). materialized_realm_config_quota
# (rs:916-924) reads it back; a conflicted path materializes nothing and
# the stored document keeps the last agreed quota (apply_reducer_quota,
# operations/src/set_realm_quota.rs:365-377). Lane family (realm_n % 5;
# realm_n = doc_id % 97 covers all residues, coprime with the lane
# modulus — no CRT degeneracy):
#   0: never set — the document keeps QuotaConfig::default()
#      (core/src/structs/realm.rs:202-214: grace 110, warn 85,
#      max_groups 3, default bytes unlimited);
#   1: one causal set (n0) — live;
#   2: causal re-set (n1 observed n0) — LWW supersede, later wins;
#   3: CONCURRENT equal-after-normalization re-sets from n1/n2 (the
#      same overrides listed in different orders serialize equal after
#      supported_quota sorts them) — dots merge, no conflict
#      (rs:1421-1422);
#   4: concurrent DIFFERING re-sets — fail-closed conflict
#      (rs:1404-1419): materialized quota NULL, effective resolution
#      falls back to the last agreed value (the n0 seed both replicas
#      had stored before the frontier diverged).
_QUOTA_PATH = "realm_config.quota"
_QP_SUFFIX = {
    "q0": "|grace=110|warn=85|go=|mgpu=3|ugc=",
    "q1": "|grace=120|warn=80|go=|mgpu=3|ugc=",
    "qe": "|grace=110|warn=85|go=g-1:2000:150,g-2:-:-|mgpu=-|ugc=u-2:5,u-9:-",
    "qa": "|grace=130|warn=85|go=|mgpu=3|ugc=",
    "qb": "|grace=140|warn=85|go=|mgpu=3|ugc=",
}

_QUOTA_REPLAY_ORACLE = f"""
    WITH realms AS (
      SELECT DISTINCT doc_id % 97 AS r FROM documents
    ),
    base AS (
      SELECT 'realm-q' || r AS realm_id, r % 5 AS lane,
             'dgq=' || (1000 * (r + 1)) || '{_QP_SUFFIX["q0"]}' AS q0,
             'dgq=' || (1000 * (r + 1)) || '{_QP_SUFFIX["q1"]}' AS q1,
             'dgq=' || (2000 * (r + 1)) || '{_QP_SUFFIX["qe"]}' AS qe,
             'dgq=' || (1000 * (r + 1)) || '{_QP_SUFFIX["qa"]}' AS qa,
             'dgq=' || (1000 * (r + 1)) || '{_QP_SUFFIX["qb"]}' AS qb
      FROM realms
    ),
    events AS (
      SELECT realm_id, q0 AS value, 'n0' AS origin_node,
             1 AS origin_seq, 0 AS obs_n0
      FROM base WHERE lane <> 0
      UNION ALL
      SELECT realm_id, q1, 'n1', 1, 1 FROM base WHERE lane = 2
      UNION ALL
      SELECT realm_id, qe, 'n1', 1, 1 FROM base WHERE lane = 3
      UNION ALL
      SELECT realm_id, qe, 'n2', 1, 1 FROM base WHERE lane = 3
      UNION ALL
      SELECT realm_id, qa, 'n1', 1, 1 FROM base WHERE lane = 4
      UNION ALL
      SELECT realm_id, qb, 'n2', 1, 1 FROM base WHERE lane = 4
    ),
    live AS (
      SELECT a.* FROM events a
      WHERE NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.realm_id = a.realm_id
          AND ((CASE a.origin_node WHEN 'n0' THEN b.obs_n0 ELSE 0 END)
                 >= a.origin_seq
               OR (b.origin_node = a.origin_node
                   AND b.origin_seq > a.origin_seq))
      )
    ),
    reduced AS (
      SELECT realm_id, CAST(COUNT(*) AS BIGINT) AS n_dots,
             COUNT(DISTINCT value) AS n_vals, MAX(value) AS mval
      FROM live GROUP BY 1
    ),
    dominated AS (
      SELECT a.* FROM events a
      WHERE EXISTS (
        SELECT 1 FROM events b
        WHERE b.realm_id = a.realm_id
          AND ((CASE a.origin_node WHEN 'n0' THEN b.obs_n0 ELSE 0 END)
                 >= a.origin_seq
               OR (b.origin_node = a.origin_node
                   AND b.origin_seq > a.origin_seq))
      )
    ),
    agreed AS (
      SELECT realm_id, COUNT(DISTINCT value) AS la_nvals,
             MAX(value) AS la_val
      FROM (
        SELECT a.* FROM dominated a
        WHERE NOT EXISTS (
          SELECT 1 FROM dominated b
          WHERE b.realm_id = a.realm_id
            AND ((CASE a.origin_node WHEN 'n0' THEN b.obs_n0 ELSE 0 END)
                   >= a.origin_seq
                 OR (b.origin_node = a.origin_node
                     AND b.origin_seq > a.origin_seq))
        )
      ) GROUP BY 1
    ),
    sel AS (
      SELECT b.realm_id,
             CAST(COALESCE(r.n_dots, 0) AS BIGINT) AS n_dots,
             COALESCE(r.n_vals > 1, FALSE) AS is_conflict,
             CASE WHEN r.n_vals = 1 THEN r.mval END AS quota_value,
             CASE WHEN r.n_vals > 1 AND g.la_nvals = 1 THEN g.la_val END
               AS last_agreed_value
      FROM base b
      LEFT JOIN reduced r USING (realm_id)
      LEFT JOIN agreed g USING (realm_id)
    )
    SELECT realm_id, n_dots, is_conflict, quota_value, last_agreed_value,
           CASE WHEN src IS NOT NULL THEN
             CAST(NULLIF(regexp_extract(src, 'dgq=(\\d+)', 1), '')
                  AS BIGINT) END AS eff_default_quota_bytes,
           CAST(COALESCE(NULLIF(regexp_extract(src, 'grace=(\\d+)', 1),
                                ''), '110') AS INT) AS eff_grace_pct,
           CAST(COALESCE(NULLIF(regexp_extract(src, 'warn=(\\d+)', 1),
                                ''), '85') AS INT) AS eff_warn_pct,
           CASE WHEN src IS NULL THEN 3
                ELSE CAST(NULLIF(regexp_extract(src, 'mgpu=(\\d+)', 1),
                                 '') AS INT) END AS eff_max_groups
    FROM (
      SELECT *, COALESCE(quota_value, last_agreed_value) AS src FROM sel
    )
"""


def _realm_quota_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 97-residue realm dimension — derived ONCE per query (r15,
    VERDICT r14 Next #6: the six event lanes used to re-derive it per
    branch, seven corpus scans for a config-sized output)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 97).alias("r"))
        .distinct()
        .select(
            "r",
            F.concat(F.lit("realm-q"), F.col("r").cast("string")).alias(
                "realm_id"
            ),
        )
    )


def _realm_quota_events(realms: DataFrame) -> DataFrame:
    """Seed events off the realm dimension in ONE pass: each realm row
    carries an array of its lane's event structs, exploded and
    null-filtered — no per-lane union, no repeated corpus scan."""
    lane = F.col("r") % 5

    def canon(mult: int, key: str) -> F.Column:
        return F.concat(
            F.lit("dgq="),
            ((F.col("r") + 1) * mult).cast("string"),
            F.lit(_QP_SUFFIX[key]),
        )

    def obs(**pairs) -> F.Column:
        if not pairs:
            return F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<bigint>"),
            )
        return F.map_from_arrays(
            F.array(*[F.lit(n) for n in pairs]),
            F.array(*[F.lit(s).cast("long") for s in pairs.values()]),
        )

    def ev(cond, value, node, seq, observed):
        return F.when(
            cond,
            F.struct(
                value.cast("string").alias("value"),
                F.lit(node).alias("origin_node"),
                F.lit(seq).cast("long").alias("origin_seq"),
                observed.alias("observed"),
            ),
        )

    events = F.array(
        ev(lane != 0, canon(1000, "q0"), "n0", 1, obs()),
        ev(lane == 2, canon(1000, "q1"), "n1", 1, obs(n0=1)),
        ev(lane == 3, canon(2000, "qe"), "n1", 1, obs(n0=1)),
        ev(lane == 3, canon(2000, "qe"), "n2", 1, obs(n0=1)),
        ev(lane == 4, canon(1000, "qa"), "n1", 1, obs(n0=1)),
        ev(lane == 4, canon(1000, "qb"), "n2", 1, obs(n0=1)),
    )
    return (
        realms.select(
            "realm_id",
            F.explode(F.filter(events, lambda e: e.isNotNull())).alias("e"),
        )
        .select(
            "realm_id",
            F.lit(_QUOTA_PATH).alias("path"),
            F.col("e.value").alias("value"),
            F.col("e.origin_node").alias("origin_node"),
            F.col("e.origin_seq").alias("origin_seq"),
            F.col("e.observed").alias("observed"),
        )
    )


@register("crdt_realm_quota_replay", oracle=_QUOTA_REPLAY_ORACLE)
def crdt_realm_quota_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay RealmConfigQuotaSet events through the admin-document
    path reducer and materialize per realm: the winning normalized
    quota value (NULL when conflicted or never set), the last AGREED
    value a conflicted realm's stored document keeps
    (apply_reducer_quota, set_realm_quota.rs:365-377), and the
    effective grace/warn/group-cap/default-bytes resolution
    (realm.rs:202-259) that queries/quota.py enforces — never-set
    realms resolve to QuotaConfig::default(), conflicted realms to the
    last agreed value, live realms to the materialized one
    (materialized_realm_config_quota, reducer rs:916-924)."""
    from aruna_spark.ops.admin_reduce import dominated_admin_events

    # The realm dimension is config-sized (≤97 rows) but feeds six
    # subtrees (the event explode is referenced twice per domination
    # join, plus the realm list) — materialize it so the corpus
    # distinct runs ONCE instead of once per reference (VERDICT r14
    # Next #6). localCheckpoint, not cache(): a cache() entry outlives
    # the call and a repeated bench invocation would silently reuse it
    # (cross-run caching); the checkpoint is recomputed per call.
    dim = _realm_quota_dim(spark, sf_dir).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    events = _realm_quota_events(dim)
    key = ["realm_id"]
    reduced = reduce_admin_paths(events, key)
    agreed = reduce_admin_paths(dominated_admin_events(events, key), key)
    realms = dim.select("realm_id")
    sel = (
        realms.join(
            reduced.select(
                "realm_id",
                F.col("n_dots"),
                F.col("is_conflict"),
                F.col("value").alias("quota_value"),
            ),
            "realm_id",
            "left",
        )
        .join(
            agreed.select(
                "realm_id", F.col("value").alias("la_val")
            ),
            "realm_id",
            "left",
        )
        .select(
            "realm_id",
            F.coalesce(F.col("n_dots"), F.lit(0)).cast("long").alias(
                "n_dots"
            ),
            F.coalesce(F.col("is_conflict"), F.lit(False)).alias(
                "is_conflict"
            ),
            "quota_value",
            F.when(F.col("is_conflict"), F.col("la_val")).alias(
                "last_agreed_value"
            ),
        )
    )
    src = F.coalesce(F.col("quota_value"), F.col("last_agreed_value"))

    def ex(pat: str) -> F.Column:
        x = F.regexp_extract(src, pat, 1)
        # '' (no match) and NULL input both fall through to NULL; ANSI
        # mode would throw on CAST('' AS INT)
        return F.when(x != "", x)

    return sel.select(
        "realm_id",
        "n_dots",
        "is_conflict",
        "quota_value",
        "last_agreed_value",
        F.when(src.isNotNull(), ex(r"dgq=(\d+)").cast("long")).alias(
            "eff_default_quota_bytes"
        ),
        F.coalesce(ex(r"grace=(\d+)").cast("int"), F.lit(110)).alias(
            "eff_grace_pct"
        ),
        F.coalesce(ex(r"warn=(\d+)").cast("int"), F.lit(85)).alias(
            "eff_warn_pct"
        ),
        F.when(src.isNull(), F.lit(3))
        .otherwise(ex(r"mgpu=(\d+)").cast("int"))
        .alias("eff_max_groups"),
    )
