"""Plain group / user listings (the unfiltered paged walks).

Reference surface:

- ``operations/src/list_groups.rs:28-63`` — ListGroups: offset+limit
  page over the group keyspace in key order (scan limit =
  offset+limit, then skip(offset)); default limit 10,000.
- ``operations/src/list_users.rs:13-33`` — ListUsers: keyset page
  (limit, start_after) in user-id order with ``next_start_after``
  minted from the storage cursor.

The substring-search sections already cover principal DISCOVERY
(``queries/search.py`` buckets/groups/users); these are the plain
console listings. Model: groups are the corpus source families
(``group-{source}``, one member count roll-up per group); users are the
customer relation keyed ``user-{c_custkey}``.

Scale: both are dimension-sized scans (the reference clamps at 10k);
the page envelopes derive through the bounded TakeOrderedAndProject +
bounded_rank template — no global window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.pagination import bounded_rank
from aruna_spark.queries import register

_G_OFFSET, _G_LIMIT = 2, 10
_U_AFTER, _U_LIMIT = "user-0150", 25


@register(
    "registry_list_groups",
    oracle=f"""
    WITH groups AS (
      SELECT 'group-' || source AS name,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY name) - 1 AS pos FROM groups
    )
    SELECT name, n_members, CAST(pos AS INT) AS pos
    FROM ranked
    WHERE pos >= {_G_OFFSET} AND pos < {_G_OFFSET + _G_LIMIT}
    """,
)
def registry_list_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListGroups page (offset {2}, limit {10}) in name order with a
    member-count roll-up per group — the scan-then-skip(offset)
    discipline of list_groups.rs:46-63 as a bounded head + rank."""
    groups = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.concat(F.lit("group-"), F.col("source")).alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    )
    head = groups.orderBy("name").limit(_G_OFFSET + _G_LIMIT)
    ranked = bounded_rank(head, [F.col("name")], rank_name="__rn").withColumn(
        "pos", (F.col("__rn") - 1).cast("int")
    )
    return ranked.filter(F.col("pos") >= _G_OFFSET).select(
        "name", "n_members", "pos"
    )


@register(
    "registry_list_users",
    oracle=f"""
    WITH users AS (
      SELECT 'user-' || lpad(CAST(c_custkey AS VARCHAR), 4, '0') AS user_id,
             c_name AS display_name, c_nationkey
      FROM customer
    ),
    page AS (
      SELECT * FROM users WHERE user_id > '{_U_AFTER}'
      ORDER BY user_id LIMIT {_U_LIMIT}
    ),
    tot AS (
      SELECT COUNT(*) AS n FROM users WHERE user_id > '{_U_AFTER}'
    )
    SELECT user_id, display_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CASE WHEN (SELECT n FROM tot) > {_U_LIMIT}
                THEN (SELECT MAX(user_id) FROM page) END AS next_start_after
    FROM page
    """,
)
def registry_list_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListUsers keyset page: user-id order strictly after
    ``start_after``, ``next_start_after`` minted from the page's last id
    only when more remain (list_users.rs:22-33)."""
    users = load_table(spark, sf_dir, "customer").select(
        F.concat(
            F.lit("user-"), F.lpad(F.col("c_custkey").cast("string"), 4, "0")
        ).alias("user_id"),
        F.col("c_name").alias("display_name"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )
    after = users.filter(F.col("user_id") > _U_AFTER)
    page = after.orderBy("user_id").limit(_U_LIMIT)
    total = after.agg(F.count(F.lit(1)).alias("__total"))
    last = page.agg(F.max("user_id").alias("__last"))
    more = F.col("__total") > _U_LIMIT
    return (
        page.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(last))
        .select(
            "user_id",
            "display_name",
            "c_nationkey",
            F.when(more, F.col("__last")).alias("next_start_after"),
        )
    )


# ------------------------------------------------------- group search
GROUP_QUERY = "platform"
GROUP_SEARCH_LIMIT = 8


def load_group_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP keyspace: id-ordered records whose display names are
    deliberately NOT in key order (the scan order is the key, the
    match is on the name — search_groups.rs:134-136)."""
    c = F.col("c_custkey")
    name = (
        F.when(c % 7 == 0, F.concat(F.lit("Data Platform "), c.cast("string")))
        .when(c % 7 == 1, F.concat(F.lit("platform ops "), c.cast("string")))
        .when(c % 7 == 2, F.concat(F.lit("Research "), c.cast("string")))
        .otherwise(F.concat(F.lit("Team "), c.cast("string")))
    )
    return load_table(spark, sf_dir, "customer").filter(c % 3 == 0).select(
        F.concat(F.lit("g"), F.lpad(c.cast("string"), 4, "0")).alias(
            "group_id"
        ),
        name.alias("display_name"),
    )


_GROUPS_DIR_SQL = """
    gdir AS (
      SELECT 'g' || lpad(CAST(c_custkey AS VARCHAR), 4, '0') AS group_id,
             CASE WHEN c_custkey % 7 = 0
                    THEN 'Data Platform ' || c_custkey
                  WHEN c_custkey % 7 = 1
                    THEN 'platform ops ' || c_custkey
                  WHEN c_custkey % 7 = 2 THEN 'Research ' || c_custkey
                  ELSE 'Team ' || c_custkey END AS display_name
      FROM customer WHERE c_custkey % 3 = 0
    )
"""


def search_groups_of(
    groups: DataFrame, query: str, limit: int, start_after: str | None = None
) -> DataFrame:
    """SearchGroups (search_groups.rs:96-167): scan the group keyspace
    in KEY (group_id) order strictly after ``start_after``, keep
    case-insensitive display-name substring matches, stop at limit;
    ``next_start_after`` is the page's last group_id minted only when
    a further match exists (the reference over-collects limit+1 and
    truncates). Bounded TakeOrderedAndProject + a 1-row broadcast
    envelope — the scan never ranks globally."""
    q = query.lower()
    matches = groups.filter(F.contains(F.lower("display_name"), F.lit(q)))
    if start_after is not None:
        matches = matches.filter(F.col("group_id") > start_after)
    page = matches.orderBy("group_id").limit(limit)
    more = matches.orderBy("group_id").limit(limit + 1).agg(
        (F.count(F.lit(1)) > limit).alias("__more"),
    )
    last = page.agg(F.max("group_id").alias("__last"))
    env = more.crossJoin(F.broadcast(last)).select(
        F.when(F.col("__more"), F.col("__last")).alias("next_start_after")
    )
    return page.crossJoin(F.broadcast(env))


@register(
    "search_groups_page",
    oracle=f"""
    WITH {_GROUPS_DIR_SQL},
    matches AS (
      SELECT * FROM gdir
      WHERE contains(lower(display_name), '{GROUP_QUERY}')
    ),
    page AS (
      SELECT * FROM matches ORDER BY group_id LIMIT {GROUP_SEARCH_LIMIT}
    )
    SELECT p.group_id, p.display_name,
           CASE WHEN (SELECT COUNT(*) FROM matches)
                     > {GROUP_SEARCH_LIMIT}
                THEN (SELECT MAX(group_id) FROM page)
           END AS next_start_after
    FROM page p
    """,
)
def search_groups_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form pinned at the fixture query/limit; the
    parameterized operator is :func:`search_groups_of`."""
    return search_groups_of(
        load_group_directory(spark, sf_dir),
        GROUP_QUERY,
        GROUP_SEARCH_LIMIT,
    )


# ------------------------------------------- subject-conflict resolution
def load_subject_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with their claimed OIDC subjects. Each user claims two
    derived subjects over 40 slots, so the fixture guarantees shared
    claims (the duplicate-account shape register_or_get_oidc_user
    produces when two records race one identity)."""
    c = F.col("c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .filter(c % 23 == 9)
        .select(
            F.concat(F.lit("user-"), c.cast("string")).alias("user_id"),
            F.array(
                F.concat(F.lit("sub-"), (c % 40).cast("string")),
                F.concat(F.lit("sub-"), ((c * 7) % 40).cast("string")),
            ).alias("subject_ids"),
        )
    )


_CLAIMS_SQL = """
    SELECT 'user-' || c_custkey AS user_id,
           ['sub-' || (c_custkey % 40),
            'sub-' || ((c_custkey * 7) % 40)] AS subject_ids
    FROM customer WHERE c_custkey % 23 = 9
"""


@register(
    "registry_subject_conflicts",
    oracle=f"""
    WITH claims AS ({_CLAIMS_SQL}),
    pairs AS (
      SELECT DISTINCT user_id, UNNEST(subject_ids) AS subject_id FROM claims
    )
    SELECT p.subject_id,
           MIN(p.user_id) AS canonical_user,
           CAST(COUNT(*) AS BIGINT) AS n_claimants,
           string_agg(p.user_id, ',' ORDER BY p.user_id)
             AS claimants_csv
    FROM pairs p
    GROUP BY p.subject_id
    HAVING COUNT(*) > 1
    """,
)
def registry_subject_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subjects claimed by more than one user record, with the
    canonical winner.

    Reference: ``operations/src/user_subject_index.rs``
    (``build_resolution``, rs:232-301) — when user records share an
    OIDC subject, the SMALLEST user id becomes canonical and every
    other claimant merges into it. This is the detection sweep: one
    explode + one groupBy on the subject (maximal-cardinality key);
    the canonical choice is the group min.
    """
    claims = load_subject_claims(spark, sf_dir)
    pairs = claims.select(
        "user_id", F.explode("subject_ids").alias("subject_id")
    ).distinct()
    return (
        pairs.groupBy("subject_id")
        .agg(
            F.min("user_id").alias("canonical_user"),
            F.count(F.lit(1)).alias("n_claimants"),
            F.concat_ws(",", F.array_sort(F.collect_list("user_id"))).alias(
                "claimants_csv"
            ),
        )
        .filter(F.col("n_claimants") > 1)
    )


@register(
    "registry_subject_merges",
    oracle=f"""
    WITH claims AS ({_CLAIMS_SQL}),
    pairs AS (
      SELECT DISTINCT user_id, UNNEST(subject_ids) AS subject_id FROM claims
    ),
    conflicts AS (
      SELECT subject_id, MIN(user_id) AS canonical_user
      FROM pairs GROUP BY subject_id HAVING COUNT(*) > 1
    ),
    members AS (
      SELECT DISTINCT c.canonical_user, p.user_id
      FROM conflicts c JOIN pairs p USING (subject_id)
    ),
    merged AS (
      SELECT m.canonical_user, p2.subject_id, m.user_id
      FROM members m JOIN pairs p2 ON p2.user_id = m.user_id
    )
    SELECT canonical_user,
           string_agg(DISTINCT subject_id, ','
                      ORDER BY subject_id) AS merged_subjects_csv,
           string_agg(DISTINCT CASE WHEN user_id <> canonical_user
                                    THEN user_id END, ','
                      ORDER BY (CASE WHEN user_id <> canonical_user
                                     THEN user_id END)) AS alias_users_csv
    FROM merged
    GROUP BY canonical_user
    """,
)
def registry_subject_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-hop canonical merge (rs:250-272): each conflict-winning
    user absorbs the UNION of its conflict partners' subjects, and the
    losers become alias ids on the canonical record (then deleted as
    standalone rows). One hop exactly — the reference resolves per
    write, not transitively; a full transitive collapse is the
    dedup_clusters template."""
    claims = load_subject_claims(spark, sf_dir)
    pairs = claims.select(
        "user_id", F.explode("subject_ids").alias("subject_id")
    ).distinct()
    conflicts = (
        pairs.groupBy("subject_id")
        .agg(
            F.min("user_id").alias("canonical_user"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 1)
        .select("subject_id", "canonical_user")
    )
    members = (
        conflicts.join(pairs, "subject_id")
        .select("canonical_user", "user_id")
        .distinct()
    )
    merged = members.join(pairs, "user_id").select(
        "canonical_user", "subject_id", "user_id"
    )
    return merged.groupBy("canonical_user").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("subject_id"))
        ).alias("merged_subjects_csv"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("user_id") != F.col("canonical_user"),
                        F.col("user_id"),
                    )
                )
            ),
        ).alias("alias_users_csv"),
    )


@register(
    "registry_subject_closure",
    oracle=f"""
    WITH RECURSIVE claims AS ({_CLAIMS_SQL}),
    pairs AS (
      SELECT DISTINCT user_id, UNNEST(subject_ids) AS subject_id FROM claims
    ),
    conflicts AS (
      SELECT subject_id, MIN(user_id) AS a
      FROM pairs GROUP BY subject_id HAVING COUNT(*) > 1
    ),
    edges0 AS (
      SELECT DISTINCT c.a, p.user_id AS b
      FROM conflicts c JOIN pairs p USING (subject_id)
      WHERE p.user_id <> c.a
    ),
    edges AS (SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0),
    reach(n, m) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    comp AS (SELECT n, LEAST(n, MIN(m)) AS label FROM reach GROUP BY n),
    merged AS (
      SELECT comp.label, comp.n, p.subject_id
      FROM comp JOIN pairs p ON p.user_id = comp.n
    )
    SELECT label AS canonical_user,
           CAST(COUNT(DISTINCT n) AS BIGINT) AS n_members,
           string_agg(DISTINCT subject_id, ',' ORDER BY subject_id)
             AS merged_subjects_csv,
           string_agg(DISTINCT CASE WHEN n <> label THEN n END, ','
                      ORDER BY (CASE WHEN n <> label THEN n END))
             AS alias_users_csv
    FROM merged GROUP BY label
    """,
)
def registry_subject_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSITIVE subject-merge collapse (VERDICT r8 Next #5): the
    fixpoint of the one-hop per-write resolution
    (user_subject_index.rs:232-301) — what a bulk import wants, since
    per-record one-hop merges applied over an unordered batch leave
    chains (A absorbs B, but C←B's partner joins only on a later
    write). Components form over the subject-share star edges
    (winner ← each co-claimant) with the dedup_clusters min-label
    template; the canonical id is the component minimum, matching the
    one-hop winner rule, so iterating one-hop to fixpoint lands on
    exactly this relation (property-tested in
    tests/test_subject_closure.py). The edge table is O(users with a
    shared subject), never O(users)."""
    claims = load_subject_claims(spark, sf_dir)
    # the pair relation is read three times downstream (conflict
    # grouping, edge join, final merge join); materialize it once so
    # the claims scan + explode + distinct run once per invocation.
    # Disk lifecycle (ADVICE r15): each invocation leaves DISK_ONLY
    # checkpoint blocks on local disk until the ContextCleaner GCs the
    # frame — bounded per invocation, nothing persists across runs, and
    # the checkpoint also erases size estimates (downstream joins here
    # are aggregations and the min-label loop, never un-hinted
    # broadcasts, so finding (c) of OPTIMIZATION_r15 does not bite).
    pairs = (
        claims.select(
            "user_id", F.explode("subject_ids").alias("subject_id")
        )
        .distinct()
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    return subject_closure_of(pairs)


def subject_closure_of(pairs: DataFrame) -> DataFrame:
    """The closure operator over a (user_id, subject_id) claim
    relation — see :func:`registry_subject_closure`."""
    from aruna_spark.queries.dedup import _min_label_components

    conflicts = (
        pairs.groupBy("subject_id")
        .agg(F.min("user_id").alias("a"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("subject_id", "a")
    )
    edges = (
        conflicts.join(pairs, "subject_id")
        .filter(F.col("user_id") != F.col("a"))
        .select(F.col("a").alias("doc_a"), F.col("user_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    labels = _min_label_components(edges)
    merged = labels.join(pairs, labels["n"] == pairs["user_id"])
    return merged.groupBy(F.col("label").alias("canonical_user")).agg(
        F.countDistinct("n").alias("n_members"),
        F.concat_ws(",", F.array_sort(F.collect_set("subject_id"))).alias(
            "merged_subjects_csv"
        ),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_set(
                    F.when(F.col("n") != F.col("label"), F.col("n"))
                )
            ),
        ).alias("alias_users_csv"),
    )


# ----------------------------------------------------- user resolution
# operations/src/resolve_users.rs + core user_update_validation.rs:10 —
# display resolution redacts to the SAFE attribute allowlist and omits
# foreign-realm or unknown ids silently (no error lane: rs:249-296).
SAFE_USER_ATTRIBUTE_KEYS = ("orcid", "affiliation", "department")


def load_user_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user keyspace: realm-sharded names + attributes, including
    an UNSAFE one (email) the resolver must never echo."""
    c = F.col("c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("user-"), c.cast("string")).alias("user_id"),
        F.concat(F.lit("realm-"), (c % 3).cast("string")).alias("realm_id"),
        F.col("c_name").alias("name"),
        F.when(c % 2 == 0, F.concat(F.lit("0000-"), c.cast("string"))).alias(
            "orcid"
        ),
        F.when(c % 5 < 2, F.concat(F.lit("org-"), (c % 11).cast("string")))
        .alias("affiliation"),
        F.when(c % 7 == 1, F.lit("lab")).alias("department"),
        F.concat(F.lit("u"), c.cast("string"), F.lit("@example.org")).alias(
            "email"
        ),
    )


_DIRECTORY_SQL = """
    SELECT 'user-' || c_custkey AS user_id,
           'realm-' || (c_custkey % 3) AS realm_id,
           c_name AS name,
           CASE WHEN c_custkey % 2 = 0 THEN '0000-' || c_custkey END
             AS orcid,
           CASE WHEN c_custkey % 5 < 2 THEN 'org-' || (c_custkey % 11) END
             AS affiliation,
           CASE WHEN c_custkey % 7 = 1 THEN 'lab' END AS department
    FROM customer
"""


@register(
    "registry_resolve_users",
    oracle=f"""
    WITH directory AS ({_DIRECTORY_SQL}),
    req AS (
      SELECT DISTINCT 'user-' || o_custkey AS user_id
      FROM orders WHERE o_orderkey % 31 = 6
    )
    SELECT d.user_id, d.name, d.orcid, d.affiliation, d.department
    FROM req r JOIN directory d USING (user_id)
    WHERE d.realm_id = 'realm-0'
    """,
)
def registry_resolve_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch display resolution (resolve_users.rs): the request's ids
    dedup, unknown ids and foreign-realm users drop silently
    (rs:151,249-296), and attributes redact to the safe allowlist
    (orcid/affiliation/department — the stored email never echoes,
    rs:66). One semi-bounded join against the realm-filtered
    directory."""
    req = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 31 == 6)
        .select(
            F.concat(F.lit("user-"), F.col("o_custkey").cast("string")).alias(
                "user_id"
            )
        )
        .distinct()
    )
    directory = load_user_directory(spark, sf_dir).filter(
        F.col("realm_id") == "realm-0"
    )
    return req.join(directory, "user_id").select(
        "user_id", "name", *SAFE_USER_ATTRIBUTE_KEYS
    )


# --------------------------------------- canonical token-subject check
# operations/src/ensure_canonical_user_token_subject.rs: a token naming
# user U is only valid while U is the CANONICAL record for every
# subject it lists. Rung order (rs:101-158): the USER read — missing
# record (rs:108-110) or a stored record whose user_id disagrees with
# its key (rs:115-117) → Unauthorized; an EMPTY subject list finishes
# Ok (rs:121-123); then every subject's USER_SUBJECT_INDEX entry —
# missing (rs:139-141) or pointing at a DIFFERENT user (rs:146-148,
# i.e. the subject was merged into another canonical record) →
# Forbidden. The index side is exactly the min-claimant winner the
# subject-conflict queries derive (user_subject_index.rs:232-301), so
# merge losers' tokens go Forbidden here — the enforcement edge of
# registry_subject_merges.
#
# Fixture lanes over the shared load_subject_claims relation: merge
# losers (non-min claimants) → forbidden; every c % 4 == 1 claimant
# also lists an UNINDEXED extra subject → forbidden even for winners;
# c % 4 == 2 users carry an empty subject list → ok with no index
# reads; the stored-record user_id is corrupted on c % 4 == 3 →
# unauthorized_mismatch BEFORE any subject read; requests also name
# three unknown ids → unauthorized_missing.
_TOKEN_REQS_SQL = """
    SELECT 'user-' || c_custkey AS user_id FROM customer
    WHERE c_custkey % 23 = 9
    UNION ALL
    SELECT 'user-ghost-' || r.i FROM range(3) r(i)
"""

_TOKEN_USERS_SQL = """
    SELECT 'user-' || c_custkey AS user_id,
           CASE WHEN c_custkey % 4 = 3
                THEN 'user-corrupt-' || c_custkey
                ELSE 'user-' || c_custkey END AS stored_user_id,
           CASE WHEN c_custkey % 4 = 2 THEN []
                WHEN c_custkey % 4 = 1
                THEN ['sub-' || (c_custkey % 40),
                      'sub-' || ((c_custkey * 7) % 40),
                      'sub-x-' || c_custkey]
                ELSE ['sub-' || (c_custkey % 40),
                      'sub-' || ((c_custkey * 7) % 40)]
           END AS subject_ids
    FROM customer WHERE c_custkey % 23 = 9
"""


def load_token_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("c_custkey")
    base_subs = F.array(
        F.concat(F.lit("sub-"), (c % 40).cast("string")),
        F.concat(F.lit("sub-"), ((c * 7) % 40).cast("string")),
    )
    subs = (
        F.when(c % 4 == 2, F.array().cast("array<string>"))
        .when(
            c % 4 == 1,
            F.concat(
                base_subs,
                F.array(F.concat(F.lit("sub-x-"), c.cast("string"))),
            ),
        )
        .otherwise(base_subs)
    )
    return (
        load_table(spark, sf_dir, "customer")
        .filter(c % 23 == 9)
        .select(
            F.concat(F.lit("user-"), c.cast("string")).alias("user_id"),
            F.when(
                c % 4 == 3,
                F.concat(F.lit("user-corrupt-"), c.cast("string")),
            )
            .otherwise(F.concat(F.lit("user-"), c.cast("string")))
            .alias("stored_user_id"),
            subs.alias("subject_ids"),
        )
    )


@register(
    "user_token_canonical_check",
    oracle=f"""
    WITH claims AS ({_CLAIMS_SQL}),
    idx AS (
      SELECT subject_id, MIN(user_id) AS canonical_user
      FROM (SELECT DISTINCT user_id, UNNEST(subject_ids) AS subject_id
            FROM claims)
      GROUP BY subject_id
    ),
    users AS ({_TOKEN_USERS_SQL}),
    reqs AS ({_TOKEN_REQS_SQL}),
    pairs AS (
      SELECT u.user_id, s.subject_id, i.canonical_user
      FROM users u, UNNEST(u.subject_ids) s(subject_id)
      LEFT JOIN idx i USING (subject_id)
    ),
    checks AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_subjects,
             CAST(COUNT(*) FILTER (WHERE canonical_user IS NULL)
               AS BIGINT) AS n_unindexed,
             CAST(COUNT(*) FILTER (WHERE canonical_user IS NOT NULL
                                     AND canonical_user <> user_id)
               AS BIGINT) AS n_noncanonical
      FROM pairs GROUP BY user_id
    )
    SELECT r.user_id,
           CASE WHEN u.user_id IS NULL THEN 'unauthorized_missing'
                WHEN u.stored_user_id <> r.user_id
                  THEN 'unauthorized_mismatch'
                WHEN COALESCE(c.n_unindexed, 0)
                     + COALESCE(c.n_noncanonical, 0) > 0 THEN 'forbidden'
                ELSE 'ok' END AS verdict,
           COALESCE(c.n_subjects, 0) AS n_subjects,
           COALESCE(c.n_unindexed, 0) AS n_unindexed,
           COALESCE(c.n_noncanonical, 0) AS n_noncanonical
    FROM reqs r
    LEFT JOIN users u USING (user_id)
    LEFT JOIN checks c ON c.user_id = r.user_id
    """,
)
def user_token_canonical_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-classify token principals through the canonical-subject
    ladder — Unauthorized rungs strictly before the per-subject
    Forbidden rungs; empty subject lists pass without touching the
    index; the index is the live min-claimant winner relation, so this
    is the read-side enforcement of the subject merges."""
    claims = load_subject_claims(spark, sf_dir)
    idx = (
        claims.select(
            "user_id", F.explode("subject_ids").alias("subject_id")
        )
        .distinct()
        .groupBy("subject_id")
        .agg(F.min("user_id").alias("canonical_user"))
    )
    users = load_token_users(spark, sf_dir)
    ghosts = spark.range(3).select(
        F.concat(F.lit("user-ghost-"), F.col("id").cast("string")).alias(
            "user_id"
        )
    )
    reqs = users.select("user_id").unionByName(ghosts)
    pairs = users.select(
        "user_id", F.explode("subject_ids").alias("subject_id")
    ).join(F.broadcast(idx), "subject_id", "left")
    checks = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(F.col("canonical_user").isNull().cast("long")).alias(
            "n_unindexed"
        ),
        F.sum(
            (
                F.col("canonical_user").isNotNull()
                & (F.col("canonical_user") != F.col("user_id"))
            ).cast("long")
        ).alias("n_noncanonical"),
    )
    u = users.select(
        "user_id", "stored_user_id", F.lit(True).alias("__exists")
    )
    j = (
        reqs.join(F.broadcast(u), "user_id", "left")
        .join(F.broadcast(checks), "user_id", "left")
    )
    bad = F.coalesce(F.col("n_unindexed"), F.lit(0)) + F.coalesce(
        F.col("n_noncanonical"), F.lit(0)
    )
    return j.select(
        "user_id",
        F.when(F.col("__exists").isNull(), "unauthorized_missing")
        .when(
            F.col("stored_user_id") != F.col("user_id"),
            "unauthorized_mismatch",
        )
        .when(bad > 0, "forbidden")
        .otherwise("ok")
        .alias("verdict"),
        F.coalesce(F.col("n_subjects"), F.lit(0)).alias("n_subjects"),
        F.coalesce(F.col("n_unindexed"), F.lit(0)).alias("n_unindexed"),
        F.coalesce(F.col("n_noncanonical"), F.lit(0)).alias(
            "n_noncanonical"
        ),
    )
