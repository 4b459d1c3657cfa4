"""S3 user-access credentials: create/list/revoke records whose path
restrictions gate the data plane (VERDICT r8 'What's missing' #2).

Reference surface:

- ``core/src/structs/blob.rs:887-930`` — ``UserAccess { access_key,
  user_identity, group_id, secret, expiry, path_restrictions:
  Option<Vec<PathRestriction>>, issued_by, revoked_at }``; access keys
  are strictly alphanumeric (``build_access_key``, rs:899-913);
  ``is_expired`` = expiry <= now, ``is_revoked`` = revoked_at set.
- ``core/src/structs/structs.rs:91-96`` — ``PathRestriction { pattern
  (supports * and ** wildcards), permission }``.
- ``operations/src/s3/create_user_access.rs:88-123`` — create writes
  the record under its access key (30-char alphanumeric secret,
  default TTL 365 d) then replicates realm-wide.
- ``operations/src/s3/list_user_access.rs:49-112`` — list scans the
  whole keyspace in pages of 10 000 and keeps the caller's
  ``user_identity`` — key order is the scan order.
- ``operations/src/s3/revoke_user_access.rs:92-120`` — revoke is
  transactional and IDEMPOTENT: an already-revoked credential commits
  unchanged (the original revoked_at survives), otherwise
  revoked_at := now.
- ``api/src/s3/auth.rs:255-266`` — the data plane builds its
  AuthContext from the credential, carrying ``path_restrictions``
  into the permission check exactly like the r8 bearer-token
  restrictions: a restricted credential is a WHITELIST on top of the
  group grant (DENY wins; WRITE covers READ — permission_rules.rs),
  and ``api/src/auth.rs:476-485`` — restricted (delegated)
  credentials never reach user-scoped surfaces at all.

Spark mapping: the credential keyspace is a relation; list is a
filtered ordered scan; the gate is the same broadcast
regex-whitelist join the token restrictions use; revoke is a CASE
over the batch. All per-credential restriction sets are tiny and
broadcast; the matrix output is the intended cardinality.

Fixture (customer table; discriminator mods pairwise coprime to the
%6 row selection — all lanes populated at sf0.001, asserted in
tests/test_user_access.py): credentials for ``c_custkey % 6 == 1``;
expired when ``% 5 == 0`` (expiry custkey+10 <= NOW) else
custkey+1_000_000; revoked when ``% 7 == 2`` at custkey+100;
restrictions: ``% 11 == 3`` → read-only under data/src1, ``% 11 ==
7`` → write under data minus the de subtree; NOW = 500_000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.globs import glob_to_regex
from aruna_spark.queries import register

NOW_MS = 500_000
LIST_SCAN_LIMIT = 10_000  # list_user_access.rs:49
ACCESS_KEY_MAX_LEN = 128  # blob.rs:18
SECRET_LEN = 30  # create_user_access.rs:98-102
DEFAULT_TTL_MS = 365 * 24 * 60 * 60 * 1000  # create_user_access.rs:19
LIST_USER = "user-7"

# (restriction-lane, glob, permission) — compiled once, embedded as
# plan literals exactly like ALLOW_RULES in queries/permissions.py
RESTRICTION_RULES = [
    (3, "data/src1/**", "READ"),
    (7, "data/**", "WRITE"),
    (7, "data/src1/de/**", "DENY"),
]
_C_RULES = [(lane, glob_to_regex(g), p) for lane, g, p in RESTRICTION_RULES]

OBJECT_PATHS = [
    "data/src1/a.txt",
    "data/src1/de/b.txt",
    "data/src2/c.txt",
    "logs/d.txt",
]
ACTIONS = ["READ", "WRITE"]


def load_user_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The USER_ACCESS keyspace (one row per credential)."""
    c = F.col("c_custkey")
    return load_table(spark, sf_dir, "customer").filter(c % 6 == 1).select(
        F.concat(F.lit("AK"), c.cast("string")).alias("access_key"),
        F.concat(F.lit("user-"), (c % 10).cast("string")).alias(
            "user_identity"
        ),
        F.concat(F.lit("grp-"), (c % 4).cast("string")).alias("group_id"),
        F.when(c % 5 == 0, c + 10)
        .otherwise(c + 1_000_000)
        .cast("long")
        .alias("expiry_ms"),
        F.when(c % 7 == 2, c + 100).cast("long").alias("revoked_at_ms"),
        F.when(c % 11 == 3, F.lit(3))
        .when(c % 11 == 7, F.lit(7))
        .cast("int")
        .alias("restriction_lane"),
        c.alias("custkey"),
    )


_CREDS_SQL = """
    creds AS (
      SELECT 'AK' || c_custkey AS access_key,
             'user-' || (c_custkey % 10) AS user_identity,
             'grp-' || (c_custkey % 4) AS group_id,
             CAST(CASE WHEN c_custkey % 5 = 0 THEN c_custkey + 10
                  ELSE c_custkey + 1000000 END AS BIGINT) AS expiry_ms,
             CAST(CASE WHEN c_custkey % 7 = 2 THEN c_custkey + 100 END
                  AS BIGINT) AS revoked_at_ms,
             CAST(CASE WHEN c_custkey % 11 = 3 THEN 3
                       WHEN c_custkey % 11 = 7 THEN 7 END AS INT)
               AS restriction_lane,
             c_custkey AS custkey
      FROM customer WHERE c_custkey % 6 = 1
    )
"""


def _status() -> F.Column:
    """Auth-layer credential status: revocation is checked before
    expiry (both reject — the order only names the reason)."""
    return (
        F.when(F.col("revoked_at_ms").isNotNull(), "revoked")
        .when(F.col("expiry_ms") <= NOW_MS, "expired")
        .otherwise("active")
    )


_STATUS_SQL = f"""CASE WHEN revoked_at_ms IS NOT NULL THEN 'revoked'
                WHEN expiry_ms <= {NOW_MS} THEN 'expired'
                ELSE 'active' END"""


@register(
    "s3_user_access_list",
    oracle=f"""
    WITH {_CREDS_SQL}
    SELECT access_key, group_id, expiry_ms, revoked_at_ms,
           restriction_lane IS NOT NULL AS restricted,
           {_STATUS_SQL} AS status
    FROM creds WHERE user_identity = '{LIST_USER}'
    ORDER BY access_key
    """,
)
def s3_user_access_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List one user's credentials (list_user_access.rs): the keyspace
    scan keeps rows whose user_identity matches, in key order. The
    filter pushes into the scan; at scale this is an index-range read,
    never a collect."""
    return (
        load_user_access(spark, sf_dir)
        .filter(F.col("user_identity") == LIST_USER)
        .select(
            "access_key",
            "group_id",
            "expiry_ms",
            "revoked_at_ms",
            F.col("restriction_lane").isNotNull().alias("restricted"),
            _status().alias("status"),
        )
        .orderBy("access_key")
    )


def access_gate(creds: DataFrame, requests: DataFrame) -> DataFrame:
    """The data-plane gate for (credential × object key × action):

    1. revoked / expired credentials fail closed (blob.rs:923-929 via
       the auth layer);
    2. an UNRESTRICTED credential passes — its group grant covers the
       group data path the request was routed to (s3/auth.rs:263-268);
    3. a RESTRICTED credential is a whitelist on top: any DENY match
       rejects, otherwise a grant pattern must match with a permission
       covering the action (WRITE ⊃ READ — permission_rules.rs, same
       ladder the r8 token restrictions feed).

    Restrictions broadcast (per-credential and tiny); the match is a
    JVM-side rlike."""
    spark = creds.sparkSession
    rules = spark.createDataFrame(
        _C_RULES, "lane int, pattern string, permission string"
    )
    matrix = creds.crossJoin(F.broadcast(requests))
    matched = matrix.join(
        F.broadcast(rules),
        (F.col("restriction_lane") == F.col("lane"))
        & F.regexp_like(F.col("key_path"), F.col("pattern")),
        "left",
    )
    grant = (F.col("permission") == "WRITE") | (
        (F.col("permission") == "READ") & (F.col("action") == "READ")
    )
    agg = matched.groupBy(
        "access_key", "key_path", "action", "restriction_lane",
        "revoked_at_ms", "expiry_ms",
    ).agg(
        F.max((F.col("permission") == "DENY").cast("int")).alias("deny"),
        F.max(F.coalesce(grant, F.lit(False)).cast("int")).alias("grant"),
    )
    active = F.col("revoked_at_ms").isNull() & (F.col("expiry_ms") > NOW_MS)
    restr_ok = F.when(F.col("restriction_lane").isNull(), F.lit(True)).otherwise(
        (F.col("deny") == 0) & (F.col("grant") == 1)
    )
    return agg.select(
        "access_key",
        "key_path",
        "action",
        (active & restr_ok).alias("allowed"),
    )


_D_PATHS = " UNION ALL ".join(
    f"SELECT '{p}' AS key_path, '{a}' AS action"
    for p in OBJECT_PATHS
    for a in ACTIONS
)
_D_RULES = ", ".join(
    f"({lane}, '{pat}', '{perm}')" for lane, pat, perm in _C_RULES
)


@register(
    "s3_user_access_gate",
    oracle=f"""
    WITH {_CREDS_SQL},
    requests AS ({_D_PATHS}),
    rules(lane, pattern, permission) AS (VALUES {_D_RULES}),
    agg AS (
      SELECT c.access_key, r.key_path, r.action, c.restriction_lane,
             c.revoked_at_ms, c.expiry_ms,
             MAX(CASE WHEN u.permission = 'DENY' THEN 1 ELSE 0 END)
               AS deny_hit,
             MAX(CASE WHEN u.permission = 'WRITE'
                       OR (u.permission = 'READ' AND r.action = 'READ')
                      THEN 1 ELSE 0 END) AS grant_hit
      FROM creds c
      CROSS JOIN requests r
      LEFT JOIN rules u ON u.lane = c.restriction_lane
                       AND regexp_matches(r.key_path, u.pattern)
      GROUP BY ALL
    )
    SELECT access_key, key_path, action,
           revoked_at_ms IS NULL AND expiry_ms > {NOW_MS}
           AND (restriction_lane IS NULL
                OR (deny_hit = 0 AND grant_hit = 1)) AS allowed
    FROM agg
    """,
)
def s3_user_access_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The credential × object-path × action authorization matrix
    (the matrix IS the output, like perm_allows_matrix)."""
    requests = spark.createDataFrame(
        [(p, a) for p in OBJECT_PATHS for a in ACTIONS],
        "key_path string, action string",
    )
    return access_gate(load_user_access(spark, sf_dir), requests)


@register(
    "s3_user_access_revoke",
    oracle=f"""
    WITH {_CREDS_SQL}
    SELECT access_key, user_identity,
           CAST(COALESCE(revoked_at_ms, {NOW_MS}) AS BIGINT)
             AS revoked_at_ms,
           CASE WHEN revoked_at_ms IS NOT NULL THEN 'already_revoked'
                ELSE 'revoked' END AS outcome
    FROM creds WHERE custkey % 5 = 2
    """,
)
def s3_user_access_revoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revoke a batch of credentials (revoke_user_access.rs:92-120):
    idempotent — an already-revoked credential commits UNCHANGED (its
    original revoked_at survives); the rest stamp NOW. The batch is
    the ``custkey % 5 == 2`` lane (includes an already-revoked member
    at sf0.001 — asserted in tests)."""
    batch = load_user_access(spark, sf_dir).filter(F.col("custkey") % 5 == 2)
    already = F.col("revoked_at_ms").isNotNull()
    return batch.select(
        "access_key",
        "user_identity",
        F.coalesce(F.col("revoked_at_ms"), F.lit(NOW_MS))
        .cast("long")
        .alias("revoked_at_ms"),
        F.when(already, "already_revoked").otherwise("revoked").alias(
            "outcome"
        ),
    )
