"""Glob-grant visibility queries over the object catalog.

Reference: ``operations/src/permission_rules.rs:13,28-55,118-150`` —
caller rules are compiled globs; DENY restrictions override allows. The
``visible`` operator (:mod:`aruna_spark.ops.globs`) is the reusable
authorization filter; here it gates object keys, the same shape that
gates search/listing reads in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.globs import glob_to_regex, visible
from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions

# (subject_id, glob, effect) — alice: a narrow grant minus a DENY subtree;
# bob: single-segment wildcards; root: the '**' superuser grant.
GRANTS = [
    ("alice", "data/src1/**", "allow"),
    ("alice", "data/src1/de/**", "deny"),
    ("bob", "data/*/en/*.txt", "allow"),
    ("root", "**", "allow"),
]

_COMPILED = [(s, glob_to_regex(g), e) for s, g, e in GRANTS]


def grants_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _COMPILED, "subject_id string, pattern string, effect string"
    )


_D_GRANTS = ", ".join(
    f"('{s}', '{p}', '{e}')" for s, p, e in _COMPILED
)


@register(
    "perm_visible_summary",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    latest AS (SELECT key FROM objects
               WHERE is_latest AND NOT is_delete_marker),
    grants(subject_id, pattern, effect) AS (VALUES {_D_GRANTS}),
    matched AS (
      SELECT l.key, g.subject_id, g.effect
      FROM latest l JOIN grants g ON regexp_matches(l.key, g.pattern)
    ),
    flags AS (
      SELECT key, subject_id,
             MAX(CASE WHEN effect = 'allow' THEN 1 ELSE 0 END) AS a,
             MAX(CASE WHEN effect = 'deny' THEN 1 ELSE 0 END) AS d
      FROM matched GROUP BY key, subject_id
    )
    SELECT subject_id, COUNT(*) AS n_visible,
           MIN(key) AS first_key, MAX(key) AS last_key
    FROM flags WHERE a = 1 AND d = 0
    GROUP BY subject_id
    """,
)
def perm_visible_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visible-key summary per caller under the glob grants (DENY wins)."""
    from aruna_spark.sources.objects import live_latest

    latest = live_latest(load_object_versions(spark, sf_dir)).select("key")
    vis = visible(latest, grants_df(spark))
    return vis.groupBy("subject_id").agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
    )


# ------------------------------------------------ the full allows ladder
# permission_rules.rs:110-157 — the single authorization decision every
# read path shares (operations/src/check_permissions.rs:17-19 is a thin
# single-path wrapper over exactly these rules — "Rule collection and
# evaluation live in permission_rules, so read paths that filter many
# paths at once share exactly these semantics"; its
# public-roles-read-only test is the public-WRITE-inert lane below):
#   - a matching DIRECT DENY denies outright;
#   - a PUBLIC role only ever grants READ (a public WRITE rule grants
#     nothing — the Everyone principal is read-only by construction);
#   - a direct READ satisfies required=READ; a direct WRITE satisfies
#     both (write implies read);
#   - token path RESTRICTIONS act as a whitelist ON TOP: when the
#     caller's token carries any, the path must ALSO match a
#     restriction of sufficient permission, and a restriction DENY
#     denies outright; with no restrictions the base decision stands.
# (subject, glob, permission, direct, public)
ALLOW_RULES = [
    ("alice", "data/src1/**", "READ", True, False),
    ("alice", "data/src1/de/**", "DENY", True, False),
    ("alice", "data/src2/**", "READ", False, True),  # public READ
    ("bob", "data/*/en/**", "WRITE", True, False),
    ("bob", "data/src3/**", "WRITE", False, True),  # public WRITE: inert
    ("carol", "**", "READ", True, False),
    ("root", "**", "WRITE", True, False),
]
# carol's token restrictions: src1 read-only, minus the de subtree
TOKEN_RESTRICTIONS = [
    ("carol", "data/src1/**", "READ"),
    ("carol", "data/src1/de/**", "DENY"),
]

_C_RULES = [
    (s, glob_to_regex(g), p, d, pub) for s, g, p, d, pub in ALLOW_RULES
]
_C_RESTR = [(s, glob_to_regex(g), p) for s, g, p in TOKEN_RESTRICTIONS]
_D_RULES = ", ".join(
    f"('{s}', '{g}', '{p}', {str(d).upper()}, {str(pub).upper()})"
    for s, g, p, d, pub in _C_RULES
)
_D_RESTR = ", ".join(f"('{s}', '{g}', '{p}')" for s, g, p in _C_RESTR)


def _allow_flags(paths: DataFrame, rules: DataFrame,
                 restrictions: DataFrame) -> DataFrame:
    """Per (key, subject_id): the rule/restriction aggregates BOTH
    required permissions read their verdicts from — one pass over the
    glob-matched cells instead of one per required level (r15: the
    READ and WRITE ladders only differ in which aggregate they test,
    so the matrix query was paying the whole match+aggregate pipeline
    twice)."""
    # r16: rules/restrictions are config-sized literal tables, but they
    # reach this helper through enough plumbing that the planner loses
    # the size estimate and demoted all three joins to sort-merge —
    # shuffling the corpus-sized (paths x subjects) frame three times.
    # Explicit broadcast hints keep the big side un-shuffled (the only
    # exchanges left are the two verdict aggregations).
    subjects = rules.select("subject_id").distinct()
    matched = paths.crossJoin(F.broadcast(subjects)).join(
        F.broadcast(rules.withColumnRenamed("subject_id", "__rs")),
        (F.col("subject_id") == F.col("__rs"))
        & F.regexp_like(F.col("key"), F.col("pattern")),
        "left",
    )
    grant_read = (
        (F.col("public") & (F.col("permission") == "READ"))
        | (F.col("direct") & (F.col("permission") == "READ"))
        | (F.col("direct") & (F.col("permission") == "WRITE"))
    )
    grant_write = F.col("direct") & (F.col("permission") == "WRITE")
    base = matched.groupBy("key", "subject_id").agg(
        F.max(
            (F.col("direct") & (F.col("permission") == "DENY")).cast("int")
        ).alias("deny"),
        F.max(F.coalesce(grant_read, F.lit(False)).cast("int")).alias(
            "grant_read"
        ),
        F.max(F.coalesce(grant_write, F.lit(False)).cast("int")).alias(
            "grant_write"
        ),
    )
    r = restrictions.withColumnRenamed("subject_id", "__ts")
    has_restr = restrictions.select(
        F.col("subject_id"), F.lit(True).alias("__has")
    ).distinct()
    return (
        base.join(
            F.broadcast(r),
            (F.col("subject_id") == F.col("__ts"))
            & F.regexp_like(F.col("key"), F.col("pattern")),
            "left",
        )
        .groupBy("key", "subject_id", "deny", "grant_read", "grant_write")
        .agg(
            F.max((F.col("permission") == "DENY").cast("int")).alias("rdeny"),
            F.max(
                (
                    (F.col("permission") == "READ")
                    | (F.col("permission") == "WRITE")
                ).cast("int")
            ).alias("rgrant_read"),
            F.max((F.col("permission") == "WRITE").cast("int")).alias(
                "rgrant_write"
            ),
        )
        .join(F.broadcast(has_restr), "subject_id", "left")
    )


def _allowed_col(required: str) -> F.Column:
    """The allowed verdict over :func:`_allow_flags` columns for one
    required level."""
    suffix = "read" if required == "READ" else "write"
    restr_ok = F.when(F.col("__has").isNull(), F.lit(True)).otherwise(
        (F.coalesce(F.col("rdeny"), F.lit(0)) == 0)
        & (F.coalesce(F.col(f"rgrant_{suffix}"), F.lit(0)) == 1)
    )
    return (
        (F.col("deny") == 0)
        & (F.col(f"grant_{suffix}") == 1)
        & restr_ok
    )


def allows(paths: DataFrame, rules: DataFrame, restrictions: DataFrame,
           required: str) -> DataFrame:
    """(key, subject_id, allowed) for one required permission."""
    return _allow_flags(paths, rules, restrictions).select(
        "key", "subject_id", _allowed_col(required).alias("allowed")
    )


@register(
    "perm_allows_matrix",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    latest AS (SELECT key FROM objects
               WHERE is_latest AND NOT is_delete_marker),
    rules(subject_id, pattern, permission, direct, public) AS
      (VALUES {_D_RULES}),
    restr(subject_id, pattern, permission) AS (VALUES {_D_RESTR}),
    subjects AS (SELECT DISTINCT subject_id FROM rules),
    reqs(required) AS (VALUES ('READ'), ('WRITE')),
    cells AS (SELECT l.key, s.subject_id, q.required
              FROM latest l CROSS JOIN subjects s CROSS JOIN reqs q),
    base AS (
      SELECT c.key, c.subject_id, c.required,
             MAX(CASE WHEN r.direct AND r.permission = 'DENY'
                      THEN 1 ELSE 0 END) AS deny,
             MAX(CASE WHEN (r.public AND r.permission = 'READ'
                            AND c.required = 'READ')
                       OR (r.direct AND r.permission = 'READ'
                           AND c.required = 'READ')
                       OR (r.direct AND r.permission = 'WRITE')
                      THEN 1 ELSE 0 END) AS grnt
      FROM cells c
      LEFT JOIN rules r ON r.subject_id = c.subject_id
                       AND regexp_matches(c.key, r.pattern)
      GROUP BY 1, 2, 3
    ),
    rbase AS (
      SELECT b.*,
             MAX(CASE WHEN t.permission = 'DENY' THEN 1 ELSE 0 END) AS rdeny,
             MAX(CASE WHEN (t.permission = 'READ' AND b.required = 'READ')
                       OR t.permission = 'WRITE' THEN 1 ELSE 0 END) AS rgrant,
             MAX(CASE WHEN b.subject_id IN
                       (SELECT subject_id FROM restr) THEN 1 ELSE 0 END)
               AS has_restr
      FROM base b
      LEFT JOIN restr t ON t.subject_id = b.subject_id
                       AND regexp_matches(b.key, t.pattern)
      GROUP BY b.key, b.subject_id, b.required, b.deny, b.grnt
    )
    SELECT subject_id, required,
           CAST(SUM(CASE WHEN deny = 0 AND grnt = 1
                          AND (has_restr = 0
                               OR (rdeny = 0 AND rgrant = 1))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           MIN(CASE WHEN deny = 0 AND grnt = 1
                     AND (has_restr = 0 OR (rdeny = 0 AND rgrant = 1))
                    THEN key END) AS first_key
    FROM rbase
    GROUP BY 1, 2
    """,
)
def perm_allows_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full allows ladder over the live catalog for every caller
    and both required permissions: public roles grant READ only,
    direct DENY wins outright, WRITE implies READ, and carol's token
    restrictions whitelist src1-minus-de on top of her realm-wide
    READ role. Summarized per (caller, required)."""
    from aruna_spark.sources.objects import live_latest

    latest = live_latest(load_object_versions(spark, sf_dir)).select("key")
    rules = spark.createDataFrame(
        _C_RULES,
        "subject_id string, pattern string, permission string,"
        " direct boolean, public boolean",
    )
    restr = spark.createDataFrame(
        _C_RESTR, "subject_id string, pattern string, permission string"
    )
    # ONE match+aggregate pass for both required levels (r15): the
    # flags frame carries read- and write-specific aggregates, and the
    # two-row unpivot replaces the union of two full ladder pipelines.
    flags = _allow_flags(latest, rules, restr)
    both = flags.select(
        "key",
        "subject_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("READ").alias("required"),
                    _allowed_col("READ").alias("allowed"),
                ),
                F.struct(
                    F.lit("WRITE").alias("required"),
                    _allowed_col("WRITE").alias("allowed"),
                ),
            )
        ).alias("__rq"),
    ).select(
        "key",
        "subject_id",
        F.col("__rq.required").alias("required"),
        F.col("__rq.allowed").alias("allowed"),
    )
    return both.groupBy("subject_id", "required").agg(
        F.sum(F.col("allowed").cast("int")).cast("long").alias("n_allowed"),
        F.min(F.when(F.col("allowed"), F.col("key"))).alias("first_key"),
    )
