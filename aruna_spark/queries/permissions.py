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
