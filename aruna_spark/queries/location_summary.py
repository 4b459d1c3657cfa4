"""Replication location summary: for each object head, where copies
SHOULD exist (enabled outbound sync relationships, with the key each
copy lands under) and which copies are still only QUEUED
(``operations/src/replication/location_summary/``). The replication
transport itself is excluded orchestration; this is the query plane a
"where are my replicas" dashboard reads.

Reference surface:

- ``location_summary/relationships.rs:75-96`` (``target_of``) — a
  relationship names a destination iff: mode is Continuous or
  Reference, state Enabled, the SOURCE is this node and this bucket,
  a delete marker only when ``replicate_deletes``, and the target is
  not the local node. Two relationships to one node with different
  mappings are two destinations.
- ``version_replication.rs:473-494`` (``map_sync_key``) — the copy's
  key: strip the source prefix (no match → no destination), then join
  the target prefix with exactly-one-``/`` semantics (``p/`` + ``/s``
  → ``p/`` + ``s``; ``p`` + ``s`` → ``p/s``; bare suffix trims
  leading ``/``).
- ``location_summary/queued.rs:26-33`` — nodes holding a QUEUED
  replication job for the version are the copies a caller must see as
  pending: no location record exists anywhere yet, so nothing else
  reports them.

Spark mapping: object heads × a broadcast relationship table (the
config is per-realm and tiny), the admission rule and key mapping as
pure CASE/substr columns, one groupBy per head for the target set,
and a left join against the queued-job relation. At 100 TB the heads
side is the scan and everything else is broadcast — no shuffle except
the per-head aggregation, which is map-side combinable.

Fixture: local node ``node1``; eight relationship lanes (admitted:
no-prefix Continuous→node2, ``data/src1/``→``archive`` Reference
(deletes OFF), ``data/src2``→``m/`` Continuous — each exercising a
different map_sync_key branch; excluded: disabled, oneshot mode,
foreign source node, self target, other source bucket). Queued jobs:
``doc_id % 6 == 5`` → node4, ``doc_id % 6 == 2`` → node5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    load_object_versions,
)

LOCAL_NODE = "node1"

# (rel_id, mode, state, src_node, src_bucket, src_prefix, tgt_node,
#  tgt_bucket, tgt_prefix, replicate_deletes)
SYNC_RELATIONSHIPS = [
    ("rel-a", "continuous", "enabled", "node1", "corpus", None,
     "node2", "backup", None, True),
    ("rel-b", "reference", "enabled", "node1", "corpus", "data/src1/",
     "node3", "mirror", "archive", False),
    ("rel-c", "continuous", "enabled", "node1", "corpus", "data/src2",
     "node2", "backup2", "m/", True),
    ("rel-d", "continuous", "disabled", "node1", "corpus", None,
     "node5", "cold", None, True),
    ("rel-e", "oneshot", "enabled", "node1", "corpus", None,
     "node5", "cold", None, True),
    ("rel-f", "continuous", "enabled", "node2", "corpus", None,
     "node5", "cold", None, True),
    ("rel-g", "continuous", "enabled", "node1", "corpus", None,
     "node1", "loop", None, True),
    ("rel-h", "continuous", "enabled", "node1", "staging", None,
     "node5", "cold", None, True),
]

_REL_SCHEMA = (
    "rel_id string, mode string, state string, src_node string,"
    " src_bucket string, src_prefix string, tgt_node string,"
    " tgt_bucket string, tgt_prefix string, replicate_deletes boolean"
)


def relationships_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SYNC_RELATIONSHIPS, _REL_SCHEMA)


def mapped_key(key: F.Column) -> F.Column:
    """``map_sync_key`` as columns; NULL when the source prefix does
    not match (→ no destination)."""
    sp, tp = F.col("src_prefix"), F.col("tgt_prefix")
    suffix = F.when(sp.isNull(), key).when(
        key.startswith(sp), F.expr("substring(key, length(src_prefix) + 1)")
    )
    return F.when(suffix.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(
            tp.isNull(), F.regexp_replace(suffix, r"^/+", "")
        )
        .when(
            tp.endswith("/") & suffix.startswith("/"),
            F.concat(tp, F.substring(suffix, 2, 1_000_000)),
        )
        .when(
            ~tp.endswith("/") & (suffix != "") & ~suffix.startswith("/"),
            F.concat(tp, F.lit("/"), suffix),
        )
        .otherwise(F.concat(tp, suffix))
    )


def queued_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pending replication jobs keyed by object key → the node the
    queued copy will land on."""
    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    key = F.concat(
        F.lit("data/"), F.col("source"), F.lit("/"), F.col("lang"),
        F.lit("/doc-"), k.cast("string"), F.lit(".txt"),
    )
    return d.filter((k % 6 == 5) | (k % 6 == 2)).select(
        key.alias("key"),
        F.when(k % 6 == 5, "node4").otherwise("node5").alias(
            "queued_node"
        ),
    )


def _duck_rels() -> str:
    rows = ", ".join(
        "({})".format(
            ", ".join(
                "NULL" if v is None
                else ("TRUE" if v is True else "FALSE") if isinstance(v, bool)
                else f"'{v}'"
                for v in row
            )
        )
        for row in SYNC_RELATIONSHIPS
    )
    return (
        "rels(rel_id, mode, state, src_node, src_bucket, src_prefix,"
        f" tgt_node, tgt_bucket, tgt_prefix, replicate_deletes) AS"
        f" (VALUES {rows})"
    )


@register(
    "replication_location_summary",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}), {_duck_rels()},
    heads AS (
      SELECT bucket, key, version_id, is_delete_marker
      FROM objects WHERE is_latest
    ),
    admitted AS (
      SELECT h.key, h.is_delete_marker, r.tgt_node, r.tgt_bucket,
             CASE
               WHEN s IS NULL THEN NULL
               WHEN r.tgt_prefix IS NULL
                 THEN regexp_replace(s, '^/+', '')
               WHEN r.tgt_prefix LIKE '%/' AND s LIKE '/%'
                 THEN r.tgt_prefix || substring(s, 2)
               WHEN r.tgt_prefix NOT LIKE '%/' AND s <> ''
                    AND s NOT LIKE '/%'
                 THEN r.tgt_prefix || '/' || s
               ELSE r.tgt_prefix || s
             END AS tgt_key
      FROM heads h
      JOIN rels r
        ON r.mode IN ('continuous', 'reference')
       AND r.state = 'enabled'
       AND r.src_node = '{LOCAL_NODE}'
       AND r.src_bucket = h.bucket
       AND r.tgt_node <> '{LOCAL_NODE}'
       AND (NOT h.is_delete_marker OR r.replicate_deletes)
      CROSS JOIN LATERAL (SELECT CASE
            WHEN r.src_prefix IS NULL THEN h.key
            WHEN starts_with(h.key, r.src_prefix)
              THEN substring(h.key, len(r.src_prefix) + 1)
          END AS s) x
    ),
    targets AS (
      SELECT key, is_delete_marker,
             string_agg(DISTINCT tgt_node || ':' || tgt_bucket || '/' ||
                        tgt_key, ',' ORDER BY (tgt_node || ':' ||
                        tgt_bucket || '/' || tgt_key)) AS rel_targets_csv,
             CAST(COUNT(*) AS BIGINT) AS n_expected
      FROM admitted WHERE tgt_key IS NOT NULL
      GROUP BY key, is_delete_marker
    ),
    queued AS (
      SELECT 'data/' || source || '/' || lang || '/doc-' || doc_id ||
               '.txt' AS key,
             string_agg(DISTINCT CASE WHEN doc_id % 6 = 5 THEN 'node4'
                        ELSE 'node5' END, ',') AS queued_nodes_csv,
             CAST(COUNT(*) AS BIGINT) AS n_queued
      FROM documents WHERE doc_id % 6 IN (2, 5)
      GROUP BY 1
    )
    SELECT h.key, h.is_delete_marker,
           t.rel_targets_csv,
           CAST(COALESCE(t.n_expected, 0) AS BIGINT) AS n_expected,
           q.queued_nodes_csv,
           CAST(COALESCE(q.n_queued, 0) AS BIGINT) AS n_queued
    FROM heads h
    LEFT JOIN targets t ON t.key = h.key
    LEFT JOIN queued q ON q.key = h.key
    """,
)
def replication_location_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per object head: the admitted replica destinations (node,
    bucket, mapped key) and the still-queued pending copies."""
    heads = load_object_versions(spark, sf_dir).filter(
        F.col("is_latest")
    ).select("bucket", "key", "is_delete_marker")
    rels = relationships_df(spark)
    admitted = heads.join(
        F.broadcast(rels),
        (F.col("mode").isin("continuous", "reference"))
        & (F.col("state") == "enabled")
        & (F.col("src_node") == LOCAL_NODE)
        & (F.col("src_bucket") == F.col("bucket"))
        & (F.col("tgt_node") != LOCAL_NODE)
        & (~F.col("is_delete_marker") | F.col("replicate_deletes")),
        "inner",
    ).withColumn("tgt_key", mapped_key(F.col("key")))
    targets = (
        admitted.filter(F.col("tgt_key").isNotNull())
        .select(
            "key",
            "is_delete_marker",
            F.concat_ws(
                ":", F.col("tgt_node"),
                F.concat_ws("/", F.col("tgt_bucket"), F.col("tgt_key")),
            ).alias("t"),
        )
        .groupBy("key", "is_delete_marker")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("t"))).alias(
                "rel_targets_csv"
            ),
            F.count(F.lit(1)).alias("n_expected"),
        )
    )
    queued = (
        queued_jobs(spark, sf_dir)
        .groupBy("key")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("queued_node"))
            ).alias("queued_nodes_csv"),
            F.count(F.lit(1)).alias("n_queued"),
        )
    )
    return (
        heads.join(
            targets.drop("is_delete_marker"), "key", "left"
        )
        .join(F.broadcast(queued), "key", "left")
        .select(
            "key",
            "is_delete_marker",
            "rel_targets_csv",
            F.coalesce(F.col("n_expected"), F.lit(0))
            .cast("long")
            .alias("n_expected"),
            "queued_nodes_csv",
            F.coalesce(F.col("n_queued"), F.lit(0))
            .cast("long")
            .alias("n_queued"),
        )
    )
