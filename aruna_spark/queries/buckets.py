"""Bucket plane: ListBuckets + GetBucketInfo as catalog queries.

Reference surface:

- ``operations/src/s3/list_buckets.rs:36-62,98-165`` — ListBuckets:
  scan the bucket keyspace in name order, keep the caller's group's
  buckets (group_id filter, rs:127-129), prefix filter at the scan,
  keyset continuation_token = the last returned name (rs:139-145:
  token minted from ``matches[max-1]`` then truncate), default page
  10,000.
- ``operations/src/s3/get_bucket_info.rs:59-90`` — GetBucketInfo: point
  read of one BucketInfo record.
- ``core/src/structs/blob.rs:475-484`` — BucketInfo { group_id,
  created_at, created_by, cors, replication, storage_routing }; the
  info surface is extended here with live object/version/byte roll-ups
  over the catalog (the counts a console's bucket list shows).

Modeled bucket relation (deterministic, derived from the corpus):

- ``corpus``  — the materialized object catalog, group ``grp-main``
- ``staging`` — the by-reference catalog, group ``grp-main``
- ``archive-{source}`` per distinct document source — registered but
  EMPTY buckets; group ``grp-main`` when ``length(source)`` is even,
  else ``grp-other`` (so the group filter is exercised)

Scale shape: buckets are a small dimension (the reference clamps the
scan at 10k); roll-ups are ONE map-side-combinable groupBy over the
catalog's version rows keyed on the partition-pruned bucket column,
then a broadcast join onto the dimension. Page derivation follows the
staging-listing template: TakeOrderedAndProject head + bounded_rank,
never a global unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    REFERENCES_ORACLE_SQL,
    load_object_versions,
    load_reference_versions,
    reference_as_versions,
)

BUCKET_COLS = ("name", "group_id", "created_at", "created_by")


def load_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket keyspace: (name, group_id, created_at, created_by)."""
    static = spark.createDataFrame(
        [("corpus", "grp-main", 100, "admin"), ("staging", "grp-main", 101, "admin")],
        "name string, group_id string, created_at int, created_by string",
    )
    archives = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .select(
            F.concat(F.lit("archive-"), F.col("source")).alias("name"),
            F.when(F.length("source") % 2 == 0, F.lit("grp-main"))
            .otherwise(F.lit("grp-other"))
            .alias("group_id"),
            (F.lit(200) + F.substring("source", 4, 10).cast("int")).alias(
                "created_at"
            ),
            F.lit("admin").alias("created_by"),
        )
    )
    # The dimension is config-sized (2 + one row per distinct source)
    # but derives from a corpus distinct; consumers reference it up to
    # three times (page head, total, token) — materialize per call so
    # the corpus scan runs once (localCheckpoint: nothing outlives the
    # invocation).
    return static.unionByName(archives).localCheckpoint(eager=True, storageLevel=DISK_ONLY)


def bucket_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket live roll-ups over the FULL catalog (materialized +
    marker + reference rows): object_count (live heads), version_count
    (every version row incl. markers), total_bytes (live head bytes).
    One groupBy on the bucket column — map-side combinable, and on a
    bucket-partitioned physical layout it's a metadata-sized shuffle."""
    allv = load_object_versions(spark, sf_dir).unionByName(
        reference_as_versions(load_reference_versions(spark, sf_dir))
    )
    live = F.col("is_latest") & ~F.col("is_delete_marker")
    return allv.groupBy(F.col("bucket").alias("name")).agg(
        F.sum(live.cast("int")).cast("long").alias("object_count"),
        F.count(F.lit(1)).cast("long").alias("version_count"),
        F.sum(F.when(live, F.col("size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("total_bytes"),
    )


def list_buckets(
    buckets: DataFrame,
    rollups: DataFrame,
    group_id: str,
    prefix: str = "",
    continuation_token: str | None = None,
    max_buckets: int = 10_000,
) -> DataFrame:
    """One ListBuckets page: the group's buckets under the prefix in
    name order after the token, with info + roll-up columns and the
    reference's envelope (is_truncated, continuation_token = last
    returned name)."""
    from aruna_spark.ops.pagination import bounded_rank

    m = buckets.filter(F.col("group_id") == group_id)
    if prefix:
        m = m.filter(F.col("name").startswith(prefix))
    if continuation_token is not None:
        m = m.filter(F.col("name") > continuation_token)
    head = m.orderBy("name").limit(max_buckets + 1)
    ranked = bounded_rank(head, [F.col("name")], rank_name="__rn")
    total = m.agg(F.count(F.lit(1)).alias("__total"))
    truncated = F.col("__total") > max_buckets
    # the keyset token is the LAST RETURNED name (list_buckets.rs:
    # 139-145) — a one-row aggregate over the bounded head, never a
    # global window
    tok = ranked.filter(F.col("__rn") == max_buckets).agg(
        F.max("name").alias("__last")
    )
    page = (
        ranked.filter(F.col("__rn") <= max_buckets)
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(tok))
        .join(F.broadcast(rollups), "name", "left")
    )
    last_name = F.col("__last")
    return page.select(
        "name",
        "group_id",
        "created_at",
        "created_by",
        F.coalesce("object_count", F.lit(0)).cast("long").alias("object_count"),
        F.coalesce("version_count", F.lit(0)).cast("long").alias(
            "version_count"
        ),
        F.coalesce("total_bytes", F.lit(0)).cast("long").alias("total_bytes"),
        truncated.alias("is_truncated"),
        F.when(truncated, last_name).alias("next_token"),
    )


_D_BUCKETS = """
    SELECT 'corpus' AS name, 'grp-main' AS group_id, 100 AS created_at,
           'admin' AS created_by
    UNION ALL
    SELECT 'staging', 'grp-main', 101, 'admin'
    UNION ALL
    SELECT DISTINCT 'archive-' || source,
           CASE WHEN length(source) % 2 = 0 THEN 'grp-main'
                ELSE 'grp-other' END,
           200 + CAST(substr(source, 4) AS INT),
           'admin'
    FROM documents
"""

_D_ROLLUPS = f"""
    SELECT bucket AS name,
           CAST(SUM(CASE WHEN is_latest AND NOT is_delete_marker
                    THEN 1 ELSE 0 END) AS BIGINT) AS object_count,
           CAST(COUNT(*) AS BIGINT) AS version_count,
           CAST(SUM(CASE WHEN is_latest AND NOT is_delete_marker
                    THEN size ELSE 0 END) AS BIGINT) AS total_bytes
    FROM (
      SELECT bucket, is_latest, is_delete_marker, size FROM objects
      UNION ALL
      SELECT bucket, is_latest, FALSE, cached_length FROM refs
    )
    GROUP BY bucket
"""


@register(
    "s3_list_buckets",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    refs AS ({REFERENCES_ORACLE_SQL}),
    buckets AS ({_D_BUCKETS}),
    rollups AS ({_D_ROLLUPS}),
    m AS (SELECT * FROM buckets WHERE group_id = 'grp-main'),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY name) AS rn FROM m
    ),
    tot AS (SELECT COUNT(*) AS n FROM m),
    last4 AS (SELECT name FROM ranked WHERE rn = 4)
    SELECT r.name, r.group_id, r.created_at, r.created_by,
           COALESCE(ro.object_count, 0) AS object_count,
           COALESCE(ro.version_count, 0) AS version_count,
           COALESCE(ro.total_bytes, 0) AS total_bytes,
           (SELECT n FROM tot) > 4 AS is_truncated,
           CASE WHEN (SELECT n FROM tot) > 4
                THEN (SELECT name FROM last4) END AS next_token
    FROM ranked r LEFT JOIN rollups ro USING (name)
    WHERE r.rn <= 4
    """,
)
def s3_list_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First ListBuckets page for ``grp-main`` at max_buckets=4: the
    archive buckets lead in name order, other groups' buckets are
    filtered out (list_buckets.rs:127-129), the page truncates with the
    keyset token minted from the last returned name (rs:139-145), and
    every row carries its BucketInfo + live roll-ups."""
    return list_buckets(
        load_buckets(spark, sf_dir),
        bucket_rollups(spark, sf_dir),
        group_id="grp-main",
        max_buckets=4,
    )


@register(
    "s3_bucket_info",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    refs AS ({REFERENCES_ORACLE_SQL}),
    buckets AS ({_D_BUCKETS}),
    rollups AS ({_D_ROLLUPS})
    SELECT b.name, b.group_id, b.created_at, b.created_by,
           COALESCE(ro.object_count, 0) AS object_count,
           COALESCE(ro.version_count, 0) AS version_count,
           COALESCE(ro.total_bytes, 0) AS total_bytes
    FROM buckets b LEFT JOIN rollups ro USING (name)
    WHERE b.name IN ('corpus', 'staging')
    """,
)
def s3_bucket_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetBucketInfo for the two data-bearing buckets: the point-read
    BucketInfo record (get_bucket_info.rs:59-90) joined with the live
    roll-ups — the corpus bucket counts materialized live heads only
    (markers hide, references live in staging)."""
    buckets = load_buckets(spark, sf_dir).filter(
        F.col("name").isin("corpus", "staging")
    )
    return buckets.join(
        F.broadcast(bucket_rollups(spark, sf_dir)), "name", "left"
    ).select(
        "name",
        "group_id",
        "created_at",
        "created_by",
        F.coalesce("object_count", F.lit(0)).cast("long").alias("object_count"),
        F.coalesce("version_count", F.lit(0)).cast("long").alias(
            "version_count"
        ),
        F.coalesce("total_bytes", F.lit(0)).cast("long").alias("total_bytes"),
    )


# ------------------------------------------------------- bucket search
# operations/src/s3/search_buckets.rs — substring search over the
# bucket keyspace (result cap 50, scan cap 1,000 — rs:83-84), each
# candidate gated by a READ permission check on its bucket permission
# path (blob_bucket_permission_path) BEFORE it can hit, then enriched
# with the owning group's display name. The limit counts AUTHORIZED
# hits in scan (name) order.
SEARCH_RESULT_CAP = 50  # rs:83
SEARCH_SCAN_CAP = 1_000  # rs:84
_SEARCH_NODE = "node-00"  # the serving node in the permission path

# the searcher reads grp-main's data plane, minus one carved bucket
SEARCH_GRANTS = [
    ("searcher", "/realm-2/g/grp-main/data/**", "READ", True, False),
    ("searcher", "**/archive-src1", "DENY", True, False),
]


def search_buckets(
    buckets: DataFrame, query: str, limit: int
) -> DataFrame:
    """Authorized substring hits in name order, capped at ``limit``."""
    from aruna_spark.ops.globs import glob_to_regex
    from aruna_spark.queries.permissions import allows

    spark = buckets.sparkSession
    rules = spark.createDataFrame(
        [(s, glob_to_regex(g), p, d, pub)
         for s, g, p, d, pub in SEARCH_GRANTS],
        "subject_id string, pattern string, permission string,"
        " direct boolean, public boolean",
    )
    no_restr = spark.createDataFrame(
        [], "subject_id string, pattern string, permission string"
    )
    cand = buckets.filter(F.col("name").contains(query)).select(
        F.concat(
            F.lit("/realm-2/g/"),
            F.col("group_id"),
            F.lit(f"/data/{_SEARCH_NODE}/"),
            F.col("name"),
        ).alias("key"),
        "name",
        "group_id",
        "created_at",
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # config-bounded; the gate and the hit join both read it (r15)
    decided = allows(
        cand.select("key"), rules, no_restr, "READ"
    ).filter("allowed")
    hits = cand.join(F.broadcast(decided), "key").select(
        "name", "group_id", "created_at"
    )
    limit = min(int(limit), SEARCH_RESULT_CAP)
    # the bucket keyspace is config-bounded: rank via one sorted array
    # (no global window) and keep the first `limit` authorized hits
    top = hits.agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("name", "group_id", "created_at"))
            ),
            1,
            limit,
        ).alias("top")
    )
    return top.select(F.explode("top").alias("h")).select(
        F.concat(
            F.lit(f"arn:aruna:s3:::{_SEARCH_NODE}:"), F.col("h.name")
        ).alias("arn"),
        F.col("h.name").alias("bucket"),
        F.col("h.group_id").alias("group_id"),
        F.concat(F.lit("Group "), F.col("h.group_id")).alias("group_name"),
        F.col("h.created_at").alias("created_at"),
    )


@register(
    "s3_search_buckets",
    oracle=f"""
    WITH buckets AS (
      SELECT 'corpus' AS name, 'grp-main' AS group_id, 100 AS created_at
      UNION ALL
      SELECT 'staging', 'grp-main', 101
      UNION ALL
      SELECT DISTINCT 'archive-' || source,
             CASE WHEN length(source) % 2 = 0 THEN 'grp-main'
                  ELSE 'grp-other' END,
             200 + CAST(substr(source, 4) AS INT)
      FROM documents
    ),
    cand AS (
      SELECT name, group_id, created_at,
             '/realm-2/g/' || group_id || '/data/{_SEARCH_NODE}/' || name
               AS key
      FROM buckets WHERE name LIKE '%a%'
    ),
    authz AS (
      SELECT * FROM cand
      WHERE group_id = 'grp-main' AND name NOT LIKE '%archive-src1'
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY name, group_id, created_at)
               AS rnk
      FROM authz
    )
    SELECT 'arn:aruna:s3:::{_SEARCH_NODE}:' || name AS arn,
           name AS bucket, group_id,
           'Group ' || group_id AS group_name, created_at
    FROM ranked WHERE rnk <= 5
    """,
)
def s3_search_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SearchBuckets: substring candidates, the per-bucket READ gate
    (grp-main's data plane minus the carved archive-src1), group-name
    enrichment, and the authorized-hit cap in scan order. The oracle
    states the authorization OUTCOME in closed form (group + carve)
    rather than re-running the glob engine — independent mechanisms."""
    return search_buckets(load_buckets(spark, sf_dir), "a", 5)
