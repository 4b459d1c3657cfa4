"""Usage counters + quota gate over the object catalog.

Reference: ``UsageCounters { buckets, objects, stored_blobs, stored_bytes,
logical_bytes, referenced_bytes }`` maintained per group / backend /
blob-hash plus a 64-way sharded global key
(``core/src/structs/usage.rs:162-233``, read-modify-write
``operations/src/usage_stats.rs:60-253``); quota gate
(``usage_stats.rs:268-436``); full-scan rebuild (``:596-1040``).

Here the counters are what the reference's *rebuild job* computes — a
full-scan aggregation over heads/versions — expressed as one groupBy.
Counter semantics:

- buckets            distinct buckets per group
- objects            distinct keys (heads)
- stored_blobs       distinct content addresses (dedup by blob_hash)
- stored_bytes       bytes actually stored: one size per distinct blob
- logical_bytes      sum of sizes over ALL versions
- referenced_bytes   sum of sizes over latest versions

Groups map to the key's source segment. Scale note: the reference shards
its hot global counter key 64 ways to dodge write contention; a shuffle
aggregation has no hot key, so the global rollup here is just the same
aggregate without GROUP BY — sharding is unnecessary by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions

INCOMING_BYTES = 50_000  # projected write size for the quota gate
QUOTA_BYTES = 300_000  # per-group ceiling


def _with_group(df: DataFrame) -> DataFrame:
    # usage accounts MATERIALIZED versions only: delete markers carry no
    # blob and no size (delete_object.rs UpdateUsage debits the blob,
    # never the tombstone). A deleted key's referenced_bytes goes to 0
    # because none of its materialized rows is latest.
    return df.filter(~F.col("is_delete_marker")).withColumn(
        "group_id", F.split_part(F.col("key"), F.lit("/"), F.lit(2))
    )


_D_BASE = f"""
    objects AS ({OBJECTS_ORACLE_SQL}),
    grouped AS (SELECT *, split_part(key, '/', 2) AS group_id FROM objects
                WHERE NOT is_delete_marker)
"""

_D_COUNTERS_BY_GROUP = f"""
    WITH {_D_BASE},
    per_blob AS (
      SELECT group_id, blob_hash, MIN(size) AS blob_size
      FROM grouped GROUP BY group_id, blob_hash
    ),
    blobs AS (
      SELECT group_id, COUNT(*) AS stored_blobs,
             CAST(SUM(blob_size) AS BIGINT) AS stored_bytes
      FROM per_blob GROUP BY group_id
    ),
    vers AS (
      SELECT group_id,
             COUNT(DISTINCT bucket) AS buckets,
             COUNT(DISTINCT key) AS objects,
             CAST(SUM(size) AS BIGINT) AS logical_bytes,
             CAST(SUM(CASE WHEN is_latest THEN size ELSE 0 END) AS BIGINT)
               AS referenced_bytes
      FROM grouped GROUP BY group_id
    )
    SELECT v.group_id, v.buckets, v.objects, b.stored_blobs, b.stored_bytes,
           v.logical_bytes, v.referenced_bytes
    FROM vers v JOIN blobs b USING (group_id)
"""


def _counters_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _with_group(load_object_versions(spark, sf_dir))
    per_blob = g.groupBy("group_id", "blob_hash").agg(
        F.min("size").alias("blob_size")
    )
    blobs = per_blob.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("stored_blobs"),
        F.sum("blob_size").cast("long").alias("stored_bytes"),
    )
    vers = g.groupBy("group_id").agg(
        F.countDistinct("bucket").alias("buckets"),
        F.countDistinct("key").alias("objects"),
        F.sum("size").cast("long").alias("logical_bytes"),
        F.sum(F.when(F.col("is_latest"), F.col("size")).otherwise(0))
        .cast("long")
        .alias("referenced_bytes"),
    )
    return vers.join(blobs, "group_id").select(
        "group_id",
        "buckets",
        "objects",
        "stored_blobs",
        "stored_bytes",
        "logical_bytes",
        "referenced_bytes",
    )


@register("usage_counters_by_group", oracle=_D_COUNTERS_BY_GROUP)
def usage_counters_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebuild job: all six counters per group in one full scan."""
    return _counters_by_group(spark, sf_dir)


@register(
    "usage_counters_global",
    oracle=f"""
    WITH {_D_BASE},
    per_blob AS (
      SELECT blob_hash, MIN(size) AS blob_size FROM grouped GROUP BY blob_hash
    )
    SELECT (SELECT COUNT(DISTINCT bucket) FROM grouped) AS buckets,
           (SELECT COUNT(DISTINCT key) FROM grouped) AS objects,
           (SELECT COUNT(*) FROM per_blob) AS stored_blobs,
           (SELECT CAST(SUM(blob_size) AS BIGINT) FROM per_blob) AS stored_bytes,
           (SELECT CAST(SUM(size) AS BIGINT) FROM grouped) AS logical_bytes,
           (SELECT CAST(SUM(CASE WHEN is_latest THEN size ELSE 0 END) AS BIGINT)
            FROM grouped) AS referenced_bytes
    """,
)
def usage_counters_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rollup — note stored_blobs/stored_bytes dedup ACROSS groups,
    so the global row is not the sum of the per-group rows (content
    shared between groups is stored once)."""
    g = _with_group(load_object_versions(spark, sf_dir))
    per_blob = g.groupBy("blob_hash").agg(F.min("size").alias("blob_size"))
    blobs = per_blob.agg(
        F.count(F.lit(1)).alias("stored_blobs"),
        F.sum("blob_size").cast("long").alias("stored_bytes"),
    )
    vers = g.agg(
        F.countDistinct("bucket").alias("buckets"),
        F.countDistinct("key").alias("objects"),
        F.sum("size").cast("long").alias("logical_bytes"),
        F.sum(F.when(F.col("is_latest"), F.col("size")).otherwise(0))
        .cast("long")
        .alias("referenced_bytes"),
    )
    return vers.crossJoin(blobs).select(
        "buckets",
        "objects",
        "stored_blobs",
        "stored_bytes",
        "logical_bytes",
        "referenced_bytes",
    )


@register(
    "usage_quota_gate",
    oracle=f"""
    WITH counters AS ({_D_COUNTERS_BY_GROUP})
    SELECT group_id, stored_bytes,
           stored_bytes + {INCOMING_BYTES} AS projected_bytes,
           CAST({QUOTA_BYTES} AS BIGINT) AS quota_bytes,
           stored_bytes + {INCOMING_BYTES} <= {QUOTA_BYTES} AS allowed
    FROM counters
    """,
)
def usage_quota_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota gate: projected usage (current + incoming write) vs ceiling —
    usage_stats.rs:268-436 as an aggregate + comparison."""
    c = _counters_by_group(spark, sf_dir)
    projected = F.col("stored_bytes") + F.lit(INCOMING_BYTES)
    return c.select(
        "group_id",
        "stored_bytes",
        projected.alias("projected_bytes"),
        F.lit(QUOTA_BYTES).cast("long").alias("quota_bytes"),
        (projected <= QUOTA_BYTES).alias("allowed"),
    )


# ---------------------------------------------------------- per-backend
# The reference keys counters per backend too — "Stored bytes on one
# backend", 64-way sharded against write contention
# (usage.rs:136-147,158-160: the stored_* fields are the physically
# meaningful ones on backend rows; BlobVersionState::Materialized stamps
# the backend the write routed to, blob.rs:833-836). Modeled routing:
# content-addressed blobs route by size — backend-(size % 3) — so equal
# content always lands on one backend, exactly like a routing rule keyed
# on the blob. Sharding is unnecessary here (shuffle aggregation has no
# hot key, same note as the global rollup).

_BACKEND_OF_SQL = "'backend-' || (size % 3)"


@register(
    "usage_counters_by_backend",
    oracle=f"""
    WITH {_D_BASE},
    backed AS (
      SELECT *, {_BACKEND_OF_SQL} AS backend FROM grouped
    ),
    per_blob AS (
      SELECT backend, blob_hash, MIN(size) AS blob_size
      FROM backed GROUP BY backend, blob_hash
    ),
    blobs AS (
      SELECT backend, COUNT(*) AS stored_blobs,
             CAST(SUM(blob_size) AS BIGINT) AS stored_bytes
      FROM per_blob GROUP BY backend
    ),
    vers AS (
      SELECT backend,
             COUNT(DISTINCT bucket) AS buckets,
             COUNT(DISTINCT key) AS objects,
             CAST(SUM(size) AS BIGINT) AS logical_bytes,
             CAST(SUM(CASE WHEN is_latest THEN size ELSE 0 END) AS BIGINT)
               AS referenced_bytes
      FROM backed GROUP BY backend
    )
    SELECT v.backend, v.buckets, v.objects, b.stored_blobs, b.stored_bytes,
           v.logical_bytes, v.referenced_bytes
    FROM vers v JOIN blobs b USING (backend)
    """,
)
def usage_counters_by_backend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six counter names per backend (usage.rs:136-147): the same
    one-pass rebuild aggregation keyed on the routing dimension. Blob
    dedup happens per backend — a blob stored on one backend is one
    stored_blobs row there regardless of how many keys reference it."""
    g = _with_group(load_object_versions(spark, sf_dir)).withColumn(
        "backend",
        F.concat(F.lit("backend-"), (F.col("size") % 3).cast("string")),
    )
    per_blob = g.groupBy("backend", "blob_hash").agg(
        F.min("size").alias("blob_size")
    )
    blobs = per_blob.groupBy("backend").agg(
        F.count(F.lit(1)).alias("stored_blobs"),
        F.sum("blob_size").cast("long").alias("stored_bytes"),
    )
    vers = g.groupBy("backend").agg(
        F.countDistinct("bucket").alias("buckets"),
        F.countDistinct("key").alias("objects"),
        F.sum("size").cast("long").alias("logical_bytes"),
        F.sum(F.when(F.col("is_latest"), F.col("size")).otherwise(0))
        .cast("long")
        .alias("referenced_bytes"),
    )
    return vers.join(blobs, "backend").select(
        "backend",
        "buckets",
        "objects",
        "stored_blobs",
        "stored_bytes",
        "logical_bytes",
        "referenced_bytes",
    )


_REALM_OF = "'realm-' || (ascii(substr(group_id, -1, 1)) % 3)"


@register(
    "usage_snapshot_realms",
    oracle=f"""
    WITH {_D_BASE},
    realmed AS (
      SELECT *, {_REALM_OF} AS realm_id FROM grouped
    ),
    per_blob AS (
      SELECT realm_id, blob_hash, MIN(size) AS blob_size
      FROM realmed GROUP BY realm_id, blob_hash
    ),
    blobs AS (
      SELECT realm_id, COUNT(*) AS stored_blobs,
             CAST(SUM(blob_size) AS BIGINT) AS stored_bytes
      FROM per_blob GROUP BY realm_id
    ),
    vers AS (
      SELECT realm_id,
             COUNT(DISTINCT group_id) AS groups,
             COUNT(DISTINCT key) AS objects,
             CAST(SUM(size) AS BIGINT) AS logical_bytes,
             CAST(SUM(CASE WHEN is_latest THEN size ELSE 0 END) AS BIGINT)
               AS referenced_bytes
      FROM realmed GROUP BY realm_id
    )
    SELECT v.realm_id, v.groups, v.objects, b.stored_blobs, b.stored_bytes,
           v.logical_bytes, v.referenced_bytes
    FROM vers v JOIN blobs b USING (realm_id)
    """,
)
def usage_snapshot_realms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage snapshot publish: the realm roll-up
    (usage_stats.rs:1044-1792). Blob dedup happens ACROSS the realm's
    groups — content shared between two groups of one realm is stored
    once — so the realm row is not the sum of its group rows. The 2 s
    debounce of the publisher is the same trigger as the watch plane;
    this is the aggregation it publishes."""
    g = _with_group(load_object_versions(spark, sf_dir)).withColumn(
        "realm_id",
        F.concat(
            F.lit("realm-"),
            (F.ascii(F.substring(F.col("group_id"), -1, 1)) % 3).cast(
                "string"
            ),
        ),
    )
    per_blob = g.groupBy("realm_id", "blob_hash").agg(
        F.min("size").alias("blob_size")
    )
    blobs = per_blob.groupBy("realm_id").agg(
        F.count(F.lit(1)).alias("stored_blobs"),
        F.sum("blob_size").cast("long").alias("stored_bytes"),
    )
    vers = g.groupBy("realm_id").agg(
        F.countDistinct("group_id").alias("groups"),
        F.countDistinct("key").alias("objects"),
        F.sum("size").cast("long").alias("logical_bytes"),
        F.sum(F.when(F.col("is_latest"), F.col("size")).otherwise(0))
        .cast("long")
        .alias("referenced_bytes"),
    )
    return vers.join(blobs, "realm_id").select(
        "realm_id",
        "groups",
        "objects",
        "stored_blobs",
        "stored_bytes",
        "logical_bytes",
        "referenced_bytes",
    )
