"""S3 object lifecycle: DeleteObject(s), delete markers, and the
marker-aware after-state — set algebra over the versions table.

The reference implements delete as a transactional state machine
(``operations/src/s3/delete_object.rs`` — 1,638 LoC; batch form
``delete_objects.rs``) over the blob keyspaces, with the version state
``Materialized | Reference | Deleted`` (``core/src/structs/blob.rs:
829-843``). Re-expressed Spark-first, one delete batch is two set
operations over the versions relation:

- **unversioned delete** (no version_id) = append a DELETE MARKER as
  the key's new latest version (the ``write_tombstone`` path,
  ``delete_object.rs:245-248``): a tombstone row with no size / etag /
  blob_hash whose version_idx lands past the key's current max — even
  past an existing marker (S3 stacks markers), and at idx 0 for a key
  that never existed (S3 writes a marker there too);
- **versioned delete** (explicit version_id) = permanently REMOVE that
  version row (the ``delete_target_version`` path): the head pointer
  transitions to the highest remaining version — which may itself be a
  marker — and removing a key's only version removes the key entirely.

Listings honor markers exactly like the reference: ListObjectsV2 hides
marker heads (``list_objects_v2.rs:454,510`` skip Deleted), and
ListObjectVersions shows them as DeleteMarker items
(``list_object_versions.rs`` ``ListObjectVersionsItem``).

Scale shape: a delete batch is a REQUEST batch — the S3 DeleteObjects
API caps it at 1,000 keys — so it broadcasts by contract (unlike a
corpus-derived relation): the removal is a broadcast anti-join, the
marker append reads only the touched keys' histories (broadcast
semi-join prune before the groupBy), and the ``is_latest`` recompute
windows ONLY the touched keys. The untouched catalog is never
shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    VERSION_COLS,
    load_object_versions,
)

_DATA_COLS = (
    "bucket",
    "key",
    "version_idx",
    "version_id",
    "size",
    "etag",
    "blob_hash",
    "is_delete_marker",
)


def apply_deletes(versions: DataFrame, deletes: DataFrame) -> DataFrame:
    """Apply a delete batch to the versions table → new versions table.

    ``deletes`` carries (bucket, key, want_version_id): NULL
    want_version_id appends a delete marker; a concrete one removes
    that version. ``is_latest`` is recomputed for touched keys only.
    """
    vd = deletes.filter(F.col("want_version_id").isNotNull()).select(
        "bucket", "key", F.col("want_version_id").alias("version_id")
    )
    md = (
        deletes.filter(F.col("want_version_id").isNull())
        .select("bucket", "key")
        .distinct()
    )
    kept = versions.join(
        F.broadcast(vd), ["bucket", "key", "version_id"], "left_anti"
    )
    prior = (
        kept.join(F.broadcast(md), ["bucket", "key"], "left_semi")
        .groupBy("bucket", "key")
        .agg(F.max("version_idx").alias("__pm"))
    )
    markers = md.join(prior, ["bucket", "key"], "left").select(
        "bucket",
        "key",
        (F.coalesce(F.col("__pm"), F.lit(-1)) + 1).alias("version_idx"),
        F.concat(
            F.lit("v"), (F.coalesce(F.col("__pm"), F.lit(-1)) + 1).cast("string")
        ).alias("version_id"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("blob_hash"),
        F.lit(True).alias("is_delete_marker"),
    )
    unioned = kept.select(*_DATA_COLS).unionByName(markers)
    touched = deletes.select("bucket", "key").distinct()
    untouched = kept.join(
        F.broadcast(touched), ["bucket", "key"], "left_anti"
    ).select(*VERSION_COLS)
    w = Window.partitionBy("bucket", "key")
    recomputed = (
        unioned.join(F.broadcast(touched), ["bucket", "key"], "left_semi")
        .withColumn(
            "is_latest", F.col("version_idx") == F.max("version_idx").over(w)
        )
        .select(*VERSION_COLS)
    )
    return untouched.unionByName(recomputed)


def delete_results(versions: DataFrame, deletes: DataFrame) -> DataFrame:
    """Per-delete result rows — the route envelope
    (``DeleteObjectResult { version_id, delete_marker }``,
    delete_object.rs:120-124):

    - unversioned: the NEW marker's version_id, ``delete_marker`` true;
    - versioned: the removed version's id, ``delete_marker`` = whether
      the REMOVED version was itself a marker (S3's response header
      semantics), status 404 when the named version does not exist
      (``DeleteObjectError::NoSuchVersion``).
    """
    md = deletes.filter(F.col("want_version_id").isNull())
    vd = deletes.filter(F.col("want_version_id").isNotNull())
    prior = (
        versions.join(
            F.broadcast(md.select("bucket", "key").distinct()),
            ["bucket", "key"],
            "left_semi",
        )
        .groupBy("bucket", "key")
        .agg(F.max("version_idx").alias("__pm"))
    )
    marker_rows = md.join(prior, ["bucket", "key"], "left").select(
        "bucket",
        "key",
        F.concat(
            F.lit("v"), (F.coalesce(F.col("__pm"), F.lit(-1)) + 1).cast("string")
        ).alias("version_id"),
        F.lit(True).alias("delete_marker"),
        F.lit(204).alias("status"),
    )
    target = versions.select(
        "bucket",
        "key",
        F.col("version_id").alias("want_version_id"),
        F.col("is_delete_marker").alias("__was_marker"),
    )
    versioned_rows = vd.join(
        target, ["bucket", "key", "want_version_id"], "left"
    ).select(
        "bucket",
        "key",
        F.col("want_version_id").alias("version_id"),
        F.coalesce(F.col("__was_marker"), F.lit(False)).alias(
            "delete_marker"
        ),
        F.when(F.col("__was_marker").isNull(), F.lit(404))
        .otherwise(F.lit(204))
        .alias("status"),
    )
    return marker_rows.unionByName(versioned_rows)


# -- deterministic delete batch ----------------------------------------------
# doc_id % 17 == 1 → unversioned delete (marker append; ids ≡ 3 mod 13
# exercise marker STACKING on already-deleted keys);
# doc_id % 17 == 2 → versioned delete of 'v0' (ids with doc_id % 3 == 0
# remove their ONLY materialized version; ids ≡ 3 mod 13 leave the
# base marker as the remaining head).

def _delete_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 17).isin(1, 2)
    )
    return docs.select(
        F.lit("corpus").alias("bucket"),
        F.concat(
            F.lit("data/"),
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".txt"),
        ).alias("key"),
        F.when(F.col("doc_id") % 17 == 2, F.lit("v0")).alias(
            "want_version_id"
        ),
    )


_D_DELETES = """
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           CASE WHEN doc_id % 17 = 2 THEN 'v0' END AS want_version_id
    FROM documents WHERE doc_id % 17 IN (1, 2)
"""


@register(
    "s3_delete_marker",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    deletes AS ({_D_DELETES}),
    kept AS (
      SELECT o.* FROM objects o
      WHERE NOT EXISTS (
        SELECT 1 FROM deletes d
        WHERE d.want_version_id IS NOT NULL
          AND d.bucket = o.bucket AND d.key = o.key
          AND d.want_version_id = o.version_id
      )
    ),
    md AS (
      SELECT DISTINCT bucket, key FROM deletes WHERE want_version_id IS NULL
    ),
    prior AS (
      SELECT k.bucket, k.key, MAX(k.version_idx) AS pm
      FROM kept k JOIN md USING (bucket, key)
      GROUP BY k.bucket, k.key
    ),
    markers AS (
      SELECT m.bucket, m.key,
             COALESCE(p.pm, -1) + 1 AS version_idx,
             'v' || (COALESCE(p.pm, -1) + 1) AS version_id,
             CAST(NULL AS BIGINT) AS size,
             CAST(NULL AS VARCHAR) AS etag,
             CAST(NULL AS VARCHAR) AS blob_hash,
             TRUE AS is_delete_marker
      FROM md m LEFT JOIN prior p USING (bucket, key)
    ),
    unioned AS (
      SELECT bucket, key, version_idx, version_id, size, etag, blob_hash,
             is_delete_marker
      FROM kept
      UNION ALL
      SELECT bucket, key, version_idx, version_id, size, etag, blob_hash,
             is_delete_marker
      FROM markers
    ),
    touched AS (SELECT DISTINCT bucket, key FROM deletes)
    SELECT u.bucket, u.key, u.version_idx, u.version_id,
           u.version_idx = MAX(u.version_idx)
             OVER (PARTITION BY u.bucket, u.key) AS is_latest,
           u.size, u.etag, u.blob_hash, u.is_delete_marker
    FROM unioned u JOIN touched USING (bucket, key)
    """,
)
def s3_delete_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete batch applied to the catalog: the full after-state version
    history of every touched key — appended markers latest, versioned
    removals gone, heads transitioned (a removed-only-version key
    contributes zero rows)."""
    versions = load_object_versions(spark, sf_dir)
    deletes = _delete_batch(spark, sf_dir)
    after = apply_deletes(versions, deletes)
    touched = deletes.select("bucket", "key").distinct()
    return after.join(
        F.broadcast(touched), ["bucket", "key"], "left_semi"
    ).select(*VERSION_COLS)
