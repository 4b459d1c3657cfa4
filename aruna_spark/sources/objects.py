"""Deterministic S3-style object catalog derived from ``documents``.

The reference's blob/object plane keys objects by (bucket, key) with a
current-version pointer and per-version state ``Materialized | Reference
| Deleted`` (``core/src/structs/blob.rs:829-843``). To exercise the
listing/object operators against the driver's parquet, each document
becomes an object with a hierarchical key and 1-3 versions:

- bucket   = 'corpus'
- key      = 'data/{source}/{lang}/doc-{doc_id}.txt'
- versions = v0..v(doc_id % 3); highest index is latest
- size     = n_chars + version_idx; etag = md5(key || ':' || version_idx)

Keys with ``doc_id % 13 == 3`` additionally carry a DELETE MARKER as
their latest version (``BlobVersionState::Deleted``, written by the
unversioned-DeleteObject tombstone path, ``operations/src/s3/
delete_object.rs`` write_tombstone): version_idx = max_v + 1, no size /
etag / blob_hash. Marker-aware consumers follow S3:

- ListObjectsV2 / staging / permission listings see :func:`live_latest`
  (deleted heads hidden — ``list_objects_v2.rs:454,510`` skips Deleted);
- ListObjectVersions shows markers (``list_object_versions.rs``
  ``ListObjectVersionsItem::DeleteMarker``);
- Get/Head on a marker head is 404 (``get_object.rs:344-347``);
- usage counters and the DRS blob index count materialized rows only
  (markers carry no blob).

The same derivation is reproduced in DuckDB (``OBJECTS_ORACLE_SQL``) so
every object-plane query is value-checked.

Scale: the derivation is explode + column exprs (narrow); a real
deployment would point the listing operators at a parquet/Delta objects
table sorted by (bucket, key) — the keyset predicates then push down to
file skipping on the sort key, and markers are ordinary rows with a
boolean flag, so hiding deleted heads is a pushed-down filter, not a
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table

# keys whose head is a delete marker in the base catalog
DELETE_MOD = 13
DELETE_RESIDUE = 3

VERSION_COLS = (
    "bucket",
    "key",
    "version_idx",
    "version_id",
    "is_latest",
    "size",
    "etag",
    "blob_hash",
    "is_delete_marker",
)


def _doc_key() -> F.Column:
    return F.concat(
        F.lit("data/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".txt"),
    )


def load_object_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, key, version_idx, version_id, is_latest, size, etag,
    blob_hash, is_delete_marker)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.lit("corpus").alias("bucket"),
        _doc_key().alias("key"),
        (F.col("doc_id") % 3).alias("max_v"),
        (F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE).alias("__deleted"),
        F.col("n_chars"),
    )
    v = d.select(
        "bucket",
        "key",
        F.explode(F.sequence(F.lit(0), F.col("max_v"))).alias("version_idx"),
        "max_v",
        "__deleted",
        "n_chars",
    )
    materialized = v.select(
        "bucket",
        "key",
        "version_idx",
        F.concat(F.lit("v"), F.col("version_idx").cast("string")).alias(
            "version_id"
        ),
        # a deleted key's head is the MARKER, so no materialized row is latest
        (
            (F.col("version_idx") == F.col("max_v")) & ~F.col("__deleted")
        ).alias("is_latest"),
        (F.col("n_chars") + F.col("version_idx")).alias("size"),
        F.md5(
            F.concat(F.col("key"), F.lit(":"), F.col("version_idx").cast("string"))
        ).alias("etag"),
        # content address: equal content (modeled as equal size) shares a
        # blob — the substrate for content-addressed dedup counters
        # (blob/src/hash.rs:10-77, keyspaces.rs:44)
        F.md5(
            F.concat(F.lit("blob:"), (F.col("n_chars") + F.col("version_idx")).cast("string"))
        ).alias("blob_hash"),
        F.lit(False).alias("is_delete_marker"),
    )
    markers = d.filter(F.col("__deleted")).select(
        "bucket",
        "key",
        (F.col("max_v") + 1).alias("version_idx"),
        F.concat(F.lit("v"), (F.col("max_v") + 1).cast("string")).alias(
            "version_id"
        ),
        F.lit(True).alias("is_latest"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("blob_hash"),
        F.lit(True).alias("is_delete_marker"),
    )
    return materialized.unionByName(markers)


# ------------------------------------------------- multi-checksum family
# The reference hashes every blob ONCE, streaming the bytes through all
# digests together — BLAKE3 + CRC32/CRC32C/CRC64-NVME + SHA1/SHA256/MD5
# (blob/src/hash.rs:10-77). Re-expressed Spark-first: the checksums are
# one narrow projection over the content column — a single pass, all
# JVM-side built-ins inside one whole-stage-codegen span (no Python, no
# second scan). CRC32C/CRC64-NVME have no JVM built-in and are omitted;
# md5 doubles as the catalog's content address (``blob_hash``).

CHECKSUM_COLS = (
    "checksum_md5",
    "checksum_sha256",
    "checksum_sha1",
    "checksum_crc32",
)


def blob_content(size: F.Column) -> F.Column:
    """The modeled canonical content bytes of a blob (content is keyed
    by size in this derivation — the same bytes ``blob_hash`` commits
    to)."""
    return F.concat(F.lit("blob:"), size.cast("string"))


def with_checksums(df: DataFrame, size_col: str = "size") -> DataFrame:
    """Add the full checksum family in ONE projection (hash.rs:10-77).
    Rows without content (delete markers: NULL size) get NULL checksums,
    matching ``blob_hash()`` being None for Deleted (blob.rs:846-850)."""
    content = blob_content(F.col(size_col))
    has = F.col(size_col).isNotNull()
    return df.withColumns(
        {
            "checksum_md5": F.when(has, F.md5(content)),
            "checksum_sha256": F.when(has, F.sha2(content, 256)),
            "checksum_sha1": F.when(has, F.sha1(content)),
            "checksum_crc32": F.when(has, F.crc32(content.cast("binary"))),
        }
    )


def live_latest(versions: DataFrame) -> DataFrame:
    """The visible object heads: latest versions that are NOT delete
    markers — what ListObjectsV2, staging listings, and permission
    scans see (list_objects_v2.rs:454,510 skip Deleted heads)."""
    return versions.filter(
        F.col("is_latest") & ~F.col("is_delete_marker")
    )


OBJECTS_ORACLE_SQL = f"""
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           v AS version_idx,
           'v' || v AS version_id,
           v = (doc_id % 3) AND doc_id % {DELETE_MOD} <> {DELETE_RESIDUE}
             AS is_latest,
           n_chars + v AS size,
           md5('data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
               || ':' || v) AS etag,
           md5('blob:' || (n_chars + v)) AS blob_hash,
           FALSE AS is_delete_marker
    FROM documents, UNNEST(range(0, doc_id % 3 + 1)) AS t(v)
    UNION ALL
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           (doc_id % 3) + 1 AS version_idx,
           'v' || ((doc_id % 3) + 1) AS version_id,
           TRUE AS is_latest,
           CAST(NULL AS BIGINT) AS size,
           CAST(NULL AS VARCHAR) AS etag,
           CAST(NULL AS VARCHAR) AS blob_hash,
           TRUE AS is_delete_marker
    FROM documents WHERE doc_id % {DELETE_MOD} = {DELETE_RESIDUE}
"""

# the live-heads CTE body every marker-aware oracle shares
LIVE_LATEST_SQL = "SELECT * FROM objects WHERE is_latest AND NOT is_delete_marker"
