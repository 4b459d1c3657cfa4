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
    # ONE explode emits materialized versions AND the optional marker
    # (r15 optimization: the union of a second corpus scan for the
    # marker branch doubled every consumer's scan count — s3 queries
    # join this relation 3-4 times each). Row multiset is identical:
    # indices 0..max_v materialized, max_v + 1 the marker when the
    # key is on the delete lane.
    v = d.select(
        "bucket",
        "key",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("max_v") + F.col("__deleted").cast("int"),
            )
        ).alias("version_idx"),
        "max_v",
        "__deleted",
        "n_chars",
    )
    is_marker = F.col("version_idx") > F.col("max_v")
    return v.select(
        "bucket",
        "key",
        "version_idx",
        F.concat(F.lit("v"), F.col("version_idx").cast("string")).alias(
            "version_id"
        ),
        # a deleted key's head is the MARKER, so no materialized row is
        # latest; the marker itself is always latest
        (
            is_marker
            | ((F.col("version_idx") == F.col("max_v")) & ~F.col("__deleted"))
        ).alias("is_latest"),
        F.when(~is_marker, F.col("n_chars") + F.col("version_idx"))
        .cast("long")
        .alias("size"),
        F.when(
            ~is_marker,
            F.md5(
                F.concat(
                    F.col("key"), F.lit(":"), F.col("version_idx").cast("string")
                )
            ),
        ).alias("etag"),
        # content address: equal content (modeled as equal size) shares a
        # blob — the substrate for content-addressed dedup counters
        # (blob/src/hash.rs:10-77, keyspaces.rs:44)
        F.when(
            ~is_marker,
            F.md5(
                F.concat(
                    F.lit("blob:"),
                    (F.col("n_chars") + F.col("version_idx")).cast("string"),
                )
            ),
        ).alias("blob_hash"),
        is_marker.alias("is_delete_marker"),
    )


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


def with_ingest_checksums(df: DataFrame, size_col: str = "size") -> DataFrame:
    """Add the two CRC members Spark has no JVM built-in for —
    ``checksum_crc32c`` (long) and ``checksum_crc64_nvme`` (16-hex
    string; the value exceeds BIGINT) — via ONE Arrow-batched pandas
    UDF pass (hash.rs:10-77 computes the whole family in one stream).

    This is the INGEST-time path: checksums are computed once at write,
    stored as columns, and served from the catalog afterwards — the
    query path never re-hashes (the Python stage prices in at write
    amortized over every later read). Rows without content (markers)
    get NULLs, like the rest of the family."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from aruna_spark.ops.checksums import crc32c_batch, crc64_nvme_batch

    # NB: no parameter annotations — this module postpones annotation
    # evaluation, which pandas_udf's hint introspection can't resolve;
    # the explicit Series->Series contract is documented here instead.
    def _crc32c_fn(content):
        mask = content.notna()
        out = pd.Series([None] * len(content), dtype="object")
        payloads = [c.encode() for c in content[mask]]
        out[mask] = crc32c_batch(payloads).astype("int64")
        return out.astype("Int64")

    def _crc64_fn(content):
        mask = content.notna()
        out = pd.Series([None] * len(content), dtype="object")
        payloads = [c.encode() for c in content[mask]]
        out[mask] = [f"{int(v):016x}" for v in crc64_nvme_batch(payloads)]
        return out

    _crc32c = pandas_udf(_crc32c_fn, "long")
    _crc64 = pandas_udf(_crc64_fn, "string")

    content = F.when(
        F.col(size_col).isNotNull(), blob_content(F.col(size_col))
    )
    return df.withColumns(
        {
            "checksum_crc32c": _crc32c(content),
            "checksum_crc64_nvme": _crc64(content),
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


# ======================================================= Reference versions
# The third blob-version state: ``Reference { source, cached_metadata,
# last_refresh }`` (core/src/structs/blob.rs:837-841) — an external
# staging-backed object that never materializes. It has NO blob_hash /
# backend of its own (blob.rs:846-861: ``blob_hash()`` and
# ``blob_backend()`` are None for Reference); reads surface the CACHED
# source metadata (content_length, content_type, etag —
# core/src/structs/source_access.rs:24-30) plus ``last_refresh``, and a
# periodic sweep re-heads the source and updates the cache under a
# monotonic stale guard (operations/src/s3/refresh_reference_metadata.rs:
# 345-372: apply iff ``refreshed_at > last_refresh``; non-Reference and
# missing versions are skipped).
#
# Modeled deterministically: docs with ``doc_id % 11 == 5`` are
# by-reference objects in the separate ``staging`` bucket (their
# VersionSourceBinding points at an external connector):
#
# - key             = 'ext/{source}/{lang}/doc-{doc_id}.bin'
# - source_kind     = 's3' if doc_id even else 'http'
#   (SourceConnectorKind, staging.rs:26-31)
# - source_path     = '{source}/{lang}/doc-{doc_id}.bin'
# - connector_id    = 'conn-{doc_id % 4}'
# - cached_length   = n_chars            (the possibly-STALE cache)
# - cached_etag     = md5('src:' || key || ':' || cached_length)
# - last_refresh    = 1000 + doc_id % 5  (logical refresh tick)
#
# The source's CURRENT truth (what the staging connector listing reports
# today) drifts: truth_length = n_chars + doc_id % 7, truth_etag derived
# the same way — so a refresh sweep visibly updates some caches.
#
# Scale: one narrow projection per doc — no explode, no shuffle; the
# sweep is a broadcast-joinable dimension lookup against the connector
# listing keyed on (source_kind, source_path).

REFERENCE_MOD = 11
REFERENCE_RESIDUE = 5

REFERENCE_COLS = (
    "bucket",
    "key",
    "version_idx",
    "version_id",
    "is_latest",
    "source_kind",
    "source_path",
    "connector_id",
    "cached_length",
    "cached_content_type",
    "cached_etag",
    "last_refresh",
)


def _ref_key() -> F.Column:
    return F.concat(
        F.lit("ext/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".bin"),
    )


def load_reference_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The by-reference version rows (REFERENCE_COLS): external objects
    in the ``staging`` bucket whose only version is
    ``BlobVersionState::Reference`` — cached source metadata, no blob."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % REFERENCE_MOD == REFERENCE_RESIDUE
    )
    key = _ref_key()
    cached_len = F.col("n_chars").cast("long")
    return docs.select(
        F.lit("staging").alias("bucket"),
        key.alias("key"),
        F.lit(0).cast("long").alias("version_idx"),
        F.lit("v0").alias("version_id"),
        F.lit(True).alias("is_latest"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("s3"))
        .otherwise(F.lit("http"))
        .alias("source_kind"),
        F.concat(
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".bin"),
        ).alias("source_path"),
        F.concat(F.lit("conn-"), (F.col("doc_id") % 4).cast("string")).alias(
            "connector_id"
        ),
        cached_len.alias("cached_length"),
        F.lit("text/plain").alias("cached_content_type"),
        F.md5(
            F.concat(F.lit("src:"), key, F.lit(":"), cached_len.cast("string"))
        ).alias("cached_etag"),
        (F.lit(1000) + F.col("doc_id") % 5).cast("long").alias("last_refresh"),
    )


def reference_as_versions(refs: DataFrame) -> DataFrame:
    """Project reference rows into the VERSION_COLS shape so the shared
    resolution operators (GetObject/HeadObject/listings) consume them:
    size/etag come from the CACHE, blob_hash is NULL (blob.rs:846-850),
    and a reference head is a live, listable object (list_objects_v2.rs:
    511-529 — Reference entries surface with location None)."""
    return refs.select(
        "bucket",
        "key",
        "version_idx",
        "version_id",
        "is_latest",
        F.col("cached_length").alias("size"),
        F.col("cached_etag").alias("etag"),
        F.lit(None).cast("string").alias("blob_hash"),
        F.lit(False).alias("is_delete_marker"),
    )


def load_source_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staging connector listing as of NOW — per source object:
    (source_kind, source_path, truth_length, truth_etag). This is what
    a HeadSource against the external system returns during the sweep
    (the `(key, size)` relation ops/staging.list_source_level pages)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % REFERENCE_MOD == REFERENCE_RESIDUE
    )
    key = _ref_key()
    truth_len = (F.col("n_chars") + F.col("doc_id") % 7).cast("long")
    return docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("s3"))
        .otherwise(F.lit("http"))
        .alias("source_kind"),
        F.concat(
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".bin"),
        ).alias("source_path"),
        truth_len.alias("truth_length"),
        F.md5(
            F.concat(F.lit("src:"), key, F.lit(":"), truth_len.cast("string"))
        ).alias("truth_etag"),
    )


def apply_metadata_refresh(refs: DataFrame, refreshes: DataFrame) -> DataFrame:
    """One refresh sweep applied to the reference rows → new reference
    rows (refresh_reference_metadata.rs:345-372 as column algebra).

    ``refreshes`` carries (bucket, key, refreshed_at, new_length,
    new_content_type, new_etag) — the freshly-headed source metadata.
    The stale guard is monotonic: a refresh applies iff ``refreshed_at``
    is strictly newer than the row's ``last_refresh`` (out-of-order
    queue drains are no-ops); refreshes for unknown keys are dropped
    (the version-missing skip), and non-reference rows never enter this
    relation. ``refreshed`` marks the rows the sweep changed.

    Scale shape: the refresh side is a per-key dimension (one row per
    due reference) — an equi-join on the reference key, broadcastable
    when the due set is small, AQE-planned otherwise; no window, no
    catalog shuffle."""
    r = refreshes.select(
        "bucket",
        "key",
        F.col("refreshed_at").cast("long").alias("__r_at"),
        F.col("new_length").cast("long").alias("__r_len"),
        F.col("new_content_type").alias("__r_ct"),
        F.col("new_etag").alias("__r_etag"),
    )
    joined = refs.join(r, ["bucket", "key"], "left")
    apply = F.col("__r_at").isNotNull() & (
        F.col("__r_at") > F.col("last_refresh")
    )
    return joined.select(
        *[c for c in REFERENCE_COLS if c not in (
            "cached_length", "cached_content_type", "cached_etag",
            "last_refresh",
        )],
        F.when(apply, F.col("__r_len"))
        .otherwise(F.col("cached_length"))
        .alias("cached_length"),
        F.when(apply, F.col("__r_ct"))
        .otherwise(F.col("cached_content_type"))
        .alias("cached_content_type"),
        F.when(apply, F.col("__r_etag"))
        .otherwise(F.col("cached_etag"))
        .alias("cached_etag"),
        F.when(apply, F.col("__r_at"))
        .otherwise(F.col("last_refresh"))
        .alias("last_refresh"),
        apply.alias("refreshed"),
    )


_REF_KEY_SQL = (
    "'ext/' || source || '/' || lang || '/doc-' || doc_id || '.bin'"
)

REFERENCES_ORACLE_SQL = f"""
    SELECT 'staging' AS bucket,
           {_REF_KEY_SQL} AS key,
           CAST(0 AS BIGINT) AS version_idx,
           'v0' AS version_id,
           TRUE AS is_latest,
           CASE WHEN doc_id % 2 = 0 THEN 's3' ELSE 'http' END AS source_kind,
           source || '/' || lang || '/doc-' || doc_id || '.bin' AS source_path,
           'conn-' || (doc_id % 4) AS connector_id,
           CAST(n_chars AS BIGINT) AS cached_length,
           'text/plain' AS cached_content_type,
           md5('src:' || {_REF_KEY_SQL} || ':' || n_chars) AS cached_etag,
           CAST(1000 + doc_id % 5 AS BIGINT) AS last_refresh
    FROM documents
    WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE}
"""

SOURCE_TRUTH_ORACLE_SQL = f"""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 's3' ELSE 'http' END AS source_kind,
           source || '/' || lang || '/doc-' || doc_id || '.bin' AS source_path,
           CAST(n_chars + doc_id % 7 AS BIGINT) AS truth_length,
           md5('src:' || {_REF_KEY_SQL} || ':' || (n_chars + doc_id % 7))
             AS truth_etag
    FROM documents
    WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE}
"""
