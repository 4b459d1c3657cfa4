"""GA4GH DRS object lookup (``api/src/routes/drs.rs``).

The DRS plane resolves an object id — here the canonical content-address
W3ID form ``https://w3id.org/aruna/data/{hash}`` (drs.rs:28,406-460) —
to a ``DrsObjectResponse``: name ``content-{hash[:12]}``, blob size,
checksums, and an https access method pointing at the download route.
Content addressing means one blob (hash) may back many object versions;
the lookup groups the versions table by hash and resolves each request
to its canonical blob plus the fan-in count.

Spark shape: the request batch (small) broadcasts against one
hash-grouped pass over the versions table — a single shuffle on
``blob_hash``; at 100 TB the versions table would be bucketed by
``blob_hash`` making the lookup shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions

W3ID_DATA_PREFIX = "https://w3id.org/aruna/data/"  # drs.rs:28
OBJECTS_ROUTE = "/ga4gh/drs/v1/objects/"  # drs.rs:57-60
DOWNLOAD_ROUTE = "/ga4gh/drs/v1/download?object_id="  # drs.rs:437-441


def blob_index(versions: DataFrame) -> DataFrame:
    """Content-address index: one row per blob hash with its committed
    size, canonical (lexicographically-first) location, and the
    content-addressed fan-in. Delete markers carry no blob
    (blob.rs:846-850: ``blob_hash()`` is None for Deleted) so they are
    not index rows."""
    versions = versions.filter(~F.col("is_delete_marker"))
    return versions.groupBy("blob_hash").agg(
        F.min("size").alias("blob_size"),
        F.min(F.concat(F.col("bucket"), F.lit("/"), F.col("key"))).alias(
            "canonical_location"
        ),
        F.count(F.lit(1)).alias("n_locations"),
    )


def drs_response(requested: DataFrame) -> DataFrame:
    """Blob-index rows -> DrsObjectResponse relation (drs.rs:406-460):
    the id/self/name/access projection shared by the registered demo
    batch and the facade's single-object route."""
    from aruna_spark.sources.objects import blob_content

    cid = F.concat(F.lit(W3ID_DATA_PREFIX), F.col("blob_hash"))
    return requested.select(
        cid.alias("id"),
        F.concat(F.lit(OBJECTS_ROUTE), cid).alias("self_uri"),
        F.concat(F.lit("content-"), F.substring("blob_hash", 1, 12)).alias(
            "name"
        ),
        F.col("blob_size").cast("long").alias("size"),
        F.col("blob_hash").alias("checksum_md5"),
        # the multi-checksum family is one pass over the content
        # (blob/src/hash.rs:10-77); sha256 is the DRS-standard entry
        F.sha2(blob_content(F.col("blob_size")), 256).alias(
            "checksum_sha256"
        ),
        "canonical_location",
        "n_locations",
        F.concat(F.lit(DOWNLOAD_ROUTE), cid).alias("access_url"),
    ).orderBy("id")


@register(
    "drs_object_lookup",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    blobs AS (
      SELECT blob_hash,
             MIN(size) AS blob_size,
             MIN(bucket || '/' || key) AS canonical_location,
             CAST(COUNT(*) AS BIGINT) AS n_locations
      FROM objects WHERE NOT is_delete_marker GROUP BY blob_hash
    ),
    requested AS (
      SELECT * FROM blobs WHERE substring(blob_hash, 1, 1) = 'a'
    )
    SELECT '{W3ID_DATA_PREFIX}' || blob_hash AS id,
           '{OBJECTS_ROUTE}' || '{W3ID_DATA_PREFIX}' || blob_hash AS self_uri,
           'content-' || substring(blob_hash, 1, 12) AS name,
           CAST(blob_size AS BIGINT) AS size,
           blob_hash AS checksum_md5,
           sha256('blob:' || blob_size) AS checksum_sha256,
           canonical_location,
           n_locations,
           '{DOWNLOAD_ROUTE}' || '{W3ID_DATA_PREFIX}' || blob_hash
             AS access_url
    FROM requested
    ORDER BY id
    """,
)
def drs_object_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve a deterministic request batch of content-address W3IDs
    (every stored blob whose hash starts with 'a') to DRS object
    responses. ``size`` is well-defined per hash because the content
    address commits to the content (drs.rs:450: ``location.blob_size``);
    ``canonical_location`` is the lexicographically-first stored copy
    and ``n_locations`` the content-addressed fan-in."""
    blobs = blob_index(load_object_versions(spark, sf_dir))
    return drs_response(blobs.filter(F.substring("blob_hash", 1, 1) == "a"))
