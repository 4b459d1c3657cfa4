"""Blob hash → permission-path alias resolution.

Reference: ``operations/src/blob/resolve_blob_permission_paths.rs`` —
given a blake3 content hash, walk the hash-path index prefix
(``HashPathIndexKey { blake3_hash, version_id, realm, group, node,
bucket, key }``, ``core/src/structs/blob.rs:570-578``) and return
every alias sorted by ``(permission_path, version_id)`` (rs:75-77).
The permission path is
``/{realm}/g/{group}/data/{node}/{bucket}/{key}``
(``blob_object_permission_path``, blob.rs:538-567). Authorization
uses this to decide whether ANY readable path names the content.

Spark mapping: the hash-path index IS the object catalog keyed by
content address — the request's hash batch joins the catalog on
``blob_hash`` (the join key prunes the scan; at fleet scale the
request side is bounded and AQE broadcasts it), the alias path is a
pure projection, and the reference's in-memory sort becomes a
``row_number`` window PARTITIONED by the requested hash (bounded
alias groups, never a global sort).

Modeled request: the v0 content hashes of documents with
``doc_id % 101 == 3``. Hashes are size-addressed, so one requested
hash fans out to every version of every document sharing that byte
size — real multi-alias resolution, not a 1:1 lookup. Nodes reuse the
``backend-(size % 3)`` copy dimension (reclaim/usage convention);
realm/group reuse the bucket plane's ``grp-main`` → ``realm-2``
derivation (queries/buckets.py `_REALM_OF`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions

# grp-main's realm under the shared derivation:
# 'realm-' || (ascii(last char) % 3); ascii('n') = 110 → realm-2
REALM_ID = "realm-2"
GROUP_ID = "grp-main"


def resolve_permission_paths(
    catalog: DataFrame, hashes: DataFrame
) -> DataFrame:
    """All catalog aliases of each requested hash, ranked in
    (permission_path, version_id) order within the hash (rs:75-77).

    ``catalog``: object versions (marker rows carry no hash and never
    alias); ``hashes``: one ``blob_hash`` column, the request batch.
    """
    aliases = catalog.filter(F.col("blob_hash").isNotNull()).join(
        hashes, "blob_hash"
    )
    path = F.concat(
        F.lit(f"/{REALM_ID}/g/{GROUP_ID}/data/backend-"),
        (F.col("size") % 3).cast("string"),
        F.lit("/"),
        F.col("bucket"),
        F.lit("/"),
        F.col("key"),
    )
    w = Window.partitionBy("blob_hash").orderBy("permission_path", "version_id")
    return (
        aliases.select(
            "blob_hash",
            "bucket",
            "key",
            "version_id",
            path.alias("permission_path"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


@register(
    "blob_permission_paths",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    req AS (
      SELECT DISTINCT md5('blob:' || n_chars) AS blob_hash
      FROM documents WHERE doc_id % 101 = 3
    ),
    aliases AS (
      SELECT o.blob_hash, o.bucket, o.key, o.version_id,
             '/{REALM_ID}/g/{GROUP_ID}/data/backend-' || (o.size % 3)
               || '/' || o.bucket || '/' || o.key AS permission_path
      FROM objects o JOIN req r ON r.blob_hash = o.blob_hash
      WHERE o.blob_hash IS NOT NULL
    )
    SELECT *,
           CAST(row_number() OVER (
             PARTITION BY blob_hash
             ORDER BY permission_path, version_id) AS INT) AS rank
    FROM aliases
    """,
)
def blob_permission_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve a batch of content hashes to every permission-path
    alias still naming them, in the reference's (permission_path,
    version_id) walk order. Size-addressed hashes fan out across
    documents, so the result exercises genuine alias groups."""
    hashes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 101 == 3)
        .select(
            F.md5(
                F.concat(F.lit("blob:"), F.col("n_chars").cast("string"))
            ).alias("blob_hash")
        )
        .distinct()
    )
    return resolve_permission_paths(
        load_object_versions(spark, sf_dir), hashes
    )
