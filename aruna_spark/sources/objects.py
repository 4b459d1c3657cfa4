"""Deterministic S3-style object catalog derived from ``documents``.

The reference's blob/object plane keys objects by (bucket, key) with a
current-version pointer and per-version state
(``core/src/structs/blob.rs:504-507,696-740``). To exercise the listing
operators against the driver's parquet, each document becomes an object
with a hierarchical key and 1–3 versions:

- bucket   = 'corpus'
- key      = 'data/{source}/{lang}/doc-{doc_id}.txt'
- versions = v0..v(doc_id % 3); highest index is latest
- size     = n_chars + version_idx; etag = md5(key || ':' || version_idx)

The same derivation is reproduced in DuckDB (``OBJECTS_ORACLE_SQL``) so
every listing query is value-checked.

Scale: the derivation is explode + column exprs (narrow); a real
deployment would point the listing operators at a parquet/Delta objects
table sorted by (bucket, key) — the keyset predicates then push down to
file skipping on the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table


def load_object_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, key, version_idx, version_id, is_latest, size, etag)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
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
        (F.col("doc_id") % 3).alias("max_v"),
        F.col("n_chars"),
    )
    v = d.select(
        "bucket",
        "key",
        F.explode(F.sequence(F.lit(0), F.col("max_v"))).alias("version_idx"),
        "max_v",
        "n_chars",
    )
    return v.select(
        "bucket",
        "key",
        "version_idx",
        F.concat(F.lit("v"), F.col("version_idx").cast("string")).alias(
            "version_id"
        ),
        (F.col("version_idx") == F.col("max_v")).alias("is_latest"),
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
    )


OBJECTS_ORACLE_SQL = """
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           v AS version_idx,
           'v' || v AS version_id,
           v = (doc_id % 3) AS is_latest,
           n_chars + v AS size,
           md5('data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
               || ':' || v) AS etag,
           md5('blob:' || (n_chars + v)) AS blob_hash
    FROM documents, UNNEST(range(0, doc_id % 3 + 1)) AS t(v)
"""
