"""The complete at-rest checksum family, CRC32C / CRC64-NVME included.

``blob/src/hash.rs:10-77`` streams every blob through seven digests in
one pass at write time. The JVM-built-in members (md5/sha1/sha256/
crc32) live in ``sources/objects.with_checksums``; the two reflected
CRCs Spark lacks (CRC32C — S3 ``ChecksumCRC32C``; CRC-64/NVME — S3
full-object checksums) are computed at INGEST by the Arrow-batched
numpy kernel in ``ops/checksums.py`` and stored as ordinary columns.

The oracle computes the same CRCs through a completely independent
mechanism — a table-driven recursive CTE in plain DuckDB SQL (one byte
per recursion step, the 256-entry tables inlined as VALUES) — so the
value check is a genuine cross-implementation pin, on top of the
published test vectors pinned in ``tests/test_checksums.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.checksums import crc_oracle_cte
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    blob_content,
    load_object_versions,
    with_checksums,
    with_ingest_checksums,
)

# bounded deterministic slice: one key family, every version
_SLICE_MOD = 29
_SLICE_RESIDUE = 7

_SLICE_SQL = f"""
    SELECT key || ':' || version_id AS rid,
           bucket, key, version_id, size,
           'blob:' || size AS content
    FROM ({OBJECTS_ORACLE_SQL})
    WHERE NOT is_delete_marker
      AND CAST(regexp_extract(key, 'doc-(\\d+)\\.txt$', 1) AS BIGINT)
          % {_SLICE_MOD} = {_SLICE_RESIDUE}
"""


@register(
    "s3_checksum_family",
    oracle=f"""
    WITH s AS ({_SLICE_SQL}),
    crcs AS (
      SELECT * FROM {crc_oracle_cte("content", "SELECT rid, content FROM s")}
    )
    SELECT s.bucket, s.key, s.version_id,
           CAST(s.size AS BIGINT) AS size,
           md5(s.content) AS checksum_md5,
           sha256(s.content) AS checksum_sha256,
           CAST(c.crc32c AS BIGINT) AS checksum_crc32c,
           c.crc64_nvme AS checksum_crc64_nvme
    FROM s JOIN crcs c USING (rid)
    """,
)
def s3_checksum_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every version of one deterministic key family with the full
    at-rest checksum family: the JVM built-ins in one whole-stage-
    codegen projection plus the ingest-time CRC32C / CRC64-NVME columns
    from the Arrow-batched kernel — all value-checked against the
    oracle's independent recursive-CTE CRC implementation."""
    v = load_object_versions(spark, sf_dir).filter(
        ~F.col("is_delete_marker")
    )
    v = v.filter(
        F.regexp_extract(F.col("key"), r"doc-(\d+)\.txt$", 1).cast("long")
        % _SLICE_MOD
        == _SLICE_RESIDUE
    )
    out = with_ingest_checksums(with_checksums(v))
    return out.select(
        "bucket",
        "key",
        "version_id",
        F.col("size").cast("long").alias("size"),
        "checksum_md5",
        "checksum_sha256",
        "checksum_crc32c",
        "checksum_crc64_nvme",
    )
