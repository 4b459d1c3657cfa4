"""CRC32C / CRC-64-NVME: published test vectors, batch==scalar parity,
oracle-CTE parity, and the ingest-column + attributes surfaces
(blob/src/hash.rs:10-77)."""

from __future__ import annotations

import zlib

import duckdb
import pytest
from pyspark.sql import functions as F

from aruna_spark.ops.checksums import (
    CRC32_POLY,
    crc32c,
    crc32c_batch,
    crc64_nvme,
    crc64_nvme_batch,
    crc_bytes,
    crc_oracle_cte,
    make_table,
)

# the canonical check vectors (CRC catalogue "check" values for
# CRC-32C / CRC-64-NVME; RFC 3720 appendix B.4 for the iSCSI CRC)
VECTORS_32C = {
    b"123456789": 0xE3069283,
    b"": 0x00000000,
    b"a": 0xC1D04330,
    b"abc": 0x364B3FB7,
    bytes(32): 0x8A9136AA,  # 32 zero bytes (RFC 3720)
    bytes([0xFF] * 32): 0x62A8AB43,  # 32 0xFF bytes (RFC 3720)
}
VECTORS_64 = {
    b"123456789": 0xAE8B14860A799888,
    b"": 0x0000000000000000,
}


def test_crc32c_vectors():
    for data, want in VECTORS_32C.items():
        assert crc32c(data) == want, data


def test_crc64_nvme_vectors():
    for data, want in VECTORS_64.items():
        assert crc64_nvme(data) == want, data


def test_crc32_table_matches_zlib():
    t = make_table(CRC32_POLY)
    for data in (b"123456789", b"blob:777", b"", b"x" * 100):
        assert crc_bytes(data, t, 32) == zlib.crc32(data)


def test_batch_matches_scalar():
    payloads = [b"123456789", b"", b"blob:42", b"a", b"abc", bytes(32)]
    assert list(crc32c_batch(payloads)) == [crc32c(p) for p in payloads]
    assert list(crc64_nvme_batch(payloads)) == [
        crc64_nvme(p) for p in payloads
    ]


def test_oracle_cte_matches_kernel():
    rows = "SELECT rid, c FROM (VALUES (1, '123456789'), (2, 'blob:901'), (3, '')) t(rid, c)"
    got = duckdb.sql(
        "SELECT * FROM " + crc_oracle_cte("c", rows) + " ORDER BY rid"
    ).fetchall()
    want = [
        (i, crc32c(c), f"{crc64_nvme(c):016x}")
        for i, c in [(1, b"123456789"), (2, b"blob:901"), (3, b"")]
    ]
    assert got == want


def test_ingest_columns_and_null_propagation(spark, sf_dir):
    from aruna_spark.sources.objects import (
        load_object_versions,
        with_ingest_checksums,
    )

    v = with_ingest_checksums(load_object_versions(spark, sf_dir)).cache()
    # markers carry no content -> NULL checksums, like the rest of the family
    assert (
        v.filter(F.col("is_delete_marker"))
        .filter(
            F.col("checksum_crc32c").isNotNull()
            | F.col("checksum_crc64_nvme").isNotNull()
        )
        .count()
        == 0
    )
    row = v.filter(~F.col("is_delete_marker")).orderBy("key").limit(1).collect()[0]
    content = f"blob:{row.size}".encode()
    assert row.checksum_crc32c == crc32c(content)
    assert row.checksum_crc64_nvme == f"{crc64_nvme(content):016x}"


def test_attributes_surface_crc(spark, sf_dir):
    from aruna_spark.api import Engine
    from aruna_spark.sources.objects import live_latest, load_object_versions

    engine = Engine(spark, sf_dir)
    head = (
        live_latest(load_object_versions(spark, sf_dir))
        .orderBy("key")
        .limit(1)
        .collect()[0]
    )
    out = engine.get_object_attributes(head.key)
    content = f"blob:{out['attributes'].object_size}".encode()
    assert out["checksum_crc32c"] == crc32c(content)
    assert out["checksum_crc64_nvme"] == f"{crc64_nvme(content):016x}"
    assert "CRC32C" in out["checksum_algorithms"]


def test_no_batch_eval_python_in_checksum_plan(spark, sf_dir):
    """The CRC stage is Arrow-batched (ArrowEvalPython), never
    row-at-a-time BatchEvalPython."""
    from aruna_spark.queries.checksums_suite import s3_checksum_family

    plan = s3_checksum_family(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
