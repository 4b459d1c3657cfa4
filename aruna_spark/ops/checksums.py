"""CRC checksum family members Spark lacks built-ins for: CRC32C
(Castagnoli) and CRC-64/NVME.

The reference streams every blob through ALL digests in one pass at
write time — BLAKE3, MD5, SHA1, SHA256, CRC32, CRC32C, CRC64-NVME
(``blob/src/hash.rs:10-77``). Spark covers md5/sha/crc32 as JVM
built-ins (``sources/objects.with_checksums``); this module closes the
family with the two reflected CRCs:

- CRC32C: poly (reflected) 0x82F63B78, init/xorout 0xFFFFFFFF —
  the S3 ``ChecksumCRC32C`` algorithm, default for several SDKs.
- CRC-64/NVME: poly (reflected) 0x9A6C9329AC4BC9B5, init/xorout all
  ones — S3 ``ChecksumCRC64NVME`` (full-object checksums).

Execution model: checksums are computed ONCE at ingest (the write
path), never on the query path, so an Arrow-batched pandas UDF is the
right tool here — the batch transfer is a single column of content
bytes, and the kernel below is vectorized ACROSS the batch with numpy
(one table-lookup pass per byte POSITION, not per byte): a batch of
100k rows of n-byte payloads costs n numpy gathers, not 100k Python
loops. A production deployment would swap the kernel for a native
binding (google-crc32c / ISA-L) behind the same column signature.
"""

from __future__ import annotations

import numpy as np

CRC32C_POLY = 0x82F63B78  # reflected Castagnoli
CRC32_POLY = 0xEDB88320  # reflected IEEE (zlib/Spark crc32)
CRC64_NVME_POLY = 0x9A6C9329AC4BC9B5  # reflected CRC-64/NVME


def make_table(poly: int) -> np.ndarray:
    """256-entry lookup table for a reflected CRC."""
    table = np.zeros(256, dtype=np.uint64)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table[i] = crc
    return table


_T32C = make_table(CRC32C_POLY)
_T64 = make_table(CRC64_NVME_POLY)


def crc_bytes(data: bytes, table: np.ndarray, width: int) -> int:
    """Scalar reference implementation (init/xorout all-ones)."""
    mask = (1 << width) - 1
    crc = mask
    for b in data:
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    return crc ^ mask


def crc32c(data: bytes) -> int:
    return crc_bytes(data, _T32C, 32)


def crc64_nvme(data: bytes) -> int:
    return crc_bytes(data, _T64, 64)


def crc_batch(payloads, table: np.ndarray, width: int) -> np.ndarray:
    """Vectorized CRC over a sequence of byte strings: one numpy gather
    per byte POSITION across the whole batch. Rows shorter than the
    current position freeze (their state stops updating)."""
    n = len(payloads)
    mask = np.uint64((1 << width) - 1)
    state = np.full(n, mask, dtype=np.uint64)
    if n == 0:
        return state
    lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    maxlen = int(lengths.max()) if n else 0
    if maxlen:
        codes = np.zeros((n, maxlen), dtype=np.uint64)
        for r, p in enumerate(payloads):
            if p:
                codes[r, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    for pos in range(maxlen):
        active = lengths > pos
        s = state[active]
        idx = ((s ^ codes[active, pos]) & np.uint64(0xFF)).astype(np.int64)
        state[active] = (s >> np.uint64(8)) ^ table[idx]
    return state ^ mask


def crc32c_batch(payloads) -> np.ndarray:
    return crc_batch(payloads, _T32C, 32)


def crc64_nvme_batch(payloads) -> np.ndarray:
    return crc_batch(payloads, _T64, 64)


# ------------------------------------------------------ DuckDB oracle SQL
# The oracle computes the same CRCs in PLAIN SQL — a table-driven
# recursive CTE (one byte per recursion step, the 256-entry tables
# embedded as VALUES literals) — a mechanism fully independent of the
# numpy kernel, so the cross-check is real.


def _values_literal(table: np.ndarray) -> str:
    return ", ".join(f"({i}, {int(v)})" for i, v in enumerate(table))


def crc_oracle_cte(content_expr: str, rows_sql: str) -> str:
    """SQL computing crc32c and crc64_nvme for each row of ``rows_sql``
    (which must expose a unique ``rid`` column and the content via
    ``content_expr``). Yields a relation (rid, crc32c, crc64_nvme) —
    crc64 as a 16-hex-digit string (it exceeds BIGINT range)."""
    m32 = (1 << 32) - 1
    m64 = (1 << 64) - 1
    return f"""
    (WITH RECURSIVE
    t32c(i, v) AS (SELECT * FROM (VALUES {_values_literal(_T32C)})),
    t64(i, v) AS (SELECT * FROM (VALUES {_values_literal(_T64)})),
    base AS (
      SELECT rid, {content_expr} AS content,
             length({content_expr}) AS n
      FROM ({rows_sql})
    ),
    crc AS (
      SELECT rid, content, n, 0 AS pos,
             CAST({m32} AS BIGINT) AS s32c,
             CAST({m64} AS UBIGINT) AS s64
      FROM base
      UNION ALL
      SELECT c.rid, c.content, c.n, c.pos + 1,
             xor(c.s32c >> 8, tc.v),
             xor(c.s64 >> 8, CAST(t6.v AS UBIGINT))
      FROM crc c
      JOIN t32c tc
        ON tc.i = xor(c.s32c & 255, ord(substr(c.content, c.pos + 1, 1)))
      JOIN t64 t6
        ON t6.i = xor(CAST(c.s64 & 255 AS BIGINT),
                      ord(substr(c.content, c.pos + 1, 1)))
      WHERE c.pos < c.n
    )
    SELECT rid,
           xor(s32c, {m32}) AS crc32c,
           lpad(lower(hex(xor(s64, CAST({m64} AS UBIGINT)))), 16, '0')
             AS crc64_nvme
    FROM crc WHERE pos = n)
    """
