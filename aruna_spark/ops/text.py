"""Shared text primitives: tokenization, shingles, portable 64-bit hashing.

One tokenization is used across text analysis, BM25 postings, and
MinHash-LSH dedup (the reference couples these the same way — its Tantivy
index and content hashes share the document bytes; ``blob/src/hash.rs:10-77``,
``operations/src/metadata/search_enrichment.rs:3-8``).

Hashing is md5-derived (top 15 hex digits → 60-bit int) rather than
xxhash64 so every hash is reproducible in DuckDB SQL
(``('0x' || substring(md5(x),1,15))::BIGINT``) — the correctness oracle can
recompute signatures exactly. md5 here is a *fingerprint*, not security.

Everything is pure column expressions — vectorized, codegen'd, no Python
UDFs; at 100 TB these are narrow map stages with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("a", "the")

# SQL fragments (Spark + DuckDB share md5 semantics; conv vs ::BIGINT differ)
SPARK_HASH64 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
DUCK_HASH64 = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization — single-space split, matching DuckDB
    ``string_split(text, ' ')`` exactly (empty text → [''])."""
    return F.split(text, " ")


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def seeded_hash64(col: Column, seed: int) -> Column:
    """Independent hash family member i: hash64(concat('s<i>:', x))."""
    return hash64(F.concat(F.lit(f"s{seed}:"), col))


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-token shingles (array<string>); null when fewer than k tokens."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), n - k)  # 0-based starts
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, mk)


def minhash_signature(sh: Column, num_hashes: int) -> Column:
    """MinHash signature: array<long> of per-seed minima over the shingle
    set. Null shingles → null signature (short docs opt out of LSH)."""
    def one_seed(i: int):
        # single-parameter lambda: a 2-arg lambda would make F.transform
        # bind the second arg to the ARRAY INDEX, silently breaking seeds
        return lambda s: seeded_hash64(s, i)

    return F.when(
        sh.isNotNull(),
        F.array(
            *[F.array_min(F.transform(sh, one_seed(i))) for i in range(num_hashes)]
        ),
    )


def duck_shingles_sql(toks: str, k: int = 3) -> str:
    """DuckDB fragment: k-token shingles over a (1-based) token-list column
    named ``toks``; mirrors :func:`shingles` exactly."""
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, len({toks}) - {k - 2}), i -> {parts}) END"
    )
