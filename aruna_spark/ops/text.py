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


MINHASH_MOD = 1 << 28  # 28-bit hash space (keeps i*h2 well inside int64)


def hash28(col: Column, seed: str) -> Column:
    """Portable 28-bit hash: top 7 hex digits of a seeded md5."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), col)), 1, 7), 16, 10
    ).cast("long")


def minhash_signature(sh: Column, num_hashes: int) -> Column:
    """MinHash signature: array<long> of minima of the Carter-Wegman
    family h_i(s) = (h1(s) + i*h2(s)) mod 2^28 over the shingle set —
    TWO md5s per shingle instead of one per hash function (a per-seed-md5
    variant dominated the dedup wall clock ~12x). Null shingles → null
    signature (short docs opt out of LSH)."""
    h1s = F.transform(sh, lambda s: hash28(s, "mh1"))
    h2s = F.transform(sh, lambda s: hash28(s, "mh2"))

    def sig_i(i: int) -> Column:
        if i == 0:
            return F.array_min(h1s)
        return F.array_min(
            F.zip_with(h1s, h2s, lambda a, b: (a + F.lit(i) * b) % MINHASH_MOD)
        )

    return F.when(
        sh.isNotNull(), F.array(*[sig_i(i) for i in range(num_hashes)])
    )


def duck_minhash_item_sql(i: int) -> str:
    """DuckDB fragment for sig[i] over a shingle-list column ``sh`` —
    replicates :func:`minhash_signature` exactly."""
    h1 = "('0x' || substring(md5('mh1:' || s), 1, 7))::BIGINT"
    h2 = "('0x' || substring(md5('mh2:' || s), 1, 7))::BIGINT"
    if i == 0:
        return f"list_min(list_transform(sh, s -> {h1}))"
    return (
        f"list_min(list_transform(sh, s -> ({h1} + {i} * {h2}) % {MINHASH_MOD}))"
    )


def duck_shingles_sql(toks: str, k: int = 3) -> str:
    """DuckDB fragment: k-token shingles over a (1-based) token-list column
    named ``toks``; mirrors :func:`shingles` exactly."""
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, len({toks}) - {k - 2}), i -> {parts}) END"
    )


def max_multiplicity(arr: Column) -> Column:
    """Max count of any single element in ``arr`` — a per-row
    run-length maximum over the sorted array (one ``aggregate`` fold,
    O(len log len), zero shuffle). Replaces the explode → groupBy →
    max plan for per-document top-gram counts: same result, but the
    corpus never shuffles and the whole computation stays a narrow
    map stage at 100 TB. NULL/empty arrays count 0."""
    s = F.array_sort(arr)
    folded = F.aggregate(
        s,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(a["prev"].isNotNull() & (a["prev"] == x), a["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(
                    a["prev"].isNotNull() & (a["prev"] == x), a["run"] + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return F.coalesce(folded["best"], F.lit(0))


def spread_for_cpu(df):
    """Repartition a narrow text relation up to the session's core
    count when the scan yields fewer splits.

    Compressed text is tiny relative to the per-row work downstream
    (shingling expands bytes ~10-50x), so both the file-split planner
    and AQE's byte-based coalescing under-parallelize CPU-heavy gram
    stages — a 584 KB corpus file plans as ONE task on 32 cores. The
    explicit numPartitions is respected by AQE. At warehouse scale the
    scan already yields >= cores splits and this is a no-op."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)
