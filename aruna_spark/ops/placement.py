"""Integer-only weighted rendezvous placement primitives.

Portable re-expression of ``operations/src/placement/selector.rs``:

- ``selector_hash`` (selector.rs:15-25): blake3 of
  ``domain || role || subject || id``, first 8 bytes big-endian,
  forced nonzero via ``| 1``. Here: md5-derived (the repo's portable
  hash family — reproducible in DuckDB SQL), truncated to **30 bits**,
  same ``| 1`` forcing, with a ``'|'`` separator between subject and id
  (the reference's ids are fixed-width so it needs none).
- ``neg_log2_q24`` (selector.rs:27-47 ``neg_log2_q48``): exact
  fixed-point ``-log2(h / 2^HASH_BITS)`` by normalize-then-repeated-
  squaring bit peel — the SAME algorithm, scaled from UQ16.48 over u64
  hashes to **Q6.24 over 30-bit hashes** so every intermediate (x·x <
  2^60, L·w < 2^63) fits a SIGNED int64: Spark and DuckDB have no u64
  or u128, and determinism-on-every-platform is the whole contract
  (selector.rs:3-4), so the widths shrink rather than the arithmetic
  changing. Pinned against the float reference in tests exactly like
  the reference's own ``neg_log2_matches_float_reference``.
- the weighted-rendezvous comparator (selector.rs:54-70
  ``rank_weighted``): ``i`` precedes ``j`` iff ``L_i·w_j < L_j·w_i``,
  ties by ``(L, id)`` ascending — zero-weight candidates sort after
  every positive one.

Everything is a pure column expression (one ``F.aggregate`` fold per
hash — no Python UDF, no shuffle); the DuckDB mirror replays the same
fold as a recursive CTE, an independent mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PLACEMENT_DOMAIN = "aruna-placement-rendezvous-v3"  # selector.rs:6
ROLE_LOCATION = "L"  # selector.rs:8
ROLE_NODE = "N"  # selector.rs:9
ROLE_SHARD = "S"  # selector.rs:10

HASH_BITS = 30  # scaled from the reference's 64 (see module doc)
FRAC_BITS = 24  # scaled from the reference's 48
_TOP = 1 << (HASH_BITS - 1)  # normalized mantissa lower bound 2^29
_FULL = 1 << HASH_BITS  # 2^30


def selector_hash(role: str, subject: Column, cand_id: Column) -> Column:
    """30-bit rendezvous hash of (role, subject, id), forced nonzero.

    The seed excludes any epoch — a pure function of the inputs alone
    (selector.rs:12-14), so a rebalance never rewrites it.
    """
    digest = F.md5(
        F.concat(F.lit(PLACEMENT_DOMAIN + role), subject, F.lit("|"), cand_id)
    )
    h = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % F.lit(_FULL)
    return h.bitwiseOR(F.lit(1).cast("long"))


def duck_selector_hash(role: str, subject: str, cand_id: str) -> str:
    """DuckDB fragment mirroring :func:`selector_hash` exactly."""
    return (
        f"(('0x' || substring(md5('{PLACEMENT_DOMAIN}{role}' || {subject}"
        f" || '|' || {cand_id}), 1, 8))::BIGINT % {_FULL}) | 1"
    )


def neg_log2_q24(h: Column) -> Column:
    """Exact Q6.24 fixed-point ``-log2(h / 2^30)`` for nonzero ``h``.

    One fold of 29 + 24 steps: conditional doublings normalize ``h`` to
    a mantissa ``x ∈ [2^29, 2^30)`` counting ``z``; then 24 squarings
    peel fraction bits (``x² ≥ 2`` in mantissa terms yields a set bit
    and halves back into range — selector.rs:27-47 verbatim, narrower).
    Result ``((z+1) << 24) - f ∈ (0, 30·2^24]``.
    """
    steps = F.sequence(F.lit(1), F.lit(HASH_BITS - 1 + FRAC_BITS))
    init = F.struct(
        h.cast("long").alias("x"),
        F.lit(0).cast("long").alias("z"),
        F.lit(0).cast("long").alias("f"),
    )

    def step(acc: Column, i: Column) -> Column:
        norm = acc["x"] < _TOP
        normalize = F.struct(
            F.when(norm, acc["x"] * 2).otherwise(acc["x"]).alias("x"),
            F.when(norm, acc["z"] + 1).otherwise(acc["z"]).alias("z"),
            acc["f"].alias("f"),
        )
        y = F.shiftright(acc["x"] * acc["x"], HASH_BITS - 1)
        carry = y >= _FULL
        square = F.struct(
            F.when(carry, F.shiftright(y, 1)).otherwise(y).alias("x"),
            acc["z"].alias("z"),
            F.when(carry, acc["f"] * 2 + 1)
            .otherwise(acc["f"] * 2)
            .alias("f"),
        )
        return F.when(i <= HASH_BITS - 1, normalize).otherwise(square)

    return F.aggregate(
        steps,
        init,
        step,
        lambda acc: (acc["z"] + 1) * F.lit(1 << FRAC_BITS) - acc["f"],
    )


def duck_neg_log2_cte(
    pairs_cte: str, hash_expr: str, keys: str, prefix: str = "n"
) -> str:
    """Recursive-CTE DuckDB mirror of :func:`neg_log2_q24`.

    ``pairs_cte``: name of a CTE with one row per candidate pair;
    ``hash_expr``: SQL for the 30-bit hash over its columns; ``keys``:
    comma-separated pass-through key columns; ``prefix`` namespaces the
    emitted CTEs (``<prefix>_it``, ``<prefix>_scored``) so two roles
    coexist in one WITH RECURSIVE. The fold that Spark runs as one
    ``aggregate`` expression replays here as 53 recursive steps — an
    independent mechanism computing the identical integers.
    """
    total = HASH_BITS - 1 + FRAC_BITS
    it, scored = f"{prefix}_it", f"{prefix}_scored"
    return f"""
    {it}(i, {keys}, x, z, f) AS (
      SELECT 0, {keys}, {hash_expr}, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM {pairs_cte}
      UNION ALL
      SELECT i + 1, {keys},
        CASE WHEN i < {HASH_BITS - 1}
             THEN CASE WHEN x < {_TOP} THEN x * 2 ELSE x END
             ELSE CASE WHEN (x * x) // {_TOP} >= {_FULL}
                  THEN (x * x) // {_TOP} // 2 ELSE (x * x) // {_TOP} END
        END,
        CASE WHEN i < {HASH_BITS - 1}
             THEN CASE WHEN x < {_TOP} THEN z + 1 ELSE z END ELSE z END,
        CASE WHEN i < {HASH_BITS - 1} THEN f
             ELSE CASE WHEN (x * x) // {_TOP} >= {_FULL}
                  THEN f * 2 + 1 ELSE f * 2 END
        END
      FROM {it} WHERE i < {total}
    ),
    {scored} AS (
      SELECT {keys}, (z + 1) * {1 << FRAC_BITS} - f AS l_score
      FROM {it} WHERE i = {total}
    )"""


def rendezvous_cmp(left: Column, right: Column) -> Column:
    """Comparator for ``array_sort``: best candidate first.

    Fields required on both structs: ``l`` (Q6.24 score), ``w``
    (weight), ``id`` (tie-break bytes). Implements selector.rs:63-69:
    cross-multiplied score-over-weight, then score, then id.
    """
    lhs = left["l"] * right["w"]
    rhs = right["l"] * left["w"]
    return (
        F.when(lhs < rhs, -1)
        .when(lhs > rhs, 1)
        .when(left["l"] < right["l"], -1)
        .when(left["l"] > right["l"], 1)
        .when(left["id"] < right["id"], -1)
        .when(left["id"] > right["id"], 1)
        .otherwise(0)
    )


def duck_precedes_sql(li: str, wi: str, idi: str, lj: str, wj: str, idj: str) -> str:
    """DuckDB predicate: candidate i precedes candidate j (strictly)."""
    return (
        f"({li} * {wj} < {lj} * {wi}"
        f" OR ({li} * {wj} = {lj} * {wi}"
        f"     AND ({li} < {lj} OR ({li} = {lj} AND {idi} < {idj}))))"
    )


SHARD_DOMAIN = "aruna-shard-v1"  # core structs/placement.rs:162


def shard_for_subject(subject: Column, shard_count: int) -> Column:
    """Shard a subject hashes into for ``shard_count`` shards
    (``core/src/structs/placement.rs:160-168``): hash of a domain tag
    concatenated with the subject, first 32 bits, masked into
    ``0..shard_count`` (power of two). md5-derived here (same scaling
    note as the module doc); all records of one logical document share
    a subject and so land in one shard.
    """
    assert shard_count & (shard_count - 1) == 0, "power of two"
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(SHARD_DOMAIN), subject)), 1, 8),
        16,
        10,
    ).cast("long")
    return h.bitwiseAND(F.lit(shard_count - 1)).cast("int")


def duck_shard_sql(subject: str, shard_count: int) -> str:
    """DuckDB mirror of :func:`shard_for_subject`."""
    return (
        f"CAST((('0x' || substring(md5('{SHARD_DOMAIN}' || {subject}), 1, 8))"
        f"::BIGINT & {shard_count - 1}) AS INT)"
    )
