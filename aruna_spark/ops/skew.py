"""Skew-salted equi-join: pre-AQE mitigation for hot keys.

At 100 TB a handful of hot join keys (a viral document's backlinks, one
giant collection, the empty-language bucket) can put most of a join's rows
into one shuffle partition and stall the stage on a single task. AQE's
skew-join split (enabled in :mod:`aruna_spark.session`) handles sort-merge
joins at runtime; this operator is the *explicit* form — needed when AQE
cannot help (e.g. the skewed side feeds an aggregation, or the join is
inside a cached subplan) and as the documented recipe for the layout-level
fix.

Mechanics (classic salting):

- the BIG (skewed) side gets a deterministic salt in ``[0, salt)`` derived
  by hashing the whole row — spreading one hot key over ``salt`` shuffle
  partitions;
- the SMALL side is exploded ``salt``-fold so every (key, salt) pair still
  finds its match;
- the join key becomes ``(key..., salt)``; results are identical to the
  unsalted join (verified by the parity test), only the partitioning
  changes.

Use when the small side is modest (its shuffle grows ``salt``×) but the
big side's key histogram is pathological. Salting is deterministic (xxhash
of row content, no ``rand()``) so re-runs and speculative retries place
rows identically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key spreading.

    Result columns match ``big.join(small, on, how)`` (join keys once,
    then the non-key columns of both sides). Supported ``how``: inner and
    left outer — the shapes where salting is well-defined without a
    post-merge (the small side is replicated, so right/full would
    duplicate its unmatched rows).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    keys = [*on, _SALT]
    return salted_big.join(salted_small, keys, how).drop(_SALT)
