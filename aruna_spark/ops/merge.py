"""MERGE INTO semantics on plain DataFrames (upsert reconciliation).

The reference applies its event log incrementally: the projector reads new
create/update events and folds them into existing registry rows in place
(``operations/src/metadata/projector.rs:176-292`` — read-modify-write per
``document_id``, idempotent under replay). A lakehouse engine expresses the
same thing as ``MERGE INTO registry USING batch ON key WHEN MATCHED UPDATE
... WHEN NOT MATCHED INSERT ...``.

Spark-first formulation: MERGE over parquet is one **full-outer join on the
merge key** followed by per-column reconciliation — exactly what Delta's
low-shuffle merge compiles to under the hood. One shuffle on the key (or
zero if both sides are bucketed on it), no driver-side loop, no row-at-a-
time UDFs; at 100 TB the batch side is typically tiny relative to the
target, so AQE turns the join broadcast-side automatically.

API contract (three MERGE branches):

- WHEN MATCHED        → ``when_matched[col]`` expressions over ``tgt``/``src``
  aliases (default: take the source value);
- WHEN MATCHED AND d  → ``when_matched_delete`` predicate drops the row;
- WHEN NOT MATCHED    → source row inserted (``insert_unmatched=False``
  turns the merge into a pure update join);
- target rows with no source match always survive untouched.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_FLAG = "__merge_has_tgt"
_S_FLAG = "__merge_has_src"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    when_matched: Mapping[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    insert_unmatched: bool = True,
) -> DataFrame:
    """Reconcile ``source`` into ``target`` on ``keys`` (MERGE INTO).

    ``when_matched`` maps output column → expression over the joined row;
    reference target/source columns as ``F.col("tgt.x")`` / ``F.col("src.x")``.
    Columns not listed default to the source value when matched (classic
    UPDATE SET *). ``when_matched_delete`` is a predicate over the same
    aliases; matched rows satisfying it are dropped (WHEN MATCHED DELETE).

    Both sides must share the schema (same columns); the output preserves
    the target column order.
    """
    cols = target.columns
    if set(source.columns) != set(cols):
        raise ValueError(
            f"merge schema mismatch: target {cols} vs source {source.columns}"
        )
    when_matched = dict(when_matched or {})

    tgt = target.withColumn(_T_FLAG, F.lit(True)).alias("tgt")
    src = source.withColumn(_S_FLAG, F.lit(True)).alias("src")
    cond = [F.col(f"tgt.{k}").eqNullSafe(F.col(f"src.{k}")) for k in keys]
    joined = tgt.join(src, cond, "full_outer")

    has_t = F.col(f"tgt.{_T_FLAG}").isNotNull()
    has_s = F.col(f"src.{_S_FLAG}").isNotNull()
    matched = has_t & has_s

    keep = has_t & ~has_s  # target-only rows always survive
    if insert_unmatched:
        keep = keep | (has_s & ~has_t)
    if when_matched_delete is not None:
        keep = keep | (matched & ~when_matched_delete)
    else:
        keep = keep | matched

    out_cols = []
    for c in cols:
        t_c, s_c = F.col(f"tgt.{c}"), F.col(f"src.{c}")
        if c in keys:
            e = F.coalesce(t_c, s_c)
        else:
            upd = when_matched.get(c, s_c)
            e = (
                F.when(matched, upd)
                .when(has_s, s_c)
                .otherwise(t_c)
            )
        out_cols.append(e.alias(c))
    return joined.filter(keep).select(*out_cols)
