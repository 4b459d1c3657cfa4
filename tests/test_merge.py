"""MERGE INTO reconciliation: branch coverage + projector associativity."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.ops.merge import merge_into


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_three_branches(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    src = spark.createDataFrame(
        [(2, "B", 5), (3, "C", 7), (4, "d", 40)], "k int, v string, n int"
    )
    out = merge_into(
        tgt,
        src,
        ["k"],
        when_matched={"n": F.col("tgt.n") + F.col("src.n")},
    )
    # 1: target-only kept; 2,3: matched (v from src, n summed); 4: inserted
    assert _rows(out) == {
        (1, "a", 10),
        (2, "B", 25),
        (3, "C", 37),
        (4, "d", 40),
    }


def test_merge_matched_delete_and_no_insert(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, v string, n int"
    )
    src = spark.createDataFrame(
        [(2, "tomb", 0), (9, "new", 99)], "k int, v string, n int"
    )
    out = merge_into(
        tgt,
        src,
        ["k"],
        when_matched_delete=F.col("src.v") == "tomb",
        insert_unmatched=False,
    )
    assert _rows(out) == {(1, "a", 10)}


def test_merge_empty_batch_is_identity(spark):
    tgt = spark.createDataFrame([(1, "a", 10)], "k int, v string, n int")
    out = merge_into(tgt, tgt.limit(0), ["k"])
    assert _rows(out) == _rows(tgt)


def test_registry_merge_equals_full_replay(spark, sf_dir):
    """Merging disjoint log splits == replaying the whole log (the
    projector's associativity contract, projector.rs:176-292)."""
    from aruna_spark.queries.registry import registry_incremental_merge, _registry

    merged = registry_incremental_merge(spark, sf_dir)
    full = _registry(spark, sf_dir)
    assert _rows(merged) == _rows(full)
