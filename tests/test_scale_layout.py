"""Scale-layout operators: bucketed co-located joins, skew salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.ingest.doc_triples import (
    load_triples,
    materialize_triples_bucketed,
)
from aruna_spark.ops.skew import salted_join
from aruna_spark.sparql.terms import SCHEMA


@pytest.fixture()
def no_adaptive(spark):
    """Pin the static planner so plan-shape assertions are deterministic."""
    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_bucketed_subject_join_has_no_exchange(spark, sf_dir, tmp_path, no_adaptive):
    """Two predicate-pruned scans of the subject-bucketed table joined on
    subject must plan with ZERO shuffle — the co-located enrichment join."""
    materialize_triples_bucketed(
        load_triples(spark, sf_dir), "triples_b", str(tmp_path / "tb"), buckets=8
    )
    t = spark.table("triples_b")
    names = t.filter(F.col("predicate") == SCHEMA + "name").select(
        "subject", F.col("object_value").alias("title")
    )
    sizes = t.filter(F.col("predicate") == SCHEMA + "contentSize").select(
        "subject", F.col("object_value").alias("size")
    )
    joined = names.join(sizes, "subject")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SelectedBucketsCount" in plan
    # and the join is real: every doc has both name and contentSize
    docs = t.select("graph_iri").distinct().count()
    assert joined.count() > 0.5 * docs


def test_bucketed_equals_unbucketed_results(spark, sf_dir, tmp_path):
    materialize_triples_bucketed(
        load_triples(spark, sf_dir), "triples_b2", str(tmp_path / "tb2"), buckets=8
    )
    cols = [
        "graph_iri", "subject", "predicate",
        "object_kind", "object_value", "object_datatype", "object_lang",
    ]
    a = {tuple(r) for r in spark.table("triples_b2").select(*cols).collect()}
    b = {tuple(r) for r in load_triples(spark, sf_dir).select(*cols).collect()}
    assert a == b


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting never changes results — only shuffle placement. Exercised
    on a deliberately skewed key (lang: one value dominates documents)."""
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    dim = (
        docs.groupBy("lang").count()
        .select("lang", F.col("count").alias("lang_total"))
    )
    plain = docs.join(dim, "lang").select("doc_id", "lang", "lang_total")
    salted = salted_join(docs, dim, ["lang"]).select("doc_id", "lang", "lang_total")
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_salted_left_join_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold", "orphan") for i in range(5)],
        "k string, i int",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, d int")
    out = salted_join(big, small, ["k"], how="left")
    plain = big.join(small, ["k"], "left")
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_salted_join_spreads_hot_key(spark):
    """The hot key must land in >1 shuffle partition after salting."""
    big = spark.createDataFrame(
        [("hot", i) for i in range(2000)] + [("cold", 0)], "k string, i int"
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, d int")
    out = salted_join(big, small, ["k"], salt=8)
    # count distinct salts actually used for the hot key
    salted = big.withColumn(
        "s", F.pmod(F.xxhash64(F.col("k"), F.col("i")), F.lit(8))
    )
    n_salts = salted.filter(F.col("k") == "hot").select("s").distinct().count()
    assert n_salts > 1
    assert out.count() == 2001
