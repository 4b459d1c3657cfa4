"""Smoke + invariant tests for the generic relational operator queries."""

from __future__ import annotations

import pytest

from aruna_spark.queries import REGISTRY, load_all

load_all()


@pytest.mark.parametrize("name", [n for n in REGISTRY if n.startswith("rel_")])
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, "query must project named columns"
    # re-run returns same row count (determinism at a fixed input)
    assert len(fn(spark, sf_dir).collect()) == len(rows)


def test_latest_order_unique_per_customer(spark, sf_dir):
    fn, _ = REGISTRY["rel_latest_order_per_customer"]
    df = fn(spark, sf_dir)
    assert df.count() == df.select("o_custkey").distinct().count()


def test_keyset_pages_disjoint_and_ordered(spark, sf_dir):
    from aruna_spark.catalog import load_table
    from aruna_spark.ops.pagination import keyset_page

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    seen = set()
    cursor = None
    for _ in range(3):
        page, cursor = keyset_page(
            orders, sort_keys=["o_orderdate", "o_orderkey"], page_size=10, after=cursor
        )
        keys = [r.o_orderkey for r in page.collect()]
        assert not (set(keys) & seen), "pages must not overlap"
        seen.update(keys)
        if cursor is None:
            break
    assert len(seen) == 30
