"""Materialized triples store: partition pruning + result parity."""

from __future__ import annotations

from aruna_spark.ingest.doc_triples import (
    load_triples,
    materialize_triples,
    load_materialized_triples,
)
from aruna_spark.sparql.engine import SparqlEngine

Q = """
SELECT ?s ?size WHERE { ?s schema:contentSize ?size }
ORDER BY DESC(?size) ?s LIMIT 20
"""


def test_materialized_equals_derived(spark, sf_dir, tmp_path):
    path = str(tmp_path / "triples")
    materialize_triples(load_triples(spark, sf_dir), path)
    derived = SparqlEngine(spark, load_triples(spark, sf_dir))
    stored = SparqlEngine(spark, load_materialized_triples(spark, path))
    a = [tuple(r) for r in derived.query_flat(Q).collect()]
    b = [tuple(r) for r in stored.query_flat(Q).collect()]
    assert a == b


def test_constant_predicate_prunes_partitions(spark, sf_dir, tmp_path):
    """A constant-predicate pattern must become a PartitionFilters entry
    on the scan — the plan reads ONE predicate directory, not the table."""
    path = str(tmp_path / "triples")
    materialize_triples(load_triples(spark, sf_dir), path)
    eng = SparqlEngine(spark, load_materialized_triples(spark, path))
    df = eng.query("SELECT ?s ?size WHERE { ?s schema:contentSize ?size }")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "contentSize" in plan.split("PartitionFilters:", 1)[1][:400]
