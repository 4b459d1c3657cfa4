"""Distributed fan-out: shape gate, shard merge == global answer, caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.ingest.doc_triples import load_triples
from aruna_spark.ops.fanout import (
    MAX_NODES,
    UnionUnsafeError,
    fanout_select,
)
from aruna_spark.sparql.engine import SparqlEngine

Q = "SELECT DISTINCT ?s WHERE { ?s a schema:File }"


def _shard_engines(spark, sf_dir, n=3):
    triples = load_triples(spark, sf_dir)
    num = F.regexp_extract("graph_iri", r"/(\d+)$", 1)
    shards = []
    for i in range(n):
        shard = triples.filter(
            (num != "") & (num.cast("long") % n == i)
        )
        shards.append(SparqlEngine(spark, shard))
    return triples, shards


def test_fanout_merge_equals_global(spark, sf_dir):
    triples, shards = _shard_engines(spark, sf_dir)
    merged = set(fanout_select(shards, Q))
    global_rows = {
        tuple(r)
        for r in SparqlEngine(spark, triples).execute(Q)
    }
    assert merged == global_rows and merged


def test_fanout_respects_limit(spark, sf_dir):
    _, shards = _shard_engines(spark, sf_dir)
    rows = fanout_select(shards, Q + " LIMIT 7")
    assert len(rows) == 7


def test_fanout_rejects_unsafe_shape(spark, sf_dir):
    _, shards = _shard_engines(spark, sf_dir)
    with pytest.raises(UnionUnsafeError):
        fanout_select(shards, "SELECT ?s WHERE { ?s a schema:File }")


def test_fanout_rejects_too_many_nodes(spark, sf_dir):
    _, shards = _shard_engines(spark, sf_dir, n=2)
    fake = shards * ((MAX_NODES // 2) + 1)
    with pytest.raises(ValueError, match="nodes"):
        fanout_select(fake, Q)
