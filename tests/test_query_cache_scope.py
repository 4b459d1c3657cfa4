"""Cache authorization-isolation tests (query_cache.rs parity).

The round-2 advisory flagged a real leak: a result cache keyed by query
text alone serves caller A's rows to caller B when their visible-graph
scopes differ. The reference keys local entries by (scope kind, scope
digest, query) and fan-out entries by credential digest + realm + shape
(``operations/src/metadata/query_cache.rs:99-146``, used at
``api.rs:2643-2672``). These tests pin that isolation end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.ingest.doc_triples import GRAPH_NS, load_triples
from aruna_spark.sparql.engine import (
    QueryCache,
    SparqlEngine,
    credential_digest,
    graphs_digest,
    local_key,
    remote_key,
)

Q = "SELECT ?s WHERE { ?s a schema:File } ORDER BY ?s LIMIT 5"


def _scoped_engine(spark, sf_dir, doc_ids):
    graphs = spark.createDataFrame(
        [(f"{GRAPH_NS}{i}",) for i in doc_ids], "graph_iri string"
    )
    return SparqlEngine(spark, load_triples(spark, sf_dir), graphs)


def test_shared_cache_does_not_leak_across_scopes(spark, sf_dir):
    """Two callers, one cache, different visible scopes: caller B must
    NOT be served caller A's cached rows."""
    cache = QueryCache(now_fn=lambda: 0.0)
    a = _scoped_engine(spark, sf_dir, range(1, 30))
    b = _scoped_engine(spark, sf_dir, range(30, 60))
    rows_a = a.execute(Q, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    rows_b = b.execute(Q, cache=cache)
    assert cache.misses == 2 and cache.hits == 0, "scope isolation broken"
    assert rows_a != rows_b  # disjoint scopes -> different answers
    # and each caller's OWN repeat is a hit
    assert a.execute(Q, cache=cache) is rows_a
    assert b.execute(Q, cache=cache) is rows_b
    assert cache.hits == 2


def test_identical_resolved_scope_shares_entry(spark, sf_dir):
    """Callers whose authorization resolved to the IDENTICAL graph set
    share an entry (query_cache.rs:99-101) — safe by construction."""
    cache = QueryCache(now_fn=lambda: 0.0)
    a = _scoped_engine(spark, sf_dir, range(1, 20))
    b = _scoped_engine(spark, sf_dir, range(1, 20))
    rows_a = a.execute(Q, cache=cache)
    assert b.execute(Q, cache=cache) is rows_a
    assert cache.hits == 1


def test_unscoped_sentinel_never_collides_with_real_scope(spark, sf_dir):
    cache = QueryCache(now_fn=lambda: 0.0)
    unscoped = SparqlEngine(spark, load_triples(spark, sf_dir))
    scoped = _scoped_engine(spark, sf_dir, range(1, 10))
    unscoped.execute(Q, cache=cache)
    scoped.execute(Q, cache=cache)
    assert cache.misses == 2 and cache.hits == 0


def test_unscoped_engines_over_different_substrates_never_share(
    spark, sf_dir, monkeypatch
):
    """The fan-out poisoning scenario distilled: two UNSCOPED engines
    over different triples relations (a shard slice vs the full corpus)
    must not share a cache entry — the key binds the substrate plan,
    not just the 'unrestricted' visibility sentinel."""
    from aruna_spark.sparql import engine as eng_mod

    fresh = QueryCache(now_fn=lambda: 0.0)
    monkeypatch.setattr(eng_mod, "_SHARED_CACHE", fresh)
    triples = load_triples(spark, sf_dir)
    num = F.regexp_extract("graph_iri", r"/(\d+)$", 1)
    shard = triples.filter((num != "") & (num.cast("long") % 2 == 0))
    full_rows = SparqlEngine(spark, triples).execute(Q)
    shard_rows = SparqlEngine(spark, shard).execute(Q)
    assert fresh.misses == 2 and fresh.hits == 0
    assert shard_rows != full_rows
    # identical substrate still shares (two fresh engine instances)
    again = SparqlEngine(spark, load_triples(spark, sf_dir)).execute(Q)
    assert again is full_rows and fresh.hits == 1


def test_substrates_differing_only_in_literals_never_share(
    spark, sf_dir
):
    """ADVICE r4: the old digest stripped every '#<digits>' from the
    analyzed plan, so two substrates whose ONLY difference is a literal
    like 'tag#1' vs 'tag#2' collided to one digest (cross-serving rows).
    The canonicalized-plan digest keeps literals intact while still
    normalizing Catalyst exprIds."""
    triples = load_triples(spark, sf_dir)
    a = SparqlEngine(
        spark, triples.filter(F.col("object_value") != "tag#1")
    )
    b = SparqlEngine(
        spark, triples.filter(F.col("object_value") != "tag#2")
    )
    assert a.substrate_digest() != b.substrate_digest()
    # and exprId renumbering alone still shares: two fresh loads of the
    # same relation get different exprIds but the same canonical plan
    c = SparqlEngine(spark, load_triples(spark, sf_dir))
    d = SparqlEngine(spark, load_triples(spark, sf_dir))
    assert c.substrate_digest() == d.substrate_digest()


def test_default_path_uses_shared_cache(spark, sf_dir, monkeypatch):
    """execute() with no cache argument consults the process-wide shared
    cache: two engine instances with the identical resolved scope hit
    one entry, and a third engine with a different scope stays isolated
    — all on the DEFAULT path (VERDICT r3 next-round #7)."""
    from aruna_spark.sparql import engine as eng_mod

    fresh = QueryCache(now_fn=lambda: 0.0)
    monkeypatch.setattr(eng_mod, "_SHARED_CACHE", fresh)
    a = _scoped_engine(spark, sf_dir, range(1, 20))
    b = _scoped_engine(spark, sf_dir, range(1, 20))
    c = _scoped_engine(spark, sf_dir, range(20, 40))
    rows_a = a.execute(Q)
    assert fresh.misses == 1 and fresh.hits == 0
    assert b.execute(Q) is rows_a, "identical scope must share the entry"
    assert fresh.hits == 1
    rows_c = c.execute(Q)
    assert fresh.misses == 2, "different scope must not hit"
    assert rows_c != rows_a
    # explicit opt-out bypasses the shared cache entirely
    a.execute(Q, cache=None)
    assert fresh.hits == 1 and fresh.misses == 2


def test_eager_and_lazy_keys_are_distinct():
    scope = graphs_digest(["g1", "g2"])
    assert local_key("eager", scope, Q) != local_key("lazy", scope, Q)
    # same kind + scope + query -> same key; whitespace-insensitive
    assert local_key("lazy", scope, Q) == local_key("lazy", scope, f"  {Q}  ")


def test_eager_key_digests_the_request_graphs(spark, sf_dir):
    cache = QueryCache(now_fn=lambda: 0.0)
    eng = _scoped_engine(spark, sf_dir, range(1, 10))
    eng.execute(Q, cache=cache, graph_iris=[f"{GRAPH_NS}1"])
    eng.execute(Q, cache=cache, graph_iris=[f"{GRAPH_NS}2"])
    assert cache.misses == 2
    eng.execute(Q, cache=cache, graph_iris=[f"{GRAPH_NS}1"])
    assert cache.hits == 1


def test_credential_digest_hashes_not_stores():
    d1 = credential_digest(auth='{"user":"a"}', bearer_token="tok-1")
    d2 = credential_digest(auth='{"user":"a"}', bearer_token="tok-2")
    d3 = credential_digest(auth='{"user":"a"}', bearer_token="tok-1")
    assert d1 != d2 and d1 == d3
    assert "tok-1" not in d1  # only a hash leaves this function
    # anonymous sentinel is stable and distinct from any real token
    anon = credential_digest()
    assert anon == credential_digest() and anon != d1


def test_remote_key_partitions_by_credential_and_shape():
    """Fan-out cache entries are credential-partitioned: remote nodes
    authorize on the forwarded credential, so two callers never share
    (api.rs:2643-2646)."""
    base = dict(
        distributed=True,
        realm_id="realm-1",
        credential=credential_digest(bearer_token="tok-a"),
        graph_iris=["g1", "g2"],
        sparql=Q,
        allow_partial=False,
        target_nodes=None,
    )
    k = remote_key(**base)
    assert k == remote_key(**base)
    assert k != remote_key(**{**base, "credential": credential_digest(bearer_token="tok-b")})
    assert k != remote_key(**{**base, "realm_id": "realm-2"})
    assert k != remote_key(**{**base, "distributed": False})
    assert k != remote_key(**{**base, "graph_iris": ["g1"]})
    assert k != remote_key(**{**base, "graph_iris": None})
    assert k != remote_key(**{**base, "allow_partial": True})
    assert k != remote_key(**{**base, "target_nodes": ["n1"]})
    assert k != remote_key(**{**base, "sparql": Q + " extra"})
    assert k == remote_key(**{**base, "sparql": f"  {Q}  "})  # ws-normalized
    # graph order does not matter (unordered set digest)
    assert k == remote_key(**{**base, "graph_iris": ["g2", "g1"]})


def test_distributed_cache_cross_credential_isolation():
    """End-to-end: one shared cache, two credentials, same query —
    entries never cross."""
    cache = QueryCache(now_fn=lambda: 0.0)
    key_a = remote_key(True, "realm", credential_digest(bearer_token="a"), None, Q)
    key_b = remote_key(True, "realm", credential_digest(bearer_token="b"), None, Q)
    cache.put(key_a, [("rows-for-a",)], 10, generation=1)
    assert cache.get(key_b, generation=1) is None
    assert cache.get(key_a, generation=1) == [("rows-for-a",)]
    # generation bump invalidates both partitions identically
    cache.put(key_b, [("rows-for-b",)], 10, generation=1)
    assert cache.get(key_a, generation=2) is None
    assert cache.get(key_b, generation=2) is None
