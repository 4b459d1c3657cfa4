"""SPARQL engine tests: governance rules, parse errors, end-to-end queries.

Mirrors the reference's validation behavior (SELECT/ASK only, SERVICE
rejected — ``operations/src/metadata/api.rs:1972-2090``; 64 KiB cap and
10k-row result cap — ``handle.rs:94-97``) plus a few end-to-end checks at
sf0.001.
"""

from __future__ import annotations

import pytest

from aruna_spark.sparql.engine import MAX_RESULT_ROWS, SparqlEngine
from aruna_spark.sparql.parser import (
    SparqlSyntaxError,
    UnsupportedQueryError,
    parse,
)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from aruna_spark.ingest.doc_triples import load_triples

    return SparqlEngine(spark, load_triples(spark, sf_dir).cache())


# ----------------------------------------------------------- governance
def test_construct_rejected():
    with pytest.raises(UnsupportedQueryError):
        parse("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")


def test_describe_rejected():
    with pytest.raises(UnsupportedQueryError):
        parse("DESCRIBE <urn:aruna:doc:1>")


def test_service_rejected():
    with pytest.raises(UnsupportedQueryError):
        parse(
            "SELECT ?s WHERE { SERVICE <http://example.org/sparql> { ?s ?p ?o } }"
        )


def test_query_size_cap():
    big = "SELECT ?s WHERE { ?s ?p ?o } # " + "x" * (64 * 1024)
    with pytest.raises(UnsupportedQueryError):
        parse(big)


def test_syntax_error():
    with pytest.raises(SparqlSyntaxError):
        parse("SELECT ?s WHERE { ?s ?p }")


def test_result_row_cap(engine):
    df = engine.query("SELECT ?s ?p ?o WHERE { ?s ?p ?o }")
    # plan carries the 10k cap (handle.rs:95) as a limit node
    assert "GlobalLimit" in df._jdf.queryExecution().optimizedPlan().toString() or (
        df.count() <= MAX_RESULT_ROWS
    )


# ---------------------------------------------------------- end-to-end
def test_bgp_join_shares_subject(engine):
    rows = engine.query_flat(
        """
        SELECT ?s ?name WHERE {
          ?s a schema:Dataset ; schema:name ?name .
        } ORDER BY ?s LIMIT 5
        """
    ).collect()
    assert rows
    for r in rows:
        assert r.s.startswith("urn:aruna:doc:")
        assert r.name.startswith("doc-")


def test_optional_yields_nulls(engine):
    rows = engine.query_flat(
        """
        SELECT ?s ?d WHERE {
          ?s a schema:File .
          OPTIONAL { ?s schema:description ?d }
        }
        """
    ).collect()
    assert any(r.d is None for r in rows), "short docs must appear with unbound ?d"
    assert any(r.d is not None for r in rows)


def test_ask_true_and_false(engine):
    assert engine.query("ASK { ?s a schema:Collection }").collect()[0].ask is True
    assert (
        engine.query('ASK { ?s schema:name "no-such-name-anywhere" }')
        .collect()[0]
        .ask
        is False
    )


def test_path_plus_reaches_root(engine):
    rows = engine.query_flat(
        """
        SELECT ?s ?anc WHERE {
          ?s schema:isPartOf+ ?anc .
          FILTER(STRSTARTS(STR(?s), "urn:aruna:collection:"))
        }
        """
    ).collect()
    pairs = {(r.s, r.anc) for r in rows}
    # chain: 3 -> 1 -> 0 means (3,0) must be present (2-hop transitivity)
    assert ("urn:aruna:collection:3", "urn:aruna:collection:1") in pairs
    assert ("urn:aruna:collection:3", "urn:aruna:collection:0") in pairs


def test_fts_match_and_score(engine):
    rows = engine.query_flat(
        """
        SELECT ?s ?score WHERE {
          ?s fts:match "spark" ; fts:score ?score .
        } ORDER BY DESC(?score) ?s LIMIT 5
        """
    ).collect()
    assert rows, "fts:match must bind matching subjects"
    assert all(r.score > 0 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_fts_score_without_match_rejected(engine):
    from aruna_spark.sparql.compiler import SparqlCompileError

    with pytest.raises(SparqlCompileError):
        engine.query("SELECT ?s WHERE { ?s fts:score ?v }").collect()


def test_lateral_topk_per_group(engine):
    rows = engine.query_flat(
        """
        SELECT ?lang ?s ?size WHERE {
          { SELECT DISTINCT ?lang WHERE { ?x schema:inLanguage ?lang } }
          LATERAL {
            SELECT ?lang ?s ?size WHERE {
              ?s schema:inLanguage ?lang ; schema:contentSize ?size .
            } ORDER BY DESC(?size) ?s LIMIT 2
          }
        }
        """
    ).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(int(r.size))
    assert per_lang and all(len(v) <= 2 for v in per_lang.values())
    assert all(v == sorted(v, reverse=True) for v in per_lang.values())


def test_execute_result_byte_cap(engine):
    from aruna_spark.sparql.engine import ResultTooLargeError

    with pytest.raises(ResultTooLargeError):
        engine.execute(
            "SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 2000", max_bytes=1024
        )


def test_execute_deadline_cancels(engine):
    from aruna_spark.sparql.engine import QueryDeadlineError

    # unbounded-variable cross joins: |triples|^4 intermediate rows with a
    # final aggregate, so it cannot finish before any realistic deadline
    heavy = """
        SELECT (COUNT(?a) AS ?n) WHERE {
          ?a ?p1 ?x . ?b ?p2 ?y . ?c ?p3 ?z . ?d ?p4 ?w .
        }
    """
    with pytest.raises(QueryDeadlineError):
        engine.execute(heavy, deadline_secs=0.2)


def test_limit_offset_pagination(engine):
    q = "SELECT ?s WHERE { ?s a schema:File } ORDER BY ?s LIMIT 5"
    q_off = "SELECT ?s WHERE { ?s a schema:File } ORDER BY ?s LIMIT 5 OFFSET 5"
    first = [r.s for r in engine.query_flat(q).collect()]
    second = [r.s for r in engine.query_flat(q_off).collect()]
    assert len(first) == 5 and len(second) == 5
    assert not set(first) & set(second)


def test_query_cache_hit_ttl_eviction(engine):
    from aruna_spark.sparql.engine import QueryCache

    clock = [0.0]
    cache = QueryCache(max_entries=2, ttl_secs=30.0, now_fn=lambda: clock[0])
    q = "SELECT ?s WHERE { ?s a schema:File } ORDER BY ?s LIMIT 3"
    first = engine.execute(q, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    second = engine.execute(q, cache=cache)
    assert cache.hits == 1 and second is first  # served from cache
    # whitespace-insensitive fingerprint
    engine.execute("SELECT ?s WHERE { ?s a schema:File }\n ORDER BY ?s LIMIT 3",
                   cache=cache)
    assert cache.hits == 2
    # TTL expiry forces recompute
    clock[0] = 31.0
    third = engine.execute(q, cache=cache)
    assert third is not first and cache.misses == 2
    # LRU eviction at capacity 2
    engine.execute("SELECT ?s WHERE { ?s a schema:Dataset } LIMIT 2", cache=cache)
    engine.execute("SELECT ?s WHERE { ?s a schema:Collection } LIMIT 2", cache=cache)
    assert cache.get(q) is None  # oldest evicted


def test_query_cache_byte_budget():
    from aruna_spark.sparql.engine import QueryCache

    cache = QueryCache(max_entries=10, max_bytes=100, now_fn=lambda: 0.0)
    cache.put("q1", ["a"], 60)
    cache.put("q2", ["b"], 60)  # over budget -> q1 evicted
    assert cache.get("q1") is None and cache.get("q2") == ["b"]
    cache.put("huge", ["x"], 1000)  # larger than the whole budget
    assert cache.get("huge") is None


def test_limit_above_cap_rejected(engine):
    from aruna_spark.sparql.engine import UnsupportedQueryError

    with pytest.raises(UnsupportedQueryError):
        engine.query("SELECT ?s WHERE { ?s ?p ?o } LIMIT 10001")
    # at the cap is fine
    engine.query("SELECT ?s WHERE { ?s ?p ?o } LIMIT 10000")


def test_cache_generation_stamp_invalidates(spark):
    """A visibility-generation bump (grant/revoke, doc change) must make
    older cached results stale (SURVEY §2.11, query_cache.rs:15-50)."""
    from aruna_spark.sparql.engine import QueryCache

    cache = QueryCache(now_fn=lambda: 0.0)
    cache.put("SELECT ?s WHERE { ?s ?p ?o }", [("row",)], 10, generation=1)
    # same generation: hit
    assert cache.get("SELECT ?s WHERE { ?s ?p ?o }", generation=1) == [("row",)]
    # older reader generation than entry: still valid (entry is newer)
    assert cache.get("SELECT ?s WHERE { ?s ?p ?o }", generation=0) == [("row",)]
    # newer generation: stale, dropped, and a subsequent same-gen get misses
    assert cache.get("SELECT ?s WHERE { ?s ?p ?o }", generation=2) is None
    assert cache.get("SELECT ?s WHERE { ?s ?p ?o }", generation=1) is None
    assert cache.misses == 2


def test_union_safe_shape_check():
    """api.rs:2092-2140: the fan-out merge accepts only SELECT DISTINCT
    over single patterns / unions of single patterns (GRAPH-wrapped ok,
    zero-offset slice ok)."""
    from aruna_spark.sparql.parser import parse
    from aruna_spark.sparql.shape import is_union_safe

    ok = [
        "SELECT DISTINCT ?s WHERE { ?s a schema:File }",
        "SELECT DISTINCT ?s ?n WHERE { ?s schema:name ?n } LIMIT 10",
        """SELECT DISTINCT ?s WHERE {
             { ?s a schema:File } UNION { ?s a schema:Dataset }
             UNION { GRAPH <https://w3id.org/aruna/1> { ?s schema:name ?n } }
           }""",
    ]
    bad = [
        "SELECT ?s WHERE { ?s a schema:File }",  # not DISTINCT
        "SELECT DISTINCT ?s WHERE { ?s a schema:File } OFFSET 5",
        "SELECT DISTINCT ?s WHERE { ?s a schema:File ; schema:name ?n }",
        "SELECT DISTINCT ?s WHERE { { ?s a schema:File } UNION "
        "{ ?s schema:name ?n . ?s schema:inLanguage ?l } }",
        "SELECT DISTINCT ?s WHERE { ?s schema:isPartOf+ ?o }",  # path leaf
        "SELECT DISTINCT ?lang (COUNT(*) AS ?n) WHERE "
        "{ ?s schema:inLanguage ?lang } GROUP BY ?lang",
    ]
    for text in ok:
        assert is_union_safe(parse(text)), text
    for text in bad:
        assert not is_union_safe(parse(text)), text


def test_strbefore_strafter_literal_not_regex(engine):
    """STRBEFORE/STRAFTER match strings are LITERAL: metacharacters like
    '.' and '(' must not be treated as regex (round-2 advisory — the old
    split-based STRBEFORE returned '' for STRBEFORE('a.b','.') and threw
    on '(')."""
    q = """
    SELECT ?x ?b ?a ?p WHERE {
      VALUES ?x { "a.b" "nodot" "(x)y" }
      BIND(STRBEFORE(?x, ".") AS ?b)
      BIND(STRAFTER(?x, ".") AS ?a)
      BIND(STRAFTER(?x, "(") AS ?p)
    }
    """
    rows = {r.x: (r.b, r.a, r.p) for r in engine.query_flat(q).collect()}
    assert rows["a.b"] == ("a", "b", "")
    assert rows["nodot"] == ("", "", "")
    assert rows["(x)y"] == ("", "", "x)y")
