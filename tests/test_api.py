"""End-to-end drives of the :class:`aruna_spark.api.Engine` facade —
the reference-route-shaped switch-over surface (SURVEY §3). Route glue
only; plane semantics are tested in their own suites. The search-walk
checks mirror the reference's route-level cursor harness
(``api/src/routes/metadata.rs:3943-4600``): two-page walk with no
skip/no dup, tampered cursor rejected, cursor bound to its query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.api import DEFAULT_PAGE, Engine
from aruna_spark.search.cursor import SearchCursorError

QUERY = "doc"


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_sparql_route_matches_lazy_form(engine):
    text = """
    SELECT ?s ?name WHERE {
      ?s <http://schema.org/name> ?name .
    } ORDER BY ?s LIMIT 10
    """
    rows = engine.sparql(text)  # route form: governed, flat values
    lazy = engine.sparql_df(text).collect()  # lazy form: term structs
    assert len(rows) == 10
    assert [tuple(r) for r in rows] == [
        tuple(term.value if term is not None else None for term in r)
        for r in lazy
    ]


def test_search_two_page_walk_no_skip_no_dup(engine, spark, sf_dir):
    from aruna_spark.store import bm25_scored

    p1 = engine.search(QUERY)
    assert len(p1.hits) == DEFAULT_PAGE and p1.next_cursor
    p2 = engine.search(QUERY, cursor=p1.next_cursor)
    keys = lambda page: [
        (r.score_q, r.graph_iri, r.subject) for r in page.hits
    ]
    walked = keys(p1) + keys(p2)
    # exactly the top-2*PAGE of the scored relation in merge order —
    # nothing skipped at the page boundary (tie-bucket invariant),
    # nothing duplicated
    want = [
        (r.score_q, r.graph_iri, r.subject)
        for r in bm25_scored(spark, sf_dir, QUERY)
        .orderBy(F.desc("score_q"), "graph_iri", "subject")
        .limit(2 * DEFAULT_PAGE)
        .collect()
    ]
    assert walked == want
    assert len(set(walked)) == len(walked)


def test_search_cursor_tamper_and_mismatch_rejected(engine):
    p1 = engine.search(QUERY)
    # bit-flip near the middle of the encoded cursor -> reject
    raw = p1.next_cursor
    flipped = raw[: len(raw) // 2] + (
        "A" if raw[len(raw) // 2] != "A" else "B"
    ) + raw[len(raw) // 2 + 1 :]
    with pytest.raises(SearchCursorError):
        engine.search(QUERY, cursor=flipped)
    # a valid cursor replayed against a DIFFERENT query -> fingerprint
    # mismatch
    with pytest.raises(SearchCursorError):
        engine.search("name", cursor=p1.next_cursor)


def test_search_validates_query(engine):
    with pytest.raises(ValueError):
        engine.search("x")  # below min chars
    with pytest.raises(ValueError):
        engine.search("!!")  # no indexable tokens


def test_list_objects_matches_registered_route(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all

    load_all()
    got = engine.list_objects(
        prefix="data/", delimiter="/", max_keys=20
    ).collect()
    want = REGISTRY["listing_v2_root"][0](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ingest_export_roundtrip(engine, spark):
    from aruna_spark.ingest.jsonld import GRAPH_NS

    doc = (
        '{"@id": "urn:x:1", "@type": "http://schema.org/Dataset", '
        '"name": "hello"}'
    )
    docs = spark.createDataFrame(
        [("urn:g:1", doc)], "document_id string, jsonld string"
    )
    triples = engine.ingest_jsonld(docs)
    assert triples.count() >= 2  # @type + name
    crate = engine.export_rocrate(triples)
    back = engine.ingest_jsonld(
        crate.select(
            F.regexp_replace(
                "graph_iri", f"^{GRAPH_NS}", ""
            ).alias("document_id"),
            F.col("jsonld"),
        )
    )
    a = {tuple(r) for r in triples.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_backlinks_route_matches_registered_demo(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.backlinks import TARGET

    load_all()
    got = engine.backlinks(TARGET).collect()
    want = REGISTRY["backlinks_references"][0](spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_drs_object_route(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.drs import W3ID_DATA_PREFIX

    load_all()
    batch = REGISTRY["drs_object_lookup"][0](spark, sf_dir).collect()
    assert batch
    one = engine.drs_object(batch[0].id)
    assert tuple(one) == tuple(batch[0])
    # unknown blob -> the route's 404 (None)
    assert engine.drs_object(W3ID_DATA_PREFIX + "nope") is None
    with pytest.raises(ValueError):
        engine.drs_object("urn:not-a-drs-id")


def test_search_depth_cap_truncates_walk(engine, spark, sf_dir, monkeypatch):
    """The walk truncates at MAX_PAGINATION_DEPTH consumed hits
    (search_cursor.rs:15, rs:386-397): the page straddling the cap is
    cut to it and carries no next cursor. Exercised with the real cap
    by replaying a deep cursor, and end-to-end with a lowered cap."""
    import aruna_spark.api as api
    from aruna_spark.search.cursor import (
        MAX_PAGINATION_DEPTH,
        SearchCursor,
        SearchWatermark,
        query_fingerprint,
    )

    # a (signed, legitimate) cursor one hit short of the real cap:
    # the next page must serve exactly 1 hit and stop
    fp = query_fingerprint(QUERY)
    deep = SearchCursor.new_signed(
        fp,
        SearchWatermark(2**62, "", ""),  # watermark above every hit
        resume=[(engine.node_key.node_id, MAX_PAGINATION_DEPTH - 1)],
        signer=engine.node_key,
    ).encode()
    page = engine.search(QUERY, cursor=deep)
    assert len(page.hits) == 1 and page.next_cursor is None
    # at the cap exactly: empty page, no cursor
    at_cap = SearchCursor.new_signed(
        fp,
        SearchWatermark(2**62, "", ""),
        resume=[(engine.node_key.node_id, MAX_PAGINATION_DEPTH)],
        signer=engine.node_key,
    ).encode()
    page = engine.search(QUERY, cursor=at_cap)
    assert page.hits == [] and page.next_cursor is None
    # end-to-end with a lowered cap: the full walk stops at the cap
    monkeypatch.setattr(api, "MAX_PAGINATION_DEPTH", 40)
    walked, cur = [], None
    while True:
        p = engine.search(QUERY, page_size=25, cursor=cur)
        walked.extend(p.hits)
        cur = p.next_cursor
        if cur is None:
            break
    assert len(walked) == 40
    assert len({(r.graph_iri, r.subject) for r in walked}) == 40


def test_unified_search_route_matches_registered_demo(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.search import UNIFIED_QUERY

    load_all()
    got = engine.unified_search(UNIFIED_QUERY).collect()
    want = REGISTRY["search_unified"][0](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # a different query produces a (valid) different section relation
    other = engine.unified_search("collection").collect()
    assert {r.section for r in other} <= {
        "documents", "buckets", "groups", "users"
    }


def test_search_page_size_zero_rejected(engine):
    with pytest.raises(ValueError, match="positive"):
        engine.search(QUERY, page_size=0)


def test_graph_scope_gates_search_and_backlinks(spark, sf_dir):
    from aruna_spark.api import Engine
    from aruna_spark.queries.backlinks import TARGET

    wide = Engine(spark, sf_dir)
    all_hits = wide.search(QUERY, page_size=100).hits
    graphs = sorted({r.graph_iri for r in all_hits})
    assert len(graphs) >= 2, "need multiple graphs to test scoping"
    allowed = spark.createDataFrame(
        [(graphs[0],)], "graph_iri string"
    )
    scoped = Engine(spark, sf_dir, visible_graphs=allowed)
    got = scoped.search(QUERY, page_size=100).hits
    assert got and {r.graph_iri for r in got} == {graphs[0]}
    # backlinks likewise never leaves the scope (empty scope -> empty)
    none = Engine(
        spark,
        sf_dir,
        visible_graphs=spark.createDataFrame(
            [("urn:nope",)], "graph_iri string"
        ),
    )
    assert none.backlinks(TARGET).count() == 0
    # unified_search refuses a scoped engine instead of leaking
    with pytest.raises(NotImplementedError):
        scoped.unified_search(QUERY)


def test_default_node_keys_are_not_forgeable_across_engines(
    spark, sf_dir
):
    """Two default-constructed engines must NOT honor each other's
    cursors: the default signing key is random per instance, so a
    publicly-derivable key cannot forge cursors (e.g. resetting the
    depth-cap resume count)."""
    from aruna_spark.api import Engine

    a = Engine(spark, sf_dir)
    b = Engine(spark, sf_dir)
    p1 = a.search(QUERY)
    with pytest.raises(SearchCursorError):
        b.search(QUERY, cursor=p1.next_cursor)


def test_metadata_listing_route(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all

    load_all()
    got = engine.metadata_listing(order="recent", limit=50).collect()
    want = REGISTRY["registry_listing_recent"][0](spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # limit rules: anonymous clamp + invalid rejection
    assert len(engine.metadata_listing(limit=5000, anonymous=True).collect()) <= 100
    with pytest.raises(ValueError):
        engine.metadata_listing(limit=0)
    with pytest.raises(ValueError):
        engine.metadata_listing(order="sideways")


def test_path_lookup_route(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all

    load_all()
    all_claims = {
        r.path: r
        for r in REGISTRY["registry_path_claims"][0](spark, sf_dir).collect()
    }
    some_path = sorted(all_claims)[0]
    got = engine.path_lookup(some_path)
    assert tuple(got) == tuple(all_claims[some_path])
    assert engine.path_lookup("p/never-claimed") is None


def test_usage_counters_route(engine, spark, sf_dir):
    from aruna_spark.queries import REGISTRY, load_all

    load_all()
    got = engine.usage_counters(by_group=True).collect()
    want = REGISTRY["usage_counters_by_group"][0](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert engine.usage_counters(by_group=False).count() == 1
