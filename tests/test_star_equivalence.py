"""Property test: the BGP star-scan rewrite (SURVEY §4a property-table
compile) is result-equivalent to the k-way self-join form on randomized
triple data — multi-valued predicates, duplicate quads, missing
predicates, constant-object patterns, and graph variables included.

The rewrite's multiplicity contract is the subtle part: a subject with
|l_i| objects per star predicate must yield prod(|l_i|) rows exactly,
and constant-object patterns must multiply by their matching-row count
(no set-semantics assumption). Both forms run through the SAME compiler;
the join form is forced by disabling ``_star_rels``.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.sparql.compiler import Compiler
from aruna_spark.sparql.parser import parse

TRIPLES_SCHEMA = (
    "graph_iri string, subject string, predicate string, "
    "object_kind string, object_value string, "
    "object_datatype string, object_lang string"
)

P = [f"http://example.org/p{i}" for i in range(4)]
QUERY = """
SELECT ?s ?a ?b ?c WHERE {
  ?s <http://example.org/p0> ?a ;
     <http://example.org/p1> ?b ;
     <http://example.org/p2> ?c ;
     <http://example.org/p3> "tag" .
}
"""
QUERY_GRAPH_VAR = """
SELECT ?g ?s ?a ?b ?c WHERE {
  GRAPH ?g {
    ?s <http://example.org/p0> ?a ;
       <http://example.org/p1> ?b ;
       <http://example.org/p2> ?c .
  }
}
"""

# one triple = (graph 0-1, subject 0-2, predicate 0-3, object tag).
# object 3 is the constant literal "tag" so the p3 pattern sometimes
# matches; small domains force collisions, multi-values, and duplicates.
triple = st.tuples(
    st.integers(0, 1),
    st.integers(0, 2),
    st.integers(0, 3),
    st.integers(0, 3),
)


def _rows(raw):
    rows = []
    for g, s, p, o in raw:
        rows.append(
            (
                f"urn:g{g}",
                f"urn:s{s}",
                P[p],
                "literal",
                "tag" if o == 3 else f"v{o}",
                None,
                None,
            )
        )
    return rows


def _run(spark, rows, query, star: bool):
    triples = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    compiler = Compiler(spark, triples)
    if not star:
        orig = compiler._star_rels
        compiler._star_rels = lambda patterns, graph: ([], list(patterns))
        assert compiler._star_rels is not orig
    df = compiler.compile_select(parse(query))
    out = []
    for r in df.collect():
        out.append(
            tuple(
                (v["kind"], v["value"]) if v is not None else None
                for v in r
            )
        )
    return sorted(out)


@pytest.mark.parametrize("query", [QUERY, QUERY_GRAPH_VAR])
@given(raw=st.lists(triple, min_size=0, max_size=14))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_equals_join_form(spark, query, raw):
    rows = _rows(raw)
    assert _run(spark, rows, query, star=True) == _run(
        spark, rows, query, star=False
    )
