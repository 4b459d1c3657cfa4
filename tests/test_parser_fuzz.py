"""Robustness fuzz for the SPARQL parser: the governed endpoint's first
line of defense must NEVER crash with an unhandled exception — every
input either parses or raises one of the two documented error classes
(``SparqlSyntaxError`` / ``UnsupportedQueryError``, both ValueError —
the route's 400). The reference's endpoint has the same contract:
spargebra parse errors map to a client error, never a panic
(``api/src/routes/metadata.rs`` SPARQL route error handling).

Three generators:
- mutations of VALID queries (drop/duplicate/swap slices — the
  near-miss inputs users actually send);
- token soup from the SPARQL alphabet (brackets, quotes, dots, PREFIX,
  braces — stresses the tokenizer's string/IRI states);
- raw unicode junk (control chars, surrogates-adjacent, RTL marks).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.sparql.parser import (
    SparqlSyntaxError,
    UnsupportedQueryError,
    parse,
)

VALID = [
    'SELECT ?s WHERE { ?s <http://schema.org/name> "x" . }',
    "SELECT ?s ?o WHERE { ?s ?p ?o . FILTER(?o > 3) } ORDER BY ?s LIMIT 5",
    "ASK { ?s a <http://schema.org/Dataset> }",
    "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (?n > 1)",
    "SELECT ?s WHERE { ?s <http://a/b>+ ?o . OPTIONAL { ?o ?p ?v } }",
]

_sparql_tokens = st.sampled_from(
    [
        "SELECT", "WHERE", "ASK", "FILTER", "OPTIONAL", "UNION", "PREFIX",
        "{", "}", "(", ")", ".", ";", ",", "?s", "?o", "a", "*", "+", "|",
        "<http://x/y>", '"str"', "'s", "42", "1.5", "@en", "^^", "||",
        "&&", "!", "BIND", "VALUES", "GRAPH", "MINUS", "LIMIT", "OFFSET",
    ]
)


def _assert_clean(text: str) -> None:
    try:
        parse(text)
    except (SparqlSyntaxError, UnsupportedQueryError):
        pass  # the documented 400s


@given(
    base=st.sampled_from(VALID),
    i=st.integers(min_value=0, max_value=80),
    j=st.integers(min_value=0, max_value=80),
)
@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mutated_valid_queries_never_crash(base, i, j):
    lo, hi = sorted((min(i, len(base)), min(j, len(base))))
    _assert_clean(base[:lo] + base[hi:])          # slice dropped
    _assert_clean(base[:hi] + base[lo:hi] + base[hi:])  # slice doubled
    _assert_clean(base[lo:hi] + base[:lo] + base[hi:])  # slice moved


@given(tokens=st.lists(_sparql_tokens, min_size=0, max_size=25))
@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_token_soup_never_crashes(tokens):
    _assert_clean(" ".join(tokens))


@given(text=st.text(max_size=60))
@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unicode_junk_never_crashes(text):
    _assert_clean(text)
    _assert_clean("SELECT ?s WHERE { " + text)
