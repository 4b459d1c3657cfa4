"""Hypothesis property tests for SPARQL value-comparison corners
(VERDICT r3 next-round #10): type-aware '=' and ordering over mixed
int/double lexical forms, plain vs lang-tagged vs typed literals.

rdflib is not installed in this container, so the oracle is a
pure-Python model of the SPARQL 1.1 §17.3 operator mapping as the
compiler implements it: '=' compares numeric literals in the value
space (double) and falls back to strict term equality (kind, value,
datatype, lang); ordering goes numeric value space first, then the
lexical form (string compare). Lexical forms are generated so that
Python ``float()`` and Spark ``cast('double')`` agree (standard
decimal/scientific notation, or clearly non-numeric), and strings are
ASCII so Python and UTF-8-binary ordering agree.

Each hypothesis example is a BATCH of term pairs evaluated in one Spark
job (per-example Spark actions would make shrinking pathologically
slow).
"""

from __future__ import annotations

import operator

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.sparql.compiler import CE, _term_cmp, _term_eq
from aruna_spark.sparql.terms import (
    NUMERIC_DATATYPES,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    term,
)

_OPS = {"<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge}

# lexical forms where Python float() and Spark cast('double') agree
_int_forms = st.integers(-(10**12), 10**12).map(str)
_double_forms = st.floats(
    allow_nan=False, allow_infinity=False, width=64
).map(repr)
_text_forms = st.text(alphabet="abx 01.", min_size=0, max_size=6)

_values = st.one_of(_int_forms, _double_forms, _text_forms)
_datatypes = st.sampled_from(
    [None, XSD_STRING, XSD_INTEGER, XSD_DOUBLE, XSD_DECIMAL]
)
_langs = st.sampled_from([None, "en", "de"])

# (value, datatype, lang); lang-tagged literals carry no datatype (the
# parser models RDF 1.1 langString as lang set + datatype None)
_terms = st.builds(
    lambda v, d, lang: (v, None if lang is not None else d, lang),
    _values,
    _datatypes,
    _langs,
)
_pairs = st.lists(st.tuples(_terms, _terms), min_size=1, max_size=40)


def _model_num(value: str, datatype: str | None) -> float | None:
    if datatype not in NUMERIC_DATATYPES:
        return None
    try:
        return float(value)
    except ValueError:
        return None


def _model_eq(a, b) -> bool:
    na, nb = _model_num(a[0], a[1]), _model_num(b[0], b[1])
    if na is not None and nb is not None:
        return na == nb
    return a == b  # strict term equality: (value, datatype, lang)


def _model_cmp(a, b, op: str) -> bool:
    na, nb = _model_num(a[0], a[1]), _model_num(b[0], b[1])
    if na is not None and nb is not None:
        return _OPS[op](na, nb)
    return _OPS[op](a[0], b[0])  # lexical-form string compare


def _evaluate(spark, pairs):
    rows = [(a[0], a[1], a[2], b[0], b[1], b[2]) for a, b in pairs]
    df = spark.createDataFrame(
        rows,
        "a_v string, a_d string, a_l string, b_v string, b_d string, b_l string",
    )
    ta = CE(
        term(F.lit("literal"), F.col("a_v"), F.col("a_d"), F.col("a_l")),
        "term",
    )
    tb = CE(
        term(F.lit("literal"), F.col("b_v"), F.col("b_d"), F.col("b_l")),
        "term",
    )
    return df.select(
        _term_eq(ta, tb).alias("eq"),
        *[
            _term_cmp(ta, tb, op).alias(f"c{i}")
            for i, op in enumerate(_OPS)
        ],
    ).collect()


@settings(max_examples=12, deadline=None)
@given(_pairs)
def test_term_eq_and_cmp_match_model(spark, pairs):
    got = _evaluate(spark, pairs)
    for (a, b), row in zip(pairs, got):
        assert row.eq == _model_eq(a, b), f"= mismatch for {a} vs {b}"
        for i, op in enumerate(_OPS):
            assert row[f"c{i}"] == _model_cmp(a, b, op), (
                f"{op} mismatch for {a} vs {b}"
            )


@settings(max_examples=6, deadline=None)
@given(st.lists(_terms, min_size=1, max_size=30))
def test_term_eq_reflexive_and_cmp_total(spark, terms_):
    """Every term equals itself; exactly one of < / = / > holds under
    the model and the engine agrees on each."""
    pairs = [(t, t) for t in terms_]
    got = _evaluate(spark, pairs)
    for t, row in zip(terms_, got):
        assert row.eq, f"term {t} must equal itself"
        assert not row[f"c{list(_OPS).index('<')}"]
        assert not row[f"c{list(_OPS).index('>')}"]


def test_known_corner_cases(spark):
    """The documented corners, pinned explicitly: int vs double lexical
    forms compare in the value space; lang-tagged vs plain literals are
    never '='; numeric-typed garbage falls back to term equality."""
    cases = [
        # '01'^^xsd:integer = '1.0'^^xsd:double  (value space)
        (("01", XSD_INTEGER, None), ("1.0", XSD_DOUBLE, None), True),
        # '5'^^xsd:integer = '5' (plain) -> term equality -> False
        (("5", XSD_INTEGER, None), ("5", None, None), False),
        # 'a'@en = 'a' -> False (lang-tagged vs plain)
        (("a", None, "en"), ("a", None, None), False),
        # 'a'@en = 'a'@de -> False; 'a'@en = 'a'@en -> True
        (("a", None, "en"), ("a", None, "de"), False),
        (("a", None, "en"), ("a", None, "en"), True),
        # 'x'^^xsd:integer (garbage lexical form) = 'x'^^xsd:integer
        # -> numeric null on both sides -> strict term equality True
        (("x", XSD_INTEGER, None), ("x", XSD_INTEGER, None), True),
        # '10'^^xsd:integer vs '9'^^xsd:integer: numeric, not lexical
        (("10", XSD_INTEGER, None), ("9", XSD_INTEGER, None), False),
    ]
    got = _evaluate(spark, [(a, b) for a, b, _ in cases])
    for (a, b, want), row in zip(cases, got):
        assert row.eq == want, f"{a} = {b} expected {want}"
    # ordering corner: numeric beats lexicographic — as strings
    # '10' < '9', but as xsd:integer 10 > 9
    row = _evaluate(
        spark, [(("10", XSD_INTEGER, None), ("9", XSD_INTEGER, None))]
    )[0]
    assert row[f"c{list(_OPS).index('<')}"] is False
    assert row[f"c{list(_OPS).index('>')}"] is True
