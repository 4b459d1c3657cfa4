"""CRDT operator laws: clock comparator truth table + observed-remove
convergence, property-tested against a pure-Python OR-set model."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.ops.crdt import (
    CONCURRENT,
    EQUAL,
    LOCAL_AHEAD,
    REMOTE_AHEAD,
    clock_relation,
    orset_replay,
    orset_replay_py,
)

OPS_SCHEMA = (
    "graph_iri string, subject string, predicate string, object string, "
    "op string, actor string, counter long, witnessed map<string,long>"
)


def _clock_df(spark, local: dict, remote: dict):
    return spark.createDataFrame(
        [(local, remote)], "local map<string,long>, remote map<string,long>"
    )


def _relation(spark, local: dict, remote: dict) -> str:
    df = _clock_df(spark, local, remote)
    return df.select(
        clock_relation(F.col("local"), F.col("remote")).alias("r")
    ).collect()[0].r


def test_clock_relation_truth_table(spark):
    """compare_metadata_clocks parity (core/src/metadata.rs:691-713),
    including missing-actor-as-0 and empty clocks."""
    assert _relation(spark, {}, {}) == EQUAL
    assert _relation(spark, {"a": 1}, {"a": 1}) == EQUAL
    assert _relation(spark, {"a": 2}, {"a": 1}) == LOCAL_AHEAD
    assert _relation(spark, {"a": 1}, {"a": 2}) == REMOTE_AHEAD
    # missing actor counts as 0
    assert _relation(spark, {"a": 1}, {}) == LOCAL_AHEAD
    assert _relation(spark, {}, {"b": 3}) == REMOTE_AHEAD
    # disjoint actors -> both ahead -> concurrent
    assert _relation(spark, {"a": 1}, {"b": 1}) == CONCURRENT
    # mixed: ahead on one actor each
    assert _relation(spark, {"a": 2, "b": 1}, {"a": 1, "b": 2}) == CONCURRENT
    # superset dominates
    assert _relation(spark, {"a": 2, "b": 2}, {"a": 1, "b": 2}) == LOCAL_AHEAD
    # explicit zero equals missing
    assert _relation(spark, {"a": 0}, {}) == EQUAL


QUAD = ("g", "s", "p", "o")


def _op_add(actor: str, counter: int, quad=QUAD) -> dict:
    g, s, p, o = quad
    return dict(
        graph_iri=g, subject=s, predicate=p, object=o,
        op="add", actor=actor, counter=counter, witnessed=None,
    )


def _op_remove(witnessed: dict, quad=QUAD) -> dict:
    g, s, p, o = quad
    return dict(
        graph_iri=g, subject=s, predicate=p, object=o,
        op="remove", actor=None, counter=None, witnessed=witnessed,
    )


def _replay_spark(spark, ops: list[dict]) -> dict[tuple, dict]:
    rows = [
        (
            op["graph_iri"], op["subject"], op["predicate"], op["object"],
            op["op"], op["actor"], op["counter"], op["witnessed"] or {},
        )
        for op in ops
    ]
    df = spark.createDataFrame(rows, OPS_SCHEMA)
    out = {}
    for r in orset_replay(df).collect():
        out[(r.graph_iri, r.subject, r.predicate, r.object)] = {
            "n_dots": r.n_dots,
            "max_counter": r.max_counter,
        }
    return out


def test_orset_add_then_witnessed_remove_dies(spark):
    ops = [_op_add("a", 1), _op_remove({"a": 1})]
    assert _replay_spark(spark, ops) == {}


def test_orset_concurrent_add_survives_remove(spark):
    """A dot the remove never witnessed survives — the defining OR-set
    law (add wins over concurrent remove)."""
    ops = [_op_add("a", 1), _op_remove({"a": 1}), _op_add("b", 1)]
    out = _replay_spark(spark, ops)
    assert out == {QUAD: {"n_dots": 1, "max_counter": 1}}


def test_orset_readd_after_remove_survives(spark):
    ops = [_op_add("a", 1), _op_remove({"a": 1}), _op_add("a", 2)]
    out = _replay_spark(spark, ops)
    assert out == {QUAD: {"n_dots": 1, "max_counter": 2}}


def test_orset_remove_merges_pointwise_max(spark):
    """Two removes with partial witnessed clocks merge: their pointwise
    max kills both dots."""
    ops = [
        _op_add("a", 1),
        _op_add("b", 1),
        _op_remove({"a": 1}),
        _op_remove({"b": 1}),
    ]
    assert _replay_spark(spark, ops) == {}


def test_orset_replay_is_order_independent(spark):
    base = [
        _op_add("a", 1),
        _op_remove({"a": 1}),
        _op_add("a", 2),
        _op_add("b", 1),
        _op_remove({"a": 2, "b": 0}),
        _op_add("c", 5, ("g2", "s2", "p2", "o2")),
        _op_remove({"c": 4}, ("g2", "s2", "p2", "o2")),
    ]
    rng = random.Random(7)
    expected = _replay_spark(spark, base)
    for _ in range(3):
        shuffled = base[:]
        rng.shuffle(shuffled)
        assert _replay_spark(spark, shuffled) == expected
    assert expected == orset_replay_py(base)


# -- randomized convergence vs the pure-Python model -------------------------
actors = st.sampled_from(["a", "b", "c"])
quads = st.sampled_from([QUAD, ("g2", "s", "p", "o"), ("g", "s", "p", "o2")])
ops_strategy = st.lists(
    st.one_of(
        st.builds(
            lambda q, a, c: _op_add(a, c, q),
            quads, actors, st.integers(min_value=1, max_value=4),
        ),
        st.builds(
            lambda q, w: _op_remove(w, q),
            quads,
            st.dictionaries(actors, st.integers(min_value=0, max_value=4),
                            max_size=3),
        ),
    ),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(ops=ops_strategy, seed=st.integers(min_value=0, max_value=2**16))
def test_python_model_order_independent(ops, seed):
    """The reference model itself is permutation-invariant (fast check,
    no Spark round-trip)."""
    shuffled = ops[:]
    random.Random(seed).shuffle(shuffled)
    assert orset_replay_py(ops) == orset_replay_py(shuffled)


@settings(max_examples=8, deadline=None)
@given(ops=ops_strategy)
def test_spark_replay_matches_python_model(spark, ops):
    assert _replay_spark(spark, ops) == orset_replay_py(ops)
