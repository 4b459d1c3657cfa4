"""Metadata-create placement resolution
(create_metadata_document.rs:507-542,648-712 +
placement/mod.rs:404-424; queries/doc_placement.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.doc_placement import (
    REALM,
    SELF_NODE,
    SPARSE_NODE,
    classify_creates,
    load_create_requests,
    load_directory,
)
from aruna_spark.queries.node_info import held_buckets

load_all()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    fn, _ = REGISTRY["registry_create_doc_placement"]
    return fn(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def held(spark, sf_dir):
    return {
        (r.strategy, r.node_id, r.shard)
        for r in held_buckets(spark, sf_dir).collect()
    }


def test_lowest_bound_handle_wins(rows):
    """binding_directory.rs:151-165 — grp-3 strat-a has handles {1,2};
    handle_for returns 1."""
    grp3 = [
        r for r in rows
        if r.mode != "supplied" and r.handle_scope == "group"
        and r.strategy == "strat-a"
    ]
    assert grp3 and all(r.handle == 1 for r in grp3)


def test_conflicted_handle_falls_through_to_realm(spark, sf_dir):
    """rs:106 — a conflicted handle aliases nothing: grp-5's only
    group binding (handle 6) never satisfies the group rung, so its
    strat-a creates take the realm handle 3."""
    reqs = load_create_requests(spark, sf_dir).filter(
        (F.col("mode") != "supplied")
        & (F.col("group_id") == "grp-5")
        & (F.col("req_strategy") == "strat-a")
    )
    out = classify_creates(
        reqs, load_directory(spark), held_buckets(spark, sf_dir)
    ).collect()
    assert out
    assert all(
        r.handle == 3 and r.handle_scope == "realm" for r in out
    )


def test_sparse_origin_splits_by_strategy(rows):
    """placement/mod.rs:384-401 — node-22 holds strat-a buckets but no
    strat-b bucket: its strat-a locals mint, its strat-b locals hit
    OriginHoldsNoBucket."""
    sparse = [
        r for r in rows
        if r.mode == "local" and r.request_id % 23 == 15
        and r.verdict != "no_binding"
    ]
    assert sparse
    for r in sparse:
        if r.strategy == "strat-a":
            assert r.verdict == "ok"
        else:
            assert r.verdict == "origin_holds_no_bucket"


def test_local_pick_is_a_held_bucket(rows, held):
    """rs:404-409 — the origin always holds the bucket it stamps."""
    locals_ok = [r for r in rows if r.mode == "local" and r.verdict == "ok"]
    assert locals_ok
    for r in locals_ok:
        origin = SPARSE_NODE if r.request_id % 23 == 15 else SELF_NODE
        assert (r.strategy, origin, r.shard) in held
    # rendezvous on the subject spreads one node's documents across its
    # held buckets (rs:406-407) — not everything lands in one shard
    a_shards = {
        r.shard for r in locals_ok
        if r.strategy == "strat-a" and r.request_id % 23 != 15
    }
    assert len(a_shards) > 1


def test_unknown_origin_never_mints(rows):
    unknown = [
        r for r in rows
        if r.mode == "local" and r.request_id % 23 == 7
        and r.verdict != "no_binding"
    ]
    assert unknown
    assert all(r.verdict == "origin_holds_no_bucket" for r in unknown)


def test_supplied_rung_order(spark, sf_dir):
    """resolve_metadata_id rs:507-542: strategy lookup precedes bucket
    validation (handle 8 with an out-of-range bucket is
    unknown_strategy, not bucket_out_of_range); class check precedes
    scope (handle 7 from a mismatched group is wrong_class)."""
    reqs = spark.createDataFrame(
        [
            (1, "supplied", "strat-a", "grp-0", SELF_NODE, "s", 8, 999),
            (2, "supplied", "strat-a", "grp-0", SELF_NODE, "s", 7, 5),
            (3, "supplied", "strat-a", "grp-3", SELF_NODE, "s", 2, 5),
        ],
        "request_id long, mode string, req_strategy string,"
        " group_id string, origin string, subject string,"
        " sup_handle int, sup_bucket int",
    )
    out = {
        r.request_id: r
        for r in classify_creates(
            reqs, load_directory(spark), held_buckets(spark, sf_dir)
        ).collect()
    }
    assert out[1].verdict == "unknown_strategy"
    assert out[2].verdict == "wrong_class"
    # handle 2 is the HIGHER duplicate of grp-3's tuple — still a valid
    # bound handle for resolution even though handle_for never mints it
    assert out[3].verdict == "ok" and out[3].strategy == "strat-a"


def test_forward_is_blind_and_deterministic(rows):
    """rs:164-171 — every holder a forwarder tries stamps the SAME
    bucket: the blind hash depends only on the subject."""
    fwd = [r for r in rows if r.mode == "forward" and r.verdict == "ok"]
    assert fwd
    assert all(r.shard is not None and 0 <= r.shard < 64 for r in fwd)


def test_realm_scope_matches_any_group(rows):
    """Realm-scoped supplied ids (sub 0, odd keys -> handle 3) resolve
    ok for the fixture realm regardless of group."""
    realm_ok = [
        r for r in rows
        if r.mode == "supplied" and r.verdict == "ok" and r.handle == 3
    ]
    assert realm_ok
    assert all(r.handle_scope == "realm" for r in realm_ok)


# ----------------------- supplied-id ladder vs literal reference port
def _resolve_metadata_id_port(directory, known, handle, bucket,
                              realm_ok, group_id):
    """Literal port of resolve_metadata_id (rs:507-542) over the
    repo's directory model: binding_directory.resolve fail-closed
    (Unknown / Conflicted), bucket_count_of (UnknownStrategy),
    validate_bucket, class check, scope check — in that order."""
    row = directory.get(handle)
    if row is None:
        return "unknown_handle"
    scope_kind, scope_value, doc_class, strategy, state = row
    if state == "conflicted":
        return "conflicted_handle"
    if strategy not in known:
        return "unknown_strategy"
    if bucket >= known[strategy]:
        return "bucket_out_of_range"
    if doc_class != "metadata":
        return "wrong_class"
    if scope_kind == "realm":
        if not realm_ok:
            return "scope_mismatch"
    elif scope_value != group_id:
        return "scope_mismatch"
    return "ok"


def _ladder_replica(directory, known, handle, bucket, group_id):
    """The rung order classify_creates' supplied CASE implements."""
    row = directory.get(handle)
    if row is None:
        return "unknown_handle"
    scope_kind, scope_value, doc_class, strategy, state = row
    if state == "conflicted":
        return "conflicted_handle"
    if strategy not in known:
        return "unknown_strategy"
    if bucket >= 64:
        return "bucket_out_of_range"
    if doc_class != "metadata":
        return "wrong_class"
    ok = scope_value == "realm-0" if scope_kind == "realm" \
        else scope_value == group_id
    return "ok" if ok else "scope_mismatch"


def test_supplied_ladder_matches_reference_port_on_random_directories():
    """Random directories (conflicted rows, wrong classes, ghost
    strategies, both scopes) agree with the literal rs:507-542 port on
    every rung for every (handle, bucket, group) — including rows that
    are bad in SEVERAL ways at once, where only rung ORDER decides."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scopes = st.sampled_from([("realm", "realm-0"), ("group", "grp-3"),
                              ("group", "grp-9")])
    rows = st.tuples(
        scopes,
        st.sampled_from(["metadata", "blob"]),
        st.sampled_from(["strat-a", "strat-b", "strat-ghost"]),
        st.sampled_from(["bound", "bound", "conflicted"]),
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.dictionaries(st.integers(1, 6), rows, max_size=6),
        st.integers(0, 8),
        st.integers(0, 130),
        st.sampled_from(["grp-3", "grp-9", "grp-0"]),
    )
    def run(dir_rows, handle, bucket, group_id):
        directory = {
            h: (sk, sv, cl, strat, state)
            for h, ((sk, sv), cl, strat, state) in dir_rows.items()
        }
        known = {"strat-a": 64, "strat-b": 64}
        want = _resolve_metadata_id_port(
            directory, known, handle, bucket, True, group_id
        )
        got = _ladder_replica(directory, known, handle, bucket, group_id)
        assert got == want

    run()


def test_classify_creates_rejects_oversized_dimensions(
    spark, sf_dir, monkeypatch
):
    """r16: classify_creates folds the binding directory into
    driver-side expressions — the collect is guarded so a
    non-config-sized relation fails loudly instead of building an
    unbounded CASE cascade."""
    import pytest

    from aruna_spark.queries import doc_placement as mod

    reqs = mod.load_create_requests(spark, sf_dir).limit(1)
    held = spark.createDataFrame(
        [("strat-a", 1, "node-05")],
        "strategy string, shard int, node_id string",
    )
    monkeypatch.setattr(mod, "_MAX_DIRECTORY", 1)
    with pytest.raises(ValueError, match="config-sized"):
        mod.classify_creates(reqs, mod.load_directory(spark), held)
