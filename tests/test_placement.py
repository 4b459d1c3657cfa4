"""Placement selector/resolver parity tests.

Mirrors the reference's own test strategy (selector.rs ``mod tests``,
scaled to the portable Q6.24 widths): exact fixed-point vectors, a
float-reference tolerance sweep, and a property test pinning the
DataFrame resolution against a literal Python port of
``resolve_holders`` (resolver.rs:88-160) over random clusters.
"""

from __future__ import annotations

import functools
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.ops.placement import (
    FRAC_BITS,
    HASH_BITS,
    PLACEMENT_DOMAIN,
    ROLE_LOCATION,
    ROLE_NODE,
    neg_log2_q24,
)
from aruna_spark.queries.placement import resolve_holders

Q_ONE = 1 << FRAC_BITS


def py_hash(role: str, subject: str, cid: str) -> int:
    d = hashlib.md5(
        f"{PLACEMENT_DOMAIN}{role}{subject}|{cid}".encode()
    ).hexdigest()
    return (int(d[:8], 16) % (1 << HASH_BITS)) | 1


def py_neg_log2(h: int) -> int:
    top, full = 1 << (HASH_BITS - 1), 1 << HASH_BITS
    x, z, f = h, 0, 0
    for _ in range(HASH_BITS - 1):
        if x < top:
            x, z = x * 2, z + 1
    for _ in range(FRAC_BITS):
        y = (x * x) >> (HASH_BITS - 1)
        if y >= full:
            f, y = f * 2 + 1, y >> 1
        else:
            f = f * 2
        x = y
    return ((z + 1) << FRAC_BITS) - f


def py_rank(role: str, subject: str, cands: list[tuple[str, int]]) -> list[str]:
    """selector.rs:54-70 rank_weighted, literally."""
    scores = {cid: py_neg_log2(py_hash(role, subject, cid)) for cid, _ in cands}
    weights = dict(cands)

    def cmp(a: str, b: str) -> int:
        lhs, rhs = scores[a] * weights[b], scores[b] * weights[a]
        if lhs != rhs:
            return -1 if lhs < rhs else 1
        if scores[a] != scores[b]:
            return -1 if scores[a] < scores[b] else 1
        return -1 if a < b else (1 if a > b else 0)

    return sorted((cid for cid, _ in cands), key=functools.cmp_to_key(cmp))


def py_resolve(nodes: list[dict], subject: str, replicas: int) -> list[str]:
    """resolver.rs:88-160 resolve_holders (distinct_locations, no
    override), literally: location W_loc from filter-passing members,
    rank locations, skip W_loc==0, claim first eligible member."""
    locs: dict[str, list[dict]] = {}
    for n in nodes:
        locs.setdefault(n["location"], []).append(n)
    w_loc = {
        name: sum(n["eff"] for n in mem if n["passes"])
        for name, mem in locs.items()
    }
    order = py_rank(
        ROLE_LOCATION, subject, [(name, w_loc[name]) for name in locs]
    )
    result = []
    for name in order:
        if len(result) >= replicas:
            break
        if w_loc[name] == 0:
            continue
        ranked = py_rank(
            ROLE_NODE, subject, [(n["node_id"], n["eff"]) for n in locs[name]]
        )
        by_id = {n["node_id"]: n for n in locs[name]}
        for nid in ranked:
            if by_id[nid]["eligible"]:
                result.append(nid)
                break  # distinct_locations: one claim per location
    return result


def test_neg_log2_exact_vectors(spark):
    """Analog of selector.rs neg_log2_exact_vectors at Q6.24."""
    row = (
        spark.range(1)
        .select(
            neg_log2_q24(F.lit(1 << (HASH_BITS - 1))).alias("a"),
            neg_log2_q24(F.lit(1 << (HASH_BITS - 2))).alias("b"),
            neg_log2_q24(F.lit(1)).alias("c"),
            neg_log2_q24(F.lit((1 << HASH_BITS) - 1)).alias("d"),
        )
        .collect()[0]
    )
    assert row.a == Q_ONE
    assert row.b == 2 * Q_ONE
    assert row.c == HASH_BITS * Q_ONE
    assert 0 < row.d < Q_ONE


def test_neg_log2_matches_float_reference():
    """Analog of selector.rs neg_log2_matches_float_reference: 24
    fraction bits ⇒ granularity 2^-24 ≈ 6e-8; 1e-6 leaves margin."""
    worst = 0.0
    for counter in range(4096):
        h = py_hash(ROLE_NODE, f"s{counter}", "x")
        fixed = py_neg_log2(h) / Q_ONE
        ref = -math.log2(h / (1 << HASH_BITS))
        worst = max(worst, abs(fixed - ref))
    assert worst < 1e-6, worst


_node = st.tuples(
    st.integers(0, 3),  # location index
    st.integers(0, 3),  # raw weight (zeros present)
    st.booleans(),  # passes filters
    st.booleans(),  # available (not full/draining)
)


def test_resolve_equals_python_port(spark):
    @given(
        raw=st.lists(_node, min_size=1, max_size=10),
        replicas=st.integers(1, 4),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(raw, replicas):
        nodes = [
            {
                "node_id": f"n{i:02d}",
                "location": f"loc-{li}",
                "eff": w * 100,
                "passes": p,
                "eligible": p and a and w > 0,
            }
            for i, (li, w, p, a) in enumerate(raw)
        ]
        ndf = spark.createDataFrame(
            [
                (
                    n["node_id"],
                    n["location"],
                    n["eff"],
                    n["passes"],
                    n["eligible"],
                )
                for n in nodes
            ],
            "node_id string, location string, eff_weight long,"
            " passes_filters boolean, eligible boolean",
        )
        subjects = ["alpha", "beta"]
        sdf = spark.createDataFrame(
            [(s,) for s in subjects], "subject string"
        )
        got: dict[str, list[str]] = {s: [] for s in subjects}
        for r in resolve_holders(ndf, sdf, replicas).collect():
            got[r.subject].append((r.replica_rank, r.node_id))
        for s in subjects:
            want = py_resolve(nodes, s, replicas)
            assert sorted(got[s]) == list(enumerate(want, 1)), (
                s,
                got[s],
                want,
            )

    prop()


def py_shard(subject: str, count: int) -> int:
    d = hashlib.md5(f"aruna-shard-v1{subject}".encode()).hexdigest()
    return int(d[:8], 16) & (count - 1)


def test_shard_stays_in_range_and_distributes():
    """Analogs of shard_for_subject_stays_in_range /
    _distributes_evenly (core structs/placement.rs:657-683), over the
    portable hash."""
    for count in (1, 2, 4, 64, 128, 1024):
        for seed in range(256):
            assert 0 <= py_shard(f"s{seed}", count) < count
    counts = [0] * 64
    for seed in range(10_000):
        counts[py_shard(f"subject-{seed}", 64)] += 1
    mean = 10_000 / 64
    assert min(counts) > mean * 0.5 and max(counts) < mean * 1.5, (
        min(counts),
        max(counts),
    )


def test_shard_spark_matches_python(spark):
    from aruna_spark.ops.placement import shard_for_subject

    df = spark.createDataFrame(
        [(f"subj-{i}",) for i in range(50)], "subject string"
    )
    got = {
        r.subject: r.shard
        for r in df.select(
            "subject", shard_for_subject(F.col("subject"), 64).alias("shard")
        ).collect()
    }
    assert got == {s: py_shard(s, 64) for s in got}


def py_resolve_override(nodes, subject, replicas, pinned, excluded):
    """resolver.rs:88-160 WITH an override, literally: exclusion wins
    over a pin, pins validate on availability only (filters
    bypassed), the walk fills the remainder."""
    exc = set(excluded)
    by_id = {n["node_id"]: n for n in nodes}
    result, used, seen = [], set(), set()
    for pin in pinned:
        if len(result) >= replicas:
            return result
        if pin in used or pin in exc:
            continue
        n = by_id.get(pin)
        if n is None or not n["available"]:
            continue
        result.append((pin, True))
        used.add(pin)
        seen.add(n["location"])
    locs: dict[str, list[dict]] = {}
    for n in nodes:
        locs.setdefault(n["location"], []).append(n)
    w_loc = {
        k: sum(n["eff"] for n in v if n["passes"]) for k, v in locs.items()
    }
    for name in py_rank(
        ROLE_LOCATION, subject, [(k, w_loc[k]) for k in locs]
    ):
        if len(result) >= replicas:
            break
        if w_loc[name] == 0 or name in seen:
            continue
        for nid in py_rank(
            ROLE_NODE,
            subject,
            [(n["node_id"], n["eff"]) for n in locs[name]],
        ):
            n = by_id[nid]
            if nid in used or nid in exc or not n["eligible"]:
                continue
            result.append((nid, False))
            used.add(nid)
            seen.add(name)
            break
    return result


def test_resolve_override_equals_python_port(spark):
    from aruna_spark.queries.placement import resolve_with_override

    _onode = st.tuples(
        st.integers(0, 2),  # location
        st.integers(0, 3),  # weight/100
        st.booleans(),  # passes filters
        st.booleans(),  # available (not full/draining)
    )

    @given(
        raw=st.lists(_onode, min_size=1, max_size=8),
        replicas=st.integers(1, 4),
        pin_idx=st.lists(st.integers(0, 8), max_size=3),
        exc_idx=st.lists(st.integers(0, 8), max_size=2),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(raw, replicas, pin_idx, exc_idx):
        nodes = [
            {
                "node_id": f"n{i:02d}",
                "location": f"loc-{li}",
                "eff": w * 100,
                "passes": p,
                "available": a and w > 0,
                "eligible": p and a and w > 0,
            }
            for i, (li, w, p, a) in enumerate(raw)
        ]
        pinned = [f"n{i:02d}" for i in pin_idx]  # may name missing nodes
        excluded = [f"n{i:02d}" for i in exc_idx]
        ndf = spark.createDataFrame(
            [
                (
                    n["node_id"],
                    n["location"],
                    n["eff"],
                    n["passes"],
                    n["eligible"],
                    not n["available"],  # model "full" as unavailable
                    False,
                )
                for n in nodes
            ],
            "node_id string, location string, eff_weight long,"
            " passes_filters boolean, eligible boolean, full boolean,"
            " draining boolean",
        )
        odf = spark.createDataFrame(
            [("alpha", pinned, excluded), ("beta", pinned[:1], excluded)],
            "subject string, pinned array<string>, excluded array<string>",
        )
        got: dict[str, list] = {"alpha": [], "beta": []}
        for r in resolve_with_override(ndf, odf, replicas).collect():
            got[r.subject].append((r.replica_rank, r.node_id, r.pinned))
        for s, pins in (("alpha", pinned), ("beta", pinned[:1])):
            want = py_resolve_override(nodes, s, replicas, pins, excluded)
            want_ranked = [
                (i + 1, nid, flag) for i, (nid, flag) in enumerate(want)
            ]
            assert sorted(got[s]) == want_ranked, (s, got[s], want_ranked)

    prop()


def test_placement_mutation_ladder_lanes(spark):
    """mutate_realm_placement.rs:104-215 — every mutation kind's
    accept/reject rungs populate, and error_class mirrors the enum
    (all InvalidInput except StrategyReferenced)."""
    from aruna_spark.queries.placement import (
        realm_placement_mutation_validate,
    )

    rows = realm_placement_mutation_validate(
        spark, "/root/testdata/sf0.01"
    ).collect()
    by_mut: dict[str, set[str]] = {}
    for r in rows:
        by_mut.setdefault(r["mutation"], set()).add(r["outcome"])
        if r["outcome"] == "ok":
            assert r["error_class"] is None
        elif r["outcome"] == "strategy_referenced":
            assert r["error_class"] == "strategy_referenced"
        else:
            assert r["error_class"] == "invalid_input"
    assert by_mut["upsert_node_draining"] == {"ok", "frozen_attributes"}
    assert by_mut["upsert_strategy"] == {"ok", "zero_replica_count"}
    assert by_mut["remove_strategy"] == {"ok", "strategy_referenced"}
    assert by_mut["set_default_strategy"] == {
        "ok",
        "missing_strategy",
        "no_metadata_binding",
    }
    assert by_mut["set_binding"] == {
        "ok",
        "missing_strategy",
        "no_metadata_binding",
    }
    assert by_mut["set_override"] == {"ok", "missing_strategy"}
    assert by_mut["upsert_node"] == {"ok"}
    assert by_mut["remove_entry"] == {"ok"}
