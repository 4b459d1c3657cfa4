"""Transitive subject-merge closure: iterating the reference's
per-write one-hop resolution (user_subject_index.rs:232-301) to
fixpoint equals the component collapse, and the closure genuinely
collapses chains the one-hop pass leaves behind."""

from __future__ import annotations

import pytest

from aruna_spark.queries.principals import (
    load_subject_claims,
    registry_subject_closure,
    registry_subject_merges,
)


@pytest.fixture(scope="module")
def claims(spark, sf_dir):
    return {
        r.user_id: set(r.subject_ids)
        for r in load_subject_claims(spark, sf_dir).collect()
    }


def _one_hop_fixpoint(claims: dict[str, set[str]]) -> dict[str, str]:
    """Pure-python reimplementation of the ONE-HOP merge applied
    repeatedly until no subject has two claimants: each round, every
    multi-claimant subject's claimants collapse into the minimum
    claimant (losers' subjects move to the winner). Returns original
    user -> terminal canonical user."""
    alias: dict[str, str] = {u: u for u in claims}
    live = {u: set(s) for u, s in claims.items()}
    for _ in range(50):
        by_subject: dict[str, set[str]] = {}
        for u, subs in live.items():
            for s in subs:
                by_subject.setdefault(s, set()).add(u)
        conflicts = {s: us for s, us in by_subject.items() if len(us) > 1}
        if not conflicts:
            break
        # deterministic application order (the batch is unordered in a
        # bulk import; min-first keeps this reproducible)
        for s in sorted(conflicts):
            us = {u for u in conflicts[s] if u in live}
            if len(us) < 2:
                continue
            winner = min(us)
            for loser in us - {winner}:
                live[winner] |= live.pop(loser)
                for orig, a in alias.items():
                    if a == loser:
                        alias[orig] = winner
    else:
        raise AssertionError("one-hop iteration did not converge")
    return alias


def test_one_hop_iterated_equals_closure(spark, sf_dir, claims):
    alias = _one_hop_fixpoint(claims)
    merged_users = {u for u, a in alias.items() if a != u}
    canon_of = {}
    for u, a in alias.items():
        if a != u or any(v == u for k, v in alias.items() if k != u):
            canon_of.setdefault(a, set()).add(u)
    rows = registry_subject_closure(spark, sf_dir).collect()
    got = {
        r.canonical_user: set(r.alias_users_csv.split(","))
        | {r.canonical_user}
        for r in rows
    }
    # every component the fixpoint found, with identical membership
    expected = {
        a: members for a, members in canon_of.items() if len(members) > 1
    }
    assert got == expected
    # subjects per component are the union over members
    for r in rows:
        members = set(r.alias_users_csv.split(",")) | {r.canonical_user}
        subs = set()
        for m in members:
            subs |= claims[m]
        assert set(r.merged_subjects_csv.split(",")) == subs
    assert merged_users == {
        u for r in rows for u in r.alias_users_csv.split(",")
    }


def test_closure_collapses_a_synthetic_chain(spark):
    """Structural chain check, independent of fixture scale: A–B share
    s1 (winner A), B–C share s2 (winner B) — the one-hop pass leaves
    {A,B} and {B,C} under two winners; the closure must collapse all
    three under A."""
    from aruna_spark.queries.principals import subject_closure_of

    pairs = spark.createDataFrame(
        [
            ("user-a", "s1"),
            ("user-b", "s1"),
            ("user-b", "s2"),
            ("user-c", "s2"),
            ("user-z", "s9"),  # singleton — must not appear
        ],
        "user_id string, subject_id string",
    )
    rows = subject_closure_of(pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.canonical_user == "user-a"
    assert set(r.alias_users_csv.split(",")) == {"user-b", "user-c"}
    assert set(r.merged_subjects_csv.split(",")) == {"s1", "s2"}
    assert r.n_members == 3


def test_fixture_has_chains_at_oracle_scale(spark):
    """At sf0.01 — where the driver's oracle gate runs — the fixture
    must exercise the transitive case: some one-hop winners get
    absorbed by the closure (otherwise the query is indistinguishable
    from registry_subject_merges there)."""
    sf01 = "/root/testdata/sf0.01"
    winners = {
        r.canonical_user
        for r in registry_subject_merges(spark, sf01).collect()
    }
    absorbed = {
        u
        for r in registry_subject_closure(spark, sf01).collect()
        for u in r.alias_users_csv.split(",")
        if u in winners
    }
    assert absorbed, "no chain at sf0.01 — transitive branch untested"


def test_closure_canonical_is_component_min(spark, sf_dir):
    for r in registry_subject_closure(spark, sf_dir).collect():
        members = set(r.alias_users_csv.split(",")) | {r.canonical_user}
        assert r.canonical_user == min(members)
        assert r.n_members == len(members)


# ------------------------------------------------ group search walk
def test_search_groups_two_page_walk(spark, sf_dir):
    """search_groups.rs keyset continuation: walking pages by the
    minted next_start_after yields every case-insensitive match in
    key order, no skip, no dup; the final page minted no cursor."""
    from aruna_spark.queries.principals import (
        GROUP_QUERY,
        GROUP_SEARCH_LIMIT,
        load_group_directory,
        search_groups_of,
    )

    groups = load_group_directory(spark, sf_dir)
    expected = [
        r.group_id
        for r in groups.filter(
            f"contains(lower(display_name), '{GROUP_QUERY}')"
        )
        .orderBy("group_id")
        .collect()
    ]
    assert len(expected) > GROUP_SEARCH_LIMIT, "fixture must paginate"
    walked, cursor = [], None
    for _ in range(40):
        rows = search_groups_of(
            groups, GROUP_QUERY, GROUP_SEARCH_LIMIT, start_after=cursor
        ).collect()
        walked += [r.group_id for r in rows]
        cursors = {r.next_start_after for r in rows}
        assert len(cursors) == 1
        cursor = cursors.pop()
        if cursor is None:
            break
    assert walked == expected
    # matches are on the NAME, scan order is the KEY
    assert all(
        "platform" in r.display_name.lower()
        for r in search_groups_of(groups, "PLATFORM", 5).collect()
    )


# ---------------------------------- canonical token-subject enforcement
def test_token_canonical_check_lanes(spark, sf_dir):
    """ensure_canonical_user_token_subject.rs: Unauthorized rungs
    strictly before Forbidden; empty subject lists pass without index
    reads; merge losers' tokens go Forbidden."""
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.principals import load_subject_claims

    load_all()
    fn, _ = REGISTRY["user_token_canonical_check"]
    rows = {r.user_id: r for r in fn(spark, sf_dir).collect()}
    # ghosts: no user record at all
    for i in range(3):
        assert rows[f"user-ghost-{i}"].verdict == "unauthorized_missing"
    claims = {
        r.user_id: list(r.subject_ids)
        for r in load_subject_claims(spark, sf_dir).collect()
    }
    # canonical winner per subject = min claimant
    canon: dict[str, str] = {}
    for u, subs in claims.items():
        for s in subs:
            canon[s] = min(canon.get(s, u), u)
    for uid, r in rows.items():
        if uid.startswith("user-ghost"):
            continue
        c = int(uid.removeprefix("user-"))
        if c % 4 == 3:
            # corrupted stored record wins over any subject problem
            assert r.verdict == "unauthorized_mismatch"
        elif c % 4 == 2:
            assert r.verdict == "ok" and r.n_subjects == 0
        elif c % 4 == 1:
            # the planted unindexed extra subject forbids even winners
            assert r.verdict == "forbidden" and r.n_unindexed >= 1
        else:
            loser = any(canon[s] != uid for s in claims[uid])
            assert r.verdict == ("forbidden" if loser else "ok")
            assert (r.n_noncanonical > 0) == loser
