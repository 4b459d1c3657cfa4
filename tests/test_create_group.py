"""Group-create owner-cap gate (create_group.rs:35-42,80-115,354-370).

Pins the reference's own test sequencing
(``owner_cap_blocks_creation_at_limit``: cap 1 — first create lands,
second rejects, an uncapped create still works past the limit) and
property-tests the batch classifier's closed form against a literal
sequential port of the in-transaction count-then-create loop.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aruna_spark.api import Engine
from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.create_group import (
    DEFAULT_GROUP_ROLES,
    create_group_gate,
)

load_all()


def _sequential_port(owner_cap, owned, n_requests):
    """The reference loop, literally: each create re-counts inside its
    transaction (the bounded iter sees min(owned, cap)) and a success
    writes one owner-index entry (rs:392-404) the next count sees."""
    out = []
    for _ in range(n_requests):
        created, limit = create_group_gate(owner_cap, owned)
        seen = None
        if owner_cap not in (None, 0):
            seen = min(owned, owner_cap)
        out.append((created, limit, seen))
        if created:
            owned += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(st.none(), st.integers(0, 8)),
    st.integers(0, 10),
    st.integers(1, 12),
)
def test_closed_form_matches_sequential_port(cap, owned, n):
    """created iff rank <= cap - owned; owned_seen = owned + rank - 1
    on success, = cap on a counted rejection, NULL when no scan ran."""
    port = _sequential_port(cap, owned, n)
    for rank, (created, limit, seen) in enumerate(port, start=1):
        want_created = cap is None or rank <= cap - owned
        assert created == want_created
        assert limit == (None if created else cap)
        if cap is None or cap == 0:
            assert seen is None
        elif created:
            assert seen == owned + rank - 1
        else:
            assert seen == cap


def test_reference_sequencing_cap_one():
    """owner_cap_blocks_creation_at_limit (create_group.rs tests):
    capped-1 first create lands, the second rejects with limit 1, and
    an exempt create still works past the limit."""
    port = _sequential_port(1, 0, 2)
    assert port[0][0] is True and port[1] == (False, 1, 1)
    assert create_group_gate(None, 5) == (True, None)


def test_cap_zero_rejects_before_counting():
    """rs:354-361 — Some(0) fails with limit 0 regardless of owned."""
    assert create_group_gate(0, 0) == (False, 0)
    assert create_group_gate(0, 100) == (False, 0)


def test_api_route_envelopes(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    ok = eng.create_group("user-1", "my group", None, 99, group_id="g1")
    assert ok["status"] == 201
    assert ok["roles"] == list(DEFAULT_GROUP_ROLES)
    assert ok["admin_assigned_users"] == ["user-1"]
    capped = eng.create_group("user-1", "again", 2, 2)
    assert capped == {
        "status": 409, "error": "OwnedGroupLimitReached", "limit": 2
    }
    zero = eng.create_group("user-1", "never", 0, 0)
    assert zero["status"] == 409 and zero["limit"] == 0


def test_fixture_lanes_populated(spark, sf_dir):
    fn, _ = REGISTRY["registry_create_group_gate"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    by_cap: dict = {}
    for r in rows:
        by_cap.setdefault(r.owner_cap, []).append(r)
    # all four cap lanes present
    assert set(by_cap) == {None, 0, 2, 5}
    # exempt: everything created, never scanned
    assert all(
        r.verdict == "created" and r.owned_seen is None and r.limit is None
        for r in by_cap[None]
    )
    # cap 0: everything rejected before the scan
    assert all(
        r.verdict == "owned_limit" and r.owned_seen is None and r.limit == 0
        for r in by_cap[0]
    )
    # positive caps: creates occur (sf0.001 is too small to guarantee
    # rejections in every capped lane — the sf0.01 oracle covers both);
    # rejections echo the cap and saw exactly cap entries, creates fewer
    assert any(r.verdict == "created" for c in (2, 5) for r in by_cap[c])
    for cap in (2, 5):
        lane = by_cap[cap]
        for r in lane:
            if r.verdict == "owned_limit":
                assert r.limit == cap and r.owned_seen == cap
                assert r.group_id is None and r.n_roles is None
            else:
                assert r.owned_seen < cap
                assert r.group_id == f"g-new-{r.request_id}"
                assert r.n_roles == 3
    # per-actor sequencing: creates form a prefix of the request order
    by_actor: dict = {}
    for r in rows:
        by_actor.setdefault(r.actor_id, []).append(r)
    for lane in by_actor.values():
        lane.sort(key=lambda r: r.request_id)
        created_flags = [r.verdict == "created" for r in lane]
        assert created_flags == sorted(created_flags, reverse=True)
