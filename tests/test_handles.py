"""Handle-range directory + allocation walk, pinned against the
reference's own tests (core/src/structs/handle_allocation.rs:154-232:
assigned bands survive, overlaps fail closed, the reserved first
handle is never drawn, exhaustion)."""

from __future__ import annotations

from aruna_spark.queries.handles import (
    FIRST_GRANTABLE_HANDLE,
    HANDLE_RANGE_SIZE,
    handle_allocation_walk,
    handle_range_directory,
)

SF01 = "/root/testdata/sf0.01"


def test_directory_fail_closed_and_ranked(spark):
    rows = handle_range_directory(spark, SF01).collect()
    assert rows
    conflicted = [r for r in rows if r["conflicted"]]
    granted = [r for r in rows if not r["conflicted"]]
    assert conflicted and granted
    # conflicted grants never rank; granted ranks are 1..n per owner
    assert all(r["grant_rank"] is None for r in conflicted)
    by_owner: dict[str, list] = {}
    for r in granted:
        by_owner.setdefault(r["owner"], []).append(r)
    for rs in by_owner.values():
        rs.sort(key=lambda r: (r["start"], r["range_id"]))
        assert [r["grant_rank"] for r in rs] == list(range(1, len(rs) + 1))
    # granted intervals are pairwise disjoint (fail-closed worked)
    for rs in by_owner.values():
        for a, b in zip(rs, rs[1:]):
            assert a["end"] <= b["start"]
    # the pile-up lane occupies band 0, so the free band is above it
    free = rows[0]["free_band_start"]
    assert free == FIRST_GRANTABLE_HANDLE + HANDLE_RANGE_SIZE
    # ... and no grant touches it
    for r in rows:
        assert not (r["start"] < free + HANDLE_RANGE_SIZE and free < r["end"])


def test_walk_skips_reserved_handle_and_exhausts(spark):
    dir_rows = handle_range_directory(spark, SF01).collect()
    granted = {
        r["range_id"]: r for r in dir_rows if not r["conflicted"]
    }
    walk = handle_allocation_walk(spark, SF01).collect()
    assert walk
    drawn = [r for r in walk if not r["exhausted"]]
    assert drawn
    for r in drawn:
        g = granted[r["range_id"]]
        # the range's first handle (the owner's reserved JobControl
        # handle) is never drawn; handles stay inside the interval
        assert g["start"] < r["handle"] < g["end"]
    # draws are strictly increasing per owner (monotonic cursor)
    by_owner: dict[str, list] = {}
    for r in sorted(drawn, key=lambda r: r["draw_n"]):
        by_owner.setdefault(r["owner"], []).append(r["handle"])
    for handles in by_owner.values():
        assert handles == sorted(handles) and len(set(handles)) == len(
            handles
        )
    # the capacity-1 owner exhausts after its single draw
    w9 = sorted(
        (r for r in walk if r["owner"] == "w9"),
        key=lambda r: r["draw_n"],
    )
    assert w9 and not w9[0]["exhausted"]
    assert all(r["exhausted"] and r["handle"] is None for r in w9[1:])


# ---------------------------------------------- band-pool transfer slice
def test_pool_transfer_slice_matches_literal_port(spark, sf_dir):
    SF_DIR = sf_dir
    """The relational runs/argmin/split pipeline equals the literal
    rs:582-610 port on every fixture realm."""
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.handles import (
        load_pool_consumed,
        load_pool_spans,
        pool_transfer_slice_py,
    )

    load_all()
    fn, _ = REGISTRY["handle_pool_transfer_slice"]
    got = {r.realm_id: r for r in fn(spark, SF_DIR).collect()}
    spans: dict[str, list] = {}
    for s in load_pool_spans(spark).collect():
        spans.setdefault(s.realm_id, []).append(
            (s.span_idx, s.span_start, s.span_end)
        )
    consumed: dict[str, list] = {}
    for c in load_pool_consumed(spark).collect():
        consumed.setdefault(c.realm_id, []).append((c.start, c.end))
    for realm, sp in spans.items():
        ordered = [(a, b) for _, a, b in sorted(sp)]
        want = pool_transfer_slice_py(ordered, consumed.get(realm, []))
        r = got[realm]
        if want is None:
            assert r.has_pool is False
            assert r.slice_start is None and r.slice_end is None
        else:
            assert (r.slice_start, r.slice_end) == want


def test_pool_transfer_slice_reference_vectors():
    """The reference's own test semantics: the split keeps the pools
    DISJOINT, ties keep the first largest run, and fewer than two free
    bands yields no pool."""
    from aruna_spark.queries.handles import (
        HANDLE_RANGE_SIZE as S,
        pool_transfer_slice_py,
    )

    # transfer_splits_pool: 4 free bands -> transfer the upper 2
    assert pool_transfer_slice_py([(0, 4 * S)], []) == (2 * S, 4 * S)
    # odd run: keep ceil, transfer floor
    assert pool_transfer_slice_py([(0, 5 * S)], []) == (3 * S, 5 * S)
    # pools_stay_disjoint: the slice never intersects consumed ranges
    got = pool_transfer_slice_py([(0, 6 * S)], [(2 * S + 5, 2 * S + 9)])
    # largest run = bands 3..5 (3 bands); keep ceil(3/2)=2, transfer 1
    assert got == (5 * S, 6 * S)
    s0, e0 = got
    assert not (2 * S + 5 < e0 and s0 < 2 * S + 9)
    # tie between two equal runs: the FIRST span's run wins
    assert pool_transfer_slice_py(
        [(0, 2 * S), (10 * S, 12 * S)], []
    ) == (1 * S, 2 * S)
    # missing_pool_fails: a single free band is no pool
    assert pool_transfer_slice_py([(0, S)], []) is None
    assert pool_transfer_slice_py([(0, 2 * S)], [(10, 12)]) is None
