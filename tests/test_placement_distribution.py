"""Deterministic distribution gates for the weighted placement resolver.

Mirrors ``operations/src/placement/distribution.rs`` — subjects come
from a deterministic counter-hash stream (no RNG), so the observed
shares reproduce on every run:

- uniform weights balance within the binomial band (rs:88-98)
- weighted shares track weight (rs:100-112)
- a reweight moves keys ONLY toward the bumped node, and the moved
  fraction stays in the proportional-minimum band (rs:114-142)
- a multiply affinity shifts the cross-location share exactly as the
  permille predicts (rs:144-168)

These run over the pure-Python literal port of ``resolve_holders``
(tests/test_placement.py), which the hypothesis property there pins
equal to the DataFrame resolution — so the gates transitively hold
for the Spark plan.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from tests.test_placement import py_resolve

SUBJECTS = 10_000


def _subject(counter: int) -> str:
    """Counter-hash subject stream (distribution.rs:22-24)."""
    return hashlib.sha256(counter.to_bytes(8, "little")).hexdigest()


def _node(nid: str, weight: int, location: str = "default") -> dict:
    return {
        "node_id": nid,
        "location": location,
        "eff": weight,
        "passes": True,
        "eligible": True,
    }


def _shares(nodes: list[dict]) -> Counter:
    hits: Counter = Counter()
    for counter in range(SUBJECTS):
        hits[py_resolve(nodes, _subject(counter), 1)[0]] += 1
    return hits


def test_uniform_weights_balance_within_binomial_band():
    # 5 uniform nodes, replica 1: each expects 20%. 3sigma over 10_000
    # is ~1.2pp; the reference's +-2pp band clears it comfortably.
    nodes = [_node(f"n{i}", 100) for i in range(1, 6)]
    hits = _shares(nodes)
    for i in range(1, 6):
        share = hits[f"n{i}"] / SUBJECTS
        assert abs(share - 0.20) < 0.02, f"n{i} share {share}"


def test_weighted_shares_track_weight_within_band():
    # Weights 100/200/300 => expected shares 1/6, 2/6, 3/6.
    nodes = [_node("n1", 100), _node("n2", 200), _node("n3", 300)]
    hits = _shares(nodes)
    for nid, want in [("n1", 1 / 6), ("n2", 2 / 6), ("n3", 3 / 6)]:
        share = hits[nid] / SUBJECTS
        assert abs(share - want) < 0.02, f"{nid} share {share} want {want}"


def test_reweight_moves_only_toward_bumped_node():
    # Bump one of 5 uniform nodes 100 -> 150 (total 500 -> 550): its
    # replica-1 share grows 100/500 -> 150/550 and ONLY those keys
    # move - all onto the bumped node, none reshuffled between others.
    before = [_node(f"n{i}", 100) for i in range(1, 6)]
    after = [_node("n1", 150)] + [_node(f"n{i}", 100) for i in range(2, 6)]
    changed = 0
    for counter in range(SUBJECTS):
        s = _subject(counter)
        old = py_resolve(before, s, 1)[0]
        new = py_resolve(after, s, 1)[0]
        if old != new:
            changed += 1
            assert new == "n1", f"subject {counter} moved off-target"
    fraction = changed / SUBJECTS
    # proportional minimum: 150/550 - 100/500 ~= 0.073, banded loosely
    assert 0.04 <= fraction <= 0.12, f"movement fraction {fraction}"


def test_multiply_affinity_changes_cross_location_distribution():
    # Two single-node locations at weight 100: baseline splits 50/50;
    # a Multiply{permille:3000} on one node's location lifts its
    # effective W_loc to 300 => expected share 300/400 = 75%.
    baseline = [_node("n1", 100, "a"), _node("n2", 100, "b")]
    boosted = [_node("n1", 300, "a"), _node("n2", 100, "b")]
    base_share = _shares(baseline)["n1"] / SUBJECTS
    mult_share = _shares(boosted)["n1"] / SUBJECTS
    assert abs(base_share - 0.50) < 0.02, f"baseline {base_share}"
    assert abs(mult_share - 0.75) < 0.02, f"multiplied {mult_share}"
