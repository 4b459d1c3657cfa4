"""Admin-document path reduction: the antichain model vs a literal
port of the reference's sequential reducer, plus the seed-replay
envelope lanes.

The literal port below follows ``core/src/admin_document_reducer.rs``
rung-for-rung (``reduce_value`` rs:1371-1423, ``event_is_stale_for_path``
rs:1435-1452, ``remove_conflict_values_superseded_by`` rs:1467-1477,
``take_version_dots``/``version_with_dots`` rs:1479-1502,
``record_conflict_value`` rs:1504-1519). The property: under CAUSAL
delivery (the document-sync topics deliver per-target in causal order;
the reducer's own out-of-order tests only ever permute same-origin or
concurrent events), every delivery order converges to the maximal
antichain that :mod:`aruna_spark.ops.admin_reduce` computes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aruna_spark.ops.admin_reduce import (
    reduce_admin_paths,
    reduce_admin_paths_py,
)
from aruna_spark.queries import REGISTRY, load_all

load_all()


# --------------------------------------------------------- literal port
def _observes(event: dict, dot: tuple[str, int]) -> bool:
    """event_observes_dot (rs:1533-1536)."""
    node, seq = dot
    return (event.get("observed") or {}).get(node, 0) >= seq or (
        event["origin_node"] == node and event["origin_seq"] > seq
    )


class LiteralPathReducer:
    """One path's worth of AdminDocumentReducerState (the per-path
    slice of user_subject_ids + equivalent_value_dots + conflicts)."""

    def __init__(self):
        self.version: tuple | None = None  # (value, dot)
        self.equivalent: set[tuple] = set()
        self.conflict: list[tuple] | None = None  # [(value, dot)]

    def _stale(self, event: dict) -> bool:
        same = lambda dot: (  # noqa: E731
            dot[0] == event["origin_node"] and dot[1] >= event["origin_seq"]
        )
        if self.version is not None and same(self.version[1]):
            return True
        if any(same(d) for d in self.equivalent):
            return True
        return self.conflict is not None and any(
            same(d) for _, d in self.conflict
        )

    def _record_conflict(self, value, dot) -> None:
        if self.conflict is None:
            self.conflict = []
        if not any(d == dot for _, d in self.conflict):
            self.conflict.append((value, dot))
            self.conflict.sort(key=lambda vd: vd[1])

    def _set_version(self, value, dots: set) -> None:
        dot = min(dots)
        rest = dots - {dot}
        self.equivalent = rest
        self.version = (value, dot)

    def apply(self, event: dict) -> None:
        value = event.get("value")
        dot = (event["origin_node"], event["origin_seq"])
        if self._stale(event):
            return
        # remove_conflict_values_superseded_by
        if self.conflict is not None:
            self.conflict = [
                (v, d) for v, d in self.conflict if not _observes(event, d)
            ]
            if not self.conflict:
                self.conflict = None
        if self.conflict is not None:
            self._record_conflict(value, dot)
            if all(v == value for v, _ in self.conflict):
                dots = {d for _, d in self.conflict}
                self.conflict = None
                self._set_version(value, dots)
            else:
                self.version = None
                self.equivalent = set()
            return
        if self.version is None:
            self._set_version(value, {dot})
            return
        dots = set(self.equivalent) | {self.version[1]}
        self.equivalent = set()
        unobserved = {d for d in dots if not _observes(event, d)}
        if not unobserved:
            self._set_version(value, {dot})
            return
        if self.version[0] != value:
            current_value = self.version[0]
            for d in unobserved:
                self._record_conflict(current_value, d)
            self._record_conflict(value, dot)
            self.version = None
            return
        unobserved.add(dot)
        self._set_version(value, unobserved)

    def outcome(self) -> dict | None:
        if self.conflict is not None:
            return {
                "value": None,
                "is_conflict": True,
                "is_live": False,
                "n_dots": len(self.conflict),
            }
        if self.version is None:
            return None
        value = self.version[0]
        return {
            "value": value,
            "is_conflict": False,
            "is_live": value is not None,
            "n_dots": 1 + len(self.equivalent),
        }


def _literal_reduce(events: list[dict]) -> dict:
    states: dict[str, LiteralPathReducer] = {}
    for e in events:
        states.setdefault(e["path"], LiteralPathReducer()).apply(e)
    out = {}
    for path, state in states.items():
        res = state.outcome()
        if res is not None:
            out[("t", path)] = res
    return out


# ------------------------------------------------ causal feed generator
@st.composite
def causal_feeds(draw):
    """A well-formed event history over 3 nodes / 2 paths: each node's
    observed clock is its own running clock (own seq = observed+1,
    matching apply_operation rs:360-366), optionally merged from other
    nodes' current clocks before emitting (a sync)."""
    n_events = draw(st.integers(1, 12))
    nodes = ["n0", "n1", "n2"]
    clocks = {n: {} for n in nodes}
    events = []
    for i in range(n_events):
        node = draw(st.sampled_from(nodes))
        if draw(st.booleans()):
            other = draw(st.sampled_from(nodes))
            for k, v in clocks[other].items():
                clocks[node][k] = max(clocks[node].get(k, 0), v)
        observed = dict(clocks[node])
        seq = observed.get(node, 0) + 1
        clocks[node][node] = seq
        events.append(
            {
                "key": ("t",),
                "path": draw(st.sampled_from(["p0", "p1"])),
                "value": draw(
                    st.sampled_from(["a", "b", "c", None])
                ),
                "origin_node": node,
                "origin_seq": seq,
                "observed": observed,
            }
        )
    return events


def _causal_orders(events: list[dict], priority: list[int]) -> list[dict]:
    """A delivery order that respects happens-before, steered by the
    drawn priority list."""
    remaining = list(range(len(events)))
    delivered: list[int] = []
    delivered_set: set[int] = set()

    def deps_done(i: int) -> bool:
        return all(
            j in delivered_set
            for j in range(len(events))
            if j != i
            and _observes(
                events[i],
                (events[j]["origin_node"], events[j]["origin_seq"]),
            )
        )

    while remaining:
        ready = [i for i in remaining if deps_done(i)]
        ready.sort(key=lambda i: priority[i % len(priority)] * 100 + i)
        pick = ready[0]
        remaining.remove(pick)
        delivered.append(pick)
        delivered_set.add(pick)
    return [events[i] for i in delivered]


@settings(max_examples=200, deadline=None)
@given(
    causal_feeds(),
    st.lists(st.integers(0, 9), min_size=1, max_size=12),
)
def test_literal_port_converges_to_antichain(events, priority):
    """Any causal delivery order of the literal reducer lands on the
    antichain reduction the Spark operator computes."""
    ordered = _causal_orders(events, priority)
    literal = _literal_reduce(ordered)
    model = reduce_admin_paths_py(events)
    assert literal == model


@settings(max_examples=100, deadline=None)
@given(
    causal_feeds(),
    st.lists(st.integers(0, 9), min_size=1, max_size=12),
    st.lists(st.integers(0, 9), min_size=1, max_size=12),
)
def test_literal_port_is_order_independent(events, pri_a, pri_b):
    a = _literal_reduce(_causal_orders(events, pri_a))
    b = _literal_reduce(_causal_orders(events, pri_b))
    assert a == b


# ---------------------------------------------------- Spark equivalence
def test_spark_reduce_matches_py_model(spark):
    events = [
        # later same-origin write supersedes
        {"key": ("t1",), "path": "p", "value": "a",
         "origin_node": "n0", "origin_seq": 1, "observed": {}},
        {"key": ("t1",), "path": "p", "value": "b",
         "origin_node": "n0", "origin_seq": 2, "observed": {"n0": 1}},
        # cross-origin observed write supersedes
        {"key": ("t2",), "path": "p", "value": "a",
         "origin_node": "n0", "origin_seq": 1, "observed": {}},
        {"key": ("t2",), "path": "p", "value": "b",
         "origin_node": "n1", "origin_seq": 1, "observed": {"n0": 1}},
        # tombstone
        {"key": ("t3",), "path": "p", "value": "a",
         "origin_node": "n0", "origin_seq": 1, "observed": {}},
        {"key": ("t3",), "path": "p", "value": None,
         "origin_node": "n1", "origin_seq": 1, "observed": {"n0": 1}},
        # concurrent equal values merge dots
        {"key": ("t4",), "path": "p", "value": "same",
         "origin_node": "n0", "origin_seq": 1, "observed": {}},
        {"key": ("t4",), "path": "p", "value": "same",
         "origin_node": "n1", "origin_seq": 1, "observed": {}},
        # concurrent different values conflict
        {"key": ("t5",), "path": "p", "value": "a",
         "origin_node": "n0", "origin_seq": 1, "observed": {}},
        {"key": ("t5",), "path": "p", "value": "b",
         "origin_node": "n1", "origin_seq": 1, "observed": {}},
    ]
    df = spark.createDataFrame(
        [
            (e["key"][0], e["path"], e["value"], e["origin_node"],
             e["origin_seq"], e["observed"])
            for e in events
        ],
        "target_id string, path string, value string, origin_node string,"
        " origin_seq long, observed map<string,bigint>",
    )
    got = {
        (r.target_id, r.path): {
            "value": r.value,
            "is_conflict": r.is_conflict,
            "is_live": r.is_live,
            "n_dots": r.n_dots,
        }
        for r in reduce_admin_paths(df, ["target_id"]).collect()
    }
    want = {
        (k[0], k[1]): v
        for k, v in reduce_admin_paths_py(
            [{**e, "key": (e["key"][0],)} for e in events]
        ).items()
    }
    assert got == want
    assert got[("t1", "p")]["value"] == "b"
    assert got[("t2", "p")]["value"] == "b"
    assert got[("t3", "p")] == {
        "value": None, "is_conflict": False, "is_live": False, "n_dots": 1
    }
    assert got[("t4", "p")] == {
        "value": "same", "is_conflict": False, "is_live": True, "n_dots": 2
    }
    assert got[("t5", "p")]["is_conflict"] is True


# ------------------------------------------------------- envelope lanes
def test_seed_replay_lanes(spark, sf_dir):
    fn, _ = REGISTRY["crdt_admin_seed_replay"]
    rows = {
        (r.target_kind, r.target_id): r for r in fn(spark, sf_dir).collect()
    }
    groups = {k: v for k, v in rows.items() if k[0] == "group"}
    realms = {k: v for k, v in rows.items() if k[0] == "realm"}
    users = {k: v for k, v in rows.items() if k[0] == "user"}
    assert groups and len(realms) == 7 and len(users) == 11
    for (_, tid), r in groups.items():
        doc_id = int(tid.removeprefix("grp-"))
        lane = doc_id % 5
        owner = f"user-{doc_id % 7}"
        if lane == 3:
            # concurrent create: display conflicts, equal fields merge
            assert r.display_name is None
            assert r.n_conflict_paths == 1
            assert r.owner == owner
            assert r.n_dots_total == 10
        else:
            assert r.display_name == f"name-{doc_id}"
            assert r.n_conflict_paths == 0
            assert r.owner == owner
        if lane == 1:
            assert (r.n_roles, r.n_assignments, r.admin_assigned) == (
                3, 2, True)
        elif lane == 2:
            # owner's admin assignment tombstoned
            assert (r.n_roles, r.n_assignments, r.admin_assigned) == (
                3, 0, False)
        elif lane == 4:
            # admin role removed: its live assignment is inactive
            assert (r.n_roles, r.n_assignments, r.admin_assigned) == (
                2, 0, False)
        elif lane == 0:
            assert (r.n_roles, r.n_assignments, r.admin_assigned) == (
                3, 1, True)
    for (_, tid), r in realms.items():
        assert r.display_name is None and r.owner is None
        assert r.user_name is None and r.n_subjects == 0
        assert (r.n_roles, r.n_assignments, r.admin_assigned) == (1, 1, True)
        assert r.n_conflict_paths == 0 and r.n_dots_total == 2
    for (_, tid), r in users.items():
        # register_or_get_oidc_user.rs:447-464 seed + the rename /
        # subject-removal mutation lanes
        u = int(tid.removeprefix("user-u"))
        assert (r.n_roles, r.n_assignments, r.admin_assigned) == (
            0, 0, False)
        assert r.n_conflict_paths == 0
        if u % 3 == 1:
            assert r.user_name == f"Renamed {u}" and r.n_subjects == 1
        elif u % 3 == 2:
            assert r.user_name == f"Name {u}" and r.n_subjects == 0
        else:
            assert r.user_name == f"Name {u}" and r.n_subjects == 1
