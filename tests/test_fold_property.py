"""Property tests (hypothesis) for the timer-debounce fold — the state
logic under applyInPandasWithState. No Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aruna_spark.streaming.stateful import DEBOUNCE_US, fold_bursts

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20_000_000),  # ts_us (0-20s)
        st.integers(min_value=1, max_value=1_000_000),  # event_id
    ),
    max_size=60,
)


def _full(evs, gap=DEBOUNCE_US):
    closed, state = fold_bursts(sorted(evs), gap)
    if state is not None:
        closed.append((state[0], state[0] + gap, state[1], state[2]))
    return closed


@given(events)
@settings(max_examples=300, deadline=None)
def test_bursts_partition_events(evs):
    bursts = _full(evs)
    # count conservation: every event lands in exactly one burst
    assert sum(b[2] for b in bursts) == len(evs)
    # burst windows are [start, start+gap), disjoint, ordered, gap apart
    for prev, cur in zip(bursts, bursts[1:]):
        assert cur[0] >= prev[0] + DEBOUNCE_US
    # each event's ts falls inside its burst window
    evs_sorted = sorted(evs)
    i = 0
    for start, publish_at, n, last in bursts:
        chunk = evs_sorted[i : i + n]
        assert all(start <= ts < publish_at for ts, _ in chunk)
        assert last == max((eid for _ts, eid in chunk), default=None)
        i += n


@given(events, st.integers(min_value=0, max_value=60))
@settings(max_examples=300, deadline=None)
def test_fold_is_split_invariant(evs, cut):
    """Folding a sorted prefix, carrying state, then folding the suffix
    must equal one whole fold — the exact contract the micro-batched
    stream relies on (state carried across batches)."""
    evs_sorted = sorted(evs)
    cut = min(cut, len(evs_sorted))
    c1, s1 = fold_bursts(evs_sorted[:cut])
    c2, s2 = fold_bursts(evs_sorted[cut:], state=s1)
    combined = list(c1) + list(c2)
    if s2 is not None:
        combined.append((s2[0], s2[0] + DEBOUNCE_US, s2[1], s2[2]))
    assert combined == _full(evs)
