"""Property tests: the temporal joins equal a pure-Python model on
randomized event sets.

- as-of (`asof_attribution`): the union + running-last window must
  return, per probe, exactly the build event with the greatest
  ``(ts, event_id)`` among those with ``ts <= probe.ts`` — including
  the same-instant tie (a click AT the purchase timestamp matches) and
  the no-prior-build null. The window trick's sort key
  ``(ts, is_probe, event_id)`` is where an off-by-one would hide.
- range (`range_window_attribution`): the interval-bucket band join
  must be LOSSLESS for any window width and timestamp pattern — a
  build event in ``[probe.ts - W, probe.ts)`` must land in candidate
  buckets {b-1, b}, with boundary timestamps (exact multiples of W,
  ts == probe.ts, ts == probe.ts - W) resolved identically to the
  model's half-open interval.

Timestamps are generated at MICROsecond granularity near bucket
boundaries on purpose.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.queries.relational import (
    asof_attribution,
    range_window_attribution,
)

W_US = 1_000_000  # 1 s test window: boundaries land often

# events at micro-granularity hugging bucket boundaries: offsets within
# +-2 buckets of zero, biased to exact multiples and off-by-one-micro
_ts_us = st.one_of(
    st.integers(min_value=0, max_value=4 * W_US),
    st.sampled_from(
        [0, W_US - 1, W_US, W_US + 1, 2 * W_US - 1, 2 * W_US, 3 * W_US]
    ),
)
_event = st.tuples(
    _ts_us,
    st.integers(min_value=0, max_value=2),  # user id (tiny: force overlap)
    st.sampled_from(["click", "purchase"]),
)


def _df(spark, events):
    import datetime as dt

    # naive datetimes parse in the session zone; pin UTC so the model's
    # micros equal Spark's unix_micros (load_table pins the same way)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # epoch base keeps unix_micros positive and realistic
    base = 1_700_000_000_000_000
    rows = [(i, base + ts, u, k) for i, (ts, u, k) in enumerate(events)]
    epoch = dt.datetime(1970, 1, 1)
    py = [
        (i, epoch + dt.timedelta(microseconds=us), u, k, 1.0)
        for i, us, u, k in rows
    ]
    df = spark.createDataFrame(
        py or [(0, dt.datetime(2024, 1, 1), 0, "click", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    if not py:
        df = df.limit(0)
    return df, {i: (us, u, k) for i, us, u, k in rows}


@given(events=st.lists(_event, min_size=0, max_size=14))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_equals_python_model(spark, events):
    df, model = _df(spark, events)
    got = {
        r.purchase_id: (r.click_id, r.click_ts_us, r.gap_us)
        for r in asof_attribution(df).collect()
    }
    want = {}
    for pid, (pus, pu, pk) in model.items():
        if pk != "purchase":
            continue
        cands = [
            (cus, cid)
            for cid, (cus, cu, ck) in model.items()
            if ck == "click" and cu == pu and cus <= pus
        ]
        if cands:
            cus, cid = max(cands)
            want[pid] = (cid, cus, pus - cus)
        else:
            want[pid] = (None, None, None)
    assert got == want


@given(
    events=st.lists(_event, min_size=0, max_size=14),
    w=st.sampled_from([1, 7, W_US, 3 * W_US]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_window_equals_python_model(spark, events, w):
    df, model = _df(spark, events)
    got = {
        r.purchase_id: r.n_clicks
        for r in range_window_attribution(df, window_us=w).collect()
    }
    want = {}
    for pid, (pus, pu, pk) in model.items():
        if pk != "purchase":
            continue
        want[pid] = sum(
            1
            for cid, (cus, cu, ck) in model.items()
            if ck == "click" and cu == pu and pus - w <= cus < pus
        )
    assert got == want
