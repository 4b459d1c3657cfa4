"""The realm_config.quota admin-document path: write-side validation
ladder (set_realm_quota.rs:378-437), supported_quota normalization
(admin_document_reducer.rs:1745-1753), and the replay lane family's
fail-closed conflict semantics (apply_reducer_quota,
set_realm_quota.rs:365-377)."""

from __future__ import annotations

import pytest

from aruna_spark.ops.quota_config import (
    DEFAULT_QUOTA,
    InvalidQuota,
    canonical_quota_value,
    supported_quota,
    validate_quota,
)
from aruna_spark.queries.crdt_suite import (
    _QP_SUFFIX,
    crdt_realm_quota_replay,
)


# ------------------------------------------------- validation ladder
def test_validate_accepts_default():
    validate_quota(DEFAULT_QUOTA)  # set_realm_quota.rs:704


def test_validate_rejects_out_of_range_warn_threshold():
    for warn in (0, 101):
        with pytest.raises(InvalidQuota, match="warn_threshold_percent"):
            validate_quota({"warn_threshold_percent": warn})
    validate_quota({"warn_threshold_percent": 1})
    validate_quota({"warn_threshold_percent": 100})


def test_validate_rejects_low_grace_factor():
    with pytest.raises(InvalidQuota, match="grace_factor_percent"):
        validate_quota({"grace_factor_percent": 99})
    validate_quota({"grace_factor_percent": 100})


def test_validate_rejects_max_devices():
    with pytest.raises(InvalidQuota, match="max_devices_per_user"):
        validate_quota({"max_devices_per_user": 2})


def test_validate_rejects_duplicate_group_override():
    with pytest.raises(InvalidQuota, match="duplicate group override"):
        validate_quota(
            {"group_overrides": [("g-1", 100, None), ("g-1", 200, None)]}
        )


def test_validate_rejects_low_override_grace_factor():
    with pytest.raises(InvalidQuota, match="at least 100"):
        validate_quota({"group_overrides": [("g-1", 100, 99)]})
    # at or above 100 accepted (set_realm_quota.rs:675-687)
    validate_quota({"group_overrides": [("g-1", 100, 100)]})
    validate_quota({"group_overrides": [("g-1", 100, 150)]})


def test_validate_rejects_grace_override_on_unlimited_group_quota():
    # grace is incoherent on an unlimited quota (rs:688-703)
    with pytest.raises(InvalidQuota, match="incoherent"):
        validate_quota({"group_overrides": [("g-1", None, 150)]})
    # an unlimited override WITHOUT grace is fine
    validate_quota({"group_overrides": [("g-1", None, None)]})


def test_validate_rejects_duplicate_user_cap_override():
    with pytest.raises(InvalidQuota, match="duplicate user cap"):
        validate_quota(
            {"user_group_cap_overrides": [("u-1", 5), ("u-1", None)]}
        )


# ------------------------------------------------- normalization
def test_supported_quota_sorts_and_drops_devices():
    q = supported_quota(
        {
            "group_overrides": [("g-2", None, None), ("g-1", 2000, 150)],
            "user_group_cap_overrides": [("u-9", None), ("u-2", 5)],
            "max_devices_per_user": 7,
        }
    )
    assert q["group_overrides"] == [("g-1", 2000, 150), ("g-2", None, None)]
    assert q["user_group_cap_overrides"] == [("u-2", 5), ("u-9", None)]
    assert q["max_devices_per_user"] is None


def test_canonical_value_is_order_insensitive():
    # two replicas set the SAME quota with overrides listed in
    # different orders: the normalized serializations are EQUAL, so
    # the reducer merges dots instead of conflicting (rs:1421-1422)
    base = {
        "default_group_quota_bytes": 2000,
        "max_groups_per_user": None,
    }
    a = canonical_quota_value(
        {
            **base,
            "group_overrides": [("g-1", 2000, 150), ("g-2", None, None)],
            "user_group_cap_overrides": [("u-2", 5), ("u-9", None)],
        }
    )
    b = canonical_quota_value(
        {
            **base,
            "group_overrides": [("g-2", None, None), ("g-1", 2000, 150)],
            "user_group_cap_overrides": [("u-9", None), ("u-2", 5)],
        }
    )
    assert a == b
    # and it is exactly the lane-3 fixture value at r=0
    assert a == "dgq=2000" + _QP_SUFFIX["qe"]


def test_fixture_suffixes_match_canonical_serializer():
    assert canonical_quota_value(
        {"default_group_quota_bytes": 1000}
    ) == "dgq=1000" + _QP_SUFFIX["q0"]
    assert canonical_quota_value(
        {
            "default_group_quota_bytes": 1000,
            "grace_factor_percent": 120,
            "warn_threshold_percent": 80,
        }
    ) == "dgq=1000" + _QP_SUFFIX["q1"]


# ------------------------------------------------- replay lanes
def test_quota_replay_lanes(spark, sf_dir):
    rows = {
        r["realm_id"]: r.asDict()
        for r in crdt_realm_quota_replay(spark, sf_dir).collect()
    }
    lanes = {
        int(k.removeprefix("realm-q")) % 5: v for k, v in rows.items()
    }
    assert set(lanes) == {0, 1, 2, 3, 4}
    for realm_id, row in rows.items():
        r = int(realm_id.removeprefix("realm-q"))
        lane = r % 5
        if lane == 0:
            # never set: QuotaConfig::default() (realm.rs:202-214)
            assert row["n_dots"] == 0 and not row["is_conflict"]
            assert row["quota_value"] is None
            assert row["eff_grace_pct"] == 110
            assert row["eff_warn_pct"] == 85
            assert row["eff_max_groups"] == 3
            assert row["eff_default_quota_bytes"] is None
        elif lane == 1:
            assert row["quota_value"] == f"dgq={1000 * (r + 1)}" + (
                _QP_SUFFIX["q0"]
            )
            assert row["n_dots"] == 1 and not row["is_conflict"]
        elif lane == 2:
            # causal re-set supersedes: LWW winner is the later write
            assert row["quota_value"] == f"dgq={1000 * (r + 1)}" + (
                _QP_SUFFIX["q1"]
            )
            assert row["eff_grace_pct"] == 120
            assert row["eff_warn_pct"] == 80
        elif lane == 3:
            # concurrent EQUAL (after normalization): dots merge
            assert row["n_dots"] == 2 and not row["is_conflict"]
            assert row["quota_value"] == f"dgq={2000 * (r + 1)}" + (
                _QP_SUFFIX["qe"]
            )
            assert row["eff_max_groups"] is None  # mgpu=- → unlimited
        else:
            # concurrent DIFFERING: fail-closed conflict; the stored
            # document keeps the last agreed (seed) quota
            assert row["is_conflict"]
            assert row["quota_value"] is None
            assert row["last_agreed_value"] == (
                f"dgq={1000 * (r + 1)}" + _QP_SUFFIX["q0"]
            )
            assert row["eff_grace_pct"] == 110  # seed grace, not 130/140
            assert row["eff_default_quota_bytes"] == 1000 * (r + 1)


# ------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st

_overrides = st.lists(
    st.tuples(
        st.sampled_from([f"g-{i}" for i in range(6)]),
        st.one_of(st.none(), st.integers(0, 10_000)),
        st.one_of(st.none(), st.integers(100, 300)),
    ),
    max_size=5,
    unique_by=lambda o: o[0],
)
_user_caps = st.lists(
    st.tuples(
        st.sampled_from([f"u-{i}" for i in range(6)]),
        st.one_of(st.none(), st.integers(0, 50)),
    ),
    max_size=5,
    unique_by=lambda o: o[0],
)


@settings(max_examples=300, deadline=None)
@given(
    _overrides,
    _user_caps,
    st.randoms(use_true_random=False),
    st.one_of(st.none(), st.integers(1, 9)),
)
def test_canonical_value_permutation_invariant(go, ugc, rnd, devices):
    """supported_quota (reducer rs:1745-1753) makes the serialization
    independent of override order and of max_devices_per_user — the
    exact property that lets two concurrent equal-content
    RealmConfigQuotaSet events MERGE dots instead of conflicting."""
    base = {
        "default_group_quota_bytes": 1234,
        "group_overrides": list(go),
        "user_group_cap_overrides": list(ugc),
        "max_devices_per_user": devices,
    }
    shuffled = dict(base)
    shuffled["group_overrides"] = list(go)
    shuffled["user_group_cap_overrides"] = list(ugc)
    rnd.shuffle(shuffled["group_overrides"])
    rnd.shuffle(shuffled["user_group_cap_overrides"])
    shuffled["max_devices_per_user"] = None
    assert canonical_quota_value(base) == canonical_quota_value(shuffled)
    # normalization is a fixpoint
    assert supported_quota(supported_quota(base)) == supported_quota(base)
