"""Realm quota-config normalization, canonical serialization, and the
write-side validation ladder.

Reference surface:

- ``supported_quota`` (core/src/admin_document_reducer.rs:1745-1753):
  before a ``RealmConfigQuotaSet`` value enters the admin document it
  is NORMALIZED — ``max_devices_per_user`` is dropped (unsupported
  until device-ownership enforcement exists), ``group_overrides``
  sort by group id, ``user_group_cap_overrides`` sort by user id.
  Both the write side (``quota_value``, rs:1741-1743) and the read
  side (``quota_from_value``, rs:1904-1908) apply it, so two replicas
  that set the SAME quota with overrides listed in different orders
  produce EQUAL path values — the reducer merges their dots instead
  of conflicting.
- ``validate_quota`` (operations/src/set_realm_quota.rs:378-437): the
  ladder a SetRealmQuota operation walks before writing, in order:
  ``warn_threshold_percent`` in 1..=100; ``grace_factor_percent`` >=
  100; ``max_devices_per_user`` must be unset; per group override —
  duplicate group id rejected, override ``grace_factor_percent``
  (when present) >= 100, grace-without-``quota_bytes`` rejected
  (grace is incoherent on an unlimited quota); per user override —
  duplicate user id rejected.

A quota config here is a plain dict mirroring ``QuotaConfig``
(core/src/structs/realm.rs:179-187)::

    {"default_group_quota_bytes": int | None,
     "grace_factor_percent": int,
     "warn_threshold_percent": int,
     "group_overrides": [(group_id, quota_bytes|None, grace|None)],
     "max_groups_per_user": int | None,
     "user_group_cap_overrides": [(user_id, max_groups|None)],
     "max_devices_per_user": int | None}

``canonical_quota_value`` renders the normalized config to the
pipe-delimited string the replay fixtures store on the
``realm_config.quota`` path (a deterministic stand-in for the
reference's serde_json encoding — what matters for reducer semantics
is that equal normalized configs render equal, which the round-trip
tests pin).
"""

from __future__ import annotations

from typing import Any

DEFAULT_QUOTA: dict[str, Any] = {
    # QuotaConfig::default (core/src/structs/realm.rs:202-214)
    "default_group_quota_bytes": None,
    "grace_factor_percent": 110,
    "warn_threshold_percent": 85,
    "group_overrides": [],
    "max_groups_per_user": 3,
    "user_group_cap_overrides": [],
    "max_devices_per_user": None,
}


class InvalidQuota(ValueError):
    """SetRealmQuotaError::InvalidQuota (set_realm_quota.rs:75-76)."""


def supported_quota(quota: dict[str, Any]) -> dict[str, Any]:
    """Normalize per admin_document_reducer.rs:1745-1753."""
    out = dict(DEFAULT_QUOTA)
    out.update(quota)
    out["max_devices_per_user"] = None
    out["group_overrides"] = sorted(
        (tuple(o) for o in out["group_overrides"]), key=lambda o: o[0]
    )
    out["user_group_cap_overrides"] = sorted(
        (tuple(o) for o in out["user_group_cap_overrides"]),
        key=lambda o: o[0],
    )
    return out


def _opt(v: Any) -> str:
    return "-" if v is None else str(v)


def canonical_quota_value(quota: dict[str, Any]) -> str:
    """Render the NORMALIZED config to the canonical path value."""
    q = supported_quota(quota)
    go = ",".join(
        f"{g}:{_opt(qb)}:{_opt(gf)}" for g, qb, gf in q["group_overrides"]
    )
    ugc = ",".join(
        f"{u}:{_opt(m)}" for u, m in q["user_group_cap_overrides"]
    )
    return (
        f"dgq={_opt(q['default_group_quota_bytes'])}"
        f"|grace={q['grace_factor_percent']}"
        f"|warn={q['warn_threshold_percent']}"
        f"|go={go}|mgpu={_opt(q['max_groups_per_user'])}|ugc={ugc}"
    )


def validate_quota(quota: dict[str, Any]) -> None:
    """The set_realm_quota.rs:378-437 ladder, rung for rung."""
    q = dict(DEFAULT_QUOTA)
    q.update(quota)
    warn = q["warn_threshold_percent"]
    if not 1 <= warn <= 100:
        raise InvalidQuota(
            f"warn_threshold_percent must be between 1 and 100, got {warn}"
        )
    grace = q["grace_factor_percent"]
    if grace < 100:
        raise InvalidQuota(
            f"grace_factor_percent must be at least 100, got {grace}"
        )
    if q["max_devices_per_user"] is not None:
        raise InvalidQuota(
            "max_devices_per_user is not supported until device "
            "ownership enforcement exists"
        )
    seen_groups: set[Any] = set()
    for group_id, quota_bytes, grace_pct in q["group_overrides"]:
        if group_id in seen_groups:
            raise InvalidQuota(
                f"duplicate group override for group {group_id}"
            )
        seen_groups.add(group_id)
        if grace_pct is not None:
            if grace_pct < 100:
                raise InvalidQuota(
                    "group override grace_factor_percent must be at "
                    f"least 100, got {grace_pct}"
                )
            if quota_bytes is None:
                raise InvalidQuota(
                    f"group override for group {group_id} sets "
                    "grace_factor_percent without quota_bytes; grace "
                    "is incoherent on an unlimited quota"
                )
    seen_users: set[Any] = set()
    for user_id, _max_groups in q["user_group_cap_overrides"]:
        if user_id in seen_users:
            raise InvalidQuota(
                f"duplicate user cap override for user {user_id}"
            )
        seen_users.add(user_id)
