"""Resource-event routing suppression rules (notifications/routing.rs)."""

from __future__ import annotations

from collections import defaultdict

from aruna_spark.queries.notify_routing import (
    _users,
    load_resource_events,
    notify_route_resource_events,
)


def test_suppression_rules_hold_and_fire(spark, sf_dir):
    events = [
        r.asDict() for r in load_resource_events(spark, sf_dir).collect()
    ]
    admins_by_group = defaultdict(set)
    for u in _users(spark, sf_dir).filter("is_group_admin").collect():
        admins_by_group[u["group_id"]].add(u["user_id"])
    by_event = defaultdict(list)
    for r in notify_route_resource_events(spark, sf_dir).collect():
        by_event[r["event_id"]].append(r.asDict())

    self_suppressed = admin_actor_suppressed = False
    for ev in events:
        recs = by_event.get(ev["event_id"], [])
        if ev["event_kind"] == "node_onboarded":
            assert all(r["kind"] == "node_onboarded" for r in recs)
            continue
        direct = [r for r in recs
                  if r["kind"] in ("added_to_group", "removed_from_group")]
        admin_recipients = {
            r["recipient"] for r in recs
            if r["kind"] in ("group_member_added", "group_member_removed")
        }
        group_admins = admins_by_group[ev["group_id"]]
        if ev["affected_user"] == ev["actor_user_id"]:
            # rs:48: acting on yourself notifies nobody directly
            assert not direct, f"{ev['event_id']}: self-action notified"
            self_suppressed = True
        else:
            assert [r["recipient"] for r in direct] == [ev["affected_user"]]
        # rs:63-65: the affected/acting admins never hear about it
        assert ev["affected_user"] not in admin_recipients
        assert ev["actor_user_id"] not in admin_recipients
        # every OTHER group admin does
        expected = group_admins - {ev["affected_user"], ev["actor_user_id"]}
        assert admin_recipients == expected
        if (
            ev["actor_user_id"] in group_admins
            and ev["actor_user_id"] != ev["affected_user"]
        ):
            admin_actor_suppressed = True
    assert self_suppressed, "fixture must exercise the self-action skip"
    assert admin_actor_suppressed, "fixture must exercise the acting admin"
