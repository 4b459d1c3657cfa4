"""Egress screening vs core/src/egress.rs — the compiled-in deny
table, the v4-in-v6 normalization, and the allow-before-deny v6
exception, asserted lane-by-lane."""

from __future__ import annotations

from aruna_spark.queries.egress import egress_screen

SF01 = "/root/testdata/sf0.01"

# (k // 3) % 9 → expected verdict for v4 lanes
V4_EXPECT = {
    0: "blocked",  # 10.0.0.0/8
    1: "blocked",  # 127.0.0.0/8
    2: "blocked",  # 169.254.0.0/16
    3: "blocked",  # 172.16.0.0/12
    4: "blocked",  # 192.168.0.0/16
    5: "blocked",  # 100.64.0.0/10 (CGNAT)
    6: "blocked",  # 224.0.0.0/4 multicast
    7: "allowed",  # 8.8.x.x public
    8: "allowed",  # 93.x public
}

# (k // 3) % 13 → expected verdict for v6 lanes
V6_EXPECT = {
    0: "blocked",  # fc00::/7 ULA
    1: "blocked",  # fe80::/10 link-local
    2: "blocked",  # 2001:db8::/32 documentation
    3: "blocked",  # ff00::/8 multicast
    4: "blocked",  # 2002::/16 6to4
    5: "blocked",  # ::ffff:10.x — v4-mapped RFC1918 unwraps to v4 rows
    6: "allowed",  # ::ffff:8.8.x — v4-mapped public
    7: "allowed",  # 64:ff9b::1.1.x — NAT64-embedded public
    8: "blocked",  # 64:ff9b::192.168.x — NAT64-embedded private
    9: "allowed",  # 2001:3::/32 AMT — the allow-before-deny exception
    10: "blocked",  # 2001::/23 TEREDO block (minus the exceptions)
    11: "blocked",  # 3fff::/20 documentation
    12: "allowed",  # 2600:: public unicast
}


def test_egress_lanes_match_the_compiled_table(spark):
    rows = egress_screen(spark, SF01).collect()
    assert rows
    seen4, seen6 = set(), set()
    for r in rows:
        k = r["request_id"]
        if r["family"] == "v4":
            lane = (k // 3) % 9
            assert r["verdict"] == V4_EXPECT[lane], (k, lane)
            seen4.add(lane)
        else:
            lane = (k // 3) % 13
            assert r["verdict"] == V6_EXPECT[lane], (k, lane)
            seen6.add(lane)
            # normalization surfaces: mapped/NAT64 spells tag embedded
            if lane in (5, 6):
                assert r["embedded"] == "v4_mapped"
            if lane in (7, 8):
                assert r["embedded"] == "nat64"
    assert seen4 == set(V4_EXPECT) and seen6 == set(V6_EXPECT)


def test_deny_tables_match_reference_value_for_value():
    from aruna_spark.queries.egress import (
        ALLOWED_V6,
        DENIED_V4,
        DENIED_V6,
    )

    assert len(DENIED_V4) == 16 and "255.255.255.255/32" in DENIED_V4
    assert len(DENIED_V6) == 13 and "fc00::/7" in DENIED_V6
    assert len(ALLOWED_V6) == 7 and "2001:20::/28" in ALLOWED_V6
