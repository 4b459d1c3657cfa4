"""Egress screening — the compiled-in SSRF deny table for
tenant-supplied endpoints.

Reference surface (``core/src/egress.rs:1-170``, consumed by every
tenant-endpoint fetch in ``blob/src/egress.rs`` — the staging
connectors, HTTP autoindex and reference refresh planes this engine
already models all screen here):

- the deny table is a CONSTANT: "no realm config, node config, or API
  input can remove an entry" — 16 IPv4 special-purpose ranges
  (this-network, RFC1918 ×3, CGNAT, loopback, link-local, IETF
  protocol, TEST-NETs ×3, 6to4 relay, benchmarking, multicast,
  reserved, broadcast) and 13 IPv6 non-globally-reachable prefixes;
- ``normalize`` (rs:80-103) unwraps an IPv4 address carried inside an
  IPv6 spelling — the v4-MAPPED form (``::ffff:a.b.c.d``) and the
  NAT64 well-known prefix (``64:ff9b::/96``) — so a v6 spelling of a
  blocked v4 destination cannot skip the v4 rows; the deprecated
  ``::a.b.c.d`` compat spelling is NOT unwrapped — ``::/96`` is
  denied whole instead (rs:44-47);
- ``denied`` (rs:104-111): v4 membership in the deny rows; v6 checks
  the ALLOWED exceptions FIRST — the globally reachable assignments
  inside the otherwise-denied ``2001::/23`` (TEREDO's anycast trio,
  AMT, the ORCHID ranges) — then the deny rows; production wiring is
  ``EgressPolicy::strict()`` and "no configuration surface selects
  anything weaker" (rs:124-131).

Relational form: IPv6 compares as the address's 32-hex-digit string
(fixed-width hex is lexicographically numeric — no 128-bit integers,
no signed-shift divergence between engines); IPv4 as a plain BIGINT.
Each deny/allow row is a [start, end] range; membership is a
broadcast range-join. The fixture synthesizes resolved ADDRESSES
(the URL/DNS plane is the transport, excluded per the north star).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

# core/src/egress.rs:22-41 — value-for-value
DENIED_V4 = (
    "0.0.0.0/8",
    "10.0.0.0/8",
    "100.64.0.0/10",
    "127.0.0.0/8",
    "169.254.0.0/16",
    "172.16.0.0/12",
    "192.0.0.0/24",
    "192.0.2.0/24",
    "192.88.99.0/24",
    "192.168.0.0/16",
    "198.18.0.0/15",
    "198.51.100.0/24",
    "203.0.113.0/24",
    "224.0.0.0/4",
    "240.0.0.0/4",
    "255.255.255.255/32",
)

# rs:44-61
DENIED_V6 = (
    "::/96",
    "64:ff9b:1::/48",
    "100::/64",
    "100:0:0:1::/64",
    "2001::/23",
    "2001:db8::/32",
    "2002::/16",
    "3fff::/20",
    "5f00::/16",
    "fc00::/7",
    "fe80::/10",
    "fec0::/10",
    "ff00::/8",
)

# rs:63-73 — checked before the deny table
ALLOWED_V6 = (
    "2001:1::1/128",
    "2001:1::2/128",
    "2001:1::3/128",
    "2001:3::/32",
    "2001:4:112::/48",
    "2001:20::/28",
    "2001:30::/28",
)


def _v4_ranges() -> list[tuple[int, int]]:
    out = []
    for cidr in DENIED_V4:
        net = ipaddress.ip_network(cidr)
        out.append((int(net.network_address), int(net.broadcast_address)))
    return out


def _v6_ranges(cidrs) -> list[tuple[str, str]]:
    out = []
    for cidr in cidrs:
        net = ipaddress.ip_network(cidr)
        out.append(
            (
                format(int(net.network_address), "032x"),
                format(int(net.broadcast_address), "032x"),
            )
        )
    return out


def _duck_egress_sql() -> str:
    v4 = ", ".join(f"({a}, {b})" for a, b in _v4_ranges())
    v6d = ", ".join(f"('{a}', '{b}')" for a, b in _v6_ranges(DENIED_V6))
    v6a = ", ".join(f"('{a}', '{b}')" for a, b in _v6_ranges(ALLOWED_V6))
    return f"""
    WITH v4_deny(lo, hi) AS (VALUES {v4}),
    v6_deny(lo, hi) AS (VALUES {v6d}),
    v6_allow(lo, hi) AS (VALUES {v6a}),
    reqs AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 16 = 11
    ),
    addrs AS (
      SELECT k AS request_id,
             CASE WHEN k % 3 = 0 THEN 'v6' ELSE 'v4' END AS family,
             CASE WHEN k % 3 <> 0 THEN
               CASE (k // 3) % 9
                 WHEN 0 THEN CAST(10 AS BIGINT) * 16777216 + k % 65536
                 WHEN 1 THEN CAST(127 AS BIGINT) * 16777216 + k % 256
                 WHEN 2 THEN CAST(169 AS BIGINT) * 16777216 + 254 * 65536 + k % 256
                 WHEN 3 THEN CAST(172 AS BIGINT) * 16777216 + 16 * 65536 + k % 256
                 WHEN 4 THEN CAST(192 AS BIGINT) * 16777216 + 168 * 65536 + k % 65536
                 WHEN 5 THEN CAST(100 AS BIGINT) * 16777216 + 64 * 65536 + k % 4096
                 WHEN 6 THEN CAST(224 AS BIGINT) * 16777216 + k % 256
                 WHEN 7 THEN CAST(8 AS BIGINT) * 16777216 + 8 * 65536 + k % 256
                 ELSE CAST(93 AS BIGINT) * 16777216 + k % 65536
               END
             END AS v4_addr,
             CASE WHEN k % 3 = 0 THEN
               CASE (k // 3) % 13
                 WHEN 0 THEN 'fc000000000000000000000000000000'
                 WHEN 1 THEN 'fe800000000000000000000000000000'
                 WHEN 2 THEN '20010db8000000000000000000000000'
                 WHEN 3 THEN 'ff020000000000000000000000000000'
                 WHEN 4 THEN '20020000000000000000000000000000'
                 WHEN 5 THEN '00000000000000000000ffff0a000000'
                 WHEN 6 THEN '00000000000000000000ffff08080000'
                 WHEN 7 THEN '0064ff9b000000000000000001010000'
                 WHEN 8 THEN '0064ff9b0000000000000000c0a80000'
                 WHEN 9 THEN '20010003000000000000000000000000'
                 WHEN 10 THEN '20010000000000000000000000000000'
                 WHEN 11 THEN '3fff0000000000000000000000000000'
                 ELSE '26000000000000000000000000000000'
               END
             END AS v6_base
      FROM reqs
    ),
    spelled AS (
      SELECT request_id, family, v4_addr,
             CASE WHEN family = 'v6' THEN
               substr(v6_base, 1, 28) || printf('%04x', request_id % 65536)
             END AS v6_hex
      FROM addrs
    ),
    normalized AS (
      SELECT *,
             CASE
               WHEN family = 'v6'
                    AND substr(v6_hex, 1, 24)
                        = '000000000000000000000000' THEN NULL
               WHEN family = 'v6'
                    AND substr(v6_hex, 1, 24)
                        = '00000000000000000000ffff'
                 THEN 'v4_mapped'
               WHEN family = 'v6'
                    AND substr(v6_hex, 1, 24)
                        = '0064ff9b0000000000000000'
                 THEN 'nat64'
             END AS embedded,
             CASE
               WHEN family = 'v4' THEN v4_addr
               WHEN substr(v6_hex, 1, 24) = '00000000000000000000ffff'
                 OR substr(v6_hex, 1, 24) = '0064ff9b0000000000000000'
                 THEN CAST(('0x' || substr(v6_hex, 25, 8)) AS BIGINT)
             END AS eff_v4
      FROM spelled
    )
    SELECT request_id, family, v4_addr, v6_hex, embedded,
           CASE
             WHEN eff_v4 IS NOT NULL THEN
               CASE WHEN EXISTS (SELECT 1 FROM v4_deny d
                                 WHERE eff_v4 BETWEEN d.lo AND d.hi)
                    THEN 'blocked' ELSE 'allowed' END
             WHEN EXISTS (SELECT 1 FROM v6_allow a
                          WHERE v6_hex BETWEEN a.lo AND a.hi)
               THEN 'allowed'
             WHEN EXISTS (SELECT 1 FROM v6_deny d
                          WHERE v6_hex BETWEEN d.lo AND d.hi)
               THEN 'blocked'
             ELSE 'allowed'
           END AS verdict
    FROM normalized
    """


@register("egress_screen", oracle=_duck_egress_sql())
def egress_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-screen resolved tenant-endpoint addresses against the
    compiled-in egress policy (``EgressPolicy::strict().check``,
    egress.rs:104-170): v4-embedded spellings normalize FIRST
    (v4-mapped and NAT64 — a v6 spelling of a blocked v4 destination
    cannot skip the v4 rows; the deprecated ``::a.b.c.d`` compat form
    stays un-unwrapped and falls to the denied ``::/96``), effective
    v4 addresses screen against the 16-row v4 table, and native v6
    addresses check the 2001::/23 allow exceptions BEFORE the 13-row
    deny table. The policy tables are constants → broadcast range
    joins; the request batch is the only growing side."""
    k = F.col("k")
    lane4 = F.floor(k / 3) % 9
    lane6 = F.floor(k / 3) % 13
    reqs = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 16 == 11)
        .select(F.col("o_orderkey").alias("k"))
        .select(
            k.alias("request_id"),
            F.when(k % 3 == 0, "v6").otherwise("v4").alias("family"),
            F.when(
                k % 3 != 0,
                F.when(lane4 == 0, 10 * 16777216 + k % 65536)
                .when(lane4 == 1, 127 * 16777216 + k % 256)
                .when(lane4 == 2, 169 * 16777216 + 254 * 65536 + k % 256)
                .when(lane4 == 3, 172 * 16777216 + 16 * 65536 + k % 256)
                .when(lane4 == 4, 192 * 16777216 + 168 * 65536 + k % 65536)
                .when(lane4 == 5, 100 * 16777216 + 64 * 65536 + k % 4096)
                .when(lane4 == 6, 224 * 16777216 + k % 256)
                .when(lane4 == 7, 8 * 16777216 + 8 * 65536 + k % 256)
                .otherwise(93 * 16777216 + k % 65536),
            )
            .cast("long")
            .alias("v4_addr"),
            F.when(
                k % 3 == 0,
                F.when(lane6 == 0, "fc000000000000000000000000000000")
                .when(lane6 == 1, "fe800000000000000000000000000000")
                .when(lane6 == 2, "20010db8000000000000000000000000")
                .when(lane6 == 3, "ff020000000000000000000000000000")
                .when(lane6 == 4, "20020000000000000000000000000000")
                .when(lane6 == 5, "00000000000000000000ffff0a000000")
                .when(lane6 == 6, "00000000000000000000ffff08080000")
                .when(lane6 == 7, "0064ff9b000000000000000001010000")
                .when(lane6 == 8, "0064ff9b0000000000000000c0a80000")
                .when(lane6 == 9, "20010003000000000000000000000000")
                .when(lane6 == 10, "20010000000000000000000000000000")
                .when(lane6 == 11, "3fff0000000000000000000000000000")
                .otherwise("26000000000000000000000000000000"),
            ).alias("v6_base"),
        )
    )
    v6_hex = F.when(
        F.col("family") == "v6",
        F.concat(
            F.substring("v6_base", 1, 28),
            F.lower(F.lpad(F.hex(F.col("request_id") % 65536), 4, "0")),
        ),
    )
    spelled = reqs.select(
        "request_id", "family", "v4_addr", v6_hex.alias("v6_hex")
    )
    head24 = F.substring("v6_hex", 1, 24)
    embedded = (
        F.when(
            (F.col("family") == "v6")
            & (head24 == "000000000000000000000000"),
            F.lit(None).cast("string"),
        )
        .when(
            (F.col("family") == "v6")
            & (head24 == "00000000000000000000ffff"),
            "v4_mapped",
        )
        .when(
            (F.col("family") == "v6")
            & (head24 == "0064ff9b0000000000000000"),
            "nat64",
        )
    )
    eff_v4 = (
        F.when(F.col("family") == "v4", F.col("v4_addr"))
        .when(
            head24.isin(
                "00000000000000000000ffff", "0064ff9b0000000000000000"
            ),
            F.conv(F.substring("v6_hex", 25, 8), 16, 10).cast("long"),
        )
        .cast("long")
    )
    normalized = spelled.select(
        "request_id",
        "family",
        "v4_addr",
        "v6_hex",
        embedded.alias("embedded"),
        eff_v4.alias("eff_v4"),
    )
    # The policy tables are compiled-in CONSTANTS (egress.rs:104-170:
    # 16 v4 rows, 13+2 v6 rows) — fold them into array literals and
    # screen with a codegen `exists` per row instead of the r14
    # semi-join + join-back chain, which re-evaluated the request
    # frame once per join-back (16 scans in the plan). Same verdicts:
    # a NULL address yields a NULL hit flag, which the verdict ladder
    # only consults on branches where the address is non-null.
    def _range_hit(col: F.Column, ranges) -> F.Column:
        arr = F.array(
            *[
                F.struct(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
                for lo, hi in ranges
            ]
        )
        return F.exists(
            arr, lambda r: (col >= r["lo"]) & (col <= r["hi"])
        )

    screened = normalized.withColumns(
        {
            "v4_hit": _range_hit(F.col("eff_v4"), _v4_ranges()),
            "v6_allowed": _range_hit(
                F.col("v6_hex"), _v6_ranges(ALLOWED_V6)
            ),
            "v6_denied": _range_hit(
                F.col("v6_hex"), _v6_ranges(DENIED_V6)
            ),
        }
    )
    verdict = (
        F.when(
            F.col("eff_v4").isNotNull(),
            F.when(F.col("v4_hit"), "blocked").otherwise("allowed"),
        )
        .when(F.col("v6_allowed"), "allowed")
        .when(F.col("v6_denied"), "blocked")
        .otherwise("allowed")
    )
    return screened.select(
        "request_id",
        "family",
        "v4_addr",
        "v6_hex",
        "embedded",
        verdict.alias("verdict"),
    )
