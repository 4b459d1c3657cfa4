"""Bucket CORS: stored per-bucket rule configs and the preflight
first-match query (VERDICT r8 'What's missing' #3).

Reference surface:

- ``core/src/structs/blob.rs:450-472`` — ``BucketCorsConfiguration {
  rules: Vec<BucketCorsRule> }``; rule = { id, allowed_origins,
  allowed_methods, allowed_headers, expose_headers, max_age_seconds }.
- ``operations/src/s3/bucket_cors.rs`` — config CRUD stores the rules
  on the bucket record (CRUD itself is route glue; the validation
  ladder lives in :mod:`aruna_spark.ops.cors_rules`).
- ``api/src/s3/cors.rs:52-74`` — ``match_preflight_rule``: the FIRST
  rule (vec order) whose origins match the Origin (case-sensitive
  single-``*`` wildcard), whose methods contain the requested method
  (ASCII case-insensitive), and which allows EVERY requested header
  (case-insensitive wildcard; an empty allowed list allows nothing,
  but zero requested headers match vacuously). The matched envelope
  (rs:66-72, 218-233): allow_origin is ``*`` when the rule holds a
  wildcard origin, else the request origin echoed; allow_headers echo
  the requested list when non-empty, else the rule's allowed list;
  allow_methods/expose_headers/max_age come from the rule.
- ``api/src/s3/s3_server.rs:330-345`` — an unmatched preflight is
  answered WITHOUT CORS headers (forbidden envelope).

Spark mapping: the rule table is a tiny broadcast relation keyed by
bucket with PRE-COMPILED regex literals (wildcards compile once at
config-write time, exactly where the reference compiles its
matchers); requests are the scan-scale side. First-match is a
partitioned row_number over (request, rule_idx) — never a global
window. Requested-header coverage uses array higher-order functions
(forall/exists), all JVM-side.

Fixture: four buckets — b0/b1/b2 with 2/2/1 validated rules, b3 with
no CORS config (every preflight forbidden). Requests derive from
orders (``o_orderkey % 10 == 3``): method ``% 7`` (includes a
lowercase ``get`` — case-insensitive compare — and PATCH, matching no
rule) and requested headers ``% 3`` are coprime to the %10 row
selection; the bucket (``% 4``) and origin (``% 5``) lanes SHARE a
factor with 10, so they key off the tens digit ``(o_orderkey // 10)``
instead — the lane-coverage test asserts all four buckets and all
five origins are populated at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.cors_rules import (
    validate_cors_config,
    wildcard_to_regex,
)
from aruna_spark.queries import register

# ------------------------------------------------------------- fixture
_RAW_CONFIGS: dict[str, list[dict]] = {
    "b0": [
        {
            "id": "b0-any-read",
            "allowed_origins": ["*"],
            "allowed_methods": ["GET", "HEAD"],
            "allowed_headers": [],
            "expose_headers": [],
            "max_age_seconds": 3600,
        },
        {
            "id": "b0-app-write",
            "allowed_origins": ["https://app.example.org"],
            "allowed_methods": ["get", "put", "post"],  # normalize→upper
            "allowed_headers": ["*"],
            "expose_headers": ["etag"],
            "max_age_seconds": None,
        },
    ],
    "b1": [
        {
            "id": "b1-subdomains",
            "allowed_origins": ["https://*.example.org"],
            "allowed_methods": ["GET"],
            "allowed_headers": ["content-type"],
            "expose_headers": [],
            "max_age_seconds": 60,
        },
        {
            "id": "b1-portal",
            "allowed_origins": ["https://portal.test"],
            "allowed_methods": ["PUT", "DELETE"],
            "allowed_headers": ["content-type", "x-custom"],
            "expose_headers": ["etag", "x-request-id"],
            "max_age_seconds": 600,
        },
    ],
    "b2": [
        {
            "id": "b2-post",
            "allowed_origins": ["https://portal.test", "https://app.example.org"],
            "allowed_methods": ["POST"],
            "allowed_headers": ["X-Custom"],  # header match lowercases
            "expose_headers": [],
            "max_age_seconds": 120,
        },
    ],
    # b3: no CORS configuration at all
}

CORS_CONFIGS = {
    bucket: validate_cors_config(rules)
    for bucket, rules in _RAW_CONFIGS.items()
}

ORIGIN_LANES = [
    "https://app.example.org",
    "https://portal.test",
    "https://evil.test",
    "https://sub.example.org",
    "http://app.example.org",  # scheme mismatch — wildcard-suffix miss
]
METHOD_LANES = ["GET", "PUT", "HEAD", "POST", "DELETE", "get", "PATCH"]
HEADER_LANES = [[], ["content-type"], ["content-type", "x-custom"]]


def _rule_rows():
    rows = []
    for bucket, rules in CORS_CONFIGS.items():
        for idx, r in enumerate(rules):
            rows.append(
                (
                    bucket,
                    idx,
                    r["id"],
                    [wildcard_to_regex(o) for o in r["allowed_origins"]],
                    r["allowed_methods"],
                    [
                        wildcard_to_regex(h, case_insensitive=True)
                        for h in r["allowed_headers"]
                    ],
                    ",".join(r["allowed_headers"]),
                    ",".join(r["allowed_methods"]),
                    ",".join(r["expose_headers"]),
                    r["max_age_seconds"],
                    "*" in r["allowed_origins"],
                )
            )
    return rows


_RULE_SCHEMA = (
    "bucket string, rule_idx int, rule_id string, origins_re array<string>,"
    " methods array<string>, headers_re array<string>,"
    " allowed_headers_csv string, methods_csv string, expose_csv string,"
    " max_age_seconds int, wildcard_origin boolean"
)


def cors_rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_rule_rows(), _RULE_SCHEMA)


def load_preflights(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 3
    )
    k = F.col("o_orderkey")
    origin_lane = (k / 10).cast("long") % 5
    origin = F.element_at(
        F.array(*[F.lit(x) for x in ORIGIN_LANES]),
        (origin_lane + 1).cast("int"),
    )
    method = F.element_at(
        F.array(*[F.lit(x) for x in METHOD_LANES]),
        ((k % 7) + 1).cast("int"),
    )
    headers = (
        F.when(k % 3 == 0, F.array().cast("array<string>"))
        .when(k % 3 == 1, F.array(F.lit("content-type")))
        .otherwise(F.array(F.lit("content-type"), F.lit("x-custom")))
    )
    return o.select(
        k.alias("request_id"),
        F.concat(
            F.lit("b"), ((k / 10).cast("long") % 4).cast("string")
        ).alias("bucket"),
        origin.alias("origin"),
        method.alias("method"),
        headers.alias("req_headers"),
    )


def _duck_lanes(values, expr):
    clauses = "".join(
        f" WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return f"CASE {expr}{clauses} END"


_PREFLIGHTS_SQL = f"""
    preflights AS (
      SELECT o_orderkey AS request_id,
             'b' || ((o_orderkey // 10) % 4) AS bucket,
             {_duck_lanes(ORIGIN_LANES, "(o_orderkey // 10) % 5")} AS origin,
             {_duck_lanes(METHOD_LANES, "o_orderkey % 7")} AS method,
             CASE o_orderkey % 3
               WHEN 0 THEN []::VARCHAR[]
               WHEN 1 THEN ['content-type']
               ELSE ['content-type', 'x-custom'] END AS req_headers
      FROM orders WHERE o_orderkey % 10 = 3
    )
"""


def _sql_str_list(items) -> str:
    inner = ", ".join("'" + i.replace("'", "''") + "'" for i in items)
    return f"[{inner}]::VARCHAR[]"


def _duck_rules_sql() -> str:
    rows = ", ".join(
        "({b}, {i}, {rid}, {o}, {m}, {h}, {ah}, {mc}, {ec}, {ma}, {w})".format(
            b=f"'{bucket}'",
            i=idx,
            rid=f"'{rid}'",
            o=_sql_str_list(origins),
            m=_sql_str_list(methods),
            h=_sql_str_list(headers),
            ah=f"'{ah}'",
            mc=f"'{mc}'",
            ec=f"'{ec}'",
            ma="NULL" if ma is None else str(ma),
            w=str(w).upper(),
        )
        for bucket, idx, rid, origins, methods, headers, ah, mc, ec, ma, w
        in _rule_rows()
    )
    return (
        "rules(bucket, rule_idx, rule_id, origins_re, methods, headers_re,"
        " allowed_headers_csv, methods_csv, expose_csv, max_age_seconds,"
        f" wildcard_origin) AS (VALUES {rows})"
    )


@register(
    "s3_cors_preflight_match",
    oracle=f"""
    WITH {_PREFLIGHTS_SQL}, {_duck_rules_sql()},
    matches AS (
      SELECT p.request_id, p.bucket, p.origin, p.method,
             p.req_headers, r.rule_idx, r.rule_id, r.methods_csv,
             r.allowed_headers_csv, r.expose_csv, r.max_age_seconds,
             r.wildcard_origin,
             row_number() OVER (PARTITION BY p.request_id
                                ORDER BY r.rule_idx) AS rn
      FROM preflights p
      JOIN rules r ON r.bucket = p.bucket
      WHERE len(list_filter(r.origins_re,
                            x -> regexp_matches(p.origin, x))) > 0
        AND list_contains(r.methods, upper(p.method))
        AND len(list_filter(p.req_headers,
              h -> len(list_filter(r.headers_re,
                       x -> regexp_matches(h, x))) = 0)) = 0
    )
    SELECT p.request_id, p.bucket, p.origin, p.method,
           m.rule_id IS NOT NULL AS matched,
           m.rule_id,
           CASE WHEN m.wildcard_origin THEN '*' ELSE
             CASE WHEN m.rule_id IS NOT NULL THEN p.origin END
           END AS allow_origin,
           m.methods_csv AS allow_methods,
           CASE WHEN m.rule_id IS NULL THEN NULL
                WHEN len(p.req_headers) > 0
                  THEN array_to_string(p.req_headers, ',')
                ELSE m.allowed_headers_csv END AS allow_headers,
           m.expose_csv AS expose_headers,
           m.max_age_seconds
    FROM preflights p
    LEFT JOIN (SELECT * FROM matches WHERE rn = 1) m
           ON m.request_id = p.request_id
    """,
)
def s3_cors_preflight_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preflight → first matching rule → response envelope; unmatched
    preflights keep a row with ``matched = false`` (the forbidden
    envelope, s3_server.rs:330-345)."""
    p = load_preflights(spark, sf_dir)
    r = cors_rules_df(spark)
    origin_ok = F.exists(
        "origins_re", lambda x: F.regexp_like(F.col("origin"), x)
    )
    method_ok = F.array_contains(
        F.col("methods"), F.upper(F.col("method"))
    )
    headers_ok = F.forall(
        "req_headers",
        lambda h: F.exists("headers_re", lambda x: F.regexp_like(h, x)),
    )
    cand = p.join(F.broadcast(r), "bucket").filter(
        origin_ok & method_ok & headers_ok
    )
    w = Window.partitionBy("request_id").orderBy("rule_idx")
    first = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "request_id",
            "rule_id",
            "methods_csv",
            "allowed_headers_csv",
            "expose_csv",
            "max_age_seconds",
            "wildcard_origin",
        )
    )
    out = p.join(first, "request_id", "left")
    matched = F.col("rule_id").isNotNull()
    return out.select(
        "request_id",
        "bucket",
        "origin",
        "method",
        matched.alias("matched"),
        "rule_id",
        F.when(matched & F.col("wildcard_origin"), F.lit("*"))
        .when(matched, F.col("origin"))
        .alias("allow_origin"),
        F.col("methods_csv").alias("allow_methods"),
        F.when(
            matched & (F.size("req_headers") > 0),
            F.array_join("req_headers", ","),
        )
        .when(matched, F.col("allowed_headers_csv"))
        .alias("allow_headers"),
        F.col("expose_csv").alias("expose_headers"),
        "max_age_seconds",
    )
