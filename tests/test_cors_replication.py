"""Bucket CORS validation ladder + preflight first-match semantics,
and the PutBucketReplication ARN validation ladder
(api/src/s3/cors.rs, api/src/s3/s3_service.rs:300-360,
core/src/structs/replication.rs:111-147)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.ops.cors_rules import (
    CorsValidationError,
    parse_requested_headers,
    validate_cors_config,
    validate_cors_rule,
    wildcard_to_regex,
)
from aruna_spark.queries.cors import (
    load_preflights,
    s3_cors_preflight_match,
)
from aruna_spark.queries.replication import (
    load_replication_rules,
    s3_replication_validate,
    validate_replication,
)


# ------------------------------------------------ CORS validation ladder
def _rule(**over):
    base = {
        "allowed_origins": ["https://a.test"],
        "allowed_methods": ["GET"],
    }
    base.update(over)
    return base


def test_cors_config_requires_rules():
    with pytest.raises(CorsValidationError, match="at least one rule"):
        validate_cors_config([])


def test_cors_rule_requires_methods_and_origins():
    with pytest.raises(CorsValidationError, match="methods and origins"):
        validate_cors_rule(_rule(allowed_methods=[]))
    with pytest.raises(CorsValidationError, match="methods and origins"):
        validate_cors_rule(_rule(allowed_origins=[]))


def test_cors_rule_rejects_negative_max_age():
    with pytest.raises(CorsValidationError, match="not be negative"):
        validate_cors_rule(_rule(max_age_seconds=-1))
    assert validate_cors_rule(_rule(max_age_seconds=0))["max_age_seconds"] == 0


def test_cors_rule_normalizes_and_rejects_methods():
    norm = validate_cors_rule(_rule(allowed_methods=["get", "Put"]))
    assert norm["allowed_methods"] == ["GET", "PUT"]
    with pytest.raises(CorsValidationError, match="Invalid CORS method"):
        validate_cors_rule(_rule(allowed_methods=["PATCH"]))
    with pytest.raises(CorsValidationError, match="must not be empty"):
        validate_cors_rule(_rule(allowed_methods=["  "]))


def test_cors_rule_rejects_blank_origin_and_header():
    with pytest.raises(CorsValidationError, match="origin must not"):
        validate_cors_rule(_rule(allowed_origins=[" "]))
    with pytest.raises(CorsValidationError, match="header must not"):
        validate_cors_rule(_rule(allowed_headers=[""]))


def test_wildcard_match_semantics():
    """wildcard_match (cors.rs:242-255): one '*', no overlap."""
    import re

    def m(pat, val, ci=False):
        return re.search(wildcard_to_regex(pat, ci), val.lower() if ci else val) is not None

    assert m("*", "anything")
    assert m("https://*.example.org", "https://a.example.org")
    assert not m("https://*.example.org", "http://a.example.org")
    # no-overlap guard: prefix+suffix longer than the value
    assert m("ab*ba", "abba") and not m("ab*ba", "aba")
    assert m("x-*", "X-Custom", ci=True)  # headers case-insensitive
    assert not m("x-*", "X-Custom")  # origins case-sensitive


def test_parse_requested_headers():
    assert parse_requested_headers(" Content-Type ,, X-Custom ") == [
        "content-type",
        "x-custom",
    ]


# ----------------------------------------------- preflight first-match
@pytest.fixture(scope="module")
def preflight(spark, sf_dir):
    rows = s3_cors_preflight_match(spark, sf_dir).collect()
    return rows


def test_preflight_lane_coverage(spark, sf_dir, preflight):
    """Coprimality guard at sf0.001: every origin/method/header lane
    and all four buckets appear in the request set."""
    reqs = load_preflights(spark, sf_dir)
    assert reqs.select("bucket").distinct().count() == 4
    assert reqs.select("origin").distinct().count() == 5
    assert reqs.select("method").distinct().count() == 7
    assert (
        reqs.select(F.size("req_headers").alias("n")).distinct().count()
        == 3
    )
    assert {r.matched for r in preflight} == {True, False}


def test_preflight_unconfigured_bucket_always_forbidden(preflight):
    b3 = [r for r in preflight if r.bucket == "b3"]
    assert b3 and all(not r.matched for r in b3)
    assert all(r.allow_origin is None for r in b3)


def test_preflight_first_match_wins(preflight):
    """b0 rule0 (wildcard origin, GET/HEAD, no headers) shadows rule1
    for header-less GETs from the app origin; requests WITH headers
    fall through to rule1 (headers_match fails on an empty allowed
    list — cors.rs:203-211)."""
    app_get = [
        r for r in preflight
        if r.bucket == "b0"
        and r.origin == "https://app.example.org"
        and r.method.upper() == "GET"
    ]
    assert app_get
    for r in app_get:
        assert r.matched
        if r.allow_headers is None or r.allow_headers == "":
            assert r.rule_id == "b0-any-read" and r.allow_origin == "*"
        else:
            assert r.rule_id == "b0-app-write"
            assert r.allow_origin == "https://app.example.org"


def test_preflight_method_case_insensitive(preflight):
    lower_get = [r for r in preflight if r.method == "get"]
    assert lower_get and any(r.matched for r in lower_get)


def test_preflight_wildcard_origin_subdomain(preflight):
    """b1 rule0: https://*.example.org matches the subdomain but not
    the http:// scheme lane."""
    sub = [
        r for r in preflight
        if r.bucket == "b1"
        and r.origin == "https://sub.example.org"
        and r.method == "GET"
        and (r.allow_headers or "") in ("", "content-type")
    ]
    assert sub and all(r.matched and r.rule_id == "b1-subdomains" for r in sub)
    wrong_scheme = [
        r for r in preflight
        if r.bucket == "b1" and r.origin == "http://app.example.org"
    ]
    assert wrong_scheme and all(not r.matched for r in wrong_scheme)


def test_preflight_headers_echoed_or_rule_list(preflight):
    matched_with_headers = [
        r for r in preflight
        if r.matched and r.allow_headers and "," in r.allow_headers
    ]
    for r in matched_with_headers:
        assert r.allow_headers == "content-type,x-custom"


# ------------------------------------------- replication validation
@pytest.fixture(scope="module")
def repl(spark, sf_dir):
    return s3_replication_validate(spark, sf_dir).collect()


def test_replication_every_lane_populated(repl):
    """All nine ARN lanes plus ws-source and disabled-skip appear at
    sf0.001 (coprimality guard)."""
    outcomes = {r.outcome for r in repl}
    assert outcomes >= {
        "accepted",
        "skipped_disabled",
        "ws_source",
        "bad_prefix",
        "missing_node",
        "not_s3",
        "foreign_realm",
        "prefix_path",
        "ws_target",
        "self_target",
    }


def test_replication_check_order_short_circuits(repl):
    """ws-source beats every later defect; disabled beats ARN parse."""
    for r in repl:
        if r.source_bucket.startswith("ws-"):
            assert r.outcome == "ws_source"
        elif r.outcome == "skipped_disabled":
            assert not r.source_bucket.startswith("ws-")


def test_replication_accepted_rows_carry_target(repl):
    acc = [r for r in repl if r.outcome == "accepted"]
    assert acc
    for r in acc:
        assert r.target_node in ("node1", "node2")
        assert r.target_bucket and not r.target_bucket.startswith("ws-")
        assert r.replicate_delete_markers is not None
        if r.target_node == "node1":
            assert r.target_bucket != r.source_bucket
    rej = [r for r in repl if r.outcome != "accepted"]
    assert all(
        r.target_node is None
        and r.target_bucket is None
        and r.replicate_delete_markers is None
        for r in rej
    )


def test_replication_parse_edge_cases(spark):
    """Drive the ladder with literal edge ARNs the fixture lanes do
    not reach (missing resource, empty path, bare type)."""
    rows = [
        (1, "bkt0", "Enabled", "arn:aruna:realmA:node1", False),
        (2, "bkt0", "Enabled", "arn:aruna:realmA:node1:s3/", False),
        (3, "bkt0", "Enabled", "arn:aruna:realmA:node1:s3", False),
        (4, "bkt0", "Enabled", "arn:aruna:realmA:node1:xx/yy", False),
    ]
    df = spark.createDataFrame(
        rows,
        "rule_id long, source_bucket string, status string,"
        " destination_arn string, delete_markers_enabled boolean",
    )
    out = {r.rule_id: r.outcome for r in validate_replication(df).collect()}
    assert out == {
        1: "missing_resource",
        2: "empty_path",
        3: "missing_path",
        4: "bad_type",
    }
