"""Connector validation ladder (connectors/validation.rs + endpoint.rs),
pinned on the reference's own test vectors."""

from __future__ import annotations

from aruna_spark.ops.connector_validation import (
    breaks_authority,
    is_canonical,
    validate_connector_input,
)

HTTP_OK = {"endpoint": "https://example.org"}
S3_OK_PUBLIC = {"bucket": "data", "endpoint": "https://s3.example.com"}
S3_KEYS = {"access_key_id": "k", "secret_access_key": "s"}


def test_rejects_respelled_hosts():
    # endpoint.rs:30-41 — all parse to link-local/loopback addresses
    for host in [
        "2852039166",
        "0xa9fea9fe",
        "169.254.169.254.",
        "127.1",
        "2851995650",
        "0251.0376.0251.0376",
    ]:
        assert not is_canonical(f"https://{host}"), host


def test_accepts_plain_endpoints():
    for endpoint in [
        "https://s3.example.com",
        "https://s3.example.com/",
        "https://minio.example.com:9000",
        "https://s3.example.com/prefix",
        "http://169.254.169.254",
    ]:
        assert is_canonical(endpoint), endpoint


def test_rejects_rewritten_endpoints():
    for endpoint in [
        "https://S3.Example.COM",
        "https://münchen.example",
        "https://s3.example.com:443",
        "https://good.example\\@169.254.169.254",
        "s3.example.com",
        "https://",
    ]:
        assert not is_canonical(endpoint), endpoint


def test_spots_authority_breaks():
    for bucket in ["2852039166/", "a?x", "a#x", "a\\x", "a@x"]:
        assert breaks_authority(bucket), bucket
    assert not breaks_authority("my.data-bucket")


def test_validation_ladder_order_and_codes():
    v = validate_connector_input
    assert v("  ", "http", HTTP_OK, {}) == ("empty_name", None)
    assert v("c", "ftp", {"endpoint": "https://x.example"}, {}) == (
        "unsupported_connector_kind",
        "ftp",
    )
    assert v("c", "aruna_native", HTTP_OK, {}) == (
        "unsupported_connector_kind",
        "aruna_native",
    )
    assert v("c", "http", {"endpoint": " "}, {}) == (
        "empty_public_value",
        "endpoint",
    )
    assert v("c", "http", HTTP_OK, {"token": ""}) == (
        "empty_secret_value",
        "token",
    )
    # validation.rs test: bucket is not an http key
    assert v("c", "http", {**HTTP_OK, "bucket": "nope"}, {}) == (
        "unknown_public_key",
        "bucket",
    )
    assert v("c", "http", HTTP_OK, {"access_key_id": "x"}) == (
        "unknown_secret_key",
        "access_key_id",
    )
    assert v("c", "s3", {"endpoint": "https://s3.example.com"}, S3_KEYS) == (
        "missing_required_public_key",
        "bucket",
    )
    assert v(
        "c", "s3", {**S3_OK_PUBLIC, "endpoint": "https://127.1"}, S3_KEYS
    ) == ("ambiguous_endpoint", "https://127.1")
    assert v("c", "s3", {**S3_OK_PUBLIC, "bucket": "a@x"}, S3_KEYS) == (
        "unsafe_bucket",
        "a@x",
    )
    assert v(
        "c", "s3", {**S3_OK_PUBLIC, "skip_signature": "yes"}, S3_KEYS
    ) == ("invalid_bool_value", "skip_signature")
    assert v(
        "c", "s3", {**S3_OK_PUBLIC, "skip_signature": "true"}, S3_KEYS
    ) == ("credentials_with_skip_signature", None)
    # signed s3 without static keys walks ambient credentials: refused
    assert v("c", "s3", S3_OK_PUBLIC, {}) == ("missing_credentials", None)
    assert v("c", "s3", S3_OK_PUBLIC, {"access_key_id": "k"}) == (
        "missing_credentials",
        None,
    )
    # happy paths
    assert v("c", "http", HTTP_OK, {}) is None
    assert v("c", "s3", S3_OK_PUBLIC, S3_KEYS) is None
    assert (
        v("c", "s3", {**S3_OK_PUBLIC, "skip_signature": "true"}, {}) is None
    )
    assert v("c", "webdav", HTTP_OK, {"username": "u", "password": "p"}) \
        is None


def test_facade_route_envelopes(spark, sf_dir):
    from aruna_spark.api import Engine

    eng = Engine(spark, sf_dir)
    ok = eng.create_source_connector("mirror", "s3", S3_OK_PUBLIC, S3_KEYS)
    assert ok["status"] == 201
    assert ok["has_secret_config"] is True
    assert "access_key_id" not in str(ok["public_config"])
    bad = eng.create_source_connector("mirror", "s3", S3_OK_PUBLIC, {})
    assert bad == {"status": 400, "error": "missing_credentials", "key": None}
