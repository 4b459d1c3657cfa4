"""Group backend validation (group_backends/validation.rs), pinned on
the reference's own test matrix."""

from __future__ import annotations

from aruna_spark.ops.backend_validation import (
    check_identity,
    confined_relative_path,
    validate_backend_input,
)

S3_PUBLIC = {"endpoint": "https://s3.example.com", "bucket": "data"}
S3_SECRET = {"access_key_id": "id", "secret_access_key": "key"}

KIND_PUBLIC = {
    "s3": S3_PUBLIC,
    "gcs": {"bucket": "data"},
    "azblob": {
        "endpoint": "https://acct.blob.core.windows.net",
        "container": "data",
        "account_name": "acct",
    },
    "azdls": {
        "endpoint": "https://acct.dfs.core.windows.net",
        "filesystem": "data",
        "account_name": "acct",
    },
    "b2": {"bucket": "data", "bucket_id": "abc"},
}
KIND_SECRET = {
    "s3": S3_SECRET,
    "gcs": {"credential": "base64json"},
    "azblob": {"account_key": "key"},
    "azdls": {"account_key": "key"},
    "b2": {"application_key_id": "id", "application_key": "key"},
}


def test_accepts_minimal_s3():
    out = validate_backend_input("tenant", "s3", S3_PUBLIC, S3_SECRET)
    assert out == {"public": S3_PUBLIC, "secret": S3_SECRET}


def test_rejects_alias_traps():
    # every one of these is an alias for an ambient-credential path
    traps = [
        ("s3", "token", "t"),
        ("s3", "aws_session_token", "t"),
        ("s3", "session_token", "t"),
        ("s3", "role_arn", "arn:aws:iam::1:role/x"),
        ("s3", "skip_signature", "true"),
        ("s3", "disable_config_load", "false"),
        ("gcs", "google_application_credentials", "/x"),
        ("gcs", "credential_path", "/x"),
        ("gcs", "service_account", "a@b.iam"),
        ("azdls", "authority_host", "https://evil"),
    ]
    for kind, key, value in traps:
        out = validate_backend_input(
            "tenant", kind, {**KIND_PUBLIC[kind], key: value}, KIND_SECRET[kind]
        )
        assert out == ("unknown_public_key", key), (kind, key)
        out = validate_backend_input(
            "tenant", kind, KIND_PUBLIC[kind], {**KIND_SECRET[kind], key: value}
        )
        assert out == ("unknown_secret_key", key), (kind, key)


def test_rejects_uppercase_alias():
    # the store lowercases keys, so the allowlist has to as well
    out = validate_backend_input(
        "tenant", "s3", {**S3_PUBLIC, "AWS_SESSION_TOKEN": "t"}, S3_SECRET
    )
    assert out == ("unknown_public_key", "aws_session_token")


def test_requires_static_credentials():
    for kind in KIND_PUBLIC:
        out = validate_backend_input("tenant", kind, KIND_PUBLIC[kind], {})
        assert isinstance(out, tuple) and out[0] in (
            "missing_secret",
            "missing_either_secret",
        ), kind


def test_accepts_either_secret():
    for kind in ("azblob", "azdls"):
        for key in ("account_key", "sas_token"):
            out = validate_backend_input(
                "tenant", kind, KIND_PUBLIC[kind], {key: "value"}
            )
            assert isinstance(out, dict), (kind, key)


def test_requires_account_name():
    # without it a tenant endpoint gets the node's ambient token
    for kind in ("azblob", "azdls"):
        public = dict(KIND_PUBLIC[kind])
        public.pop("account_name")
        public["endpoint"] = "https://collector.attacker.example"
        out = validate_backend_input(
            "tenant", kind, public, KIND_SECRET[kind]
        )
        assert out == ("missing_public_key", "account_name")


def test_rejects_bad_and_respelled_endpoints():
    out = validate_backend_input(
        "tenant",
        "s3",
        {**S3_PUBLIC, "endpoint": "http://s3.example.com"},
        S3_SECRET,
    )
    assert out == ("insecure_endpoint", "http://s3.example.com")
    for host in [
        "2852039166",
        "0xa9fea9fe",
        "169.254.169.254.",
        "127.1",
        "2851995650",
        "0251.0376.0251.0376",
    ]:
        ep = f"https://{host}"
        out = validate_backend_input(
            "tenant", "s3", {**S3_PUBLIC, "endpoint": ep}, S3_SECRET
        )
        assert out == ("ambiguous_endpoint", ep), host


def test_rejects_spliced_bucket_and_escaping_root():
    out = validate_backend_input(
        "tenant", "s3", {**S3_PUBLIC, "bucket": "2852039166/"}, S3_SECRET
    )
    assert out == ("unsafe_bucket", "2852039166/")
    out = validate_backend_input(
        "tenant", "s3", {**S3_PUBLIC, "root": "../elsewhere"}, S3_SECRET
    )
    assert out == ("unsafe_root", "../elsewhere")
    assert confined_relative_path("bucket/nested/object.bin")
    assert not confined_relative_path("a/../b")


def test_rejects_empty_name_and_bad_bool():
    assert validate_backend_input("  ", "s3", S3_PUBLIC, S3_SECRET) == (
        "empty_name",
        None,
    )
    out = validate_backend_input(
        "tenant", "s3", {**S3_PUBLIC, "force_path_style": "yes"}, S3_SECRET
    )
    assert out == ("invalid_bool", "force_path_style")


def test_duplicate_key_spellings_rejected():
    out = validate_backend_input(
        "tenant",
        "s3",
        {**S3_PUBLIC, "Bucket": "other"},
        S3_SECRET,
    )
    assert out == ("duplicate_key", "bucket")


def test_identity_is_fixed_after_create():
    assert check_identity("s3", S3_PUBLIC, "gcs", S3_PUBLIC) == (
        "immutable",
        "type",
    )
    moved = {**S3_PUBLIC, "bucket": "other"}
    assert check_identity("s3", S3_PUBLIC, "s3", moved) == (
        "immutable",
        "bucket",
    )
    # credentials/name-only updates keep the identity
    assert check_identity("s3", S3_PUBLIC, "s3", dict(S3_PUBLIC)) is None


def test_facade_backend_routes(spark, sf_dir):
    from aruna_spark.api import Engine

    eng = Engine(spark, sf_dir)
    created = eng.create_group_backend("tenant", "s3", S3_PUBLIC, S3_SECRET)
    assert created["status"] == 201
    # credentials-only update passes; moving the bucket is a 409
    existing = {"kind": "s3", "public_config": created["public_config"]}
    ok = eng.replace_group_backend(
        existing, "renamed", "s3", S3_PUBLIC,
        {"access_key_id": "id2", "secret_access_key": "key2"},
    )
    assert ok["status"] == 200
    moved = eng.replace_group_backend(
        existing, "tenant", "s3", {**S3_PUBLIC, "bucket": "other"}, S3_SECRET
    )
    assert moved == {"status": 409, "error": "immutable", "key": "bucket"}


def test_resolve_users_redacts_and_omits(spark, sf_dir):
    """resolve_users.rs: safe-allowlist redaction + silent omission of
    foreign-realm ids."""
    from aruna_spark.queries.principals import (
        load_user_directory,
        registry_resolve_users,
    )

    out = registry_resolve_users(spark, sf_dir)
    assert set(out.columns) == {
        "user_id", "name", "orcid", "affiliation", "department"
    }  # the stored email column never echoes
    rows = out.collect()
    assert rows
    realms = {
        r["user_id"]: r["realm_id"]
        for r in load_user_directory(spark, sf_dir).collect()
    }
    for r in rows:
        assert realms[r["user_id"]] == "realm-0"
