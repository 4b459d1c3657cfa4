"""Group storage-backend validation + identity pinning.

Reference: ``operations/src/group_backends/validation.rs``. Config
keys match a CLOSED allowlist of canonical spellings — a denylist is
unenforceable because opendal lowercases keys, accepts a wide serde
alias set, and silently drops unknowns (rs:7-9). Deliberately absent
keys hand the request to the node's ambient credential chain
(``role_arn``/``session_token``/``disable_*`` on S3,
``credential_path``/``service_account`` on GCS, ``authority_host``
on Azure DLS — rs:96-141).

``normalize`` (rs:218-241) lowercases keys before matching, rejects
two spellings of one key, empty values, and unknowns. The ladder
(rs:143-215): empty name → normalize public → normalize secret →
required public keys → required secrets → one-of secrets → endpoint
must be https AND canonically spelled → bucket must not break the
authority → root must be a confined relative path
(``ensure_confined_relative_path``, core blob.rs:25-50: no ``..``,
no absolute, no control characters) → ``force_path_style`` bool.

``check_identity`` (rs:64-93): an update may change credentials and
the name only — the keys that name the physical store (endpoint /
bucket / container / filesystem / account_name / bucket_id / root
per kind) are fixed after create, because stored locations record
only the path below ``root``; changing one would silently redirect
every object already stamped with the backend.
"""

from __future__ import annotations

from aruna_spark.ops.connector_validation import breaks_authority, is_canonical

RULES = {  # rules_for_kind, validation.rs:96-141
    "s3": {
        "required_public": ("endpoint", "bucket"),
        "allowed_public": (
            "endpoint",
            "bucket",
            "region",
            "root",
            "force_path_style",
        ),
        "allowed_secret": ("access_key_id", "secret_access_key"),
        "required_secret": ("access_key_id", "secret_access_key"),
        "one_of_secret": (),
    },
    "gcs": {
        "required_public": ("bucket",),
        "allowed_public": ("bucket", "root", "endpoint"),
        "allowed_secret": ("credential",),
        "required_secret": ("credential",),
        "one_of_secret": (),
    },
    "azblob": {
        "required_public": ("endpoint", "container", "account_name"),
        "allowed_public": ("endpoint", "container", "root", "account_name"),
        "allowed_secret": ("account_key", "sas_token"),
        "required_secret": (),
        "one_of_secret": ("account_key", "sas_token"),
    },
    "azdls": {
        "required_public": ("endpoint", "filesystem", "account_name"),
        "allowed_public": ("endpoint", "filesystem", "root", "account_name"),
        "allowed_secret": ("account_key", "sas_token"),
        "required_secret": (),
        "one_of_secret": ("account_key", "sas_token"),
    },
    "b2": {
        "required_public": ("bucket", "bucket_id"),
        "allowed_public": ("bucket", "bucket_id", "root"),
        "allowed_secret": ("application_key_id", "application_key"),
        "required_secret": ("application_key_id", "application_key"),
        "one_of_secret": (),
    },
}

IDENTITY_KEYS = {  # identity_keys, validation.rs:68-75
    "s3": ("endpoint", "bucket", "root"),
    "gcs": ("endpoint", "bucket", "root"),
    "azblob": ("endpoint", "container", "account_name", "root"),
    "azdls": ("endpoint", "filesystem", "account_name", "root"),
    "b2": ("bucket", "bucket_id", "root"),
}


def confined_relative_path(path: str) -> bool:
    """core blob.rs:25-50 over the already-'/'-trimmed root."""
    for part in path.split("/"):
        if part in ("", "."):
            continue
        if part == "..":
            return False
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in part):
            return False
    return True


def _normalize(
    config: dict[str, str], allowed: tuple[str, ...], unknown_code: str
) -> tuple[str, str] | dict[str, str]:
    allowed_set = set(allowed)
    normalized: dict[str, str] = {}
    for raw_key in sorted(config):
        key = raw_key.strip().lower()
        if key not in allowed_set:
            return (unknown_code, key)
        if not config[raw_key].strip():
            return ("empty_value", key)
        if key in normalized:
            return ("duplicate_key", key)
        normalized[key] = config[raw_key]
    return normalized


def validate_backend_input(
    name: str,
    kind: str,
    public_config: dict[str, str],
    secret_config: dict[str, str],
) -> tuple[str, str | None] | dict:
    """Error tuple ``(code, key)`` or the normalized, storable configs
    (keys lowercased so the record matches what the store reads)."""
    if not name.strip():
        return ("empty_name", None)
    if kind not in RULES:
        return ("unknown_kind", kind)
    rules = RULES[kind]
    public = _normalize(
        public_config, rules["allowed_public"], "unknown_public_key"
    )
    if isinstance(public, tuple):
        return public
    secret = _normalize(
        secret_config, rules["allowed_secret"], "unknown_secret_key"
    )
    if isinstance(secret, tuple):
        return secret
    for key in rules["required_public"]:
        if key not in public:
            return ("missing_public_key", key)
    for key in rules["required_secret"]:
        if key not in secret:
            return ("missing_secret", key)
    one_of = rules["one_of_secret"]
    if one_of and not any(key in secret for key in one_of):
        return ("missing_either_secret", "`, `".join(one_of))
    endpoint = public.get("endpoint")
    if endpoint is not None:
        if not endpoint.startswith("https://"):
            return ("insecure_endpoint", endpoint)
        if not is_canonical(endpoint):
            return ("ambiguous_endpoint", endpoint)
    bucket = public.get("bucket")
    if bucket is not None and breaks_authority(bucket):
        return ("unsafe_bucket", bucket)
    root = public.get("root")
    if root is not None and not confined_relative_path(root.lstrip("/")):
        return ("unsafe_root", root)
    fps = public.get("force_path_style")
    if fps is not None and fps not in ("true", "false"):
        return ("invalid_bool", "force_path_style")
    return {"public": public, "secret": secret}


def check_identity(
    existing_kind: str,
    existing_public: dict[str, str],
    kind: str,
    public: dict[str, str],
) -> tuple[str, str] | None:
    """validation.rs:79-93 — the store a backend points at is fixed."""
    if existing_kind != kind:
        return ("immutable", "type")
    for key in IDENTITY_KEYS[kind]:
        if existing_public.get(key) != public.get(key):
            return ("immutable", key)
    return None
