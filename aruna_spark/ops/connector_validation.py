"""Source-connector input validation.

Reference: ``operations/src/connectors/validation.rs`` +
``operations/src/endpoint.rs``. The rules ladder (validation.rs:
55-151, checked in this order):

1. empty name
2. unsupported kind (``ftp`` — opendal cannot constrain its passive
   data address — and ``aruna_native``)
3. empty public value / 4. empty secret value
5. unknown public key / 6. unknown secret key (per-kind allowlists,
   rules_for_kind, validation.rs:154-181)
7. missing required public key
8. ambiguous endpoint — the spelling must survive WHATWG URL
   normalization unchanged (endpoint.rs:14-19), so case-folded hosts,
   respelled IPv4 (decimal/hex/octal/short forms), punycode,
   explicit default ports, and backslash tricks are all refused:
   the client would connect somewhere other than what an operator
   reads back
9. unsafe bucket (authority-breaking characters, endpoint.rs:21-23)
10. ``skip_signature`` must be a bool; anonymous connectors must not
    carry credentials
11. signed S3 connectors require static keys — without them the
    signer would walk the node's own ambient credential chain
    against a tenant-chosen endpoint

Python note: where the reference iterates HashMaps (rules 3-6) the
first offender is nondeterministic; this port walks keys in sorted
order so the reported key is stable.
"""

from __future__ import annotations

import re

AUTHORITY_BREAKS = set("/\\?#@")  # endpoint.rs:9

S3_SKIP_SIGNATURE = "skip_signature"
ACCESS_KEY_ID = "access_key_id"
SECRET_ACCESS_KEY = "secret_access_key"

RULES = {  # validation.rs:154-181
    "http": {
        "required_public": ("endpoint",),
        "allowed_public": ("endpoint", "root"),
        "allowed_secret": ("username", "password", "token"),
    },
    "s3": {
        "required_public": ("bucket", "endpoint"),
        "allowed_public": (
            "bucket",
            "endpoint",
            "region",
            "root",
            S3_SKIP_SIGNATURE,
        ),
        "allowed_secret": (ACCESS_KEY_ID, SECRET_ACCESS_KEY),
    },
    "webdav": {
        "required_public": ("endpoint",),
        "allowed_public": ("endpoint", "root"),
        "allowed_secret": ("username", "password", "token"),
    },
    "ftp": {
        "required_public": ("endpoint",),
        "allowed_public": ("endpoint", "root"),
        "allowed_secret": ("user", "password"),
    },
    "aruna_native": {
        "required_public": ("endpoint",),
        "allowed_public": ("endpoint", "realm_id", "default_node_id"),
        "allowed_secret": ("bearer_token", "access_key", "secret_key"),
    },
}

_UNSUPPORTED = {"ftp", "aruna_native"}  # validation.rs:66-71
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_SCHEME_RE = re.compile(r"^([a-z][a-z0-9+.-]*)://")
_DOTTED_QUAD_RE = re.compile(
    r"^(0|[1-9][0-9]{0,2})\.(0|[1-9][0-9]{0,2})"
    r"\.(0|[1-9][0-9]{0,2})\.(0|[1-9][0-9]{0,2})$"
)
_NUMERIC_TAIL_RE = re.compile(r"^(0[xX][0-9a-fA-F]*|[0-9]+)$")


def breaks_authority(value: str) -> bool:
    """endpoint.rs:21-23."""
    return any(ch in AUTHORITY_BREAKS for ch in value)


def is_canonical(endpoint: str) -> bool:
    """True iff the spelling survives WHATWG normalization unchanged
    (endpoint.rs:14-19). A port of the url-crate roundtrip check:
    lowercase ASCII scheme+host as written, no backslash rewriting, no
    explicit default port, and numeric-looking hosts only as exact
    canonical dotted quads (never decimal/hex/octal/short respellings
    that the WHATWG IPv4 parser would rewrite)."""
    m = _SCHEME_RE.match(endpoint)
    if not m:
        return False
    scheme = m.group(1)
    rest = endpoint[m.end():]
    if "\\" in rest:
        # special-scheme URLs rewrite backslash to slash
        return False
    authority, _, _ = rest.partition("/")
    # userinfo is preserved verbatim by the roundtrip; split it off
    _, _, hostport = authority.rpartition("@")
    if hostport.startswith("["):  # IPv6 literal: accept as written
        host, _, port = hostport.rpartition("]")
        port = port[1:] if port.startswith(":") else ""
        host = host + "]"
    else:
        host, sep, port = hostport.partition(":")
        port = port if sep else ""
    if not host:
        return False
    if not host.isascii() or host != host.lower():
        # case folding / punycode change the spelling
        return False
    if port == "" and ":" in hostport and not hostport.startswith("["):
        return False  # "host:" normalizes to "host"
    if port and port == _DEFAULT_PORTS.get(scheme):
        return False  # default port is elided on roundtrip
    labels = host.split(".")
    if labels[-1] == "":
        return False  # trailing dot is stripped by normalization
    if _NUMERIC_TAIL_RE.match(labels[-1]):
        # WHATWG parses the whole host as IPv4: only the already-
        # canonical dotted quad survives unchanged
        if not _DOTTED_QUAD_RE.match(host):
            return False
        if any(int(p) > 255 for p in host.split(".")):
            return False
    return True


def validate_connector_input(
    name: str,
    kind: str,
    public_config: dict[str, str],
    secret_config: dict[str, str],
) -> tuple[str, str | None] | None:
    """Returns ``None`` when valid, else ``(error_code, offending_key)``
    mirroring validation.rs's ValidationError variants and check order."""
    if not name.strip():
        return ("empty_name", None)
    if kind not in RULES:
        return ("unsupported_connector_kind", kind)
    if kind in _UNSUPPORTED:
        return ("unsupported_connector_kind", kind)
    for key in sorted(public_config):
        if not public_config[key].strip():
            return ("empty_public_value", key)
    for key in sorted(secret_config):
        if not secret_config[key].strip():
            return ("empty_secret_value", key)
    rules = RULES[kind]
    allowed_public = set(rules["allowed_public"])
    allowed_secret = set(rules["allowed_secret"])
    for key in sorted(public_config):
        if key not in allowed_public:
            return ("unknown_public_key", key)
    for key in sorted(secret_config):
        if key not in allowed_secret:
            return ("unknown_secret_key", key)
    for key in rules["required_public"]:
        if key not in public_config:
            return ("missing_required_public_key", key)
    endpoint = public_config.get("endpoint")
    if endpoint is not None and not is_canonical(endpoint):
        return ("ambiguous_endpoint", endpoint)
    bucket = public_config.get("bucket")
    if bucket is not None and breaks_authority(bucket):
        return ("unsafe_bucket", bucket)
    anonymous = False
    skip = public_config.get(S3_SKIP_SIGNATURE)
    if skip is not None:
        if skip not in ("true", "false"):
            return ("invalid_bool_value", S3_SKIP_SIGNATURE)
        anonymous = skip == "true"
        if anonymous and secret_config:
            return ("credentials_with_skip_signature", None)
    if (
        kind == "s3"
        and not anonymous
        and not (
            ACCESS_KEY_ID in secret_config
            and SECRET_ACCESS_KEY in secret_config
        )
    ):
        return ("missing_credentials", None)
    return None
