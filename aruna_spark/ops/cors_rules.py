"""Bucket CORS rule validation and pattern compilation.

Reference: ``api/src/s3/cors.rs``:

- ``dto_to_bucket_cors`` (rs:21-38) — a config must contain ≥1 rule;
- ``dto_rule_to_bucket_rule`` (rs:107-142) — each rule needs non-empty
  allowed_methods and allowed_origins; max_age_seconds must not be
  negative; methods normalize to UPPERCASE and must be one of
  GET/PUT/HEAD/POST/DELETE (rs:10,158-164); origins and headers trim
  to non-empty;
- ``wildcard_match`` (rs:242-255) — a pattern holds at most ONE ``*``:
  ``*`` alone matches everything, ``prefix*suffix`` needs the value to
  start/end accordingly WITHOUT overlap (value length ≥ prefix+suffix);
  otherwise exact equality. Origins match case-SENSITIVELY
  (rs:235-240), headers case-insensitively after the requested list is
  lowercased (``parse_requested_headers``, rs:98-105).

The validator runs at config-write time (route-side, like the
reference's dto parse before any storage effect); the compiled regexes
become plan literals for the preflight-match query.
"""

from __future__ import annotations

import re

VALID_CORS_METHODS = ("GET", "PUT", "HEAD", "POST", "DELETE")  # cors.rs:10


class CorsValidationError(ValueError):
    """MalformedXML-class rejection (cors.rs s3_error! sites)."""


def wildcard_to_regex(pattern: str, case_insensitive: bool = False) -> str:
    """Compile a single-``*`` CORS wildcard to an anchored regex.

    ``prefix*suffix`` → ``^prefix.*suffix$`` — the regex engine's
    non-overlapping consumption reproduces the reference's
    ``value.len() >= prefix.len() + suffix.len()`` guard exactly.
    Header patterns compile lowercased (requested headers arrive
    lowercased from parse_requested_headers)."""
    if case_insensitive:
        pattern = pattern.lower()
    if pattern == "*":
        return ".*"
    pre, star, suf = pattern.partition("*")
    if not star:
        return "^" + re.escape(pattern) + "$"
    return "^" + re.escape(pre) + ".*" + re.escape(suf) + "$"


def _non_empty(value: str, field: str) -> str:
    value = value.strip()
    if not value:
        raise CorsValidationError(f"{field} must not be empty")
    return value


def validate_cors_rule(rule: dict) -> dict:
    """One rule through dto_rule_to_bucket_rule (cors.rs:107-142);
    returns the normalized rule or raises."""
    methods = rule.get("allowed_methods") or []
    origins = rule.get("allowed_origins") or []
    if not methods or not origins:
        raise CorsValidationError(
            "Each CORS rule must contain allowed methods and origins"
        )
    max_age = rule.get("max_age_seconds")
    if max_age is not None and max_age < 0:
        raise CorsValidationError("CORS max age seconds must not be negative")
    norm_methods = []
    for m in methods:
        m = _non_empty(m, "CORS allowed method").upper()
        if m not in VALID_CORS_METHODS:
            raise CorsValidationError(f"Invalid CORS method `{m}`")
        norm_methods.append(m)
    return {
        "id": rule.get("id"),
        "allowed_origins": [
            _non_empty(o, "CORS allowed origin") for o in origins
        ],
        "allowed_methods": norm_methods,
        "allowed_headers": [
            _non_empty(h, "CORS allowed header")
            for h in (rule.get("allowed_headers") or [])
        ],
        "expose_headers": [
            _non_empty(h, "CORS expose header")
            for h in (rule.get("expose_headers") or [])
        ],
        "max_age_seconds": max_age,
    }


def validate_cors_config(rules: list[dict]) -> list[dict]:
    """dto_to_bucket_cors (cors.rs:21-38): ≥1 rule, each validated."""
    if not rules:
        raise CorsValidationError(
            "CORS configuration must contain at least one rule"
        )
    return [validate_cors_rule(r) for r in rules]


def parse_requested_headers(raw: str) -> list[str]:
    """cors.rs:98-105 — comma split, trim, drop empties, lowercase."""
    return [
        h.strip().lower() for h in raw.split(",") if h.strip()
    ]
