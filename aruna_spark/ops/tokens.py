"""Bearer-token validation: the issuer-trust and delegation ladder.

Reference: ``operations/src/auth.rs``:

- ``decode_aruna_bearer_token`` (rs:69-104): insecure-decode the
  claims first, check REVOCATION by token hash, pick the verification
  issuer — the delegated ``issuer_pubkey`` only when BOTH it and the
  ``delegation_signature`` are present, else the realm ``iss`` — then
  verify the EdDSA signature and validate the claims;
- ``validate_issuer_trust`` (rs:106-126): ``iss`` must decode to a
  TRUSTED realm id; the delegation fields are both-or-neither (a
  mixed pair is ``InvalidServerToken``); a present pair must verify:
  the realm key signs the delegated issuer's public key;
- claims validation (rs:127-141): expiry before trust;
- the ISSUER KEY CACHE (rs:166-230): bounded LRU (1,024) with a 1 h
  TTL — and ONLY trusted-or-delegated issuers may populate it;
  untrusted issuers verify with an ephemeral key that is discarded,
  so an attacker minting arbitrary issuer keys cannot evict the
  trusted ones (rs:90-92).

Pure driver-side logic over the repo's RFC 8032 ed25519
(:mod:`aruna_spark.ops.ed25519`). Tokens are compact JWT
(base64url(header).base64url(claims).base64url(signature), EdDSA).
"""

from __future__ import annotations

import base64
import hashlib
import json
import time
from collections import OrderedDict

from aruna_spark.ops.ed25519 import public_key, sign, verify

ISSUER_KEY_CACHE_CAPACITY = 1024  # auth.rs:167
ISSUER_KEY_CACHE_TTL_S = 3600.0  # auth.rs:169


def _b64e(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64d(text: str) -> bytes:
    pad = "=" * (-len(text) % 4)
    return base64.urlsafe_b64decode(text + pad)


def bearer_token_hash(token: str) -> str:
    return hashlib.sha256(token.encode()).hexdigest()


def encode_token(claims: dict, issuer_seed: bytes) -> str:
    header = _b64e(json.dumps({"alg": "EdDSA", "typ": "JWT"}).encode())
    payload = _b64e(json.dumps(claims, sort_keys=True).encode())
    signing_input = f"{header}.{payload}".encode()
    sig = sign(issuer_seed, signing_input)
    return f"{header}.{payload}.{_b64e(sig)}"


def insecure_decode(token: str) -> dict:
    parts = token.split(".")
    if len(parts) != 3:
        raise ValueError("malformed token")
    return json.loads(_b64d(parts[1]))


class IssuerKeyCache:
    """Bounded LRU + TTL of issuer verifying keys (auth.rs:171-230)."""

    def __init__(
        self,
        capacity: int = ISSUER_KEY_CACHE_CAPACITY,
        ttl_s: float = ISSUER_KEY_CACHE_TTL_S,
        clock=time.monotonic,
    ) -> None:
        self.capacity = max(1, int(capacity))
        self.ttl_s = float(ttl_s)
        self._clock = clock
        self._entries: OrderedDict[str, tuple[bytes, float]] = OrderedDict()

    def get_or_insert(self, issuer_pubkey_b64: str) -> bytes:
        entry = self._entries.get(issuer_pubkey_b64)
        if entry is not None:
            key, inserted = entry
            if self._clock() - inserted < self.ttl_s:
                self._entries.move_to_end(issuer_pubkey_b64)
                return key
            del self._entries[issuer_pubkey_b64]
        key = _b64d(issuer_pubkey_b64)
        if len(key) != 32:
            raise ValueError("invalid issuer key")
        self._entries[issuer_pubkey_b64] = (key, self._clock())
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)
        return key

    def __len__(self) -> int:
        return len(self._entries)


def _decoding_key(issuer_pubkey_b64: str) -> bytes:
    key = _b64d(issuer_pubkey_b64)
    if len(key) != 32:
        raise ValueError("invalid issuer key")
    return key


def _issuer_trust(claims: dict, trusted_realms: set[str]) -> str | None:
    """None when trusted (and any delegation verifies), else the
    error code — mirroring validate_issuer_trust's order."""
    iss = claims.get("iss", "")
    try:
        realm_key = _b64d(iss)
        if len(realm_key) != 32:
            return "invalid_issuer_key"
    except Exception:
        return "invalid_issuer_key"
    if iss not in trusted_realms:
        return "realm_not_trusted"
    delegation = claims.get("delegation_signature")
    issuer_pubkey = claims.get("issuer_pubkey")
    if delegation is not None and issuer_pubkey is not None:
        try:
            ok = verify(
                realm_key, issuer_pubkey.encode(), _b64d(delegation)
            )
        except Exception:
            return "invalid_server_token"
        return None if ok else "invalid_server_token"
    if delegation is None and issuer_pubkey is None:
        return None
    return "invalid_server_token"


def validate_bearer_token(
    token: str,
    trusted_realms: set[str],
    revoked_hashes: set[str],
    cache: IssuerKeyCache | None = None,
    now: float | None = None,
) -> tuple[str, dict | None]:
    """(status, claims) — status 'ok' or the auth.rs error code."""
    cache = cache if cache is not None else IssuerKeyCache()
    try:
        claims = insecure_decode(token)
    except Exception:
        return ("invalid_token", None)
    if bearer_token_hash(token) in revoked_hashes:
        return ("token_revoked", None)
    issuer_pubkey = claims.get("issuer_pubkey")
    delegated = claims.get("delegation_signature") is not None
    issuer = (
        issuer_pubkey
        if (issuer_pubkey is not None and delegated)
        else claims.get("iss", "")
    )
    trust_err = _issuer_trust(claims, trusted_realms)
    try:
        if trust_err is None:
            key = cache.get_or_insert(issuer)
        else:
            # untrusted: ephemeral key, NEVER populates the cache
            key = _decoding_key(issuer)
    except Exception:
        return ("invalid_issuer_key", None)
    header, payload, sig = token.split(".")
    try:
        ok = verify(key, f"{header}.{payload}".encode(), _b64d(sig))
    except Exception:
        ok = False
    if not ok:
        return ("invalid_signature", None)
    clock = time.time() if now is None else now
    if clock > claims.get("exp", 0):
        return ("expired", None)
    if trust_err is not None:
        return (trust_err, None)
    return ("ok", claims)


def _add_12_months(iat: float) -> float:
    """chrono ``checked_add_months(12)``: same calendar date next
    year, day clamped to the target month's length (Feb 29 -> 28)."""
    import calendar
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(iat, tz=timezone.utc)
    year = dt.year + 1
    day = min(dt.day, calendar.monthrange(year, dt.month)[1])
    return dt.replace(year=year, day=day).timestamp()


def create_token(
    time_s: float,
    expiry: float | None,
    user_id: str,
    realm_seed: bytes | None,
    capabilities: dict,
) -> tuple[str, str | None]:
    """CreateToken (operations/src/create_token.rs): Local nodes hold
    no token-minting capability (rs:47-56); an explicit expiry must
    exceed ``iat`` and the default is +12 calendar months (rs:58-75);
    Management nodes sign with the realm key, Server nodes with their
    delegated issuer key, embedding ``issuer_pubkey`` and the realm's
    ``delegation_signature`` (rs:77-126). Returns
    ``(status, token_or_None)``."""
    kind = capabilities.get("kind")
    if kind == "local":
        return ("not_enough_capabilities", None)
    iat = float(time_s)
    if expiry is not None:
        if expiry <= iat:
            return ("invalid_timestamp", None)
        exp = float(expiry)
    else:
        exp = _add_12_months(iat)
    # deterministic jti: hash of (user, iat) — the reference mints a
    # ULID; anything unique per issuance works and this stays testable
    jti = hashlib.sha256(f"{user_id}|{iat}".encode()).hexdigest()[:26]
    claims = {
        "sub": user_id,
        "iss": _b64e(public_key(realm_seed)),
        "iat": iat,
        "exp": exp,
        "jti": jti,
    }
    if kind == "management":
        return ("ok", encode_token(claims, realm_seed))
    if kind == "server":
        issuer_seed = capabilities["issuer_seed"]
        issuer_pub = _b64e(public_key(issuer_seed))
        claims["issuer_pubkey"] = issuer_pub
        claims["delegation_signature"] = _b64e(
            sign(realm_seed, issuer_pub.encode())
        )
        return ("ok", encode_token(claims, issuer_seed))
    return ("not_enough_capabilities", None)
