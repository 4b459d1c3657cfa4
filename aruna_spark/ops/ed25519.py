"""Pure-Python Ed25519 (RFC 8032) — stdlib only.

The reference signs search cursors with the node's iroh ed25519 key and
uses the public key as the node id (``search_cursor.rs`` signs/verifies
via the iroh ``SecretKey``/``PublicKey``). This container has no
third-party crypto library, so the primitive is implemented here from
the RFC 8032 specification: SHA-512, Edwards-curve point arithmetic in
extended homogeneous coordinates, and the standard sign/verify flow.
Test vectors from RFC 8032 §7.1 pin correctness
(``tests/test_search_cursor.py``).

This is a coordinator-side primitive for bounded API envelopes (cursor
payloads are <4 KiB, pages <=100 hits); signing throughput is not on any
data-plane path. Not constant-time — fine for signing/verifying public
cursor payloads, do NOT reuse for high-volume or timing-sensitive work.
"""

from __future__ import annotations

import hashlib

__all__ = ["public_key", "sign", "verify"]

_P = 2**255 - 19
_L = 2**252 + 27742317777372353535851937790883648493
_D = (-121665 * pow(121666, _P - 2, _P)) % _P
_I = pow(2, (_P - 1) // 4, _P)  # sqrt(-1)


def _sha512(data: bytes) -> bytes:
    return hashlib.sha512(data).digest()


def _inv(x: int) -> int:
    return pow(x, _P - 2, _P)


def _recover_x(y: int, sign_bit: int) -> int:
    """x from y via x^2 = (y^2 - 1) / (d y^2 + 1) (RFC 8032 §5.1.3)."""
    if y >= _P:
        raise ValueError("invalid point encoding")
    x2 = (y * y - 1) * _inv(_D * y * y + 1) % _P
    if x2 == 0:
        if sign_bit:
            raise ValueError("invalid point encoding")
        return 0
    x = pow(x2, (_P + 3) // 8, _P)
    if (x * x - x2) % _P != 0:
        x = x * _I % _P
    if (x * x - x2) % _P != 0:
        raise ValueError("invalid point encoding")
    if (x & 1) != sign_bit:
        x = _P - x
    return x


# Extended homogeneous coordinates (X, Y, Z, T) with x = X/Z, y = Y/Z,
# x*y = T/Z (RFC 8032 §5.1.4).
_By = 4 * _inv(5) % _P
_Bx = _recover_x(_By, 0)
_BASE = (_Bx, _By, 1, _Bx * _By % _P)
_NEUTRAL = (0, 1, 1, 0)


def _add(p, q):
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    a = (Y1 - X1) * (Y2 - X2) % _P
    b = (Y1 + X1) * (Y2 + X2) % _P
    c = 2 * T1 * T2 * _D % _P
    dd = 2 * Z1 * Z2 % _P
    e, f, g, h = b - a, dd - c, dd + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _mul(s: int, p):
    q = _NEUTRAL
    while s > 0:
        if s & 1:
            q = _add(q, p)
        p = _add(p, p)
        s >>= 1
    return q


def _compress(p) -> bytes:
    X, Y, Z, _ = p
    zi = _inv(Z)
    x, y = X * zi % _P, Y * zi % _P
    return (y | ((x & 1) << 255)).to_bytes(32, "little")


def _decompress(data: bytes):
    if len(data) != 32:
        raise ValueError("invalid point encoding")
    enc = int.from_bytes(data, "little")
    y = enc & ((1 << 255) - 1)
    x = _recover_x(y, enc >> 255)
    return (x, y, 1, x * y % _P)


def _equal(p, q) -> bool:
    X1, Y1, Z1, _ = p
    X2, Y2, Z2, _ = q
    return (X1 * Z2 - X2 * Z1) % _P == 0 and (Y1 * Z2 - Y2 * Z1) % _P == 0


def _clamp(h: bytes) -> int:
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    return a


def public_key(seed: bytes) -> bytes:
    """32-byte public key from a 32-byte seed (RFC 8032 §5.1.5)."""
    if len(seed) != 32:
        raise ValueError("ed25519 seed must be 32 bytes")
    a = _clamp(_sha512(seed))
    return _compress(_mul(a, _BASE))


def sign(seed: bytes, message: bytes) -> bytes:
    """64-byte signature R||S (RFC 8032 §5.1.6)."""
    if len(seed) != 32:
        raise ValueError("ed25519 seed must be 32 bytes")
    h = _sha512(seed)
    a = _clamp(h)
    prefix = h[32:]
    pub = _compress(_mul(a, _BASE))
    r = int.from_bytes(_sha512(prefix + message), "little") % _L
    R = _compress(_mul(r, _BASE))
    k = int.from_bytes(_sha512(R + pub + message), "little") % _L
    s = (r + k * a) % _L
    return R + s.to_bytes(32, "little")


def verify(pub: bytes, message: bytes, signature: bytes) -> bool:
    """Check S*B == R + k*A (RFC 8032 §5.1.7). Returns False on any
    malformed input instead of raising — callers treat a bad signature
    and a bad encoding identically (an invalid cursor)."""
    if len(pub) != 32 or len(signature) != 64:
        return False
    try:
        A = _decompress(pub)
        R = _decompress(signature[:32])
    except ValueError:
        return False
    s = int.from_bytes(signature[32:], "little")
    if s >= _L:
        return False
    k = int.from_bytes(_sha512(signature[:32] + pub + message), "little") % _L
    return _equal(_mul(s, _BASE), _add(R, _mul(k, A)))
