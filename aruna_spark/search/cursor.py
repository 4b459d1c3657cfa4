"""Signed, fingerprint-bound search cursor + coordinator pagination.

Python analog of ``operations/src/metadata/search_cursor.rs``:

- **SearchCursor** (rs:36-145): an opaque, URL-safe continuation token
  carrying (version, signer, query fingerprint, watermark, per-node
  resume positions, signature). Decode rejects garbage, wrong version,
  over-cap resume lists, unknown signers, and any tampering.
- **query_fingerprint** (rs:168-211): binds a cursor to the query that
  produced it — query text, sorted+deduped graph scope, query mode,
  conformsTo filter, group scope. Recomputed per continuation request; a
  mismatch rejects the cursor. The query text itself is never stored.
- **paginate / merge / resume** (rs:243-406): coordinator-side merge of
  per-node hit lists into one page plus an optional continuation,
  including the invariants the reference's tests pin: tie-bucket
  non-skipping, saturated-node continuation, saturated-duplicate
  progress, churn suppression, depth-cap truncation.

Signature primitive: cursors are ed25519-signed (RFC 8032, pure-Python
stdlib implementation in :mod:`aruna_spark.ops.ed25519`) and the node id
IS the 32-byte public key — matching the reference's iroh identity,
where signing uses the node's ed25519 key and verification needs only
the public key (rs:105-122). This closes the round-3 documented
deviation (the cursor was previously HMAC-SHA256 MAC'd under a node
secret); the ``hmac`` scheme is retained as an explicit fallback.

One remaining documented deviation, not changing the contract:

- Scores: the engine quantizes scores to integers end-to-end
   (``score_q``, see :mod:`aruna_spark.search.bm25`), so the watermark
   stores the integer bucket directly; the reference stores the raw f32
   and quantizes inside every comparison (``score_key``, rs:283-285).
   Comparison results are identical by construction.

Scale note: everything here is the bounded API envelope — pages are
≤100 hits, resume lists ≤64 nodes — so this is deliberately driver-side
pure Python, like the reference's coordinator. The unbounded work
(scoring, per-node top-k) stays in Spark plans.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
from dataclasses import dataclass, replace
from typing import Iterable, Mapping, Sequence

DEFAULT_PAGE_SIZE = 25  # rs:13
MAX_PAGE_SIZE = 100  # rs:14
MAX_PAGINATION_DEPTH = 1000  # rs:15

CURSOR_VERSION = 2  # rs:17
SIGNATURE_CONTEXT = b"aruna.metadata.search.cursor.v2"  # rs:18
MAX_RESUME_NODES = 64  # rs:21


class SearchCursorError(ValueError):
    """Invalid cursor (garbage, tampered, untrusted signer, bad shape)."""


class CursorQueryMismatch(SearchCursorError):
    """Cursor does not match the continuation request's query."""


class NodeKey:
    """A node's signing identity. Default scheme ``ed25519``: the
    32-byte node id IS the RFC 8032 public key, exactly like the
    reference's iroh node identity, and verification uses only the
    public key. ``hmac`` is the retained fallback scheme (node id =
    hash commitment to the secret, tag = HMAC-SHA256). ``authorized``
    sets are lists of NodeKey whose ids gate cursor acceptance
    (rs:112-117)."""

    def __init__(self, secret: bytes, scheme: str = "ed25519"):
        if not secret:
            raise ValueError("empty node secret")
        if scheme not in ("ed25519", "hmac"):
            raise ValueError(f"unknown signature scheme {scheme!r}")
        self.secret = bytes(secret)
        self.scheme = scheme
        if scheme == "ed25519":
            from aruna_spark.ops import ed25519

            # uniform 32-byte seed from an arbitrary-length secret
            self._seed = hashlib.sha256(
                b"aruna.node.seed\x00" + self.secret
            ).digest()
            self.node_id: bytes = ed25519.public_key(self._seed)
        else:
            self.node_id = hashlib.sha256(
                b"aruna.node.id\x00" + self.secret
            ).digest()

    @classmethod
    def from_seed(cls, seed: int, scheme: str = "ed25519") -> "NodeKey":
        return cls(bytes([seed % 256]) * 32, scheme=scheme)

    def sign(self, payload: bytes) -> bytes:
        if self.scheme == "ed25519":
            from aruna_spark.ops import ed25519

            return ed25519.sign(self._seed, payload)
        return hmac.new(self.secret, payload, hashlib.sha256).digest()

    def verify(self, payload: bytes, signature: bytes) -> bool:
        """Ed25519 verification uses ONLY the public node id (the
        reference's model — any holder of the id can verify); the hmac
        fallback recomputes the tag from the secret."""
        if self.scheme == "ed25519":
            from aruna_spark.ops import ed25519

            return ed25519.verify(self.node_id, payload, signature)
        return hmac.compare_digest(self.sign(payload), signature)


@dataclass(frozen=True)
class SearchWatermark:
    """Sort key of the last emitted hit — the exact resume point in the
    merged, deduplicated ordering (rs:24-30)."""

    score_q: int
    graph_iri: str
    subject_iri: str


@dataclass
class SearchHit:
    """One search hit (core/src/metadata.rs:667-676)."""

    document_id: str
    graph_iri: str
    subject_iri: str
    score_q: int
    title: str = ""
    snippet: str | None = None


@dataclass(frozen=True)
class SearchCursor:
    version: int
    signer: bytes  # 32 bytes
    fingerprint: bytes  # 32 bytes
    watermark: SearchWatermark
    resume: tuple[tuple[bytes, int], ...]  # (node_id, position)
    signature: bytes

    # -- construction --------------------------------------------------------
    @staticmethod
    def new_signed(
        fingerprint: bytes,
        watermark: SearchWatermark,
        resume: Sequence[tuple[bytes, int]],
        signer: NodeKey,
    ) -> "SearchCursor":
        """Issue a cursor; above-cap fan-out keeps the deepest-progress
        nodes so the served cursor never 400s on replay (rs:75-81)."""
        entries = [(bytes(n), int(p)) for n, p in resume]
        if len(entries) > MAX_RESUME_NODES:
            entries.sort(key=lambda e: -e[1])
            entries = entries[:MAX_RESUME_NODES]
        payload = _signing_bytes(
            CURSOR_VERSION, signer.node_id, fingerprint, watermark, entries
        )
        return SearchCursor(
            version=CURSOR_VERSION,
            signer=signer.node_id,
            fingerprint=bytes(fingerprint),
            watermark=watermark,
            resume=tuple(entries),
            signature=signer.sign(payload),
        )

    # -- wire format ---------------------------------------------------------
    def encode(self) -> str:
        doc = {
            "v": self.version,
            "s": self.signer.hex(),
            "f": self.fingerprint.hex(),
            "w": [
                self.watermark.score_q,
                self.watermark.graph_iri,
                self.watermark.subject_iri,
            ],
            "r": [[n.hex(), p] for n, p in self.resume],
            "g": self.signature.hex(),
        }
        raw = json.dumps(doc, sort_keys=True, separators=(",", ":")).encode()
        return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()

    @staticmethod
    def decode(raw: str, authorized: Sequence[NodeKey]) -> "SearchCursor":
        """Reject garbage, wrong version, over-cap resume, unknown
        signer, and tampering (rs:105-122). Forged cursors past the
        resume cap are rejected even if correctly signed (rs:109-111
        checks the cap BEFORE signature verification)."""
        try:
            pad = "=" * (-len(raw) % 4)
            doc = json.loads(base64.urlsafe_b64decode(raw + pad))
            version = int(doc["v"])
            signer = bytes.fromhex(doc["s"])
            fingerprint = bytes.fromhex(doc["f"])
            w = doc["w"]
            watermark = SearchWatermark(int(w[0]), str(w[1]), str(w[2]))
            resume = tuple(
                (bytes.fromhex(n), int(p)) for n, p in doc["r"]
            )
            signature = bytes.fromhex(doc["g"])
        except (Exception,):  # noqa: BLE001 - any malformed input
            raise SearchCursorError("invalid search cursor") from None
        if version != CURSOR_VERSION or len(resume) > MAX_RESUME_NODES:
            raise SearchCursorError("invalid search cursor")
        if len(signer) != 32 or len(fingerprint) != 32:
            raise SearchCursorError("invalid search cursor")
        key = next((k for k in authorized if k.node_id == signer), None)
        if key is None:
            raise SearchCursorError("invalid search cursor")
        payload = _signing_bytes(
            version, signer, fingerprint, watermark, list(resume)
        )
        if not key.verify(payload, signature):
            raise SearchCursorError("invalid search cursor")
        return SearchCursor(
            version, signer, fingerprint, watermark, resume, signature
        )

    def require_fingerprint(self, fingerprint: bytes) -> None:
        """Continuation requests recompute the fingerprint from the
        request; a mismatch rejects the cursor (rs:56-58, route tests
        api/src/routes/metadata.rs:3943-4600)."""
        if not hmac.compare_digest(self.fingerprint, fingerprint):
            raise CursorQueryMismatch("search cursor does not match query")

    def resume_positions(self) -> dict[bytes, int]:
        return {n: p for n, p in self.resume}


def _signing_bytes(
    version: int,
    signer: bytes,
    fingerprint: bytes,
    watermark: SearchWatermark,
    resume: list[tuple[bytes, int]],
) -> bytes:
    payload = json.dumps(
        [
            version,
            signer.hex(),
            fingerprint.hex(),
            [watermark.score_q, watermark.graph_iri, watermark.subject_iri],
            [[n.hex(), p] for n, p in resume],
        ],
        sort_keys=True,
        separators=(",", ":"),
    ).encode()
    return SIGNATURE_CONTEXT + b"\x00" + payload


# -- query fingerprint (rs:168-211) ------------------------------------------
MODE_LOCAL = "local"
MODE_DISTRIBUTED = "distributed"


def query_fingerprint(
    query: str,
    graph_iris: Sequence[str] | None = None,
    mode: str | None = None,
    conforms_to: str | None = None,
    group_id: bytes | None = None,
) -> bytes:
    """32-byte digest binding (query, graph scope, mode, conformsTo,
    group). Graphs are sorted + deduped so scope order never changes the
    fingerprint; every optional field is domain-separated with presence
    tags exactly like the reference."""
    h = hashlib.sha256()
    h.update(query.encode())
    h.update(b"\x00")
    for g in sorted(set(graph_iris or ())):
        h.update(g.encode())
        h.update(b"\x00")
    h.update(bytes([_mode_byte(mode)]))
    if conforms_to is not None:
        h.update(b"\x01")
        h.update(conforms_to.encode())
        h.update(b"\x00")
    else:
        h.update(b"\x00")
    if group_id is not None:
        h.update(b"\x01")
        h.update(bytes(group_id))
    else:
        h.update(b"\x00")
    return h.digest()


def _mode_byte(mode: str | None) -> int:
    if mode is None:
        return 0
    if mode == MODE_LOCAL:
        return 1
    if mode == MODE_DISTRIBUTED:
        return 2
    raise ValueError(f"unknown query mode: {mode}")


# -- coordinator merge + pagination (rs:243-406) ------------------------------
@dataclass
class NodeSearchResult:
    """One answering node's raw hits; ``saturated`` = the node returned
    exactly its requested limit, so it may hold deeper results."""

    node_id: bytes
    hits: list[SearchHit]
    saturated: bool


@dataclass
class SearchPageCursor:
    watermark: SearchWatermark
    resume: list[tuple[bytes, int]]


@dataclass
class SearchPage:
    hits: list[SearchHit]
    next: SearchPageCursor | None
    truncated: bool


def _sort_key(hit: SearchHit) -> tuple:
    return (-hit.score_q, hit.graph_iri, hit.subject_iri)


def merge_search_hits(hits: Iterable[SearchHit]) -> list[SearchHit]:
    """Dedup on (graph_iri, subject_iri): keep max score (min
    document_id on quantized ties), preserve any snippet, order by
    (score desc, graph_iri, subject_iri) (rs:239-272)."""
    deduped: dict[tuple[str, str], SearchHit] = {}
    for hit in hits:
        key = (hit.graph_iri, hit.subject_iri)
        existing = deduped.get(key)
        if existing is None:
            deduped[key] = replace(hit)
            continue
        if (hit.score_q, existing.document_id) > (
            existing.score_q,
            hit.document_id,
        ):
            winner = replace(hit)
            if winner.snippet is None:
                winner.snippet = existing.snippet
            deduped[key] = winner
        elif existing.snippet is None:
            existing.snippet = hit.snippet
    return sorted(deduped.values(), key=_sort_key)


def hit_after_watermark(hit: SearchHit, mark: SearchWatermark) -> bool:
    """True iff the hit sorts strictly after the watermark in the merged
    order (rs:398-404)."""
    if hit.score_q != mark.score_q:
        return hit.score_q < mark.score_q
    if hit.graph_iri != mark.graph_iri:
        return hit.graph_iri > mark.graph_iri
    return hit.subject_iri > mark.subject_iri


def watermark_of(hit: SearchHit) -> SearchWatermark:
    return SearchWatermark(hit.score_q, hit.graph_iri, hit.subject_iri)


def paginate(
    node_results: list[NodeSearchResult],
    watermark: SearchWatermark | None,
    page_size: int,
    max_depth: int = MAX_PAGINATION_DEPTH,
) -> SearchPage:
    """Merge node results into one page + optional continuation
    (rs:281-384): dedup-then-filter against the watermark, count
    per-node resume positions (including a saturated node's
    below-watermark duplicates so a duplicate-only prefix advances
    instead of stalling), stop at the depth cap with ``truncated``."""
    merged = merge_search_hits(
        h for node in node_results for h in node.hits
    )
    if watermark is not None:
        remaining = [h for h in merged if hit_after_watermark(h, watermark)]
    else:
        remaining = merged
    page = remaining[:page_size]
    leftover = remaining[page_size:]
    saturated = any(node.saturated for node in node_results)

    next_watermark = watermark_of(page[-1]) if page else watermark
    has_more = bool(leftover) or saturated

    truncated = False
    nxt: SearchPageCursor | None = None
    if has_more and next_watermark is not None:
        mark = next_watermark
        pending = {(h.graph_iri, h.subject_iri) for h in leftover}
        resume = []
        for node in node_results:
            position = sum(
                1
                for h in node.hits
                if not hit_after_watermark(h, mark)
                or (
                    node.saturated
                    and (h.graph_iri, h.subject_iri) not in pending
                )
            )
            resume.append((node.node_id, position))
        deepest = max((p for _, p in resume), default=0)
        if deepest >= max_depth:
            truncated = True
        else:
            nxt = SearchPageCursor(watermark=mark, resume=resume)
    return SearchPage(hits=page, next=nxt, truncated=truncated)


def resume_fetch_limit(
    resume: Mapping[bytes, int],
    node_id: bytes,
    page_size: int,
    max_depth: int = MAX_PAGINATION_DEPTH,
) -> int:
    """Per-node fetch depth: resume position + one page; unknown nodes
    default to the deepest known resume so a newly seen node is not
    asked too shallow; clamped to the depth cap (rs:386-396)."""
    base = resume.get(node_id)
    if base is None:
        base = max(resume.values(), default=0)
    return min(base + page_size, max_depth)
