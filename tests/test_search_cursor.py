"""Signed search-cursor invariants ported from the reference's test
suite (``operations/src/metadata/search_cursor.rs:419-991``): roundtrip,
garbage/version/tamper/untrusted rejection, resume caps at issuance and
decode, fingerprint binding, merge rules, and the pagination invariants
(tie-bucket non-skip, saturated continuation, duplicate progress, churn
suppression, depth cap)."""

from __future__ import annotations

import pytest

from aruna_spark.search.cursor import (
    MAX_PAGINATION_DEPTH,
    MAX_RESUME_NODES,
    MODE_DISTRIBUTED,
    MODE_LOCAL,
    CursorQueryMismatch,
    NodeKey,
    NodeSearchResult,
    SearchCursor,
    SearchCursorError,
    SearchHit,
    SearchWatermark,
    merge_search_hits,
    paginate,
    query_fingerprint,
    resume_fetch_limit,
)


def node(seed: int) -> NodeKey:
    return NodeKey.from_seed(seed)


def hit(graph: str, subject: str, score_q: int) -> SearchHit:
    return SearchHit(
        document_id=graph,
        graph_iri=f"https://w3id.org/aruna/{graph}",
        subject_iri=subject,
        score_q=score_q,
        title=subject,
        snippet=None,
    )


WM = SearchWatermark(800_000, "https://w3id.org/aruna/01A", "./file.txt")


# -- cursor codec (rs:453-590) ------------------------------------------------
def test_cursor_roundtrips_with_node_keys_and_exact_scores():
    signer = node(9)
    cursor = SearchCursor.new_signed(
        b"\x07" * 32, WM, [(node(1).node_id, 3), (node(2).node_id, 0)], signer
    )
    decoded = SearchCursor.decode(cursor.encode(), [signer])
    assert decoded == cursor
    assert decoded.watermark.score_q == 800_000
    positions = decoded.resume_positions()
    assert positions[node(1).node_id] == 3
    assert positions[node(2).node_id] == 0


def test_cursor_decode_rejects_garbage_and_wrong_version():
    with pytest.raises(SearchCursorError):
        SearchCursor.decode("not*base64", [node(1)])
    with pytest.raises(SearchCursorError):
        SearchCursor.decode("QUJD", [node(1)])
    cursor = SearchCursor.new_signed(b"\x00" * 32, WM, [], node(1))
    forged = SearchCursor(
        version=1,
        signer=cursor.signer,
        fingerprint=cursor.fingerprint,
        watermark=cursor.watermark,
        resume=cursor.resume,
        signature=cursor.signature,
    )
    with pytest.raises(SearchCursorError):
        SearchCursor.decode(forged.encode(), [node(1)])


def test_cursor_decode_rejects_tampering_and_untrusted_signers():
    signer = node(1)
    cursor = SearchCursor.new_signed(
        b"\x00" * 32, WM, [(node(2).node_id, 1)], signer
    )
    # untrusted signer set
    with pytest.raises(SearchCursorError):
        SearchCursor.decode(cursor.encode(), [node(9)])
    # tampered resume position
    forged = SearchCursor(
        version=cursor.version,
        signer=cursor.signer,
        fingerprint=cursor.fingerprint,
        watermark=cursor.watermark,
        resume=((node(2).node_id, 99),),
        signature=cursor.signature,
    )
    with pytest.raises(SearchCursorError):
        SearchCursor.decode(forged.encode(), [signer])


def test_cursor_decode_caps_resume_entries():
    at_cap = SearchCursor.new_signed(
        b"\x00" * 32,
        WM,
        [(node(i).node_id, 0) for i in range(MAX_RESUME_NODES)],
        node(1),
    )
    assert SearchCursor.decode(at_cap.encode(), [node(1)])
    # forged past the cap (bypassing issuance) with a VALID signature is
    # still rejected — the cap check runs before signature verification
    signer = node(1)
    over = [(node(i).node_id, 0) for i in range(MAX_RESUME_NODES + 1)]
    from aruna_spark.search.cursor import _signing_bytes

    payload = _signing_bytes(2, signer.node_id, b"\x00" * 32, WM, over)
    forged = SearchCursor(
        version=2,
        signer=signer.node_id,
        fingerprint=b"\x00" * 32,
        watermark=WM,
        resume=tuple(over),
        signature=signer.sign(payload),
    )
    with pytest.raises(SearchCursorError):
        SearchCursor.decode(forged.encode(), [signer])


def test_issuance_caps_resume_keeping_deepest():
    over = SearchCursor.new_signed(
        b"\x00" * 32,
        WM,
        [(node(i).node_id, i) for i in range(MAX_RESUME_NODES + 1)],
        node(1),
    )
    assert len(over.resume) == MAX_RESUME_NODES
    # the shallowest entry (position 0) was dropped, deepest kept
    positions = sorted(p for _, p in over.resume)
    assert positions[0] == 1 and positions[-1] == MAX_RESUME_NODES
    assert SearchCursor.decode(over.encode(), [node(1)])


def test_fingerprint_binds_query_graphs_mode_conformsto_group():
    base = query_fingerprint("alpha", None, MODE_DISTRIBUTED, None, None)
    assert base == query_fingerprint("alpha", None, MODE_DISTRIBUTED, None, None)
    assert base != query_fingerprint("beta", None, MODE_DISTRIBUTED, None, None)
    assert base != query_fingerprint("alpha", ["g"], MODE_DISTRIBUTED, None, None)
    assert base != query_fingerprint("alpha", None, MODE_LOCAL, None, None)
    assert base != query_fingerprint(
        "alpha", None, MODE_DISTRIBUTED, "https://w3id.org/ro/crate/1.2", None
    )
    g7, g8 = b"\x07" * 16, b"\x08" * 16
    assert base != query_fingerprint("alpha", None, MODE_DISTRIBUTED, None, g7)
    assert query_fingerprint(
        "alpha", None, MODE_DISTRIBUTED, None, g7
    ) != query_fingerprint("alpha", None, MODE_DISTRIBUTED, None, g8)
    # graph scope is order/dup-insensitive
    assert query_fingerprint("alpha", ["b", "a", "a"]) == query_fingerprint(
        "alpha", ["a", "b"]
    )


def test_cursor_query_mismatch():
    cursor = SearchCursor.new_signed(
        query_fingerprint("alpha"), WM, [], node(1)
    )
    cursor.require_fingerprint(query_fingerprint("alpha"))
    with pytest.raises(CursorQueryMismatch):
        cursor.require_fingerprint(query_fingerprint("beta"))


# -- merge rules (rs:673-738) -------------------------------------------------
def test_merge_keeps_max_score_and_enriched_snippet():
    bare = hit("01A", "./file.txt", 500_000)
    enriched = hit("01A", "./file.txt", 800_000)
    enriched.snippet = "matched text"
    merged = merge_search_hits([bare, enriched])
    assert len(merged) == 1
    assert merged[0].score_q == 800_000
    assert merged[0].snippet == "matched text"
    # enrichment survives when the LOWER-scored copy carries the snippet
    top = hit("01B", "./file.txt", 900_000)
    low = hit("01B", "./file.txt", 200_000)
    low.snippet = "kept"
    merged = merge_search_hits([top, low])
    assert merged[0].score_q == 900_000
    assert merged[0].snippet == "kept"


def test_merge_orders_by_score_then_keys():
    merged = merge_search_hits(
        [
            hit("01B", "./file-b.txt", 700_000),
            hit("01A", "./file-b.txt", 700_000),
            hit("01A", "./file-a.txt", 700_000),
            hit("01C", "./file-c.txt", 900_000),
        ]
    )
    keys = [(h.graph_iri, h.subject_iri) for h in merged]
    assert keys == [
        ("https://w3id.org/aruna/01C", "./file-c.txt"),
        ("https://w3id.org/aruna/01A", "./file-a.txt"),
        ("https://w3id.org/aruna/01A", "./file-b.txt"),
        ("https://w3id.org/aruna/01B", "./file-b.txt"),
    ]


def test_merge_retains_deterministic_copy_on_ties():
    low_id = hit("01A", "./file.txt", 100_000)
    low_id.document_id, low_id.title = "01AAA", "low-id"
    high_id = hit("01A", "./file.txt", 100_000)
    high_id.document_id, high_id.title = "01BBB", "high-id"
    one = merge_search_hits([low_id, high_id])
    two = merge_search_hits([high_id, low_id])
    assert len(one) == 1
    assert one[0].document_id == "01AAA"
    assert two[0].document_id == "01AAA"
    assert one[0].title == two[0].title == "low-id"


# -- pagination (rs:740-965) --------------------------------------------------
def test_paginate_does_not_skip_hits_within_a_score_bucket():
    # two hits in the SAME quantized bucket; IRI tie-break orders a first
    a = hit("01A", "./a", 100_000)
    b = hit("01B", "./b", 100_000)
    page1 = paginate(
        [NodeSearchResult(node(1).node_id, [a], saturated=True)], None, 1
    )
    assert [h.subject_iri for h in page1.hits] == ["./a"]
    nxt = page1.next
    assert nxt is not None, "node was saturated"
    page2 = paginate(
        [NodeSearchResult(node(1).node_id, [a, b], saturated=False)],
        nxt.watermark,
        1,
    )
    assert [h.subject_iri for h in page2.hits] == ["./b"]


def test_paginate_first_page_sets_watermark_and_resume():
    n = NodeSearchResult(
        node(1).node_id,
        [hit("01A", "./a", 900_000), hit("01B", "./b", 800_000),
         hit("01C", "./c", 700_000)],
        saturated=True,
    )
    page = paginate([n], None, 2)
    assert [h.subject_iri for h in page.hits] == ["./a", "./b"]
    nxt = page.next
    assert nxt is not None
    assert nxt.watermark.subject_iri == "./b"
    assert nxt.resume == [(node(1).node_id, 2)]


def test_paginate_second_page_drops_emitted_and_terminates():
    n = NodeSearchResult(
        node(1).node_id,
        [hit("01A", "./a", 900_000), hit("01B", "./b", 800_000),
         hit("01C", "./c", 700_000)],
        saturated=False,
    )
    mark = SearchWatermark(800_000, "https://w3id.org/aruna/01B", "./b")
    page = paginate([n], mark, 2)
    assert [h.subject_iri for h in page.hits] == ["./c"]
    assert page.next is None


def test_paginate_dedups_hit_present_on_two_nodes():
    left = NodeSearchResult(
        node(1).node_id,
        [hit("01A", "./shared", 900_000), hit("01B", "./l", 600_000)],
        saturated=False,
    )
    right = NodeSearchResult(
        node(2).node_id,
        [hit("01A", "./shared", 500_000), hit("01C", "./r", 700_000)],
        saturated=False,
    )
    page = paginate([left, right], None, 1)
    assert len(page.hits) == 1
    assert page.hits[0].subject_iri == "./shared"
    assert page.hits[0].score_q == 900_000
    resume = dict(page.next.resume)
    # node 1 owns the winning copy (resumes past it); node 2's lower copy
    # sorts below the merged watermark and counts zero
    assert resume[node(1).node_id] == 1
    assert resume[node(2).node_id] == 0


def test_paginate_continues_when_saturated_without_new_hits():
    mark = SearchWatermark(900_000, "https://w3id.org/aruna/01A", "./a")
    n = NodeSearchResult(
        node(1).node_id, [hit("01A", "./a", 900_000)], saturated=True
    )
    page = paginate([n], mark, 2)
    assert page.hits == []
    nxt = page.next
    assert nxt is not None, "saturation keeps paging"
    assert nxt.watermark == mark
    assert nxt.resume == [(node(1).node_id, 1)]


def test_saturated_duplicate_progresses():
    """A duplicate-only prefix on a saturated node must advance the
    resume position instead of stalling the walk (rs:862-919)."""
    a_hits = [hit("01S", "./shared", 900_000)]
    b_hits = [hit("01S", "./shared", 500_000), hit("01U", "./unique", 300_000)]
    mark = SearchWatermark(900_000, "https://w3id.org/aruna/01S", "./shared")
    resume: dict[bytes, int] = {}
    emitted: list[str] = []
    watermark = mark
    for _ in range(4):
        a_limit = resume_fetch_limit(resume, node(1).node_id, 1)
        b_limit = resume_fetch_limit(resume, node(2).node_id, 1)
        a_page = a_hits[:a_limit]
        b_page = b_hits[:b_limit]
        results = [
            NodeSearchResult(
                node(1).node_id, a_page, saturated=len(a_page) >= a_limit
            ),
            NodeSearchResult(
                node(2).node_id, b_page, saturated=len(b_page) >= b_limit
            ),
        ]
        page = paginate(results, watermark, 1)
        emitted.extend(h.subject_iri for h in page.hits)
        if page.next is None:
            break
        watermark = page.next.watermark
        resume = dict(page.next.resume)
    assert "./unique" in emitted, f"stalled: {emitted}"


def test_paginate_churn_does_not_re_emit():
    """A higher-scored hit appearing between pages sorts above the
    watermark and must be suppressed, not duplicated (rs:921-949)."""
    mark = SearchWatermark(800_000, "https://w3id.org/aruna/01B", "./b")
    n = NodeSearchResult(
        node(1).node_id,
        [hit("01Z", "./new", 950_000), hit("01A", "./a", 900_000),
         hit("01C", "./c", 700_000)],
        saturated=False,
    )
    page = paginate([n], mark, 5)
    assert [h.subject_iri for h in page.hits] == ["./c"]


def test_paginate_stops_at_depth_cap():
    n = NodeSearchResult(
        node(1).node_id,
        [hit("01A", "./a", 900_000), hit("01B", "./b", 800_000)],
        saturated=True,
    )
    page = paginate([n], None, 1, max_depth=1)
    assert len(page.hits) == 1
    assert page.next is None
    assert page.truncated


def test_resume_fetch_limit_defaults_unknown_to_deepest():
    resume = {node(1).node_id: 4, node(2).node_id: 7}
    assert resume_fetch_limit(resume, node(1).node_id, 3, 1000) == 7
    assert resume_fetch_limit(resume, node(9).node_id, 3, 1000) == 10
    assert resume_fetch_limit({}, node(9).node_id, 3, 1000) == 3
    assert resume_fetch_limit(resume, node(2).node_id, 100, 25) == 25


def test_depth_is_bounded_constant():
    assert MAX_PAGINATION_DEPTH == 1000


# -- ed25519 signature primitive (RFC 8032) ----------------------------------
RFC8032_VECTORS = [
    # (seed, public key, message, signature) — RFC 8032 §7.1 TEST 1-3
    (
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
        "",
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b",
    ),
    (
        "4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
        "72",
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
        "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00",
    ),
    (
        "c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
        "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
        "af82",
        "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
        "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a",
    ),
]


def test_ed25519_rfc8032_vectors():
    from aruna_spark.ops import ed25519

    for seed, pub, msg, sig in RFC8032_VECTORS:
        seed_b, pub_b = bytes.fromhex(seed), bytes.fromhex(pub)
        msg_b, sig_b = bytes.fromhex(msg), bytes.fromhex(sig)
        assert ed25519.public_key(seed_b) == pub_b
        assert ed25519.sign(seed_b, msg_b) == sig_b
        assert ed25519.verify(pub_b, msg_b, sig_b)
        assert not ed25519.verify(pub_b, msg_b + b"x", sig_b)
        flipped = bytearray(sig_b)
        flipped[0] ^= 1
        assert not ed25519.verify(pub_b, msg_b, bytes(flipped))


def test_ed25519_verify_rejects_malformed_inputs():
    from aruna_spark.ops import ed25519

    assert not ed25519.verify(b"\x00" * 31, b"m", b"\x00" * 64)
    assert not ed25519.verify(b"\x00" * 32, b"m", b"\x00" * 63)
    # non-canonical scalar S >= L
    assert not ed25519.verify(b"\x01" * 32, b"m", b"\x00" * 32 + b"\xff" * 32)


def test_cursor_node_id_is_ed25519_public_key():
    """Default scheme parity with the reference: the node id IS the
    ed25519 public key, and decode verifies with the public key only."""
    from aruna_spark.ops import ed25519

    key = node(7)
    assert key.scheme == "ed25519"
    assert key.node_id == ed25519.public_key(key._seed)
    cur = SearchCursor.new_signed(
        query_fingerprint("q"), SearchWatermark(10, "g", "s"), [], key
    )
    # 64-byte ed25519 signature, verifiable from the public id alone
    assert len(cur.signature) == 64
    payload_ok = SearchCursor.decode(cur.encode(), [key])
    assert payload_ok.signer == key.node_id


def test_hmac_fallback_scheme_still_works():
    key = NodeKey.from_seed(9, scheme="hmac")
    cur = SearchCursor.new_signed(
        query_fingerprint("q"), SearchWatermark(10, "g", "s"), [], key
    )
    assert SearchCursor.decode(cur.encode(), [key]).signer == key.node_id
    # ed25519 key with the same secret has a DIFFERENT node id: the
    # schemes can never alias each other in an authorized set
    assert NodeKey.from_seed(9).node_id != key.node_id
