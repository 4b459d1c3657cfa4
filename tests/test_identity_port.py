"""The relational entity-identity fold vs a LITERAL port of the
reference's sequential ladder (export.rs:1268-1312 entity_identity /
parse_hash + recognize gates rs:1131-1168), over seeded random
candidate lists — the r13 literal-port convention: the port follows
the Rust rung-for-rung; the comparison pins the relational form on
shapes no hand-written lane reaches (slot overwrites, stale
hash_realm, mixed valid/invalid candidates)."""

from __future__ import annotations

import random
import re

from aruna_spark.queries.export_plan import (
    ARUNA_DATA_PREFIX,
    _CHARN_RE,
    _VARN_RE,
    recognize_entity_identity,
)

REALM = "realmE"


def _parse_varn(value: str):
    m = re.match(_VARN_RE, value)
    return m.group(1) if m else None


def _parse_charn(value: str):
    m = re.match(_CHARN_RE, value)
    return (m.group(1), m.group(3)) if m else None


def literal_identity(entity_id: str, content_urls: list[str]) -> dict:
    """entity_identity (rs:1268-1297), rung-for-rung: W3id parse
    first (hash or arn suffix), then bare versioned ARN, then ch ARN;
    each accepted candidate OVERWRITES its slot; hash_realm only from
    the ch branch."""
    exact_realm = None
    has_exact = False
    hash_val = None
    hash_realm = None
    for value in [entity_id, *content_urls]:
        if value.startswith(ARUNA_DATA_PREFIX):
            suffix = value[len(ARUNA_DATA_PREFIX):]
            if re.fullmatch(r"[0-9a-f]{64}", suffix):
                hash_val = suffix
                continue
            realm = _parse_varn(suffix)
            if realm is not None:
                has_exact, exact_realm = True, realm
            # any other w3id suffix: W3id parse fails AND the https://
            # value can never match the bare-ARN parsers — nothing
            continue
        realm = _parse_varn(value)
        if realm is not None:
            has_exact, exact_realm = True, realm
            continue
        ch = _parse_charn(value)
        if ch is not None:
            hash_val, hash_realm = ch[1], ch[0]
    external = not has_exact and hash_val is None
    supported_exact = has_exact and exact_realm == REALM
    supported_hash = hash_val is not None and (
        hash_realm is None or hash_realm == REALM
    )
    unsupported = not external and not supported_exact and not supported_hash
    return {
        "identity_kind": (
            "exact" if has_exact else "hash" if hash_val else "external"
        ),
        "hash_realm": hash_realm,
        "supported": supported_exact or supported_hash,
        "omission": (
            "External" if external else "Unsupported" if unsupported else None
        ),
    }


def _random_cases(seed: int, n: int):
    rnd = random.Random(seed)
    ulid_ok = "01ARZ3NDEKTSV4RRFFQ69G5FAV"
    pool = [
        lambda i: f"{ARUNA_DATA_PREFIX}{'%02x' % (i % 256) * 32}",
        lambda i: f"{ARUNA_DATA_PREFIX}arn:aruna:realmE:n:s3/b{i}/k@{ulid_ok}",
        lambda i: f"{ARUNA_DATA_PREFIX}arn:aruna:realmX:n:s3/b{i}/k@{ulid_ok}",
        lambda i: f"{ARUNA_DATA_PREFIX}not-a-hash-{i}",
        lambda i: f"arn:aruna:realmE:n:s3/b{i}/k@{ulid_ok}",
        lambda i: f"arn:aruna:realmX:n:s3/b{i}/k@{ulid_ok}",
        lambda i: f"arn:aruna:realmE:n:s3/b{i}/bad key@{ulid_ok}",
        lambda i: f"arn:aruna:realmE:n:s3/b{i}/k@{'I' * 26}",
        lambda i: f"arn:aruna:realmE:n:ch/blake3/{'%02x' % (i % 256) * 32}",
        lambda i: f"arn:aruna:realmX:n:ch/{'%02x' % (i % 256) * 32}",
        lambda i: f"arn:aruna:realmE:n:ch/blake3/{'%02x' % (i % 256) * 31}ff",
        lambda i: f"https://example.org/f{i}",
        lambda i: f"./data/f{i}.txt",
        lambda i: "",
    ]
    cases = []
    for i in range(n):
        eid = rnd.choice(pool)(i) or f"ent-{i}"
        urls = [rnd.choice(pool)(i * 31 + j) for j in range(rnd.randint(0, 4))]
        urls = [u for u in urls if u]
        cases.append((i, eid, urls))
    return cases


def test_identity_matches_literal_port_on_random_candidates(spark):
    cases = _random_cases(20260817, 120)
    df = spark.createDataFrame(
        [(i, eid, urls, None, []) for i, eid, urls in cases],
        "doc_id long, entity_id string, content_urls array<string>, "
        "raw_path string, local_paths array<string>",
    )
    got = {
        r["entity_id"]: r.asDict()
        for r in recognize_entity_identity(df, REALM).collect()
    }
    mismatches = []
    for _i, eid, urls in cases:
        want = literal_identity(eid, urls)
        have = got[eid]
        if any(want[k] != have[k] for k in want):
            mismatches.append((eid, urls, want, {k: have[k] for k in want}))
    assert not mismatches, mismatches[:5]
