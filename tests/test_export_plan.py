"""Archive-export path planning (jobs/export.rs:986-1040,
1313-1356): sanitizer vectors, reserved names, synthesis, the length
cap and collision detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.export_plan import (
    KEY_BYTES_LIMIT,
    METADATA_PATH,
    REPORT_PATH,
    export_plan_paths,
    sanitized_path,
)


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    return export_plan_paths(spark, sf_dir).collect()


def test_every_lane_populated(plan):
    assert {r.outcome for r in plan} == {
        "explicit",
        "synthesized",
        "too_long",
    }
    assert any(r.collision for r in plan)


def test_sanitizer_vectors(spark):
    """The reference's own unit vectors (export.rs:3189-3190) plus the
    rejection classes."""
    cases = [
        ("./a/b.txt", "a/b.txt"),
        ("././x", "x"),
        ("../escape", None),
        ("a/../b", None),
        ("a//b", None),
        ("a/./b", None),
        ("dir\\win", None),
        ("enc%2Fslash", None),
        ("enc%5Cback", None),
        ("ENC%2fUPPER", None),  # case-insensitive encoded separator
        ("trail/", None),
        ("", None),
        ("plain.txt", "plain.txt"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "p string")
    got = [
        r.s
        for r in df.select(sanitized_path(F.col("p")).alias("s")).collect()
    ]
    assert got == [c[1] for c in cases]


def test_reserved_names_synthesize(plan):
    lane7 = [r for r in plan if int(r.entity_id.rsplit(":", 1)[1]) % 9 == 7]
    lane7 = [
        r for r in lane7
        if int(r.entity_id.rsplit(":", 1)[1]) % 11 != 9
    ]
    assert lane7
    for r in lane7:
        assert r.path_synthesized and r.outcome == "synthesized"
        assert r.zip_path not in (METADATA_PATH, REPORT_PATH)
        assert r.zip_path.startswith("data/")


def test_synthesized_paths_are_unique(plan):
    synth = [r.zip_path for r in plan if r.outcome == "synthesized"]
    # entity-id suffix makes even identical content unique per entity
    assert len(synth) == len(set(synth))
    assert all(not r.collision for r in plan if r.outcome == "synthesized")


def test_length_cap(plan):
    long = [r for r in plan if r.outcome == "too_long"]
    assert long and all(r.zip_path is None for r in long)
    ok = [r for r in plan if r.zip_path is not None]
    assert all(len(r.zip_path) <= KEY_BYTES_LIMIT for r in ok)


def test_collisions_are_lane0_modulus_ties(plan):
    """Only the explicit lane-0 paths (keyed on doc_id % 40) collide;
    a collision marks EVERY party (the reference fails the job on the
    first duplicate — the plan row surfaces all of them)."""
    colliding = [r for r in plan if r.collision]
    assert colliding
    by_path = {}
    for r in colliding:
        by_path.setdefault(r.zip_path, []).append(r)
    for path, rows in by_path.items():
        assert len(rows) >= 2
        assert path.startswith("data/files/f")


# -- entity identity recognition (r15; export.rs:1085-1168 + 1268-1312,
#    core replication.rs:160-320) ---------------------------------------

from aruna_spark.queries.export_plan import (  # noqa: E402
    ARUNA_DATA_PREFIX,
    recognize_entity_identity,
)

_H = "a" * 64
_ULID = "01ARZ3NDEKTSV4RRFFQ69G5FAV"


def _recognize(spark, rows, realm="realmE"):
    df = spark.createDataFrame(
        rows,
        "doc_id long, entity_id string, content_urls array<string>, "
        "raw_path string, local_paths array<string>",
    )
    return {
        r["entity_id"]: r.asDict()
        for r in recognize_entity_identity(df, realm).collect()
    }


def test_identity_edge_arns(spark):
    varn = f"arn:aruna:realmE:node1:s3/bkt/a%20b@{_ULID}"
    got = _recognize(
        spark,
        [
            # canonical %20 key accepts; uppercase-hex of a set char
            (1, "e1", [varn], None, []),
            # lowercase hex escape is not canonical
            (2, "e2", [f"arn:aruna:realmE:n:s3/bkt/a%2fb@{_ULID}"], None, []),
            # escape of a NON-set character ('.', %2E) is not canonical
            (3, "e3", [f"arn:aruna:realmE:n:s3/bkt/a%2Eb@{_ULID}"], None, []),
            # raw space in the key must have been encoded
            (4, "e4", [f"arn:aruna:realmE:n:s3/bkt/a b@{_ULID}"], None, []),
            # key may contain '/' raw
            (5, "e5", [f"arn:aruna:realmE:n:s3/bkt/d/e/f.txt@{_ULID}"], None, []),
            # 25-char ULID rejects; Crockford excludes I L O U
            (6, "e6", [f"arn:aruna:realmE:n:s3/bkt/k@{_ULID[:25]}"], None, []),
            (7, "e7", [f"arn:aruna:realmE:n:s3/bkt/k@{'I' * 26}"], None, []),
            # ch path accepts with or without the blake3/ prefix
            (8, "e8", [f"arn:aruna:realmE:n:ch/blake3/{_H}"], None, []),
            (9, "e9", [f"arn:aruna:realmE:n:ch/{_H}"], None, []),
            # uppercase hex hash rejects (parse_hash is lowercase-only)
            (10, "e10", [f"arn:aruna:realmE:n:ch/{_H.upper()}"], None, []),
            # a data-W3ID whose arn suffix fails parses as NOTHING
            (11, "e11", [f"{ARUNA_DATA_PREFIX}arn:aruna:realmE:n:s3/bkt"], None, []),
        ],
    )
    assert got["e1"]["identity_kind"] == "exact" and got["e1"]["supported"]
    for rejected in ("e2", "e3", "e4", "e6", "e7", "e10", "e11"):
        assert got[rejected]["identity_kind"] == "external", rejected
        assert got[rejected]["omission"] == "External"
    assert got["e5"]["identity_kind"] == "exact"
    assert got["e8"]["identity_kind"] == "hash"
    assert got["e8"]["hash_realm"] == "realmE" and got["e8"]["supported"]
    assert got["e9"]["identity_kind"] == "hash" and got["e9"]["supported"]


def test_identity_last_wins_and_stale_hash_realm(spark):
    ch_x = f"arn:aruna:realmX:n:ch/blake3/{_H}"
    varn_e = f"arn:aruna:realmE:n:s3/bkt/k@{_ULID}"
    varn_x = f"arn:aruna:realmX:n:s3/bkt/k@{_ULID}"
    w3id_hash = f"{ARUNA_DATA_PREFIX}{_H}"
    got = _recognize(
        spark,
        [
            # exact slot: LAST versioned ARN wins (realmX overwrites E)
            (1, "e1", [varn_e, varn_x], None, []),
            # hash_realm persists from the ch ARN even after a later
            # data-W3ID hash overwrites the hash slot (rs:1271-1291)
            (2, "e2", [ch_x, w3id_hash], None, []),
            # exact beats hash for the identity kind and the gate
            (3, "e3", [ch_x, varn_e], None, []),
        ],
    )
    assert got["e1"]["identity_kind"] == "exact"
    assert not got["e1"]["supported"]
    assert got["e1"]["omission"] == "Unsupported"
    assert got["e2"]["identity_kind"] == "hash"
    assert got["e2"]["hash_realm"] == "realmX"
    assert got["e2"]["omission"] == "Unsupported"
    assert got["e3"]["supported"] and got["e3"]["omission"] is None


def test_identity_local_path_pick(spark):
    got = _recognize(
        spark,
        [
            (1, "e1", [], "raw.txt", ["raw.txt", "o"]),
            (2, "e2", [], "raw.txt", ["o1", "o2"]),
            (3, "e3", [], None, ["solo"]),
            (4, "e4", [], "x", []),
        ],
    )
    assert got["e1"]["local_path"] == "raw.txt"
    assert got["e2"]["local_path"] == "o1"
    assert got["e3"]["local_path"] == "solo"
    assert got["e4"]["local_path"] is None
