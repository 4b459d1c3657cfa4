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
