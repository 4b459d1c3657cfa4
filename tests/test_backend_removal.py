"""Drained-backend removal sweep (group_backends/remove.rs)."""

from __future__ import annotations

import pytest

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.backend_removal import DISABLED_BACKENDS

load_all()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    fn, _ = REGISTRY["group_backends_removal_sweep"]
    return {r.backend: r for r in fn(spark, sf_dir).collect()}


def test_only_disabled_backends_enter_the_sweep(rows):
    assert set(rows) == {f"backend-{i}" for i in DISABLED_BACKENDS}


def test_upload_record_alone_pins_a_backend(rows):
    """remove.rs:118-121 — parts have no location row; the upload
    record covers them, so a backend named ONLY by an open upload
    must survive the sweep."""
    r = rows["backend-4"]
    assert not r.held_locations and not r.held_cleanup
    assert r.held_multipart and r.verdict == "kept_holding"


def test_unheld_disabled_backends_remove(rows):
    for b in ("backend-5", "backend-6"):
        r = rows[b]
        assert r.verdict == "removed"
        assert not (r.held_locations or r.held_cleanup or r.held_multipart)


def test_held_backends_keep_with_flags(rows):
    for b in ("backend-1", "backend-2"):
        assert rows[b].verdict == "kept_holding"
        assert rows[b].held_locations
