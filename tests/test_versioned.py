"""Versioned-table snapshot isolation tests (SURVEY §4: fjall optimistic
txns → table versions; ``aruna_spark/ops/versioned.py``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.ops.versioned import (
    CommitConflict,
    LocalExclusiveCreate,
    NoSuchVersion,
    VersionedTable,
)


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def test_commit_read_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert t.versions() == []
    v0 = t.commit(_df(spark, 1, 2))
    v1 = t.commit(_df(spark, 3), mode="append")
    v2 = t.commit(_df(spark, 9), mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    read = lambda v: sorted(
        r.v for r in t.read(spark, version=v).collect()
    )
    assert read(0) == [1, 2]
    assert read(1) == [1, 2, 3]  # append = old files + new
    assert read(2) == [9]  # overwrite replaces the file list
    assert read(None) == [9]  # default latest


def test_snapshot_pinned_reader_never_sees_later_commits(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1, 2))
    snapshot = t.read(spark, version=0)
    t.commit(_df(spark, 100), mode="overwrite")
    # the pinned DataFrame still reads version 0's files
    assert sorted(r.v for r in snapshot.collect()) == [1, 2]
    assert sorted(r.v for r in t.read(spark).collect()) == [100]


def test_optimistic_conflict_on_stale_expected_version(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    base = t.latest_version()
    t.commit(_df(spark, 2), mode="append")  # another writer wins
    with pytest.raises(CommitConflict):
        t.commit(_df(spark, 3), mode="append", expected_version=base)
    # retry against the refreshed snapshot succeeds
    v = t.commit(
        _df(spark, 3), mode="append", expected_version=t.latest_version()
    )
    assert sorted(r.v for r in t.read(spark, version=v).collect()) == [
        1,
        2,
        3,
    ]


def test_raced_same_version_claim_conflicts(spark, tmp_path):
    """Two writers computing the same next version: the O_EXCL manifest
    create arbitrates — exactly one wins."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    # simulate the loser: a manifest for version 1 appears between its
    # latest_version() read and its manifest create
    import json
    import os

    with open(os.path.join(t.log_dir, "1.json"), "w", encoding="utf-8") as f:
        json.dump({"version": 1, "mode": "append", "files": []}, f)

    class Raced(VersionedTable):
        def latest_version(self):
            return 0  # stale view

    with pytest.raises(CommitConflict):
        Raced(t.path).commit(_df(spark, 2))


def test_intervening_commit_conflicts_instead_of_clobbering(
    spark, tmp_path
):
    """ADVICE r4 TOCTOU: a writer that committed BETWEEN this commit's
    snapshot read and its manifest claim must surface as CommitConflict
    — never be silently skipped past (an append claiming a re-read
    next-version would drop the intervening commit's files). The claim
    arbitrates exactly the version derived from the validated read."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))

    class InterveningWriter(LocalExclusiveCreate):
        """Injects a competing commit mid-claim (the race window)."""

        def __init__(self):
            self.fired = False

        def claim(self, target, payload):
            if not self.fired:
                self.fired = True
                VersionedTable(t.path).commit(_df(spark, 50), mode="append")
            super().claim(target, payload)

    victim = VersionedTable(t.path, protocol=InterveningWriter())
    with pytest.raises(CommitConflict):
        victim.commit(_df(spark, 2), mode="append", expected_version=0)
    # the winner's commit is intact, and the loser's retry against the
    # refreshed snapshot sees the winner's rows
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 50]
    v = t.commit(
        _df(spark, 2), mode="append", expected_version=t.latest_version()
    )
    assert sorted(r.v for r in t.read(spark, version=v).collect()) == [
        1,
        2,
        50,
    ]


def test_missing_version_raises(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    with pytest.raises(NoSuchVersion):
        t.read(spark)
    t.commit(_df(spark, 1))
    with pytest.raises(NoSuchVersion):
        t.read(spark, version=7)
