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


def test_compact_merges_appends_into_one_part(spark, tmp_path):
    """compact() rewrites an append-accumulated file list as one fresh
    part in a NEW version; old versions still read (time travel intact
    until expire_versions)."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    for v in (2, 3, 4):
        t.commit(_df(spark, v), mode="append")
    assert len(t.files(3)) == 4
    cv = t.compact(spark)
    assert cv == 4
    assert len(t.files(cv)) == 1
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 2, 3, 4]
    # pre-compaction snapshot unaffected
    assert sorted(r.v for r in t.read(spark, 1).collect()) == [1, 2]


def test_compact_conflicts_against_concurrent_writer(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    real_latest = t.latest_version
    # compactor snapshots v0; a writer lands v1 before the claim
    t.latest_version = lambda: 0
    t.commit(_df(spark, 2), mode="append")  # claims v1 (uses pinned 0)
    t.latest_version = real_latest
    t.latest_version = lambda: 0  # compactor still believes v0
    try:
        with pytest.raises(CommitConflict):
            t.compact(spark)
    finally:
        t.latest_version = real_latest


def test_expire_then_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    """The lakehouse lifecycle: expire old manifests, vacuum orphans.
    vacuum(0) deletes exactly the files no surviving manifest
    references — expired versions' parts and failed attempts' staging
    files — and never anything the latest manifest lists."""
    import os

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    t.commit(_df(spark, 2), mode="overwrite")  # v0's part now unreferenced by v1
    # a failed commit attempt: data staged, claim never made
    orphan = t._write_data(_df(spark, 99))[0]
    live = set(t.files(1))
    assert t.expire_versions(keep_last=1) == [0]
    # negative retention: everything counts as aged — the 0.0 form can
    # race sub-second file mtimes against vacuum's clock read under
    # full-suite load (observed flake)
    deleted = t.vacuum(retention_s=-5.0)
    assert deleted, "expired v0 part + orphan must be swept"
    assert not any(d.startswith(tuple(live)) for d in deleted)
    assert not os.path.exists(os.path.join(t.path, orphan))
    # latest still reads after the sweep
    assert sorted(r.v for r in t.read(spark).collect()) == [2]
    with pytest.raises(NoSuchVersion):
        t.read(spark, 0)


def test_vacuum_retention_protects_inflight_writers(spark, tmp_path):
    """Young unreferenced files may be a commit in progress (data is
    staged BEFORE the claim) — vacuum must leave them until they age
    past the retention window."""
    import os

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    staged = t._write_data(_df(spark, 7))[0]  # in-flight writer
    assert t.vacuum(retention_s=3600.0) == []
    assert os.path.exists(os.path.join(t.path, staged))
    # the writer can still complete its commit
    t._commit_manifest([*t.files(0), staged], "append", 1)
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 7]


def test_postings_table_expire_vacuum_keeps_queries_green(
    spark, sf_dir, tmp_path
):
    """End-to-end on the maintained search index: upsert, expire the
    old version, vacuum — the latest version (including its manifest-
    referenced aux sidecars) survives and still serves reads."""
    from pyspark.sql import functions as F

    from aruna_spark.ingest.doc_triples import load_triples
    from aruna_spark.search.bm25 import build_field_literals, build_postings
    from aruna_spark.search.incremental import (
        init_postings_table,
        read_aux,
        upsert_postings,
    )

    fields = build_field_literals(load_triples(spark, sf_dir))
    changed = fields.filter(
        F.regexp_extract("subject", r"(\d+)$", 1).cast("long") % 7 == 3
    )
    base = fields.join(
        changed.select("subject").distinct(), "subject", "left_anti"
    )
    table = init_postings_table(
        spark, build_postings(base), str(tmp_path / "idx")
    )
    upsert_postings(
        table, spark, build_postings(changed),
        changed.select("subject").distinct(),
    )
    n_before = table.read(spark).count()
    dl_before = read_aux(spark, table, 1)[0].count()
    table.expire_versions(keep_last=1)
    deleted = table.vacuum(retention_s=-5.0)
    assert deleted, "v0's rewritten shards and aux must be reclaimed"
    assert table.read(spark).count() == n_before
    assert read_aux(spark, table, 1)[0].count() == dl_before


def test_compact_refuses_layout_bearing_tables(spark, tmp_path):
    """Generic compact() must refuse a table whose manifest carries
    writer-owned extra keys or partition-encoded leaves — rewriting it
    as one plain part would drop the aux reference and the shard=N
    pruning paths, silently breaking readers."""
    t = VersionedTable(str(tmp_path / "t"))
    files = t._write_data(_df(spark, 1))
    t._commit_manifest(files, "overwrite", 0, extra={"aux": "_aux/x"})
    with pytest.raises(ValueError, match="layout-aware"):
        t.compact(spark)


def test_vacuum_never_deletes_extra_key_artifacts(spark, tmp_path):
    """The sweep honors EVERY writer-owned manifest key (the manifest
    is the only arbiter of a version's artifacts), not a hard-coded
    list — a future sidecar kind must survive vacuum."""
    import os

    t = VersionedTable(str(tmp_path / "t"))
    files = t._write_data(_df(spark, 1))
    side = os.path.join(t.path, "_side", "abc")
    os.makedirs(side)
    with open(os.path.join(side, "blob.bin"), "wb") as f:
        f.write(b"x")
    t._commit_manifest(
        files, "overwrite", 0, extra={"sidecar": "_side/abc"}
    )
    t.vacuum(retention_s=0.0)
    assert os.path.exists(os.path.join(side, "blob.bin"))


def test_vacuum_retention_protects_inflight_empty_dirs(spark, tmp_path):
    """A writer's staging dirs are transiently EMPTY before the first
    task file lands; the empty-dir sweep must apply the same retention
    guard as the file sweep."""
    import os
    import time

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    staging = os.path.join(t.path, "part-inflight", "_temporary", "0")
    os.makedirs(staging)
    t.vacuum(retention_s=3600.0)
    assert os.path.isdir(staging), "young empty staging dir swept"
    # once aged past retention it goes
    old = time.time() - 7200
    for d in (
        staging,
        os.path.dirname(staging),
        os.path.dirname(os.path.dirname(staging)),
    ):
        os.utime(d, (old, old))
    t.vacuum(retention_s=3600.0)
    assert not os.path.exists(os.path.dirname(os.path.dirname(staging)))


def test_compact_postings_preserves_layout_and_sidecars(
    spark, sf_dir, tmp_path
):
    """The layout-aware postings compactor merges each shard's
    accumulated files into one, keeps the shard=N manifest paths the
    query prunes on, carries aux by reference, and changes no data."""
    from pyspark.sql import functions as F

    from aruna_spark.ingest.doc_triples import load_triples
    from aruna_spark.search.bm25 import build_field_literals, build_postings
    from aruna_spark.search.incremental import (
        _SHARD_RE,
        compact_postings,
        read_aux,
        upsert_postings,
    )

    fields = build_field_literals(load_triples(spark, sf_dir))
    changed = fields.filter(
        F.regexp_extract("subject", r"(\d+)$", 1).cast("long") % 7 == 3
    )
    base = fields.join(
        changed.select("subject").distinct(), "subject", "left_anti"
    )
    from aruna_spark.search.incremental import init_postings_table

    table = init_postings_table(
        spark, build_postings(base), str(tmp_path / "idx")
    )
    upsert_postings(
        table, spark, build_postings(changed),
        changed.select("subject").distinct(),
    )
    before = table.read(spark)
    n_before, dl_before = before.count(), read_aux(spark, table, 1)[0].count()
    aux_before = table._manifest(1)["aux"]
    v = compact_postings(table, spark)
    assert v == 2
    files = table.files(2)
    assert all(_SHARD_RE.search(f) for f in files)
    # one part dir only after compaction
    assert len({f.split("/")[0] for f in files}) == 1
    # aux carried by reference, data identical
    assert table._manifest(2)["aux"] == aux_before
    assert table.read(spark).count() == n_before
    assert read_aux(spark, table, 2)[0].count() == dl_before
    # generic compact still refuses this table
    with pytest.raises(ValueError, match="layout-aware"):
        table.compact(spark)


def test_conditional_put_protocol_contested_commit(spark, tmp_path):
    """The second CommitProtocol implementation (object-store
    conditional put against a fake arbiter) honors the seam's contract:
    two writers racing the SAME version — exactly one claim lands in
    the store, the loser surfaces CommitConflict, and the loser's retry
    against the winner's refreshed snapshot commits the next version
    with the winner's rows visible."""
    import threading

    from aruna_spark.ops.versioned import ConditionalPut, InMemoryObjectStore

    store = InMemoryObjectStore()
    t = VersionedTable(str(tmp_path / "t"), protocol=ConditionalPut(store))
    t.commit(_df(spark, 1))

    # both writers validate the same snapshot (version 0), stage their
    # data, then claim version 1 concurrently through the arbiter
    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def writer(name: str, val: int):
        w = VersionedTable(t.path, protocol=ConditionalPut(store))
        files = w._write_data(_df(spark, val))
        barrier.wait()
        try:
            results[name] = w._commit_manifest(files, "append", 1)
        except CommitConflict as e:
            results[name] = e

    threads = [
        threading.Thread(target=writer, args=("a", 10)),
        threading.Thread(target=writer, args=("b", 20)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    outcomes = sorted(results.values(), key=lambda r: isinstance(r, int))
    assert isinstance(outcomes[0], CommitConflict)
    assert outcomes[1] == 1
    # the arbiter's winner IS the materialized manifest (store == disk)
    import json
    import os

    key = os.path.join(t.log_dir, "1.json")
    assert json.loads(store.get(key)) == t._manifest(1)
    winner_val = 10 if results["a"] == 1 else 20
    assert sorted(r.v for r in t.read(spark, 1).collect()) == [winner_val]
    # loser retries against the refreshed snapshot: next version, winner
    # snapshot visible underneath
    loser_val = 30
    v = t.commit(
        _df(spark, loser_val), mode="append",
        expected_version=t.latest_version(),
    )
    assert v == 2
    assert sorted(r.v for r in t.read(spark, v).collect()) == sorted(
        [winner_val, loser_val]
    )


def test_append_refuses_layout_bearing_manifest(spark, tmp_path):
    """ADVICE r5: generic commit(mode='append') must refuse a table
    whose latest manifest carries writer-owned extra keys — carrying
    the file list forward while silently dropping the 'aux' sidecar
    reference would break read_aux and expose the sidecar to vacuum."""
    t = VersionedTable(str(tmp_path / "t"))
    files = t._write_data(_df(spark, 1))
    t._commit_manifest(files, "overwrite", 0, extra={"aux": "_aux/x"})
    with pytest.raises(ValueError, match="layout-aware"):
        t.commit(_df(spark, 2), mode="append")
    # overwrite (explicit full replacement) is still allowed
    v = t.commit(_df(spark, 3), mode="overwrite")
    assert sorted(r.v for r in t.read(spark, v).collect()) == [3]
