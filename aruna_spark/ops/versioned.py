"""Versioned table layer: snapshot-isolated reads + optimistic commits.

SURVEY §4 maps the reference's snapshot isolation — fjall optimistic
transactions over LSM keyspaces (``storage/src/storage.rs:40-43``, every
read path opens a snapshot txn, writers conflict-check at commit) — to
Delta-style table versions. Delta Lake itself is not in this container,
so this module implements the same contract directly on parquet + a
JSON commit log, the way Delta's `_delta_log` works:

- a table directory holds immutable parquet data files plus
  ``_log/<version>.json`` manifests listing the files that make up that
  version;
- **readers pin a manifest**: a read of version N sees exactly N's file
  list forever (snapshot isolation — concurrent writers add new files
  and new manifests, never mutate old ones);
- **writers commit optimistically**: a commit writes its data files,
  then atomically creates ``_log/<next>.json`` via ``O_EXCL``. If
  another writer won the race the create fails and the commit raises
  :class:`CommitConflict` — the fjall optimistic-txn conflict, surfaced
  for retry;
- ``append`` commits (new files + previous file list) never conflict
  semantically but still serialize through the version counter, exactly
  like Delta's blind appends.

At 100 TB this is the standard lakehouse metadata pattern: manifests are
KB-sized JSON regardless of data volume, data files are immutable, and
time travel is "read an old manifest". The implementation is
driver-side-bounded (one small JSON per commit).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency violation — retry against the new snapshot)."""


class NoSuchVersion(ValueError):
    """Requested version does not exist in the log."""


class CommitProtocol:
    """The seam around the ONE operation that must be atomic: publishing
    the manifest for an EXACT version number, first-writer-wins.

    The local implementation uses ``O_EXCL`` exclusive create — atomic
    on POSIX filesystems but NOT on object stores (S3 has no exclusive
    create or atomic rename). A 100 TB deployment swaps this seam for a
    conditional put (S3 ``If-None-Match: *``) or an external lock/commit
    service (the DynamoDB lock table Delta used before conditional
    writes; Iceberg's catalog compare-and-swap). The contract is
    identical either way: exactly one writer's payload lands for a given
    version key; every other claimant of that key gets
    ``FileExistsError`` (mapped to :class:`CommitConflict` above).
    """

    def claim(self, target: str, payload: str) -> None:
        """Atomically create ``target`` with ``payload``; raise
        ``FileExistsError`` if any writer already claimed it."""
        raise NotImplementedError


class LocalExclusiveCreate(CommitProtocol):
    """POSIX ``O_EXCL`` claim — the local-filesystem arbiter."""

    def claim(self, target: str, payload: str) -> None:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(payload)


class ConditionalPutStore:
    """The arbiter interface a conditional-put protocol claims against:
    one atomic ``put_if_absent``. S3 exposes it as ``PutObject`` with
    ``If-None-Match: *`` (412 on the loser), GCS as
    ``x-goog-if-generation-match: 0`` — public object-store semantics."""

    def put_if_absent(self, key: str, body: str) -> bool:
        """Atomically create ``key``; False if any writer already did."""
        raise NotImplementedError


class InMemoryObjectStore(ConditionalPutStore):
    """Fake object store for tests: ``put_if_absent`` is atomic under a
    process lock, modeling the store-side compare-and-set exactly
    (first writer lands, every later writer of the same key loses)."""

    def __init__(self):
        import threading

        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, key: str, body: str) -> bool:
        with self._lock:
            if key in self._objects:
                return False
            self._objects[key] = body
            return True

    def get(self, key: str) -> str:
        return self._objects[key]


class ConditionalPut(CommitProtocol):
    """Object-store claim: the manifest KEY in the store is the version
    arbiter (compare-and-set via ``put_if_absent``); the local manifest
    file is the winner-only materialization for the read path. This is
    the SCALE.md 'Object-store commit safety' drop-in — same contract as
    :class:`LocalExclusiveCreate`, different atomic primitive — proving
    the :class:`CommitProtocol` seam is sufficient (a second
    implementation, exercised by the contested-commit test in
    ``tests/test_versioned.py``)."""

    def __init__(self, store: ConditionalPutStore):
        self.store = store

    def claim(self, target: str, payload: str) -> None:
        if not self.store.put_if_absent(target, payload):
            raise FileExistsError(target)
        # only the arbiter's winner reaches this write, so the local
        # materialization can never race another claimant of the key
        with open(target, "w", encoding="utf-8") as f:
            f.write(payload)


LOCAL_PROTOCOL = LocalExclusiveCreate()


class VersionedTable:
    """A parquet table with a Delta-style JSON commit log."""

    def __init__(self, path: str, protocol: CommitProtocol | None = None):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.protocol = protocol or LOCAL_PROTOCOL

    @staticmethod
    def next_version(latest: int | None) -> int:
        """The version a writer who validated snapshot ``latest`` must
        claim. Correctness-critical and therefore defined ONCE: the
        claim must arbitrate exactly the version derived from the
        snapshot the writer read (see :meth:`_commit_manifest`); every
        committer (commit(), the incremental-postings writers) routes
        through this rule so a future change cannot silently diverge
        between them."""
        return 0 if latest is None else latest + 1

    # -- log inspection ------------------------------------------------------
    def versions(self) -> list[int]:
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[:-5]) for n in names if n.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        try:
            with open(
                os.path.join(self.log_dir, f"{version}.json"),
                encoding="utf-8",
            ) as f:
                return json.load(f)
        except FileNotFoundError:
            raise NoSuchVersion(
                f"version {version} of {self.path} does not exist"
            ) from None

    # -- reads (snapshot isolation) ------------------------------------------
    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read a pinned snapshot: the file list of ``version`` (default
        latest). The returned DataFrame NEVER sees later commits."""
        files = self.files(version)
        return spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def files(self, version: int | None = None) -> list[str]:
        """The relative file list of a version — manifest-level file
        pruning (the lakehouse pattern: callers select the subset of
        paths they need, e.g. by a partition key encoded in the path,
        without touching storage)."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise NoSuchVersion(f"{self.path} has no committed version")
        files = self._manifest(version)["files"]
        if not files:
            raise NoSuchVersion(
                f"version {version} of {self.path} is empty"
            )
        return files

    # -- writes (optimistic commit) ------------------------------------------
    def _write_data(self, df: DataFrame) -> list[str]:
        part = f"part-{uuid.uuid4().hex}"
        out = os.path.join(self.path, part)
        df.write.parquet(out)
        return [part]

    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        expected_version: int | None = None,
    ) -> int:
        """Write ``df``'s files, then atomically claim the next version.

        ``expected_version`` is the snapshot the writer based its work
        on (fjall's optimistic read-set check): if the log has moved
        past it, the commit conflicts WITHOUT writing a manifest. A
        raced claim of the same version number also conflicts — the
        ``O_EXCL`` create is the atomic arbiter, as in Delta.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        latest = self.latest_version()
        if expected_version is not None and latest != expected_version:
            raise CommitConflict(
                f"expected version {expected_version}, log is at {latest}"
            )
        if mode == "append" and latest is not None:
            # same layout guard as compact(): a generic append carries the
            # previous FILE list forward but would silently DROP
            # writer-owned extra keys (the postings 'aux' sidecars) and
            # break path-encoded pruning — those tables append through
            # their layout-aware maintainer (upsert_postings)
            self._guard_plain_layout(self._manifest(latest), "append to")
        new_files = self._write_data(df)
        if mode == "append" and latest is not None:
            new_files = self._manifest(latest)["files"] + new_files
        # claim EXACTLY the version derived from the snapshot this write
        # validated — never re-read the log here (a writer that committed
        # in between must surface as CommitConflict, not be clobbered:
        # an append based on a stale file list would silently drop the
        # intervening commit's files)
        return self._commit_manifest(
            new_files, mode, self.next_version(latest)
        )

    def _commit_manifest(
        self,
        files: list[str],
        mode: str,
        version: int,
        extra: dict | None = None,
    ) -> int:
        """Atomically claim ``version`` for an explicit file list (files
        must already be written under the table directory). The primitive
        behind :meth:`commit` and incremental-maintenance writers that
        carry unaffected files over by reference.

        ``version`` MUST be derived from the snapshot the caller read
        and validated (latest + 1) — the claim arbitrates that exact
        version, so any concurrent commit makes this raise
        :class:`CommitConflict` and the caller retries against the
        winner's snapshot.

        ``extra`` merges additional writer-owned keys into the manifest
        (e.g. the postings index's per-version sidecar paths). Like data
        files, anything referenced there must be written to a UNIQUE
        path before the claim — the manifest is the only arbiter of
        which attempt's artifacts belong to the version."""
        os.makedirs(self.log_dir, exist_ok=True)
        manifest = {
            "version": version,
            "mode": mode,
            "files": files,
            "committed_at": time.time(),
            **(extra or {}),
        }
        target = os.path.join(self.log_dir, f"{version}.json")
        try:
            self.protocol.claim(target, json.dumps(manifest))
        except FileExistsError:
            raise CommitConflict(
                f"version {version} was committed concurrently"
            ) from None
        return version

    # -- maintenance (compaction / retention / orphan sweep) -----------------
    # The reference gets these for free from its storage engine: fjall
    # LSM keyspaces (storage/src/storage.rs:18-41) merge small segments
    # and drop obsolete ones inside the engine. A manifest-log table
    # must do the same maintenance explicitly — the standard lakehouse
    # triple (Delta/Iceberg OPTIMIZE, version expiry, VACUUM):
    #
    # - compact():         many small files -> few, as a NEW version
    #                      (readers of old versions are unaffected);
    # - expire_versions(): drop old manifests, bounding time travel;
    # - vacuum():          delete files referenced by NO remaining
    #                      manifest and older than a retention window.
    #
    # Safety order matters: vacuum never deletes anything a surviving
    # manifest references, and the retention window protects in-flight
    # writers (they write data files BEFORE claiming — a fresh orphan
    # may be a commit about to happen, so only age-expired orphans go).

    _META_KEYS = frozenset({"version", "mode", "files", "committed_at"})

    def _guard_plain_layout(self, manifest: dict, op: str) -> None:
        """Refuse generic rewrites of layout-bearing tables: extra
        manifest keys (writer-owned sidecars) or path-encoded layouts
        (``shard=N`` leaves) have layout-aware maintainers; a generic
        ``op`` would silently break their readers."""
        extra = set(manifest) - self._META_KEYS
        layered = any(
            "=" in os.path.basename(f) for f in manifest.get("files", [])
        )
        if extra or layered:
            raise ValueError(
                f"refusing to {op} a table carrying a writer-owned layout "
                f"(extra manifest keys {sorted(extra)!r}, partitioned "
                f"leaves={layered}); use its layout-aware maintainer"
            )

    def compact(self, spark: SparkSession) -> int:
        """Rewrite the latest snapshot's (possibly many, possibly small)
        files into one fresh part as a new version — the OPTIMIZE /
        SSTable-merge analog for append-heavy PLAIN tables. Optimistic
        like any commit: a concurrent writer makes this raise
        :class:`CommitConflict` (retry; compaction is idempotent
        work-wise since it derives purely from the snapshot).

        REFUSES layout-bearing tables: a manifest carrying writer-owned
        extra keys (e.g. the postings index's ``aux`` sidecars) or a
        path-encoded layout (``shard=N`` leaves) cannot be rewritten as
        one generic part without silently breaking its readers — those
        tables compact through their layout-aware maintainer
        (``search.incremental.compact_postings``)."""
        latest = self.latest_version()
        manifest = self._manifest(latest) if latest is not None else {}
        self._guard_plain_layout(manifest, "compact")
        return self.commit(
            self.read(spark, latest), "overwrite", expected_version=latest
        )

    def expire_versions(self, keep_last: int = 1) -> list[int]:
        """Delete all but the newest ``keep_last`` manifests, bounding
        the time-travel horizon (Delta's logRetentionDuration analog).
        Data files are NOT touched — :meth:`vacuum` reclaims whatever
        the surviving manifests no longer reference."""
        if keep_last < 1:
            raise ValueError("must keep at least the latest version")
        expired = self.versions()[:-keep_last]
        for v in expired:
            os.remove(os.path.join(self.log_dir, f"{v}.json"))
        return expired

    def _referenced_roots(self) -> list[str]:
        """Every path a surviving manifest references: the ``files``
        list plus EVERY writer-owned extra key's string (or list-of-
        string) value — the manifest is the only arbiter of which
        artifacts belong to a version (see :meth:`_commit_manifest`),
        so the sweep must honor keys it has never heard of (a second
        sidecar kind added later must not be vacuumed as orphans)."""
        roots = []
        for v in self.versions():
            m = self._manifest(v)
            roots.extend(m["files"])
            for key, val in m.items():
                if key in self._META_KEYS:
                    continue
                if isinstance(val, str):
                    roots.append(val)
                elif isinstance(val, list):
                    roots.extend(x for x in val if isinstance(x, str))
        return roots

    def vacuum(self, retention_s: float = 7 * 86400.0) -> list[str]:
        """Delete files under the table that no surviving manifest
        references (loser attempts' data/aux, expired versions' files)
        and that are older than ``retention_s`` — the orphan-file sweep.
        The retention window is the in-flight-writer guard: a writer
        stages data files before its claim, so young unreferenced files
        may belong to a commit in progress. Returns deleted paths."""
        roots = self._referenced_roots()
        cutoff = time.time() - retention_s
        deleted = []
        for dirpath, _dirnames, filenames in os.walk(self.path):
            rel_dir = os.path.relpath(dirpath, self.path)
            if rel_dir == "_log" or rel_dir.startswith("_log" + os.sep):
                continue
            for fn in filenames:
                rel = fn if rel_dir == "." else f"{rel_dir}/{fn}"
                if any(
                    rel == r or rel.startswith(r + "/") for r in roots
                ):
                    continue
                full = os.path.join(dirpath, fn)
                if os.path.getmtime(full) <= cutoff:
                    os.remove(full)
                    deleted.append(rel)
        # drop directories emptied by the sweep (leaves first; rmdir
        # refuses non-empty dirs, so this can never delete data). The
        # same retention guard applies: an in-flight writer's staging
        # dirs are TRANSIENTLY empty (parquet creates _temporary/ before
        # the first task file lands), so only age-expired empties go —
        # and referenced roots never go, even empty. Ages are snapshotted
        # BEFORE any removal: rmdir of an (aged, orphaned) child bumps
        # the parent's mtime, which must not restart the parent's clock.
        sweep = []
        for dirpath, _dirnames, _filenames in os.walk(self.path, topdown=False):
            if dirpath == self.path:
                continue
            rel = os.path.relpath(dirpath, self.path)
            if rel == "_log" or rel.startswith("_log" + os.sep):
                continue
            if any(rel == r or r.startswith(rel + "/") for r in roots):
                continue
            try:
                sweep.append((dirpath, os.path.getmtime(dirpath)))
            except OSError:
                pass
        for dirpath, mtime in sweep:  # walk order is already leaves-first
            if mtime <= cutoff:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return deleted
