"""Incremental postings-index maintenance over a versioned table.

The reference's search index is a MAINTAINED structure: document writes
update the persistent Tantivy index in place
(``operations/src/metadata/search_enrichment.rs`` enriches per write;
``handle.rs:3466-3878`` updates stores at ingest) — it is never rebuilt
from the corpus. The batch analog here: the postings index lives in a
:class:`~aruna_spark.ops.versioned.VersionedTable` whose committed
files are token-shard leaf directories (``part-<uuid>/shard=N``), and a
document upsert/delete batch rewrites ONLY the affected shards:

1. build the changed docs' new postings (same
   :func:`~aruna_spark.search.bm25.build_postings` chain, same
   tokenizer);
2. affected shards = shards holding any OLD posting of a changed/
   deleted subject ∪ shards of the NEW postings. The old-side lookup is
   a column-pruned (subject, shard) scan of the current snapshot —
   at scale this is the classic doc→shards sidecar; the scan form keeps
   this module dependency-free;
3. rewrite each affected shard: old rows minus changed/deleted
   subjects, plus the new postings — one shuffle over the affected
   slice only;
4. commit a new manifest: unaffected shard files carried over BY
   REFERENCE (no data movement), rewritten shards' new files appended.
   Optimistic concurrency via the versioned table's O_EXCL claim.

Query-time shard pruning is manifest-level: a k-token query selects the
``shard=N`` paths from the pinned manifest (exact, driver-side, no
storage listing) — see :func:`read_pruned`.

The shard id is derived from the token (``pmod(xxhash64(token), 256)``)
so it never needs to be stored as data; paths carry it.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.versioned import VersionedTable

N_SHARDS = 256  # must match bm25.materialize_postings / shard_filter

_SHARD_RE = re.compile(r"shard=(\d+)")


def _with_shard(postings: DataFrame) -> DataFrame:
    return postings.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(N_SHARDS)).cast("int")
    )


def init_postings_table(
    spark: SparkSession, postings: DataFrame, path: str
) -> VersionedTable:
    """Create version 0: the full postings written as one part dir of
    shard leaves, manifest listing each ``shard=N`` leaf separately so
    later versions can swap individual shards."""
    table = VersionedTable(path)
    part = f"part-{uuid.uuid4().hex}"
    out = os.path.join(path, part)
    (
        _with_shard(postings)
        .repartition("shard")
        .sortWithinPartitions("token", "subject")
        .write.partitionBy("shard")
        .parquet(out)
    )
    leaves = sorted(
        f"{part}/{d}" for d in os.listdir(out) if d.startswith("shard=")
    )
    latest = table.latest_version()
    table._commit_manifest(
        leaves, "overwrite", 0 if latest is None else latest + 1
    )
    return table


def upsert_postings(
    table: VersionedTable,
    spark: SparkSession,
    new_postings: DataFrame,
    changed_subjects: DataFrame,
    expected_version: int | None = None,
) -> int:
    """Apply one write batch: every subject in ``changed_subjects`` OR
    appearing in ``new_postings`` has its old postings dropped, and
    ``new_postings`` (possibly empty for pure deletes) inserted — the
    drop set is the UNION, so an upsert whose subject was omitted from
    ``changed_subjects`` can never leave stale duplicate (subject,
    token) rows behind. Only affected shards are rewritten; all other
    shard files carry into the new manifest untouched."""
    latest = table.latest_version()
    if expected_version is not None and latest != expected_version:
        from aruna_spark.ops.versioned import CommitConflict

        raise CommitConflict(
            f"expected version {expected_version}, log is at {latest}"
        )
    current_files = table.files(latest)
    by_shard: dict[int, list[str]] = {}
    for f in current_files:
        m = _SHARD_RE.search(f)
        if m:
            by_shard.setdefault(int(m.group(1)), []).append(f)

    new_p = _with_shard(new_postings)
    drop_subjects = (
        changed_subjects.select("subject")
        .unionByName(new_postings.select("subject"))
        .distinct()
    )
    # pin the snapshot this batch validated — a re-resolved `latest`
    # here would widen the window between the conflict check above and
    # the data actually read
    old = table.read(spark, version=latest)
    old_affected = (
        _with_shard(
            old.join(F.broadcast(drop_subjects), "subject", "left_semi")
        )
        .select("shard")
        .distinct()
    )
    affected = {
        r.shard
        for r in old_affected.collect()
    } | {r.shard for r in new_p.select("shard").distinct().collect()}
    if not affected:
        return latest  # nothing to do: no new manifest

    # rewrite the affected shards only
    part = f"part-{uuid.uuid4().hex}"
    out = os.path.join(table.path, part)
    kept_old = _with_shard(old).filter(
        F.col("shard").isin(*affected)
    ).join(F.broadcast(drop_subjects), "subject", "left_anti")
    rewritten = kept_old.unionByName(
        new_p.filter(F.col("shard").isin(*affected))
    )
    (
        rewritten.repartition("shard")
        .sortWithinPartitions("token", "subject")
        .write.partitionBy("shard")
        .parquet(out)
    )
    new_leaves = sorted(
        f"{part}/{d}" for d in os.listdir(out) if d.startswith("shard=")
    )
    carried = [
        f
        for s, fs in by_shard.items()
        if s not in affected
        for f in fs
    ]
    return table._commit_manifest(
        sorted(carried) + new_leaves,
        "overwrite",
        0 if latest is None else latest + 1,
    )


def read_pruned(
    spark: SparkSession,
    table: VersionedTable,
    shards: set[int],
    version: int | None = None,
) -> DataFrame:
    """Manifest-level shard pruning: read only the ``shard=N`` leaf
    paths of the pinned version that a query's tokens hash to."""
    files = [
        f
        for f in table.files(version)
        if (m := _SHARD_RE.search(f)) and int(m.group(1)) in shards
    ]
    if not files:
        return table.read(spark, version).limit(0)
    return spark.read.parquet(
        *[os.path.join(table.path, f) for f in files]
    )
