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
from aruna_spark.search.bm25 import build_doc_lengths, build_field_stats

N_SHARDS = 256  # must match bm25.materialize_postings / shard_filter

_SHARD_RE = re.compile(r"shard=(\d+)")

_AUX = "_aux"


def _with_shard(postings: DataFrame) -> DataFrame:
    return postings.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(N_SHARDS)).cast("int")
    )


def with_scoring_columns(
    postings: DataFrame, dl: DataFrame | None = None
) -> DataFrame:
    """Denormalize the scoring terms onto the posting rows (r16):
    ``dl`` (the row's (subject, field) token count) and ``df`` (the
    row's (field, token) document frequency). Query-time scoring then
    needs NO df aggregation and NO per-row joins — pruned scan →
    broadcast token join → broadcast stats join (see
    ``bm25.bm25_scores``). Both columns are maintainable per shard: a
    doc's rows rewrite together (dl), and a token lives entirely in its
    shard, so every row whose df could change is in a rewritten shard
    (df). On-disk cost is two RLE-friendly long columns (rows are
    sorted by token, so df runs are constant)."""
    from pyspark.sql import Window

    if dl is None:
        dl = build_doc_lengths(postings)
    return postings.join(dl, ["subject", "field"]).withColumn(
        "df",
        F.count(F.lit(1)).over(Window.partitionBy("field", "token")),
    )


def _write_aux(table: VersionedTable, dl: DataFrame) -> str:
    """Materialize the scoring sidecars (per-field doc lengths + corpus
    stats) for one commit ATTEMPT under a UNIQUE ``_aux/<uuid>/`` dir,
    written BEFORE the manifest claim. The winning attempt's dir is
    recorded in its manifest (``aux`` key) — the same immutability rule
    as data files. Keying the dir by attempt (not by version number)
    means two racing writers can never overwrite each other's sidecars:
    the loser leaves only an unreferenced dir for the orphan sweep.

    ``dl`` is written first and stats are derived from the WRITTEN
    parquet, so the corpus-scale doc-length aggregation executes once
    per commit, not once per sidecar. The algebraic refinement for very
    large corpora (store per-field (n, sum_dl) and roll deltas forward)
    drops even the dl re-scan; dl is ≤4 rows/doc, so that scan is cheap
    far past this sandbox's scale."""
    aux_rel = f"{_AUX}/{uuid.uuid4().hex}"
    base = os.path.join(table.path, aux_rel)
    dl_path = os.path.join(base, "dl")
    dl.coalesce(1).write.parquet(dl_path)
    written_dl = dl.sparkSession.read.parquet(dl_path)
    build_field_stats(written_dl).coalesce(1).write.parquet(
        os.path.join(base, "stats")
    )
    return aux_rel


def read_aux(
    spark: SparkSession, table: VersionedTable, version: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """The pinned version's (dl, stats) scoring sidecars, resolved
    through the version's manifest (``aux`` key) — never by guessing a
    path from the version number."""
    if version is None:
        version = table.latest_version()
    base = os.path.join(table.path, table._manifest(version)["aux"])
    return (
        spark.read.parquet(os.path.join(base, "dl")),
        spark.read.parquet(os.path.join(base, "stats")),
    )


_SHARD_CACHE: dict[str, int] = {}


def token_shards(spark: SparkSession, tokens: list[str]) -> set[int]:
    """Driver-side shard ids for query tokens (memoized): one 1-row
    constant-folded job for the uncached tokens — no Python xxhash64
    reimplementation to drift from the JVM's, no data scan."""
    missing = [t for t in dict.fromkeys(tokens) if t not in _SHARD_CACHE]
    if missing:
        row = (
            spark.range(1)
            .select(
                *[
                    F.pmod(F.xxhash64(F.lit(t)), F.lit(N_SHARDS))
                    .cast("int")
                    .alias(f"s{i}")
                    for i, t in enumerate(missing)
                ]
            )
            .collect()[0]
        )
        for i, t in enumerate(missing):
            _SHARD_CACHE[t] = row[i]
    return {_SHARD_CACHE[t] for t in tokens}


def init_postings_table(
    spark: SparkSession, postings: DataFrame, path: str
) -> VersionedTable:
    """Create version 0: the full postings written as one part dir of
    shard leaves, manifest listing each ``shard=N`` leaf separately so
    later versions can swap individual shards. The scoring sidecars
    (dl/stats) are materialized for the version before its claim."""
    table = VersionedTable(path)
    part = f"part-{uuid.uuid4().hex}"
    out = os.path.join(path, part)
    dl = build_doc_lengths(postings)
    (
        _with_shard(with_scoring_columns(postings, dl))
        .repartition("shard")
        .sortWithinPartitions("token", "subject")
        .write.partitionBy("shard")
        .parquet(out)
    )
    leaves = sorted(
        f"{part}/{d}" for d in os.listdir(out) if d.startswith("shard=")
    )
    latest = table.latest_version()
    aux_rel = _write_aux(table, dl)
    table._commit_manifest(
        leaves,
        "overwrite",
        VersionedTable.next_version(latest),
        extra={"aux": aux_rel},
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

    # rewrite the affected shards only. Scoring columns (r16): kept
    # rows' dl is still valid (their docs are unchanged), new rows get
    # dl from the batch's own doc lengths; df is recomputed over the
    # union per (field, token) — every row whose df could change is in
    # an affected shard, because a token lives entirely in its shard.
    from pyspark.sql import Window

    part = f"part-{uuid.uuid4().hex}"
    out = os.path.join(table.path, part)
    kept_old = (
        _with_shard(old)
        .filter(F.col("shard").isin(*affected))
        .join(F.broadcast(drop_subjects), "subject", "left_anti")
        .drop("df")
    )
    new_batch_dl = build_doc_lengths(new_postings)
    new_scored = _with_shard(
        new_postings.join(new_batch_dl, ["subject", "field"])
    )
    rewritten = kept_old.unionByName(
        new_scored.filter(F.col("shard").isin(*affected))
    ).withColumn(
        "df",
        F.count(F.lit(1)).over(Window.partitionBy("field", "token")),
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
    # maintain the scoring sidecars incrementally: dropped subjects' dl
    # rows out, new docs' dl rows in; stats re-aggregated from the small
    # dl relation (see _write_aux)
    old_dl, _ = read_aux(spark, table, latest)
    new_dl = old_dl.join(
        F.broadcast(drop_subjects), "subject", "left_anti"
    ).unionByName(new_batch_dl)
    aux_rel = _write_aux(table, new_dl)
    return table._commit_manifest(
        sorted(carried) + new_leaves,
        "overwrite",
        VersionedTable.next_version(latest),
        extra={"aux": aux_rel},
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


def compact_postings(table: VersionedTable, spark: SparkSession) -> int:
    """Layout-aware OPTIMIZE for the postings index (the generic
    :meth:`VersionedTable.compact` refuses layout-bearing tables):
    rewrites the latest snapshot's shard leaves — which accumulate one
    file set per upsert touching them — into ONE fresh part of one file
    per shard, preserving the ``shard=N`` path encoding the manifest
    prunes on, and carrying the scoring sidecars forward BY REFERENCE
    (compaction does not change the corpus, so the committed ``aux``
    dir is reused, not rewritten). Optimistic like any commit."""
    latest = table.latest_version()
    old = table.read(spark, version=latest)
    part = f"part-{uuid.uuid4().hex}"
    out = os.path.join(table.path, part)
    (
        _with_shard(old)
        .repartition("shard")
        .sortWithinPartitions("token", "subject")
        .write.partitionBy("shard")
        .parquet(out)
    )
    leaves = sorted(
        f"{part}/{d}" for d in os.listdir(out) if d.startswith("shard=")
    )
    return table._commit_manifest(
        leaves,
        "overwrite",
        VersionedTable.next_version(latest),
        extra={"aux": table._manifest(latest)["aux"]},
    )
