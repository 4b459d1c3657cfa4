"""Blob reclaim sweep: content-addressed garbage collection.

Reference: ``operations/src/blob/reclaim.rs`` (1,160 LoC) — versioned
deletes enqueue ``(backend, blob_hash)`` reclaim candidates; a periodic
sweep (15 min cadence, rs:34) resolves each candidate inside one
transaction:

- the tenant's ``CleanupStrategy`` (``core/src/structs/cleanup.rs:
  10-22``) decides eligibility: ``Retain`` drops the candidate (the
  safe tenant default — operators never lose bytes silently);
  ``Reclaim { after }`` (node default, 24 h grace) proceeds;
- a candidate whose ``enqueued_at + grace`` has not elapsed at sweep
  time stays queued (``NotDue``, rs:61,476-478);
- the hash-path alias index is walked and every surviving version that
  still names this exact ``(blob_hash, backend)`` copy PINS it
  (rs:565-587 — "A version that still names this exact copy pins
  it"); a pinned candidate is dropped;
- otherwise the copy is freed: location row, queue row, physical
  delete and the stored-counter debit commit together (rs:595-600).

Spark mapping: the sweep is pure set algebra — candidates left-join
the per-backend strategy dimension, an EXISTS (broadcast semi-join)
against the post-delete catalog's surviving blob locations decides
pinning, and a CASE ladder assigns the verdict. One catalog scan, one
request-sized join; the per-candidate state machine becomes columns.

Modeled candidate source: the deterministic delete batch's versioned
removals (doc_id % 17 == 2 removes v0) — exactly the writes that
enqueue candidates in the reference. Backends route by content
(size % 3, the usage_counters_by_backend dimension); backend-2 keeps
the Retain default, the others run Reclaim with a 10-tick grace;
enqueued_at = 500 + doc_id % 20, sweep_time = 520 (so ids with
doc_id % 20 > 10 are not yet due).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.mat import DISK_ONLY
from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions

SWEEP_TIME = 520
RECLAIM_GRACE = 10

# the reference's sweep cadence constants (reclaim.rs:34-35), pinned
RECLAIM_SWEEP_AFTER_S = 15 * 60
RECLAIM_SWEEP_RETRY_S = 60
DEFAULT_RECLAIM_AFTER_S = 24 * 60 * 60  # cleanup.rs:19


def _backend_of(size: F.Column) -> F.Column:
    return F.concat(F.lit("backend-"), (size % 3).cast("string"))


def reclaim_sweep(
    surviving: DataFrame,
    candidates: DataFrame,
    strategies: DataFrame,
    sweep_time: int,
) -> DataFrame:
    """One sweep over a candidate queue → per-candidate verdict.

    ``candidates``: (backend, blob_hash, blob_size, enqueued_at);
    ``strategies``: (backend, strategy, grace) — strategy ∈
    {'retain', 'reclaim'}; ``surviving``: the post-delete catalog
    (marker rows carry no blob and never pin). Verdicts: 'dropped'
    (retain), 'not_due', 'pinned', 'freed' (+ freed bytes).

    Scale shape: the candidate queue is sweep-page-sized (the reference
    drains 128/page, 1,024/tick — rs:37-40); it broadcasts against the
    strategy dimension and the pin check is one broadcast semi-join of
    the candidate keys against the catalog's surviving locations —
    pruned by blob_hash before any shuffle."""
    # r16 (guide §3.2): prune the corpus-sized surviving catalog to the
    # candidate keys BEFORE the distinct — the old shape shuffled every
    # surviving (blob_hash, backend) pair through the distinct (and a
    # sort-merge join) to serve a page-sized probe. The candidate batch
    # materializes once (lazy: both consumers feed one action) because
    # it feeds the key set AND the verdict join; both downstream joins
    # carry explicit broadcast hints, so the checkpoint's erased size
    # estimates cannot demote them (OPTIMIZATION_r15 finding (c)).
    candidates = candidates.localCheckpoint(
        eager=False, storageLevel=DISK_ONLY
    )
    keys = candidates.select("backend", "blob_hash").distinct()
    locs = (
        surviving.filter(F.col("blob_hash").isNotNull())
        .select(
            F.col("blob_hash"),
            _backend_of(F.col("size")).alias("backend"),
        )
        .join(F.broadcast(keys), ["backend", "blob_hash"], "left_semi")
        .distinct()
    )
    pinned = (
        candidates.join(
            F.broadcast(locs.withColumn("__pin", F.lit(True))),
            ["backend", "blob_hash"],
            "left",
        )
        .join(F.broadcast(strategies), "backend", "left")
    )
    verdict = (
        F.when(
            F.coalesce(F.col("strategy"), F.lit("retain")) == "retain",
            F.lit("dropped"),
        )
        .when(
            F.col("enqueued_at") + F.col("grace") > F.lit(sweep_time),
            F.lit("not_due"),
        )
        .when(F.col("__pin").isNotNull(), F.lit("pinned"))
        .otherwise(F.lit("freed"))
    )
    return pinned.select(
        "backend",
        "blob_hash",
        "enqueued_at",
        verdict.alias("verdict"),
        F.when(verdict == "freed", F.col("blob_size"))
        .cast("long")
        .alias("freed_bytes"),
    )


def _candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned-removal batch's enqueued candidates: each removed
    v0's (backend, blob_hash, size) with its queue tick."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 2
    )
    size = F.col("n_chars").cast("long")  # v0's size = n_chars + 0
    return docs.select(
        _backend_of(size).alias("backend"),
        F.md5(F.concat(F.lit("blob:"), size.cast("string"))).alias(
            "blob_hash"
        ),
        size.alias("blob_size"),
        (F.lit(500) + F.col("doc_id") % 20).cast("long").alias("enqueued_at"),
    ).distinct()


def _strategies(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            ("backend-0", "reclaim", RECLAIM_GRACE),
            ("backend-1", "reclaim", RECLAIM_GRACE),
            ("backend-2", "retain", 0),
        ],
        "backend string, strategy string, grace int",
    )


@register(
    "blob_reclaim_sweep",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    deletes AS (
      SELECT 'corpus' AS bucket,
             'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
               AS key,
             'v0' AS version_id
      FROM documents WHERE doc_id % 17 = 2
    ),
    kept AS (
      SELECT o.* FROM objects o
      WHERE NOT EXISTS (
        SELECT 1 FROM deletes d
        WHERE d.bucket = o.bucket AND d.key = o.key
          AND d.version_id = o.version_id
      )
    ),
    cands AS (
      SELECT DISTINCT
             'backend-' || (n_chars % 3) AS backend,
             md5('blob:' || n_chars) AS blob_hash,
             CAST(n_chars AS BIGINT) AS blob_size,
             CAST(500 + doc_id % 20 AS BIGINT) AS enqueued_at
      FROM documents WHERE doc_id % 17 = 2
    ),
    verdicts AS (
      SELECT c.*,
             CASE
               WHEN n_chars_mod = 2 THEN 'dropped'
               WHEN c.enqueued_at + {RECLAIM_GRACE} > {SWEEP_TIME}
                 THEN 'not_due'
               WHEN EXISTS (
                 SELECT 1 FROM kept k
                 WHERE k.blob_hash = c.blob_hash
                   AND NOT k.is_delete_marker
               ) THEN 'pinned'
               ELSE 'freed'
             END AS verdict
      FROM (SELECT *, CAST(substr(backend, 9) AS INT) AS n_chars_mod
            FROM cands) c
    )
    SELECT backend, blob_hash, enqueued_at, verdict,
           CAST(CASE WHEN verdict = 'freed' THEN blob_size END AS BIGINT)
             AS freed_bytes
    FROM verdicts
    """,
)
def blob_reclaim_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reclaim sweep run against the post-delete catalog: versioned
    removals enqueued their blobs; retain backends drop, young
    candidates stay queued, content-shared blobs still named by a
    surviving version are pinned, and only genuinely unreferenced
    copies free their bytes. The oracle re-derives pinning through the
    size-keyed content address independently of the Spark join."""
    return reclaim_sweep(
        post_delete_catalog(spark, sf_dir),
        _candidates(spark, sf_dir),
        _strategies(spark),
        SWEEP_TIME,
    )


def post_delete_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURVIVING version catalog the sweep pins against: the raw
    catalog with the versioned-removal batch applied — every consumer
    of 'what still holds data' (the pin check here, the drained-
    backend removal sweep in the facade) must read THIS relation, not
    the pre-delete catalog."""
    from aruna_spark.queries.s3_lifecycle import apply_deletes

    versions = load_object_versions(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 2
    )
    deletes = docs.select(
        F.lit("corpus").alias("bucket"),
        F.concat(
            F.lit("data/"),
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".txt"),
        ).alias("key"),
        F.lit("v0").alias("want_version_id"),
    )
    return apply_deletes(versions, deletes)
