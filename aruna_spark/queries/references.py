"""By-reference blob versions + the cached-metadata refresh sweep.

Reference surface:

- ``core/src/structs/blob.rs:837-841`` — ``BlobVersionState::Reference
  { source, cached_metadata, last_refresh }``: an external
  staging-backed object that never materializes; ``blob_hash()`` /
  ``blob_backend()`` are None (blob.rs:846-861).
- ``operations/src/s3/head_object.rs:276-290`` /
  ``get_object_attributes.rs:244-253`` — reads on a reference head
  surface the CACHED SourceMetadata (content_length, content_type,
  etag — source_access.rs:24-30) plus ``last_refresh``; location and
  version_created_at stay None.
- ``operations/src/s3/refresh_reference_metadata.rs:345-372`` — the
  refresh sweep re-heads the source and rewrites the cache iff
  ``refreshed_at > last_refresh`` (monotonic stale guard); missing or
  non-Reference versions are skipped.

Spark mapping: reference rows are an extra relation in the object
catalog (``sources/objects.py``) that projects into the shared
VERSION_COLS shape, so GetObject/HeadObject resolution, conditionals,
and listings run UNCHANGED over materialized + reference rows; the
sweep is one equi-join against the staging-connector listing plus CASE
algebra — no window, no catalog shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    REFERENCE_MOD,
    REFERENCE_RESIDUE,
    REFERENCES_ORACLE_SQL,
    SOURCE_TRUTH_ORACLE_SQL,
    apply_metadata_refresh,
    load_reference_versions,
    load_source_truth,
    reference_as_versions,
)

# ======================================================= s3_reference_head
# Head/Get over reference heads through the SAME resolver materialized
# objects use: the request batch exercises plain reads, if-match
# failures (412), if-none-match hits (304), and misses (404); hits carry
# the cached metadata + source binding, exactly head_object.rs:276-290.


def _head_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % REFERENCE_MOD == REFERENCE_RESIDUE
    )
    key = F.concat(
        F.lit("ext/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".bin"),
    )
    cached_etag = F.md5(
        F.concat(F.lit("src:"), key, F.lit(":"), F.col("n_chars").cast("string"))
    )
    m = F.col("doc_id") % 3
    hits = docs.select(
        F.lit("staging").alias("bucket"),
        key.alias("key"),
        F.lit(None).cast("string").alias("want_version_id"),
        F.when(m == 1, F.lit("wrong")).alias("if_match"),
        F.when(m == 2, cached_etag).alias("if_none_match"),
        F.lit(None).cast("long").alias("range_start"),
        F.lit(None).cast("long").alias("range_end"),
        F.lit(None).cast("long").alias("range_suffix"),
    )
    misses = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.lit("staging").alias("bucket"),
        F.concat(key, F.lit(".nope")).alias("key"),
        F.lit(None).cast("string").alias("want_version_id"),
        F.lit(None).cast("string").alias("if_match"),
        F.lit(None).cast("string").alias("if_none_match"),
        F.lit(None).cast("long").alias("range_start"),
        F.lit(None).cast("long").alias("range_end"),
        F.lit(None).cast("long").alias("range_suffix"),
    )
    return hits.unionByName(misses)


@register(
    "s3_reference_head",
    oracle=f"""
    WITH refs AS ({REFERENCES_ORACLE_SQL}),
    reqs AS (
      SELECT 'staging' AS bucket,
             'ext/' || source || '/' || lang || '/doc-' || doc_id || '.bin'
               AS key,
             CASE WHEN doc_id % 3 = 1 THEN 'wrong' END AS if_match,
             CASE WHEN doc_id % 3 = 2 THEN
               md5('src:ext/' || source || '/' || lang || '/doc-' || doc_id
                   || '.bin:' || n_chars) END AS if_none_match
      FROM documents WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE}
      UNION ALL
      SELECT 'staging',
             'ext/' || source || '/' || lang || '/doc-' || doc_id
               || '.bin.nope',
             NULL, NULL
      FROM documents
      WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE} AND doc_id % 4 = 0
    ),
    resolved AS (
      SELECT q.bucket, q.key,
             CASE WHEN r.key IS NULL THEN 404
                  WHEN q.if_match IS NOT NULL
                       AND q.if_match <> r.cached_etag THEN 412
                  WHEN q.if_none_match IS NOT NULL
                       AND q.if_none_match = r.cached_etag THEN 304
                  ELSE 200 END AS status,
             r.version_id, r.cached_length, r.cached_etag,
             r.cached_content_type, r.source_kind, r.source_path,
             r.connector_id, r.last_refresh
      FROM reqs q LEFT JOIN refs r ON r.bucket = q.bucket AND r.key = q.key
    )
    SELECT bucket, key, status,
           CASE WHEN status = 200 THEN version_id END AS resolved_version_id,
           CAST(CASE WHEN status = 200 THEN cached_length END AS BIGINT)
             AS content_length,
           CASE WHEN status = 200 THEN cached_etag END AS etag,
           CASE WHEN status = 200 THEN cached_content_type END
             AS content_type,
           CASE WHEN status <> 404 THEN source_kind END AS source_kind,
           CASE WHEN status <> 404 THEN source_path END AS source_path,
           CASE WHEN status <> 404 THEN connector_id END AS connector_id,
           CAST(CASE WHEN status <> 404 THEN last_refresh END AS BIGINT)
             AS last_refresh,
           status <> 404 AS referenced
    FROM resolved
    """,
)
def s3_reference_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeadObject over by-reference heads: the shared GetObject resolver
    runs on the reference rows projected into VERSION_COLS (size/etag
    from the cache), then the source binding + cache columns join back
    on — hits surface cached metadata with ``referenced`` true, misses
    404 with no binding. Conditionals evaluate against the CACHED etag
    (the reference heads the source only for ArunaNative bindings,
    head_object.rs:285-289; external kinds answer from cache)."""
    from aruna_spark.queries.s3_suite import resolve_requests

    refs = load_reference_versions(spark, sf_dir)
    reqs = _head_requests(spark, sf_dir)
    resolved = resolve_requests(reference_as_versions(refs), reqs)
    extras = refs.select(
        "bucket",
        "key",
        "source_kind",
        "source_path",
        "connector_id",
        F.col("cached_content_type").alias("__ct"),
        F.col("last_refresh").alias("__lr"),
    )
    ok = F.col("status") == 200
    found = F.col("status") != 404
    return resolved.join(extras, ["bucket", "key"], "left").select(
        "bucket",
        "key",
        "status",
        F.when(ok, F.col("resolved_version_id")).alias("resolved_version_id"),
        F.when(ok, F.col("content_length")).cast("long").alias(
            "content_length"
        ),
        F.when(ok, F.col("etag")).alias("etag"),
        F.when(ok, F.col("__ct")).alias("content_type"),
        F.when(found, F.col("source_kind")).alias("source_kind"),
        F.when(found, F.col("source_path")).alias("source_path"),
        F.when(found, F.col("connector_id")).alias("connector_id"),
        F.when(found, F.col("__lr")).cast("long").alias("last_refresh"),
        found.alias("referenced"),
    )


# ======================================================= staging_refresh_sweep
# The batch refresh job: join the due references against the staging
# connector's CURRENT listing (the truth), stamp each refresh with its
# queue tick, and apply under the monotonic stale guard — rows whose
# tick is not strictly newer than last_refresh keep their stale cache
# (refresh_reference_metadata.rs:345-350: ``refreshed_at <=
# last_refresh`` → None, no write).

_D_SWEEP_TICK = "1000 + doc_id % 9"


@register(
    "staging_refresh_sweep",
    oracle=f"""
    SELECT 'staging' AS bucket,
           'ext/' || source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS key,
           CASE WHEN doc_id % 2 = 0 THEN 's3' ELSE 'http' END AS source_kind,
           source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS source_path,
           CAST(CASE WHEN doc_id % 9 > doc_id % 5
                     THEN n_chars + doc_id % 7 ELSE n_chars END AS BIGINT)
             AS cached_length,
           md5('src:ext/' || source || '/' || lang || '/doc-' || doc_id
               || '.bin:' ||
               CASE WHEN doc_id % 9 > doc_id % 5
                    THEN n_chars + doc_id % 7 ELSE n_chars END)
             AS cached_etag,
           CAST(CASE WHEN doc_id % 9 > doc_id % 5
                     THEN {_D_SWEEP_TICK} ELSE 1000 + doc_id % 5 END
                AS BIGINT) AS last_refresh,
           doc_id % 9 > doc_id % 5 AS refreshed
    FROM documents
    WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE}
    """,
)
def staging_refresh_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sweep of the reference-metadata refresh queue: every due
    reference head joins the staging connector listing on its source
    binding, the freshly-headed metadata lands iff the queue tick beats
    ``last_refresh``, and the guard's losers keep their stale cache
    bit-for-bit. The closed-form oracle re-derives the guard and both
    outcomes independently of the join."""
    refs = load_reference_versions(spark, sf_dir)
    truth = load_source_truth(spark, sf_dir)
    # queue tick: each job was enqueued at a per-key tick — derived from
    # the key so the sweep stays deterministic
    tick = (
        F.lit(1000)
        + F.regexp_extract(F.col("key"), r"doc-(\d+)\.bin$", 1).cast("long")
        % 9
    )
    refreshes = (
        refs.select("bucket", "key", "source_kind", "source_path")
        .join(truth, ["source_kind", "source_path"])
        .select(
            "bucket",
            "key",
            tick.alias("refreshed_at"),
            F.col("truth_length").alias("new_length"),
            F.lit("text/plain").alias("new_content_type"),
            F.col("truth_etag").alias("new_etag"),
        )
    )
    swept = apply_metadata_refresh(refs, refreshes)
    return swept.select(
        "bucket",
        "key",
        "source_kind",
        "source_path",
        "cached_length",
        "cached_etag",
        "last_refresh",
        "refreshed",
    )


# ================================================= listing_v2_referenced
# ListObjectsV2 over the staging bucket: reference heads are LIVE,
# LISTABLE objects (list_objects_v2.rs:511-529) — each entry surfaces
# referenced=true, the connector kind + source path, the cached size,
# and last_refresh, with location None. The delimiter rollup groups the
# external tree exactly like materialized keys.

# the refresh-queue cadence constants, pinned for parity
# (refresh_reference_metadata.rs:30-31)
REFERENCE_METADATA_REFRESH_POLL_AFTER_S = 5
REFERENCE_METADATA_REFRESH_RETRY_AFTER_S = 1


@register(
    "listing_v2_referenced",
    oracle=f"""
    WITH refs AS ({REFERENCES_ORACLE_SQL})
    SELECT key AS entry, TRUE AS referenced, source_kind, source_path,
           CAST(cached_length AS BIGINT) AS size,
           CAST(last_refresh AS BIGINT) AS last_refresh
    FROM refs
    WHERE starts_with(key, 'ext/') AND key > 'ext/src1/'
      AND NOT starts_with(key, 'ext/src1/')
    ORDER BY key LIMIT 20
    """,
)
def listing_v2_referenced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A flat ListObjectsV2 page over the staging bucket's reference
    heads (prefix 'ext/', keyset after the src1 subtree): every entry
    is an external object listed from CACHE — referenced flag, source
    binding, cached size, last_refresh; no blob, no location
    (list_objects_v2.rs:511-529)."""
    refs = load_reference_versions(spark, sf_dir).filter(
        F.col("is_latest")
    )
    page = (
        refs.filter(
            F.col("key").startswith("ext/")
            & (F.col("key") > "ext/src1/")
            & ~F.col("key").startswith("ext/src1/")
        )
        .orderBy("key")
        .limit(20)
    )
    return page.select(
        F.col("key").alias("entry"),
        F.lit(True).alias("referenced"),
        "source_kind",
        "source_path",
        F.col("cached_length").cast("long").alias("size"),
        F.col("last_refresh").cast("long").alias("last_refresh"),
    )


# ======================================================= staging_refresh_drain
# The refresh queue's DRAIN TICK (VERDICT r9 Next #4): where
# staging_refresh_sweep models the metadata refresh SEMANTICS (the
# monotonic stale guard over the whole due set), this models the
# per-tick QUEUE DISCIPLINE (refresh_reference_metadata.rs:490-680):
#
# - the scan walks the job keyspace in KEY order (the canonical job
#   key serializes (bucket, key, version_id, refreshed_at) —
#   rs:101-114), pages of REFRESH_SCAN_PAGE_SIZE 512, collecting DUE
#   jobs until REFRESH_BATCH_SIZE 64 — the page is the first 64 due
#   jobs in KEY order (NOT due order), and ``has_more_due`` is true
#   the moment the batch fills (rs:611-620: the scan returns early at
#   jobs.len() >= limit, so the flag means "due count reached the
#   batch", not "strictly more remain");
# - a failed refresh reschedules with attempts+1 due at now + queue
#   backoff, and the retry instant FEEDS the re-arm envelope
#   (rs:521-528: min_due_at(next_due_at_ms, retry_due_at));
# - ``next_due_after`` is None when the batch filled (the drain kicks
#   itself), else min(earliest future job, earliest minted retry) -
#   now (rs:552-557).
#
# The canonical-key repair + duplicate-preference passes
# (rs:601-660) are storage-hygiene over malformed postcard rows —
# excluded with the storage plane.

REFRESH_SCAN_PAGE_SIZE = 512  # refresh_reference_metadata.rs:27
REFRESH_BATCH_SIZE = 64  # refresh_reference_metadata.rs:28
REFRESH_NOW_MS = 5_000


def load_refresh_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refresh-job keyspace at the tick: one job per reference
    head; future lane doc_id%9==2, attempts doc_id%3 (9, 3, 13 all
    coprime to the %11 row selection)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % REFERENCE_MOD == REFERENCE_RESIDUE
    )
    d = F.col("doc_id")
    return docs.select(
        F.lit("staging").alias("bucket"),
        F.concat(
            F.lit("ext/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/doc-"), d.cast("string"), F.lit(".bin"),
        ).alias("key"),
        d.alias("doc_id"),
        F.when(d % 9 == 2, d + 9_000)
        .otherwise(F.lit(1_000) + (d % 7) * 100)
        .cast("long")
        .alias("due_at_ms"),
        (d % 3).cast("int").alias("attempts"),
    )


_REFRESH_JOBS_SQL = f"""
    refresh_jobs AS (
      SELECT 'staging' AS bucket,
             'ext/' || source || '/' || lang || '/doc-' || doc_id
               || '.bin' AS key,
             doc_id,
             CAST(CASE WHEN doc_id % 9 = 2 THEN doc_id + 9000
                  ELSE 1000 + (doc_id % 7) * 100 END AS BIGINT)
               AS due_at_ms,
             CAST(doc_id % 3 AS INT) AS attempts
      FROM documents
      WHERE doc_id % {REFERENCE_MOD} = {REFERENCE_RESIDUE}
    )
"""


def refresh_drain_tick(
    jobs: DataFrame, now_ms: int, fail: F.Column | None = None
) -> DataFrame:
    """One bounded refresh-drain batch — see the section comment for
    the reference semantics. The page is a TakeOrderedAndProject head
    on the KEY order; the envelope's has_more probes exactly the
    batch size (the reference's early-return flag), and failed rows'
    retry instants fold into the re-arm interval."""
    from aruna_spark.ops.queue_drain import backoff_ms, due_page

    page = due_page(
        jobs, now_ms, REFRESH_BATCH_SIZE, [F.col("bucket"), F.col("key")]
    )
    failing = fail if fail is not None else F.lit(False)
    bumped = F.col("attempts") + 1
    retry_due = F.lit(now_ms) + backoff_ms(bumped)
    staged = page.select(
        "bucket",
        "key",
        "due_at_ms",
        "attempts",
        F.when(failing, "rescheduled").otherwise("refreshed").alias(
            "result"
        ),
        F.when(failing, bumped).cast("int").alias("next_attempts"),
        F.when(failing, retry_due).cast("long").alias("next_due_at_ms"),
    )
    # has_more_due = the scan filled the batch (rs:611-620 returns
    # true at jobs.len() >= limit, even on the keyspace's last key)
    probe = (
        jobs.filter(F.col("due_at_ms") <= now_ms)
        .limit(REFRESH_BATCH_SIZE)
        .agg(
            (F.count(F.lit(1)) >= REFRESH_BATCH_SIZE).alias(
                "has_more_due"
            )
        )
    )
    future = jobs.filter(F.col("due_at_ms") > now_ms).agg(
        F.min("due_at_ms").alias("__future")
    )
    retries = staged.filter(F.col("result") == "rescheduled").agg(
        F.min("next_due_at_ms").alias("__retry")
    )
    envelope = (
        probe.crossJoin(F.broadcast(future))
        .crossJoin(F.broadcast(retries))
        .select(
            "has_more_due",
            F.when(
                ~F.col("has_more_due"),
                F.least(F.col("__future"), F.col("__retry")) - now_ms,
            )
            .cast("long")
            .alias("next_due_after_ms"),
        )
    )
    return staged.crossJoin(F.broadcast(envelope))


@register(
    "staging_refresh_drain",
    oracle=f"""
    WITH {_REFRESH_JOBS_SQL},
    due AS (
      SELECT *, row_number() OVER (ORDER BY bucket, key) AS rn
      FROM refresh_jobs WHERE due_at_ms <= {REFRESH_NOW_MS}
    ),
    page AS (SELECT * FROM due WHERE rn <= {REFRESH_BATCH_SIZE}),
    staged AS (
      SELECT bucket, key, due_at_ms, attempts,
             CASE WHEN doc_id % 13 = 3 THEN 'rescheduled'
                  ELSE 'refreshed' END AS result,
             CAST(CASE WHEN doc_id % 13 = 3 THEN attempts + 1 END AS INT)
               AS next_attempts,
             CAST(CASE WHEN doc_id % 13 = 3 THEN {REFRESH_NOW_MS}
                    + LEAST(250 * (1 << LEAST(attempts + 1, 7)), 30000)
                  END AS BIGINT) AS next_due_at_ms
      FROM page
    ),
    env AS (
      SELECT (SELECT COUNT(*) FROM (
                SELECT 1 FROM refresh_jobs
                WHERE due_at_ms <= {REFRESH_NOW_MS}
                LIMIT {REFRESH_BATCH_SIZE}))
               >= {REFRESH_BATCH_SIZE} AS has_more_due,
             LEAST(
               (SELECT MIN(due_at_ms) FROM refresh_jobs
                WHERE due_at_ms > {REFRESH_NOW_MS}),
               (SELECT MIN(next_due_at_ms) FROM staged
                WHERE result = 'rescheduled')
             ) AS next_due
    )
    SELECT s.bucket, s.key, s.due_at_ms, s.attempts, s.result,
           s.next_attempts, s.next_due_at_ms, e.has_more_due,
           CAST(CASE WHEN e.has_more_due THEN NULL
                ELSE e.next_due - {REFRESH_NOW_MS} END AS BIGINT)
             AS next_due_after_ms
    FROM staged s CROSS JOIN env e
    """,
)
def staging_refresh_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One drain tick over the fixture refresh queue; the refresh
    fails for doc_id % 13 == 3 (coprime to the %11 row selection) —
    those jobs reschedule on the backoff ladder and their retry
    instants feed the re-arm envelope."""
    jobs = load_refresh_jobs(spark, sf_dir)
    return refresh_drain_tick(
        jobs, REFRESH_NOW_MS, fail=F.col("doc_id") % 13 == 3
    ).drop("doc_id")
