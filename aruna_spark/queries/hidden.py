"""Hidden-blob sweep: job-artifact garbage collection.

Reference: ``operations/src/blob/hidden.rs`` — hidden blobs are
job-namespaced staging artifacts (RO-Crate export checkpoints, upload
inputs) outside the content-addressed catalog. A periodic sweep
(1 h cadence, 30 s retry — rs:25-26) runs two passes:

1. **Upload sweep** (rs:161-205): every ``RoCrateUploadRecord`` is
   live iff it is claimed by a still-active job, or unclaimed and not
   yet expired (``upload_is_live``, rs:200-205). Live uploads' blob
   keys join the referenced set; dead uploads delete both the blob
   and the record.
2. **Orphan pass** (rs:207-223): a hidden entry is orphaned iff it is
   not referenced (checkpoint refs of active RO-Crate jobs +
   ``ExportRoCrate`` result artifacts + live uploads — rs:87-134), its
   key namespace is not an active RO-Crate job id (rs:216-220), and it
   is older than the 1 h orphan grace (rs:27, rs:222). Entries the
   upload sweep already deleted are listed after that pass and never
   reach the orphan check (rs:67-68).

Spark mapping: the job and upload relations are sweep-page-bounded
dimensions (512/page, rs:24); the hidden listing is the corpus-scale
side. Each reference set becomes a distinct key relation; the verdict
is one CASE ladder over left-join flags — a single pass over the
hidden scan, no window, no shuffle of the big side beyond the key
joins (AQE broadcasts the bounded dimensions).

Modeled fixture: jobs reuse the ``queries/jobs.py`` queue (orders
``k % 9 == 2``); ``k % 7 < 3`` marks the RO-Crate payload; active
RO-Crate jobs with even ``k`` hold a checkpoint ref on their
``input_01``; succeeded RO-Crate jobs hold a result artifact ref on
their ``artifact_01``. Every job also owns an upload (claimed by
itself when ``k % 4 == 0``, by a vanished job when ``k % 4 == 1``,
unclaimed otherwise), and orders ``k % 9 == 7`` mint pure-orphan
namespaces no job owns. NOW = 30_000, grace = 1_000 ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.queries.jobs import _JOBS_SQL, load_jobs

NOW_MS = 30_000
ORPHAN_GRACE_MS = 1_000

# reference cadence constants (hidden.rs:24-27), pinned by tests
HIDDEN_SWEEP_AFTER_S = 60 * 60
HIDDEN_SWEEP_RETRY_S = 30
ORPHAN_GRACE_S = 60 * 60
SWEEP_PAGE_SIZE = 512


def _jobs_annotated(
    spark: SparkSession, sf_dir: str, keys: DataFrame | None = None
) -> DataFrame:
    """The job queue with the RO-Crate dimensions this sweep consults.

    With ``keys`` (a ``(k0 BIGINT)`` relation of the sweep's order
    keys), the frame is a pure projection of it — the registered query
    materializes ONE narrow orders scan and derives every lane from it
    (r15: the sweep previously re-scanned orders ~11x)."""
    if keys is not None:
        k = F.col("k0")
        state = (
            F.when(k % 5 == 0, "queued")
            .when(k % 5 == 1, "running")
            .when(k % 5 == 2, "succeeded")
            .when(k % 5 == 3, "failed")
            .otherwise("cancelled")
        )
        return keys.filter(k % 9 == 2).select(
            F.concat(F.lit("job-"), k.cast("string")).alias("job_id"),
            state.alias("state"),
            k.cast("long").alias("k"),
            (~(k % 5).isin(2, 3, 4)).alias("active"),
            (k % 7 < 3).alias("rocrate"),
        )
    k = F.col("created_at_ms")
    return load_jobs(spark, sf_dir).select(
        "job_id",
        "state",
        k.alias("k"),
        (~F.col("state").isin("succeeded", "failed", "cancelled")).alias(
            "active"
        ),
        (k % 7 < 3).alias("rocrate"),
    )


def load_uploads_hidden(
    spark: SparkSession, sf_dir: str, jobs: DataFrame | None = None
) -> DataFrame:
    """RO-Crate upload records (rs:277-307): one per job, three claim
    shapes — self-claimed, claimed by a vanished job, unclaimed."""
    j = jobs if jobs is not None else _jobs_annotated(spark, sf_dir)
    k = F.col("k")
    return j.select(
        F.concat(F.lit("upl-"), k.cast("string")).alias("upload_id"),
        F.concat(
            F.lit("_jobs/upl-"), k.cast("string"), F.lit("/input_01")
        ).alias("key"),
        ((k * 11) % 60_000).cast("long").alias("expires_at_ms"),
        # k % 9 == 2 pins k % 3 == 2, so the claim discriminator must
        # be coprime to 9 (same trap jobs.py documents for its class).
        F.when(k % 4 == 0, F.col("job_id"))
        .when(
            k % 4 == 1,
            F.concat(F.lit("job-missing-"), k.cast("string")),
        )
        .alias("claimed_by"),
    )


def load_hidden_entries(
    spark: SparkSession,
    sf_dir: str,
    jobs: DataFrame | None = None,
    uploads_rel: DataFrame | None = None,
    orphan_keys: DataFrame | None = None,
) -> DataFrame:
    """The ``ListHidden`` result: upload inputs, per-job artifacts,
    even-job checkpoint inputs, and jobless orphan namespaces."""
    j = jobs if jobs is not None else _jobs_annotated(spark, sf_dir)
    k = F.col("k")
    if uploads_rel is None:
        uploads_rel = load_uploads_hidden(spark, sf_dir)
    uploads = uploads_rel.select(
        "key",
        (
            (F.regexp_extract("key", r"upl-(\d+)", 1).cast("long") * 977)
            % 40_000
        ).alias("modified_at_ms"),
    )
    artifacts = j.select(
        F.concat(F.lit("_jobs/"), F.col("job_id"), F.lit("/artifact_01")).alias(
            "key"
        ),
        ((k * 977) % 40_000).cast("long").alias("modified_at_ms"),
    )
    inputs = j.filter(k % 2 == 0).select(
        F.concat(F.lit("_jobs/"), F.col("job_id"), F.lit("/input_01")).alias(
            "key"
        ),
        ((k * 977 + 7) % 40_000).cast("long").alias("modified_at_ms"),
    )
    if orphan_keys is not None:
        orph_k = F.col("k0")
        orphan_src = orphan_keys.filter(orph_k % 9 == 7)
    else:
        orph_k = F.col("o_orderkey")
        orphan_src = load_table(spark, sf_dir, "orders").filter(
            orph_k % 9 == 7
        )
    orphans = orphan_src.select(
        F.concat(
            F.lit("_jobs/orph-"), orph_k.cast("string"), F.lit("/tmp_01")
        ).alias("key"),
        ((orph_k * 977) % 40_000).cast("long").alias("modified_at_ms"),
    )
    return uploads.unionByName(artifacts).unionByName(inputs).unionByName(
        orphans
    )


def hidden_sweep(
    hidden: DataFrame,
    uploads: DataFrame,
    jobs: DataFrame,
    now_ms: int,
    grace_ms: int,
) -> DataFrame:
    """One sweep → per-entry verdict.

    ``jobs`` carries (job_id, active, rocrate, k); ``uploads``
    (upload_id, key, expires_at_ms, claimed_by). Verdicts:
    ``swept_upload`` (dead upload deleted the blob before the orphan
    pass), ``referenced`` (checkpoint / result-artifact / live-upload
    ref), ``active_namespace`` (rs:216-220 — the namespace decodes to
    an active RO-Crate job), ``orphaned`` (past grace), ``young``.
    """
    active_ids = jobs.filter("active").select("job_id")
    upload_live = uploads.join(
        active_ids.withColumnRenamed("job_id", "claimed_by").withColumn(
            "__claim_active", F.lit(True)
        ),
        "claimed_by",
        "left",
    ).select(
        "key",
        F.when(F.col("claimed_by").isNotNull(), F.col("__claim_active").isNotNull())
        .otherwise(F.col("expires_at_ms") > F.lit(now_ms))
        .alias("live"),
    )
    # checkpoint refs: active RO-Crate jobs with even k hold input_01
    checkpoint_refs = jobs.filter(
        F.col("active") & F.col("rocrate") & (F.col("k") % 2 == 0)
    ).select(
        F.concat(F.lit("_jobs/"), F.col("job_id"), F.lit("/input_01")).alias(
            "key"
        )
    )
    # result artifacts: succeeded RO-Crate jobs (ExportRoCrate result)
    artifact_refs = jobs.filter(
        F.col("rocrate") & (F.col("state") == "succeeded")
    ).select(
        F.concat(F.lit("_jobs/"), F.col("job_id"), F.lit("/artifact_01")).alias(
            "key"
        )
    )
    referenced = (
        upload_live.filter("live")
        .select("key")
        .unionByName(checkpoint_refs)
        .unionByName(artifact_refs)
        .distinct()
        .withColumn("__ref", F.lit(True))
    )
    swept = (
        upload_live.filter(~F.col("live"))
        .select("key")
        .withColumn("__swept", F.lit(True))
    )
    active_rocrate_ns = (
        jobs.filter(F.col("active") & F.col("rocrate"))
        .select(F.col("job_id").alias("namespace"))
        .withColumn("__active_ns", F.lit(True))
    )
    flagged = (
        hidden.withColumn("namespace", F.split_part(F.col("key"), F.lit("/"), F.lit(2)))
        .join(swept, "key", "left")
        .join(referenced, "key", "left")
        .join(active_rocrate_ns, "namespace", "left")
    )
    verdict = (
        F.when(F.col("__swept").isNotNull(), F.lit("swept_upload"))
        .when(F.col("__ref").isNotNull(), F.lit("referenced"))
        .when(F.col("__active_ns").isNotNull(), F.lit("active_namespace"))
        .when(
            F.col("modified_at_ms") <= F.lit(now_ms - grace_ms),
            F.lit("orphaned"),
        )
        .otherwise(F.lit("young"))
    )
    return flagged.select(
        "key", "namespace", "modified_at_ms", verdict.alias("verdict")
    )


_FIXTURE_SQL = f"""
    jobs AS (
      SELECT job_id, state, created_at_ms AS k,
             state NOT IN ('succeeded', 'failed', 'cancelled') AS active,
             created_at_ms % 7 < 3 AS rocrate
      FROM ({_JOBS_SQL})
    ),
    uploads AS (
      SELECT 'upl-' || k AS upload_id,
             '_jobs/upl-' || k || '/input_01' AS key,
             CAST((k * 11) % 60000 AS BIGINT) AS expires_at_ms,
             CASE WHEN k % 4 = 0 THEN job_id
                  WHEN k % 4 = 1 THEN 'job-missing-' || k END AS claimed_by
      FROM jobs
    ),
    hidden AS (
      SELECT key,
             CAST((CAST(regexp_extract(key, 'upl-(\\d+)', 1) AS BIGINT) * 977)
                  % 40000 AS BIGINT) AS modified_at_ms
      FROM uploads
      UNION ALL
      SELECT '_jobs/' || job_id || '/artifact_01',
             CAST((k * 977) % 40000 AS BIGINT) FROM jobs
      UNION ALL
      SELECT '_jobs/' || job_id || '/input_01',
             CAST((k * 977 + 7) % 40000 AS BIGINT) FROM jobs WHERE k % 2 = 0
      UNION ALL
      SELECT '_jobs/orph-' || o_orderkey || '/tmp_01',
             CAST((o_orderkey * 977) % 40000 AS BIGINT)
      FROM orders WHERE o_orderkey % 9 = 7
    ),
    upload_live AS (
      SELECT u.key,
             CASE WHEN u.claimed_by IS NOT NULL
                  THEN EXISTS (SELECT 1 FROM jobs j
                               WHERE j.job_id = u.claimed_by AND j.active)
                  ELSE u.expires_at_ms > {NOW_MS} END AS live
      FROM uploads u
    ),
    referenced AS (
      SELECT key FROM upload_live WHERE live
      UNION
      SELECT '_jobs/' || job_id || '/input_01' FROM jobs
      WHERE active AND rocrate AND k % 2 = 0
      UNION
      SELECT '_jobs/' || job_id || '/artifact_01' FROM jobs
      WHERE rocrate AND state = 'succeeded'
    )
"""

_HIDDEN_ORACLE = f"""
    WITH {_FIXTURE_SQL}
    SELECT h.key,
           split_part(h.key, '/', 2) AS namespace,
           h.modified_at_ms,
           CASE
             WHEN EXISTS (SELECT 1 FROM upload_live ul
                          WHERE ul.key = h.key AND NOT ul.live)
               THEN 'swept_upload'
             WHEN EXISTS (SELECT 1 FROM referenced r WHERE r.key = h.key)
               THEN 'referenced'
             WHEN EXISTS (SELECT 1 FROM jobs j
                          WHERE j.job_id = split_part(h.key, '/', 2)
                            AND j.active AND j.rocrate)
               THEN 'active_namespace'
             WHEN h.modified_at_ms <= {NOW_MS - ORPHAN_GRACE_MS}
               THEN 'orphaned'
             ELSE 'young'
           END AS verdict
    FROM hidden h
"""


@register("blobs_hidden_sweep", oracle=_HIDDEN_ORACLE)
def blobs_hidden_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden-blob sweep over the modeled job/upload/artifact
    planes: dead uploads sweep first, live references and active
    RO-Crate namespaces protect, and only unreferenced entries past
    the orphan grace delete. The oracle re-derives every set through
    EXISTS subqueries instead of the Spark join flags.

    Execution shape (r15): ONE narrow orders scan (o_orderkey, both
    sweep residues) materializes per call; the job, upload, hidden and
    reference relations are projections of it, so the sweep's joins
    never re-touch the corpus (was ~11 orders scans)."""
    k = F.col("o_orderkey")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter((k % 9 == 2) | (k % 9 == 7))
        .select(k.cast("long").alias("k0"))
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    jobs = _jobs_annotated(spark, sf_dir, keys=keys)
    uploads = load_uploads_hidden(spark, sf_dir, jobs=jobs)
    hidden = load_hidden_entries(
        spark, sf_dir, jobs=jobs, uploads_rel=uploads, orphan_keys=keys
    )
    return hidden_sweep(hidden, uploads, jobs, NOW_MS, ORPHAN_GRACE_MS)
