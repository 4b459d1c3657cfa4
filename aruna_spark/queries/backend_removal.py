"""Drained-backend removal sweep — the group-storage-backend
lifecycle's final step (``operations/src/group_backends/remove.rs``).

Reference surface:

- rs:29-68 (``remove_drained_backends``) — collect DISABLED backends
  (rs:91-118: full keyspace scan keeping ``record.disabled``), drop
  the ones the blob runtime still holds open (``idle_backends`` — an
  in-process hold-generation claim, concurrency not relational), then
  remove every disabled backend that no data still names; the rest
  stay for a later sweep.
- rs:118-200 (``backends_holding_data``) — a backend is HELD when any
  of three planes still names it: a stored blob-location row, a
  queued cleanup (reclaim) row, or an open multipart upload ("parts
  have no location row, and they are deleted in the same transaction
  as the upload record, so that record covers them" — the upload
  record alone pins the backend).

Spark mapping: three DISTINCT-backend projections over the already
modeled planes (the blob-locations keyspace from
:mod:`~aruna_spark.queries.blob_holders`, the reclaim candidate queue
from :mod:`~aruna_spark.queries.reclaim`, the in-progress uploads
from :mod:`~aruna_spark.queries.s3_multipart` — each upload record
carries its backend ref, modeled as ``backend-(doc_id % 5)``), left
semi-flags onto the disabled directory. All three holding sets are
metadata-or-corpus-linear scans with distinct-pushdown; the
directory itself is config-sized.

Fixture directory: group backends ``backend-0..7``; disabled =
{1, 2, 4, 5, 6}. Locations/cleanup name backends 0-2 (the repo-wide
``backend-(n_chars % 3)`` convention), multipart names 0-4 — so
backend-1/2 stay held by locations(+cleanup+multipart), backend-4 is
held by its upload record ALONE (the rs:118-121 comment's lane), and
backend-5/6 remove. The ``cold`` location backend is a Node ref, not
a group backend, and never enters the directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.queries.blob_holders import _LOCATIONS_SQL, load_locations
from aruna_spark.queries.s3_multipart import UPLOAD_RESIDUES, load_uploads

DISABLED_BACKENDS = (1, 2, 4, 5, 6)


def load_backend_directory(spark: SparkSession) -> DataFrame:
    rows = [
        (f"backend-{i}", f"grp-{i % 3}", i in DISABLED_BACKENDS)
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows, "backend string, group_id string, disabled boolean"
    )


def _upload_backends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each open upload record's backend ref (the record alone pins
    the backend — remove.rs:118-121)."""
    return load_uploads(spark, sf_dir).select(
        F.concat(
            F.lit("backend-"),
            (F.regexp_extract("upload_id", r"mpu-(\d+)", 1).cast("long") % 5)
            .cast("string"),
        ).alias("backend")
    )


@register(
    "group_backends_removal_sweep",
    oracle=f"""
    WITH {_LOCATIONS_SQL.strip()},
    directory AS (
      SELECT 'backend-' || i AS backend, 'grp-' || (i % 3) AS group_id,
             i IN (1, 2, 4, 5, 6) AS disabled
      FROM range(8) t(i)
    ),
    loc_held AS (SELECT DISTINCT backend FROM blob_locations),
    cleanup_held AS (
      SELECT DISTINCT 'backend-' || (n_chars % 3) AS backend
      FROM documents WHERE doc_id % 17 = 2
    ),
    upload_held AS (
      SELECT DISTINCT 'backend-' || (doc_id % 5) AS backend
      FROM documents WHERE doc_id % 19 IN {UPLOAD_RESIDUES}
    )
    SELECT d.backend, d.group_id,
           l.backend IS NOT NULL AS held_locations,
           c.backend IS NOT NULL AS held_cleanup,
           u.backend IS NOT NULL AS held_multipart,
           CASE WHEN l.backend IS NULL AND c.backend IS NULL
                     AND u.backend IS NULL
                THEN 'removed' ELSE 'kept_holding' END AS verdict
    FROM directory d
    LEFT JOIN loc_held l USING (backend)
    LEFT JOIN cleanup_held c USING (backend)
    LEFT JOIN upload_held u USING (backend)
    WHERE d.disabled
    """,
)
def group_backends_removal_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One removal sweep: every DISABLED backend with its per-plane
    hold flags and the remove/keep verdict (remove.rs:29-68 +
    118-200). Enabled backends never enter the sweep; the
    hold-generation claim (idle_backends) is in-process concurrency
    and is documented, not modeled."""
    directory = load_backend_directory(spark).filter("disabled")
    loc = (
        load_locations(spark, sf_dir)
        .select("backend")
        .distinct()
        .withColumn("held_locations", F.lit(True))
    )
    cleanup = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 2)
        .select(
            F.concat(
                F.lit("backend-"), (F.col("n_chars") % 3).cast("string")
            ).alias("backend")
        )
        .distinct()
        .withColumn("held_cleanup", F.lit(True))
    )
    uploads = (
        _upload_backends(spark, sf_dir)
        .distinct()
        .withColumn("held_multipart", F.lit(True))
    )
    out = (
        directory.join(F.broadcast(loc), "backend", "left")
        .join(F.broadcast(cleanup), "backend", "left")
        .join(F.broadcast(uploads), "backend", "left")
    )
    held = (
        F.coalesce("held_locations", F.lit(False))
        | F.coalesce("held_cleanup", F.lit(False))
        | F.coalesce("held_multipart", F.lit(False))
    )
    return out.select(
        "backend",
        "group_id",
        F.coalesce("held_locations", F.lit(False)).alias("held_locations"),
        F.coalesce("held_cleanup", F.lit(False)).alias("held_cleanup"),
        F.coalesce("held_multipart", F.lit(False)).alias(
            "held_multipart"
        ),
        F.when(held, "kept_holding").otherwise("removed").alias("verdict"),
    )
