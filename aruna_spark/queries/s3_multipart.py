"""S3 multipart-upload lifecycle BEFORE completion: create /
upload-part / list-parts / list-uploads / abort — the in-progress
upload plane as relations.

The reference drives this family as transactional state machines over
two keyspaces — the upload record and its part rows
(``operations/src/s3/{create_multipart_upload,upload_part,list_parts,
abort_multipart_upload,list_multipart_uploads}.rs``, flows in
``operations/tests/multipart.rs``). Re-expressed Spark-first:

- an **uploads relation** ``(bucket, key, upload_id, created_seq)`` of
  in-progress uploads — a listable first-class relation, NEVER part of
  the object listings (uploads only become objects at complete);
- a **part-event relation** ``(upload_id, part_number, seq, part_size,
  part_etag)``: re-uploading a part number REPLACES the prior part
  (``upload_part.rs:368,423-425`` — the replaced blob is deleted), so
  the *effective* parts view is last-event-wins per (upload_id,
  part_number) — one window, partitioned by the upload;
- **ListParts** pages one upload's effective parts by
  ``part_number_marker`` keyset with ``max_parts``
  (``list_parts.rs:56-57,186-198``; default max 1,000);
- **ListMultipartUploads** pages the uploads relation under a prefix
  by the (key_marker, upload_id_marker) keyset
  (``list_multipart_uploads.rs:50-63,208``) in (key, upload_id) order;
- **Abort** removes the upload record and ALL its part rows in one
  anti-join (``abort_multipart_upload.rs:230-248`` delete_upload_records),
  404 NoSuchUpload for an unknown id (``abort_multipart_upload.rs:150``).

Scale shape: parts partition by upload_id (the replacement window and
the ListParts scan never cross uploads); the keysets push down to the
sorted scan exactly like the object listings; abort batches broadcast
(request-sized) and anti-join — the untouched upload plane is never
shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

MAX_PARTS_DEFAULT = 1_000  # list_parts.rs:78 DEFAULT_MAX_PARTS
MAX_UPLOADS_DEFAULT = 1_000

# deterministic in-progress upload plane derived from ``documents``:
# doc_id % 19 ∈ {4,5,6} has an open upload on its object key
UPLOAD_RESIDUES = (4, 5, 6)


def _doc_key_col() -> F.Column:
    return F.concat(
        F.lit("data/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".txt"),
    )


def load_uploads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, key, upload_id, created_seq): the in-progress uploads."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 19).isin(*UPLOAD_RESIDUES)
    )
    return docs.select(
        F.lit("corpus").alias("bucket"),
        _doc_key_col().alias("key"),
        F.concat(F.lit("mpu-"), F.col("doc_id").cast("string")).alias(
            "upload_id"
        ),
        F.col("doc_id").alias("created_seq"),
    )


def load_part_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(upload_id, part_number, seq, part_size, part_etag): every
    UploadPart call, INCLUDING replacements — each upload has parts
    1..(doc_id % 5 + 2), and even doc_ids re-upload part 1 (seq 2)
    with different bytes, exercising the replace path."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 19).isin(*UPLOAD_RESIDUES)
    )
    base = docs.select(
        F.concat(F.lit("mpu-"), F.col("doc_id").cast("string")).alias(
            "upload_id"
        ),
        F.explode(
            F.sequence(F.lit(1), F.col("doc_id") % 5 + 2)
        ).alias("part_number"),
        F.lit(1).alias("seq"),
        "n_chars",
    )
    first = base.select(
        "upload_id",
        "part_number",
        "seq",
        (F.col("n_chars") + F.col("part_number")).alias("part_size"),
    )
    redo = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.concat(F.lit("mpu-"), F.col("doc_id").cast("string")).alias(
                "upload_id"
            ),
            F.lit(1).alias("part_number"),
            F.lit(2).alias("seq"),
            (F.col("n_chars") * 2 + 1).alias("part_size"),
        )
    )
    return first.unionByName(redo).withColumn(
        "part_etag",
        F.md5(
            F.concat_ws(
                ":",
                F.col("upload_id"),
                F.col("part_number").cast("string"),
                F.col("seq").cast("string"),
            )
        ),
    )


UPLOADS_ORACLE_SQL = """
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           'mpu-' || doc_id AS upload_id,
           doc_id AS created_seq
    FROM documents WHERE doc_id % 19 IN (4, 5, 6)
"""

PART_EVENTS_ORACLE_SQL = """
    SELECT upload_id, part_number, seq, part_size,
           md5(upload_id || ':' || part_number || ':' || seq) AS part_etag
    FROM (
      SELECT 'mpu-' || doc_id AS upload_id,
             p AS part_number, 1 AS seq,
             n_chars + p AS part_size
      FROM documents, UNNEST(range(1, doc_id % 5 + 3)) AS t(p)
      WHERE doc_id % 19 IN (4, 5, 6)
      UNION ALL
      SELECT 'mpu-' || doc_id, 1, 2, n_chars * 2 + 1
      FROM documents
      WHERE doc_id % 19 IN (4, 5, 6) AND doc_id % 2 = 0
    )
"""

# last-event-wins per (upload_id, part_number): the effective parts
EFFECTIVE_PARTS_ORACLE_SQL = f"""
    SELECT upload_id, part_number, part_size, part_etag, seq > 1 AS replaced
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY upload_id, part_number
                                ORDER BY seq DESC) AS rn
      FROM ({PART_EVENTS_ORACLE_SQL})
    ) WHERE rn = 1
"""


def effective_parts(part_events: DataFrame) -> DataFrame:
    """Last UploadPart wins per (upload_id, part_number) — the replace
    semantics of upload_part.rs:368 (prior part's blob deleted,
    ``replaced`` marks rows that overwrote one)."""
    w = Window.partitionBy("upload_id", "part_number").orderBy(
        F.desc("seq")
    )
    return (
        part_events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "upload_id",
            "part_number",
            "part_size",
            "part_etag",
            (F.col("seq") > 1).alias("replaced"),
        )
    )


def list_parts(
    parts: DataFrame,
    upload_id: str,
    part_number_marker: int | None = None,
    max_parts: int = MAX_PARTS_DEFAULT,
) -> DataFrame:
    """One ListParts page: the upload's effective parts strictly after
    the marker, part_number ascending (list_parts.rs:186-198). The
    caller's next marker is the last row's part_number."""
    df = parts.filter(F.col("upload_id") == upload_id)
    if part_number_marker is not None:
        df = df.filter(F.col("part_number") > part_number_marker)
    return (
        df.orderBy("part_number")
        .select("upload_id", "part_number", "part_size", "part_etag")
        .limit(max_parts)
    )


def list_multipart_uploads(
    uploads: DataFrame,
    prefix: str = "",
    key_marker: str | None = None,
    upload_id_marker: str | None = None,
    max_uploads: int = MAX_UPLOADS_DEFAULT,
) -> DataFrame:
    """One ListMultipartUploads page: in-progress uploads under the
    prefix in (key, upload_id) order with (key_marker,
    upload_id_marker) keyset continuation
    (list_multipart_uploads.rs:50-63,208)."""
    df = uploads.filter(F.col("key").startswith(prefix))
    if key_marker is not None:
        if upload_id_marker is not None:
            df = df.filter(
                (F.col("key") > key_marker)
                | (
                    (F.col("key") == key_marker)
                    & (F.col("upload_id") > upload_id_marker)
                )
            )
        else:
            df = df.filter(F.col("key") > key_marker)
    return (
        df.orderBy("key", "upload_id")
        .select("bucket", "key", "upload_id", "created_seq")
        .limit(max_uploads)
    )


def abort_uploads(
    uploads: DataFrame, part_events: DataFrame, aborts: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Apply an abort batch: (surviving uploads, surviving part events).
    One anti-join each — the reference deletes the upload record and
    every part row in one transaction
    (abort_multipart_upload.rs:230-248)."""
    ids = aborts.select("upload_id").distinct()
    return (
        uploads.join(F.broadcast(ids), "upload_id", "left_anti"),
        part_events.join(F.broadcast(ids), "upload_id", "left_anti"),
    )


def abort_results(uploads: DataFrame, aborts: DataFrame) -> DataFrame:
    """Per-abort envelope: 204 for a known upload, 404 NoSuchUpload
    otherwise (abort_multipart_upload.rs:150)."""
    known = uploads.select("upload_id").withColumn("__k", F.lit(True))
    return aborts.join(known, "upload_id", "left").select(
        "upload_id",
        F.when(F.col("__k").isNotNull(), F.lit(204))
        .otherwise(F.lit(404))
        .alias("status"),
    )


# -------------------------------------------------- registered queries
_LP_UPLOAD = "mpu-42"  # doc 42: parts 1..4, part 1 replaced (42 even)


@register(
    "s3_list_parts_page",
    oracle=f"""
    WITH parts AS ({EFFECTIVE_PARTS_ORACLE_SQL})
    SELECT upload_id, part_number, part_size, part_etag
    FROM parts
    WHERE upload_id = '{_LP_UPLOAD}' AND part_number > 1
    ORDER BY part_number LIMIT 2
    """,
)
def s3_list_parts_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListParts continuation page: effective parts (replacements
    collapsed, last upload wins) strictly after part_number_marker=1,
    max_parts=2."""
    parts = effective_parts(load_part_events(spark, sf_dir))
    return list_parts(parts, _LP_UPLOAD, part_number_marker=1, max_parts=2)


@register(
    "s3_upload_part_replace",
    oracle=f"""
    WITH parts AS ({EFFECTIVE_PARTS_ORACLE_SQL})
    SELECT upload_id,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(part_size) AS BIGINT) AS total_size,
           CAST(SUM(CASE WHEN replaced THEN 1 ELSE 0 END) AS BIGINT)
             AS n_replaced
    FROM parts GROUP BY upload_id
    ORDER BY upload_id LIMIT 40
    """,
)
def s3_upload_part_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-upload part summary AFTER replacement collapse: re-uploaded
    part numbers count once at their final size (upload_part.rs replace
    path), ``n_replaced`` counting parts that overwrote a prior one."""
    parts = effective_parts(load_part_events(spark, sf_dir))
    return (
        parts.groupBy("upload_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("part_size").cast("long").alias("total_size"),
            F.sum(F.col("replaced").cast("int"))
            .cast("long")
            .alias("n_replaced"),
        )
        .orderBy("upload_id")
        .limit(40)
    )


_LU_PREFIX = "data/src1/"


@register(
    "s3_list_uploads_page",
    oracle=f"""
    WITH uploads AS ({UPLOADS_ORACLE_SQL}),
    page1 AS (
      SELECT * FROM uploads WHERE starts_with(key, '{_LU_PREFIX}')
      ORDER BY key, upload_id LIMIT 5
    ),
    marker AS (
      SELECT key AS km, upload_id AS um FROM page1
      ORDER BY key DESC, upload_id DESC LIMIT 1
    )
    SELECT u.bucket, u.key, u.upload_id, u.created_seq
    FROM uploads u, marker m
    WHERE starts_with(u.key, '{_LU_PREFIX}')
      AND (u.key > m.km OR (u.key = m.km AND u.upload_id > m.um))
    ORDER BY u.key, u.upload_id LIMIT 5
    """,
)
def s3_list_uploads_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListMultipartUploads page 2: the (key_marker, upload_id_marker)
    keyset resume after a 5-row first page under the prefix — walked
    the same way the oracle derives its marker."""
    uploads = load_uploads(spark, sf_dir)
    page1 = list_multipart_uploads(
        uploads, prefix=_LU_PREFIX, max_uploads=5
    ).collect()
    km, um = (page1[-1].key, page1[-1].upload_id) if page1 else (None, None)
    return list_multipart_uploads(
        uploads,
        prefix=_LU_PREFIX,
        key_marker=km,
        upload_id_marker=um,
        max_uploads=5,
    )


# abort batch: every upload with doc_id % 38 == 4 (half the %19==4
# family), plus one unknown id for the 404 path
_D_ABORTS = """
    SELECT 'mpu-' || doc_id AS upload_id
    FROM documents WHERE doc_id % 38 = 4
    UNION ALL SELECT 'mpu-nope'
"""


def _abort_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 38 == 4
    )
    one = spark.createDataFrame([("mpu-nope",)], "upload_id string")
    return docs.select(
        F.concat(F.lit("mpu-"), F.col("doc_id").cast("string")).alias(
            "upload_id"
        )
    ).unionByName(one)


@register(
    "s3_abort_multipart",
    oracle=f"""
    WITH uploads AS ({UPLOADS_ORACLE_SQL}),
    parts AS ({PART_EVENTS_ORACLE_SQL}),
    aborts AS ({_D_ABORTS}),
    left_u AS (
      SELECT * FROM uploads
      WHERE upload_id NOT IN (SELECT upload_id FROM aborts)
    ),
    left_p AS (
      SELECT * FROM parts
      WHERE upload_id NOT IN (SELECT upload_id FROM aborts)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uploads) AS uploads_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM left_u) AS uploads_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM parts) AS parts_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM left_p) AS parts_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM aborts a
            WHERE EXISTS (SELECT 1 FROM uploads u
                          WHERE u.upload_id = a.upload_id)) AS n_aborted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM aborts a
            WHERE NOT EXISTS (SELECT 1 FROM uploads u
                              WHERE u.upload_id = a.upload_id)) AS n_missing
    """,
)
def s3_abort_multipart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abort batch applied: upload records AND part rows removed
    together; the summary pins before/after cardinalities plus the
    204/404 envelope split."""
    uploads = load_uploads(spark, sf_dir)
    parts = load_part_events(spark, sf_dir)
    aborts = _abort_batch(spark, sf_dir)
    res = abort_results(uploads, aborts)
    # before/after in ONE pass per relation: flag membership in the
    # (broadcast, request-sized) abort set, then conditional sums —
    # the same plan shape abort_uploads uses, minus the second scan
    ids = aborts.select("upload_id").withColumn("__a", F.lit(True))
    u = uploads.join(F.broadcast(ids), "upload_id", "left").agg(
        F.count(F.lit(1)).cast("long").alias("uploads_before"),
        F.sum(F.col("__a").isNull().cast("int"))
        .cast("long")
        .alias("uploads_after"),
    )
    p = parts.join(F.broadcast(ids), "upload_id", "left").agg(
        F.count(F.lit(1)).cast("long").alias("parts_before"),
        F.sum(F.col("__a").isNull().cast("int"))
        .cast("long")
        .alias("parts_after"),
    )
    r = res.agg(
        F.sum((F.col("status") == 204).cast("int"))
        .cast("long")
        .alias("n_aborted"),
        F.sum((F.col("status") == 404).cast("int"))
        .cast("long")
        .alias("n_missing"),
    )
    return u.crossJoin(p).crossJoin(r).select(
        "uploads_before",
        "uploads_after",
        "parts_before",
        "parts_after",
        "n_aborted",
        "n_missing",
    )
