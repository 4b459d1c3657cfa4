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
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    load_object_versions,
)

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
    from aruna_spark.ops.mat import DISK_ONLY

    uploads = load_uploads(spark, sf_dir)
    parts = load_part_events(spark, sf_dir)
    # the request-sized abort batch feeds THREE consumers (the 204/404
    # envelope plus both membership flags); materialize it once so each
    # broadcast build reads the tiny frame instead of re-deriving its
    # documents scan
    aborts = _abort_batch(spark, sf_dir).localCheckpoint(
        eager=True, storageLevel=DISK_ONLY
    )
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


# ====================================================== UploadPartCopy
# Copy a byte range of an EXISTING object into an open upload as a part
# (operations/src/s3/upload_part_copy.rs): the source resolves exactly
# like GetObject (explicit version + range, rs:56-66), the copy-source
# conditions evaluate with CopyObject's shared evaluator — BOTH
# if-match and if-none-match failures are 412 PreconditionFailed, not
# GET's 304 (rs:2,82-96) — and the part write carries UploadPart's
# replace semantics. The result surfaces the part etag and the resolved
# source version (UploadPartCopyResultData, rs:34-38).


def upload_part_copy(
    versions: DataFrame,
    uploads: DataFrame,
    part_events: DataFrame,
    copies: DataFrame,
) -> DataFrame:
    """Per-request envelope: (upload_id, part_number, status,
    source_version_id, part_size, part_etag, replaced).

    ``copies`` carries (upload_id, part_number, bucket, key) plus the
    nullable GetObject parameter columns (want_version_id, if_match,
    if_none_match, range_start/end/suffix). Status: 404 NoSuchUpload
    for an unknown upload id FIRST — the reference validates the
    destination upload before resolving the source
    (upload_part_copy.rs:54 validate_destination_upload), so a request
    with both an unknown upload and a failing source returns 404 —
    then the source's resolution status when it fails (404/405/416;
    conditions remapped 304→412), else 200.

    Scale shape: the copy batch is request-sized — the source resolve
    inherits resolve_requests' broadcast key-prune of the catalog, and
    the upload/replace lookups broadcast the batch against upload-id
    slices; nothing shuffles the catalog.
    """
    from aruna_spark.queries.s3_suite import resolve_requests

    src = resolve_requests(versions, copies)
    # copy-source conditions: if-none-match failure is 412, not 304
    src = src.withColumn(
        "status",
        F.when(F.col("status") == 304, F.lit(412)).otherwise(
            F.col("status")
        ),
    )
    known = uploads.select("upload_id").withColumn("__u", F.lit(True))
    prior = (
        part_events.groupBy("upload_id", "part_number")
        .agg(F.max("seq").alias("__prior_seq"))
    )
    out = (
        src.join(F.broadcast(known), "upload_id", "left")
        .join(F.broadcast(prior), ["upload_id", "part_number"], "left")
        .withColumn(
            "status",
            # upload validated BEFORE the source outcome is consulted
            # (upload_part_copy.rs:54)
            F.when(F.col("__u").isNull(), F.lit(404))  # NoSuchUpload
            .when(~F.col("status").isin(200, 206), F.col("status"))
            .otherwise(F.lit(200)),
        )
    )
    ok = F.col("status") == 200
    return out.select(
        "upload_id",
        "part_number",
        "status",
        F.when(ok, F.col("resolved_version_id")).alias("source_version_id"),
        F.when(ok, F.col("content_length")).cast("long").alias("part_size"),
        # the part's etag commits to the source bytes: source etag +
        # the copied range (full copy = the whole object)
        F.when(
            ok,
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("upload_id"),
                    F.col("part_number").cast("string"),
                    F.col("etag"),
                    F.coalesce(F.col("content_range"), F.lit("full")),
                )
            ),
        ).alias("part_etag"),
        (ok & F.col("__prior_seq").isNotNull()).alias("replaced"),
    )


# copy batch: every doc with an open upload in the %19==4 family copies
# from its OWN object key; doc_id % 4 picks the variant, doc % 24 == 16
# retargets one row at an unknown upload (NoSuchUpload), and the
# %13==3 overlap sources from marker heads (404).
def _part_copy_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 19 == 4
    )
    key = F.concat(
        F.lit("data/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".txt"),
    )
    latest_etag = F.md5(
        F.concat(key, F.lit(":"), (F.col("doc_id") % 3).cast("string"))
    )
    m = F.col("doc_id") % 4
    return docs.select(
        F.when(
            F.col("doc_id") % 24 == 16,
            F.concat(F.lit("mpu-x-"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.concat(F.lit("mpu-"), F.col("doc_id").cast("string")))
        .alias("upload_id"),
        F.when(m == 1, F.lit(1)).otherwise(F.lit(99)).alias("part_number"),
        F.lit("corpus").alias("bucket"),
        key.alias("key"),
        F.when(m == 1, F.lit("v0")).alias("want_version_id"),
        # the unknown-upload rows ALSO carry a failing condition, so the
        # batch pins the validate-upload-first precedence (404, not 412)
        F.when(
            (m == 2) | (F.col("doc_id") % 24 == 16), F.lit("wrong")
        ).alias("if_match"),
        F.when(m == 3, latest_etag).alias("if_none_match"),
        F.when(m == 1, F.lit(0)).cast("long").alias("range_start"),
        F.when(m == 1, F.lit(9)).cast("long").alias("range_end"),
        F.lit(None).cast("long").alias("range_suffix"),
    )


_D_PART_COPIES = """
    SELECT CASE WHEN doc_id % 24 = 16 THEN 'mpu-x-' || doc_id
                ELSE 'mpu-' || doc_id END AS upload_id,
           CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 99 END AS part_number,
           'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
             AS key,
           CASE WHEN doc_id % 4 = 1 THEN 'v0' END AS want_version_id,
           CASE WHEN doc_id % 4 = 2 OR doc_id % 24 = 16 THEN 'wrong'
             END AS if_match,
           CASE WHEN doc_id % 4 = 3 THEN
                  md5('data/' || source || '/' || lang || '/doc-' || doc_id
                      || '.txt' || ':' || (doc_id % 3)) END AS if_none_match,
           CASE WHEN doc_id % 4 = 1 THEN 0 END AS range_start,
           CASE WHEN doc_id % 4 = 1 THEN 9 END AS range_end
    FROM documents WHERE doc_id % 19 = 4
"""


@register(
    "s3_upload_part_copy",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    uploads AS ({UPLOADS_ORACLE_SQL}),
    parts AS ({PART_EVENTS_ORACLE_SQL}),
    copies AS ({_D_PART_COPIES}),
    latest AS (SELECT * FROM objects WHERE is_latest),
    v0 AS (SELECT * FROM objects WHERE version_id = 'v0'),
    resolved AS (
      SELECT c.*,
             CASE WHEN c.want_version_id IS NOT NULL THEN v.version_id
                  ELSE l.version_id END AS vid,
             CASE WHEN c.want_version_id IS NOT NULL THEN v.size
                  ELSE l.size END AS size,
             CASE WHEN c.want_version_id IS NOT NULL THEN v.etag
                  ELSE l.etag END AS setag,
             COALESCE(CASE WHEN c.want_version_id IS NOT NULL
                           THEN v.is_delete_marker
                           ELSE l.is_delete_marker END, FALSE) AS marker
      FROM copies c
      LEFT JOIN latest l ON l.bucket = c.bucket AND l.key = c.key
      LEFT JOIN v0 v ON v.bucket = c.bucket AND v.key = c.key
    ),
    evaled AS (
      SELECT *,
             LEAST(9, size - 1) AS se_end,
             CASE
               WHEN NOT EXISTS (SELECT 1 FROM uploads u
                                WHERE u.upload_id = resolved.upload_id)
                 THEN 404
               WHEN marker AND want_version_id IS NOT NULL THEN 405
               WHEN marker OR setag IS NULL THEN 404
               WHEN if_match IS NOT NULL AND if_match <> setag THEN 412
               WHEN if_none_match IS NOT NULL AND if_none_match = setag
                 THEN 412
               WHEN range_start IS NOT NULL
                    AND NOT (size > range_start
                             AND LEAST(range_end, size - 1) >= range_start)
                 THEN 416
               ELSE 200
             END AS status
      FROM resolved
    )
    SELECT upload_id, part_number, status,
           CASE WHEN status = 200 THEN vid END AS source_version_id,
           CAST(CASE WHEN status <> 200 THEN NULL
                     WHEN range_start IS NOT NULL THEN se_end - range_start + 1
                     ELSE size END AS BIGINT) AS part_size,
           CASE WHEN status = 200 THEN
             md5(upload_id || ':' || part_number || ':' || setag || ':' ||
                 CASE WHEN range_start IS NOT NULL
                      THEN 'bytes ' || range_start || '-' || se_end || '/' || size
                      ELSE 'full' END)
           END AS part_etag,
           status = 200 AND EXISTS (
             SELECT 1 FROM parts p
             WHERE p.upload_id = evaled.upload_id
               AND p.part_number = evaled.part_number
           ) AS replaced
    FROM evaled
    """,
)
def s3_upload_part_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UploadPartCopy batch resolved against the catalog and the open
    uploads: GetObject-style source resolve (explicit version + range),
    copy-source conditions failing as 412 (including the if-none-match
    304 remap), marker heads 404ing, unknown uploads 404ing
    (NoSuchUpload), and UploadPart replace semantics surfacing as
    ``replaced``."""
    return upload_part_copy(
        load_object_versions(spark, sf_dir),
        load_uploads(spark, sf_dir),
        load_part_events(spark, sf_dir),
        _part_copy_batch(spark, sf_dir),
    )
