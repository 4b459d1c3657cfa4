"""S3 object-plane operators: PutObject upsert, GetObject, HeadObject.

The reference implements these as transactional state machines over the
blob keyspaces (``operations/src/s3/put_object.rs`` — states
CheckHashLookup/WriteBlobHead/CreateBlobVersionRecord/CleanupDuplicate;
``get_object.rs:85-160`` — version resolution, conditional requests,
range resolution; ``head_object.rs`` — same minus the body). Re-expressed
Spark-first, the object plane is a *versions table* and the three calls
become set-at-a-time DataFrame transforms:

- **Put** = append a batch of writes: per-key version assignment is a
  window (`max(version_idx)+row_number`), the ``is_latest`` head flip is
  LWW over the unioned table, and content-addressed dedup
  (CheckHashLookup → CleanupDuplicate) is a semi-join against the
  pre-existing ``blob_hash`` set — a duplicate put creates a version
  record but stores no new blob.
- **Get/Head** = point lookups expressed as joins of a requests table
  against the versions table: explicit ``version_id`` or the latest
  head, conditional requests (``If-Match`` → 412, ``If-None-Match`` →
  304), and byte-range resolution (``get_object.rs:98-133``: StartEnd /
  Start / Suffix → 206 + ``content_range``, unsatisfiable → 416).

Everything is native column algebra (windows, joins, CASE) — no UDFs —
so at 100 TB the put batch is one shuffle on (bucket, key) and the
get/head join broadcasts the (small) request batch against the
bucket-partitioned versions table.

The put/request batches are derived deterministically from ``documents``
so DuckDB reproduces them exactly (oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.queries import register
from aruna_spark.sources.objects import OBJECTS_ORACLE_SQL, load_object_versions


# -- deterministic put batch --------------------------------------------------
# Every doc with doc_id % 5 == 0 is re-put: doc_id % 10 == 0 writes the SAME
# content (the dedup path — blob already stored), doc_id % 10 == 5 writes new
# content (n_chars + 100). One put per key, seq = doc_id (stable order).

def _put_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    new_size = F.when(
        F.col("doc_id") % 10 == 0, F.col("n_chars")  # same content → dedup
    ).otherwise(F.col("n_chars") + 100)
    return docs.select(
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
        new_size.cast("long").alias("size"),
        F.md5(F.concat(F.lit("blob:"), new_size.cast("string"))).alias(
            "blob_hash"
        ),
    )


_D_PUTS = """
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           CAST(CASE WHEN doc_id % 10 = 0 THEN n_chars
                     ELSE n_chars + 100 END AS BIGINT) AS size,
           md5('blob:' || CAST(CASE WHEN doc_id % 10 = 0 THEN n_chars
                                    ELSE n_chars + 100 END AS BIGINT)) AS blob_hash
    FROM documents WHERE doc_id % 5 = 0
"""


def put_objects(
    versions: DataFrame, puts: DataFrame, stored_hashes: DataFrame | None = None
) -> DataFrame:
    """Apply a put batch to the versions table → new versions table.

    Returns the union of prior versions and the new version records, with
    ``is_latest`` recomputed (the head-pointer flip, put_object.rs
    WriteBlobHead) and ``deduplicated`` marking puts whose blob_hash was
    already stored (CheckHashLookup hit → CleanupDuplicate: version
    record written, no new blob).

    Scale shape: the put batch is small, so it BROADCASTS — prior-max
    reads only the touched keys' histories (semi-join prune before the
    groupBy) and the content-address check consults only the batch's
    hashes (semi-join prune before the membership join), never a full
    distinct over the blob index. ``stored_hashes`` (optional,
    one-column ``blob_hash``) overrides the membership relation — the
    facade's single-put route passes the GLOBAL catalog's hashes while
    pruning ``versions`` to the touched key."""
    # r15: the batch is read three times (touched keys, hash distinct,
    # the new-version join) and the upsert query's touched-filter reads
    # it again — materialize the request-sized frame once
    puts = puts.localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    touched_keys = puts.select("bucket", "key").distinct()
    prior_max = (
        versions.join(F.broadcast(touched_keys), ["bucket", "key"], "left_semi")
        .groupBy("bucket", "key")
        .agg(F.max("version_idx").alias("prior_max"))
    )
    if stored_hashes is None:
        stored_hashes = versions
    stored = (
        stored_hashes.join(
            F.broadcast(puts.select("blob_hash").distinct()),
            "blob_hash",
            "left_semi",
        )
        .select("blob_hash")
        .distinct()
    )
    new_vers = (
        puts.join(prior_max, ["bucket", "key"], "left")
        .join(
            stored.withColumn("__stored", F.lit(True)), "blob_hash", "left"
        )
        .select(
            "bucket",
            "key",
            (F.coalesce(F.col("prior_max"), F.lit(-1)) + 1).alias(
                "version_idx"
            ),
            "size",
            "blob_hash",
            F.coalesce(F.col("__stored"), F.lit(False)).alias("deduplicated"),
        )
        .withColumn(
            "version_id",
            F.concat(F.lit("v"), F.col("version_idx").cast("string")),
        )
        .withColumn(
            "etag",
            F.md5(
                F.concat(
                    F.col("key"),
                    F.lit(":"),
                    F.col("version_idx").cast("string"),
                )
            ),
        )
    )
    unioned = versions.select(
        "bucket",
        "key",
        "version_idx",
        "version_id",
        "size",
        "etag",
        "blob_hash",
        "is_delete_marker",
        F.lit(False).alias("deduplicated"),
    ).unionByName(
        new_vers.select(
            "bucket",
            "key",
            "version_idx",
            "version_id",
            "size",
            "etag",
            "blob_hash",
            F.lit(False).alias("is_delete_marker"),
            "deduplicated",
        )
    )
    w = Window.partitionBy("bucket", "key")
    return unioned.withColumn(
        "is_latest", F.col("version_idx") == F.max("version_idx").over(w)
    )


_D_AFTER_PUT = f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    puts AS ({_D_PUTS}),
    prior_max AS (
      SELECT bucket, key, MAX(version_idx) AS prior_max
      FROM objects GROUP BY bucket, key
    ),
    stored AS (SELECT DISTINCT blob_hash FROM objects),
    new_vers AS (
      SELECT p.bucket, p.key,
             COALESCE(m.prior_max, -1) + 1 AS version_idx,
             'v' || (COALESCE(m.prior_max, -1) + 1) AS version_id,
             p.size,
             md5(p.key || ':' || (COALESCE(m.prior_max, -1) + 1)) AS etag,
             p.blob_hash,
             s.blob_hash IS NOT NULL AS deduplicated
      FROM puts p
      LEFT JOIN prior_max m USING (bucket, key)
      LEFT JOIN stored s ON s.blob_hash = p.blob_hash
    ),
    unioned AS (
      SELECT bucket, key, version_idx, version_id, size, etag, blob_hash,
             is_delete_marker, FALSE AS deduplicated
      FROM objects
      UNION ALL
      SELECT bucket, key, version_idx, version_id, size, etag, blob_hash,
             FALSE AS is_delete_marker, deduplicated
      FROM new_vers
    )
    SELECT *,
           version_idx = MAX(version_idx)
             OVER (PARTITION BY bucket, key) AS is_latest
    FROM unioned
"""


@register(
    "s3_put_upsert",
    oracle=f"""
    WITH after AS ({_D_AFTER_PUT})
    SELECT bucket, key, version_idx, version_id, size, etag, blob_hash,
           is_delete_marker, deduplicated, is_latest
    FROM after
    WHERE key IN (SELECT key FROM ({_D_PUTS}))
    """,
)
def s3_put_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Put batch applied to the catalog: new head versions, prior heads
    demoted, dedup flags on content-addressed hits — the full version
    history of every touched key. A put on a DELETED key revives it:
    the new version lands past the marker and becomes the live head
    (delete markers stay in the history, exactly like S3)."""
    versions = load_object_versions(spark, sf_dir)
    puts = _put_batch(spark, sf_dir)
    after = put_objects(versions, puts)
    touched = puts.select("bucket", "key").distinct()
    return after.join(touched, ["bucket", "key"], "left_semi").select(
        "bucket",
        "key",
        "version_idx",
        "version_id",
        "size",
        "etag",
        "blob_hash",
        "is_delete_marker",
        "deduplicated",
        "is_latest",
    )


# -- Get/Head request batch ---------------------------------------------------
# Deterministic request mix over keys doc_id % 11 == 0:
#   kind 0: plain latest get
#   kind 1: get with version_id = 'v0' (explicit version)
#   kind 2: If-Match with the CORRECT latest etag   → 200
#   kind 3: If-Match with a WRONG etag              → 412
#   kind 4: If-None-Match with the latest etag      → 304
#   kind 5: range 10..min(99,size-1)  (StartEnd)    → 206 | 416
#   kind 6: suffix range last 16 bytes (Suffix)     → 206 | 416

def _request_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 11 == 0
    )
    return docs.select(
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
        (F.col("doc_id") % 7).alias("kind"),
    )


_D_REQS = """
    SELECT 'corpus' AS bucket,
           'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS key,
           doc_id % 7 AS kind
    FROM documents WHERE doc_id % 11 = 0
"""


# the explicit request-parameter columns resolve_requests consumes; any
# other request column (e.g. the demo mix's ``kind``) passes through
REQ_PARAM_COLS = (
    "want_version_id",
    "if_match",
    "if_none_match",
    "range_start",
    "range_end",
    "range_suffix",
)


def resolve_requests(versions: DataFrame, reqs: DataFrame) -> DataFrame:
    """GetObject/HeadObject resolution over EXPLICIT request parameters
    (get_object.rs:85-160).

    ``reqs`` carries (bucket, key) plus the nullable parameter columns
    in :data:`REQ_PARAM_COLS`: an explicit ``want_version_id`` (else the
    latest head resolves), ``if_match`` / ``if_none_match`` etags, and a
    byte range as either ``range_start``/``range_end`` (StartEnd,
    inclusive, end clamped to size-1) or ``range_suffix`` (last N
    bytes). ``status`` follows S3: 200, 206 partial, 304 not-modified,
    412 precondition-failed, 416 unsatisfiable-range, 404
    no-such-key/version. Non-parameter request columns pass through.

    This is the single resolution path: the oracle-checked demo mix
    (:func:`resolve_objects`) compiles its kind codes down to these
    parameters, and the :class:`~aruna_spark.api.Engine` object routes
    build one-row request batches. Scale shape: the request batch is
    small, so its KEYS broadcast-semi-prune the versions relation first
    (a point-lookup slice of the bucket-partitioned table); the outer
    resolution joins then run against that pruned slice, whose size is
    bounded by the batch's keys' version histories — never a shuffle of
    the full catalog, and a missing key (404) is simply absent from the
    slice."""
    versions = versions.join(
        F.broadcast(reqs.select("bucket", "key").distinct()),
        ["bucket", "key"],
        "left_semi",
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # batch-keyed slice; the latest/explicit split reads it twice
    latest = versions.filter(F.col("is_latest")).select(
        "bucket",
        "key",
        F.col("version_id").alias("__l_vid"),
        F.col("size").alias("__l_size"),
        F.col("etag").alias("__l_etag"),
        F.col("is_delete_marker").alias("__l_marker"),
    )
    explicit = versions.select(
        "bucket",
        "key",
        F.col("version_id").alias("want_version_id"),
        F.col("version_id").alias("__v_vid"),
        F.col("size").alias("__v_size"),
        F.col("etag").alias("__v_etag"),
        F.col("is_delete_marker").alias("__v_marker"),
    )
    want = F.col("want_version_id").isNotNull()
    resolved = (
        reqs.join(latest, ["bucket", "key"], "left")
        .join(explicit, ["bucket", "key", "want_version_id"], "left")
        .withColumn(
            "__vid", F.when(want, F.col("__v_vid")).otherwise(F.col("__l_vid"))
        )
        .withColumn(
            "size", F.when(want, F.col("__v_size")).otherwise(F.col("__l_size"))
        )
        .withColumn(
            "__etag",
            F.when(want, F.col("__v_etag")).otherwise(F.col("__l_etag")),
        )
        .withColumn(
            "__marker",
            F.coalesce(
                F.when(want, F.col("__v_marker")).otherwise(
                    F.col("__l_marker")
                ),
                F.lit(False),
            ),
        )
    )
    # conditional evaluation + range resolution, all CASE algebra
    start = F.col("range_start")
    end = F.least(F.col("range_end"), F.col("size") - 1)  # inclusive end
    has_se = F.col("range_start").isNotNull()
    has_sfx = F.col("range_suffix").isNotNull()
    range_ok_se = (F.col("size") > start) & (end >= start)
    range_ok_sfx = F.col("size") > 0
    sfx_start = F.greatest(F.col("size") - F.col("range_suffix"), F.lit(0))
    # a delete-marker head is a 404 (get_object.rs:344-347 NoSuchKey);
    # an EXPLICIT version request naming a marker is the reference's
    # GetObjectError::DeleteMarker — S3's 405 MethodNotAllowed
    status = (
        F.when(F.col("__marker") & want, F.lit(405))
        .when(F.col("__etag").isNull(), F.lit(404))
        .when(
            F.col("if_match").isNotNull()
            & (F.col("if_match") != F.col("__etag")),
            F.lit(412),
        )
        .when(
            F.col("if_none_match").isNotNull()
            & (F.col("if_none_match") == F.col("__etag")),
            F.lit(304),
        )
        .when(has_se & ~range_ok_se, F.lit(416))
        .when(has_sfx & ~range_ok_sfx, F.lit(416))
        .when(has_se | has_sfx, F.lit(206))
        .otherwise(F.lit(200))
    )
    content_length = (
        F.when(has_se, end - start + 1)
        .when(has_sfx, F.col("size") - sfx_start)
        .otherwise(F.col("size"))
    )
    content_range = (
        F.when(
            has_se,
            F.concat(
                F.lit("bytes "),
                start.cast("string"),
                F.lit("-"),
                end.cast("string"),
                F.lit("/"),
                F.col("size").cast("string"),
            ),
        )
        .when(
            has_sfx,
            F.concat(
                F.lit("bytes "),
                sfx_start.cast("string"),
                F.lit("-"),
                (F.col("size") - 1).cast("string"),
                F.lit("/"),
                F.col("size").cast("string"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    body = status.isin(200, 206)
    passthrough = [c for c in reqs.columns if c not in REQ_PARAM_COLS]
    return resolved.select(
        *passthrough,
        F.col("__vid").alias("resolved_version_id"),
        status.alias("status"),
        # x-amz-delete-marker: surfaced on the 404/405 so the caller can
        # distinguish "deleted" from "never existed"
        F.col("__marker").alias("delete_marker"),
        F.when(body, F.col("__etag")).alias("etag"),
        F.when(body, content_length).cast("long").alias("content_length"),
        F.when(status == 206, content_range).alias("content_range"),
    )


def resolve_objects(versions: DataFrame, reqs: DataFrame) -> DataFrame:
    """The demo request mix: compile each ``kind`` code down to the
    explicit parameters and resolve through :func:`resolve_requests` —
    the oracle checks THIS path, so the generalized resolver the facade
    routes use is covered by the same gate."""
    cond_etag = versions.filter(F.col("is_latest")).select(
        "bucket", "key", F.col("etag").alias("__cond_etag")
    )
    k = F.col("kind")
    reqs2 = reqs.join(cond_etag, ["bucket", "key"], "left").select(
        "bucket",
        "key",
        "kind",
        F.when(k == 1, F.lit("v0")).alias("want_version_id"),
        F.when(k == 2, F.col("__cond_etag"))
        .when(k == 3, F.lit("etag-mismatch"))
        .alias("if_match"),
        F.when(k == 4, F.col("__cond_etag")).alias("if_none_match"),
        F.when(k == 5, F.lit(10)).cast("long").alias("range_start"),
        F.when(k == 5, F.lit(99)).cast("long").alias("range_end"),
        F.when(k == 6, F.lit(16)).cast("long").alias("range_suffix"),
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # request-sized; resolve_requests reads it twice (keys + join)
    return resolve_requests(versions, reqs2)


def _duck_resolve(select_cols: str) -> str:
    return f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    reqs AS ({_D_REQS}),
    latest AS (SELECT * FROM objects WHERE is_latest),
    v0 AS (SELECT * FROM objects WHERE version_id = 'v0'),
    resolved AS (
      SELECT r.bucket, r.key, r.kind,
             CASE WHEN r.kind = 1 THEN v.version_id ELSE l.version_id END
               AS resolved_version_id,
             CASE WHEN r.kind = 1 THEN v.size ELSE l.size END AS size,
             CASE WHEN r.kind = 1 THEN v.etag ELSE l.etag END AS etag,
             COALESCE(CASE WHEN r.kind = 1 THEN v.is_delete_marker
                           ELSE l.is_delete_marker END, FALSE)
               AS delete_marker
      FROM reqs r
      LEFT JOIN latest l ON l.bucket = r.bucket AND l.key = r.key
      LEFT JOIN v0 v ON v.bucket = r.bucket AND v.key = r.key
    ),
    evaled AS (
      SELECT *,
             LEAST(99, size - 1) AS se_end,
             GREATEST(size - 16, 0) AS sfx_start,
             CASE
               WHEN etag IS NULL THEN 404
               WHEN kind = 3 THEN 412
               WHEN kind = 4 THEN 304
               WHEN kind = 5 AND NOT (size > 10 AND LEAST(99, size - 1) >= 10)
                 THEN 416
               WHEN kind = 6 AND NOT (size > 0) THEN 416
               WHEN kind IN (5, 6) THEN 206
               ELSE 200
             END AS status
      FROM resolved
    ),
    final AS (
      SELECT bucket, key, kind, resolved_version_id, status, delete_marker,
             CASE WHEN status IN (200, 206) THEN etag END AS etag,
             CAST(CASE
               WHEN status NOT IN (200, 206) THEN NULL
               WHEN kind = 5 THEN se_end - 10 + 1
               WHEN kind = 6 THEN size - sfx_start
               ELSE size
             END AS BIGINT) AS content_length,
             CASE
               WHEN status = 206 AND kind = 5
                 THEN 'bytes 10-' || se_end || '/' || size
               WHEN status = 206 AND kind = 6
                 THEN 'bytes ' || sfx_start || '-' || (size - 1) || '/' || size
             END AS content_range
      FROM evaled
    )
    SELECT {select_cols} FROM final
    """


@register(
    "s3_get_object",
    oracle=_duck_resolve(
        "bucket, key, kind, resolved_version_id, status, delete_marker, "
        "etag, content_length, content_range"
    ),
)
def s3_get_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetObject over a deterministic request mix: latest/versioned
    lookups, If-Match / If-None-Match conditionals, StartEnd and Suffix
    ranges with content_range resolution."""
    versions = load_object_versions(spark, sf_dir)
    return resolve_objects(versions, _request_batch(spark, sf_dir))


@register(
    "s3_head_object",
    oracle=_duck_resolve(
        "bucket, key, kind, resolved_version_id, status, delete_marker, "
        "etag, content_length"
    ),
)
def s3_head_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeadObject: same resolution as GetObject minus the body — metadata
    (etag, content_length) only; range columns are absent because HEAD
    carries no content."""
    versions = load_object_versions(spark, sf_dir)
    return resolve_objects(versions, _request_batch(spark, sf_dir)).drop(
        "content_range"
    )


# ------------------------------------------- multipart upload completion
N_UPLOADS = 25


@register(
    "s3_multipart_complete",
    oracle=f"""
    WITH parts AS (
      SELECT 'up-' || (doc_id % {N_UPLOADS}) AS upload_id,
             doc_id // {N_UPLOADS} + 1 AS part_number,
             n_chars AS part_size,
             md5(text) AS part_etag
      FROM documents
    )
    SELECT upload_id,
           COUNT(*) AS n_parts,
           CAST(SUM(part_size) AS BIGINT) AS total_size,
           md5(string_agg(part_etag, '' ORDER BY part_number)) || '-'
             || COUNT(*) AS final_etag,
           MIN(part_number) = 1 AND MAX(part_number) = COUNT(*)
             AS is_contiguous
    FROM parts GROUP BY upload_id
    """,
)
def s3_multipart_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompleteMultipartUpload: per-upload part manifests folded into the
    assembled object — S3's multipart etag structure ``md5(part digests
    in part order) + '-' + n_parts`` (hex-concat stands in for AWS's
    binary-digest concat, same shape) plus the part-contiguity validation
    (parts must be exactly 1..N). Multipart state mirrors the reference's
    multipart keyspaces (``core/src/keyspaces.rs`` s3 family; dispatch
    ``api/src/s3/s3_service.rs``).

    Scale: one shuffle on upload_id; the ordered digest fold is a sorted
    in-group array op, never a driver collect."""
    docs = load_table(spark, sf_dir, "documents")
    parts = docs.select(
        F.concat(F.lit("up-"), (F.col("doc_id") % N_UPLOADS).cast("string")).alias(
            "upload_id"
        ),
        ((F.col("doc_id") / N_UPLOADS).cast("long") + 1).alias("part_number"),
        F.col("n_chars").alias("part_size"),
        F.md5(F.col("text")).alias("part_etag"),
    )
    return complete_multipart(parts)


def complete_multipart(parts: DataFrame) -> DataFrame:
    """Fold a ``(upload_id, part_number, part_size, part_etag)`` part
    manifest into the assembled-object relation — the aggregation
    :func:`s3_multipart_complete` oracle-checks, exposed for the
    facade's multipart route."""
    return parts.groupBy("upload_id").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("part_size").cast("long").alias("total_size"),
        F.concat(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("part_number", "part_etag"))
                        ),
                        lambda s: s["part_etag"],
                    ),
                )
            ),
            F.lit("-"),
            F.count(F.lit(1)).cast("string"),
        ).alias("final_etag"),
        (
            (F.min("part_number") == 1)
            & (F.max("part_number") == F.count(F.lit(1)))
        ).alias("is_contiguous"),
    )


# ====================================================== GetObjectAttributes
# The metadata-plane sibling of HEAD (operations/src/s3/
# get_object_attributes.rs): resolve the version like GetObject
# (rs:223-254; explicit version or latest, marker rules identical),
# return etag + size + checksum attributes, and — when the object was
# assembled by multipart and the caller asks — the part summary
# (rs:282-358: summary + parts sorted by part_number; checksum_type
# defaults to FullObject when no multipart summary exists, rs:371-375).
# Composite objects here are the keys assembled by the multipart plane:
# doc_id % 21 == 8, with (doc_id % 4) + 2 parts splitting the object
# bytes evenly (remainder spread over the leading parts).

COMPOSITE_MOD, COMPOSITE_RESIDUE = 21, 8


def object_attributes(versions: DataFrame, reqs: DataFrame) -> DataFrame:
    """Per-request attribute envelope: (bucket, key, status,
    resolved_version_id, etag, object_size, checksum_sha256,
    checksum_type, n_parts, min_part_size, max_part_size).

    ``reqs`` carries (bucket, key, doc_id, want_version_id,
    include_parts); part columns are NULL unless the object is
    composite AND parts were requested (get_object_attributes.rs:320).
    Resolution inherits resolve_requests' broadcast key-prune — a
    point metadata lookup, no catalog shuffle."""
    from aruna_spark.sources.objects import blob_content

    base = resolve_requests(
        versions,
        reqs.withColumn("if_match", F.lit(None).cast("string"))
        .withColumn("if_none_match", F.lit(None).cast("string"))
        .withColumn("range_start", F.lit(None).cast("long"))
        .withColumn("range_end", F.lit(None).cast("long"))
        .withColumn("range_suffix", F.lit(None).cast("long")),
    )
    ok = F.col("status") == 200
    composite = F.col("doc_id") % COMPOSITE_MOD == COMPOSITE_RESIDUE
    n = (F.col("doc_id") % 4 + 2).cast("long")
    size = F.col("content_length")
    with_parts = ok & composite & F.col("include_parts")
    return base.select(
        "bucket",
        "key",
        "status",
        "resolved_version_id",
        "etag",
        F.when(ok, size).cast("long").alias("object_size"),
        F.when(ok, F.sha2(blob_content(size), 256)).alias(
            "checksum_sha256"
        ),
        F.when(ok & composite, F.lit("COMPOSITE"))
        .when(ok, F.lit("FULL_OBJECT"))
        .alias("checksum_type"),
        F.when(with_parts, n).alias("n_parts"),
        F.when(with_parts, (size / n).cast("long")).alias("min_part_size"),
        F.when(
            with_parts,
            (size / n).cast("long")
            + (size % n > 0).cast("long"),
        ).alias("max_part_size"),
    )


def object_parts(versions: DataFrame, reqs: DataFrame) -> DataFrame:
    """The exploded part list for composite objects (the ``parts`` Vec
    of GetObjectAttributesResult, sorted by part_number): part i of n
    carries size//n bytes plus one remainder byte for i <= size%n."""
    attrs = object_attributes(versions, reqs).filter(
        F.col("n_parts").isNotNull()
    )
    part = F.col("part_number")
    return attrs.select(
        "bucket",
        "key",
        "object_size",
        F.explode(F.sequence(F.lit(1), F.col("n_parts"))).alias(
            "part_number"
        ),
        "n_parts",
    ).select(
        "bucket",
        "key",
        "part_number",
        (
            (F.col("object_size") / F.col("n_parts")).cast("long")
            + (part <= F.col("object_size") % F.col("n_parts")).cast("long")
        ).alias("part_size"),
    )


def _attr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 1
    )
    return docs.select(
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
        F.col("doc_id"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("v0")).alias(
            "want_version_id"
        ),
        (F.col("doc_id") % 5 == 0).alias("include_parts"),
    )


@register(
    "s3_object_attributes",
    oracle=f"""
    WITH objects AS ({OBJECTS_ORACLE_SQL}),
    reqs AS (
      SELECT 'corpus' AS bucket,
             'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
               AS key,
             doc_id,
             CASE WHEN doc_id % 2 = 1 THEN 'v0' END AS want_version_id,
             doc_id % 5 = 0 AS include_parts
      FROM documents WHERE doc_id % 7 = 1
    ),
    latest AS (SELECT * FROM objects WHERE is_latest),
    v0 AS (SELECT * FROM objects WHERE version_id = 'v0'),
    resolved AS (
      SELECT r.*,
             CASE WHEN r.want_version_id IS NOT NULL THEN v.version_id
                  ELSE l.version_id END AS vid,
             CASE WHEN r.want_version_id IS NOT NULL THEN v.size
                  ELSE l.size END AS size,
             CASE WHEN r.want_version_id IS NOT NULL THEN v.etag
                  ELSE l.etag END AS setag,
             COALESCE(CASE WHEN r.want_version_id IS NOT NULL
                           THEN v.is_delete_marker
                           ELSE l.is_delete_marker END, FALSE) AS marker
      FROM reqs r
      LEFT JOIN latest l ON l.bucket = r.bucket AND l.key = r.key
      LEFT JOIN v0 v ON v.bucket = r.bucket AND v.key = r.key
    ),
    evaled AS (
      SELECT *,
             CASE WHEN marker AND want_version_id IS NOT NULL THEN 405
                  WHEN marker OR setag IS NULL THEN 404
                  ELSE 200 END AS status,
             doc_id % {COMPOSITE_MOD} = {COMPOSITE_RESIDUE} AS composite,
             doc_id % 4 + 2 AS n
      FROM resolved
    )
    SELECT bucket, key, status,
           vid AS resolved_version_id,
           CASE WHEN status = 200 THEN setag END AS etag,
           CAST(CASE WHEN status = 200 THEN size END AS BIGINT)
             AS object_size,
           CASE WHEN status = 200 THEN sha256('blob:' || size) END
             AS checksum_sha256,
           CASE WHEN status = 200 AND composite THEN 'COMPOSITE'
                WHEN status = 200 THEN 'FULL_OBJECT' END AS checksum_type,
           CAST(CASE WHEN status = 200 AND composite AND include_parts
                     THEN n END AS BIGINT) AS n_parts,
           CAST(CASE WHEN status = 200 AND composite AND include_parts
                     THEN size // n END AS BIGINT) AS min_part_size,
           CAST(CASE WHEN status = 200 AND composite AND include_parts
                     THEN size // n + CASE WHEN size % n > 0 THEN 1 ELSE 0 END
                END AS BIGINT) AS max_part_size
    FROM evaled
    """,
)
def s3_object_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetObjectAttributes over a deterministic request mix:
    latest/explicit-version resolution with marker rules, etag + size +
    sha256 checksum attributes, checksum_type COMPOSITE for
    multipart-assembled keys, and the part summary only when requested
    (get_object_attributes.rs:320,371-375)."""
    versions = load_object_versions(spark, sf_dir)
    return object_attributes(versions, _attr_batch(spark, sf_dir))
