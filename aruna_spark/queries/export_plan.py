"""Archive-export planning: safe ZIP path assignment for the RO-Crate
export job (``operations/src/jobs/export.rs``). The ZIP byte sink
itself is driver I/O (SURVEY §2 row 6 n/a); the PLAN — which entity
lands at which archive path, and why — is a per-entity classification
over the catalog, i.e. a query.

Reference surface:

- rs:986-1040 (``plan_export``) — each File entity takes its explicit
  ``localPath`` when it sanitizes, EXCEPT the two reserved names
  (``ro-crate-metadata.json``, ``aruna-export-report.json``);
  otherwise a synthesized path is minted and the entity is flagged
  ``path_synthesized`` (reported as "unsafe, absent, or reserved
  localPath was synthesized", rs:1442-1449). A path longer than
  ``limits.key_bytes`` (1,024 — the S3 key bound) or two entities
  resolving to the SAME path are permanent job failures.
- rs:1313-1337 (``safe_zip_path``) — strip leading ``./`` repeatedly,
  then reject: empty, trailing ``/``, any backslash, percent-encoded
  separators (``%2f``/``%5c`` case-insensitive), and any ``/``-split
  segment that is empty, ``.`` or ``..``. (The reference also NFC-
  normalizes; the fixture is ASCII so the step is identity here —
  non-ASCII inputs would need a normalizer UDF stage at ingest.)
- rs:1352-1356 (``synthesized_path``) — ``data/<content-hash-hex>-
  <first 12 hex of hash(entity_id)>``; the reference hashes with
  blake3, this module uses sha256 (public stand-in with the same
  uniqueness property, like the prune-key tiebreak).

Spark mapping: one narrow map stage builds the sanitized/synthesized
path per entity (regex + CASE — no UDFs), then ONE window partitioned
by the resulting path marks collisions. At 100 TB the plan is
per-crate (thousands of entities), but the same columns batch over
every crate at once — the window key is the path, never a global
order.

Fixture (documents; row selection ``% 2 == 0`` — the File half of the
type projection is % 5 != 0, kept independent; discriminators % 9
(path lane) and % 11 (length cap) coprime to 2): path lanes cover
safe, ``./``-prefixed, ``..`` escape, backslash, empty segment,
percent-encoded slash, trailing slash, reserved name, and absent;
lane-0 paths key on ``doc_id % 40`` so distinct entities collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

METADATA_PATH = "ro-crate-metadata.json"  # export.rs:54
REPORT_PATH = "aruna-export-report.json"  # export.rs:55
KEY_BYTES_LIMIT = 1_024

# path lane templates; <K> = doc_id, <C> = doc_id % 40 (collision key)
PATH_LANES = [
    "data/files/f<C>.txt",        # safe; collides across <C> ties
    "./data/dot/y<K>.txt",        # leading ./ strips → safe
    "../escape<K>",               # .. segment → synthesized
    "dir\\win<K>",                # backslash → synthesized
    "a//b<K>",                    # empty segment → synthesized
    "enc%2Fslash<K>",             # encoded separator → synthesized
    "trail<K>/",                  # trailing slash → synthesized
    METADATA_PATH,                # reserved name → synthesized
    None,                          # absent → synthesized
]


def load_export_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    k = F.col("doc_id")
    lane = None
    for i, tpl in enumerate(PATH_LANES):
        if tpl is None:
            expr = F.lit(None).cast("string")
        else:
            parts_k = tpl.split("<K>")
            if "<C>" in tpl:
                pre, post = tpl.split("<C>")
                expr = F.concat(
                    F.lit(pre), (k % 40).cast("string"), F.lit(post)
                )
            elif len(parts_k) > 1:
                expr = F.concat(
                    F.lit(parts_k[0]), k.cast("string"), F.lit(parts_k[1])
                )
            else:
                expr = F.lit(tpl)
        lane = (
            F.when(k % 9 == i, expr)
            if lane is None
            else lane.when(k % 9 == i, expr)
        )
    local_path = F.when(
        k % 11 == 9,
        F.concat(F.lit("data/long/"), F.repeat(F.lit("x"), 1_100)),
    ).otherwise(lane)
    return d.select(
        F.concat(F.lit("urn:aruna:doc:"), k.cast("string")).alias(
            "entity_id"
        ),
        local_path.alias("local_path"),
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )


_ENTITIES_SQL = """
    entities AS (
      SELECT 'urn:aruna:doc:' || doc_id AS entity_id,
             CASE WHEN doc_id % 11 = 9
                    THEN 'data/long/' || repeat('x', 1100)
                  WHEN doc_id % 9 = 0
                    THEN 'data/files/f' || (doc_id % 40) || '.txt'
                  WHEN doc_id % 9 = 1
                    THEN './data/dot/y' || doc_id || '.txt'
                  WHEN doc_id % 9 = 2 THEN '../escape' || doc_id
                  WHEN doc_id % 9 = 3 THEN 'dir\\win' || doc_id
                  WHEN doc_id % 9 = 4 THEN 'a//b' || doc_id
                  WHEN doc_id % 9 = 5 THEN 'enc%2Fslash' || doc_id
                  WHEN doc_id % 9 = 6 THEN 'trail' || doc_id || '/'
                  WHEN doc_id % 9 = 7 THEN 'ro-crate-metadata.json'
             END AS local_path,
             sha256(text) AS content_hash
      FROM documents WHERE doc_id % 2 = 0
    )
"""


def sanitized_path(local_path: F.Column) -> F.Column:
    """``safe_zip_path`` (export.rs:1313-1337) as column algebra;
    NULL = unsafe/absent. Reserved names are filtered by the CALLER
    (plan_export checks them after sanitizing)."""
    stripped = F.regexp_replace(local_path, r"^(\./)+", "")
    lower = F.lower(stripped)
    bad = (
        (stripped == "")
        | stripped.endswith("/")
        | F.contains(stripped, F.lit("\\"))
        | F.contains(lower, F.lit("%2f"))
        | F.contains(lower, F.lit("%5c"))
        | F.exists(
            F.split(stripped, "/"),
            lambda p: (p == "") | (p == ".") | (p == ".."),
        )
    )
    return F.when(local_path.isNotNull() & ~bad, stripped)


def plan_export_paths(entities: DataFrame) -> DataFrame:
    """The per-entity plan row: explicit vs synthesized path, the
    length-cap failure, and collision marking (rs:986-1019)."""
    explicit = sanitized_path(F.col("local_path"))
    explicit = F.when(
        ~explicit.isin(METADATA_PATH, REPORT_PATH), explicit
    )
    synthesized = F.concat(
        F.lit("data/"),
        F.col("content_hash"),
        F.lit("-"),
        F.substring(F.sha2(F.col("entity_id"), 256), 1, 12),
    )
    path = F.coalesce(explicit, synthesized)
    staged = entities.select(
        "entity_id",
        explicit.isNull().alias("path_synthesized"),
        F.when(F.length(path) <= KEY_BYTES_LIMIT, path).alias("zip_path"),
        (F.length(path) > KEY_BYTES_LIMIT).alias("__too_long"),
    )
    w = Window.partitionBy("zip_path")
    return staged.select(
        "entity_id",
        F.when(F.col("__too_long"), "too_long")
        .when(F.col("path_synthesized"), "synthesized")
        .otherwise("explicit")
        .alias("outcome"),
        "zip_path",
        "path_synthesized",
        (
            F.col("zip_path").isNotNull()
            & (F.count(F.lit(1)).over(w) > 1)
        ).alias("collision"),
    )


@register(
    "export_plan_paths",
    oracle=f"""
    WITH {_ENTITIES_SQL},
    sanitized AS (
      SELECT entity_id, content_hash, local_path,
             CASE WHEN s IS NULL OR s = '' OR s LIKE '%/'
                       OR contains(s, '\\')
                       OR contains(lower(s), '%2f')
                       OR contains(lower(s), '%5c')
                       OR len(list_filter(string_split(s, '/'),
                              p -> p = '' OR p = '.' OR p = '..')) > 0
                       OR s IN ('{METADATA_PATH}', '{REPORT_PATH}')
                  THEN NULL ELSE s END AS explicit
      FROM (SELECT *, regexp_replace(local_path, '^(\\./)+', '') AS s
            FROM entities)
    ),
    pathed AS (
      SELECT entity_id,
             explicit IS NULL AS path_synthesized,
             COALESCE(explicit,
                      'data/' || content_hash || '-' ||
                      substring(sha256(entity_id), 1, 12)) AS p
      FROM sanitized
    )
    SELECT entity_id,
           CASE WHEN len(p) > {KEY_BYTES_LIMIT} THEN 'too_long'
                WHEN path_synthesized THEN 'synthesized'
                ELSE 'explicit' END AS outcome,
           CASE WHEN len(p) <= {KEY_BYTES_LIMIT} THEN p END AS zip_path,
           path_synthesized,
           CASE WHEN len(p) <= {KEY_BYTES_LIMIT}
                THEN COUNT(*) OVER (PARTITION BY
                       CASE WHEN len(p) <= {KEY_BYTES_LIMIT} THEN p END)
                     > 1
                ELSE FALSE END AS collision
    FROM pathed
    """,
)
def export_plan_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export plan over the fixture crate's File entities."""
    return plan_export_paths(load_export_entities(spark, sf_dir))
