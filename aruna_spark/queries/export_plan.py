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

from aruna_spark.ops.mat import DISK_ONLY

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


# ------------------------------------------------ export report rows
# The export job's REPORT surface (export.rs:1426-1473 ``build_rows`` +
# the omission assignment ladders): every entity emits a MAIN row keyed
# ``{index:016x}:main`` whose code is its omission — External
# ("external File entity was not fetched", rs:1152-1168) / Unsupported
# (foreign-realm identifier, rs:1157-1169, or the ARN-vs-hash mismatch
# "versioned ARN and content hash disagree", rs:459-463) / Offline
# ("blob holder discovery is unavailable", rs:477-480) / Denied
# ("payload READ permission denied") / Missing ("no readable payload
# version was found", rs:488-500) — or Included. Included entities that
# had their path synthesized add a ``:path`` row (PathSynthesized,
# rs:1442-1449) and those whose id survives as a raw string outside an
# @id position add a ``:reference`` row (UnrewrittenReference — the
# export-side twin of the import rewrite's warning; scan_unrewritten
# rs:1357-1392 is ALIAS-AWARE via JsonLdKeywords like the import pass).
# The report is EMBEDDED into the crate only when any of the five
# omission codes occurred (has_omissions, rs:1041-1056). Indexes are
# per export job — one crate — so the rank window partitions by crate.
_OMISSION_CODES = ("External", "Denied", "Missing", "Offline", "Unsupported")
_OMISSION_LANES = [
    # (lane, code, message) — lane 0 is Included (message NULL)
    (1, "External", "external File entity was not fetched"),
    (2, "Unsupported", "Aruna identifier belongs to another realm"),
    (3, "Unsupported", "versioned ARN and content hash disagree"),
    (4, "Offline", "blob holder discovery is unavailable"),
    (5, "Denied", "payload READ permission denied"),
    (6, "Missing", "no readable payload version was found"),
]
_PATH_MSG = "unsafe, absent, or reserved localPath was synthesized"
_REF_MSG = "a string-form reference outside an @id field was preserved"

_REPORT_ORACLE = f"""
    WITH ents AS (
      SELECT doc_id, doc_id % 31 AS crate_id,
             'ent-' || doc_id AS entity_id,
             doc_id % 7 AS olane,
             doc_id % 2 = 0 AS synth,
             doc_id % 3 = 1 AS unrew
      FROM documents
    ),
    idx AS (
      SELECT *, row_number() OVER (PARTITION BY crate_id
                                   ORDER BY doc_id) - 1 AS i
      FROM ents
    ),
    coded AS (
      SELECT *,
             CASE olane {" ".join(f"WHEN {l} THEN '{c}'" for l, c, _ in _OMISSION_LANES)}
                  ELSE 'Included' END AS main_code,
             CASE olane {" ".join(f"WHEN {l} THEN '{m}'" for l, _, m in _OMISSION_LANES)}
                  END AS main_msg
      FROM idx
    ),
    flags AS (
      SELECT crate_id,
             BOOL_OR(main_code IN {_OMISSION_CODES}) AS has_omissions
      FROM coded GROUP BY 1
    ),
    rows_ AS (
      SELECT crate_id, entity_id, i,
             lpad(lower(hex(i)), 16, '0') || ':main' AS entry_key,
             main_code AS code, main_msg AS message
      FROM coded
      UNION ALL
      SELECT crate_id, entity_id, i,
             lpad(lower(hex(i)), 16, '0') || ':path',
             'PathSynthesized', '{_PATH_MSG}'
      FROM coded WHERE main_code = 'Included' AND synth
      UNION ALL
      SELECT crate_id, entity_id, i,
             lpad(lower(hex(i)), 16, '0') || ':reference',
             'UnrewrittenReference', '{_REF_MSG}'
      FROM coded WHERE main_code = 'Included' AND unrew
    )
    SELECT r.crate_id, r.entry_key, r.code, r.message, r.entity_id,
           f.has_omissions
    FROM rows_ r JOIN flags f USING (crate_id)
"""


def _report_entities(spark: SparkSession, sf_dir: str, crate_key) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        crate_key.alias("crate_id"),
        F.concat(F.lit("ent-"), F.col("doc_id").cast("string")).alias(
            "entity_id"
        ),
        (F.col("doc_id") % 7).alias("olane"),
        (F.col("doc_id") % 2 == 0).alias("synth"),
        (F.col("doc_id") % 3 == 1).alias("unrew"),
    )


@register("export_report_rows", oracle=_REPORT_ORACLE)
def export_report_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the export report for one entity batch: the per-entity
    main/:path/:reference rows with the reference's exact codes and
    messages, and the per-crate embed gate. One PARTITIONED rank per
    crate + a union of three projections + the crate-level flag join —
    no global order, no UDF."""
    ents = _report_entities(spark, sf_dir, F.col("doc_id") % 31)
    return _export_report_rows(ents, broadcast_flags=True)


def export_report_rows_decade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unregistered decade variant (r15, VERDICT r14 Next #5): the
    registered fixture's 31-crate key SATURATES — at 10× data each
    crate's rank partition grows 10× on 31-way parallelism. Here crates
    grow WITH the corpus (≤32 entities each, ``doc_id div 32``), so the
    per-crate window stays bounded and the flag join rides a
    corpus-proportional shuffle key instead of a broadcast."""
    ents = _report_entities(
        spark, sf_dir, (F.col("doc_id") / 32).cast("long")
    )
    return _export_report_rows(ents, broadcast_flags=False)


def _export_report_rows(ents: DataFrame, broadcast_flags: bool) -> DataFrame:
    w = Window.partitionBy("crate_id").orderBy("doc_id")
    idx = ents.withColumn("i", F.row_number().over(w) - 1)
    main_code = F.lit("Included")
    main_msg = F.lit(None).cast("string")
    for lane, code, msg in reversed(_OMISSION_LANES):
        main_code = F.when(F.col("olane") == lane, code).otherwise(
            main_code
        )
        main_msg = F.when(F.col("olane") == lane, msg).otherwise(main_msg)
    coded = idx.select(
        "crate_id",
        "entity_id",
        "i",
        "synth",
        "unrew",
        main_code.alias("main_code"),
        main_msg.alias("main_msg"),
    )
    flags = coded.groupBy("crate_id").agg(
        F.max(F.col("main_code").isin(*_OMISSION_CODES)).alias(
            "has_omissions"
        )
    )
    key = F.concat(
        F.lpad(F.lower(F.hex(F.col("i"))), 16, "0"), F.lit(":main")
    )
    main = coded.select(
        "crate_id",
        key.alias("entry_key"),
        F.col("main_code").alias("code"),
        F.col("main_msg").alias("message"),
        "entity_id",
    )
    included = coded.filter(F.col("main_code") == "Included")
    path_rows = included.filter("synth").select(
        "crate_id",
        F.concat(
            F.lpad(F.lower(F.hex(F.col("i"))), 16, "0"), F.lit(":path")
        ).alias("entry_key"),
        F.lit("PathSynthesized").alias("code"),
        F.lit(_PATH_MSG).alias("message"),
        "entity_id",
    )
    ref_rows = included.filter("unrew").select(
        "crate_id",
        F.concat(
            F.lpad(F.lower(F.hex(F.col("i"))), 16, "0"),
            F.lit(":reference"),
        ).alias("entry_key"),
        F.lit("UnrewrittenReference").alias("code"),
        F.lit(_REF_MSG).alias("message"),
        "entity_id",
    )
    rows = main.unionByName(path_rows).unionByName(ref_rows)
    # config-sized crate batches broadcast; corpus-proportional crate
    # populations (the decade variant) shuffle on the crate key
    return rows.join(
        F.broadcast(flags) if broadcast_flags else flags, "crate_id"
    )


# ---------------------------------------------------------- entity identity
# ``recognize_entities`` (export.rs:1085-1168) + ``entity_identity`` /
# ``parse_hash`` (rs:1268-1312) over the core identifier parsers
# (core/src/structs/replication.rs:160-320) — the r15 inside-a-cited-
# file find: which storage identity a crate File entity carries, and
# whether this realm can serve it.
#
# Semantics mirrored exactly:
# - each entity folds its ``@id`` FIRST, then every contentUrl in
#   order; each parsed candidate OVERWRITES its slot (LAST wins), and
#   ``hash_realm`` is set only by the ch-ARN branch — a later data-
#   W3ID hash overwrites the hash but leaves the stale realm behind
#   (rs:1271-1291);
# - a data W3ID (``https://w3id.org/aruna/data/``) carries either a
#   64-lowercase-hex content hash or an ``arn:`` suffix parsed as a
#   versioned object ARN; any other suffix parses as nothing (and the
#   full https:// value can never match the bare-ARN parsers);
# - a versioned object ARN (``arn:aruna:<realm>:<node>:s3/<bucket>/
#   <key>@<ulid>``) requires a non-empty bucket without '/'/'@', a
#   CANONICALLY percent-encoded key (uppercase hex, exactly the
#   ARN_KEY_ENCODE_SET characters escaped — replication.rs:11-40,298),
#   and a 26-char Crockford ULID (I/L/O/U excluded);
# - a ch ARN's path is 64 lowercase hex with an optional ``blake3/``
#   prefix (``parse_hash``);
# - gates (rs:1136-1168): external = no identity at all; supported
#   exact = the versioned ARN's realm is the exporting realm;
#   supported hash = a hash exists and ``hash_realm`` is NULL or the
#   exporting realm; everything else is the Unsupported omission.
# - local path (rs:1146-1149): the raw ``@id``-adjacent path survives
#   only when the localPath triples contain it; otherwise the first
#   localPath value.
#
# Fixture: one entity per document; identity lane = doc_id % 13,
# localPath lane = doc_id % 4 (coprime). The oracle derives every
# output from the lane arithmetic alone — fully independent of the
# string parsers the Spark side actually runs.

ARUNA_DATA_PREFIX = "https://w3id.org/aruna/data/"
_EXPORT_REALM = "realmE"
_ULID_OK = "01ARZ3NDEKTSV4RRFFQ69G5FAV"
_ULID_BAD = "01ARZ3NDEKTSV4RRFFQ69G5FAL"  # 'L' is not Crockford
_ULID_RE = "[0-9A-HJKMNP-TV-Z]{26}"
# canonical encoded-key alphabet: raw chars NOT in ARN_KEY_ENCODE_SET
# (alnum - . / _ ~), or an uppercase-hex escape OF a set character
# (00-2C, 3A-40, 5B-5E, 60, 7B-7D, 7F)
_KEY_CANON = (
    "(?:[0-9A-Za-z./_~-]|%(?:[01][0-9A-F]|2[0-9ABC]|3[A-F]|40|"
    "5[B-E]|60|7[B-D]|7F))+"
)
_VARN_RE = (
    "^arn:aruna:([^:]+):([^:]+):s3/([^/@]+)/"
    f"({_KEY_CANON})@({_ULID_RE})$"
)
_CHARN_RE = "^arn:aruna:([^:]+):([^:]+):ch/(?:blake3/)?([0-9a-f]{64})$"


def _identity_kind(v: F.Column) -> F.Column:
    """One candidate value → struct(kind, realm); kind NULL when no
    parser accepts it (entity_identity's per-value fold body)."""
    plen = len(ARUNA_DATA_PREFIX)
    suffix = v.substr(F.lit(plen + 1), F.length(v))
    is_w3id = v.startswith(ARUNA_DATA_PREFIX)
    kind = (
        F.when(is_w3id & suffix.rlike("^[0-9a-f]{64}$"), "hash_w3id")
        .when(is_w3id & suffix.rlike(_VARN_RE), "exact")
        .when(is_w3id, F.lit(None).cast("string"))
        .when(v.rlike(_VARN_RE), "exact")
        .when(v.rlike(_CHARN_RE), "hash_arn")
    )
    realm = (
        F.when(is_w3id, F.regexp_extract(suffix, _VARN_RE, 1))
        .when(v.rlike(_VARN_RE), F.regexp_extract(v, _VARN_RE, 1))
        .otherwise(F.regexp_extract(v, _CHARN_RE, 1))
    )
    return F.struct(kind.alias("kind"), F.nullif(realm, F.lit("")).alias("realm"))


def load_export_identity_entities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    lane = d % 13
    hex64 = F.lpad(F.lower(F.hex(d)), 64, "0")

    def varn(realm, key=None):
        key = key if key is not None else F.concat(F.lit("k"), ds, F.lit(".txt"))
        return F.concat(
            F.lit(f"arn:aruna:{realm}:node1:s3/bkt-"), ds, F.lit("/"),
            key, F.lit("@"), F.lit(_ULID_OK),
        )

    def charn(realm, prefix="blake3/", hexcol=None):
        return F.concat(
            F.lit(f"arn:aruna:{realm}:node1:ch/{prefix}"),
            hexcol if hexcol is not None else hex64,
        )

    plain = F.concat(F.lit("ent-"), ds)
    w3id_hash = F.concat(F.lit(ARUNA_DATA_PREFIX), hex64)
    entity_id = (
        F.when(lane.isin(0, 12), w3id_hash)
        .when(lane == 1, F.concat(F.lit(ARUNA_DATA_PREFIX), varn(_EXPORT_REALM)))
        .when(
            lane == 7,
            F.concat(
                F.lit(ARUNA_DATA_PREFIX),
                F.lit("arn:aruna:realmE:node1:s3/bkt/k@"),
                F.lit(_ULID_BAD),
            ),
        )
        .otherwise(plain)
    )
    arr = F.array
    empty = F.array().cast("array<string>")
    content_urls = (
        F.when(lane == 2, arr(varn(_EXPORT_REALM)))
        .when(lane == 3, arr(varn("realmX")))
        .when(lane == 4, arr(charn(_EXPORT_REALM)))
        .when(lane == 5, arr(charn("realmX")))
        .when(lane == 8, arr(varn(_EXPORT_REALM, key=F.lit("a%2fb"))))
        .when(lane == 9, arr(charn(_EXPORT_REALM, prefix="")))
        .when(
            lane == 10,
            arr(charn(_EXPORT_REALM, hexcol=F.substring(hex64, 1, 63))),
        )
        .when(lane == 11, arr(charn("realmX"), varn(_EXPORT_REALM)))
        .when(lane == 12, arr(charn("realmX")))
        .otherwise(empty)
    )
    plane = d % 4
    raw_path = F.when(
        plane.isin(0, 1), F.concat(F.lit("lp/"), ds, F.lit(".txt"))
    ).when(plane == 3, F.lit("x"))
    local_paths = (
        F.when(plane == 0, arr(raw_path, F.lit("other")))
        .when(plane == 1, arr(F.lit("other1"), F.lit("other2")))
        .when(plane == 2, arr(F.lit("solo")))
        .otherwise(empty)
    )
    return docs.select(
        "doc_id",
        entity_id.alias("entity_id"),
        content_urls.alias("content_urls"),
        raw_path.alias("raw_path"),
        local_paths.alias("local_paths"),
    )


def recognize_entity_identity(
    entities: DataFrame, realm: str
) -> DataFrame:
    """The relational recognize fold: posexplode the ``@id``-led
    candidate list, classify each value through the identifier
    parsers, then keep each slot's LAST accepted candidate with
    ``max_by`` over the position."""
    cands = entities.select(
        "doc_id",
        "entity_id",
        "raw_path",
        "local_paths",
        F.posexplode_outer(
            F.concat(F.array(F.col("entity_id")), F.col("content_urls"))
        ).alias("pos", "v"),
    ).withColumn("c", _identity_kind(F.col("v")))
    per = cands.groupBy(
        "doc_id", "entity_id", "raw_path", "local_paths"
    ).agg(
        F.max(
            F.when(F.col("c.kind") == "exact", F.struct("pos", "c.realm"))
        ).alias("exact"),
        F.max(
            F.when(
                F.col("c.kind").isin("hash_w3id", "hash_arn"), F.col("pos")
            )
        ).alias("hash_pos"),
        F.max(
            F.when(F.col("c.kind") == "hash_arn", F.struct("pos", "c.realm"))
        ).alias("harn"),
    )
    has_exact = F.col("exact").isNotNull()
    has_hash = F.col("hash_pos").isNotNull()
    hash_realm = F.col("harn.realm")
    external = ~has_exact & ~has_hash
    supported_exact = has_exact & (F.col("exact.realm") == realm)
    supported_hash = has_hash & (
        hash_realm.isNull() | (hash_realm == realm)
    )
    unsupported = ~external & ~supported_exact & ~supported_hash
    local_path = F.when(
        F.array_contains(
            F.coalesce(F.col("local_paths"), F.array().cast("array<string>")),
            F.col("raw_path"),
        ),
        F.col("raw_path"),
    ).otherwise(F.get(F.col("local_paths"), 0))
    return per.select(
        "entity_id",
        F.when(has_exact, "exact")
        .when(has_hash, "hash")
        .otherwise("external")
        .alias("identity_kind"),
        hash_realm.alias("hash_realm"),
        (supported_exact | supported_hash).alias("supported"),
        F.when(external, "External")
        .when(unsupported, "Unsupported")
        .cast("string")
        .alias("omission"),
        local_path.alias("local_path"),
    )


_IDENTITY_ORACLE = """
    WITH d AS (
      SELECT doc_id, doc_id % 13 AS lane, doc_id % 4 AS plane,
             lpad(lower(hex(doc_id)), 64, '0') AS h
      FROM documents
    )
    SELECT CASE
             WHEN lane IN (0, 12) THEN 'https://w3id.org/aruna/data/' || h
             WHEN lane = 1 THEN 'https://w3id.org/aruna/data/' ||
               'arn:aruna:realmE:node1:s3/bkt-' || doc_id || '/k' ||
               doc_id || '.txt@01ARZ3NDEKTSV4RRFFQ69G5FAV'
             WHEN lane = 7 THEN 'https://w3id.org/aruna/data/' ||
               'arn:aruna:realmE:node1:s3/bkt/k@01ARZ3NDEKTSV4RRFFQ69G5FAL'
             ELSE 'ent-' || doc_id END AS entity_id,
           CASE
             WHEN lane IN (1, 2, 11) THEN 'exact'
             WHEN lane IN (3) THEN 'exact'
             WHEN lane IN (0, 4, 5, 9, 12) THEN 'hash'
             ELSE 'external' END AS identity_kind,
           CASE WHEN lane IN (4, 9) THEN 'realmE'
                WHEN lane IN (5, 11, 12) THEN 'realmX'
           END AS hash_realm,
           lane IN (0, 1, 2, 4, 9, 11) AS supported,
           CASE WHEN lane IN (6, 7, 8, 10) THEN 'External'
                WHEN lane IN (3, 5, 12) THEN 'Unsupported'
           END AS omission,
           CASE WHEN plane = 0 THEN 'lp/' || doc_id || '.txt'
                WHEN plane = 1 THEN 'other1'
                WHEN plane = 2 THEN 'solo'
           END AS local_path
    FROM d
"""


@register("export_entity_identity", oracle=_IDENTITY_ORACLE)
def export_entity_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity storage identity + serveability for the export job
    (recognize_entities, export.rs:1085-1168): which slot the last
    accepted candidate filled, the ch-ARN realm it remembers, the
    external/unsupported omission ladder, and the localPath pick."""
    ents = load_export_identity_entities(spark, sf_dir)
    return recognize_entity_identity(ents, _EXPORT_REALM)


# ------------------------------------------------- candidate resolution
# ``resolve_entries`` (export.rs:387-507) + ``resolve_exact`` /
# ``resolve_alias`` / ``extend_hash_candidates`` (rs:508-660) — the
# r15 second inside-export.rs find: the per-entity payload-candidate
# assembly over the catalog planes. Modeled as JOINS against the same
# relations the reference's effects read — buckets (S3_BUCKET
# keyspace), read permissions, blob versions, blob locations, the
# hash-path alias index (ResolveBlobPermissionPaths), and the blob
# holder set (GetBlobHolders) — with the reference's rungs:
#
# - a pre-omitted entity is skipped untouched (rs:401-404);
# - the entity hash participates only when ``hash_realm`` is NULL or
#   the exporting realm (rs:405-410);
# - a same-realm exact ARN resolves LOCALLY when its node is the
#   owner (bucket → permission → version → location ladder, each miss
#   a ``Missing``, a permission miss ``Denied``) and otherwise becomes
#   a RemoteExact candidate outright (rs:419-457);
# - an exact candidate or discovered hash that CONTRADICTS the
#   declared hash is the Unsupported mismatch (rs:427-431, 434-443);
#   a hash discovered by a Missing exact resolve is LEARNED (rs:444);
# - hash extension: realm-filtered aliases resolve like exact (dedup
#   by candidate), then holders fill up to REMOTE_ATTEMPTS(8) minus
#   the remote candidates so far, deduped by node; a failed holder
#   fetch with no candidates is Offline (rs:486-499, 508-560);
# - no candidates → Denied if any permission denied, else Missing,
#   with the reference's exact messages (rs:487-501).
#
# Fixture: one entity per document, scenario lane = doc_id % 11; the
# catalog frames are lane-built from the same corpus scan. The oracle
# derives every count and code from the lane arithmetic alone.

REMOTE_ATTEMPTS = 8  # export.rs:56

_RESOLVE_ORACLE = """
    WITH d AS (SELECT doc_id, doc_id % 11 AS e FROM documents)
    SELECT 'ent-' || doc_id AS entity_id,
           CAST(CASE e WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0
                       WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1
                       WHEN 6 THEN 2 WHEN 7 THEN 9 ELSE 0 END AS BIGINT)
             AS n_candidates,
           CAST(CASE WHEN e IN (1) THEN 1 WHEN e = 7 THEN 1 ELSE 0 END
                AS BIGINT) AS n_local,
           CAST(CASE WHEN e = 5 THEN 1 ELSE 0 END AS BIGINT)
             AS n_remote_exact,
           CAST(CASE WHEN e = 6 THEN 2 WHEN e = 7 THEN 8 ELSE 0 END
                AS BIGINT) AS n_remote_hash,
           CASE e WHEN 0 THEN 'External' WHEN 2 THEN 'Unsupported'
                  WHEN 3 THEN 'Missing' WHEN 4 THEN 'Denied'
                  WHEN 8 THEN 'Offline' WHEN 9 THEN 'Missing'
                  WHEN 10 THEN 'Missing' END AS omission,
           CASE e WHEN 0 THEN 'external File entity was not fetched'
                  WHEN 2 THEN 'versioned ARN and content hash disagree'
                  WHEN 3 THEN 'no readable payload version was found'
                  WHEN 4 THEN 'payload READ permission denied'
                  WHEN 8 THEN 'blob holder discovery is unavailable'
                  WHEN 9 THEN 'no readable payload version was found'
                  WHEN 10 THEN 'no readable payload version was found'
           END AS message
    FROM d
"""


def _resolve_frames(spark: SparkSession, sf_dir: str) -> dict:
    """The lane-built catalog planes the resolve ladder joins.

    Execution shape (r15): ONE narrow documents scan materializes per
    call; every lane plane (entities/buckets/perms/versions/locations/
    aliases/holders) is a projection of it, so the ladder's joins never
    re-touch the corpus (was 20+ documents scans, 94 in the full plan)."""
    from aruna_spark.ops.text import spread_for_cpu

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id")
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    d = F.col("doc_id")
    ds = d.cast("string")
    e = d % 11
    h = F.concat(F.lit("h"), ds)       # the entity/declared hash
    g = F.concat(F.lit("g"), ds)       # a CONTRADICTING stored hash
    bkt = F.concat(F.lit("b"), ds)
    key = F.concat(F.lit("k"), ds)
    entities = docs.select(
        "doc_id",
        F.concat(F.lit("ent-"), ds).alias("entity_id"),
        e.alias("e"),
        F.when(e == 0, "External").alias("pre_omission"),
        F.when(
            e == 0, "external File entity was not fetched"
        ).alias("pre_message"),
        F.when(e.isin(2, 7, 8, 9, 10), h).alias("entity_hash"),
        F.when(e.isin(2, 7, 8, 9), "realmE")
        .when(e == 10, "realmX")
        .alias("hash_realm"),
        F.when(e.isin(1, 2, 3, 4, 5, 6), "realmE").alias("exact_realm"),
        F.when(e == 5, "n1").when(e.isin(1, 2, 3, 4, 6), "n0").alias(
            "exact_node"
        ),
        F.when(e.isin(1, 2, 3, 4, 5, 6), bkt).alias("exact_bucket"),
        F.when(e.isin(1, 2, 3, 4, 5, 6), key).alias("exact_key"),
    )
    # bucket exists except the no-bucket lane
    buckets = docs.filter(e.isin(1, 2, 4, 6)).select(bkt.alias("bucket"))
    # read permission rows: exact-path perms (denied lane 4 ABSENT),
    # alias perms (one alias of lane 7 denied)
    perms = (
        docs.filter(e.isin(1, 2, 6))
        .select(F.concat(F.lit("perm/"), bkt, F.lit("/"), key).alias("path"))
        .unionByName(
            docs.filter(e == 7).select(
                F.concat(F.lit("perm/a0/"), ds).alias("path")
            )
        )
    )
    # blob versions: stored hash (contradicting on lane 2), location
    # key present except the discover-hash lane 6
    versions = (
        docs.filter(e.isin(1, 2, 6))
        .select(
            bkt.alias("bucket"),
            key.alias("key"),
            F.when(e == 2, g).otherwise(h).alias("blob_hash"),
            F.when(e != 6, F.concat(F.lit("loc"), ds)).alias(
                "location_key"
            ),
        )
        .unionByName(
            docs.filter(e == 7).select(
                F.concat(F.lit("ab"), ds).alias("bucket"),
                F.concat(F.lit("ak0-"), ds).alias("key"),
                h.alias("blob_hash"),
                F.concat(F.lit("aloc"), ds).alias("location_key"),
            )
        )
    )
    locations = (
        docs.filter(e.isin(1, 2))
        .select(
            F.concat(F.lit("loc"), ds).alias("location_key"),
            F.when(e == 2, g).otherwise(h).alias("blake3"),
        )
        .unionByName(
            docs.filter(e == 7).select(
                F.concat(F.lit("aloc"), ds).alias("location_key"),
                h.alias("blake3"),
            )
        )
    )
    # hash-path aliases: lane 7 gets two in-realm (one denied) and one
    # foreign-realm row that the realm filter drops
    aliases = (
        docs.filter(e == 7)
        .select(
            h.alias("hash"),
            F.lit("realmE").alias("realm"),
            F.concat(F.lit("ab"), ds).alias("bucket"),
            F.concat(F.lit("ak0-"), ds).alias("key"),
            F.concat(F.lit("perm/a0/"), ds).alias("perm_path"),
        )
        .unionByName(
            docs.filter(e == 7).select(
                h.alias("hash"),
                F.lit("realmE").alias("realm"),
                F.concat(F.lit("ab"), ds).alias("bucket"),
                F.concat(F.lit("ak1-"), ds).alias("key"),
                F.concat(F.lit("perm/a1/"), ds).alias("perm_path"),
            )
        )
        .unionByName(
            docs.filter(e == 7).select(
                h.alias("hash"),
                F.lit("realmX").alias("realm"),
                F.concat(F.lit("ab"), ds).alias("bucket"),
                F.concat(F.lit("akx-"), ds).alias("key"),
                F.concat(F.lit("perm/ax/"), ds).alias("perm_path"),
            )
        )
    )
    # holders: lane 6 [n1, n2, n1] (node-dedup), lane 7 ten nodes
    # (REMOTE_ATTEMPTS cap), lane 9 none; lane 8's fetch FAILS
    holders = (
        docs.filter(e == 6)
        .select(
            h.alias("hash"),
            F.explode(
                F.array(F.lit("n1"), F.lit("n2"), F.lit("n1"))
            ).alias("node"),
        )
        .unionByName(
            docs.filter(e == 7).select(
                h.alias("hash"),
                F.explode(
                    F.array(*[F.lit(f"m{i}") for i in range(10)])
                ).alias("node"),
            )
        )
    )
    holders_unavailable = docs.filter(e == 8).select(h.alias("hash"))
    return {
        "entities": entities,
        "buckets": buckets,
        "perms": perms,
        "versions": versions,
        "locations": locations,
        "aliases": aliases,
        "holders": holders,
        "holders_unavailable": holders_unavailable,
    }


@register("export_resolve_candidates", oracle=_RESOLVE_ORACLE)
def export_resolve_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-entity payload-candidate assembly (resolve_entries ladder):
    candidate counts by source, the learned/contradicted hash rungs,
    and the Denied/Missing/Offline/Unsupported coding — all keyed
    joins on the catalog planes, no window, no collect."""
    fr = _resolve_frames(spark, sf_dir)
    ents = fr["entities"]
    # effective hash (realm filter) and same-realm exact
    eff_hash = F.when(
        F.col("hash_realm").isNull() | (F.col("hash_realm") == "realmE"),
        F.col("entity_hash"),
    )
    ents = ents.withColumn("eff_hash", eff_hash).withColumn(
        "exact_same_realm",
        F.col("exact_realm").isNotNull() & (F.col("exact_realm") == "realmE"),
    )
    # local exact ladder: bucket → perm → version → location
    ex = (
        ents.filter(F.col("exact_same_realm") & (F.col("exact_node") == "n0"))
        .join(
            fr["buckets"].withColumn("has_bucket", F.lit(True)),
            F.col("exact_bucket") == F.col("bucket"),
            "left",
        )
        .join(
            fr["perms"].withColumn("perm_ok", F.lit(True)),
            F.concat(
                F.lit("perm/"), F.col("exact_bucket"), F.lit("/"),
                F.col("exact_key"),
            )
            == F.col("path"),
            "left",
        )
        .join(
            fr["versions"].withColumnsRenamed(
                {"bucket": "vbucket", "key": "vkey"}
            ),
            (F.col("exact_bucket") == F.col("vbucket"))
            & (F.col("exact_key") == F.col("vkey")),
            "left",
        )
        .join(fr["locations"], "location_key", "left")
    )
    # ResolveResult per rs:562-620: Denied > Missing ladders > Candidate
    ex = ex.select(
        "doc_id",
        F.when(
            F.col("has_bucket").isNotNull() & F.col("perm_ok").isNull(),
            True,
        ).otherwise(False).alias("exact_denied"),
        F.when(
            F.col("has_bucket").isNotNull()
            & F.col("perm_ok").isNotNull()
            & F.col("blake3").isNotNull()
            & (F.col("blake3") == F.col("blob_hash")),
            F.col("blob_hash"),
        ).alias("exact_candidate_hash"),
        # Missing{hash}: version existed with a hash but no usable
        # location (rs:598-609)
        F.when(
            F.col("has_bucket").isNotNull()
            & F.col("perm_ok").isNotNull()
            & F.col("blob_hash").isNotNull()
            & (F.col("blake3").isNull() | (F.col("blake3") != F.col("blob_hash"))),
            F.col("blob_hash"),
        ).alias("discovered_hash"),
    )
    st = ents.join(ex, "doc_id", "left")
    remote_exact = F.col("exact_same_realm") & (F.col("exact_node") != "n0")
    has_local_exact = F.col("exact_candidate_hash").isNotNull()
    mismatch = (
        has_local_exact
        & F.col("eff_hash").isNotNull()
        & (F.col("eff_hash") != F.col("exact_candidate_hash"))
    ) | (
        F.col("discovered_hash").isNotNull()
        & F.col("eff_hash").isNotNull()
        & (F.col("eff_hash") != F.col("discovered_hash"))
    )
    learned = F.coalesce(F.col("eff_hash"), F.col("discovered_hash"))
    # doc-count-sized, 9 narrow cols; the alias/holder/unavailable
    # branches and the final assembly each re-derived the whole
    # exact-ladder subtree otherwise (4 derivations -> 1)
    st = st.select(
        "doc_id",
        "entity_id",
        "pre_omission",
        "pre_message",
        remote_exact.alias("remote_exact"),
        (has_local_exact & ~mismatch).alias("local_exact"),
        F.col("exact_denied").alias("any_exact_denied"),
        mismatch.alias("mismatch"),
        F.when(~mismatch, learned).alias("hash"),
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    # alias candidates (rs:620-660): realm filter, perm, version-hash
    # match, location-hash match
    al = (
        st.filter(F.col("hash").isNotNull())
        .select("doc_id", "hash")
        .join(
            fr["aliases"]
            .filter(F.col("realm") == "realmE")
            .withColumnRenamed("hash", "ahash"),
            F.col("hash") == F.col("ahash"),
        )
        .join(
            fr["perms"].withColumn("perm_ok", F.lit(True)),
            F.col("perm_path") == F.col("path"),
            "left",
        )
        .join(
            fr["versions"].withColumnsRenamed(
                {"bucket": "vbucket", "key": "vkey"}
            ),
            (F.col("bucket") == F.col("vbucket"))
            & (F.col("key") == F.col("vkey")),
            "left",
        )
        .join(fr["locations"], "location_key", "left")
    )
    al = al.groupBy("doc_id").agg(
        F.sum(
            (
                F.col("perm_ok").isNotNull()
                & (F.col("blob_hash") == F.col("hash"))
                & (F.col("blake3") == F.col("hash"))
            ).cast("int")
        ).alias("n_alias_local"),
        F.max(F.col("perm_ok").isNull()).alias("any_alias_denied"),
    )
    # holders (deduped by node, capped at REMOTE_ATTEMPTS - remote)
    ho = (
        st.filter(F.col("hash").isNotNull())
        .select("doc_id", "hash", "remote_exact")
        .join(fr["holders"], "hash")
        .select("doc_id", "node", "remote_exact")
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_holder_nodes"),
            F.max(F.col("remote_exact").cast("int")).alias("re"),
        )
        .select(
            "doc_id",
            F.least(
                F.col("n_holder_nodes"),
                F.lit(REMOTE_ATTEMPTS) - F.col("re"),
            ).alias("n_remote_hash"),
        )
    )
    un = st.filter(F.col("hash").isNotNull()).select("doc_id", "hash").join(
        fr["holders_unavailable"].withColumn("unavail", F.lit(True)),
        "hash",
        "left",
    ).select("doc_id", "unavail")
    out = (
        st.join(al, "doc_id", "left")
        .join(ho, "doc_id", "left")
        .join(un, "doc_id", "left")
    )
    n_local = (
        F.col("local_exact").cast("int")
        + F.coalesce(F.col("n_alias_local"), F.lit(0))
    )
    n_remote_exact = F.col("remote_exact").cast("int")
    n_remote_hash = F.coalesce(F.col("n_remote_hash"), F.lit(0))
    n_cand = n_local + n_remote_exact + n_remote_hash
    skipped = F.col("pre_omission").isNotNull()
    denied = F.coalesce(F.col("any_exact_denied"), F.lit(False)) | F.coalesce(
        F.col("any_alias_denied"), F.lit(False)
    )
    offline = (
        F.col("hash").isNotNull()
        & F.coalesce(F.col("unavail"), F.lit(False))
        & (n_cand == 0)
    )
    omission = (
        F.when(skipped, F.col("pre_omission"))
        .when(F.col("mismatch"), "Unsupported")
        .when(offline, "Offline")
        .when((n_cand == 0) & denied, "Denied")
        .when(n_cand == 0, "Missing")
    )
    message = (
        F.when(skipped, F.col("pre_message"))
        .when(F.col("mismatch"), "versioned ARN and content hash disagree")
        .when(offline, "blob holder discovery is unavailable")
        .when((n_cand == 0) & denied, "payload READ permission denied")
        .when(n_cand == 0, "no readable payload version was found")
    )
    zero = F.lit(0).cast("long")
    return out.select(
        "entity_id",
        F.when(skipped | F.col("mismatch") | offline, zero)
        .otherwise(n_cand.cast("long"))
        .alias("n_candidates"),
        F.when(skipped | F.col("mismatch") | offline, zero)
        .otherwise(n_local.cast("long"))
        .alias("n_local"),
        F.when(skipped | F.col("mismatch") | offline, zero)
        .otherwise(n_remote_exact.cast("long"))
        .alias("n_remote_exact"),
        F.when(skipped | F.col("mismatch") | offline, zero)
        .otherwise(n_remote_hash.cast("long"))
        .alias("n_remote_hash"),
        omission.alias("omission"),
        message.alias("message"),
    )


# ------------------------------------------------- report embedding
# ``add_report`` (export.rs:1514-1638) registered: the report entities
# embedded into one exported crate per document, with the context-safe
# term selection surfaced (existing-key reuse / compact / absolute),
# the scalar→array subjectOf promotion, the alias-keyed graph walk,
# the array-form about resolution, and both error rungs.
_EMBED_ORACLE = """
    WITH d AS (SELECT doc_id, doc_id % 7 AS lane FROM documents)
    SELECT 'doc-' || doc_id AS document_id,
           lane NOT IN (5, 6) AS ok,
           CASE lane WHEN 5 THEN 'reserved_report_id'
                     WHEN 6 THEN 'no_root' END AS error_kind,
           CASE WHEN lane IN (5, 6) THEN NULL
                WHEN lane = 2 THEN 'https://schema.org/subjectOf'
                ELSE 'subjectOf' END AS subject_key,
           CASE WHEN lane IN (5, 6) THEN NULL
                ELSE 'hasPart' END AS part_key,
           CASE WHEN lane IN (5, 6) THEN NULL
                ELSE 'encodingFormat' END AS encoding_key,
           CASE WHEN lane IN (5, 6) THEN NULL
                WHEN lane = 2 THEN 'https://schema.org/MediaObject'
                ELSE 'File' END AS file_type,
           CAST(CASE WHEN lane IN (5, 6) THEN NULL
                     WHEN lane = 1 THEN 2 ELSE 1 END AS BIGINT)
             AS n_subject_refs,
           CAST(CASE WHEN lane IN (5, 6) THEN NULL ELSE 4 END AS BIGINT)
             AS n_graph
    FROM d
"""


@register("export_report_embed", oracle=_EMBED_ORACLE)
def export_report_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embed the completeness report into one crate per document
    (:func:`aruna_spark.ingest.archive.add_export_report`) and surface
    the term-selection envelope. Arrow-batched mapInPandas over a
    spread narrow scan — corpus-linear, no shuffle."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from aruna_spark.ingest.archive import (
        JsonLdError,
        JsonLdKeywords,
        add_export_report,
    )
    from aruna_spark.ops.text import spread_for_cpu
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)
    CRATE11 = "https://w3id.org/ro/crate/1.1/context"
    META = "ro-crate-metadata.json"
    SUBJECT = (
        "subjectOf", "schema:subjectOf",
        "http://schema.org/subjectOf", "https://schema.org/subjectOf",
    )

    def crate_for(doc_id: int) -> str:
        lane = doc_id % 7
        descriptor = {"@id": META, "about": {"@id": "./"}}
        root = {"@id": "./", "@type": "Dataset", "name": f"d{doc_id}"}
        doc = {"@context": CRATE11, "@graph": [descriptor, root]}
        if lane == 1:
            root["subjectOf"] = {"@id": "#other"}
            root["hasPart"] = [{"@id": "a.txt"}]
        elif lane == 2:
            doc["@context"] = [
                CRATE11,
                {
                    "subjectOf": "https://example.org/x",
                    "File": "https://example.org/f",
                },
            ]
        elif lane == 3:
            doc = {
                "@context": {"identifier": "@id", "graph": "@graph"},
                "graph": [
                    {"identifier": f"./{META}", "about": f"./r{doc_id}"},
                    {"identifier": f"./r{doc_id}", "name": "root"},
                ],
            }
        elif lane == 4:
            descriptor["about"] = [42, {"@id": "./"}]
        elif lane == 5:
            doc["@graph"].append({"@id": "#aruna-export-report"})
        elif lane == 6:
            del descriptor["about"]
        return _json.dumps(doc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "document_id", "ok", "error_kind", "subject_key", "part_key",
            "encoding_key", "file_type", "n_subject_refs", "n_graph",
        ]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                try:
                    out = add_export_report(crate_for(doc_id))
                except JsonLdError as error:
                    kind = (
                        "reserved_report_id"
                        if "reserved" in str(error)
                        else "no_root"
                    )
                    rows.append(
                        (f"doc-{doc_id}", False, kind) + (None,) * 6
                    )
                    continue
                doc = _json.loads(out)
                kw = JsonLdKeywords(doc)
                graph = kw.graph(doc)
                report_file = next(
                    e for e in graph
                    if kw.object_id(e)
                    and kw.object_id(e)[1] == "aruna-export-report.json"
                )
                fragment = next(
                    e for e in graph
                    if kw.object_id(e)
                    and kw.object_id(e)[1] == "#aruna-export-report"
                )
                root = next(
                    e for e in graph
                    if kw.object_id(e)
                    and any(
                        kw.expands_to(k, SUBJECT) for k in e
                    )
                    and e is not fragment
                )
                subject_key = next(
                    k for k in root if kw.expands_to(k, SUBJECT)
                )
                part_key = next(
                    k for k in root
                    if kw.expands_to(
                        k,
                        (
                            "hasPart", "schema:hasPart",
                            "http://schema.org/hasPart",
                            "https://schema.org/hasPart",
                        ),
                    )
                )
                encoding_key = next(
                    k for k in report_file
                    if k not in ("@id", "@type")
                    and report_file[k] == "application/json"
                )
                refs = root[subject_key]
                rows.append(
                    (
                        f"doc-{doc_id}",
                        True,
                        None,
                        subject_key,
                        part_key,
                        encoding_key,
                        report_file["@type"],
                        len(refs) if isinstance(refs, list) else 1,
                        len(graph),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "document_id string, ok boolean, error_kind string, "
        "subject_key string, part_key string, encoding_key string, "
        "file_type string, n_subject_refs long, n_graph long",
    )
