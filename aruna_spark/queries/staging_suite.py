"""Staging connector listing + HTTP autoindex queries (oracle-checked).

ListStagingSource (``operations/src/staging/list_source.rs:14-30``) and
the autoindex generate→parse roundtrip (``blob/src/autoindex.rs``) over
the latest object catalog. The autoindex oracle is the *ground truth*
directory table derived straight from the keys — so the check asserts
``parse(render(keys)) == truth``, i.e. the parser recovers exactly the
structure the generator encoded while dropping every noise anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.staging import (
    duck_list_source_level,
    list_source_level,
    parse_autoindex_pages,
    render_autoindex_pages,
)
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    live_latest,
    load_object_versions,
)

# staging listings walk the LIVE heads — delete markers hide keys here
# exactly as in ListObjectsV2
_KEYS_SQL = f"""
    SELECT key, size FROM ({OBJECTS_ORACLE_SQL})
    WHERE is_latest AND NOT is_delete_marker
"""


def _keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return live_latest(load_object_versions(spark, sf_dir)).select(
        "key", "size"
    )


@register(
    "staging_list_level",
    oracle=duck_list_source_level(
        _KEYS_SQL, "data/src1", offset=0, limit=15
    ),
)
def staging_list_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One directory level under data/src1: language dirs roll up, page
    envelope carries truncated/next_offset."""
    return list_source_level(
        _keys(spark, sf_dir), "data/src1", offset=0, limit=15
    )


@register(
    "staging_list_recursive",
    oracle=duck_list_source_level(
        _KEYS_SQL,
        "data/src2",
        offset=10,
        limit=25,
        recursive=True,
        files_only=True,
    ),
)
def staging_list_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive files-only walk under data/src2, second offset page —
    the resumable-scan shape the reference's staging API exposes."""
    return list_source_level(
        _keys(spark, sf_dir),
        "data/src2",
        offset=10,
        limit=25,
        recursive=True,
        files_only=True,
    )


@register(
    "autoindex_parse_entries",
    oracle=f"""
    WITH keys AS ({_KEYS_SQL}),
    leveled AS (
      SELECT key, size,
             COALESCE(array_to_string(split(key, '/')[1:i], '/'), '') AS dir,
             i AS depth
      FROM keys, UNNEST(range(0, len(split(key, '/')))) AS t(i)
    )
    SELECT dir,
           split(key, '/')[depth + 1] AS name,
           len(split(key, '/')) > depth + 1 AS is_dir,
           MIN(CASE WHEN len(split(key, '/')) = depth + 1
                THEN CAST(size AS BIGINT) END) AS size
    FROM leveled
    GROUP BY 1, 2, 3
    """,
)
def autoindex_parse_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render every directory's nginx-style index page (with parent /
    sort / escaping noise anchors), parse the pages back, and return the
    recovered entries — checked against the directory truth table."""
    pages = render_autoindex_pages(_keys(spark, sf_dir))
    return parse_autoindex_pages(pages)


# =============================================== Snapshot / Sync strategies
# The other two StagingStrategy arms (core/src/structs/staging.rs:9-13;
# Reference is modeled in queries/references.py):
#
# - **Snapshot** (operations/src/staging/snapshot.rs
#   MaterializeSnapshotOperation): read the source ONCE and drive
#   PutObject — the result is an ordinary MATERIALIZED version whose
#   bytes are the source's at bind time (etag commits to the source
#   bytes, blob_hash content-addresses them) with the
#   VersionSourceBinding carried (strategy=snapshot) for provenance;
#   the write is quota-gated (MaterializeSnapshotInput.quota_ceiling).
# - **Sync**: a snapshot that must FOLLOW the source — the drift sweep
#   compares each bound key's materialized etag against the source's
#   current state and emits the re-materialization worklist.
#
# Modeled bindings: docs with doc_id % 11 == 6 are snapshot-bound
# ('snap/...' keys), doc_id % 11 == 7 are sync-bound ('sync/...' keys);
# both source trees drift like the reference tree (truth_length =
# n_chars + doc_id % 7). The sync keys' PRIOR materialization captured
# n_chars bytes, so keys with doc_id % 7 != 0 have drifted.
#
# Scale shape: both are one equi-join of a bind dimension against the
# connector listing plus column algebra — no window, no catalog
# shuffle; the materialize batch's version minting joins only the
# touched destination keys.

SNAPSHOT_QUOTA_BYTES = 700


def _bound_docs(spark: SparkSession, sf_dir: str, residue: int) -> DataFrame:
    from aruna_spark.catalog import load_table

    return load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 11 == residue
    )


@register(
    "staging_snapshot_materialize",
    oracle=f"""
    SELECT 'staging' AS bucket,
           'snap/' || source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS key,
           CASE WHEN n_chars + doc_id % 7 <= {SNAPSHOT_QUOTA_BYTES}
                THEN 'v0' END AS version_id,
           CAST(CASE WHEN n_chars + doc_id % 7 <= {SNAPSHOT_QUOTA_BYTES}
                THEN n_chars + doc_id % 7 END AS BIGINT) AS size,
           CASE WHEN n_chars + doc_id % 7 <= {SNAPSHOT_QUOTA_BYTES}
                THEN md5('src:' || source || '/' || lang || '/doc-' || doc_id
                         || '.bin:' || (n_chars + doc_id % 7)) END AS etag,
           CASE WHEN n_chars + doc_id % 7 <= {SNAPSHOT_QUOTA_BYTES}
                THEN md5('blob:' || (n_chars + doc_id % 7)) END AS blob_hash,
           'snapshot' AS strategy,
           source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS source_path,
           CASE WHEN n_chars + doc_id % 7 <= {SNAPSHOT_QUOTA_BYTES}
                THEN 200 ELSE 507 END AS status
    FROM documents WHERE doc_id % 11 = 6
    """,
)
def staging_snapshot_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot bind batch materialized: each binding reads its
    source (the connector listing truth) and lands as a MATERIALIZED
    version — etag commits to the SOURCE bytes, blob_hash
    content-addresses them, the source binding is carried for
    provenance, and oversized sources fail the quota gate (507) without
    writing (snapshot.rs drives PutObject under
    MaterializeSnapshotInput.quota_ceiling)."""
    docs = _bound_docs(spark, sf_dir, 6)
    src_path = F.concat(
        F.col("source"), F.lit("/"), F.col("lang"), F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit(".bin"),
    )
    truth_len = (F.col("n_chars") + F.col("doc_id") % 7).cast("long")
    ok = truth_len <= SNAPSHOT_QUOTA_BYTES
    return docs.select(
        F.lit("staging").alias("bucket"),
        F.concat(F.lit("snap/"), src_path).alias("key"),
        F.when(ok, F.lit("v0")).alias("version_id"),
        F.when(ok, truth_len).alias("size"),
        F.when(
            ok,
            F.md5(
                F.concat(
                    F.lit("src:"), src_path, F.lit(":"),
                    truth_len.cast("string"),
                )
            ),
        ).alias("etag"),
        F.when(
            ok,
            F.md5(F.concat(F.lit("blob:"), truth_len.cast("string"))),
        ).alias("blob_hash"),
        F.lit("snapshot").alias("strategy"),
        src_path.alias("source_path"),
        F.when(ok, F.lit(200)).otherwise(F.lit(507)).alias("status"),
    )


@register(
    "staging_sync_drift",
    oracle="""
    SELECT 'staging' AS bucket,
           'sync/' || source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS key,
           source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS source_path,
           CAST(n_chars AS BIGINT) AS materialized_size,
           CAST(n_chars + doc_id % 7 AS BIGINT) AS source_size,
           doc_id % 7 <> 0 AS drifted,
           CASE WHEN doc_id % 7 <> 0 THEN 'rematerialize'
                ELSE 'in_sync' END AS action
    FROM documents WHERE doc_id % 11 = 7
    """,
)
def staging_sync_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sync drift sweep: every sync-bound key's materialized state
    (captured at bind time) compared against the source's CURRENT
    state; drifted keys emit the re-materialization worklist, in-sync
    keys no-op — the Sync strategy's follow loop as one equi-join."""
    docs = _bound_docs(spark, sf_dir, 7)
    src_path = F.concat(
        F.col("source"), F.lit("/"), F.col("lang"), F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit(".bin"),
    )
    mat = F.col("n_chars").cast("long")
    truth = (F.col("n_chars") + F.col("doc_id") % 7).cast("long")
    drift = mat != truth
    return docs.select(
        F.lit("staging").alias("bucket"),
        F.concat(F.lit("sync/"), src_path).alias("key"),
        src_path.alias("source_path"),
        mat.alias("materialized_size"),
        truth.alias("source_size"),
        drift.alias("drifted"),
        F.when(drift, F.lit("rematerialize"))
        .otherwise(F.lit("in_sync"))
        .alias("action"),
    )


# ================================================ connector registry listing
# The source connectors the staging strategies bind to are first-class
# records (core/src/structs/source_connector.rs:37-46: connector_id,
# group, name, kind, public_config, created/updated); ListSourceConnectors
# walks the keyspace per group (operations/src/connectors/
# list_source_connectors.rs). Modeled: the four deterministic connectors
# the reference bindings name (conn-0..conn-3), listed with a bound-
# object roll-up per strategy — the console view of the staging plane.


@register(
    "staging_list_connectors",
    oracle="""
    WITH bindings AS (
      SELECT 'conn-' || (doc_id % 4) AS connector_id,
             CASE WHEN doc_id % 2 = 0 THEN 's3' ELSE 'http' END AS kind,
             CASE doc_id % 11 WHEN 5 THEN 'reference'
                              WHEN 6 THEN 'snapshot'
                              ELSE 'sync' END AS strategy
      FROM documents WHERE doc_id % 11 IN (5, 6, 7)
    )
    SELECT connector_id, kind,
           CAST(COUNT(*) AS BIGINT) AS bound_objects,
           CAST(SUM(CASE WHEN strategy = 'reference' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reference,
           CAST(SUM(CASE WHEN strategy = 'snapshot' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_snapshot,
           CAST(SUM(CASE WHEN strategy = 'sync' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sync
    FROM bindings
    GROUP BY connector_id, kind
    """,
)
def staging_list_connectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListSourceConnectors with per-connector binding roll-ups: every
    staged object (all three strategies) counts under its connector and
    kind — one map-side-combinable groupBy over the binding relations."""
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 11).isin(5, 6, 7)
    )
    bindings = docs.select(
        F.concat(F.lit("conn-"), (F.col("doc_id") % 4).cast("string")).alias(
            "connector_id"
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit("s3"))
        .otherwise(F.lit("http"))
        .alias("kind"),
        F.when(F.col("doc_id") % 11 == 5, F.lit("reference"))
        .when(F.col("doc_id") % 11 == 6, F.lit("snapshot"))
        .otherwise(F.lit("sync"))
        .alias("strategy"),
    )
    return bindings.groupBy("connector_id", "kind").agg(
        F.count(F.lit(1)).cast("long").alias("bound_objects"),
        F.sum((F.col("strategy") == "reference").cast("int"))
        .cast("long")
        .alias("n_reference"),
        F.sum((F.col("strategy") == "snapshot").cast("int"))
        .cast("long")
        .alias("n_snapshot"),
        F.sum((F.col("strategy") == "sync").cast("int"))
        .cast("long")
        .alias("n_sync"),
    )


# The registered connector catalog the CRUD routes serve (conn-0..3
# carry bindings; conn-4 is registered but unbound — the deletable
# lane in tests/test_api.py::test_connector_crud_routes).
CONNECTOR_CATALOG = (
    ("conn-0", True),
    ("conn-1", False),
    ("conn-2", True),
    ("conn-3", False),
    ("conn-4", False),
)


@register(
    "connector_reference_guard",
    oracle="""
    WITH catalog(connector_id, has_secret) AS (
      VALUES ('conn-0', TRUE), ('conn-1', FALSE), ('conn-2', TRUE),
             ('conn-3', FALSE), ('conn-4', FALSE)
    ),
    refs AS (
      SELECT 'conn-' || (doc_id % 4) AS connector_id,
             CAST(COUNT(*) AS BIGINT) AS n_reference
      FROM documents WHERE doc_id % 11 = 5
      GROUP BY 1
    )
    SELECT c.connector_id, c.has_secret,
           CAST(COALESCE(r.n_reference, 0) AS BIGINT) AS n_reference,
           r.n_reference IS NOT NULL AS referenced,
           r.n_reference IS NULL AS deletable
    FROM catalog c LEFT JOIN refs r USING (connector_id)
    """,
)
def connector_reference_guard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The delete/replace guard relation behind the connector CRUD
    routes (delete_source_connector.rs:184-199,
    replace_source_connector.rs:231-249 via
    ``blob_version_references_connector``, repository.rs:175-180):
    per registered connector, how many versions are still in
    Reference STATE through it — any makes delete (and
    secret-changing replace) refuse 409; zero makes it deletable
    together with its secret record. Only reference-strategy bindings
    pin a connector: snapshot/sync versions materialized. The binding
    roll-up is one map-side-combinable groupBy; the 5-row catalog
    broadcasts."""
    from aruna_spark.catalog import load_table

    catalog = spark.createDataFrame(
        list(CONNECTOR_CATALOG), "connector_id string, has_secret boolean"
    )
    refs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 5)
        .groupBy(
            F.concat(
                F.lit("conn-"), (F.col("doc_id") % 4).cast("string")
            ).alias("connector_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    # right outer preserves the catalog; the aggregated refs side
    # (<= 4 rows) is the broadcastable build side
    return F.broadcast(refs).join(catalog, "connector_id", "right").select(
        "connector_id",
        "has_secret",
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_reference"),
        F.col("__n").isNotNull().alias("referenced"),
        F.col("__n").isNull().alias("deletable"),
    )


# =============================================== portable source descriptor
# operations/src/staging/descriptor.rs (r14 uncited-file sweep find):
# every staged binding carries a PortableSourceDescriptor built from the
# connector + the source HEAD metadata —
# - version_selector (rs:44-46): 'version:' || the TRIMMED
#   source_version, None when missing or whitespace-only (non_empty,
#   rs:65-70);
# - capabilities (rs:48-63): 'head' and 'read' ALWAYS, then
#   'versioned' / 'etag' / 'last_modified' / 'content_type' exactly
#   when the corresponding metadata field is present (strings
#   trim-checked, last_modified by presence alone), in that fixed
#   order;
# - kind / public_config copied from the connector, the source path
#   and optional origin node threaded through
#   (build_portable_source_descriptor rs:8-22;
#   build_version_source_binding rs:24-42 wraps it with the staging
#   strategy + connector id).
# Metadata-presence lanes use moduli 3/2/5/7 — pairwise coprime with
# each other and with the % 11 binding filter (CRT-safe).
@register(
    "staging_source_descriptor",
    oracle="""
    WITH bound AS (
      SELECT doc_id, source, lang,
             CASE WHEN doc_id % 11 = 6 THEN 'snapshot' ELSE 'sync' END
               AS strategy,
             CASE WHEN doc_id % 11 = 6 THEN 'snap' ELSE 'sync' END
               AS tree,
             CASE doc_id % 3 WHEN 1 THEN 'v' || doc_id
                             WHEN 2 THEN '   ' END AS src_version,
             CASE WHEN doc_id % 2 = 1
                  THEN '"etag-' || doc_id || '"' END AS etag,
             CASE WHEN doc_id % 5 >= 2
                  THEN 1700000000000 + doc_id END AS last_modified,
             CASE doc_id % 7 WHEN 0 THEN NULL WHEN 1 THEN ' '
                             ELSE 'text/plain' END AS content_type
      FROM documents WHERE doc_id % 11 IN (6, 7)
    )
    SELECT doc_id, strategy,
           'conn-' || (doc_id % 5) AS connector_id,
           's3' AS kind,
           'endpoint=https://s3.example/' || source AS public_config,
           source || '/' || lang || '/doc-' || doc_id || '.bin'
             AS source_path,
           CASE WHEN TRIM(src_version) <> ''
                THEN 'version:' || TRIM(src_version) END
             AS version_selector,
           'head,read'
             || CASE WHEN TRIM(COALESCE(src_version, '')) <> ''
                     THEN ',versioned' ELSE '' END
             || CASE WHEN TRIM(COALESCE(etag, '')) <> ''
                     THEN ',etag' ELSE '' END
             || CASE WHEN last_modified IS NOT NULL
                     THEN ',last_modified' ELSE '' END
             || CASE WHEN TRIM(COALESCE(content_type, '')) <> ''
                     THEN ',content_type' ELSE '' END
             AS capabilities
    FROM bound
    """,
)
def staging_source_descriptor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build the portable source descriptor for every staged binding
    (descriptor.rs:8-70): trim-aware version selector, the fixed-order
    capability list gated by metadata-field presence, and the
    connector's kind/public_config pass-through. Pure column algebra
    over the binding dimension — no UDF, no shuffle."""
    from aruna_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 11).isin(6, 7)
    )
    k = F.col("doc_id")
    src_version = (
        F.when(k % 3 == 1, F.concat(F.lit("v"), k.cast("string")))
        .when(k % 3 == 2, F.lit("   "))
    )
    etag = F.when(
        k % 2 == 1, F.concat(F.lit('"etag-'), k.cast("string"), F.lit('"'))
    )
    last_modified = F.when(k % 5 >= 2, F.lit(1700000000000) + k)
    content_type = (
        F.when(k % 7 == 1, F.lit(" "))
        .when(k % 7 != 0, F.lit("text/plain"))
    )

    def present(col: F.Column) -> F.Column:
        return F.trim(F.coalesce(col, F.lit(""))) != ""

    caps = F.concat(
        F.lit("head,read"),
        F.when(present(src_version), F.lit(",versioned")).otherwise(
            F.lit("")
        ),
        F.when(present(etag), F.lit(",etag")).otherwise(F.lit("")),
        F.when(last_modified.isNotNull(), F.lit(",last_modified"))
        .otherwise(F.lit("")),
        F.when(present(content_type), F.lit(",content_type")).otherwise(
            F.lit("")
        ),
    )
    return d.select(
        "doc_id",
        F.when(k % 11 == 6, "snapshot").otherwise("sync").alias(
            "strategy"
        ),
        F.concat(F.lit("conn-"), (k % 5).cast("string")).alias(
            "connector_id"
        ),
        F.lit("s3").alias("kind"),
        F.concat(
            F.lit("endpoint=https://s3.example/"), F.col("source")
        ).alias("public_config"),
        F.concat(
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/doc-"),
            k.cast("string"),
            F.lit(".bin"),
        ).alias("source_path"),
        F.when(
            present(src_version),
            F.concat(F.lit("version:"), F.trim(src_version)),
        ).alias("version_selector"),
        caps.alias("capabilities"),
    )


# ----------------------------------------------- autoindex dialect parse
# The full-fidelity autoindex parser (aruna_spark/ops/autoindex.py —
# blob/src/autoindex.rs:239-646) over the three real-world dialects
# the reference's fixture pages use: nginx pre (DD-MMM-YYYY, plain
# byte sizes), Apache pre (Parent Directory link, YYYY-MM-DD, K/M
# suffixes at 1024 multiples, an absolute footer URL to skip), and
# Apache fancy table (?C=N;O=D sort links, icon+name duplicate anchors
# MERGED into one entry, fractional suffix sizes). One rendered page
# per document (dialect = doc_id % 3), parsed by the Arrow-batched
# ``autoindex_entries`` face; the oracle derives every expected row
# from the lane arithmetic + strptime — independent of the parser.
_DIALECT_ORACLE = """
    WITH d AS (SELECT doc_id, doc_id % 3 AS dialect FROM documents)
    SELECT 'pub/d' || doc_id AS dir, name, is_dir, size, modified
    FROM d, LATERAL (
      SELECT * FROM (VALUES
        ('sub' || doc_id, TRUE, CAST(NULL AS BIGINT),
         CAST(epoch(strptime('04-Oct-2004 15:39', '%d-%b-%Y %H:%M'))
              AS BIGINT), 0),
        ('f' || doc_id || '.dat', FALSE,
         CAST(doc_id % 997 + 11 AS BIGINT),
         CAST(epoch(strptime('04-Oct-2004 15:39', '%d-%b-%Y %H:%M'))
              AS BIGINT), 0),
        ('n ' || doc_id || '.txt', FALSE,
         CAST(doc_id % 997 + 12 AS BIGINT),
         CAST(epoch(strptime('04-Oct-2004 15:39', '%d-%b-%Y %H:%M'))
              AS BIGINT), 0),
        ('adir' || doc_id, TRUE, CAST(NULL AS BIGINT),
         CAST(epoch(strptime('2026-07-09 08:58', '%Y-%m-%d %H:%M'))
              AS BIGINT), 1),
        ('R' || doc_id || '.txt', FALSE,
         CAST((doc_id % 50 + 1) * 1024 AS BIGINT),
         CAST(epoch(strptime('2026-07-09 08:58', '%Y-%m-%d %H:%M'))
              AS BIGINT), 1),
        ('f' || doc_id || '.tsv', FALSE,
         CAST((doc_id % 9) * 1024 + 512 AS BIGINT),
         CAST(epoch(strptime('2026-07-10 09:00', '%Y-%m-%d %H:%M'))
              AS BIGINT), 2)
      ) AS v(name, is_dir, size, modified, dia)
      WHERE dia = dialect
    )
"""


def render_dialect_pages(docs: DataFrame) -> DataFrame:
    """(doc_id) → one (dir, html) autoindex page per document in the
    document's dialect lane, built columnar (pure concat)."""
    d = F.col("doc_id")
    ds = d.cast("string")
    dialect = d % 3
    dirname = F.concat(F.lit("pub/d"), ds)
    nginx_size = (d % 997 + 11).cast("string")
    nginx_size2 = (d % 997 + 12).cast("string")
    apache_k = (d % 50 + 1).cast("string")
    table_size = F.concat((d % 9).cast("string"), F.lit(".5K"))
    nginx = F.concat(
        F.lit('<html><head><title>Index of /pub/d'), ds,
        F.lit('</title></head><body><h1>Index of /pub/d'), ds,
        F.lit('</h1><hr><pre><a href="../">../</a>\n'),
        F.lit('<a href="sub'), ds, F.lit('/">sub'), ds,
        F.lit('/</a>                04-Oct-2004 15:39    -\n'),
        F.lit('<a href="f'), ds, F.lit('.dat">f'), ds,
        F.lit('.dat</a>             04-Oct-2004 15:39  '), nginx_size,
        F.lit('\n<a href="n%20'), ds, F.lit('.txt">n '), ds,
        F.lit('.txt</a>            04-Oct-2004 15:39  '), nginx_size2,
        F.lit('\n</pre><hr></body></html>'),
    )
    apache_pre = F.concat(
        F.lit('<html><head><title>Index of /pub/d'), ds,
        F.lit('</title></head><body><h1>Index of /pub/d'), ds,
        F.lit('</h1><pre><a href="/pub/">Parent Directory</a>'),
        F.lit('                 -\n'),
        F.lit('<a href="adir'), ds, F.lit('/">adir'), ds,
        F.lit('/</a>        2026-07-09 08:58    -\n'),
        F.lit('<a href="R'), ds, F.lit('.txt">R'), ds,
        F.lit('.txt</a>     2026-07-09 08:58  '), apache_k,
        F.lit('K\n</pre><hr>'),
        F.lit('<a href="https://example.org/mirror/">mirror</a>'),
        F.lit('</body></html>'),
    )
    table = F.concat(
        F.lit('<html><head><title>Index of /pub/d'), ds,
        F.lit('</title></head><body><table>'),
        F.lit('<tr><th><a href="?C=N;O=D">Name</a></th>'),
        F.lit('<th><a href="?C=M;O=A">Last modified</a></th></tr>'),
        F.lit('<tr><td><a href="/pub/">Parent Directory</a></td>'),
        F.lit('<td>-</td></tr>'),
        F.lit('<tr><td><a href="f'), ds, F.lit('.tsv">'),
        F.lit('<img src="/icons/text.gif" alt="[TXT]"></a> '),
        F.lit('<a href="f'), ds, F.lit('.tsv">f'), ds,
        F.lit('.tsv</a></td><td>2026-07-10 09:00</td><td>'),
        table_size, F.lit('</td></tr>'),
        F.lit('</table></body></html>'),
    )
    html = (
        F.when(dialect == 0, nginx)
        .when(dialect == 1, apache_pre)
        .otherwise(table)
    )
    return docs.select(dirname.alias("dir"), html.alias("html"))


@register("autoindex_dialect_entries", oracle=_DIALECT_ORACLE)
def autoindex_dialect_entries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parse one autoindex page per document — nginx / Apache pre /
    Apache table dialect by lane — through the full-fidelity kernel:
    noise-anchor skip, icon+name merge, size-suffix and both date
    grammars, percent-decoded names. Corpus-linear mapInPandas over a
    spread narrow scan."""
    from aruna_spark.catalog import load_table
    from aruna_spark.ops.autoindex import autoindex_entries
    from aruna_spark.ops.text import spread_for_cpu
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return autoindex_entries(render_dialect_pages(docs))
