"""Blob-holder DHT maintenance: the holder-set refresh sweep over the
blob-locations keyspace and the holder lookup's classification
(``operations/src/blob_holders.rs``).

Reference surface:

- rs:18 — ``HOLDER_REFRESH_PAGE_SIZE = 256``: the refresh walks
  BLOB_LOCATIONS in key order, 256 keys per page.
- rs:144-152 — a location key is ``BlobLocationKey { blake3_hash,
  backend_ref }``; copies of one hash SORT TOGETHER, so publishing
  once per run of equal hashes (``last_published`` compare) registers
  every distinct blob exactly once even though each backend has its
  own entry.
- rs:85-90 — each distinct hash costs one DHT registration
  (``dht_registration_effect``: key = the blake3 hash, this realm +
  node, EMPTY value, TTL = ``holder_ttl_ms`` — rs:341-357 pins 90 s
  from 90 000 ms); ``refreshed`` counts the publishes, and a failed
  put still advances the scan (rs:159-163: PutComplete and Dht/Net
  errors all step to the next effect — the rs:425-428 test finalizes
  Ok(2) with its second put failing).
- rs:253-259 (``GetBlobHoldersOperation::finish``) — a holder lookup
  maps the DHT entries for a hash to node ids, drops SELF, sorts by
  the node id's byte representation, and dedups. The DHT get itself
  carries ``realm_filter = Some(realm)`` (rs:268-271), and an entry
  whose TTL lapsed is gone from the table — both drops happen before
  ``finish`` ever sees the entry.
- rs:300-307 — an aborted lookup must NOT read as an empty holder
  set (the caller reports the gap instead of claiming it enumerated
  every copy) — pinned in tests, not a relation.

Spark mapping: the locations keyspace uses the repo-wide blob
conventions (``blob_hash = md5('blob:' || n_chars)``, primary copy at
``backend-(n_chars % 3)`` — reclaim/hashpaths/usage modules); the
refresh is one distinct + groupBy on the leading key component with a
two-level rank for scan/publish positions (the hash's first hex char
is the partition prefix), the lookup is an explode + CASE + groupBy.

Fixture lanes: replica copy at ``backend-((n_chars+1) % 3)`` when
``doc_id % 7 == 1``; a named ``cold`` copy (the rs:328-330 test's
``BackendRef::Node("cold")``) when ``doc_id % 11 == 5``. DHT entries
per hash seed h = n_chars: j ∈ 0..h%4, node ``node((h + (j%3)·2) % 8)``
(j = 3 repeats j = 0's node — the dedup lane), realm lane (h+j)%5
(3 → foreign realm), expiry lane (h+j)%7 (≤1 → lapsed at NOW
100 000). Self node = ``node3``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.ordering import global_scan_pos
from aruna_spark.queries import register

HOLDER_REFRESH_PAGE_SIZE = 256  # blob_holders.rs:18
HOLDER_TTL_MS = 90_000  # the rs:341-357 registration test's limits
SELF_NODE = "node3"
REALM = "realm-2"  # the hashpaths convention's realm for grp-main
DHT_NOW_MS = 100_000

_LOCATIONS_SQL = """
    blob_locations AS (
      SELECT DISTINCT md5('blob:' || n_chars) AS blob_hash,
             'backend-' || (n_chars % 3) AS backend
      FROM documents
      UNION
      SELECT DISTINCT md5('blob:' || n_chars),
             'backend-' || ((n_chars + 1) % 3)
      FROM documents WHERE doc_id % 7 = 1
      UNION
      SELECT DISTINCT md5('blob:' || n_chars), 'cold'
      FROM documents WHERE doc_id % 11 = 5
    )
"""


def load_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLOB_LOCATIONS keyspace: one key per stored copy,
    ``blake3 ‖ backend_ref`` (hash leads, so copies are adjacent)."""
    d = load_table(spark, sf_dir, "documents")
    hash_of = F.md5(
        F.concat(F.lit("blob:"), F.col("n_chars").cast("string"))
    )
    # r15: ONE corpus scan emits primary + conditional replica/cold
    # copies (struct array + explode; was a 3-branch union = 3 scans
    # per consumer, and the rank helper reads this relation twice)
    primary = F.concat(
        F.lit("backend-"), (F.col("n_chars") % 3).cast("string")
    )
    replica = F.concat(
        F.lit("backend-"), ((F.col("n_chars") + 1) % 3).cast("string")
    )
    has_r = F.col("doc_id") % 7 == 1
    has_c = F.col("doc_id") % 11 == 5
    cold = F.lit("cold")
    backends = (
        F.when(has_r & has_c, F.array(primary, replica, cold))
        .when(has_r, F.array(primary, replica))
        .when(has_c, F.array(primary, cold))
        .otherwise(F.array(primary))
    )
    return (
        d.select(
            hash_of.alias("blob_hash"),
            F.explode(backends).alias("backend"),
        )
        .distinct()
    )


@register(
    "blob_holders_refresh",
    oracle=f"""
    WITH {_LOCATIONS_SQL.strip()},
    keyed AS (
      SELECT blob_hash, backend,
             CAST(ROW_NUMBER() OVER (ORDER BY blob_hash, backend)
                  AS BIGINT) AS scan_pos
      FROM blob_locations
    )
    SELECT blob_hash,
           CAST(COUNT(*) AS BIGINT) AS copies,
           MIN(backend) AS first_backend,
           MIN(scan_pos) AS first_scan_pos,
           CAST((MIN(scan_pos) - 1) // {HOLDER_REFRESH_PAGE_SIZE}
                AS BIGINT) AS page,
           CAST(ROW_NUMBER() OVER (ORDER BY blob_hash) AS BIGINT)
             AS publish_pos,
           CAST({HOLDER_TTL_MS} // 1000 AS BIGINT) AS ttl_s
    FROM keyed
    GROUP BY blob_hash
    """,
)
def blob_holders_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The holder-refresh sweep as a relation: one DHT registration
    per distinct blob hash (rs:144-152 run-length dedup — relationally
    a groupBy on the key's leading component), carrying the copy
    count, the scan page the publish was enqueued from (256-key pages,
    rs:18), its publish ordinal, and the registration TTL
    (rs:341-357). ``refreshed`` (rs:85-90) is the relation's row
    count.

    Scale shape: one distinct + one groupBy on the hash, scan and
    publish positions from the two-level partitioned rank (the hash's
    first hex char is the partition prefix of both sort keys) — no
    unpartitioned window, no driver paging loop."""
    return refresh_of(load_locations(spark, sf_dir))


def refresh_of(locations: DataFrame) -> DataFrame:
    """The refresh pipeline over any BLOB_LOCATIONS relation
    (blob_hash, backend) — see :func:`blob_holders_refresh`."""
    # r15: each global_scan_pos reads its input twice (per-bucket totals
    # + the ranked join), nesting to ~6 derivations of the locations
    # union — materialize the narrow relation at both rank inputs
    locs = locations.withColumn(
        "__bucket", F.substring("blob_hash", 1, 1)
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    keyed = global_scan_pos(
        locs, ["__bucket"], ["blob_hash", "backend"], out_col="scan_pos"
    )
    hashes = keyed.groupBy("blob_hash").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.min("backend").alias("first_backend"),
        F.min("scan_pos").alias("first_scan_pos"),
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    hashes = global_scan_pos(
        hashes.withColumn("__bucket", F.substring("blob_hash", 1, 1)),
        ["__bucket"],
        ["blob_hash"],
        out_col="publish_pos",
    ).drop("__bucket")
    return hashes.select(
        "blob_hash",
        "copies",
        "first_backend",
        "first_scan_pos",
        F.floor((F.col("first_scan_pos") - 1) / HOLDER_REFRESH_PAGE_SIZE)
        .cast("long")
        .alias("page"),
        "publish_pos",
        F.lit(HOLDER_TTL_MS // 1000).cast("long").alias("ttl_s"),
    )


_DHT_ENTRIES_SQL = f"""
    hash_seeds AS (
      SELECT DISTINCT n_chars AS h, md5('blob:' || n_chars) AS blob_hash
      FROM documents
    ),
    dht_entries AS (
      SELECT s.blob_hash, s.h, t.j,
             'node' || ((s.h + (t.j % 3) * 2) % 8) AS node_id,
             CASE WHEN (s.h + t.j) % 5 = 3 THEN 'realm-1'
                  ELSE '{REALM}' END AS realm_id,
             CAST(90000 + ((s.h + t.j) % 7) * 5000 AS BIGINT)
               AS expires_at
      FROM hash_seeds s, range(4) t(j)
      WHERE t.j <= s.h % 4
    )
"""


def load_dht_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DHT's holder entries per blob hash (DhtEntry { node_id,
    realm_id, expires_at } — rs tests:331-338)."""
    seeds = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("n_chars").alias("h"))
        .distinct()
        .withColumn(
            "blob_hash",
            F.md5(F.concat(F.lit("blob:"), F.col("h").cast("string"))),
        )
    )
    h, j = F.col("h"), F.col("j")
    return seeds.select(
        "blob_hash",
        "h",
        F.explode(F.sequence(F.lit(0), h % 4)).alias("j"),
    ).select(
        "blob_hash",
        "h",
        "j",
        F.concat(
            F.lit("node"), ((h + (j % 3) * 2) % 8).cast("string")
        ).alias("node_id"),
        F.when((h + j) % 5 == 3, "realm-1")
        .otherwise(REALM)
        .alias("realm_id"),
        (F.lit(90_000) + ((h + j) % 7) * 5_000)
        .cast("long")
        .alias("expires_at"),
    )


@register(
    "blob_holders_get",
    oracle=f"""
    WITH {_DHT_ENTRIES_SQL.strip()},
    classified AS (
      SELECT blob_hash, node_id,
             CASE WHEN realm_id <> '{REALM}' THEN 'wrong_realm'
                  WHEN expires_at <= {DHT_NOW_MS} THEN 'expired'
                  WHEN node_id = '{SELF_NODE}' THEN 'self'
                  ELSE 'live' END AS lane
      FROM dht_entries
    )
    SELECT blob_hash,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(COUNT(*) FILTER (WHERE lane = 'wrong_realm') AS BIGINT)
             AS n_wrong_realm,
           CAST(COUNT(*) FILTER (WHERE lane = 'expired') AS BIGINT)
             AS n_expired,
           CAST(COUNT(*) FILTER (WHERE lane = 'self') AS BIGINT)
             AS n_self,
           CAST(COUNT(DISTINCT CASE WHEN lane = 'live' THEN node_id END)
                AS BIGINT) AS n_holders,
           CAST(COUNT(*) FILTER (WHERE lane = 'live') AS BIGINT)
             - CAST(COUNT(DISTINCT CASE WHEN lane = 'live'
                          THEN node_id END) AS BIGINT)
             AS n_dup_collapsed,
           COALESCE(array_to_string(list_sort(list_distinct(
             list(node_id) FILTER (WHERE lane = 'live'))), ','), '')
             AS holders
    FROM classified
    GROUP BY blob_hash
    """,
)
def blob_holders_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The holder lookup's full classification per blob hash: entries
    the DHT realm filter drops (rs:268-271), entries whose TTL lapsed,
    the SELF exclusion, and the sort + dedup that yields the holder
    list (rs:253-259) — every lane counted so the lookup's shrinkage
    from raw entries to served holders is auditable."""
    return holders_get_of(load_dht_entries(spark, sf_dir))


def holders_get_of(entries: DataFrame) -> DataFrame:
    """The lookup classification over any DHT-entry relation
    (blob_hash, node_id, realm_id, expires_at) — see
    :func:`blob_holders_get`."""
    e = entries
    lane = (
        F.when(F.col("realm_id") != REALM, "wrong_realm")
        .when(F.col("expires_at") <= DHT_NOW_MS, "expired")
        .when(F.col("node_id") == SELF_NODE, "self")
        .otherwise("live")
    )
    classified = e.select("blob_hash", "node_id", lane.alias("lane"))
    live_node = F.when(F.col("lane") == "live", F.col("node_id"))
    return classified.groupBy("blob_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_entries"),
        F.sum((F.col("lane") == "wrong_realm").cast("long")).alias(
            "n_wrong_realm"
        ),
        F.sum((F.col("lane") == "expired").cast("long")).alias(
            "n_expired"
        ),
        F.sum((F.col("lane") == "self").cast("long")).alias("n_self"),
        F.count_distinct(live_node).cast("long").alias("n_holders"),
        (
            F.sum((F.col("lane") == "live").cast("long"))
            - F.count_distinct(live_node)
        )
        .cast("long")
        .alias("n_dup_collapsed"),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list(live_node))), ","
        ).alias("holders"),
    )


# -------------------------------------------- decade-harness fixtures
# The registered fixtures key blobs by n_chars, whose distinct domain
# SATURATES across decades (SCALE.md r12 caveat: the flat decade rows
# measured per-hash cost over a bounded hash population, not the
# corpus-linear scan). These variants key one blob per DOCUMENT, so
# the locations keyspace and the DHT entry table grow with the corpus
# and the decade rows measure the production shape: one scan + one
# once-per-hash groupBy (refresh), one explode + groupBy (lookup).
# Measured by scripts/bench_decade.py; NOT registered (the sf0.01
# oracle keeps the n_chars fixture so driver-checked results are
# unchanged).
def blob_holders_refresh_decade(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hash_of = F.md5(
        F.concat(F.lit("blob:doc:"), F.col("doc_id").cast("string"))
    )
    primary = d.select(
        hash_of.alias("blob_hash"),
        F.concat(F.lit("backend-"), (F.col("doc_id") % 3).cast("string"))
        .alias("backend"),
    )
    replica = d.filter(F.col("doc_id") % 7 == 1).select(
        hash_of.alias("blob_hash"),
        F.concat(
            F.lit("backend-"), ((F.col("doc_id") + 1) % 3).cast("string")
        ).alias("backend"),
    )
    cold = d.filter(F.col("doc_id") % 11 == 5).select(
        hash_of.alias("blob_hash"), F.lit("cold").alias("backend")
    )
    return refresh_of(
        primary.unionByName(replica).unionByName(cold).distinct()
    )


def blob_holders_get_decade(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    seeds = d.select(
        F.col("doc_id").alias("h"),
        F.md5(
            F.concat(F.lit("blob:doc:"), F.col("doc_id").cast("string"))
        ).alias("blob_hash"),
    )
    h, j = F.col("h"), F.col("j")
    entries = seeds.select(
        "blob_hash",
        "h",
        F.explode(F.sequence(F.lit(0), h % 4)).alias("j"),
    ).select(
        "blob_hash",
        F.concat(
            F.lit("node"), ((h + (j % 3) * 2) % 8).cast("string")
        ).alias("node_id"),
        F.when((h + j) % 5 == 3, "realm-1").otherwise(REALM).alias(
            "realm_id"
        ),
        (F.lit(90_000) + ((h + j) % 7) * 5_000)
        .cast("long")
        .alias("expires_at"),
    )
    return holders_get_of(entries)
