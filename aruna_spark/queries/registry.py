"""Registry projection, listing orders, path claims, distributed merge.

Covers the event/registry operator family:

- event-log replay → registry rows (``operations/src/metadata/projector.rs
  :176-292``): idempotent projection of an append-only log into one row
  per entity via LWW;
- metadata listing orders (``operations/src/metadata/api.rs:105-112``):
  Created (ascending id) and Recent (desc updated_at, tie desc id),
  limit default 50;
- path-claim resolution (``core/src/structs/path_claim.rs:19-75``): a
  canonical path maps to exactly ONE winning claimant via a
  deterministic digest order, losers retained as conflicts;
- distributed SELECT merge (``api.rs:2911-2959``): per-node partial
  results dedup-unioned and cut at the query LIMIT — the oracle is the
  *semantic spec* (the global answer), not the per-node mechanics;
- substring search (``operations/src/search_users.rs:134-147``):
  case-insensitive contains, min 2 chars.

Scale: replay/LWW and path claims are single window functions over the
log (one shuffle on the entity key); the merge caps each side before the
union so no node ships more than LIMIT rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.merge import merge_into
from aruna_spark.queries import register

from aruna_spark.ops.listing import resolve_listing_limit

LISTING_LIMIT = resolve_listing_limit(None)  # api.rs:69 default (50)
MERGE_LIMIT = 50
NODES = 3


# ---------------------------------------------------- event-log → registry
_D_REGISTRY = """
    reg AS (
      SELECT user_id, last_event_id, updated_at_us, created_at_us,
             last_event_type, n_events
      FROM (
        SELECT user_id, event_id AS last_event_id,
               event_type AS last_event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                 AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events,
               MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS updated_at_us,
               MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS created_at_us
        FROM events
      ) WHERE rn = 1
    )
"""


def _registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
    )
    return _registry_of(ev)


def _registry_of(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_events",
            F.count(F.lit(1)).over(Window.partitionBy("user_id")),
        )
        .withColumn(
            "updated_at_us", F.max("ts_us").over(Window.partitionBy("user_id"))
        )
        .withColumn(
            "created_at_us", F.min("ts_us").over(Window.partitionBy("user_id"))
        )
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "updated_at_us",
            "created_at_us",
            F.col("event_type").alias("last_event_type"),
            "n_events",
        )
    )


@register(
    "registry_event_replay",
    oracle=f"WITH {_D_REGISTRY} SELECT * FROM reg",
)
def registry_event_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the event log into registry rows: LWW per entity + counts."""
    return _registry(spark, sf_dir)


# ---------------------------------------------------- incremental MERGE
@register(
    "registry_incremental_merge",
    oracle=f"WITH {_D_REGISTRY} SELECT * FROM reg",
)
def registry_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental projection as MERGE INTO: an existing registry snapshot
    (events with ``event_id % 10 < 7`` already applied) reconciled with a
    new event batch (the remaining 30%) via :func:`merge_into` — the
    lakehouse form of the projector's read-modify-write fold
    (``operations/src/metadata/projector.rs:176-292``).

    WHEN MATCHED: last-writer-wins on ``(updated_at_us, last_event_id)``
    (the projector's LWW rule), counters summed, watermark maxed.
    WHEN NOT MATCHED: new entity inserted. Target-only rows pass through.
    The oracle is the FULL replay — the merge of any prefix/suffix split
    must equal replaying the whole log, which is exactly the projector's
    idempotence/associativity contract.

    Scale: one shuffle on user_id for each partial + one for the merge
    join; the batch side is small in steady state, so AQE broadcasts it.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
    )
    snapshot = _registry_of(ev.filter(F.col("event_id") % 10 < 7))
    batch = _registry_of(ev.filter(F.col("event_id") % 10 >= 7))

    src_newer = (F.col("src.updated_at_us") > F.col("tgt.updated_at_us")) | (
        (F.col("src.updated_at_us") == F.col("tgt.updated_at_us"))
        & (F.col("src.last_event_id") > F.col("tgt.last_event_id"))
    )
    pick = lambda c: F.when(src_newer, F.col(f"src.{c}")).otherwise(F.col(f"tgt.{c}"))  # noqa: E731
    return merge_into(
        snapshot,
        batch,
        ["user_id"],
        when_matched={
            "last_event_id": pick("last_event_id"),
            "last_event_type": pick("last_event_type"),
            "updated_at_us": F.greatest(
                F.col("tgt.updated_at_us"), F.col("src.updated_at_us")
            ),
            "created_at_us": F.least(
                F.col("tgt.created_at_us"), F.col("src.created_at_us")
            ),
            "n_events": F.col("tgt.n_events") + F.col("src.n_events"),
        },
    )


# ----------------------------------------------------------- listing orders
@register(
    "registry_listing_recent",
    oracle=f"""
    WITH {_D_REGISTRY}
    SELECT * FROM reg
    ORDER BY updated_at_us DESC, user_id DESC LIMIT {LISTING_LIMIT}
    """,
)
def registry_listing_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent order: desc updated_at, tie desc id (api.rs:105-112)."""
    return _registry(spark, sf_dir).orderBy(
        F.desc("updated_at_us"), F.desc("user_id")
    ).limit(LISTING_LIMIT)


@register(
    "registry_listing_created",
    oracle=f"""
    WITH {_D_REGISTRY}
    SELECT * FROM reg
    ORDER BY created_at_us, user_id LIMIT {LISTING_LIMIT}
    """,
)
def registry_listing_created(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Created order: ascending first-event time, tie ascending id —
    the reference sorts on creation time (ULIDs encode it); the registry
    derives ``created_at_us`` as each entity's earliest event."""
    return (
        _registry(spark, sf_dir)
        .orderBy("created_at_us", "user_id")
        .limit(LISTING_LIMIT)
    )


# -------------------------------------------------------------- path claims
@register(
    "registry_path_claims",
    oracle="""
    WITH claims AS (
      SELECT 'p/' || (doc_id % 50) AS path, doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS digest
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY path
                                   ORDER BY digest, doc_id) AS rn
      FROM claims
    )
    SELECT path,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS winner_doc_id,
           COUNT(*) AS n_claimants,
           coalesce(string_agg(CASE WHEN rn > 1 THEN doc_id END, ','
                               ORDER BY digest, doc_id), '') AS conflict_doc_ids
    FROM ranked GROUP BY path
    """,
)
def registry_path_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic path-claim winner: min (digest, doc_id) per path;
    losers kept as ordered conflicts (path_claim.rs:41-75). The digest
    order makes the winner independent of claim arrival order."""
    return claim_winners(demo_claims(spark, sf_dir))


def demo_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic (path, doc_id, digest) claims relation the demo
    query and the facade's path lookup share."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("p/"), (F.col("doc_id") % 50).cast("string")).alias(
            "path"
        ),
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("digest"),
    )


def claim_winners(claims: DataFrame) -> DataFrame:
    """Winner + ordered conflicts per path over ANY claims relation.
    Point lookups filter claims BY PATH first (the scale-right shape —
    the window then ranks one path's claimants, not the realm)."""
    w = Window.partitionBy("path").orderBy("digest", "doc_id")
    ranked = claims.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("path").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
            "winner_doc_id"
        ),
        F.count(F.lit(1)).alias("n_claimants"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") > 1,
                            F.struct("digest", "doc_id"),
                        )
                    )
                ),
                lambda s: s["doc_id"].cast("string"),
            ),
        ).alias("conflict_doc_ids"),
    )


# ------------------------------------------------- distributed SELECT merge
@register(
    "distributed_select_merge",
    oracle=f"""
    SELECT doc_id, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id LIMIT {MERGE_LIMIT}
    """,
)
def distributed_select_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node top-LIMIT partials → dedup-union → global LIMIT
    (api.rs:2911-2959). The oracle is the semantic contract: the merged
    page equals the global answer because every node ships its own full
    top-LIMIT (resume_fetch_limit logic). Each node caps BEFORE the
    union, so no node ships more than LIMIT rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    parts = [
        docs.filter(F.col("doc_id") % NODES == i)
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(MERGE_LIMIT)
        for i in range(NODES)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return (
        merged.dropDuplicates()
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(MERGE_LIMIT)
    )


# --------------------------------------------------------- substring search
@register(
    "search_substring_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE contains(lower(c_name), '00001')
    ORDER BY c_custkey LIMIT 50
    """,
)
def search_substring_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search, min-2-chars validated
    (search_users.rs:134-147)."""
    q = "00001"
    if len(q.strip()) < 2:
        raise ValueError("substring query must be >= 2 chars")
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.lower(F.col("c_name")).contains(q.lower()))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(50)
    )


@register(
    "registry_doc_count",
    oracle=f"""
    WITH {_D_REGISTRY}
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN last_event_type <> 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_live
    FROM reg
    """,
)
def registry_doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realm document count (operations/src/metadata/stats.rs:18-35):
    registry size excluding tombstoned entities — here an entity whose
    latest event is an error tombstone. One aggregate over the replayed
    registry; the reference caches it, Spark just recomputes the
    O(entities) count."""
    reg = _registry(spark, sf_dir)
    return reg.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("last_event_type") != "error", 1).otherwise(0)
        ).cast("long").alias("n_live"),
    )


@register(
    "registry_snapshot_asof",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events WHERE event_id % 3 <> 2
    GROUP BY event_type
    """,
)
def registry_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated AS-OF read over a versioned table (SURVEY §4:
    fjall optimistic-txn snapshots -> table versions,
    ``storage/src/storage.rs:40-43``; ``aruna_spark/ops/versioned.py``).

    A three-commit history is built once per corpus into the store
    cache — v0 = events with ``event_id % 3 == 0``, v1 appends the
    ``% 3 == 1`` slice, v2 OVERWRITES with the ``% 3 == 2`` slice —
    and the query reads **version 1**: the pinned manifest still sees
    v0+v1's files even though the table's latest state (v2) has
    replaced them. The oracle replicates what version 1 contained
    (``event_id % 3 <> 2``), so the hash match proves the time-travel
    read, not just the aggregation.
    """
    import os

    from aruna_spark.ops.versioned import VersionedTable
    from aruna_spark.store import _ensure

    def build(tmp: str) -> None:
        t = VersionedTable(os.path.join(tmp, "table"))
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        t.commit(ev.filter(F.col("event_id") % 3 == 0))
        t.commit(ev.filter(F.col("event_id") % 3 == 1), mode="append")
        t.commit(ev.filter(F.col("event_id") % 3 == 2), mode="overwrite")

    dest = _ensure("versioned_events", sf_dir, build, src_name="events.parquet")
    snap = VersionedTable(os.path.join(dest, "table")).read(spark, version=1)
    # DECIMAL sum, double at the end (relational.py's convention): float
    # addition is order-dependent, so a double sum can drift in low bits
    # between Spark's shuffled partial aggregates and DuckDB's
    # sequential sum; fixed-point addition is order-independent
    return snap.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
