"""Node-info heartbeat utilization — the published per-node
``NodeInfoDocument`` numbers (``operations/src/node_info.rs``), the
PRODUCTION side of the dashboard view ``realm_nodes_info`` consumes.

Reference surface:

- rs:182-190 (``held_placement_set``) — the ``(strategy, shard)``
  buckets a node holds across every strategy; a document counts as
  held when its RECORDED placement bucket is in this set, "so
  everywhere-replicated registry rows are not each counted as local".
- rs:192-230 (``count_held_documents``) — walk the registry index and
  count records whose placement is NIL ("NIL placements predate any
  strategy and are held by every local node") or in the held set;
  rs:165-180 — the count degrades to None on storage error, never
  failing the heartbeat (error plumbing, not relational).
- rs:232-253 (``read_load_permille`` / ``permille_of``) — the
  1-minute load average scaled to permille of logical-core capacity,
  ``round`` half-away-from-zero, clamped to 0..=1000; ZERO cores
  yields 0 instead of dividing by zero.
- rs:31 — the 60 s publish cadence (pinned as a constant test).

Spark mapping: the held set composes the modeled placement plane —
shard-topic subjects resolved through the SAME two-level weighted
rendezvous as :func:`aruna_spark.queries.placement.resolve_holders`
(held_buckets walks the identical view); the count is one broadcast
membership join + groupBy; the permille is exact integer arithmetic
(``(2·load1_milli + cores) div (2·cores)`` = round-half-up of
``load1_milli / cores``, which equals Rust's half-away-from-zero on
the non-negative domain, then ``least(·, 1000)``).

Fixture: the placement module's 25-node cluster; 2 strategies ×
SHARD_COUNT = 64 shard topics ``shard:<strategy>:<n>`` resolved at 3
replicas; registry documents carry placement (strategy lane
doc_id%2, shard = shard_for_subject('doc-<id>')), NIL on the
doc_id%19 lane; per-node load lanes cores = n%5 (0 → the zero-core
guard) and load1_milli = (n%23)·250 (values past 1000‰/core populate
the clamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.placement import (
    ROLE_LOCATION,
    ROLE_NODE,
    duck_neg_log2_cte,
    duck_selector_hash,
    duck_shard_sql,
    shard_for_subject,
)
from aruna_spark.queries import register
from aruna_spark.queries.placement import (
    _NODES_SQL,
    _PRECEDES_LOC,
    _PRECEDES_NODE,
    REPLICA_COUNT,
    load_nodes,
    resolve_holders,
)

NODE_INFO_PUBLISH_INTERVAL_S = 60  # node_info.rs:31
SHARD_COUNT = 64  # core structs/placement.rs PlacementStrategy
STRATEGIES = ("strat-a", "strat-b")


def shard_subjects(spark: SparkSession) -> DataFrame:
    """One subject per (strategy, shard) bucket."""
    rows = [
        (f"shard:{s}:{i}", s, i)
        for s in STRATEGIES
        for i in range(SHARD_COUNT)
    ]
    return spark.createDataFrame(
        rows, "subject string, strategy string, shard int"
    )


def compute_held_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(strategy, shard, node_id): the buckets each node holds —
    shard topics resolved through the modeled rendezvous plane
    (node_info.rs:182-190 held_placement_set over placement's
    held_buckets). This is the DERIVATION; queries read the
    materialized layout via :func:`held_buckets`."""
    subjects = shard_subjects(spark)
    holders = resolve_holders(
        load_nodes(spark, sf_dir),
        subjects.select("subject"),
        REPLICA_COUNT,
    )
    return holders.join(F.broadcast(subjects), "subject").select(
        "strategy", "shard", "node_id"
    )


def held_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ≤ 2·64·3 = 384-row held-bucket view, served from the
    materialized store (r16): in the reference this is MAINTAINED
    placement state (the cluster's bucket directory), not a per-query
    derivation — the r15 shape re-ran the two-level rendezvous pipeline
    plus an eager localCheckpoint on EVERY invocation of every
    consumer (~2 s of driver jobs each for node_info_heartbeat and
    registry_create_doc_placement)."""
    from aruna_spark.store import held_buckets_store

    return held_buckets_store(spark, sf_dir)


def load_registry_placements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry records with their RECORDED placement ref (NIL on the
    %19 lane)."""
    k = F.col("doc_id")
    nil = k % 19 == 6
    return load_table(spark, sf_dir, "documents").select(
        k.alias("doc_id"),
        nil.alias("is_nil"),
        F.when(~nil, F.when(k % 2 == 0, STRATEGIES[0]).otherwise(
            STRATEGIES[1]
        )).alias("strategy"),
        F.when(
            ~nil,
            shard_for_subject(
                F.concat(F.lit("doc-"), k.cast("string")), SHARD_COUNT
            ),
        ).cast("int").alias("shard"),
    )


_SHARD_SUBJECTS_SQL = f"""
    SELECT 'shard:' || st.strategy || ':' || s.i AS subject,
           st.strategy, CAST(s.i AS INT) AS shard
    FROM range({SHARD_COUNT}) s(i),
         (VALUES ('strat-a'), ('strat-b')) st(strategy)
"""

_DOCS_SQL = f"""
    SELECT doc_id,
           doc_id % 19 = 6 AS is_nil,
           CASE WHEN doc_id % 19 <> 6 THEN
             CASE WHEN doc_id % 2 = 0 THEN 'strat-a' ELSE 'strat-b' END
           END AS strategy,
           CASE WHEN doc_id % 19 <> 6
                THEN {duck_shard_sql("'doc-' || doc_id", SHARD_COUNT)}
           END AS shard
    FROM documents
"""


# The full held-bucket derivation as a reusable WITH RECURSIVE body
# (nodes -> rendezvous node/location ranking -> held (strategy, shard,
# node_id)). Shared with queries/doc_placement.py, whose oracle ranks a
# create's held buckets through the same plane.
HELD_CTE_SQL = f"""nodes AS ({_NODES_SQL}),
    locs AS (
      SELECT location,
             CAST(SUM(CASE WHEN passes_filters THEN eff_weight
                      ELSE 0 END) AS BIGINT) AS w_loc
      FROM nodes GROUP BY location
    ),
    subjects AS ({_SHARD_SUBJECTS_SQL}),
    pairs_n AS (
      SELECT s.subject, n.node_id FROM subjects s CROSS JOIN nodes n
    ),
    {duck_neg_log2_cte(
        "pairs_n",
        duck_selector_hash(ROLE_NODE, "subject", "node_id"),
        "subject, node_id",
        "nn",
    )},
    pairs_l AS (
      SELECT s.subject, l.location FROM subjects s CROSS JOIN locs l
    ),
    {duck_neg_log2_cte(
        "pairs_l",
        duck_selector_hash(ROLE_LOCATION, "subject", "location"),
        "subject, location",
        "ll",
    )},
    members AS (
      SELECT sc.subject, n.location, n.node_id, n.eff_weight, n.eligible,
             sc.l_score
      FROM nn_scored sc JOIN nodes n USING (node_id)
    ),
    best AS (
      SELECT m.subject, m.location, m.node_id
      FROM members m
      WHERE m.eligible AND NOT EXISTS (
        SELECT 1 FROM members o
        WHERE o.subject = m.subject AND o.location = m.location
          AND o.eligible AND o.node_id <> m.node_id
          AND {_PRECEDES_NODE}
      )
    ),
    qual AS (
      SELECT sc.subject, sc.location, l.w_loc, sc.l_score, b.node_id
      FROM ll_scored sc
      JOIN locs l USING (location)
      JOIN best b ON b.subject = sc.subject AND b.location = sc.location
      WHERE l.w_loc > 0
    ),
    ranked AS (
      SELECT q.subject, q.node_id,
             1 + (SELECT COUNT(*) FROM qual o
                  WHERE o.subject = q.subject
                    AND o.location <> q.location
                    AND {_PRECEDES_LOC}) AS rnk
      FROM qual q
    ),
    held AS (
      SELECT s.strategy, s.shard, r.node_id
      FROM ranked r JOIN subjects s USING (subject)
      WHERE r.rnk <= {REPLICA_COUNT}
    )"""


@register(
    "node_info_heartbeat",
    oracle=f"""
    WITH RECURSIVE {HELD_CTE_SQL},
    docs AS ({_DOCS_SQL}),
    nil_total AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs WHERE is_nil
    ),
    bucket_counts AS (
      SELECT h.node_id, CAST(COUNT(d.doc_id) AS BIGINT) AS bucket_docs,
             CAST(COUNT(DISTINCT (h.strategy, h.shard)) AS BIGINT)
               AS held_buckets
      FROM held h
      LEFT JOIN docs d
        ON d.strategy = h.strategy AND d.shard = h.shard
      GROUP BY h.node_id
    )
    SELECT n.node_id,
           COALESCE(b.held_buckets, 0) AS held_buckets,
           COALESCE(b.bucket_docs, 0) AS bucket_docs,
           t.n AS nil_docs,
           COALESCE(b.bucket_docs, 0) + t.n AS documents_held,
           CAST(CASE WHEN CAST(substr(n.node_id, 6) AS INT) % 5 = 0
                THEN 0
                ELSE LEAST(1000,
                  (2 * (CAST(substr(n.node_id, 6) AS INT) % 23) * 250
                   + CAST(substr(n.node_id, 6) AS INT) % 5)
                  // (2 * (CAST(substr(n.node_id, 6) AS INT) % 5)))
           END AS BIGINT) AS load_permille
    FROM nodes n CROSS JOIN nil_total t
    LEFT JOIN bucket_counts b USING (node_id)
    """,
)
def node_info_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every node's published heartbeat utilization: the held
    ``(strategy, shard)`` bucket count, registry documents held
    (bucket members + the NIL rows every node holds —
    node_info.rs:192-230), and the clamped integer load permille
    (rs:232-253, with the zero-core guard). One rendezvous resolution
    over the constant-sized shard-topic set + one membership join
    keyed on (strategy, shard) — the registry scan never shuffles on
    anything wider than the 128-bucket key."""
    held = held_buckets(spark, sf_dir)
    docs = load_registry_placements(spark, sf_dir)
    # ONE corpus scan (r15): the registry collapses to its ≤ 129
    # (is_nil, strategy, shard) groups first; the nil total and the
    # per-node membership counts both derive from that tiny frame.
    doc_groups = (
        docs.groupBy("is_nil", "strategy", "shard")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    nil_total = doc_groups.filter("is_nil").agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("nil_docs")
    )
    # r15: the r14 shape outer-joined the tiny held set against the
    # corpus (SMJ — the preserved side cannot broadcast under LeftOuter)
    # just to keep zero-doc nodes. Split it: held-bucket counts come
    # from the 384-row held set alone (the left join preserved every
    # held bucket regardless of doc matches), doc counts from an INNER
    # broadcast join — then both tiny per-node frames attach by
    # broadcast. Identical numbers, no corpus shuffle.
    per_node_held = held.groupBy("node_id").agg(
        F.count_distinct("strategy", "shard")
        .cast("long")
        .alias("held_buckets"),
    )
    per_node_docs = (
        doc_groups.filter(~F.col("is_nil"))
        .join(F.broadcast(held), ["strategy", "shard"])
        .groupBy("node_id")
        .agg(F.sum("__n").cast("long").alias("bucket_docs"))
    )
    # r16: both sides are ≤25-row frames but derive through the
    # checkpointed doc_groups / the store scan, whose erased size
    # estimates demoted this to a sort-merge join (r15 finding (c)) —
    # hint the right side explicitly
    bucket_counts = per_node_held.join(
        F.broadcast(per_node_docs), "node_id", "left"
    )
    nodes = load_nodes(spark, sf_dir).select("node_id")
    n = F.substring("node_id", 6, 2).cast("int")
    cores = n % 5
    load1_milli = (n % 23) * 250
    permille = F.when(cores == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(1000).cast("long"),
            F.expr(
                "CAST((2 * ((CAST(substring(node_id, 6, 2) AS INT) % 23)"
                " * 250) + CAST(substring(node_id, 6, 2) AS INT) % 5)"
                " div (2 * (CAST(substring(node_id, 6, 2) AS INT) % 5))"
                " AS BIGINT)"
            ),
        )
    )
    return (
        nodes.crossJoin(F.broadcast(nil_total))
        .join(F.broadcast(bucket_counts), "node_id", "left")
        .select(
            "node_id",
            F.coalesce("held_buckets", F.lit(0))
            .cast("long")
            .alias("held_buckets"),
            F.coalesce("bucket_docs", F.lit(0))
            .cast("long")
            .alias("bucket_docs"),
            F.col("nil_docs"),
            (F.coalesce("bucket_docs", F.lit(0)) + F.col("nil_docs"))
            .cast("long")
            .alias("documents_held"),
            permille.cast("long").alias("load_permille"),
        )
    )
