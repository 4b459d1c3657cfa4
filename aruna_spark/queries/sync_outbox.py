"""Document-sync replication plane: pending shard placements, the
outbox drain plan, and the apply-decision ladder.

VERDICT r10 parked ``sync_placement.rs`` and ``document_sync_outbox.rs``
as orchestration transport; their query-shaped kernels are not — each
is a pure relation over a metadata-sized keyspace, and this module
registers them oracle-checked. The network transport (iroh streams,
gossip, topic publish) stays excluded.

Reference surface:

- ``operations/src/sync_placement.rs:49-143`` — placement record key
  ``realm(32) ‖ strategy(16) ‖ epoch(8, LITTLE-endian) ‖ shard(4,
  big-endian)``: scans walk epochs in LE byte order, NOT numeric order
  (epoch 256 = ``00 01 ..`` sorts before epoch 1 = ``01 00 ..``);
  ``new_placement`` drops the authoritative node from
  ``selected_peers``, then byte-sorts + dedups (``sort_node_ids``);
  ``missing_peer_count`` = desired − (peers + 1), saturating (the
  authoritative holder counts as one); ``placement_satisfied`` =
  peers + 1 ≥ desired.
- ``operations/src/document_sync_outbox.rs:26-50`` — outbox keys
  order by kind bytes (``admin-operation`` < ``delete`` < ``upsert``),
  with admin operations additionally ordered by (origin node, origin
  seq BE) so one origin's ops replay in sequence order; then the
  outbox ULID (FIFO), then the target storage key as a pure tie-break.
  ``OUTBOX_DRAIN_BATCH_SIZE`` = 4 × 1024 = 4096 keys per drain page.
- ``operations/src/task_incoming.rs:577-870`` — one drain run pages
  the WHOLE outbox (deferred records are paged past, never starve the
  tail); per page, stale emit-time peer stamps on shard-topic records
  are re-resolved to the shard's live holders (empty stamps and
  shared-topic records keep theirs, an empty holder set keeps the
  stamp); ``partition_drain_records`` (rs:293-341) classifies each
  record in key order — shared-topic records always publish,
  shard-topic records are undeliverable when this node neither holds
  nor is draining from the shard (memoized per topic), deferred when
  the topic's genesis is locally unknown (FIFO within a topic: one
  deferral defers every later record of that topic), else published;
  publishable records group by their byte-sorted peer set (BTreeMap —
  groups order by peer list) and chunk into sub-batches of
  ``DRAIN_SUBBATCH_RECORDS`` = 512 (rs:110) in scan order.
- ``core/src/document.rs:276-307`` — ``document_sync_apply_decision``:
  no local change → Apply; identical current revision → Apply when the
  change kind also matches, else Conflict; an Upsert over a local
  Delete whose base is not exactly the local tombstone revision →
  SkipTombstoned (checked BEFORE the generation race, so even a
  higher-generation rebase past a tombstone is skipped); then by
  generation — lower → SkipStale, equal → Conflict (same generation,
  different event), higher → Apply only when the incoming base IS the
  local current revision, else Conflict.

Spark mapping: all three keyspaces are metadata-sized at any corpus
scale (one placement per held shard, one outbox record per pending
publish, one decision per incoming change batch), so every operator
here is pure column algebra plus windows bounded by the drain page —
no unpartitioned window ever sees more than ``OUTBOX_DRAIN_BATCH_SIZE``
rows per (page, group) partition.

Fixtures (part / orders / customer; odd-mod discriminators):

- placements: part ``% 4 == 1``; realm k%3, strategy k%5, epoch lane
  k%7 (values 0, 1, 255, 256, 511, 65536, 16777216 — chosen so LE
  byte order visibly disagrees with numeric order), shard k%11,
  authoritative ``n<k%9>``, stamped peers ``n<k%9>, n<(k+2)%9>,
  n<(k+4)%9>`` (the first IS the authoritative node — the drop lane),
  desired 2 + k%3.
- outbox: orders ``% 32 == 5``; kind k%23 (≤10 upsert, ≤17 delete,
  else admin-operation), admin origin ``node<k%7>`` seq k%13, shared
  realm-config topic when k%9 < 2 else shard topic ``t<k%21>``;
  stamped peers empty when k%5 == 0 else sorted {node<k%7>,
  node<(k+3)%7>}; per-topic: holders empty when t%5 == 4 else
  {node<t%7>, node<(t+2)%7>, node<(t+5)%7>}, held unless t%7 == 6,
  genesis known unless t%3 == 1.
- decisions: customer ``% 2 == 0``; local present unless k%7 == 0,
  l_gen 5 + k%3, l_event 100 + k%11, kinds by k%5 / k%13; incoming by
  k%9 (0 → identical revision, 1-2 → stale, 3-4 → same generation new
  event, else newer) with base by k%17 (<6 → the local current, <12 →
  a different revision, else None). Revision equality contracts to
  (generation, event_id): the fixture derives actor and updated_at_ms
  from event_id, so the full-tuple compare the reference does is
  equivalent — documented here, pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.ordering import global_scan_pos
from aruna_spark.queries import register

OUTBOX_DRAIN_BATCH_SIZE = 4 * 1024  # document_sync_outbox.rs:23-24
DRAIN_SUBBATCH_RECORDS = 512  # task_incoming.rs:110


def _epoch_le_hex(epoch: Column) -> Column:
    """Hex of the epoch's 8 little-endian bytes — the exact substring
    of the placement key that makes scans walk epochs in LE byte
    order (sync_placement.rs:55-62)."""
    return F.concat(
        *[
            F.format_string(
                "%02x",
                F.shiftrightunsigned(epoch.cast("long"), 8 * i)
                .bitwiseAND(F.lit(255))
                .cast("int"),
            )
            for i in range(8)
        ]
    )


_EPOCH_LANE = "CASE k % 7 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 255 \
WHEN 3 THEN 256 WHEN 4 THEN 511 WHEN 5 THEN 65536 ELSE 16777216 END"

_PLACEMENT_ORACLE = f"""
WITH base AS (
  SELECT p_partkey AS k FROM part WHERE p_partkey % 4 = 1
),
recs AS (
  SELECT k,
         'realm' || (k % 3) AS realm_id,
         'strat' || (k % 5) AS strategy_id,
         CAST({_EPOCH_LANE} AS BIGINT) AS epoch,
         CAST(k % 11 AS INT) AS shard,
         'n' || (k % 9) AS authoritative_node,
         list_sort(list_distinct(list_filter(
           ['n' || (k % 9), 'n' || ((k + 2) % 9), 'n' || ((k + 4) % 9)],
           peer -> peer <> 'n' || (k % 9)
         ))) AS peers,
         CAST(2 + k % 3 AS INT) AS desired_peer_count
  FROM base
),
keyed AS (
  SELECT *,
         printf('%02x%02x%02x%02x%02x%02x%02x%02x',
                CAST(epoch % 256 AS INT),
                CAST((epoch // 256) % 256 AS INT),
                CAST((epoch // 65536) % 256 AS INT),
                CAST((epoch // 16777216) % 256 AS INT),
                CAST((epoch // 4294967296) % 256 AS INT),
                CAST((epoch // 1099511627776) % 256 AS INT),
                CAST((epoch // 281474976710656) % 256 AS INT),
                CAST((epoch // 72057594037927936) % 256 AS INT)
         ) AS epoch_le_hex
  FROM recs
)
SELECT realm_id, strategy_id, epoch, epoch_le_hex, shard,
       authoritative_node,
       array_to_string(peers, ',') AS selected_peers,
       CAST(len(peers) AS INT) AS n_selected,
       CAST(GREATEST(desired_peer_count - (len(peers) + 1), 0) AS INT)
         AS missing_peers,
       len(peers) + 1 >= desired_peer_count AS satisfied,
       CAST(ROW_NUMBER() OVER (
         ORDER BY realm_id, strategy_id, epoch_le_hex, shard
       ) AS BIGINT) AS scan_pos
FROM keyed
"""


@register("sync_placement_status", oracle=_PLACEMENT_ORACLE)
def sync_placement_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SYNC_PLACEMENT keyspace as the drain task reads it
    (sync_placement.rs:49-143): peers normalized exactly like
    ``new_placement`` (authoritative node dropped, byte-sorted,
    deduped), ``missing_peer_count`` / ``placement_satisfied`` per
    record, and ``scan_pos`` following the physical key order — the
    epoch serialized LITTLE-endian, so epoch 256 scans before epoch 1
    (pinned by the epoch-lane fixture values).

    One placement record exists per shard the node authoritatively
    holds, so the relation is metadata-sized at any corpus scale; the
    single window runs over that metadata relation, never over data.
    """
    k = F.col("k")
    recs = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 4 == 1)
        .select(F.col("p_partkey").alias("k"))
        .select(
            F.concat(F.lit("realm"), (k % 3).cast("string")).alias("realm_id"),
            F.concat(F.lit("strat"), (k % 5).cast("string")).alias(
                "strategy_id"
            ),
            F.when(k % 7 == 0, 0)
            .when(k % 7 == 1, 1)
            .when(k % 7 == 2, 255)
            .when(k % 7 == 3, 256)
            .when(k % 7 == 4, 511)
            .when(k % 7 == 5, 65536)
            .otherwise(16777216)
            .cast("long")
            .alias("epoch"),
            (k % 11).cast("int").alias("shard"),
            F.concat(F.lit("n"), (k % 9).cast("string")).alias(
                "authoritative_node"
            ),
            F.array(
                F.concat(F.lit("n"), (k % 9).cast("string")),
                F.concat(F.lit("n"), ((k + 2) % 9).cast("string")),
                F.concat(F.lit("n"), ((k + 4) % 9).cast("string")),
            ).alias("stamped"),
            (2 + k % 3).cast("int").alias("desired_peer_count"),
        )
    )
    auth = F.col("authoritative_node")
    peers = F.array_sort(
        F.array_distinct(
            F.filter(F.col("stamped"), lambda p: p != auth)
        )
    )
    n = F.size(peers)
    keyed = recs.select(
        "realm_id",
        "strategy_id",
        "epoch",
        _epoch_le_hex(F.col("epoch")).alias("epoch_le_hex"),
        "shard",
        "authoritative_node",
        F.array_join(peers, ",").alias("selected_peers"),
        n.cast("int").alias("n_selected"),
        F.greatest(
            F.col("desired_peer_count") - (n + 1), F.lit(0)
        )
        .cast("int")
        .alias("missing_peers"),
        (n + 1 >= F.col("desired_peer_count")).alias("satisfied"),
    )
    # the key's leading 48 bytes are (realm, strategy) — the natural
    # scan-parallel partitioning; positions compose via the two-level
    # prefix, no unpartitioned window
    return global_scan_pos(
        keyed,
        ["realm_id", "strategy_id"],
        ["epoch_le_hex", "shard"],
        out_col="scan_pos",
    )


_OUTBOX_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 32 = 5
),
recs AS (
  SELECT k AS outbox_id,
         CASE WHEN k % 23 <= 10 THEN 'upsert'
              WHEN k % 23 <= 17 THEN 'delete'
              ELSE 'admin-operation' END AS kind,
         CASE WHEN k % 23 > 17 THEN 'node' || (k % 7) END AS origin_node,
         CASE WHEN k % 23 > 17 THEN CAST(k % 13 AS BIGINT) END
           AS origin_seq,
         k % 9 >= 2 AS uses_shard_topic,
         CASE WHEN k % 9 < 2 THEN 'realm'
              ELSE 't' || (k % 21) END AS topic,
         CASE WHEN k % 5 = 0 THEN []
              ELSE list_sort(list_distinct(
                ['node' || (k % 7), 'node' || ((k + 3) % 7)])) END
           AS stamped_peers,
         k % 21 AS t
  FROM base
),
topics AS (
  SELECT *,
         CASE WHEN NOT uses_shard_topic THEN []
              WHEN t % 5 = 4 THEN []
              ELSE ['node' || (t % 7), 'node' || ((t + 2) % 7),
                    'node' || ((t + 5) % 7)] END AS holders,
         NOT uses_shard_topic OR t % 7 <> 6 AS topic_held,
         NOT uses_shard_topic OR t % 3 <> 1 AS topic_exists
  FROM recs
),
restamped AS (
  SELECT *,
         CASE WHEN uses_shard_topic AND len(stamped_peers) > 0
                   AND len(holders) > 0
              THEN list_sort(list_distinct(holders))
              ELSE stamped_peers END AS peers
  FROM topics
),
ordered AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (
           ORDER BY kind, COALESCE(origin_node, ''),
                    COALESCE(origin_seq, 0), outbox_id
         ) AS BIGINT) AS drain_pos,
         CASE WHEN NOT uses_shard_topic THEN 'publish'
              WHEN NOT topic_held THEN 'undeliverable'
              WHEN NOT topic_exists THEN 'defer'
              ELSE 'publish' END AS action
  FROM restamped
),
paged AS (
  SELECT *,
         CAST((drain_pos - 1) // {OUTBOX_DRAIN_BATCH_SIZE} AS BIGINT)
           AS page,
         -- the group key is always byte-sorted + deduped (peer_key);
         -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
         COALESCE(array_to_string(list_sort(list_distinct(peers)), ','), '')
           AS peer_set
  FROM ordered
),
grouped AS (
  -- rank ONLY publish rows: held-back rows neither claim a group nor
  -- shift sub-batch cuts (publish_groups is built from to_publish)
  SELECT *,
         CAST(DENSE_RANK() OVER (
           PARTITION BY page ORDER BY peer_set) AS BIGINT) AS group_pos,
         CAST((ROW_NUMBER() OVER (
           PARTITION BY page, peer_set ORDER BY drain_pos) - 1)
           // {DRAIN_SUBBATCH_RECORDS} AS BIGINT) AS subbatch_idx
  FROM paged WHERE action = 'publish'
)
SELECT outbox_id, kind, topic, drain_pos, page, action, peer_set,
       group_pos, subbatch_idx
FROM grouped
UNION ALL
SELECT outbox_id, kind, topic, drain_pos, page, action, peer_set,
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM paged WHERE action <> 'publish'
"""


@register("sync_outbox_drain_plan", oracle=_OUTBOX_ORACLE)
def sync_outbox_drain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One document-sync outbox drain run as a relation
    (task_incoming.rs:577-870, document_sync_outbox.rs:26-50):

    - ``drain_pos`` follows the physical key — kind bytes first
      (admin operations drain before deletes before upserts), admin
      records sub-ordered (origin node, origin seq) so one origin's
      ops replay in sequence, then the outbox ULID (FIFO per kind);
    - ``page`` cuts the scan at OUTBOX_DRAIN_BATCH_SIZE (4096) keys —
      the whole outbox is paged every run so a deferred head never
      starves the tail;
    - stale peer stamps on shard-topic records re-resolve to the
      shard's live holders before classification (empty stamps,
      shared-topic records, and empty holder sets keep the stamp —
      task_incoming.rs:753-771);
    - ``action`` mirrors ``partition_drain_records`` (rs:293-341):
      shared-topic records always publish; a shard topic this node
      neither holds nor drains from is undeliverable; a held topic
      with no local genesis defers (and, FIFO, so does every later
      record of that topic — per-topic attributes make the memoized
      first-record classification equal the per-record one); the rest
      publish;
    - publishable records group by byte-sorted peer set (``group_pos``
      orders groups like the BTreeMap — peer-list order; node ids are
      fixed-width so the joined string orders identically) and chunk
      into ``subbatch_idx`` slices of DRAIN_SUBBATCH_RECORDS (512) in
      scan order.

    Every window partitions by (page[, peer_set]) — bounded by the
    4096-key drain page regardless of corpus scale.
    """
    k = F.col("k")
    is_admin = k % 23 > 17
    uses_shard = k % 9 >= 2
    t = k % 21
    recs = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 32 == 5)
        .select(F.col("o_orderkey").alias("k"))
        .select(
            k.alias("outbox_id"),
            F.when(k % 23 <= 10, "upsert")
            .when(k % 23 <= 17, "delete")
            .otherwise("admin-operation")
            .alias("kind"),
            F.when(
                is_admin, F.concat(F.lit("node"), (k % 7).cast("string"))
            ).alias("origin_node"),
            F.when(is_admin, (k % 13).cast("long")).alias("origin_seq"),
            uses_shard.alias("uses_shard_topic"),
            F.when(~uses_shard, F.lit("realm"))
            .otherwise(F.concat(F.lit("t"), t.cast("string")))
            .alias("topic"),
            F.when(k % 5 == 0, F.array().cast("array<string>"))
            .otherwise(
                F.array_sort(
                    F.array_distinct(
                        F.array(
                            F.concat(F.lit("node"), (k % 7).cast("string")),
                            F.concat(
                                F.lit("node"), ((k + 3) % 7).cast("string")
                            ),
                        )
                    )
                )
            )
            .alias("stamped_peers"),
            F.when(~uses_shard | (t % 5 == 4), F.array().cast("array<string>"))
            .otherwise(
                F.array(
                    F.concat(F.lit("node"), (t % 7).cast("string")),
                    F.concat(F.lit("node"), ((t + 2) % 7).cast("string")),
                    F.concat(F.lit("node"), ((t + 5) % 7).cast("string")),
                )
            )
            .alias("holders"),
            (~uses_shard | (t % 7 != 6)).alias("topic_held"),
            (~uses_shard | (t % 3 != 1)).alias("topic_exists"),
        )
    )
    return drain_plan(recs)


def drain_plan(
    recs: DataFrame,
    batch_size: int = OUTBOX_DRAIN_BATCH_SIZE,
    subbatch_records: int = DRAIN_SUBBATCH_RECORDS,
) -> DataFrame:
    """Classify + group one outbox drain run. ``recs`` carries the
    stored record columns (outbox_id, kind, origin_node/seq,
    uses_shard_topic, topic, stamped_peers, holders) plus the run's
    per-topic environment (topic_held, topic_exists). Constants are
    parameters so tests can pin the page/sub-batch cut behavior the
    sf0.01 fixture is too small to reach (one 4096-key page)."""
    from pyspark.sql.window import Window

    peers = F.when(
        F.col("uses_shard_topic")
        & (F.size("stamped_peers") > 0)
        & (F.size("holders") > 0),
        F.array_sort(F.array_distinct(F.col("holders"))),
    ).otherwise(F.col("stamped_peers"))
    action = (
        F.when(~F.col("uses_shard_topic"), "publish")
        .when(~F.col("topic_held"), "undeliverable")
        .when(~F.col("topic_exists"), "defer")
        .otherwise("publish")
    )
    # the publish set keeps the record's own peer order, but the GROUP
    # key is always byte-sorted + deduped (peer_key, task_incoming.rs:
    # 816-817) — peer_set here is that normalized key. The key's
    # leading bytes are kind ‖ admin-origin, so the global FIFO
    # position composes from a (kind, origin)-partitioned rank plus
    # fold-prefixed partition counts — no unpartitioned window.
    staged = recs.select(
        "outbox_id",
        "kind",
        "topic",
        F.array_join(F.array_sort(F.array_distinct(peers)), ",").alias(
            "peer_set"
        ),
        action.alias("action"),
        F.coalesce("origin_node", F.lit("")).alias("__origin"),
        F.coalesce("origin_seq", F.lit(0)).alias("__seq"),
    )
    paged = (
        global_scan_pos(
            staged,
            ["kind", "__origin"],
            ["__seq", "outbox_id"],
            out_col="drain_pos",
        )
        .drop("__origin", "__seq")
        .withColumn(
            "page",
            F.floor((F.col("drain_pos") - 1) / batch_size).cast("long"),
        )
    )
    pubs = Window.partitionBy("page").orderBy("peer_set")
    in_group = Window.partitionBy("page", "peer_set").orderBy("drain_pos")
    is_pub = F.col("action") == "publish"
    # Rank ONLY the publish rows: classify first, then re-derive the
    # group ordinals over the publish subset so defer/undeliverable
    # rows neither claim a group nor shift sub-batch cuts.
    published = (
        paged.filter(is_pub)
        .withColumn(
            "group_pos", F.dense_rank().over(pubs).cast("long")
        )
        .withColumn(
            "subbatch_idx",
            F.floor(
                (F.row_number().over(in_group) - 1) / subbatch_records
            ).cast("long"),
        )
    )
    held_back = (
        paged.filter(~is_pub)
        .withColumn("group_pos", F.lit(None).cast("long"))
        .withColumn("subbatch_idx", F.lit(None).cast("long"))
    )
    return published.unionByName(held_back).select(
        "outbox_id",
        "kind",
        "topic",
        "drain_pos",
        "page",
        "action",
        "peer_set",
        "group_pos",
        "subbatch_idx",
    )


_DECISION_ORACLE = """
WITH base AS (
  SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0
),
changes AS (
  SELECT k AS change_id,
         k % 7 <> 0 AS local_present,
         CAST(5 + k % 3 AS BIGINT) AS l_gen,
         CAST(100 + k % 11 AS BIGINT) AS l_event,
         CASE WHEN k % 5 < 3 THEN 'upsert' ELSE 'delete' END AS l_kind,
         CASE WHEN k % 9 = 0 THEN CAST(5 + k % 3 AS BIGINT)
              WHEN k % 9 IN (1, 2) THEN CAST(4 + k % 3 AS BIGINT)
              WHEN k % 9 IN (3, 4) THEN CAST(5 + k % 3 AS BIGINT)
              ELSE CAST(6 + k % 3 AS BIGINT) END AS i_gen,
         CASE WHEN k % 9 = 0 THEN CAST(100 + k % 11 AS BIGINT)
              ELSE CAST(101 + k % 11 AS BIGINT) END AS i_event,
         CASE WHEN k % 13 < 7 THEN 'upsert' ELSE 'delete' END AS i_kind,
         CASE WHEN k % 17 < 6 THEN CAST(5 + k % 3 AS BIGINT)
              WHEN k % 17 < 12 THEN CAST(3 AS BIGINT) END AS i_base_gen,
         CASE WHEN k % 17 < 6 THEN CAST(100 + k % 11 AS BIGINT)
              WHEN k % 17 < 12 THEN CAST(90 AS BIGINT) END AS i_base_event
  FROM base
)
SELECT change_id, local_present, l_gen, l_event, l_kind,
       i_gen, i_event, i_kind, i_base_gen, i_base_event,
       CASE
         WHEN NOT local_present THEN 'apply'
         WHEN i_gen = l_gen AND i_event = l_event THEN
           CASE WHEN i_kind = l_kind THEN 'apply' ELSE 'conflict' END
         WHEN l_kind = 'delete' AND i_kind = 'upsert'
              AND NOT (i_base_gen IS NOT DISTINCT FROM l_gen
                       AND i_base_event IS NOT DISTINCT FROM l_event)
           THEN 'skip_tombstoned'
         WHEN i_gen < l_gen THEN 'skip_stale'
         WHEN i_gen = l_gen THEN 'conflict'
         WHEN i_base_gen IS NOT DISTINCT FROM l_gen
              AND i_base_event IS NOT DISTINCT FROM l_event
           THEN 'apply'
         ELSE 'conflict'
       END AS decision
FROM changes
"""


def apply_decision(
    local_present: Column,
    l_gen: Column,
    l_event: Column,
    l_kind: Column,
    i_gen: Column,
    i_event: Column,
    i_kind: Column,
    i_base_gen: Column,
    i_base_event: Column,
) -> Column:
    """``document_sync_apply_decision`` (core/src/document.rs:276-307)
    as one column expression. Revision equality is the full
    ``DocumentSyncRevision`` tuple in the reference; callers must
    derive actor/updated_at_ms from (generation, event_id) so the
    two-column compare is equivalent. The tombstone check runs BEFORE
    the generation race: an Upsert rebased past a local Delete is
    skipped even at a higher generation unless its base is exactly
    the tombstone revision."""
    base_is_local = i_base_gen.eqNullSafe(l_gen) & i_base_event.eqNullSafe(
        l_event
    )
    return (
        F.when(~local_present, "apply")
        .when(
            (i_gen == l_gen) & (i_event == l_event),
            F.when(i_kind == l_kind, "apply").otherwise("conflict"),
        )
        .when(
            (l_kind == "delete") & (i_kind == "upsert") & ~base_is_local,
            "skip_tombstoned",
        )
        .when(i_gen < l_gen, "skip_stale")
        .when(i_gen == l_gen, "conflict")
        .when(base_is_local, "apply")
        .otherwise("conflict")
    )


@register("sync_apply_decision", oracle=_DECISION_ORACLE)
def sync_apply_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-change classification for one sync batch: every
    (local, incoming) pair labeled Apply / SkipStale / SkipTombstoned
    / Conflict exactly per ``document_sync_apply_decision``. Pure
    column algebra over the batch — embarrassingly parallel, no
    shuffle at any scale."""
    k = F.col("k")
    changes = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("k"))
        .select(
            k.alias("change_id"),
            (k % 7 != 0).alias("local_present"),
            (5 + k % 3).cast("long").alias("l_gen"),
            (100 + k % 11).cast("long").alias("l_event"),
            F.when(k % 5 < 3, "upsert").otherwise("delete").alias("l_kind"),
            F.when(k % 9 == 0, 5 + k % 3)
            .when((k % 9).isin(1, 2), 4 + k % 3)
            .when((k % 9).isin(3, 4), 5 + k % 3)
            .otherwise(6 + k % 3)
            .cast("long")
            .alias("i_gen"),
            F.when(k % 9 == 0, 100 + k % 11)
            .otherwise(101 + k % 11)
            .cast("long")
            .alias("i_event"),
            F.when(k % 13 < 7, "upsert").otherwise("delete").alias("i_kind"),
            F.when(k % 17 < 6, 5 + k % 3)
            .when(k % 17 < 12, F.lit(3))
            .cast("long")
            .alias("i_base_gen"),
            F.when(k % 17 < 6, 100 + k % 11)
            .when(k % 17 < 12, F.lit(90))
            .cast("long")
            .alias("i_base_event"),
        )
    )
    return changes.withColumn(
        "decision",
        apply_decision(
            F.col("local_present"),
            F.col("l_gen"),
            F.col("l_event"),
            F.col("l_kind"),
            F.col("i_gen"),
            F.col("i_event"),
            F.col("i_kind"),
            F.col("i_base_gen"),
            F.col("i_base_event"),
        ),
    )


# ---------------------------------------------------------------------------
# pending-placement reconcile sweep (process_placements.rs)
# ---------------------------------------------------------------------------

RECONCILE_REALM = "realm1"  # the sweep scans one realm's prefix
RECONCILE_LOCAL = "n4"  # the reconciling node
PULL_RETRY_AFTER_MS = 250  # SHARD_TOPIC_PULL_RETRY_AFTER, sync_placement.rs:39
PLACEMENT_RETRY_AFTER_MS = 30_000  # SYNC_PLACEMENT_RETRY_AFTER, rs:15

_RECONCILE_ORACLE = f"""
WITH base AS (
  SELECT p_partkey AS k FROM part WHERE p_partkey % 4 = 1
),
recs AS (
  SELECT k,
         'realm' || (k % 3) AS realm_id,
         'strat' || (k % 5) AS strategy_id,
         CAST({_EPOCH_LANE} AS BIGINT) AS epoch,
         CAST(k % 11 AS INT) AS shard,
         CAST(k % 5 AS INT) AS strat,
         CAST((k % 11 * 5 + k % 5) % 9 AS INT) AS h
  FROM base
),
env AS (
  SELECT *,
         CASE WHEN k % 13 = 2 THEN ['{RECONCILE_LOCAL}']
              ELSE ['n' || h, 'n' || ((h + 1) % 9), 'n' || ((h + 3) % 9)]
         END AS holders,
         (shard + strat) % 5 = 3 AS genesis_absent,
         (shard * 3 + strat) % 7 = 5 AS membership_fail
  FROM recs
  WHERE realm_id = '{RECONCILE_REALM}'
),
classified AS (
  SELECT realm_id, strategy_id, epoch, shard,
         holders[1] = '{RECONCILE_LOCAL}' AS rank0,
         COALESCE(array_to_string(list_sort(list_filter(
           holders, n -> n <> '{RECONCILE_LOCAL}')), ','), '')
           AS co_holders,
         CASE
           WHEN NOT list_contains(holders, '{RECONCILE_LOCAL}')
             THEN 'dropped_not_holder'
           WHEN len(list_filter(holders, n -> n <> '{RECONCILE_LOCAL}')) = 0
             THEN 'dropped_solo'
           WHEN genesis_absent THEN 'kept_awaiting_genesis'
           WHEN membership_fail THEN 'kept_membership_incomplete'
           ELSE 'satisfied'
         END AS action
  FROM env
),
envelope AS (
  SELECT CAST(SUM(CASE WHEN action LIKE 'kept%' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
         BOOL_OR(action LIKE 'kept%') AS retry_needed,
         CASE WHEN BOOL_OR(action = 'kept_awaiting_genesis')
                THEN {PULL_RETRY_AFTER_MS}
              WHEN BOOL_OR(action LIKE 'kept%')
                THEN {PLACEMENT_RETRY_AFTER_MS} END AS retry_after_ms
  FROM classified
)
SELECT c.*, e.n_kept, e.retry_needed,
       CAST(e.retry_after_ms AS BIGINT) AS retry_after_ms
FROM classified c CROSS JOIN envelope e
"""


@register("sync_placement_reconcile", oracle=_RECONCILE_ORACLE)
def sync_placement_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ``process_shard_placements`` sweep as a relation
    (process_placements.rs:344-540): every pending placement record in
    the realm's prefix re-resolves its shard's holder set from the
    LIVE config, then classifies —

    - the local node no longer holds the shard → the record AND its
      shard-verification marker are dropped (rs:440-449);
    - no co-holders remain (solo holder) → dropped, nothing to top up
      (rs:450-458);
    - the shard topic's genesis is not local yet (a rank-0 create
      withheld, or a non-rank-0 holder still awaiting gossip) → the
      record is refreshed and KEPT — never force-created into a fork
      (rs:463-490);
    - membership reconcile incomplete → refreshed and kept
      (rs:505-517);
    - every co-holder admitted → satisfied, record removed (rs:500).

    ``rank0`` marks records whose holder list ranks the local node
    first — genesis creation is rank-0's job (exactly one origin per
    shard); every other holder pulls (join-before-create,
    rs:23-37). The envelope arms the retry timer: a pending pull
    (a held topic without local genesis) retries on the short 250 ms
    cadence, a membership gap waits out the full 30 s interval
    (rs:521-537 — re-probing a down co-holder is expensive).

    The placement keyspace is metadata-sized (one record per
    not-fully-replicated shard); classification is pure column
    algebra, the envelope one partial aggregate broadcast back.
    ``record.realm_id != realm_id`` rows never reach the loop — the
    prefix scan already scopes the realm (the in-loop check is
    belt-and-braces, rs:434-436)."""
    k = F.col("k")
    recs = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 4 == 1)
        .select(F.col("p_partkey").alias("k"))
        .select(
            k.alias("k"),
            F.concat(F.lit("realm"), (k % 3).cast("string")).alias(
                "realm_id"
            ),
            F.concat(F.lit("strat"), (k % 5).cast("string")).alias(
                "strategy_id"
            ),
            F.when(k % 7 == 0, 0)
            .when(k % 7 == 1, 1)
            .when(k % 7 == 2, 255)
            .when(k % 7 == 3, 256)
            .when(k % 7 == 4, 511)
            .when(k % 7 == 5, 65536)
            .otherwise(16777216)
            .cast("long")
            .alias("epoch"),
            (k % 11).cast("int").alias("shard"),
            (k % 5).cast("int").alias("strat"),
            ((k % 11 * 5 + k % 5) % 9).cast("int").alias("h"),
        )
        .filter(F.col("realm_id") == RECONCILE_REALM)
    )
    h = F.col("h")
    env = recs.select(
        "realm_id",
        "strategy_id",
        "epoch",
        "shard",
        F.when(
            k % 13 == 2, F.array(F.lit(RECONCILE_LOCAL))
        )
        .otherwise(
            F.array(
                F.concat(F.lit("n"), h.cast("string")),
                F.concat(F.lit("n"), ((h + 1) % 9).cast("string")),
                F.concat(F.lit("n"), ((h + 3) % 9).cast("string")),
            )
        )
        .alias("holders"),
        ((F.col("shard") + F.col("strat")) % 5 == 3).alias("genesis_absent"),
        ((F.col("shard") * 3 + F.col("strat")) % 7 == 5).alias(
            "membership_fail"
        ),
    )
    local = F.lit(RECONCILE_LOCAL)
    co = F.filter(F.col("holders"), lambda n: n != local)
    classified = env.select(
        "realm_id",
        "strategy_id",
        "epoch",
        "shard",
        (F.element_at("holders", 1) == local).alias("rank0"),
        F.array_join(F.array_sort(co), ",").alias("co_holders"),
        F.when(
            ~F.array_contains("holders", RECONCILE_LOCAL),
            "dropped_not_holder",
        )
        .when(F.size(co) == 0, "dropped_solo")
        .when(F.col("genesis_absent"), "kept_awaiting_genesis")
        .when(F.col("membership_fail"), "kept_membership_incomplete")
        .otherwise("satisfied")
        .alias("action"),
    )
    kept = F.col("action").startswith("kept")
    envelope = classified.agg(
        F.sum(kept.cast("int")).cast("long").alias("n_kept"),
        F.max(kept).alias("retry_needed"),
        F.when(
            F.max((F.col("action") == "kept_awaiting_genesis").cast("int"))
            == 1,
            PULL_RETRY_AFTER_MS,
        )
        .when(F.max(kept.cast("int")) == 1, PLACEMENT_RETRY_AFTER_MS)
        .cast("long")
        .alias("retry_after_ms"),
    )
    return classified.crossJoin(F.broadcast(envelope))


# The outbox PHYSICAL KEY set with each record's ULID enqueue
# timestamp — the lag probe's view of the keyspace
# (queue_lag.rs:183-221 probe_outbox_lag: keys end in the record's
# ULID, whose embedded timestamp is the enqueue time). Same record
# lanes as the drain-plan fixture (orders % 32 == 5, kind k%23, admin
# origin k%7 / seq k%13); enqueue_ms is a new lane (k%53 — coprime to
# the row filter and every kind lane) because the drain plan never
# reads the ULID clock.
OUTBOX_ENQ_BASE_MS = 40_000

_OUTBOX_KEYS_SQL = """
    outbox_keys AS (
      SELECT o_orderkey AS outbox_id,
             CASE WHEN o_orderkey % 23 <= 10 THEN 'upsert'
                  WHEN o_orderkey % 23 <= 17 THEN 'delete'
                  ELSE 'admin-operation' END AS kind,
             CASE WHEN o_orderkey % 23 > 17
                  THEN 'node' || (o_orderkey % 7) ELSE '' END AS origin_node,
             CASE WHEN o_orderkey % 23 > 17
                  THEN CAST(o_orderkey % 13 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS origin_seq,
             CAST(40000 + (o_orderkey % 53) * 137 AS BIGINT)
               AS enqueued_ms
      FROM orders WHERE o_orderkey % 32 = 5
    )
"""


def load_outbox_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DOCUMENT_SYNC_OUTBOX keyspace's keys + ULID enqueue clocks,
    in the drain's physical component order (kind bytes, admin origin,
    origin seq, ULID)."""
    k = F.col("o_orderkey")
    is_admin = k % 23 > 17
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k % 32 == 5)
        .select(
            k.alias("outbox_id"),
            F.when(k % 23 <= 10, "upsert")
            .when(k % 23 <= 17, "delete")
            .otherwise("admin-operation")
            .alias("kind"),
            F.when(
                is_admin, F.concat(F.lit("node"), (k % 7).cast("string"))
            )
            .otherwise("")
            .alias("origin_node"),
            F.when(is_admin, (k % 13).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("origin_seq"),
            (F.lit(OUTBOX_ENQ_BASE_MS) + (k % 53) * 137)
            .cast("long")
            .alias("enqueued_ms"),
        )
    )
