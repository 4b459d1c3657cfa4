"""Two-level weighted-rendezvous placement resolution.

Reference surface (``operations/src/placement/``):

- ``selector.rs`` — integer-only weighted rendezvous (see
  :mod:`aruna_spark.ops.placement` for the scaled portable primitives).
- ``resolver.rs:88-160`` (``resolve_holders``) — rank LOCATIONS by
  rendezvous over ``(name, W_loc)`` where ``W_loc`` sums the effective
  weights of filter-passing members (availability deliberately does NOT
  affect ``W_loc`` — resolver.rs:268-272 — so location order is stable
  when a candidate is rejected); walk locations best-first, skipping
  ``W_loc == 0``; within each location rank ALL member nodes by
  rendezvous over ``(node_id, effective_weight)`` and claim the first
  ELIGIBLE one (sync-eligible kind, not full, not draining, effective
  weight > 0, passes every Filter affinity — resolver.rs:316-341);
  with ``distinct_locations`` one claim per location; stop at
  ``replica_count``.
- ``resolver.rs:338-348`` (``effective_weight``) — each matching
  Multiply affinity rule scales the weight by ``permille / 1000`` in
  integer arithmetic, rule by rule.

Modeled cluster (from ``nation`` — 25 nodes, 5 locations):
``node_id = 'node-NN'``, ``location = 'loc-' || (n % 5)``,
``weight = (n % 7) * 100`` (zeros present), ``full = n % 11 == 3``,
``draining = n % 13 == 4``, labels ``tier = ssd if n % 3 == 0 else
hdd``, ``arch = arm if n % 17 == 2 else x86``. Strategy: replicas 3,
distinct_locations, affinity = [Multiply(tier=ssd, 1500‰),
Filter(arch=x86)]. Subjects: ``blob-<p_partkey>`` for
``p_partkey % 20 == 3``.

Spark shape (100 TB): the cluster view is a CONSTANT-sized dimension
(hundreds of nodes even at 1000 executors), so subjects × nodes is a
broadcast nested-loop of width |nodes| — no shuffle on the big side
until the per-subject groupBy, which is keyed on the subject itself
(maximal cardinality, no skew). The rendezvous scores are one
``F.aggregate`` fold per pair (pure codegen); per-subject ranking
sorts arrays of ≤|nodes| structs with the exact integer comparator —
never a global window. The DuckDB oracle recomputes the identical
integers via recursive CTEs and ranks by pairwise precedence counting,
an independent mechanism end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.placement import (
    ROLE_LOCATION,
    ROLE_NODE,
    duck_shard_sql,
    duck_neg_log2_cte,
    duck_precedes_sql,
    duck_selector_hash,
    neg_log2_q24,
    rendezvous_cmp,
    selector_hash,
    shard_for_subject,
)
from aruna_spark.queries import register

REPLICA_COUNT = 3
MULTIPLY_TIER, MULTIPLY_PERMILLE = "ssd", 1500
FILTER_ARCH = "x86"


def load_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resolved cluster view (resolver.rs PlacementView), with the
    strategy's affinity already folded into ``eff_weight`` /
    ``passes_filters`` / ``eligible`` columns."""
    n = F.col("n_nationkey")
    base = load_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("node-"), F.lpad(n.cast("string"), 2, "0")).alias(
            "node_id"
        ),
        F.concat(F.lit("loc-"), (n % 5).cast("string")).alias("location"),
        ((n % 7) * 100).cast("long").alias("weight"),
        (n % 11 == 3).alias("full"),
        (n % 13 == 4).alias("draining"),
        F.when(n % 3 == 0, MULTIPLY_TIER).otherwise("hdd").alias("tier"),
        F.when(n % 17 == 2, "arm").otherwise(FILTER_ARCH).alias("arch"),
    )
    # integer permille scaling, rule by rule (resolver.rs:338-348)
    eff = F.expr(
        f"CASE WHEN tier = '{MULTIPLY_TIER}'"
        f" THEN (weight * {MULTIPLY_PERMILLE}) div 1000"
        " ELSE weight END"
    )
    out = base.withColumn("eff_weight", eff.cast("long")).withColumn(
        "passes_filters", F.col("arch") == FILTER_ARCH
    )
    return out.withColumn(
        "eligible",
        F.col("passes_filters")
        & ~F.col("full")
        & ~F.col("draining")
        & (F.col("eff_weight") > 0),
    )


_NODES_SQL = f"""
    SELECT 'node-' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS node_id,
           'loc-' || CAST(n_nationkey % 5 AS VARCHAR) AS location,
           CAST(CASE WHEN n_nationkey % 3 = 0
                THEN ((n_nationkey % 7) * 100 * {MULTIPLY_PERMILLE}) // 1000
                ELSE (n_nationkey % 7) * 100 END AS BIGINT) AS eff_weight,
           n_nationkey % 17 <> 2 AS passes_filters,
           (n_nationkey % 17 <> 2 AND n_nationkey % 11 <> 3
            AND n_nationkey % 13 <> 4
            AND CASE WHEN n_nationkey % 3 = 0
                THEN ((n_nationkey % 7) * 100 * {MULTIPLY_PERMILLE}) // 1000
                ELSE (n_nationkey % 7) * 100 END > 0) AS eligible
    FROM nation
"""

_SUBJECTS_SQL = """
    SELECT 'blob-' || p_partkey AS subject FROM part WHERE p_partkey % 20 = 3
"""

_PRECEDES_NODE = duck_precedes_sql(
    "o.l_score", "o.eff_weight", "o.node_id",
    "m.l_score", "m.eff_weight", "m.node_id",
)
_PRECEDES_LOC = duck_precedes_sql(
    "o.l_score", "o.w_loc", "o.location",
    "q.l_score", "q.w_loc", "q.location",
)


@register(
    "placement_resolve_holders",
    oracle=f"""
    WITH RECURSIVE nodes AS ({_NODES_SQL}),
    locs AS (
      SELECT location,
             CAST(SUM(CASE WHEN passes_filters THEN eff_weight
                      ELSE 0 END) AS BIGINT) AS w_loc
      FROM nodes GROUP BY location
    ),
    subjects AS ({_SUBJECTS_SQL}),
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
      SELECT q.subject, q.location, q.node_id,
             1 + (SELECT COUNT(*) FROM qual o
                  WHERE o.subject = q.subject
                    AND o.location <> q.location
                    AND {_PRECEDES_LOC}) AS rnk
      FROM qual q
    )
    SELECT subject, CAST(rnk AS INT) AS replica_rank, node_id, location
    FROM ranked WHERE rnk <= {REPLICA_COUNT}
    """,
)
def placement_resolve_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resolve_holders for every subject: 3 replicas on distinct
    locations by two-level weighted rendezvous (see module doc)."""
    from aruna_spark.ops.text import spread_for_cpu

    # r16: each subject pays ~nodes+locations interpreted Q6.24 folds
    # while the compressed part scan plans a handful of splits — spread
    # to the session's core count first (no-op at warehouse scale;
    # same-session A/B: 8.0 -> 6.0 s at sf1, +0.2 s exchange cost at
    # sf0.1 — the scale trade documented in OPTIMIZATION_r16.md)
    subjects = spread_for_cpu(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 20 == 3)
        .select(
            F.concat(F.lit("blob-"), F.col("p_partkey").cast("string")).alias(
                "subject"
            )
        )
    )
    return resolve_holders(
        load_nodes(spark, sf_dir), subjects, REPLICA_COUNT
    )


def resolve_holders(
    nodes: DataFrame, subjects: DataFrame, replica_count: int
) -> DataFrame:
    """Two-level distinct-locations resolution over any cluster view.

    ``nodes`` needs (node_id, location, eff_weight, passes_filters,
    eligible); ``subjects`` needs (subject). Property-tested against a
    literal Python port of resolver.rs resolve_holders in
    ``tests/test_placement.py``."""
    locs = nodes.groupBy("location").agg(
        F.sum(
            F.when(F.col("passes_filters"), F.col("eff_weight")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("w_loc")
    )

    pn = subjects.crossJoin(F.broadcast(nodes)).select(
        "subject",
        "location",
        F.struct(
            neg_log2_q24(
                selector_hash(ROLE_NODE, F.col("subject"), F.col("node_id"))
            ).alias("l"),
            F.col("eff_weight").alias("w"),
            F.col("node_id").alias("id"),
            F.col("eligible").alias("eligible"),
        ).alias("m"),
    )
    # F.get (0-based) returns NULL past the end even under ANSI mode —
    # a location with no eligible member resolves to no claim
    best = pn.groupBy("subject", "location").agg(
        F.get(
            F.filter(
                F.array_sort(F.collect_list("m"), rendezvous_cmp),
                lambda m: m["eligible"],
            ),
            0,
        )["id"].alias("best_node")
    )

    # l_loc is a pure function of (subject, location), so it can be
    # stamped onto the AGGREGATED frame directly — the r14 shape paid a
    # second subjects crossJoin plus a corpus-corpus join on
    # (subject, location) just to carry it (r15: one corpus pass, the
    # config-sized locs attach by broadcast instead).
    qual = (
        best.withColumn(
            "l_loc",
            neg_log2_q24(
                selector_hash(
                    ROLE_LOCATION, F.col("subject"), F.col("location")
                )
            ),
        )
        .join(F.broadcast(locs), "location")
        .filter((F.col("w_loc") > 0) & F.col("best_node").isNotNull())
    )
    per_subject = qual.groupBy("subject").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_loc").alias("l"),
                        F.col("w_loc").alias("w"),
                        F.col("location").alias("id"),
                        F.col("best_node").alias("node"),
                    )
                ),
                rendezvous_cmp,
            ),
            1,
            replica_count,
        ).alias("top")
    )
    return per_subject.select(
        "subject", F.posexplode("top").alias("__p", "__r")
    ).select(
        "subject",
        (F.col("__p") + 1).cast("int").alias("replica_rank"),
        F.col("__r")["node"].alias("node_id"),
        F.col("__r")["id"].alias("location"),
    )


SHARD_COUNT = 64  # distribution.rs:61 / PlacementStrategy.shard_count


@register(
    "placement_shard_assignment",
    oracle=f"""
    WITH subjects AS ({_SUBJECTS_SQL}),
    assigned AS (
      SELECT subject,
             {duck_shard_sql("subject", SHARD_COUNT)} AS shard
      FROM subjects
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_subjects,
           MIN(subject) AS min_subject
    FROM assigned GROUP BY shard
    """,
)
def placement_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard topics per subject (core structs/placement.rs:160-168):
    domain-tagged hash masked into ``0..shard_count`` (power of two) —
    all records of one logical document share the subject, so one
    shard. Emits the per-shard occupancy roll-up (the distribution
    gate the reference's own tests assert —
    ``shard_for_subject_distributes_evenly``); evenness itself is
    pinned in ``tests/test_placement.py``.

    Scale shape: one narrow map + one groupBy on a 64-value key whose
    per-group state is (count, min) — map-side combinable, skew-free by
    construction since the mask IS the balancer.
    """
    subjects = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 20 == 3)
        .select(
            F.concat(F.lit("blob-"), F.col("p_partkey").cast("string")).alias(
                "subject"
            )
        )
    )
    return (
        subjects.withColumn(
            "shard", shard_for_subject(F.col("subject"), SHARD_COUNT)
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subjects"),
            F.min("subject").alias("min_subject"),
        )
    )


# ------------------------------------------------ subject overrides
def resolve_with_override(
    nodes: DataFrame, overrides: DataFrame, replica_count: int
) -> DataFrame:
    """resolver.rs:88-160 WITH a subject override.

    ``overrides``: (subject, pinned array<string>, excluded
    array<string>). Semantics (rs:97-126):

    - EXCLUSION WINS over a pin — a node in both is never selected;
    - pins validate in order against sync-eligibility and
      AVAILABILITY only (``is_available``: not full, not draining,
      effective weight > 0) — a pin BYPASSES Filter affinities, so an
      operator can pin outside the strategy's label filter;
    - valid pins claim first (dedup'd, capped at the replica count)
      and their locations count as seen for distinct-locations;
    - the rendezvous walk fills the remainder, skipping excluded and
      already-used nodes and pinned locations; ``W_loc`` stays
      UNCHANGED by exclusions (like availability, a per-resolution
      reject must not re-rank locations — rs:268-272).
    """
    # r15: the node catalog feeds the availability view, the location
    # weights and the per-subject cross join; the override/pin chain is
    # re-read by the walk legs — materialize the small frames once
    nodes = nodes.localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    avail = nodes.select(
        "node_id",
        "location",
        "eff_weight",
        "eligible",
        (
            ~F.col("full") & ~F.col("draining") & (F.col("eff_weight") > 0)
        ).alias("available"),
    )
    ov = overrides.select(
        "subject",
        F.coalesce("pinned", F.array()).alias("pinned"),
        F.coalesce("excluded", F.array()).alias("excluded"),
    )
    pin_rows = ov.select(
        "subject",
        "excluded",
        F.posexplode("pinned").alias("pin_pos", "node_id"),
    )
    valid_pins = (
        pin_rows.filter(~F.array_contains("excluded", F.col("node_id")))
        .join(avail.filter("available"), "node_id")
        .groupBy("subject", "node_id", "location")
        .agg(F.min("pin_pos").alias("pin_pos"))
    )
    ranked_pins = valid_pins.groupBy("subject").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct("pin_pos", "node_id", "location")
                )
            ),
            1,
            replica_count,
        ).alias("pins")
    )
    pin_out = ranked_pins.select(
        "subject", F.posexplode("pins").alias("__p", "__r")
    ).select(
        "subject",
        (F.col("__p") + 1).cast("int").alias("replica_rank"),
        F.col("__r")["node_id"].alias("node_id"),
        F.col("__r")["location"].alias("location"),
        F.lit(True).alias("pinned"),
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    pin_stats = pin_out.groupBy("subject").agg(
        F.count(F.lit(1)).alias("n_pins"),
        F.collect_set("node_id").alias("pin_nodes"),
        F.collect_set("location").alias("pin_locs"),
    )

    locs = nodes.groupBy("location").agg(
        F.sum(
            F.when(F.col("passes_filters"), F.col("eff_weight")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("w_loc")
    )
    subs = ov.join(pin_stats, "subject", "left").select(
        "subject",
        F.coalesce("n_pins", F.lit(0)).alias("n_pins"),
        F.coalesce("pin_nodes", F.array()).alias("pin_nodes"),
        F.coalesce("pin_locs", F.array()).alias("pin_locs"),
        "excluded",
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    pn = subs.crossJoin(F.broadcast(nodes)).select(
        "subject",
        "n_pins",
        "pin_locs",
        "location",
        F.struct(
            neg_log2_q24(
                selector_hash(ROLE_NODE, F.col("subject"), F.col("node_id"))
            ).alias("l"),
            F.col("eff_weight").alias("w"),
            F.col("node_id").alias("id"),
            (
                F.col("eligible")
                & ~F.array_contains(F.col("excluded"), F.col("node_id"))
                & ~F.array_contains(F.col("pin_nodes"), F.col("node_id"))
            ).alias("eligible"),
        ).alias("m"),
    )
    best = pn.groupBy("subject", "n_pins", "pin_locs", "location").agg(
        F.get(
            F.filter(
                F.array_sort(F.collect_list("m"), rendezvous_cmp),
                lambda m: m["eligible"],
            ),
            0,
        )["id"].alias("best_node")
    )
    pl = subs.select("subject").crossJoin(F.broadcast(locs)).select(
        "subject",
        "location",
        "w_loc",
        neg_log2_q24(
            selector_hash(ROLE_LOCATION, F.col("subject"), F.col("location"))
        ).alias("l_loc"),
    )
    qual = pl.join(best, ["subject", "location"]).filter(
        (F.col("w_loc") > 0)
        & F.col("best_node").isNotNull()
        & ~F.array_contains(F.col("pin_locs"), F.col("location"))
    )
    walk = (
        qual.groupBy("subject", "n_pins")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_loc").alias("l"),
                            F.col("w_loc").alias("w"),
                            F.col("location").alias("id"),
                            F.col("best_node").alias("node"),
                        )
                    ),
                    rendezvous_cmp,
                ),
                1,
                F.greatest(
                    F.lit(replica_count) - F.col("n_pins"), F.lit(0)
                ),
            ).alias("top")
        )
        .select(
            "subject",
            "n_pins",
            F.posexplode("top").alias("__p", "__r"),
        )
        .select(
            "subject",
            (F.col("n_pins") + F.col("__p") + 1)
            .cast("int")
            .alias("replica_rank"),
            F.col("__r")["node"].alias("node_id"),
            F.col("__r")["id"].alias("location"),
            F.lit(False).alias("pinned"),
        )
    )
    return pin_out.unionByName(walk)


def load_overrides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overrides for 1/3 of the resolve subjects: two ordered pins and
    one exclusion that COLLIDES with the second pin on odd keys (the
    exclusion-wins branch); even keys exclude a third node instead."""
    p = F.col("p_partkey")
    nid = lambda e: F.concat(
        F.lit("node-"), F.lpad((e % 25).cast("string"), 2, "0")
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter((p % 20 == 3) & (p % 3 == 0))
        .select(
            F.concat(F.lit("blob-"), p.cast("string")).alias("subject"),
            F.array(nid(p), nid(p + 7)).alias("pinned"),
            F.array(
                F.when(p % 2 == 1, nid(p + 7)).otherwise(nid(p + 3))
            ).alias("excluded"),
        )
    )


_OV_SUBJECTS_SQL = """
    SELECT 'blob-' || p_partkey AS subject,
           p_partkey AS p
    FROM part WHERE p_partkey % 20 = 3 AND p_partkey % 3 = 0
"""


@register(
    "placement_resolve_override",
    oracle=f"""
    WITH RECURSIVE nodes AS ({_NODES_SQL}),
    extra AS (
      SELECT node_id, location, eff_weight, eligible,
             eff_weight > 0 AND n % 11 <> 3 AND n % 13 <> 4 AS available
      FROM (SELECT *, CAST(substr(node_id, 6, 2) AS INT) AS n FROM nodes)
    ),
    locs AS (
      SELECT location,
             CAST(SUM(CASE WHEN passes_filters THEN eff_weight
                      ELSE 0 END) AS BIGINT) AS w_loc
      FROM nodes GROUP BY location
    ),
    ov AS (
      SELECT subject, p,
             ['node-' || lpad(CAST(p % 25 AS VARCHAR), 2, '0'),
              'node-' || lpad(CAST((p + 7) % 25 AS VARCHAR), 2, '0')]
               AS pinned,
             [CASE WHEN p % 2 = 1
                   THEN 'node-' || lpad(CAST((p + 7) % 25 AS VARCHAR), 2, '0')
                   ELSE 'node-' || lpad(CAST((p + 3) % 25 AS VARCHAR), 2, '0')
              END] AS excluded
      FROM ({_OV_SUBJECTS_SQL})
    ),
    pin_rows AS (
      SELECT o.subject, o.excluded, r.i AS pin_pos,
             o.pinned[CAST(r.i + 1 AS INT)] AS node_id
      FROM ov o CROSS JOIN (SELECT * FROM range(2)) r(i)
    ),
    valid_pins AS (
      SELECT pr.subject, pr.node_id, e.location,
             MIN(pr.pin_pos) AS pin_pos
      FROM pin_rows pr
      JOIN extra e ON e.node_id = pr.node_id AND e.available
      WHERE NOT list_contains(pr.excluded, pr.node_id)
      GROUP BY 1, 2, 3
    ),
    ranked_pins AS (
      SELECT subject, node_id, location,
             row_number() OVER (PARTITION BY subject
                                ORDER BY pin_pos) AS replica_rank
      FROM valid_pins
    ),
    pins AS (
      SELECT * FROM ranked_pins WHERE replica_rank <= {REPLICA_COUNT}
    ),
    pin_stats AS (
      SELECT o.subject,
             COUNT(p.node_id) AS n_pins,
             COALESCE(list(p.node_id)
                      FILTER (WHERE p.node_id IS NOT NULL), []) AS pin_nodes,
             COALESCE(list(p.location)
                      FILTER (WHERE p.location IS NOT NULL), []) AS pin_locs
      FROM ov o LEFT JOIN pins p USING (subject)
      GROUP BY o.subject
    ),
    pairs_n AS (
      SELECT o.subject, n.node_id FROM ov o CROSS JOIN nodes n
    ),
    {duck_neg_log2_cte(
        "pairs_n",
        duck_selector_hash(ROLE_NODE, "subject", "node_id"),
        "subject, node_id",
        "nn",
    )},
    pairs_l AS (
      SELECT o.subject, l.location FROM ov o CROSS JOIN locs l
    ),
    {duck_neg_log2_cte(
        "pairs_l",
        duck_selector_hash(ROLE_LOCATION, "subject", "location"),
        "subject, location",
        "ll",
    )},
    members AS (
      SELECT sc.subject, n.location, n.node_id, n.eff_weight,
             (n.eligible
              AND NOT list_contains(o.excluded, n.node_id)
              AND NOT list_contains(s.pin_nodes, n.node_id)) AS eligible,
             sc.l_score
      FROM nn_scored sc
      JOIN nodes n USING (node_id)
      JOIN ov o ON o.subject = sc.subject
      JOIN pin_stats s ON s.subject = sc.subject
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
      SELECT sc.subject, sc.location, l.w_loc, sc.l_score, b.node_id,
             s.n_pins
      FROM ll_scored sc
      JOIN locs l USING (location)
      JOIN best b ON b.subject = sc.subject AND b.location = sc.location
      JOIN pin_stats s ON s.subject = sc.subject
      WHERE l.w_loc > 0
        AND NOT list_contains(s.pin_locs, sc.location)
    ),
    walk AS (
      SELECT q.subject, q.location, q.node_id, q.n_pins,
             q.n_pins + 1 + (SELECT COUNT(*) FROM qual o
                  WHERE o.subject = q.subject
                    AND o.location <> q.location
                    AND {_PRECEDES_LOC}) AS replica_rank
      FROM qual q
    )
    SELECT subject, CAST(replica_rank AS INT) AS replica_rank,
           node_id, location, TRUE AS pinned
    FROM pins
    UNION ALL
    SELECT subject, CAST(replica_rank AS INT), node_id, location, FALSE
    FROM walk WHERE replica_rank <= {REPLICA_COUNT}
    """,
)
def placement_resolve_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Override-carrying subjects resolved through the pin-then-walk
    path: valid pins (exclusion wins, availability-only validation —
    filters bypassed) claim first in order, and the rendezvous walk
    fills the remainder over unpinned locations minus excluded nodes.
    The oracle rebuilds pins via windowed ordinals and the walk via
    pairwise precedence — independent mechanisms."""
    return resolve_with_override(
        load_nodes(spark, sf_dir),
        load_overrides(spark, sf_dir),
        REPLICA_COUNT,
    )


# ---------------------------------------------------------------------------
# realm placement-config mutation validation (mutate_realm_placement.rs)
# ---------------------------------------------------------------------------

# The strategy catalog the mutations validate against: exists?, does a
# realm-scoped Metadata binding exist in the binding directory?, is the
# strategy referenced (default / strategy binding / placement binding /
# override)? st3 additionally carries the ONE group-scoped metadata
# binding (g1). st6+ are unknown ids.
STRATEGY_CATALOG = (
    # (strategy, realm_meta_binding, group1_meta_binding, referenced)
    ("st0", True, False, True),   # the default strategy
    ("st1", True, False, False),
    ("st2", True, False, False),
    ("st3", False, True, True),   # bound for group g1
    ("st4", False, False, True),  # referenced by an override
    ("st5", False, False, False),
)

# Current placement-map entries; n6 is absent (the defaults branch of
# the drain freeze check). DEFAULT_LOCATION="default",
# DEFAULT_NODE_WEIGHT=100 (core/src/structs/placement.rs:10-11).
NODE_CATALOG = tuple(
    (f"n{i}", f"dc{i % 3}", 100 + i * 10, i % 2 == 0) for i in range(6)
)

_MUT_KINDS = (
    "upsert_node_draining",
    "upsert_node",
    "upsert_strategy",
    "remove_strategy",
    "set_default_strategy",
    "set_binding",
    "set_override",
    "remove_entry",
)


def _duck_placement_mutations_sql() -> str:
    strat_values = ", ".join(
        f"('{s}', {str(m).upper()}, {str(g).upper()}, {str(r).upper()})"
        for s, m, g, r in STRATEGY_CATALOG
    )
    node_values = ", ".join(
        f"('{n}', '{loc}', {w}, {str(full).upper()})"
        for n, loc, w, full in NODE_CATALOG
    )
    kinds = " ".join(
        f"WHEN {i} THEN '{k}'" for i, k in enumerate(_MUT_KINDS)
    )
    return f"""
    WITH strategies(strategy, realm_meta, g1_meta, referenced) AS (
      VALUES {strat_values}
    ),
    nodes(node, location, weight, is_full) AS (VALUES {node_values}),
    reqs AS (
      SELECT p_partkey AS k,
             CASE ((p_partkey - 5) % 64) // 8 {kinds} END AS mutation,
             'n' || (p_partkey % 7) AS node_id,
             'st' || (p_partkey % 9) AS strategy_id,
             CASE p_partkey % 5 WHEN 0 THEN 'group:g1'
                  WHEN 1 THEN 'group:g2' WHEN 2 THEN 'realm'
                  WHEN 3 THEN 'path-prefix' ELSE 'class:blob' END AS scope,
             p_partkey % 5 = 2 AS weight_diverges,
             p_partkey % 5 = 3 AS location_diverges,
             p_partkey % 9 = 4 AS zero_replicas,
             p_partkey % 3 > 0 AS override_has_strategy
      FROM part WHERE p_partkey % 8 = 5
    ),
    joined AS (
      SELECT q.*, s.strategy IS NOT NULL AS strategy_exists,
             COALESCE(s.realm_meta, FALSE) AS realm_meta,
             COALESCE(s.g1_meta, FALSE) AS g1_meta,
             COALESCE(s.referenced, FALSE) AS referenced
      FROM reqs q LEFT JOIN strategies s ON s.strategy = q.strategy_id
    ),
    classified AS (
      SELECT k AS request_id, mutation, node_id, strategy_id, scope,
             CASE mutation
               WHEN 'upsert_node_draining' THEN
                 CASE WHEN weight_diverges OR location_diverges
                        THEN 'frozen_attributes' ELSE 'ok' END
               WHEN 'upsert_strategy' THEN
                 CASE WHEN zero_replicas THEN 'zero_replica_count'
                      ELSE 'ok' END
               WHEN 'remove_strategy' THEN
                 CASE WHEN referenced THEN 'strategy_referenced'
                      ELSE 'ok' END
               WHEN 'set_default_strategy' THEN
                 CASE WHEN NOT strategy_exists THEN 'missing_strategy'
                      WHEN NOT realm_meta THEN 'no_metadata_binding'
                      ELSE 'ok' END
               WHEN 'set_binding' THEN
                 CASE WHEN NOT strategy_exists THEN 'missing_strategy'
                      WHEN scope = 'class:blob' THEN 'ok'
                      WHEN scope = 'group:g1'
                           AND (g1_meta OR realm_meta) THEN 'ok'
                      WHEN scope <> 'group:g1' AND realm_meta THEN 'ok'
                      ELSE 'no_metadata_binding' END
               WHEN 'set_override' THEN
                 CASE WHEN override_has_strategy AND NOT strategy_exists
                        THEN 'missing_strategy' ELSE 'ok' END
               ELSE 'ok'
             END AS outcome
      FROM joined
    )
    SELECT request_id, mutation, node_id, strategy_id, scope, outcome,
           CASE WHEN outcome = 'ok' THEN NULL
                WHEN outcome = 'strategy_referenced'
                  THEN 'strategy_referenced'
                ELSE 'invalid_input' END AS error_class
    FROM classified
    """


@register(
    "realm_placement_mutation_validate",
    oracle=_duck_placement_mutations_sql(),
)
def realm_placement_mutation_validate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-mutation validation ladder of
    ``RealmPlacementMutation::validate``
    (mutate_realm_placement.rs:104-215), batch-classified:

    - ``UpsertNode`` with ``draining`` set freezes placement
      attributes — location/weight/full/labels must equal the current
      entry (or the defaults ``("default", 100, false, {})`` when the
      node has no entry yet) until the node un-drains or is removed;
      the fixture's divergence lanes cover weight and location against
      both the present (n0-n5) and absent (n6) branches;
    - ``UpsertStrategy`` rejects ``replica_count == Some(0)``;
    - ``SetDefaultStrategy`` requires the strategy to exist AND a
      realm-scoped Metadata binding in the binding directory
      (``require_metadata_binding`` — the default strategy must be
      resolvable for metadata documents);
    - ``SetBinding`` requires the strategy, then the metadata-binding
      gate mapped by scope: group scopes accept an exact group binding
      OR the realm fallback, realm/path-prefix/Metadata-class map to
      the realm scope, and non-metadata classes skip the gate;
    - ``RemoveStrategy`` rejects while referenced — as the default, by
      any strategy binding, placement binding, or override;
    - ``SetOverride`` with a strategy requires it to exist; a
      strategy-less override (pin/exclude only) always validates;
    - plain upserts and the Remove* mutations validate trivially.

    ``error_class`` mirrors the error enum (every rung above is
    ``InvalidInput`` except ``StrategyReferenced``). The APPLY-time
    transition guards (drain-time holder-set freeze, disjoint-holder
    transition, empty referenced shard — rs:421-446) re-resolve
    rendezvous holders over the pre/post configs; that resolution
    plane is covered by ``placement_resolve_holders``. The
    ``AppendPlacementBinding`` handle/provenance rungs live in the
    handle-range directory (allocate_handle.rs) — excluded with the
    orchestration plane. Both catalogs broadcast; one CASE chain."""
    strategies = spark.createDataFrame(
        list(STRATEGY_CATALOG),
        "strategy string, realm_meta boolean, g1_meta boolean, "
        "referenced boolean",
    )
    k = F.col("p_partkey")
    reqs = (
        load_table(spark, sf_dir, "part")
        .filter(k % 8 == 5)
        .select(
            k.alias("request_id"),
            F.element_at(
                F.array(*[F.lit(m) for m in _MUT_KINDS]),
                (((k - 5) % 64) / 8).cast("int") + 1,
            ).alias("mutation"),
            F.concat(F.lit("n"), (k % 7).cast("string")).alias("node_id"),
            F.concat(F.lit("st"), (k % 9).cast("string")).alias(
                "strategy_id"
            ),
            F.when(k % 5 == 0, "group:g1")
            .when(k % 5 == 1, "group:g2")
            .when(k % 5 == 2, "realm")
            .when(k % 5 == 3, "path-prefix")
            .otherwise("class:blob")
            .alias("scope"),
            (k % 5 == 2).alias("weight_diverges"),
            (k % 5 == 3).alias("location_diverges"),
            (k % 9 == 4).alias("zero_replicas"),
            (k % 3 > 0).alias("override_has_strategy"),
        )
    )
    j = reqs.join(
        F.broadcast(strategies),
        reqs["strategy_id"] == strategies["strategy"],
        "left",
    )
    exists = F.col("strategy").isNotNull()
    realm_meta = F.coalesce("realm_meta", F.lit(False))
    g1_meta = F.coalesce("g1_meta", F.lit(False))
    referenced = F.coalesce("referenced", F.lit(False))
    m = F.col("mutation")
    outcome = (
        F.when(
            m == "upsert_node_draining",
            F.when(
                F.col("weight_diverges") | F.col("location_diverges"),
                "frozen_attributes",
            ).otherwise("ok"),
        )
        .when(
            m == "upsert_strategy",
            F.when(F.col("zero_replicas"), "zero_replica_count").otherwise(
                "ok"
            ),
        )
        .when(
            m == "remove_strategy",
            F.when(referenced, "strategy_referenced").otherwise("ok"),
        )
        .when(
            m == "set_default_strategy",
            F.when(~exists, "missing_strategy")
            .when(~realm_meta, "no_metadata_binding")
            .otherwise("ok"),
        )
        .when(
            m == "set_binding",
            F.when(~exists, "missing_strategy")
            .when(F.col("scope") == "class:blob", "ok")
            .when(
                (F.col("scope") == "group:g1") & (g1_meta | realm_meta),
                "ok",
            )
            .when((F.col("scope") != "group:g1") & realm_meta, "ok")
            .otherwise("no_metadata_binding"),
        )
        .when(
            m == "set_override",
            F.when(
                F.col("override_has_strategy") & ~exists, "missing_strategy"
            ).otherwise("ok"),
        )
        .otherwise("ok")
    )
    return j.select(
        "request_id",
        "mutation",
        "node_id",
        "strategy_id",
        "scope",
        outcome.alias("outcome"),
        F.when(outcome == "ok", F.lit(None))
        .when(outcome == "strategy_referenced", "strategy_referenced")
        .otherwise("invalid_input")
        .alias("error_class"),
    )
