"""Placement-handle range directory + the allocation walk.

Reference surface (``core/src/structs/handle_allocation.rs``,
``operations/src/allocate_handle.rs``):

- ``HandleRangeDirectory::from_ranges`` (handle_allocation.rs:23-59) —
  the FAIL-CLOSED derived view over replicated handle grants: a
  ``range_id`` carrying two distinct values is a same-key divergence
  and conflicts; any two ranges with different ids whose intervals
  intersect BOTH conflict; conflicted ranges never become allocatable.
- ``granted_to`` (rs:66-79) — the non-conflicted ranges of one owner,
  sorted by (start, range_id): the disjoint slices it may mint from.
- ``HandleAllocationCursor::allocate`` (rs:127-150) — draws the lowest
  unused handle at or after the durable cursor inside the owner's
  granted slices; the FIRST handle of every range (``start``) is the
  owner's reserved JobControl handle and is never drawn; ``None`` once
  every granted handle is spent (PlacementHandleExhausted,
  allocate_handle.rs:148-151). With a fresh cursor the walk enumerates
  exactly ``start+1 .. end-1`` of each granted range in directory
  order — pure cumulative-capacity arithmetic, which is how the
  relational form computes draw *n* without simulating the loop.
- ``free_band_in`` (rs:88-110) — the lowest HANDLE_RANGE_SIZE (1024)
  band inside the grantable span intersecting NO stored grant,
  conflicted grants included conservatively; the provisioning path
  grants fresh bands from it. Constants: FIRST_GRANTABLE_HANDLE 3,
  HANDLE_RANGE_SIZE 1024 (placement.rs:238-243).

Fixture (part ``% 16 == 9``): grant j sits in band (j·7)%1021
(mostly unique — the fail-closed rule must leave allocatable grants),
EXCEPT the pile-up lane j%29 == 7 which forces band 0 so several
grants overlap there, all of them conflict, AND the free-band scan
must walk past the occupied low bands; owner ``w<j%5>``, usable
capacity 1 + j%3 — except the rare owner w9 (j%97 == 50, one grant
at sf0.01) whose single usable handle makes draws 2..5 the
``placement_handle_exhausted`` lane; the same-key-divergence lane
reuses the PREVIOUS grant's range_id with a different interval
(j%13 == 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

FIRST_GRANTABLE_HANDLE = 3  # placement.rs:238
HANDLE_RANGE_SIZE = 1024  # placement.rs:243
WALK_DRAWS = 5  # bounded allocation walk per owner

_GRANTS_SQL = f"""
    grants AS (
      SELECT 'r' || (CASE WHEN p_partkey % 13 = 5
                          THEN p_partkey - 16 ELSE p_partkey END)
               AS range_id,
             'w' || (CASE WHEN p_partkey % 97 = 50 THEN 9 ELSE p_partkey % 5 END) AS owner,
             CAST({FIRST_GRANTABLE_HANDLE}
                  + {HANDLE_RANGE_SIZE} * (CASE WHEN p_partkey % 29 = 7
                      THEN 0 ELSE (p_partkey * 7) % 1021 END)
                  AS BIGINT) AS start,
             CAST({FIRST_GRANTABLE_HANDLE}
                  + {HANDLE_RANGE_SIZE} * (CASE WHEN p_partkey % 29 = 7
                      THEN 0 ELSE (p_partkey * 7) % 1021 END)
                  + 2 + (CASE WHEN p_partkey % 97 = 50 THEN 0 ELSE p_partkey % 3 END) AS BIGINT) AS "end"
      FROM part WHERE p_partkey % 16 = 9
    ),
    conflicted_ids AS (
      SELECT DISTINCT range_id FROM (
        -- same-key divergence: one id, >1 distinct value
        SELECT range_id FROM grants
        GROUP BY range_id
        HAVING COUNT(DISTINCT (owner, start, "end")) > 1
        UNION ALL
        -- interval overlap across different ids: both conflict
        SELECT a.range_id
        FROM grants a JOIN grants b
          ON a.range_id <> b.range_id
         AND a.start < b."end" AND b.start < a."end"
      )
    ),
    classified AS (
      SELECT g.*, c.range_id IS NOT NULL AS conflicted
      FROM grants g LEFT JOIN conflicted_ids c USING (range_id)
    )
"""


@register(
    "handle_range_directory",
    oracle=f"""
    WITH {_GRANTS_SQL},
    ranked AS (
      SELECT *,
             CASE WHEN NOT conflicted THEN CAST(ROW_NUMBER() OVER (
               PARTITION BY owner, conflicted ORDER BY start, range_id
             ) AS BIGINT) END AS grant_rank
      FROM classified
    ),
    free_band AS (
      SELECT CAST({FIRST_GRANTABLE_HANDLE}
                  + {HANDLE_RANGE_SIZE} * MIN(b) AS BIGINT) AS band_start
      FROM range(0, 1022) t(b)
      WHERE NOT EXISTS (
        SELECT 1 FROM grants g
        WHERE g.start < {FIRST_GRANTABLE_HANDLE}
                        + {HANDLE_RANGE_SIZE} * (b + 1)
          AND {FIRST_GRANTABLE_HANDLE} + {HANDLE_RANGE_SIZE} * b
              < g."end"
      )
    )
    SELECT r.range_id, r.owner, r.start, r."end", r.conflicted,
           r.grant_rank, f.band_start AS free_band_start
    FROM ranked r CROSS JOIN free_band f
    """,
)
def handle_range_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fail-closed directory view: every grant classified
    (divergent same-key values and interval overlaps both conflict —
    and stay out of allocation), non-conflicted grants ranked per
    owner in (start, range_id) order, and the provisioning envelope —
    the lowest 1024-wide band no stored grant touches (conflicted
    grants still occupy their bands: fail-closed means a conflicted
    band is neither allocatable nor re-grantable). Grants are
    metadata-sized; the overlap check is one broadcast self-join."""
    grants = _load_grants(spark, sf_dir)
    b = grants.select(
        F.col("range_id").alias("rid_b"),
        F.col("start").alias("start_b"),
        F.col("end").alias("end_b"),
    )
    overlapping = (
        grants.join(
            F.broadcast(b),
            (F.col("range_id") != F.col("rid_b"))
            & (F.col("start") < F.col("end_b"))
            & (F.col("start_b") < F.col("end")),
            "left_semi",
        )
        .select("range_id")
    )
    divergent = (
        grants.groupBy("range_id")
        .agg(
            F.countDistinct(F.struct("owner", "start", "end")).alias("__n")
        )
        .filter(F.col("__n") > 1)
        .select("range_id")
    )
    conflicted_ids = overlapping.unionByName(divergent).distinct()
    classified = grants.join(
        F.broadcast(
            conflicted_ids.withColumn("conflicted", F.lit(True))
        ),
        "range_id",
        "left",
    ).withColumn("conflicted", F.coalesce("conflicted", F.lit(False)))
    from pyspark.sql.window import Window

    w = Window.partitionBy("owner", "conflicted").orderBy(
        "start", "range_id"
    )
    ranked = classified.withColumn(
        "grant_rank",
        F.when(~F.col("conflicted"), F.row_number().over(w).cast("long")),
    )
    bands = spark.range(0, 1022).select(
        (
            FIRST_GRANTABLE_HANDLE
            + HANDLE_RANGE_SIZE * F.col("id")
        ).alias("__bstart")
    )
    free = (
        bands.join(
            F.broadcast(grants),
            (F.col("start") < F.col("__bstart") + HANDLE_RANGE_SIZE)
            & (F.col("__bstart") < F.col("end")),
            "left_anti",
        )
        .agg(F.min("__bstart").cast("long").alias("free_band_start"))
    )
    return ranked.crossJoin(F.broadcast(free)).select(
        "range_id",
        "owner",
        "start",
        "end",
        "conflicted",
        "grant_rank",
        "free_band_start",
    )


def _load_grants(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = F.col("p_partkey")
    band = F.when(j % 29 == 7, F.lit(0)).otherwise((j * 7) % 1021)
    start = (FIRST_GRANTABLE_HANDLE + HANDLE_RANGE_SIZE * band).cast(
        "long"
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(j % 16 == 9)
        .select(
            F.concat(
                F.lit("r"),
                F.when(j % 13 == 5, j - 16).otherwise(j).cast("string"),
            ).alias("range_id"),
            F.concat(
                F.lit("w"),
                F.when(j % 97 == 50, F.lit(9)).otherwise(j % 5).cast(
                    "string"
                ),
            ).alias("owner"),
            start.alias("start"),
            (
                start
                + 2
                + F.when(j % 97 == 50, F.lit(0)).otherwise(j % 3)
            )
            .cast("long")
            .alias("end"),
        )
    )


@register(
    "handle_allocation_walk",
    oracle=f"""
    WITH {_GRANTS_SQL},
    granted AS (
      SELECT *,
             CAST("end" - start - 1 AS BIGINT) AS capacity,
             CAST(COALESCE(SUM("end" - start - 1) OVER (
               PARTITION BY owner ORDER BY start, range_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS prefix
      FROM classified WHERE NOT conflicted
    ),
    draws AS (
      SELECT DISTINCT owner FROM granted
    ),
    numbered AS (
      SELECT d.owner, CAST(n AS BIGINT) AS draw_n
      FROM draws d, range(1, {WALK_DRAWS + 1}) t(n)
    )
    SELECT n.owner, n.draw_n,
           g.range_id,
           CASE WHEN g.range_id IS NOT NULL
                THEN g.start + (n.draw_n - g.prefix) END AS handle,
           g.range_id IS NULL AS exhausted
    FROM numbered n
    LEFT JOIN granted g
      ON g.owner = n.owner
     AND n.draw_n > g.prefix AND n.draw_n <= g.prefix + g.capacity
    """,
)
def handle_allocation_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cursor walk as arithmetic: with a fresh durable cursor the
    n-th draw of an owner lands ``n - prefix`` handles into the first
    granted range whose cumulative capacity covers n (capacity =
    end − start − 1 — the range's first handle is the reserved
    JobControl handle and is never drawn). Draws beyond the owner's
    total capacity are the ``placement_handle_exhausted`` lane. The
    per-owner prefix sums run over the owner's own grants (a
    partitioned window on a metadata relation)."""
    from pyspark.sql.window import Window

    grants = _load_grants(spark, sf_dir)
    b = grants.select(
        F.col("range_id").alias("rid_b"),
        F.col("start").alias("start_b"),
        F.col("end").alias("end_b"),
    )
    overlapping = grants.join(
        F.broadcast(b),
        (F.col("range_id") != F.col("rid_b"))
        & (F.col("start") < F.col("end_b"))
        & (F.col("start_b") < F.col("end")),
        "left_semi",
    ).select("range_id")
    divergent = (
        grants.groupBy("range_id")
        .agg(
            F.countDistinct(F.struct("owner", "start", "end")).alias("__n")
        )
        .filter(F.col("__n") > 1)
        .select("range_id")
    )
    conflicted = overlapping.unionByName(divergent).distinct()
    granted = grants.join(F.broadcast(conflicted), "range_id", "left_anti")
    w = (
        Window.partitionBy("owner")
        .orderBy("start", "range_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    granted = granted.withColumn(
        "capacity", (F.col("end") - F.col("start") - 1).cast("long")
    ).withColumn(
        "prefix",
        F.coalesce(F.sum("capacity").over(w), F.lit(0)).cast("long"),
    )
    numbered = (
        granted.select("owner")
        .distinct()
        .crossJoin(
            spark.range(1, WALK_DRAWS + 1).select(
                F.col("id").cast("long").alias("draw_n")
            )
        )
    )
    g = granted.select(
        F.col("owner").alias("owner_g"),
        "range_id",
        "start",
        "prefix",
        "capacity",
    )
    joined = numbered.join(
        F.broadcast(g),
        (F.col("owner") == F.col("owner_g"))
        & (F.col("draw_n") > F.col("prefix"))
        & (F.col("draw_n") <= F.col("prefix") + F.col("capacity")),
        "left",
    )
    return joined.select(
        "owner",
        "draw_n",
        "range_id",
        F.when(
            F.col("range_id").isNotNull(),
            F.col("start") + (F.col("draw_n") - F.col("prefix")),
        )
        .cast("long")
        .alias("handle"),
        F.col("range_id").isNull().alias("exhausted"),
    )
