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

from aruna_spark.ops.mat import DISK_ONLY

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
    # r15: the overlap probe, divergence check and anti-join all read
    # the grant relation; the walk reads the surviving set twice —
    # materialize both metadata-sized frames once
    grants = _load_grants(spark, sf_dir).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
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

    # r15: the overlap probe, divergence check and anti-join all read
    # the grant relation; the walk reads the surviving set twice —
    # materialize both metadata-sized frames once
    grants = _load_grants(spark, sf_dir).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
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
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
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


# ---------------------------------------------- band-pool transfer slice
# ensure_realm_config.rs:580-610 (pool_transfer_slice + its
# pools_stay_disjoint / transfer_splits_pool / missing_pool_fails
# tests): when a new coordinator joins, it receives the UPPER HALF of
# the LARGEST run of free 1024-handle bands across the realm's spans —
# a band is free iff no consumed range intersects it; ties keep the
# FIRST largest run (strictly-greater comparison, spans scanned in
# order, bands ascending); the split keeps ceil(n/2) bands and
# transfers the remaining floor(n/2) — from start + ceil(n/2)·SIZE to
# the run end; fewer than two
# bands in the largest run → no pool (the new coordinator starts
# without one). Runs are the classic gaps-and-islands grouping —
# band_index − free_rank per (realm, span), a PARTITIONED window.
_POOL_REALMS = 8


def load_pool_spans(spark: SparkSession) -> DataFrame:
    rows = []
    for r in range(_POOL_REALMS):
        b0 = 1 if r == 7 else 4 + r % 5
        b1 = 1 if r == 7 else 3 + r % 3
        rows.append((f"realm-{r}", 0, 0, b0 * HANDLE_RANGE_SIZE))
        rows.append(
            (f"realm-{r}", 1, 102_400, 102_400 + b1 * HANDLE_RANGE_SIZE)
        )
    return spark.createDataFrame(
        rows, "realm_id string, span_idx int, span_start long, span_end long"
    )


def load_pool_consumed(spark: SparkSession) -> DataFrame:
    """Consumed HandleRanges: tiny grants whose intersection with a
    band consumes the whole band (the overlap rule rs:589-592)."""
    rows = []
    for r in range(_POOL_REALMS):
        spans = {0: 1 if r == 7 else 4 + r % 5, 1: 1 if r == 7 else 3 + r % 3}
        for j in range(2):
            if (r + j) % 3 == 2 and r != 7:
                continue  # lane without this grant
            si = j % 2 if r != 7 else 0
            start0 = 0 if si == 0 else 102_400
            band = (r * 2 + j) % spans[si]
            s = start0 + band * HANDLE_RANGE_SIZE + 10
            rows.append((f"realm-{r}", s, s + 2))
    return spark.createDataFrame(
        rows, "realm_id string, start long, end long"
    )


def pool_transfer_slice_py(
    spans: list[tuple[int, int]], consumed: list[tuple[int, int]]
) -> tuple[int, int] | None:
    """Literal port of ensure_realm_config.rs:582-610 for tests."""
    best = None
    for span_start, span_end in spans:
        run_start = None
        bands = max(span_end - span_start, 0) // HANDLE_RANGE_SIZE
        for band in range(bands + 1):
            start = span_start + band * HANDLE_RANGE_SIZE
            free = band < bands and not any(
                cs < start + HANDLE_RANGE_SIZE and start < ce
                for cs, ce in consumed
            )
            if free and run_start is None:
                run_start = start
            elif not free and run_start is not None:
                if best is None or start - run_start > best[1] - best[0]:
                    best = (run_start, start)
                run_start = None
    if best is None:
        return None
    start, end = best
    bands = (end - start) // HANDLE_RANGE_SIZE
    if bands < 2:
        return None
    return (start + -(-bands // 2) * HANDLE_RANGE_SIZE, end)


@register(
    "handle_pool_transfer_slice",
    oracle=f"""
    WITH spans AS (
      SELECT 'realm-' || r.i AS realm_id, s.i AS span_idx,
             CAST(CASE WHEN s.i = 0 THEN 0 ELSE 102400 END AS BIGINT)
               AS span_start,
             CAST(CASE WHEN s.i = 0
                  THEN (CASE WHEN r.i = 7 THEN 1
                        ELSE 4 + r.i % 5 END) * {HANDLE_RANGE_SIZE}
                  ELSE 102400 + (CASE WHEN r.i = 7 THEN 1
                        ELSE 3 + r.i % 3 END) * {HANDLE_RANGE_SIZE} END
               AS BIGINT) AS span_end
      FROM range({_POOL_REALMS}) r(i), range(2) s(i)
    ),
    consumed AS (
      SELECT 'realm-' || r.i AS realm_id,
             CAST((CASE WHEN (CASE WHEN r.i = 7 THEN 0
                              ELSE j.i % 2 END) = 0
                   THEN 0 ELSE 102400 END)
                  + ((r.i * 2 + j.i) % (CASE
                      WHEN r.i = 7 THEN 1
                      WHEN (CASE WHEN r.i = 7 THEN 0 ELSE j.i % 2 END) = 0
                        THEN 4 + r.i % 5
                      ELSE 3 + r.i % 3 END)) * {HANDLE_RANGE_SIZE}
                  + 10 AS BIGINT) AS start
      FROM range({_POOL_REALMS}) r(i), range(2) j(i)
      WHERE NOT ((r.i + j.i) % 3 = 2 AND r.i <> 7)
    ),
    bands AS (
      SELECT s.realm_id, s.span_idx, s.span_start,
             b.i AS band,
             s.span_start + b.i * {HANDLE_RANGE_SIZE} AS band_start
      FROM spans s, range(12) b(i)
      WHERE b.i < (s.span_end - s.span_start) // {HANDLE_RANGE_SIZE}
    ),
    free AS (
      SELECT b.* FROM bands b
      WHERE NOT EXISTS (
        SELECT 1 FROM consumed c
        WHERE c.realm_id = b.realm_id
          AND c.start < b.band_start + {HANDLE_RANGE_SIZE}
          AND b.band_start < c.start + 2
      )
    ),
    islands AS (
      SELECT *, band - ROW_NUMBER() OVER (
               PARTITION BY realm_id, span_idx ORDER BY band) AS grp
      FROM free
    ),
    distinct_runs AS (
      SELECT realm_id, span_idx,
             MIN(band_start) AS run_start,
             MAX(band_start) + {HANDLE_RANGE_SIZE} AS run_end,
             CAST(COUNT(*) AS BIGINT) AS run_bands
      FROM islands GROUP BY realm_id, span_idx, grp
    ),
    best AS (
      SELECT r.* FROM distinct_runs r
      WHERE NOT EXISTS (
        SELECT 1 FROM distinct_runs o
        WHERE o.realm_id = r.realm_id
          AND (o.run_bands > r.run_bands
               OR (o.run_bands = r.run_bands
                   AND (o.span_idx < r.span_idx
                        OR (o.span_idx = r.span_idx
                            AND o.run_start < r.run_start))))
          AND (o.span_idx, o.run_start) <> (r.span_idx, r.run_start)
      )
    )
    SELECT a.realm_id,
           CAST(b.span_idx AS INT) AS best_span,
           CAST(COALESCE(b.run_bands, 0) AS BIGINT) AS best_run_bands,
           CAST(CASE WHEN b.run_bands >= 2
                THEN b.run_start
                     + ((b.run_bands + 1) // 2) * {HANDLE_RANGE_SIZE}
                END AS BIGINT) AS slice_start,
           CAST(CASE WHEN b.run_bands >= 2 THEN b.run_end END AS BIGINT)
             AS slice_end,
           COALESCE(b.run_bands >= 2, FALSE) AS has_pool
    FROM (SELECT DISTINCT realm_id FROM spans) a
    LEFT JOIN best b USING (realm_id)
    """,
)
def handle_pool_transfer_slice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per realm: the largest free band run across its spans (first
    wins ties) and the upper-half transfer slice, NULL when fewer than
    two free bands remain in that run."""
    from pyspark.sql.window import Window

    spans = load_pool_spans(spark)
    consumed = load_pool_consumed(spark)
    # spans shorter than one band contribute nothing (rs:586-589: the
    # band loop's free test requires band < bands = 0) — filter them
    # BEFORE the sequence explode, which would otherwise auto-step
    # DOWNWARD for sequence(0, -1) and fabricate a phantom band
    spans = spans.filter(
        F.col("span_end") - F.col("span_start") >= HANDLE_RANGE_SIZE
    )
    bands = spans.select(
        "realm_id",
        "span_idx",
        "span_start",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.col("span_end") - F.col("span_start"))
                    / HANDLE_RANGE_SIZE
                ).cast("int")
                - 1,
            )
        ).alias("band"),
    ).withColumn(
        "band_start",
        F.col("span_start") + F.col("band") * HANDLE_RANGE_SIZE,
    )
    free = bands.join(
        F.broadcast(consumed),
        (bands["realm_id"] == consumed["realm_id"])
        & (consumed["start"] < bands["band_start"] + HANDLE_RANGE_SIZE)
        & (bands["band_start"] < consumed["end"]),
        "left_anti",
    )
    w = Window.partitionBy("realm_id", "span_idx").orderBy("band")
    islands = free.withColumn(
        "grp", F.col("band") - F.row_number().over(w)
    )
    runs = islands.groupBy("realm_id", "span_idx", "grp").agg(
        F.min("band_start").alias("run_start"),
        (F.max("band_start") + HANDLE_RANGE_SIZE).alias("run_end"),
        F.count(F.lit(1)).alias("run_bands"),
    )
    pick = Window.partitionBy("realm_id").orderBy(
        F.col("run_bands").desc(), "span_idx", "run_start"
    )
    best = (
        runs.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "grp")
    )
    realms = load_pool_spans(spark).select("realm_id").distinct()
    out = realms.join(F.broadcast(best), "realm_id", "left")
    has_pool = F.coalesce(F.col("run_bands") >= 2, F.lit(False))
    return out.select(
        "realm_id",
        F.col("span_idx").cast("int").alias("best_span"),
        F.coalesce(F.col("run_bands"), F.lit(0)).alias("best_run_bands"),
        F.when(
            has_pool,
            F.col("run_start")
            + F.ceil(F.col("run_bands") / 2) * HANDLE_RANGE_SIZE,
        )
        .cast("long")
        .alias("slice_start"),
        F.when(has_pool, F.col("run_end")).cast("long").alias("slice_end"),
        has_pool.alias("has_pool"),
    )
