"""Generic relational operator coverage (SURVEY §2.2-2.7).

The reference's SPARQL algebra reduces to scans, filters, equi-joins,
left/anti/semi joins, aggregation, sort/limit, and set ops; these queries
exercise each of those operator families on the TPC-H-ish substrate so the
DuckDB oracle can certify them independently of the SPARQL front-end
(which is certified separately in ``sparql_suite``).

Scale notes (100 TB design):
- every aggregate is expressed as a single groupBy → map-side partial
  aggregation + one shuffle; no driver-side loops;
- dimension joins (region/nation/supplier) stay under the broadcast
  threshold at any realistic scale → broadcast hash joins, no shuffle of
  the fact table for those edges;
- money/quantity sums run on DECIMAL so results are order-independent
  (float sums are not associative and would make a 1000-partition result
  nondeterministic — exactness here IS the scale story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# --------------------------------------------------------------------------
# q1: scan + filter + groupBy aggregation (TPC-H Q1 shape)
# Reference analog: SPARQL Group+aggregates (operations/src/metadata/api.rs:2039-2049).
# --------------------------------------------------------------------------
@register(
    "rel_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q2: 3-way join + agg + top-k (TPC-H Q3 shape) — order-by/limit coverage
# Reference analog: OrderBy/Slice (api.rs:2030-2038) over joined BGPs.
# --------------------------------------------------------------------------
@register(
    "rel_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q3: 6-way snowflake join (TPC-H Q5 shape) — broadcast-dim strategy
# --------------------------------------------------------------------------
@register(
    "rel_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # supplier scales with SF — no forced broadcast (OOM risk at 100×);
        # AQE picks broadcast at small SF and shuffle join at scale.
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q4: aggregate variety — COUNT/COUNT DISTINCT/MIN/MAX/SUM over groups
# Reference analog: SPARQL 1.1 aggregate set (api.rs:2039-2049).
# --------------------------------------------------------------------------
@register(
    "rel_agg_kinds",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def rel_agg_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# q5: window function — latest order per customer (deterministic tie-break).
# This is the reference's LWW / path-claim winner pattern
# (core/src/structs/path_claim.rs:41-75): row_number over a total order.
# --------------------------------------------------------------------------
@register(
    "rel_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) t
    WHERE rn = 1
    """,
)
def rel_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q6: set operations — UNION / EXCEPT(Minus) / DISTINCT in one result
# Reference analog: SPARQL Union (api.rs:2043-2048), Minus → left_anti.
# --------------------------------------------------------------------------
@register(
    "rel_setops",
    oracle="""
    SELECT custkey, tag FROM (
        SELECT DISTINCT o_custkey AS custkey, 'urgent_or_high' AS tag
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION
        SELECT DISTINCT o_custkey AS custkey, 'big_spender' AS tag
        FROM orders WHERE o_totalprice > 300000
    ) u
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderstatus = 'F' AND o.o_custkey = u.custkey
    )
    """,
)
def rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .withColumn("tag", F.lit("urgent_or_high"))
    )
    big = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .withColumn("tag", F.lit("big_spender"))
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        urgent.unionByName(big)
        .dropDuplicates()
        .join(finished, "custkey", "left_anti")
    )


# --------------------------------------------------------------------------
# q7: semi/anti joins — EXISTS / NOT EXISTS (SPARQL FILTER EXISTS, Minus)
# --------------------------------------------------------------------------
@register(
    "rel_exists_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, has_order FROM (
        SELECT c_custkey, c_name, TRUE AS has_order
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT c_custkey, c_name, FALSE AS has_order
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ) t
    """,
)
def rel_exists_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("has_order", F.lit(True))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("has_order", F.lit(False))
    )
    return with_orders.unionByName(without)


# --------------------------------------------------------------------------
# q8: keyset pagination — the reference's cursor/watermark pattern
# (search_cursor.rs:298-397 and S3 continuation tokens) on a sorted key.
# Page 2 of orders ordered by (o_orderdate, o_orderkey), page size 25.
# --------------------------------------------------------------------------
@register(
    "rel_keyset_page",
    oracle="""
    WITH page1 AS (
        SELECT o_orderdate, o_orderkey FROM orders
        ORDER BY o_orderdate, o_orderkey LIMIT 25
    ), watermark AS (
        SELECT MAX(o_orderdate) AS wd, MAX(o_orderkey) AS wk FROM (
            SELECT * FROM page1 ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
        )
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate
    FROM orders o, watermark w
    WHERE (o.o_orderdate > w.wd) OR (o.o_orderdate = w.wd AND o.o_orderkey > w.wk)
    ORDER BY o.o_orderdate, o.o_orderkey
    LIMIT 25
    """,
)
def rel_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aruna_spark.ops.pagination import keyset_page

    orders = load_table(spark, sf_dir, "orders")
    page1, cursor = keyset_page(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        sort_keys=["o_orderdate", "o_orderkey"],
        page_size=25,
    )
    page2, _ = keyset_page(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        sort_keys=["o_orderdate", "o_orderkey"],
        page_size=25,
        after=cursor,
    )
    return page2.select("o_orderkey", "o_custkey", "o_orderdate")


# --------------------------------------------------------------------------
# q9: events scan — JSON extraction + time bucketing (events plane, batch view)
# --------------------------------------------------------------------------
@register(
    "rel_events_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def rel_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# as-of join: for each purchase, the user's latest click at-or-before it —
# the classic time-series attribution join Spark has no native operator
# for. Implemented as the UNION + RUNNING-LAST pattern: tag both sides,
# sort per user by (ts, side, event_id), and carry the last non-null
# build-side payload forward — ONE shuffle on the join key, no
# inequality join (a naive t1.ts <= t2.ts theta join is a nested-loop
# cross product at any scale). Tie rules are exact and oracle-matched:
# a click at the same timestamp as the purchase matches (<=, build rows
# sort before probe rows at equal ts), and among equal-ts clicks the
# largest event_id wins.
#
# Scale (100 TB): one shuffle partitions by user; the window is
# per-user running state (no unpartitioned window), so skew follows the
# per-user event volume — the same bound as any per-entity fold. The
# oracle derives the answer independently via a LATERAL top-1 probe.
# --------------------------------------------------------------------------
@register(
    "rel_asof_latest_click",
    oracle="""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS ts_us,
           l.c_eid AS click_id, l.c_ts_us AS click_ts_us,
           epoch_us(p.ts) - l.c_ts_us AS gap_us
    FROM purchases p
    LEFT JOIN LATERAL (
      SELECT c.event_id AS c_eid, epoch_us(c.ts) AS c_ts_us
      FROM clicks c
      WHERE c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) l ON TRUE
    """,
)
def rel_asof_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_attribution(load_table(spark, sf_dir, "events"))


def asof_attribution(
    events: DataFrame,
    build_type: str = "click",
    probe_type: str = "purchase",
) -> DataFrame:
    """The as-of core over any events-shaped relation ``(event_id, ts,
    user_id, event_type)`` — exposed for the property test, which pins
    it against a pure-Python model on randomized event sets."""
    from pyspark.sql import Window

    build = events.filter(F.col("event_type") == build_type).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        "event_id",
        F.col("event_id").alias("c_eid"),
        F.col("ts").alias("c_ts"),
    )
    probe = events.filter(F.col("event_type") == probe_type).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("long").alias("c_eid"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = build.unionByName(probe)
    return (
        u.withColumn("click_id", F.last("c_eid", ignorenulls=True).over(w))
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "click_id",
            F.unix_micros("click_ts").alias("click_ts_us"),
            (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# range (interval) join: per purchase, the same user's clicks inside the
# trailing 10-minute window — bucketed so it NEVER becomes an
# inequality nested loop. Both sides bucket time at the window width;
# each probe joins candidate buckets {b-1, b} (width == range, so two
# buckets cover the interval exactly), then the exact predicate filters
# in micros. Candidates per probe are bounded by two buckets of one
# user's clicks; at 100 TB this is the standard interval-bucket band
# join (equi-join on (user, bucket) -> hash join + partial agg), while
# the oracle runs DuckDB's native inequality (IE) join independently.
# --------------------------------------------------------------------------
RANGE_WINDOW_US = 600_000_000  # 10 minutes


@register(
    "rel_range_window_join",
    oracle=f"""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS ts_us,
           COUNT(c.event_id) AS n_clicks,
           CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,4))), 0) AS DOUBLE)
             AS click_value
    FROM purchases p
    LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {RANGE_WINDOW_US}
     AND epoch_us(c.ts) < epoch_us(p.ts)
    GROUP BY 1, 2, 3
    """,
)
def rel_range_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_window_attribution(load_table(spark, sf_dir, "events"))


def range_window_attribution(
    events: DataFrame,
    window_us: int = RANGE_WINDOW_US,
    build_type: str = "click",
    probe_type: str = "purchase",
) -> DataFrame:
    """The interval-bucket band-join core over any events-shaped
    relation — exposed for the property test (the bucket decomposition
    must be lossless for ANY window width and timestamp pattern)."""
    w = int(window_us)
    clicks = events.filter(F.col("event_type") == build_type).select(
        F.col("user_id"),
        F.unix_micros("ts").alias("c_us"),
        F.col("value").alias("c_value"),
        # integer div: exact at epoch scale (double division can round
        # across a bucket boundary)
        F.expr(f"unix_micros(ts) div {w}").alias("bucket"),
    )
    purchases = events.filter(F.col("event_type") == probe_type).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"ts_us div {w}") - 1,
                F.expr(f"ts_us div {w}"),
            )
        ),
    )
    matched = (
        probes.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("c_us") >= F.col("ts_us") - w)
            & (F.col("c_us") < F.col("ts_us"))
        )
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("c_value").cast(DEC)).cast("double").alias(
                "click_value"
            ),
        )
    )
    return purchases.join(matched, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        "ts_us",
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("click_value"), F.lit(0.0)).alias("click_value"),
    )


# --------------------------------------------------------------------------
# sessionization: the standard event-pipeline fold — per user, a new
# session starts when the gap since the previous event exceeds the
# timeout; events carry a stable session id (user, session ordinal) and
# sessions roll up to (start, end, duration, events, value). Both the
# gap flag (lag) and the ordinal (running sum of flags) are windows
# PARTITIONED BY user — per-entity state, never an unpartitioned
# window; the rollup is one groupBy. Distinct from the watch plane's
# debounce_sessions (session WINDOWS for publish coalescing): this
# assigns durable ids and per-session aggregates, the training-data
# pipeline's sessionize step.
# --------------------------------------------------------------------------
SESSION_GAP_US = 1_800_000_000  # 30 minutes


@register(
    "rel_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > {SESSION_GAP_US} OR
                  lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(order)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
