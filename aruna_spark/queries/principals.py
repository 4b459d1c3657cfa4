"""Plain group / user listings (the unfiltered paged walks).

Reference surface:

- ``operations/src/list_groups.rs:28-63`` — ListGroups: offset+limit
  page over the group keyspace in key order (scan limit =
  offset+limit, then skip(offset)); default limit 10,000.
- ``operations/src/list_users.rs:13-33`` — ListUsers: keyset page
  (limit, start_after) in user-id order with ``next_start_after``
  minted from the storage cursor.

The substring-search sections already cover principal DISCOVERY
(``queries/search.py`` buckets/groups/users); these are the plain
console listings. Model: groups are the corpus source families
(``group-{source}``, one member count roll-up per group); users are the
customer relation keyed ``user-{c_custkey}``.

Scale: both are dimension-sized scans (the reference clamps at 10k);
the page envelopes derive through the bounded TakeOrderedAndProject +
bounded_rank template — no global window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.pagination import bounded_rank
from aruna_spark.queries import register

_G_OFFSET, _G_LIMIT = 2, 10
_U_AFTER, _U_LIMIT = "user-0150", 25


@register(
    "registry_list_groups",
    oracle=f"""
    WITH groups AS (
      SELECT 'group-' || source AS name,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY name) - 1 AS pos FROM groups
    )
    SELECT name, n_members, CAST(pos AS INT) AS pos
    FROM ranked
    WHERE pos >= {_G_OFFSET} AND pos < {_G_OFFSET + _G_LIMIT}
    """,
)
def registry_list_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListGroups page (offset {2}, limit {10}) in name order with a
    member-count roll-up per group — the scan-then-skip(offset)
    discipline of list_groups.rs:46-63 as a bounded head + rank."""
    groups = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.concat(F.lit("group-"), F.col("source")).alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    )
    head = groups.orderBy("name").limit(_G_OFFSET + _G_LIMIT)
    ranked = bounded_rank(head, [F.col("name")], rank_name="__rn").withColumn(
        "pos", (F.col("__rn") - 1).cast("int")
    )
    return ranked.filter(F.col("pos") >= _G_OFFSET).select(
        "name", "n_members", "pos"
    )


@register(
    "registry_list_users",
    oracle=f"""
    WITH users AS (
      SELECT 'user-' || lpad(CAST(c_custkey AS VARCHAR), 4, '0') AS user_id,
             c_name AS display_name, c_nationkey
      FROM customer
    ),
    page AS (
      SELECT * FROM users WHERE user_id > '{_U_AFTER}'
      ORDER BY user_id LIMIT {_U_LIMIT}
    ),
    tot AS (
      SELECT COUNT(*) AS n FROM users WHERE user_id > '{_U_AFTER}'
    )
    SELECT user_id, display_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CASE WHEN (SELECT n FROM tot) > {_U_LIMIT}
                THEN (SELECT MAX(user_id) FROM page) END AS next_start_after
    FROM page
    """,
)
def registry_list_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListUsers keyset page: user-id order strictly after
    ``start_after``, ``next_start_after`` minted from the page's last id
    only when more remain (list_users.rs:22-33)."""
    users = load_table(spark, sf_dir, "customer").select(
        F.concat(
            F.lit("user-"), F.lpad(F.col("c_custkey").cast("string"), 4, "0")
        ).alias("user_id"),
        F.col("c_name").alias("display_name"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )
    after = users.filter(F.col("user_id") > _U_AFTER)
    page = after.orderBy("user_id").limit(_U_LIMIT)
    total = after.agg(F.count(F.lit(1)).alias("__total"))
    last = page.agg(F.max("user_id").alias("__last"))
    more = F.col("__total") > _U_LIMIT
    return (
        page.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(last))
        .select(
            "user_id",
            "display_name",
            "c_nationkey",
            F.when(more, F.col("__last")).alias("next_start_after"),
        )
    )
