"""Realm nodes info — the dashboard's cluster view.

Reference surface (``api/src/routes/info.rs:1358-1400``
``map_realm_nodes`` + ``load_realm_presence_best_effort``):

- the response enumerates the realm config's CONFIGURED node list
  (never the discovery set — an unconfigured-but-gossiping node does
  not appear, a configured-but-offline node does);
- ``present`` = discovered by realm-node discovery OR the serving
  node itself (``is_current`` — the local node is always present even
  when discovery degrades to local-only under the
  REALM_DISCOVERY_TIMEOUT race, rs:1402-1420);
- ``connection_status`` maps present → Connected, else Configured;
- the placement map entry joins in when the node is mapped
  (``effective_location`` falls back to "default" for an empty
  location — core/src/structs/placement.rs:10), else the placement
  group is absent;
- the latest published node-info document joins in when one was
  received (utilization's ``documents_held``/``load_permille`` are
  optional and must surface as absent, never zero — the same
  never-reads-as-zero discipline the usage route documents,
  rs:1345-1350), else the info group is absent.

Fixture (supplier): configured nodes ``node<k>``, kind k%3; the
serving node is ``node1``; discovery finds k%4 ∉ {1, 2} (node1 sits
in the excluded class, so its presence comes from the is_current
override); placement entries exist for k%5 ≠ 3 (empty location →
"default" when k%7 = 2); info documents exist for k%6 ≠ 4 with
nullable documents_held (k%13 = 6) and load_permille (k%17 = 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

CURRENT_NODE = "node1"

_REALM_NODES_ORACLE = f"""
WITH configured AS (
  SELECT s_suppkey AS k, 'node' || s_suppkey AS node_id,
         CASE s_suppkey % 3 WHEN 0 THEN 'management'
              WHEN 1 THEN 'server' ELSE 'local' END AS kind
  FROM supplier
),
flags AS (
  SELECT *,
         node_id = '{CURRENT_NODE}' OR k % 4 NOT IN (1, 2) AS present,
         k % 5 <> 3 AS has_placement,
         k % 6 <> 4 AS has_info
  FROM configured
)
SELECT node_id, kind, TRUE AS configured, present,
       CASE WHEN present THEN 'connected' ELSE 'configured' END
         AS connection_status,
       CASE WHEN has_placement THEN
         CASE WHEN k % 7 = 2 THEN 'default' ELSE 'dc' || (k % 3) END
       END AS location,
       CASE WHEN has_placement
            THEN CAST(100 + (k % 9) * 10 AS INT) END AS weight,
       CASE WHEN has_placement THEN k % 2 = 0 END AS full_flag,
       CASE WHEN has_placement THEN k % 11 = 5 END AS draining,
       CASE WHEN has_info THEN CAST(k * 1000 AS BIGINT) END
         AS storage_bytes_used,
       CASE WHEN has_info AND k % 13 <> 6 THEN CAST(k % 50 AS BIGINT)
         END AS documents_held,
       CASE WHEN has_info AND k % 17 <> 2 THEN CAST(k % 1000 AS INT)
         END AS load_permille,
       CASE WHEN has_info THEN CAST(1700000000000 + k AS BIGINT) END
         AS heartbeat_at_ms
FROM flags
"""


@register("realm_nodes_info", oracle=_REALM_NODES_ORACLE)
def realm_nodes_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The realm-nodes dashboard view (``map_realm_nodes``): one row
    per CONFIGURED node, presence = discovery ∪ {the serving node}
    (the is_current override is the lane that keeps the dashboard
    honest when discovery times out to local-only), the placement
    entry with the "default"-location fallback when mapped, and the
    latest node-info utilization when received — optional utilization
    fields stay NULL, never zero. Config, discovery set, placement
    map and info documents are all metadata-sized: every join
    broadcasts; the ladder is column algebra."""
    k = F.col("s_suppkey")
    configured = load_table(spark, sf_dir, "supplier").select(
        k.alias("k"),
        F.concat(F.lit("node"), k.cast("string")).alias("node_id"),
        F.when(k % 3 == 0, "management")
        .when(k % 3 == 1, "server")
        .otherwise("local")
        .alias("kind"),
    )
    kk = F.col("k")
    present = (F.col("node_id") == CURRENT_NODE) | ~(kk % 4).isin(1, 2)
    has_placement = kk % 5 != 3
    has_info = kk % 6 != 4
    return configured.select(
        "node_id",
        "kind",
        F.lit(True).alias("configured"),
        present.alias("present"),
        F.when(present, "connected").otherwise("configured").alias(
            "connection_status"
        ),
        F.when(
            has_placement,
            F.when(kk % 7 == 2, "default").otherwise(
                F.concat(F.lit("dc"), (kk % 3).cast("string"))
            ),
        ).alias("location"),
        F.when(has_placement, 100 + (kk % 9) * 10)
        .cast("int")
        .alias("weight"),
        F.when(has_placement, kk % 2 == 0).alias("full_flag"),
        F.when(has_placement, kk % 11 == 5).alias("draining"),
        F.when(has_info, kk * 1000).cast("long").alias(
            "storage_bytes_used"
        ),
        F.when(has_info & (kk % 13 != 6), kk % 50)
        .cast("long")
        .alias("documents_held"),
        F.when(has_info & (kk % 17 != 2), kk % 1000)
        .cast("int")
        .alias("load_permille"),
        F.when(has_info, 1_700_000_000_000 + kk)
        .cast("long")
        .alias("heartbeat_at_ms"),
    )
