"""PutBucketReplication config validation (VERDICT r8 'What's
missing' #4) — the check ladder only; the mirror transport is excluded
orchestration.

Reference surface:

- ``api/src/s3/s3_service.rs:300-360`` — ``parse_replication_targets``:
  (1) a workspace (``ws-``) bucket cannot be a replication SOURCE —
  rejects the whole config before any rule is read;
  (2) rules whose status is not ENABLED are skipped;
  (3) the destination parses as an Aruna ARN
      (``core/src/structs/replication.rs:111-147``):
      ``arn:aruna:<realm>:<node>:<type>/<path>`` — missing prefix,
      missing node id, missing resource path, unsupported type, empty
      path all reject; the resource TYPE (the pre-slash segment) is
      validated BEFORE checking a path follows
      (replication.rs:129-137 — ArunaArnType::parse runs on
      ``splitn(2, '/')``'s first part, the path check on the second),
      so ``...:node1:foo`` first-fails bad_type, not missing_path;
  (4) the ARN type must be s3;
  (5) the target realm must equal the caller's realm;
  (6) the ARN must name a BUCKET, not a key prefix (no ``/`` in path);
  (7) a ``ws-`` bucket cannot be a replication TARGET;
  (8) source and target must differ (same node AND same bucket);
  accepted rules carry (node_id, bucket, replicate_delete_markers —
  true iff DeleteMarkerReplication status is ENABLED,
  s3_service.rs:352-356).
- ``operations/src/s3/put_bucket_replication.rs`` — the accepted
  target list lands on the bucket record (storage CRUD, route glue).

Spark mapping: the whole ladder is one CASE cascade over string
columns — starts_with / regexp_extract / split — evaluated in check
ORDER so each rule reports its FIRST failure exactly like the
short-circuiting Rust. Configs are scan-scale (one rule per fixture
order); no joins at all, so the plan is a single narrow map stage.

Fixture (orders, row selection ``% 17 == 4``; discriminators % 19
(ws-source), % 5 (disabled), % 9 (ARN lane), % 2 (delete markers) are
pairwise coprime to 17): our realm = realmA, our node = node1, source
bucket = ``bkt<k%6>`` (or ``ws-stage`` when % 19 == 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

OUR_REALM = "realmA"
OUR_NODE = "node1"
ARN_PREFIX = "arn:aruna:"

# lane → destination ARN template ({src} = the source bucket name)
ARN_LANES = [
    "arn:aruna:realmA:node2:s3/corpus",        # 0 accepted, other node
    "arn:aruna:realmA:node1:s3/other",         # 1 accepted, same node
    "aws:arn:realmA:node2:s3/corpus",          # 2 bad_prefix
    "arn:aruna:realmA",                        # 3 missing_node
    "arn:aruna:realmA:node1:ch/deadbeef",      # 4 not_s3
    "arn:aruna:realmB:node2:s3/corpus",        # 5 foreign_realm
    "arn:aruna:realmA:node2:s3/corpus/prefix", # 6 prefix_path
    "arn:aruna:realmA:node2:s3/ws-scratch",    # 7 ws_target
    "arn:aruna:realmA:node1:s3/{src}",         # 8 self_target
]


def load_replication_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 17 == 4
    )
    k = F.col("o_orderkey")
    src = F.when(k % 19 == 0, F.lit("ws-stage")).otherwise(
        F.concat(F.lit("bkt"), (k % 6).cast("string"))
    )
    arn = F.element_at(
        F.array(*[F.lit(t) for t in ARN_LANES]), ((k % 9) + 1).cast("int")
    )
    return o.select(
        k.alias("rule_id"),
        src.alias("source_bucket"),
        F.when(k % 5 == 1, "Disabled").otherwise("Enabled").alias("status"),
        F.replace(arn, F.lit("{src}"), src).alias("destination_arn"),
        (k % 2 == 0).alias("delete_markers_enabled"),
    )


_RULES_SQL = """
    rrules AS (
      SELECT o_orderkey AS rule_id,
             CASE WHEN o_orderkey % 19 = 0 THEN 'ws-stage'
                  ELSE 'bkt' || (o_orderkey % 6) END AS source_bucket,
             CASE WHEN o_orderkey % 5 = 1 THEN 'Disabled'
                  ELSE 'Enabled' END AS status,
             replace(
               CASE o_orderkey % 9
                 WHEN 0 THEN 'arn:aruna:realmA:node2:s3/corpus'
                 WHEN 1 THEN 'arn:aruna:realmA:node1:s3/other'
                 WHEN 2 THEN 'aws:arn:realmA:node2:s3/corpus'
                 WHEN 3 THEN 'arn:aruna:realmA'
                 WHEN 4 THEN 'arn:aruna:realmA:node1:ch/deadbeef'
                 WHEN 5 THEN 'arn:aruna:realmB:node2:s3/corpus'
                 WHEN 6 THEN 'arn:aruna:realmA:node2:s3/corpus/prefix'
                 WHEN 7 THEN 'arn:aruna:realmA:node2:s3/ws-scratch'
                 ELSE 'arn:aruna:realmA:node1:s3/{src}' END,
               '{src}',
               CASE WHEN o_orderkey % 19 = 0 THEN 'ws-stage'
                    ELSE 'bkt' || (o_orderkey % 6) END) AS destination_arn,
             o_orderkey % 2 = 0 AS delete_markers_enabled
      FROM orders WHERE o_orderkey % 17 = 4
    )
"""


def validate_replication(rules: DataFrame) -> DataFrame:
    """The parse_replication_targets ladder as one CASE cascade; the
    outcome is each rule's FIRST failing check (the Rust short-
    circuits in this exact order)."""
    arn = F.col("destination_arn")
    rem = F.substring(arn, len(ARN_PREFIX) + 1, 1_000_000)
    n_colons = F.size(F.split(rem, ":")) - 1
    realm = F.split_part(rem, F.lit(":"), F.lit(1))
    node = F.split_part(rem, F.lit(":"), F.lit(2))
    resource = F.regexp_extract(rem, r"^[^:]+:[^:]+:(.*)$", 1)
    rtype = F.substring_index(resource, "/", 1)
    has_path = F.contains(resource, F.lit("/"))
    path = F.regexp_extract(resource, r"^[^/]*/(.*)$", 1)
    bucket = F.substring_index(path, "/", 1)
    has_prefix = F.contains(path, F.lit("/"))
    outcome = (
        F.when(F.col("source_bucket").startswith("ws-"), "ws_source")
        .when(F.col("status") != "Enabled", "skipped_disabled")
        .when(~arn.startswith(ARN_PREFIX), "bad_prefix")
        .when(n_colons < 1, "missing_node")
        .when(n_colons < 2, "missing_resource")
        .when(~rtype.isin("s3", "ch"), "bad_type")
        .when(~has_path, "missing_path")
        .when(path == "", "empty_path")
        .when(rtype != "s3", "not_s3")
        .when(realm != OUR_REALM, "foreign_realm")
        .when(has_prefix, "prefix_path")
        .when(bucket.startswith("ws-"), "ws_target")
        .when(
            (node == OUR_NODE) & (bucket == F.col("source_bucket")),
            "self_target",
        )
        .otherwise("accepted")
    )
    ok = outcome == "accepted"
    return rules.select(
        "rule_id",
        "source_bucket",
        "destination_arn",
        outcome.alias("outcome"),
        F.when(ok, node).alias("target_node"),
        F.when(ok, bucket).alias("target_bucket"),
        F.when(ok, F.col("delete_markers_enabled"))
        .otherwise(F.lit(None).cast("boolean"))
        .alias("replicate_delete_markers"),
    )


@register(
    "s3_replication_validate",
    oracle=f"""
    WITH {_RULES_SQL},
    parsed AS (
      SELECT *,
             substring(destination_arn, {len(ARN_PREFIX) + 1}) AS rem
      FROM rrules
    ),
    staged AS (
      SELECT *,
             len(string_split(rem, ':')) - 1 AS n_colons,
             split_part(rem, ':', 1) AS realm,
             split_part(rem, ':', 2) AS node,
             regexp_extract(rem, '^[^:]+:[^:]+:(.*)$', 1) AS resource
      FROM parsed
    ),
    typed AS (
      SELECT *,
             split_part(resource, '/', 1) AS rtype,
             contains(resource, '/') AS has_path,
             regexp_extract(resource, '^[^/]*/(.*)$', 1) AS path
      FROM staged
    ),
    outcomes AS (
      SELECT *,
             split_part(path, '/', 1) AS bucket,
             contains(path, '/') AS has_prefix,
             CASE
               WHEN starts_with(source_bucket, 'ws-') THEN 'ws_source'
               WHEN status <> 'Enabled' THEN 'skipped_disabled'
               WHEN NOT starts_with(destination_arn, '{ARN_PREFIX}')
                 THEN 'bad_prefix'
               WHEN len(string_split(rem, ':')) - 1 < 1
                 THEN 'missing_node'
               WHEN len(string_split(rem, ':')) - 1 < 2
                 THEN 'missing_resource'
               WHEN split_part(resource, '/', 1) NOT IN ('s3', 'ch')
                 THEN 'bad_type'
               WHEN NOT contains(resource, '/') THEN 'missing_path'
               WHEN regexp_extract(resource, '^[^/]*/(.*)$', 1) = ''
                 THEN 'empty_path'
               WHEN split_part(resource, '/', 1) <> 's3' THEN 'not_s3'
               WHEN split_part(rem, ':', 1) <> '{OUR_REALM}'
                 THEN 'foreign_realm'
               WHEN contains(regexp_extract(resource, '^[^/]*/(.*)$', 1),
                             '/') THEN 'prefix_path'
               WHEN starts_with(
                   split_part(
                     regexp_extract(resource, '^[^/]*/(.*)$', 1), '/', 1),
                   'ws-') THEN 'ws_target'
               WHEN split_part(rem, ':', 2) = '{OUR_NODE}'
                AND split_part(
                      regexp_extract(resource, '^[^/]*/(.*)$', 1), '/', 1)
                    = source_bucket THEN 'self_target'
               ELSE 'accepted' END AS outcome
      FROM typed
    )
    SELECT rule_id, source_bucket, destination_arn, outcome,
           CASE WHEN outcome = 'accepted' THEN node END AS target_node,
           CASE WHEN outcome = 'accepted' THEN bucket END
             AS target_bucket,
           CASE WHEN outcome = 'accepted' THEN delete_markers_enabled
           END AS replicate_delete_markers
    FROM outcomes
    """,
)
def s3_replication_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture configs through the ladder — see
    :func:`validate_replication`."""
    return validate_replication(load_replication_rules(spark, sf_dir))
