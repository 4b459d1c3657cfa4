"""Storage routing: pick the backend for each write.

Reference: ``core/src/structs/routing.rs:442-521`` — candidates for a
write are tried in strict specificity order: **exact key** rule, then
**longest bucket prefix** (an empty prefix is the bucket default), then
the **group default**, then node rules; the first candidate that
RESOLVES wins. A candidate naming a storage **class** this node does
not offer is only a *miss* — the ladder falls through to the next
candidate (rs:483-497, ``warn_missed``) — while rule sets are validated
upstream so no two rules in a scope share ``(exact, key_prefix)``
(rs:524-535), making the ladder a total order. ``BlobVersionState::
Materialized`` stamps the resolved backend on the version so reads
never re-derive routing (blob.rs:833-836).

Spark mapping: the rule set is a per-bucket CONFIG dimension (tiny by
construction — S3 buckets carry tens of rules, not millions), so
resolution is one broadcast theta-join of the write batch against the
rules on ``exact ? key = prefix : startswith(key, prefix)``, then a
per-write argmax over the specificity ladder encoded as a sortable
struct ``(tier, prefix_len)`` — no window, no shuffle of the write
batch, and the class-catalog lookup is a second broadcast join. The
unresolvable-class fall-through is expressed by DROPPING unoffered
class candidates BEFORE the argmax (falling through = never winning),
with the missed flag kept for the warn path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

# specificity tiers (higher wins); within a tier, longer prefix wins
TIER_EXACT = 3
TIER_PREFIX = 2
TIER_GROUP_DEFAULT = 1


def resolve_backends(
    writes: DataFrame,
    rules: DataFrame,
    classes: DataFrame,
    group_default: str,
) -> DataFrame:
    """Per-write routing: (key, backend, via, missed_class).

    ``writes``: (key); ``rules``: (key_prefix, exact, target_kind
    ∈ {'backend','class'}, target); ``classes``: (class, backend) —
    the node's offered-class catalog. A class candidate with no catalog
    row is a miss: it falls through (is excluded from the argmax) and
    surfaces in ``missed_class`` when it outranked the winner."""
    r = rules.join(
        classes.withColumnRenamed("class", "target").withColumnRenamed(
            "backend", "__class_backend"
        ),
        "target",
        "left",
    ).select(
        "key_prefix",
        "exact",
        "target_kind",
        "target",
        F.when(F.col("target_kind") == "backend", F.col("target"))
        .otherwise(F.col("__class_backend"))
        .alias("resolved_backend"),
    )
    matched = writes.join(
        F.broadcast(r),
        F.when(F.col("exact"), F.col("key") == F.col("key_prefix")).otherwise(
            F.col("key").startswith(F.col("key_prefix"))
        ),
        "left",
    ).withColumn(
        "__spec",
        F.struct(
            F.when(F.col("exact"), F.lit(TIER_EXACT))
            .otherwise(F.lit(TIER_PREFIX))
            .alias("tier"),
            F.length("key_prefix").alias("plen"),
        ),
    )
    # ONE aggregation computes the winner AND the warn path (r15): the
    # r14 shape ran the write×rules theta join TWICE (one groupBy per
    # branch) and joined both back onto a third writes pass. max_by
    # ignores NULL-keyed rows, so the resolve/miss filters move into
    # conditional arguments; the left join above keeps rule-less
    # writes, so grouping by key retains every write (keys are unique
    # per batch — they are the route identity).
    resolved_ok = F.col("resolved_backend").isNotNull()
    is_missed_class = (
        (F.col("target_kind") == "class") & F.col("resolved_backend").isNull()
    )
    # the winner: most specific candidate that RESOLVES (unoffered
    # classes fall through by exclusion, rs:499-517); the warn path: a
    # MISSED class whose rule outranked the winner
    grouped = matched.groupBy("key").agg(
        F.max_by(
            F.when(
                resolved_ok,
                F.struct("resolved_backend", "exact", "key_prefix"),
            ),
            F.when(resolved_ok, F.col("__spec")),
        ).alias("__w"),
        F.max_by(
            F.when(is_missed_class, F.struct("target", "__spec")),
            F.when(is_missed_class, F.col("__spec")),
        ).alias("__m"),
    )
    out = (
        grouped.select(
            "key",
            F.col("__w.resolved_backend").alias("__backend"),
            F.when(F.col("__w.exact"), F.lit("exact"))
            .otherwise(F.concat(F.lit("prefix:"), F.col("__w.key_prefix")))
            .alias("__via"),
            F.col("__w.key_prefix").alias("__won_prefix"),
            F.col("__w.exact").alias("__won_exact"),
            F.col("__m.target").alias("__missed"),
            F.col("__m.__spec").alias("__missed_spec"),
        )
        .select(
            "key",
            F.coalesce(F.col("__backend"), F.lit(group_default)).alias(
                "backend"
            ),
            F.coalesce(F.col("__via"), F.lit("group_default")).alias("via"),
            F.when(
                F.col("__missed").isNotNull()
                & (
                    F.col("__backend").isNull()
                    | (F.col("__missed_spec.tier") > F.when(F.col("__won_exact"), TIER_EXACT).otherwise(TIER_PREFIX))
                    | (
                        (F.col("__missed_spec.tier") == F.when(F.col("__won_exact"), TIER_EXACT).otherwise(TIER_PREFIX))
                        & (F.col("__missed_spec.plen") > F.length("__won_prefix"))
                    )
                ),
                F.col("__missed"),
            ).alias("missed_class"),
        )
    )
    return out


def _rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 31 == 1
    )
    exact = docs.select(
        F.concat(
            F.lit("data/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt"),
        ).alias("key_prefix"),
        F.lit(True).alias("exact"),
        F.lit("backend").alias("target_kind"),
        F.lit("b-exact").alias("target"),
    )
    static = spark.createDataFrame(
        [
            ("data/src1/en/", False, "class", "class-cold"),  # NOT offered
            ("data/src1/", False, "backend", "b-src1"),
            ("data/src2/", False, "class", "class-std"),  # offered -> b-std
        ],
        "key_prefix string, exact boolean, target_kind string, target string",
    )
    return exact.unionByName(static)


def _classes(spark: SparkSession) -> DataFrame:
    # the node's offered classes: class-cold is deliberately absent
    return spark.createDataFrame(
        [("class-std", "b-std"), ("class-hot", "b-hot")],
        "class string, backend string",
    )


@register(
    "storage_routing_resolve",
    oracle="""
    WITH writes AS (
      SELECT 'data/' || source || '/' || lang || '/doc-' || doc_id || '.txt'
               AS key,
             doc_id, lang, source
      FROM documents WHERE doc_id % 13 <> 3
    )
    SELECT key,
           CASE WHEN doc_id % 31 = 1 THEN 'b-exact'
                WHEN source = 'src1' THEN 'b-src1'
                WHEN source = 'src2' THEN 'b-std'
                ELSE 'b-group' END AS backend,
           CASE WHEN doc_id % 31 = 1 THEN 'exact'
                WHEN source = 'src1' THEN 'prefix:data/src1/'
                WHEN source = 'src2' THEN 'prefix:data/src2/'
                ELSE 'group_default' END AS via,
           CASE WHEN source = 'src1' AND lang = 'en' AND doc_id % 31 <> 1
                THEN 'class-cold' END AS missed_class
    FROM writes
    """,
)
def storage_routing_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every live key routed through the specificity ladder: exact-rule
    keys pin their backend; src1/en writes hit the unoffered
    class-cold rule, MISS, and fall through to the src1 prefix rule
    (surfacing the miss for the warn path); src2 resolves through the
    offered class-std; everything else lands on the group default. The
    oracle re-derives every outcome closed-form from the key shape."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 13 != 3
    )
    writes = docs.select(
        F.concat(
            F.lit("data/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt"),
        ).alias("key")
    )
    return resolve_backends(
        writes, _rules(spark, sf_dir), _classes(spark), "b-group"
    )


def validate_rule_set(rules: DataFrame) -> None:
    """Rejects two rules sharing ``(exact, key_prefix)`` and invalid
    storage-class names — the write-time validation that lets the
    resolution ladder stay a total order (routing.rs:524-535;
    ``validate_storage_class`` rs:38-48: ``[a-z0-9-]{1,32}``)."""
    dup = (
        rules.groupBy("exact", "key_prefix")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate routing rule for prefix {dup[0].key_prefix!r}"
        )
    bad = (
        rules.filter(
            (F.col("target_kind") == "class")
            & ~F.col("target").rlike("^[a-z0-9-]{1,32}$")
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(f"invalid storage class {bad[0].target!r}")


# ===================================================== bucket routing config
# Put/GetBucketRouting — the CONFIG plane over the resolution ladder
# (VERDICT r9 Next #5). Reference:
#
# - ``operations/src/s3/bucket_routing.rs:49-170`` —
#   PutBucketRouting loads the ids the bucket's OWN group registered,
#   runs ``validate_tenant_rules`` and rejects the WHOLE config on the
#   first error; GetBucketRouting (rs:262-300) reads the stored rules
#   (missing bucket → NoSuchBucket).
# - ``core/src/structs/routing.rs:524-535`` (``validate_rule_set``) —
#   scanning rules IN ORDER: a rule sharing ``(exact, key_prefix)``
#   with an earlier rule is DuplicateRule; a class target failing
#   ``^[a-z0-9-]{1,32}$`` is InvalidClass (rs:38-48). The dup check
#   precedes the class check within a rule.
# - ``routing.rs:558-580`` (``validate_tenant_target``, second pass,
#   only reached when the rule set validated) — a NODE backend target
#   is OperatorBackendTarget, a group backend the bucket's group does
#   not own is ForeignBackend, class names re-validate.
# - ``routing.rs:584-605`` (``target_warnings``) — ADVISORY, computed
#   only for stored configs: a class the node does not offer to
#   tenants, or a backend that does not resolve, warns but stores.
#
# Fixture (orders, row selection % 23 == 7; discriminators 3, 5, 7,
# 11, 13 all coprime to 23): each row is one rule; configs group by
# bucket ``b<k%5>``; bucket b<j>'s group owns backends gb-<j>-0 and
# gb-<j>-1, of which only gb-<j>-0 resolves in the node catalog; the
# node offers classes {std, hot} to tenants. The duplicate lane
# (k%7==2) pins every such rule in a config to ('dup/', exact=false),
# so the config's second-and-later dup rows trip DuplicateRule.

OFFERED_CLASSES = ("std", "hot")


def load_routing_configs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 23 == 7
    )
    k = F.col("o_orderkey")
    kind = (
        F.when(k % 13 <= 3, "class")
        .when((k % 13).isin(4, 5), "class")
        .when(k % 13 == 6, "node_backend")
        .when((k % 13).isin(7, 8, 9), "group_backend")
        .otherwise("class")
    )
    target = (
        F.when(k % 13 <= 2, "std")
        .when(k % 13 == 3, "cold-x")       # valid name, NOT offered
        .when(k % 13 == 4, "BAD_CLASS")    # invalid name
        .when(k % 13 == 5, "")             # empty -> invalid
        .when(k % 13 == 6, F.concat(F.lit("nb-"), (k % 3).cast("string")))
        .when(
            (k % 13).isin(7, 8),
            F.concat(
                F.lit("gb-"), (k % 5).cast("string"), F.lit("-"),
                (k % 3 % 2).cast("string"),
            ),
        )
        .when(k % 13 == 9, "gb-9-9")       # owned by nobody here
        .otherwise("hot")
    )
    return o.select(
        F.concat(F.lit("b"), (k % 5).cast("string")).alias("bucket"),
        k.alias("rule_id"),
        F.when(k % 7 == 2, F.lit(False)).otherwise(k % 3 == 0).alias(
            "exact"
        ),
        F.when(k % 7 == 2, F.lit("dup/"))
        .otherwise(F.concat(F.lit("p"), (k % 11).cast("string"), F.lit("/")))
        .alias("key_prefix"),
        kind.alias("target_kind"),
        target.alias("target"),
    )


_CONFIGS_SQL = """
    cfg_rules AS (
      SELECT 'b' || (o_orderkey % 5) AS bucket,
             o_orderkey AS rule_id,
             CASE WHEN o_orderkey % 7 = 2 THEN FALSE
                  ELSE o_orderkey % 3 = 0 END AS exact,
             CASE WHEN o_orderkey % 7 = 2 THEN 'dup/'
                  ELSE 'p' || (o_orderkey % 11) || '/' END AS key_prefix,
             CASE WHEN o_orderkey % 13 = 6 THEN 'node_backend'
                  WHEN o_orderkey % 13 IN (7, 8, 9) THEN 'group_backend'
                  ELSE 'class' END AS target_kind,
             CASE WHEN o_orderkey % 13 <= 2 THEN 'std'
                  WHEN o_orderkey % 13 = 3 THEN 'cold-x'
                  WHEN o_orderkey % 13 = 4 THEN 'BAD_CLASS'
                  WHEN o_orderkey % 13 = 5 THEN ''
                  WHEN o_orderkey % 13 = 6
                    THEN 'nb-' || (o_orderkey % 3)
                  WHEN o_orderkey % 13 IN (7, 8)
                    THEN 'gb-' || (o_orderkey % 5) || '-'
                         || (o_orderkey % 3 % 2)
                  WHEN o_orderkey % 13 = 9 THEN 'gb-9-9'
                  ELSE 'hot' END AS target
      FROM orders WHERE o_orderkey % 23 = 7
    )
"""


def validate_routing_configs(
    rules: DataFrame, owned: F.Column | None = None
) -> DataFrame:
    """``validate_tenant_rules`` over a batch of per-bucket configs:
    pass 1 scans each config's rules in order (duplicate (exact,
    key_prefix) vs an EARLIER rule, then the class-name check); pass 2
    (tenant targets) only decides when pass 1 is clean. The whole
    config rejects at its first error; stored configs carry the
    advisory target warnings. Windows partition by the config key —
    configs are tens of rules, so every window runs over O(config)
    rows after the scan.

    ``owned`` is the group-ownership predicate for backend targets;
    the default encodes the fixture scheme (bucket b<j>'s group owns
    gb-<j>-{0,1})."""
    from pyspark.sql import Window

    w_dup = Window.partitionBy("bucket", "exact", "key_prefix").orderBy(
        "rule_id"
    )
    wb = Window.partitionBy("bucket")
    if owned is None:
        group_backend = lambda s: F.concat(  # noqa: E731
            F.lit("gb-"), F.substring(F.col("bucket"), 2, 10), F.lit(s)
        )
        owned = (F.col("target") == group_backend("-0")) | (
            F.col("target") == group_backend("-1")
        )
    class_ok = F.col("target").rlike("^[a-z0-9-]{1,32}$")
    pass1 = (
        F.when(F.row_number().over(w_dup) > 1, "duplicate_rule")
        .when((F.col("target_kind") == "class") & ~class_ok,
              "invalid_class")
    )
    pass2 = (
        F.when(F.col("target_kind") == "node_backend",
               "operator_backend_target")
        .when((F.col("target_kind") == "group_backend") & ~owned,
              "foreign_backend")
    )
    staged = rules.select(
        "*",
        pass1.alias("__p1"),
        pass2.alias("__p2"),
    )
    first1 = F.min(
        F.when(F.col("__p1").isNotNull(), F.col("rule_id"))
    ).over(wb)
    first2 = F.min(
        F.when(F.col("__p2").isNotNull(), F.col("rule_id"))
    ).over(wb)
    reason1 = F.max(
        F.when(F.col("rule_id") == first1, F.col("__p1"))
    ).over(wb)
    reason2 = F.max(
        F.when(F.col("rule_id") == first2, F.col("__p2"))
    ).over(wb)
    reject_rule = F.coalesce(first1, first2)
    stored = reject_rule.isNull()
    warning = F.when(
        (F.col("target_kind") == "class")
        & ~F.col("target").isin(*OFFERED_CLASSES),
        F.lit("class_not_offered"),
    ).when(
        (F.col("target_kind") == "group_backend")
        & F.col("target").endswith("-1"),
        F.lit("backend_unresolved"),
    )
    return staged.select(
        "bucket",
        "rule_id",
        "exact",
        "key_prefix",
        "target_kind",
        "target",
        F.coalesce(F.col("__p1"), F.col("__p2")).alias("rule_error"),
        F.when(stored, "stored")
        .otherwise(F.coalesce(reason1, reason2))
        .alias("config_outcome"),
        F.when(~stored, reject_rule).cast("long").alias(
            "config_reject_rule_id"
        ),
        F.when(stored, warning).alias("warning"),
    )


@register(
    "s3_bucket_routing_config",
    oracle=f"""
    WITH {_CONFIGS_SQL},
    staged AS (
      SELECT *,
             CASE WHEN row_number() OVER (
                    PARTITION BY bucket, exact, key_prefix
                    ORDER BY rule_id) > 1 THEN 'duplicate_rule'
                  WHEN target_kind = 'class'
                   AND NOT regexp_matches(target, '^[a-z0-9-]{{1,32}}$')
                    THEN 'invalid_class' END AS p1,
             CASE WHEN target_kind = 'node_backend'
                    THEN 'operator_backend_target'
                  WHEN target_kind = 'group_backend'
                   AND target NOT IN (
                     'gb-' || substring(bucket, 2) || '-0',
                     'gb-' || substring(bucket, 2) || '-1')
                    THEN 'foreign_backend' END AS p2
      FROM cfg_rules
    ),
    verdicts AS (
      SELECT *,
             MIN(CASE WHEN p1 IS NOT NULL THEN rule_id END)
               OVER (PARTITION BY bucket) AS first1,
             MIN(CASE WHEN p2 IS NOT NULL THEN rule_id END)
               OVER (PARTITION BY bucket) AS first2
      FROM staged
    ),
    reasons AS (
      SELECT *,
             MAX(CASE WHEN rule_id = first1 THEN p1 END)
               OVER (PARTITION BY bucket) AS reason1,
             MAX(CASE WHEN rule_id = first2 THEN p2 END)
               OVER (PARTITION BY bucket) AS reason2,
             COALESCE(first1, first2) AS reject_rule
      FROM verdicts
    )
    SELECT bucket, rule_id, exact, key_prefix, target_kind, target,
           COALESCE(p1, p2) AS rule_error,
           CASE WHEN reject_rule IS NULL THEN 'stored'
                ELSE COALESCE(reason1, reason2) END AS config_outcome,
           CAST(CASE WHEN reject_rule IS NOT NULL THEN reject_rule END
                AS BIGINT) AS config_reject_rule_id,
           CASE WHEN reject_rule IS NULL THEN
             CASE WHEN target_kind = 'class'
                   AND target NOT IN ('std', 'hot')
                    THEN 'class_not_offered'
                  WHEN target_kind = 'group_backend'
                   AND target LIKE '%-1'
                    THEN 'backend_unresolved' END
           END AS warning
    FROM reasons
    """,
)
def s3_bucket_routing_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture configs through PutBucketRouting's validation —
    see :func:`validate_routing_configs`."""
    return validate_routing_configs(load_routing_configs(spark, sf_dir))


# ===================================================== group-level routing
# The GROUP_STORAGE_ROUTING keyspace — one record per group holding the
# group-wide default write target (VERDICT r10 Next #3). Reference:
#
# - ``operations/src/group_routing.rs:41-142``
#   (``GroupRoutingInputsOperation``) — load-inputs reads the group's
#   routing record (absent → no default, rs:96-103), then scans the
#   GROUP_STORAGE_BACKEND_INDEX prefix in pages of BACKEND_PAGE_SIZE
#   (128, rs:18), keeping backends whose record matches the group AND
#   is not disabled (rs:108-115) — the index row's record may belong
#   to another tenant after a racy re-keying, so the group check is a
#   real filter, and a disabled backend cannot be routed to.
# - ``storage/src/storage.rs:2078-2094`` (``collect_page``) — a scan
#   page re-arms only when the page filled AND a peek shows more, so
#   the scan issues max(1, ceil(scanned/128)) Iter effects.
# - ``group_routing.rs:183-234`` (``PutGroupRoutingOperation``) — the
#   put loads the inputs first, then ``validate_tenant_target``
#   (core routing.rs:558-572): a NODE backend target is
#   OperatorBackendTarget, a group backend the group does not own is
#   ForeignBackend, a class name re-validates ``^[a-z0-9-]{1,32}$``.
#   Clearing is a write with target None, so the record always
#   records who decided last (rs:183-185).
# - ``group_routing.rs:324-326`` (``GetGroupRoutingOperation``) — an
#   absent record is no default, not an error.
#
# Fixture: groups are the 25 nation keys. The backend index derives
# from orders (o_orderkey % 3 == 0; group = o_custkey % 25): disabled
# lane o_orderkey % 7 == 3, stale-index lane o_orderkey % 11 == 5
# (the indexed record's group differs — scanned but never collected).
# Routing records exist for n_nationkey % 3 != 2; kind cycles class /
# group-backend / CLEARED / class on % 4.

BACKEND_PAGE_SIZE = 128  # group_routing.rs:18
GROUP_COUNT = 25


def load_group_backend_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP_STORAGE_BACKEND_INDEX keyspace: one row per indexed
    backend record, prefix-keyed by group."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    )
    k = F.col("o_orderkey")
    g = (F.col("o_custkey") % GROUP_COUNT).cast("long")
    return o.select(
        g.alias("group_id"),
        k.cast("long").alias("backend_id"),
        (k % 7 == 3).alias("disabled"),
        F.when(k % 11 == 5, (g + 1) % GROUP_COUNT)
        .otherwise(g)
        .cast("long")
        .alias("record_group_id"),
    )


def load_group_routing_records(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The GROUP_STORAGE_ROUTING keyspace: at most one record per
    group; a record with NULL kind/target is a CLEARED default (the
    write that recorded who decided last)."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 3 != 2
    )
    g = F.col("n_nationkey").cast("long")
    kind = F.when((g % 4).isin(0, 3), "class").when(
        g % 4 == 1, "group_backend"
    )
    target = (
        F.when(g % 4 == 0, F.lit("std"))
        .when(g % 4 == 1, F.concat(F.lit("bk-"), g.cast("string")))
        .when(g % 4 == 3, F.concat(F.lit("archive-"), g.cast("string")))
    )
    return n.select(
        g.alias("group_id"),
        kind.alias("default_kind"),
        target.alias("default_target"),
    )


_CLASS_NAME_RE = "[a-z0-9-]{1,32}"


def tenant_target_error(
    kind: str, target: str, owned_ids
) -> str | None:
    """``validate_tenant_target`` (core routing.rs:558-572): tenants
    may name a backend their own group registered or a storage class,
    never an operator (node) backend — node topology must not be
    bound into replicated records, and a foreign id would reach
    another tenant's credentials."""
    import re

    if kind == "node_backend":
        return "operator_backend_target"
    if kind == "group_backend":
        return None if target in owned_ids else "foreign_backend"
    return (
        None
        if re.fullmatch(_CLASS_NAME_RE, target or "")
        else "invalid_class"
    )


@register(
    "group_routing_put_validate",
    oracle=f"""
    WITH idx AS (
      SELECT CAST(o_custkey % {GROUP_COUNT} AS BIGINT) AS group_id,
             CAST(o_orderkey AS BIGINT) AS backend_id
      FROM orders
      WHERE o_orderkey % 3 = 0
        AND o_orderkey % 7 <> 3
        AND o_orderkey % 11 <> 5
    ),
    puts AS (
      SELECT CAST(c_custkey AS BIGINT) AS put_id,
             CAST(c_custkey % {GROUP_COUNT} AS BIGINT) AS group_id,
             CASE WHEN c_custkey % 7 = 0 THEN 'node_backend'
                  WHEN c_custkey % 7 IN (1, 2) THEN 'group_backend'
                  WHEN c_custkey % 7 = 6 THEN 'clear'
                  ELSE 'class' END AS target_kind,
             CASE WHEN c_custkey % 7 = 0 THEN 'nb-' || (c_custkey % 3)
                  WHEN c_custkey % 7 IN (1, 2)
                    THEN 'bk-' || (c_custkey * 3)
                  WHEN c_custkey % 7 = 3 THEN 'std'
                  WHEN c_custkey % 7 = 4 THEN 'BAD_CLASS'
                  WHEN c_custkey % 7 = 5
                    THEN 'archive-' || (c_custkey % 9) END AS target
      FROM customer WHERE c_custkey % 4 = 2
    )
    SELECT p.put_id, p.group_id, p.target_kind, p.target,
           CASE WHEN p.target_kind = 'clear' THEN 'stored'
                WHEN p.target_kind = 'node_backend'
                  THEN 'operator_backend_target'
                WHEN p.target_kind = 'group_backend' THEN
                  CASE WHEN EXISTS (
                         SELECT 1 FROM idx i
                         WHERE i.group_id = p.group_id
                           AND 'bk-' || i.backend_id = p.target)
                       THEN 'stored' ELSE 'foreign_backend' END
                WHEN regexp_matches(p.target, '^[a-z0-9-]{{1,32}}$')
                  THEN 'stored'
                ELSE 'invalid_class' END AS outcome
    FROM puts p
    """,
)
def group_routing_put_validate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A batch of PutGroupRouting requests through
    ``validate_tenant_target`` (core routing.rs:558-572) as relational
    algebra: clears always store (a clear is a write, never
    validated), node-backend targets reject outright, group-backend
    targets left-join the requesting group's OWN collected backend
    ids (enabled + group-matching — the load-inputs scan), class
    names re-validate. The owned set broadcasts per (group, id) —
    one equi-join, no per-request driver work. Oracle decides via an
    EXISTS subquery (independent mechanism)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 4 == 2
    )
    k = F.col("c_custkey")
    puts = c.select(
        k.cast("long").alias("put_id"),
        (k % GROUP_COUNT).cast("long").alias("group_id"),
        F.when(k % 7 == 0, "node_backend")
        .when((k % 7).isin(1, 2), "group_backend")
        .when(k % 7 == 6, "clear")
        .otherwise("class")
        .alias("target_kind"),
        F.when(
            k % 7 == 0, F.concat(F.lit("nb-"), (k % 3).cast("string"))
        )
        .when(
            (k % 7).isin(1, 2),
            F.concat(F.lit("bk-"), (k * 3).cast("string")),
        )
        .when(k % 7 == 3, F.lit("std"))
        .when(k % 7 == 4, F.lit("BAD_CLASS"))
        .when(
            k % 7 == 5,
            F.concat(F.lit("archive-"), (k % 9).cast("string")),
        )
        .alias("target"),
    )
    owned = (
        load_group_backend_index(spark, sf_dir)
        .filter(
            ~F.col("disabled")
            & (F.col("record_group_id") == F.col("group_id"))
        )
        .select(
            "group_id",
            F.concat(F.lit("bk-"), F.col("backend_id").cast("string"))
            .alias("target"),
            F.lit(True).alias("__owned"),
        )
    )
    joined = puts.join(
        F.broadcast(owned), ["group_id", "target"], "left"
    )
    outcome = (
        F.when(F.col("target_kind") == "clear", "stored")
        .when(
            F.col("target_kind") == "node_backend",
            "operator_backend_target",
        )
        .when(
            F.col("target_kind") == "group_backend",
            F.when(F.col("__owned"), "stored").otherwise(
                "foreign_backend"
            ),
        )
        .when(F.col("target").rlike(f"^{_CLASS_NAME_RE}$"), "stored")
        .otherwise("invalid_class")
    )
    return joined.select(
        "put_id",
        "group_id",
        "target_kind",
        "target",
        outcome.alias("outcome"),
    )


@register(
    "group_routing_inputs",
    oracle=f"""
    WITH idx AS (
      SELECT CAST(o_custkey % {GROUP_COUNT} AS BIGINT) AS group_id,
             CAST(o_orderkey AS BIGINT) AS backend_id,
             o_orderkey % 7 = 3 AS disabled,
             CAST(CASE WHEN o_orderkey % 11 = 5
                       THEN (o_custkey % {GROUP_COUNT} + 1)
                            % {GROUP_COUNT}
                  ELSE o_custkey % {GROUP_COUNT} END AS BIGINT)
               AS record_group_id
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    scanned AS (
      SELECT group_id,
             COUNT(*) AS n_scanned,
             CAST(COALESCE(SUM(CASE WHEN NOT disabled
                                     AND record_group_id = group_id
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS backend_count,
             CAST(COALESCE(SUM(CASE WHEN NOT disabled
                                     AND record_group_id = group_id
                                    THEN backend_id END), 0) AS BIGINT)
               AS backend_id_checksum
      FROM idx GROUP BY group_id
    ),
    rec AS (
      SELECT CAST(n_nationkey AS BIGINT) AS group_id,
             CASE WHEN n_nationkey % 4 IN (0, 3) THEN 'class'
                  WHEN n_nationkey % 4 = 1 THEN 'group_backend' END
               AS default_kind,
             CASE WHEN n_nationkey % 4 = 0 THEN 'std'
                  WHEN n_nationkey % 4 = 1 THEN 'bk-' || n_nationkey
                  WHEN n_nationkey % 4 = 3
                    THEN 'archive-' || n_nationkey END AS default_target
      FROM nation WHERE n_nationkey % 3 <> 2
    )
    SELECT g.group_id,
           r.group_id IS NOT NULL AS has_record,
           r.default_kind,
           r.default_target,
           CAST(COALESCE(s.backend_count, 0) AS BIGINT) AS backend_count,
           CAST(COALESCE(s.backend_id_checksum, 0) AS BIGINT)
             AS backend_id_checksum,
           CAST(GREATEST(1, (COALESCE(s.n_scanned, 0) + 127)
                            // {BACKEND_PAGE_SIZE}) AS BIGINT)
             AS scan_pages
    FROM (SELECT CAST(n_nationkey AS BIGINT) AS group_id FROM nation) g
    LEFT JOIN scanned s ON s.group_id = g.group_id
    LEFT JOIN rec r ON r.group_id = g.group_id
    """,
)
def group_routing_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every group's routing inputs in one pass: the stored default
    (absent record → no default), the ids of its enabled
    group-matching backends (count + id checksum standing in for the
    BTreeSet), and the number of 128-key Iter pages the prefix scan
    costs. The index aggregates map-side on 25 group keys; the groups
    and records dimensions broadcast."""
    groups = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("group_id")
    )
    idx = load_group_backend_index(spark, sf_dir)
    qualifying = ~F.col("disabled") & (
        F.col("record_group_id") == F.col("group_id")
    )
    scanned = idx.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("__scanned"),
        F.sum(qualifying.cast("long")).cast("long").alias(
            "backend_count"
        ),
        F.coalesce(
            F.sum(F.when(qualifying, F.col("backend_id"))), F.lit(0)
        )
        .cast("long")
        .alias("backend_id_checksum"),
    )
    rec = load_group_routing_records(spark, sf_dir).withColumn(
        "__has", F.lit(True)
    )
    return (
        groups.join(scanned, "group_id", "left")
        .join(F.broadcast(rec), "group_id", "left")
        .select(
            "group_id",
            F.coalesce("__has", F.lit(False)).alias("has_record"),
            "default_kind",
            "default_target",
            F.coalesce("backend_count", F.lit(0))
            .cast("long")
            .alias("backend_count"),
            F.coalesce("backend_id_checksum", F.lit(0))
            .cast("long")
            .alias("backend_id_checksum"),
            F.greatest(
                F.lit(1),
                F.expr(
                    f"(coalesce(__scanned, 0) + 127)"
                    f" div {BACKEND_PAGE_SIZE}"
                ),
            )
            .cast("long")
            .alias("scan_pages"),
        )
    )
