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
    # the winner: most specific candidate that RESOLVES (unoffered
    # classes fall through by exclusion, rs:499-517)
    winner = (
        matched.filter(F.col("resolved_backend").isNotNull())
        .groupBy("key")
        .agg(
            F.max_by(
                F.struct("resolved_backend", "exact", "key_prefix"), F.col("__spec")
            ).alias("__w")
        )
        .select(
            "key",
            F.col("__w.resolved_backend").alias("__backend"),
            F.when(F.col("__w.exact"), F.lit("exact"))
            .otherwise(F.concat(F.lit("prefix:"), F.col("__w.key_prefix")))
            .alias("__via"),
            F.col("__w.key_prefix").alias("__won_prefix"),
            F.col("__w.exact").alias("__won_exact"),
        )
    )
    # the warn path: a MISSED class whose rule outranked the winner
    missed = (
        matched.filter(
            (F.col("target_kind") == "class")
            & F.col("resolved_backend").isNull()
        )
        .groupBy("key")
        .agg(F.max_by(F.struct("target", "__spec"), F.col("__spec")).alias("__m"))
        .select(
            "key",
            F.col("__m.target").alias("__missed"),
            F.col("__m.__spec").alias("__missed_spec"),
        )
    )
    out = (
        writes.join(winner, "key", "left")
        .join(missed, "key", "left")
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
