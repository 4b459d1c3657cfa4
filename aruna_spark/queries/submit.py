"""Job submission: idempotency-key dedup + active-cap gate.

Reference: ``operations/src/jobs/submit.rs`` (``SubmitJobOperation``,
rs:112-205,230-392):

- a live ``job_dedup_index`` entry for ``(created_by, dedup_key)``
  short-circuits: the existing job's record must still exist AND
  decode; a matching plan digest returns the existing id
  (``created = false``), a differing digest raises
  ``JobPlanConflict`` — same idempotency key + different plan is
  never a silent reuse (rs:785-812 test);
- a DANGLING entry (record missing or undecodable — quarantined)
  falls through to a fresh create that repoints the dedup row, so a
  ghost row can neither poison its key nor conflict against a dead
  job (rs:355-366);
- RO-Crate payloads carry ``max_active_jobs``: the cap check runs
  AFTER the dedup fall-through and counts the owner's active jobs —
  at the limit the submit fails ``ActiveJobLimit`` (rs:367-374);
- equal logical keys from different owners never share a dedup row
  (scoped key, rs:765-783 test).

Spark mapping: the submit batch joins the dedup index on the scoped
key, the referenced job records on id, and the per-owner active
counts; the state machine is a CASE ladder. Each relation is
control-plane-bounded; the batch documents specs against the
PRE-batch index (the reference serializes concurrent creates through
the storage transaction).

Modeled fixture: specs from orders ``k % 9 == 8`` (dedup key when
``k % 7 < 4`` valued ``dk-(k % 11)``, RO-Crate when ``k % 5 >= 3`` —
discriminators coprime to 9); the pre-existing dedup index from
orders ``k % 9 == 1`` (collapsed to the smallest id per scoped key);
owner active counts are the modeled dimension ``(owner_n * 3) % 5``
against the RO-Crate cap of 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

ACTIVE_CAP = 2


def load_submit_specs(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k % 9 == 8)
        .select(
            F.concat(F.lit("sub-"), k.cast("string")).alias("spec_id"),
            F.concat(F.lit("user-"), (k % 4).cast("string")).alias(
                "created_by"
            ),
            # k % 9 == 8 pins k % 3 == 2, so every discriminator
            # here must be coprime to 9 (the jobs.py trap)
            F.when(
                k % 7 < 4,
                F.concat(F.lit("dk-"), (k % 11).cast("string")),
            ).alias("dedup_key"),
            F.concat(F.lit("pd-"), (k % 5).cast("string")).alias(
                "plan_digest"
            ),
            (k % 5 >= 3).alias("rocrate"),
            F.concat(F.lit("job-new-"), k.cast("string")).alias(
                "fresh_job_id"
            ),
        )
    )


def load_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-batch index: one row per scoped key (smallest id wins),
    carrying the referenced record's health."""
    k = F.col("o_orderkey")
    rows = (
        load_table(spark, sf_dir, "orders")
        .filter(k % 9 == 1)
        .select(
            F.concat(F.lit("user-"), (k % 4).cast("string")).alias(
                "created_by"
            ),
            F.concat(F.lit("dk-"), (k % 11).cast("string")).alias(
                "dedup_key"
            ),
            k.alias("k"),
        )
    )
    first = rows.groupBy("created_by", "dedup_key").agg(
        F.min("k").alias("k")
    )
    return first.select(
        "created_by",
        "dedup_key",
        F.concat(F.lit("job-"), F.col("k").cast("string")).alias(
            "existing_job_id"
        ),
        F.concat(F.lit("pd-"), (F.col("k") % 5).cast("string")).alias(
            "existing_digest"
        ),
        (F.col("k") % 10 == 7).alias("record_missing"),
        (F.col("k") % 10 == 8).alias("record_undecodable"),
    )


def classify_submits(
    specs: DataFrame, index: DataFrame, active_cap: int
) -> DataFrame:
    """existing / plan_conflict / active_limit / created per spec."""
    owner_n = F.substring("created_by", 6, 2).cast("int")
    joined = specs.join(
        index, ["created_by", "dedup_key"], "left"
    ).withColumn("active_count", (owner_n * 3) % 5)
    live_hit = F.col("existing_job_id").isNotNull() & ~(
        F.col("record_missing") | F.col("record_undecodable")
    )
    over_cap = F.col("rocrate") & (F.col("active_count") >= active_cap)
    verdict = (
        F.when(
            live_hit & (F.col("existing_digest") == F.col("plan_digest")),
            F.lit("existing"),
        )
        .when(live_hit, F.lit("plan_conflict"))
        .when(over_cap, F.lit("active_limit"))
        .otherwise(F.lit("created"))
    )
    return joined.select(
        "spec_id",
        verdict.alias("verdict"),
        F.when(verdict == "existing", F.col("existing_job_id"))
        .when(verdict == "plan_conflict", F.col("existing_job_id"))
        .when(verdict == "created", F.col("fresh_job_id"))
        .alias("job_id"),
        F.when(verdict.isin("existing", "created"), verdict == "created")
        .alias("created"),
        F.when(verdict == "active_limit", F.lit(active_cap))
        .cast("int")
        .alias("limit"),
        # a fresh create under a dedup key repoints the ghost row
        (
            (verdict == F.lit("created")) & F.col("dedup_key").isNotNull()
        ).alias("repoints_dedup"),
    )


_SPECS_SQL = """
    SELECT 'sub-' || o_orderkey AS spec_id,
           'user-' || (o_orderkey % 4) AS created_by,
           CASE WHEN o_orderkey % 7 < 4
                THEN 'dk-' || (o_orderkey % 11) END AS dedup_key,
           'pd-' || (o_orderkey % 5) AS plan_digest,
           o_orderkey % 5 >= 3 AS rocrate,
           'job-new-' || o_orderkey AS fresh_job_id,
           CAST(o_orderkey % 4 AS INT) AS owner_n
    FROM orders WHERE o_orderkey % 9 = 8
"""

_INDEX_SQL = """
    SELECT created_by, dedup_key,
           'job-' || k AS existing_job_id,
           'pd-' || (k % 5) AS existing_digest,
           k % 10 = 7 AS record_missing,
           k % 10 = 8 AS record_undecodable
    FROM (
      SELECT 'user-' || (o_orderkey % 4) AS created_by,
             'dk-' || (o_orderkey % 11) AS dedup_key,
             MIN(o_orderkey) AS k
      FROM orders WHERE o_orderkey % 9 = 1
      GROUP BY 1, 2
    )
"""


@register(
    "jobs_submit_batch",
    oracle=f"""
    WITH specs AS ({_SPECS_SQL}),
    idx AS ({_INDEX_SQL}),
    j AS (
      SELECT s.*, i.existing_job_id, i.existing_digest,
             i.record_missing, i.record_undecodable,
             (s.owner_n * 3) % 5 AS active_count,
             i.existing_job_id IS NOT NULL
               AND NOT (i.record_missing OR i.record_undecodable)
               AS live_hit
      FROM specs s
      LEFT JOIN idx i ON i.created_by = s.created_by
                     AND i.dedup_key = s.dedup_key
    ),
    v AS (
      SELECT *,
             CASE WHEN live_hit AND existing_digest = plan_digest
                    THEN 'existing'
                  WHEN live_hit THEN 'plan_conflict'
                  WHEN rocrate AND active_count >= {ACTIVE_CAP}
                    THEN 'active_limit'
                  ELSE 'created' END AS verdict
      FROM j
    )
    SELECT spec_id, verdict,
           CASE WHEN verdict IN ('existing', 'plan_conflict')
                  THEN existing_job_id
                WHEN verdict = 'created' THEN fresh_job_id END AS job_id,
           CASE WHEN verdict IN ('existing', 'created')
                THEN verdict = 'created' END AS created,
           CAST(CASE WHEN verdict = 'active_limit' THEN {ACTIVE_CAP} END
             AS INT) AS "limit",
           verdict = 'created' AND dedup_key IS NOT NULL
             AS repoints_dedup
    FROM v
    """,
)
def jobs_submit_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A submit batch through the dedup/cap ladder: live key hits
    return the existing id or conflict on a differing plan, dangling
    entries fall through to fresh creates that repoint their rows,
    and RO-Crate owners at the active cap are refused."""
    return classify_submits(
        load_submit_specs(spark, sf_dir),
        load_dedup_index(spark, sf_dir),
        ACTIVE_CAP,
    )
