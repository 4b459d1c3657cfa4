"""Deterministic sampling & split assignment — the training-data
pipeline's selection plane.

Two primitives every large-scale corpus pipeline needs, both expressed
as pure column algebra over the portable 60-bit hash
(:mod:`aruna_spark.ops.text` — md5-derived so the DuckDB oracle
recomputes every bucket exactly):

- **train/val/test split**: each document hashes to a permille bucket
  and lands in a split by fixed cut points — stable under reruns,
  insertions, and repartitioning (membership depends only on the id,
  never on row order or partition layout, unlike ``df.sample`` /
  ``randomSplit`` whose membership shifts with the plan);
- **stratified sampling**: per-stratum keep rates applied through the
  same hash — downsample over-represented sources while keeping the
  selection reproducible and joinable (the SAME docs are kept on every
  engine and every run, so features computed elsewhere can join back).

Scale: both are narrow map predicates on the scan (no shuffle, no RNG
state); the registered summaries aggregate with one groupBy. The
``sum(doc_id)`` / ``sum(hash)`` checksums in the summaries pin the
EXACT membership set, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.text import DUCK_HASH64, SPARK_HASH64
from aruna_spark.queries import register

# split cut points (permille): 0-979 train, 980-989 val, 990-999 test
VAL_CUT = 980
TEST_CUT = 990

# stratified keep-rates (permille) by source bucket: even sources are
# "over-represented" and downsample to 25%, odd keep 75% — a stand-in
# for per-source quality weights; the MECHANISM is the operator
RATE_EVEN = 250
RATE_ODD = 750

_SPARK_BUCKET = (
    "pmod(" + SPARK_HASH64.format(x="concat('{salt}:', CAST(doc_id AS STRING))") + ", 1000)"
)
_DUCK_BUCKET = (
    "(" + DUCK_HASH64.format(x="'{salt}:' || CAST(doc_id AS VARCHAR)") + ") % 1000"
)


def split_bucket(salt: str = "split") -> F.Column:
    """Permille bucket of a document id under the portable hash."""
    return F.expr(_SPARK_BUCKET.format(salt=salt))


def with_split(docs: DataFrame) -> DataFrame:
    """Assign train/val/test by hash bucket — deterministic, id-only."""
    b = split_bucket()
    return docs.withColumn(
        "split",
        F.when(b < VAL_CUT, "train")
        .when(b < TEST_CUT, "val")
        .otherwise("test"),
    )


def keep_predicate() -> F.Column:
    """The stratified keep predicate: sample bucket clears the
    stratum's rate (even-numbered sources 25 %, odd 75 %). ONE
    definition — the sample filter and the summary both use it."""
    src_num = F.regexp_extract("source", r"(\d+)$", 1).cast("int")
    rate = F.when(src_num % 2 == 0, RATE_EVEN).otherwise(RATE_ODD)
    return F.expr(_SPARK_BUCKET.format(salt="samp")) < rate


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Keep each document iff :func:`keep_predicate` holds."""
    return docs.filter(keep_predicate())


@register(
    "sample_split_summary",
    oracle=f"""
    WITH assigned AS (
      SELECT *,
             CASE WHEN ({_DUCK_BUCKET.format(salt='split')}) < {VAL_CUT}
                    THEN 'train'
                  WHEN ({_DUCK_BUCKET.format(salt='split')}) < {TEST_CUT}
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def sample_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment, summarized per
    (split, lang) with an id checksum pinning exact membership."""
    docs = with_split(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "sample_stratified_summary",
    oracle=f"""
    WITH rated AS (
      SELECT *,
             CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER)
                       % 2 = 0
                  THEN {RATE_EVEN} ELSE {RATE_ODD} END AS rate,
             ({_DUCK_BUCKET.format(salt='samp')}) AS bucket
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN bucket < rate THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_id_checksum
    FROM rated GROUP BY source
    """,
)
def sample_stratified_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling summary: totals, kept counts at
    the stratum rate, and the kept-set id checksum (exact membership).
    One scan + one groupBy — the kept flag is the same
    :func:`keep_predicate` the sample filter applies."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("__k", keep_predicate())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("__k"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("__k"), F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_checksum"),
        )
    )
