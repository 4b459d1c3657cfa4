"""DSIR-style importance selection — hashed-n-gram importance
weighting of a raw corpus against a target domain, the published
data-selection recipe for LM pretraining (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling",
arXiv:2302.03169: hash unigrams+bigrams into a fixed bucket space,
fit bag-of-hashed-ngrams distributions for target and raw corpus,
weight every raw document by how much more target-like than
corpus-like its features are, then resample a selection budget by
weight).

Spark-first shape, following the engine's exact-integer scoring
conventions (the char-LM filter in :mod:`textstats`):

- features = lowercased whitespace unigrams + bigrams, hashed into
  ``N_BUCKETS`` = 4096 buckets via the portable md5-derived
  :func:`aruna_spark.ops.text.hash64` (the paper uses 10k buckets —
  the bucket count is a dial, the geometry is identical);
- both distributions are exact integer ppm rates with a 1-ppm
  floor — ``greatest(cnt * 1e6 div total, 1)`` — so the per-bucket
  weight table and every document score are exact BIGINTs,
  bit-identical across Spark and DuckDB (the paper's log-ratio
  becomes a ppm DIFFERENCE: same argmax direction, no float log
  divergence). The floor replaces add-one smoothing deliberately:
  with a bucket space larger than the observed vocabulary, add-one
  mass flattens the SMALLER (target) distribution far more than the
  corpus one and biases every diff negative at test scale — the
  floored rate keeps E[diff] ~ 0 for a proportional slice, so the
  sign stays meaningful (positive => more target-like);
- the per-document weight is ``score_num = Σ_features
  (ppm_target[b] − ppm_corpus[b])`` with multiplicity, emitted as
  the exact pair (score_num, n_feats) — the comparable per-feature
  rate is score_num / n_feats, an IEEE double division of two exact
  integers (deterministic in both engines), used only for ORDERING;
- resampling is the deterministic variant: the top ``SELECT_K``
  documents by per-feature rate (doc_id tie-break). The paper's
  Gumbel-noise sampled-without-replacement variant needs an RNG and
  is a one-line swap at the ordering expression.

Scale (100 TB): the model is bounded by the bucket space (4096 rows
— broadcastable forever); training is two map-side-combinable
groupBys (target pass ⊆ corpus pass); scoring is one explode +
broadcast model join + per-doc aggregate; the selection is a bounded
top-K head. Two corpus-linear passes, no window, no driver loop.

Fixture: target domain = sources src0-src3 (a fixed domain sample —
the target is a CORPUS SLICE by provenance, which is exactly the
paper's setting: formal target data vs raw web crawl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.text import hash64
from aruna_spark.queries import register

N_BUCKETS = 4096
PPM_SCALE = 1_000_000
SELECT_K = 20
TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def doc_features(docs: DataFrame, *carry: str) -> DataFrame:
    """(doc_id, bucket[, *carry]) with multiplicity: hashed unigrams +
    bigrams of the lowercased whitespace tokens. ``carry`` names extra
    per-doc columns to keep on every feature row."""
    toks = docs.select(
        "doc_id", *carry, F.split(F.lower("text"), " ").alias("t")
    )
    # one explode for both gram orders: unigram i, bigram (i, i+1)
    # when it exists — halves the corpus explode passes (r15)
    feats = toks.select(
        "doc_id",
        *carry,
        F.explode(
            F.expr(
                "concat(t, CASE WHEN size(t) >= 2 THEN"
                " transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ',"
                " element_at(t, i + 1)))"
                " ELSE CAST(array() AS array<string>) END)"
            )
        ).alias("feat"),
    )
    return feats.select(
        "doc_id",
        *carry,
        (hash64(F.concat(F.lit("dsir:"), F.col("feat"))) % N_BUCKETS)
        .cast("long")
        .alias("bucket"),
    )


_FEATS_SQL = f"""
    toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    feats AS (
      SELECT doc_id, t[CAST(i AS INT) + 1] AS feat
      FROM toks, UNNEST(range(0, len(t))) u(i)
      UNION ALL
      SELECT doc_id,
             t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2]
      FROM toks, UNNEST(range(0, len(t) - 1)) u(i)
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substring(md5('dsir:' || feat), 1, 15))::BIGINT
               % {N_BUCKETS} AS bucket
      FROM feats
    )
"""


@register(
    "dsir_importance_select",
    oracle=f"""
    WITH {_FEATS_SQL.strip()},
    target_ids AS (
      SELECT doc_id FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ),
    cnt_q AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM hashed GROUP BY 1
    ),
    cnt_t AS (
      SELECT h.bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM hashed h JOIN target_ids USING (doc_id) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM cnt_q) AS tq,
             (SELECT SUM(n) FROM cnt_t) AS tt
    ),
    model AS (
      SELECT q.bucket,
             GREATEST(COALESCE(t.n, 0) * {PPM_SCALE} // tot.tt, 1)
             - GREATEST(q.n * {PPM_SCALE} // tot.tq, 1) AS diff_ppm
      FROM cnt_q q LEFT JOIN cnt_t t USING (bucket) CROSS JOIN tot
    ),
    scored AS (
      SELECT h.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM(m.diff_ppm) AS BIGINT) AS score_num
      FROM hashed h JOIN model m USING (bucket)
      GROUP BY h.doc_id
    ),
    top AS (
      SELECT doc_id FROM scored
      ORDER BY CAST(score_num AS DOUBLE) / n_feats DESC, doc_id
      LIMIT {SELECT_K}
    )
    SELECT s.doc_id, s.n_feats, s.score_num,
           t.doc_id IS NOT NULL AS selected
    FROM scored s LEFT JOIN top t USING (doc_id)
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's exact DSIR importance evidence
    (score_num = Σ per-feature target-vs-corpus ppm difference,
    n_feats) plus the deterministic top-K resample flag. Positive
    score_num ⇒ the document looks more target-domain than
    corpus-average under the hashed-n-gram model."""
    from aruna_spark.ops.text import spread_for_cpu

    # r16: the unigram+bigram explode expands the compressed ~6-split
    # document scan ~2x tokens — spread to the session's core count
    # first (no-op at warehouse scale)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).withColumn("__is_t", F.col("source").isin(*TARGET_SOURCES))
    # ONE corpus explode (r15 optimization): per-(doc, bucket) counts
    # with the doc's target flag, materialized once. The r14 shape
    # re-exploded the corpus for the q model, the t model (via a
    # corpus join), and the scoring pass — four explodes; both ppm
    # models now fall out of one conditional aggregation and scoring
    # re-reads the checkpointed counts.
    dbc = (
        doc_features(docs, "__is_t")
        .groupBy("doc_id", "__is_t", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    counts = dbc.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("q"),
        F.sum(F.when(F.col("__is_t"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("t"),
    )
    tot = counts.agg(
        F.sum("q").cast("long").alias("__tq"),
        F.sum("t").cast("long").alias("__tt"),
    )
    # the model is ≤ N_BUCKETS rows — broadcast it whole; target
    # buckets absent from the slice fall to the smoothing floor
    # (t = 0 → greatest(0 div tt, 1) = 1, identical to the old
    # coalesce(ppm_t, 1) for buckets missing from the target model)
    model = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.expr(f"greatest(t * {PPM_SCALE} div __tt, 1)")
            - F.expr(f"greatest(q * {PPM_SCALE} div __tq, 1)")
        )
        .cast("long")
        .alias("diff_ppm"),
    )
    scored = (
        dbc.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("diff_ppm"))
            .cast("long")
            .alias("score_num"),
        )
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # feeds the top-K AND the output
    )
    top = (
        scored.orderBy(
            (F.col("score_num").cast("double") / F.col("n_feats")).desc(),
            "doc_id",
        )
        .limit(SELECT_K)
        .select("doc_id", F.lit(True).alias("__sel"))
    )
    return scored.join(F.broadcast(top), "doc_id", "left").select(
        "doc_id",
        "n_feats",
        "score_num",
        F.coalesce("__sel", F.lit(False)).alias("selected"),
    )
