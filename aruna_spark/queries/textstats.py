"""Text-analysis operators over the ``documents`` table.

LLM-pipeline primitives on document text: token counting (whitespace +
BPE-ish regex), quality ratios, a stopword-based language-ID heuristic,
and md5 fingerprints (whole-doc + min-shingle-hash — the rolling-hash
document fingerprint). Reference analog for content fingerprinting:
``blob/src/hash.rs:10-77`` (multi-hash streaming pass; dedupe by hash).

Design notes (100 TB):
- every metric is a pure column expression over one scan — a narrow map
  stage with NO shuffle for the per-doc profile, one shuffle for the
  grouped summaries;
- ratios use integer per-mille arithmetic (``1000*x div y``) instead of
  float division wherever a ratio feeds a filter, so results are
  bit-identical across engines and partitionings;
- the md5-derived hashing is reproducible in DuckDB SQL, so even the
  fingerprint columns are oracle-checked (see :mod:`aruna_spark.ops.text`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.text import (
    DUCK_HASH64,
    STOPWORDS,
    duck_shingles_sql,
    hash64,
    max_multiplicity,
    shingles,
    spread_for_cpu,
    ws_tokens,
)
from aruna_spark.queries import register

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

# BPE-ish word/number/punct splitter (same dialect in Java regex and RE2)
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _profile(docs: DataFrame) -> DataFrame:
    toks = ws_tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        toks.alias("toks"),
        F.col("text"),
    )
    n = F.size("toks")
    stop_hits = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct("toks"))
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        n.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
        .cast("long")
        .alias("n_bpe_tokens"),
        (sum_len / n).alias("avg_token_len"),
        F.expr(f"1000 * size(filter(toks, t -> t IN ({_STOP_IN}))) div size(toks)")
        .alias("stop_permille"),
        F.expr("1000 * size(array_distinct(toks)) div size(toks)")
        .alias("uniq_permille"),
        F.md5("text").alias("fingerprint"),
        F.array_min(
            F.transform(shingles(F.col("toks"), 3), lambda s: hash64(s))
        ).alias("min_shingle_hash"),
        (stop_hits >= 1).alias("is_en_guess"),
    )


_DUCK_PROFILE = f"""
    WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, lang, source,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
             AS avg_token_len,
           (1000 * len(list_filter(toks, t -> t IN ({_STOP_IN})))) // len(toks)
             AS stop_permille,
           (1000 * len(list_distinct(toks))) // len(toks) AS uniq_permille,
           md5(text) AS fingerprint,
           list_min(list_transform({duck_shingles_sql('toks', 3)},
                                   s -> {DUCK_HASH64.format(x='s')}))
             AS min_shingle_hash,
           len(list_filter(toks, t -> t IN ({_STOP_IN}))) >= 1 AS is_en_guess
    FROM t
"""


@register("textstats_profile", oracle=_DUCK_PROFILE)
def textstats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document profile: token counts, ratios, fingerprints."""
    return _profile(spread_for_cpu(load_table(spark, sf_dir, "documents")))


@register(
    "textstats_lang_summary",
    oracle=f"""
    WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
    p AS (
      SELECT lang,
             CASE WHEN len(list_filter(toks, t -> t IN ({_STOP_IN}))) >= 1
                  THEN 'en' ELSE 'und' END AS langid_guess,
             len(toks) AS n_tokens
      FROM t
    )
    SELECT lang, langid_guess,
           COUNT(*) AS docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM p GROUP BY lang, langid_guess
    """,
)
def textstats_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs labeled lang: confusion counts per pair.

    The guess is a deterministic stopword-hit heuristic (the n-gram
    analog an offline pipeline would bootstrap with); grouping it against
    the labeled ``lang`` column gives the confusion matrix.
    """
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    toks = ws_tokens(F.col("text"))
    p = docs.select(
        "lang",
        F.when(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) >= 1, "en"
        )
        .otherwise("und")
        .alias("langid_guess"),
        F.size(toks).alias("n_tokens"),
    )
    return p.groupBy("lang", "langid_guess").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "textstats_quality_topk",
    oracle=f"""
    WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
    p AS (
      SELECT doc_id,
             least(len(toks), 100) * 10
               + (1000 - (1000 * len(list_filter(toks, t -> t IN ({_STOP_IN}))) // len(toks)))
               + (1000 * len(list_distinct(toks))) // len(toks)
               AS quality
      FROM t
    )
    SELECT doc_id, quality FROM p
    WHERE quality >= 1500
    ORDER BY quality DESC, doc_id LIMIT 50
    """,
)
def textstats_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + threshold + top-k, all integer arithmetic.

    quality = 10*min(tokens,100) + (1000 - stop_permille) + uniq_permille —
    long docs with low stopword density and high vocabulary diversity rank
    first. Integer per-mille math keeps the score exactly reproducible on
    any engine and any partitioning.
    """
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    p = docs.select(
        "doc_id",
        F.expr(
            "least(size(split(text, ' ')), 100) * 10"
            f" + (1000 - (1000 * size(filter(split(text, ' '), t -> t IN ({_STOP_IN})))"
            " div size(split(text, ' '))))"
            " + (1000 * size(array_distinct(split(text, ' ')))"
            " div size(split(text, ' ')))"
        ).alias("quality"),
    )
    return (
        p.filter(F.col("quality") >= 1500)
        .orderBy(F.desc("quality"), "doc_id")
        .limit(50)
    )


# ------------------------------------------------- corpus rollup + sketches
@register(
    "corpus_rollup_stats",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def corpus_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile at three granularities in ONE pass — (lang, source),
    per-lang subtotal, grand total — via ROLLUP (absent in the reference,
    free in Spark per SURVEY §2.4; the shape every training-data pipeline
    reports). One shuffle; partial aggregation map-side; the rollup adds
    no extra scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "corpus_approx_distinct",
    oracle="""
    SELECT lang, COUNT(DISTINCT split_part(text, ' ', 1)) AS exact_distinct,
           TRUE AS approx_within_5pct
    FROM documents GROUP BY lang
    """,
)
def corpus_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token sketch vs the exact count.

    At 100 TB an exact COUNT DISTINCT of corpus vocabulary shuffles every
    token; ``approx_count_distinct`` keeps a fixed-size HLL sketch per
    partition (mergeable, no token shuffle). The query emits the exact
    count (oracle-checked) plus a guarantee bit that the sketch landed
    within 5% — pinning the approximation contract itself."""
    docs = load_table(spark, sf_dir, "documents")
    first_tok = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    agg = docs.groupBy("lang").agg(
        F.countDistinct(first_tok).alias("exact_distinct"),
        F.approx_count_distinct(first_tok, rsd=0.02).alias("approx"),
    )
    within = (
        F.abs(F.col("approx") - F.col("exact_distinct"))
        <= 0.05 * F.col("exact_distinct")
    )
    return agg.select(
        "lang", "exact_distinct", within.alias("approx_within_5pct")
    )


# ------------------------------------------------- repetition rules (Gopher)
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", arXiv
# 2112.11446, Table A1) remove documents whose most frequent word
# 2-gram covers >20% of the text or whose duplicate 5-grams cover >15%.
# The published production thresholds:
GOPHER_TOP2_NUM, GOPHER_TOP2_DEN = 1, 5  # top-2-gram fraction > 0.20
GOPHER_DUP5_NUM, GOPHER_DUP5_DEN = 3, 20  # duplicate-5-gram fraction > 0.15
# The registered instance dials top-2 down to 0.05 so BOTH branches of
# the predicate are exercised on the synthetic corpus (its unigram
# distribution is nearly flat, so no document reaches 0.20); the
# duplicate-word rule (>0.50) splits the corpus roughly in half. All
# three are exact integer cross-multiplications — no float thresholds.
_TOP2_NUM, _TOP2_DEN = 1, 20  # registered demo threshold: > 0.05
_DUP5_NUM, _DUP5_DEN = 3, 20  # > 0.15 (Gopher value)
_DUPW_NUM, _DUPW_DEN = 1, 2  # duplicate-word fraction > 0.50


@register(
    "textstats_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    b AS (
      SELECT doc_id, lang, len(toks) AS nw, len(list_distinct(toks)) AS dw,
             {duck_shingles_sql('toks', 2)} AS g2,
             {duck_shingles_sql('toks', 5)} AS g5
      FROM t
    ),
    per AS (
      SELECT doc_id, lang, nw, dw,
             coalesce(len(g2), 0) AS n2,
             coalesce(len(g5), 0) AS n5,
             coalesce(len(list_distinct(g5)), 0) AS d5,
             coalesce(list_max(list_transform(
               list_distinct(g2), x -> len(list_filter(g2, y -> y = x)))), 0)
               AS top2
      FROM b
    )
    SELECT lang, COUNT(*) AS docs,
           CAST(SUM(top2) AS BIGINT) AS sum_top_bigram,
           CAST(SUM(n2) AS BIGINT) AS sum_bigrams,
           CAST(SUM(n5 - d5) AS BIGINT) AS sum_dup_5grams,
           CAST(SUM(n5) AS BIGINT) AS sum_5grams,
           CAST(SUM(nw - dw) AS BIGINT) AS sum_dup_words,
           CAST(SUM(nw) AS BIGINT) AS sum_words,
           CAST(SUM(({_TOP2_DEN} * top2 > {_TOP2_NUM} * n2)::int) AS BIGINT)
             AS fail_top_bigram,
           CAST(SUM(({_DUP5_DEN} * (n5 - d5) > {_DUP5_NUM} * n5)::int) AS BIGINT)
             AS fail_dup_5gram,
           CAST(SUM(({_DUPW_DEN} * (nw - dw) > {_DUPW_NUM} * nw)::int) AS BIGINT)
             AS fail_dup_word,
           CAST(SUM(({_TOP2_DEN} * top2 > {_TOP2_NUM} * n2
                     OR {_DUP5_DEN} * (n5 - d5) > {_DUP5_NUM} * n5
                     OR {_DUPW_DEN} * (nw - dw) > {_DUPW_NUM} * nw)::int)
                AS BIGINT) AS fail_any
    FROM per GROUP BY lang
    """,
)
def textstats_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter rules, rolled up per language.

    Per document: the most frequent word 2-gram's coverage, the
    duplicate-5-gram fraction, and the duplicate-word fraction; per
    language: the integer numerator/denominator sums plus how many
    documents each rule (and any rule) would remove. The thresholds are
    exact integer cross-multiplications (``den*x > num*n``), so the
    pass/fail bits are bit-identical on any engine.

    Scale shape: every ratio INCLUDING the top-bigram count is a pure
    per-row array expression — the top count is a run-length maximum
    over the sorted bigram array (``max_multiplicity``: one aggregate
    fold, O(len log len) per doc), so the whole query is a single
    narrow map stage + the final per-language rollup; the corpus never
    shuffles. (The earlier explode → (doc_id, gram) groupBy plan was
    combiner-friendly but still moved every gram through a shuffle —
    measured 14.8 s at sf0.1 vs ~1 s folded.) The oracle uses the
    quadratic list mechanism precisely so the two engines compute the
    top count by INDEPENDENT plans.
    """
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    toks = ws_tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("nw"),
        F.size(F.array_distinct(toks)).alias("dw"),
        shingles(toks, 2).alias("g2"),
        shingles(toks, 5).alias("g5"),
    )
    per = base.select(
        "doc_id",
        "lang",
        "nw",
        "dw",
        F.coalesce(F.size("g2"), F.lit(0)).alias("n2"),
        F.coalesce(F.size("g5"), F.lit(0)).alias("n5"),
        F.coalesce(F.size(F.array_distinct("g5")), F.lit(0)).alias("d5"),
        max_multiplicity(F.col("g2")).alias("top2"),
    )
    f_top2 = _TOP2_DEN * F.col("top2") > _TOP2_NUM * F.col("n2")
    f_dup5 = _DUP5_DEN * (F.col("n5") - F.col("d5")) > _DUP5_NUM * F.col("n5")
    f_dupw = _DUPW_DEN * (F.col("nw") - F.col("dw")) > _DUPW_NUM * F.col("nw")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("top2").cast("long").alias("sum_top_bigram"),
        F.sum("n2").cast("long").alias("sum_bigrams"),
        F.sum(F.col("n5") - F.col("d5")).cast("long").alias("sum_dup_5grams"),
        F.sum("n5").cast("long").alias("sum_5grams"),
        F.sum(F.col("nw") - F.col("dw")).cast("long").alias("sum_dup_words"),
        F.sum("nw").cast("long").alias("sum_words"),
        F.sum(f_top2.cast("int")).cast("long").alias("fail_top_bigram"),
        F.sum(f_dup5.cast("int")).cast("long").alias("fail_dup_5gram"),
        F.sum(f_dupw.cast("int")).cast("long").alias("fail_dup_word"),
        F.sum((f_top2 | f_dup5 | f_dupw).cast("int"))
        .cast("long")
        .alias("fail_any"),
    )


# ---------------------------------------------------- retention funnel
_FUNNEL_QUALITY_MIN = 1950


@register(
    "corpus_retention_funnel",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    f AS (
      SELECT *, md5(list_aggregate(list_sort(list_distinct(toks)),
                                   'string_agg', ' ')) AS fp
      FROM t
    ),
    w AS (SELECT fp, MIN(doc_id) AS doc_id FROM f GROUP BY fp),
    d AS (SELECT f.* FROM f JOIN w USING (fp, doc_id)),
    p AS (
      SELECT doc_id, toks,
             len(list_filter(toks, t -> t IN ({_STOP_IN}))) >= 1
               AS pass_lang,
             least(len(toks), 100) * 10
               + (1000 - (1000 * len(list_filter(toks,
                          t -> t IN ({_STOP_IN}))) // len(toks)))
               + (1000 * len(list_distinct(toks))) // len(toks) AS quality,
             len(toks) AS nw, len(list_distinct(toks)) AS dw,
             {duck_shingles_sql('toks', 2)} AS g2,
             {duck_shingles_sql('toks', 5)} AS g5
      FROM d
    ),
    q AS (
      SELECT *, coalesce(len(g2), 0) AS n2, coalesce(len(g5), 0) AS n5,
             coalesce(len(list_distinct(g5)), 0) AS d5,
             coalesce(list_max(list_transform(list_distinct(g2),
               x -> len(list_filter(g2, y -> y = x)))), 0) AS top2
      FROM p
    ),
    flags AS (
      SELECT pass_lang,
             NOT ({GOPHER_TOP2_DEN} * top2 > {GOPHER_TOP2_NUM} * n2
                  OR {GOPHER_DUP5_DEN} * (n5 - d5) > {GOPHER_DUP5_NUM} * n5
                  OR {_DUPW_DEN} * (nw - dw) > {_DUPW_NUM} * nw)
               AS pass_rep,
             quality >= {_FUNNEL_QUALITY_MIN} AS pass_q
      FROM q
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM t) AS s0,
             COUNT(*) AS s1,
             SUM(pass_lang::int) AS s2,
             SUM((pass_lang AND pass_rep)::int) AS s3,
             SUM((pass_lang AND pass_rep AND pass_q)::int) AS s4
      FROM flags
    )
    SELECT * FROM (
      SELECT 'exact_dedup_normalized' AS stage, 1 AS stage_order,
             CAST(s0 AS BIGINT) AS docs_in, CAST(s1 AS BIGINT) AS docs_kept,
             CAST(s0 - s1 AS BIGINT) AS docs_removed FROM c
      UNION ALL SELECT 'langid', 2, CAST(s1 AS BIGINT),
             CAST(s2 AS BIGINT), CAST(s1 - s2 AS BIGINT) FROM c
      UNION ALL SELECT 'repetition_rules', 3, CAST(s2 AS BIGINT),
             CAST(s3 AS BIGINT), CAST(s2 - s3 AS BIGINT) FROM c
      UNION ALL SELECT 'quality_score', 4, CAST(s3 AS BIGINT),
             CAST(s4 AS BIGINT), CAST(s3 - s4 AS BIGINT) FROM c
    )
    """,
)
def corpus_retention_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data retention funnel in ONE pass.

    The four production stages chained in pipeline order, each reported
    as (docs_in, docs_kept, docs_removed):

    1. **exact dedup** on a normalized fingerprint (md5 of the sorted
       vocabulary set — catches reshuffled boilerplate exact bytes
       miss); min doc_id wins, the repo's exact-collapse template.
    2. **language ID** (stopword heuristic, `textstats_lang_summary`).
    3. **repetition rules** at the PUBLISHED Gopher thresholds
       (top-2-gram > 0.20, duplicate 5-grams > 0.15, duplicate words
       > 0.50) — integer cross-multiplications.
    4. **quality score** >= {1950} (the `textstats_quality_topk`
       integer score).

    Scale shape: one scan computes every per-doc flag — including the
    top-bigram count, a per-row run-length maximum over the sorted
    bigram array (``max_multiplicity``, zero shuffle); the ONLY
    shuffle is the dedup winner's fingerprint groupBy (map-side
    combinable, key cardinality ~= corpus). The funnel envelope is
    four rows built from ONE aggregate — counting all stages in a
    single pass instead of re-filtering the corpus per stage, which
    is the difference between 1 and 4 corpus scans at 100 TB.
    """
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    toks = ws_tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fp"),
        shingles(toks, 2).alias("g2"),
        shingles(toks, 5).alias("g5"),
    )
    # r15: the winner is min(doc_id) over the fingerprint partition —
    # one shuffle, no groupBy + join-back re-deriving the tokenized
    # corpus (the shingle arrays are column-pruned out of the window)
    from pyspark.sql import Window

    kept = base.withColumn(
        "__w", F.min("doc_id").over(Window.partitionBy("fp"))
    ).filter(F.col("doc_id") == F.col("__w")).drop("__w")

    nw, dw = F.size("toks"), F.size(F.array_distinct("toks"))
    n2 = F.coalesce(F.size("g2"), F.lit(0))
    n5 = F.coalesce(F.size("g5"), F.lit(0))
    d5 = F.coalesce(F.size(F.array_distinct("g5")), F.lit(0))
    stop_hits = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    quality = F.expr(
        "least(size(toks), 100) * 10"
        f" + (1000 - (1000 * size(filter(toks, t -> t IN ({_STOP_IN})))"
        " div size(toks)))"
        " + (1000 * size(array_distinct(toks)) div size(toks))"
    )
    flags = (
        kept.withColumn("top2", max_multiplicity(F.col("g2")))
        .select(
            (stop_hits >= 1).alias("pass_lang"),
            (
                ~(
                    (GOPHER_TOP2_DEN * F.col("top2") > GOPHER_TOP2_NUM * n2)
                    | (GOPHER_DUP5_DEN * (n5 - d5) > GOPHER_DUP5_NUM * n5)
                    | (_DUPW_DEN * (nw - dw) > _DUPW_NUM * nw)
                )
            ).alias("pass_rep"),
            (quality >= _FUNNEL_QUALITY_MIN).alias("pass_q"),
        )
    )
    total = base.agg(F.count(F.lit(1)).alias("s0"))
    counts = flags.agg(
        F.count(F.lit(1)).alias("s1"),
        F.sum(F.col("pass_lang").cast("long")).alias("s2"),
        F.sum((F.col("pass_lang") & F.col("pass_rep")).cast("long")).alias(
            "s3"
        ),
        F.sum(
            (F.col("pass_lang") & F.col("pass_rep") & F.col("pass_q")).cast(
                "long"
            )
        ).alias("s4"),
    ).crossJoin(F.broadcast(total))
    stages = F.array(
        F.struct(
            F.lit("exact_dedup_normalized").alias("stage"),
            F.lit(1).alias("stage_order"),
            F.col("s0").cast("long").alias("docs_in"),
            F.col("s1").cast("long").alias("docs_kept"),
            (F.col("s0") - F.col("s1")).cast("long").alias("docs_removed"),
        ),
        F.struct(
            F.lit("langid").alias("stage"),
            F.lit(2).alias("stage_order"),
            F.col("s1").cast("long").alias("docs_in"),
            F.col("s2").cast("long").alias("docs_kept"),
            (F.col("s1") - F.col("s2")).cast("long").alias("docs_removed"),
        ),
        F.struct(
            F.lit("repetition_rules").alias("stage"),
            F.lit(3).alias("stage_order"),
            F.col("s2").cast("long").alias("docs_in"),
            F.col("s3").cast("long").alias("docs_kept"),
            (F.col("s2") - F.col("s3")).cast("long").alias("docs_removed"),
        ),
        F.struct(
            F.lit("quality_score").alias("stage"),
            F.lit(4).alias("stage_order"),
            F.col("s3").cast("long").alias("docs_in"),
            F.col("s4").cast("long").alias("docs_kept"),
            (F.col("s3") - F.col("s4")).cast("long").alias("docs_removed"),
        ),
    )
    return counts.select(F.explode(stages).alias("__s")).select(
        F.col("__s")["stage"].alias("stage"),
        F.col("__s")["stage_order"].cast("int").alias("stage_order"),
        F.col("__s")["docs_in"].alias("docs_in"),
        F.col("__s")["docs_kept"].alias("docs_kept"),
        F.col("__s")["docs_removed"].alias("docs_removed"),
    )


# ------------------------------------------------------------ PII scan
# Training-data pipelines scrub personally identifiable information
# before anything ships (public recipe: regex families for emails,
# phone numbers, IP addresses — the C4/CCNet-style scrub pass). The
# synthetic corpus carries no natural PII, so the fixture PLANTS it
# deterministically (the repo's established planting pattern — see
# make_sf1's "% 10 planting" note) and the scanner stays generic: the
# patterns below never reference the planting lanes.
#
# Dialect note: patterns stay in the Java-regex ∩ RE2 common subset
# (char classes, bounded quantifiers, \\b) so Spark (Java) and DuckDB
# (RE2) agree byte-for-byte; DuckDB's regexp_replace needs the 'g'
# flag to match Spark's replace-all default.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic PII appended: lane %7 — 1 email,
    2 phone, 3 IPv4, 4 email+phone, others clean."""
    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    suffix = (
        F.when(k % 7 == 1,
               F.concat(F.lit(" contact user"), k.cast("string"),
                        F.lit("@example.org")))
        .when(k % 7 == 2,
              F.concat(F.lit(" call +1-555-"),
                       F.lpad((k % 10000).cast("string"), 4, "0")))
        .when(k % 7 == 3,
              F.concat(F.lit(" host 10.0."), (k % 256).cast("string"),
                       F.lit(".7")))
        .when(k % 7 == 4,
              F.concat(F.lit(" mail a"), k.cast("string"),
                       F.lit("@b.co or +44-020-7946")))
        .otherwise(F.lit(""))
    )
    return d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )


_PII_DOCS_SQL = """
    pdocs AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 7 = 1
                 THEN ' contact user' || doc_id || '@example.org'
               WHEN doc_id % 7 = 2
                 THEN ' call +1-555-' ||
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN doc_id % 7 = 3
                 THEN ' host 10.0.' || (doc_id % 256) || '.7'
               WHEN doc_id % 7 = 4
                 THEN ' mail a' || doc_id || '@b.co or +44-020-7946'
               ELSE '' END AS text
      FROM documents
    )
"""


@register(
    "textstats_pii_scan",
    oracle=f"""
    WITH {_PII_DOCS_SQL}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}'))
                AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}'))
                AS BIGINT) AS n_ipv4,
           len(regexp_extract_all(text, '{PII_EMAIL_RE}')) > 0
           OR len(regexp_extract_all(text, '{PII_PHONE_RE}')) > 0
           OR len(regexp_extract_all(text, '{PII_IPV4_RE}')) > 0
             AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_PHONE_RE}', '[PHONE]', 'g'),
             '{PII_IPV4_RE}', '[IP]', 'g') AS masked_text
    FROM pdocs
    """,
)
def textstats_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub pass: regex-family counts, the has_pii
    routing flag, and the masked text the retained corpus would ship.
    One narrow map stage — regexp_count/regexp_replace are JVM-side
    and whole-stage-codegen'd; at 100 TB this runs where the scan
    runs, no shuffle at all."""
    docs = pii_planted_docs(spark, sf_dir)
    t = F.col("text")
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ),
        PII_IPV4_RE,
        "[IP]",
    )
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PII_PHONE_RE))
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4_RE))
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ipv4.cast("long").alias("n_ipv4"),
        ((n_emails > 0) | (n_phones > 0) | (n_ipv4 > 0)).alias("has_pii"),
        masked.alias("masked_text"),
    )


# ------------------------------------------- char-LM quality proxy
# LM-perplexity quality filtering (the CCNet recipe — Wenzek et al.
# 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
# Crawl Data", arXiv:1911.00359 — buckets web text by language-model
# perplexity; Gopher and most modern pretraining pipelines keep a
# variant). The Spark-native proxy: a character-trigram unigram model
# TRAINED ON THE CORPUS ITSELF in one aggregation pass, then every
# document scored by its mean trigram frequency — gibberish, binary
# spill and wrong-charset text sit far below the corpus mean, which
# is the signal the perplexity bucket cuts on. All arithmetic is
# integer fixed-point (ppm with BIGINT `div`), so Spark and DuckDB
# produce bit-identical scores — no float log-likelihood divergence.
#
# Scale (100 TB): the model vocabulary is bounded by charset^3 (~1e6
# for printable ASCII — broadcastable forever, independent of corpus
# size); training is one map-side-combinable groupBy over the
# exploded trigrams; scoring is a second corpus pass with a broadcast
# model join and a per-doc aggregate. Two linear passes, no window,
# no driver loop.

TRI_PPM_SCALE = 1_000_000


@register(
    "textstats_char_lm_quality",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE length(text) >= 3
    ),
    tri AS (
      SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tri
      FROM docs, UNNEST(range(1, length(text) - 1)) AS u(i)
    ),
    model AS (
      SELECT tri, CAST(COUNT(*) AS BIGINT) AS cnt FROM tri GROUP BY tri
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM model),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_trigrams,
             CAST(SUM(m.cnt * {TRI_PPM_SCALE} // tot.total)
                  // COUNT(*) AS BIGINT) AS typicality_ppm
      FROM tri t JOIN model m USING (tri) CROSS JOIN tot
      GROUP BY t.doc_id
    ),
    avg_t AS (
      SELECT CAST(SUM(typicality_ppm) // COUNT(*) AS BIGINT) AS mean_t
      FROM scored
    )
    SELECT s.doc_id, s.n_trigrams, s.typicality_ppm,
           s.typicality_ppm < a.mean_t AS below_corpus_mean
    FROM scored s CROSS JOIN avg_t a
    """,
)
def textstats_char_lm_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document corpus-typicality score — the perplexity-bucket
    quality signal (see the section comment): mean frequency (ppm,
    exact integer) of the document's character trigrams under the
    corpus-trained trigram model, plus the below-corpus-mean flag the
    filter cuts on. Documents shorter than one trigram are excluded
    (no model evidence either way)."""
    # r16: the compressed document scan plans ~6 splits while the
    # trigram explode expands bytes ~3x chars and the (doc, tri)
    # aggregation is the dominant compute — spread to the session's
    # core count first (no-op at warehouse scale; measured 3.5 -> 1.7 s
    # at sf0.1 on 32 cores)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= 3
        )
    )
    tri = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tri"),
    )
    # ONE explode pass (r15 optimization): per-doc trigram counts are
    # materialized once and serve BOTH the model build and the scoring
    # join — the r14 plan re-exploded the corpus for the model, the
    # scoring pass, and again under the mean subquery (4 corpus
    # explodes total). Scoring over (doc_id, tri, c) weighted by c is
    # integer-identical to scoring per occurrence.
    dtc = (
        tri.groupBy("doc_id", "tri")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    model = dtc.groupBy("tri").agg(F.sum("c").cast("long").alias("cnt"))
    tot = model.agg(F.sum("cnt").cast("long").alias("total"))
    model_ppm = model.crossJoin(F.broadcast(tot)).select(
        "tri",
        F.expr(f"cnt * {TRI_PPM_SCALE} div total").alias("freq_ppm"),
    )
    scored = (
        dtc.join(F.broadcast(model_ppm), "tri")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_trigrams"),
            F.sum(F.col("c") * F.col("freq_ppm")).alias("__ppm_sum"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.expr("CAST(__ppm_sum div n_trigrams AS BIGINT)").alias(
                "typicality_ppm"
            ),
        )
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # feeds the mean AND the output
    )
    mean_t = scored.agg(
        F.expr(
            "CAST(sum(typicality_ppm) div count(1) AS BIGINT)"
        ).alias("__mean_t")
    )
    return scored.crossJoin(F.broadcast(mean_t)).select(
        "doc_id",
        "n_trigrams",
        "typicality_ppm",
        (F.col("typicality_ppm") < F.col("__mean_t")).alias(
            "below_corpus_mean"
        ),
    )


# ------------------------------------------- C4 cleaning rules
# The C4 corpus-cleaning pass (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning with a Unified Text-to-Text
# Transformer", arXiv:1910.10683 §2.2 — the rules behind the C4
# dataset, still the template most web-corpus cleanups start from):
#
# - retain only LINES ending in terminal punctuation;
# - drop lines with fewer than 3 words, and lines containing the word
#   "javascript" (boilerplate warning banners);
# - drop PAGES with fewer than 5 sentences, pages containing
#   "lorem ipsum", and pages containing a curly brace (code);
# - (the three-sentence-span dedup rule is the winnowing pass —
#   `dedup_duplicate_spans`; the bad-words list is licensing-encumbered
#   and stays out, like the reference's own exclusions.)
#
# The synthetic corpus has no lines or punctuation, so the FIXTURE
# plants them deterministically (the pii-scan precedent: plant the
# pattern, keep the scanner generic): each document's token stream
# chunks into 8-token lines; lane h = doc_id + line_idx appends '.'
# (h%4 ∈ {0,1}), '?' (h%4 = 2) or nothing; page-level plants: 'lorem
# ipsum' into line 0 when doc_id%31 = 9, a '{' into line 1 when
# doc_id%29 = 11, 'javascript' into line 2 when doc_id%37 = 13. The
# classifier below reads only the line TEXT — any real corpus with
# real lines runs through it unchanged.
#
# Scale: one explode to lines (corpus-linear), pure regexp/size
# column algebra per line, one groupBy(doc) — map-side combinable,
# no window, no UDF.

C4_LINE_TOKENS = 8
C4_MIN_WORDS_PER_LINE = 3  # arXiv:1910.10683 §2.2
C4_MIN_SENTENCES = 5


def load_c4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, line_idx, line) — the planted-line fixture."""
    d = load_table(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform("
                f" sequence(0, CAST(ceil(size(split(text, ' ')) / {C4_LINE_TOKENS}.0) AS INT) - 1),"
                " i -> array_join(slice(split(text, ' '),"
                f" i * {C4_LINE_TOKENS} + 1, {C4_LINE_TOKENS}), ' '))"
            )
        ).alias("line_idx", "base"),
    )
    k, i = F.col("doc_id"), F.col("line_idx")
    planted = F.concat(
        F.col("base"),
        F.when((k % 31 == 9) & (i == 0), " lorem ipsum").otherwise(""),
        F.when((k % 29 == 11) & (i == 1), " {code}").otherwise(""),
        F.when((k % 37 == 13) & (i == 2), " javascript banner").otherwise(
            ""
        ),
        F.when((k + i) % 4 <= 1, ".")
        .when((k + i) % 4 == 2, "?")
        .otherwise(""),
    )
    return lines.select("doc_id", "line_idx", planted.alias("line"))


_C4_LINES_SQL = """
    c4_lines AS (
      SELECT doc_id, CAST(u.i AS INT) AS line_idx,
             array_to_string(list_slice(string_split(text, ' '),
               CAST(u.i AS INT) * 8 + 1, CAST(u.i AS INT) * 8 + 8), ' ')
             || CASE WHEN doc_id % 31 = 9 AND u.i = 0
                     THEN ' lorem ipsum' ELSE '' END
             || CASE WHEN doc_id % 29 = 11 AND u.i = 1
                     THEN ' {code}' ELSE '' END
             || CASE WHEN doc_id % 37 = 13 AND u.i = 2
                     THEN ' javascript banner' ELSE '' END
             || CASE WHEN (doc_id + u.i) % 4 <= 1 THEN '.'
                     WHEN (doc_id + u.i) % 4 = 2 THEN '?'
                     ELSE '' END AS line
      FROM documents,
           UNNEST(range(0, CAST(ceil(len(string_split(text, ' ')) / 8.0)
                         AS INT))) u(i)
    )
"""


def c4_page_filter(lines: DataFrame) -> DataFrame:
    """The generic C4 classifier over a (doc_id, line) relation:
    per-line keep rule (terminal punctuation, >= 3 words, no
    'javascript'), page verdict (lorem ipsum > curly brace > too few
    sentences > kept — the paper applies the rules independently, so
    the booleans are all emitted and the label is just a priority
    over them)."""
    ends_terminal = F.col("line").rlike('[.!?"]$')
    n_words = F.size(F.split(F.col("line"), " "))
    has_js = F.lower(F.col("line")).contains("javascript")
    kept_line = (
        ends_terminal & (n_words >= C4_MIN_WORDS_PER_LINE) & ~has_js
    )
    per_line = lines.select(
        "doc_id",
        kept_line.alias("kept"),
        F.when(kept_line, F.regexp_count(F.col("line"), F.lit("[.!?]")))
        .otherwise(F.lit(0))
        .alias("sentences"),
        F.when(kept_line, n_words).otherwise(F.lit(0)).alias("words"),
        F.lower(F.col("line")).contains("lorem ipsum").alias("lorem"),
        F.col("line").contains("{").alias("brace"),
    )
    agg = per_line.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("kept").cast("long")).alias("n_kept_lines"),
        F.sum("sentences").cast("long").alias("n_sentences"),
        F.sum("words").cast("long").alias("retained_words"),
        F.max("lorem").alias("has_lorem"),
        F.max("brace").alias("has_brace"),
    )
    verdict = (
        F.when(F.col("has_lorem"), "lorem_ipsum")
        .when(F.col("has_brace"), "curly_brace")
        .when(F.col("n_sentences") < C4_MIN_SENTENCES, "too_few_sentences")
        .otherwise("kept")
    )
    return agg.withColumn("verdict", verdict)


@register(
    "textstats_c4_rules",
    oracle=f"""
    WITH {_C4_LINES_SQL.strip()},
    per_line AS (
      SELECT doc_id,
             regexp_matches(line, '[.!?"]$')
               AND len(string_split(line, ' ')) >= {C4_MIN_WORDS_PER_LINE}
               AND NOT contains(lower(line), 'javascript') AS kept,
             contains(lower(line), 'lorem ipsum') AS lorem,
             contains(line, '{{') AS brace,
             CASE WHEN regexp_matches(line, '[.!?"]$')
               AND len(string_split(line, ' ')) >= {C4_MIN_WORDS_PER_LINE}
               AND NOT contains(lower(line), 'javascript')
               THEN CAST(len(regexp_extract_all(line, '[.!?]')) AS BIGINT)
               ELSE 0 END AS sentences,
             CASE WHEN regexp_matches(line, '[.!?"]$')
               AND len(string_split(line, ' ')) >= {C4_MIN_WORDS_PER_LINE}
               AND NOT contains(lower(line), 'javascript')
               THEN CAST(len(string_split(line, ' ')) AS BIGINT)
               ELSE 0 END AS words
      FROM c4_lines
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_lines,
             CAST(SUM(sentences) AS BIGINT) AS n_sentences,
             CAST(SUM(words) AS BIGINT) AS retained_words,
             MAX(lorem) AS has_lorem,
             MAX(brace) AS has_brace
      FROM per_line GROUP BY doc_id
    )
    SELECT *,
           CASE WHEN has_lorem THEN 'lorem_ipsum'
                WHEN has_brace THEN 'curly_brace'
                WHEN n_sentences < {C4_MIN_SENTENCES}
                  THEN 'too_few_sentences'
                ELSE 'kept' END AS verdict
    FROM agg
    """,
)
def textstats_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning pass per document (see the section comment):
    line keep counts, retained sentence/word totals, the page-level
    plants, and the verdict label."""
    return c4_page_filter(load_c4_lines(spark, sf_dir))


# ---------------------------------------- n-gram language ID (rank-order)
# The Cavnar–Trenkle rank-order classifier (Cavnar & Trenkle 1994,
# "N-Gram-Based Text Categorization") — the n-gram language-ID the
# brief asks for beyond the stopword heuristic above: per language a
# TOP-K character-trigram rank profile built from a training split,
# per document its own rank profile, and the OUT-OF-PLACE distance
# (sum over the document's trigrams of |doc_rank − lang_rank|, with a
# missing trigram costing the full profile depth); the predicted
# language is the argmin. Spark shape: two explode+groupBy passes
# (corpus-linear), two PARTITIONED rank windows (by lang / by doc),
# then the document profiles join the ≤ langs×K broadcast model — the
# per-doc work is profile-sized, never corpus × corpus.
#
# The synthetic corpus assigns lang labels INDEPENDENTLY of its text
# (measured: doc-level trigram profiles sit at the 20% random baseline
# for any n-gram mix), so — the pii-scan precedent — the fixture
# PLANTS per-language function-word runs into each document's text;
# the classifier reads ONLY the text column and recovers the labels at
# 92-100% per language, which the oracle pins exactly.
LANGID_TRAIN_MOD = 10  # doc_id % 10 < 3 trains, the rest classify
LANGID_K_LANG = 40
LANGID_K_DOC = 25
#: per-language planted function words (ASCII; zh romanized)
LANGID_MARKERS = {
    "en": " the of and to in is that it was with",
    "de": " der die das und nicht ein ich sie mit sich",
    "es": " de la que el en los se una por con",
    "fr": " le de les des une est que pour dans aux",
    "zh": " de shi bu le zai ren you wo ta men",
}
_MARKER_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in LANGID_MARKERS.items())
    + " END"
)


def _char_trigrams(df: DataFrame) -> DataFrame:
    marker = F.lit(None).cast("string")
    for k, v in LANGID_MARKERS.items():
        marker = F.when(F.col("lang") == k, F.lit(v)).otherwise(marker)
    t = F.lower(F.concat(F.col("text"), F.repeat(marker, 3)))
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(t) - 2, F.lit(0))
    )
    return df.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(idx, lambda i: t.substr(i, F.lit(3)))
        ).alias("tri"),
    )


@register(
    "textstats_ngram_langid",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             lower(text || repeat({_MARKER_CASE}, 3)) AS t
      FROM documents
    ),
    tri AS (
      SELECT doc_id, lang, substr(t, i, 3) AS tri
      FROM d, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
    ),
    lang_counts AS (
      SELECT lang, tri, COUNT(*) AS n FROM tri
      WHERE doc_id % {LANGID_TRAIN_MOD} < 3 GROUP BY 1, 2
    ),
    lang_prof AS (
      SELECT lang, tri, rk FROM (
        SELECT lang, tri,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, tri) AS rk
        FROM lang_counts
      ) WHERE rk <= {LANGID_K_LANG}
    ),
    doc_counts AS (
      SELECT doc_id, lang AS label, tri, COUNT(*) AS n FROM tri
      WHERE doc_id % {LANGID_TRAIN_MOD} >= 3 GROUP BY 1, 2, 3
    ),
    doc_prof AS (
      SELECT doc_id, label, tri, drk FROM (
        SELECT doc_id, label, tri,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, tri) AS drk
        FROM doc_counts
      ) WHERE drk <= {LANGID_K_DOC}
    ),
    langs AS (SELECT DISTINCT lang FROM lang_prof),
    scored AS (
      SELECT p.doc_id, p.label, l.lang,
             CAST(SUM(COALESCE(ABS(p.drk - lp.rk),
                               {LANGID_K_LANG})) AS BIGINT) AS score
      FROM doc_prof p
      CROSS JOIN langs l
      LEFT JOIN lang_prof lp ON lp.lang = l.lang AND lp.tri = p.tri
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, label,
           MIN({{'s': score, 'l': lang}}).l AS predicted,
           MIN(score) AS best_score,
           MIN({{'s': score, 'l': lang}}).l = label AS is_correct
    FROM scored GROUP BY 1, 2
    """,
)
def textstats_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify the held-out split's documents against the training
    split's per-language trigram rank profiles and return per doc the
    labeled language, the predicted one, the winning out-of-place
    score, and the hit flag. Ranks totally ordered by (count DESC,
    trigram ASC) so both engines agree; argmin via min(struct(score,
    lang))."""
    from pyspark.sql import Window

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "lang", "text")
    tri = _char_trigrams(docs)
    train = tri.filter(F.col("doc_id") % LANGID_TRAIN_MOD < 3)
    lang_counts = train.groupBy("lang", "tri").agg(
        F.count(F.lit(1)).alias("n")
    )
    wl = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("tri")
    )
    # the profile is bounded (langs x K_LANG rows) but its lineage is a
    # full train-split explode + shuffle + window; it feeds TWO broadcast
    # builds (the langs dimension and the profile join), each of which
    # re-ran that pipeline — materialize it once per invocation. LAZY:
    # an eager checkpoint serializes the train pipeline in front of the
    # (independent) test-split pipeline instead of overlapping them
    lang_prof = (
        lang_counts.withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") <= LANGID_K_LANG)
        .select("lang", "tri", "rk")
        .localCheckpoint(eager=False, storageLevel=DISK_ONLY)
    )
    test = tri.filter(F.col("doc_id") % LANGID_TRAIN_MOD >= 3)
    doc_counts = test.groupBy(
        "doc_id", F.col("lang").alias("label"), "tri"
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("n").desc(), F.col("tri")
    )
    doc_prof = (
        doc_counts.withColumn("drk", F.row_number().over(wd))
        .filter(F.col("drk") <= LANGID_K_DOC)
        .select("doc_id", "label", "tri", "drk")
    )
    langs = lang_prof.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["lang", "tri"], "left")
        .groupBy("doc_id", "label", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drk") - F.col("rk")),
                    F.lit(LANGID_K_LANG),
                )
            )
            .cast("long")
            .alias("score")
        )
    )
    best = F.min(F.struct("score", "lang")).alias("__best")
    return scored.groupBy("doc_id", "label").agg(
        best,
        F.min("score").alias("best_score"),
    ).select(
        "doc_id",
        "label",
        F.col("__best.lang").alias("predicted"),
        "best_score",
        (F.col("__best.lang") == F.col("label")).alias("is_correct"),
    )


# ------------------------------------- cross-document boilerplate lines
# CCNet-style line-level dedup (Wenzek et al. 2020, arXiv:1911.00359
# §3.1: paragraphs hashed and dropped when repeated across documents —
# the standard boilerplate-removal pass every crawl pipeline runs
# before quality filtering; repeated nav/footer/copyright lines carry
# no training signal). A line is BOILERPLATE within its source when it
# appears in more than 30% of that source's documents (integer-exact:
# 10·docs_with_line > 3·docs_in_source). The synthetic text has no
# newlines, so the fixture PLANTS a per-doc line list (the c4_rules
# precedent): a per-source copyright line (100% of the source → always
# boilerplate), a shared nav line on even docs (~50% → boilerplate),
# and doc-unique content lines (never). Spark shape: one explode +
# one (source, line) groupBy with countDistinct + the per-source doc
# count broadcast — corpus-linear, the group key is source-scoped so
# a hot source never concentrates onto one reducer beyond its own
# vocabulary.
BOILERPLATE_PCT10 = 3  # threshold: > 30% of the source's docs


@register(
    "textstats_boilerplate_lines",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             list_concat(
               ['copyright (c) ' || source || ' - all rights reserved'],
               list_concat(
                 CASE WHEN doc_id % 2 = 0
                      THEN ['home | about | contact'] ELSE [] END,
                 list_transform(
                   generate_series(0, doc_id % 4 + 1),
                   i -> 'unique fact ' || doc_id || '-' || i)))
               AS lines
      FROM documents
    ),
    src_docs AS (
      SELECT source, COUNT(*) AS n_docs FROM d GROUP BY 1
    ),
    exploded AS (
      SELECT doc_id, source, UNNEST(lines) AS line FROM d
    ),
    line_reach AS (
      SELECT source, line, COUNT(DISTINCT doc_id) AS docs_with
      FROM exploded GROUP BY 1, 2
    ),
    flagged AS (
      SELECT e.doc_id, e.source, e.line,
             10 * r.docs_with > 3 * s.n_docs AS boiler
      FROM exploded e
      JOIN line_reach r USING (source, line)
      JOIN src_docs s USING (source)
    )
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           CAST(1000000 * (COUNT(*) - SUM(CASE WHEN boiler THEN 1
                                          ELSE 0 END))
                // COUNT(*) AS BIGINT) AS retained_ppm
    FROM flagged GROUP BY 1, 2
    """,
)
def textstats_boilerplate_lines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per document: planted line count, how many are source-level
    boilerplate (shared by >30% of the source's docs), and the exact
    integer retained-fraction ppm."""
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "source")
    d = F.col("doc_id")
    ds = d.cast("string")
    copyright_line = F.concat(
        F.lit("copyright (c) "), F.col("source"),
        F.lit(" - all rights reserved"),
    )
    nav = F.when(
        d % 2 == 0, F.array(F.lit("home | about | contact"))
    ).otherwise(F.array().cast("array<string>"))
    uniques = F.transform(
        F.sequence(F.lit(0), (d % 4 + 1).cast("int")),
        lambda i: F.concat(
            F.lit("unique fact "), ds, F.lit("-"), i.cast("string")
        ),
    )
    lines = F.concat(F.array(copyright_line), nav, uniques)
    exploded = docs.select(
        "doc_id", "source", F.explode(lines).alias("line")
    )
    src_docs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    reach = exploded.groupBy("source", "line").agg(
        F.countDistinct("doc_id").alias("docs_with")
    )
    flagged = exploded.join(reach, ["source", "line"]).join(
        F.broadcast(src_docs), "source"
    ).withColumn(
        "boiler",
        10 * F.col("docs_with") > BOILERPLATE_PCT10 * F.col("n_docs"),
    )
    n_lines = F.count(F.lit(1))
    n_boiler = F.sum(F.col("boiler").cast("long"))
    return flagged.groupBy("doc_id", "source").agg(
        n_lines.cast("long").alias("n_lines"),
        n_boiler.alias("n_boilerplate"),
        F.floor(
            1_000_000 * (n_lines - n_boiler) / n_lines
        ).cast("long").alias("retained_ppm"),
    )
