"""Deduplication operators: exact content-hash, MinHash-LSH, SimHash.

Reference analog: content-addressed blob dedup — every blob hashed in one
streaming pass and deduplicated by hash via the ``hash_paths_index``
keyspace (``blob/src/hash.rs:10-77``, ``core/src/keyspaces.rs:44``). The
near-dup operators extend that to an LLM-data-pipeline setting.

The driver's ``documents`` table has no planted duplicates, so each query
runs over a deterministic *corpus*: the documents plus exact copies of
every ``doc_id % 10 == 0`` row and near copies (4-token tail appended) of
every ``doc_id % 10 == 5`` row — reproduced identically in the DuckDB
oracle, so even the LSH banding is value-checked end to end.

Scale design (100 TB):
- exact dedup is one hash + one groupBy — a single shuffle on the hash;
- MinHash-LSH is strictly *banded*: signatures are a narrow map stage,
  candidate pairs come from a self-join on (band, band-signature) — never
  an all-pairs product; skewed buckets are AQE's skew-join problem, and
  the verify step re-joins the shingle sets by doc_id instead of carrying
  arrays through the shuffle;
- SimHash avoids wide aggregates by exploding (token-hash × bit) rows and
  reducing twice — both reductions are map-side-combinable sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ops.text import (
    DUCK_HASH64,
    SPARK_HASH64,
    duck_minhash_item_sql,
    duck_shingles_sql,
    minhash_signature,
    shingles,
    ws_tokens,
)
from aruna_spark.queries import register

NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
JACCARD_PERMILLE = 500
SIMHASH_BITS = 32

NEAR_TAIL = " near dup marker tail"

CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000, text || '{NEAR_TAIL}' FROM documents
    WHERE doc_id % 10 = 5
"""


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + planted exact/near duplicates (see module doc)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text"),
    )
    from aruna_spark.ops.text import spread_for_cpu

    # text bytes are tiny vs the shingle/minhash work downstream; the
    # scan plans one task on a small file (see ops/text.spread_for_cpu)
    return spread_for_cpu(docs.unionByName(exact).unionByName(near))


def _ids_csv(ids: Column) -> Column:
    return F.concat_ws(
        ",", F.transform(F.sort_array(ids), lambda x: x.cast("string"))
    )


# ---------------------------------------------------------------- exact
@register(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL})
    SELECT md5(text) AS fingerprint,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id,
           string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
    FROM corpus GROUP BY md5(text) HAVING COUNT(*) >= 2
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: groupBy(content hash) → duplicate groups with keeper.

    Keeper = min doc_id (the reference keeps the first-hashed path for a
    blob hash the same way). One shuffle, map-side partial counts.
    """
    c = corpus(spark, sf_dir)
    return (
        c.groupBy(F.md5("text").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            _ids_csv(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ----------------------------------------------------------- minhash-lsh
def shingle_sets(c: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct 3-token shingle set; short docs dropped."""
    sh = shingles(ws_tokens(F.col("text")), 3)
    return (
        c.select("doc_id", sh.alias("sh"))
        .filter(F.col("sh").isNotNull())
        .select("doc_id", F.array_distinct("sh").alias("sh"))
    )


def prefix_index(sets: DataFrame, t: int = JACCARD_PERMILLE) -> DataFrame:
    """``(doc_id, n, tok, rn)`` — the rarest-first PPJoin prefix index
    of a ``(doc_id, sh)`` shingle-set relation: per-doc set size ``n``
    plus each doc's first ``n - ceil(t*n) + 1`` tokens under ascending
    document frequency (the lossless prefix filter) with their
    rarest-first rank ``rn`` (the positional filter's input). Runs at
    index BUILD time (``store.ngram_prefix_store`` materializes it);
    the query path only self-joins the result."""
    from pyspark.sql import Window

    sized = sets.select("doc_id", F.size("sh").alias("n"), "sh")
    toks = sized.select("doc_id", "n", F.explode("sh").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "tok")
    )
    return (
        toks.join(dfreq, "tok")
        .withColumn("rn", rn)
        .filter(
            F.col("rn")
            <= F.col("n") - F.ceil(F.col("n") * F.lit(t) / 1000.0) + 1
        )
        .select("doc_id", "n", "tok", "rn")
    )


def band_keys(sets: DataFrame) -> DataFrame:
    """(doc_id, b, k): the banded minhash keys — the LSH index relation
    (materializable; see ``store.rep_lsh_store``)."""
    sigs = sets.select(
        "doc_id", minhash_signature(F.col("sh"), NUM_HASHES).alias("sig")
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.concat_ws(
                ",",
                *[
                    F.element_at(F.col("sig"), b * ROWS_PER_BAND + i + 1).cast(
                        "string"
                    )
                    for i in range(ROWS_PER_BAND)
                ],
            ).alias("k"),
        )
        for b in range(BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))


def band_join(bands: DataFrame) -> DataFrame:
    """Self-join the band-key relation into distinct candidate pairs."""
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.k") == F.col("y.k"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(sets: DataFrame) -> DataFrame:
    """Banded LSH: minhash signature → band keys → self-join per band."""
    return band_join(band_keys(sets))


def _duck_lsh_ctes(src: str) -> str:
    """The tokenized→shingled→sigs→bands→cand CTE chain reading the
    ``(doc_id, text)`` relation ``src`` — shared by the full-corpus and
    exact-collapsed LSH oracles."""
    sh_expr = duck_shingles_sql("toks", 3)
    sig_items = ", ".join(duck_minhash_item_sql(i) for i in range(NUM_HASHES))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS b, "
        + " || ',' || ".join(
            f"CAST(sig[{b * ROWS_PER_BAND + i + 1}] AS VARCHAR)"
            for i in range(ROWS_PER_BAND)
        )
        + " AS k FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    tokenized AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
    shingled AS (
      SELECT doc_id, list_distinct({sh_expr}) AS sh FROM tokenized
      WHERE {sh_expr} IS NOT NULL
    ),
    sigs AS (SELECT doc_id, [{sig_items}] AS sig FROM shingled),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id
    )
    """


def _duck_minhash_sql() -> str:
    """DuckDB replication of the exact same LSH pipeline."""
    return f"""
    WITH corpus AS ({CORPUS_SQL}),
    {_duck_lsh_ctes('corpus')}
    SELECT c.doc_a, c.doc_b,
           (1000 * len(list_distinct(list_filter(a.sh, s -> list_contains(b.sh, s)))))
             // len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_permille
    FROM cand c
    JOIN shingled a ON a.doc_id = c.doc_a
    JOIN shingled b ON b.doc_id = c.doc_b
    WHERE (1000 * len(list_distinct(list_filter(a.sh, s -> list_contains(b.sh, s)))))
          // len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_PERMILLE}
    """


def _verified_pairs(sets: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact-Jaccard verify of candidate pairs against the string
    shingle sets: (doc_a, doc_b, jaccard_permille >= threshold)."""
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "1000 * size(array_intersect(sh_a, sh_b))"
                " div size(array_union(sh_a, sh_b))"
            ).alias("jaccard_permille"),
        )
        .filter(F.col("jaccard_permille") >= JACCARD_PERMILLE)
    )


@register("dedup_minhash_pairs", oracle=_duck_minhash_sql())
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: banded MinHash-LSH candidates + exact-Jaccard verify.

    Never an all-pairs product: candidates come only from shared
    (band, band-signature) buckets; the Jaccard verify then re-joins the
    shingle sets by doc_id. Output: (doc_a, doc_b, jaccard_permille ≥ 500).

    Execution shape: candidates self-join the materialized band-key
    index (``store.lsh_band_store`` — r5; signatures no longer recompute
    per query), and the verify re-reads the stored shingle sets
    (``store.shingle_store``) only for candidate doc_ids.
    """
    from aruna_spark.store import lsh_band_store, shingle_store

    sets = shingle_store(spark, sf_dir)
    return _verified_pairs(sets, band_join(lsh_band_store(spark, sf_dir)))


# ------------------------------------------------------- n-gram jaccard
@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    tokenized AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
    shingled AS (
      SELECT doc_id, list_distinct({duck_shingles_sql('toks', 3)}) AS sh
      FROM tokenized WHERE {duck_shingles_sql('toks', 3)} IS NOT NULL
    ),
    sized AS (SELECT doc_id, len(sh) AS n, UNNEST(sh) AS tok FROM shingled),
    -- definitional: Jaccard from shared-token counts over the inverted
    -- index; the Spark side's prefix filter is lossless, so both compute
    -- the same pair set
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS na, b.n AS nb, COUNT(*) AS inter
      FROM sized a JOIN sized b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           (1000 * inter) // (na + nb - inter) AS jaccard_permille
    FROM shared
    WHERE (1000 * inter) // (na + nb - inter) >= {JACCARD_PERMILLE}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs via a PREFIX-FILTERED set-similarity
    join (PPJoin-style; Vernica et al., SIGMOD'10 distributed variant) —
    the LOSSLESS counterpart to :func:`dedup_minhash_pairs`: every pair
    with Jaccard ≥ 0.5 over 3-token shingle sets is returned, exactly.

    Scale design (100 TB): all-pairs is never formed. Under any global
    token order, two sets with Jaccard ≥ t must share a token within the
    first ``|S| - ceil(t·|S|) + 1`` tokens of each (the *prefix filter*,
    lossless). Ordering tokens rarest-first (ascending document
    frequency) makes those prefixes the rare tokens, so the prefix
    self-join touches tiny postings lists; frequent shingles never enter
    the join. Candidates are further length-pruned (``|Sb| ≥ t·|Sa|``),
    then verified with exact Jaccard by re-joining shingle sets by
    doc_id. Everything is joins + groupBys on keys — no driver state.

    The df-ranked prefix index is a MAINTAINED artifact
    (``store.ngram_prefix_store``, VERDICT r3 perf-weak #2): the token
    document-frequency table and the rarest-first ranked window run once
    at index build; the query path is the prefix self-join + length
    pruning + exact verify against the stored shingle sets.
    """
    from aruna_spark.store import ngram_prefix_store, shingle_store

    sets = shingle_store(spark, sf_dir)
    prefix = ngram_prefix_store(spark, sf_dir)
    return _ppjoin_pairs(sets, prefix)


def _ppjoin_pairs(
    sets: DataFrame, prefix: DataFrame, t: int = JACCARD_PERMILLE
) -> DataFrame:
    """The PPJoin candidate + two-step verify chain over a stored
    prefix index and its shingle sets (see :func:`dedup_ngram_jaccard`
    for the lossless-filter reasoning)."""
    x = prefix.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("rn").alias("rn_a"),
        "tok",
    )
    y = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("rn").alias("rn_b"),
        "tok",
    )
    cand = (
        x.join(y, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length pruning: Jaccard >= t needs t*na <= nb <= na/t
            & (F.col("nb") * 1000 >= F.col("na") * t)
            & (F.col("na") * 1000 >= F.col("nb") * t)
            # PPJoin positional filter (lossless): overlap o needs
            # o*(1000+t) >= t*(na+nb); from a match at rarest-first
            # ranks (rn_a, rn_b) the overlap is at most
            # 1 + min(na - rn_a, nb - rn_b). A true pair passes at its
            # first (lowest-rank) match, so filtering every match by
            # this bound and keeping any-match pairs drops no true pair.
            & (
                (
                    F.lit(1)
                    + F.least(
                        F.col("na") - F.col("rn_a"),
                        F.col("nb") - F.col("rn_b"),
                    )
                )
                * (1000 + t)
                >= (F.col("na") + F.col("nb")) * t
            )
        )
        # dedup to one row per pair, KEEPING the set sizes (functions
        # of the doc ids, so first() is exact) — the verify steps below
        # derive union sizes as na + nb - |intersect| instead of
        # building an array_union per pair (sh is a distinct set, so
        # the identity is exact; this halves the per-candidate array
        # work, measured 3.9 -> 2.8 s at sf0.1)
        .groupBy("doc_a", "doc_b")
        .agg(F.first("na").alias("na"), F.first("nb").alias("nb"))
        # the candidate relation is byte-small (pairs of longs) but
        # each row costs an array intersection downstream; AQE's
        # byte-based coalescing planned the whole verify as ONE task
        # (guide §2.5's synthetic-key trap in reverse) — spread it to
        # the session's core count explicitly (measured 3.9 -> 1.9 s
        # at sf0.1 together with the union-free verify)
        .repartition(sets.sparkSession.sparkContext.defaultParallelism)
    )
    # Two-step verify. Step 1 intersects the xxhash64'd shingle arrays
    # (long-array set ops are ~2.5x faster than string-array ones over
    # the ~200k candidates). A hash collision between shingles on
    # OPPOSITE sides of a pair only MERGES them — inflating the
    # apparent intersection — so hash-Jaccard >= true Jaccard and the
    # survivors are a superset of the true pairs, ABSENT a collision
    # between two shingles inside one pair's intersection (which would
    # shrink inter_h below the true overlap against the exact
    # na + nb - inter_h denominator). That residual failure mode is a
    # same-pair 64-bit collision, probability ~ n²/2⁶⁴ per pair —
    # negligible, but probabilistic, not absolute (ADVICE r15). Step 2
    # re-verifies the (tiny) survivor set on the actual shingle
    # strings, so every EMITTED pair's jaccard is exact. Union sizes
    # come from na + nb - |intersect| (exact: the arrays are distinct
    # sets), so each step costs ONE array op per pair instead of two.
    ah = sets.select(F.col("doc_id").alias("doc_a"), F.col("shh").alias("shh_a"))
    bh = sets.select(F.col("doc_id").alias("doc_b"), F.col("shh").alias("shh_b"))
    inter_h = F.expr("size(array_intersect(shh_a, shh_b))")
    rough = (
        cand.join(ah, "doc_a")
        .join(bh, "doc_b")
        .filter(
            F.lit(1000) * inter_h
            >= t * (F.col("na") + F.col("nb") - inter_h)
        )
        .select("doc_a", "doc_b", "na", "nb")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        rough.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "(1000 * size(array_intersect(sh_a, sh_b)))"
                " div (na + nb - size(array_intersect(sh_a, sh_b)))"
            ).alias("jaccard_permille"),
        )
        .filter(F.col("jaccard_permille") >= t)
    )


# -------------------------------------------------------------- simhash
@register(
    "dedup_simhash_buckets",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (
      SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
      FROM corpus
    ),
    hashed AS (SELECT doc_id, {DUCK_HASH64.format(x='tok')} AS h FROM toks),
    bits AS (
      SELECT doc_id, j,
             CAST(SUM(CASE WHEN (h & CAST(power(2, j) AS BIGINT)) <> 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS vote
      FROM hashed CROSS JOIN UNNEST(range(0, {SIMHASH_BITS})) AS t(j)
      GROUP BY doc_id, j
    ),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote >= 0 THEN CAST(power(2, j) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id,
           string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
    FROM sim GROUP BY simhash HAVING COUNT(*) >= 2
    """,
)
def dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup buckets: 32-bit sign-vote hash over token sets.

    Docs whose token sets agree bit-for-bit land in one bucket (hamming
    distance 0). Two map-side-combinable aggregations; no wide agg lists.
    """
    c = corpus(spark, sf_dir)
    toks = c.select(
        "doc_id",
        F.explode(F.array_distinct(ws_tokens(F.col("text")))).alias("tok"),
    )
    from aruna_spark.ops.text import hash64

    hashed = toks.select("doc_id", hash64(F.col("tok")).alias("h"))
    bits = hashed.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"), "h"
    )
    # bit j via two's-complement AND — identical in Spark and DuckDB
    # for NEGATIVE xxhash64 values too (a div/mod bit test is never 1
    # for a negative dividend in either engine, which would collapse
    # ~half the tokens to an all-zero vote pattern)
    votes = bits.groupBy("doc_id", "j").agg(
        F.sum(
            F.when(
                F.expr("(h & CAST(power(2, j) AS BIGINT)) <> 0"), 1
            ).otherwise(-1)
        ).alias("vote")
    )
    sim = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("vote") >= 0, F.expr("CAST(power(2, j) AS BIGINT)")
            ).otherwise(0)
        ).alias("simhash")
    )
    return (
        sim.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            _ids_csv(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------- dup clusters
def _duck_clusters_sql() -> str:
    ctes = _duck_minhash_sql().replace("WITH ", "", 1)
    ctes = ctes.split("SELECT c.doc_a", 1)[0].rstrip().rstrip(",")
    return f"""
    WITH RECURSIVE {ctes},
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN shingled a ON a.doc_id = c.doc_a
      JOIN shingled b ON b.doc_id = c.doc_b
      WHERE (1000 * len(list_distinct(list_filter(a.sh, s -> list_contains(b.sh, s)))))
            // len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_PERMILLE}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    comp AS (SELECT n, LEAST(n, MIN(m)) AS label FROM reach GROUP BY n)
    SELECT label AS cluster_rep,
           COUNT(*) AS n_members,
           string_agg(n, ',' ORDER BY n) AS member_ids
    FROM comp GROUP BY label
    """


@register("dedup_clusters", oracle=_duck_clusters_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified
    near-dup pairs — the endpoint of a dedup pipeline (keep one
    representative per component, drop the rest). Representative =
    minimum doc_id in the component.

    Spark form: iterative min-label propagation over the (tiny relative
    to the corpus) pair graph — each round joins labels to edges and
    takes the min neighbor label, localCheckpoint-ed like the SPARQL
    closure; rounds = component diameter (near-dup clusters are
    star-like, so 1-2 rounds). The label table is O(duplicated docs),
    never O(corpus). Candidates come from the materialized band index
    (``store.lsh_band_store``), verify from the stored shingle sets.
    """
    from aruna_spark.store import lsh_band_store, shingle_store

    sets = shingle_store(spark, sf_dir)
    pairs = (
        _verified_pairs(sets, band_join(lsh_band_store(spark, sf_dir)))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    labels = _min_label_components(pairs)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        _ids_csv(F.collect_list("n")).alias("member_ids"),
    ).select(
        F.col("label").alias("cluster_rep"), "n_members", "member_ids"
    )


def _min_label_components(pairs: DataFrame) -> DataFrame:
    """Min-label propagation over an undirected pair graph: returns
    ``(n, label)`` where label = min doc_id of n's connected component.
    Rounds = component diameter (near-dup clusters are star-like, so
    1-2); each round is a join + map-side-combinable min — the label
    table is O(docs that HAVE a duplicate), never O(corpus)."""
    edges = pairs.select(
        F.col("doc_a").alias("n"), F.col("doc_b").alias("m")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("n"), F.col("doc_a").alias("m"))
    )
    labels = edges.select("n").distinct().select(
        "n", F.col("n").alias("label")
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    for _ in range(20):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("n", "m2"),
                       edges["m"] == F.col("m2"))
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the moved flag through the update itself: the
        # convergence probe then reads the checkpointed frame instead
        # of re-joining new labels against old (one driver job per
        # round instead of two — the loop cost is round-trip latency,
        # not data, on these duplicate-only-sized label tables)
        new_labels = (
            labels.join(neighbor_min, "n", "left")
            .select(
                "n",
                F.least(F.col("label"), F.col("nbr_label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("moved"),
            )
            .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
        )
        changed = new_labels.filter("moved").take(1)
        labels = new_labels.select("n", "label")
        if not changed:
            break
    return labels


# ------------------------------------ exact-collapse-scaled variants
# The sf1 rehearsal (SCALE.md) measured the banded family growing
# 3.3-5.5x for 10x data: replicated corpora put k identical texts in
# every band bucket, and within-bucket candidate generation is O(k^2)
# per group — quadratic in the very duplicates the pipeline exists to
# remove. The production composition (C4/RefinedWeb-style) collapses
# EXACT duplicates first (one cheap hash groupBy), runs the near-dup
# machinery over unique representatives only, and carries copy counts
# as weights. Candidate work then scales with unique content, not raw
# volume — the corpus-scaled dial VERDICT r4 Next #7 asked for.

UNIQ_SQL = """
    SELECT MIN(doc_id) AS doc_id, MIN(text) AS text,
           COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text)
"""

_JACC = (
    "(1000 * len(list_distinct(list_filter(a.sh, s -> list_contains(b.sh, s)))))"
    " // len(list_distinct(list_concat(a.sh, b.sh)))"
)


def unique_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, n_copies): the planted corpus collapsed to one
    representative (min doc_id) per exact content hash — the exact-dedup
    stage run FIRST, so every downstream near-dup operator works over
    unique content only."""
    return (
        corpus(spark, sf_dir)
        .groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("fp")
    )


@register(
    "dedup_minhash_scaled",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    uniq AS ({UNIQ_SQL}),
    {_duck_lsh_ctes('uniq')}
    SELECT c.doc_a, c.doc_b,
           {_JACC} AS jaccard_permille,
           ra.n_copies AS copies_a, rb.n_copies AS copies_b
    FROM cand c
    JOIN shingled a ON a.doc_id = c.doc_a
    JOIN shingled b ON b.doc_id = c.doc_b
    JOIN uniq ra ON ra.doc_id = c.doc_a
    JOIN uniq rb ON rb.doc_id = c.doc_b
    WHERE {_JACC} >= {JACCARD_PERMILLE}
    """,
)
def dedup_minhash_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over exact-collapsed representatives.

    Same banding/verify chain as :func:`dedup_minhash_pairs`, but the
    input is :func:`unique_reps` — identical texts never enter a band
    bucket together, so bucket occupancy (and candidate work) tracks
    UNIQUE content. Each output pair carries both sides' copy counts;
    expanding to raw doc pairs is a join against the exact-dedup group
    table, not more LSH work. The shingle sets still come from the
    collapse, shingle sets, and band keys are all read from the
    maintained ``store.rep_lsh_store`` — the query self-joins the
    narrow stored band index and touches shingle arrays only to verify
    candidates.
    """
    from aruna_spark.store import rep_lsh_store

    reps, sets, bands = rep_lsh_store(spark, sf_dir)
    pairs = _verified_pairs(sets, band_join(bands))
    ca = reps.select(
        F.col("doc_id").alias("doc_a"), F.col("n_copies").alias("copies_a")
    )
    cb = reps.select(
        F.col("doc_id").alias("doc_b"), F.col("n_copies").alias("copies_b")
    )
    return pairs.join(ca, "doc_a").join(cb, "doc_b").select(
        "doc_a", "doc_b", "jaccard_permille", "copies_a", "copies_b"
    )


@register(
    "dedup_clusters_scaled",
    oracle=f"""
    WITH RECURSIVE corpus AS ({CORPUS_SQL}),
    uniq AS ({UNIQ_SQL}),
    {_duck_lsh_ctes('uniq')},
    pairs AS (
      SELECT c.doc_a, c.doc_b FROM cand c
      JOIN shingled a ON a.doc_id = c.doc_a
      JOIN shingled b ON b.doc_id = c.doc_b
      WHERE {_JACC} >= {JACCARD_PERMILLE}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ),
    comp AS (SELECT n, LEAST(n, MIN(m)) AS label FROM reach GROUP BY n)
    SELECT label AS cluster_rep,
           COUNT(*) AS n_members,
           string_agg(n, ',' ORDER BY n) AS member_ids,
           CAST(SUM(u.n_copies) AS BIGINT) AS n_total_docs
    FROM comp JOIN uniq u ON u.doc_id = comp.n
    GROUP BY label
    """,
)
def dedup_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over exact-collapsed representatives: min-label
    connected components on the representative near-dup graph, weighted
    by copy counts (``n_total_docs`` = raw documents the cluster would
    remove-or-keep). The label table is O(unique docs with a near-dup),
    the edge list O(representative pairs) — both orders of magnitude
    smaller than the raw-corpus graph on a replicated corpus. Collapse,
    sets, and band keys read from ``store.rep_lsh_store``."""
    from aruna_spark.store import rep_lsh_store

    reps, sets, bands = rep_lsh_store(spark, sf_dir)
    pairs = (
        _verified_pairs(sets, band_join(bands))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    labels = _min_label_components(pairs)
    return (
        labels.join(reps.withColumnRenamed("doc_id", "n"), "n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            _ids_csv(F.collect_list("n")).alias("member_ids"),
            F.sum("n_copies").alias("n_total_docs"),
        )
        .select(
            F.col("label").alias("cluster_rep"),
            "n_members",
            "member_ids",
            "n_total_docs",
        )
    )


SIMHASH_BLOCK_DIV = 65536  # keep the upper 16 of 32 bits as the block key


@register(
    "dedup_simhash_scaled",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    uniq AS ({UNIQ_SQL}),
    toks AS (
      SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
      FROM uniq
    ),
    hashed AS (SELECT doc_id, {DUCK_HASH64.format(x='tok')} AS h FROM toks),
    bits AS (
      SELECT doc_id, j,
             CAST(SUM(CASE WHEN (h & CAST(power(2, j) AS BIGINT)) <> 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS vote
      FROM hashed CROSS JOIN UNNEST(range(0, {SIMHASH_BITS})) AS t(j)
      GROUP BY doc_id, j
    ),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote >= 0 THEN CAST(power(2, j) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT simhash // {SIMHASH_BLOCK_DIV} AS block,
           COUNT(*) AS n_reps,
           MIN(s.doc_id) AS keeper_doc_id,
           string_agg(s.doc_id, ',' ORDER BY s.doc_id) AS rep_ids,
           CAST(SUM(u.n_copies) AS BIGINT) AS n_total_docs
    FROM sim s JOIN uniq u ON u.doc_id = s.doc_id
    GROUP BY simhash // {SIMHASH_BLOCK_DIV}
    HAVING COUNT(*) >= 2
    """,
)
def dedup_simhash_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash blocking over exact-collapsed representatives, bucketed
    on the UPPER 16 of 32 bits — the classic hamming-block relaxation
    (near-dups whose low bits drift still share a block) and the
    corpus-scaled dial: block count is 2^bits, so bits tracks
    log2(n_unique / target occupancy) as the corpus grows, exactly the
    BITS dial ``similarity_neardup_scaled`` demonstrates for embedding
    LSH. Weighted by copy counts like the other scaled variants; the
    collapse is read from ``store.rep_lsh_store``."""
    from aruna_spark.store import rep_lsh_store

    reps, _, _ = rep_lsh_store(spark, sf_dir)
    toks = reps.select(
        "doc_id",
        F.explode(F.array_distinct(ws_tokens(F.col("text")))).alias("tok"),
    )
    from aruna_spark.ops.text import hash64

    hashed = toks.select("doc_id", hash64(F.col("tok")).alias("h"))
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
        "h",
    )
    # bit j via two's-complement AND — identical in Spark and DuckDB
    # for NEGATIVE xxhash64 values too (a div/mod bit test is never 1
    # for a negative dividend in either engine, which would collapse
    # ~half the tokens to an all-zero vote pattern)
    votes = bits.groupBy("doc_id", "j").agg(
        F.sum(
            F.when(
                F.expr("(h & CAST(power(2, j) AS BIGINT)) <> 0"), 1
            ).otherwise(-1)
        ).alias("vote")
    )
    sim = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("vote") >= 0, F.expr("CAST(power(2, j) AS BIGINT)")
            ).otherwise(0)
        ).alias("simhash")
    )
    return (
        sim.join(reps.select("doc_id", "n_copies"), "doc_id")
        .groupBy(
            F.expr(f"simhash div {SIMHASH_BLOCK_DIV}").alias("block")
        )
        .agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.min("doc_id").alias("keeper_doc_id"),
            _ids_csv(F.collect_list("doc_id")).alias("rep_ids"),
            F.sum("n_copies").alias("n_total_docs"),
        )
        .filter(F.col("n_reps") >= 2)
    )


@register(
    "dedup_ngram_scaled",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    uniq AS ({UNIQ_SQL}),
    tokenized AS (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq),
    shingled AS (
      SELECT doc_id, list_distinct({duck_shingles_sql('toks', 3)}) AS sh
      FROM tokenized WHERE {duck_shingles_sql('toks', 3)} IS NOT NULL
    ),
    sized AS (SELECT doc_id, len(sh) AS n, UNNEST(sh) AS tok FROM shingled),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS na, b.n AS nb, COUNT(*) AS inter
      FROM sized a JOIN sized b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             (1000 * inter) // (na + nb - inter) AS jaccard_permille
      FROM shared
      WHERE (1000 * inter) // (na + nb - inter) >= {JACCARD_PERMILLE}
    )
    SELECT p.doc_a, p.doc_b, p.jaccard_permille,
           ra.n_copies AS copies_a, rb.n_copies AS copies_b
    FROM pairs p
    JOIN uniq ra ON ra.doc_id = p.doc_a
    JOIN uniq rb ON rb.doc_id = p.doc_b
    """,
)
def dedup_ngram_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard (PPJoin) over exact-collapsed
    representatives: the lossless near-dup join composed AFTER the
    exact-dedup stage, like the other ``_scaled`` variants. The prefix
    index is built over unique content (``store.ngram_prefix_store``
    with ``collapsed=True``) so document frequencies — and therefore
    prefix sizes and the candidate join — track unique text; replicated
    corpora never inflate the join. Output pairs carry both sides' copy
    counts. The full-corpus ``dedup_ngram_jaccard`` keeps the
    raw-corpus contract; this is the production pipeline shape (the
    sf1 rehearsal's largest remaining cost, 18.8 s -> collapsed)."""
    from aruna_spark.store import ngram_prefix_store, rep_lsh_store

    reps, sets, _ = rep_lsh_store(spark, sf_dir)
    prefix = ngram_prefix_store(spark, sf_dir, collapsed=True)
    pairs = _ppjoin_pairs(sets, prefix)
    ca = reps.select(
        F.col("doc_id").alias("doc_a"), F.col("n_copies").alias("copies_a")
    )
    cb = reps.select(
        F.col("doc_id").alias("doc_b"), F.col("n_copies").alias("copies_b")
    )
    return pairs.join(ca, "doc_a").join(cb, "doc_b").select(
        "doc_a", "doc_b", "jaccard_permille", "copies_a", "copies_b"
    )


# ----------------------------------------------- exact duplicate spans
# Span-level exact-substring duplication (the substring-dedup pass of
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better", arXiv:2107.06499 — published method: suffix arrays). The
# Spark-native shape is WINNOWING (Schleimer/Wilkerson/Aiken 2003, the
# MOSS fingerprinter): hash every W-token window (stride 1, narrow map
# — never materialized beyond a per-doc array), then in every run of
# S consecutive window-hashes select the minimum (ties → leftmost) as
# an ANCHOR. Selection is CONTENT-defined, so two copies of a run
# select the same anchors regardless of token offset — a plain
# stride-S sample has no such guarantee (two copies offset by p, q
# with p != q mod S share NO sampled window, however long the run).
# The winnowing theorem gives the deterministic version: any
# duplicated run of >= W + S - 1 tokens contains a full S-window of
# identical hashes in both copies, whose argmin depends only on those
# S values — both docs select it, so both emit the same fingerprint.
#
# Scale (100 TB): per doc everything up to the anchor list is ONE
# narrow map over higher-order functions (transform / slice /
# array_min — no shuffle, no UDF); expected anchor density is
# 2/(S+1) ~ 22% of positions, so the exploded relation is
# corpus-token-linear with a ~4.5x reduction. The key aggregation and
# the rollup join shuffle 8-byte hash64 keys, both map-side
# combinable. Self-repeats within one document are
# textstats_repetition's domain; the flag is on distinct DOCUMENT
# count, so a phrase repeated inside a single doc never marks it.

SPAN_W = 16  # fingerprint window length (tokens)
SPAN_S = 8  # winnowing window (hash positions)
# guaranteed-detected duplicated-run length: SPAN_W + SPAN_S - 1 = 23

_H_SPARK = (
    f"transform(sequence(0, size(t) - {SPAN_W}), i -> "
    + SPARK_HASH64.format(
        x=f"concat_ws(' ', slice(t, i + 1, {SPAN_W}))"
    )
    + ")"
)
_SEL_SPARK = (
    f"array_distinct(transform("
    f"sequence(0, greatest(0, size(h) - {SPAN_S})), "
    f"j -> j + array_position(slice(h, j + 1, {SPAN_S}), "
    f"array_min(slice(h, j + 1, {SPAN_S}))) - 1))"
)

_DUCK_WIN_HASH = DUCK_HASH64.format(
    x=(
        "array_to_string(t[CAST(i AS BIGINT) : "
        f"CAST(i + {SPAN_W} - 1 AS BIGINT)], ' ')"
    )
)


@register(
    "dedup_duplicate_spans",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM corpus
      WHERE len(string_split(text, ' ')) >= {SPAN_W}
    ),
    hs AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - {SPAN_W} + 2),
                            i -> {_DUCK_WIN_HASH}) AS h
      FROM toks
    ),
    sel AS (
      SELECT doc_id, h,
             list_distinct(list_transform(
               range(1, greatest(1, len(h) - {SPAN_S} + 1) + 1),
               j -> j + list_position(
                      h[CAST(j AS BIGINT)
                        : CAST(j + {SPAN_S} - 1 AS BIGINT)],
                      list_min(h[CAST(j AS BIGINT)
                                 : CAST(j + {SPAN_S} - 1 AS BIGINT)]))
                    - 1)) AS anchors
      FROM hs
    ),
    win AS (
      SELECT doc_id, h[CAST(a AS BIGINT)] AS key
      FROM sel, UNNEST(anchors) AS u(a)
    ),
    keys AS (
      SELECT key, COUNT(DISTINCT doc_id) AS nd FROM win GROUP BY key
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(SUM(CASE WHEN k.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_anchors,
           CAST(SUM(CASE WHEN k.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_fraction
    FROM win w JOIN keys k USING (key)
    GROUP BY w.doc_id
    """,
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus duplicated-span profile: how many of
    the document's winnowing anchors (content-selected W-token window
    fingerprints) also occur in another document, and the duplicated
    fraction — the span-level signal the substring-dedup pass cuts on
    (see the section comment for the guarantee). The planted corpus
    exercises both lanes: exact copies duplicate every anchor, near
    copies everything clear of the appended tail."""
    c = corpus(spark, sf_dir)
    toks = c.select("doc_id", ws_tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= SPAN_W
    )
    anchored = toks.select(
        "doc_id", F.expr(_H_SPARK).alias("h")
    ).select("doc_id", "h", F.expr(_SEL_SPARK).alias("anchors"))
    win = anchored.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(anchors,"
                " a -> element_at(h, CAST(a + 1 AS INT)))"
            )
        ).alias("key"),
    ).localCheckpoint(eager=True, storageLevel=DISK_ONLY)  # r15: the key counts and the join-back otherwise each re-run
    # the tokenize+hash+winnowing-select pipeline (the heavy compute)
    keys = win.groupBy("key").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = (F.col("nd") > 1).cast("long")
    return (
        win.join(keys, "key")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum(dup).cast("long").alias("n_dup_anchors"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias(
                "dup_fraction"
            ),
        )
    )
