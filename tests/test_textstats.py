

def test_max_multiplicity_edge_cases(spark):
    """The run-length fold equals the exact per-element max count on
    empty, null, tie-heavy, and all-equal arrays."""
    from pyspark.sql import functions as F

    from aruna_spark.ops.text import max_multiplicity

    rows = [
        (1, []),
        (2, None),
        (3, ["a"]),
        (4, ["a", "b", "a", "c", "a"]),
        (5, ["x", "x", "x"]),
        (6, ["b", "a", "b", "a"]),
        (7, ["z", "y", "y", "z", "z", "y"]),
    ]
    want = {1: 0, 2: 0, 3: 1, 4: 3, 5: 3, 6: 2, 7: 3}
    df = spark.createDataFrame(rows, "id int, arr array<string>").select(
        "id", max_multiplicity(F.col("arr")).alias("m")
    )
    assert {r["id"]: r["m"] for r in df.collect()} == want


def test_char_lm_quality_discriminates_gibberish(spark, sf_dir):
    """The corpus-typicality score must rank planted gibberish (rare
    trigrams) below planted typical text (trigrams resampled from the
    corpus' own shape) — the perplexity-bucket signal. Verified by
    patching two synthetic docs into the corpus loader."""
    import aruna_spark.queries.textstats as ts
    from aruna_spark.catalog import load_table
    from aruna_spark.queries.textstats import textstats_char_lm_quality

    real = load_table(spark, sf_dir, "documents")
    # typical: a sample of real corpus text; gibberish: rare trigrams
    sample = " ".join(r.text[:60] for r in real.limit(4).collect())
    gibberish = "zq9#x@7!kj^w%v&m*zq9#x@7!kj^w%v&m*" * 4
    extra = spark.createDataFrame(
        [(9_000_001, sample), (9_000_002, gibberish)],
        "doc_id long, text string",
    )
    orig = ts.load_table
    ts.load_table = lambda s, d, t: real.select(
        "doc_id", "text"
    ).unionByName(extra)
    try:
        rows = {
            r.doc_id: r
            for r in textstats_char_lm_quality(spark, sf_dir).collect()
        }
    finally:
        ts.load_table = orig
    typical, gib = rows[9_000_001], rows[9_000_002]
    assert gib.typicality_ppm < typical.typicality_ppm
    assert gib.below_corpus_mean


def test_ngram_langid_recovers_planted_languages(spark, sf_dir):
    """Cavnar–Trenkle rank-order LID over the planted function-word
    fixture: every held-out doc classifies, predictions stay in the
    trained label set, and the planted signal is actually recovered
    (>= 85% overall — the raw synthetic text alone sits at the 20%
    random baseline)."""
    from aruna_spark.queries.textstats import (
        LANGID_MARKERS,
        LANGID_TRAIN_MOD,
        textstats_ngram_langid,
    )

    rows = textstats_ngram_langid(spark, sf_dir).collect()
    assert rows, "held-out docs must classify"
    langs = set(LANGID_MARKERS)
    assert {r["predicted"] for r in rows} <= langs
    assert all(r["doc_id"] % LANGID_TRAIN_MOD >= 3 for r in rows)
    acc = sum(r["is_correct"] for r in rows) / len(rows)
    assert acc >= 0.85, acc
