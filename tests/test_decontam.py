"""Decontamination invariants + a planted micro-case with known
membership."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.decontam import BENCH_MOD, flag_contaminated

load_all()


def test_planted_overlap_membership_exact(spark):
    """Exact flagging on a constructed corpus: doc 0 is the benchmark
    (id % 97 == 0); docs sharing a 3-gram with it are flagged, docs
    with disjoint text or fewer than 3 tokens are not."""
    rows = [
        (0, "alpha beta gamma delta"),        # benchmark (0 % 97 == 0)
        (1, "xx alpha beta gamma yy"),        # shares 'alpha beta gamma'
        (2, "beta gamma delta"),              # shares 'beta gamma delta'
        (3, "alpha beta"),                    # <3 tokens: no grams
        (4, "one two three four"),            # disjoint
        (5, "gamma alpha beta"),              # 3-gram exists but unseen order
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = {r.doc_id for r in flag_contaminated(docs).collect()}
    assert flagged == {1, 2}


def test_benchmark_docs_never_flagged(spark, sf_dir):
    fn, _ = REGISTRY["decontam_ngram_overlap"]
    out = fn(spark, sf_dir)
    # the summary covers only training docs; the flagged checksum is a
    # sum of training ids, so it can never include a benchmark id --
    # verify via the underlying flag set directly
    from aruna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    flagged = flag_contaminated(docs)
    assert flagged.filter(F.col("doc_id") % BENCH_MOD == 0).count() == 0
    # and the summary's totals reconcile with the flag set
    total_flagged = flagged.count()
    assert (
        out.agg(F.sum("n_contaminated")).collect()[0][0] == total_flagged
    )


def test_embedding_overlap_flags_exactly_the_planted_leaks(spark, sf_dir):
    """Every planted leaked benchmark copy (cosine ~0.9997 against its
    eval original, no shared n-gram needed) must flag, pointing at its
    own original; the natural corpus must not reach 0.95."""
    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.queries.decontam import EVAL_MOD, LEAK_OFFSET

    load_all()
    fn, _ = REGISTRY["decontam_embedding_overlap"]
    rows = fn(spark, sf_dir).collect()
    leaks = [r for r in rows if r.train_id >= LEAK_OFFSET]
    natural = [r for r in rows if r.train_id < LEAK_OFFSET]
    assert leaks and all(r.contaminated for r in leaks)
    for r in leaks:
        assert r.nearest_eval_id == r.train_id - LEAK_OFFSET
        assert r.nearest_eval_id % EVAL_MOD == 0
    assert natural and not any(r.contaminated for r in natural)
