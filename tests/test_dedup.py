"""Dedup invariants: planted duplicates found; LSH vs exact agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all

load_all()


@pytest.fixture(scope="module")
def corpus_df(spark, sf_dir):
    from aruna_spark.queries.dedup import corpus

    return corpus(spark, sf_dir).cache()


def test_exact_dedup_finds_exactly_planted_copies(spark, sf_dir, corpus_df):
    fn, _ = REGISTRY["dedup_exact"]
    rows = fn(spark, sf_dir).collect()
    n_planted = corpus_df.filter(F.col("doc_id") >= 1_000_000).filter(
        F.col("doc_id") < 2_000_000
    ).count()
    assert len(rows) == n_planted
    for r in rows:
        ids = [int(x) for x in r.doc_ids.split(",")]
        assert r.n_copies == 2
        assert ids[1] == ids[0] + 1_000_000
        assert r.keeper_doc_id == ids[0]


def test_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """Every high-Jaccard pair (ground truth, all-pairs on the small test
    slice) must be recovered by the banded LSH; no false positives above
    the verify threshold can exist by construction."""
    from aruna_spark.queries.dedup import (
        JACCARD_PERMILLE,
        corpus,
        lsh_candidate_pairs,
        shingle_sets,
    )

    sets = shingle_sets(corpus(spark, sf_dir)).cache()
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    truth = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "1000 * size(array_intersect(sh_a, sh_b))"
                " div size(array_union(sh_a, sh_b))"
            ).alias("j"),
        )
        .filter(F.col("j") >= 900)
    )
    truth_pairs = {(r.doc_a, r.doc_b) for r in truth.collect()}
    cand_pairs = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sets).collect()
    }
    assert truth_pairs, "test data must contain planted near-dups"
    missed = truth_pairs - cand_pairs
    recall = 1 - len(missed) / len(truth_pairs)
    assert recall >= 0.9, f"LSH missed {len(missed)}/{len(truth_pairs)}: {missed}"

    fn, _ = REGISTRY["dedup_minhash_pairs"]
    reported = fn(spark, sf_dir).collect()
    assert all(r.jaccard_permille >= JACCARD_PERMILLE for r in reported)


def test_simhash_buckets_cover_exact_copies(spark, sf_dir):
    fn, _ = REGISTRY["dedup_simhash_buckets"]
    rows = fn(spark, sf_dir).collect()
    bucketed = set()
    for r in rows:
        bucketed.update(int(x) for x in r.doc_ids.split(","))
    # every exact copy shares its token set with the original → same simhash
    exact_ids = {
        int(x)
        for r in rows
        for x in r.doc_ids.split(",")
        if int(x) >= 1_000_000 and int(x) < 2_000_000
    }
    assert exact_ids, "exact copies must land in simhash buckets"
    for e in exact_ids:
        assert e - 1_000_000 in bucketed


def test_clusters_contain_planted_pairs_and_are_disjoint(spark, sf_dir):
    from aruna_spark.queries import REGISTRY

    fn, _ = REGISTRY["dedup_clusters"]
    rows = fn(spark, sf_dir).collect()
    seen: set[int] = set()
    by_member: dict[int, int] = {}
    for r in rows:
        members = [int(x) for x in r.member_ids.split(",")]
        assert r.n_members == len(members) >= 2
        assert r.cluster_rep == min(members)
        for m in members:
            assert m not in seen, "clusters must be disjoint"
            seen.add(m)
            by_member[m] = r.cluster_rep
    # every planted exact copy clusters with its source
    planted = [m for m in by_member if m >= 1_000_000 and m < 2_000_000]
    assert planted
    for m in planted:
        assert by_member[m] == by_member[m - 1_000_000]


def test_simhash_bit_test_true_for_negative_hashes(spark):
    """The simhash bit extraction must read REAL bits for negative
    xxhash64 values (two's-complement AND). The previous div/mod form
    was never 1 for a negative dividend in Spark or DuckDB — ~half of
    all tokens voted -1 on every bit, degenerating the blocking — and
    the oracle comparison could not catch it because both engines
    agreed on the degenerate value."""
    import duckdb

    from pyspark.sql import functions as F

    hs = [-6, -1, 5, -(2**62), 2**40 + 7, -9223372036854775808]
    rows = [(h, j) for h in hs for j in range(32)]
    df = spark.createDataFrame(rows, "h long, j int").select(
        "h",
        "j",
        F.expr("(h & CAST(power(2, j) AS BIGINT)) <> 0").alias("bit"),
    )
    got = {(r.h, r.j): r.bit for r in df.collect()}
    # Python reference: bit j of the 64-bit two's complement of h
    for h in hs:
        for j in range(32):
            assert got[(h, j)] == bool((h >> j) & 1), (h, j)
    # DuckDB (the oracle dialect) agrees cell-for-cell
    duck = duckdb.connect().execute(
        "SELECT h, j, (h & CAST(power(2, j) AS BIGINT)) <> 0 "
        "FROM (SELECT UNNEST(?::BIGINT[]) AS h) "
        "CROSS JOIN (SELECT UNNEST(range(0, 32)) AS j)",
        [hs],
    ).fetchall()
    for h, j, bit in duck:
        assert bool(bit) == bool((h >> j) & 1), (h, j)
    # sanity: a negative hash contributes at least one set bit
    assert any(got[(-6, j)] for j in range(32))


def test_duplicate_spans_winnowing_guarantee(spark):
    """The winnowing theorem made a test: every duplicated run of
    >= W + S - 1 tokens is detected at EVERY relative token offset
    (content-defined anchors — a positional stride-S sample provably
    misses copies whose offsets differ mod S), and a phrase repeated
    only WITHIN one document never flags (distinct-doc gate)."""
    import aruna_spark.queries.dedup as dd
    from aruna_spark.queries.dedup import (
        SPAN_S,
        SPAN_W,
        dedup_duplicate_spans,
    )

    run_len = SPAN_W + SPAN_S - 1  # 23: the guaranteed length
    shared = " ".join(f"s{i}" for i in range(run_len))
    # plant the shared run at every offset phase in doc A while doc B
    # keeps it at offset 1 — positional striding would miss most pairs
    docs = []
    for phase in range(SPAN_S):
        pad_a = " ".join(f"a{phase}x{i}" for i in range(20 + phase))
        pad_b = " ".join(f"b{phase}x{i}" for i in range(23))
        docs.append((100 + phase, f"{pad_a} {shared} {pad_b}"))
        docs.append((200 + phase, f"z{phase} {shared} tail{phase}"))
    # doc 300: a 40-token phrase repeated TWICE within itself only
    selfrep = " ".join(f"r{i}" for i in range(40))
    docs.append((300, f"{selfrep} {selfrep}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    orig = dd.corpus
    dd.corpus = lambda s, d: df
    try:
        rows = {r.doc_id: r for r in
                dedup_duplicate_spans(spark, "unused").collect()}
    finally:
        dd.corpus = orig
    for phase in range(SPAN_S):
        assert rows[100 + phase].n_dup_anchors > 0, phase
        assert rows[200 + phase].n_dup_anchors > 0, phase
    assert rows[300].n_dup_anchors == 0
    assert rows[300].dup_fraction == 0.0
