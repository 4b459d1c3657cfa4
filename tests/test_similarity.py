"""Similarity invariants: LSH recall vs brute force, near-dup coverage."""

from __future__ import annotations

from aruna_spark.queries import REGISTRY, load_all

load_all()


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Multi-probe LSH top-k must recover a reasonable share of the exact
    top-k (it scans ~7/64 of the corpus; clustered data keeps recall
    far above the scan fraction)."""
    bf, _ = REGISTRY["similarity_topk_bruteforce"]
    lsh, _ = REGISTRY["similarity_lsh_topk"]
    exact = _topk_sets(bf(spark, sf_dir).collect())
    approx = _topk_sets(lsh(spark, sf_dir).collect())
    assert exact, "query set must be non-empty"
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"


def test_lsh_subset_scores_match_bruteforce(spark, sf_dir):
    """Where LSH and brute force agree on a neighbor, the quantized score
    must be identical (same canonical scoring expression)."""
    bf, _ = REGISTRY["similarity_topk_bruteforce"]
    lsh, _ = REGISTRY["similarity_lsh_topk"]
    exact = {(r.query_id, r.vec_id): r.score_q for r in bf(spark, sf_dir).collect()}
    for r in lsh(spark, sf_dir).collect():
        if (r.query_id, r.vec_id) in exact:
            assert exact[(r.query_id, r.vec_id)] == r.score_q


def test_neardup_finds_planted_pairs(spark, sf_dir):
    fn, _ = REGISTRY["similarity_neardup_pairs"]
    rows = fn(spark, sf_dir).collect()
    planted = {(r.vec_a, r.vec_b) for r in rows if r.vec_b == r.vec_a + 1_000_000}
    assert planted, "planted perturbed copies must be recovered"
    assert all(r.score_q >= 950_000 for r in rows)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF (8 cells, nprobe=2) scans ~2/8 of the corpus; recall must stay
    well above the scan fraction, and overlapping neighbors must carry
    the identical quantized score (shared scoring tail)."""
    bf, _ = REGISTRY["similarity_topk_bruteforce"]
    ivf, _ = REGISTRY["similarity_ivf_topk"]
    exact_rows = bf(spark, sf_dir).collect()
    ivf_rows = ivf(spark, sf_dir).collect()
    exact = _topk_sets(exact_rows)
    approx = _topk_sets(ivf_rows)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.4, f"IVF recall {recall:.2f} below floor"
    scores = {(r.query_id, r.vec_id): r.score_q for r in exact_rows}
    for r in ivf_rows:
        if (r.query_id, r.vec_id) in scores:
            assert scores[(r.query_id, r.vec_id)] == r.score_q


def test_trained_ivf_recall_and_determinism(spark, sf_dir):
    """Trained IVF: (a) k-means training is bit-deterministic across two
    independent runs (integer arithmetic, order-independent sums); (b)
    recall vs brute force is at least as good as the recall floor of the
    untrained quantizer; (c) shared scoring tail gives identical
    quantized scores on overlapping neighbors."""
    from aruna_spark.catalog import load_table
    from aruna_spark.queries.similarity import (
        _with_norm,
        train_ivf_centroids,
    )

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    c1 = train_ivf_centroids(emb)
    c2 = train_ivf_centroids(emb)
    assert c1 == c2, "training must be bit-deterministic"
    assert len(c1) >= 2, "clustering must keep at least two cells"

    bf, _ = REGISTRY["similarity_topk_bruteforce"]
    trained, _ = REGISTRY["similarity_ivf_trained_topk"]
    exact_rows = bf(spark, sf_dir).collect()
    trained_rows = trained(spark, sf_dir).collect()
    exact = _topk_sets(exact_rows)
    approx = _topk_sets(trained_rows)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.4, f"trained-IVF recall {recall:.2f} below floor"
    scores = {(r.query_id, r.vec_id): r.score_q for r in exact_rows}
    for r in trained_rows:
        if (r.query_id, r.vec_id) in scores:
            assert scores[(r.query_id, r.vec_id)] == r.score_q


def test_ivf_sqrt_store_sizes_and_balances(spark, sf_dir):
    """The sqrt sizing rule and the assignment argmax: cells derive
    from the corpus count, and the ±1-centroid assignment spreads
    vectors across cells (the float-product truncation bug collapsed
    EVERYTHING into cell 0 — invisible to the all-cells-probed oracle
    at this scale, so pin the histogram directly)."""
    from pyspark.sql import functions as F

    from aruna_spark.queries.similarity import sqrt_cells
    from aruna_spark.store import ivf_sqrt_store

    assert sqrt_cells(500) == 16
    assert sqrt_cells(2_000) == 32
    assert sqrt_cells(20_000) == 128
    assert sqrt_cells(200_000) == 512
    n_cells, assigned = ivf_sqrt_store(spark, sf_dir)
    assert n_cells == 16
    hist = assigned.groupBy("cell").count().collect()
    assert len(hist) > n_cells // 2, "assignment must not collapse"
    assert max(r["count"] for r in hist) < assigned.count() // 2


def test_ivf_sqrt_fixed_query_probe_matches_registered(spark, sf_dir):
    """The decade-bench leg (fixed replica-0 query set) returns the
    registered query's rows at test scale, where every vec_id < 2000."""
    from aruna_spark.queries.similarity import (
        ivf_sqrt_decade_probe,
        similarity_ivf_sqrt_topk,
    )

    a = {
        (r.query_id, r.vec_id, r.rnk)
        for r in similarity_ivf_sqrt_topk(spark, sf_dir).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.rnk)
        for r in ivf_sqrt_decade_probe(spark, sf_dir).collect()
    }
    assert a == b and a


def test_semdedup_prunes_exactly_one_per_planted_pair(spark, sf_dir):
    """SemDeDup keep-the-edge rule: each planted perturbed copy forms
    one same-cell near-dup pair with its original; exactly one member
    prunes, and the kept one has the LOWER (centroid_sim, vec_id)."""
    from aruna_spark.queries.similarity import dedup_semantic_cells

    rows = {
        r["vec_id"]: r.asDict()
        for r in dedup_semantic_cells(spark, sf_dir).collect()
    }
    planted = [v for v in rows if v >= 1_000_000]
    assert planted
    paired = 0
    for pv in planted:
        ov = pv - 1_000_000
        p, o = rows[pv], rows[ov]
        if p["n_near_dups"] == 0:
            continue  # pair split across a cell boundary — no claim
        paired += 1
        assert o["n_near_dups"] >= 1
        assert p["pruned"] != o["pruned"]  # exactly one survives
        kept, cut = (o, p) if p["pruned"] else (p, o)
        assert (kept["centroid_sim_q"], kept["vec_id"]) < (
            cut["centroid_sim_q"],
            cut["vec_id"],
        )
    assert paired > 0  # the planted lane actually exercises the rule
    # vectors without any near-dup never prune
    assert all(
        not r["pruned"] for r in rows.values() if r["n_near_dups"] == 0
    )
