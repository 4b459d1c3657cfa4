"""Corpus mixing plan + deterministic epochs-with-fractional-tail
application (the published LLM data-mixing recipe)."""

from __future__ import annotations

import pytest

from aruna_spark.queries.sampling import (
    MIX_BUDGET_PERMILLE,
    MIX_TARGETS,
    corpus_mix_plan,
    corpus_mix_sample,
)


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    return {r.mix_class: r for r in corpus_mix_plan(spark, sf_dir).collect()}


def test_plan_covers_all_classes_and_upsamples_one(plan):
    assert set(plan) == set(MIX_TARGETS)
    assert any(r.upsampled for r in plan.values()), "no upsampled class"
    assert any(not r.upsampled for r in plan.values())
    for r in plan.values():
        assert r.epochs == int(r.rate)
        assert r.upsampled == (r.rate > 1.0)
        assert abs(r.target_share - MIX_TARGETS[r.mix_class]) < 1e-12


def test_rates_hit_the_budget_exactly(plan):
    """sum over classes of rate*chars = budget share of total chars —
    the plan conserves the token budget by construction."""
    total = sum(r.chars for r in plan.values())
    budget = total * MIX_BUDGET_PERMILLE / 1000.0
    assert sum(r.rate * r.chars for r in plan.values()) == pytest.approx(
        budget, rel=1e-9
    )


def test_sample_approximates_targets(spark, sf_dir, plan):
    rows = {r.mix_class: r for r in corpus_mix_sample(spark, sf_dir).collect()}
    assert set(rows) == set(MIX_TARGETS)
    kept_total = sum(r.kept_chars for r in rows.values())
    for c, r in rows.items():
        # whole epochs are exact; only the fractional tail is hashed,
        # so achieved shares sit near targets even at 500 docs
        assert r.kept_chars / kept_total == pytest.approx(
            MIX_TARGETS[c], abs=0.08
        )
        expected = plan[c].rate * plan[c].chars
        assert r.kept_chars == pytest.approx(expected, rel=0.25)
    up = [c for c, p in plan.items() if p.upsampled]
    for c in up:
        # an upsampled class keeps MORE doc-copies than it has docs
        assert rows[c].kept_docs > plan[c].n_docs
        assert rows[c].dropped_id_checksum is None  # nothing dropped


def test_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, corpus_mix_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, corpus_mix_sample(spark, sf_dir).collect()))
    assert a == b
