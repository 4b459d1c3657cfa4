"""Strategy binding ladder (placement/resolver.rs:374-452)."""

from __future__ import annotations

from aruna_spark.queries.bindings import (
    STRATEGIES,
    bindings_df,
    placement_strategy_binding,
    resolve_strategy_binding,
)


def _targets(spark, rows):
    return spark.createDataFrame(
        rows,
        "target_id string, path string, group_id string,"
        " doc_class string, override_strategy string",
    )


def test_all_rungs_fire_and_dangling_rejects(spark, sf_dir):
    rows = placement_strategy_binding(spark, sf_dir).collect()
    levels = {r["level"] for r in rows}
    assert {
        "override",
        "error_dangling",
        "path",
        "group",
        "class",
        "realm",
    } <= levels
    for r in rows:
        if r["level"] == "error_dangling":
            # a dangling override id REJECTS, never falls through
            assert r["strategy"] is None
        else:
            assert r["strategy"] is not None


def test_prefix_matches_on_segment_boundary_only(spark):
    """'projects/p1' matches 'projects/p1/x' and itself but never
    'projects/p10/...' (rs:440-452)."""
    t = _targets(
        spark,
        [
            ("a", "projects/p1/t9/run-1", "grp-9", "metadata", None),
            ("b", "projects/p10/t0/run-2", "grp-9", "metadata", None),
            ("c", "projects/p1", "grp-9", "metadata", None),
            ("d", "projects/p1/t2/x", "grp-9", "metadata", None),
        ],
    )
    got = {
        r["target_id"]: (r["level"], r["strategy"])
        for r in resolve_strategy_binding(
            t, bindings_df(spark), STRATEGIES, "strat-def"
        ).collect()
    }
    assert got["a"] == ("path", "strat-p1")
    assert got["b"] == ("realm", "strat-realm")  # p10 is NOT under p1
    assert got["c"] == ("path", "strat-p1")  # exact match counts
    assert got["d"] == ("path", "strat-p1t2")  # longest prefix wins


def test_blob_targets_skip_the_path_rung(spark):
    t = _targets(
        spark, [("x", "projects/p1/t0/run-3", "grp-9", "blob", None)]
    )
    got = resolve_strategy_binding(
        t, bindings_df(spark), STRATEGIES, "strat-def"
    ).collect()[0]
    assert (got["level"], got["strategy"]) == ("realm", "strat-realm")


def test_default_and_first_rungs_without_realm_binding(spark):
    no_realm = bindings_df(spark).filter("scope_kind <> 'realm'")
    t = _targets(
        spark, [("x", "projects/p9/t0/run-4", "grp-9", "metadata", None)]
    )
    with_default = resolve_strategy_binding(
        t, no_realm, STRATEGIES, "strat-def"
    ).collect()[0]
    assert (with_default["level"], with_default["strategy"]) == (
        "default",
        "strat-def",
    )
    no_default = resolve_strategy_binding(
        t, no_realm, STRATEGIES, None
    ).collect()[0]
    assert no_default["level"] == "first"


def test_duplicate_scope_binding_rejected(spark):
    """ADVICE r15: a duplicate (scope_kind, scope_value) row must fail
    loudly — the CASE fold would otherwise pick an arbitrary winner
    where the old join shape duplicated the target rows."""
    import pytest

    dup = spark.createDataFrame(
        [("group", "grp-1", "strat-a"), ("group", "grp-1", "strat-b")],
        "scope_kind string, scope_value string, strategy string",
    )
    t = _targets(
        spark, [("x", "projects/p1/t0/run-1", "grp-1", "metadata", None)]
    )
    with pytest.raises(ValueError, match="duplicate"):
        resolve_strategy_binding(t, dup, STRATEGIES, "strat-def")


def test_oversized_bindings_rejected(spark, monkeypatch):
    """ADVICE r15: the driver-side fold must refuse a bindings relation
    past the config-sized bound instead of collecting it."""
    import pytest

    from aruna_spark.queries import bindings as mod

    monkeypatch.setattr(mod, "_MAX_BINDINGS", 1)
    t = _targets(
        spark, [("x", "projects/p1/t0/run-1", "grp-1", "metadata", None)]
    )
    with pytest.raises(ValueError, match="config-sized"):
        resolve_strategy_binding(
            t, bindings_df(spark), STRATEGIES, "strat-def"
        )
