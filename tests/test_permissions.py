"""Glob grant semantics — cases modeled on permission_rules.rs:642-782."""

from __future__ import annotations

import re

from aruna_spark.ops.globs import glob_to_regex, visible
from aruna_spark.queries import REGISTRY, load_all

load_all()


def m(glob: str, path: str) -> bool:
    return re.match(glob_to_regex(glob), path) is not None


def test_narrow_grant_does_not_leak_siblings():
    """globset defaults (permission_rules.rs:82: Glob::new + defaults):
    'a/**' matches everything strictly inside a, not a itself."""
    g = "/realm/g/team/meta/**"
    assert not m(g, "/realm/g/team/meta")  # globset: not the dir itself
    assert m(g, "/realm/g/team/meta/doc")
    assert m(g, "/realm/g/team/meta/a/b/c")
    assert not m(g, "/realm/g/other/meta/doc")
    assert not m(g, "/realm/g/team/data/doc")
    assert not m(g, "/realm/g/team/metadata")  # no prefix bleed


def test_star_crosses_separators_like_globset_default():
    """globset's literal_separator defaults to FALSE: '*' matches across
    '/'. The round-2 advisory showed the stricter single-segment dialect
    under-matched DENY rules, silently widening visibility — this pins
    the reference dialect."""
    g = "data/*/en/*.txt"
    assert m(g, "data/src1/en/doc-1.txt")
    assert m(g, "data/a/b/en/doc-1.txt")  # '*' crosses '/'
    assert m(g, "data/src1/en/sub/doc-1.txt")
    assert not m(g, "data/src1/de/doc-1.txt")  # still needs '/en/'
    assert m(g, "data/x/de/y/en/doc.txt")  # any '/en/' component suffices


def test_doublestar_matches_everything():
    g = "**"
    for p in ("", "a", "a/b", "a/b/c.txt"):
        assert m(g, p)


def test_leading_doublestar_matches_bare_name():
    g = "**/b"
    assert m(g, "b")  # globset: '**/b' matches bare 'b'
    assert m(g, "a/b")
    assert m(g, "x/y/b")
    assert not m(g, "a/bc")


def test_question_mark_any_single_char():
    g = "data/src?/x"
    assert m(g, "data/src1/x")
    assert not m(g, "data/src10/x")
    assert m(g, "data/src//x")  # globset default: '?' may match '/'


def test_regex_metachars_are_literal():
    g = "a.b/c+d/**"
    assert m(g, "a.b/c+d/e")
    assert not m(g, "aXb/c+d/e")  # '.' must not be a wildcard


def test_deny_overrides_allow(spark):
    rows = [("k/allowed/f", ), ("k/denied/f", )]
    keyed = spark.createDataFrame(rows, "key string")
    grants = spark.createDataFrame(
        [
            ("u", glob_to_regex("k/**"), "allow"),
            ("u", glob_to_regex("k/denied/**"), "deny"),
        ],
        "subject_id string, pattern string, effect string",
    )
    vis = {r.key for r in visible(keyed, grants).collect()}
    assert vis == {"k/allowed/f"}


def test_visible_summary_deny_subtree(spark, sf_dir):
    rows = {r.subject_id: r for r in
            REGISTRY["perm_visible_summary"][0](spark, sf_dir).collect()}
    assert "alice" in rows and "root" in rows and "bob" in rows
    # alice's deny subtree is excluded: no de/ keys visible
    assert not rows["alice"].first_key.startswith("data/src1/de/")
    assert "de" not in (rows["alice"].first_key, rows["alice"].last_key)
    # root sees everything anyone else sees
    assert rows["root"].n_visible >= max(r.n_visible for r in rows.values())


def test_engine_visibility_scope_filters_reads(spark, sf_dir):
    """Lazy visibility (handle.rs:4657-4700): the engine's triples are
    gated by the caller's visible-graph scope, derived here from glob
    grants over per-document permission paths."""
    from pyspark.sql import functions as F

    from aruna_spark.ingest.doc_triples import GRAPH_NS, load_triples
    from aruna_spark.ops.globs import glob_to_regex
    from aruna_spark.sparql.engine import GraphNotFoundError, SparqlEngine

    triples = load_triples(spark, sf_dir)
    # permission path meta/{doc_id}; grant covers meta/1* only
    paths = triples.select("graph_iri").distinct().withColumn(
        "path",
        F.concat(F.lit("meta/"), F.regexp_extract("graph_iri", r"/(\w+)$", 1)),
    )
    pattern = glob_to_regex("meta/1*")
    scope = paths.filter(F.regexp_like("path", F.lit(pattern))).select(
        "graph_iri"
    )
    open_eng = SparqlEngine(spark, triples)
    gated = SparqlEngine(spark, triples, visible_graphs=scope)
    q = "SELECT ?s WHERE { ?s schema:name ?name }"
    all_subjects = {r.s for r in open_eng.query_flat(q).collect()}
    visible_subjects = {r.s for r in gated.query_flat(q).collect()}
    assert visible_subjects and visible_subjects < all_subjects
    # every visible subject comes from a doc id starting with 1
    assert all(
        s.rsplit(":", 1)[1].startswith("1")
        for s in visible_subjects
        if s.startswith("urn:aruna:doc:")
    )
    # eager check: a named invisible graph is GraphNotFound
    gated.check_graphs([f"{GRAPH_NS}1"])  # doc 1 -> meta/1 matches 1*
    try:
        gated.check_graphs([f"{GRAPH_NS}2"])
        raise AssertionError("expected GraphNotFoundError")
    except GraphNotFoundError:
        pass


def test_allows_ladder_gates(spark, sf_dir):
    """permission_rules.rs:110-157 — the four gates, end to end:
    public roles grant READ only, WRITE implies READ, direct DENY and
    restriction DENY carve subtrees, restrictions whitelist on top."""
    from pyspark.sql import functions as F

    from aruna_spark.queries.permissions import perm_allows_matrix
    from aruna_spark.queries.permissions import allows, _C_RULES, _C_RESTR
    from aruna_spark.sources.objects import live_latest, load_object_versions

    rows = {
        (r["subject_id"], r["required"]): r["n_allowed"]
        for r in perm_allows_matrix(spark, sf_dir).collect()
    }
    # a caller with only READ-capable rules never writes
    assert rows[("alice", "WRITE")] == 0
    assert rows[("carol", "WRITE")] == 0
    # WRITE implies READ: bob's counts match exactly
    assert rows[("bob", "READ")] == rows[("bob", "WRITE")] > 0
    # restrictions whittle carol's realm-wide READ to a strict subset
    assert 0 < rows[("carol", "READ")] < rows[("root", "READ")]
    # per-key spot checks: the de subtree is DENY-carved for alice and
    # restriction-carved for carol; bob's public src3 WRITE is inert
    latest = live_latest(
        load_object_versions(spark, sf_dir)
    ).select("key")
    rules = spark.createDataFrame(
        _C_RULES,
        "subject_id string, pattern string, permission string,"
        " direct boolean, public boolean",
    )
    restr = spark.createDataFrame(
        _C_RESTR, "subject_id string, pattern string, permission string"
    )
    decided = allows(latest, rules, restr, "READ")
    de_rows = decided.filter(
        F.col("key").startswith("data/src1/de/")
        & F.col("subject_id").isin("alice", "carol")
        & F.col("allowed")
    )
    assert de_rows.count() == 0
    # bob's direct data/*/en/** rule legitimately covers src3/en —
    # the PUBLIC src3 WRITE rule must grant nothing beyond it
    src3_bob = decided.filter(
        F.col("key").startswith("data/src3/")
        & ~F.col("key").startswith("data/src3/en/")
        & (F.col("subject_id") == "bob")
        & F.col("allowed")
    )
    assert src3_bob.count() == 0
