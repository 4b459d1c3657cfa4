"""DSIR importance selection (arXiv:2302.03169 geometry) and the
user substring search page (search_users.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.queries.importance import (
    SELECT_K,
    TARGET_SOURCES,
    doc_features,
)

load_all()


@pytest.fixture(scope="module")
def dsir_rows(spark, sf_dir):
    fn, _ = REGISTRY["dsir_importance_select"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    return rows


def test_dsir_selects_exactly_k(dsir_rows):
    assert sum(r.selected for r in dsir_rows) == SELECT_K
    assert len(dsir_rows) > SELECT_K


def test_dsir_selection_is_the_rate_topk(dsir_rows):
    """The resample keeps the K best per-feature rates (doc_id
    tie-break) — no unselected doc may outrank a selected one."""
    rate = lambda r: (r.score_num / r.n_feats, -r.doc_id)  # noqa: E731
    worst_sel = min(rate(r) for r in dsir_rows if r.selected)
    best_unsel = max(rate(r) for r in dsir_rows if not r.selected)
    assert best_unsel < worst_sel


def test_dsir_scores_span_both_signs(dsir_rows):
    """The floored-ppm model keeps the sign meaningful: target-like
    docs score positive, corpus-typical docs spread around zero (the
    add-one variant biased every score negative — module doc)."""
    assert any(r.score_num > 0 for r in dsir_rows)
    assert any(r.score_num < 0 for r in dsir_rows)


def test_dsir_selection_enriches_target_domain(spark, sf_dir, dsir_rows):
    """Directional sanity: the selected set must hold a HIGHER
    target-source fraction than the corpus baseline (the synthetic
    text carries a weak but present provenance signal)."""
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    in_t = lambda r: src[r.doc_id] in TARGET_SOURCES  # noqa: E731
    sel = [r for r in dsir_rows if r.selected]
    frac_sel = sum(map(in_t, sel)) / len(sel)
    frac_all = sum(map(in_t, dsir_rows)) / len(dsir_rows)
    assert frac_sel > frac_all


def test_dsir_feature_counts(spark, sf_dir):
    """n_feats = unigrams + bigrams = 2·tokens − 1 (per non-empty
    doc; single-token docs contribute 1)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = doc_features(docs).groupBy("doc_id").count()
    direct = docs.select(
        "doc_id",
        (F.size(F.split(F.lower("text"), " ")) * 2 - 1).alias("want"),
    )
    bad = (
        feats.join(direct, "doc_id")
        .filter(F.col("count") != F.greatest(F.col("want"), F.lit(1)))
        .count()
    )
    assert bad == 0


def test_dsir_plan_stays_jvm_side(spark, sf_dir):
    fn, _ = REGISTRY["dsir_importance_select"]
    plan = (
        fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------- search_users


def test_search_users_email_lane_and_cursor(spark, sf_dir):
    """The registered page: the query matches ONLY emails (no fixture
    name contains '3@e'); the page is key-ordered, the output carries
    no email column, the cursor = last returned id iff more matches
    exist (search_users.rs:134-176)."""
    from aruna_spark.queries.users import USER_SEARCH_LIMIT

    fn, _ = REGISTRY["search_users_page"]
    rows = fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= USER_SEARCH_LIMIT
    assert "email" not in rows[0].asDict()
    ids = [r.user_id for r in rows]
    assert ids == sorted(ids)
    for r in rows:
        assert str(r.user_id).endswith("3")  # email '..3@example.org'
    cursors = {r.next_start_after for r in rows}
    assert len(cursors) == 1
    (cursor,) = cursors
    if cursor is not None:
        assert cursor == ids[-1]


def test_search_users_two_page_walk(spark, sf_dir):
    """Page 2 resumes after the cursor with no skip or dup; the
    terminal page carries no cursor."""
    from aruna_spark.queries.users import (
        load_user_records,
        search_users_of,
    )

    users = load_user_records(spark, sf_dir)
    all_matches = [
        r.user_id
        for r in users.filter(
            (F.col("realm_id") == "realm1")
            & (
                F.lower("name").contains("3@e")
                | F.lower("email").contains("3@e")
            )
        )
        .orderBy("user_id")
        .collect()
    ]
    limit = max(1, len(all_matches) // 2)
    walked, cursor = [], None
    for _ in range(10):
        rows = search_users_of(users, "3@e", limit, cursor).collect()
        walked.extend(r.user_id for r in rows)
        cursor = rows[0].next_start_after if rows else None
        if cursor is None:
            break
    assert walked == all_matches


def test_search_users_name_query_matches_names(spark, sf_dir):
    from aruna_spark.queries.users import (
        load_user_records,
        search_users_of,
    )

    users = load_user_records(spark, sf_dir)
    rows = search_users_of(users, "user 1", 5).collect()
    assert rows and all(r.name.startswith("user 1") for r in rows)


# ------------------------------------------------------- C4 rules


def test_c4_every_verdict_lane_populated(spark, sf_dir):
    fn, _ = REGISTRY["textstats_c4_rules"]
    rows = fn(spark, sf_dir).collect()
    verdicts = {r.verdict for r in rows}
    assert verdicts == {
        "kept",
        "too_few_sentences",
        "lorem_ipsum",
        "curly_brace",
    }
    for r in rows:
        assert 0 <= r.n_kept_lines <= r.n_lines
        assert r.n_sentences <= r.n_kept_lines  # <=1 terminal per line
        if r.verdict == "kept":
            assert r.n_sentences >= 5 and not r.has_lorem and not r.has_brace


def test_c4_classifier_on_handwritten_page(spark):
    """arXiv:1910.10683 §2.2 on a literal page: terminal-punctuation
    and word-count line rules, the javascript line drop, and the page
    plants."""
    from aruna_spark.queries.textstats import c4_page_filter

    lines = [
        (1, "This sentence ends with a period."),
        (1, "Short one."),  # 2 words -> dropped
        (1, "No terminal punctuation here"),  # dropped
        (1, "Please enable JavaScript to continue."),  # dropped
        (1, "Another proper sentence right here?"),
        (1, "And a third proper sentence follows."),
        (1, "Sentence four is also fine."),
        (1, "Sentence five makes the page keepable."),
        (1, "Sentence six for margin."),
        (2, "This page mentions lorem ipsum filler."),
        (2, "Otherwise a fine sentence."),
        (3, "function f() { return 1; } is code."),
    ]
    df = spark.createDataFrame(lines, "doc_id long, line string")
    out = {r.doc_id: r for r in c4_page_filter(df).collect()}
    assert out[1].verdict == "kept"
    assert out[1].n_kept_lines == 6  # 9 lines - short - no-punct - js
    assert out[2].verdict == "lorem_ipsum"
    assert out[3].verdict == "curly_brace"
