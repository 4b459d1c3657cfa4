"""Search invariants ported from the reference's unit tests.

- tie-bucket non-skipping pagination (search_cursor.rs:740-782)
- dedup merge of hits: max score, min document_id, any snippet
  (search_cursor.rs:243-272, :833)
- min-query validation (api/src/routes/search.rs:227-229)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.search.bm25 import keyset_after, merge_search_hits, validate_query

load_all()


def _walk_pages(spark, scored, page_size):
    """Keyset-walk every page; return the concatenated hit keys."""
    out = []
    wm = None
    while True:
        base = scored if wm is None else keyset_after(scored, wm)
        page = (
            base.select("graph_iri", "subject", "score_q")
            .orderBy(F.desc("score_q"), "graph_iri", "subject")
            .limit(page_size)
            .collect()
        )
        if not page:
            return out
        out.extend((r.graph_iri, r.subject) for r in page)
        last = page[-1]
        wm = spark.createDataFrame(
            [(last.score_q, last.graph_iri, last.subject)],
            "w_score_q long, w_graph string, w_subject string",
        )


def test_tie_bucket_pages_never_skip(spark):
    """Hits that tie within one quantized score bucket must all appear
    exactly once across consecutive pages (page size < bucket size)."""
    rows = [("g0", f"s{i:02d}", 100) for i in range(7)]  # one big tie bucket
    rows += [("g0", f"t{i}", 90 - i) for i in range(5)]
    scored = spark.createDataFrame(
        rows, "graph_iri string, subject string, score_q long"
    )
    seen = _walk_pages(spark, scored, page_size=3)
    assert len(seen) == len(rows), "every hit exactly once"
    assert len(set(seen)) == len(rows), "no duplicates across pages"
    # merged order respected: scores never increase across the walk
    scores = {(g, s): q for g, s, q in rows}
    walked = [scores[k] for k in seen]
    assert walked == sorted(walked, reverse=True)


def test_merge_hits_max_score_min_doc_any_snippet(spark):
    hits = spark.createDataFrame(
        [
            ("g1", "s1", 500, 7, None),
            ("g1", "s1", 900, 9, None),  # max score wins
            ("g1", "s1", 900, 3, "snip-a"),  # tie -> min document_id
            ("g2", "s2", 100, 1, None),  # singleton, no snippet anywhere
        ],
        "graph_iri string, subject string, score_q long, document_id long, snippet string",
    )
    merged = {
        (r.graph_iri, r.subject): r for r in merge_search_hits(hits).collect()
    }
    assert len(merged) == 2
    winner = merged[("g1", "s1")]
    assert winner.score_q == 900 and winner.document_id == 3
    assert winner.snippet == "snip-a"  # any non-null snippet survives
    assert merged[("g2", "s2")].snippet is None


def test_min_query_validation():
    with pytest.raises(ValueError):
        validate_query(" x ")
    assert validate_query("ab cd") == ["ab", "cd"]
    # ≥2 chars but zero indexable tokens must also be rejected — the
    # downstream SQL builders would otherwise emit zero-arg least() /
    # UNNEST([]) (ADVICE r4)
    with pytest.raises(ValueError):
        validate_query("!!")


def test_tokenizer_tantivy_default_analyzer():
    """Tantivy default analyzer parity: lowercase + split on
    non-alphanumerics + drop >40-char tokens (search_enrichment.rs:3-8
    implies Tantivy's default `en` pipeline). The token class is
    Unicode alphanumeric (VERDICT r4 Next #3) — accented and CJK text
    tokenizes as the reference's Tantivy SimpleTokenizer does."""
    from aruna_spark.search.bm25 import tokenize

    assert tokenize("Spark, merge-window!") == ["spark", "merge", "window"]
    assert tokenize("Data") == ["data"]
    assert tokenize("a" * 41 + " ok") == ["ok"]  # RemoveLongFilter(40)
    assert validate_query("Spark,") == ["spark"]
    # Unicode golden: Tantivy tokenizes 'Müller' as 'müller', not 'm'+'ller'
    assert tokenize("Müller-Straße 12") == ["müller", "straße", "12"]
    assert tokenize("日本語のテキスト data") == ["日本語のテキスト", "data"]
    assert tokenize("café Crème naïve") == ["café", "crème", "naïve"]
    # documented normalizations (engine-parity folds)
    assert tokenize("İstanbul") == ["istanbul"]  # U+0307 stripped
    assert tokenize("ΣΟΦΙΑΣ") == ["σοφιασ"]  # final sigma folded


def test_bm25_unicode_fields_golden(spark):
    """End-to-end golden over multilingual name/description fields: the
    Unicode analyzer indexes accented and CJK text as whole tokens, so
    a 'Müller' or CJK query finds its document (it could not under the
    old ASCII token class — 'Müller' shattered into 'm'+'ller')."""
    from aruna_spark.search.bm25 import bm25_scores, build_postings, tokenize

    fields = spark.createDataFrame(
        [
            ("s1", "g1", "name", "Müller Datensatz"),
            ("s1", "g1", "description", "Ein naïver Datensatz über Bäche"),
            ("s2", "g2", "name", "日本語コーパス"),
            ("s2", "g2", "description", "日本語のテキスト資料"),
            ("s3", "g3", "name", "plain ascii data"),
        ],
        "subject string, graph_iri string, field string, text string",
    )
    postings = build_postings(fields)

    def hit_subjects(q):
        scored = bm25_scores(postings, tokenize(q))
        return {r.subject for r in scored.collect()}

    assert hit_subjects("Müller") == {"s1"}
    assert hit_subjects("müller") == {"s1"}  # lowercased at both ends
    assert hit_subjects("日本語コーパス") == {"s2"}
    assert hit_subjects("Bäche") == {"s1"}
    assert hit_subjects("data") == {"s3"}


def test_tokenizer_cross_engine_parity(spark):
    """The three pipelines — Spark (Java regex), the DuckDB oracle
    (RE2), and the driver-side Python tokenizer — must split hostile
    Unicode byte-identically: accents, CJK, Greek final sigma, Turkish
    İ, combining marks, fullwidth forms, non-ASCII digits, emoji."""
    import duckdb

    from aruna_spark.search.bm25 import (
        duck_tokenize_sql,
        tokenize,
        tokenize_expr,
    )

    cases = [
        "Müller GmbH", "café Crème", "naïve résumé", "日本語のテキスト data",
        "Ελληνικά και Data", "кириллица текст", "İstanbul DİŞ",
        "straße GROSS", "ΟΔΥΣΣΕΥΣ ΤΕΛΟΣ", "ΣΟΦΙΑΣ", "ñandú año", "ab́c",
        "ﬁle ﬂow", "½ pi², x⁸", "٣٤ ١٢", "emoji 😀 split",
        "ＦＵＬＬｗｉｄｔｈ１２３", "Ⅻ ⅻ roman", "aḃc ȧḃċ", "ᾛᾙ",
        "Ǳǲǳ TEST", "Ꭰ Ꮃ cherokee",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "t string")
    srows = {
        r.t: list(r.toks)
        for r in sdf.select(
            "t", tokenize_expr("t").alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    for c in cases:
        duck = con.execute(
            f"SELECT {duck_tokenize_sql('?')}", [c]
        ).fetchone()[0]
        assert srows[c] == list(duck), f"spark!=duck for {c!r}"
        assert srows[c] == tokenize(c), f"spark!=python for {c!r}"


def test_tokenizer_spark_duckdb_parity(spark):
    """The Spark tokenize_expr and the DuckDB oracle expression produce
    the identical token list on punctuation/case/length corners."""
    import duckdb

    from aruna_spark.search.bm25 import duck_tokenize_sql, tokenize_expr

    texts = [
        "Spark, merge-window!",
        "MiXeD CaSe  spaces\tand\ttabs",
        "trailing.dot. 42numbers7 _under_score_",
        "x" * 41 + " keep-me",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_toks = [
        r.toks
        for r in df.select(tokenize_expr("text").alias("toks")).collect()
    ]
    con = duckdb.connect()
    duck_toks = [
        con.execute(
            f"SELECT {duck_tokenize_sql('?')} "
        , [t]).fetchone()[0]
        for t in texts
    ]
    assert spark_toks == duck_toks


def test_case_insensitive_search_hits(spark, sf_dir):
    """Golden: `Doc` (uppercase) and `doc,` (punctuation-adjacent) both
    hit documents whose name field tokenizes to `doc` — the observable
    behavior change the tokenizer-parity upgrade exists for."""
    from aruna_spark.store import bm25_scored

    lower = {
        (r.graph_iri, r.subject, r.score_q)
        for r in bm25_scored(spark, sf_dir, "doc").collect()
    }
    assert lower, "baseline lowercase query must hit"
    upper = {
        (r.graph_iri, r.subject, r.score_q)
        for r in bm25_scored(spark, sf_dir, "Doc").collect()
    }
    punct = {
        (r.graph_iri, r.subject, r.score_q)
        for r in bm25_scored(spark, sf_dir, "doc,").collect()
    }
    assert upper == lower
    assert punct == lower


def test_page1_page2_disjoint_and_contiguous(spark, sf_dir):
    topk, _ = REGISTRY["search_bm25_topk"]
    page2, _ = REGISTRY["search_bm25_page2"]
    p1 = [(r.graph_iri, r.subject) for r in topk(spark, sf_dir).collect()]
    p2 = [(r.graph_iri, r.subject) for r in page2(spark, sf_dir).collect()]
    assert not set(p1) & set(p2)


def test_materialized_postings_prune_and_match(spark, sf_dir, tmp_path):
    """BM25 over the materialized shard-partitioned index equals the
    derived postings, and a token query's scan prunes to its shards."""
    from aruna_spark.ingest.doc_triples import load_triples
    from aruna_spark.search.bm25 import (
        bm25_scores,
        build_field_literals,
        build_postings,
        load_materialized_postings,
        materialize_postings,
        shard_filter,
    )

    postings = build_postings(
        build_field_literals(load_triples(spark, sf_dir))
    )
    path = str(tmp_path / "postings")
    materialize_postings(postings, path)
    stored = load_materialized_postings(spark, path)
    # analyzer tokens (the Tantivy-parity tokenizer splits "doc-1" into
    # ["doc", "1"], so index tokens are the split pieces)
    toks = ["doc", "collection"]
    pruned = stored.filter(shard_filter(toks)).drop("shard")
    a = {
        tuple(r)
        for r in bm25_scores(postings, toks)
        .select("subject", "score_q")
        .collect()
    }
    from aruna_spark.search.bm25 import build_doc_lengths, build_field_stats

    dl = build_doc_lengths(postings)
    stats = build_field_stats(dl)
    b = {
        tuple(r)
        for r in bm25_scores(pruned, toks, dl=dl, stats=stats)
        .select("subject", "score_q")
        .collect()
    }
    plan = (
        stored.filter(shard_filter(toks))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert a == b


def test_keyset_walk_property_random_ties(spark):
    """Property form of the tie-bucket invariant: for RANDOM scored
    relations (tiny score/graph domains force heavy ties at every page
    boundary) and every page size, the keyset walk visits exactly the
    full relation in merge order — no skip, no dup (the
    search_cursor.rs:740-782 contract, generalized)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.sampled_from(["g0", "g1"]),
        st.integers(0, 25),
        st.sampled_from([100, 100, 100, 90, 80]),  # heavy tie mass
    )

    @given(raw=st.sets(row, min_size=0, max_size=18), page=st.integers(1, 5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(raw, page):
        rows = [(g, f"s{i:02d}", q) for g, i, q in raw]
        scored = spark.createDataFrame(
            rows or [("g", "s", 0)],
            "graph_iri string, subject string, score_q long",
        )
        if not rows:
            scored = scored.limit(0)
        seen = _walk_pages(spark, scored, page_size=page)
        want = [
            (g, s)
            for q, g, s in sorted(
                ((q, g, s) for g, s, q in rows),
                key=lambda t: (-t[0], t[1], t[2]),
            )
        ]
        assert seen == want

    prop()
