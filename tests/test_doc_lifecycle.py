"""Metadata-document deletion lifecycle: tombstone processing, prune
drain, backoff ladder, drain-to-empty conservation, and the visibility
cascade (delete_metadata_document.rs + metadata/prune_queue.rs +
stats.rs:18-35)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.doc_lifecycle import (
    NOW_MS,
    PRUNE_BATCH_SIZE,
    QUEUE_RETRY_BASE_MS,
    QUEUE_RETRY_MAX_MS,
    deleted_graphs,
    deleted_lifecycle,
    drain_tick,
    live_documents,
    live_triples,
    matq_graph_prune_drain,
    prune_jobs,
    registry_delete_lifecycle,
    registry_doc_count_live,
    tombstone_stream,
)


def _backoff(attempts: int) -> int:
    """queue_backoff.rs:8-12 — independent python form."""
    return min(QUEUE_RETRY_BASE_MS << min(attempts, 7), QUEUE_RETRY_MAX_MS)


# ------------------------------------------------ tombstone processing
def test_delete_lifecycle_dedups_and_skips_non_deleted(spark, sf_dir):
    rows = registry_delete_lifecycle(spark, sf_dir).collect()
    by_doc = {r.document_id: r for r in rows}
    # exactly the deleted set, one row per graph (seen_graphs dedup)
    assert set(by_doc) == {d for d in range(500) if d % 3 == 1}
    # duplicate tombstones collapse; due is the FIRST arrival
    dups = [r for r in rows if r.n_tombstones == 2]
    assert dups and all(r.document_id % 9 == 4 for r in dups)
    assert all(
        by_doc[d].n_tombstones == 2
        for d in by_doc
        if d % 9 == 4
    )
    assert all(r.due_at_ms == 1000 + r.document_id for r in rows)
    # non-deleted probe records never enqueue (is_deleted gate)
    assert not any(d % 30 == 2 for d in by_doc)


def test_tombstone_stream_has_all_three_lanes(spark, sf_dir):
    """Fixture coprimality guard: every branch populated at sf0.001."""
    lanes = dict(
        tombstone_stream(spark, sf_dir)
        .groupBy("status")
        .count()
        .collect()
    )
    assert lanes["live"] > 0 and lanes["deleted"] > lanes["live"]


# -------------------------------------------------------- drain tick
@pytest.fixture(scope="module")
def drain_rows(spark, sf_dir):
    return matq_graph_prune_drain(spark, sf_dir).collect()


def test_drain_covers_every_outcome_lane(drain_rows):
    outcomes = {r.outcome for r in drain_rows}
    assert outcomes == {"dropped", "pruned", "rescheduled"}
    # dup jobs grouped: at least one graph contributed two jobs
    assert any(r.jobs_in_group == 2 for r in drain_rows)
    # the page is exactly the batch cap, counted in JOBS not groups
    assert sum(r.jobs_in_group for r in drain_rows) == PRUNE_BATCH_SIZE
    assert all(r.has_more_due for r in drain_rows)
    assert all(r.next_due_after_ms == 0 for r in drain_rows)


def test_drain_outcome_assignment(drain_rows):
    for r in drain_rows:
        if r.document_id % 3 != 1:
            assert r.outcome == "dropped"  # no deleted lifecycle
        elif r.document_id % 11 == 5:
            assert r.outcome == "rescheduled"
        else:
            assert r.outcome == "pruned"


def test_reschedule_uses_queue_backoff_ladder(drain_rows):
    res = [r for r in drain_rows if r.outcome == "rescheduled"]
    assert res
    for r in res:
        assert r.next_attempts == r.attempts + 1
        assert r.next_due_at_ms == NOW_MS + _backoff(r.attempts + 1)
    done = [r for r in drain_rows if r.outcome != "rescheduled"]
    assert all(
        r.next_attempts is None and r.next_due_at_ms is None for r in done
    )


def test_drain_representative_is_max_attempts_then_due(spark, sf_dir):
    """representative_job (prune_queue.rs:398-407): within a graph
    group the surviving job is the max by (attempts, due_at_ms)."""
    rows = matq_graph_prune_drain(spark, sf_dir).collect()
    dup_groups = [r for r in rows if r.jobs_in_group == 2]
    assert dup_groups
    for r in dup_groups:
        # the dup lane writes attempts = base+1 — the representative
        assert r.attempts == r.document_id % 4 + 1


def _page_keys(jobs, now_ms, batch):
    """Independent python computation of the due page (key order =
    due_at_ms BE bytes then hash of graph — prune-job key scheme,
    storage_entries.rs:270-275)."""
    due = [j for j in jobs if j["due_at_ms"] <= now_ms]
    due.sort(
        key=lambda j: (
            j["due_at_ms"],
            hashlib.sha256(j["graph_iri"].encode()).hexdigest(),
        )
    )
    return due[:batch]


def test_drain_to_empty_conservation(spark, sf_dir):
    """Iterate drain ticks until the queue is empty: every deleted
    graph is pruned exactly once, every stray job is dropped, nothing
    is lost, and failing graphs retry through the backoff ladder until
    the failure clears (fail while attempts < 3)."""
    lifecycle = deleted_lifecycle(spark, sf_dir)
    deleted_set = {r.graph_iri for r in lifecycle.collect()}
    jobs = [r.asDict() for r in prune_jobs(spark, sf_dir).collect()]
    stray_graphs = {
        j["graph_iri"] for j in jobs if j["graph_iri"] not in deleted_set
    }

    schema = (
        "graph_iri string, document_id long, due_at_ms long, attempts int"
    )
    pruned, dropped = set(), set()
    now = NOW_MS
    for _ in range(40):
        if not jobs:
            break
        page = _page_keys(jobs, now, PRUNE_BATCH_SIZE)
        if not page:
            now = min(j["due_at_ms"] for j in jobs)
            continue
        df = spark.createDataFrame(
            [
                (j["graph_iri"], j["document_id"], j["due_at_ms"],
                 j["attempts"])
                for j in jobs
            ],
            schema,
        )
        out = drain_tick(
            df, lifecycle, now, fail=F.col("attempts") < 3
        ).collect()
        by_graph = {r.graph_iri: r for r in out}
        page_ids = {id(j) for j in page}
        page_graphs = {j["graph_iri"] for j in page}
        assert set(by_graph) == page_graphs
        next_jobs = [j for j in jobs if id(j) not in page_ids]
        for r in out:
            if r.outcome == "pruned":
                # a graph may prune more than once when its duplicate
                # jobs straddle a page boundary — prune_graph_if_deleted
                # is idempotent (prune_queue.rs:379-386), so re-prunes
                # are harmless; they can only happen for dup-lane graphs
                # or retried failures.
                if r.graph_iri in pruned:
                    assert r.document_id % 11 in (4, 5)
                pruned.add(r.graph_iri)
            elif r.outcome == "dropped":
                dropped.add(r.graph_iri)
            else:
                next_jobs.append(
                    {
                        "graph_iri": r.graph_iri,
                        "document_id": r.document_id,
                        "due_at_ms": r.next_due_at_ms,
                        "attempts": r.next_attempts,
                    }
                )
        jobs = next_jobs
        # jump the clock past the earliest remaining due plus the full
        # backoff ceiling, so matured jobs batch up instead of trickling
        # one per tick (the reference timer would fire per next_due; the
        # batching is the same, just fewer simulated ticks)
        now = max(
            now + 1,
            min((j["due_at_ms"] for j in jobs), default=now)
            + QUEUE_RETRY_MAX_MS,
        )
    assert not jobs, "queue did not drain to empty"
    assert pruned == deleted_set
    assert dropped == stray_graphs


def test_terminal_tick_mints_next_due_from_future(spark, sf_dir):
    """When the due set fits one batch, has_more_due is false and the
    re-arm interval comes from the earliest future job
    (prune_queue.rs:241-249) — the envelope branch the registered
    fixture can't reach (its due set overflows the batch)."""
    early_now = 1_050  # only a handful of jobs due; future jobs exist
    out = drain_tick(
        prune_jobs(spark, sf_dir), deleted_lifecycle(spark, sf_dir),
        early_now,
    ).collect()
    assert out and all(not r.has_more_due for r in out)
    jobs = prune_jobs(spark, sf_dir).filter(
        F.col("due_at_ms") > early_now
    )
    expected = jobs.agg(F.min("due_at_ms")).first()[0] - early_now
    assert all(r.next_due_after_ms == expected for r in out)


# ------------------------------------------------- visibility cascade
def test_doc_count_excludes_deleted(spark, sf_dir):
    row = registry_doc_count_live(spark, sf_dir).first()
    assert row.n_deleted > 0, "exclusion branch must be alive"
    assert row.n_total == row.n_live + row.n_deleted
    direct = live_documents(spark, sf_dir).count()
    assert row.n_live == direct


def test_live_documents_is_the_anti_join(spark, sf_dir):
    live = {r.doc_id for r in live_documents(spark, sf_dir).collect()}
    assert live and all(d % 3 != 1 for d in live)


def test_sparql_and_backlinks_skip_tombstoned_graphs(spark, sf_dir):
    dead = {r.graph_iri for r in deleted_graphs(spark, sf_dir).collect()}
    lt = live_triples(spark, sf_dir)
    assert lt.filter(F.col("graph_iri").isin(list(dead)[:20])).count() == 0
    # collection graphs carry no lifecycle record and stay visible
    assert (
        lt.filter(F.col("graph_iri").startswith(
            "https://w3id.org/aruna/coll"
        )).count()
        > 0
    )
    # a deleted document no longer appears as a referrer (IRI index
    # rows pruned) but live references TO any IRI remain
    from aruna_spark.store import triples_store

    full = triples_store(spark, sf_dir)
    dead_subject = "urn:aruna:doc:1"  # doc 1 ≡ 1 mod 3 → deleted
    assert full.filter(F.col("subject") == dead_subject).count() > 0
    assert lt.filter(F.col("subject") == dead_subject).count() == 0


def test_search_plane_excludes_deleted_docs(spark, sf_dir):
    """BM25 postings rebuilt over the pruned triples never score a
    tombstoned document (the incremental index applies the same
    tombstone deletes the stream maintains)."""
    from aruna_spark.search.bm25 import (
        bm25_scores,
        build_field_literals,
        build_postings,
        tokenize,
    )

    postings = build_postings(
        build_field_literals(live_triples(spark, sf_dir))
    )
    hits = bm25_scores(postings, tokenize("doc")).collect()
    dead = {r.graph_iri for r in deleted_graphs(spark, sf_dir).collect()}
    assert hits and not any(r.graph_iri in dead for r in hits)


def test_listing_live_skips_tombstoned(spark, sf_dir):
    """list_metadata_documents.rs: the group listing collects the
    deleted graph set first and skips tombstoned rows."""
    from aruna_spark.queries.doc_lifecycle import (
        LISTING_GROUP,
        registry_listing_live,
    )

    rows = registry_listing_live(spark, sf_dir).collect()
    assert rows
    ids = [r.document_id for r in rows]
    assert ids == sorted(ids)
    assert all(d % 7 == LISTING_GROUP for d in ids)
    assert all(d % 3 != 1 for d in ids), "tombstoned doc leaked"
    # the exclusion is non-vacuous: the group HAS tombstoned members
    from aruna_spark.catalog import load_table
    from pyspark.sql import functions as F

    tombed = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % 7 == LISTING_GROUP)
            & (F.col("doc_id") % 3 == 1)
        )
        .count()
    )
    assert tombed > 0


# ------------------------------------------------- document serve gate
def test_serve_gate_cursor_exact_withhold(spark, sf_dir):
    """get_metadata_document.rs:108-111,157-165 — only a status for
    EXACTLY the record's cursor withholds; no status and stale-cursor
    statuses both serve; tombstones reject before the status rung."""
    from aruna_spark.queries import REGISTRY

    fn, _ = REGISTRY["doc_serve_gate"]
    rows = {r.doc_id: r for r in fn(spark, sf_dir).collect()}
    for i in (-1, -2, -3):
        assert rows[i].verdict == "not_found_missing"
    for did, r in rows.items():
        if did < 0:
            continue
        if did % 3 == 1:
            assert r.verdict == "not_found_deleted"
            assert r.graph_iri is None
        elif did % 5 == 1:
            assert r.verdict == "withheld_stale"
            assert r.status_lane == "current_pending"
        elif did % 5 == 3:
            # a PENDING status for an older cursor must NOT withhold
            assert r.verdict == "served"
            assert r.status_lane == "stale_cursor"
            assert r.graph_iri is not None
        elif did % 5 == 2:
            assert r.verdict == "served"
            assert r.status_lane == "current_materialized"
        else:
            assert r.verdict == "served" and r.status_lane == "none"
