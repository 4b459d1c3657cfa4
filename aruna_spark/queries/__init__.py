"""Query registry: every operator exposed to the driver's correctness gate.

``REGISTRY`` maps query name → (spark_fn, oracle_sql | None). The driver
runs the Spark side and the DuckDB oracle side-by-side at sf0.01 and
hash-compares. Modules register via :func:`register`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco

# Families the driver's bounded correctness sample (~first 50 registry
# entries, registration order) must always cover. Prefixes listed first
# win; everything else follows in module-load order. ROTATED each round
# (VERDICT r3 'What's wrong' #3) so every family re-enters the driver
# window on a cycle. Round 15 (VERDICT r14 Next #1): the r15-new
# queries lead (the export entity-identity recognition, the export
# candidate-resolution ladder, the report embedding, the crate
# File-id validation envelope,
# the autoindex dialect parse, the BPE merge candidates), then the
# 13 r9-stale rows the r13/r14 cuts deferred, then 31 of the 47
# r10-stale rows. The 16 DEFERRED r10 rows — the multimodal block
# (multimodal_features / _frame_sample / _png_roundtrip /
# _resize_plan / _wav_roundtrip), the relational block (rel_agg_kinds,
# rel_events_hourly, rel_exists_semi_anti, rel_keyset_page,
# rel_latest_order_per_customer, rel_setops), the RO-Crate export
# pages (rocrate_export_page, rocrate_export_summary),
# sync_relationship_list, sync_mirror_repair_drain, and
# sync_legacy_migration — lead the r16
# window together with the r11 blocks (S3 object plane, keyset
# listings, onboarding, sync placement, rel_* remainder,
# handle walks, user/role validation). Every query outside the window
# is selfcheck-verified at round close (scripts/selfcheck.py at
# sf0.01).
PRIORITY_PREFIXES = (
    # --- r15-new (first driver checks take precedence, r9 convention)
    "export_entity_identity",
    "export_resolve_candidates",
    "export_report_embed",
    "archive_validate_file_ids",
    "autoindex_dialect_entries",
    "corpus_bpe_merge_candidates",
    # --- the 13 r9-stale rows deferred from the r14 window (VERDICT
    # r14 Next #1 leads)
    "sparql_distinct",
    "sparql_reduced",
    "sparql_offset_page",
    "sparql_nested_slice",
    "sparql_order_limit",
    "sparql_graph_var",
    "sparql_graph_scoped",
    "matq_graph_prune_drain",
    "export_plan_paths",
    "replication_location_summary",
    "registry_doc_count_live",
    "corpus_mix_sample",
    "registry_subject_closure",
    # --- r10-stale rows (34 of 47; the 13 deferred rows named in the
    # header comment lead r16)
    "archive_import_rewrite",
    "distributed_select_merge",
    "graph_snapshot_orphan_skip",
    "ingest_jsonld_typing",
    "registry_doc_count",
    "registry_event_replay",
    "registry_incremental_merge",
    "registry_listing_created",
    "registry_listing_recent",
    "registry_path_claims",
    "registry_snapshot_asof",
    "s3_bucket_routing_config",
    "search_bm25_page2",
    "search_bm25_topk",
    "search_conformsto_scoped",
    "search_describe_hits",
    "search_hits_enriched",
    "search_perfield_rank_shift",
    "search_substring_customers",
    "similarity_ivf_pq_topk",
    "similarity_ivf_sqrt_topk",
    "similarity_ivf_trained_topk",
    "staging_refresh_drain",
    "stream_dashboard_epoch",
    "stream_debounce_sessions",
    "stream_debounce_timer",
    "stream_debounce_windows",
    "stream_lww_registry",
    "stream_sliding_window_counts",
    "stream_unread_counts",
    "sync_create_validate",
)


def _reorder() -> None:
    """Rebuild REGISTRY so priority families register first.

    The driver checks a bounded prefix of the registry; round 2's sample
    cut off before the SPARQL/search/similarity/usage/streaming families
    (VERDICT.md 'What's wrong' #3). Insertion order is the contract.
    """
    ordered: dict[str, tuple[SparkQuery, str | None]] = {}
    for prefix in PRIORITY_PREFIXES:
        if prefix in REGISTRY:
            # exact name — don't drag same-prefixed siblings (e.g.
            # registry_doc_count_live) into the bounded window slot
            ordered.setdefault(prefix, REGISTRY[prefix])
            continue
        for name in list(REGISTRY):
            if name.startswith(prefix) and name not in ordered:
                ordered[name] = REGISTRY[name]
    for name in list(REGISTRY):
        if name not in ordered:
            ordered[name] = REGISTRY[name]
    REGISTRY.clear()
    REGISTRY.update(ordered)


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from aruna_spark.queries import (  # noqa: F401
        backend_removal,
        backlinks,
        bindings,
        blob_holders,
        blob_repl_queue,
        buckets,
        checksums_suite,
        cors,
        crdt_suite,
        create_group,
        decontam,
        doc_lifecycle,
        doc_placement,
        doc_update,
        drs,
        egress,
        export_plan,
        dedup,
        handles,
        hashpaths,
        hidden,
        importance,
        inbox_placement,
        ingest_suite,
        jobs,
        listing,
        location_summary,
        matqueue,
        multimodal,
        node_info,
        notify_routing,
        onboarding,
        permissions,
        placement,
        principals,
        queue_lag,
        quota,
        realm_info,
        reclaim,
        references,
        replication,
        routing,
        registry,
        relational,
        roles,
        s3_lifecycle,
        s3_multipart,
        s3_suite,
        sampling,
        search,
        shard_verify,
        staging_suite,
        similarity,
        submit,
        sparql_suite,
        streaming_suite,
        sync_outbox,
        sync_suite,
        textstats,
        tokenizer,
        urlstats,
        usage,
        user_access,
        users,
    )

    _reorder()
