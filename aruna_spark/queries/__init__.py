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
# window on a cycle. Round 11 (VERDICT r10 Next #1): queries whose
# plans are NEW or CHANGED this round lead — the replication-plane
# kernels (placement status/reconcile, outbox drain plan, apply
# decision, native-reference serve), SemDeDup, the onboarding-secret
# ladders, role CRUD, realm placement mutations, handle ranges, user
# resolve/update, plus the earlier-session group routing + connector
# guard + five-queue lag + pack plan + fixed-64 demo + winnowing +
# char-LM + embedding-decontam + shard manifest — then the 13
# queued-stale r5/r6 rows the r10 verdict pinned, then as much of the
# stalest r7 S3 family as fits. The cut at ~50 leaves the remaining
# r7 rows (the rest of the S3/listing family, similarity_neardup_
# pairs, similarity_topk_bruteforce, textstats_*, usage_*,
# corpus_rollup/approx, decontam_ngram, backlinks_*,
# stream_inbox_prune/mark_read/notifications_page) to lead r12's
# window; every query outside the window is selfcheck-verified at
# round close (scripts/selfcheck.py at sf0.01).
PRIORITY_PREFIXES = (
    # new or changed this round (front of the window — first-time
    # driver checks take precedence, per the r9 convention)
    "sync_placement_status",
    "sync_placement_reconcile",
    "dedup_semantic_cells",
    "onboarding_secret_listing",
    "onboarding_reserve_validate",
    "onboarding_consume_validate",
    "role_mutation_validate",
    "realm_placement_mutation_validate",
    "handle_range_directory",
    "handle_allocation_walk",
    "user_resolve_safe",
    "user_update_validate",
    "realm_nodes_info",
    "egress_screen",
    "sync_outbox_drain_plan",
    "sync_apply_decision",
    "native_reference_serve",
    "group_routing_inputs",
    "group_routing_put_validate",
    "connector_reference_guard",
    "queue_lag_sample",
    "corpus_pack_plan",
    "similarity_ivf_fixed64_demo",
    "dedup_duplicate_spans",
    "textstats_char_lm_quality",
    "decontam_embedding_overlap",
    "corpus_shard_manifest",
    # queued-stale from the r10 cut (last driver-checked r5/r6)
    "rel_asof_latest_click",
    "rel_pricing_summary",
    "rel_range_window_join",
    "rel_region_revenue",
    "rel_sessionize",
    "rel_shipping_priority",
    "sample_split_summary",
    "sample_stratified_summary",
    "search_unified",
    # (similarity_neardup_collapsed from the r10 verdict's stale list
    # is not a registry name: the r6 rework folded the collapse INTO
    # similarity_neardup_scaled — see COVERAGE.md)
    "similarity_neardup_scaled",
    "sparql_arith_if",
    "sparql_path_zero_or_one",
    "stream_watch_matches",
    # last driver-checked r7: the S3 data plane first, then the
    # dedup/similarity block
    "autoindex_parse_entries",
    "listing_v2_flat",
    "listing_v2_leaf_page",
    "listing_v2_root",
    "listing_versions",
    "listing_versions_page2",
    "s3_abort_multipart",
    "s3_get_object",
    "s3_head_object",
    "s3_list_parts_page",
    "s3_list_uploads_page",
    "s3_multipart_complete",
    "s3_object_attributes",
    "s3_put_upsert",
    "s3_upload_part_replace",
    "drs_object_lookup",
    "staging_list_level",
    "staging_list_recursive",
    "perm_visible_summary",
    "dedup_clusters",
    "dedup_clusters_scaled",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_minhash_scaled",
    "dedup_ngram_jaccard",
    "dedup_ngram_scaled",
    "dedup_simhash_buckets",
    "dedup_simhash_scaled",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
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
        backlinks,
        bindings,
        buckets,
        checksums_suite,
        cors,
        crdt_suite,
        decontam,
        doc_lifecycle,
        doc_update,
        drs,
        egress,
        export_plan,
        dedup,
        handles,
        hashpaths,
        hidden,
        inbox_placement,
        ingest_suite,
        jobs,
        listing,
        location_summary,
        matqueue,
        multimodal,
        notify_routing,
        onboarding,
        permissions,
        placement,
        principals,
        queue_lag,
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
        usage,
        user_access,
        users,
    )

    _reorder()
