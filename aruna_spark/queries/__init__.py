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
# window on a cycle. Round 14 (VERDICT r13 Next #1): the nine r14-new
# queries lead (the realm-quota seed replay, the alias-aware enriched
# crate rewrite, the portable source descriptor, the archive layout
# inspection, the URL canonicalization dedup, the rank-order n-gram
# language ID, the export report rows, the import plan, the
# boilerplate-line dedup), then the
# eight r8-stale
# rows the r13 cut deferred, then
# 33 of the 46 r9-stale rows (SPARQL suite, search_groups, registry
# listings/projections/lifecycle, corpus_mix, s3_user_access,
# s3_replication_validate). The 8 deferred r9 rows named in the block
# comment below lead the r15 window together with the r10 blocks.
# Every query outside the window is selfcheck-verified at round close
# (scripts/selfcheck.py at sf0.01).
PRIORITY_PREFIXES = (
    # --- r14-new (first driver checks take precedence, r9 convention)
    "crdt_realm_quota_replay",
    "archive_rewrite_enriched",
    "staging_source_descriptor",
    "archive_layout_inspect",
    "urlstats_canonicalize",
    "textstats_ngram_langid",
    "export_report_rows",
    "archive_import_plan",
    "textstats_boilerplate_lines",
    # --- the 8 r8-stale rows deferred from the r13 window (VERDICT
    # r13 Next #1 leads)
    "stream_watch_no_retroactive",
    "corpus_retention_funnel",
    "storage_routing_resolve",
    "staging_snapshot_materialize",
    "staging_sync_drift",
    "staging_list_connectors",
    "staging_refresh_sweep",
    "registry_resolve_users",
    # --- r9-stale blocks (33 of 46; the 13 deferred rows — the SPARQL
    # slice/page + GRAPH variants sparql_distinct, sparql_reduced,
    # sparql_offset_page, sparql_nested_slice, sparql_order_limit,
    # sparql_graph_var, sparql_graph_scoped, plus
    # matq_graph_prune_drain, export_plan_paths,
    # replication_location_summary, registry_doc_count_live,
    # corpus_mix_sample, and registry_subject_closure (rows whose
    # planes stay represented in this window) — lead the r15 window
    # together with the r10 blocks: hashpaths, reclaim probes,
    # sync_outbox, doc lifecycle/update remainder)
    "sparql_ask",
    "sparql_bgp_filter",
    "sparql_distributed_ask",
    "sparql_filter_builtins",
    "sparql_fts_bgp_mix",
    "sparql_fts_score",
    "sparql_group_agg",
    "sparql_group_concat",
    "sparql_having",
    "sparql_lateral_topk_per_group",
    "sparql_minus",
    "sparql_not_exists",
    "sparql_optional",
    "sparql_path_inverse",
    "sparql_path_negated",
    "sparql_path_plus",
    "sparql_path_seq_closure",
    "sparql_path_star",
    "sparql_skip_tombstoned",
    "sparql_star_describe",
    "sparql_string_funcs",
    "sparql_sum_sample",
    "sparql_union",
    "sparql_values_bind",
    "search_groups_page",
    "corpus_mix_plan",
    "registry_delete_lifecycle",
    "registry_listing_live",
    "registry_update_batch",
    "s3_replication_validate",
    "s3_user_access_gate",
    "s3_user_access_list",
    "s3_user_access_revoke",
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
        urlstats,
        usage,
        user_access,
        users,
    )

    _reorder()
