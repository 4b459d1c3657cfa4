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
# window on a cycle. Round 9 (VERDICT r8 Next #6) leads with the 20
# queries whose plans are NEW this round (the metadata-document
# deletion lifecycle + prune drain + visibility cascade, the S3
# user-access plane, CORS preflight matching, replication-config
# validation, and the transitive subject closure — first-time driver
# checks take precedence; likewise the update-batch classifier, the
# queue-lag sample and the group search), then rotates in the
# r8-unchecked backlog
# front-to-back: the whole SPARQL family (28, last driver checks
# r4-r6) and the search-enrichment five, with rel_ starting at the
# cut. The remaining r8-unchecked families (stream watch/debounce,
# registry, multimodal, crdt, ingest/rocrate/archive/graph, sampling,
# distributed, similarity, dedup) queue at the tail for r10's front;
# the 50 r8-window queries drop to the very end (checked most
# recently). ALL 198 registered queries are selfcheck-green this
# round (scripts/selfcheck.py full run at sf0.01).
PRIORITY_PREFIXES = (
    # new this round (front of the window)
    "registry_delete_lifecycle",
    "matq_graph_prune_drain",
    "registry_doc_count_live",
    "registry_listing_live",
    "backlinks_live_grouped",
    "sparql_skip_tombstoned",
    "s3_user_access_list",
    "s3_user_access_gate",
    "s3_user_access_revoke",
    "s3_cors_preflight_match",
    "s3_replication_validate",
    "registry_subject_closure",
    "registry_update_batch",
    "queue_lag_sample",
    "search_groups_page",
    "export_plan_paths",
    "textstats_pii_scan",
    "replication_location_summary",
    "corpus_mix_plan",
    "corpus_mix_sample",
    # r8-unchecked backlog, least-recently-driver-checked first:
    # the whole SPARQL family (last driver checks r4-r6)
    "sparql_",
    # search enrichment/discovery five (last checked r5)
    "search_substring_customers",
    "search_conformsto_scoped",
    "search_unified",
    "search_hits_enriched",
    "search_describe_hits",
    # rel_ straddles the ~50 cut; the rest queue for r10's front
    "rel_",
    "stream_",
    "registry_",
    "multimodal_",
    "crdt_",
    "ingest_jsonld_typing",
    "rocrate_",
    "archive_import_rewrite",
    "graph_snapshot_orphan_skip",
    "sample_",
    "distributed_select_merge",
    "search_",
    "similarity_",
    "dedup_",
    "decontam_",
    "textstats_",
    "corpus_",
    "backlinks_",
    "autoindex_parse_entries",
    "listing_v2_flat",
    "listing_versions",
    "rel_keyset_page",
    "usage_counters_by_group",
    "usage_counters_global",
    "usage_quota_gate",
    "usage_snapshot_realms",
    "drs_object_lookup",
    "perm_visible_summary",
    "staging_list_recursive",
    "staging_list_level",
    "s3_multipart",
    "s3_put_upsert",
    "s3_versioned_get",
    # r8-window queries (most recently checked) fall through to the
    # registration-order tail automatically
)


def _reorder() -> None:
    """Rebuild REGISTRY so priority families register first.

    The driver checks a bounded prefix of the registry; round 2's sample
    cut off before the SPARQL/search/similarity/usage/streaming families
    (VERDICT.md 'What's wrong' #3). Insertion order is the contract.
    """
    ordered: dict[str, tuple[SparkQuery, str | None]] = {}
    for prefix in PRIORITY_PREFIXES:
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
        export_plan,
        dedup,
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
        permissions,
        placement,
        principals,
        queue_lag,
        reclaim,
        references,
        replication,
        routing,
        registry,
        relational,
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
        textstats,
        usage,
        user_access,
    )

    _reorder()
