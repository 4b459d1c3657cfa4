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
# window on a cycle. Round 7 (VERDICT r6 Next #8) leads with every
# query whose plan CHANGED this round — the delete-marker object plane
# (new s3_delete_marker + marker-aware listing/staging/permission/usage
# views and the S3 resolver), the new multipart lifecycle + CopyObject
# + versions-keyset queries, the inbox prune, the checksum-bearing DRS
# lookup, and the de-broadcast decontamination — then rotates in the
# r6-unchecked backlog front-to-back: the families whose last DRIVER
# check is oldest (backlinks/autoindex/textstats/corpus queued at this
# tail since r6, then dedup/similarity/search). The remainder (search
# enrichment, multimodal, crdt, ingest, rel/stream rest, sparql trio)
# rotates to the FRONT in r8; every one of them was selfcheck-green in
# the r6 review.
PRIORITY_PREFIXES = (
    # changed this round (front of the window)
    "s3_delete_marker",
    "s3_copy_object",
    "s3_list_parts_page",
    "s3_upload_part_replace",
    "s3_list_uploads_page",
    "s3_abort_multipart",
    "s3_upload_part_copy",
    "s3_object_attributes",
    "s3_multipart_complete",
    "s3_put_upsert",
    "s3_get_object",
    "s3_head_object",
    "listing_",  # v2 root/leaf/flat + versions + versions_page2
    "staging_list_",
    "perm_visible_summary",
    "usage_",
    "stream_inbox_prune",
    "stream_notifications_page",
    "stream_mark_read",
    "drs_object_lookup",
    "decontam_",
    # r6-unchecked backlog, least-recently-driver-checked first
    "backlinks_",
    "autoindex_parse_entries",
    "textstats_",
    "corpus_",
    "dedup_",
    "similarity_topk_bruteforce",
    "similarity_lsh_topk",
    "similarity_neardup_pairs",
    "similarity_ivf_topk",
    "similarity_ivf_trained_topk",
    "similarity_ivf_pq_topk",
    "search_bm25_topk",
    "search_bm25_page2",
    # tail: rotates to r8's front if past the ~50 cut
    "search_",
    "multimodal_",
    "crdt_",
    "ingest_jsonld_typing",
    "rocrate_",
    "archive_import_rewrite",
    "graph_snapshot_orphan_skip",
    "rel_",
    "stream_",
    "registry_",
    "distributed_select_merge",
    "sparql_bgp_filter",
    "sparql_star_describe",
    "sparql_fts_bgp_mix",
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
        buckets,
        checksums_suite,
        crdt_suite,
        decontam,
        drs,
        dedup,
        ingest_suite,
        listing,
        multimodal,
        permissions,
        references,
        registry,
        relational,
        s3_lifecycle,
        s3_multipart,
        s3_suite,
        sampling,
        search,
        staging_suite,
        similarity,
        sparql_suite,
        streaming_suite,
        textstats,
        usage,
    )

    _reorder()
