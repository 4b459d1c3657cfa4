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
# window on a cycle. Round 6 (VERDICT r5 Next #7) leads with every
# query whose implementation or schema CHANGED this round (the folded
# collapsed near-dup plan, the registry created_at_us column, the
# generalized S3 resolver, the extracted watch summary, the scoped
# unified search), then rotates in the 68-query backlog the r5 window
# did not cover — the full sparql algebra family (freshest hard signal
# r3), relational, the streaming rest, multimodal, crdt. The backlog's
# tail that still misses the ~50 cut (listing_v2, backlinks, drs,
# autoindex, textstats pairs — all unchanged this round and green at
# their last driver check) rotates to the FRONT in r7.
PRIORITY_PREFIXES = (
    # changed this round (exact names, front of the window)
    "similarity_neardup_scaled",
    "similarity_ivf_scaled_topk",
    "rel_asof_latest_click",
    "rel_range_window_join",
    "rel_sessionize",
    "sample_",
    "decontam_",
    "registry_event_replay",
    "registry_incremental_merge",
    "registry_listing_recent",
    "registry_listing_created",
    "s3_put_upsert",
    "s3_get_object",
    "s3_head_object",
    "s3_multipart_complete",
    "stream_watch_matches",
    "search_unified",
    # the r5-unchecked backlog, oldest hard signal first: sparql algebra
    "sparql_optional",
    "sparql_union",
    "sparql_group_agg",
    "sparql_order_limit",
    "sparql_not_exists",
    "sparql_minus",
    "sparql_values_bind",
    "sparql_distinct",
    "sparql_having",
    "sparql_group_concat",
    "sparql_path_plus",
    "sparql_path_seq_closure",
    "sparql_nested_slice",
    "sparql_ask",
    "sparql_graph_scoped",
    "sparql_lateral_topk_per_group",
    "sparql_fts_score",
    "sparql_distributed_ask",
    "sparql_sum_sample",
    "sparql_offset_page",
    "sparql_path_inverse",
    "sparql_path_star",
    "sparql_path_negated",
    "sparql_filter_builtins",
    "sparql_graph_var",
    "sparql_reduced",
    "sparql_string_funcs",
    "sparql_path_zero_or_one",
    "sparql_arith_if",
    # relational family (r5-unchecked)
    "rel_",
    # streaming rest (r5-unchecked; watch_matches already leads)
    "stream_",
    # multimodal + crdt representative (r5-unchecked)
    "multimodal_",
    "crdt_clock_relation",
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
        crdt_suite,
        decontam,
        drs,
        dedup,
        ingest_suite,
        listing,
        multimodal,
        permissions,
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
