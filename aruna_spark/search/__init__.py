"""Full-text search plane: postings, BM25 scoring, merged pagination.

Mirrors the reference's search capabilities (per-node Tantivy over four
schema.org literal fields + quantized-score merged pagination —
``operations/src/metadata/search_enrichment.rs:3-8``,
``operations/src/metadata/search_cursor.rs:243-397``) as DataFrame
aggregations over a postings table.
"""

from aruna_spark.search.bm25 import (
    bm25_scores,
    build_doc_lengths,
    build_field_literals,
    build_postings,
    merge_search_hits,
)

__all__ = [
    "bm25_scores",
    "build_doc_lengths",
    "build_field_literals",
    "build_postings",
    "merge_search_hits",
]
