"""One user-facing handle over the engine's query planes.

The reference exposes its capabilities as a handful of API route
families (SURVEY §3): the realm-wide SPARQL endpoint
(``api/src/routes/metadata.rs:108``), the paginated full-text search
routes (``routes/search.rs:271`` / ``metadata.rs:106``), the
S3-compatible catalog listing (``s3/s3_service.rs:1317``), plus
RO-Crate export (``metadata.rs:950``) and JSON-LD ingest. A user of the
reference talks to THOSE, not to the operator internals — so this
module is the switch-over surface: :class:`Engine` binds one
``(spark, data dir)`` pair and exposes each route family as a method,
composed from the same governed building blocks the oracle-checked
registry queries use (``SparqlEngine`` with its limits/cache/scope
envelope, the maintained BM25 index + signed keyset cursors, the
ListObjectsV2 delimiter/continuation semantics, the round-trip-exact
JSON-LD codec).

The route-shaped glue here is deliberately thin; everything
semantics-bearing lives in (and is tested through) the modules it
delegates to. ``tests/test_api.py`` drives each route end-to-end,
including the cursor walk invariants the reference's route tests pin
(``api/src/routes/metadata.rs:3943-4600``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.search.cursor import (
    DEFAULT_PAGE_SIZE,
    MAX_PAGE_SIZE,
    MAX_PAGINATION_DEPTH,
    NodeKey,
    SearchCursor,
    SearchWatermark,
    query_fingerprint,
)

# route aliases for the shared cursor-plane constants (search_cursor.rs:13-14)
DEFAULT_PAGE = DEFAULT_PAGE_SIZE
MAX_PAGE = MAX_PAGE_SIZE


@dataclass
class SearchResultPage:
    """One served search page: hit rows (already bounded to the page
    envelope) + the signed continuation cursor (None on the last page).
    Distinct from :class:`aruna_spark.search.cursor.SearchPage` (the
    multi-node merge-plane page) — this is the single-relation route
    envelope."""

    hits: list
    next_cursor: str | None


class Engine:
    """The switch-over facade: reference route families as methods.

    ``visible_graphs`` (optional one-column ``graph_iri`` DataFrame) is
    the caller's authorization scope: the SPARQL plane enforces it
    exactly as :class:`~aruna_spark.sparql.engine.SparqlEngine`
    documents, and the GRAPH-keyed routes (``search``,
    ``unified_search``'s documents section, ``backlinks``) semi-join
    their graph/triple relations against it. The object-plane routes
    (``list_objects``, ``drs_object``) are NOT graph-scoped — in the
    reference they sit behind the S3/DRS authorization plane (bucket
    policies), which is part of the excluded control plane.

    ``node_key`` signs search cursors; when omitted a FRESH RANDOM key
    is generated for this engine instance (the reference's node
    identity is its iroh keypair). A fixed or publicly-derivable key
    would let clients forge cursors — including resetting the
    depth-cap resume count — so never default to a constant seed;
    multi-instance deployments that must honor each other's cursors
    pass a shared provisioned key."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        visible_graphs: DataFrame | None = None,
        node_key: NodeKey | None = None,
    ):
        import os

        self.spark = spark
        self.sf_dir = sf_dir
        self.visible_graphs = visible_graphs
        self.node_key = node_key or NodeKey(os.urandom(32))
        self._sparql_engine = None

    def _scoped_by_graph(self, df: DataFrame) -> DataFrame:
        """Gate a relation carrying ``graph_iri`` by the caller's
        visibility scope (left-semi against the small per-caller scope
        table — it broadcasts; the reference's lazy visibility filter,
        handle.rs:4657-4700)."""
        if self.visible_graphs is None:
            return df
        return df.join(
            F.broadcast(self.visible_graphs.select("graph_iri").distinct()),
            "graph_iri",
            "left_semi",
        )

    # ---------------------------------------------------------- SPARQL route
    @property
    def sparql_engine(self):
        if self._sparql_engine is None:
            from aruna_spark.sparql.engine import SparqlEngine
            from aruna_spark.store import triples_store

            from aruna_spark.store import bm25_scored

            # the facade's triples ARE the full store, so fts: patterns
            # must resolve against the materialized shard-pruned index,
            # never a per-query postings rebuild (engine.py:291-297);
            # scope still applies: the resolver's hits are graph-gated
            self._sparql_engine = SparqlEngine(
                self.spark,
                triples_store(self.spark, self.sf_dir),
                visible_graphs=self.visible_graphs,
                fts_resolver=lambda q: self._scoped_by_graph(
                    bm25_scored(self.spark, self.sf_dir, q)
                ).select("subject", "score_q"),
            )
        return self._sparql_engine

    def sparql(self, text: str, **kwargs) -> list:
        """POST /metadata/sparql/query: run under the full governance
        envelope (64 KiB query / 10 k rows / 8 MiB result / deadline
        with job-group cancellation / scope-keyed cache) and return the
        collected rows, as the route does."""
        return self.sparql_engine.execute(text, **kwargs)

    def sparql_df(self, text: str) -> DataFrame:
        """The lazy form: compile only (row cap in the plan), for
        callers composing further Spark transformations."""
        return self.sparql_engine.query(text)

    # ---------------------------------------------------------- search route
    def search(
        self,
        query: str,
        page_size: int | None = None,
        cursor: str | None = None,
    ) -> SearchResultPage:
        """GET /search: one page of BM25 hits in the quantized-score
        merge order, with a SIGNED keyset continuation cursor.

        Page N+1 resumes via the keyset predicate on the
        ``(score_q desc, graph_iri, subject)`` sort key — tie-bucket
        non-skipping included (search_cursor.rs:740-782). A cursor is
        rejected on tamper, unknown signer, or a query/fingerprint
        mismatch, exactly like the route
        (``metadata.rs:3943-4600`` harness semantics). Pagination depth
        caps at 1,000 hits (search_cursor.rs:15, rs:386-397): the
        cursor's resume entry carries the consumed count, and the walk
        truncates — no next cursor — at the cap."""
        from aruna_spark.search.bm25 import keyset_after
        from aruna_spark.store import bm25_scored

        size = DEFAULT_PAGE if page_size is None else int(page_size)
        if size < 1:
            raise ValueError("page size must be positive")
        size = min(size, MAX_PAGE)
        fingerprint = query_fingerprint(query)
        # bm25_scored validates the query (min chars / tokenizable);
        # the scored relation is gated by the caller's graph scope
        scored = self._scoped_by_graph(
            bm25_scored(self.spark, self.sf_dir, query)
        )
        consumed = 0
        if cursor is not None:
            c = SearchCursor.decode(cursor, [self.node_key])
            c.require_fingerprint(fingerprint)
            consumed = c.resume_positions().get(self.node_key.node_id, 0)
            wm = self.spark.createDataFrame(
                [
                    (
                        c.watermark.score_q,
                        c.watermark.graph_iri,
                        c.watermark.subject_iri,
                    )
                ],
                "w_score_q long, w_graph string, w_subject string",
            )
            scored = keyset_after(scored, wm)
        size = min(size, MAX_PAGINATION_DEPTH - consumed)
        if size <= 0:
            return SearchResultPage(hits=[], next_cursor=None)  # depth cap
        hits = (
            scored.orderBy(F.desc("score_q"), "graph_iri", "subject")
            .limit(size)
            .collect()  # the page envelope (<=100 rows) — route-bounded
        )
        consumed += len(hits)
        next_cursor = None
        if len(hits) == size and consumed < MAX_PAGINATION_DEPTH:
            last = hits[-1]
            next_cursor = SearchCursor.new_signed(
                fingerprint,
                SearchWatermark(
                    int(last.score_q), last.graph_iri, last.subject
                ),
                resume=[(self.node_key.node_id, consumed)],
                signer=self.node_key,
            ).encode()
        return SearchResultPage(hits=hits, next_cursor=next_cursor)

    # --------------------------------------------------------- listing route
    def list_objects(
        self,
        prefix: str = "",
        delimiter: str | None = None,
        start_after: str = "",
        after_common_prefix: str = "",
        max_keys: int = 1000,
    ) -> DataFrame:
        """S3 ListObjectsV2 over the catalog's latest object versions:
        prefix/start_after pushdown, delimiter common-prefix roll-up,
        (last_key, last_common_prefix) continuation semantics
        (``list_objects_v2.rs:60-74``). Returns the page relation
        ``(entry, kind, n_keys, total_size)``; the caller's
        continuation token is the last row's entry per kind."""
        from aruna_spark.ops.listing import list_objects_v2
        from aruna_spark.sources.objects import load_object_versions

        latest = load_object_versions(self.spark, self.sf_dir).filter(
            F.col("is_latest")
        )
        return list_objects_v2(
            latest,
            prefix=prefix,
            delimiter=delimiter,
            start_after=start_after,
            after_common_prefix=after_common_prefix,
            max_keys=max_keys,
        )

    # ------------------------------------------------- smaller route family
    def unified_search(self, query: str) -> DataFrame:
        """The unified 4-section search (documents FTS-scored, buckets/
        groups/users substring-matched, each section independently
        limited — the reference's concurrent fan-out endpoint). Returns
        the (section, rank, key, display, score_q) relation."""
        from aruna_spark.queries.search import unified_sections

        if self.visible_graphs is not None:
            raise NotImplementedError(
                "unified_search is realm-wide; per-caller graph scoping "
                "applies only to its documents section — use search() "
                "for a scoped walk"
            )
        return unified_sections(self.spark, self.sf_dir, query)

    def metadata_listing(
        self,
        order: str = "recent",
        limit: int | None = None,
        anonymous: bool = False,
    ) -> DataFrame:
        """The metadata listing route (api.rs:345-489): the registry
        projection in one of its two orders, with the reference's limit
        rules applied (default 50, clamp 1,000 — 100 for anonymous
        callers, non-positive rejected)."""
        from aruna_spark.ops.listing import resolve_listing_limit
        from aruna_spark.queries.registry import _registry

        n = resolve_listing_limit(limit, anonymous=anonymous)
        reg = _registry(self.spark, self.sf_dir)
        if order == "recent":
            reg = reg.orderBy(F.desc("updated_at_us"), F.desc("user_id"))
        elif order == "created":
            reg = reg.orderBy("user_id")
        else:
            raise ValueError(f"unknown listing order {order!r}")
        return reg.limit(n)

    def path_lookup(self, path: str):
        """The path lookup route (api.rs:489-632): resolve one path to
        its deterministic claim winner (+ ordered conflicts), or None
        when nothing claims it. Claims are filtered BY PATH before the
        ranking window — a point lookup, never a realm-wide rank."""
        from aruna_spark.queries.registry import claim_winners, demo_claims

        rows = claim_winners(
            demo_claims(self.spark, self.sf_dir).filter(
                F.col("path") == path
            )
        ).collect()
        return rows[0] if rows else None

    def usage_counters(self, by_group: bool = True) -> DataFrame:
        """The usage-counter plane (six counters): per-group rows or the
        global roll-up — the same relation the rebuild job full-scans."""
        from aruna_spark.queries import REGISTRY, load_all

        load_all()
        name = "usage_counters_by_group" if by_group else "usage_counters_global"
        return REGISTRY[name][0](self.spark, self.sf_dir)

    def backlinks(self, target: str) -> DataFrame:
        """references_metadata (api.rs:1300-1404): subjects pointing at
        ``target`` via any IRI-valued property, name-enriched."""
        from aruna_spark.ingest.doc_triples import load_triples
        from aruna_spark.queries.backlinks import references_of

        return references_of(
            self._scoped_by_graph(load_triples(self.spark, self.sf_dir)),
            target,
        )

    def drs_object(self, object_id: str):
        """GET /ga4gh/drs/v1/objects/{id} (drs.rs:52-61): resolve one
        content-address W3ID to its DrsObjectResponse row, or None when
        the blob is unknown (the route's 404)."""
        from aruna_spark.queries.drs import (
            W3ID_DATA_PREFIX,
            blob_index,
            drs_response,
        )
        from aruna_spark.sources.objects import load_object_versions

        if not object_id.startswith(W3ID_DATA_PREFIX):
            raise ValueError(
                f"DRS object id must start with {W3ID_DATA_PREFIX}"
            )
        blob_hash = object_id[len(W3ID_DATA_PREFIX) :]
        requested = blob_index(
            load_object_versions(self.spark, self.sf_dir)
        ).filter(F.col("blob_hash") == blob_hash)
        rows = drs_response(requested).collect()
        return rows[0] if rows else None

    # ------------------------------------------------------ ingest / export
    def ingest_jsonld(self, docs: DataFrame) -> DataFrame:
        """JSON-LD documents -> RDF triples (the reference's write-path
        projection, typing rules included)."""
        from aruna_spark.ingest.jsonld import ingest_jsonld

        return ingest_jsonld(docs)

    def export_rocrate(self, triples: DataFrame | None = None) -> DataFrame:
        """Per-graph RO-Crate JSON-LD export (round-trip-exact with
        :meth:`ingest_jsonld`); defaults to the engine's triples."""
        from aruna_spark.ingest.jsonld import export_rocrate
        from aruna_spark.store import triples_store

        if triples is None:
            triples = triples_store(self.spark, self.sf_dir)
        return export_rocrate(triples)
