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
    (``list_objects``, ``list_object_versions``, ``put_object``,
    ``get_object``, ``head_object``, ``complete_multipart``,
    ``staging_list``, ``drs_object``) are NOT graph-scoped — in the
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
            from aruna_spark.store import bm25_scored, triples_store

            # the facade's triples ARE the full store, so an UNSCOPED
            # engine resolves fts: patterns against the materialized
            # shard-pruned index, never a per-query postings rebuild
            # (engine.py:291-297). A SCOPED engine keeps the engine's
            # default DERIVED resolver: the stored index's BM25 stats
            # (IDF, doc lengths) are corpus-global, so scores computed
            # from it would observably reflect INVISIBLE documents'
            # statistics even after graph-gating the hits; the derived
            # resolver scores only the visible slice, which is the
            # scoped semantics the engine documents.
            fts = None
            if self.visible_graphs is None:
                fts = lambda q: bm25_scored(  # noqa: E731
                    self.spark, self.sf_dir, q
                ).select("subject", "score_q")
            self._sparql_engine = SparqlEngine(
                self.spark,
                triples_store(self.spark, self.sf_dir),
                visible_graphs=self.visible_graphs,
                fts_resolver=fts,
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
        bucket: str = "corpus",
    ) -> DataFrame:
        """S3 ListObjectsV2 over one bucket's latest object versions:
        prefix/start_after pushdown, delimiter common-prefix roll-up,
        (last_key, last_common_prefix) continuation semantics
        (``list_objects_v2.rs:60-74``). Returns the page relation
        ``(entry, kind, n_keys, total_size)``; the caller's
        continuation token is the last row's entry per kind. The
        ``staging`` bucket lists its by-reference heads from cache
        (list_objects_v2.rs:511-529)."""
        from aruna_spark.ops.listing import list_objects_v2

        # deleted heads are hidden (list_objects_v2.rs:454,510 skip
        # BlobVersionState::Deleted); reference heads are live rows
        from aruna_spark.sources.objects import live_latest

        latest = live_latest(self._versions()).filter(
            F.col("bucket") == bucket
        )
        return list_objects_v2(
            latest,
            prefix=prefix,
            delimiter=delimiter,
            start_after=start_after,
            after_common_prefix=after_common_prefix,
            max_keys=max_keys,
        )

    # ------------------------------------------------- object-plane routes
    # The reference dispatches the whole S3 family through one service
    # (api/src/s3/s3_service.rs:1521,2203,2491); these routes are that
    # dispatch surface over the oracle-checked object-plane logic. They
    # are NOT graph-scoped — in the reference they sit behind the
    # S3 authorization plane (bucket policies), part of the excluded
    # control plane (same note as list_objects/drs_object).

    def _versions(self) -> DataFrame:
        """The full version catalog: materialized + delete-marker rows
        plus by-reference rows (blob.rs:829-843 — all three
        BlobVersionState arms) projected into one VERSION_COLS relation.
        Reference rows answer with their CACHED size/etag and a NULL
        blob_hash, so the shared resolver serves them unchanged."""
        from aruna_spark.sources.objects import (
            load_object_versions,
            load_reference_versions,
            reference_as_versions,
        )

        return load_object_versions(self.spark, self.sf_dir).unionByName(
            reference_as_versions(
                load_reference_versions(self.spark, self.sf_dir)
            )
        )

    def _references(self) -> DataFrame:
        from aruna_spark.sources.objects import load_reference_versions

        return load_reference_versions(self.spark, self.sf_dir)

    def put_object(
        self, key: str, size: int, blob_hash: str, bucket: str = "corpus"
    ):
        """PutObject (put_object.rs state machine as set algebra): apply
        one put to the versions table and return the NEW head version
        record — version_idx assigned past the key's prior max, etag
        derived, ``deduplicated`` set when the blob_hash was already
        stored (CheckHashLookup hit -> no new blob). The response
        carries the full one-pass checksum family
        (blob/src/hash.rs:10-77): md5/sha256/sha1/crc32."""
        from aruna_spark.queries.s3_suite import put_objects
        from aruna_spark.sources.objects import with_checksums

        puts = self.spark.createDataFrame(
            [(bucket, key, int(size), blob_hash)],
            "bucket string, key string, size long, blob_hash string",
        )
        # point shape: the version-history side prunes to the touched
        # key; the content-address dedup check stays GLOBAL (a blob put
        # under any key dedups) — put_objects semi-prunes it to the
        # batch's hashes internally
        versions = self._versions()
        mine = versions.filter(
            (F.col("bucket") == bucket) & (F.col("key") == key)
        )
        rows = (
            with_checksums(put_objects(mine, puts, stored_hashes=versions))
            .filter(
                (F.col("bucket") == bucket)
                & (F.col("key") == key)
                & F.col("is_latest")
            )
            .collect()
        )
        return rows[0]

    def _resolve_one(
        self,
        bucket: str,
        key: str,
        version_id: str | None,
        if_match: str | None,
        if_none_match: str | None,
        range_start: int | None,
        range_end: int | None,
        range_suffix: int | None,
    ):
        from aruna_spark.queries.s3_suite import resolve_requests

        if range_suffix is not None and range_start is not None:
            raise ValueError("range is StartEnd or Suffix, not both")
        if range_start is not None and range_end is None:
            raise ValueError("StartEnd range needs range_end")
        req = self.spark.createDataFrame(
            [
                (
                    bucket,
                    key,
                    version_id,
                    if_match,
                    if_none_match,
                    range_start,
                    range_end,
                    range_suffix,
                )
            ],
            "bucket string, key string, want_version_id string, "
            "if_match string, if_none_match string, range_start long, "
            "range_end long, range_suffix long",
        )
        # point lookup: prune the versions scan to the requested key
        # (pushed to the parquet reader) — resolution only needs that
        # key's version history, and a 404 is an empty pruned scan
        mine = self._versions().filter(
            (F.col("bucket") == bucket) & (F.col("key") == key)
        )
        return resolve_requests(mine, req).collect()[0]

    def get_object(
        self,
        key: str,
        bucket: str = "corpus",
        version_id: str | None = None,
        if_match: str | None = None,
        if_none_match: str | None = None,
        range_start: int | None = None,
        range_end: int | None = None,
        range_suffix: int | None = None,
    ):
        """GetObject (get_object.rs:85-160): latest or explicit version,
        If-Match / If-None-Match conditionals, StartEnd / Suffix byte
        ranges. Returns the resolution row — ``status`` carries the S3
        semantics (200/206/304/412/416/404)."""
        return self._resolve_one(
            bucket,
            key,
            version_id,
            if_match,
            if_none_match,
            range_start,
            range_end,
            range_suffix,
        )

    def head_object(
        self,
        key: str,
        bucket: str = "corpus",
        version_id: str | None = None,
        if_match: str | None = None,
        if_none_match: str | None = None,
    ):
        """HeadObject: GetObject's resolution minus the body — no range
        parameters, and the row carries no content_range. A by-reference
        head additionally surfaces its source binding + cache envelope
        (head_object.rs:276-290: source_metadata Some, last_refresh
        Some, location/version_created_at None)."""
        row = self._resolve_one(
            bucket, key, version_id, if_match, if_none_match, None, None, None
        )
        d = row.asDict()
        d.pop("content_range", None)
        ref = (
            self._references()
            .filter((F.col("bucket") == bucket) & (F.col("key") == key))
            .collect()
        )
        if ref:
            r = ref[0]
            d.update(
                referenced=True,
                source_kind=r.source_kind,
                source_path=r.source_path,
                connector_id=r.connector_id,
                content_type=r.cached_content_type,
                last_refresh=r.last_refresh,
            )
        else:
            d["referenced"] = False
        return d

    def refresh_reference_metadata(
        self,
        key: str,
        refreshed_at: int,
        bucket: str = "staging",
        new_length: int | None = None,
        new_content_type: str | None = None,
        new_etag: str | None = None,
    ):
        """One queued refresh applied to a reference head
        (refresh_reference_metadata.rs:299-372): the freshly-headed
        source metadata lands iff ``refreshed_at`` is strictly newer
        than the row's ``last_refresh``; a missing or non-reference
        version is a silent skip (rs:345-349,374-376 return Ok without
        writing). When the metadata arguments are omitted, the source
        is re-headed from the staging connector listing (the truth
        relation). Returns the post-refresh row plus ``applied``."""
        from aruna_spark.sources.objects import (
            apply_metadata_refresh,
            load_source_truth,
        )

        mine = self._references().filter(
            (F.col("bucket") == bucket) & (F.col("key") == key)
        )
        rows = mine.collect()
        if not rows:
            return {"applied": False, "reason": "not-a-reference"}
        cur = rows[0]
        if new_length is None:
            truth = (
                load_source_truth(self.spark, self.sf_dir)
                .filter(
                    (F.col("source_kind") == cur.source_kind)
                    & (F.col("source_path") == cur.source_path)
                )
                .collect()
            )
            if not truth:
                return {"applied": False, "reason": "source-missing"}
            new_length = truth[0].truth_length
            new_etag = truth[0].truth_etag
            new_content_type = cur.cached_content_type
        refreshes = self.spark.createDataFrame(
            [
                (
                    bucket,
                    key,
                    int(refreshed_at),
                    int(new_length),
                    new_content_type or cur.cached_content_type,
                    new_etag,
                )
            ],
            "bucket string, key string, refreshed_at long, new_length long, "
            "new_content_type string, new_etag string",
        )
        out = apply_metadata_refresh(mine, refreshes).collect()[0]
        d = out.asDict()
        d["applied"] = d.pop("refreshed")
        return d

    def staging_refresh_sweep(self) -> DataFrame:
        """The full refresh sweep as a batch job — every reference head
        joined against the staging connector listing, stale guard
        applied (the drain loop of refresh_reference_metadata.rs, minus
        the queue bookkeeping Spark doesn't need)."""
        from aruna_spark.queries.references import staging_refresh_sweep

        return staging_refresh_sweep(self.spark, self.sf_dir)

    def complete_multipart(self, parts: DataFrame) -> DataFrame:
        """CompleteMultipartUpload over a ``(upload_id, part_number,
        part_size, part_etag)`` manifest: the multipart etag fold +
        part-contiguity validation (s3_service.rs:2203)."""
        from aruna_spark.queries.s3_suite import complete_multipart

        return complete_multipart(parts)

    # ------------------------------------------- multipart lifecycle
    def _uploads(self) -> DataFrame:
        from aruna_spark.queries.s3_multipart import load_uploads

        return load_uploads(self.spark, self.sf_dir)

    def _parts(self) -> DataFrame:
        from aruna_spark.queries.s3_multipart import (
            effective_parts,
            load_part_events,
        )

        return effective_parts(load_part_events(self.spark, self.sf_dir))

    def create_multipart_upload(self, key: str, bucket: str = "corpus"):
        """CreateMultipartUpload (create_multipart_upload.rs): open an
        upload record on the key — the id is minted past the current
        sequence (the reference mints a ULID) and the upload is listable
        but NEVER part of the object listings until complete."""
        row = self._uploads().agg(F.max("created_seq").alias("mx")).collect()[0]
        seq = (row.mx or 0) + 1
        return {
            "bucket": bucket,
            "key": key,
            "upload_id": f"mpu-{seq}",
            "created_seq": seq,
        }

    def upload_part(self, upload_id: str, part_number: int, part_size: int):
        """UploadPart (upload_part.rs): write one part; re-uploading an
        existing part number REPLACES it (upload_part.rs:368 — the prior
        part's blob is deleted), surfaced as ``replaced``. The upload
        record is validated FIRST — an unknown upload_id is 404
        NoSuchUpload (upload_part.rs:155), mirroring
        abort_multipart_upload / upload_part_copy."""
        from aruna_spark.queries.s3_multipart import load_part_events

        known = (
            self._uploads()
            .filter(F.col("upload_id") == upload_id)
            .limit(1)
            .count()
        )
        if not known:
            return {
                "upload_id": upload_id,
                "part_number": int(part_number),
                "status": 404,
                "error": "NoSuchUpload",
            }
        prior = (
            load_part_events(self.spark, self.sf_dir)
            .filter(
                (F.col("upload_id") == upload_id)
                & (F.col("part_number") == part_number)
            )
            .agg(F.max("seq").alias("mx"))
            .collect()[0]
        )
        seq = (prior.mx or 0) + 1
        import hashlib

        etag = hashlib.md5(
            f"{upload_id}:{part_number}:{seq}".encode()
        ).hexdigest()
        return {
            "upload_id": upload_id,
            "part_number": int(part_number),
            "status": 200,
            "part_size": int(part_size),
            "part_etag": etag,
            "replaced": seq > 1,
        }

    def list_parts(
        self,
        upload_id: str,
        part_number_marker: int | None = None,
        max_parts: int = 1_000,
    ):
        """ListParts (list_parts.rs:186-198): one page of the upload's
        effective parts after the marker, with the reference's
        ``is_truncated`` / ``next_part_number_marker`` envelope."""
        from aruna_spark.queries.s3_multipart import list_parts

        rows = list_parts(
            self._parts(),
            upload_id,
            part_number_marker=part_number_marker,
            max_parts=int(max_parts) + 1,
        ).collect()
        truncated = len(rows) > max_parts
        rows = rows[: int(max_parts)]
        # max_parts=0: a truncated-but-empty page still resumes — fall
        # back to the input marker (or 0), list_parts.rs:192-198
        next_marker = None
        if truncated:
            next_marker = (
                rows[-1].part_number if rows else (part_number_marker or 0)
            )
        return {
            "parts": rows,
            "is_truncated": truncated,
            "next_part_number_marker": next_marker,
        }

    def list_multipart_uploads(
        self,
        prefix: str = "",
        key_marker: str | None = None,
        upload_id_marker: str | None = None,
        max_uploads: int = 1_000,
    ) -> DataFrame:
        """ListMultipartUploads (list_multipart_uploads.rs): in-progress
        uploads under the prefix in (key, upload_id) order with keyset
        continuation."""
        from aruna_spark.queries.s3_multipart import list_multipart_uploads

        return list_multipart_uploads(
            self._uploads(),
            prefix=prefix,
            key_marker=key_marker,
            upload_id_marker=upload_id_marker,
            max_uploads=int(max_uploads),
        )

    def abort_multipart_upload(self, upload_id: str):
        """AbortMultipartUpload (abort_multipart_upload.rs:150): 204 and
        the upload + all its parts are gone; 404 NoSuchUpload for an
        unknown id."""
        from aruna_spark.queries.s3_multipart import abort_results

        aborts = self.spark.createDataFrame(
            [(upload_id,)], "upload_id string"
        )
        mine = self._uploads().filter(F.col("upload_id") == upload_id)
        return abort_results(mine, aborts).collect()[0]

    def get_object_attributes(
        self,
        key: str,
        bucket: str = "corpus",
        version_id: str | None = None,
        include_parts: bool = False,
    ):
        """GetObjectAttributes (get_object_attributes.rs): the metadata
        envelope — etag/size/sha256/checksum_type and, when requested
        and the object is composite, the sorted part list. A
        by-reference version answers from its cache
        (get_object_attributes.rs:244-253: source_metadata Some,
        location and version_created_at None, no parts)."""
        import re as _re

        from aruna_spark.queries.s3_suite import (
            object_attributes,
            object_parts,
        )

        ref = (
            self._references()
            .filter((F.col("bucket") == bucket) & (F.col("key") == key))
            .collect()
        )
        if ref:
            r = ref[0]
            if version_id is not None and version_id != r.version_id:
                return {"attributes": None, "parts": [], "status": 404}
            return {
                "attributes": {
                    "bucket": bucket,
                    "key": key,
                    "version_id": r.version_id,
                    "etag": r.cached_etag,
                    "size": r.cached_length,
                    "content_type": r.cached_content_type,
                    "referenced": True,
                    "source_kind": r.source_kind,
                    "source_path": r.source_path,
                    "connector_id": r.connector_id,
                    "last_refresh": r.last_refresh,
                    "location": None,
                    "version_created_at": None,
                },
                "parts": [],
                "status": 200,
            }

        m = _re.search(r"doc-(\d+)\.txt$", key)
        doc_id = int(m.group(1)) if m else -1
        req = self.spark.createDataFrame(
            [(bucket, key, doc_id, version_id, bool(include_parts))],
            "bucket string, key string, doc_id long, "
            "want_version_id string, include_parts boolean",
        )
        mine = self._versions().filter(
            (F.col("bucket") == bucket) & (F.col("key") == key)
        )
        row = object_attributes(mine, req).collect()[0]
        parts = (
            [
                (p.part_number, p.part_size)
                for p in object_parts(mine, req)
                .orderBy("part_number")
                .collect()
            ]
            if include_parts and row.n_parts
            else []
        )
        out = {"attributes": row, "parts": parts}
        # the stored CRC members (computed once at ingest, hash.rs:10-77)
        # + the algorithm inventory the envelope advertises
        if row.status == 200 and row.object_size is not None:
            from aruna_spark.ops.checksums import crc32c, crc64_nvme

            content = f"blob:{row.object_size}".encode()
            out["checksum_crc32c"] = crc32c(content)
            out["checksum_crc64_nvme"] = f"{crc64_nvme(content):016x}"
            out["checksum_algorithms"] = [
                "MD5", "SHA1", "SHA256", "CRC32", "CRC32C", "CRC64NVME",
            ]
        return out

    def upload_part_copy(
        self,
        upload_id: str,
        part_number: int,
        src_key: str,
        src_bucket: str = "corpus",
        source_version_id: str | None = None,
        if_match: str | None = None,
        if_none_match: str | None = None,
        range_start: int | None = None,
        range_end: int | None = None,
    ):
        """UploadPartCopy (upload_part_copy.rs): copy a byte range of an
        existing object into an open upload as a part — copy-source
        conditions fail 412 (incl. the if-none-match 304 remap), unknown
        uploads 404, replace semantics surfaced as ``replaced``."""
        from aruna_spark.queries.s3_multipart import (
            load_part_events,
            upload_part_copy,
        )

        copies = self.spark.createDataFrame(
            [
                (
                    upload_id,
                    int(part_number),
                    src_bucket,
                    src_key,
                    source_version_id,
                    if_match,
                    if_none_match,
                    range_start,
                    range_end,
                    None,
                )
            ],
            "upload_id string, part_number int, bucket string, key string, "
            "want_version_id string, if_match string, if_none_match string, "
            "range_start long, range_end long, range_suffix long",
        )
        mine = self._versions().filter(
            (F.col("bucket") == src_bucket) & (F.col("key") == src_key)
        )
        return upload_part_copy(
            mine,
            self._uploads().filter(F.col("upload_id") == upload_id),
            load_part_events(self.spark, self.sf_dir).filter(
                F.col("upload_id") == upload_id
            ),
            copies,
        ).collect()[0]

    def list_buckets(
        self,
        group_id: str = "grp-main",
        prefix: str = "",
        continuation_token: str | None = None,
        max_buckets: int = 10_000,
    ):
        """ListBuckets (list_buckets.rs:36-62): the caller's group's
        buckets in name order under the prefix, keyset continuation
        token = last returned name, default page 10,000."""
        from aruna_spark.queries.buckets import (
            bucket_rollups,
            list_buckets,
            load_buckets,
        )

        rows = list_buckets(
            load_buckets(self.spark, self.sf_dir),
            bucket_rollups(self.spark, self.sf_dir),
            group_id=group_id,
            prefix=prefix,
            continuation_token=continuation_token,
            max_buckets=int(max_buckets),
        ).collect()
        return {
            "buckets": rows,
            "continuation_token": rows[0].next_token if rows else None,
        }

    def create_bucket(self, name: str, group_id: str = "grp-main"):
        """CreateBucket (create_bucket.rs): 409 BucketAlreadyExists when
        the name is taken (rs:123), else the minted BucketInfo record —
        created_at one past the current max (the reference stamps
        SystemTime; ticks here)."""
        from aruna_spark.queries.buckets import load_buckets

        buckets = load_buckets(self.spark, self.sf_dir)
        if buckets.filter(F.col("name") == name).limit(1).count():
            return {"status": 409, "error": "BucketAlreadyExists"}
        mx = buckets.agg(F.max("created_at").alias("m")).collect()[0].m
        return {
            "status": 200,
            "name": name,
            "group_id": group_id,
            "created_at": (mx or 0) + 1,
            "created_by": "admin",
        }

    def delete_bucket(self, name: str):
        """DeleteBucket (delete_bucket.rs): 404 for an unknown name, 409
        NotEmpty while ANY version row remains under the bucket
        (rs:50 — markers and references count: the history must be
        empty, not just the live heads), else 204."""
        from aruna_spark.queries.buckets import load_buckets

        known = (
            load_buckets(self.spark, self.sf_dir)
            .filter(F.col("name") == name)
            .limit(1)
            .count()
        )
        if not known:
            return {"status": 404, "error": "NoSuchBucket"}
        occupied = (
            self._versions()
            .filter(F.col("bucket") == name)
            .limit(1)
            .count()
        )
        if occupied:
            return {"status": 409, "error": "NotEmpty"}
        return {"status": 204, "name": name}

    def queue_lag(self) -> DataFrame:
        """One observability tick over every modeled durable queue
        (queue_lag.rs sample): depth / due / oldest-age with the
        per-keyspace semantics. The registered sample covers the
        reference's exact five keyspaces (queue_lag.rs:12-16) plus
        the repo-modeled extras under a ``repo:`` label (round 12),
        so the route is the registered query."""
        from aruna_spark.queries.queue_lag import queue_lag_sample

        return queue_lag_sample(self.spark, self.sf_dir)

    def location_summary(self) -> DataFrame:
        """Per object head: expected replica destinations and queued
        pending copies (replication/location_summary)."""
        from aruna_spark.queries.location_summary import (
            replication_location_summary,
        )

        return replication_location_summary(self.spark, self.sf_dir)

    def reclaim_sweep(self) -> DataFrame:
        """One blob-reclaim sweep over the modeled candidate queue
        against the post-delete catalog (blob/reclaim.rs) — per-
        candidate verdicts dropped/not_due/pinned/freed."""
        from aruna_spark.queries.reclaim import blob_reclaim_sweep

        return blob_reclaim_sweep(self.spark, self.sf_dir)

    def get_bucket_info(self, name: str):
        """GetBucketInfo (get_bucket_info.rs:59-90): point read of one
        bucket's record + live roll-ups; 404 NoSuchBucket when the name
        is not registered."""
        from aruna_spark.queries.buckets import bucket_rollups, load_buckets

        rows = (
            load_buckets(self.spark, self.sf_dir)
            .filter(F.col("name") == name)
            .join(
                F.broadcast(bucket_rollups(self.spark, self.sf_dir)),
                "name",
                "left",
            )
            .fillna(0, ["object_count", "version_count", "total_bytes"])
            .collect()
        )
        if not rows:
            return {"status": 404, "error": "NoSuchBucket"}
        d = rows[0].asDict()
        d["status"] = 200
        return d

    # ------------------------------------------------- bucket config routes
    def put_bucket_cors(self, bucket: str, rules: list[dict]):
        """PutBucketCors (operations/src/s3/bucket_cors.rs via the
        api/src/s3/cors.rs dto ladder): 404 for an unknown bucket, 400
        MalformedXML on any validation failure, else the normalized
        stored configuration."""
        from aruna_spark.ops.cors_rules import (
            CorsValidationError,
            validate_cors_config,
        )
        from aruna_spark.queries.buckets import load_buckets

        known = (
            load_buckets(self.spark, self.sf_dir)
            .filter(F.col("name") == bucket)
            .limit(1)
            .count()
        )
        if not known:
            return {"status": 404, "error": "NoSuchBucket"}
        try:
            normalized = validate_cors_config(rules)
        except CorsValidationError as e:
            return {"status": 400, "error": "MalformedXML", "message": str(e)}
        return {"status": 200, "bucket": bucket, "rules": normalized}

    def get_bucket_cors(self, bucket: str):
        """GetBucketCors: 404 NoSuchCORSConfiguration when the bucket
        has no stored rules (bucket_cors.rs GetBucketCorsOperation)."""
        from aruna_spark.queries.cors import CORS_CONFIGS

        rules = CORS_CONFIGS.get(bucket)
        if rules is None:
            return {"status": 404, "error": "NoSuchCORSConfiguration"}
        return {"status": 200, "bucket": bucket, "rules": rules}

    def cors_preflight(
        self,
        bucket: str,
        origin: str,
        method: str,
        requested_headers: str = "",
    ):
        """One preflight through the stored config (cors.rs
        match_preflight_rule / build_preflight_response): 403 without
        CORS headers when nothing matches, else the 204 envelope."""
        import re as _re

        from aruna_spark.ops.cors_rules import (
            parse_requested_headers,
            wildcard_to_regex,
        )
        from aruna_spark.queries.cors import CORS_CONFIGS

        headers = parse_requested_headers(requested_headers)
        for rule in CORS_CONFIGS.get(bucket, []):
            origin_ok = any(
                _re.search(wildcard_to_regex(o), origin)
                for o in rule["allowed_origins"]
            )
            method_ok = any(
                m == method.upper() for m in rule["allowed_methods"]
            )
            headers_ok = all(
                any(
                    _re.search(wildcard_to_regex(a, case_insensitive=True), h)
                    for a in rule["allowed_headers"]
                )
                for h in headers
            )
            if origin_ok and method_ok and headers_ok:
                return {
                    "status": 204,
                    "rule_id": rule["id"],
                    "allow_origin": "*"
                    if "*" in rule["allowed_origins"]
                    else origin,
                    "allow_methods": rule["allowed_methods"],
                    "allow_headers": headers or rule["allowed_headers"],
                    "expose_headers": rule["expose_headers"],
                    "max_age_seconds": rule["max_age_seconds"],
                }
        return {"status": 403}

    def put_bucket_replication(self, bucket: str, rules: list[dict]):
        """PutBucketReplication (s3_service.rs:3165-3272 validation
        only — the mirror transport is excluded orchestration): 400
        InvalidArgument naming the first failing rule, else the
        accepted target list. ``rules`` entries: {status,
        destination_arn, delete_markers_enabled}."""
        from aruna_spark.queries.replication import validate_replication

        rows = [
            (
                i,
                bucket,
                r.get("status", "Enabled"),
                r.get("destination_arn", ""),
                bool(r.get("delete_markers_enabled", False)),
            )
            for i, r in enumerate(rules)
        ]
        if not rows:
            # s3_service.rs:366-371 — an empty rule list yields zero
            # targets and the whole config is rejected.
            return {
                "status": 400,
                "error": "InvalidArgument",
                "reason": "no_enabled_target",
            }
        df = self.spark.createDataFrame(
            rows,
            "rule_id long, source_bucket string, status string,"
            " destination_arn string, delete_markers_enabled boolean",
        )
        out = validate_replication(df).collect()
        bad = [
            r for r in out
            if r.outcome not in ("accepted", "skipped_disabled")
        ]
        if bad:
            first = min(bad, key=lambda r: r.rule_id)
            return {
                "status": 400,
                "error": "InvalidArgument",
                "rule_id": first.rule_id,
                "reason": first.outcome,
            }
        targets = [
            {
                "node_id": r.target_node,
                "bucket": r.target_bucket,
                "replicate_delete_markers": r.replicate_delete_markers,
            }
            for r in sorted(out, key=lambda r: r.rule_id)
            if r.outcome == "accepted"
        ]
        if not targets:
            # All rules disabled/skipped — parse_replication_targets
            # rejects the config (s3_service.rs:366-371).
            return {
                "status": 400,
                "error": "InvalidArgument",
                "reason": "no_enabled_target",
            }
        return {"status": 200, "bucket": bucket, "targets": targets}

    # --------------------------------------------------- user-access routes
    def create_user_access(
        self,
        key_id: str,
        user_identity: str,
        group_id: str,
        expiry_ms: int | None = None,
        path_restrictions: list[dict] | None = None,
    ):
        """CreateUserAccess (create_user_access.rs:88-123): the key id
        IS the access key and must be 1..=128 alphanumeric chars
        (blob.rs:899-913); expiry defaults to +365 d. The secret is
        minted server-side and returned once."""
        import secrets as _secrets

        from aruna_spark.queries.user_access import (
            ACCESS_KEY_MAX_LEN,
            DEFAULT_TTL_MS,
            NOW_MS,
            SECRET_LEN,
        )

        if not key_id or len(key_id) > ACCESS_KEY_MAX_LEN:
            return {
                "status": 400,
                "error": "InvalidLength",
                "message": f"access key must be 1..={ACCESS_KEY_MAX_LEN}"
                " characters",
            }
        if not key_id.isalnum():
            return {
                "status": 400,
                "error": "FromStrError",
                "message": "access key must be alphanumeric",
            }
        alphabet = (
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
        )
        return {
            "status": 201,
            "access_key": key_id,
            "user_identity": user_identity,
            "group_id": group_id,
            "secret": "".join(
                _secrets.choice(alphabet) for _ in range(SECRET_LEN)
            ),
            "expiry_ms": expiry_ms
            if expiry_ms is not None
            else NOW_MS + DEFAULT_TTL_MS,
            "path_restrictions": path_restrictions,
            "revoked_at_ms": None,
        }

    def list_user_access(self, user_identity: str) -> DataFrame:
        """ListUserAccess (list_user_access.rs): the caller's
        credentials in key order with status columns."""
        from aruna_spark.queries.user_access import load_user_access

        return (
            load_user_access(self.spark, self.sf_dir)
            .filter(F.col("user_identity") == user_identity)
            .orderBy("access_key")
        )

    def revoke_user_access(self, access_key: str):
        """RevokeUserAccess (revoke_user_access.rs): 404 for an unknown
        key; idempotent — an already-revoked credential echoes its
        ORIGINAL revoked_at."""
        from aruna_spark.queries.user_access import (
            NOW_MS,
            load_user_access,
        )

        rows = (
            load_user_access(self.spark, self.sf_dir)
            .filter(F.col("access_key") == access_key)
            .collect()
        )
        if not rows:
            return {"status": 404, "error": "NotFound"}
        r = rows[0]
        return {
            "status": 200,
            "access_key": access_key,
            "revoked_at_ms": r.revoked_at_ms
            if r.revoked_at_ms is not None
            else NOW_MS,
            "already_revoked": r.revoked_at_ms is not None,
        }

    def get_user_access(self, access_key: str):
        """GetUserAccess (get_user_access.rs:42-90): a single keyed
        read — 404 NotFound when the keyspace has no record. The
        response is the REDACTED summary (credentials.rs:371-394,
        map_user_access_redacted): access key, group, expiry,
        revocation, derived status — the secret echoes exactly once,
        in the create response, and never again."""
        from aruna_spark.queries.user_access import (
            NOW_MS,
            load_user_access,
        )

        rows = (
            load_user_access(self.spark, self.sf_dir)
            .filter(F.col("access_key") == access_key)
            .collect()
        )
        if not rows:
            return {"status": 404, "error": "NotFound"}
        r = rows[0]
        if r.revoked_at_ms is not None:
            status = "revoked"
        elif r.expiry_ms <= NOW_MS:
            status = "expired"
        else:
            status = "active"
        return {
            "status": 200,
            "access_key": r.access_key,
            "user_identity": r.user_identity,
            "group_id": r.group_id,
            "expiry_ms": r.expiry_ms,
            "revoked_at_ms": r.revoked_at_ms,
            "credential_status": status,
        }

    # ------------------------------------------------- sync relationships
    def _load_sync(self, relationship_id: int):
        from aruna_spark.queries.sync_suite import load_sync_relationships

        rows = (
            load_sync_relationships(self.spark, self.sf_dir)
            .filter(F.col("relationship_id") == relationship_id)
            .collect()
        )
        return rows[0] if rows else None

    def get_sync(self, relationship_id: int, caller: str):
        """GetSync (sync.rs:460-480): load the relationship (Detached
        stubs 404 exactly like removed ones, sync.rs:901-907), enforce
        the creator, and return the detail envelope with the pending
        repair-job stats (load_job_stats). The fixture stores the
        OUTGOING keyspace; the Incoming fallback is the same read on
        the other direction."""
        from aruna_spark.queries.sync_suite import (
            NOW_MS,
            load_repair_queue,
        )

        r = self._load_sync(relationship_id)
        if r is None or r.state == "detached":
            return {"status": 404, "error": "NotFound"}
        if r.created_by != caller:
            return {"status": 403, "error": "Forbidden"}
        jobs = (
            load_repair_queue(self.spark, self.sf_dir)
            .filter(F.col("relationship_id") == relationship_id)
            .collect()
        )
        oldest = min((j.due_at_ms for j in jobs), default=None)
        return {
            "status": 200,
            "relationship_id": relationship_id,
            "state": r.state,
            "failure_reason": r.failure_reason,
            "mode": r.mode,
            "reference_handling": r.reference_handling,
            "replicate_deletes": r.replicate_deletes,
            "pending_jobs": len(jobs),
            "oldest_lag_ms": max(NOW_MS - oldest, 0)
            if oldest is not None
            else None,
            "versions_synced": r.versions_synced,
            "bytes_synced": r.bytes_synced,
        }

    def update_sync(
        self, relationship_id: int, caller: str, reference_handling: str
    ):
        """UpdateSync (sync.rs:498-565): only the reference handling
        is mutable; Reference mode requires Preserve (400); an
        unchanged handling is a NO-OP that stages nothing; a real
        change ORs the serving capability (set_reference_handling,
        sync_relationship.rs:79-82 — serving never turns OFF) and
        stages a mirror Reconcile."""
        r = self._load_sync(relationship_id)
        if r is None or r.state == "detached":
            return {"status": 404, "error": "NotFound"}
        if r.created_by != caller:
            return {"status": 403, "error": "Forbidden"}
        if reference_handling not in ("materialize", "preserve", "skip"):
            return {"status": 400, "error": "InvalidArgument"}
        if r.mode == "reference" and reference_handling != "preserve":
            return {
                "status": 400,
                "error": "InvalidArgument",
                "reason": "reference_mode_requires_preserve",
            }
        if r.reference_handling == reference_handling:
            return {
                "status": 200,
                "changed": False,
                "reference_handling": r.reference_handling,
                "reference_serving": r.reference_serving,
            }
        serving = r.reference_serving or reference_handling == "preserve"
        return {
            "status": 200,
            "changed": True,
            "reference_handling": reference_handling,
            "reference_serving": serving,
            "staged": "reconcile",
        }

    def run_sync(self, relationship_id: int, caller: str):
        """RunSync (sync.rs:579-611): queue a backfill; a FAILED
        relationship first resets to Enabled with its error and
        consecutive-failure counter cleared, then re-arms the mirror
        repair. 202 Accepted."""
        r = self._load_sync(relationship_id)
        if r is None or r.state == "detached":
            return {"status": 404, "error": "NotFound"}
        if r.created_by != caller:
            return {"status": 403, "error": "Forbidden"}
        reset = r.state == "failed"
        return {
            "status": 202,
            "relationship_id": relationship_id,
            "queued": True,
            "reset_from_failed": reset,
            "state": "enabled" if reset else r.state,
            "failure_reason": None if reset else r.failure_reason,
        }

    def delete_sync(self, relationship_id: int, caller: str):
        """DeleteSync (sync.rs:628-662): stage the mirror Delete; a
        relationship SERVING references detaches into a stub (the
        target retains Reference records that authorize reads through
        this id — remove_outgoing_relationship,
        sync_relationship.rs:119-142) while every other mode removes
        outright. 204 either way; synchronized data is retained."""
        r = self._load_sync(relationship_id)
        if r is None or r.state == "detached":
            return {"status": 404, "error": "NotFound"}
        if r.created_by != caller:
            return {"status": 403, "error": "Forbidden"}
        return {
            "status": 204,
            "staged": "delete",
            "detached_stub": bool(r.reference_serving),
        }

    # ------------------------------------------- bucket routing config
    def _bucket_group(self, bucket: str):
        from aruna_spark.queries.buckets import load_buckets

        rows = (
            load_buckets(self.spark, self.sf_dir)
            .filter(F.col("name") == bucket)
            .limit(1)
            .collect()
        )
        return rows[0].group_id if rows else None

    def put_bucket_routing(self, bucket: str, rules: list[dict]):
        """PutBucketRouting (bucket_routing.rs:49-170): 404 for an
        unknown bucket, then validate_tenant_rules over the rule list
        — the whole config rejects at the FIRST error (duplicate
        (exact, prefix), invalid class name, a node-backend target, a
        backend the bucket's group does not own); a stored config
        echoes the rules plus the ADVISORY target warnings
        (routing.rs:584-605). ``rules`` entries: {key_prefix, exact,
        target_kind (class|group_backend|node_backend), target}."""
        from aruna_spark.queries.routing import validate_routing_configs

        group_id = self._bucket_group(bucket)
        if group_id is None:
            return {"status": 404, "error": "NoSuchBucket"}
        if not rules:
            # an empty rule list clears the config — valid
            # (PutBucketRoutingOperation stores Vec::new())
            return {"status": 200, "bucket": bucket, "rules": [],
                    "warnings": []}
        df = self.spark.createDataFrame(
            [
                (
                    # validate against the fixture ownership scheme:
                    # bucket b<j>'s group owns gb-<j>-{0,1}
                    bucket,
                    i,
                    bool(r.get("exact", False)),
                    r.get("key_prefix", ""),
                    r.get("target_kind", "class"),
                    r.get("target", ""),
                )
                for i, r in enumerate(rules)
            ],
            "bucket string, rule_id long, exact boolean,"
            " key_prefix string, target_kind string, target string",
        )
        # the group's registered backends, modeled as gb-<group>-{0,1}
        owned = F.col("target").isin(
            f"gb-{group_id}-0", f"gb-{group_id}-1"
        )
        out = sorted(
            validate_routing_configs(df, owned=owned).collect(),
            key=lambda r: r.rule_id,
        )
        if out[0].config_outcome != "stored":
            bad = out[0]
            return {
                "status": 400,
                "error": "InvalidRules",
                "reason": bad.config_outcome,
                "rule_index": bad.config_reject_rule_id,
            }
        return {
            "status": 200,
            "bucket": bucket,
            "rules": [
                {
                    "key_prefix": r.key_prefix,
                    "exact": r.exact,
                    "target_kind": r.target_kind,
                    "target": r.target,
                }
                for r in out
            ],
            "warnings": [r.warning for r in out if r.warning],
        }

    def get_bucket_routing(self, bucket: str):
        """GetBucketRouting (bucket_routing.rs:262-300): 404 for an
        unknown bucket; a bucket with no stored config returns the
        empty rule list (the route's ``unwrap_or_default``)."""
        if self._bucket_group(bucket) is None:
            return {"status": 404, "error": "NoSuchBucket"}
        return {"status": 200, "bucket": bucket, "rules": [],
                "warnings": []}

    # --------------------------------------------- group routing record
    def _group_owned_backends(self, group_id: int) -> set[str]:
        """The ids the group's prefix scan collects: enabled AND the
        indexed record matches the group (group_routing.rs:108-115)."""
        from aruna_spark.queries.routing import load_group_backend_index

        rows = (
            load_group_backend_index(self.spark, self.sf_dir)
            .filter(
                (F.col("group_id") == group_id)
                & ~F.col("disabled")
                & (F.col("record_group_id") == F.col("group_id"))
            )
            .select("backend_id")
            .collect()
        )
        return {f"bk-{r.backend_id}" for r in rows}

    def put_group_routing(
        self,
        group_id: int,
        target: dict | None = None,
        updated_by: str = "user-1",
    ) -> dict:
        """PutGroupRouting (group_routing.rs:183-300): loads the
        group's inputs, then validate_tenant_target — a node-backend
        target is rejected outright, a group backend must be among
        the ids the group's own scan collected, a class name must
        match ``[a-z0-9-]{1,32}``. ``target = None`` CLEARS the
        default: still a write, so the record always records who
        decided last. ``target``: {"kind": class|group_backend|
        node_backend, "target": str}."""
        from aruna_spark.queries.routing import tenant_target_error

        if target is not None:
            kind = target.get("kind", "class")
            owned = (
                self._group_owned_backends(group_id)
                if kind == "group_backend"
                else frozenset()
            )
            err = tenant_target_error(
                kind, target.get("target", ""), owned
            )
            if err is not None:
                return {
                    "status": 400,
                    "error": "InvalidTarget",
                    "reason": err,
                }
        return {
            "status": 200,
            "group_id": group_id,
            "default_target": target,
            "updated_by": updated_by,
        }

    def get_group_routing(self, group_id: int) -> dict:
        """GetGroupRouting (group_routing.rs:324-326): an absent
        record is no default, not an error — most groups never set
        one."""
        from aruna_spark.queries.routing import (
            load_group_routing_records,
        )

        rows = (
            load_group_routing_records(self.spark, self.sf_dir)
            .filter(F.col("group_id") == group_id)
            .collect()
        )
        if not rows:
            return {
                "status": 200,
                "group_id": group_id,
                "present": False,
                "default_target": None,
            }
        r = rows[0]
        tgt = (
            None
            if r.default_kind is None
            else {"kind": r.default_kind, "target": r.default_target}
        )
        return {
            "status": 200,
            "group_id": group_id,
            "present": True,
            "default_target": tgt,
        }

    # ------------------------------------------- document deletion route
    def delete_document(self, document_id: int):
        """DeleteMetadataDocument (delete_metadata_document.rs): 404
        DocumentNotFound when the registry has no row (unknown id OR
        already tombstoned — the delete transaction removed it), else
        the delete envelope: the graph-lifecycle tombstone, the prune
        job (due immediately), and the Delete audit stamp. The drain
        that consumes the job is ``matq_graph_prune_drain`` /
        :func:`aruna_spark.queries.doc_lifecycle.drain_tick`."""
        from aruna_spark.ingest.doc_triples import GRAPH_NS
        from aruna_spark.queries.doc_lifecycle import live_documents

        rows = (
            live_documents(self.spark, self.sf_dir)
            .filter(F.col("doc_id") == document_id)
            .limit(1)
            .count()
        )
        if not rows:
            return {"status": 404, "error": "DocumentNotFound"}
        graph_iri = f"{GRAPH_NS}{document_id}"
        return {
            "status": 204,
            "document_id": document_id,
            "graph_iri": graph_iri,
            "tombstone_status": "deleted",
            "prune_job": {"graph_iri": graph_iri, "attempts": 0},
            "audit_operation": "delete",
        }

    def list_object_versions(
        self,
        prefix: str = "",
        key_marker: str | None = None,
        version_idx_marker: int | None = None,
        max_keys: int = 1000,
    ) -> DataFrame:
        """ListObjectVersions: every version under the prefix — delete
        markers included as DeleteMarker items — latest first per key,
        with (key_marker, version_id_marker) keyset continuation
        (list_object_versions.rs:60-61,88-89)."""
        from aruna_spark.ops.listing import list_object_versions

        return list_object_versions(
            self._versions(),
            prefix=prefix,
            key_marker=key_marker,
            version_idx_marker=version_idx_marker,
            max_keys=int(max_keys),
        )

    def delete_object(
        self,
        key: str,
        bucket: str = "corpus",
        version_id: str | None = None,
    ):
        """DeleteObject (delete_object.rs): unversioned → append a
        delete marker as the key's new latest (write_tombstone);
        versioned → remove that version permanently
        (delete_target_version), 404 when it does not exist. Returns
        the result row ``(version_id, delete_marker, status)``."""
        from aruna_spark.queries.s3_lifecycle import delete_results

        dels = self.spark.createDataFrame(
            [(bucket, key, version_id)],
            "bucket string, key string, want_version_id string",
        )
        # point shape: the result only needs this key's history
        mine = self._versions().filter(
            (F.col("bucket") == bucket) & (F.col("key") == key)
        )
        return delete_results(mine, dels).collect()[0]

    def copy_object(
        self,
        src_key: str,
        dest_key: str,
        src_bucket: str = "corpus",
        dest_bucket: str = "corpus",
        source_version_id: str | None = None,
        if_match: str | None = None,
        if_none_match: str | None = None,
    ):
        """CopyObject (copy_object.rs): server-side copy as a catalog
        row insert — the destination's new version carries the SOURCE's
        etag/blob (s3_copy.rs:75-86) and is always deduplicated.
        x-amz-copy-source-if-match / if-none-match fail as 412
        (copy_object.rs:84-110); a marker head is 404."""
        from aruna_spark.queries.s3_lifecycle import copy_objects

        cp = self.spark.createDataFrame(
            [
                (
                    src_bucket,
                    src_key,
                    source_version_id,
                    dest_bucket,
                    dest_key,
                    if_match,
                    if_none_match,
                )
            ],
            "src_bucket string, src_key string, want_version_id string, "
            "dest_bucket string, dest_key string, if_match string, "
            "if_none_match string",
        )
        # point shape: only the source + destination key histories
        mine = self._versions().filter(
            (
                (F.col("bucket") == src_bucket) & (F.col("key") == src_key)
            )
            | (
                (F.col("bucket") == dest_bucket)
                & (F.col("key") == dest_key)
            )
        )
        return copy_objects(mine, cp).collect()[0]

    def delete_objects(self, deletes: DataFrame) -> DataFrame:
        """Batch DeleteObjects (delete_objects.rs; S3 caps the batch at
        1,000 keys): one result row per request, marker appends and
        versioned removals resolved against the catalog."""
        from aruna_spark.queries.s3_lifecycle import delete_results

        return delete_results(self._versions(), deletes)

    # ------------------------------------------------- smaller route family
    def unified_search(self, query: str) -> DataFrame:
        """The unified 4-section search (documents FTS-scored, buckets/
        groups/users substring-matched, each section independently
        limited — the reference's concurrent fan-out endpoint). Returns
        the (section, rank, key, display, score_q) relation.

        A scoped engine serves the DOCUMENTS section under the caller's
        graph visibility (the same semi-join :meth:`search` applies)
        while buckets/groups/users stay realm-wide — exactly how the
        reference runs every section under the caller's authorization
        with the documents section on the authorized search path
        (``api/src/routes/search.rs:271-330``)."""
        from aruna_spark.queries.search import unified_sections

        scope = (
            None if self.visible_graphs is None else self._scoped_by_graph
        )
        return unified_sections(self.spark, self.sf_dir, query, scope=scope)

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
            # first-event time per entity (the registry's created_at_us)
            # — the reference's ULID-creation order, not an id proxy
            reg = reg.orderBy("created_at_us", "user_id")
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
        from aruna_spark.sources.objects import with_checksums

        # the route's envelope carries the FULL one-pass family
        # (hash.rs:10-77) — sha1/crc32 beyond the DRS-standard md5/sha256
        rows = with_checksums(drs_response(requested)).collect()
        return rows[0] if rows else None

    # ------------------------------------------------------ streaming plane
    # The reference's watch API (core/src/structs/notification_watch.rs;
    # delivery tests operations/tests/resource_watch_delivery.rs):
    # subscribe with a path glob + event-kind mask, receive matched
    # events, track unread counts. Every route delegates to the same
    # transformation functions the Structured Streaming pipeline and the
    # oracle-checked stream_* queries use (streaming/watch.py), and each
    # accepts an optional ``events`` relation — batch OR streaming (the
    # glob/mask match is a stream-static broadcast join, identical on
    # either) — defaulting to the engine's batch events table.

    def _events(self) -> DataFrame:
        from aruna_spark.catalog import load_table

        return load_table(self.spark, self.sf_dir, "events")

    def watch(
        self,
        path_glob: str,
        kinds: list[str],
        watch_id: str = "w_sub",
        events: DataFrame | None = None,
    ) -> DataFrame:
        """Subscribe one watch: the matched-events relation for a path
        glob + kind mask (notification_watch.rs:80-121 match rules,
        globset dialect)."""
        from aruna_spark.ops.globs import glob_to_regex
        from aruna_spark.streaming.watch import match_watches

        watches = self.spark.createDataFrame(
            [(watch_id, glob_to_regex(path_glob), list(kinds))],
            "watch_id string, pattern string, kinds array<string>",
        )
        return match_watches(
            self._events() if events is None else events, watches
        )

    def watch_summary(self, events: DataFrame | None = None) -> DataFrame:
        """Per-watch match summary over the default subscription set —
        the relation ``stream_watch_matches`` oracle-checks."""
        from aruna_spark.streaming.watch import (
            match_summary,
            match_watches,
            watches_df,
        )

        return match_summary(
            match_watches(
                self._events() if events is None else events,
                watches_df(self.spark),
            )
        )

    def unread(self, events: DataFrame | None = None) -> DataFrame:
        """Outbox→inbox unread counts per watch over the default
        subscription set — the relation ``stream_unread_counts``
        oracle-checks."""
        from aruna_spark.streaming.watch import (
            match_watches,
            unread_counts,
            watches_df,
        )

        return unread_counts(
            match_watches(
                self._events() if events is None else events,
                watches_df(self.spark),
            )
        )

    def prune_inbox(
        self,
        direct_ttl_ms: int | None = None,
        transient_ttl_ms: int | None = None,
        per_user_cap: int | None = None,
        events: DataFrame | None = None,
    ) -> DataFrame:
        """Inbox retention sweep (prune.rs): the per-row prune verdicts
        — ``expired`` (created + class TTL, notification.rs:11-12),
        ``capped`` (per-recipient transient cap walked newest-first,
        prune.rs:244-255), ``pruned``. Defaults are the reference
        constants (90 d / 30 d / 500)."""
        from aruna_spark.streaming.watch import (
            NOTIFICATION_DIRECT_TTL_MS,
            NOTIFICATION_TRANSIENT_PER_USER_CAP,
            NOTIFICATION_TRANSIENT_TTL_MS,
            inbox_records,
            prune_inbox,
        )

        return prune_inbox(
            inbox_records(self._events() if events is None else events),
            direct_ttl_ms=(
                NOTIFICATION_DIRECT_TTL_MS
                if direct_ttl_ms is None
                else int(direct_ttl_ms)
            ),
            transient_ttl_ms=(
                NOTIFICATION_TRANSIENT_TTL_MS
                if transient_ttl_ms is None
                else int(transient_ttl_ms)
            ),
            per_user_cap=(
                NOTIFICATION_TRANSIENT_PER_USER_CAP
                if per_user_cap is None
                else int(per_user_cap)
            ),
        )

    def list_notifications(
        self,
        recipient: int,
        cursor: tuple[int, int] | None = None,
        limit: int = 200,
        events: DataFrame | None = None,
    ):
        """ListNotifications (list.rs): one newest-first page of the
        recipient's inbox with the reference's cursor envelope — limit
        clamped to 1..200 (list.rs:15,65), ``next_cursor`` = the last
        row's (created_at_ms, notification_id) when truncated
        (list.rs:126-138, fetch limit+1)."""
        from aruna_spark.streaming.watch import (
            LIST_NOTIFICATIONS_MAX_LIMIT,
            inbox_records,
            list_notifications,
        )

        limit = max(1, min(int(limit), LIST_NOTIFICATIONS_MAX_LIMIT))
        rows = list_notifications(
            inbox_records(self._events() if events is None else events),
            recipient,
            cursor=cursor,
            limit=limit + 1,
        ).collect()
        truncated = len(rows) > limit
        rows = rows[:limit]
        return {
            "records": rows,
            "next_cursor": (
                (rows[-1].created_at_ms, rows[-1].notification_id)
                if truncated and rows
                else None
            ),
        }

    def mark_read(
        self,
        recipient: int,
        ids: list[int] | None = None,
        up_to_ms: int | None = None,
        events: DataFrame | None = None,
    ):
        """MarkRead (mark_read.rs): mark the recipient's unread records
        read by explicit ids (≤512, TooManyIds beyond — rs:18,73)
        and/or a created_at horizon; empty request is a no-op (rs:234).
        Returns {"marked": n}."""
        from aruna_spark.streaming.watch import (
            MARK_READ_MAX_IDS,
            inbox_records,
            mark_read,
        )

        ids = list(dict.fromkeys(ids or []))
        if len(ids) > MARK_READ_MAX_IDS:
            raise ValueError(
                f"mark read id count exceeds cap {MARK_READ_MAX_IDS}"
            )
        if not ids and up_to_ms is None:
            return {"marked": 0}
        marks = self.spark.createDataFrame(
            [(int(recipient), int(i), None) for i in ids]
            + (
                [(int(recipient), None, int(up_to_ms))]
                if up_to_ms is not None
                else []
            ),
            "recipient long, notification_id long, up_to_ms long",
        )
        inbox = inbox_records(
            self._events() if events is None else events
        ).filter(F.col("recipient") == int(recipient))
        n = (
            mark_read(inbox, marks)
            .agg(F.sum(F.col("newly_marked").cast("int")).alias("n"))
            .collect()[0]
            .n
        )
        return {"marked": int(n or 0)}

    def dashboard_epochs(self, events: DataFrame | None = None) -> DataFrame:
        """Dashboard epoch watch (dashboard.rs:6-39): the running epoch
        per debounce window — batch/backfill form (the live-stream form
        is the foreachBatch counter, tests/test_streaming.py)."""
        from aruna_spark.streaming.watch import dashboard_epochs

        return dashboard_epochs(
            self._events() if events is None else events
        )

    # --------------------------------------------------- staging connectors
    def staging_list(
        self,
        source_path: str,
        offset: int = 0,
        limit: int = 100,
        recursive: bool = False,
        files_only: bool = False,
    ) -> DataFrame:
        """ListStagingSource (list_source.rs:24-29) over the catalog's
        latest object keys: one level (dirs rolled up) or the recursive
        walk, with the offset/limit page envelope."""
        from aruna_spark.ops.staging import list_source_level
        from aruna_spark.sources.objects import live_latest

        # live heads only — deleted keys are hidden like ListObjectsV2
        keys = live_latest(self._versions()).select("key", "size")
        return list_source_level(
            keys,
            source_path,
            offset=offset,
            limit=limit,
            recursive=recursive,
            files_only=files_only,
        )

    def create_source_connector(
        self,
        name: str,
        kind: str,
        public_config: dict[str, str] | None = None,
        secret_config: dict[str, str] | None = None,
    ) -> dict:
        """CreateSourceConnector validation gate
        (connectors/create_source_connector.rs via validation.rs):
        returns a 201 envelope echoing the public config (secrets
        never echo — has_secret_config.rs), or a 400 with the
        validation error code and offending key."""
        from aruna_spark.ops.connector_validation import (
            validate_connector_input,
        )

        public_config = dict(public_config or {})
        secret_config = dict(secret_config or {})
        err = validate_connector_input(
            name, kind, public_config, secret_config
        )
        if err is not None:
            code, key = err
            return {"status": 400, "error": code, "key": key}
        return {
            "status": 201,
            "name": name,
            "kind": kind,
            "public_config": public_config,
            "has_secret_config": bool(secret_config),
        }

    # ------------------------------------------- connector record CRUD
    # the stored source-connector records the staging bindings name
    # (core source_connector.rs:37-46). conn-0..conn-3 carry fixture
    # bindings (queries/staging_suite.py); conn-4 is registered but
    # unbound — the deletable lane. Secret configs live in a SEPARATE
    # record (SourceConnectorSecret) and NEVER echo in any response
    # shape; only has_secret_config does (has_secret_config.rs).
    _SOURCE_CONNECTORS = [
        {"connector_id": "conn-0", "group_id": "grp-main",
         "name": "refdata-s3", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example.com",
                           "bucket": "reads", "region": "eu-central-1"},
         "secret_config": {"access_key_id": "AK0",
                           "secret_access_key": "stored-secret-0"}},
        {"connector_id": "conn-1", "group_id": "grp-main",
         "name": "mirror-http", "kind": "http",
         "public_config": {"endpoint": "https://data.example.com"},
         "secret_config": {}},
        {"connector_id": "conn-2", "group_id": "grp-main",
         "name": "archive-s3", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example.com",
                           "bucket": "archive", "region": "eu-central-1"},
         "secret_config": {"access_key_id": "AK2",
                           "secret_access_key": "stored-secret-2"}},
        {"connector_id": "conn-3", "group_id": "grp-other",
         "name": "foreign-http", "kind": "http",
         "public_config": {"endpoint": "https://other.example.com"},
         "secret_config": {}},
        {"connector_id": "conn-4", "group_id": "grp-main",
         "name": "scratch-http", "kind": "http",
         "public_config": {"endpoint": "https://scratch.example.com"},
         "secret_config": {}},
    ]

    def _find_connector(self, group_id: str, connector_id: str):
        """Keyed read scoped by group: another group's connector is
        NotFound, never Forbidden (get_source_connector.rs:84-103
        reads the group-prefixed key)."""
        for c in self._SOURCE_CONNECTORS:
            if (
                c["connector_id"] == connector_id
                and c["group_id"] == group_id
            ):
                return dict(c)
        return None

    def _connector_referenced(self, connector_id: str) -> bool:
        """``blob_version_references_connector`` over the staged
        bindings (repository.rs:175-180): only versions still in
        Reference STATE hold the connector — snapshot/sync bindings
        materialized, so they don't pin it."""
        from aruna_spark.catalog import load_table

        n = (
            load_table(self.spark, self.sf_dir, "documents")
            .filter(
                (F.col("doc_id") % 11 == 5)
                & (
                    F.concat(
                        F.lit("conn-"),
                        (F.col("doc_id") % 4).cast("string"),
                    )
                    == connector_id
                )
            )
            .limit(1)
            .count()
        )
        return n > 0

    @staticmethod
    def _connector_envelope(c: dict, status: int = 200) -> dict:
        return {
            "status": status,
            "connector_id": c["connector_id"],
            "group_id": c["group_id"],
            "name": c["name"],
            "kind": c["kind"],
            "public_config": dict(c["public_config"]),
            "has_secret_config": bool(c["secret_config"]),
        }

    def get_source_connector(
        self, group_id: str, connector_id: str
    ) -> dict:
        """GetSourceConnector (get_source_connector.rs): the public
        record plus a has_secret_config probe of the separate secret
        record — the secret itself never enters the response shape."""
        c = self._find_connector(group_id, connector_id)
        if c is None:
            return {"status": 404, "error": "NotFound"}
        return self._connector_envelope(c)

    def list_source_connectors(self, group_id: str) -> dict:
        """ListSourceConnectors (list_source_connectors.rs): the
        group's connectors with per-row has_secret_config probes."""
        return {
            "status": 200,
            "connectors": [
                self._connector_envelope(dict(c))
                for c in self._SOURCE_CONNECTORS
                if c["group_id"] == group_id
            ],
        }

    def replace_source_connector(
        self,
        group_id: str,
        connector_id: str,
        name: str,
        kind: str,
        public_config: dict[str, str] | None = None,
        secret_config: dict[str, str] | None = None,
    ) -> dict:
        """ReplaceSourceConnector (replace_source_connector.rs):
        validates the input FIRST (rs:130-137), 404 on an absent or
        foreign record, then — only when the secret config CHANGED
        (rs:179-193, including changing to empty, which deletes the
        secret record) — scans the reference-state versions and
        aborts 409 ReferencedByObjectVersion if any still reaches its
        source through this connector. identity (connector_id,
        group_id, created_at, created_by) is preserved; name, kind
        and both configs come from the input (rs:160-177)."""
        from aruna_spark.ops.connector_validation import (
            validate_connector_input,
        )

        public_config = dict(public_config or {})
        secret_config = dict(secret_config or {})
        err = validate_connector_input(
            name, kind, public_config, secret_config
        )
        if err is not None:
            code, key = err
            return {"status": 400, "error": code, "key": key}
        c = self._find_connector(group_id, connector_id)
        if c is None:
            return {"status": 404, "error": "NotFound"}
        if secret_config != c["secret_config"] and (
            self._connector_referenced(connector_id)
        ):
            return {
                "status": 409,
                "error": "ReferencedByObjectVersion",
            }
        replaced = {
            **c,
            "name": name,
            "kind": kind,
            "public_config": public_config,
            "secret_config": secret_config,
        }
        return self._connector_envelope(replaced)

    def delete_source_connector(
        self, group_id: str, connector_id: str
    ) -> dict:
        """DeleteSourceConnector (delete_source_connector.rs): 404 on
        absent/foreign, 409 while any reference-state version still
        reaches its source through the connector; the delete removes
        the record AND its secret in one transaction (rs:504-530)."""
        c = self._find_connector(group_id, connector_id)
        if c is None:
            return {"status": 404, "error": "NotFound"}
        if self._connector_referenced(connector_id):
            return {"status": 409, "error": "ReferencedByObjectVersion"}
        return {
            "status": 204,
            "connector_id": connector_id,
            "deleted_secret": bool(c["secret_config"]),
        }

    def create_group(
        self,
        actor_id: str,
        display_name: str,
        owner_cap: int | None,
        owned_count: int,
        group_id: str = "g-new",
    ) -> dict:
        """CreateGroup through the owner-cap gate (create_group.rs:
        354-370 then 93-115): exempt actors (cap None — realm admins)
        create without counting, cap 0 rejects before the scan, and a
        positive cap rejects when the bounded owner-index count reaches
        it. 201 with the group + seeded default roles (admin/user/
        viewer, owner assigned to admin — rs ``test_group_creation``),
        409 ``OwnedGroupLimitReached`` with the echoed limit."""
        from aruna_spark.queries.create_group import (
            DEFAULT_GROUP_ROLES,
            create_group_gate,
        )

        created, limit = create_group_gate(owner_cap, owned_count)
        if not created:
            return {
                "status": 409,
                "error": "OwnedGroupLimitReached",
                "limit": limit,
            }
        return {
            "status": 201,
            "group_id": group_id,
            "display_name": display_name,
            "owner": actor_id,
            "roles": list(DEFAULT_GROUP_ROLES),
            "admin_assigned_users": [actor_id],
        }

    def create_group_backend(
        self,
        name: str,
        kind: str,
        public_config: dict[str, str] | None = None,
        secret_config: dict[str, str] | None = None,
    ) -> dict:
        """CreateGroupBackend validation gate (group_backends/create.rs
        via validation.rs): 201 with the NORMALIZED public config
        (lowercased keys — what the store will actually read), or 400
        with the ladder's error code."""
        from aruna_spark.ops.backend_validation import validate_backend_input

        out = validate_backend_input(
            name, kind, dict(public_config or {}), dict(secret_config or {})
        )
        if isinstance(out, tuple):
            code, key = out
            return {"status": 400, "error": code, "key": key}
        return {
            "status": 201,
            "name": name,
            "kind": kind,
            "public_config": out["public"],
            "has_secret_config": bool(out["secret"]),
        }

    def replace_group_backend(
        self,
        existing: dict,
        name: str,
        kind: str,
        public_config: dict[str, str] | None = None,
        secret_config: dict[str, str] | None = None,
    ) -> dict:
        """ReplaceGroupBackend: credentials and the name may change;
        the store identity (kind + identity keys) is fixed after
        create (validation.rs:64-93) — 409 otherwise."""
        from aruna_spark.ops.backend_validation import (
            check_identity,
            validate_backend_input,
        )

        out = validate_backend_input(
            name, kind, dict(public_config or {}), dict(secret_config or {})
        )
        if isinstance(out, tuple):
            code, key = out
            return {"status": 400, "error": code, "key": key}
        clash = check_identity(
            existing["kind"], existing["public_config"], kind, out["public"]
        )
        if clash is not None:
            return {"status": 409, "error": clash[0], "key": clash[1]}
        return {
            "status": 200,
            "name": name,
            "kind": kind,
            "public_config": out["public"],
            "has_secret_config": bool(out["secret"]),
        }

    # ------------------------------------------- backend catalog lifecycle
    # the registered-backend catalog (group_backends/query.rs keyed
    # reads over the GROUP_BACKENDS keyspace); names line up with the
    # reclaim plane's backend dimension so the status route counts
    # real queues. Secret configs are NEVER in the response shape
    # (GroupBackendResponse carries public_config only,
    # group_backends.rs:132-141).
    _GROUP_BACKENDS = [
        {"backend_id": "bk-0", "group_id": "grp-main",
         "name": "backend-0", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example",
                           "bucket": "cold0"},
         "disabled": False},
        {"backend_id": "bk-1", "group_id": "grp-main",
         "name": "backend-1", "kind": "gcs",
         "public_config": {"bucket": "cold1"},
         "disabled": False},
        {"backend_id": "bk-2", "group_id": "grp-main",
         "name": "backend-2", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example",
                           "bucket": "cold2"},
         "disabled": True},
        {"backend_id": "bk-3", "group_id": "grp-other",
         "name": "backend-3", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example",
                           "bucket": "other"},
         "disabled": False},
        # decommissioned: disabled AND holding nothing anywhere — the
        # remove_drained_backends sweep's removable lane
        {"backend_id": "bk-4", "group_id": "grp-main",
         "name": "backend-9", "kind": "s3",
         "public_config": {"endpoint": "https://s3.example",
                           "bucket": "drained"},
         "disabled": True},
    ]

    def _find_backend(self, group_id: str, backend_id: str):
        """Keyed read + group-ownership filter: a backend another
        group registered is NotFound, never Forbidden — the route
        filters on record.group_id (group_backends.rs:290-305)."""
        for b in self._GROUP_BACKENDS:
            if b["backend_id"] == backend_id and b["group_id"] == group_id:
                return dict(b)
        return None

    def list_group_backends(self, group_id: str):
        """ListGroupBackends (group_backends.rs:257-272): the group's
        registered backends, public config only."""
        return {
            "status": 200,
            "backends": [
                dict(b) for b in self._GROUP_BACKENDS
                if b["group_id"] == group_id
            ],
        }

    def get_group_backend(self, group_id: str, backend_id: str):
        b = self._find_backend(group_id, backend_id)
        if b is None:
            return {"status": 404, "error": "NotFound"}
        return {"status": 200, **b}

    def delete_group_backend(self, group_id: str, backend_id: str):
        """DELETE is a soft-disable (group_backends.rs:379-387 routes
        through set_disabled(true)): writes are refused while the flag
        is set, reads keep working, and the physical remove happens
        later via remove_drained_backends once the reclaim queues
        drain. Idempotent — an already-disabled record is a no-op
        (disable.rs:109)."""
        b = self._find_backend(group_id, backend_id)
        if b is None:
            return {"status": 404, "error": "NotFound"}
        return {"status": 204, "changed": not b["disabled"]}

    def enable_group_backend(self, group_id: str, backend_id: str):
        b = self._find_backend(group_id, backend_id)
        if b is None:
            return {"status": 404, "error": "NotFound"}
        return {
            "status": 200,
            **{**b, "disabled": False},
            "changed": b["disabled"],
        }

    # reclaim.rs:275-279 — status scan caps: the candidate side is a
    # bounded prefix scan, the cleanup queue a capped filtered scan
    STATUS_SCAN_LIMIT = 10_000
    CLEANUP_SCAN_LIMIT = 1_000

    def backend_reclaim_status(self, group_id: str, backend_id: str):
        """Per-backend reclaim queue depth, computed from the queues
        themselves (backend_status, reclaim.rs:283-333): pending
        candidates by bounded prefix scan, physical deletes still owed
        (the sweep's freed verdicts awaiting the drain) by capped
        filtered scan, the oldest enqueue over both, and a truncation
        flag when a scan hit its cap."""
        b = self._find_backend(group_id, backend_id)
        if b is None:
            return {"status": 404, "error": "NotFound"}
        from aruna_spark.queries.reclaim import _candidates

        name = b["name"]
        # the candidate keyspace is keyed (backend, blob_hash), so the
        # reference's bounded prefix scan walks BLOB_HASH order within
        # the backend and folds oldest_enqueued_at over the scanned
        # page only (reclaim.rs:288-303) — mirror that key order (an
        # unordered limit would keep arbitrary, nondeterministic rows)
        cand = (
            _candidates(self.spark, self.sf_dir)
            .filter(F.col("backend") == name)
            .orderBy("blob_hash")
            .limit(self.STATUS_SCAN_LIMIT + 1)
            .collect()
        )
        truncated = len(cand) > self.STATUS_SCAN_LIMIT
        cand = cand[: self.STATUS_SCAN_LIMIT]
        from aruna_spark.queries import REGISTRY, load_all

        load_all()
        swept = REGISTRY["blob_reclaim_sweep"][0](self.spark, self.sf_dir)
        # cleanup rows are keyed by generated ULIDs, so THEIR key
        # order IS enqueue order (reclaim.rs:268-273 cleanup_time)
        cleanups = (
            swept.filter(
                (F.col("backend") == name)
                & (F.col("verdict") == "freed")
            )
            .orderBy("enqueued_at", "blob_hash")
            .limit(self.CLEANUP_SCAN_LIMIT + 1)
            .collect()
        )
        truncated = truncated or len(cleanups) > self.CLEANUP_SCAN_LIMIT
        cleanups = cleanups[: self.CLEANUP_SCAN_LIMIT]
        oldest = min(
            (r.enqueued_at for r in (*cand, *cleanups)), default=None
        )
        return {
            "status": 200,
            "pending_candidates": len(cand),
            "queued_cleanups": len(cleanups),
            "oldest_enqueued_at": oldest,
            "truncated": truncated,
        }

    def remove_drained_backends(self):
        """The physical-removal sweep (group_backends/remove.rs:29-69
        remove_drained_backends): a DISABLED backend is removed only
        once NOTHING holds it — no surviving catalog location, no
        pending reclaim candidate, no owed physical delete
        (backends_holding_data scans the locations + cleanup
        keyspaces; the candidate queue empties through the sweep).
        Everything else stays for the next tick."""
        from aruna_spark.queries import REGISTRY, load_all
        from aruna_spark.queries.reclaim import (
            _backend_of,
            _candidates,
            post_delete_catalog,
        )

        load_all()
        disabled = [
            b for b in self._GROUP_BACKENDS if b["disabled"]
        ]
        if not disabled:
            return {"n_removed": 0, "removed": [], "held": []}
        # the SURVIVING catalog, post-delete — the raw version catalog
        # still carries the removed rows whose blobs already queued
        # for reclaim, and counting those as 'holding' would pin a
        # fully-drained backend forever
        holding = {
            r.backend
            for r in post_delete_catalog(self.spark, self.sf_dir)
            .filter(F.col("blob_hash").isNotNull())
            .select(_backend_of(F.col("size")).alias("backend"))
            .distinct()
            .collect()
        }
        holding |= {
            r.backend
            for r in _candidates(self.spark, self.sf_dir)
            .select("backend")
            .distinct()
            .collect()
        }
        swept = REGISTRY["blob_reclaim_sweep"][0](self.spark, self.sf_dir)
        holding |= {
            r.backend
            for r in swept.filter(F.col("verdict") == "freed")
            .select("backend")
            .distinct()
            .collect()
        }
        removed = [
            b["backend_id"] for b in disabled if b["name"] not in holding
        ]
        held = [
            b["backend_id"] for b in disabled if b["name"] in holding
        ]
        return {
            "n_removed": len(removed),
            "removed": removed,
            "held": held,
        }

    # ------------------------------------------- onboarding secret routes
    # The enrollment keyspace's admin/bootstrap surface
    # (api/src/routes/onboarding.rs + {create,reserve,consume,delete,
    # list}_onboarding_secret.rs). The ladders mirror the
    # oracle-checked queries in queries/onboarding.py
    # (classify_reserve / classify_consume); the facade keeps a
    # per-Engine record store like the reference's ONBOARDING
    # keyspace. The secret hash is sha256 (the repo's standing blake3
    # stand-in). The plaintext secret echoes exactly ONCE — at create
    # (the GetUserAccess redaction convention).

    def _onboarding(self) -> dict:
        if not hasattr(self, "_onboarding_secrets"):
            self._onboarding_secrets: dict[str, dict] = {}
        return self._onboarding_secrets

    def create_onboarding_secret(
        self, mode: str, expires_in_s: int, now_ms: int
    ) -> dict:
        """201 with the plaintext secret — its only echo; the store
        keeps the hash. Every admin route first prunes stale secrets
        (onboarding.rs prune_stale_onboarding_secrets)."""
        import hashlib
        import secrets as _secrets

        if mode not in ("Management", "Server", "Local"):
            return {"status": 400, "error": "InvalidMode"}
        self._prune_onboarding(now_ms)
        store = self._onboarding()
        enrollment_id = f"enr-{len(store):06d}-{now_ms}"
        secret = _secrets.token_hex(16)
        store[enrollment_id] = {
            "enrollment_id": enrollment_id,
            "secret_hash": hashlib.sha256(secret.encode()).hexdigest(),
            "mode": mode,
            "expires_at": now_ms + expires_in_s * 1000,
            "state": "available",
            "state_node": None,
            "reservation_expires_at": None,
        }
        return {
            "status": 201,
            "enrollment_id": enrollment_id,
            "secret": secret,
            "mode": mode,
            "expires_at": store[enrollment_id]["expires_at"],
        }

    def _prune_onboarding(self, now_ms: int) -> None:
        # expired secrets delete UNLESS mid-finalize — a bootstrapping
        # node keeps its secret past the TTL (onboarding.rs test:
        # list_prunes_expired_available_but_keeps_expired_finalizing)
        store = self._onboarding()
        for eid in [
            e
            for e, r in store.items()
            if r["expires_at"] < now_ms and r["state"] != "finalizing"
        ]:
            del store[eid]

    def list_onboarding_secrets(self, now_ms: int) -> dict:
        self._prune_onboarding(now_ms)
        secrets = sorted(
            self._onboarding().values(), key=lambda r: r["expires_at"]
        )
        return {
            "status": 200,
            "secrets": [
                {
                    "enrollment_id": r["enrollment_id"],
                    "mode": r["mode"],
                    "expires_at": r["expires_at"],
                    "claimed_node_id": r["state_node"],
                }
                for r in secrets
            ],
        }

    def revoke_onboarding_secret(self, enrollment_id: str) -> dict:
        store = self._onboarding()
        if enrollment_id not in store:
            return {"status": 404, "error": "NotFound"}
        del store[enrollment_id]
        return {"status": 204}

    @staticmethod
    def _secret_matches(record: dict, secret: str) -> bool:
        import hashlib

        return (
            hashlib.sha256(secret.encode()).hexdigest()
            == record["secret_hash"]
        )

    def reserve_onboarding_secret(
        self,
        enrollment_id: str,
        secret: str,
        node_id: str,
        now_ms: int,
        reservation_expires_at: int,
        finalizing: bool = False,
    ) -> dict:
        """reserve_onboarding_secret.rs:86-146,246-258 — see
        queries/onboarding.py classify_reserve for the ladder."""
        r = self._onboarding().get(enrollment_id)
        if r is None:
            return {"status": 404, "error": "NotFound"}
        if not self._secret_matches(r, secret):
            return {"status": 403, "error": "InvalidSecret"}
        state, holder = r["state"], r["state_node"]
        if state == "available":
            if r["expires_at"] < now_ms:
                return {"status": 410, "error": "Expired"}
        elif state == "reserved" and holder != node_id:
            if r["reservation_expires_at"] >= now_ms:
                return {"status": 409, "error": "AlreadyClaimed"}
            if r["expires_at"] < now_ms:
                return {"status": 410, "error": "Expired"}
        elif state in ("finalizing", "consumed"):
            if holder != node_id:
                return {"status": 409, "error": "AlreadyClaimed"}
            # Ok(None): success, nothing writes
            return {
                "status": 200,
                "outcome": "noop",
                "claimed_node_id": node_id,
            }
        # write path: Finalizing for a mid-bootstrap caller, else a
        # deadline-stamped Reservation (same-node re-reserve included)
        r["state"] = "finalizing" if finalizing else "reserved"
        r["state_node"] = node_id
        r["reservation_expires_at"] = (
            None if finalizing else reservation_expires_at
        )
        return {
            "status": 200,
            "outcome": "reserved",
            "claimed_node_id": node_id,
            "written_state": r["state"],
        }

    def consume_onboarding_secret(
        self, enrollment_id: str, secret: str, node_id: str, now_ms: int
    ) -> dict:
        """consume_onboarding_secret.rs:160-245 — expiry BEFORE hash,
        with the engagement override; Consumed-by-caller is an
        idempotent success with consumed_now=False."""
        r = self._onboarding().get(enrollment_id)
        if r is None:
            return {"status": 404, "error": "NotFound"}
        state, holder = r["state"], r["state_node"]
        engaged = holder == node_id and (
            state in ("finalizing", "consumed")
            or (
                state == "reserved"
                and r["reservation_expires_at"] >= now_ms
            )
        )
        if r["expires_at"] < now_ms and not engaged:
            return {"status": 410, "error": "Expired"}
        if not self._secret_matches(r, secret):
            return {"status": 403, "error": "InvalidSecret"}
        if state == "consumed":
            if holder == node_id:
                return {
                    "status": 200,
                    "outcome": "idempotent",
                    "consumed_now": False,
                }
            return {"status": 409, "error": "AlreadyClaimed"}
        if state in ("reserved", "finalizing") and holder != node_id:
            return {"status": 409, "error": "AlreadyClaimed"}
        r["state"] = "consumed"
        r["state_node"] = node_id
        r["reservation_expires_at"] = None
        return {
            "status": 200,
            "outcome": "consumed",
            "consumed_now": True,
        }

    def inspect_onboarding_secret(
        self, enrollment_id: str, secret: str, node_id: str, now_ms: int
    ) -> dict:
        """inspect_onboarding_secret.rs:150-168 — a pure READ with its
        own rung order: foreign-Finalizing rejects AlreadyClaimed
        BEFORE expiry, the expiry override is Finalizing-by-caller
        only, the hash is checked LAST; survivors return the record,
        nothing writes. See queries/onboarding.py classify_inspect."""
        r = self._onboarding().get(enrollment_id)
        if r is None:
            return {"status": 404, "error": "NotFound"}
        state, holder = r["state"], r["state_node"]
        finalizing_self = state == "finalizing" and holder == node_id
        if state == "finalizing" and holder != node_id:
            return {"status": 409, "error": "AlreadyClaimed"}
        if r["expires_at"] < now_ms and not finalizing_self:
            return {"status": 410, "error": "Expired"}
        if not self._secret_matches(r, secret):
            return {"status": 403, "error": "InvalidSecret"}
        return {
            "status": 200,
            "record": {
                "enrollment_id": enrollment_id,
                "mode": r["mode"],
                "expires_at": r["expires_at"],
                "claimed_node_id": holder,
                "state": state,
            },
        }

    # --------------------------------------------------------- quota plane
    def _realm_quota_store(self) -> dict:
        if not hasattr(self, "_realm_quotas"):
            # realm_id -> normalized quota dict; the engine serves one
            # fixture realm (the doc_placement/quota plane's realm-0)
            self._realm_quotas = {}
        return self._realm_quotas

    KNOWN_REALMS = ("realm-0",)

    def set_realm_quota(self, realm_id: str, quota: dict) -> dict:
        """SetRealmQuota (operations/src/set_realm_quota.rs): the
        validation ladder (rs:378-437 — ops/quota_config.validate_quota
        rung-for-rung) runs first; an unknown realm is
        RealmConfigNotFound; the stored quota is the supported_quota
        NORMALIZATION of the input (devices dropped, overrides sorted —
        rs:145-156 derives the stored value from the reducer's
        materialized state, and a single-origin local write never
        conflicts, so the materialization IS the normalized input; the
        conflicted-path keep-last-agreed branch is the replay query's
        plane, crdt_realm_quota_replay lane 4). Returns the realm
        config envelope."""
        from aruna_spark.ops.quota_config import (
            InvalidQuota,
            supported_quota,
            validate_quota,
        )

        if realm_id not in self.KNOWN_REALMS:
            return {"status": 404, "error": "RealmConfigNotFound"}
        try:
            validate_quota(quota)
        except InvalidQuota as e:
            return {"status": 400, "error": "InvalidQuota",
                    "reason": str(e)}
        normalized = supported_quota(quota)
        self._realm_quota_store()[realm_id] = normalized
        return {"status": 200, "realm_id": realm_id, "quota": normalized}

    def get_realm_quota(self, realm_id: str) -> dict:
        """The read side: the stored normalized quota, or
        QuotaConfig::default (realm.rs:202-214) when never set, with
        the effective grace/warn/group-cap resolution the dashboard
        consumes (queries/quota.py)."""
        from aruna_spark.ops.quota_config import DEFAULT_QUOTA

        if realm_id not in self.KNOWN_REALMS:
            return {"status": 404, "error": "RealmConfigNotFound"}
        q = self._realm_quota_store().get(realm_id)
        quota = dict(DEFAULT_QUOTA) if q is None else q
        return {
            "status": 200,
            "realm_id": realm_id,
            "quota": quota,
            "was_set": q is not None,
            "effective_grace_pct": quota["grace_factor_percent"],
            "effective_warn_pct": quota["warn_threshold_percent"],
            "effective_max_groups": quota["max_groups_per_user"],
        }

    def quota_check(
        self, incoming_bytes: int, quota_bytes: int | None = None
    ) -> DataFrame:
        """The quota gate (usage_stats.rs:268-436), parameterized by the
        incoming write size: per-group projected usage vs ceiling with
        the route's allow/deny verdict."""
        from aruna_spark.queries.usage import QUOTA_BYTES, _counters_by_group

        ceiling = QUOTA_BYTES if quota_bytes is None else int(quota_bytes)
        projected = F.col("stored_bytes") + F.lit(int(incoming_bytes))
        return _counters_by_group(self.spark, self.sf_dir).select(
            "group_id",
            "stored_bytes",
            projected.alias("projected_bytes"),
            F.lit(ceiling).cast("long").alias("quota_bytes"),
            (projected <= ceiling).alias("allowed"),
        )

    # ------------------------------------------------------ ingest / export
    def import_archive(self, crates: DataFrame) -> DataFrame:
        """Archive (.eln) import: ``(document_id, jsonld, targets_json)``
        crates → triples with archive-local IRIs rewritten to their w3id
        targets (the reference's import IRI-rewrite pass)."""
        from aruna_spark.ingest.archive import import_crates

        return import_crates(crates)

    def ingest_jsonld(self, docs: DataFrame) -> DataFrame:
        """JSON-LD documents -> RDF triples (the reference's write-path
        projection, typing rules included)."""
        from aruna_spark.ingest.jsonld import ingest_jsonld

        return ingest_jsonld(docs)

    def rocrate_summary(
        self, graph_iri: str, cursor: str, cache=None
    ) -> dict:
        """One graph's RO-Crate summary served through the
        cursor-keyed cache (metadata/summary_cache.rs): a hit requires
        the caller's cursor (the document's last_event_id) to match
        the cached one exactly — a moved document never serves its old
        summary — and misses compute from the triples scan and fill
        the cache. Returns ``{summary, cached}``."""
        import json as _json

        from aruna_spark.ops.summary_cache import default_summary_cache
        from aruna_spark.queries.ingest_suite import rocrate_export_summary

        cache = cache if cache is not None else default_summary_cache()
        hit = cache.get(graph_iri, cursor)
        if hit is not None:
            return {"summary": _json.loads(hit), "cached": True}
        rows = (
            rocrate_export_summary(self.spark, self.sf_dir)
            .filter(F.col("graph_iri") == graph_iri)
            .collect()
        )
        if not rows:
            return {"summary": None, "cached": False}
        summary = {
            k: rows[0][k]
            for k in ("graph_iri", "n_entities", "n_triples", "entity_types")
        }
        cache.put(graph_iri, cursor, _json.dumps(summary))
        return {"summary": summary, "cached": False}

    def export_rocrate(self, triples: DataFrame | None = None) -> DataFrame:
        """Per-graph RO-Crate JSON-LD export (round-trip-exact with
        :meth:`ingest_jsonld`); defaults to the engine's triples."""
        from aruna_spark.ingest.jsonld import export_rocrate
        from aruna_spark.store import triples_store

        if triples is None:
            triples = triples_store(self.spark, self.sf_dir)
        return export_rocrate(triples)

    # ------------------------------------------- RO-Crate import route
    # api/src/routes/rocrate_import.rs: POST /metadata/rocrate/uploads
    # stages a private upload and returns the envelope (upload_id,
    # blake3, size, expires_at, owner_node_url); POST
    # /metadata/rocrate/imports walks the source/target/metadata
    # validation ladder, replays idempotent submissions, and hands the
    # plan to the import job (the job itself is the archive-import
    # query plane — import_archive above). Limits are
    # RoCrateLimits::default (core/src/structs/job.rs:366-384).
    ROCRATE_DIRECT_UPLOAD_BYTES = 8 * 1024**3
    ROCRATE_IMPORT_SOURCE_BYTES = 100 * 1024**3
    ROCRATE_KEY_BYTES = 1024
    ROCRATE_UPLOAD_RETENTION_MS = 24 * 60 * 60 * 1000
    ROCRATE_MAX_ACTIVE_JOBS = 4
    _ROCRATE_MEDIA_TYPES = {
        "application/zip": "zip",
        "application/vnd.eln+zip": "eln",
    }

    def _rocrate_state(self) -> dict:
        if not hasattr(self, "_rocrate_store"):
            # uploads: upload_id -> record; jobs: job_id -> record;
            # dedup: (user_id, idempotency_key) -> (job_id, digest)
            self._rocrate_store = {
                "uploads": {},
                "jobs": {},
                "dedup": {},
            }
        return self._rocrate_store

    @property
    def _rocrate_uploads(self) -> dict:
        return self._rocrate_state()["uploads"]

    @property
    def _rocrate_jobs(self) -> dict:
        return self._rocrate_state()["jobs"]

    @property
    def _rocrate_dedup(self) -> dict:
        return self._rocrate_state()["dedup"]

    def upload_rocrate(
        self,
        body: bytes,
        content_type: str,
        now_ms: int,
        user_id: str = "user-0",
        content_length: int | None = None,
    ) -> dict:
        """POST /metadata/rocrate/uploads (rocrate_import.rs:137-188):
        parse the media type (zip or eln, parameters stripped —
        rs:563-577), reject a Content-Length over the direct-upload cap
        with 413 BEFORE reading the body (rs:146-155), stamp
        ``expires_at = now + upload_retention_ms`` (rs:156-162), and
        stage the private record. ``blake3`` is hex over the body (the
        repo's standing sha256 stand-in for blake3). Returns the 201
        envelope: upload_id, blake3, size, expires_at (RFC 3339),
        owner_node_url."""
        import hashlib
        from datetime import datetime, timezone

        media = (content_type or "").split(";")[0].strip()
        if media not in self._ROCRATE_MEDIA_TYPES:
            return {
                "status": 400,
                "error": "Content-Type must be application/zip or "
                "application/vnd.eln+zip",
            }
        limit = self.ROCRATE_DIRECT_UPLOAD_BYTES
        declared = len(body) if content_length is None else content_length
        if declared > limit:
            return {
                "status": 413,
                "error": f"upload exceeds limit {limit}",
            }
        expires_at_ms = now_ms + self.ROCRATE_UPLOAD_RETENTION_MS
        upload_id = f"up-{len(self._rocrate_uploads):06d}"
        record = {
            "upload_id": upload_id,
            "owner": user_id,
            "media_type": self._ROCRATE_MEDIA_TYPES[media],
            "blake3": hashlib.sha256(body).hexdigest(),
            "size": len(body),
            "expires_at_ms": expires_at_ms,
            "claimed_by": None,
        }
        self._rocrate_uploads[upload_id] = record
        expires = datetime.fromtimestamp(
            expires_at_ms / 1000, tz=timezone.utc
        ).isoformat()
        return {
            "status": 201,
            "upload_id": upload_id,
            "blake3": record["blake3"],
            "size": record["size"],
            "expires_at": expires,
            "owner_node_url": "local://",
        }

    @staticmethod
    def _rocrate_valid_source_path(path: str) -> bool:
        """validate_source_path (rocrate_import.rs:583-596): non-empty
        after trim, no '.'/'..' segments, no rooted/parent components."""
        path = path.strip()
        if not path or path.startswith("/"):
            return False
        return not any(p in (".", "..") for p in path.split("/"))

    @staticmethod
    def _rocrate_plan_digest(source, target, metadata) -> str:
        import hashlib
        import json as _json

        return hashlib.sha256(
            _json.dumps(
                [source, target, metadata], sort_keys=True
            ).encode()
        ).hexdigest()

    def submit_rocrate_import(
        self,
        source: dict,
        target: dict,
        metadata: dict,
        now_ms: int,
        user_id: str = "user-0",
        idempotency_key: str | None = None,
    ) -> dict:
        """POST /metadata/rocrate/imports (rocrate_import.rs:190-280):
        parse ladders first (source rs:282-324, target rs:326-338 —
        prefix trimmed of '/', rejected over the key cap / with
        backslash, control chars, or empty/./.. segments — metadata
        rs:340-353 via normalize_document_path), then the idempotency
        replay (same user+key+digest → the existing job, created
        False; digest mismatch → 409 JobPlanConflict,
        jobs/service.rs:246-276), then the fast source checks
        (rs:355-481): a staged upload must exist (404), be owned by
        the caller (403), be unclaimed — a claim by a job with the
        SAME dedup identity reclaims and SKIPS the expiry check
        (rs:370-393) — unexpired (400 'upload expired'), and under the
        import-source cap; an object source heads the key (404 when
        absent) and applies the same cap; a connector source validates
        the path and the connector's existence (the reference heads
        the remote source — ``staging/head_source.rs`` /
        ``staging/check_source.rs``, remote-I/O effect shims this
        facade's connector-registry lookup stands in for). A fresh
        create then
        enforces the active-job cap (jobs/submit.rs:213-228,366-377:
        strictly fewer than max_active_jobs active rows) and claims
        the upload. Returns the 202 envelope: job_id, created,
        owner_node_url, status_url, report_url."""
        kind = source.get("kind")
        if kind == "upload":
            if not source.get("upload_id"):
                return {"status": 400, "error": "BadRequest"}
        elif kind == "object":
            if not source.get("bucket") or not source.get("key"):
                return {"status": 400, "error": "BadRequest"}
        elif kind == "connector":
            if not source.get("group_id") or not source.get(
                "connector_id"
            ) or not self._rocrate_valid_source_path(
                source.get("path", "")
            ):
                return {"status": 400, "error": "BadRequest"}
        else:
            return {"status": 400, "error": "BadRequest"}

        prefix = (target.get("prefix") or "").strip("/")
        if (
            not target.get("bucket")
            or len(prefix) > self.ROCRATE_KEY_BYTES
            or "\\" in prefix
            or any(ord(c) < 0x20 or ord(c) == 0x7F for c in prefix)
            or (
                prefix
                and any(
                    p in ("", ".", "..") for p in prefix.split("/")
                )
            )
        ):
            return {"status": 400, "error": "BadRequest"}
        target = {"bucket": target["bucket"], "prefix": prefix}

        path = (metadata.get("path") or "").strip().strip("/")
        if not path or len(path) > self.ROCRATE_KEY_BYTES or not (
            metadata.get("group_id")
        ):
            return {"status": 400, "error": "BadRequest"}
        metadata = {
            "group_id": metadata["group_id"],
            "path": path,
            "public": bool(metadata.get("public", False)),
        }

        digest = self._rocrate_plan_digest(source, target, metadata)
        dedup_key = (
            (user_id, idempotency_key) if idempotency_key else None
        )
        if dedup_key and dedup_key in self._rocrate_dedup:
            job_id, existing_digest = self._rocrate_dedup[dedup_key]
            if job_id in self._rocrate_jobs:
                if existing_digest != digest:
                    return {
                        "status": 409,
                        "error": "JobPlanConflict",
                        "existing_job_id": job_id,
                    }
                return self._rocrate_job_envelope(job_id, created=False)

        if kind == "upload":
            record = self._rocrate_uploads.get(source["upload_id"])
            if record is None:
                return {"status": 404, "error": "NotFound"}
            if record["owner"] != user_id:
                return {"status": 403, "error": "Forbidden"}
            reclaimed = False
            if record["claimed_by"] is not None:
                claimed = self._rocrate_jobs.get(record["claimed_by"])
                same_identity = (
                    claimed is not None
                    and dedup_key is not None
                    and claimed.get("dedup_key") == dedup_key
                )
                if not same_identity:
                    return {
                        "status": 409,
                        "error": "upload is already claimed by job "
                        + str(record["claimed_by"]),
                    }
                reclaimed = True
            if not reclaimed and record["expires_at_ms"] <= now_ms:
                return {"status": 400, "error": "upload expired"}
            if record["size"] > self.ROCRATE_IMPORT_SOURCE_BYTES:
                return {
                    "status": 400,
                    "error": "upload exceeds the import source cap",
                }
        elif kind == "object":
            info = self.get_bucket_info(source["bucket"])
            if info["status"] != 200:
                return {"status": 404, "error": "NotFound"}
            head = self.head_object(source["key"], source["bucket"])
            if head.get("status") != 200:
                return {"status": 404, "error": "NotFound"}
            if (
                head.get("size") or 0
            ) > self.ROCRATE_IMPORT_SOURCE_BYTES:
                return {
                    "status": 400,
                    "error": "object exceeds the import source cap",
                }
        else:
            found = self._find_connector(
                source["group_id"], source["connector_id"]
            )
            if found is None:
                return {"status": 404, "error": "NotFound"}

        active = sum(
            1
            for j in self._rocrate_jobs.values()
            if j["created_by"] == user_id and j["active"]
        )
        if active >= self.ROCRATE_MAX_ACTIVE_JOBS:
            return {
                "status": 409,
                "error": "ActiveJobLimit",
                "limit": self.ROCRATE_MAX_ACTIVE_JOBS,
            }

        job_id = f"rcjob-{len(self._rocrate_jobs):06d}"
        self._rocrate_jobs[job_id] = {
            "job_id": job_id,
            "created_by": user_id,
            "dedup_key": dedup_key,
            "plan_digest": digest,
            "active": True,
            "spec": {
                "source": source,
                "target": target,
                "metadata": metadata,
            },
        }
        if dedup_key:
            self._rocrate_dedup[dedup_key] = (job_id, digest)
        if kind == "upload":
            self._rocrate_uploads[source["upload_id"]]["claimed_by"] = (
                job_id
            )
        return self._rocrate_job_envelope(job_id, created=True)

    @staticmethod
    def _rocrate_job_envelope(job_id: str, created: bool) -> dict:
        # job_urls (api/src/routes/jobs.rs:158-170)
        base = "local:/"
        return {
            "status": 202,
            "job_id": job_id,
            "created": created,
            "owner_node_url": "local://",
            "status_url": f"{base}/jobs/{job_id}",
            "report_url": f"{base}/jobs/{job_id}/report",
        }
