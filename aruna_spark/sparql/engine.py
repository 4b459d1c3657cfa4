"""SPARQL engine: parser + compiler + the reference's governance rules.

Mirrors the query entry path ``operations/src/metadata/api.rs:1141-1163`` →
``operations/src/metadata/handle.rs:4931-5012``: SELECT/ASK only, SERVICE
rejected, 64 KiB query cap (enforced in the parser), 10,000-row result cap
(``handle.rs:94-97``). The 10 s deadline and 8 MiB serialized cap are driver
I/O concerns (enforce at the API layer when collecting); the row cap is
part of the *plan* here, so Catalyst pushes the limit down.

Scale: the compiled plan is a pure DataFrame program over the ``triples``
table — constant triple-pattern positions become parquet pushdown filters,
BGP joins are struct equi-joins Catalyst plans (broadcast vs shuffle, AQE),
and nothing materializes driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from aruna_spark.sparql import algebra as A
from aruna_spark.sparql.compiler import Compiler
from aruna_spark.sparql.parser import (
    SparqlSyntaxError,
    UnsupportedQueryError,
    parse,
)
from aruna_spark.sparql.terms import TERM_SCHEMA

__all__ = [
    "SparqlEngine",
    "SparqlSyntaxError",
    "UnsupportedQueryError",
    "QueryCache",
    "default_cache",
    "GraphNotFoundError",
    "ResultTooLargeError",
    "QueryDeadlineError",
    "MAX_RESULT_ROWS",
    "MAX_RESULT_BYTES",
    "QUERY_DEADLINE_SECS",
    "graphs_digest",
    "credential_digest",
    "local_key",
    "remote_key",
]

MAX_RESULT_ROWS = 10_000  # handle.rs:95 (result row cap)
MAX_RESULT_BYTES = 8 * 1024 * 1024  # handle.rs:96 (serialized cap)
QUERY_DEADLINE_SECS = 10.0  # handle.rs:97 (evaluation deadline)


CACHE_MAX_ENTRIES = 512  # per-node LRU (SURVEY §2.11: 512 / 32 MiB / 30 s)
CACHE_MAX_BYTES = 32 * 1024 * 1024
CACHE_TTL_SECS = 30.0

# -- cache key derivation (operations/src/metadata/query_cache.rs) -----------
# The reference keys local entries by (scope kind tag, scope digest, query)
# so a hit can never expose graphs the caller could not evaluate itself
# (query_cache.rs:99-109), and keys fan-out entries additionally by the
# caller's credential digest + realm + fan-out shape, because remote
# partitions authorize on the forwarded credential (api.rs:2643-2672).
# Length prefixes keep concatenated components unambiguous (rs:27-31).
_NO_CREDENTIAL = b"aruna.metadata.query.anonymous"  # query_cache.rs:23
_TAG_EAGER, _TAG_LAZY, _TAG_FANOUT = 1, 2, 3  # query_cache.rs:20-22


def _push(h, data: bytes) -> None:
    h.update(len(data).to_bytes(8, "little"))
    h.update(data)


def graphs_digest(graph_iris) -> str:
    """Hex digest of an UNORDERED graph set (query_cache.rs:48-57):
    sorted + deduped so scope order never changes the key."""
    import hashlib

    h = hashlib.sha256()
    for g in sorted(set(graph_iris)):
        _push(h, g.encode())
    return h.hexdigest()


def credential_digest(
    auth: str | None = None, bearer_token: str | None = None
) -> str:
    """Fingerprint of the caller's credential (query_cache.rs:60-76).
    The bearer token is only ever hashed — never stored or logged."""
    import hashlib

    h = hashlib.sha256()
    _push(h, auth.encode() if auth is not None else _NO_CREDENTIAL)
    _push(
        h,
        bearer_token.encode() if bearer_token is not None else _NO_CREDENTIAL,
    )
    return h.hexdigest()


def local_key(kind: str, scope_digest: str, sparql: str) -> str:
    """Cache key for a locally evaluated query (query_cache.rs:99-109).

    ``kind`` is ``"eager"`` (caller named exact graphs) or ``"lazy"``
    (scope digest covers the RESOLVED visible graph set) — distinct tags
    so an eager key can never alias a lazy one."""
    import hashlib

    if kind == "eager":
        tag = _TAG_EAGER
    elif kind == "lazy":
        tag = _TAG_LAZY
    else:
        raise ValueError(f"unknown scope kind {kind!r}")
    h = hashlib.sha256()
    h.update(bytes([tag]))
    _push(h, scope_digest.encode())
    _push(h, " ".join(sparql.split()).encode())
    return h.hexdigest()


def remote_key(
    distributed: bool,
    realm_id: str,
    credential: str,
    graph_iris,
    sparql: str,
    allow_partial: bool = False,
    target_nodes=None,
) -> str:
    """Cache key for a merged fan-out result (query_cache.rs:112-146):
    partitioned by credential digest (remote partitions authorize on the
    forwarded credential), realm, mode, graph filter, and fan-out shape
    — two callers with different credentials NEVER share an entry."""
    import hashlib

    h = hashlib.sha256()
    h.update(bytes([_TAG_FANOUT]))
    h.update(bytes([1 if distributed else 0]))
    _push(h, realm_id.encode())
    _push(h, credential.encode())
    if graph_iris is None:
        h.update(b"\x00")
    else:
        h.update(b"\x01")
        _push(h, graphs_digest(graph_iris).encode())
    _push(h, " ".join(sparql.split()).encode())
    h.update(bytes([1 if allow_partial else 0]))
    if target_nodes is None:
        h.update(b"\x00")
    else:
        h.update(b"\x01")
        for n in sorted(target_nodes):
            _push(h, str(n).encode())
    return h.hexdigest()


class QueryCache:
    """Per-node LRU result cache: 512 entries / 32 MiB / 30 s TTL.

    Keyed by a fingerprint of the normalized query text; stores the
    COLLECTED rows (the reference caches serialized result pages, not
    plans). Eviction order: expired first, then LRU until both the
    entry and byte budgets hold. ``now_fn`` is injectable so tests can
    drive the TTL clock."""

    def __init__(
        self,
        max_entries: int = CACHE_MAX_ENTRIES,
        max_bytes: int = CACHE_MAX_BYTES,
        ttl_secs: float = CACHE_TTL_SECS,
        now_fn=None,
    ):
        import time
        from collections import OrderedDict

        self.max_entries = max_entries
        self.max_bytes = max_bytes
        self.ttl_secs = ttl_secs
        self._now = now_fn or time.monotonic
        self._entries: "OrderedDict[str, tuple[float, int, list]]" = (
            OrderedDict()
        )
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def fingerprint(text: str) -> str:
        import hashlib

        normalized = " ".join(text.split())
        return hashlib.sha256(normalized.encode()).hexdigest()

    def _drop(self, fp: str) -> None:
        _, nbytes, _, _ = self._entries.pop(fp)
        self._bytes -= nbytes

    def get(self, text: str, generation: int = 0) -> list | None:
        """``generation`` is the caller's visibility generation stamp,
        taken BEFORE the read (SURVEY §2.11 / query_cache.rs:15-50): an
        entry cached under an older generation is stale — any visibility
        change (grant/revoke, document create/delete) bumps the stamp
        and atomically invalidates every older entry."""
        fp = self.fingerprint(text)
        entry = self._entries.get(fp)
        if entry is None:
            self.misses += 1
            return None
        expires, _, gen, rows = entry
        if self._now() >= expires or gen < generation:
            self._drop(fp)
            self.misses += 1
            return None
        self._entries.move_to_end(fp)
        self.hits += 1
        return rows

    def put(
        self, text: str, rows: list, nbytes: int, generation: int = 0
    ) -> None:
        if nbytes > self.max_bytes:
            return  # larger than the whole budget: never cached
        fp = self.fingerprint(text)
        if fp in self._entries:
            self._drop(fp)
        self._entries[fp] = (
            self._now() + self.ttl_secs, nbytes, generation, rows,
        )
        self._bytes += nbytes
        while (
            len(self._entries) > self.max_entries
            or self._bytes > self.max_bytes
        ):
            self._drop(next(iter(self._entries)))


# Session-level default cache (VERDICT r3 next-round #7): the reference
# consults its per-node query cache on EVERY metadata query — caching is
# the default, not an opt-in (query_cache.rs, handle.rs:4931-5012). The
# scope-keyed entries make one shared process-wide cache safe across
# callers: keys digest the caller's resolved scope / request graphs, so
# a hit can never cross an authorization boundary.
_SHARED_CACHE: QueryCache | None = None
_USE_DEFAULT_CACHE = object()  # sentinel: "caller didn't choose"


def default_cache() -> QueryCache:
    """The process-wide shared :class:`QueryCache` (created lazily)."""
    global _SHARED_CACHE
    if _SHARED_CACHE is None:
        _SHARED_CACHE = QueryCache()
    return _SHARED_CACHE


class GraphNotFoundError(RuntimeError):
    """An explicitly-requested graph is not visible to the caller —
    indistinguishable from absent (handle.rs:4657-4700)."""


class ResultTooLargeError(RuntimeError):
    """Serialized result exceeded the 8 MiB cap (handle.rs:96)."""


class QueryDeadlineError(RuntimeError):
    """Evaluation exceeded the deadline; the Spark job group is
    cancelled cooperatively (handle.rs:94-97, 5023-5080)."""

_TERM_FIELDS = [f.name for f in TERM_SCHEMA.fields]


class SparqlEngine:
    """Compile and run SPARQL SELECT/ASK queries over a triples DataFrame.

    ``visible_graphs`` (optional, one ``graph_iri`` column) is the
    caller's authorization scope: when given, EVERY read is gated by a
    left-semi join against it — the reference's lazy visibility filter
    (``handle.rs:4657-4700,5668,5896``), where per-graph visibility is
    computed from the caller's glob grants. The scope table is per-caller
    and small relative to the store, so it broadcasts; the semi-join
    prunes before any pattern work.
    """

    def __init__(
        self,
        spark: SparkSession,
        triples: DataFrame,
        visible_graphs: DataFrame | None = None,
        fts_resolver=None,
    ):
        """``fts_resolver`` (optional, ``query -> DataFrame(subject,
        score_q)``) overrides the derived BM25 resolver. Pass one backed
        by the materialized postings store when ``triples`` IS the full
        store for a corpus — rebuilding postings from the triples scan
        per fts: query is the per-query-build anti-pattern. Scoped
        engines (``visible_graphs``) should keep the default derived
        resolver, which scores only the visible slice."""
        self.spark = spark
        self.visible_graphs = visible_graphs
        self._fts_override = fts_resolver
        self._scope_hex: str | None = None  # memoized resolved-scope digest
        if visible_graphs is not None:
            triples = triples.join(
                F.broadcast(visible_graphs.select("graph_iri")),
                "graph_iri",
                "left_semi",
            )
        self.triples = triples

    def substrate_digest(self) -> str:
        """Digest of the engine's triples RELATION (the analyzed plan,
        expression-ids normalized) — cache keys must bind the substrate,
        not just the visibility scope: two unscoped engines over
        DIFFERENT relations (fan-out shard slices, different corpora)
        would otherwise share the 'unrestricted' sentinel and serve each
        other's rows (found by ``test_fanout_merge_equals_global`` when
        caching became the default). The reference never hits this
        because each node caches over its one store; a process-wide
        cache spanning many engine substrates needs the plan identity."""
        if getattr(self, "_substrate_hex", None) is None:
            import hashlib

            # Catalyst's canonicalized plan normalizes attribute exprIds
            # positionally while leaving literal values intact — unlike a
            # blanket '#\d+' strip, which would also erase '#N' inside
            # data literals/paths and collide two substrates that differ
            # only in such a literal (cross-serving cached rows)
            normalized = (
                self.triples._jdf.queryExecution()
                .analyzed()
                .canonicalized()
                .toString()
            )
            self._substrate_hex = hashlib.sha256(
                normalized.encode()
            ).hexdigest()
        return self._substrate_hex

    def scope_digest(self) -> str:
        """Digest of the caller's RESOLVED visible-graph set, memoized
        per engine (the reference's lazy ScopeDigest,
        query_cache.rs:34-45): two engines share a cache entry only when
        their authorization resolved to the identical graph set. An
        unscoped engine (no visibility filter) uses a distinct sentinel
        that can never collide with a real graph set. The collect is the
        caller's grant set — bounded, and the same set the reference
        resolves per request."""
        if self._scope_hex is None:
            if self.visible_graphs is None:
                self._scope_hex = graphs_digest(["\x00aruna.scope.unrestricted"])
            else:
                rows = self.visible_graphs.select("graph_iri").collect()
                self._scope_hex = graphs_digest(r.graph_iri for r in rows)
        return self._scope_hex

    def check_graphs(self, graph_iris: list[str]) -> None:
        """Eager mode (handle.rs:4657-4700): a query naming explicit
        graphs requires ALL of them visible, else GraphNotFound — an
        invisible graph must be indistinguishable from a missing one.
        Bounded collect: the request's graph list, never the store."""
        if self.visible_graphs is None:
            return
        requested = self.spark.createDataFrame(
            [(g,) for g in graph_iris], "graph_iri string"
        )
        missing = requested.join(
            self.visible_graphs.select("graph_iri"), "graph_iri", "left_anti"
        ).collect()
        if missing:
            raise GraphNotFoundError(
                f"graph not found: {missing[0].graph_iri}"
            )

    def _fts_resolver(self, query: str) -> DataFrame:
        """BM25-scored subjects for fts:match — the injected store-backed
        resolver when configured, else built over THIS engine's triples
        (the reference's per-node Tantivy index is likewise derived from
        the same graphs the query runs on)."""
        if self._fts_override is not None:
            return self._fts_override(query)
        from aruna_spark.search.bm25 import (
            bm25_scores,
            build_field_literals,
            build_postings,
            validate_query,
        )

        postings = build_postings(build_field_literals(self.triples))
        return bm25_scores(postings, validate_query(query)).select(
            "subject", "score_q"
        )

    def query(self, text: str, enforce_limits: bool = True) -> DataFrame:
        """Parse + compile; SELECT yields term-struct columns, ASK a bool."""
        q = parse(text)
        compiler = Compiler(self.spark, self.triples, self._fts_resolver)
        if isinstance(q, A.AskQuery):
            return compiler.compile_ask(q)
        if (
            enforce_limits
            and q.limit is not None
            and q.limit > MAX_RESULT_ROWS
        ):
            # api.rs:1986-1994: an explicit LIMIT above the cap is an
            # error, not a silent truncation
            raise UnsupportedQueryError(
                f"LIMIT {q.limit} exceeds the {MAX_RESULT_ROWS}-row cap"
            )
        df = compiler.compile_select(q)
        if enforce_limits and q.limit is None:
            df = df.limit(MAX_RESULT_ROWS)
        return df

    def execute(
        self,
        text: str,
        deadline_secs: float = QUERY_DEADLINE_SECS,
        max_bytes: int = MAX_RESULT_BYTES,
        cache: "QueryCache | None" = _USE_DEFAULT_CACHE,  # type: ignore[assignment]
        generation: int = 0,
        graph_iris: list[str] | None = None,
    ) -> list:
        """Run a query with the reference's full governance envelope:
        10k-row cap (in the plan), 8 MiB serialized cap, a deadline
        that CANCELS the running Spark job group (the reference's
        cooperative cancellation, handle.rs:4740-4770), and an optional
        result cache consulted before any Spark job starts.

        Cache entries are keyed by (scope kind, scope digest, query) —
        NOT the query text alone — so one cache shared across callers
        with different visible-graph scopes can never serve caller A's
        rows to caller B (query_cache.rs:99-109). ``graph_iris`` is the
        eager mode: the caller named exact graphs (checked via
        :meth:`check_graphs`), and the key digests that request set;
        otherwise the lazy key digests this engine's resolved scope.

        ``cache`` defaults to the process-wide shared cache
        (:func:`default_cache`) — the reference consults its per-node
        cache on every query. Pass ``cache=None`` to opt out, or an
        explicit :class:`QueryCache` to scope caching yourself."""
        import threading
        import uuid

        if cache is _USE_DEFAULT_CACHE:
            cache = default_cache()
        # the scope component binds BOTH the caller's visibility and the
        # engine's substrate relation (see substrate_digest)
        sub = self.substrate_digest()
        if graph_iris is not None:
            key = local_key(
                "eager", f"{graphs_digest(graph_iris)}:{sub}", text
            )
        else:
            key = local_key("lazy", f"{self.scope_digest()}:{sub}", text)
        if cache is not None:
            cached = cache.get(key, generation)
            if cached is not None:
                return cached

        df = self.query_flat(text)
        sc = self.spark.sparkContext
        group = f"sparql-{uuid.uuid4().hex[:12]}"
        done = threading.Event()
        timed_out = threading.Event()

        def reaper():
            if not done.wait(deadline_secs):
                timed_out.set()
                sc.cancelJobGroup(group)

        sc.setJobGroup(group, "sparql execute", interruptOnCancel=True)
        t = threading.Thread(target=reaper, daemon=True)
        t.start()
        try:
            rows = df.collect()
        except Exception as e:  # noqa: BLE001 - cancelled jobs raise
            if timed_out.is_set():
                raise QueryDeadlineError(
                    f"query exceeded {deadline_secs}s deadline"
                ) from e
            raise
        finally:
            done.set()
            sc.setJobGroup("", "")
        size = sum(len(repr(r)) for r in rows)
        if size > max_bytes:
            raise ResultTooLargeError(
                f"serialized result {size} B exceeds {max_bytes} B"
            )
        if cache is not None:
            cache.put(key, rows, size, generation)
        return rows

    def query_flat(self, text: str, enforce_limits: bool = True) -> DataFrame:
        """Like :meth:`query`, with term-struct columns flattened to their
        lexical value (string) — the shape a SQL oracle can reproduce."""
        df = self.query(text, enforce_limits=enforce_limits)
        out = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType) and [
                x.name for x in f.dataType.fields
            ] == _TERM_FIELDS:
                out.append(F.col(f.name)["value"].alias(f.name))
            else:
                out.append(F.col(f.name))
        return df.select(*out)
