"""Distributed SPARQL fan-out: per-shard evaluation + dedup-union merge.

Mirrors the realm-wide query path (``operations/src/metadata/api.rs:2322``
``run_metadata_fanout``): the query must pass the union-safety shape
check, fans out to ≤32 nodes with ≤8 concurrent evaluations, each node
gets a 10 s deadline, the whole request 12 s (``api.rs:80-83``), and the
per-node row sets merge by exact-row dedup union cut at the query LIMIT
and the 10,000-row cap (``api.rs:2911-2959``).

In the Spark engine a realm-wide query normally runs as ONE distributed
job (sharding is what the cluster already does) — this harness exists for
the federated topology where each "node" is a separate triples store
(tested with sharded engines), and to reproduce the reference's
observable failure modes: shape-rejected queries, per-node timeouts,
node-count cap.

Concurrent `.collect()`s are safe in Spark (the scheduler interleaves
jobs); the thread pool bounds driver-side concurrency exactly like the
reference's semaphore.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor, as_completed

from aruna_spark.sparql.engine import MAX_RESULT_ROWS, SparqlEngine
from aruna_spark.sparql.parser import parse
from aruna_spark.sparql.shape import is_union_safe

MAX_CONCURRENT = 8  # api.rs:80
MAX_NODES = 32  # api.rs:81
NODE_DEADLINE_SECS = 10.0  # api.rs:82
TOTAL_DEADLINE_SECS = 12.0  # api.rs:83


class UnionUnsafeError(ValueError):
    """Query shape not mergeable by dedup union (api.rs:2092-2140)."""


class FanoutDeadlineError(RuntimeError):
    """The 12 s total fan-out deadline elapsed (api.rs:83)."""


def fanout_select(
    engines: list[SparqlEngine],
    text: str,
    node_deadline: float = NODE_DEADLINE_SECS,
    total_deadline: float = TOTAL_DEADLINE_SECS,
) -> list[tuple]:
    """Run a union-safe SELECT on every shard engine, merge the results.

    Returns the dedup-union of per-node rows (as tuples), cut at the
    query's LIMIT (if any) and the global 10k cap — the exact merge of
    ``aggregate_query_results`` (api.rs:2911-2959).
    """
    if len(engines) > MAX_NODES:
        raise ValueError(f"fan-out limited to {MAX_NODES} nodes")
    q = parse(text)
    if not is_union_safe(q):
        raise UnionUnsafeError(
            "distributed queries must be SELECT DISTINCT over single "
            "patterns or unions of single patterns"
        )
    limit = q.limit if q.limit is not None else MAX_RESULT_ROWS
    limit = min(limit, MAX_RESULT_ROWS)

    t0 = time.monotonic()
    merged: dict[tuple, None] = {}  # insertion-ordered row set
    with ThreadPoolExecutor(max_workers=MAX_CONCURRENT) as pool:
        futures = [
            pool.submit(eng.execute, text, deadline_secs=node_deadline)
            for eng in engines
        ]
        try:
            for fut in as_completed(
                futures,
                timeout=max(0.0, total_deadline - (time.monotonic() - t0)),
            ):
                for r in fut.result():
                    # dedup union; rows past LIMIT cannot change the set's
                    # first-LIMIT cut (api.rs:2938-2947)
                    merged.setdefault(tuple(r), None)
        except TimeoutError as e:
            for f in futures:
                f.cancel()
            raise FanoutDeadlineError("total fan-out deadline") from e
    return list(merged)[:limit]
