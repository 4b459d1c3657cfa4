"""Benchmark harness: runs EVERY registered query and prints one JSON line.

Driver contract: executes at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is timed end-to-end (plan + execute + noop-write the result)
after a JVM/session warmup; the reported value is the sum of per-query
times over the FULL registry (round-3 change — previously a 42-query
headline subset; the old headline total is still reported as
``headline_total`` for round-over-round comparison). A regression
anywhere in the registry now moves the reported numbers.

Modes:

- plain            — measure SF_DIR, write BENCH_FULL.json, print line
- ``--sf1``        — measure the synthetic sf1 (scripts/make_sf1.py),
                     write BENCH_FULL_SF1.json
- ``--pair``       — BOTH in one invocation, back-to-back (VERDICT r8
                     Next #7): the growth-ratio numerator and
                     denominator then share one contention
                     environment, so the band stops being re-litigated
                     each review; requires the sf1 directory to exist.
                     The sf1 leg runs in a FRESH subprocess JVM — one
                     heap holding both scales' checkpointed store
                     state OOMs (observed on the first combined run),
                     and separate JVMs match how the two artifacts
                     were always measured individually.

Every artifact records ``loadavg`` — (1m, 5m, 15m) at measurement
start and the 1m value at end — so a reviewer can see host contention
without rerunning.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ``python bench.py --sf1`` re-measures the FULL registry at the
# synthetic sf1 (10x sf0.1, scripts/make_sf1.py) and writes
# BENCH_FULL_SF1.json — the committed scale-rehearsal artifact (VERDICT
# r4 Next #10): growth ratios vs BENCH_FULL.json are the per-query
# scaling signal, re-measured every round instead of living in SCALE.md
# prose. The driver's plain invocation is unchanged.
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    str(Path(__file__).resolve().parent / ".localdata" / "sf1"),
)

# Round-2-comparable headline subset: one per operator family. The bench
# now TIMES every registered query; this list only scopes the
# ``headline_total`` figure reported alongside for r2 comparison.
HEADLINE = [
    # relational substrate
    "rel_pricing_summary",
    "rel_shipping_priority",
    "rel_region_revenue",
    "rel_agg_kinds",
    "rel_latest_order_per_customer",
    "rel_setops",
    "rel_exists_semi_anti",
    "rel_keyset_page",
    "rel_events_hourly",
    # SPARQL engine
    "sparql_bgp_filter",
    "sparql_group_agg",
    "sparql_path_plus",
    # search plane
    "search_bm25_topk",
    # LLM-pipeline operators
    "textstats_profile",
    "dedup_exact",
    "dedup_minhash_pairs",
    "similarity_topk_bruteforce",
    "similarity_lsh_topk",
    # catalog / aggregation planes
    "listing_v2_root",
    "usage_counters_by_group",
    "perm_visible_summary",
    "backlinks_grouped",
    # object / staging planes
    "s3_put_upsert",
    "s3_get_object",
    "staging_list_recursive",
    "autoindex_parse_entries",
    # ingest + streaming + snapshots
    "archive_import_rewrite",
    "stream_dashboard_epoch",
    "usage_snapshot_realms",
    # round-2 additions: merge, stateful debounce, codecs, summary views
    "registry_incremental_merge",
    "stream_debounce_timer",
    "multimodal_png_roundtrip",
    "corpus_rollup_stats",
    "s3_multipart_complete",
    "rocrate_export_summary",
    "search_describe_hits",
    "dedup_clusters",
    "similarity_ivf_topk",
    "sparql_path_star",
    "stream_sliding_window_counts",
    "multimodal_wav_roundtrip",
    "graph_snapshot_orphan_skip",
]


def measure(spark, sf_dir: str) -> dict:
    """Warm up, time the full registry (min of two runs per query),
    measure ingest throughput, and return the payload dict with the
    FULL per-query times under "queries"."""
    load_start = os.getloadavg()
    names = list(REGISTRY)

    # Warmup: execute every query once UNTIMED through the same
    # noop-write path, so JVM/codegen/fs-cache warmup is paid before any
    # timer starts (the first timed query otherwise absorbs ~10-20 s of it).
    sc = spark.sparkContext
    for name in names:
        fn, _ = REGISTRY[name]
        sc.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Min of two timed runs per query: transient host contention (other
    # tenants on this VM) was observed inflating single runs 3-6x; the
    # min is the steady-state capability of the plan, which is what
    # round-over-round comparison needs. Jobs are labelled per query
    # (guide §1.5) so the UI / history server maps stages back to
    # queries; the label call is driver-side and set BEFORE the timer.
    times: dict[str, float] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        best = float("inf")
        for i in range(2):
            sc.setJobDescription(f"bench: {name} (run {i + 1})")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    sc.setJobDescription(None)

    # Document-create throughput — the reference's only published
    # performance gate (BASELINE.md: best >= 1,000 doc-creates/s,
    # operations/tests/metadata_throughput.rs:76,119-123). Batch analog:
    # full JSON-LD documents pushed through validation + typing rules +
    # triples projection (ingest_jsonld). Crates are pre-built untimed;
    # the timed span is the create path itself.
    from pyspark.sql import functions as F

    from aruna_spark.ingest.doc_triples import load_triples
    from aruna_spark.ingest.jsonld import export_rocrate, ingest_jsonld

    crates = export_rocrate(load_triples(spark, sf_dir)).select(
        F.regexp_extract("graph_iri", r"([^/]+)$", 1).alias("document_id"),
        "jsonld",
    )
    # materialize the crates (localCheckpoint) so the timed span runs
    # ONLY the create path, not the untimed crate-building export
    crates = crates.localCheckpoint(eager=True)
    n_docs = crates.count()
    t0 = time.time()
    ingest_jsonld(crates).write.format("noop").mode("overwrite").save()
    ingest_secs = time.time() - t0
    docs_per_sec = round(n_docs / ingest_secs, 1)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    headline_total = round(
        sum(t for n, t in times.items() if n in HEADLINE), 3
    )
    return {
        "metric": "registry_query_wall_clock_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "n_queries": len(times),
        "headline_total": headline_total,
        "ingest_docs_per_sec": docs_per_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg": {
            "start_1m_5m_15m": [round(x, 2) for x in load_start],
            "end_1m": round(os.getloadavg()[0], 2),
        },
    }


def _write_full(payload: dict, full_name: str) -> None:
    full_path = Path(__file__).resolve().parent / full_name
    full_path.write_text(
        json.dumps(payload, indent=1, sort_keys=True) + "\n",
        encoding="utf-8",
    )


def _compact(payload: dict) -> str:
    # The printed line must fit the driver's tail-capture buffer
    # (BENCH_r03 overflowed it with the full 109-query dict and came back
    # parsed:null — VERDICT r3 'What's wrong' #2). Print a COMPACT line
    # whose "queries" dict holds only the r2-comparable headline subset;
    # the full per-query dict lives in BENCH_FULL*.json.
    return json.dumps(
        {
            **payload,
            "queries": {
                n: t for n, t in payload["queries"].items() if n in HEADLINE
            },
        }
    )


def main() -> None:
    pair = "--pair" in sys.argv
    sf1_only = "--sf1" in sys.argv
    if (pair or sf1_only) and not os.path.isdir(SF1_DIR):
        sys.exit(f"{SF1_DIR} missing — generate with scripts/make_sf1.py")
    load_all()
    spark = get_spark("aruna-bench")

    if sf1_only:
        payload = measure(spark, SF1_DIR)
        _write_full(payload, "BENCH_FULL_SF1.json")
        # every invocation prints the compact payload line — a driver
        # capturing an --sf1 run's stdout still gets a result (the
        # compact line is headline-subset sized, so the tail-capture
        # buffer concern does not apply)
        print(_compact(payload))
        return
    payload = measure(spark, SF_DIR)
    _write_full(payload, "BENCH_FULL.json")
    if pair:
        # back-to-back, fresh JVM for the big leg (see module doc)
        import subprocess

        spark.stop()
        subprocess.run(
            [sys.executable, __file__, "--sf1"], check=True
        )
    print(_compact(payload))


if __name__ == "__main__":
    main()
