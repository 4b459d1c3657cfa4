"""Decade bench: the corpus-shaped headline queries at one sf dir.

Measures the scale-path (``_scaled``) dedup/similarity siblings, the
corpus sweeps (retention funnel, PII scan, repetition rules, mixing)
and two documented-linear baselines at a given scale, bench.py
discipline (untimed warmup builds the stored indexes, then min of two
timed runs through the noop sink). One invocation = one JVM = one
scale; run it per scale so no heap holds two scales' store state:

    python scripts/bench_decade.py /root/testdata/sf0.1 sf0.1
    python scripts/bench_decade.py .localdata/sf1  sf1
    python scripts/bench_decade.py .localdata/sf10 sf10

Each run upserts its scale into BENCH_DECADE.json:
{"sf0.1": {query: sec, ...}, "sf1": {...}, "sf10": {...},
 "loadavg": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark

# documents/embeddings readers only — the sf10 slice carries no other
# tables (scripts/make_sf10.py)
DECADE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_scaled",
    "dedup_clusters_scaled",
    "dedup_simhash_scaled",
    "dedup_ngram_scaled",
    "dedup_duplicate_spans",  # r11: winnowing substring-dedup pass
    "similarity_neardup_scaled",
    "dedup_semantic_cells",  # r11: SemDeDup on the sqrt cells
    "similarity_ivf_fixed64_demo",
    "similarity_ivf_sqrt_topk",
    # the per-query probe curve: FIXED 20-query set over the growing
    # corpus (queries/similarity.py ivf_sqrt_decade_probe)
    "ivf_sqrt_decade_probe",
    "corpus_retention_funnel",
    "textstats_pii_scan",
    "textstats_repetition",
    "corpus_mix_plan",
    "corpus_mix_sample",
    "corpus_pack_plan",
    "decontam_ngram_overlap",  # documented corpus-linear baseline
    "textstats_char_lm_quality",  # r11: CCNet-style quality proxy
    # r13 (VERDICT r12 Next #3): the registered blob-holder fixtures
    # key hashes by n_chars, whose distinct domain saturates across
    # decades — these corpus-proportional variants (one blob per
    # document, queries/blob_holders.py decade fixtures) measure the
    # actual corpus-linear scan + once-per-hash groupBy. The r12 rows
    # under the registered names remain in BENCH_DECADE.json as the
    # per-hash-cost (saturating) history.
    "blob_holders_refresh_decade",
    "blob_holders_get_decade",
    # r12: two corpus-linear document sweeps (bounded broadcast models)
    "dsir_importance_select",
    "textstats_c4_rules",
    # r13: the admin-document create-seed replay is event-log-sized
    # (≈8 events per document) — the antichain reduction's domination
    # join + per-path groupBy both ride the (target, path) key
    "crdt_admin_seed_replay",
    # r13: the serve gate is corpus-sized (one request per document,
    # three keyed left joins); the other r13 operators are request- or
    # config-sized and read tables absent from the sf10 slice
    "doc_serve_gate",
    # r14 (VERDICT r13 Next #4): the create-placement ladders on a
    # corpus-proportional request population (one per document —
    # queries/doc_placement.py load_create_requests_decade; the
    # registered orders-keyed fixture is unchanged)
    "registry_create_doc_placement_decade",
    # r14: the alias-aware crate rewrite (one crate per document,
    # Arrow-batched mapInPandas). crdt_realm_quota_replay is NOT here:
    # its realm population is config-sized (doc_id % 97 SATURATES —
    # the r12 blob-holders lesson); the admin reducer's corpus-scale
    # behavior is crdt_admin_seed_replay's row above.
    "archive_rewrite_enriched",
    # r14: URL canonicalization dedup (codegen canon + one groupBy on
    # the near-unique canonical key)
    "urlstats_canonicalize",
    # r14: rank-order n-gram LID (two explode+groupBy passes + the
    # langs x K broadcast model)
    "textstats_ngram_langid",
    # r14: cross-document line-level boilerplate dedup (one explode +
    # one source-scoped groupBy)
    "textstats_boilerplate_lines",
    # r15 (VERDICT r14 Next #5): the remaining r14 import/export
    # kernels. The registered layout/plan fixtures are already
    # archive-per-document (groupBys on the corpus-proportional
    # archive_id key); the report variant re-keys crates off
    # doc_id div 32 because the registered 31-crate key saturates.
    "archive_layout_inspect",
    "archive_import_plan",
    "export_report_rows_decade",
    # r15: the export identity/resolution/embedding kernels and the
    # validation envelopes — entity-per-document fixtures, keyed joins
    # or Arrow-batched Python kernels, all corpus-proportional
    "export_entity_identity",
    "export_resolve_candidates",
    "export_report_embed",
    "archive_validate_file_ids",
    "autoindex_dialect_entries",
    # r15: tokenizer induction — one corpus-linear tokenize+groupBy,
    # then vocabulary-bounded pair counting + TakeOrdered top-20
    "corpus_bpe_merge_candidates",
]

OUT = Path(__file__).resolve().parent.parent / "BENCH_DECADE.json"


def _resolve(name: str):
    if name in REGISTRY:
        return REGISTRY[name][0]
    from aruna_spark.queries import (
        blob_holders,
        doc_placement,
        export_plan,
        similarity,
    )

    for mod in (similarity, blob_holders, doc_placement, export_plan):
        if hasattr(mod, name):
            return getattr(mod, name)
    raise KeyError(name)


def main() -> None:
    sf_dir, label = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    load_all()
    spark = get_spark(f"aruna-decade-{label}")
    load_start = os.getloadavg()
    times: dict[str, float] = {}
    for name in DECADE_QUERIES:
        if only is not None and name not in only:
            continue
        fn = _resolve(name)
        # untimed warmup: store materialization + codegen
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        print(f"{label} {name}: {times[name]}s", flush=True)
    payload = json.loads(OUT.read_text()) if OUT.exists() else {}
    # merge (a filtered rerun must not drop earlier rows)
    payload.setdefault(label, {}).update(times)
    payload.setdefault("loadavg", {})[label] = {
        "start_1m_5m_15m": [round(x, 2) for x in load_start],
        "end_1m": round(os.getloadavg()[0], 2),
    }
    OUT.write_text(json.dumps(payload, indent=1, sort_keys=True) + "\n")
    print(json.dumps({label: times}))


if __name__ == "__main__":
    main()
