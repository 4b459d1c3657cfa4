"""Oracle-checked JSON-LD ingest + RO-Crate export queries.

``ingest_jsonld_typing`` builds real JSON-LD documents (in SQL, from the
documents table), runs them through the Python projector
(:func:`aruna_spark.ingest.jsonld.ingest_jsonld`), and aggregates the
resulting triples by (predicate, kind, datatype, lang) — the DuckDB
oracle derives the same counts straight from ``documents``, so every
typing rule (ints, floats, bools, lang tags, typed literals, IRI refs,
lists, multi-@type) is value-checked end to end.

``rocrate_export_page`` exports per-graph JSON-LD documents (no SQL
oracle — JSON string equality is asserted by the roundtrip test in
``tests/test_jsonld.py`` instead: export → ingest ≡ identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.mat import DISK_ONLY

from aruna_spark.catalog import load_table
from aruna_spark.ingest.doc_triples import (
    GRAPH_NS,
    TRIPLES_ORACLE_SQL,
    load_triples,
)
from aruna_spark.ingest.jsonld import export_rocrate, ingest_jsonld
from aruna_spark.queries import register

# one JSON-LD document per documents row, exercising every typing rule
_JSON_SPARK = (
    """concat(
    '{"@id":"urn:aruna:doc:', doc_id, '",',
    '"@type":', CASE WHEN doc_id % 5 = 0 THEN '"Dataset"'
                     ELSE '["File","CreativeWork"]' END, ',',
    '"name":"doc-', doc_id, '",',
    '"contentSize":', n_chars, ',',
    '"active":', CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END, ',',
    '"score":', n_chars, '.5,',
    '"label":{"@value":"hallo","@language":"', lang, '"},',
    '"created":{"@value":"2024-01-01","@type":"xsd:date"},',
    '"partOf":{"@id":"urn:aruna:collection:', doc_id % 7, '"},',
    '"tags":["t1","t2"]}'
)"""
)


@register(
    "ingest_jsonld_typing",
    oracle="""
    SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS predicate,
           'iri' AS object_kind, NULL AS object_datatype, NULL AS object_lang,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END) AS BIGINT) AS n
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/name', 'literal', NULL, NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/contentSize', 'literal',
           'http://www.w3.org/2001/XMLSchema#integer', NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/active', 'literal',
           'http://www.w3.org/2001/XMLSchema#boolean', NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/score', 'literal',
           'http://www.w3.org/2001/XMLSchema#double', NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/label', 'literal', NULL, lang, COUNT(*)
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'http://schema.org/created', 'literal',
           'http://www.w3.org/2001/XMLSchema#date', NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/partOf', 'iri', NULL, NULL, COUNT(*)
    FROM documents
    UNION ALL
    SELECT 'http://schema.org/tags', 'literal', NULL, NULL, 2 * COUNT(*)
    FROM documents
    """,
)
def ingest_jsonld_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JSON parsing through mapInPandas, typing rules aggregated."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("document_id"),
        F.expr(_JSON_SPARK).alias("jsonld"),
    )
    triples = ingest_jsonld(docs)
    return triples.groupBy(
        "predicate", "object_kind", "object_datatype", "object_lang"
    ).agg(F.count(F.lit(1)).alias("n"))


_PAGE_LIMIT = 2
_PAGE_OFFSET = 0
_PAGE_GRAPHS = 10


@register(
    "rocrate_export_page",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL}),
    scoped AS (
      SELECT * FROM triples
      WHERE graph_iri IN (SELECT '{GRAPH_NS}' || doc_id FROM documents
                          WHERE doc_id < {_PAGE_GRAPHS})
         OR graph_iri IN (SELECT 'https://w3id.org/aruna/coll' || k
                          FROM (SELECT DISTINCT doc_id % 7 AS k FROM documents))
    ),
    ents AS (
      SELECT DISTINCT graph_iri, entity FROM (
        SELECT graph_iri, subject AS entity FROM scoped
        UNION ALL
        SELECT graph_iri, object_value FROM scoped WHERE object_kind = 'iri'
      )
    ),
    ranked AS (
      SELECT graph_iri, entity,
             ROW_NUMBER() OVER (PARTITION BY graph_iri ORDER BY entity) - 1 AS rn
      FROM ents
    ),
    totals AS (
      SELECT graph_iri, COUNT(*) AS total_data_entities FROM ents GROUP BY graph_iri
    ),
    page AS (
      SELECT graph_iri,
             CAST(COUNT(*) AS BIGINT) AS returned_data_entities,
             string_agg(entity, ',' ORDER BY entity) AS page_entities,
             MAX(entity) AS last_entity
      FROM ranked
      WHERE rn >= {_PAGE_OFFSET} AND rn < {_PAGE_OFFSET} + {_PAGE_LIMIT}
      GROUP BY graph_iri
    )
    SELECT t.graph_iri,
           CAST(t.total_data_entities AS BIGINT) AS total_data_entities,
           p.returned_data_entities,
           p.page_entities,
           CASE WHEN {_PAGE_OFFSET} + p.returned_data_entities < t.total_data_entities
                THEN CAST({_PAGE_OFFSET} + p.returned_data_entities AS BIGINT)
                END AS next_offset,
           CASE WHEN {_PAGE_OFFSET} + p.returned_data_entities < t.total_data_entities
                THEN p.last_entity END AS next_cursor
    FROM totals t JOIN page p USING (graph_iri)
    """,
)
def rocrate_export_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RO-Crate PAGE view: the ``MetadataRoCratePage`` contract
    (``core/src/metadata.rs:657-664``) — per-graph data-entity paging
    with ``total_data_entities`` / ``returned_data_entities`` /
    ``next_offset`` / keyset ``next_cursor`` (``operations/src/metadata/
    api.rs:1927-1945`` clamps limit to 1..1000; route behavior pinned at
    ``api/src/routes/metadata.rs:2470-2495``: limit=2 over 3 data
    entities → total 3, returned 2, next_offset 2, cursor set).

    A graph's data entities are its subjects plus every IRI it
    references (document, parent collection, conformsTo profile).
    Paging is window-ranked per graph — one shuffle on ``graph_iri``,
    no driver-side iteration, scales to any number of graphs.

    The JSON-LD body itself is covered by the export↔ingest roundtrip
    test (``tests/test_jsonld.py``); this query oracle-checks the paging
    contract the round-2 exemption left unchecked (VERDICT r2 item 4).
    """
    doc_graphs = [f"{GRAPH_NS}{i}" for i in range(_PAGE_GRAPHS)]
    t = load_triples(spark, sf_dir)
    scoped = t.filter(
        F.col("graph_iri").isin(doc_graphs)
        | F.col("graph_iri").startswith("https://w3id.org/aruna/coll")
    )
    return rocrate_page(
        crate_entities(scoped), _PAGE_LIMIT, offset=_PAGE_OFFSET
    )


def crate_entities(scoped: DataFrame) -> DataFrame:
    """A crate's data entities: its subjects plus every IRI it
    references (document, parent collection, conformsTo profile) —
    distinct per graph.

    r16: ONE pass — a conditional array + explode replaces the
    two-branch union (the r15 documents_to_triples single-scan pattern),
    halving the triples derivation this relation's consumers pay."""
    return (
        scoped.select(
            "graph_iri",
            F.explode(
                F.array(
                    F.col("subject"),
                    F.when(
                        F.col("object_kind") == "iri", F.col("object_value")
                    ),
                )
            ).alias("entity"),
        )
        .filter(F.col("entity").isNotNull())
        .distinct()
    )


def rocrate_page(
    ents: DataFrame,
    limit: int,
    offset: int = 0,
    after_cursor: DataFrame | None = None,
    consumed: int = 0,
) -> DataFrame:
    """One ``MetadataRoCratePage`` (core/src/metadata.rs:657-664) over a
    per-graph ``(graph_iri, entity)`` relation — the paging contract of
    ``handle.rs:1853-1905`` / ``api/src/routes/metadata.rs:950-978``:
    first request pages by ``offset``; resumption passes the previous
    page's ``next_cursor`` as ``after_cursor`` ``(graph_iri, cursor)``
    rows — a keyset predicate, so later pages filter-then-rank the
    remainder instead of re-ranking (and discarding) everything before
    the cursor. Graphs absent from ``after_cursor`` are finished and do
    not reappear. ``consumed`` is the entity count already returned per
    surviving graph (uniform across them: a graph survives only by
    filling every prior page), used for the ``next_offset`` envelope.
    """
    from pyspark.sql import Window

    scoped = ents
    base = offset
    if after_cursor is not None:
        scoped = (
            ents.join(F.broadcast(after_cursor), "graph_iri")
            .filter(F.col("entity") > F.col("cursor"))
            .drop("cursor")
        )
        base = consumed
    w = Window.partitionBy("graph_iri").orderBy("entity")
    ranked = scoped.withColumn("rn", F.row_number().over(w) - F.lit(1))
    if after_cursor is None:
        # first page: the per-graph total is a count over the SAME
        # window partition (r16) — one shuffle serves rank + total +
        # the page aggregate (the agg reuses the window's hash
        # partitioning), and the totals-side join disappears. The old
        # shape derived `ents` twice (totals groupBy + window) and
        # joined the halves back together.
        ranked = ranked.withColumn(
            "total_data_entities",
            F.count(F.lit(1)).over(Window.partitionBy("graph_iri")),
        )
        totals_agg = [F.max("total_data_entities").alias(
            "total_data_entities"
        )]
    else:
        # resumption: the cursor filter runs BEFORE the window, so the
        # per-graph total must still count the unfiltered relation —
        # keep the separate totals aggregate + join here
        totals = ents.groupBy("graph_iri").agg(
            F.count(F.lit(1)).alias("total_data_entities")
        )
        totals_agg = []
    lo = offset if after_cursor is None else 0
    page = (
        ranked.filter((F.col("rn") >= lo) & (F.col("rn") < lo + limit))
        .groupBy("graph_iri")
        .agg(
            F.count(F.lit(1)).alias("returned_data_entities"),
            F.concat_ws(",", F.sort_array(F.collect_list("entity"))).alias(
                "page_entities"
            ),
            F.max("entity").alias("last_entity"),
            *totals_agg,
        )
    )
    if after_cursor is not None:
        page = totals.join(page, "graph_iri")
    more = F.lit(base) + F.col("returned_data_entities") < F.col(
        "total_data_entities"
    )
    return page.select(
        "graph_iri",
        "total_data_entities",
        "returned_data_entities",
        "page_entities",
        F.when(
            more,
            (F.lit(base) + F.col("returned_data_entities")).cast(
                "bigint"
            ),
        ).alias("next_offset"),
        F.when(more, F.col("last_entity")).alias("next_cursor"),
    )


_N_IMPORT = 20


@register(
    "archive_import_rewrite",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL})
    SELECT replace(graph_iri, '{GRAPH_NS}', '{GRAPH_NS}imp') AS graph_iri,
           replace(subject, 'urn:aruna:doc:', 'urn:aruna:doc:imp') AS subject,
           predicate, object_kind, object_value,
           CAST(object_datatype AS VARCHAR) AS object_datatype,
           CAST(object_lang AS VARCHAR) AS object_lang
    FROM triples
    WHERE graph_iri IN (SELECT '{GRAPH_NS}' || doc_id FROM documents
                        WHERE doc_id < {_N_IMPORT})
    """,
)
def archive_import_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive import (.eln): export the first {_N_IMPORT} document
    graphs as crates, import each under a NEW document id with its
    subject IRI in the rewrite-target map — external IRIs (collections,
    profiles) pass through untouched (jobs/import/rewrite.rs:46-92).
    The result is the rewritten triples, checked against a direct
    SQL derivation."""
    from aruna_spark.ingest.archive import import_crates

    graphs = [f"{GRAPH_NS}{i}" for i in range(_N_IMPORT)]
    triples = load_triples(spark, sf_dir).filter(
        F.col("graph_iri").isin(graphs)
    )
    crates = export_rocrate(triples)
    old_id = F.regexp_extract("graph_iri", r"/([0-9]+)$", 1)
    return import_crates(
        crates.select(
            F.concat(F.lit("imp"), old_id).alias("document_id"),
            "jsonld",
            F.concat(
                F.lit('{"urn:aruna:doc:'),
                old_id,
                F.lit('":"urn:aruna:doc:imp'),
                old_id,
                F.lit('"}'),
            ).alias("targets_json"),
        )
    )


# --------------------------------------------------- RO-Crate summary view
@register(
    "rocrate_export_summary",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL})
    SELECT graph_iri,
           COUNT(DISTINCT subject) AS n_entities,
           COUNT(*) AS n_triples,
           string_agg(DISTINCT CASE WHEN predicate LIKE '%22-rdf-syntax-ns#type'
                                    THEN object_value END, ','
                      ORDER BY CASE WHEN predicate LIKE '%22-rdf-syntax-ns#type'
                                    THEN object_value END) AS entity_types
    FROM triples GROUP BY graph_iri
    """,
)
def rocrate_export_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RO-Crate SUMMARY view (``core/src/metadata.rs:658-664``,
    route ``api/src/routes/metadata.rs:950-978``): per-graph entity and
    triple counts plus the sorted set of entity types — the cheap
    metadata view served without assembling the full JSON-LD document.
    One partial-aggregated groupBy over the graph scan."""
    triples = load_triples(spark, sf_dir)
    is_type = F.col("predicate").endswith("22-rdf-syntax-ns#type")
    return triples.groupBy("graph_iri").agg(
        F.countDistinct("subject").alias("n_entities"),
        F.count(F.lit(1)).alias("n_triples"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_set(F.when(is_type, F.col("object_value")))
            ),
        ).alias("entity_types"),
    )


# ------------------------------------- graph snapshot with orphan skipping
@register(
    "graph_snapshot_orphan_skip",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL}),
    augmented AS (
      SELECT * FROM triples
      UNION ALL
      SELECT 'https://w3id.org/aruna/' || doc_id,
             'urn:aruna:orphan:' || doc_id,
             'http://schema.org/name', 'literal', 'ghost-' || doc_id,
             NULL, NULL
      FROM documents
    ),
    roots AS (
      SELECT DISTINCT graph_iri,
             CASE WHEN graph_iri LIKE '%/coll%'
                  THEN 'urn:aruna:collection:'
                       || regexp_extract(graph_iri, 'coll([0-9]+)$', 1)
                  ELSE 'urn:aruna:doc:'
                       || regexp_extract(graph_iri, '/([0-9]+)$', 1) END AS root
      FROM augmented
    ),
    referenced AS (
      SELECT DISTINCT graph_iri, object_value AS subject FROM augmented
      WHERE object_kind = 'iri'
    )
    SELECT a.graph_iri,
           CAST(COUNT(CASE WHEN a.subject = r.root
                           OR ref.subject IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(COUNT(CASE WHEN a.subject <> r.root
                           AND ref.subject IS NULL THEN 1 END) AS BIGINT)
             AS n_skipped
    FROM augmented a
    JOIN roots r ON r.graph_iri = a.graph_iri
    LEFT JOIN referenced ref
      ON ref.graph_iri = a.graph_iri AND ref.subject = a.subject
    GROUP BY a.graph_iri
    """,
)
def graph_snapshot_orphan_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph snapshot scan that SKIPS orphaned entities
    (``operations/src/metadata/handle.rs:4931-5021``: the full-quad dump
    excludes entities neither rooted nor referenced). Each graph is
    augmented with a synthetic unreferenced 'ghost' entity; the snapshot
    keeps a triple iff its subject is the graph root or is referenced as
    an object IRI inside the same graph, and reports kept/skipped per
    graph (every ghost must land in n_skipped).

    Scale: root extraction is a column expression on graph_iri; the
    reachability check is one aggregated self-join per graph — both
    shuffle on graph_iri only."""
    triples = load_triples(spark, sf_dir)
    ghosts = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit(GRAPH_NS), F.col("doc_id").cast("string")).alias(
            "graph_iri"
        ),
        F.concat(F.lit("urn:aruna:orphan:"), F.col("doc_id").cast("string")).alias(
            "subject"
        ),
        F.lit("http://schema.org/name").alias("predicate"),
        F.lit("literal").alias("object_kind"),
        F.concat(F.lit("ghost-"), F.col("doc_id").cast("string")).alias(
            "object_value"
        ),
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
    )
    aug = triples.unionByName(ghosts)
    root = F.when(
        F.col("graph_iri").contains("/coll"),
        F.concat(
            F.lit("urn:aruna:collection:"),
            F.regexp_extract("graph_iri", r"coll([0-9]+)$", 1),
        ),
    ).otherwise(
        F.concat(
            F.lit("urn:aruna:doc:"),
            F.regexp_extract("graph_iri", r"/([0-9]+)$", 1),
        )
    )
    referenced = (
        aug.filter(F.col("object_kind") == "iri")
        .select(
            F.col("graph_iri").alias("ref_graph"),
            F.col("object_value").alias("ref_subject"),
        )
        .distinct()
    )
    marked = aug.withColumn("root", root).join(
        referenced,
        (F.col("graph_iri") == F.col("ref_graph"))
        & (F.col("subject") == F.col("ref_subject")),
        "left",
    )
    keep = (F.col("subject") == F.col("root")) | F.col("ref_subject").isNotNull()
    return marked.groupBy("graph_iri").agg(
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_skipped"),
    )


# --------------------------------------- alias-aware enriched rewrite
# The import job's FULL rewrite pass (jobs/import/rewrite.rs +
# jobs/rocrate_jsonld.rs) over five crate shapes (lane = doc_id % 5,
# no row filter — congruence-safe):
#   0: RO-Crate 1.1 context, plain keys — compact localPath/contentUrl
#      enrichment (rs:255-273) AND the 1.1 context gains the
#      {"localPath": IRI} mapping (ensure_local_context, rs:335-362);
#   1: the context ALIASES @id/@graph ("identifier"/"graph",
#      rocrate_jsonld.rs:26-40) — the rewrite still lands;
#   2: the entity id lacks the './' prefix the target map uses —
#      expanded_id (rs:210-219) resolves both against the fixed base —
#      and the context REDEFINES localPath, so enrichment falls back
#      to the full-IRI key (term_matches, rocrate_jsonld.rs:50-57);
#   3: a second entity references the file id as a RAW STRING — a
#      warning, never a rewrite (rs:283-287);
#   4: the entity id carries a literal space and the target is
#      %20-encoded — normalize_ids (rs:166-189) canonicalizes before
#      matching.
_REWRITE_LANES_ORACLE = """
    SELECT 'doc-' || doc_id AS document_id,
           'https://w3id.org/doc/' || doc_id AS out_id,
           'data/file-' || doc_id || '.txt' AS local_path,
           'https://w3id.org/hash/' || doc_id AS content_url,
           CASE WHEN doc_id % 5 = 2 THEN 'iri' ELSE 'compact' END
             AS local_path_key,
           CAST(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END AS BIGINT)
             AS n_warnings,
           CASE WHEN doc_id % 5 = 3
                THEN './file-' || doc_id || '.txt' END AS first_warning,
           doc_id % 5 = 0 AS has_local_ctx
    FROM documents
"""


@register("archive_rewrite_enriched", oracle=_REWRITE_LANES_ORACLE)
def archive_rewrite_enriched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the alias-aware enriched rewrite
    (:func:`aruna_spark.ingest.archive.rewrite_document_enriched` —
    jobs/import/rewrite.rs:77-120) over one crate per document and
    surface the envelope: the rewritten id, the localPath/contentUrl
    enrichment (and WHICH key carried it), the raw-string warnings,
    and whether a 1.1 crate gained the localPath context mapping.
    Arrow-batched mapInPandas, partition-parallel over crates —
    corpus-linear, no shuffle."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from aruna_spark.ingest.archive import (
        LOCAL_PATH_IRI,
        rewrite_document_enriched,
    )
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)

    def crate_for(doc_id: int) -> tuple[str, dict]:
        lane = doc_id % 5
        fid = f"./file-{doc_id}.txt"
        target = {
            "w3id": f"https://w3id.org/doc/{doc_id}",
            "hash_w3id": f"https://w3id.org/hash/{doc_id}",
            "local_path": f"data/file-{doc_id}.txt",
        }
        if lane == 0:
            crate = {
                "@context": "https://w3id.org/ro/crate/1.1/context",
                "@graph": [{"@id": fid, "name": f"File {doc_id}"}],
            }
            return _json.dumps(crate), {fid: target}
        if lane == 1:
            crate = {
                "@context": {"identifier": "@id", "graph": "@graph"},
                "graph": [
                    {"identifier": fid, "name": f"File {doc_id}"}
                ],
            }
            return _json.dumps(crate), {fid: target}
        if lane == 2:
            crate = {
                "@context": {"localPath": "https://example.org/other"},
                "@graph": [
                    {
                        "@id": f"file-{doc_id}.txt",
                        "name": f"File {doc_id}",
                    }
                ],
            }
            return _json.dumps(crate), {fid: target}
        if lane == 3:
            crate = {
                "@context": "https://w3id.org/ro/crate/1.2/context",
                "@graph": [
                    {"@id": fid, "name": f"File {doc_id}"},
                    {"@id": "./ro-crate-metadata.json", "about": fid},
                ],
            }
            return _json.dumps(crate), {fid: target}
        crate = {
            "@graph": [
                {"@id": f"./file {doc_id}.txt", "name": f"File {doc_id}"}
            ]
        }
        return _json.dumps(crate), {f"./file%20{doc_id}.txt": target}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "document_id",
            "out_id",
            "local_path",
            "content_url",
            "local_path_key",
            "n_warnings",
            "first_warning",
            "has_local_ctx",
        ]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                jsonld, targets = crate_for(doc_id)
                out, warnings = rewrite_document_enriched(
                    jsonld, targets
                )
                doc = _json.loads(out)
                kw_graph = None
                for key in ("@graph", "graph"):
                    if isinstance(doc.get(key), list):
                        kw_graph = doc[key]
                        break
                ent = kw_graph[0]
                out_id = ent.get("@id") or ent.get("identifier")
                compact = "localPath" in ent
                context = doc.get("@context")
                ctx_list = (
                    context if isinstance(context, list) else [context]
                )
                has_local_ctx = any(
                    isinstance(v, dict)
                    and v.get("localPath") == LOCAL_PATH_IRI
                    for v in ctx_list
                )
                rows.append(
                    (
                        f"doc-{doc_id}",
                        out_id,
                        ent.get("localPath")
                        if compact
                        else ent.get(LOCAL_PATH_IRI),
                        ent.get("contentUrl"),
                        "compact" if compact else "iri",
                        len(warnings),
                        warnings[0] if warnings else None,
                        has_local_ctx,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    from aruna_spark.ops.text import spread_for_cpu

    # the crate build + rewrite is Python-per-row work off a tiny
    # narrow scan — spread past the byte-sized split plan (ops/text)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "document_id string, out_id string, local_path string, "
        "content_url string, local_path_key string, n_warnings long, "
        "first_warning string, has_local_ctx boolean",
    )


# ------------------------------------------------ archive layout inspection
# jobs/import/archive.rs:576-749 (the Validate phase's entry-listing
# kernels; the ZIP byte readers stay excluded). Lane = doc_id % 8, the
# signature / stray / unsafe sub-lanes on moduli 3 and 5 (coprime with
# 8 — CRT-safe):
#   0: plain root crate (non-eln) — ok, one payload whose raw path
#      needs normalization ('./data//file.txt' collapses, rs:678-700);
#   1: .eln under a single wrapper dir — ok, wrapper strips, payload
#      modes exercise the untyped/regular/directory gate (rs:732-749);
#   2: .eln with ROOT metadata — 'ELN archive requires a single
#      wrapper directory' (rs:633-635);
#   3: wrapper + a stray top-level entry (d%3==0: a FILE named exactly
#      like the wrapper — the reference's layout_rejects_file case) —
#      fail (rs:636-646);
#   4: no metadata descriptor (rs:648);
#   5: root AND wrapper descriptors — ambiguous (rs:649-651);
#   6: an unsafe entry path (rooted / '..' / traversal / DOS drive /
#      backslash by d%5) — normalization rejects before layout;
#   7: a symlink-mode entry — reject_special_entry fires.
@register(
    "archive_layout_inspect",
    oracle="""
    SELECT 'arc-' || doc_id AS archive_id,
           CASE doc_id % 8
             WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
             WHEN 2 THEN 'eln_requires_wrapper'
             WHEN 3 THEN 'stray_top_level'
             WHEN 4 THEN 'no_metadata'
             WHEN 5 THEN 'ambiguous_metadata'
             WHEN 6 THEN 'unsafe_path'
             ELSE 'special_entry' END AS verdict,
           CASE WHEN doc_id % 8 = 1 THEN 'crate-' || doc_id END
             AS wrapper,
           CAST(CASE doc_id % 8
             WHEN 0 THEN 2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
             WHEN 1 THEN 3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
             WHEN 4 THEN 1
             ELSE 2 END AS BIGINT) AS n_entries,
           CAST(CASE WHEN doc_id % 8 IN (0, 1) THEN 1 END AS BIGINT)
             AS n_payload,
           CASE WHEN doc_id % 8 IN (0, 1) THEN doc_id % 3 = 0 END
             AS has_signature
    FROM documents
    """,
)
def archive_layout_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run :func:`aruna_spark.ingest.archive.inspect_archive_layout`
    over one synthetic entry listing per document (lanes above) and
    return the per-archive envelope: verdict, stripped wrapper, entry /
    payload counts, signature presence."""
    from aruna_spark.ingest.archive import inspect_archive_layout

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    lane = d % 8
    arc = F.concat(F.lit("arc-"), d.cast("string"))
    wrap = F.concat(F.lit("crate-"), d.cast("string"))
    meta = F.lit("ro-crate-metadata.json")
    sig = F.lit("ro-crate-metadata.json.minisig")

    # ONE corpus scan (r15): each document row explodes its lane's
    # entry structs instead of one union branch (= one corpus scan)
    # per entry family — the r14 shape scanned ``documents`` 18 times
    # (108 scan nodes once the ladder fanned out downstream). Same
    # lane conditions, same literals, identical row multiset.
    def ent(cond, eln, path, directory=False, mode=None):
        return F.when(
            cond,
            F.struct(
                F.lit(eln).alias("eln"),
                (path if not isinstance(path, str) else F.lit(path))
                .cast("string")
                .alias("path"),
                F.lit(directory).alias("directory"),
                (F.lit(mode) if mode is not None else F.lit(None))
                .cast("int")
                .alias("mode"),
            ),
        )

    in_wrap = lambda suffix: F.concat(wrap, F.lit("/"), suffix)  # noqa: E731
    bad_path = (
        F.when(d % 5 == 0, "/root.txt")
        .when(d % 5 == 1, "../escape")
        .when(d % 5 == 2, "a/../b")
        .when(d % 5 == 3, "C:/drive.txt")
        .otherwise("a\\b")
    )
    stray = F.when(d % 3 == 0, wrap).otherwise(F.lit("outside.txt"))
    sub3 = d % 3 == 0
    lanes = F.array(
        ent(lane == 0, False, meta),
        ent(lane == 0, False,
            F.concat(F.lit("./data//file-"), d.cast("string"),
                     F.lit(".txt"))),
        ent((lane == 0) & sub3, False, sig),
        ent(lane == 1, True, wrap, directory=True, mode=0o040755),
        ent(lane == 1, True, in_wrap(meta), mode=0o100644),
        ent(lane == 1, True,
            in_wrap(F.concat(F.lit("data/file-"), d.cast("string"),
                             F.lit(".txt"))), mode=0),
        ent((lane == 1) & sub3, True, in_wrap(sig)),
        ent(lane == 2, True, meta),
        ent(lane == 2, True, "data/x.txt"),
        ent(lane == 3, True, in_wrap(meta)),
        ent(lane == 3, True, stray),
        ent(lane == 4, False, "data/file.txt"),
        ent(lane == 5, False, meta),
        ent(lane == 5, False, in_wrap(meta)),
        ent(lane == 6, False, meta),
        ent(lane == 6, False, bad_path),
        ent(lane == 7, False, meta),
        ent(lane == 7, False, "data/link", mode=0o120777),
    )
    entries = docs.select(
        arc.alias("archive_id"),
        F.explode(F.filter(lanes, lambda e: e.isNotNull())).alias("e"),
    ).select(
        "archive_id",
        F.col("e.eln").alias("eln"),
        F.col("e.path").alias("path"),
        F.col("e.directory").alias("directory"),
        F.col("e.mode").alias("mode"),
    )
    return inspect_archive_layout(entries)


# ------------------------------------------------ archive import plan
# jobs/import/mod.rs:646-711 (validate_source's planning half) +
# target_key (rs:1621-1643): the declared File ids resolve to archive
# payloads through their candidate forms (file_id_candidates — raw
# normalized + percent-decoded; the full decoder is the unit-tested
# ingest/archive.file_id_candidates, this fixture plants %20 only);
# EXACTLY one payload must match (none → "File entity has no archive
# payload", several → "maps to multiple archive payloads"), a payload
# described TWICE fails ("is described by A and B"), every payload
# entry gets target_key = prefix/path under the key cap and the code
# Imported (described) or Unlisted (rs:697-701), and a detached
# signature entry yields the SignatureDropped system report row
# (rs:713-729; "detached signature is not retained after rewriting").
# Lane = doc_id % 6 (sub-selectors none — CRT-safe):
#   0: every payload described, one id via its %20-decoded candidate;
#   1: one described + one UNLISTED payload + a signature entry;
#   2: a File id with no payload → fail;
#   3: raw AND decoded candidate BOTH present as payloads → fail;
#   4: two ids (./-variant) describing one payload → fail;
#   5: prefix + path over the 1,024-byte key cap → fail.
_IMPORT_PLAN_PREFIX = "staged/crates"
_LONG_SEG = "x" * 1024


@register(
    "archive_import_plan",
    oracle=f"""
    SELECT 'arc-' || doc_id AS archive_id,
           CASE doc_id % 6
             WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
             WHEN 2 THEN 'no_payload'
             WHEN 3 THEN 'multi_payload'
             WHEN 4 THEN 'duplicate_description'
             ELSE 'key_too_long' END AS verdict,
           CAST(CASE doc_id % 6 WHEN 0 THEN 2 WHEN 1 THEN 1 END
                AS BIGINT) AS n_imported,
           CAST(CASE doc_id % 6 WHEN 0 THEN 0 WHEN 1 THEN 1 END
                AS BIGINT) AS n_unlisted,
           CASE WHEN doc_id % 6 IN (0, 1) THEN doc_id % 6 = 1 END
             AS signature_dropped,
           CASE WHEN doc_id % 6 IN (0, 1)
                THEN '{_IMPORT_PLAN_PREFIX}/data/a ' || doc_id || '.txt'
                END AS first_target_key
    FROM documents
    """,
)
def archive_import_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify one payload/file-id batch per document through the
    import plan: candidate matching, the three fail-closed ladders,
    Imported/Unlisted coding, target keys under the cap, and the
    signature-drop flag. Joins are payload-path keyed (explode of ≤2
    candidates per declared id); per-archive aggregation, no window.

    r15: the narrow doc-key frame materializes once — the payload,
    signature and declared-id lane families each re-scanned it."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .localCheckpoint(eager=True, storageLevel=DISK_ONLY)
    )
    d = F.col("doc_id")
    lane = d % 6
    arc = F.concat(F.lit("arc-"), d.cast("string"))
    ds = d.cast("string")

    def _explode_vals(name, vals):
        """ONE corpus scan (r15): the lane-conditional values explode
        from an array per row instead of one union branch (= one
        corpus scan) per family — 10 documents scans before. The lane
        expressions are pairwise-distinct strings per row, so the
        incremental ``.distinct()`` of the old payload union chain
        was a no-op and is dropped with it."""
        return docs.select(
            arc.alias("archive_id"),
            F.explode(
                F.filter(F.array(*vals), lambda v: v.isNotNull())
            ).alias(name),
        )

    # payload entries (post-strip paths, non-meta non-sig)
    pay_a = F.concat(F.lit("data/a "), ds, F.lit(".txt"))
    pay_b = F.concat(F.lit("data/b-"), ds, F.lit(".txt"))
    pay_enc = F.concat(F.lit("data/a%20"), ds, F.lit(".txt"))
    pay_long = F.concat(F.lit(_LONG_SEG), F.lit("/f-"), ds, F.lit(".txt"))
    payload = _explode_vals(
        "path",
        [
            F.when(lane.isin(0, 1, 3, 4), pay_a),
            F.when(lane.isin(0, 1, 2), pay_b),
            F.when(lane == 3, pay_enc),
            F.when(lane == 5, pay_long),
        ],
    )
    has_sig = docs.select(
        arc.alias("archive_id"), (lane == 1).alias("has_signature")
    )

    # declared File ids (with './' prefixes and %20 encodings)
    id_a_enc = F.concat(F.lit("./data/a%20"), ds, F.lit(".txt"))
    id_b = F.concat(F.lit("./data/b-"), ds, F.lit(".txt"))
    id_missing = F.concat(F.lit("./data/missing-"), ds, F.lit(".txt"))
    id_a_raw = F.concat(F.lit("data/a "), ds, F.lit(".txt"))
    id_long = F.concat(
        F.lit("./"), F.lit(_LONG_SEG), F.lit("/f-"), ds, F.lit(".txt")
    )
    file_ids = _explode_vals(
        "file_id",
        [
            F.when(lane.isin(0, 1, 3, 4), id_a_enc),
            F.when(lane == 0, id_b),
            F.when(lane == 2, id_missing),
            F.when(lane == 4, id_a_raw),
            F.when(lane == 5, id_long),
        ],
    )

    # candidates: normalized raw + %20-decoded when different
    raw = F.regexp_replace(F.col("file_id"), r"^(\./)+", "")
    decoded = F.regexp_replace(raw, "%20", " ")
    cands = file_ids.select(
        "archive_id",
        "file_id",
        F.explode(F.array_distinct(F.array(raw, decoded))).alias("cand"),
    )
    # r16: every frame below is import-batch-sized (archives x entries)
    # but checkpoint-derived lineage erased the estimates and demoted
    # these joins to sort-merge (r15 finding (c)) — hint them
    matched = cands.join(
        F.broadcast(
            payload.withColumnRenamed("path", "cand").withColumn(
                "__hit", F.lit(True)
            )
        ),
        ["archive_id", "cand"],
        "left",
    )
    per_id = matched.groupBy("archive_id", "file_id").agg(
        F.sum(
            F.coalesce(F.col("__hit"), F.lit(False)).cast("int")
        ).alias("n_matches"),
        F.max(F.when(F.col("__hit"), F.col("cand"))).alias("match_path"),
    )
    per_path = per_id.filter(F.col("n_matches") == 1).groupBy(
        "archive_id", F.col("match_path").alias("path")
    ).agg(F.count(F.lit(1)).alias("n_describers"))
    id_errs = per_id.groupBy("archive_id").agg(
        F.max(F.col("n_matches") == 0).alias("any_no_payload"),
        F.max(F.col("n_matches") > 1).alias("any_multi"),
    )
    dup = per_path.groupBy("archive_id").agg(
        F.max(F.col("n_describers") > 1).alias("any_dup")
    )
    keyed = payload.join(
        F.broadcast(
            per_path.select("archive_id", "path").withColumn(
                "described", F.lit(True)
            )
        ),
        ["archive_id", "path"],
        "left",
    ).select(
        "archive_id",
        F.concat(
            F.lit(_IMPORT_PLAN_PREFIX + "/"), F.col("path")
        ).alias("target_key"),
        F.coalesce(F.col("described"), F.lit(False)).alias("described"),
    )
    entries = keyed.groupBy("archive_id").agg(
        F.sum(F.col("described").cast("long")).alias("n_imported_raw"),
        F.sum((~F.col("described")).cast("long")).alias("n_unlisted_raw"),
        F.max(F.length("target_key") > 1024).alias("any_key_long"),
        F.min("target_key").alias("first_key_raw"),
    )
    out = (
        entries.join(F.broadcast(id_errs), "archive_id", "left")
        # an archive whose ids all failed to match has NO per_path rows
        # — the dup relation is empty for it, never absent overall
        .join(F.broadcast(dup), "archive_id", "left")
        .join(F.broadcast(has_sig), "archive_id", "left")
    )
    verdict = (
        F.when(F.coalesce(F.col("any_no_payload"), F.lit(False)),
               "no_payload")
        .when(F.coalesce(F.col("any_multi"), F.lit(False)),
              "multi_payload")
        .when(F.coalesce(F.col("any_dup"), F.lit(False)),
              "duplicate_description")
        .when(F.col("any_key_long"), "key_too_long")
        .otherwise("ok")
    )
    ok = verdict == "ok"
    return out.select(
        "archive_id",
        verdict.alias("verdict"),
        F.when(ok, F.col("n_imported_raw")).alias("n_imported"),
        F.when(ok, F.col("n_unlisted_raw")).alias("n_unlisted"),
        F.when(ok, F.col("has_signature")).alias("signature_dropped"),
        F.when(ok, F.col("first_key_raw")).alias("first_target_key"),
    )


# ------------------------------------------------- crate File validation
# ``validate_document`` (jobs/import/rewrite.rs:63-75) +
# ``collect_file_ids`` (rs:133-164) as a registered envelope (r15):
# which identifiers a crate declares as Files, in document order, with
# the duplicate-definition error. The kernel resolves File typing the
# way the reference's nquads pass does — raw MediaObject IRIs,
# inline-context aliases, and the published RO-Crate contexts' "File"
# term (aruna_spark/ingest/archive.py:validate_document).
#
# Lanes (doc_id % 6):
#   0: crate-1.1 context, "File"-typed entity + a bare {"@id"}
#      reference elsewhere — the reference object does NOT count as a
#      definition (object.len() > 1 gate, rs:146);
#   1: literal-space id — normalize_ids canonicalizes to %20 BEFORE
#      collection, so the collected id is the encoded form;
#   2: inline-context alias ("Datei" → schema MediaObject);
#   3: NO crate context — a bare "File" @type does not expand, but a
#      raw MediaObject IRI type still collects;
#   4: the File entity is DEFINED nested inside another entity's
#      property — the document-order walk finds it;
#   5: the same File defined twice — CrateValidationError (rs:150-153).
_VALIDATE_LANES_ORACLE = """
    SELECT 'doc-' || doc_id AS document_id,
           CAST(CASE WHEN doc_id % 6 = 5 THEN NULL ELSE 1 END AS BIGINT)
             AS n_file_ids,
           CASE doc_id % 6
             WHEN 0 THEN './f' || doc_id || '.txt'
             WHEN 1 THEN './f%20' || doc_id || '.txt'
             WHEN 2 THEN './d' || doc_id || '.dat'
             WHEN 3 THEN './m' || doc_id || '.bin'
             WHEN 4 THEN './n' || doc_id || '.csv'
           END AS first_file_id,
           doc_id % 6 = 5 AS dup_error
    FROM documents
"""


@register("archive_validate_file_ids", oracle=_VALIDATE_LANES_ORACLE)
def archive_validate_file_ids(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Validate one synthetic crate per document through
    :func:`aruna_spark.ingest.archive.validate_document` and surface
    the File-id envelope: count, first id (document order), duplicate-
    definition error. Arrow-batched mapInPandas over a spread narrow
    scan — corpus-linear, no shuffle."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from aruna_spark.ingest.archive import JsonLdError, validate_document
    from aruna_spark.ops.text import spread_for_cpu
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)
    CRATE11 = "https://w3id.org/ro/crate/1.1/context"

    def crate_for(doc_id: int) -> str:
        lane = doc_id % 6
        if lane == 0:
            fid = f"./f{doc_id}.txt"
            doc = {
                "@context": CRATE11,
                "@graph": [
                    {"@id": "./", "@type": "Dataset", "hasPart": {"@id": fid}},
                    {"@id": fid, "@type": "File", "name": "f"},
                ],
            }
        elif lane == 1:
            fid = f"./f {doc_id}.txt"
            doc = {
                "@context": CRATE11,
                "@graph": [{"@id": fid, "@type": "File", "name": "f"}],
            }
        elif lane == 2:
            fid = f"./d{doc_id}.dat"
            doc = {
                "@context": [
                    CRATE11,
                    {"Datei": "http://schema.org/MediaObject"},
                ],
                "@graph": [{"@id": fid, "@type": "Datei", "name": "d"}],
            }
        elif lane == 3:
            doc = {
                "@graph": [
                    {"@id": f"./x{doc_id}.txt", "@type": "File", "name": "x"},
                    {
                        "@id": f"./m{doc_id}.bin",
                        "@type": "http://schema.org/MediaObject",
                        "name": "m",
                    },
                ]
            }
        elif lane == 4:
            fid = f"./n{doc_id}.csv"
            doc = {
                "@context": CRATE11,
                "@graph": [
                    {
                        "@id": "./",
                        "@type": "Dataset",
                        "hasPart": {"@id": fid, "@type": "File", "name": "n"},
                    }
                ],
            }
        else:
            fid = f"./dup{doc_id}.txt"
            doc = {
                "@context": CRATE11,
                "@graph": [
                    {"@id": fid, "@type": "File", "name": "a"},
                    {"@id": fid, "@type": "File", "name": "b"},
                ],
            }
        return _json.dumps(doc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["document_id", "n_file_ids", "first_file_id", "dup_error"]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                try:
                    _value, file_ids = validate_document(crate_for(doc_id))
                    rows.append(
                        (
                            f"doc-{doc_id}",
                            len(file_ids),
                            file_ids[0] if file_ids else None,
                            False,
                        )
                    )
                except JsonLdError:
                    rows.append((f"doc-{doc_id}", None, None, True))
            yield pd.DataFrame(rows, columns=cols)

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "document_id string, n_file_ids long, first_file_id string, "
        "dup_error boolean",
    )
