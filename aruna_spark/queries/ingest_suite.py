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


@register("rocrate_export_page")  # no SQL oracle — roundtrip-tested
def rocrate_export_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RO-Crate export of the first 5 document graphs: one JSON-LD doc
    per graph with entity counts (handle.rs:1853-1905)."""
    graphs = [f"{GRAPH_NS}{i}" for i in range(5)]
    triples = load_triples(spark, sf_dir).filter(
        F.col("graph_iri").isin(graphs)
    )
    return export_rocrate(triples).orderBy("graph_iri")


_N_IMPORT = 20


@register(
    "archive_import_rewrite",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL})
    SELECT replace(graph_iri, '{GRAPH_NS}', '{GRAPH_NS}imp') AS graph_iri,
           replace(subject, 'urn:aruna:doc:', 'urn:aruna:doc:imp') AS subject,
           predicate, object_kind, object_value, object_datatype, object_lang
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
