"""JSON-LD projector typing rules, validation, and export roundtrip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aruna_spark.ingest.jsonld import (
    GRAPH_NS,
    JsonLdError,
    export_rocrate,
    ingest_jsonld,
    project_document,
)


def rows(js: str):
    return project_document(7, json.dumps(js) if isinstance(js, dict) else js)


BASE = {"@id": "urn:x:1", "@type": "File", "name": "n"}


def find(trs, pred):
    return [t for t in trs if t[2] == pred]


def test_typing_rules():
    doc = dict(
        BASE,
        count=42,
        ratio=1.5,
        flag=True,
        plain="txt",
        tagged={"@value": "hallo", "@language": "de"},
        typed={"@value": "2024-01-01", "@type": "xsd:date"},
        ref={"@id": "urn:x:2"},
        many=[1, "two"],
    )
    trs = project_document(7, json.dumps(doc))
    g = GRAPH_NS + "7"
    assert all(t[0] == g for t in trs)
    S = "http://schema.org/"
    X = "http://www.w3.org/2001/XMLSchema#"
    assert find(trs, S + "count")[0][3:] == ("literal", "42", X + "integer", None)
    assert find(trs, S + "ratio")[0][3:] == ("literal", "1.5", X + "double", None)
    assert find(trs, S + "flag")[0][3:] == ("literal", "true", X + "boolean", None)
    assert find(trs, S + "plain")[0][3:] == ("literal", "txt", None, None)
    assert find(trs, S + "tagged")[0][3:] == ("literal", "hallo", None, "de")
    assert find(trs, S + "typed")[0][3:] == (
        "literal", "2024-01-01", X + "date", None,
    )
    assert find(trs, S + "ref")[0][3:] == ("iri", "urn:x:2", None, None)
    assert {t[4] for t in find(trs, S + "many")} == {"1", "two"}
    types = find(trs, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    assert types[0][3:] == ("iri", "http://schema.org/File", None, None)


@pytest.mark.parametrize(
    "doc",
    [
        {"@graph": [BASE]},  # @graph banned
        dict(BASE, nested={"x": 1}),  # inline nested entity
        {"@type": "File", "name": "n"},  # missing @id
        {"@id": "urn:x:1", "name": "n"},  # missing @type
        {"@id": "urn:x:1", "@type": "File"},  # missing name
    ],
)
def test_validation_rejections(doc):
    with pytest.raises(JsonLdError):
        project_document(1, json.dumps(doc))


def test_export_ingest_roundtrip(spark, sf_dir):
    """export(graph) → ingest == identity on triples (per graph)."""
    from aruna_spark.ingest.doc_triples import load_triples

    graphs = [f"{GRAPH_NS}{i}" for i in range(3)] + [f"{GRAPH_NS}coll3"]
    orig = load_triples(spark, sf_dir).filter(F.col("graph_iri").isin(graphs))
    exported = export_rocrate(orig)
    docs = exported.select(
        F.replace(
            F.col("graph_iri"), F.lit(GRAPH_NS), F.lit("")
        ).alias("document_id"),
        "jsonld",
    )
    back = ingest_jsonld(docs)
    a = {tuple(r) for r in orig.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_ingest_is_partition_parallel(spark, sf_dir):
    """mapInPandas output partitioning follows the input (no driver
    funnel): more input partitions → parallel projection."""
    from aruna_spark.queries import REGISTRY, load_all

    load_all()
    fn, _ = REGISTRY["ingest_jsonld_typing"]
    df = fn(spark, sf_dir)
    assert df.count() > 0


def test_archive_rewrite_targets_only():
    """Only identifiers in the target map are rewritten; external
    references pass through (jobs/import/rewrite.rs:46-92)."""
    import json

    from aruna_spark.ingest.archive import rewrite_document

    crate = json.dumps(
        [
            {
                "@id": "urn:old:1",
                "@type": ["File"],
                "name": "a",
                "partOf": {"@id": "urn:ext:coll"},
                "refs": [{"@id": "urn:old:2"}, {"@id": "urn:ext:x"}],
            }
        ]
    )
    out = json.loads(
        rewrite_document(
            crate, {"urn:old:1": "urn:new:1", "urn:old:2": "urn:new:2"}
        )
    )
    ent = out[0]
    assert ent["@id"] == "urn:new:1"
    assert ent["partOf"] == {"@id": "urn:ext:coll"}
    assert {r["@id"] for r in ent["refs"]} == {"urn:new:2", "urn:ext:x"}


def test_archive_import_export_roundtrip(spark, sf_dir):
    """Re-exporting an imported graph yields the rewritten crate."""
    from aruna_spark.ingest.archive import import_crates
    from aruna_spark.ingest.doc_triples import load_triples

    triples = load_triples(spark, sf_dir).filter(
        F.col("graph_iri") == f"{GRAPH_NS}1"
    )
    crate = export_rocrate(triples)
    imported = import_crates(
        crate.select(
            F.lit("imp1").alias("document_id"),
            "jsonld",
            F.lit(
                '{"urn:aruna:doc:1":"urn:aruna:doc:imp1"}'
            ).alias("targets_json"),
        )
    )
    re_exported = export_rocrate(imported).collect()[0]
    assert re_exported.graph_iri == f"{GRAPH_NS}imp1"
    assert "urn:aruna:doc:imp1" in re_exported.jsonld
    assert '"urn:aruna:doc:1"' not in re_exported.jsonld
