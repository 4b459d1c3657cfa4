"""JSON-LD ingest → triples, and RO-Crate export — the real ingest path.

Typing rules mirror the reference's projector
(``operations/src/metadata/handle.rs:3466-3878``):

- entity shape: string ``@id``, ≥1 ``@type``, a string ``name``, no
  ``@graph`` key, no inline nested entities — nested objects must be
  ``{"@id": ...}`` references (``handle.rs:3500-3612,3661-3678``);
- values (``handle.rs:3723-3796``): JSON int → xsd:integer, float →
  xsd:double, bool → xsd:boolean, plain string → simple literal,
  ``{"@value","@language"}`` → language-tagged literal,
  ``{"@value","@type"}`` → typed literal, ``{"@id"}`` → IRI object,
  lists → one triple per element;
- property IRIs (``handle.rs:3614-3633,3805-3823``): compact ``schema:``
  ``rdf:`` ``rdfs:`` ``xsd:`` prefixes expand; bare names default to
  ``http://schema.org/{name}``;
- graph IRI = ``https://w3id.org/aruna/{document_id}``
  (``metadata_registry.rs:31-33``).

Execution: arbitrary JSON parsing is the one place Python is the honest
tool — ``mapInPandas`` (Arrow-batched, partition-parallel) keeps it off
the driver and scales with the input partitioning; everything downstream
of the projection is JVM-side again. Export (``handle.rs:1853-1905``) is
the inverse: triples grouped per graph reassemble into a JSON-LD
document via ``applyInPandas``; the roundtrip (export → ingest) must be
the identity on triples, which tests/test_jsonld.py asserts.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from aruna_spark.sparql.terms import RDF, RDFS, SCHEMA, XSD

GRAPH_NS = "https://w3id.org/aruna/"

XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"

PREFIXES = {"schema": SCHEMA, "rdf": RDF, "rdfs": RDFS, "xsd": XSD}

TRIPLES_SCHEMA = StructType(
    [
        StructField("graph_iri", StringType()),
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object_kind", StringType()),
        StructField("object_value", StringType()),
        StructField("object_datatype", StringType()),
        StructField("object_lang", StringType()),
    ]
)


class JsonLdError(ValueError):
    pass


def expand_iri(name: str) -> str:
    """Property/type IRI normalization (handle.rs:3614-3633,3805-3823)."""
    if name.startswith(("http://", "https://", "urn:")):
        return name
    if ":" in name:
        prefix, local = name.split(":", 1)
        if prefix in PREFIXES:
            return PREFIXES[prefix] + local
        return name  # unknown scheme — keep verbatim
    return SCHEMA + name


def _object_rows(value) -> list[tuple[str, str, str | None, str | None]]:
    """One JSON value → (kind, value, datatype, lang) rows."""
    if isinstance(value, list):
        out = []
        for v in value:
            out.extend(_object_rows(v))
        return out
    if isinstance(value, bool):
        return [("literal", "true" if value else "false", XSD_BOOLEAN, None)]
    if isinstance(value, int):
        return [("literal", str(value), XSD_INTEGER, None)]
    if isinstance(value, float):
        return [("literal", repr(value), XSD_DOUBLE, None)]
    if isinstance(value, str):
        return [("literal", value, None, None)]
    if isinstance(value, dict):
        if "@id" in value and "@value" not in value:
            if len(value) != 1:
                raise JsonLdError(
                    "nested entities not allowed — reference by @id only"
                )
            return [("iri", str(value["@id"]), None, None)]
        if "@value" in value:
            v = value["@value"]
            lex = (
                ("true" if v else "false")
                if isinstance(v, bool)
                else (repr(v) if isinstance(v, float) else str(v))
            )
            if "@language" in value:
                return [("literal", lex, None, str(value["@language"]))]
            if "@type" in value:
                return [("literal", lex, expand_iri(str(value["@type"])), None)]
            if isinstance(v, bool):
                return [("literal", lex, XSD_BOOLEAN, None)]
            if isinstance(v, int):
                return [("literal", lex, XSD_INTEGER, None)]
            if isinstance(v, float):
                return [("literal", lex, XSD_DOUBLE, None)]
            return [("literal", lex, None, None)]
        raise JsonLdError("nested entities not allowed (no @id/@value object)")
    raise JsonLdError(f"unsupported JSON value: {value!r}")


def project_document(document_id, jsonld: str) -> list[tuple]:
    """One JSON-LD document (a single entity or a list of entities) →
    triples rows; enforces the reference's validation rules. Every
    rejection — including malformed JSON — raises :class:`JsonLdError`
    NAMING the document, so a bad document in a batch surfaces as the
    route's client error, not an anonymous executor crash."""
    try:
        doc = json.loads(jsonld)
    except (json.JSONDecodeError, TypeError) as e:
        raise JsonLdError(
            f"document {document_id!r}: malformed JSON ({e})"
        ) from None
    try:
        return _project_entities(document_id, doc)
    except JsonLdError as e:
        raise JsonLdError(f"document {document_id!r}: {e}") from None


def _project_entities(document_id, doc) -> list[tuple]:
    if isinstance(doc, dict) and "@graph" in doc:
        raise JsonLdError("@graph is not allowed")
    entities = doc if isinstance(doc, list) else [doc]
    graph = GRAPH_NS + str(document_id)
    rows: list[tuple] = []
    for ent in entities:
        if not isinstance(ent, dict):
            raise JsonLdError("entity must be a JSON object")
        sid = ent.get("@id")
        if not isinstance(sid, str) or not sid:
            raise JsonLdError("entity needs a string @id")
        types = ent.get("@type")
        if types is None:
            raise JsonLdError("entity needs at least one @type")
        if not isinstance(ent.get("name"), str):
            raise JsonLdError("entity needs a string name")
        for t in types if isinstance(types, list) else [types]:
            rows.append(
                (graph, sid, RDF + "type", "iri", expand_iri(str(t)), None, None)
            )
        for prop, value in ent.items():
            if prop.startswith("@"):
                continue
            pred = expand_iri(prop)
            for kind, val, dt, lang in _object_rows(value):
                rows.append((graph, sid, pred, kind, val, dt, lang))
    return rows


def ingest_jsonld(docs: DataFrame) -> DataFrame:
    """(document_id, jsonld) → triples via Arrow-batched mapInPandas."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TRIPLES_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for did, js in zip(pdf["document_id"], pdf["jsonld"]):
                rows.extend(project_document(did, js))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, TRIPLES_SCHEMA)


# ------------------------------------------------------------------ export
EXPORT_SCHEMA = StructType(
    [
        StructField("graph_iri", StringType()),
        StructField("total_data_entities", LongType()),
        StructField("jsonld", StringType()),
    ]
)


def _value_object(kind, value, datatype, lang):
    if kind == "iri":
        return {"@id": value}
    if lang is not None and not (isinstance(lang, float) and pd.isna(lang)):
        return {"@value": value, "@language": lang}
    if datatype is not None and not (
        isinstance(datatype, float) and pd.isna(datatype)
    ):
        return {"@value": value, "@type": datatype}
    return {"@value": value}


def export_rocrate(triples: DataFrame) -> DataFrame:
    """Per-graph RO-Crate-style export: triples → one JSON-LD document
    (list of entities, properties as @value/@id objects, deterministic
    key order) — handle.rs:1853-1905. Roundtrips through
    :func:`ingest_jsonld` back to the identical triples."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(triples.sparkSession)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        graph = pdf["graph_iri"].iloc[0]
        ents: dict[str, dict] = {}
        for r in pdf.itertuples(index=False):
            ent = ents.setdefault(r.subject, {"@id": r.subject, "@type": []})
            if r.predicate == RDF + "type" and r.object_kind == "iri":
                ent["@type"].append(r.object_value)
                continue
            vo = _value_object(
                r.object_kind, r.object_value, r.object_datatype, r.object_lang
            )
            # 'name' must stay a plain string for ingest validation
            if r.predicate == SCHEMA + "name" and set(vo) == {"@value"}:
                ent["name"] = vo["@value"]
                continue
            ent.setdefault(r.predicate, []).append(vo)
        doc = []
        for sid in sorted(ents):
            ent = ents[sid]
            ent["@type"] = sorted(ent["@type"])
            for k in list(ent):
                if isinstance(ent[k], list) and k not in ("@type",):
                    ent[k] = sorted(
                        ent[k], key=lambda v: json.dumps(v, sort_keys=True)
                    )
            doc.append(dict(sorted(ent.items())))
        return pd.DataFrame(
            [
                (
                    graph,
                    len(doc),
                    json.dumps(doc, sort_keys=True, separators=(",", ":")),
                )
            ],
            columns=[f.name for f in EXPORT_SCHEMA.fields],
        )

    return triples.groupBy("graph_iri").applyInPandas(assemble, EXPORT_SCHEMA)
