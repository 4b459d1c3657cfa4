"""Archive (.eln / RO-Crate) import: validate → IRI rewrite → project.

The reference's import job (``operations/src/jobs/import/mod.rs``, phases
Validate/Write/Rewrite/Create) unpacks a crate archive, validates the
JSON-LD, then rewrites identifier IRIs through a ``RewriteTarget`` map —
each local identifier in the archive gets the w3id IRI it will live
under in the importing deployment (``jobs/import/rewrite.rs:46-92``) —
and finally creates the document, which projects the rewritten JSON-LD
into the metadata graph.

Spark-first, an archive import is a batch over ``(new_document_id,
jsonld, targets)`` rows: the rewrite + projection happen in ONE
Arrow-batched ``mapInPandas`` pass (parse once, rewrite in-memory,
project to triples) — no driver loop, partition-parallel over however
many crates arrive. Identifiers NOT in the target map (external
references, e.g. shared collection IRIs) pass through unchanged, exactly
like the reference's expanded-target lookup.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from aruna_spark.ingest.jsonld import (
    JsonLdError,
    TRIPLES_SCHEMA,
    project_document,
)


def rewrite_document(jsonld: str, targets: dict[str, str]) -> str:
    """Rewrite every ``@id`` and IRI reference found in the target map
    (rewrite.rs:77-120). Unknown identifiers are left alone."""
    doc = json.loads(jsonld)
    ents = doc if isinstance(doc, list) else doc.get("@graph", [doc])

    def rw_ref(v):
        if isinstance(v, dict) and set(v) == {"@id"}:
            return {"@id": targets.get(v["@id"], v["@id"])}
        if isinstance(v, list):
            return [rw_ref(x) for x in v]
        return v

    for ent in ents:
        if not isinstance(ent, dict):
            raise JsonLdError("crate entity must be an object")
        if "@id" in ent:
            ent["@id"] = targets.get(ent["@id"], ent["@id"])
        for k in list(ent):
            if not k.startswith("@"):
                ent[k] = rw_ref(ent[k])
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


def import_crates(crates: DataFrame) -> DataFrame:
    """``(document_id, jsonld, targets_json) → triples``.

    ``targets_json`` is a JSON object mapping archive-local IRIs to their
    rewritten w3id form; the projected graph is named after the NEW
    ``document_id`` (the importing document), so a re-export of the
    imported graph equals the rewritten crate — the import/export
    roundtrip invariant."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(crates.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TRIPLES_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for did, js, tj in zip(
                pdf["document_id"], pdf["jsonld"], pdf["targets_json"]
            ):
                targets = json.loads(tj) if tj else {}
                rows.extend(
                    project_document(did, rewrite_document(js, targets))
                )
            yield pd.DataFrame(rows, columns=cols)

    return crates.mapInPandas(run, TRIPLES_SCHEMA)
