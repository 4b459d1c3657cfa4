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
import unicodedata
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


# --------------------------------------------- alias-aware crate rewrite
# The import job's rewrite pass is TOLERANT of crates whose ``@context``
# aliases the JSON-LD keywords (``jobs/rocrate_jsonld.rs``): a crate may
# call ``@id`` "identifier" or ``@graph`` "graph" and still import. The
# full kernel (``jobs/import/rewrite.rs``):
#
# - ``JsonLdKeywords`` (rocrate_jsonld.rs:13-82): collect the
#   ``@context`` term map (string defs and ``{"@id": ...}`` object
#   defs, arrays merged), then resolve keys alias-aware —
#   ``is_id``/``is_graph`` accept the literal keyword or any alias;
#   ``term_matches(term, iris)`` is TRUE when the context leaves the
#   term undefined (rocrate_jsonld.rs:50-57: None => true).
# - ``normalize_ids`` (rewrite.rs:166-189): every value under an id
#   key is percent-encoded over the IRI-illegal ASCII set (controls,
#   space, ``"<>\^`{|}``; '%' excluded so an encoded id normalizes to
#   itself).
# - ``expanded_id`` (rewrite.rs:210-219): relative ids resolve against
#   ``https://craqle.invalid/`` so an entity and its references still
#   meet when they differ in ``./`` prefix or percent-encoding.
# - ``rewrite_value`` (rewrite.rs:221-297): an object whose id matches
#   a target gets the target's ``w3id``; a FULL entity (more keys than
#   the id) is also enriched with ``localPath`` (the archive-local
#   path) and ``contentUrl`` (the hash w3id), prepended under the
#   compact key when the context doesn't redefine it, else under the
#   full IRI (rs:83-92,255-273); descent skips localPath values
#   (rs:278-280); a raw STRING occurrence of a target id outside an id
#   position is recorded as a warning, not rewritten (rs:283-287).
# - ``prepend_value`` (rewrite.rs:299-317): merge without duplicates —
#   equal value kept, arrays get the value prepended, a differing
#   scalar becomes ``[value, existing]``.
# - ``ensure_local_context`` (rewrite.rs:335-362): a RO-Crate 1.1
#   crate that got compact localPath enrichment has the
#   ``{"localPath": <IRI>}`` mapping appended to its ``@context`` (the
#   1.1 vocabulary predates the term; 1.2 carries it).
from urllib.parse import urljoin

JSONLD_BASE_IRI = "https://craqle.invalid/"
SCHEMA_CONTENT_IRI = "http://schema.org/contentUrl"
_SCHEMA_CONTENT_IRIS = (
    SCHEMA_CONTENT_IRI,
    "https://schema.org/contentUrl",
    "schema:contentUrl",
)
LOCAL_PATH_IRI = "https://w3id.org/ro/terms#localPath"
_LOCAL_PATH_IRIS = ("localPath", LOCAL_PATH_IRI)
_CRATE_11_CONTEXT = "https://w3id.org/ro/crate/1.1/context"
_ID_ENCODE_SET = frozenset(' "<>\\^`{|}') | frozenset(
    chr(c) for c in (*range(0x20), 0x7F)
)


class JsonLdKeywords:
    """@context term-alias resolution (jobs/rocrate_jsonld.rs:13-82)."""

    def __init__(self, document):
        self.terms: dict[str, str | None] = {}
        if isinstance(document, dict):
            self._collect(document.get("@context"))

    def _collect(self, context) -> None:
        if isinstance(context, list):
            for value in context:
                self._collect(value)
        elif isinstance(context, dict):
            for term, definition in context.items():
                if isinstance(definition, str):
                    iri = definition
                elif isinstance(definition, dict):
                    iri = definition.get("@id")
                    iri = iri if isinstance(iri, str) else None
                else:
                    iri = None
                self.terms[term] = iri

    def is_id(self, key: str) -> bool:
        return key == "@id" or self.terms.get(key) == "@id"

    def is_graph(self, key: str) -> bool:
        return key == "@graph" or self.terms.get(key) == "@graph"

    def expands_to(self, key: str, values) -> bool:
        if key in self.terms:
            iri = self.terms[key]
            return iri is not None and iri in values
        return key in values

    def term_matches(self, term: str, values) -> bool:
        if term in self.terms:
            iri = self.terms[term]
            return iri is not None and iri in values
        return True

    def object_id(self, obj: dict):
        for key, value in obj.items():
            if self.is_id(key) and isinstance(value, str):
                return key, value
        return None

    def graph(self, document):
        if isinstance(document, dict):
            for key, value in document.items():
                if self.is_graph(key) and isinstance(value, list):
                    return value
        return None


def _canonical_id(identifier: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _ID_ENCODE_SET else c
        for c in identifier
    )


def _expanded_id(identifier: str) -> str:
    canonical = _canonical_id(identifier)
    # absolute IRIs pass through; relative ones resolve against the
    # fixed base so './x', 'x', and '%20'-variants meet (rs:210-219)
    if "://" in canonical:
        return canonical
    return urljoin(JSONLD_BASE_IRI, canonical)


def _normalize_ids(value, keywords: JsonLdKeywords) -> None:
    if isinstance(value, list):
        for item in value:
            _normalize_ids(item, keywords)
    elif isinstance(value, dict):
        for key, item in value.items():
            if isinstance(item, str) and keywords.is_id(key):
                canonical = _canonical_id(item)
                if canonical != item:
                    value[key] = canonical
            _normalize_ids(value[key], keywords)


def _prepend_value(obj: dict, key: str, value) -> None:
    existing = obj.pop(key, None)
    if existing is None:
        obj[key] = value
    elif existing == value:
        obj[key] = existing
    elif isinstance(existing, list):
        if value not in existing:
            existing.insert(0, value)
        obj[key] = existing
    else:
        obj[key] = [value, existing]


def _ensure_local_context(doc: dict) -> None:
    mapping = {"localPath": LOCAL_PATH_IRI}
    context = doc.pop("@context", None)
    if isinstance(context, list):
        if not any(
            isinstance(v, dict) and v.get("localPath") == LOCAL_PATH_IRI
            for v in context
        ):
            context.append(mapping)
        doc["@context"] = context
    elif isinstance(context, dict):
        context["localPath"] = LOCAL_PATH_IRI
        doc["@context"] = context
    elif context is not None:
        doc["@context"] = [context, mapping]
    else:
        doc["@context"] = mapping


def _uses_v11(doc) -> bool:
    context = doc.get("@context") if isinstance(doc, dict) else None
    if isinstance(context, str):
        return context == _CRATE_11_CONTEXT
    if isinstance(context, list):
        return any(v == _CRATE_11_CONTEXT for v in context)
    return False


def rewrite_document_enriched(
    jsonld: str, targets: dict[str, dict]
) -> tuple[str, list[str]]:
    """The reference import job's full rewrite pass (rewrite.rs:77-120)
    over one crate: targets map archive-local ids to ``{"w3id": ...,
    "hash_w3id": ..., "local_path": ...}``. Returns the rewritten
    JSON-LD and the sorted warning list (raw-string references to
    target ids that could not be rewritten in place)."""
    doc = json.loads(jsonld)
    keywords = JsonLdKeywords(doc)
    _normalize_ids(doc, keywords)
    expanded = {_expanded_id(k): v for k, v in targets.items()}
    compact_content = keywords.term_matches(
        "contentUrl", _SCHEMA_CONTENT_IRIS
    )
    compact_path = keywords.term_matches("localPath", (LOCAL_PATH_IRI,))
    warnings: set[str] = set()

    def match(identifier: str):
        return expanded.get(_expanded_id(identifier))

    def walk(value) -> None:
        if isinstance(value, list):
            for item in value:
                if isinstance(item, str) and match(item) is not None:
                    warnings.add(item)
                walk(item)
        elif isinstance(value, dict):
            found = keywords.object_id(value)
            target = match(found[1]) if found else None
            if found and target is not None:
                value[found[0]] = target["w3id"]
                if len(value) > 1:
                    _prepend_value(
                        value,
                        "localPath" if compact_path else LOCAL_PATH_IRI,
                        target["local_path"],
                    )
                    _prepend_value(
                        value,
                        "contentUrl"
                        if compact_content
                        else SCHEMA_CONTENT_IRI,
                        target["hash_w3id"],
                    )
            for key in list(value):
                if keywords.expands_to(key, _LOCAL_PATH_IRIS):
                    continue
                item = value[key]
                if (
                    not keywords.is_id(key)
                    and isinstance(item, str)
                    and match(item) is not None
                ):
                    warnings.add(item)
                walk(item)

    walk(doc)
    if _uses_v11(doc) and compact_path and targets:
        _ensure_local_context(doc)
    return (
        json.dumps(doc, sort_keys=True, separators=(",", ":")),
        sorted(warnings),
    )


# ------------------------------------------------ archive layout inspection
# ``jobs/import/archive.rs`` (r14 sweep find; the ZIP byte-format
# readers — end_record/zip64/local headers, rs:206-523 — are binary
# transport and stay excluded): the query-shaped kernels the import
# job's Validate phase runs over the ENTRY LISTING —
#
# - ``normalize_entry_path`` (rs:678-700): reject backslash/NUL, strip
#   trailing '/', strip repeated leading './', reject empty and rooted
#   paths, collapse '//' runs, then ``validate_relative_path``
#   (rs:713-731): no rooted paths, no DOS drive prefixes (alpha + ':'),
#   no ''/'.'/'..' components, no control characters; NFC-normalized
#   (identity on ASCII).
# - ``reject_special_entry`` (rs:732-749): the unix-mode gate — only
#   untyped, regular-file, or (for directory entries) directory modes
#   survive; symlinks/devices/fifos reject.
# - ``inspect_layout`` (rs:615-677): exactly one
#   ro-crate-metadata.json either at the root (plain crates only — an
#   .eln REQUIRES a single wrapper directory) or exactly one at depth
#   2 under a wrapper; a wrapper archive may contain nothing else at
#   the top level (a FILE named like the wrapper is a stray too); the
#   wrapper prefix strips off every entry.
# - ``payload_entries`` / ``signature_entry`` (rs:597-613): non-
#   directory entries that are neither the metadata descriptor nor
#   'ro-crate-metadata.json.minisig'.
# - ``file_id_candidates`` (rs:576-595): absolute IRIs resolve to no
#   candidates; encoded path separators (%2f/%5c) reject; otherwise
#   the normalized raw id plus (when different) its percent-decoded
#   form.
ARCHIVE_METADATA_PATH = "ro-crate-metadata.json"
ARCHIVE_SIGNATURE_PATH = "ro-crate-metadata.json.minisig"


def _validate_relative_path(value: str) -> None:
    if (
        value.startswith("/")
        or (len(value) >= 2 and value[0].isalpha() and value[1] == ":")
        or any(p in ("", ".", "..") for p in value.split("/"))
    ):
        raise JsonLdError(f"unsafe relative path `{value}`")
    if any(ord(c) < 0x20 or ord(c) == 0x7F for c in value):
        raise JsonLdError(f"path contains a control character `{value}`")


def normalize_entry_path(value: str) -> str:
    """rs:678-700 rung-for-rung, NFC-composed on the way out (r15;
    the relational ``inspect_archive_layout`` compares paths byte-wise
    and expects listings normalized through this kernel — NFC is the
    identity on the ASCII fixtures)."""
    if "\\" in value or "\0" in value:
        raise JsonLdError(f"unsafe archive path `{value}`")
    value = value.rstrip("/")
    while value.startswith("./"):
        value = value[2:]
    if not value:
        raise JsonLdError("archive contains an empty path")
    if value.startswith("/"):
        raise JsonLdError(f"unsafe relative path `{value}`")
    value = "/".join(p for p in value.split("/") if p)
    _validate_relative_path(value)
    return unicodedata.normalize("NFC", value)


def file_id_candidates(value: str) -> list[str] | None:
    """rs:576-595: None for absolute IRIs; the normalized raw id plus
    its percent-decoded variant when they differ. NFC-composed like
    ``normalize_relative_id`` (rs:701-711); an id whose percent-decoding
    is not valid UTF-8 keeps only its raw candidate, mirroring the
    reference's ``if let Ok(decoded)`` skip (rs:588)."""
    import re
    from urllib.parse import unquote

    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", value):
        # Url::parse succeeds exactly for scheme-carrying ids (urn:,
        # doi:, ftp://, even C:/drive — a single letter is a scheme)
        return None
    lower = value.lower()
    if "%2f" in lower or "%5c" in lower:
        raise JsonLdError(
            f"File identifier contains an encoded path separator `{value}`"
        )

    def norm_rel(v: str) -> str:
        while v.startswith("./"):
            v = v[2:]
        if not v:
            raise JsonLdError("File identifier is empty")
        _validate_relative_path(v)
        return unicodedata.normalize("NFC", v)

    raw = norm_rel(value)
    candidates = [raw]
    try:
        decoded = unquote(value, errors="strict")
    except UnicodeDecodeError:
        return candidates
    decoded = norm_rel(decoded)
    if decoded != raw:
        candidates.append(decoded)
    return candidates


# is_file_type (jobs/rocrate_jsonld.rs:9-11): an entity is a File
# exactly when its rdf:type expands to schema.org MediaObject (both
# the http and https spellings are accepted).
_FILE_TYPE_IRIS = (
    "http://schema.org/MediaObject",
    "https://schema.org/MediaObject",
)
# The published RO-Crate contexts (1.1 / 1.2) map the "File" term to
# schema:MediaObject; the reference reaches that mapping through its
# bundled craqle context set when the document's @context carries a
# w3id.org/ro/crate context IRI.
_CRATE_CONTEXT_PREFIX = "https://w3id.org/ro/crate/"


def _has_crate_context(doc) -> bool:
    context = doc.get("@context") if isinstance(doc, dict) else None
    values = context if isinstance(context, list) else [context]
    return any(
        isinstance(v, str) and v.startswith(_CRATE_CONTEXT_PREFIX)
        for v in values
    )


def _is_file_typed(obj: dict, keywords: JsonLdKeywords, crate_ctx: bool) -> bool:
    types = obj.get("@type")
    values = types if isinstance(types, list) else [types]
    for t in values:
        if not isinstance(t, str):
            continue
        if t in _FILE_TYPE_IRIS:
            return True
        if t in keywords.terms:
            if keywords.terms[t] in _FILE_TYPE_IRIS:
                return True
        elif crate_ctx and t == "File":
            return True
    return False


def _collect_file_subjects(value, keywords, crate_ctx, subjects: set) -> None:
    if isinstance(value, list):
        for item in value:
            _collect_file_subjects(item, keywords, crate_ctx, subjects)
    elif isinstance(value, dict):
        ident = keywords.object_id(value)
        if ident is not None and _is_file_typed(value, keywords, crate_ctx):
            subjects.add(_expanded_id(ident[1]))
        for item in value.values():
            _collect_file_subjects(item, keywords, crate_ctx, subjects)


def _collect_file_ids(value, subjects, keywords, file_ids: list) -> None:
    # collect_file_ids (import/rewrite.rs:133-164): document-order walk;
    # only DEFINING objects (more than the bare @id key) count, and a
    # File entity defined twice is an error.
    if isinstance(value, list):
        for item in value:
            _collect_file_ids(item, subjects, keywords, file_ids)
    elif isinstance(value, dict):
        ident = keywords.object_id(value)
        if (
            len(value) > 1
            and ident is not None
            and _expanded_id(ident[1]) in subjects
        ):
            if ident[1] in file_ids:
                raise JsonLdError(
                    f"File entity `{ident[1]}` is defined more than once"
                )
            file_ids.append(ident[1])
        for item in value.values():
            _collect_file_ids(item, subjects, keywords, file_ids)


def validate_document(jsonld: str) -> tuple[dict, list[str]]:
    """Python kernel of ``validate_document`` (import/rewrite.rs:63-75):
    parse, normalize identifier encodings in place, then collect the
    crate's File identifiers in document order. Returns ``(value,
    file_ids)`` — the normalized document plus the ids whose entities
    are rdf-typed schema MediaObject.

    One documented approximation: the reference canonicalizes through
    craqle and reads File subjects off the emitted nquads
    (``file_subjects``, rs:112-131); this kernel resolves ``@type``
    membership directly — inline-context term aliases plus the
    published RO-Crate contexts' ``File`` term — which agrees wherever
    the File typing is declared in-document (all three consortium
    fixtures; asserted in tests/test_eln_fixtures.py)."""
    try:
        value = json.loads(jsonld)
    except ValueError as error:
        raise JsonLdError(str(error)) from None
    keywords = JsonLdKeywords(value)
    _normalize_ids(value, keywords)
    crate_ctx = _has_crate_context(value)
    subjects: set[str] = set()
    _collect_file_subjects(value, keywords, crate_ctx, subjects)
    file_ids: list[str] = []
    _collect_file_ids(value, subjects, keywords, file_ids)
    return value, file_ids


# ------------------------------------------------ export report embedding
# ``add_report`` (export.rs:1514-1638) + ``report_root_id`` /
# ``reference_id`` / ``property_key`` / ``safe_term`` (rs:1639-1695):
# embedding the completeness report into the exported crate's @graph
# with CONTEXT-SAFE term selection — reuse the root's existing key
# when one already expands to the wanted property, else the compact
# term if the context does not redefine it, else the absolute IRI.
ARCHIVE_REPORT_PATH = "aruna-export-report.json"  # export.rs:55
_REPORT_FRAGMENT_ID = "#aruna-export-report"
_SUBJECT_IRIS = (
    "subjectOf",
    "schema:subjectOf",
    "http://schema.org/subjectOf",
    "https://schema.org/subjectOf",
)
_HAS_PART_IRIS = (
    "hasPart",
    "schema:hasPart",
    "http://schema.org/hasPart",
    "https://schema.org/hasPart",
)
_ABOUT_IRIS = (
    "about",
    "schema:about",
    "http://schema.org/about",
    "https://schema.org/about",
)
_ENCODING_IRIS = (
    "http://schema.org/encodingFormat",
    "https://schema.org/encodingFormat",
    "schema:encodingFormat",
)
_NAME_IRIS = (
    "http://schema.org/name",
    "https://schema.org/name",
    "schema:name",
)
_MEDIA_IRIS = (
    "http://schema.org/MediaObject",
    "https://schema.org/MediaObject",
    "schema:MediaObject",
)


def _reference_id(value, keywords: JsonLdKeywords):
    # rs:1663-1673: string / object-id / first resolvable array member
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        found = keywords.object_id(value)
        return found[1] if found else None
    if isinstance(value, list):
        for item in value:
            resolved = _reference_id(item, keywords)
            if resolved is not None:
                return resolved
    return None


def _report_root_id(graph, keywords: JsonLdKeywords):
    # rs:1639-1661: the metadata descriptor's `about` reference
    for entity in graph:
        if not isinstance(entity, dict):
            continue
        found = keywords.object_id(entity)
        if found is None:
            continue
        ident = found[1]
        while ident.startswith("./"):
            ident = ident[2:]
        if ident != ARCHIVE_METADATA_PATH:
            continue
        for key, value in entity.items():
            if keywords.expands_to(key, _ABOUT_IRIS):
                resolved = _reference_id(value, keywords)
                if resolved is not None:
                    return resolved
    return None


def _safe_term(keywords, compact: str, values, absolute: str) -> str:
    return compact if keywords.term_matches(compact, values) else absolute


def _property_key(obj: dict, keywords, values, compact, absolute) -> str:
    for key in obj:
        if keywords.expands_to(key, values):
            return key
    return _safe_term(keywords, compact, values, absolute)


def _append_reference(obj: dict, key: str, ref_id: str) -> None:
    # rs:1559-1568: array push, scalar→array promotion, or insert
    existing = obj.get(key)
    if isinstance(existing, list):
        existing.append({"@id": ref_id})
    elif existing is not None:
        obj[key] = [existing, {"@id": ref_id}]
    else:
        obj[key] = {"@id": ref_id}


def add_export_report(jsonld: str) -> str:
    """``add_report`` (export.rs:1514-1638) over one exported crate:
    reject reserved report identifiers, resolve the root Dataset
    through the metadata descriptor, append ``#aruna-export-report``
    to the root's subjectOf and the report file to hasPart (existing
    key reused when it expands correctly; scalars promote to arrays),
    then push the report File entity (typed ``File`` unless the
    context redefines it away from MediaObject) and the CreativeWork
    report entity — all term picks context-safe."""
    try:
        document = json.loads(jsonld)
    except ValueError as error:
        raise JsonLdError(str(error)) from None
    keywords = JsonLdKeywords(document)
    graph = keywords.graph(document)
    if graph is None:
        raise JsonLdError("RO-Crate @graph is missing")
    for entity in graph:
        if isinstance(entity, dict):
            found = keywords.object_id(entity)
            if found and found[1] in (
                ARCHIVE_REPORT_PATH,
                _REPORT_FRAGMENT_ID,
            ):
                raise JsonLdError(
                    "RO-Crate uses a reserved export report identifier"
                )
    root_id = _report_root_id(graph, keywords)
    if root_id is None:
        raise JsonLdError("RO-Crate metadata descriptor has no root")
    root = None
    for entity in graph:
        if isinstance(entity, dict):
            found = keywords.object_id(entity)
            if found and found[1] == root_id:
                root = entity
                break
    if root is None:
        raise JsonLdError("RO-Crate root Dataset is missing")
    subject_key = _property_key(
        root, keywords, _SUBJECT_IRIS, "subjectOf",
        "https://schema.org/subjectOf",
    )
    _append_reference(root, subject_key, _REPORT_FRAGMENT_ID)
    part_key = _property_key(
        root, keywords, _HAS_PART_IRIS, "hasPart",
        "https://schema.org/hasPart",
    )
    _append_reference(root, part_key, ARCHIVE_REPORT_PATH)
    encoding_key = _safe_term(
        keywords, "encodingFormat", _ENCODING_IRIS,
        "https://schema.org/encodingFormat",
    )
    about_key = _safe_term(
        keywords, "about", _ABOUT_IRIS, "https://schema.org/about"
    )
    name_key = _safe_term(
        keywords, "name", _NAME_IRIS, "https://schema.org/name"
    )
    file_type = (
        "File"
        if keywords.term_matches("File", _MEDIA_IRIS)
        else "https://schema.org/MediaObject"
    )
    graph.append(
        {
            "@id": ARCHIVE_REPORT_PATH,
            "@type": file_type,
            encoding_key: "application/json",
            about_key: {"@id": _REPORT_FRAGMENT_ID},
        }
    )
    graph.append(
        {
            "@id": _REPORT_FRAGMENT_ID,
            "@type": "http://schema.org/CreativeWork",
            name_key: "Aruna RO-Crate export completeness report",
            about_key: {"@id": root_id},
        }
    )
    return json.dumps(document, sort_keys=True, separators=(",", ":"))


def inspect_archive_layout(entries: DataFrame) -> DataFrame:
    """Relational inspect_layout over an entry listing: ``entries`` =
    ``(archive_id, eln, path, directory, mode)`` rows (mode = the unix
    permission word or NULL). Returns one envelope row per archive:
    ``verdict`` ('ok' or the failing rung — entry-path normalization
    and the special-entry gate fire before the layout match, mirroring
    the per-entry header loop rs:104-111), ``wrapper`` (stripped
    prefix), ``n_entries``, and for ok archives ``n_payload`` +
    ``has_signature`` computed on the POST-STRIP paths (rs:597-613).
    Pure column algebra + two groupBys on archive_id; the duplicate-
    descriptor recount after stripping (rs:668-673) is unreachable
    through this ladder (duplicates classify ambiguous first) and is
    intentionally not re-modeled."""
    from pyspark.sql import functions as F

    p = F.regexp_replace(F.col("path"), "/+$", "")
    p = F.regexp_replace(p, r"^(\./)+", "")
    parts0 = F.split(p, "/")
    collapsed_arr = F.filter(parts0, lambda x: x != "")
    norm = F.array_join(collapsed_arr, "/")
    unsafe = (
        F.col("path").contains("\\")
        | F.col("path").contains("\x00")
        | (p == "")
        | p.startswith("/")
        | norm.rlike("^[A-Za-z]:")
        | F.exists(collapsed_arr, lambda x: x.isin(".", ".."))
        | norm.rlike("[\x00-\x1f\x7f]")
    )
    ftype = F.col("mode").bitwiseAND(F.lit(0o170000))
    special = F.col("mode").isNotNull() & ~(
        (ftype == 0)
        | (ftype == 0o100000)
        | (F.col("directory") & (ftype == 0o040000))
    )
    e = entries.select(
        "archive_id",
        "eln",
        "directory",
        norm.alias("norm"),
        unsafe.alias("unsafe"),
        special.alias("special"),
    )
    meta = F.lit(ARCHIVE_METADATA_PATH)
    two_deep = F.size(F.split(F.col("norm"), "/")) == 2
    wrapper_meta = two_deep & F.col("norm").endswith("/" + ARCHIVE_METADATA_PATH)
    agg = e.groupBy("archive_id", "eln").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.max("unsafe").alias("any_unsafe"),
        F.max("special").alias("any_special"),
        F.sum((F.col("norm") == meta).cast("int")).alias("root_meta"),
        F.sum(wrapper_meta.cast("int")).alias("wrapper_meta"),
        F.max(
            F.when(wrapper_meta, F.split(F.col("norm"), "/")[0])
        ).alias("wrapper_val"),
    )
    # second pass: stray / payload / signature need the wrapper value.
    # r16: the per-archive aggregate is batch-sized (one row per
    # archive) but checkpoint-derived lineage loses the estimate and
    # demoted this to sort-merge — hint it (r15 finding (c))
    j = e.join(
        F.broadcast(
            agg.select(
                "archive_id", "wrapper_val", "root_meta", "wrapper_meta"
            )
        ),
        "archive_id",
    )
    prefix = F.concat(F.col("wrapper_val"), F.lit("/"))
    is_wrapper_case = (F.col("root_meta") == 0) & (F.col("wrapper_meta") == 1)
    stray = is_wrapper_case & ~(
        ((F.col("norm") == F.col("wrapper_val")) & F.col("directory"))
        | F.col("norm").startswith(prefix)
    )
    stripped = F.when(
        is_wrapper_case & F.col("norm").startswith(prefix),
        F.expr("substring(norm, length(wrapper_val) + 2)"),
    ).otherwise(F.col("norm"))
    dropped = is_wrapper_case & (F.col("norm") == F.col("wrapper_val"))
    payload = (
        ~dropped
        & ~F.col("directory")
        & (stripped != meta)
        & (stripped != ARCHIVE_SIGNATURE_PATH)
    )
    agg2 = j.groupBy("archive_id").agg(
        F.max(stray).alias("any_stray"),
        F.sum(payload.cast("int")).alias("n_payload_raw"),
        F.max(stripped == ARCHIVE_SIGNATURE_PATH).alias("has_sig_raw"),
    )
    out = agg.join(F.broadcast(agg2), "archive_id")
    verdict = (
        F.when(F.col("any_unsafe"), "unsafe_path")
        .when(F.col("any_special"), "special_entry")
        .when(
            (F.col("root_meta") == 1) & (F.col("wrapper_meta") == 0),
            F.when(F.col("eln"), "eln_requires_wrapper").otherwise("ok"),
        )
        .when(
            (F.col("root_meta") == 0) & (F.col("wrapper_meta") == 1),
            F.when(F.col("any_stray"), "stray_top_level").otherwise("ok"),
        )
        .when(
            (F.col("root_meta") == 0) & (F.col("wrapper_meta") == 0),
            "no_metadata",
        )
        .otherwise("ambiguous_metadata")
    )
    ok = verdict == "ok"
    return out.select(
        "archive_id",
        verdict.alias("verdict"),
        F.when(ok, F.col("wrapper_val")).alias("wrapper"),
        F.col("n_entries").cast("long").alias("n_entries"),
        F.when(ok, F.col("n_payload_raw").cast("long")).alias("n_payload"),
        F.when(ok, F.col("has_sig_raw")).alias("has_signature"),
    )
