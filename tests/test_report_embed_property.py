"""Property suite for the export report embedding
(export.rs:1514-1638) over seeded random crates: the error rungs fire
exactly when they should, the embedding adds exactly the two report
entities plus the two root references, every chosen term key EXPANDS
to the intended property under the crate's own context (semantic
check, not string equality), untouched entities stay byte-identical,
and a second embedding always trips the reserved-identifier gate."""

from __future__ import annotations

import copy
import json
import random

import pytest

from aruna_spark.ingest.archive import (
    JsonLdError,
    JsonLdKeywords,
    add_export_report,
)

CRATE11 = "https://w3id.org/ro/crate/1.1/context"
META = "ro-crate-metadata.json"
REPORT = "aruna-export-report.json"
FRAGMENT = "#aruna-export-report"
SUBJECT = (
    "subjectOf", "schema:subjectOf",
    "http://schema.org/subjectOf", "https://schema.org/subjectOf",
)
PART = (
    "hasPart", "schema:hasPart",
    "http://schema.org/hasPart", "https://schema.org/hasPart",
)


def _random_crate(rnd: random.Random, i: int) -> tuple[dict, str | None]:
    """(crate, expected_error) — error is None / 'reserved' / 'no_root'."""
    root_id = rnd.choice(["./", f"./r{i}", f"#root{i}"])
    ctx_kind = rnd.randrange(4)
    if ctx_kind == 0:
        context = CRATE11
        id_key = "@id"
    elif ctx_kind == 1:
        context = [CRATE11, {"identifier": "@id", "graph": "@graph"}]
        id_key = rnd.choice(["@id", "identifier"])
    elif ctx_kind == 2:
        context = [
            CRATE11,
            {
                "subjectOf": "https://example.org/x",
                "hasPart": "https://example.org/y",
                "File": "https://example.org/f",
            },
        ]
        id_key = "@id"
    else:
        context = None
        id_key = "@id"
    about_form = rnd.randrange(3)
    about = (
        {"@id": root_id}
        if about_form == 0
        else root_id
        if about_form == 1
        else [17, None, {"@id": root_id}]
    )
    descriptor = {id_key: rnd.choice([META, f"./{META}"]), "about": about}
    root = {id_key: root_id, "name": f"crate {i}"}
    sp_form = rnd.randrange(3)
    if sp_form == 1:
        root["subjectOf"] = {"@id": "#existing"}
    elif sp_form == 2:
        root["hasPart"] = [{"@id": "a.txt"}, {"@id": "b.txt"}]
    extra = {id_key: f"./extra{i}.txt", "@type": "File", "name": "x"}
    graph = [descriptor, root, extra]
    rnd.shuffle(graph)
    doc = {"@graph" if ctx_kind != 1 else "graph": graph}
    if context is not None:
        doc["@context"] = context
    err = None
    fault = rnd.randrange(6)
    if fault == 0:
        graph.append({id_key: rnd.choice([REPORT, FRAGMENT])})
        err = "reserved"
    elif fault == 1:
        del descriptor["about"]
        err = "no_root"
    elif fault == 2:
        descriptor[id_key] = "other.json"
        err = "no_root"
    return doc, err


def test_embedding_invariants_on_random_crates():
    rnd = random.Random(20260817)
    checked_ok = checked_err = 0
    for i in range(200):
        crate, err = _random_crate(rnd, i)
        before = copy.deepcopy(crate)
        if err is not None:
            with pytest.raises(JsonLdError):
                add_export_report(json.dumps(crate))
            checked_err += 1
            continue
        out = add_export_report(json.dumps(crate))
        doc = json.loads(out)
        kw = JsonLdKeywords(doc)
        graph = kw.graph(doc)
        before_kw = JsonLdKeywords(before)
        before_graph = before_kw.graph(before)
        assert len(graph) == len(before_graph) + 2, i
        by_id = {}
        for e in graph:
            found = kw.object_id(e)
            if found:
                by_id[found[1]] = e
        assert REPORT in by_id and FRAGMENT in by_id, i
        # the report file's about/encoding keys expand correctly
        report_file = by_id[REPORT]
        assert any(
            kw.expands_to(k, ("about", "schema:about",
                              "http://schema.org/about",
                              "https://schema.org/about"))
            and report_file[k] == {"@id": FRAGMENT}
            for k in report_file
        ), i
        # the root gained BOTH references under keys that expand
        roots = [
            e for e in graph
            if any(
                kw.expands_to(k, SUBJECT)
                and _contains_ref(e[k], FRAGMENT)
                for k in e
            )
        ]
        assert len(roots) == 1, i
        root = roots[0]
        assert any(
            kw.expands_to(k, PART) and _contains_ref(root[k], REPORT)
            for k in root
        ), i
        # untouched entities stay byte-identical
        root_found = kw.object_id(root)
        for e_before in before_graph:
            ident = before_kw.object_id(e_before)
            if ident and root_found and ident[1] == root_found[1]:
                continue
            assert e_before in graph, (i, e_before)
        # double-embed trips the reserved gate
        with pytest.raises(JsonLdError):
            add_export_report(out)
        checked_ok += 1
    assert checked_ok >= 60 and checked_err >= 40, (checked_ok, checked_err)


def _contains_ref(value, ref_id: str) -> bool:
    if isinstance(value, dict):
        return value.get("@id") == ref_id
    if isinstance(value, list):
        return any(_contains_ref(v, ref_id) for v in value)
    return False
