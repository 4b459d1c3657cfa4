"""The relational archive-layout inspection vs a LITERAL port of the
reference's sequential ladder (jobs/import/archive.rs:615-749 +
normalize_entry_path rs:678-700), over seeded random entry listings —
the r13 literal-port convention: the port follows the Rust
rung-for-rung; the comparison pins the relational form to it on
shapes no hand-written lane reaches (multi-wrapper, duplicate
descriptors, mixed unsafe/special archives)."""

from __future__ import annotations

import random

from aruna_spark.ingest.archive import (
    ARCHIVE_METADATA_PATH,
    ARCHIVE_SIGNATURE_PATH,
    JsonLdError,
    inspect_archive_layout,
    normalize_entry_path,
)

META = ARCHIVE_METADATA_PATH
SIG = ARCHIVE_SIGNATURE_PATH


def _special(mode, directory) -> bool:
    # reject_special_entry (rs:732-749)
    if mode is None:
        return False
    ftype = mode & 0o170000
    if ftype in (0, 0o100000) or (directory and ftype == 0o040000):
        return False
    return True


def literal_inspect(entries: list[tuple], eln: bool) -> dict:
    """(path, directory, mode) rows → the reference outcome: the
    per-entry normalize + special gates first (the header loop
    rs:104-111), then inspect_layout (rs:615-677). One modeled
    difference, shared by the relational form: an archive carrying
    BOTH an unsafe path and a special entry reports unsafe_path,
    whereas the reference reports whichever its entry-order loop hits
    first — both fail closed; only the error LABEL can differ on such
    double-fault archives."""
    normed = []
    for path, directory, mode in entries:
        try:
            p = normalize_entry_path(path)
        except JsonLdError:
            return {"verdict": "unsafe_path"}
        normed.append((p, directory, mode))
    for p, directory, mode in normed:
        if _special(mode, directory):
            return {"verdict": "special_entry"}
    root = [p for p, _, _ in normed if p == META]
    wrappers = [
        (p.split("/", 1)[0], p)
        for p, _, _ in normed
        if "/" in p and p.split("/", 1)[1] == META
    ]
    if len(root) == 1 and not wrappers:
        if eln:
            return {"verdict": "eln_requires_wrapper"}
        wrapper = None
    elif not root and len(wrappers) == 1:
        wrapper = wrappers[0][0]
        prefix = wrapper + "/"
        for p, directory, _ in normed:
            if (p == wrapper and not directory) or (
                p != wrapper and not p.startswith(prefix)
            ):
                return {"verdict": "stray_top_level"}
    elif not root and not wrappers:
        return {"verdict": "no_metadata"}
    else:
        return {"verdict": "ambiguous_metadata"}
    stripped = []
    for p, directory, mode in normed:
        if wrapper is not None:
            if p == wrapper:
                continue
            p = p[len(wrapper) + 1 :]
        stripped.append((p, directory))
    payload = [
        p for p, d in stripped if not d and p not in (META, SIG)
    ]
    return {
        "verdict": "ok",
        "wrapper": wrapper,
        "n_entries": len(entries),
        "n_payload": len(payload),
        "has_signature": any(p == SIG for p, _ in stripped),
    }


def _random_archives(seed: int, n: int) -> dict[str, list[tuple]]:
    rnd = random.Random(seed)
    paths = [
        META,
        f"w/{META}",
        f"w2/{META}",
        "w",
        "w/data/a.txt",
        "w/" + SIG,
        SIG,
        "data/a.txt",
        "data/b.txt",
        "outside.txt",
        "./w/data//c.txt",
        "../up.txt",
        "a\\b.txt",
        "C:/d.txt",
        "w/..",
        # r15 (VERDICT r14 Next #4): scheme-shaped and non-ASCII paths.
        # Drive prefixes reject whole-path only; ':' elsewhere is a
        # plain character. NFC touches only the path STRING, never the
        # envelope outputs, so composed/decomposed forms stay congruent
        # between the kernel (which NFCs) and the relational form.
        "C:d.txt",
        "d:",
        "urn:uuid/file.txt",
        "w/urn:uuid-4af4.txt",
        "w/caf\u00e9/se\u00f1or.txt",
        "w/cafe\u0301.txt",
        "w/\u00e9l\u00e8ve.json",
    ]
    modes = [None, 0, 0o100644, 0o040755, 0o120777]
    archives: dict[str, list[tuple]] = {}
    for i in range(n):
        k = rnd.randint(1, 6)
        archives[f"r{i}"] = [
            (
                rnd.choice(paths),
                rnd.random() < 0.2,
                rnd.choice(modes),
            )
            for _ in range(k)
        ]
    return archives


def test_layout_matches_literal_port_on_random_archives(spark):
    archives = _random_archives(20260816, 80)
    eln = {a: (int(a[1:]) % 2 == 0) for a in archives}
    rows = [
        (a, eln[a], path, directory, mode)
        for a, ents in archives.items()
        for path, directory, mode in ents
    ]
    df = spark.createDataFrame(
        rows,
        "archive_id string, eln boolean, path string, "
        "directory boolean, mode int",
    )
    got = {
        r["archive_id"]: r.asDict()
        for r in inspect_archive_layout(df).collect()
    }
    assert set(got) == set(archives)
    mismatches = []
    for a, ents in archives.items():
        want = literal_inspect(ents, eln[a])
        have = got[a]
        if want["verdict"] != have["verdict"]:
            mismatches.append((a, want, have))
            continue
        if want["verdict"] == "ok" and (
            want["wrapper"] != have["wrapper"]
            or want["n_entries"] != have["n_entries"]
            or want["n_payload"] != have["n_payload"]
            or want["has_signature"] != have["has_signature"]
        ):
            mismatches.append((a, want, have))
    assert not mismatches, mismatches[:5]
