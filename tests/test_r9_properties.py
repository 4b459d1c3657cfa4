"""Hypothesis properties for the round-9 column-algebra operators:
each Spark expression is compared against a literal Python port of the
reference's Rust, over generated inputs batched into ONE DataFrame
evaluation per property."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.ops.cors_rules import wildcard_to_regex
from aruna_spark.queries.export_plan import sanitized_path
from aruna_spark.queries.location_summary import mapped_key

SETTINGS = dict(max_examples=25, deadline=None)


# ---------------------------------------------------- CORS wildcard
def _wildcard_match_port(pattern: str, value: str) -> bool:
    """Literal port of cors.rs:242-255 wildcard_match."""
    if pattern == "*":
        return True
    if "*" in pattern:
        prefix, _, suffix = pattern.partition("*")
        return (
            value.startswith(prefix)
            and value.endswith(suffix)
            and len(value) >= len(prefix) + len(suffix)
        )
    return pattern == value


_atoms = st.text(alphabet="ab/.:-", min_size=0, max_size=6)


@given(
    st.lists(
        st.tuples(
            st.one_of(
                _atoms,
                _atoms.map(lambda s: s + "*"),
                st.tuples(_atoms, _atoms).map(lambda t: t[0] + "*" + t[1]),
                st.just("*"),
            ),
            _atoms,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_wildcard_regex_matches_port(cases):
    for pattern, value in cases:
        got = re.search(wildcard_to_regex(pattern), value) is not None
        assert got == _wildcard_match_port(pattern, value), (
            pattern,
            value,
        )


# --------------------------------------------------- map_sync_key
def _map_sync_key_port(key, src_prefix, tgt_prefix):
    """Literal port of version_replication.rs:473-494."""
    if src_prefix is not None:
        if not key.startswith(src_prefix):
            return None
        suffix = key[len(src_prefix):]
    else:
        suffix = key
    if tgt_prefix is None:
        return suffix.lstrip("/")
    if tgt_prefix.endswith("/") and suffix.startswith("/"):
        return tgt_prefix + suffix[1:]
    if (
        not tgt_prefix.endswith("/")
        and suffix != ""
        and not suffix.startswith("/")
    ):
        return f"{tgt_prefix}/{suffix}"
    return tgt_prefix + suffix


_seg = st.text(alphabet="abxy", min_size=0, max_size=3)
_path = st.lists(_seg, min_size=0, max_size=3).map("/".join)


@given(
    st.lists(
        st.tuples(
            _path,
            st.one_of(st.none(), _path, _path.map(lambda p: p + "/")),
            st.one_of(st.none(), _path, _path.map(lambda p: p + "/")),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_mapped_key_matches_port(spark, cases):
    df = spark.createDataFrame(
        [(k, sp, tp) for k, sp, tp in cases],
        "key string, src_prefix string, tgt_prefix string",
    )
    got = [
        r.m
        for r in df.select(mapped_key(F.col("key")).alias("m")).collect()
    ]
    want = [_map_sync_key_port(*c) for c in cases]
    assert got == want


# --------------------------------------------------- safe_zip_path
def _safe_zip_path_port(value: str):
    """Literal port of jobs/export.rs:1313-1337 (ASCII inputs — the
    NFC step is identity on this generator's alphabet)."""
    while value.startswith("./"):
        value = value[2:]
    lower = value.lower()
    if (
        not value
        or value.endswith("/")
        or "\\" in value
        or "%2f" in lower
        or "%5c" in lower
        or any(p in ("", ".", "..") for p in value.split("/"))
    ):
        return None
    return value


_pseg = st.one_of(
    st.text(alphabet="abc", min_size=0, max_size=3),
    st.sampled_from([".", "..", "x\\y", "a%2Fb", "a%2fb", "A%5Cb"]),
)
_ppath = st.one_of(
    st.lists(_pseg, min_size=1, max_size=4).map("/".join),
    st.lists(_pseg, min_size=1, max_size=3).map(
        lambda segs: "./" + "/".join(segs)
    ),
    st.lists(_pseg, min_size=1, max_size=3).map(
        lambda segs: "/".join(segs) + "/"
    ),
)


@given(st.lists(_ppath, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_sanitized_path_matches_port(spark, cases):
    df = spark.createDataFrame([(c,) for c in cases], "p string")
    got = [
        r.s
        for r in df.select(sanitized_path(F.col("p")).alias("s")).collect()
    ]
    want = [_safe_zip_path_port(c) for c in cases]
    assert got == want
