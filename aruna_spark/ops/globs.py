"""Glob permission rules as DataFrame joins.

Reference: every read is gated by the caller's compiled glob rules —
READ/WRITE grants like ``/{realm}/g/{group}/meta/**`` plus DENY
restrictions (``operations/src/permission_rules.rs:13,28-55,118-150``,
globset). Here a glob compiles (in Python, once) to an anchored regex
embedded as a literal in the plan, and visibility is a broadcast join of
the (tiny) grants table against the keyed rows:

    allowed(row) = ∃ allow-grant matching ∧ ¬∃ deny-grant matching

Glob dialect — matches the reference's compile exactly: grants are
compiled with globset DEFAULTS (``Glob::new(p)?.compile_matcher()``,
``permission_rules.rs:82``), where ``literal_separator`` is false, so:
- ``*``   any sequence of characters INCLUDING ``/`` (.*)
- ``?``   any single character including ``/`` (.)
- ``**/`` leading: zero or more leading components; ``/**`` trailing:
  everything strictly inside the directory (globset: ``a/**`` does not
  match ``a`` itself); interior ``**`` ≡ ``*``
- everything else literal (regex-escaped)

(Round-2 advisory: the previous single-segment ``*`` under-granted
allows and — worse — under-matched DENY rules relative to the
reference, silently widening visibility. Pinned against globset
behavior in tests/test_permissions.py.)

Scale: grants are per-caller and small — always broadcast; the regex
match is a vectorized JVM expression (rlike), no Python UDFs; the join
output is aggregated before anything widens.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def glob_to_regex(glob: str) -> str:
    """Translate a permission glob to an anchored regex with globset
    DEFAULT semantics (see module doc): ``*``/``?`` are not
    separator-limited; ``**/x`` also matches bare ``x``; ``x/**``
    matches everything under ``x`` but not ``x`` itself."""
    out = []
    i = 0
    while i < len(glob):
        if glob[i : i + 3] == "**/" and i == 0:
            out.append("(.*/)?")  # globset: '**/b' matches 'b' and 'a/b'
            i += 3
        elif glob[i : i + 3] == "/**" and i + 3 == len(glob):
            out.append("/.*")  # globset: 'a/**' does NOT match bare 'a'
            i += 3
        elif glob[i : i + 2] == "**":
            out.append(".*")
            i += 2
        elif glob[i] == "*":
            out.append(".*")  # literal_separator=false: crosses '/'
            i += 1
        elif glob[i] == "?":
            out.append(".")  # likewise
            i += 1
        else:
            out.append(re.escape(glob[i]))
            i += 1
    return "^" + "".join(out) + "$"


def visible(
    keyed: DataFrame, grants: DataFrame, key_col: str = "key"
) -> DataFrame:
    """Rows of ``keyed`` visible per subject_id under the grants table.

    ``grants``: (subject_id, pattern, effect) with effect ∈
    {'allow','deny'} and ``pattern`` an ALREADY-COMPILED anchored regex
    (from :func:`glob_to_regex`). Returns ``keyed`` columns + subject_id,
    one row per (visible row, subject).
    """
    g = F.broadcast(grants)
    matched = keyed.join(g, F.regexp_like(F.col(key_col), F.col("pattern")))
    flags = matched.groupBy(*keyed.columns, "subject_id").agg(
        F.max(F.when(F.col("effect") == "allow", 1).otherwise(0)).alias("__a"),
        F.max(F.when(F.col("effect") == "deny", 1).otherwise(0)).alias("__d"),
    )
    return flags.filter((F.col("__a") == 1) & (F.col("__d") == 0)).drop(
        "__a", "__d"
    )
