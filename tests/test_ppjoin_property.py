"""Property test: the PPJoin prefix-filtered set-similarity join is
LOSSLESS — on randomized corpora it returns exactly the brute-force
all-pairs Jaccard>=t set, with exact scores.

The lossless claim rests on two filters that are each easy to get
subtly wrong (`queries/dedup.py:_ppjoin_pairs`):

- prefix filter: two sets with Jaccard >= t must share a token within
  the first ``n - ceil(t*n) + 1`` tokens under ANY global token order
  (here: rarest-first document frequency, built by
  :func:`~aruna_spark.queries.dedup.prefix_index` — the SAME builder
  the materialized store uses);
- positional filter: a match at rarest-first ranks (rn_a, rn_b) bounds
  the achievable overlap; a true pair must survive at its first match.

Example-based tests cover the planted corpus; this drives small random
corpora (tiny token alphabet to force collisions, duplicate docs,
near-threshold pairs) through the full chain and compares against the
definitionally-correct quadratic join.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.queries.dedup import (
    JACCARD_PERMILLE,
    _ppjoin_pairs,
    prefix_index,
    shingle_sets,
)

# docs over a 6-word alphabet, 3-9 words: 3-shingle sets collide often,
# so examples contain exact dups, high-Jaccard pairs, and pairs hovering
# at the threshold (the positional filter's edge)
doc = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
    min_size=3,
    max_size=9,
)


def _brute_pairs(sets_rows, t=JACCARD_PERMILLE):
    out = set()
    for i, (da, sa) in enumerate(sets_rows):
        for db, sb in sets_rows[i + 1 :]:
            a, b = (da, sa), (db, sb)
            if a[0] > b[0]:
                a, b = b, a
            j = 1000 * len(set(a[1]) & set(b[1])) // len(set(a[1]) | set(b[1]))
            if j >= t:
                out.add((a[0], b[0], j))
    return out


@given(docs=st.lists(doc, min_size=0, max_size=10))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ppjoin_equals_bruteforce(spark, docs):
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    c = spark.createDataFrame(
        rows or [(0, "")], "doc_id long, text string"
    )
    if not rows:
        c = c.limit(0)
    sets = shingle_sets(c).withColumn(
        "shh", F.expr("transform(sh, s -> xxhash64(s))")
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard_permille)
        for r in _ppjoin_pairs(sets, prefix_index(sets)).collect()
    }
    sets_rows = [(r.doc_id, tuple(r.sh)) for r in sets.collect()]
    assert got == _brute_pairs(sets_rows)
