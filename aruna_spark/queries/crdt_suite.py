"""Oracle-checked CRDT replication queries.

Exercises :mod:`aruna_spark.ops.crdt` — the vector-clock comparator
(``core/src/metadata.rs:691-713``) and the observed-remove quad replay
(``MetadataQuadOp``, ``core/src/metadata.rs:715-736``) — over
deterministic clocks/op feeds derived from ``documents.parquet`` so
DuckDB reproduces the exact same answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ingest.doc_triples import DOC_NS, GRAPH_NS
from aruna_spark.ops.crdt import clock_relation, orset_replay
from aruna_spark.queries import register
from aruna_spark.sparql.terms import SCHEMA


# -- clock comparator over a derived clock feed ------------------------------
# Two actors a/b with counters derived from doc_id; a zero counter is
# OMITTED from the map (sparse clocks), exercising the missing-actor-as-0
# rule of compare_metadata_clocks.
@register(
    "crdt_clock_relation",
    oracle="""
    WITH clocks AS (
      SELECT doc_id,
             doc_id % 5 AS la, doc_id % 3 AS lb,
             doc_id % 4 AS ra, doc_id % 6 AS rb
      FROM documents
    ),
    rel AS (
      SELECT doc_id,
             CASE
               WHEN (la > ra OR lb > rb) AND (ra > la OR rb > lb)
                 THEN 'concurrent'
               WHEN (la > ra OR lb > rb) THEN 'local_ahead'
               WHEN (ra > la OR rb > lb) THEN 'remote_ahead'
               ELSE 'equal'
             END AS relation
      FROM clocks
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n
    FROM rel GROUP BY relation ORDER BY relation
    """,
)
def crdt_clock_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of clock relations over a sparse-clock feed — the
    comparator itself runs as a pure column expression on MapType
    columns (missing actor == 0, matching metadata.rs:696-699)."""
    docs = load_table(spark, sf_dir, "documents")

    def sparse_clock(*pairs) -> F.Column:
        m = F.map_from_arrays(
            F.array(*[F.lit(a) for a, _ in pairs]),
            F.array(*[c.cast("long") for _, c in pairs]),
        )
        return F.map_filter(m, lambda _, v: v > 0)

    clocks = docs.select(
        sparse_clock(
            ("a", F.col("doc_id") % 5), ("b", F.col("doc_id") % 3)
        ).alias("local"),
        sparse_clock(
            ("a", F.col("doc_id") % 4), ("b", F.col("doc_id") % 6)
        ).alias("remote"),
    )
    return (
        clocks.select(
            clock_relation(F.col("local"), F.col("remote")).alias("relation")
        )
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("relation")
    )


# -- observed-remove replay ---------------------------------------------------
# Deterministic op feed per document quad (subject schema:keywords kw-N):
#   add  dot ('a', 1)            for every doc
#   remove witnessed {a: 1}      for doc_id % 3 == 0  (observes the add)
#   add  dot ('a', 2)            for doc_id % 6 == 0  (re-add after remove)
#   add  dot ('b', 1)            for doc_id % 5 == 0  (concurrent: never
#                                                      witnessed by the remove)
# Expected survival: everything except doc_id % 3 == 0 docs that have
# neither the re-add (%6) nor the concurrent add (%5).
_ORSET_ORACLE = f"""
    WITH quads AS (
      SELECT doc_id,
             '{GRAPH_NS}' || doc_id AS graph_iri,
             '{DOC_NS}' || doc_id AS subject,
             '{SCHEMA}keywords' AS predicate,
             'kw-' || (doc_id % 10) AS object
      FROM documents
    ),
    adds AS (
      SELECT graph_iri, subject, predicate, object, 'a' AS actor,
             CAST(1 AS BIGINT) AS counter FROM quads
      UNION ALL
      SELECT graph_iri, subject, predicate, object, 'a', CAST(2 AS BIGINT)
      FROM quads WHERE doc_id % 6 = 0
      UNION ALL
      SELECT graph_iri, subject, predicate, object, 'b', CAST(1 AS BIGINT)
      FROM quads WHERE doc_id % 5 = 0
    ),
    removes AS (
      SELECT graph_iri, subject, predicate, object, 'a' AS actor,
             CAST(1 AS BIGINT) AS wcount
      FROM quads WHERE doc_id % 3 = 0
    ),
    witnessed AS (
      SELECT graph_iri, subject, predicate, object, actor,
             MAX(wcount) AS wcount
      FROM removes GROUP BY 1, 2, 3, 4, 5
    ),
    survived AS (
      SELECT a.* FROM adds a
      LEFT JOIN witnessed w
        ON  w.graph_iri = a.graph_iri AND w.subject = a.subject
        AND w.predicate = a.predicate AND w.object = a.object
        AND w.actor = a.actor
      WHERE a.counter > COALESCE(w.wcount, 0)
    )
    SELECT graph_iri, subject, predicate, object,
           CAST(COUNT(*) AS BIGINT) AS n_dots,
           CAST(MAX(counter) AS BIGINT) AS max_counter
    FROM survived GROUP BY 1, 2, 3, 4
"""


@register("crdt_orset_replay", oracle=_ORSET_ORACLE)
def crdt_orset_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the deterministic op feed through the observed-remove
    resolver: removed quads stay dead unless re-added with a fresh dot
    or concurrently added by an actor the remove never witnessed —
    convergence laws property-tested in tests/test_crdt.py."""
    docs = load_table(spark, sf_dir, "documents")
    quads = docs.select(
        "doc_id",
        F.concat(F.lit(GRAPH_NS), F.col("doc_id").cast("string")).alias(
            "graph_iri"
        ),
        F.concat(F.lit(DOC_NS), F.col("doc_id").cast("string")).alias(
            "subject"
        ),
        F.lit(SCHEMA + "keywords").alias("predicate"),
        F.concat(F.lit("kw-"), (F.col("doc_id") % 10).cast("string")).alias(
            "object"
        ),
    )
    empty_clock = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<bigint>")
    )

    def add(df: DataFrame, actor: str, counter: int) -> DataFrame:
        return df.select(
            "graph_iri", "subject", "predicate", "object",
            F.lit("add").alias("op"),
            F.lit(actor).alias("actor"),
            F.lit(counter).cast("long").alias("counter"),
            empty_clock.alias("witnessed"),
        )

    def remove(df: DataFrame, witnessed: dict[str, int]) -> DataFrame:
        clock = F.map_from_arrays(
            F.array(*[F.lit(a) for a in witnessed]),
            F.array(*[F.lit(c).cast("long") for c in witnessed.values()]),
        )
        return df.select(
            "graph_iri", "subject", "predicate", "object",
            F.lit("remove").alias("op"),
            F.lit(None).cast("string").alias("actor"),
            F.lit(None).cast("long").alias("counter"),
            clock.alias("witnessed"),
        )

    ops = (
        add(quads, "a", 1)
        .unionByName(remove(quads.filter(F.col("doc_id") % 3 == 0), {"a": 1}))
        .unionByName(add(quads.filter(F.col("doc_id") % 6 == 0), "a", 2))
        .unionByName(add(quads.filter(F.col("doc_id") % 5 == 0), "b", 1))
    )
    return orset_replay(ops)
