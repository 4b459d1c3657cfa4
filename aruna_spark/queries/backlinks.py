"""Backlink index + references query over the triples plane.

Reference: the IRI backlink index maps (predicate, object) → sorted
subject set (``operations/src/metadata/iri_index.rs:48-71``); the
references query joins it to registry records
(``operations/src/metadata/api.rs:1300-1404``).

Scale: both are one groupBy / one equi-join over the triples table —
the (predicate, object) filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ingest.doc_triples import TRIPLES_ORACLE_SQL, load_triples
from aruna_spark.queries import register
from aruna_spark.sparql.terms import SCHEMA

TARGET = "urn:aruna:collection:1"


@register(
    "backlinks_grouped",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL})
    SELECT predicate, object_value AS object,
           COUNT(DISTINCT subject) AS n_refs,
           string_agg(DISTINCT subject, ',' ORDER BY subject) AS subjects
    FROM triples WHERE object_kind = 'iri'
    GROUP BY predicate, object_value
    """,
)
def backlinks_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The backlink index: (predicate, object) → sorted subject set."""
    t = load_triples(spark, sf_dir)
    return (
        t.filter(F.col("object_kind") == "iri")
        .groupBy("predicate", F.col("object_value").alias("object"))
        .agg(
            F.countDistinct("subject").alias("n_refs"),
            F.concat_ws(",", F.sort_array(F.collect_set("subject"))).alias(
                "subjects"
            ),
        )
    )


def references_of(triples: DataFrame, target: str) -> DataFrame:
    """references_metadata for one target IRI (api.rs:1300-1404): who
    points at ``target``, enriched with names — the parameterized form
    the facade route serves; the registered demo query pins it at a
    fixed TARGET for the oracle."""
    refs = triples.filter(
        (F.col("object_kind") == "iri") & (F.col("object_value") == target)
    ).select("subject")
    names = triples.filter(F.col("predicate") == SCHEMA + "name").select(
        "subject", F.col("object_value").alias("name")
    )
    return refs.join(names, "subject").orderBy("subject")


@register(
    "backlinks_references",
    oracle=f"""
    WITH triples AS ({TRIPLES_ORACLE_SQL})
    SELECT r.subject, n.object_value AS name
    FROM triples r
    JOIN triples n ON n.subject = r.subject
                  AND n.predicate = 'http://schema.org/name'
    WHERE r.object_kind = 'iri' AND r.object_value = '{TARGET}'
    ORDER BY r.subject
    """,
)
def backlinks_references(spark: SparkSession, sf_dir: str) -> DataFrame:
    """references_metadata: who points at TARGET, enriched with names."""
    return references_of(load_triples(spark, sf_dir), TARGET)
