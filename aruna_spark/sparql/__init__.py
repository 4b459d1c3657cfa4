"""SPARQL front-end: string → algebra → DataFrame plan over a triples table.

The reference parses SPARQL with ``spargebra`` and evaluates with
``spareval`` over an in-memory quad dataset materialized per query
(``operations/src/metadata/handle.rs:4931-5012``). Here the query compiles
to a *declarative DataFrame program* over a columnar ``triples`` table, so
Catalyst plans the joins (broadcast vs shuffle), pushes constant
triple-pattern positions into the parquet scan, and the whole thing scales
past a single node — the reference's own ceiling (it materializes every
queried graph in RAM).
"""

from aruna_spark.sparql.engine import SparqlEngine

__all__ = ["SparqlEngine"]
