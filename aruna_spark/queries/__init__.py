"""Query registry: every operator exposed to the driver's correctness gate.

``REGISTRY`` maps query name → (spark_fn, oracle_sql | None). The driver
runs the Spark side and the DuckDB oracle side-by-side at sf0.01 and
hash-compares. Modules register via :func:`register`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from aruna_spark.queries import (  # noqa: F401
        backlinks,
        dedup,
        ingest_suite,
        listing,
        multimodal,
        permissions,
        registry,
        relational,
        s3_suite,
        search,
        staging_suite,
        similarity,
        sparql_suite,
        streaming_suite,
        textstats,
        usage,
    )
