"""aruna_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing surface of
the ``arunaengine/aruna`` reference (federated research-data catalog):
SPARQL over RDF metadata graphs, BM25 full-text search with exactly
resumable pagination, S3-compatible object-catalog listings, usage/quota
aggregation, and an event/notification streaming plane — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Everything is declared through the DataFrame API so Catalyst/Tungsten pick
the physical strategy; the engine carries no hand-rolled execution.
"""

from aruna_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["Engine", "get_spark", "__version__"]


def __getattr__(name):
    # lazy: importing the facade pulls the query planes; keep bare
    # `import aruna_spark` light for workers unpickling shipped UDFs
    if name == "Engine":
        from aruna_spark.api import Engine

        return Engine
    raise AttributeError(name)
