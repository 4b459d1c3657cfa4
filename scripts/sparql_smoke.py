"""Dev smoke: run a battery of SPARQL queries end-to-end at sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aruna_spark.ingest.doc_triples import load_triples
from aruna_spark.session import get_spark
from aruna_spark.sparql.engine import SparqlEngine

SF = "/root/testdata/sf0.001"

QUERIES = {
    "bgp_filter": """
        SELECT ?s ?name ?size WHERE {
          ?s a schema:File ;
             schema:name ?name ;
             schema:contentSize ?size .
          FILTER(?size >= 500)
        } ORDER BY ?s
    """,
    "optional": """
        SELECT ?s ?desc WHERE {
          ?s a schema:File .
          OPTIONAL { ?s schema:description ?desc }
        }
    """,
    "union": """
        SELECT ?s ?t WHERE {
          { ?s a schema:Dataset . BIND("dataset" AS ?t) }
          UNION
          { ?s a schema:Collection . BIND("collection" AS ?t) }
        }
    """,
    "group_agg": """
        SELECT ?lang (COUNT(*) AS ?cnt) (AVG(?size) AS ?avg_size) WHERE {
          ?s schema:inLanguage ?lang ; schema:contentSize ?size .
        } GROUP BY ?lang
    """,
    "order_limit": """
        SELECT ?s ?size WHERE {
          ?s schema:contentSize ?size .
        } ORDER BY DESC(?size) ?s LIMIT 10
    """,
    "not_exists": """
        SELECT ?s WHERE {
          ?s a schema:File .
          FILTER NOT EXISTS { ?s schema:description ?d }
        }
    """,
    "minus": """
        SELECT ?s WHERE {
          ?s a schema:File .
          MINUS { ?s schema:isPartOf <urn:aruna:collection:0> }
        }
    """,
    "path_plus": """
        SELECT ?s ?anc WHERE {
          ?s schema:isPartOf+ ?anc .
          FILTER(STRSTARTS(STR(?s), "urn:aruna:collection:"))
        }
    """,
    "values_bind": """
        SELECT ?s ?lang ?tag WHERE {
          ?s schema:inLanguage ?lang .
          VALUES ?lang { "en" "de" }
          BIND(CONCAT(?lang, "-doc") AS ?tag)
        }
    """,
    "distinct_lang": """
        SELECT DISTINCT ?lang WHERE { ?s schema:inLanguage ?lang } ORDER BY ?lang
    """,
    "ask": "ASK { ?s a schema:Collection }",
    "graph_scoped": """
        SELECT ?p ?o WHERE { GRAPH <https://w3id.org/aruna/0> { ?s ?p ?o } }
    """,
    "having": """
        SELECT ?lang (COUNT(*) AS ?cnt) WHERE {
          ?s schema:inLanguage ?lang .
        } GROUP BY ?lang HAVING (COUNT(*) >= 5)
    """,
    "group_concat": """
        SELECT ?k (GROUP_CONCAT(?name; SEPARATOR=",") AS ?names) WHERE {
          ?c a schema:Collection ; schema:name ?name ;
             schema:isPartOf ?k .
        } GROUP BY ?k
    """,
}


def main() -> None:
    spark = get_spark("sparql-smoke")
    triples = load_triples(spark, SF).cache()
    print("triples:", triples.count())
    eng = SparqlEngine(spark, triples)
    failures = []
    for name, q in QUERIES.items():
        try:
            df = eng.query_flat(q)
            rows = df.limit(5).collect()
            n = df.count()
            print(f"[ok] {name}: {n} rows; sample={rows[:2]}")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")
    print("failures:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
