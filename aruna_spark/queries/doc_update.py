"""Metadata-document UPDATE path: the entity JSON-LD validation
ladder and the accepted-update projection batch
(``operations/src/update_metadata_document.rs``).

Reference surface:

- rs:45-50 — three mutation kinds: ReplaceRoCrate (validated by the
  graph engine's ValidateRoCrate — the ingest plane,
  :mod:`aruna_spark.ingest.jsonld`), UpsertDataEntity and
  UpsertContextualEntity (validated by ``validate_entity_jsonld``).
- rs:292-345 — the entity ladder, in order: payload parses as JSON;
  is a JSON OBJECT; must NOT contain ``@graph``/``graph`` (single
  entity only); ``@id`` (alias ``id``) must be a STRING whose trim is
  non-empty; ``@type`` (alias ``type``) must exist and be a non-blank
  string OR a non-empty array of strings none of which is blank
  (a number/mixed array is "must be a string or non-empty string
  array"); ``name`` must be a non-blank string. The ``@...`` key wins
  over its alias even when its value is invalid (``.or_else``).
- rs:360-380 — ReadCurrent precedes validation: an unknown OR
  tombstone-deleted document is DocumentNotFound before any payload
  work (ties into :mod:`aruna_spark.queries.doc_lifecycle` — the
  delete transaction removed the registry row).
- rs:130-183, 216-263 — an accepted update refreshes the registry row
  (public flag, updated_at, last_event_id := the new event id), mints
  the audit record whose details name the materialization kind, and
  enqueues a pending materialization status + job (drained by the
  matqueue plane, :mod:`aruna_spark.queries.matqueue`).

Spark mapping: the ladder is pure column algebra over VARIANT —
``try_parse_json`` (NULL ⇔ invalid JSON), ``json_object_keys``
(NULL ⇔ not an object), ``schema_of_variant`` for STRICT type checks
(a JSON number 5 is BIGINT, never a string — matching serde_json's
``as_str``), and array HOFs for the element rules. The oracle rebuilds
the same ladder from DuckDB's independent json_type/json_extract
machinery. At scale this is the ingest-side batch classifier: one
narrow map stage over the update stream, no shuffle.

Fixture (documents; row selection ``% 4 == 2``, discriminators
%3 (deleted — doc_lifecycle's lane), %7 (mutation kind), %13 (payload
lane) pairwise coprime to 4): payload lanes 0-12 cover valid /
valid-alias-with-type-array / bad JSON / non-object / @graph /
blank @id / missing @type / empty @type array / blank array element /
missing name / numeric @type / null-valued @id beside a valid alias /
null-valued @type beside a valid alias. Replace-RoCrate rows carry a
canonical
crate payload (their validation path is the graph engine, not this
ladder). NOW = 90_000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

NOW_MS = 90_000

_CRATE_PAYLOAD = (
    '{"@context":"https://w3id.org/ro/crate/1.1/context",'
    '"@graph":[{"@id":"ro-crate-metadata.json"}]}'
)

# lane → (payload template with <K> substituted by doc_id, error class)
PAYLOAD_LANES = [
    ('{"@id":"urn:aruna:entity:<K>","@type":"Dataset","name":"doc-<K>"}',
     None),
    ('{"id":"urn:aruna:entity:<K>","type":["Dataset","File"],'
     '"name":"doc-<K>"}', None),
    ('{"@id": broken<K>', "bad_json"),
    ('["urn:aruna:entity:<K>"]', "not_object"),
    ('{"@graph":[],"@id":"e<K>","@type":"T","name":"n"}', "has_graph"),
    ('{"@id":"   ","@type":"T","name":"n<K>"}', "missing_id"),
    ('{"@id":"e<K>","name":"n"}', "missing_type"),
    ('{"@id":"e<K>","@type":[],"name":"n"}', "bad_type"),
    ('{"@id":"e<K>","@type":["T",""],"name":"n"}', "bad_type"),
    ('{"@id":"e<K>","@type":"T"}', "missing_name"),
    ('{"@id":"e<K>","@type":5,"name":"n"}', "bad_type"),
    # null-valued @-keys: the @-key is PRESENT, so it wins over its
    # alias even though its value is JSON null (.or_else fires only on
    # key ABSENCE, rs:305-307/314-316)
    ('{"@id":null,"id":"e<K>","@type":"T","name":"n"}', "missing_id"),
    ('{"@id":"e<K>","@type":null,"type":"T","name":"n"}', "bad_type"),
]
N_LANES = len(PAYLOAD_LANES)


def load_update_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 2
    )
    k = F.col("doc_id")
    mutation = (
        F.when(k % 7 == 1, "replace_rocrate")
        .when(k % 7 == 2, "upsert_contextual_entity")
        .otherwise("upsert_data_entity")
    )
    lane_payload = None
    for i, (tpl, _err) in enumerate(PAYLOAD_LANES):
        parts = tpl.split("<K>")
        expr = F.concat(
            *[
                c
                for j, p in enumerate(parts)
                for c in (
                    [F.lit(p)] if j == 0 else [k.cast("string"), F.lit(p)]
                )
            ]
        )
        lane_payload = (
            F.when(k % N_LANES == i, expr)
            if lane_payload is None
            else lane_payload.when(k % N_LANES == i, expr)
        )
    payload = F.when(
        mutation == "replace_rocrate", F.lit(_CRATE_PAYLOAD)
    ).otherwise(lane_payload)
    return d.select(
        k.alias("document_id"),
        mutation.alias("mutation"),
        payload.alias("payload"),
        (k % 5 < 2).alias("public"),
    )


def _duck_payload_sql() -> str:
    whens = []
    for i, (tpl, _err) in enumerate(PAYLOAD_LANES):
        parts = tpl.split("<K>")
        expr = " || doc_id || ".join(
            "'" + p.replace("'", "''") + "'" for p in parts
        )
        whens.append(f"WHEN doc_id % {N_LANES} = {i} THEN {expr}")
    lanes = "CASE " + " ".join(whens) + " END"
    crate = "'" + _CRATE_PAYLOAD.replace("'", "''") + "'"
    return f"""
    requests AS (
      SELECT doc_id AS document_id,
             CASE WHEN doc_id % 7 = 1 THEN 'replace_rocrate'
                  WHEN doc_id % 7 = 2 THEN 'upsert_contextual_entity'
                  ELSE 'upsert_data_entity' END AS mutation,
             CASE WHEN doc_id % 7 = 1 THEN {crate}
                  ELSE {lanes} END AS payload,
             doc_id % 5 < 2 AS public
      FROM documents WHERE doc_id % 4 = 2
    )
"""


def entity_error_class(payload: F.Column) -> F.Column:
    """``validate_entity_jsonld`` (rs:292-345) as one CASE cascade;
    NULL = valid. STRICT typing via schema_of_variant: a JSON number
    is BIGINT, a mixed array is ARRAY<VARIANT> — neither passes."""
    v = F.try_parse_json(payload)
    keys = F.json_object_keys(payload)
    # alias precedence is on key PRESENCE, not value: serde_json's
    # object.get("@id").or_else(get("id")) returns Some(Null) for a
    # null-valued "@id", so the alias is never consulted (rs:305-316);
    # coalescing the extracted values would wrongly fall through when
    # the @-key holds JSON null.
    id_v = F.when(
        F.array_contains(keys, "@id"),
        F.try_variant_get(v, "$['@id']", "variant"),
    ).otherwise(F.try_variant_get(v, "$['id']", "variant"))
    type_v = F.when(
        F.array_contains(keys, "@type"),
        F.try_variant_get(v, "$['@type']", "variant"),
    ).otherwise(F.try_variant_get(v, "$['type']", "variant"))
    has_type_key = F.array_contains(keys, "@type") | F.array_contains(
        keys, "type"
    )
    name_v = F.try_variant_get(v, "$['name']", "variant")
    id_ok = (F.schema_of_variant(id_v) == "STRING") & (
        F.trim(F.try_variant_get(id_v, "$", "string")) != ""
    )
    t_schema = F.schema_of_variant(type_v)
    t_str_ok = (t_schema == "STRING") & (
        F.trim(F.try_variant_get(type_v, "$", "string")) != ""
    )
    t_arr = F.try_variant_get(type_v, "$", "array<string>")
    t_arr_ok = (
        (t_schema == "ARRAY<STRING>")
        & (F.size(t_arr) > 0)
        & F.forall(t_arr, lambda x: F.trim(x) != "")
    )
    name_ok = (F.schema_of_variant(name_v) == "STRING") & (
        F.trim(F.try_variant_get(name_v, "$", "string")) != ""
    )
    has_graph = F.array_contains(keys, "@graph") | F.array_contains(
        keys, "graph"
    )
    return (
        F.when(v.isNull(), "bad_json")
        .when(keys.isNull(), "not_object")
        .when(has_graph, "has_graph")
        .when(~F.coalesce(id_ok, F.lit(False)), "missing_id")
        .when(~has_type_key, "missing_type")
        .when(
            ~F.coalesce(t_str_ok | t_arr_ok, F.lit(False)), "bad_type"
        )
        .when(~F.coalesce(name_ok, F.lit(False)), "missing_name")
    )


_D_ENTITY_ERROR = """
      CASE
        WHEN NOT json_valid(payload) THEN 'bad_json'
        WHEN json_type(payload) <> 'OBJECT' THEN 'not_object'
        WHEN json_type(payload, '$."@graph"') IS NOT NULL
          OR json_type(payload, '$.graph') IS NOT NULL THEN 'has_graph'
        WHEN NOT COALESCE(
          CASE WHEN json_type(payload, '$."@id"') IS NOT NULL
               THEN json_type(payload, '$."@id"') = 'VARCHAR'
                AND trim(json_extract_string(payload, '$."@id"')) <> ''
               ELSE json_type(payload, '$.id') = 'VARCHAR'
                AND trim(json_extract_string(payload, '$.id')) <> ''
          END, FALSE) THEN 'missing_id'
        WHEN json_type(payload, '$."@type"') IS NULL
         AND json_type(payload, '$.type') IS NULL THEN 'missing_type'
        WHEN NOT COALESCE(
          CASE WHEN json_type(payload, '$."@type"') IS NOT NULL THEN
            (json_type(payload, '$."@type"') = 'VARCHAR'
             AND trim(json_extract_string(payload, '$."@type"')) <> '')
            OR (json_type(payload, '$."@type"') = 'ARRAY'
                AND json_array_length(payload, '$."@type"') > 0
                AND len(list_filter(
                      json_extract(payload, '$."@type"[*]'),
                      x -> json_type(x) <> 'VARCHAR'
                           OR trim(CAST(x->>'$' AS VARCHAR)) = '')) = 0)
          ELSE
            (json_type(payload, '$.type') = 'VARCHAR'
             AND trim(json_extract_string(payload, '$.type')) <> '')
            OR (json_type(payload, '$.type') = 'ARRAY'
                AND json_array_length(payload, '$.type') > 0
                AND len(list_filter(
                      json_extract(payload, '$.type[*]'),
                      x -> json_type(x) <> 'VARCHAR'
                           OR trim(CAST(x->>'$' AS VARCHAR)) = '')) = 0)
          END, FALSE) THEN 'bad_type'
        WHEN NOT COALESCE(
          json_type(payload, '$.name') = 'VARCHAR'
          AND trim(json_extract_string(payload, '$.name')) <> '',
          FALSE) THEN 'missing_name'
      END
"""


@register(
    "registry_update_batch",
    oracle=f"""
    WITH {_duck_payload_sql()},
    staged AS (
      SELECT r.*,
             r.document_id % 3 = 1 AS tombstoned,
             CASE WHEN r.mutation = 'replace_rocrate' THEN NULL
                  ELSE {_D_ENTITY_ERROR} END AS entity_error
      FROM requests r
    )
    SELECT document_id, mutation,
           CASE WHEN tombstoned THEN 'document_not_found'
                WHEN entity_error IS NOT NULL THEN 'invalid_input'
                ELSE 'accepted' END AS outcome,
           CASE WHEN NOT tombstoned THEN entity_error END AS error_class,
           CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN public END AS public,
           CAST(CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN {NOW_MS} END AS BIGINT) AS updated_at_ms,
           CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN 'ev-' || document_id END AS last_event_id,
           CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN 'update' END AS audit_operation,
           CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN CASE mutation
                       WHEN 'replace_rocrate' THEN 'replace_ro_crate'
                       WHEN 'upsert_contextual_entity'
                         THEN 'upsert_contextual_entity'
                       ELSE 'upsert_data_entity' END END AS mat_kind,
           CAST(CASE WHEN NOT tombstoned AND entity_error IS NULL
                THEN {NOW_MS} END AS BIGINT) AS materialization_due_ms
    FROM staged
    """,
)
def registry_update_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A batch of document updates through ReadCurrent → validation →
    projection: tombstoned targets 404 before any payload work,
    entity mutations run the real JSON-LD ladder on the payload
    column, and accepted rows mint the refreshed registry projection
    (public, updated_at, new last_event_id), the Update audit stamp
    and the pending materialization job the matqueue drains."""
    reqs = load_update_requests(spark, sf_dir)
    from aruna_spark.queries.doc_lifecycle import deleted_lifecycle

    tomb = deleted_lifecycle(spark, sf_dir).select(
        F.col("document_id"), F.lit(True).alias("__tomb")
    )
    staged = reqs.join(F.broadcast(tomb), "document_id", "left").select(
        "*",
        F.when(
            F.col("mutation") == "replace_rocrate",
            F.lit(None).cast("string"),
        )
        .otherwise(entity_error_class(F.col("payload")))
        .alias("__err"),
    )
    tombstoned = F.col("__tomb").isNotNull()
    accepted = ~tombstoned & F.col("__err").isNull()
    mat_kind = (
        F.when(F.col("mutation") == "replace_rocrate", "replace_ro_crate")
        .otherwise(F.col("mutation"))
    )
    return staged.select(
        "document_id",
        "mutation",
        F.when(tombstoned, "document_not_found")
        .when(F.col("__err").isNotNull(), "invalid_input")
        .otherwise("accepted")
        .alias("outcome"),
        F.when(~tombstoned, F.col("__err")).alias("error_class"),
        F.when(accepted, F.col("public")).alias("public"),
        F.when(accepted, F.lit(NOW_MS)).cast("long").alias("updated_at_ms"),
        F.when(
            accepted,
            F.concat(F.lit("ev-"), F.col("document_id").cast("string")),
        ).alias("last_event_id"),
        F.when(accepted, F.lit("update")).alias("audit_operation"),
        F.when(accepted, mat_kind).alias("mat_kind"),
        F.when(accepted, F.lit(NOW_MS))
        .cast("long")
        .alias("materialization_due_ms"),
    )
