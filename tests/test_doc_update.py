"""Update-document entity validation ladder + projection batch
(update_metadata_document.rs:292-345, 130-183)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aruna_spark.queries.doc_update import (
    NOW_MS,
    entity_error_class,
    load_update_requests,
    registry_update_batch,
)


@pytest.fixture(scope="module")
def batch(spark, sf_dir):
    return registry_update_batch(spark, sf_dir).collect()


def test_every_lane_populated_at_sf0001(batch):
    """Coprimality guard: outcomes, error classes and mutation kinds
    all alive at test scale."""
    assert {r.outcome for r in batch} == {
        "document_not_found",
        "invalid_input",
        "accepted",
    }
    classes = {r.error_class for r in batch if r.error_class}
    assert classes == {
        "bad_json",
        "not_object",
        "has_graph",
        "missing_id",
        "missing_type",
        "bad_type",
        "missing_name",
    }
    assert {r.mutation for r in batch} == {
        "replace_rocrate",
        "upsert_data_entity",
        "upsert_contextual_entity",
    }


def test_not_found_precedes_validation(batch):
    """ReadCurrent runs before any payload work: a tombstoned target
    is document_not_found even when its payload is garbage."""
    for r in batch:
        if r.document_id % 3 == 1:
            assert r.outcome == "document_not_found"
            assert r.error_class is None


def test_replace_rocrate_skips_entity_ladder(batch):
    for r in batch:
        if r.mutation == "replace_rocrate" and r.document_id % 3 != 1:
            assert r.outcome == "accepted"
            assert r.mat_kind == "replace_ro_crate"


def test_accepted_rows_mint_projection(batch):
    acc = [r for r in batch if r.outcome == "accepted"]
    assert acc
    for r in acc:
        assert r.updated_at_ms == NOW_MS
        assert r.last_event_id == f"ev-{r.document_id}"
        assert r.audit_operation == "update"
        assert r.materialization_due_ms == NOW_MS
        assert r.public == (r.document_id % 5 < 2)
    rej = [r for r in batch if r.outcome != "accepted"]
    assert all(r.last_event_id is None and r.public is None for r in rej)


def _classify(spark, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    rows = df.select(
        "payload", entity_error_class(F.col("payload")).alias("e")
    ).collect()
    return [r.e for r in rows]


def test_ladder_edge_cases_match_reference(spark):
    """Literal payloads the fixture lanes don't reach — strict typing
    and alias precedence (rs:292-345)."""
    cases = [
        # numeric @id is not a string → missing_id (as_str fails)
        ('{"@id":7,"@type":"T","name":"n"}', "missing_id"),
        # @graph beats every later defect
        ('{"@graph":{}}', "has_graph"),
        ("{\"graph\":[],\"@id\":\"e\"}", "has_graph"),
        # alias precedence: @type wins even when invalid, type ignored
        ('{"@id":"e","@type":5,"type":"T","name":"n"}', "bad_type"),
        # alias accepted when @-key absent
        ('{"id":"e","type":"T","name":"n"}', None),
        # mixed-type array is not a string array
        ('{"@id":"e","@type":["T",5],"name":"n"}', "bad_type"),
        # blank name / numeric name
        ('{"@id":"e","@type":"T","name":"  "}', "missing_name"),
        ('{"@id":"e","@type":"T","name":3}', "missing_name"),
        # empty payload object
        ("{}", "missing_id"),
        # whitespace-only type string
        ('{"@id":"e","@type":" ","name":"n"}', "bad_type"),
        # null-valued @-key is PRESENT → wins over a valid alias
        # (serde_json get returns Some(Null); .or_else never fires)
        ('{"@id":null,"id":"e","@type":"T","name":"n"}', "missing_id"),
        ('{"@id":"e","@type":null,"type":"T","name":"n"}', "bad_type"),
        # null @type with NO alias is still bad_type, not missing_type
        ('{"@id":"e","@type":null,"name":"n"}', "bad_type"),
        ('{"@id":"e","type":null,"name":"n"}', "bad_type"),
    ]
    got = _classify(spark, [c[0] for c in cases])
    assert got == [c[1] for c in cases]


def test_requests_payload_is_engine_agnostic(spark, sf_dir):
    """The Spark-built payload strings must byte-match the oracle's ||
    construction (same JSON reaches both ladders)."""
    rows = load_update_requests(spark, sf_dir).collect()
    import duckdb

    from aruna_spark.queries.doc_update import _duck_payload_sql

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    duck = {
        r[0]: r[1]
        for r in con.sql(
            f"WITH {_duck_payload_sql()} "
            "SELECT document_id, payload FROM requests"
        ).fetchall()
    }
    assert {r.document_id: r.payload for r in rows} == duck
