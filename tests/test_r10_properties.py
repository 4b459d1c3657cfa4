"""Hypothesis properties for the round-10 operators: the sync
create-validation ladder and the legacy-migration classifier compared
against literal Python ports of the reference's route/migration logic,
over generated inputs batched into ONE DataFrame evaluation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=20, deadline=None)

_BUCKETS = ["", "bkt0", "bkt1", "tgt0", "ws-x", "fresh1"]
_NODES = ["node0", "node1", "node2"]
_MODES = ["once", "continuous", "reference"]
_PREFIXES = [None, "p1/", "p2/"]


def _create_port(req, existing):
    """Literal port of the create route's ladder (sync.rs:249-306 +
    sync_relationship.rs:168-174): endpoint build, source!=target,
    duplicate scan over NON-detached (source, target, mode)."""
    if req["target_bucket"] == "":
        return "bad_endpoint"
    if (
        req["target_node"] == "node1"
        and req["target_bucket"] == req["source_bucket"]
        and req["target_prefix"] == req["source_prefix"]
    ):
        return "same_endpoint"
    for e in existing:
        if e["state"] == "detached":
            continue
        if (
            e["source_bucket"] == req["source_bucket"]
            and e["source_prefix"] == req["source_prefix"]
            and e["target_node"] == req["target_node"]
            and e["target_bucket"] == req["target_bucket"]
            and e["mode"] == req["mode"]
        ):
            return "duplicate"
    return "accepted"


_req = st.fixed_dictionaries(
    {
        "source_bucket": st.sampled_from(["bkt0", "bkt1"]),
        "source_prefix": st.sampled_from(_PREFIXES),
        "target_node": st.sampled_from(_NODES),
        "target_bucket": st.sampled_from(_BUCKETS),
        "target_prefix": st.sampled_from(_PREFIXES),
        "mode": st.sampled_from(_MODES),
        "req_handling": st.sampled_from(
            ["materialize", "preserve", "skip"]
        ),
    }
)

_rel = st.fixed_dictionaries(
    {
        "source_bucket": st.sampled_from(["bkt0", "bkt1"]),
        "source_prefix": st.sampled_from(_PREFIXES),
        "target_node": st.sampled_from(_NODES),
        "target_bucket": st.sampled_from(["bkt0", "tgt0", "fresh1"]),
        "mode": st.sampled_from(_MODES),
        "state": st.sampled_from(["enabled", "paused", "detached"]),
    }
)


@given(st.lists(_req, min_size=1, max_size=12),
       st.lists(_rel, min_size=0, max_size=8))
@settings(**SETTINGS)
def test_create_validate_matches_literal_port(spark, reqs, rels):
    """Drives the PRODUCTION ladder (validate_sync_creates — the same
    function the registered query instantiates) over generated
    request/catalog pairs."""
    from aruna_spark.queries.sync_suite import validate_sync_creates

    req_rows = [
        (
            i,
            r["source_bucket"], r["source_prefix"], r["target_node"],
            r["target_bucket"], r["target_prefix"], r["mode"],
            r["req_handling"],
        )
        for i, r in enumerate(reqs)
    ]
    req_df = spark.createDataFrame(
        req_rows,
        "request_id long, source_bucket string, source_prefix string,"
        " target_node string, target_bucket string,"
        " target_prefix string, mode string, req_handling string",
    )
    rel_rows = [
        (
            r["source_bucket"], r["source_prefix"], r["target_node"],
            r["target_bucket"], r["mode"], r["state"],
        )
        for r in rels
    ]
    rel_schema = (
        "source_bucket string, source_prefix string,"
        " target_node string, target_bucket string, mode string,"
        " state string"
    )
    rel_df = spark.createDataFrame(rel_rows or [], rel_schema)

    got = {
        r.request_id: r.outcome
        for r in validate_sync_creates(req_df, rel_df).collect()
    }
    want = {i: _create_port(r, rels) for i, r in enumerate(reqs)}
    assert got == want


# ------------------------------------------------ legacy migration
def _migrate_port(target, catalog_buckets, existing):
    """Literal port of the migration classification
    (migration.rs:52-145): bucket read -> ws guard -> target ARN
    validation -> idempotent skip on (source, target, Continuous)."""
    if target["bucket"] not in catalog_buckets:
        return "bucket_missing"
    if target["bucket"].startswith("ws-"):
        return "ws_source"
    if (
        target["target_realm"] != "realmA"
        or target["target_bucket"].startswith("ws-")
        or not target["arn_roundtrips"]
        or (
            target["target_node"] == "node1"
            and target["target_bucket"] == target["bucket"]
        )
    ):
        return "invalid_target"
    for e in existing:
        if (
            e["mode"] == "continuous"
            and e["source_prefix"] is None
            and e["source_bucket"] == target["bucket"]
            and e["target_node"] == target["target_node"]
            and e["target_bucket"] == target["target_bucket"]
        ):
            return "skipped"
    return "migrated"


_target = st.fixed_dictionaries(
    {
        "bucket": st.sampled_from(
            ["bkt0", "bkt1", "bkt2", "ws-stage", "gone0"]
        ),
        "target_realm": st.sampled_from(["realmA", "realmB"]),
        "target_node": st.sampled_from(_NODES),
        "target_bucket": st.sampled_from(
            ["bkt0", "tgt0", "tgt4", "ws-mirror"]
        ),
        "arn_roundtrips": st.booleans(),
    }
)

_out_rel = st.fixed_dictionaries(
    {
        "source_bucket": st.sampled_from(["bkt0", "bkt1", "bkt2"]),
        "source_prefix": st.sampled_from(_PREFIXES),
        "target_node": st.sampled_from(_NODES),
        "target_bucket": st.sampled_from(["tgt0", "tgt4", "bkt0"]),
        "mode": st.sampled_from(_MODES),
    }
)


@given(st.lists(_target, min_size=1, max_size=12),
       st.lists(_out_rel, min_size=0, max_size=8))
@settings(**SETTINGS)
def test_legacy_migration_matches_literal_port(spark, targets, rels):
    catalog_buckets = {"bkt0", "bkt1", "bkt2", "ws-stage"}
    tgt_df = spark.createDataFrame(
        [
            (i, t["bucket"], t["target_realm"], t["target_node"],
             t["target_bucket"], t["arn_roundtrips"])
            for i, t in enumerate(targets)
        ],
        "legacy_id long, bucket string, target_realm string,"
        " target_node string, target_bucket string,"
        " arn_roundtrips boolean",
    )
    schema = (
        "source_bucket string, source_prefix string,"
        " target_node string, target_bucket string, mode string"
    )
    rel_df = spark.createDataFrame(
        [
            (r["source_bucket"], r["source_prefix"], r["target_node"],
             r["target_bucket"], r["mode"])
            for r in rels
        ] or [],
        schema,
    )
    catalog = spark.createDataFrame(
        [(b, f"owner-{b}") for b in sorted(catalog_buckets)],
        "name string, created_by string",
    )
    from aruna_spark.queries.sync_suite import classify_legacy_targets

    tgt_df = tgt_df.withColumn(
        "replicate_delete_markers", F.lit(True)
    )
    out = classify_legacy_targets(tgt_df, catalog, rel_df).collect()
    got = {
        r.legacy_id: (r.reason if r.outcome == "failed" else r.outcome)
        for r in out
    }
    want = {
        i: _migrate_port(t, catalog_buckets, rels)
        for i, t in enumerate(targets)
    }
    assert got == want
    # the production summary conserves over the generated batch too
    head = out[0]
    assert head.n_migrated + head.n_skipped + head.n_failed == len(out)
    assert head.marks_complete == (head.n_failed == 0)
