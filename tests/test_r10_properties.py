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
    from aruna_spark.queries.sync_suite import sync_create_validate  # noqa: F401

    # drive the same ladder the registered query uses, over generated
    # catalogs instead of the fixture
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
    rel_df = spark.createDataFrame(
        rel_rows,
        "source_bucket string, source_prefix string,"
        " target_node string, target_bucket string, mode string,"
        " state string",
    ) if rel_rows else spark.createDataFrame(
        [],
        "source_bucket string, source_prefix string,"
        " target_node string, target_bucket string, mode string,"
        " state string",
    )

    existing = rel_df.filter(F.col("state") != "detached").select(
        F.col("source_bucket").alias("__sb"),
        F.col("source_prefix").alias("__sp"),
        F.col("target_node").alias("__tn"),
        F.col("target_bucket").alias("__tb"),
        F.col("mode").alias("__m"),
        F.lit(True).alias("__dup"),
    ).distinct()
    joined = req_df.join(
        F.broadcast(existing),
        (F.col("source_bucket") == F.col("__sb"))
        & F.col("source_prefix").eqNullSafe(F.col("__sp"))
        & (F.col("target_node") == F.col("__tn"))
        & (F.col("target_bucket") == F.col("__tb"))
        & (F.col("mode") == F.col("__m")),
        "left",
    )
    same = (
        (F.col("target_node") == "node1")
        & (F.col("target_bucket") == F.col("source_bucket"))
        & F.col("target_prefix").eqNullSafe(F.col("source_prefix"))
    )
    outcome = (
        F.when(F.col("target_bucket") == "", "bad_endpoint")
        .when(same, "same_endpoint")
        .when(F.col("__dup").isNotNull(), "duplicate")
        .otherwise("accepted")
    )
    got = {
        r.request_id: r.o
        for r in joined.select("request_id", outcome.alias("o")).collect()
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
        [(b,) for b in sorted(catalog_buckets)], "name string"
    )
    existing = (
        rel_df.filter(
            (F.col("mode") == "continuous")
            & F.col("source_prefix").isNull()
        )
        .select(
            F.col("source_bucket").alias("__sb"),
            F.col("target_node").alias("__tn"),
            F.col("target_bucket").alias("__tb"),
            F.lit(True).alias("__exists"),
        )
        .distinct()
    )
    staged = (
        tgt_df.join(
            F.broadcast(catalog.withColumnRenamed("name", "bucket")
                        .withColumn("__in_cat", F.lit(True))),
            "bucket", "left",
        )
        .join(
            F.broadcast(existing),
            (F.col("bucket") == F.col("__sb"))
            & (F.col("target_node") == F.col("__tn"))
            & (F.col("target_bucket") == F.col("__tb")),
            "left",
        )
    )
    invalid = (
        (F.col("target_realm") != "realmA")
        | F.col("target_bucket").startswith("ws-")
        | ~F.col("arn_roundtrips")
        | (
            (F.col("target_node") == "node1")
            & (F.col("target_bucket") == F.col("bucket"))
        )
    )
    cls = (
        F.when(F.col("__in_cat").isNull(), "bucket_missing")
        .when(F.col("bucket").startswith("ws-"), "ws_source")
        .when(invalid, "invalid_target")
        .when(F.col("__exists").isNotNull(), "skipped")
        .otherwise("migrated")
    )
    got = {
        r.legacy_id: r.c
        for r in staged.select("legacy_id", cls.alias("c")).collect()
    }
    want = {
        i: _migrate_port(t, catalog_buckets, rels)
        for i, t in enumerate(targets)
    }
    assert got == want
