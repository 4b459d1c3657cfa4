"""Placement strategy binding precedence.

Reference: ``operations/src/placement/resolver.rs``
(``resolve_strategy``, rs:374-437 + ``strategy_for_target``,
rs:162-185): the strategy a document places under resolves through

1. the subject OVERRIDE's strategy id when set — a dangling id
   REJECTS the resolution rather than falling through (rs:380-382);
2. for Metadata/MetadataRegistry targets with a path: the LONGEST
   matching path-prefix binding, where a prefix matches exactly or
   on a segment boundary (``metadata_path_prefix_match_len``,
   rs:440-452 — ``projects/p1`` matches ``projects/p1/x`` but not
   ``projects/p10``); the empty prefix matches everything at rank 0;
3. the target group's binding;
4. the document-class binding;
5. the realm-wide binding;
6. ``default_strategy_id`` (dangling rejects);
7. else the first configured strategy (rs:179-183).

Spark mapping: each rung is a left join (the prefix rung a
segment-boundary theta-join + per-target max); the ladder is one
CASE over the joined flags. Bindings and strategies are
config-sized dimensions.

Modeled fixture: documents are the targets — path
``projects/p(doc%5)/t(doc%3)/run-doc``, group ``grp-(doc%10)``,
class metadata / metadata_registry / blob by ``doc%4``; overrides on
``doc%11==0`` (dangling when ``doc%22==0``); bindings: prefixes
``projects/p1`` and the longer ``projects/p1/t2``, group ``grp-3``,
class ``metadata_registry``, and a realm-wide catch-all (so the
default rung is config-level dead code here — unit-tested separately
with a realm-binding-free config).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

BINDINGS = [
    # (scope_kind, scope_value, strategy)
    ("path_prefix", "projects/p1", "strat-p1"),
    ("path_prefix", "projects/p1/t2", "strat-p1t2"),
    ("group", "grp-3", "strat-g3"),
    ("class", "metadata_registry", "strat-reg"),
    ("realm", "", "strat-realm"),
]
STRATEGIES = (
    "strat-p1",
    "strat-p1t2",
    "strat-g3",
    "strat-reg",
    "strat-realm",
    "strat-ov",
    "strat-def",
)
DEFAULT_STRATEGY = "strat-def"

# resolve_strategy_binding folds the bindings relation into driver-side
# CASE cascades — sound only for a config-sized dimension. The
# reference holds bindings inside ONE realm config document, so a few
# thousand rungs is already far past anything real.
_MAX_BINDINGS = 10_000


def load_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("doc_id")
    return load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("target_id"),
        F.concat(
            F.lit("projects/p"),
            (k % 5).cast("string"),
            F.lit("/t"),
            (k % 3).cast("string"),
            F.lit("/run-"),
            k.cast("string"),
        ).alias("path"),
        F.concat(F.lit("grp-"), (k % 10).cast("string")).alias("group_id"),
        F.when(k % 4 == 2, "metadata_registry")
        .when(k % 4 == 3, "blob")
        .otherwise("metadata")
        .alias("doc_class"),
        F.when(
            k % 11 == 0,
            F.when(k % 22 == 0, "strat-ghost").otherwise("strat-ov"),
        ).alias("override_strategy"),
    )


def resolve_strategy_binding(
    targets: DataFrame, bindings: DataFrame, strategies: tuple, default: str
) -> DataFrame:
    """(target_id, level, strategy) through the seven-rung ladder.

    The bindings relation is a config-sized dimension (the reference
    holds it in the realm config document), so every rung folds into
    codegen CASE expressions over ONE pass of the target relation —
    the original shape (a prefix theta-join, a groupBy on the
    corpus-sized target_id, a join-back, plus two dimension joins)
    paid three exchanges and re-scanned the targets twice for a
    five-row lookup table (r15: 3.3 s -> 0.9 s at sf0.1)."""
    # plain collect: a coalesce(1) here was measured at ~5 s — the
    # single merged task computes every parent partition of the
    # Python-created frame sequentially through the Python runner
    rows = bindings.limit(_MAX_BINDINGS + 1).collect()
    # guard the config-sized assumption (ADVICE r15): an oversized
    # bindings relation must fail loudly, not OOM the driver, and a
    # duplicate (scope_kind, scope_value) row must not silently resolve
    # to whichever row the collect returned last
    if len(rows) > _MAX_BINDINGS:
        raise ValueError(
            f"bindings relation exceeds {_MAX_BINDINGS} rows — "
            "not a config-sized dimension; refusing to fold to CASE maps"
        )
    seen_scopes = [(r["scope_kind"], r["scope_value"]) for r in rows]
    if len(set(seen_scopes)) != len(seen_scopes):
        raise ValueError(
            "duplicate (scope_kind, scope_value) in bindings — the CASE "
            "fold would pick an arbitrary winner where the old join "
            "shape duplicated the target rows"
        )
    # longest-prefix rung: evaluate prefixes longest-first so the first
    # matching WHEN is the max_by(length) winner (segment-boundary or
    # exact match; the empty prefix matches everything at rank 0)
    prefixes = sorted(
        (
            (r["scope_value"], r["strategy"])
            for r in rows
            if r["scope_kind"] == "path_prefix"
        ),
        key=lambda kv: len(kv[0]),
        reverse=True,
    )
    path_strategy = F.lit(None).cast("string")
    for pv, st in reversed(list(prefixes)):
        matches = (
            (F.col("path") == F.lit(pv))
            | F.col("path").startswith(pv + "/")
            | F.lit(pv == "")
        )
        path_strategy = F.when(matches, F.lit(st)).otherwise(path_strategy)
    group_map = {
        r["scope_value"]: r["strategy"]
        for r in rows
        if r["scope_kind"] == "group"
    }
    class_map = {
        r["scope_value"]: r["strategy"]
        for r in rows
        if r["scope_kind"] == "class"
    }

    def _lookup(col: str, mapping: dict):
        expr = F.lit(None).cast("string")
        for k, v in mapping.items():
            expr = F.when(F.col(col) == F.lit(k), F.lit(v)).otherwise(expr)
        return expr

    realm_rows = [r for r in rows if r["scope_kind"] == "realm"]
    realm_strategy = realm_rows[0]["strategy"] if realm_rows else None
    joined = targets.withColumns(
        {
            "path_strategy": path_strategy,
            "group_strategy": _lookup("group_id", group_map),
            "class_strategy": _lookup("doc_class", class_map),
        }
    )
    is_meta = F.col("doc_class").isin("metadata", "metadata_registry")
    level = (
        F.when(
            F.col("override_strategy").isNotNull(),
            F.when(
                F.col("override_strategy").isin(*strategies), F.lit("override")
            ).otherwise(F.lit("error_dangling")),
        )
        .when(is_meta & F.col("path_strategy").isNotNull(), F.lit("path"))
        .when(F.col("group_strategy").isNotNull(), F.lit("group"))
        .when(F.col("class_strategy").isNotNull(), F.lit("class"))
        .when(F.lit(realm_strategy is not None), F.lit("realm"))
        .when(F.lit(default is not None), F.lit("default"))
        .otherwise(F.lit("first"))
    )
    strategy = (
        F.when(level == "override", F.col("override_strategy"))
        .when(level == "path", F.col("path_strategy"))
        .when(level == "group", F.col("group_strategy"))
        .when(level == "class", F.col("class_strategy"))
        .when(level == "realm", F.lit(realm_strategy))
        .when(level == "default", F.lit(default))
    )
    return joined.select(
        "target_id", level.alias("level"), strategy.alias("strategy")
    )


def bindings_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BINDINGS, "scope_kind string, scope_value string, strategy string"
    )


_D_BINDINGS = ", ".join(
    f"('{k}', '{v}', '{s}')" for k, v, s in BINDINGS
)
_D_STRATS = ", ".join(f"'{s}'" for s in STRATEGIES)


@register(
    "placement_strategy_binding",
    oracle=f"""
    WITH targets AS (
      SELECT 'doc-' || doc_id AS target_id,
             'projects/p' || (doc_id % 5) || '/t' || (doc_id % 3)
               || '/run-' || doc_id AS path,
             'grp-' || (doc_id % 10) AS group_id,
             CASE doc_id % 4 WHEN 2 THEN 'metadata_registry'
                  WHEN 3 THEN 'blob' ELSE 'metadata' END AS doc_class,
             CASE WHEN doc_id % 11 = 0 THEN
               CASE WHEN doc_id % 22 = 0 THEN 'strat-ghost'
                    ELSE 'strat-ov' END END AS override_strategy
      FROM documents
    ),
    b(scope_kind, scope_value, strategy) AS (VALUES {_D_BINDINGS}),
    pathm AS (
      SELECT t.target_id,
             arg_max(p.strategy, length(p.scope_value)) AS path_strategy
      FROM targets t
      LEFT JOIN b p ON p.scope_kind = 'path_prefix'
        AND (t.path = p.scope_value
             OR starts_with(t.path, p.scope_value || '/')
             OR p.scope_value = '')
      GROUP BY t.target_id
    ),
    j AS (
      SELECT t.*, pm.path_strategy,
             g.strategy AS group_strategy,
             c.strategy AS class_strategy
      FROM targets t
      JOIN pathm pm USING (target_id)
      LEFT JOIN b g ON g.scope_kind = 'group'
                   AND g.scope_value = t.group_id
      LEFT JOIN b c ON c.scope_kind = 'class'
                   AND c.scope_value = t.doc_class
    )
    SELECT target_id,
           CASE
             WHEN override_strategy IS NOT NULL THEN
               CASE WHEN override_strategy IN ({_D_STRATS})
                    THEN 'override' ELSE 'error_dangling' END
             WHEN doc_class IN ('metadata', 'metadata_registry')
                  AND path_strategy IS NOT NULL THEN 'path'
             WHEN group_strategy IS NOT NULL THEN 'group'
             WHEN class_strategy IS NOT NULL THEN 'class'
             ELSE 'realm'
           END AS level,
           CASE
             WHEN override_strategy IS NOT NULL THEN
               CASE WHEN override_strategy IN ({_D_STRATS})
                    THEN override_strategy END
             WHEN doc_class IN ('metadata', 'metadata_registry')
                  AND path_strategy IS NOT NULL THEN path_strategy
             WHEN group_strategy IS NOT NULL THEN group_strategy
             WHEN class_strategy IS NOT NULL THEN class_strategy
             ELSE 'strat-realm'
           END AS strategy
    FROM j
    """,
)
def placement_strategy_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document through the binding ladder: overrides win (a
    dangling override id is an error, never a fall-through), metadata
    paths take the LONGEST segment-boundary prefix, then group, class,
    and the realm catch-all. The oracle re-derives the longest match
    via arg_max over an independent join."""
    return resolve_strategy_binding(
        load_targets(spark, sf_dir),
        bindings_df(spark),
        STRATEGIES,
        DEFAULT_STRATEGY,
    )
