"""Metadata-create placement resolution: the id-mint and supplied-id
validation ladders of ``operations/src/create_metadata_document.rs``.

Reference surface (the last uncovered query-shaped kernel of the
create path — the transaction/fence/retry state machine around it is
orchestration):

- ``create_handle`` (rs:686-712): the pre-provisioned binding handle
  for ``(scope, Metadata, strategy)`` — GROUP scope preferred, realm
  scope as fallback, ``PlacementBindingUnavailable`` when neither is
  provisioned. ``handle_for`` (core binding_directory.rs:151-165)
  returns the numerically LOWEST handle bound to the tuple, and a
  CONFLICTED handle "is a valid alias for nothing" (rs:106) — it never
  satisfies the lookup, so a group whose only binding handle is
  conflicted falls through to the realm rung.
- ``choose_origin_bucket`` (placement/mod.rs:404-424): a local create
  stamps the best-ranked bucket the RECEIVING NODE already holds
  (weighted rendezvous of the held buckets on the document subject,
  weight 1 each), so the origin can always publish onto the bucket's
  topic; ``None`` → ``OriginHoldsNoBucket`` (the caller forwards to a
  holder). ``held_buckets`` is empty for a node unknown to the config
  (rs:384-385).
- forwarded creates (``mint_forward_document``, rs:623-630 +
  resolve_create_placement rs:671-676): the bucket is the BLIND hash
  ``shard_for_subject(subject, shard_count)`` — every holder the
  forwarder may try stamps the same bucket.
- ``resolve_metadata_id`` (rs:507-542) for caller-supplied ids, rung
  order exactly: handle resolve (Unknown / Conflicted fail closed,
  binding_directory.rs:140-147) → strategy lookup (UnknownStrategy) →
  ``validate_bucket`` against the strategy's bucket count
  (BucketOutOfRange) → document class must be Metadata → placement
  scope must match the create target (Realm(id) == realm;
  Group(id) == group).
- subject = realm ‖ group ‖ normalized path (``meta_bucket_subject``,
  resolver.rs:244-251; this repo's string-subject convention joins
  with '|'), path normalization = trim + trim_matches('/')
  (metadata_registry.rs:35-37).

The governing-STRATEGY resolution rung (``strategy_for_target``) is
the ``placement_strategy_binding`` query's plane (queries/bindings.py)
and is not re-modeled here — the fixture assigns each request its
resolved strategy directly.

Spark shape (r16): the binding directory folds per call into codegen
CASE cascades; the held-bucket view (read from its materialized store)
collapses to a per-(strategy, origin) candidate-ARRAY dimension
attached by one broadcast join — ONE pass over the request scan, no
shuffle, no union. The rendezvous pick is an ``array_min`` over a
``transform``-scored candidate array; candidates per request stay
bounded by one node's held-bucket count (≈ shard_count · replicas /
nodes), never the shard space, and nothing here scans per request.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.placement import (
    ROLE_SHARD,
    duck_neg_log2_cte,
    duck_selector_hash,
    duck_shard_sql,
    neg_log2_q24,
    selector_hash,
    shard_for_subject,
)
from aruna_spark.queries import register
from aruna_spark.queries.node_info import (
    HELD_CTE_SQL,
    SHARD_COUNT,
    held_buckets,
)

REALM = "realm-0"
SELF_NODE = "node-05"  # the create-receiving node (placement.py ids)
UNKNOWN_NODE = "node-99"  # not in the cluster view: holds nothing
SPARSE_NODE = "node-22"  # holds strat-a buckets but none of strat-b

#: The binding directory: (handle, scope_kind, scope_value, class,
#: strategy, state). Handle 2 duplicates handle 1's tuple (lowest
#: wins); handle 6 is CONFLICTED (aliases nothing — grp-5's group rung
#: falls through to realm); handle 7 names a blob tuple; handle 8 a
#: strategy the config no longer carries.
DIRECTORY = [
    (1, "group", "grp-3", "metadata", "strat-a", "bound"),
    (2, "group", "grp-3", "metadata", "strat-a", "bound"),
    (5, "group", "grp-7", "metadata", "strat-b", "bound"),
    (3, "realm", REALM, "metadata", "strat-a", "bound"),
    (4, "realm", REALM, "metadata", "strat-b", "bound"),
    (6, "group", "grp-5", "metadata", "strat-a", "conflicted"),
    (7, "realm", REALM, "blob", "strat-a", "bound"),
    (8, "realm", REALM, "metadata", "strat-ghost", "bound"),
]
#: Strategies the realm config actually carries (bucket_count_of —
#: strat-ghost resolves a tuple but then fails UnknownStrategy).
KNOWN_STRATEGIES = ("strat-a", "strat-b")

_DIR_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"({h}, '{sk}', '{sv}', '{cl}', '{st}', '{state}')"
        for h, sk, sv, cl, st, state in DIRECTORY
    )
    + ") d(handle, scope_kind, scope_value, doc_class, strategy, state)"
)


def load_directory(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DIRECTORY,
        "handle int, scope_kind string, scope_value string, doc_class string,"
        " strategy string, state string",
    )


def load_create_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A create batch over orders (k % 9 == 4): mode lane local /
    forward / supplied from t % 3 (t = the filtered row index), the
    governing strategy by parity with a bindingless strat-c lane
    (k % 17 == 2), an unknown-origin lane (k % 23 == 7) plus a
    sparse-origin lane (k % 23 == 15 — a node holding buckets of one
    strategy only, so its strat-b locals hit OriginHoldsNoBucket while
    its strat-a locals mint), a
    needs-normalization path lane (k % 13 == 1), and seven supplied-id
    sub-lanes from (t // 3) % 7 covering every resolve_metadata_id
    rung (sub 0 alternates group-scope and realm-scope matches)."""
    keyed = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 4)
        .select(F.col("o_orderkey").alias("k"))
    )
    return _requests_from_keys(keyed)


def load_create_requests_decade(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-proportional decade fixture (VERDICT r13 Next #4): ONE
    create request per document, same lane algebra and pipeline —
    ``documents`` is the only row table the sf10 slice carries, and
    the registered orders-keyed fixture stays untouched (changing a
    registered fixture forces a correctness-window re-slot)."""
    keyed = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("k")
    )
    return _requests_from_keys(keyed)


def _requests_from_keys(keyed: DataFrame) -> DataFrame:
    k = F.col("k")
    t = F.floor((k - 4) / 9)
    mode = (
        F.when(t % 3 == 0, "local")
        .when(t % 3 == 1, "forward")
        .otherwise("supplied")
    )
    sub = F.floor(t / 3) % 7
    # k % 7, NOT parity: the group digit (k % 10) fixes parity under
    # the k % 9 == 4 filter, so a parity-based strategy would never
    # pair grp-3 with strat-a (CRT) — 7/9/10/17 are pairwise coprime
    strat = F.when(k % 17 == 2, "strat-c").otherwise(
        F.when(k % 7 <= 2, "strat-a").otherwise("strat-b")
    )
    group = F.when(
        mode == "supplied",
        F.when(sub.isin(0, 3), "grp-3")
        .when(sub == 6, "grp-9")
        .otherwise(F.concat(F.lit("grp-"), (k % 10).cast("string"))),
    ).otherwise(F.concat(F.lit("grp-"), (k % 10).cast("string")))
    raw_path = F.when(
        k % 13 == 1,
        F.concat(
            F.lit("/projects/p"),
            (k % 5).cast("string"),
            F.lit("/run-"),
            k.cast("string"),
            F.lit("/"),
        ),
    ).otherwise(
        F.concat(
            F.lit("projects/p"),
            (k % 5).cast("string"),
            F.lit("/run-"),
            k.cast("string"),
        )
    )
    norm = F.regexp_replace(F.trim(raw_path), "^/+|/+$", "")
    sup_handle = (
        F.when(sub == 0, F.when(k % 2 == 0, 1).otherwise(3))
        .when(sub == 1, 99)
        .when(sub == 2, 6)
        .when(sub == 3, 1)
        .when(sub == 4, 7)
        .when(sub == 5, 8)
        .otherwise(1)
    )
    sup_bucket = F.when(sub == 3, 64 + (k % 10)).otherwise(k % 64)
    return (
        keyed
        .select(
            k.alias("request_id"),
            mode.alias("mode"),
            strat.alias("req_strategy"),
            group.alias("group_id"),
            F.when(k % 23 == 7, UNKNOWN_NODE)
            .when(k % 23 == 15, SPARSE_NODE)
            .otherwise(SELF_NODE)
            .alias("origin"),
            F.concat(
                F.lit(REALM + "|"), group, F.lit("|"), norm
            ).alias("subject"),
            F.when(mode == "supplied", sup_handle)
            .cast("int")
            .alias("sup_handle"),
            F.when(mode == "supplied", sup_bucket)
            .cast("int")
            .alias("sup_bucket"),
        )
    )


# classify_creates folds the binding directory into driver-side CASE
# expressions — sound only for a config-sized relation (it lives in one
# realm config document). Guarded like bindings._MAX_BINDINGS; the
# held-bucket dimension attaches by broadcast join instead, so it needs
# no driver-side bound.
_MAX_DIRECTORY = 10_000


def classify_creates(
    requests: DataFrame, directory: DataFrame, held: DataFrame
) -> DataFrame:
    """Run a create batch through the mint/resolve ladders — see the
    module doc for the rung order each mode follows.

    r16 shape (the ``placement_strategy_binding`` treatment): the
    binding directory (8 rows) folds into codegen CASE cascades, the
    held-bucket view (≤384 rows) collapses to a per-(strategy, origin)
    candidate-ARRAY dimension attached by ONE broadcast join, and the
    two lanes merge into one mode-CASE pass — the r15 shape paid a
    request checkpoint, four broadcast joins, a corpus-wide groupBy for
    the rendezvous min, and a two-branch union. The rendezvous pick is
    an ``array_min`` over the joined array scored in a single
    ``transform`` lambda (same Q6.24 fold, same (l_score, cand_id)
    ordering as the old ``min(struct)``).
    The request frame spreads to the session's core count first: the
    fixture's compressed request scan plans as ONE split while each
    local row pays ~8 interpreted Q6.24 folds (the r15
    ``spread_for_cpu`` trap — cheap bytes, expensive compute); at
    warehouse scale the scan already yields >= cores splits and the
    spread is a no-op."""
    from aruna_spark.ops.text import spread_for_cpu

    requests = spread_for_cpu(requests)
    dir_rows = directory.limit(_MAX_DIRECTORY + 1).collect()
    if len(dir_rows) > _MAX_DIRECTORY:
        raise ValueError(
            "binding directory exceeds the config-sized bound — refusing "
            "to fold to CASE expressions"
        )

    # ---- handle rungs (create_handle): lowest bound handle per tuple
    tuple_min: dict[tuple, int] = {}
    for r in dir_rows:
        if r["state"] != "bound":
            continue
        key = (r["scope_kind"], r["scope_value"], r["doc_class"], r["strategy"])
        h = tuple_min.get(key)
        tuple_min[key] = r["handle"] if h is None else min(h, r["handle"])
    g_handle = F.lit(None).cast("int")
    r_handle = F.lit(None).cast("int")
    for (sk, sv, dc, st), h in sorted(tuple_min.items()):
        if dc != "metadata":
            continue
        if sk == "group":
            g_handle = F.when(
                (F.col("group_id") == sv) & (F.col("req_strategy") == st),
                F.lit(h),
            ).otherwise(g_handle)
        elif sk == "realm" and sv == REALM:
            r_handle = F.when(
                F.col("req_strategy") == st, F.lit(h)
            ).otherwise(r_handle)
    handle = F.coalesce(g_handle, r_handle)
    handle_scope = F.when(g_handle.isNotNull(), "group").when(
        r_handle.isNotNull(), "realm"
    )

    # ---- local bucket pick: rendezvous among the origin's held
    # buckets. The ≤(strategies × nodes)-row candidate-ARRAY dimension
    # attaches by broadcast (building it as a per-(strategy, origin)
    # CASE of array literals was measured at ~4.5 s of driver-side
    # py4j Column construction per invocation); the join condition
    # carries the local/handle gate, so forward/supplied rows never
    # match and never pay the fold. The scored pick lands in its own
    # projection below so the interpreted higher-order expression
    # evaluates ONCE per row (CollapseProject keeps non-cheap
    # expressions un-inlined).
    cands = held.groupBy(
        F.col("strategy").alias("__h_strategy"),
        F.col("node_id").alias("__h_node"),
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.lpad(F.col("shard").cast("string"), 2, "0").alias(
                        "cand_id"
                    ),
                    F.col("shard").cast("int").alias("shard"),
                )
            )
        ).alias("__cands")
    )
    local_gate = (F.col("mode") == "local") & handle.isNotNull()
    best = F.array_min(
        F.transform(
            F.col("__cands"),
            lambda c: F.struct(
                neg_log2_q24(
                    selector_hash(ROLE_SHARD, F.col("subject"), c["cand_id"])
                ).alias("l_score"),
                c["cand_id"].alias("cand_id"),
                c["shard"].alias("shard"),
            ),
        )
    )
    picked = F.col("__picked")

    minted_verdict = (
        F.when(handle.isNull(), "no_binding")
        .when((F.col("mode") == "local") & picked.isNull(),
              "origin_holds_no_bucket")
        .otherwise("ok")
    )
    minted_raw_shard = F.when(F.col("mode") == "local", picked).otherwise(
        shard_for_subject(F.col("subject"), SHARD_COUNT)
    )

    # ---- supplied-id validation (resolve_metadata_id rung order):
    # per-handle resolution folded from the same directory rows (MAX per
    # field — the old groupBy(handle).agg(max) semantics, exactly)
    by_handle: dict[int, dict] = {}
    for r in dir_rows:
        e = by_handle.setdefault(
            r["handle"],
            {"conf": False, "scope_kind": None, "scope_value": None,
             "doc_class": None, "strategy": None},
        )
        e["conf"] = e["conf"] or (r["state"] == "conflicted")
        for field in ("scope_kind", "scope_value", "doc_class", "strategy"):
            v = r[field]
            if v is not None and (e[field] is None or v > e[field]):
                e[field] = v

    def _resolve_case(field: str, dtype: str = "string"):
        expr = F.lit(None).cast(dtype)
        for h, e in sorted(by_handle.items()):
            if e[field] is not None:
                expr = F.when(
                    F.col("sup_handle") == h, F.lit(e[field])
                ).otherwise(expr)
        return expr

    t_scope_kind = _resolve_case("scope_kind")
    t_scope_value = _resolve_case("scope_value")
    t_class = _resolve_case("doc_class")
    t_strategy = _resolve_case("strategy")
    is_conflicted = F.lit(None).cast("boolean")
    for h, e in sorted(by_handle.items()):
        is_conflicted = F.when(
            F.col("sup_handle") == h, F.lit(e["conf"])
        ).otherwise(is_conflicted)

    resolved_bound = t_scope_kind.isNotNull() & ~is_conflicted
    scope_ok = F.when(
        t_scope_kind == "realm", t_scope_value == REALM
    ).otherwise(t_scope_value == F.col("group_id"))
    sup_verdict = (
        F.when(t_scope_kind.isNull(), "unknown_handle")
        .when(is_conflicted, "conflicted_handle")
        .when(~t_strategy.isin(*KNOWN_STRATEGIES), "unknown_strategy")
        .when(F.col("sup_bucket") >= SHARD_COUNT, "bucket_out_of_range")
        .when(t_class != "metadata", "wrong_class")
        .when(~scope_ok, "scope_mismatch")
        .otherwise("ok")
    )

    # ---- one pass, no union: the mode CASE replaces the two lanes
    is_sup = F.col("mode") == "supplied"
    verdict = F.when(is_sup, sup_verdict).otherwise(minted_verdict)
    requests = (
        requests.join(
            F.broadcast(cands),
            (F.col("__h_strategy") == F.col("req_strategy"))
            & (F.col("__h_node") == F.col("origin"))
            & local_gate,
            "left",
        )
        .drop("__h_strategy", "__h_node")
        .withColumn("__picked", best["shard"])
        .drop("__cands")
    )
    return requests.select(
        "request_id",
        "mode",
        verdict.alias("verdict"),
        F.when(is_sup, F.col("sup_handle"))
        .otherwise(handle)
        .cast("int")
        .alias("handle"),
        F.when(is_sup, F.when(resolved_bound, t_scope_kind))
        .otherwise(F.when(handle.isNotNull(), handle_scope))
        .alias("handle_scope"),
        F.when(is_sup, F.when(resolved_bound, t_strategy))
        .otherwise(F.col("req_strategy"))
        .alias("strategy"),
        F.when(verdict == "ok",
               F.when(is_sup, F.col("sup_bucket")).otherwise(minted_raw_shard))
        .cast("int")
        .alias("shard"),
    )


@register(
    "registry_create_doc_placement",
    oracle=f"""
    WITH RECURSIVE {HELD_CTE_SQL},
    dir AS ({_DIR_SQL}),
    reqs0 AS (
      SELECT o_orderkey AS request_id,
             (o_orderkey - 4) // 9 AS t,
             o_orderkey % 2 AS par,
             o_orderkey AS k
      FROM orders WHERE o_orderkey % 9 = 4
    ),
    reqs AS (
      SELECT request_id, k,
        CASE t % 3 WHEN 0 THEN 'local' WHEN 1 THEN 'forward'
                   ELSE 'supplied' END AS mode,
        (t // 3) % 7 AS sub,
        CASE WHEN k % 17 = 2 THEN 'strat-c'
             WHEN k % 7 <= 2 THEN 'strat-a' ELSE 'strat-b' END
          AS req_strategy,
        CASE WHEN t % 3 = 2 AND (t // 3) % 7 IN (0, 3) THEN 'grp-3'
             WHEN t % 3 = 2 AND (t // 3) % 7 = 6 THEN 'grp-9'
             ELSE 'grp-' || (k % 10) END AS group_id,
        CASE WHEN k % 23 = 7 THEN '{UNKNOWN_NODE}'
             WHEN k % 23 = 15 THEN '{SPARSE_NODE}'
             ELSE '{SELF_NODE}' END AS origin,
        CASE WHEN t % 3 = 2 THEN
          CASE (t // 3) % 7
            WHEN 0 THEN CASE WHEN par = 0 THEN 1 ELSE 3 END
            WHEN 1 THEN 99 WHEN 2 THEN 6 WHEN 3 THEN 1
            WHEN 4 THEN 7 WHEN 5 THEN 8 ELSE 1 END
        END AS sup_handle,
        CASE WHEN t % 3 = 2 THEN
          CASE WHEN (t // 3) % 7 = 3 THEN 64 + (k % 10) ELSE k % 64 END
        END AS sup_bucket,
        '{REALM}|'
          || (CASE WHEN t % 3 = 2 AND (t // 3) % 7 IN (0, 3) THEN 'grp-3'
                   WHEN t % 3 = 2 AND (t // 3) % 7 = 6 THEN 'grp-9'
                   ELSE 'grp-' || (k % 10) END)
          || '|'
          || trim(trim(CASE WHEN k % 13 = 1
               THEN '/projects/p' || (k % 5) || '/run-' || k || '/'
               ELSE 'projects/p' || (k % 5) || '/run-' || k END), '/')
          AS subject
      FROM reqs0
    ),
    rungs AS (
      SELECT r.*,
        (SELECT MIN(handle) FROM dir
          WHERE state = 'bound' AND scope_kind = 'group'
            AND scope_value = r.group_id AND doc_class = 'metadata'
            AND strategy = r.req_strategy) AS g_handle,
        (SELECT MIN(handle) FROM dir
          WHERE state = 'bound' AND scope_kind = 'realm'
            AND scope_value = '{REALM}' AND doc_class = 'metadata'
            AND strategy = r.req_strategy) AS r_handle
      FROM reqs r WHERE mode <> 'supplied'
    ),
    cands AS (
      SELECT g.request_id, g.subject, h.shard,
             lpad(CAST(h.shard AS VARCHAR), 2, '0') AS cand_id
      FROM rungs g JOIN held h
        ON h.strategy = g.req_strategy AND h.node_id = g.origin
      WHERE g.mode = 'local'
        AND COALESCE(g.g_handle, g.r_handle) IS NOT NULL
    ),
    {duck_neg_log2_cte(
        "cands",
        duck_selector_hash(ROLE_SHARD, "subject", "cand_id"),
        "request_id, shard, cand_id",
        "sh",
    )},
    picked AS (
      SELECT s.request_id, s.shard
      FROM sh_scored s
      WHERE NOT EXISTS (
        SELECT 1 FROM sh_scored o
        WHERE o.request_id = s.request_id AND o.shard <> s.shard
          AND (o.l_score < s.l_score
               OR (o.l_score = s.l_score AND o.cand_id < s.cand_id))
      )
    ),
    minted AS (
      SELECT g.request_id, g.mode,
        CASE WHEN COALESCE(g.g_handle, g.r_handle) IS NULL
               THEN 'no_binding'
             WHEN g.mode = 'local' AND p.shard IS NULL
               THEN 'origin_holds_no_bucket'
             ELSE 'ok' END AS verdict,
        CAST(COALESCE(g.g_handle, g.r_handle) AS INT) AS handle,
        CASE WHEN g.g_handle IS NOT NULL THEN 'group'
             WHEN g.r_handle IS NOT NULL THEN 'realm' END AS handle_scope,
        g.req_strategy AS strategy,
        CASE WHEN g.mode = 'local' THEN p.shard
             ELSE {duck_shard_sql("g.subject", SHARD_COUNT)} END AS raw_shard
      FROM rungs g LEFT JOIN picked p USING (request_id)
    ),
    supplied AS (
      SELECT r.request_id, r.mode,
        CASE WHEN d.handle IS NULL THEN 'unknown_handle'
             WHEN d.state = 'conflicted' THEN 'conflicted_handle'
             WHEN d.strategy NOT IN ('strat-a', 'strat-b')
               THEN 'unknown_strategy'
             WHEN r.sup_bucket >= {SHARD_COUNT} THEN 'bucket_out_of_range'
             WHEN d.doc_class <> 'metadata' THEN 'wrong_class'
             WHEN NOT (CASE WHEN d.scope_kind = 'realm'
                            THEN d.scope_value = '{REALM}'
                            ELSE d.scope_value = r.group_id END)
               THEN 'scope_mismatch'
             ELSE 'ok' END AS verdict,
        r.sup_handle AS handle,
        CASE WHEN d.handle IS NOT NULL AND d.state = 'bound'
             THEN d.scope_kind END AS handle_scope,
        CASE WHEN d.handle IS NOT NULL AND d.state = 'bound'
             THEN d.strategy END AS strategy,
        r.sup_bucket AS raw_shard
      FROM reqs r
      LEFT JOIN (SELECT handle, MAX(scope_kind) AS scope_kind,
                        MAX(scope_value) AS scope_value,
                        MAX(doc_class) AS doc_class, MAX(strategy) AS strategy,
                        MAX(state) AS state
                 FROM dir GROUP BY handle) d
        ON d.handle = r.sup_handle
      WHERE r.mode = 'supplied'
    ),
    unioned AS (
      SELECT * FROM minted UNION ALL SELECT * FROM supplied
    )
    SELECT request_id, mode, verdict, handle, handle_scope, strategy,
           CAST(CASE WHEN verdict = 'ok' THEN raw_shard END AS INT)
             AS shard
    FROM unioned
    """,
)
def registry_create_doc_placement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fixture batch through :func:`classify_creates` — every rung
    of both ladders populated: group-preferred/realm-fallback handle
    lookup (with the conflicted-handle fall-through), the
    held-bucket rendezvous pick vs the forwarded blind hash, the
    unknown-origin OriginHoldsNoBucket lane, and all seven supplied-id
    resolve_metadata_id outcomes in the reference's rung order."""
    return classify_creates(
        load_create_requests(spark, sf_dir),
        load_directory(spark),
        held_buckets(spark, sf_dir),
    )


def registry_create_doc_placement_decade(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNREGISTERED decade variant (resolved by
    ``scripts/bench_decade._resolve``): the corpus-proportional request
    fixture through the SAME :func:`classify_creates` pipeline —
    requests keyed by doc_id so the population actually grows per
    decade (the registered orders fixture is scale-bound to the tables
    the sf10 slice omits). Measures the real cost model: corpus-linear
    requests, each local create scoring one node's held buckets
    (config-sized) through the Q6.24 rendezvous fold, the directory
    broadcast, no window, no collect. The held-bucket CLUSTER plane is
    config-sized and constant across decades (nodes come from the
    nation dimension, which the documents-only sf10 slice omits), so
    it pins to the reference sf0.01 dir — only the REQUEST population
    scales."""
    return classify_creates(
        load_create_requests_decade(spark, sf_dir),
        load_directory(spark),
        held_buckets(spark, "/root/testdata/sf0.01"),
    )
