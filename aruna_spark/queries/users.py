"""User directory: batch resolution with attribute redaction, and the
profile-update validation ladder.

Reference surface:

- ``operations/src/resolve_users.rs:63-168`` — batch user resolution:
  request ids dedup (first occurrence), one batch read, MISSING users
  are silently skipped (no error — membership lists tolerate deleted
  accounts), records from another realm are skipped, and attributes
  REDACT to the explicit safe allowlist.
- ``core/src/user_update_validation.rs:3-52`` —
  ``SAFE_USER_ATTRIBUTE_KEYS = ["orcid", "affiliation", "department"]``
  ("keys are free-form, so this explicit allowlist is the contract;
  ``email`` is deliberately excluded and must never appear in resolve
  or member output"); attribute keys are 1..128 bytes of ASCII
  alphanumerics plus ``. _ - :``; values are ≤ 4096 bytes with no
  control characters (empty allowed); at most 128 attributes.
- ``operations/src/update_user.rs:43,675-701`` — ``apply_updates``
  order: the trimmed name must be non-empty and ≤ 256 bytes; REMOVE
  keys validate (and apply) BEFORE set keys — an invalid removal key
  rejects even when the set payload is also bad; then each set key,
  then its value; the resulting attribute count gates last.

Fixtures (customer): users k%6 == 1 carry orcid (k%5 < 2) / affiliation (k%7 < 3) lanes
(k is odd ≡ 1 mod 3 here, so mod-2/mod-3 lanes would never fire), an
``email`` attribute ALWAYS (the redaction contract), and a custom
key sometimes; k%17 == 3 marks a foreign-realm record. Resolve
requests cover k%6 ∈ {1, 5} (5 → missing). Update requests (k%4 == 0)
drive name lanes (k%7), key lanes (k%13), value lanes (k%11), an
invalid REMOVAL key lane (k%19 == 6), and a count model where
removals hit existing keys and sets add fresh ones, so the final
count is existing − removed + set (the lane k%23 == 9 pushes it past
128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

SAFE_USER_ATTRIBUTE_KEYS = ("orcid", "affiliation", "department")
MAX_USER_ATTRIBUTES = 128
MAX_USER_NAME_LEN = 256  # update_user.rs:43
REALM = "realm1"

_USERS_SQL = """
    users AS (
      SELECT c_custkey AS user_id,
             'user ' || c_custkey AS name,
             CASE WHEN c_custkey % 17 = 3 THEN 'other'
                  ELSE 'realm1' END AS realm_id,
             c_custkey % 5 < 2 AS has_orcid,
             c_custkey % 7 < 3 AS has_affiliation,
             c_custkey % 5 = 0 AS has_custom
      FROM customer WHERE c_custkey % 6 = 1
    )
"""


@register(
    "user_resolve_safe",
    oracle=f"""
    WITH {_USERS_SQL},
    requests AS (
      SELECT c_custkey AS user_id FROM customer
      WHERE c_custkey % 6 IN (1, 5)
    ),
    resolved AS (
      SELECT u.user_id, u.name,
             CAST((CASE WHEN u.has_custom THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS n_redacted
      FROM requests q JOIN users u USING (user_id)
      WHERE u.realm_id = '{REALM}'
    ),
    exploded AS (
      SELECT user_id, name, n_redacted, 'orcid' AS attr_key,
             '0000-' || user_id AS attr_value
      FROM resolved WHERE user_id % 5 < 2
      UNION ALL
      SELECT user_id, name, n_redacted, 'affiliation',
             'inst-' || (user_id % 9)
      FROM resolved WHERE user_id % 7 < 3
    )
    SELECT r.user_id, r.name, e.attr_key, e.attr_value, r.n_redacted
    FROM resolved r
    LEFT JOIN exploded e
      ON e.user_id = r.user_id AND e.attr_key IS NOT NULL
    """,
)
def user_resolve_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch user resolution (resolve_users.rs:63-168): missing ids
    skip silently, foreign-realm records skip, and the attribute map
    redacts to the safe allowlist — ``email`` (stamped on EVERY
    fixture user) and custom keys never reach the output; their count
    surfaces as ``n_redacted``. One exploded row per surviving safe
    attribute; users left with none keep a single NULL-attribute row
    (they still resolve — redaction is not removal)."""
    k = F.col("c_custkey")
    users = (
        load_table(spark, sf_dir, "customer")
        .filter(k % 6 == 1)
        .select(
            k.alias("user_id"),
            F.concat(F.lit("user "), k.cast("string")).alias("name"),
            F.when(k % 17 == 3, "other").otherwise(REALM).alias("realm_id"),
            # the stored attribute map: email ALWAYS present (the
            # redaction contract), safe keys on their lanes, one
            # custom key sometimes
            F.map_filter(
                F.map_from_arrays(
                    F.array(
                        F.lit("email"),
                        F.lit("orcid"),
                        F.lit("affiliation"),
                        F.lit("x-custom"),
                    ),
                    F.array(
                        F.concat(k.cast("string"), F.lit("@example.org")),
                        F.when(
                            k % 5 < 2,
                            F.concat(F.lit("0000-"), k.cast("string")),
                        ),
                        F.when(
                            k % 7 < 3,
                            F.concat(
                                F.lit("inst-"), (k % 9).cast("string")
                            ),
                        ),
                        F.when(k % 5 == 0, F.lit("internal")),
                    ),
                ),
                lambda _, v: v.isNotNull(),
            ).alias("attributes"),
        )
    )
    requests = (
        load_table(spark, sf_dir, "customer")
        .filter((k % 6).isin(1, 5))
        .select(k.alias("user_id"))
    )
    resolved = (
        requests.join(users, "user_id")
        .filter(F.col("realm_id") == REALM)
        .select(
            "user_id",
            "name",
            F.map_filter(
                F.col("attributes"),
                lambda key, _: key.isin(*SAFE_USER_ATTRIBUTE_KEYS),
            ).alias("safe"),
            (
                F.size("attributes")
                - F.size(
                    F.map_filter(
                        F.col("attributes"),
                        lambda key, _: key.isin(*SAFE_USER_ATTRIBUTE_KEYS),
                    )
                )
            )
            .cast("long")
            .alias("n_redacted"),
        )
    )
    exploded = resolved.select(
        "user_id",
        "name",
        "n_redacted",
        F.explode_outer(F.col("safe")).alias("attr_key", "attr_value"),
    )
    return exploded.select(
        "user_id", "name", "attr_key", "attr_value", "n_redacted"
    )


_KEY_OK = "^[A-Za-z0-9._:-]{1,128}$"
_CONTROL = "[\\x00-\\x1f\\x7f-\\x9f]"


@register(
    "user_update_validate",
    oracle=f"""
    WITH reqs AS (
      SELECT c_custkey AS request_id,
             CASE c_custkey % 7
               WHEN 0 THEN NULL WHEN 1 THEN '  '
               WHEN 2 THEN repeat('n', 257)
               ELSE ' user ' || c_custkey || ' ' END AS new_name,
             CASE c_custkey % 19 WHEN 6 THEN 'bad key'
                  ELSE 'stale-attr' END AS remove_key,
             CASE c_custkey % 13
               WHEN 0 THEN '' WHEN 1 THEN 'display name'
               WHEN 2 THEN 'owner/slash' WHEN 3 THEN chr(252) || 'mlaut'
               WHEN 4 THEN repeat('a', 129)
               WHEN 5 THEN 'profile.department'
               WHEN 6 THEN 'edu_person:principal_name'
               WHEN 7 THEN 'team-name' ELSE 'orcid' END AS set_key,
             CASE c_custkey % 11
               WHEN 0 THEN 'bio' || chr(10) || 'medicine'
               WHEN 1 THEN repeat('v', 4097)
               WHEN 2 THEN '' ELSE 'biology and medicine' END AS set_value,
             CAST(CASE WHEN c_custkey % 23 = 9 THEN 128
                  ELSE 40 + c_custkey % 50 END AS INT) AS existing_n
      FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT request_id, new_name, remove_key, set_key, existing_n,
           CASE
             WHEN new_name IS NOT NULL
                  AND (trim(new_name) = ''
                       OR strlen(trim(new_name))
                          > {MAX_USER_NAME_LEN})
               THEN 'invalid_user_name'
             WHEN NOT regexp_matches(remove_key, '{_KEY_OK}')
               THEN 'invalid_key'
             WHEN NOT regexp_matches(set_key, '{_KEY_OK}')
               THEN 'invalid_key'
             WHEN strlen(set_value) > 4096
                  OR regexp_matches(set_value, '{_CONTROL}')
               THEN 'invalid_value'
             WHEN existing_n - 1 + 1 + 1 > {MAX_USER_ATTRIBUTES}
               THEN 'too_many_attributes'
             ELSE 'ok'
           END AS outcome,
           CASE WHEN new_name IS NOT NULL AND trim(new_name) <> ''
                     AND strlen(trim(new_name))
                         <= {MAX_USER_NAME_LEN}
                THEN trim(new_name) END AS applied_name
    FROM reqs
    """,
)
def user_update_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profile-update ladder (update_user.rs ``apply_updates``,
    rs:675-701) in the reference's exact order: the TRIMMED name must
    be non-empty and ≤ 256 BYTES; removal keys validate before set
    keys (the fixture's invalid-removal lane rejects even when the
    set payload is also bad); then the set key (1..128 bytes of ASCII
    alphanumerics + ``. _ - :`` — the umlaut/space/slash/overlong
    lanes mirror user_update_validation.rs's own test vectors), then
    the value (≤ 4096 bytes, no control characters, empty fine);
    the resulting count gates LAST (the fixture removes one existing
    key and adds one fresh key plus the re-added removal, so final =
    existing + 1 — the k%23 lane starts at 128 and tips over).
    ``applied_name`` carries the trim the admin event records
    (UserNameSet stamps the trimmed form, rs:648-652)."""
    k = F.col("c_custkey")
    reqs = (
        load_table(spark, sf_dir, "customer")
        .filter(k % 4 == 0)
        .select(
            k.alias("request_id"),
            F.when(k % 7 == 0, F.lit(None).cast("string"))
            .when(k % 7 == 1, "  ")
            .when(k % 7 == 2, F.repeat(F.lit("n"), 257))
            .otherwise(
                F.concat(F.lit(" user "), k.cast("string"), F.lit(" "))
            )
            .alias("new_name"),
            F.when(k % 19 == 6, "bad key")
            .otherwise("stale-attr")
            .alias("remove_key"),
            F.when(k % 13 == 0, "")
            .when(k % 13 == 1, "display name")
            .when(k % 13 == 2, "owner/slash")
            .when(k % 13 == 3, "ümlaut")
            .when(k % 13 == 4, F.repeat(F.lit("a"), 129))
            .when(k % 13 == 5, "profile.department")
            .when(k % 13 == 6, "edu_person:principal_name")
            .when(k % 13 == 7, "team-name")
            .otherwise("orcid")
            .alias("set_key"),
            F.when(k % 11 == 0, "bio\nmedicine")
            .when(k % 11 == 1, F.repeat(F.lit("v"), 4097))
            .when(k % 11 == 2, "")
            .otherwise("biology and medicine")
            .alias("set_value"),
            F.when(k % 23 == 9, 128)
            .otherwise(40 + k % 50)
            .cast("int")
            .alias("existing_n"),
        )
    )
    trimmed = F.trim(F.col("new_name"))
    name_bad = F.col("new_name").isNotNull() & (
        (trimmed == "") | (F.octet_length(trimmed) > MAX_USER_NAME_LEN)
    )
    key_ok = lambda c: c.rlike(_KEY_OK)  # noqa: E731
    value_bad = (F.octet_length("set_value") > 4096) | F.col(
        "set_value"
    ).rlike(_CONTROL)
    outcome = (
        F.when(name_bad, "invalid_user_name")
        .when(~key_ok(F.col("remove_key")), "invalid_key")
        .when(~key_ok(F.col("set_key")), "invalid_key")
        .when(value_bad, "invalid_value")
        .when(
            F.col("existing_n") + 1 > MAX_USER_ATTRIBUTES,
            "too_many_attributes",
        )
        .otherwise("ok")
    )
    return reqs.select(
        "request_id",
        "new_name",
        "remove_key",
        "set_key",
        "existing_n",
        outcome.alias("outcome"),
        F.when(
            F.col("new_name").isNotNull() & ~name_bad, trimmed
        ).alias("applied_name"),
    )


# ------------------------------------------------- user substring search
# ``operations/src/search_users.rs``: the realm-prefixed USER keyspace
# walks in user-id key order (rs:107-116, page limit max(limit+1, 64));
# a record matches when the lowercased NAME contains the query OR the
# lowercased EMAIL attribute does (rs:134-140 ``matches_query``) — the
# search may match on email, but the output shape is (user_id, name)
# only (rs:20-23): the redacted field can select a row yet never
# surfaces, the same contract resolve_users pins. Pagination
# (rs:164-176): matches collect until limit+1, truncate to limit, and
# ``next_start_after`` is the LAST returned user id — present exactly
# when a further match exists; an exhausted scan returns no cursor.

USER_SEARCH_QUERY = "3@e"  # matches EMails '..3@example.org' only —
# no fixture NAME ('user <k>') contains it, isolating the email lane
USER_SEARCH_LIMIT = 12


def load_user_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The USER keyspace rows (same fixture as user_resolve_safe:
    name 'user <k>', email '<k>@example.org' on every record, realm
    'other' on the k%17 lane the prefix scan excludes)."""
    k = F.col("c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .filter(k % 6 == 1)
        .select(
            k.cast("long").alias("user_id"),
            F.concat(F.lit("user "), k.cast("string")).alias("name"),
            F.when(k % 17 == 3, "other").otherwise(REALM).alias(
                "realm_id"
            ),
            F.concat(k.cast("string"), F.lit("@example.org")).alias(
                "email"
            ),
        )
    )


_USER_RECORDS_SQL = """
    user_records AS (
      SELECT CAST(c_custkey AS BIGINT) AS user_id,
             'user ' || c_custkey AS name,
             CASE WHEN c_custkey % 17 = 3 THEN 'other'
                  ELSE 'realm1' END AS realm_id,
             c_custkey || '@example.org' AS email
      FROM customer WHERE c_custkey % 6 = 1
    )
"""


def search_users_of(
    users: DataFrame,
    query: str,
    limit: int,
    start_after: int | None = None,
) -> DataFrame:
    """The search page: realm-scoped key-order walk, name-or-email
    containment, bounded head + a cursor minted only when a further
    match exists (search_users.rs:134-176). The output carries NO
    email column — matching on a redacted field must not leak it."""
    q = query.lower()
    matches = users.filter(
        (F.col("realm_id") == REALM)
        & (
            F.lower(F.col("name")).contains(q)
            | F.lower(F.col("email")).contains(q)
        )
    )
    if start_after is not None:
        matches = matches.filter(F.col("user_id") > start_after)
    page = matches.orderBy("user_id").limit(limit)
    env = (
        matches.limit(limit + 1)
        .agg((F.count(F.lit(1)) > limit).alias("__more"))
        .crossJoin(
            F.broadcast(page.agg(F.max("user_id").alias("__last")))
        )
        .select(
            F.when(F.col("__more"), F.col("__last"))
            .cast("long")
            .alias("next_start_after")
        )
    )
    return page.select("user_id", "name").crossJoin(F.broadcast(env))


@register(
    "search_users_page",
    oracle=f"""
    WITH {_USER_RECORDS_SQL.strip()},
    matches AS (
      SELECT * FROM user_records
      WHERE realm_id = '{REALM}'
        AND (contains(lower(name), '{USER_SEARCH_QUERY}')
             OR contains(lower(email), '{USER_SEARCH_QUERY}'))
    ),
    page AS (
      SELECT * FROM matches ORDER BY user_id LIMIT {USER_SEARCH_LIMIT}
    )
    SELECT p.user_id, p.name,
           CASE WHEN (SELECT COUNT(*) FROM matches)
                     > {USER_SEARCH_LIMIT}
                THEN (SELECT MAX(user_id) FROM page)
           END AS next_start_after
    FROM page p
    """,
)
def search_users_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form pinned at the fixture query/limit — the query
    matches ONLY the email attribute (no fixture name contains
    ``3@e``), exercising the match-on-redacted-field lane; the
    parameterized operator is :func:`search_users_of`."""
    return search_users_of(
        load_user_records(spark, sf_dir),
        USER_SEARCH_QUERY,
        USER_SEARCH_LIMIT,
    )
