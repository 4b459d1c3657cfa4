"""S3 ListObjectsV2 / ListObjectVersions semantics as DataFrame expressions.

Reference: ``operations/src/s3/list_objects_v2.rs:19-74,128-129`` (prefix,
start_after, max_keys default 1000, continuation token = last emitted
entry), delimiter grouping via ``common_prefix_of``
(``operations/src/s3/listing.rs:1-13``): a key whose remainder after the
prefix contains the delimiter rolls up into ONE CommonPrefixes entry
ending at the first delimiter; other keys list individually. Entries and
common prefixes share one lexicographic order, and max_keys counts both.

Scale: everything is filter + groupBy + orderBy/limit over a key-sorted
objects table — the prefix filter and keyset predicate push down to the
parquet scan (file skipping on the sort key); the common-prefix rollup is
one map-side-combinable aggregation. No driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_KEYS_DEFAULT = 1_000  # list_objects_v2.rs:128


def common_prefix_entry(key: Column, prefix: str, delimiter: str) -> Column:
    """listing.rs:1-13: prefix + first-delimiter-terminated remainder, or
    NULL when the key lists individually."""
    rest = F.substring_index(
        key.substr(F.lit(len(prefix) + 1), F.length(key)), delimiter, 1
    )
    has_delim = F.instr(
        key.substr(F.lit(len(prefix) + 1), F.length(key)), delimiter
    ) > 0
    return F.when(has_delim, F.concat(F.lit(prefix), rest, F.lit(delimiter)))


def list_objects_v2(
    latest: DataFrame,
    prefix: str = "",
    delimiter: str | None = None,
    start_after: str = "",
    after_common_prefix: str = "",
    max_keys: int = MAX_KEYS_DEFAULT,
) -> DataFrame:
    """One listing page: (entry, kind, n_keys, total_size), entry-ordered.

    ``kind`` ∈ {'key', 'common_prefix'}; n_keys counts rolled-up keys
    (1 for plain keys); sizes aggregate beneath a common prefix. The
    continuation token is (last_key, last_common_prefix) exactly like
    ``list_objects_v2.rs:60-74``: resume skips keys ≤ last_key AND every
    key still under the last emitted common prefix (a bare key > a
    common-prefix boundary would otherwise re-emit the group).
    """
    df = latest.filter(F.col("key").startswith(prefix))
    if start_after:
        df = df.filter(F.col("key") > start_after)
    if after_common_prefix:
        df = df.filter(~F.col("key").startswith(after_common_prefix))
    if delimiter is None:
        grouped = df.select(
            F.col("key").alias("entry"),
            F.lit("key").alias("kind"),
            F.lit(1).cast("long").alias("n_keys"),
            F.col("size").cast("long").alias("total_size"),
        )
    else:
        cp = common_prefix_entry(F.col("key"), prefix, delimiter)
        tagged = df.select(
            F.coalesce(cp, F.col("key")).alias("entry"),
            F.when(cp.isNotNull(), "common_prefix").otherwise("key").alias(
                "kind"
            ),
            F.col("size"),
        )
        grouped = tagged.groupBy("entry", "kind").agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("size").cast("long").alias("total_size"),
        )
    return grouped.orderBy("entry").limit(max_keys)


def duck_list_objects_v2(
    objects_sql: str,
    prefix: str = "",
    delimiter: str | None = None,
    start_after: str = "",
    after_common_prefix: str = "",
    max_keys: int = MAX_KEYS_DEFAULT,
) -> str:
    """DuckDB replication of :func:`list_objects_v2` over latest versions."""
    after = f"AND key > '{start_after}'" if start_after else ""
    if after_common_prefix:
        after += f" AND NOT starts_with(key, '{after_common_prefix}')"
    if delimiter is None:
        body = f"""
        SELECT key AS entry, 'key' AS kind, CAST(1 AS BIGINT) AS n_keys,
               CAST(size AS BIGINT) AS total_size
        FROM latest WHERE starts_with(key, '{prefix}') {after}
        """
    else:
        p = len(prefix) + 1
        rest = f"substring(key, {p})"
        cp = (
            f"CASE WHEN instr({rest}, '{delimiter}') > 0 THEN "
            f"'{prefix}' || split_part({rest}, '{delimiter}', 1) || '{delimiter}' END"
        )
        body = f"""
        SELECT coalesce({cp}, key) AS entry,
               CASE WHEN {cp} IS NOT NULL THEN 'common_prefix' ELSE 'key' END AS kind,
               COUNT(*) AS n_keys, CAST(SUM(size) AS BIGINT) AS total_size
        FROM latest WHERE starts_with(key, '{prefix}') {after}
        GROUP BY 1, 2
        """
    return f"""
    WITH objects AS ({objects_sql}),
    latest AS (SELECT * FROM objects WHERE is_latest AND NOT is_delete_marker)
    SELECT * FROM ({body}) ORDER BY entry LIMIT {max_keys}
    """


# ------------------------------------------ ListObjectVersions (keyset)

VERSIONS_COLS = "key, version_id, is_latest, is_delete_marker, size, etag"


def list_object_versions(
    versions: DataFrame,
    prefix: str = "",
    key_marker: str | None = None,
    version_idx_marker: int | None = None,
    max_keys: int = MAX_KEYS_DEFAULT,
) -> DataFrame:
    """One ListObjectVersions page: ALL versions under the prefix —
    delete markers included (``list_object_versions.rs``
    ``ListObjectVersionsItem::DeleteMarker``) — in (key ASC,
    version_idx DESC) order with keyset continuation.

    The continuation token is (key_marker, version_id_marker) exactly
    like ``list_object_versions.rs:60-61,88-89``: resume emits keys
    strictly after the marker key, plus the marker key's remaining
    versions strictly below the marker version. ``version_idx_marker``
    is the marker version's integer index (the reference's marker is
    the version ULID; ours is the 'vN' index — same keyset
    discipline). A bare ``key_marker`` (no version marker) resumes at
    the next key, the reference's common-prefix resume.

    Scale: both marker predicates push down to the (bucket, key)-sorted
    objects table scan — file skipping on the sort key, then a
    per-partition top-k merge for the global order/limit. No driver
    round-trips.
    """
    df = versions.filter(F.col("key").startswith(prefix))
    if key_marker is not None:
        if version_idx_marker is not None:
            df = df.filter(
                (F.col("key") > key_marker)
                | (
                    (F.col("key") == key_marker)
                    & (F.col("version_idx") < version_idx_marker)
                )
            )
        else:
            df = df.filter(F.col("key") > key_marker)
    return (
        df.orderBy("key", F.desc("version_idx"))
        .select(
            "key", "version_id", "is_latest", "is_delete_marker", "size", "etag"
        )
        .limit(max_keys)
    )


def duck_list_object_versions(
    objects_sql: str,
    prefix: str = "",
    key_marker: str | None = None,
    version_idx_marker: int | None = None,
    max_keys: int = MAX_KEYS_DEFAULT,
) -> str:
    """DuckDB replication of :func:`list_object_versions`."""
    where = f"starts_with(key, '{prefix}')"
    if key_marker is not None:
        if version_idx_marker is not None:
            where += (
                f" AND (key > '{key_marker}' OR (key = '{key_marker}'"
                f" AND version_idx < {version_idx_marker}))"
            )
        else:
            where += f" AND key > '{key_marker}'"
    return f"""
    WITH objects AS ({objects_sql})
    SELECT {VERSIONS_COLS}
    FROM objects WHERE {where}
    ORDER BY key, version_idx DESC LIMIT {max_keys}
    """


# --------------------------------------------- request-limit governance
LISTING_DEFAULT = 50  # api.rs:69-74 (metadata listing)
LISTING_MAX = 1_000
LISTING_MAX_ANONYMOUS = 100

SEARCH_PAGE_DEFAULT = 25  # search_cursor.rs:13-14
SEARCH_PAGE_MAX = 100
SEARCH_DEPTH_MAX = 1_000  # search_cursor.rs:15 (per-node pagination depth)


def resolve_listing_limit(
    requested: int | None, anonymous: bool = False
) -> int:
    """Metadata-listing limit rules (api.rs:69-74): default 50, clamped
    to 1,000 (100 for anonymous callers); non-positive requests are
    invalid."""
    cap = LISTING_MAX_ANONYMOUS if anonymous else LISTING_MAX
    if requested is None:
        return min(LISTING_DEFAULT, cap)
    if requested < 1:
        raise ValueError(f"listing limit must be >= 1, got {requested}")
    return min(requested, cap)


def resolve_search_page(requested: int | None, depth: int = 0) -> int:
    """Search page sizing (search_cursor.rs:13-21): default 25, max 100;
    paging past depth 1,000 is rejected rather than silently truncated."""
    if requested is None:
        page = SEARCH_PAGE_DEFAULT
    elif requested < 1:
        raise ValueError(f"page size must be >= 1, got {requested}")
    else:
        page = min(requested, SEARCH_PAGE_MAX)
    if depth + page > SEARCH_DEPTH_MAX:
        raise ValueError(
            f"search pagination depth cap {SEARCH_DEPTH_MAX} exceeded"
        )
    return page
