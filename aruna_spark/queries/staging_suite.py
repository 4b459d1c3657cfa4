"""Staging connector listing + HTTP autoindex queries (oracle-checked).

ListStagingSource (``operations/src/staging/list_source.rs:14-30``) and
the autoindex generate→parse roundtrip (``blob/src/autoindex.rs``) over
the latest object catalog. The autoindex oracle is the *ground truth*
directory table derived straight from the keys — so the check asserts
``parse(render(keys)) == truth``, i.e. the parser recovers exactly the
structure the generator encoded while dropping every noise anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.ops.staging import (
    duck_list_source_level,
    list_source_level,
    parse_autoindex_pages,
    render_autoindex_pages,
)
from aruna_spark.queries import register
from aruna_spark.sources.objects import (
    OBJECTS_ORACLE_SQL,
    live_latest,
    load_object_versions,
)

# staging listings walk the LIVE heads — delete markers hide keys here
# exactly as in ListObjectsV2
_KEYS_SQL = f"""
    SELECT key, size FROM ({OBJECTS_ORACLE_SQL})
    WHERE is_latest AND NOT is_delete_marker
"""


def _keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return live_latest(load_object_versions(spark, sf_dir)).select(
        "key", "size"
    )


@register(
    "staging_list_level",
    oracle=duck_list_source_level(
        _KEYS_SQL, "data/src1", offset=0, limit=15
    ),
)
def staging_list_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One directory level under data/src1: language dirs roll up, page
    envelope carries truncated/next_offset."""
    return list_source_level(
        _keys(spark, sf_dir), "data/src1", offset=0, limit=15
    )


@register(
    "staging_list_recursive",
    oracle=duck_list_source_level(
        _KEYS_SQL,
        "data/src2",
        offset=10,
        limit=25,
        recursive=True,
        files_only=True,
    ),
)
def staging_list_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive files-only walk under data/src2, second offset page —
    the resumable-scan shape the reference's staging API exposes."""
    return list_source_level(
        _keys(spark, sf_dir),
        "data/src2",
        offset=10,
        limit=25,
        recursive=True,
        files_only=True,
    )


@register(
    "autoindex_parse_entries",
    oracle=f"""
    WITH keys AS ({_KEYS_SQL}),
    leveled AS (
      SELECT key, size,
             COALESCE(array_to_string(split(key, '/')[1:i], '/'), '') AS dir,
             i AS depth
      FROM keys, UNNEST(range(0, len(split(key, '/')))) AS t(i)
    )
    SELECT dir,
           split(key, '/')[depth + 1] AS name,
           len(split(key, '/')) > depth + 1 AS is_dir,
           MIN(CASE WHEN len(split(key, '/')) = depth + 1
                THEN CAST(size AS BIGINT) END) AS size
    FROM leveled
    GROUP BY 1, 2, 3
    """,
)
def autoindex_parse_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render every directory's nginx-style index page (with parent /
    sort / escaping noise anchors), parse the pages back, and return the
    recovered entries — checked against the directory truth table."""
    pages = render_autoindex_pages(_keys(spark, sf_dir))
    return parse_autoindex_pages(pages)
