"""URL canonicalization + canonical-duplicate clustering.

An LLM-data-pipeline operator beyond the reference's own surface (the
brief's text-analysis family): web-crawl corpora dedup at the URL
level before content dedup, using the standard canonicalization rules
every public crawl pipeline applies (lowercase scheme/host, default
port stripped, fragment dropped, tracking parameters — ``utm_*``,
``fbclid``, ``gclid`` — removed, remaining query parameters sorted,
duplicate path slashes collapsed, trailing slash trimmed off non-root
paths). The synthetic corpus carries no URL column, so the fixture
PLANTS one raw URL per document (the pii-scan precedent: the planted
form derives from lane arithmetic, the CLASSIFIER reads only the URL
string), with six form lanes covering each rule; documents sharing a
(host, path) pair canonicalize together and cluster.

Spark shape: the canonicalizer is pure JVM column algebra
(regexp/split/array_sort — whole-stage codegen, no UDF); the cluster
size is one groupBy on the canonical key joined back — the same
corpus-linear exact-dedup shape as ``dedup_exact``. At 100 TB the
groupBy shuffles on the canonical URL (near-unique key, no skew); the
host rollup is a low-cardinality partial-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

#: params dropped by canonicalization (the common public convention)
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)="


def plant_raw_url(d: F.Column) -> F.Column:
    """One raw URL per doc: host h<d%23>, path p<d%7>, form lane
    d%6 — 0 already-canonical, 1 uppercase host, 2 default port +
    fragment, 3 tracking + unsorted params, 4 duplicate/trailing
    slashes, 5 a doc-unique path (never clusters)."""
    host = F.concat(F.lit("h"), (d % 23).cast("string"), F.lit(".example"))
    upper_host = F.upper(host)
    path = F.concat(F.lit("/data/p"), (d % 7).cast("string"))
    lane = d % 6
    return (
        F.when(
            lane == 0,
            F.concat(F.lit("https://"), host, path, F.lit("?a=1&b=2")),
        )
        .when(
            lane == 1,
            F.concat(
                F.lit("https://"), upper_host, path, F.lit("?a=1&b=2")
            ),
        )
        .when(
            lane == 2,
            F.concat(
                F.lit("https://"), host, F.lit(":443"), path,
                F.lit("?a=1&b=2#section-3"),
            ),
        )
        .when(
            lane == 3,
            F.concat(
                F.lit("https://"), host, path,
                F.lit("?utm_source=feed&b=2&gclid=XYZ&a=1"),
            ),
        )
        .when(
            lane == 4,
            F.concat(
                F.lit("https://"), host, F.lit("/data//"),
                F.lit("p"), (d % 7).cast("string"), F.lit("/?a=1&b=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), host, F.lit("/unique/doc-"),
                d.cast("string"), F.lit("?a=1&b=2"),
            )
        )
    )


def canonicalize_url(url: F.Column) -> dict[str, F.Column]:
    """Canonicalize one URL column; returns the canonical URL plus its
    parts and the stripped-tracking flag. Pure JVM expressions."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("https")) & (port == "443"))
        & ~((scheme == F.lit("http")) & (port == "80"))
    )
    rest = F.regexp_replace(url, r"^[^:]+://[^/?#]*", "")
    no_frag = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, r"/$", "")
    ).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = F.filter(params, lambda p: ~p.rlike(TRACKING_RE))
    tracking_stripped = F.size(params) > F.size(kept)
    sorted_q = F.array_join(F.array_sort(kept), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
    return {
        "canonical": canonical,
        "host": host,
        "tracking_stripped": tracking_stripped,
    }


# The oracle derives the EXPECTED canonical straight from the lane
# arithmetic (independent ground truth — it never re-implements the
# canonicalizer), so every rule the Spark side applies is checked
# against what the lane planted.
@register(
    "urlstats_canonicalize",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             'h' || (doc_id % 23) || '.example' AS host,
             CASE WHEN doc_id % 6 = 5
                  THEN '/unique/doc-' || doc_id
                  ELSE '/data/p' || (doc_id % 7) END AS path,
             doc_id % 6 = 3 AS tracking_stripped
      FROM documents
    ),
    canon AS (
      SELECT doc_id, host, tracking_stripped,
             'https://' || host || path || '?a=1&b=2' AS canonical_url
      FROM planted
    ),
    clusters AS (
      SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM canon GROUP BY 1
    )
    SELECT c.doc_id, c.canonical_url, c.host, c.tracking_stripped,
           k.cluster_size, k.cluster_size > 1 AS is_dup
    FROM canon c JOIN clusters k USING (canonical_url)
    """,
)
def urlstats_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize every document's planted URL and cluster on the
    canonical form: per doc the canonical URL, host, whether tracking
    params were stripped, the canonical cluster size, and the dup flag.
    One groupBy on the canonical key + a join back; canonicalization
    itself never leaves whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    raw = plant_raw_url(d)
    parts = canonicalize_url(raw)
    canon = docs.select(
        "doc_id",
        parts["canonical"].alias("canonical_url"),
        parts["host"].alias("host"),
        parts["tracking_stripped"].alias("tracking_stripped"),
    )
    clusters = canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return canon.join(clusters, "canonical_url").select(
        "doc_id",
        "canonical_url",
        "host",
        "tracking_stripped",
        "cluster_size",
        (F.col("cluster_size") > 1).alias("is_dup"),
    )
