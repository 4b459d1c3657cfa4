"""URL canonicalization rules, pinned on literal URLs (the registered
query's lanes cover the planted forms; these cover the rule edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.queries.urlstats import canonicalize_url


def _canon(spark, urls: list[str]) -> list[dict]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    parts = canonicalize_url(F.col("url"))
    return [
        r.asDict()
        for r in df.select(
            "url",
            parts["canonical"].alias("canonical"),
            parts["host"].alias("host"),
            parts["tracking_stripped"].alias("tracking"),
        ).collect()
    ]


def test_canonicalization_rules(spark):
    rows = _canon(
        spark,
        [
            "https://A.Example:443/x/y?b=2&a=1#frag",
            "http://a.example:80/x",
            "http://a.example:8080/x",
            "HTTPS://a.example",
            "https://a.example/x//y///z/",
            "https://a.example/x?utm_source=f&utm_medium=m&fbclid=1",
            "https://a.example/x?gclid=1&keep=2",
        ],
    )
    by = {r["url"]: r for r in rows}
    # lowercase host, default port stripped, fragment dropped, params
    # sorted
    assert (
        by["https://A.Example:443/x/y?b=2&a=1#frag"]["canonical"]
        == "https://a.example/x/y?a=1&b=2"
    )
    # http default port
    assert by["http://a.example:80/x"]["canonical"] == "http://a.example/x"
    # NON-default port kept
    assert (
        by["http://a.example:8080/x"]["canonical"]
        == "http://a.example:8080/x"
    )
    # empty path -> '/', scheme lowercased
    assert by["HTTPS://a.example"]["canonical"] == "https://a.example/"
    # duplicate slashes collapse, trailing slash trimmed
    assert (
        by["https://a.example/x//y///z/"]["canonical"]
        == "https://a.example/x/y/z"
    )
    # all-tracking query drops entirely
    only_tracking = by[
        "https://a.example/x?utm_source=f&utm_medium=m&fbclid=1"
    ]
    assert only_tracking["canonical"] == "https://a.example/x"
    assert only_tracking["tracking"]
    # mixed: tracking stripped, the rest kept
    mixed = by["https://a.example/x?gclid=1&keep=2"]
    assert mixed["canonical"] == "https://a.example/x?keep=2"
    assert mixed["tracking"]
    # untouched URLs report tracking=False
    assert not by["http://a.example:80/x"]["tracking"]
