"""Catalog loading rules: NTZ normalization (flat AND nested — ADVICE
r4 low #2), as-if-UTC epoch semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aruna_spark.catalog import load_table


def test_nested_ntz_fields_are_normalized(spark, tmp_path):
    """TIMESTAMP_NTZ inside struct/array/map must be cast to TIMESTAMP
    (as-if-UTC) exactly like top-level columns — not silently pass
    through the dtype walk."""
    src = spark.sql(
        """
        SELECT
          TIMESTAMP_NTZ '2024-03-01 12:30:00' AS t,
          named_struct(
            'created', TIMESTAMP_NTZ '2024-03-02 01:02:03',
            'inner', named_struct('at', TIMESTAMP_NTZ '2024-03-03 00:00:00'),
            'n', 7
          ) AS s,
          array(TIMESTAMP_NTZ '2024-03-04 06:00:00') AS a,
          map('k', TIMESTAMP_NTZ '2024-03-05 18:00:00') AS m
        """
    )
    src.write.mode("overwrite").parquet(str(tmp_path / "nested.parquet"))
    df = load_table(spark, str(tmp_path), "nested")
    assert "timestamp_ntz" not in str(df.schema).lower(), df.schema
    row = df.select(
        F.unix_micros("t").alias("t"),
        F.unix_micros("s.created").alias("sc"),
        F.unix_micros("s.inner.at").alias("si"),
        F.unix_micros(F.element_at("a", 1)).alias("a1"),
        F.unix_micros(F.element_at("m", "k")).alias("mk"),
        F.col("s.n").alias("n"),
    ).collect()[0]
    # wall-clock values interpreted as UTC, to the microsecond
    assert row.t == 1709296200000000
    assert row.sc == 1709341323000000
    assert row.si == 1709424000000000
    assert row.a1 == 1709532000000000
    assert row.mk == 1709661600000000
    assert row.n == 7


def test_flat_tables_unchanged(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    assert "timestamp_ntz" not in str(df.schema).lower()
    assert df.count() > 0
