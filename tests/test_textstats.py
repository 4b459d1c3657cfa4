

def test_max_multiplicity_edge_cases(spark):
    """The run-length fold equals the exact per-element max count on
    empty, null, tie-heavy, and all-equal arrays."""
    from pyspark.sql import functions as F

    from aruna_spark.ops.text import max_multiplicity

    rows = [
        (1, []),
        (2, None),
        (3, ["a"]),
        (4, ["a", "b", "a", "c", "a"]),
        (5, ["x", "x", "x"]),
        (6, ["b", "a", "b", "a"]),
        (7, ["z", "y", "y", "z", "z", "y"]),
    ]
    want = {1: 0, 2: 0, 3: 1, 4: 3, 5: 3, 6: 2, 7: 3}
    df = spark.createDataFrame(rows, "id int, arr array<string>").select(
        "id", max_multiplicity(F.col("arr")).alias("m")
    )
    assert {r["id"]: r["m"] for r in df.collect()} == want
