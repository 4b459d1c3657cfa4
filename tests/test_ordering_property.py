"""Property: ops/ordering.global_scan_pos equals a plain total-order
row_number for ANY input — the partitioned-rank + fold-prefixed-offsets
composition must be indistinguishable from the unpartitioned window it
replaces (which scripts/window_audit.py forbids in production plans)."""

from __future__ import annotations

import random

from aruna_spark.ops.ordering import global_scan_pos


def _check(spark, rows):
    df = spark.createDataFrame(
        rows, "p1 string, p2 string, o1 long, o2 string"
    )
    got = {
        (r["p1"], r["p2"], r["o1"], r["o2"]): r["scan_pos"]
        for r in global_scan_pos(
            df, ["p1", "p2"], ["o1", "o2"], out_col="scan_pos"
        ).collect()
    }
    expected = {
        key: i + 1
        for i, key in enumerate(sorted(rows))
    }
    assert got == expected


def test_global_scan_pos_matches_total_order(spark):
    rng = random.Random(11)
    for trial in range(4):
        n = rng.choice([1, 7, 40, 161])
        rows = list(
            {
                (
                    f"p{rng.randrange(3)}",
                    f"q{rng.randrange(4)}",
                    rng.randrange(50),
                    f"x{rng.randrange(1000):04d}",
                )
                for _ in range(n)
            }
        )
        _check(spark, rows)


def test_global_scan_pos_single_partition_and_single_row(spark):
    _check(spark, [("a", "b", 1, "x")])
    # every row in ONE partition — offsets fold reduces to rank
    rows = [("a", "b", i, f"x{i:03d}") for i in range(25)]
    _check(spark, rows)
