"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
sf dir, then compares row count, column names, pandas dtypes, and exact
cell values (columns sorted by name, rows sorted) — a conservative
approximation of the driver's order-insensitive value-hash.

The dtype check reproduces the driver's encoding strictness: DuckDB
``SUM(BIGINT)`` returns HUGEINT which pandas renders as float64/object,
hashing differently from Spark's int64 even when values are equal
(the CORRECTNESS_r02 ``hash_match: false`` artifact). Cell-string
comparison alone cannot see that; dtype *kind* comparison can.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from aruna_spark.catalog import TABLES
from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark


def normalize(df, float_sig=12):
    """pandas df -> sorted list of row tuples with canonical cell repr."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.{float_sig}g}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)):
                row.append(repr([str(x) for x in v]))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def dtype_kinds(df) -> dict[str, str]:
    """column -> numpy dtype kind ('i' int, 'f' float, 'O' object, ...)."""
    return {c: df[c].dtype.kind for c in sorted(df.columns)}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    load_all()
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name, (fn, oracle) in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if oracle is None:
            print(f"SKIP-ORACLE {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s_cols, s_rows = normalize(spark_pdf)
        d_cols, d_rows = normalize(duck_pdf)
        s_kinds, d_kinds = dtype_kinds(spark_pdf), dtype_kinds(duck_pdf)
        if s_cols != d_cols:
            failures.append(name)
            print(f"FAIL {name}: columns {s_cols} != {d_cols}")
        elif s_kinds != d_kinds:
            failures.append(name)
            bad = {c: (s_kinds[c], d_kinds[c]) for c in s_kinds
                   if s_kinds[c] != d_kinds[c]}
            print(f"FAIL {name}: dtype kinds spark!=duck: {bad}")
        elif len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(d_rows)}")
        elif s_rows != d_rows:
            failures.append(name)
            diff = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {diff}:")
            print(f"  spark: {s_rows[diff]}")
            print(f"  duck : {d_rows[diff]}")
        else:
            print(f"OK   {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
