"""Dump ``explain("formatted")`` for every registered query plus a
plan-shape summary (Exchange / Python-eval / join-strategy counts).

Usage::

    python scripts/plan_dump.py <out_dir> [sf_dir] [names...]

Writes ``<out_dir>/<query>.txt`` per query and ``<out_dir>/SHAPES.tsv``
with one row per query: exchanges, broadcast/sort-merge/hash joins,
Python eval nodes, scans, and whether AQE wrapped the plan. Driver-side
only — nothing executes.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shape(txt: str) -> dict:
    def c(pat: str) -> int:
        return len(re.findall(pat, txt))

    return {
        "exchange": c(r"\bExchange\b"),
        "reused_exch": c(r"ReusedExchange"),
        "bhj": c(r"BroadcastHashJoin"),
        "smj": c(r"SortMergeJoin"),
        "shj": c(r"ShuffledHashJoin"),
        "bnlj": c(r"BroadcastNestedLoopJoin"),
        "cart": c(r"CartesianProduct"),
        "pyeval": c(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas"),
        "window": c(r"\bWindow\b"),
        "sort": c(r"\bSort\b"),
        "scan": c(r"Scan parquet|FileScan"),
        "rowtoCol": c(r"RowToColumnar|ColumnarToRow"),
        "expand": c(r"\bExpand\b"),
        "generate": c(r"\bGenerate\b"),
        "agg": c(r"HashAggregate|SortAggregate|ObjectHashAggregate"),
    }


def main() -> None:
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir.mkdir(parents=True, exist_ok=True)
    load_all()
    names = sys.argv[3:] or list(REGISTRY)
    spark = get_spark("plan-dump")
    rows = []
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN ERROR: {exc}"
        (out_dir / f"{name}.txt").write_text(txt, encoding="utf-8")
        s = shape(txt)
        rows.append((name, s))
    cols = list(rows[0][1]) if rows else []
    with (out_dir / "SHAPES.tsv").open("w") as fh:
        fh.write("query\t" + "\t".join(cols) + "\n")
        for name, s in rows:
            fh.write(name + "\t" + "\t".join(str(s[c]) for c in cols) + "\n")
    print(f"wrote {len(rows)} plans to {out_dir}")


if __name__ == "__main__":
    main()
