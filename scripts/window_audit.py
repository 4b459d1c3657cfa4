"""Audit every registered query's physical plan for unpartitioned
Window nodes (the `WindowExec: No Partition Defined` class — VERDICT r4
'What's wrong' #1/#2). A Window whose windowspecdefinition starts with
its order column (no partition columns before it) moves all rows to one
partition; at 100x data that is a driver-adjacent bottleneck.

Usage: python scripts/window_audit.py [sf_dir] [query ...]
Prints one line per flagged query with the offending spec snippet.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark


def unpartitioned_specs(plan: str) -> list[str]:
    """Return windowspecdefinition(...) snippets with no partition cols.

    A spec renders as ``windowspecdefinition(part1#1, part2#2, ord#3 ASC
    NULLS FIRST, specifiedwindowframe(...))`` — partition columns come
    first WITHOUT sort direction; an unpartitioned spec's first argument
    carries ASC/DESC immediately.
    """
    out = []
    for m in re.finditer(r"windowspecdefinition\(([^()]*(?:\([^()]*\))?[^()]*)", plan):
        args = m.group(1)
        first = args.split(",")[0].strip()
        if " ASC" in first or " DESC" in first:
            out.append(args[:120])
    return out


def main() -> None:
    load_all()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark()
    flagged = 0
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit keeps going
            print(f"ERROR {name}: {exc}")
            continue
        specs = unpartitioned_specs(plan)
        if specs:
            flagged += 1
            print(f"FLAG {name}: {specs[0]}")
    print(f"flagged {flagged}/{len(names)}")


if __name__ == "__main__":
    main()
