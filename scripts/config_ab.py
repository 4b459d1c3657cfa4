"""A/B a spark-conf variation over a query subset.

Usage::

    python scripts/config_ab.py '{"spark.x": "y", ...}' name [name...]

Builds ONE session with the overrides applied on top of the engine
session factory's config (must run in a fresh process per variant —
session confs like shuffle partitions are fixed at build), warms every
query once, then times each (min of two) through the noop sink and
prints per-query seconds plus the subset total as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    overrides = json.loads(sys.argv[1])
    names = sys.argv[2:]
    for k, v in overrides.items():
        # seed through the session factory by env-free injection below
        pass

    from aruna_spark.queries import REGISTRY, load_all
    from aruna_spark.session import get_spark

    load_all()
    spark = get_spark("config-ab")
    for k, v in overrides.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001  (static confs need rebuild)
            print(f"WARN static conf {k}: {exc}", file=sys.stderr)
    times = {}
    for name in names:
        fn, _ = REGISTRY[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for name in names:
        fn, _ = REGISTRY[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    print(json.dumps({"total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
