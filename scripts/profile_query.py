"""Profile registered queries: per-query wall time plus job/stage
breakdown from the status tracker.

Usage::

    python scripts/profile_query.py [sf_dir] name [name...]

For each query: runs it once untimed (warmup), once timed through the
noop sink, then prints the timed run's jobs/stages with task counts and
executor run time so the expensive stage is visible without the UI.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aruna_spark.queries import REGISTRY, load_all
from aruna_spark.session import get_spark


def run(spark, name: str, fn, sf_dir: str) -> None:
    sc = spark.sparkContext
    # warmup
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup(name, name)
    t0 = time.time()
    df = fn(spark, sf_dir)
    t_plan = time.time() - t0
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = sorted(set(tracker.getJobIdsForGroup(name) or []) - before)
    print(f"\n=== {name}: {wall:.3f}s wall ({t_plan:.3f}s build), {len(jobs)} jobs")
    jvm_tracker = spark._jsparkSession.sparkContext().statusTracker()
    n_stages = 0
    rows = []
    for j in jobs:
        info = jvm_tracker.getJobInfo(j)
        if info.isEmpty():
            continue
        for sid in info.get().stageIds():
            si = jvm_tracker.getStageInfo(sid)
            if si.isEmpty():
                continue
            s = si.get()
            n_stages += 1
            rows.append((sid, s.numTasks(), s.name()))
    print(f"    {n_stages} stages")
    for sid, ntasks, sname in rows:
        print(f"    stage {sid}: {ntasks} tasks  {sname[:90]}")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    load_all()
    spark = get_spark("profile")
    for name in args:
        fn, _ = REGISTRY[name]
        run(spark, name, fn, sf_dir)


if __name__ == "__main__":
    main()
