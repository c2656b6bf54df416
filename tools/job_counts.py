"""Structural (load-independent) per-row cost counts: Spark JOBS,
stages and tasks each registry row launches, counted via job groups +
the status tracker. Wall time on this host swings ×2-4 with co-tenant
load; job/stage/task counts are exact and reproducible, so they are
the right before/after evidence for driver-loop and plan-shape
optimizations (guide §1: measure first; §7.1: map stages to operators).

Usage:
    python tools/job_counts.py [sf_dir] [name ...] [--clear]

Default sf_dir is sf0.01 (structural counts don't need scale). With
--clear, caches are cleared before EACH row (bench cold shape);
without, rows run in registry order against warm session state (bench
warm shape, after its setup rows).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = sys.argv[1:]
    clear = "--clear" in args
    if clear:
        args.remove("--clear")
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = args[1:] if args and "/" in args[0] else args

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.queries import clear_caches
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("job_counts")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = registry.queries()
    rows = names or list(qs)
    print(f"{'row':42s} {'jobs':>5s} {'stages':>7s} {'tasks':>7s} {'sec':>7s}")
    for name in rows:
        if name not in qs:
            print(f"?? {name}: not in registry", file=sys.stderr)
            continue
        if clear:
            clear_caches()
        group = f"jc_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).count()
        except Exception as ex:
            print(f"{name:42s} ERROR {ex}")
            sc.setJobGroup(None, None)
            continue
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None or si.numTasks == 0:
                    continue  # skipped stage (reused exchange/cache)
                stages += 1
                tasks += si.numTasks
        print(f"{name:42s} {len(job_ids):5d} {stages:7d} {tasks:7d} "
              f"{dt:7.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
