"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with .count() (full plan execution, no driver-side
collect overhead). A warmup query first absorbs JVM/codegen startup so
per-query times reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: JVM + codegen + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    qs = registry.queries()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(json.dumps({
        "metric": "query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
