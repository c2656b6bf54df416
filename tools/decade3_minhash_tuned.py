"""One-off decade-3 cell for minhash_pairs with a tuned broadcast
threshold (r11).

Finding: at sf100 the verify stage's candidate pair list serializes
just past the 10 MB default ``spark.sql.autoBroadcastJoinThreshold``,
so Catalyst/AQE silently flips the two verify joins from
candidate-broadcast BHJ (stream the persisted shingle arrays, no
shuffle) to full sort-merge joins that shuffle + sort the 270M-row
shingle-array table TWICE — >70 GB of scratch to verify ~10^5 pairs,
which exceeds this single-node harness's disk. A cluster operator
tunes the threshold for exactly this shape (the candidate list is the
small side by construction — Θ(near-dups), not Θ(corpus)); this
harness measures the operator under that tuning, identically at BOTH
tiers so the exponent is self-consistent.

Usage: SPARK_DRIVER_MEMORY=32g python tools/decade3_minhash_tuned.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    from parquet_sampler_spark import queries as registry

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("decade3-minhash-tuned")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    qs = registry.queries()
    times = {}
    # plan warmup at sf1 (cold-vs-warm is ~3x; see scale_decade3)
    for sf in ("1", "10", "100"):
        registry.clear_caches()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        qs["minhash_pairs"](
            spark, str(REPO / ".scratch" / f"sf{sf}")
        ).count()
        dt = round(time.perf_counter() - t0, 3)
        times[sf] = dt
        print(f"[cell] minhash_pairs(tuned-broadcast) sf{sf} {dt}s",
              flush=True)
    a = round(math.log(times["100"] / times["10"]) / math.log(10.0), 2)
    print(json.dumps({"metric": "decade3_minhash_tuned",
                      "times": times, "alpha_10_100": a}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
