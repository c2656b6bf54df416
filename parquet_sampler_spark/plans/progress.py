"""Progress telemetry — the Spark-native analog of the reference's
per-million-rows progress prints (sample.rs:61-66, join.rs:58-63).

The reference logs `% done` from inside its scan loop; in Spark that
granularity belongs to the scheduler, so we attach a SparkListener and
report per-stage task completion. Use as a context manager around any
action::

    with job_progress(spark, "sample lineitem"):
        df.write.parquet(out)
"""

from __future__ import annotations

import contextlib
import sys
import time


@contextlib.contextmanager
def job_progress(spark, label: str, min_interval_s: float = 1.0):
    """Print `label: completed/total tasks` lines while jobs run inside
    the block (throttled to one line per ``min_interval_s``)."""
    import threading

    sc = spark.sparkContext
    # StatusTracker polling (public API) — no JVM listener subclass
    # needed from Python.
    start = time.time()
    done = {"stop": False}
    listener_holder = {}

    try:

        def poll():
            last = 0.0
            while not done["stop"]:
                tracker = sc.statusTracker()
                ids = tracker.getActiveStageIds()
                now = time.time()
                if ids and now - last >= min_interval_s:
                    parts = []
                    for sid in ids:
                        info = tracker.getStageInfo(sid)
                        if info:
                            parts.append(
                                f"stage {sid}: {info.numCompletedTasks}"
                                f"/{info.numTasks}"
                            )
                    if parts:
                        print(
                            f"[{label}] " + ", ".join(parts),
                            file=sys.stderr,
                        )
                        last = now
                time.sleep(min_interval_s / 4)

        t = threading.Thread(target=poll, daemon=True)
        t.start()
        listener_holder["thread"] = t
        yield
    finally:
        done["stop"] = True
        if "thread" in listener_holder:
            listener_holder["thread"].join(timeout=2)
        elapsed = time.time() - start
        print(f"[{label}] done in {elapsed:.1f}s", file=sys.stderr)
