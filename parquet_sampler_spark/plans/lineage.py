"""Lineage truncation for iterative operators (PageRank, connected
components): each round's plan otherwise embeds ALL prior rounds'
joins, growing optimizer time and recovery cost linearly.

Two truncation modes:

* ``localCheckpoint()`` (default, ``checkpoint_dir=None``) — blocks on
  executor storage. Fast (no filesystem write), but blocks die with
  their executor and there is no lineage left to recompute them: on a
  real cluster an executor loss mid-iteration fails the job. The right
  choice for local/bench runs.
* ``checkpoint()`` (``checkpoint_dir`` set) — blocks written to a
  fault-tolerant directory (HDFS / object store). One extra write per
  truncation buys executor-loss survival — the correct default for
  long iterative jobs at cluster scale.

``setCheckpointDir`` is SparkContext-global and appends a random UUID
subdirectory, so the dir in effect is ``<base>/<uuid>``. A caller's
``checkpoint_dir`` must actually be honored — silently keeping a
previously-set base would write blocks to a path the caller may have
already retired (and breaks the contract that the blocks land where
the fault-tolerant storage was provisioned). We therefore re-point the
context whenever the dir in effect is not under the requested base;
repeated truncations with the same base (the per-iteration loop case)
compare by prefix and do NOT re-set, so one operator run keeps one
UUID directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _under(current: str, base: str) -> bool:
    """True iff the checkpoint dir in effect (``<base>/<uuid>``, scheme-
    qualified by Spark, e.g. ``file:/x`` or ``hdfs://nn/x``) lives under
    the requested base path/URI."""
    cur = current.rstrip("/")
    req = base.rstrip("/")
    # strip a URI scheme Spark added that the caller omitted
    if ":" in cur.split("/", 1)[0] and ":" not in req.split("/", 1)[0]:
        cur = cur.split(":", 1)[1]
        while cur.startswith("//"):  # file://host/x -> /x
            cur = cur[1:]
    return cur == req or cur.startswith(req + "/")


def truncate_lineage(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Eagerly materialize ``df`` and replace its logical plan with the
    stored blocks — reliably when ``checkpoint_dir`` is given."""
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    current = sc.getCheckpointDir()
    if current is None or not _under(current, checkpoint_dir):
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint()
