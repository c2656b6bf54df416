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

The directory is applied lazily per-SparkContext: the first truncation
with a ``checkpoint_dir`` calls ``setCheckpointDir`` if the context
does not already have one (an explicitly pre-configured dir wins — two
operators passing different dirs would otherwise fight over global
state mid-job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Eagerly materialize ``df`` and replace its logical plan with the
    stored blocks — reliably when ``checkpoint_dir`` is given."""
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint()
