"""truncate_lineage: the caller's checkpoint_dir must be honored even
when the shared SparkContext already points at a different base (the
setCheckpointDir global is otherwise sticky — the exact mode that sent
pagerank blocks into an earlier test's deleted tmp dir)."""

from __future__ import annotations

import os

from parquet_sampler_spark.plans.lineage import _under, truncate_lineage


def _files_under(base: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(base):
        out.extend(os.path.join(root, f) for f in files)
    return out


def test_under_prefix_semantics():
    assert _under("file:/a/b/uuid", "/a/b")
    assert _under("/a/b/uuid", "/a/b")
    assert _under("file:/a/b", "/a/b/")
    assert not _under("file:/a/bc/uuid", "/a/b")
    assert not _under("/other/uuid", "/a/b")
    # caller passed a URI too: compare verbatim
    assert _under("hdfs://nn/x/uuid", "hdfs://nn/x")
    assert not _under("hdfs://nn/x/uuid", "hdfs://nn/y")


def test_two_dirs_one_session_both_receive_blocks(spark, tmp_path):
    df = spark.range(100)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    truncate_lineage(df, a).count()
    assert _files_under(a), "first dir received no checkpoint blocks"
    truncate_lineage(df, b).count()
    assert _files_under(b), (
        "second checkpoint_dir ignored: global setCheckpointDir stuck "
        "on the first caller's base"
    )


def test_same_dir_not_repointed(spark, tmp_path):
    """Per-iteration truncations with one base reuse one UUID subdir
    (no re-set per call)."""
    base = str(tmp_path / "iter")
    truncate_lineage(spark.range(10), base).count()
    sc = spark.sparkContext
    first = sc.getCheckpointDir()
    truncate_lineage(spark.range(20), base).count()
    assert sc.getCheckpointDir() == first
    # exactly one UUID subdir under the base
    assert len(os.listdir(base)) == 1
