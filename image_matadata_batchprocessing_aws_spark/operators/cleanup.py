"""Post-commit source cleanup (SURVEY S13 — delete-after-consume).

The reference deletes its consumed S3 objects inside a ``finally``-style
tail that runs even when the batch partially failed
(``process_test_train_Images.py:68-71``) — data loss on any mid-run
error.  Engine semantics diverge deliberately: deletion is (1) gated off
by default, (2) only ever invoked *after* the sink committed, and (3)
exposed as a combined write-then-cleanup helper whose failure path
provably never deletes.

Implementation uses the Hadoop ``FileSystem`` API via the JVM gateway, so
the same call works on ``file://``, ``s3a://``, ``hdfs://`` — whatever
filesystem the path's scheme resolves to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def cleanup_after_commit(
    spark: SparkSession, paths: list[str], enabled: bool = False
) -> list[str]:
    """Delete consumed source paths (recursively).  Returns the paths
    actually deleted.  ``enabled`` is an explicit opt-in gate — the safe
    default is to never destroy inputs."""
    if not enabled:
        return []
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    deleted: list[str] = []
    for p in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(conf)
        if fs.exists(jpath) and fs.delete(jpath, True):
            deleted.append(p)
    return deleted


def write_parquet_then_cleanup(
    df: DataFrame,
    out_path: str,
    consumed_paths: list[str],
    mode: str = "error",
    enabled: bool = True,
) -> list[str]:
    """Commit-before-delete ordering made structural: the write must
    return (commit protocol finished) before any delete is attempted; a
    raising write propagates with zero deletions."""
    df.write.mode(mode).parquet(out_path)
    return cleanup_after_commit(df.sparkSession, consumed_paths, enabled=enabled)
