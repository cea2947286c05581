"""SparkSession factory.

The reference pipeline bounds memory by hand (100k-row pandas chunks,
``del`` + ``gc.collect()`` per chunk — ``Image_Train_Model/
read_csv_s3_train.py:47,129-131``).  On Spark those knobs become session
configs: partition sizing, AQE, and Arrow transfer.  One factory so tests,
bench, and ad-hoc use share the same tuning.

Scale notes (local[N] today, 1000-executor cluster tomorrow):

- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster leave AQE coalescing on and raise the initial number — AQE
  shrinks post-shuffle partitions to ``advisoryPartitionSizeInBytes``.
- AQE skew-join splitting is enabled so a hot join key (e.g. one giant
  customer) is split at runtime instead of stalling one task.
- ``maxPartitionBytes`` 128m keeps scan tasks right-sized for 100 TB of
  parquet (~800k tasks — fine; the scheduler handles millions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "image-metadata-spark-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Honors ``SPARK_GRAFT_CPUS`` (driver contract) for local parallelism.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "16g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # Cluster-parameterized conf overrides (r09, guide §9): scale-
    # dependent knobs ride ``SPARK_GRAFT_CONF`` ("k=v;k=v") so the SAME
    # code serves the local driver bench (defaults above, comparable
    # round over round) and a real cluster (e.g.
    # ``spark.io.compression.codec=zstd`` — better shuffle ratio once
    # shuffles leave the page cache and cross a NIC;
    # ``spark.sql.adaptive.advisoryPartitionSizeInBytes=256m`` — the
    # 100 MB-1 GB post-shuffle partition band of guide §2.2; at sf0.1
    # both were measured flat-to-negative locally, so local defaults
    # stay untouched rather than tuned to local[32]).
    for pair in os.environ.get("SPARK_GRAFT_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
