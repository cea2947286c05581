"""Driver-table parquet sources.

Parquet scans are the fast path: Catalyst pushes predicates to row-group
stats and prunes columns, so operators downstream never read bytes they
don't use.  At 100 TB these scans split on ``maxPartitionBytes`` — no
manual chunking (the reference's 100k-row ``chunksize`` loop,
``Image_Train_Model/read_csv_s3_train.py:47-53``, has no equivalent here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table (``{sf_dir}/{name}.parquet``).

    The ``events`` table stores naive (``isAdjustedToUTC=0``) parquet
    timestamps.  Spark 4 would infer those as TIMESTAMP_NTZ, which
    ``unix_millis`` and window functions reject; we disable NTZ inference
    so the stored micros are read as instant-typed TIMESTAMP — with the
    session timezone pinned to UTC (session.py) this is the exact same
    wall-clock AND the exact same epoch value DuckDB's ``epoch_ms``
    computes, so oracle parity is timezone-independent.  Older generators
    wrote TIMESTAMP(NANOS), which the vectorized reader rejects; the
    ``nanosAsLong`` + floor-convert branch keeps those readable too.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Expose every driver table as a temp view so the engine's SECOND
    API — plain ``spark.sql`` — works against the same data: the
    DataFrame operators and ANSI SQL share one Catalyst planner, so a
    user can mix freely (``spark.sql("SELECT ... FROM lineitem")`` after
    one call here).  Views are lazy scans (no materialization); the
    events timestamp normalization rides along from :func:`load_table`.
    Tables absent from a partially-populated ``sf_dir`` are skipped, not
    raised on.  Returns the registered view names."""
    names = []
    for name in DRIVER_TABLES:
        if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            continue
        view = f"{name}{suffix}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
