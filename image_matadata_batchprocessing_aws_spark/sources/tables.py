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

    The ``events`` table stores TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and floor-convert to a
    microsecond TimestampType (``ts div 1000`` — integer division, no
    double round-trip that would lose precision at 1e18 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql`` use."""
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
