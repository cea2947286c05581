from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from image_matadata_batchprocessing_aws_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (nanos-timestamp handling included)."""
    return load_table(spark, sf_dir, name)
