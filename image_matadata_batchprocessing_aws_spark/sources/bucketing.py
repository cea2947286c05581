"""Bucketed-table support: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides.  Bucketing pays that shuffle once at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so Catalyst plans the join with NO exchange (and
with ``bucketedScan`` sorted input, no sort either).  This is the engine's
answer to SURVEY §7's "repartition/bucketing for co-located joins".

Rules for the planner to elide the shuffle: same bucket count on both
sides, join key == bucket key, ``spark.sql.sources.bucketing.enabled``
(default true).  Buckets should be sized so one bucket of the larger
table fits an executor's memory (~128-512 MB each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) parquet table
    in the session catalog."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — plans
    shuffle-free when the bucketing rules hold (assert via plans.plan_report:
    n_exchanges == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
