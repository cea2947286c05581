"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metadata-ETL-shaped pipeline on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the oracle-checked
operator inventory from SURVEY.md section 2 (see PARITY.md for the
operator-id -> query map).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators import add_date_parts, epoch_ms_to_timestamp, ffill_bfill
from image_matadata_batchprocessing_aws_spark.queries import all_oracles, all_queries

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's metadata-ETL chain (scan -> cast ->
    timestamp/date-parts -> sentinel-null -> ffill/bfill -> fill ->
    grouped audit agg) re-expressed as one lazy DataFrame plan over the
    events table (SURVEY.md section 3.1 'Spark shape')."""
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events")
    e = e.withColumn("ts_ms", F.unix_millis("ts"))
    e = epoch_ms_to_timestamp(e, "ts_ms", out="ts2")
    e = add_date_parts(e, "ts2")
    # sentinel-null the error rows and carry the value as exact CENTS
    # (the corpus is cent-precision everywhere): the ffill and the group
    # sums are then integer — partition/merge order cannot move a bit —
    # and the output reconstructs sum/avg with one correctly-rounded
    # division each.  (The earlier double-summed form was genuinely
    # order-dependent: a group whose float sum landed within ulp noise
    # of a .005 rounding boundary flipped between runs.)
    e = e.withColumn(
        "v",
        F.when(
            F.col("event_type") != "error",
            F.round(F.col("value") * 100).cast("long"),
        ),
    )
    e = ffill_bfill(e, ["v"], order_by="event_id", partition_by=["user_id"])
    e = e.na.fill({"v": 0})
    return (
        e.groupBy("event_type", "year", "month", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").alias("__cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            "year",
            "month",
            "day",
            "n_events",
            F.round(F.col("__cents").cast("double") / 100.0, 2).alias("sum_value"),
            F.round(
                F.col("__cents").cast("double")
                / (100.0 * F.col("n_events").cast("double")),
                4,
            ).alias("avg_value"),
            "n_users",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (rows-only ops —
    e.g. approx sketches, heuristic lang-id — are intentionally absent)."""
    return all_oracles()
