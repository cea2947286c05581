"""Bucketed tables: the write-once shuffle actually elides join exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
from image_matadata_batchprocessing_aws_spark.sources.bucketing import bucketed_join, write_bucketed
from image_matadata_batchprocessing_aws_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(orders, "orders_b", "custkey", 4, path=str(tmp_path / "orders_b"))
    write_bucketed(customer, "customer_b", "custkey", 4, path=str(tmp_path / "customer_b"))
    # force the sort-merge path: at toy scale the planner would broadcast
    # the dimension (also correct, but it bypasses bucketed scans)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "orders_b", "customer_b", "custkey")
        plan = formatted_plan(j)
        assert "Bucketed: true" in plan  # both scans use bucket layout
        assert "Exchange hashpartitioning" not in plan  # no join shuffle
        assert "SortMergeJoin" in plan
        plain = orders.join(customer, "custkey")
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
