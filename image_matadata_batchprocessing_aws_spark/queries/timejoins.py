"""As-of and range (interval) join queries over the events table.

The reference pairs datasets only by array position (``train.py:59-64``);
these queries exercise the engine's explicit time-join operators
(operators/joins.py) with exact DuckDB oracles — DuckDB's native
``ASOF JOIN`` and a plain inequality join verify the scalable Spark
formulations (union-and-carry window; bin equi-join + residual filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.joins import (
    asof_join,
    interval_overlap_join_binned,
    range_join_binned,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

WINDOW_HOURS = 6
ANCHOR_MOD = 500  # every ANCHOR_MOD-th event anchors a window
PROMO_MOD, PROMO_HOURS = 97, 4
MAINT_MOD, MAINT_HOURS = 89, 2


def join_asof_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """For each purchase event, the most recent click (inclusive) by the
    same user: as-of backward join, one shuffle on user_id."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(purchases, clicks, key="user_id", left_ts="ts", right_ts="ts", right_prefix="click_")
    return j.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.col("click_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias("lag_us"),
    )


def join_range_event_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Events assigned to overlapping fixed-width promo windows (anchored
    at every ANCHOR_MOD-th event): keyless interval join via the binned
    equi-join scale path, then a per-window aggregate."""
    ev = t(spark, sf, "events")
    anchors = ev.where(F.col("event_id") % ANCHOR_MOD == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {WINDOW_HOURS} HOURS")).alias("end_ts"),
    )
    j = range_join_binned(
        ev.select("event_id", "ts", "value"),
        anchors,
        fact_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bin_width_seconds=WINDOW_HOURS * 3600,
    )
    return j.groupBy("window_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    )


def join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping (promo window x maintenance window) pairs with the
    overlap duration: interval-x-interval join via the first-shared-bin
    equi-join — no inequality nested-loop, no distinct."""
    ev = t(spark, sf, "events")
    promo = ev.where(F.col("event_id") % PROMO_MOD == 0).select(
        F.col("event_id").alias("promo_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr(f"INTERVAL {PROMO_HOURS} HOURS")).alias("p_end"),
    )
    maint = ev.where(F.col("event_id") % MAINT_MOD == 0).select(
        F.col("event_id").alias("maint_id"),
        F.col("ts").alias("m_start"),
        (F.col("ts") + F.expr(f"INTERVAL {MAINT_HOURS} HOURS")).alias("m_end"),
    )
    j = interval_overlap_join_binned(
        promo, maint, "p_start", "p_end", "m_start", "m_end",
        bin_width_seconds=PROMO_HOURS * 3600,
    )
    return j.select(
        "promo_id",
        "maint_id",
        (
            F.unix_micros(F.least("p_end", "m_end"))
            - F.unix_micros(F.greatest("p_start", "m_start"))
        ).alias("overlap_us"),
    )


def join_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-spread equi-join with a plain-join oracle: orders x customer
    through ``salted_join`` (big side salted, small side replicated,
    join on (key, salt)) must produce EXACTLY the rows of the ordinary
    join — the multiplicity-preservation property that makes salting a
    safe drop-in when AQE's runtime skew split can't see the hot key
    (operators/skew.py; the explicit fallback beside the session's
    AQE-on default)."""
    from image_matadata_batchprocessing_aws_spark.operators.skew import salted_join

    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    out = salted_join(orders, cust, "o_custkey", n_salts=8)
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
        "c_name",
        "c_mktsegment",
    )


QUERIES = {
    "join_asof_click_purchase": join_asof_click_purchase,
    "join_range_event_windows": join_range_event_windows,
    "join_interval_overlap": join_interval_overlap,
    "join_salted_skew": join_salted_skew,
}

ORACLES = {
    "join_salted_skew": """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS total,
               c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "join_asof_click_purchase": """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, round(p.value, 2) AS value,
               c.event_id AS click_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "join_range_event_windows": f"""
        WITH w AS (SELECT event_id AS window_id, ts AS start_ts,
                          ts + INTERVAL {WINDOW_HOURS} HOUR AS end_ts
                   FROM events WHERE event_id % {ANCHOR_MOD} = 0)
        SELECT w.window_id, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
        FROM events e JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
        GROUP BY w.window_id
    """,
    "join_interval_overlap": f"""
        WITH p AS (SELECT event_id AS promo_id, ts AS p_start,
                          ts + INTERVAL {PROMO_HOURS} HOUR AS p_end
                   FROM events WHERE event_id % {PROMO_MOD} = 0),
        m AS (SELECT event_id AS maint_id, ts AS m_start,
                     ts + INTERVAL {MAINT_HOURS} HOUR AS m_end
              FROM events WHERE event_id % {MAINT_MOD} = 0)
        SELECT promo_id, maint_id,
               epoch_us(least(p_end, m_end)) - epoch_us(greatest(p_start, m_start))
                 AS overlap_us
        FROM p JOIN m ON p_start < m_end AND m_start < p_end
    """,
}
