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
    asof_join_forward,
    asof_join_nearest,
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


NEAREST_TOL_HOURS = 12


def join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """For each purchase, the NEXT click (inclusive) by the same user —
    the forward direction of the as-of family; same one-shuffle
    union-and-carry plan, carry direction flipped."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join_forward(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts", right_prefix="click_"
    )
    return j.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.col("click_event_id"),
        (F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("ts"))).alias("lead_us"),
    )


def join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """For each purchase, the click closest in time EITHER direction,
    but only within NEAREST_TOL_HOURS (ties go backward) — the
    sensor-alignment shape of the as-of family, with the tolerance guard
    exercised (far-away matches null out)."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join_nearest(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_prefix="click_",
        tolerance_seconds=NEAREST_TOL_HOURS * 3600,
    )
    return j.select(
        "event_id",
        "user_id",
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


def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-funnel analysis over the event log: signup -> first click
    AFTER the signup -> first purchase AFTER that click, per user; output
    is the stage-survival table (one row per stage with user counts).

    Shape: one conditional-min aggregation per stage, each joined back on
    user_id — three shuffles on the same key (co-partitioned on a
    cluster), no windows over unbounded event sequences, no self-join
    fan-out.  The asof-join family (join_asof_click_purchase) answers
    per-event attribution; this answers the cohort question."""
    ev = t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t_signup")
    ).where(F.col("t_signup").isNotNull())
    c = (
        ev.join(s, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts_ms") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts_ms") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n")).select(F.lit(1).cast("long").alias("stage"), F.lit("signup").alias("event"), "n")
        .unionByName(c.agg(F.count("*").alias("n")).select(F.lit(2).cast("long").alias("stage"), F.lit("click_after_signup").alias("event"), "n"))
        .unionByName(p.agg(F.count("*").alias("n")).select(F.lit(3).cast("long").alias("stage"), F.lit("purchase_after_click").alias("event"), "n"))
    )


FUNNEL_WINDOW_DAYS = 7
_FUNNEL_WINDOW_MS = FUNNEL_WINDOW_DAYS * 86400 * 1000


def funnel_conversion_bounded(spark: SparkSession, sf: str) -> DataFrame:
    """The funnel with a CONVERSION WINDOW — each stage must land within
    7 days of the previous one, the form product analytics actually
    reports (an unbounded funnel credits a purchase a year later).
    Identical three-aggregation shape as funnel_conversion; the bound is
    one extra map-side predicate per stage."""
    ev = t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    win = F.lit(_FUNNEL_WINDOW_MS)
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t_signup")
    ).where(F.col("t_signup").isNotNull())
    c = (
        ev.join(s, "user_id")
        .where(
            (F.col("event_type") == "click")
            & (F.col("ts_ms") > F.col("t_signup"))
            & (F.col("ts_ms") <= F.col("t_signup") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts_ms") > F.col("t_click"))
            & (F.col("ts_ms") <= F.col("t_click") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n")).select(F.lit(1).cast("long").alias("stage"), F.lit("signup").alias("event"), "n")
        .unionByName(c.agg(F.count("*").alias("n")).select(F.lit(2).cast("long").alias("stage"), F.lit("click_7d").alias("event"), "n"))
        .unionByName(p.agg(F.count("*").alias("n")).select(F.lit(3).cast("long").alias("stage"), F.lit("purchase_7d").alias("event"), "n"))
    )


def join_nullsafe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the per-user
    event counts joined back so that NULL user ids match the NULL group
    instead of dropping — the semantics backfills and audit joins need.
    Spark plans eqNullSafe as a hash join (the condition is still an
    equality on a coalesced key), not a nested loop."""
    ev = t(spark, sf, "events").select("event_id", "user_id").alias("e")
    d = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("group_n"))
        .select(F.col("user_id").alias("g_user_id"), "group_n")
    )
    return ev.join(d, F.col("e.user_id").eqNullSafe(F.col("g_user_id"))).select(
        "event_id",
        F.col("e.user_id").alias("user_id"),
        F.col("group_n").cast("long").alias("group_n"),
    )


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "funnel_conversion_bounded": funnel_conversion_bounded,
    "join_nullsafe": join_nullsafe,
    "join_asof_click_purchase": join_asof_click_purchase,
    "join_asof_forward": join_asof_forward,
    "join_asof_nearest": join_asof_nearest,
    "join_range_event_windows": join_range_event_windows,
    "join_interval_overlap": join_interval_overlap,
    "join_salted_skew": join_salted_skew,
}

ORACLES = {
    "funnel_conversion": """
        WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        s AS (SELECT user_id,
                     min(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t_signup
              FROM ev GROUP BY user_id HAVING t_signup IS NOT NULL),
        c AS (SELECT ev.user_id, min(ts_ms) AS t_click
              FROM ev JOIN s USING (user_id)
              WHERE event_type = 'click' AND ts_ms > t_signup
              GROUP BY ev.user_id),
        p AS (SELECT ev.user_id, min(ts_ms) AS t_purchase
              FROM ev JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts_ms > t_click
              GROUP BY ev.user_id)
        SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event, count(*) AS n FROM s
        UNION ALL
        SELECT 2, 'click_after_signup', count(*) FROM c
        UNION ALL
        SELECT 3, 'purchase_after_click', count(*) FROM p
    """,
    "join_nullsafe": """
        WITH d AS (SELECT user_id, count(*) AS group_n FROM events GROUP BY user_id)
        SELECT e.event_id, e.user_id, d.group_n
        FROM events e JOIN d ON e.user_id IS NOT DISTINCT FROM d.user_id
    """,
    "join_salted_skew": """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS total,
               c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "funnel_conversion_bounded": f"""
        WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        s AS (SELECT user_id,
                     min(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t_signup
              FROM ev GROUP BY user_id HAVING t_signup IS NOT NULL),
        c AS (SELECT ev.user_id, min(ts_ms) AS t_click
              FROM ev JOIN s USING (user_id)
              WHERE event_type = 'click' AND ts_ms > t_signup
                AND ts_ms <= t_signup + {_FUNNEL_WINDOW_MS}
              GROUP BY ev.user_id),
        p AS (SELECT ev.user_id, min(ts_ms) AS t_purchase
              FROM ev JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts_ms > t_click
                AND ts_ms <= t_click + {_FUNNEL_WINDOW_MS}
              GROUP BY ev.user_id)
        SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event, count(*) AS n FROM s
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS stage, 'click_7d' AS event, count(*) AS n FROM c
        UNION ALL
        SELECT CAST(3 AS BIGINT) AS stage, 'purchase_7d' AS event, count(*) AS n FROM p
    """,
    "join_asof_click_purchase": """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, round(p.value, 2) AS value,
               c.event_id AS click_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "join_asof_forward": """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, round(p.value, 2) AS value,
               c.event_id AS click_event_id,
               epoch_us(c.ts) - epoch_us(p.ts) AS lead_us
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    # nearest = choose between the two directed candidates after the
    # tolerance guard; exact-distance ties go backward — stated in the
    # operator contract and mirrored literally here
    "join_asof_nearest": f"""
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        b AS (SELECT p.event_id, c.event_id AS cid, c.ts AS cts
              FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        f AS (SELECT p.event_id, c.event_id AS cid, c.ts AS cts
              FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts),
        tol AS (
          SELECT p.event_id, p.user_id, p.ts,
                 CASE WHEN epoch_us(p.ts) - epoch_us(b.cts)
                           <= CAST({NEAREST_TOL_HOURS * 3600} AS BIGINT) * 1000000 THEN b.cid END AS bcid,
                 CASE WHEN epoch_us(p.ts) - epoch_us(b.cts)
                           <= CAST({NEAREST_TOL_HOURS * 3600} AS BIGINT) * 1000000 THEN b.cts END AS bcts,
                 CASE WHEN epoch_us(f.cts) - epoch_us(p.ts)
                           <= CAST({NEAREST_TOL_HOURS * 3600} AS BIGINT) * 1000000 THEN f.cid END AS fcid,
                 CASE WHEN epoch_us(f.cts) - epoch_us(p.ts)
                           <= CAST({NEAREST_TOL_HOURS * 3600} AS BIGINT) * 1000000 THEN f.cts END AS fcts
          FROM p
          LEFT JOIN b ON p.event_id = b.event_id
          LEFT JOIN f ON p.event_id = f.event_id),
        pick AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN bcid IS NOT NULL AND (fcid IS NULL OR
                           epoch_us(ts) - epoch_us(bcts) <= epoch_us(fcts) - epoch_us(ts))
                      THEN bcid ELSE fcid END AS click_event_id,
                 CASE WHEN bcid IS NOT NULL AND (fcid IS NULL OR
                           epoch_us(ts) - epoch_us(bcts) <= epoch_us(fcts) - epoch_us(ts))
                      THEN bcts ELSE fcts END AS cts
          FROM tol)
        SELECT event_id, user_id, click_event_id,
               epoch_us(ts) - epoch_us(cts) AS lag_us
        FROM pick
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
