"""Time-series reshaping: regular-grid resampling with gap fill, and
cascading time rollups (extends SURVEY sections 2.4/2.5 into the
hypertable territory the reference's epoch/date-part handling
(``read_csv_s3_train.py:83-90``) gestures at).

Both operators follow one scale rule: the DENSE structure (the time
grid, the rollup hierarchy) is generated per key from that key's own
bounds — never materialized globally — so grid size is bounded by
``span/step`` per key and the shuffle key is always (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SECONDS_PER_DAY = 86400


def resample_daily(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    value_digits: int = 4,
) -> DataFrame:
    """Per-key DAILY regular grid between that key's first and last
    observation, with two gap policies demonstrated side by side:

    - ``day_sum``: additive metric, gap days are exact 0 (scaled-long
      sums -> bit-stable across engines);
    - ``n_events``: count, gaps 0;
    - ``last_active_day``: state metric, forward-filled — the most
      recent day with any activity at or before this grid day.

    Plan shape: one groupBy (key, day) for the sparse aggregates, one
    tiny groupBy (key) for the bounds, grid = ``sequence`` + ``explode``
    off the bounds row (rows generated = span-days per key, never a
    global calendar), a co-partitioned left join on (key, day), then a
    keyed ordered window for the ffill — every stage keyed by ``key``,
    so 100 TB parallelizes across keys with no global ordering.
    """
    scale = float(10**value_digits)
    day = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(SECONDS_PER_DAY * 1_000_000)).cast(
        "long"
    )
    sparse = (
        df.select(F.col(key), day.alias("day"), F.col(value_col).alias("__v"))
        .groupBy(key, "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("__v") * F.lit(scale)).cast("long")).alias("__vsum"),
        )
    )
    bounds = sparse.groupBy(key).agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    grid = bounds.select(
        F.col(key), F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("day")
    )
    filled = (
        grid.join(sparse, [key, "day"], "left")
        .withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("long"))
        .withColumn(
            "day_sum",
            F.coalesce(F.col("__vsum"), F.lit(0)).cast("double") / F.lit(scale),
        )
        .withColumn(
            "last_active_day",
            # ffill as a running max: the grid day is monotone within the
            # window, so max(day-with-activity) == last non-null — one
            # less IGNORE NULLS dialect dependency than last_value
            F.max(F.when(F.col("__vsum").isNotNull(), F.col("day"))).over(
                Window.partitionBy(key)
                .orderBy("day")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return filled.select(key, "day", "n_events", "day_sum", "last_active_day")


def rollup_cascade_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    value_digits: int = 4,
) -> DataFrame:
    """Hourly -> daily cascading rollup: the daily aggregate is computed
    FROM the hourly aggregate (sum of sums, sum of counts), not from the
    raw rows — the materialized-rollup pattern every metrics hypertable
    uses (1 min -> 1 h -> 1 d), where each coarser tier re-aggregates
    the ~24x-smaller finer tier instead of rescanning 100 TB of raw
    events.

    Correct re-aggregation needs DISTRIBUTIVE partials: the hourly tier
    stores (scaled-long sum, count) and daily avg derives as sum/count
    at the end — never avg-of-avgs.  Scaled-long sums make the cascade
    bit-identical to a direct daily aggregate on any engine (integer
    addition is associative), which is exactly what the oracle checks.
    """
    scale = float(10**value_digits)
    hour = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(3600 * 1_000_000)).cast("long")
    hourly = (
        df.select(hour.alias("hour"), F.col(value_col).alias("__v"))
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.round(F.col("__v") * F.lit(scale)).cast("long")).alias("__vsum"),
        )
    )
    daily = (
        hourly.withColumn("day", F.floor(F.col("hour") / F.lit(24)).cast("long"))
        .groupBy("day")
        .agg(
            F.sum("__n").alias("n_events"),
            F.sum("__vsum").alias("__vsum"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
    )
    v = F.col("__vsum").cast("double") / F.lit(scale)
    return daily.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_active_hours").cast("long").alias("n_active_hours"),
        F.round(v, value_digits).alias("day_sum"),
        F.round(v / F.col("n_events").cast("double"), value_digits).alias("day_avg"),
    )
