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


def rolling_anomaly_zscore(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lookback: int = 20,
    min_periods: int = 10,
    threshold: float = 3.0,
    value_digits: int = 4,
) -> DataFrame:
    """Trailing-window anomaly detection: each observation's z-score
    against the PRECEDING ``lookback`` observations of the same key
    (current row excluded — an outlier must not dilute its own
    baseline), null until ``min_periods`` history exists, flagged at
    ``|z| > threshold``.

    Cross-engine determinism is the hard part of rolling floats: sliding
    SUM over doubles is association-sensitive and engines disagree on
    the tree shape (DuckDB segment-trees it, Spark recomputes in frame
    order).  So the window aggregates are scaled-BIGINT sums (exact,
    association-free) and mean/std/z reconstruct per row in doubles with
    the same scalar sequence both sides.  Requires
    ``|value| * 10^digits < sqrt(2^63 / lookback)`` so the
    sum-of-squares stays in int64 (~3e7 at digits=4, lookback=20).

    ROWS (not RANGE) framing over ``(ts, tiebreak)``: a deterministic
    total order per key, so the frame content — and therefore every
    sum — is reproducible.  One shuffle on the key; windows over time
    series parallelize across keys."""
    scale = float(10**value_digits)
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-lookback, -1)
    )
    base = df.select(
        F.col(key),
        F.col(ts_col),
        F.col(order_tiebreak),
        F.col(value_col),
        xs.alias("__xs"),
    )
    stats = base.select(
        key,
        ts_col,
        order_tiebreak,
        value_col,
        "__xs",
        F.count("__xs").over(w).alias("__n"),
        F.sum("__xs").over(w).alias("__s"),
        F.sum(F.col("__xs") * F.col("__xs")).over(w).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    std = F.sqrt((ss - s * s / n) / (n - F.lit(1.0)))
    z = (F.col("__xs").cast("double") - s / n) / std
    z = F.when(F.col("__n") >= min_periods, F.round(z, 4))
    return stats.select(
        key,
        ts_col,
        order_tiebreak,
        value_col,
        F.col("__n").cast("long").alias("n_baseline"),
        z.alias("z"),
        (F.abs(z) > F.lit(threshold)).alias("is_anomaly"),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    value_digits: int = 4,
) -> DataFrame:
    """Duration-weighted mean per key — the hypertable ``time_weight``
    aggregate: each observation's value holds until the NEXT observation
    (last-observation-carried-forward), so the mean weights each value
    by its holding interval, not by sample count.  Irregularly-sampled
    series (the norm for event data) need this: a plain avg over-weights
    bursts.

    One keyed window computes lead-timestamps; the final row of each key
    has no holding interval and drops (standard LOCF convention).  Exact
    arithmetic: scaled-long value x interval-ms products summed as
    BIGINTs.  The products' SUM telescopes to value_max * key_span_ms
    (intervals sum to the span), so the int64 bound depends on the
    SPAN, not the row count: |v| * 10^digits * span_ms < 2^63 — at
    digits=4 that is ~30 years for values up to 1e6."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    scale = float(10**value_digits)
    stepped = df.select(
        F.col(key),
        F.round(F.col(value_col) * F.lit(scale)).cast("long").alias("__vs"),
        ((F.lead(us).over(w) - us) / F.lit(1000)).cast("long").alias("__dt_ms"),
    ).where(F.col("__dt_ms").isNotNull())
    agg = stepped.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__dt_ms").alias("__span_ms"),
        F.sum(F.col("__vs") * F.col("__dt_ms")).alias("__wsum"),
    )
    return agg.select(
        key,
        F.col("n_intervals").cast("long").alias("n_intervals"),
        F.col("__span_ms").cast("long").alias("span_ms"),
        F.round(
            F.col("__wsum").cast("double")
            / F.col("__span_ms").cast("double")
            / F.lit(scale),
            6,
        ).alias("twa"),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based batch sessionization: consecutive events of one key
    belong to the same session while the inter-event gap stays <= 
    ``gap_minutes``; a longer gap starts a new session.  The batch twin
    of the streaming session window (``streaming/events.py``), for
    backfills and offline attribution over the same event tables.

    Two stacked expressions over ONE keyed window (single shuffle on
    ``key``, parallel across keys): a lag-gap boundary flag, then a
    running sum of flags as the per-key session ordinal — the standard
    islands formulation, identically expressible in ANSI SQL, so the
    operator is exactly oracle-able.  ROWS framing over the
    deterministic ``(ts, tiebreak)`` order makes the running sum
    reproducible under any partitioning."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    boundary = F.when(us - F.lag(us).over(w) > gap_us, F.lit(1)).otherwise(
        F.lit(0)  # first row of a key: lag NULL -> comparison NULL -> 0
    )
    run = Window.partitionBy(key).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # two steps: a window expression can't nest inside another window's
    # aggregate; both windows share one (key, order) sort so Catalyst
    # plans a single exchange + sort for the pair
    return (
        df.withColumn("__new", boundary)
        .withColumn("session_seq", F.sum("__new").over(run).cast("long"))
        .drop("__new")
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: start/end, event
    count, and duration (ms).  The groupBy on (key, session_seq) adds
    NO second exchange: hash-partitioning on ``key`` already clusters
    every (key, session_seq) group, and Spark's distribution matching
    accepts a partitioning on a subset of the grouping keys
    (plan-verified: one Exchange total)."""
    s = sessionize(df, key, ts_col, order_tiebreak, gap_minutes)
    us = F.unix_micros(F.col(ts_col))
    return (
        s.groupBy(key, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            ((F.max(us) - F.min(us)) / F.lit(1000)).cast("long").alias("duration_ms"),
        )
    )


def ewma_trailing(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    alpha: float = 0.2,
    lookback: int = 50,
    out: str = "ewma",
    value_digits: int = 4,
) -> DataFrame:
    """Exponentially-weighted moving average over the trailing
    ``lookback`` observations of each key (pandas ``ewm(adjust=False)``
    recurrence, restarted at the frame head):

        acc = x_0;  acc = (1 - alpha) * acc + alpha * x_i

    Truncating to a bounded ROWS frame is what makes the operator
    scale-safe BY CONSTRUCTION: the closed-form alternative
    (``sum(x * (1-a)^(-i)) * (1-a)^t``) overflows doubles for long
    keys, and an unbounded fold would hold a whole key's history per
    row.  The truncation error is bounded by ``(1-alpha)^lookback``
    (~1e-5 at the defaults) — documented, not silent.

    Cross-engine determinism: values quantize to scaled BIGINTs first,
    the frame's ROWS order is the deterministic ``(ts, tiebreak)``, and
    the fold is the same left-to-right scalar IEEE sequence both
    engines run (DuckDB twin: ``list(...) OVER`` + ``list_reduce``) —
    so results are bit-identical, not approximately equal.  One shuffle
    on ``key``; frames never exceed ``lookback`` elements."""
    scale = float(10**value_digits)
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-(lookback - 1), 0)
    )
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    hist = F.collect_list(xs).over(w)  # frame order == window order
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(hist, 2, lookback),
        F.element_at(hist, 1).cast("double"),
        lambda acc, x: (F.lit(1.0) - a) * acc + a * x.cast("double"),
    )
    return df.withColumn(out, F.round(folded / F.lit(scale), 6))


def rolling_quantile(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    q: float = 0.5,
    lookback: int = 20,
    min_periods: int = 1,
    out: str = "rolling_q",
) -> DataFrame:
    """Exact interpolated quantile over the trailing ``lookback``
    observations of each key (current row included) — the robust
    sibling of :func:`rolling_anomaly_zscore`'s mean/std baseline, for
    median-smoothing and rolling-IQR outlier bands on noisy series.

    ``percentile`` runs as a windowed aggregate over the same bounded
    ROWS frame the rest of the trailing family uses: one shuffle on the
    key, frames never exceed ``lookback`` elements, and Spark's exact
    interpolated percentile matches DuckDB ``quantile_cont`` over the
    identical frame bit-for-bit (the ``robust_scale`` parity argument),
    so the operator oracles exactly.  Rows with fewer than
    ``min_periods`` trailing observations emit null."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-(lookback - 1), 0)
    )
    qv = F.percentile(F.col(value_col), F.lit(float(q))).over(w)
    n = F.count(F.col(value_col)).over(w)
    return df.withColumn(out, F.when(n >= min_periods, F.round(qv, 6)))


def holt_trailing(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    lookback: int = 50,
    out_level: str = "holt_level",
    out_forecast: str = "holt_forecast",
    value_digits: int = 4,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) over the
    trailing ``lookback`` observations — :func:`ewma_trailing`'s sibling
    for trending series, with a one-step-ahead forecast:

        l_0 = x_0, t_0 = 0
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + t_{i-1})
        t_i = beta*(l_i - l_{i-1}) + (1-beta)*t_{i-1}
        forecast = l_n + t_n

    Same scale/determinism contract as the EWMA: bounded ROWS frame
    (one shuffle on ``key``, frames never exceed ``lookback``), inputs
    quantized to scaled BIGINTs, and the fold carries a (level, trend)
    STRUCT accumulator through the identical left-to-right IEEE
    sequence in both engines — DuckDB's ``list_reduce`` is same-typed,
    so each element maps to a struct first and the reduce consumes the
    next element's level field; the new-level expression appears twice
    textually in the trend update (no let-binding in either lambda
    dialect), which is deterministic, just not elegant."""
    scale = float(10**value_digits)
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-(lookback - 1), 0)
    )
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    hist = F.collect_list(xs).over(w)
    a = F.lit(float(alpha))
    b = F.lit(float(beta))

    def step(acc, x):
        l0 = acc["l"]
        t0 = acc["t"]
        xd = x.cast("double")
        new_l = a * xd + (F.lit(1.0) - a) * (l0 + t0)
        new_l2 = a * xd + (F.lit(1.0) - a) * (l0 + t0)
        new_t = b * (new_l2 - l0) + (F.lit(1.0) - b) * t0
        return F.struct(new_l.alias("l"), new_t.alias("t"))

    folded = F.aggregate(
        F.slice(hist, 2, lookback),
        F.struct(
            F.element_at(hist, 1).cast("double").alias("l"),
            F.lit(0.0).alias("t"),
        ),
        step,
    )
    # tie-safe rounding (r09): round() splits between engines when the
    # double's shortest repr lands on a half (one sf0.1 forecast hit
    # ...0945 -> 66.867095 vs 66.867094); floor(x*1e6 + 0.5)/1e6 is the
    # same correctly-rounded IEEE chain on both engines
    lvl = folded["l"] / F.lit(scale)
    fc = (folded["l"] + folded["t"]) / F.lit(scale)
    return df.withColumns(
        {
            out_level: F.floor(lvl * 1000000.0 + 0.5) / 1000000.0,
            out_forecast: F.floor(fc * 1000000.0 + 0.5) / 1000000.0,
        }
    )


def cusum_two_sided(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    slack_k: float,
    threshold_h: float,
    value_digits: int = 4,
    target: float | None = None,
) -> DataFrame:
    """Tabular two-sided CUSUM mean-shift detector (Page 1954) per key,
    against a GLOBAL integer-quantized mean target (or an explicit
    pre-fit ``target`` — the streaming twin passes one, since a stream
    cannot see the global mean):

        S+_t = max(0, S+_{t-1} + (x_t - target - k))
        S-_t = max(0, S-_{t-1} + (target - k - x_t))

    and a point alarms when either side exceeds ``h``.

    The recurrence looks sequential, but the clamp-at-zero form has a
    closed prefix identity: with ``P_t = sum_{j<=t} d_j`` (and P_0 = 0),

        S_t = P_t - min(0, min_{j<=t} P_j)

    so both sides compute as a keyed running SUM followed by a keyed
    running MIN over that sum — two stacked window functions on the
    SAME (partition, order), which Spark plans as ONE exchange + one
    sort.  No recursion, no ``aggregate`` fold, no driver loop; at
    100 TB the cost is a single shuffle on ``key``.

    Determinism: values quantize to scaled BIGINTs; the target is the
    integer floor-division mean of the scaled values (exact in both
    engines for non-negative sums); all prefix arithmetic stays integer
    until the final descale.  The 1-row global target broadcasts — the
    only non-keyed stage, and it is O(1).
    """
    scale = 10**value_digits
    xs = F.round(F.col(value_col) * F.lit(float(scale))).cast("long")
    base = df.select(
        F.col(key), F.col(ts_col), F.col(order_tiebreak), xs.alias("xs")
    )
    if target is None:
        tgt = base.agg(
            F.expr("sum(xs) div count(xs)").cast("long").alias("target_s")
        )
    else:
        tgt = base.sparkSession.range(1).select(
            F.lit(int(round(target * scale))).cast("long").alias("target_s")
        )
    k_s = int(round(slack_k * scale))
    h_s = int(round(threshold_h * scale))
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = base.crossJoin(F.broadcast(tgt)).withColumns(
        {
            "d_hi": F.col("xs") - (F.col("target_s") + F.lit(k_s)),
            "d_lo": (F.col("target_s") - F.lit(k_s)) - F.col("xs"),
        }
    )
    p = d.withColumns(
        {"p_hi": F.sum("d_hi").over(w), "p_lo": F.sum("d_lo").over(w)}
    )
    s = p.withColumns(
        {
            "s_hi": F.col("p_hi") - F.least(F.min("p_hi").over(w), F.lit(0).cast("long")),
            "s_lo": F.col("p_lo") - F.least(F.min("p_lo").over(w), F.lit(0).cast("long")),
        }
    )
    return s.select(
        key,
        order_tiebreak,
        F.round(F.col("s_hi") / F.lit(float(scale)), 6).alias("cusum_hi"),
        F.round(F.col("s_lo") / F.lit(float(scale)), 6).alias("cusum_lo"),
        (
            (F.col("s_hi") > F.lit(h_s)) | (F.col("s_lo") > F.lit(h_s))
        ).cast("int").cast("long").alias("alarm"),
    )


def serial_autocorr(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lag: int = 1,
    value_digits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key SERIAL autocorrelation at ``lag`` — the ACF point a
    forecasting pipeline checks before reaching for ``ewma_trailing``
    vs ``holt_trailing`` (is there memory in the series at all?).

    Sample Pearson r over the (x_t, x_{t+lag}) pairs:

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Pairs come from ONE keyed lead() window (no self-join); sufficient
    statistics are exact scaled-BIGINT sums with the 30-bit square
    split (the ``operators/stats`` discipline), so partitioning cannot
    move a bit; the closing double arithmetic is textually mirrored in
    the SQL twin.  NULL when fewer than 2 pairs or either variance is
    0.  One shuffle on ``key``; output is key-sized.
    """
    from image_matadata_batchprocessing_aws_spark.operators.stats import TWO30

    scale = float(10**value_digits)
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    base = (
        df.select(F.col(key), F.col(ts_col), F.col(order_tiebreak), xs.alias("__x"))
        .withColumn("__y", F.lead("__x", lag).over(w))
        .where(F.col("__y").isNotNull())
    )
    agg = base.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.shiftright(F.col("__x") * F.col("__x"), 30)).alias("sxx_hi"),
        F.sum((F.col("__x") * F.col("__x")).bitwiseAND(F.lit(TWO30 - 1))).alias(
            "sxx_lo"
        ),
        F.sum(F.shiftright(F.col("__y") * F.col("__y"), 30)).alias("syy_hi"),
        F.sum((F.col("__y") * F.col("__y")).bitwiseAND(F.lit(TWO30 - 1))).alias(
            "syy_lo"
        ),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(scale)
    sy = F.col("sy").cast("double") / F.lit(scale)
    sxy = F.col("sxy").cast("double") / F.lit(scale * scale)
    sxx = (
        F.col("sxx_hi").cast("double") * F.lit(float(TWO30))
        + F.col("sxx_lo").cast("double")
    ) / F.lit(scale * scale)
    syy = (
        F.col("syy_hi").cast("double") * F.lit(float(TWO30))
        + F.col("syy_lo").cast("double")
    ) / F.lit(scale * scale)
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    r = F.when(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0),
        (nd * sxy - sx * sy) / F.sqrt(vx * vy),
    )
    return agg.select(
        key,
        F.col("n").cast("long").alias("n_pairs"),
        F.round(r, round_digits).alias("acf"),
    )


def serial_autocorr_sql(
    table: str,
    key: str,
    ts_expr: str,
    value_col: str,
    order_tiebreak: str,
    lag: int = 1,
    value_digits: int = 4,
    round_digits: int = 6,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`serial_autocorr` — same lead() pairing,
    integer sums, and closing arithmetic (NOT the built-in corr())."""
    scale = float(10**value_digits)
    return f"""
        WITH b AS (
          SELECT {key} AS k,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS x,
                 lead(CAST(round({value_col} * {scale}) AS BIGINT), {lag})
                   OVER (PARTITION BY {key}
                         ORDER BY {ts_expr}, {order_tiebreak}) AS y
          FROM {table} WHERE {where}),
        p AS (SELECT * FROM b WHERE y IS NOT NULL),
        a AS (
          SELECT k, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                 sum(x * x // 1073741824) AS sxx_hi,
                 sum(x * x % 1073741824) AS sxx_lo,
                 sum(y * y // 1073741824) AS syy_hi,
                 sum(y * y % 1073741824) AS syy_lo
          FROM p GROUP BY k),
        e AS (
          SELECT k, n, CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) / {scale} AS sxd,
                 CAST(sy AS DOUBLE) / {scale} AS syd,
                 CAST(sxy AS DOUBLE) / {scale * scale} AS sxyd,
                 (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                  + CAST(sxx_lo AS DOUBLE)) / {scale * scale} AS sxxd,
                 (CAST(syy_hi AS DOUBLE) * 1073741824.0
                  + CAST(syy_lo AS DOUBLE)) / {scale * scale} AS syyd
          FROM a)
        SELECT k AS {key},
               CAST(n AS BIGINT) AS n_pairs,
               round(CASE WHEN n >= 2
                          AND nd * sxxd - sxd * sxd > 0
                          AND nd * syyd - syd * syd > 0
                     THEN (nd * sxyd - sxd * syd)
                          / sqrt((nd * sxxd - sxd * sxd)
                                 * (nd * syyd - syd * syd)) END,
                     {round_digits}) AS acf
        FROM e
    """


def hampel_filter(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lookback: int = 15,
    min_periods: int = 5,
    k: float = 3.0,
    value_digits: int = 4,
) -> DataFrame:
    """HAMPEL outlier filter: flag points deviating more than
    ``k * 1.4826 * MAD`` from the trailing-window MEDIAN — the robust
    replacement for :func:`rolling_anomaly_zscore` when the baseline
    itself is spike-contaminated (a spike inflates mean AND std, so
    z-scores under-flag; median/MAD shrug it off).

    The window's median-of-deviations needs that window's OWN median
    applied to every member, which no stacked window can express — so
    the frame materializes as a bounded ``collect_list`` and the
    median/MAD come from SORTED-ARRAY element access in DOUBLED scaled
    integers (odd n -> 2*mid, even n -> lo+hi), keeping every
    comparison exact: the flag test ``2*dev2 > k*1.4826*mad4`` is a
    single double comparison of integer-derived values, identical in
    the DuckDB twin's list arithmetic.  Frames are lookback-bounded,
    one shuffle on the key.
    """
    scale = float(10**value_digits)
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-(lookback - 1), 0)
    )
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.withColumn("__x", xs)
    hist = F.sort_array(F.collect_list("__x").over(w))
    n = F.size(hist)

    def med2(arr, nn):
        odd = 2 * F.element_at(arr, ((nn + 1) / 2).cast("int"))
        even = F.element_at(arr, (nn / 2).cast("int")) + F.element_at(
            arr, (nn / 2 + 1).cast("int")
        )
        return F.when(nn % 2 == 1, odd).otherwise(even)

    withm = base.withColumns({"__hist": hist, "__n": n}).withColumn(
        "__med2", med2(F.col("__hist"), F.col("__n"))
    )
    devs = F.sort_array(
        F.transform(
            F.col("__hist"), lambda v: F.abs(2 * v - F.col("__med2"))
        )
    )
    withd = withm.withColumn("__mad4", med2(devs, F.col("__n")))
    dev2 = F.abs(2 * F.col("__x") - F.col("__med2"))
    flag = (
        (F.lit(2.0) * dev2.cast("double"))
        > (F.lit(float(k) * 1.4826) * F.col("__mad4").cast("double"))
    )
    return withd.select(
        key,
        order_tiebreak,
        F.round(F.col("__med2") / F.lit(2.0 * scale), 6).alias("rolling_med"),
        F.round(F.col("__mad4") / F.lit(4.0 * scale), 6).alias("rolling_mad"),
        F.when(F.col("__n") >= min_periods, flag.cast("int").cast("long")).alias(
            "is_outlier"
        ),
    )


def lateness_audit(
    df: DataFrame,
    key_col: str,
    ts_ms_col: str,
    arrival_col: str,
    group_col: str,
    late_threshold_ms: int,
    round_digits: int = 2,
) -> DataFrame:
    """Watermark-sizing audit for a stream replayed as a batch: per
    ``group_col``, how out-of-order do events actually arrive?  Lateness
    of an event = (max event-time seen EARLIER in arrival order, within
    its ``key_col`` partition) - its own event time, when positive.
    The report (event count, late count at the given threshold, max and
    mean lateness) is exactly the evidence that picks a
    ``withWatermark`` delay — too small drops data, too large bloats
    state.

    The running max is one keyed window in arrival order (the
    keyed-window discipline — no global ordering structure); everything
    after is a keyed aggregate on exact integer milliseconds.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(arrival_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(
        F.max(ts_ms_col).over(w) - F.col(ts_ms_col), F.lit(0)
    )
    marked = df.select(
        F.col(group_col).alias("group"),
        F.coalesce(late, F.lit(0)).alias("__late_ms"),
    )
    return marked.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("__late_ms") > late_threshold_ms, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_late"),
        F.max("__late_ms").cast("long").alias("max_late_ms"),
        F.round(
            F.sum("__late_ms").cast("double") / F.count(F.lit(1)).cast("double"),
            round_digits,
        ).alias("mean_late_ms"),
    )


def changepoint_binseg(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    value_digits: int = 4,
    min_seg: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Single-changepoint detection per series by binary segmentation
    (the first split of Scott & Knott / binseg): choose the split t
    minimizing SSE_left + SSE_right — the LOCATION of a mean shift,
    where `ts_cusum_shift` tests whether drift exists against the
    global mean.  One keyed cumulative window builds integer prefix
    sums of the quantized values and their squares; every candidate
    split's cost is then a closed-form double off those integers, and
    the argmin ranks (cost, t) — identical operand sequences both
    engines, deterministic tie-break on t.

    Scale shape: two keyed windows (prefix sums, then the argmin rank)
    and a final 1-row-per-series filter — no self-joins, no global
    structure; cost is O(n log-free) per series.

    Returns per series: ``n, split_pos, mean_left, mean_right,
    mean_shift, cost_drop_frac`` (series shorter than 2*min_seg are
    absent).
    """
    scale = float(10**value_digits)
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("__o").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("key")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(key_col).alias("key"), F.col(order_col).alias("__o"), xs.alias("__x"))
        .select(
            "key",
            F.row_number()
            .over(Window.partitionBy("key").orderBy(F.col("__o").asc()))
            .alias("__t"),
            F.sum("__x").over(w).alias("__cs"),
            F.sum(F.col("__x") * F.col("__x")).over(w).alias("__cq"),
            F.count(F.lit(1)).over(wn).alias("__n"),
            F.sum("__x").over(wn).alias("__S"),
            F.sum(F.col("__x") * F.col("__x")).over(wn).alias("__Q"),
        )
    )
    td = F.col("__t").cast("double")
    nd = F.col("__n").cast("double")
    cs = F.col("__cs").cast("double")
    cq = F.col("__cq").cast("double")
    S = F.col("__S").cast("double")
    Q = F.col("__Q").cast("double")
    cost = (cq - cs * cs / td) + ((Q - cq) - (S - cs) * (S - cs) / (nd - td))
    cand = base.where(
        (F.col("__t") >= min_seg) & (F.col("__t") <= F.col("__n") - min_seg)
    ).select("key", "__t", "__n", "__cs", "__S", "__Q", cost.alias("__cost"))
    wr = Window.partitionBy("key").orderBy(F.col("__cost").asc(), F.col("__t").asc())
    best = cand.withColumn("__rn", F.row_number().over(wr)).where(F.col("__rn") == 1)
    sst = Q - S * S / nd
    mean_l = cs / (td * F.lit(scale))
    mean_r = (S - cs) / ((nd - td) * F.lit(scale))

    # tie-safe rounding (r09): one sf0.1 mean_right landed on a
    # shortest-repr half and round() split between the engines;
    # floor(x*10^d + 0.5)/10^d runs the same IEEE chain on both
    def rd(c):
        p = float(10**round_digits)
        return F.floor(c * p + 0.5) / p

    return best.select(
        "key",
        F.col("__n").cast("long").alias("n"),
        F.col("__t").cast("long").alias("split_pos"),
        rd(mean_l).alias("mean_left"),
        rd(mean_r).alias("mean_right"),
        rd(mean_r - mean_l).alias("mean_shift"),
        rd(F.when(sst > 0, (sst - F.col("__cost")) / sst)).alias("cost_drop_frac"),
    )


def changepoint_binseg_sql(
    table: str,
    key_col: str,
    order_col: str,
    value_col: str,
    value_digits: int = 4,
    min_seg: int = 3,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`changepoint_binseg`."""
    scale = float(10**value_digits)
    rpow = float(10**round_digits)
    return f"""
        WITH base AS (
          SELECT {key_col} AS key,
                 row_number() OVER (PARTITION BY {key_col}
                                    ORDER BY {order_col} ASC) AS t,
                 sum(CAST(round({value_col} * {scale}) AS BIGINT))
                   OVER (PARTITION BY {key_col} ORDER BY {order_col} ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cs,
                 sum(CAST(round({value_col} * {scale}) AS BIGINT)
                     * CAST(round({value_col} * {scale}) AS BIGINT))
                   OVER (PARTITION BY {key_col} ORDER BY {order_col} ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cq,
                 count(*) OVER (PARTITION BY {key_col}) AS n,
                 sum(CAST(round({value_col} * {scale}) AS BIGINT))
                   OVER (PARTITION BY {key_col}) AS s,
                 sum(CAST(round({value_col} * {scale}) AS BIGINT)
                     * CAST(round({value_col} * {scale}) AS BIGINT))
                   OVER (PARTITION BY {key_col}) AS q
          FROM {table} WHERE {value_col} IS NOT NULL),
        cand AS (
          SELECT key, t, n, cs, s, q,
                 (CAST(cq AS DOUBLE)
                    - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                      / CAST(t AS DOUBLE))
                 + ((CAST(q AS DOUBLE) - CAST(cq AS DOUBLE))
                    - (CAST(s AS DOUBLE) - CAST(cs AS DOUBLE))
                      * (CAST(s AS DOUBLE) - CAST(cs AS DOUBLE))
                      / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))) AS cost
          FROM base
          WHERE t >= {min_seg} AND t <= n - {min_seg}),
        best AS (
          SELECT *, row_number() OVER (PARTITION BY key
                                       ORDER BY cost ASC, t ASC) AS rn
          FROM cand)
        SELECT key, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS split_pos,
               -- tie-safe rounding: see changepoint_binseg (r09)
               floor(CAST(cs AS DOUBLE) / (CAST(t AS DOUBLE) * {scale})
                     * {rpow} + 0.5) / {rpow} AS mean_left,
               floor((CAST(s AS DOUBLE) - CAST(cs AS DOUBLE))
                     / ((CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) * {scale})
                     * {rpow} + 0.5) / {rpow} AS mean_right,
               floor(((CAST(s AS DOUBLE) - CAST(cs AS DOUBLE))
                     / ((CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) * {scale})
                     - CAST(cs AS DOUBLE) / (CAST(t AS DOUBLE) * {scale}))
                     * {rpow} + 0.5) / {rpow} AS mean_shift,
               floor((CASE WHEN CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE) > 0 THEN
                 ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) - cost)
                 / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) END) * {rpow} + 0.5) / {rpow}
                 AS cost_drop_frac
        FROM best WHERE rn = 1
    """


def pacf_table(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    value_digits: int = 4,
    rho_digits: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """ACF lags 1..4 plus PACF via the unrolled Durbin-Levinson
    recursion — the AR-order diagnostic (PACF cutting off at lag p is
    the textbook "fit AR(p)" signal) that :func:`serial_autocorr`'s
    single lag point can't give.

    Each rho_k comes from one :func:`serial_autocorr` pass (integer
    sufficient statistics) quantized at ``rho_digits`` so the DL
    arithmetic starts from identical doubles on both engines; the
    recursion itself is four fixed algebraic steps with zero-division
    guards (NULL propagates).  Four keyed windows + four key-sized
    joins; nothing data-sized beyond the lead() passes.
    """
    parts = []
    for lag in range(1, 5):
        a = serial_autocorr(
            df, key, ts_col, value_col, order_tiebreak,
            lag=lag, value_digits=value_digits, round_digits=rho_digits,
        ).select(
            F.col(key),
            F.col("n_pairs").alias(f"__n{lag}"),
            F.col("acf").alias(f"__r{lag}"),
        )
        parts.append(a)
    j = parts[0]
    for p in parts[1:]:
        j = j.join(p, key)
    r1, r2, r3, r4 = (F.col(f"__r{i}") for i in range(1, 5))
    p11 = r1
    d2 = F.lit(1.0) - p11 * r1
    p22 = F.when(d2 != 0, (r2 - p11 * r1) / d2)
    p21 = p11 - p22 * p11
    d3 = F.lit(1.0) - (p21 * r1 + p22 * r2)
    p33 = F.when(d3 != 0, (r3 - (p21 * r2 + p22 * r1)) / d3)
    p31 = p21 - p33 * p22
    p32 = p22 - p33 * p21
    d4 = F.lit(1.0) - (p31 * r1 + p32 * r2 + p33 * r3)
    p44 = F.when(d4 != 0, (r4 - (p31 * r3 + p32 * r2 + p33 * r1)) / d4)
    return j.select(
        key,
        F.col("__n1").cast("long").alias("n_pairs_lag1"),
        F.round(r1, round_digits).alias("acf1"),
        F.round(r2, round_digits).alias("acf2"),
        F.round(r3, round_digits).alias("acf3"),
        F.round(r4, round_digits).alias("acf4"),
        F.round(p11, round_digits).alias("pacf1"),
        F.round(p22, round_digits).alias("pacf2"),
        F.round(p33, round_digits).alias("pacf3"),
        F.round(p44, round_digits).alias("pacf4"),
    )


def pacf_table_sql(
    table: str,
    key: str,
    ts_expr: str,
    value_col: str,
    order_tiebreak: str,
    value_digits: int = 4,
    rho_digits: int = 9,
    round_digits: int = 6,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`pacf_table` — the per-lag twins nest as
    subqueries, the DL epilogue mirrors the Column algebra textually."""
    lag_sqls = {
        lag: serial_autocorr_sql(
            table, key, ts_expr, value_col, order_tiebreak,
            lag=lag, value_digits=value_digits, round_digits=rho_digits,
            where=where,
        )
        for lag in range(1, 5)
    }
    ctes = ",\n".join(
        f"a{lag} AS (SELECT {key} AS k, n_pairs AS n{lag}, acf AS r{lag}"
        f" FROM ({sql}))"
        for lag, sql in lag_sqls.items()
    )
    # textual DL: CASE guards mirror the F.when() nulls
    p11 = "r1"
    d2 = f"(1.0 - {p11} * r1)"
    p22 = f"(CASE WHEN {d2} <> 0 THEN (r2 - {p11} * r1) / {d2} END)"
    return f"""
        WITH {ctes},
        j AS (SELECT a1.k, n1, r1, r2, r3, r4
              FROM a1 JOIN a2 USING (k) JOIN a3 USING (k) JOIN a4 USING (k)),
        s1 AS (SELECT *, {p11} AS p11, {p22} AS p22 FROM j),
        s2 AS (SELECT *, p11 - p22 * p11 AS p21 FROM s1),
        s3 AS (SELECT *,
                 CASE WHEN 1.0 - (p21 * r1 + p22 * r2) <> 0
                      THEN (r3 - (p21 * r2 + p22 * r1))
                           / (1.0 - (p21 * r1 + p22 * r2)) END AS p33
               FROM s2),
        s4 AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32
               FROM s3),
        s5 AS (SELECT *,
                 CASE WHEN 1.0 - (p31 * r1 + p32 * r2 + p33 * r3) <> 0
                      THEN (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
                           / (1.0 - (p31 * r1 + p32 * r2 + p33 * r3)) END
                   AS p44
               FROM s4)
        SELECT k AS {key},
               CAST(n1 AS BIGINT) AS n_pairs_lag1,
               round(r1, {round_digits}) AS acf1,
               round(r2, {round_digits}) AS acf2,
               round(r3, {round_digits}) AS acf3,
               round(r4, {round_digits}) AS acf4,
               round(p11, {round_digits}) AS pacf1,
               round(p22, {round_digits}) AS pacf2,
               round(p33, {round_digits}) AS pacf3,
               round(p44, {round_digits}) AS pacf4
        FROM s5
    """


def holt_backtest(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    lookback: int = 50,
    value_digits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Rolling-origin BACKTEST of :func:`holt_trailing`: at every
    observation, the model's one-step forecast is scored against the
    NEXT actual and against the naive carry-forward forecast (x_t), per
    key — MAE for both plus ``skill`` = 1 - mae_model/mae_naive, the
    number that decides whether the smoother earns its keep (skill <= 0
    means persistence wins; common on near-random-walk series).

    Determinism: actuals quantize to the same scaled grid the fold
    consumes; each |error| quantizes to a BIGINT at 1e-6 before the
    per-key sum, so MAE is partitioning-independent.  One extra lead()
    window over the forecast frame; everything stays keyed.
    """
    scale = float(10**value_digits)
    fc = holt_trailing(
        df.where(F.col(value_col).isNotNull()),
        key, ts_col, value_col, order_tiebreak,
        alpha=alpha, beta=beta, lookback=lookback,
    )
    xq = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    scored = fc.select(
        F.col(key),
        (xq.cast("double") / F.lit(scale)).alias("__x"),
        F.col("holt_forecast").alias("__f"),
        (F.lead(xq).over(w).cast("double") / F.lit(scale)).alias("__nx"),
    ).where(F.col("__nx").isNotNull())
    eq = F.round(F.abs(F.col("__f") - F.col("__nx")) * F.lit(1e6)).cast("long")
    nq = F.round(F.abs(F.col("__x") - F.col("__nx")) * F.lit(1e6)).cast("long")
    agg = scored.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.sum(eq).alias("__se"),
        F.sum(nq).alias("__sn"),
    )
    nd = F.col("n_forecasts").cast("double") * F.lit(1e6)
    return agg.select(
        key,
        F.col("n_forecasts").cast("long").alias("n_forecasts"),
        F.round(F.col("__se").cast("double") / nd, round_digits).alias("mae_holt"),
        F.round(F.col("__sn").cast("double") / nd, round_digits).alias("mae_naive"),
        F.round(
            F.when(
                F.col("__sn") > 0,
                F.lit(1.0)
                - F.col("__se").cast("double") / F.col("__sn").cast("double"),
            ),
            round_digits,
        ).alias("skill"),
    )


def stl_decompose_scaled(
    df: DataFrame,
    key: str,
    order_col: str,
    value_micro: str,
    phase_col: str,
    window: int = 25,
) -> DataFrame:
    """Additive seasonal-trend decomposition (the moving-average STL
    core) in ALL-INTEGER arithmetic: trend = centered ``window``-row
    moving average (floor division; NULL until the window is full),
    seasonal = per-(key, phase) floor-mean of the detrended values,
    residual = detrended - seasonal.  Values arrive micro-scaled BIGINT
    (``value_micro``) and every intermediate stays BIGINT, so the
    decomposition is bit-reproducible across engines and partitionings —
    the same quantize-then-integer-fold contract as the scalers.

    ``window`` must be odd (a centered row window needs a middle row).
    Windows are ROW-based over observed points: gaps in ``order_col``
    are the caller's business (compose with ``resample_daily`` /
    gap-fill first when calendar alignment matters).  One keyed window
    + one phase aggregate join — no keyless ordering anywhere."""
    if window % 2 == 0:
        raise ValueError("window must be odd")
    half = window // 2
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(-half, half)
    )
    trended = df.select(
        key,
        order_col,
        phase_col,
        F.col(value_micro).alias("__v"),
        F.when(
            F.count(F.lit(1)).over(w) == window,
            F.floor(F.sum(value_micro).over(w) / window).cast("long"),
        ).alias("__trend"),
    ).withColumn("__detr", F.col("__v") - F.col("__trend"))
    seasonal = (
        trended.where(F.col("__trend").isNotNull())
        .groupBy(key, phase_col)
        .agg(
            F.floor(F.sum("__detr") / F.count(F.lit(1)))
            .cast("long")
            .alias("__seasonal")
        )
    )
    return (
        trended.join(seasonal, [key, phase_col], "left")
        .select(
            key,
            order_col,
            phase_col,
            F.col("__v").alias("value_micro"),
            F.col("__trend").alias("trend_micro"),
            F.when(F.col("__trend").isNotNull(), F.col("__seasonal")).alias(
                "seasonal_micro"
            ),
            F.when(
                F.col("__trend").isNotNull(),
                F.col("__detr") - F.col("__seasonal"),
            ).alias("residual_micro"),
        )
    )
