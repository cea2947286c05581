"""Unit tests for the statistics / time-series operators on literal
frames: OLS against numpy, winsorize bounds, gap-filled resampling,
planted anomaly spikes, and planted distribution drift."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.stats import (
    grouped_regression,
    histogram_drift,
    winsorize,
)
from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
    resample_daily,
    rolling_anomaly_zscore,
)


def test_grouped_regression_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (slope, icept) in (("a", (2.5, 1.0)), ("b", (-1.25, 4.0))):
        x = rng.uniform(0, 50, 200)
        y = slope * x + icept + rng.normal(0, 0.5, 200)
        rows += [(g, round(float(xi), 2), round(float(yi), 2)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_regression(df, ["g"], "x", "y").collect()}
    for g in ("a", "b"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        m, b = np.polyfit(xs, ys, 1)
        assert abs(got[g].slope - m) < 1e-3
        assert abs(got[g].intercept - b) < 1e-3
        assert 0.9 < got[g].r2 <= 1.0


def test_winsorize_clips_to_percentiles(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(101)], "id long, x double")
    out = winsorize(df, ["x"], lower=0.05, upper=0.95, suffix="_w").collect()
    vals = sorted(r.x_w for r in out)
    assert vals[0] == 5.0 and vals[-1] == 95.0  # exact interpolated P05/P95
    assert sum(1 for r in out if r.x_w != r.x) == 10  # 5 clipped each tail


def test_winsorize_preserves_nulls(spark):
    # ADVICE r3: greatest(NULL, lo) = lo in Spark would silently impute
    # missing values to the lower bound — nulls must stay null
    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r.id: r.x_w for r in winsorize(df, ["x"], suffix="_w").collect()}
    assert out[100] is None
    assert out[50] == 50.0


def test_mad_scale_zero_spread_degrades_to_centering(spark):
    # ADVICE r3: MAD = 0 (majority value) must not emit NaN/Infinity;
    # like sklearn RobustScaler the scale degrades to 1 (pure centering)
    from image_matadata_batchprocessing_aws_spark.operators.scale import mad_scale

    rows = [(i, 7.0) for i in range(8)] + [(8, 9.0), (9, 5.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r.id: r.x_m for r in mad_scale(df, ["x"], suffix="_m").collect()}
    assert out[0] == 0.0  # (7 - median 7) / 1
    assert out[8] == 2.0 and out[9] == -2.0
    assert all(v == v and abs(v) != float("inf") for v in out.values())


def test_grouped_regression_constant_x_yields_null(spark):
    # zero x-variance: slope/r2 undefined -> NULL, not Infinity/NaN
    rows = [("g", 1.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    (row,) = grouped_regression(df, ["k"], "x", "y").collect()
    assert row.slope is None and row.r2 is None and row.intercept is None


def test_resample_daily_fills_gaps(spark):
    day = 86400
    rows = [(1, 0 * day, 10.0), (1, 1 * day, 5.0), (1, 4 * day, 2.0)]
    df = spark.createDataFrame(rows, "k long, sec long, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )
    out = {r.day: r for r in resample_daily(df, "k", "ts", "v").collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]  # full grid, gaps included
    assert out[2].n_events == 0 and out[2].day_sum == 0.0
    assert out[2].last_active_day == 1  # state metric forward-fills
    assert out[4].last_active_day == 4


def test_rolling_anomaly_flags_planted_spike(spark):
    rows = [(1, i, i, 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows[25] = (1, 25, 25, 500.0)  # the spike
    df = spark.createDataFrame(rows, "k long, sec long, id long, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "id", "v"
    )
    out = {r.id: r for r in rolling_anomaly_zscore(df, "k", "ts", "v", "id").collect()}
    assert out[25].is_anomaly
    assert out[5].z is None  # not enough history yet
    flagged = [i for i, r in out.items() if r.is_anomaly]
    assert flagged == [25]  # steady rows never flag


def test_histogram_drift_detects_planted_shift(spark):
    rng = np.random.default_rng(3)
    ref = spark.createDataFrame(
        [(float(v), "x") for v in rng.normal(0, 1, 2000)], "value double, cat string"
    )
    same = spark.createDataFrame(
        [(float(v), "x") for v in rng.normal(0, 1, 2000)], "value double, cat string"
    )
    shifted = spark.createDataFrame(
        [(float(v), "y" if i % 2 else "x") for i, v in enumerate(rng.normal(2, 1, 2000))],
        "value double, cat string",
    )
    low = {r.feature: r.tv for r in histogram_drift(ref, same, ["value"], ["cat"]).collect()}
    high = {r.feature: r.tv for r in histogram_drift(ref, shifted, ["value"], ["cat"]).collect()}
    assert low["value"] < 0.1 and low["cat"] == 0.0
    assert high["value"] > 0.5  # a 2-sigma mean shift moves most mass
    assert abs(high["cat"] - 0.5) < 0.01  # half the rows switched category


def test_histogram_drift_invariants(spark):
    """TV bounds: identical windows give exactly 0; completely disjoint
    categories give exactly 1; anything in between stays in [0, 1]."""
    a = spark.createDataFrame([(float(i % 7), "x") for i in range(500)], "v double, c string")
    b = spark.createDataFrame([(float(i % 7), "y") for i in range(300)], "v double, c string")
    same = {r.feature: r.tv for r in histogram_drift(a, a, ["v"], ["c"]).collect()}
    assert same["v"] == 0.0 and same["c"] == 0.0
    disjoint = {r.feature: r.tv for r in histogram_drift(a, b, [], ["c"]).collect()}
    assert disjoint["c"] == 1.0  # no category overlap
    partial = {r.feature: r.tv for r in histogram_drift(a, b, ["v"], []).collect()}
    assert 0.0 <= partial["v"] <= 1.0


def test_time_weighted_avg_exact_on_crafted_steps(spark):
    """Hand-computable LOCF integral: value 10 for 2s, 20 for 1s, last
    observation carries no interval -> twa = (10*2 + 20*1)/3."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        time_weighted_avg,
    )
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(1, 0, 0, 10.0), (1, 2, 1, 20.0), (1, 3, 2, 99.0)],
        "k long, sec long, id long, v double",
    ).select("k", F2.timestamp_seconds("sec").alias("ts"), "id", "v")
    r = time_weighted_avg(df, "k", "ts", "v", "id").collect()[0]
    assert (r.n_intervals, r.span_ms) == (2, 3000)
    assert r.twa == round((10 * 2 + 20 * 1) / 3, 6)  # operator rounds to 6


def test_grouped_spearman_matches_scipy_formula(spark):
    """Spearman via doubled-integer ranks == numpy reference (Pearson on
    average-tie ranks), including ties."""
    import numpy as np

    rng = np.random.default_rng(5)
    x = rng.integers(0, 20, 300).astype(float)  # plenty of ties
    y = 2.0 * x + rng.normal(0, 5, 300)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)], "g string, x double, y double"
    )
    from image_matadata_batchprocessing_aws_spark.operators.stats import grouped_spearman

    got = grouped_spearman(df, ["g"], "x", "y").collect()[0].spearman

    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = avg_ranks(x), avg_ranks(y)
    expect = np.corrcoef(rx, ry)[0, 1]
    assert got == round(float(expect), 6)  # operator rounds to 6


# --- sessionize / session_stats ------------------------------------------


def _session_events(spark):
    """Two users; user A has three sessions separated by >30 min gaps,
    user B one session.  Timestamps in minutes from epoch."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    # user A: events at 0,5,10 | 60,62 | 200  (gaps 50 and 138 min)
    for i, m in enumerate([0, 5, 10, 60, 62, 200]):
        rows.append((1, i, t0 + timedelta(minutes=m), float(m)))
    # user B: 0, 29, 58 — gaps exactly 29 min, one session
    for i, m in enumerate([0, 29, 58]):
        rows.append((2, 10 + i, t0 + timedelta(minutes=m), float(m)))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_sessionize_gap_islands(spark):
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        session_stats,
        sessionize,
    )

    df = _session_events(spark)
    out = sessionize(df, "user_id", "ts", "event_id", gap_minutes=30)
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in out.collect()
    }
    assert [got[(1, i)] for i in range(6)] == [0, 0, 0, 1, 1, 2]
    assert [got[(2, 10 + i)] for i in range(3)] == [0, 0, 0]  # 30-min gap inclusive

    st = {
        (r.user_id, r.session_seq): r
        for r in session_stats(df, "user_id", "ts", "event_id", gap_minutes=30).collect()
    }
    assert st[(1, 0)].n_events == 3 and st[(1, 0)].duration_ms == 10 * 60_000
    assert st[(1, 1)].n_events == 2 and st[(1, 1)].duration_ms == 2 * 60_000
    assert st[(1, 2)].n_events == 1 and st[(1, 2)].duration_ms == 0
    assert st[(2, 0)].n_events == 3


def test_sessionize_matches_duckdb_islands_sql(spark):
    # prototype of the r05 oracle: identical islands formulation in DuckDB
    import duckdb

    from image_matadata_batchprocessing_aws_spark.operators.timeseries import sessionize

    df = _session_events(spark)
    out = sessionize(df, "user_id", "ts", "event_id", gap_minutes=30)
    got = sorted(
        (r.user_id, r.event_id, r.session_seq) for r in out.collect()
    )
    pdf = df.toPandas()
    want = duckdb.sql(
        """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM pdf)
        SELECT user_id, event_id,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
        """
    ).fetchall()
    assert got == sorted((int(u), int(e), int(s)) for u, e, s in want)


# --- trailing EWMA -------------------------------------------------------


def test_ewma_trailing_matches_python_fold(spark):
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import ewma_trailing

    rng = np.random.default_rng(3)
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    series = {}
    for k in (1, 2):
        xs = [round(float(v), 4) for v in rng.uniform(-100, 100, 120)]
        series[k] = xs
        rows += [(k, i, t0 + timedelta(seconds=i), xs[i]) for i in range(len(xs))]
    df = spark.createDataFrame(rows, "k long, i long, ts timestamp, x double")
    alpha, lookback = 0.2, 50
    out = ewma_trailing(df, "k", "ts", "x", "i", alpha=alpha, lookback=lookback)
    got = {(r.k, r.i): r.ewma for r in out.collect()}
    for k, xs in series.items():
        scaled = [round(x * 10_000) for x in xs]
        for t in range(len(xs)):
            frame = scaled[max(0, t - lookback + 1) : t + 1]
            acc = float(frame[0])
            for v in frame[1:]:
                acc = (1.0 - alpha) * acc + alpha * float(v)
            assert got[(k, t)] == round(acc / 10_000, 6), (k, t)


def test_ewma_trailing_truncation_is_negligible(spark):
    # the bounded frame tracks the unbounded recurrence within (1-a)^L
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import ewma_trailing
    from datetime import datetime, timedelta

    rng = np.random.default_rng(4)
    t0 = datetime(2024, 1, 1)
    xs = [round(float(v), 4) for v in rng.uniform(0, 10, 300)]
    rows = [(1, i, t0 + timedelta(seconds=i), xs[i]) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, i long, ts timestamp, x double")
    out = ewma_trailing(df, "k", "ts", "x", "i", alpha=0.2, lookback=50)
    got = {r.i: r.ewma for r in out.collect()}
    acc = xs[0]
    for i in range(1, 300):
        acc = 0.8 * acc + 0.2 * xs[i]
        if i >= 49:
            assert abs(got[i] - acc) < 10 * (0.8 ** 50) * 10  # scaled bound


def test_rolling_quantile_matches_pandas(spark):
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.operators.timeseries import rolling_quantile
    from datetime import datetime, timedelta

    rng = np.random.default_rng(6)
    t0 = datetime(2024, 1, 1)
    series = {}
    rows = []
    for k in (1, 2):
        xs = [round(float(v), 3) for v in rng.uniform(-20, 20, 90)]
        series[k] = xs
        rows += [(k, i, t0 + timedelta(seconds=i), xs[i]) for i in range(90)]
    df = spark.createDataFrame(rows, "k long, i long, ts timestamp, x double")
    out = rolling_quantile(df, "k", "ts", "x", "i", q=0.5, lookback=15, min_periods=5)
    got = {(r.k, r.i): r.rolling_q for r in out.collect()}
    for k, xs in series.items():
        want = pd.Series(xs).rolling(15, min_periods=5).median()
        for i in range(90):
            w = want.iloc[i]
            g = got[(k, i)]
            if pd.isna(w):
                assert g is None
            else:
                assert abs(g - round(w, 6)) < 1e-9, (k, i)


# --- Kaplan-Meier survival --------------------------------------------


def test_kaplan_meier_textbook_values(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import kaplan_meier

    rows = [(1, 6, 1), (2, 6, 1), (3, 6, 0), (4, 7, 1), (5, 10, 0)]
    df = spark.createDataFrame(rows, "id long, dur long, evt int")
    got = {r.t: r for r in kaplan_meier(df, "dur", "evt").collect()}
    assert sorted(got) == [6, 7]  # censored-only times emit no row
    assert (got[6].n_risk, got[6].n_events, got[6].n_censored) == (5, 2, 1)
    assert abs(got[6].survival - 0.6) < 1e-9
    assert (got[7].n_risk, got[7].n_events) == (2, 1)
    assert abs(got[7].survival - 0.3) < 1e-9


def test_kaplan_meier_matches_python_reference(spark):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.stats import kaplan_meier

    rng = np.random.default_rng(13)
    durs = rng.integers(1, 40, 300)
    evts = (rng.uniform(size=300) < 0.7).astype(int)
    df = spark.createDataFrame(
        [(i, int(d), int(e)) for i, (d, e) in enumerate(zip(durs, evts))],
        "id long, dur long, evt int",
    )
    got = {r.t: r.survival for r in kaplan_meier(df, "dur", "evt").collect()}

    s = 1.0
    expect = {}
    for t in sorted(set(durs)):
        n = int((durs >= t).sum())
        d = int(((durs == t) & (evts == 1)).sum())
        if n > 0:
            s *= (n - d) / n
        if d > 0:
            expect[t] = s
    assert set(got) == set(expect)
    for t in expect:
        assert abs(got[t] - expect[t]) < 1e-6, t


def test_kaplan_meier_grouped_cohorts(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import kaplan_meier

    rows = (
        [("a", i, 6, 1) for i in range(2)] + [("a", 2, 6, 0), ("a", 3, 7, 1)]
        + [("b", 4, 3, 1), ("b", 5, 9, 0)]
    )
    df = spark.createDataFrame(rows, "g string, id long, dur long, evt int")
    got = {(r.g, r.t): r for r in kaplan_meier(df, "dur", "evt", ["g"]).collect()}
    # cohort a: same curve as the ungrouped textbook fragment
    assert abs(got[("a", 6)].survival - 0.5) < 1e-9  # 1 - 2/4
    assert got[("a", 6)].n_risk == 4
    assert abs(got[("a", 7)].survival - 0.0) < 1e-9  # risk set dies
    # cohort b independent: t=3 with n=2 -> 0.5
    assert got[("b", 3)].n_risk == 2 and abs(got[("b", 3)].survival - 0.5) < 1e-9


def test_dp_noisy_counts_properties(spark):
    """Noise is deterministic, Laplace-shaped (zero-heavy symmetric),
    and noisy_count = true_count + noise."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import dp_noisy_counts

    df = spark.createDataFrame(
        [(f"g{i % 40}", i) for i in range(400)], "g string, x int"
    )
    a = dp_noisy_counts(df, ["g"], epsilon=1.0).collect()
    b = dp_noisy_counts(df, ["g"], epsilon=1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    for r in a:
        assert r.true_count == 10
        assert abs(r.noisy_count - (r.true_count + r.noise)) < 1e-9
    noises = [r.noise for r in a]
    assert any(n < 0 for n in noises) and any(n > 0 for n in noises)
    assert max(abs(n) for n in noises) < 60  # ln(1e-12) bound at eps=1
    # a different salt moves the noise
    c = dp_noisy_counts(df, ["g"], epsilon=1.0, salt="other").collect()
    assert sorted(r.noise for r in c) != sorted(noises)


def test_mann_whitney_u_ties_and_empty_side(spark):
    import math

    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [
            # cell x: A=[1,2,3] B=[2,3,4] -> U_A=2, tie term 12
            ("x", "A", 1.0), ("x", "A", 2.0), ("x", "A", 3.0),
            ("x", "B", 2.0), ("x", "B", 3.0), ("x", "B", 4.0),
            # cell y: every row is treatment -> sigma 0 -> z NULL
            ("y", "A", 1.0), ("y", "A", 2.0),
        ],
        "cell string, side string, value double",
    )
    out = {
        r.cell: r
        for r in mann_whitney_u(df, ["cell"], F.col("side") == "A", "value").collect()
    }
    x = out["x"]
    assert (x.n_treat, x.n_ctrl, x.u_treat) == (3, 3, 2.0)
    # sigma^2 = (9/12) * (7 - 12/(6*5)) = 4.95
    assert x.z == round((2.0 - 4.5) / math.sqrt(4.95), 6)
    y = out["y"]
    assert (y.n_treat, y.n_ctrl, y.z) == (2, 0, None)


def test_holt_trailing_matches_python_recurrence(spark):
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import holt_trailing

    vals = [10.0, 20.0, 30.0, 40.0, 35.0]
    df = spark.createDataFrame(
        [("u", i, i, v) for i, v in enumerate(vals)],
        "k string, ts long, eid long, value double",
    )
    out = {
        r.eid: (r.holt_level, r.holt_forecast)
        for r in holt_trailing(
            df, "k", "ts", "value", "eid", alpha=0.3, beta=0.1, lookback=50
        ).collect()
    }

    def ref(xs):
        l, t = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.3 * x + 0.7 * (l + t)
            nt = 0.1 * (nl - l) + 0.9 * t
            l, t = nl, nt
        return round(l, 6), round(l + t, 6)

    for i in range(len(vals)):
        assert out[i] == ref(vals[: i + 1]), i


def test_cusum_prefix_identity_matches_naive_recurrence(spark):
    """The windowed prefix form S_t = P_t - min(0, running_min(P)) must
    equal the textbook clamp recurrence S_t = max(0, S_{t-1} + d_t),
    alarms included — checked per point against driver-Python."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        cusum_two_sided,
    )

    vals = [5.0, 5.0, 9.0, 9.5, 9.0, 1.0, 1.5, 5.0, 0.5, 0.5]
    df = spark.createDataFrame(
        [("u", i, i, v) for i, v in enumerate(vals)]
        + [("w", i, 100 + i, 10.0 - v) for i, v in enumerate(vals)],
        "k string, ts long, eid long, value double",
    )
    out = {
        r.eid: (r.cusum_hi, r.cusum_lo, r.alarm)
        for r in cusum_two_sided(
            df, "k", "ts", "value", "eid", slack_k=0.5, threshold_h=3.0
        ).collect()
    }

    xs = [round(v * 10000) for v in vals] + [round((10.0 - v) * 10000) for v in vals]
    target = sum(xs) // len(xs)
    k_s, h_s = 5000, 30000
    for series, base in ((vals, 0), ([10.0 - v for v in vals], 100)):
        s_hi = s_lo = 0
        for i, v in enumerate(series):
            x = round(v * 10000)
            s_hi = max(0, s_hi + (x - (target + k_s)))
            s_lo = max(0, s_lo + ((target - k_s) - x))
            want = (
                round(s_hi / 10000.0, 6),
                round(s_lo / 10000.0, 6),
                1 if (s_hi > h_s or s_lo > h_s) else 0,
            )
            assert out[base + i] == want, (base + i, out[base + i], want)


def test_ks_two_sample_matches_naive_ecdf_sup(spark):
    """D must equal the brute-force sup over the union grid of
    |F_a - F_b|, ties included (driver-Python reference)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import ks_two_sample

    a = [1.0, 2.0, 2.0, 3.0, 7.0]
    b = [2.0, 4.0, 4.0, 5.0]
    c = [0.5, 6.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", v) for v in c]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: (r.n_a, r.n_b, r.ks_d) for r in ks_two_sample(df, "g", "v").collect()}

    samples = {"a": a, "b": b, "c": c}
    everything = a + b + c
    for g, xs in samples.items():
        rest = [v for k, vs in samples.items() if k != g for v in vs]
        grid = sorted(set(everything))
        d = max(
            abs(
                sum(1 for x in xs if x <= t) / len(xs)
                - sum(1 for x in rest if x <= t) / len(rest)
            )
            for t in grid
        )
        assert got[g] == (len(xs), len(rest), round(d, 6)), g


def test_welch_t_test_matches_hand_computation(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import welch_t_test
    from pyspark.sql import functions as F

    a = [10.0, 12.0, 11.0, 13.0]     # treat
    b = [20.0, 25.0, 30.0]           # ctrl
    rows = [("g", 1, v) for v in a] + [("g", 0, v) for v in b]
    # plus a degenerate group: one-sided only -> t/dof NULL
    rows += [("h", 1, 5.0), ("h", 1, 6.0)]
    df = spark.createDataFrame(rows, "g string, is_t int, v double")
    out = {
        r.g: r
        for r in welch_t_test(
            df, ["g"], F.col("is_t") == 1, "v"
        ).collect()
    }

    def ref(xs, ys):
        import math

        n1, n2 = len(xs), len(ys)
        m1, m2 = sum(xs) / n1, sum(ys) / n2
        v1 = (sum(x * x for x in xs) - sum(xs) ** 2 / n1) / (n1 - 1)
        v2 = (sum(y * y for y in ys) - sum(ys) ** 2 / n2) / (n2 - 1)
        se2 = v1 / n1 + v2 / n2
        t = (m1 - m2) / math.sqrt(se2)
        dof = se2 * se2 / (
            (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
        )
        return round(t, 6), round(dof, 6)

    tt, dd = ref(a, b)
    g = out["g"]
    assert (g.n_treat, g.n_ctrl) == (4, 3)
    assert (g.mean_treat, g.mean_ctrl) == (11.5, 25.0)
    assert abs(g.t - tt) < 1e-9 and abs(g.dof - dd) < 1e-9
    h = out["h"]
    assert (h.n_treat, h.n_ctrl) == (2, 0)
    assert h.t is None and h.dof is None and h.mean_ctrl is None


def test_anova_oneway_matches_hand_computation(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import anova_oneway

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0, 8.0], "c": [10.0, 12.0]}
    df = spark.createDataFrame(
        [(g, v) for g, vs in groups.items() for v in vs], "g string, v double"
    )
    row = anova_oneway(df, "g", "v").collect()[0]

    xs = [v for vs in groups.values() for v in vs]
    n, k = len(xs), len(groups)
    grand = sum(xs) ** 2 / n
    sst = sum(x * x for x in xs) - grand
    ssb = sum(sum(vs) ** 2 / len(vs) for vs in groups.values()) - grand
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.k, row.n) == (k, n)
    assert abs(row.ss_between - ssb) < 1e-6
    assert abs(row.ss_within - ssw) < 1e-6
    assert abs(row.f_stat - f) < 1e-5
    assert abs(row.eta_sq - ssb / sst) < 1e-5


def test_hampel_flags_spike_but_not_step(spark):
    """A lone spike flags; a genuine level step does NOT keep flagging
    once the window's median catches up — the behavior that separates
    Hampel from plain threshold rules."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        hampel_filter,
    )

    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 100.0, 10.1, 9.9, 10.0,
            20.0, 20.1, 19.9, 20.0, 20.2, 20.1, 19.8, 20.0]
    df = spark.createDataFrame(
        [("u", i, i, v) for i, v in enumerate(vals)],
        "k string, ts long, eid long, value double",
    )
    out = {r.eid: r.is_outlier for r in hampel_filter(
        df, "k", "ts", "value", "eid", lookback=7, min_periods=4
    ).collect()}
    assert out[6] == 1              # the spike
    assert out[4] == 0 and out[8] == 0
    # the step's tail is calm again once the window re-centers
    assert out[16] == 0 and out[17] == 0


def test_theil_sen_shrugs_off_contamination_where_ols_breaks(spark):
    """30% wild outliers: OLS slope is dragged far from truth, the
    Theil-Sen median stays on the clean trend — the estimator's whole
    reason to exist."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        grouped_regression,
        theil_sen_bounded,
    )

    rows = []
    for i in range(20):
        y = 2.0 * i + 5.0  # clean slope 2/x-unit
        if i % 7 == 3:     # wild contamination
            y += 500.0
        rows.append(("g", i, i * 3600000, y))  # x in ms, 1h apart
    df = spark.createDataFrame(rows, "g string, eid long, ts_ms long, v double")

    ts = theil_sen_bounded(df, "g", "ts_ms", "v", "eid", sample_m=20).collect()[0]
    # slope 2 per hour = 48 per day
    assert abs(ts.slope_per_day - 48.0) < 1.0

    ols = grouped_regression(
        df.withColumn("x_h", (df.ts_ms / 3600000).cast("double")), ["g"], "x_h", "v"
    ).collect()[0]
    assert abs(ols.slope - 2.0) > 1.0  # OLS got dragged


def test_kruskal_wallis_matches_hand_computation(spark):
    """Two groups, no ties: A={1,2,3} B={4,5,6} -> R_A=6, R_B=15,
    H = 12/(6*7) * (36/3 + 225/3) - 3*7 = 27/7."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)],
        "g string, v long",
    )
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.k == 2 and r.n == 6
    assert r.h_stat == round(27 / 7, 6)
    assert r.h_tie_corrected == r.h_stat  # no ties -> correction is 1


def test_kruskal_wallis_all_tied_is_null(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame([("a", 7), ("b", 7), ("a", 7)], "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.h_stat is None and r.h_tie_corrected is None


def test_trimmed_mean_drops_tails(spark):
    """Values 1..10 with trim 0.1 drop rank 1 and rank 10: trimmed
    mean = mean(2..9) = 5.5, untrimmed pulled up by a planted 1000."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import trimmed_mean

    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = trimmed_mean(df, "grp", "v", trim_frac=0.1).collect()[0]
    assert r.n == 10 and r.n_trim_each == 1
    assert r.trimmed_mean == 5.5  # mean of 2..9
    assert r.mean == 104.5


def test_kendall_tau_perfect_and_reversed(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import kendall_tau_bounded

    rows = [("m", i, float(i), float(i * i)) for i in range(1, 6)]
    rows += [("r", i, float(i), float(-i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, k long, x double, y double")
    out = {r.group: r for r in kendall_tau_bounded(df, "g", "x", "y", "k").collect()}
    assert out["m"].n_pairs == 10 and out["m"].n_concordant == 10
    assert out["m"].tau_b == 1.0
    assert out["r"].tau_b == -1.0


def test_kendall_tau_all_tied_margin_is_null(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import kendall_tau_bounded

    df = spark.createDataFrame(
        [("g", i, float(i), 7.0) for i in range(5)],
        "g string, k long, x double, y double",
    )
    assert kendall_tau_bounded(df, "g", "x", "y", "k").collect()[0].tau_b is None


def test_shannon_entropy_uniform_and_degenerate(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import shannon_entropy

    rows = [("u", c) for c in "abcd" * 3] + [("one", "z")] * 5
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.group: r for r in shannon_entropy(df, "g", "c").collect()}
    assert out["u"].k == 4 and out["u"].entropy_bits == 2.0
    assert out["u"].evenness == 1.0
    assert out["one"].entropy_bits == 0.0 and out["one"].evenness is None


def test_gini_known_values(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import gini_coefficient

    rows = [("eq", 5.0)] * 4 + [("uneq", 0.0), ("uneq", 0.0), ("uneq", 0.0), ("uneq", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.group: r for r in gini_coefficient(df, "g", "v").collect()}
    assert out["eq"].gini == 0.0
    # one holder of everything among n=4: G = (2*4*x/(4x)) - 5/4 = 0.75
    assert out["uneq"].gini == 0.75


def test_gini_null_when_sum_zero(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import gini_coefficient

    df = spark.createDataFrame([("g", 0.0), ("g", 0.0)], "g string, v double")
    assert gini_coefficient(df, "g", "v").collect()[0].gini is None


def test_lateness_audit_flags_out_of_order_arrival(spark):
    """Arrival order 1,2,3 with event times 100, 40, 90 (minutes): the
    2nd event is 60 min late, the 3rd 10 min — at a 30-min threshold
    only one is late."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        lateness_audit,
    )

    m = 60_000
    rows = [(1, 1, "x", 100 * m), (1, 2, "x", 40 * m), (1, 3, "x", 90 * m)]
    df = spark.createDataFrame(rows, "u long, arr long, g string, ts_ms long")
    r = lateness_audit(df, "u", "ts_ms", "arr", "g", 30 * m).collect()[0]
    assert r.n_events == 3 and r.n_late == 1
    assert r.max_late_ms == 60 * m
    assert r.mean_late_ms == round((0 + 60 * m + 10 * m) / 3, 2)


def test_changepoint_finds_planted_shift(spark):
    """Series 10x0.0 then 10x5.0: the SSE-argmin split lands exactly at
    position 10 with full cost reduction."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        changepoint_binseg,
    )

    rows = [("s", i, 0.0 if i <= 10 else 5.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    r = changepoint_binseg(df, "k", "o", "v").collect()[0]
    assert r.split_pos == 10
    assert r.mean_left == 0.0 and r.mean_right == 5.0 and r.mean_shift == 5.0
    assert r.cost_drop_frac == 1.0  # both segments are constant


def test_changepoint_min_seg_excludes_edges(spark):
    """An outlier first point must not become a 1-point segment when
    min_seg forbids it."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        changepoint_binseg,
    )

    rows = [("s", 1, 100.0)] + [("s", i, 1.0) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    r = changepoint_binseg(df, "k", "o", "v", min_seg=3).collect()[0]
    assert 3 <= r.split_pos <= r.n - 3


def test_pacf_ar1_cuts_off_after_lag1(spark):
    """A deterministic AR(1)-like geometric series: PACF(1) is large,
    PACF(2..4) collapse toward 0 — the textbook AR-order signature —
    and ACF decays geometrically instead."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import pacf_table

    # x_t = 0.8*x_{t-1} + deterministic tiny perturbation
    xs, x = [], 10.0
    for i in range(60):
        x = 0.8 * x + ((i * 37) % 11 - 5) * 0.3
        xs.append(x)
    rows = [("s", i, i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, ts long, tb long, v double")
    r = pacf_table(df, "k", "ts", "v", "tb").collect()[0]
    assert r.pacf1 == r.acf1  # DL base case
    assert abs(r.pacf1) > 0.5
    assert abs(r.pacf2) < abs(r.pacf1) / 2  # cutoff after lag 1
    assert abs(r.acf2 - r.acf1 * r.acf1) < 0.25  # geometric-ish decay


def test_psi_zero_on_identical_and_large_on_shift(spark):
    from image_matadata_batchprocessing_aws_spark.operators.stats import psi_drift

    ref = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    same = psi_drift(ref, ref, "v").collect()[0]
    assert same.psi < 0.01  # identical populations: only smoothing noise
    shifted = spark.createDataFrame([(float(i + 800),) for i in range(1000)], "v double")
    drift = psi_drift(ref, shifted, "v").collect()[0]
    assert drift.psi > 0.25  # the "act" threshold
    assert drift.worst_bin == 9  # mass piled into the top reference bin


def test_holt_backtest_beats_naive_on_trend_loses_on_noise(spark):
    """On a clean linear trend the trend-aware smoother beats the naive
    carry-forward (positive skill); on an alternating series the naive
    forecast is beaten by neither (skill can go negative) — the
    backtest is what tells these apart."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        holt_backtest,
    )

    trend = [("t", i, i, 10.0 + 2.0 * i) for i in range(40)]
    zig = [("z", i, i, 5.0 if i % 2 else -5.0) for i in range(40)]
    df = spark.createDataFrame(trend + zig, "k string, ts long, tb long, v double")
    out = {r.k: r for r in holt_backtest(df, "k", "ts", "v", "tb").collect()}
    # trend: Holt beats persistence (beta=0.1 adapts slowly, so the
    # 40-point ramp's early transient keeps skill modest but positive)
    assert out["t"].skill > 0.1
    assert out["t"].mae_holt < out["t"].mae_naive
    assert out["z"].n_forecasts == 39
