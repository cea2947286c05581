"""Statistical / time-series / funnel-retrieval analytics queries
(r03 batch 4): engine-side model-prep statistics, hypertable-style
rollups, vocabulary building, and coarse-to-fine Matryoshka retrieval.

Every query is fully oracled; determinism via the scaled-long exact-sum
playbook (``operators/stats.py``) or exact interpolated percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from image_matadata_batchprocessing_aws_spark.operators.similarity import as_double_array, cosine_sim
from image_matadata_batchprocessing_aws_spark.operators.stats import (
    correlation_matrix,
    correlation_matrix_sql,
    grouped_regression,
    grouped_regression_sql,
    winsorize,
)
from image_matadata_batchprocessing_aws_spark.operators.text import tokens
from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
    resample_daily,
    rollup_cascade_daily,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

# --- grouped OLS regression (engine-side model prep) ---------------------


def agg_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Per-returnflag least-squares fit of extendedprice on quantity:
    slope/intercept/r2 from six exact integer partial sums — one
    shuffle, map-side combine, 3-row result."""
    return grouped_regression(
        t(spark, sf, "lineitem"), ["l_returnflag"], x="l_quantity", y="l_extendedprice"
    )


# --- winsorize (percentile clip) -----------------------------------------


def etl_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """P01/P99 clip of customer balances + a clipped flag; exact
    interpolated percentiles broadcast, map-side clip."""
    c = t(spark, sf, "customer")
    w = winsorize(c, ["c_acctbal"], lower=0.01, upper=0.99, suffix="_w")
    return w.select(
        "c_custkey",
        F.round(F.col("c_acctbal_w"), 4).alias("acctbal_w"),
        (F.col("c_acctbal_w") != F.col("c_acctbal")).alias("clipped"),
    )


# --- daily resample + gap fill -------------------------------------------

RESAMPLE_MAX_USER = 20


def etl_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily grid over each user's own active span: additive
    metrics zero-filled, state metric forward-filled.  Users bounded for
    result-size hygiene; the plan is keyed on user_id throughout."""
    e = t(spark, sf, "events").where(F.col("user_id") < RESAMPLE_MAX_USER)
    return resample_daily(e, key="user_id", ts_col="ts", value_col="value")


# --- hourly -> daily cascading rollup ------------------------------------


def agg_rollup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Materialized-rollup cascade: daily tier re-aggregates the hourly
    tier's distributive partials (scaled-long sum + count), never the
    raw events — bit-identical to a direct daily aggregate, which is
    exactly what the oracle computes."""
    return rollup_cascade_daily(t(spark, sf, "events"), ts_col="ts", value_col="value")


# --- vocabulary build ----------------------------------------------------

VOCAB_TOP = 100


def text_vocab_build(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 corpus vocabulary with counts and cumulative coverage —
    the first step of any tokenizer/frequency-filter build.  Explode is
    the only row expansion; the count groupBy does map-side partial
    aggregation so the shuffle carries (token, partial-count), not
    token instances; coverage is a running sum over the (tiny) ranked
    vocab."""
    d = t(spark, sf, "documents")
    tok = d.select(F.explode(tokens(F.lower(F.col("text")))).alias("token")).where(
        F.col("token") != ""
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # partial top-k, tiny driver merge) — NOT a global row_number window,
    # which would drag the whole vocabulary through one task.  The
    # rank/coverage windows below run on the 100-row result only.
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(VOCAB_TOP)
    # single-partition window is the intended shape (the frame is bounded
    # at VOCAB_TOP rows by the limit above); partitioning by __total — a
    # real column that is constant across the frame — states that in the
    # plan without the keyless-window warning (a foldable lit() key would
    # be optimized away and re-trigger it)
    w_rank = Window.partitionBy("__total").orderBy(F.col("cnt").desc(), "token")
    ranked = (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn(
            "coverage",
            F.round(
                F.sum("cnt").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
                / F.col("__total").cast("double"),
                6,
            ),
        )
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "token",
        F.col("cnt").cast("long").alias("cnt"),
        "coverage",
    )


# --- Matryoshka coarse-to-fine retrieval ---------------------------------

MAT_N_QUERIES = 10
MAT_HEAD_DIMS = 8
MAT_SHORTLIST = 20
MAT_K = 5


def ann_matryoshka_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage funnel retrieval over nested (Matryoshka) embeddings:
    stage 1 shortlists top-20 per query by cosine on the FIRST 8 DIMS
    (8x cheaper per comparison, the only stage that touches the whole
    corpus); stage 2 re-scores the 20-row shortlist with exact cosine
    over all 64 dims and keeps top-5.

    Scale shape: queries broadcast in both stages; the corpus is
    scanned once (stage 1) map-side; stage 2's input is
    shortlist-sized (queries x 20), so re-ranking cost is independent
    of corpus size — the standard recall-vs-cost funnel of a production
    retrieval stack, here as one lazy two-join plan."""
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < MAT_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("qe"),
    )
    c = e.where(F.col("vec_id") >= MAT_N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("ce"),
    )
    head = lambda col: F.slice(col, 1, MAT_HEAD_DIMS)  # noqa: E731
    coarse = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            "ce",
            "qe",
            F.round(cosine_sim(head(F.col("qe")), head(F.col("ce"))), 6).alias("head_score"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("head_score").desc(), F.col("neighbor_id")
                )
            ),
        )
        .where(F.col("__rn") <= MAT_SHORTLIST)
    )
    fine = coarse.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("score"),
    ).withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
        )
        .cast("long"),
    )
    return fine.where(F.col("rn") <= MAT_K).select("query_id", "neighbor_id", "score", "rn")


# --- per-label embedding centroids (exact) -------------------------------

CENTROID_DIGITS = 6
EMB_DIM = 64


def embedding_centroid_label(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(label, dimension) centroid of the embedding corpus — the
    class-prototype build (nearest-centroid classifiers, SemDeDup seeds,
    cluster summaries).  posexplode -> one (label, pos)-keyed shuffle of
    scaled-long partials; means reconstruct in double from exact integer
    sums, so any partition order gives identical bits."""
    e = t(spark, sf, "embeddings").select(
        "label", F.posexplode(as_double_array("embedding")).alias("pos", "x")
    )
    scale = float(10**CENTROID_DIGITS)
    agg = e.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("x") * F.lit(scale)).cast("long")).alias("__s"),
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("pos").cast("long").alias("pos"),
        F.col("n").cast("long").alias("n"),
        # tie-safe rounding (r09): one sf0.1 mean sat on a shortest-repr
        # half and round() split between the engines; the floor form is
        # the same IEEE chain on both sides
        (
            F.floor(
                F.col("__s").cast("double") / F.lit(scale) / F.col("n").cast("double")
                * F.lit(scale)
                + 0.5
            )
            / F.lit(scale)
        ).alias("dim_mean"),
    )


# --- rolling-window anomaly detection ------------------------------------

ANOM_LOOKBACK = 20
ANOM_MIN_PERIODS = 10
ANOM_THRESHOLD = 3.0


def ts_anomaly_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user trailing-window z-score anomaly flags over the event
    stream (baseline = previous 20 observations, current excluded):
    exact scaled-long window sums, float reconstruction per row."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        rolling_anomaly_zscore,
    )

    e = t(spark, sf, "events")
    out = rolling_anomaly_zscore(
        e,
        key="user_id",
        ts_col="ts",
        value_col="value",
        order_tiebreak="event_id",
        lookback=ANOM_LOOKBACK,
        min_periods=ANOM_MIN_PERIODS,
        threshold=ANOM_THRESHOLD,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        "n_baseline",
        "z",
        "is_anomaly",
    )


# --- distribution drift report -------------------------------------------

DRIFT_BINS = 10


def etl_drift_report(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality drift monitor: events split at the exact median
    timestamp into reference/current windows; per feature the
    total-variation distance over reference-anchored deciles (value) or
    category frequencies (event_type).  Integer-exact TV (no ln), one
    conditional-count groupBy per feature."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import histogram_drift

    ev = t(spark, sf, "events")
    ts_d = F.unix_micros("ts").cast("double")
    med = ev.agg(F.percentile(ts_d, F.lit(0.5)).alias("__cut"))
    lab = ev.crossJoin(F.broadcast(med))
    ref = lab.where(ts_d <= F.col("__cut")).drop("__cut")
    cur = lab.where(ts_d > F.col("__cut")).drop("__cut")
    return histogram_drift(ref, cur, ["value"], ["event_type"], n_bins=DRIFT_BINS)


# --- full correlation matrix ---------------------------------------------

CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def agg_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """All-pairs Pearson matrix over lineitem's four numeric measures:
    one scan, one 1-row integer aggregate, six unfolded pair rows —
    the d-column generalization of agg_corr with the exact-sum
    playbook instead of float corr()."""
    return correlation_matrix(t(spark, sf, "lineitem"), CORR_COLS, digits=2)


# --- source-mixture diversity (Gini impurity) ----------------------------


def agg_source_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language source-mixture diversity as GINI IMPURITY
    ``1 - sum_i (cnt_i/N)^2`` — the corpus-composition monitor a
    mixture-weighted sampler watches.  Gini instead of Shannon entropy
    on purpose: entropy needs ln() (cross-engine ulp roulette); Gini is
    an exact rational of integer counts with one double division.  Two
    keyed aggregations, both map-side-partial."""
    d = t(spark, sf, "documents")
    per_src = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("__cnt"))
    agg = per_src.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("__cnt").cast("long").alias("n_docs"),
        F.sum(F.col("__cnt") * F.col("__cnt")).alias("__ss"),
    )
    return agg.select(
        "lang",
        "n_sources",
        "n_docs",
        F.round(
            F.lit(1.0)
            - F.col("__ss").cast("double")
            / (F.col("n_docs").cast("double") * F.col("n_docs").cast("double")),
            6,
        ).alias("gini"),
    )


# --- incremental aggregate maintenance -----------------------------------


def etl_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate-refresh-without-rescan: a settled per-user aggregate
    table (90% of events) merges with a new batch's partials (the other
    10%) by COMBINING DISTRIBUTIVE PARTIALS — sum of sums, sum of
    counts, max of maxes; avg derives at the end.  The oracle computes
    the direct aggregate over all events, which the merge must equal
    bit-for-bit (scaled-long sums are associative) — the invariant that
    makes nightly incremental rollups trustworthy at 100 TB."""
    ev = t(spark, sf, "events").where(F.col("user_id").isNotNull())

    def partials(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("__vsum"),
            F.max("value").alias("__vmax"),
        )

    base = partials(ev.where(F.col("event_id") % 10 != 0))
    delta = partials(ev.where(F.col("event_id") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("__cnt").cast("long").alias("n_events"),
            F.sum("__vsum").alias("__vsum"),
            F.max("__vmax").alias("max_value"),
        )
    )
    v = F.col("__vsum").cast("double") / F.lit(10000.0)
    return merged.select(
        "user_id",
        "n_events",
        F.round(v, 4).alias("sum_value"),
        "max_value",
        F.round(v / F.col("n_events").cast("double"), 6).alias("avg_value"),
    )


# --- duration-weighted mean (hypertable time_weight) ---------------------


def ts_time_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user duration-weighted mean of the event value
    (last-observation-carried-forward weighting): one keyed window for
    lead-timestamps, exact scaled-long products whose sum telescopes to
    value_max * span — int64-safe at any row count."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        time_weighted_avg,
    )

    e = t(spark, sf, "events")
    return time_weighted_avg(
        e, key="user_id", ts_col="ts", value_col="value", order_tiebreak="event_id"
    )


# --- retention cohort matrix ---------------------------------------------

WEEK_US = 7 * 86400 * 1_000_000


def agg_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    week, counted in each subsequent activity week (offset 0, 1, 2, ...).
    Two aggregations — first-week per user (min), then distinct users
    per (cohort_week, offset) — both keyed shuffles with map-side
    partials; the matrix is weeks², never data-sized."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    week = F.floor(F.unix_micros("ts") / F.lit(WEEK_US)).cast("long")
    uw = e.select("user_id", week.alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


QUERIES = {
    "agg_regression": agg_regression,
    "etl_winsorize": etl_winsorize,
    "etl_resample_gapfill": etl_resample_gapfill,
    "agg_rollup_cascade": agg_rollup_cascade,
    "text_vocab_build": text_vocab_build,
    "ann_matryoshka_rerank": ann_matryoshka_rerank,
    "embedding_centroid_label": embedding_centroid_label,
    "ts_anomaly_events": ts_anomaly_events,
    "etl_drift_report": etl_drift_report,
    "agg_corr_matrix": agg_corr_matrix,
    "agg_source_diversity": agg_source_diversity,
    "etl_incremental_agg": etl_incremental_agg,
    "ts_time_weighted": ts_time_weighted,
    "agg_retention_cohorts": agg_retention_cohorts,
}

_DRIFT_QS = ", ".join(
    f"quantile_cont(value, {i / DRIFT_BINS}) FILTER (WHERE is_ref) AS q{i}"
    for i in range(1, DRIFT_BINS)
)
_DRIFT_BIN = " + ".join(f"CAST(value > q{i} AS INT)" for i in range(1, DRIFT_BINS))

ORACLES = {
    "agg_regression": grouped_regression_sql(
        "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
    ),
    "etl_winsorize": """
        WITH st AS (SELECT quantile_cont(c_acctbal, 0.01) AS lo,
                           quantile_cont(c_acctbal, 0.99) AS hi
                    FROM customer)
        SELECT c_custkey,
               round(least(greatest(c_acctbal, lo), hi), 4) AS acctbal_w,
               least(greatest(c_acctbal, lo), hi) <> c_acctbal AS clipped
        FROM customer, st
    """,
    "etl_resample_gapfill": f"""
        WITH sparse AS (
          SELECT user_id,
                 epoch_us(ts) // 86400000000 AS day,
                 count(*) AS n_events,
                 sum(CAST(round(value * 10000.0) AS BIGINT)) AS vsum
          FROM events WHERE user_id < {RESAMPLE_MAX_USER}
          GROUP BY user_id, epoch_us(ts) // 86400000000),
        bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                   FROM sparse GROUP BY user_id),
        grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM bounds)
        SELECT g.user_id, g.day,
               CAST(coalesce(s.n_events, 0) AS BIGINT) AS n_events,
               CAST(coalesce(s.vsum, 0) AS DOUBLE) / 10000.0 AS day_sum,
               max(CASE WHEN s.vsum IS NOT NULL THEN g.day END)
                 OVER (PARTITION BY g.user_id ORDER BY g.day
                       ROWS UNBOUNDED PRECEDING) AS last_active_day
        FROM grid g LEFT JOIN sparse s
          ON s.user_id = g.user_id AND s.day = g.day
    """,
    "agg_rollup_cascade": """
        WITH hourly AS (
          SELECT epoch_us(ts) // 3600000000 AS hour,
                 count(*) AS n,
                 sum(CAST(round(value * 10000.0) AS BIGINT)) AS vsum
          FROM events GROUP BY epoch_us(ts) // 3600000000),
        daily AS (
          SELECT hour // 24 AS day,
                 sum(n) AS n_events,
                 sum(vsum) AS vsum,
                 count(*) AS n_active_hours
          FROM hourly GROUP BY hour // 24)
        SELECT day,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(n_active_hours AS BIGINT) AS n_active_hours,
               round(CAST(vsum AS DOUBLE) / 10000.0, 4) AS day_sum,
               round(CAST(vsum AS DOUBLE) / 10000.0 / CAST(n_events AS DOUBLE), 4)
                 AS day_avg
        FROM daily
    """,
    "text_vocab_build": rf"""
        WITH tok AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
          FROM documents),
        counts AS (SELECT token, count(*) AS cnt FROM tok
                   WHERE token <> '' GROUP BY token),
        total AS (SELECT sum(cnt) AS total FROM counts),
        ranked AS (
          SELECT token, cnt,
                 row_number() OVER (ORDER BY cnt DESC, token) AS rank,
                 round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
                                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                       / CAST(total AS DOUBLE), 6) AS coverage
          FROM counts, total)
        SELECT CAST(rank AS BIGINT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
               coverage
        FROM ranked WHERE rank <= {VOCAB_TOP}
    """,
    "ann_matryoshka_rerank": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {MAT_N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id >= {MAT_N_QUERIES}),
        coarse AS (
          SELECT query_id, neighbor_id, qe, ce,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(
                              qe[1:{MAT_HEAD_DIMS}], ce[1:{MAT_HEAD_DIMS}]), 6) DESC,
                            neighbor_id) AS crn
          FROM q CROSS JOIN c),
        fine AS (
          SELECT query_id, neighbor_id,
                 round(list_cosine_similarity(qe, ce), 6) AS score,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC,
                            neighbor_id) AS rn
          FROM coarse WHERE crn <= {MAT_SHORTLIST})
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM fine WHERE rn <= {MAT_K}
    """,
    "ts_anomaly_events": f"""
        WITH b AS (
          SELECT user_id, event_id, ts, value,
                 CAST(round(value * 10000.0) AS BIGINT) AS xs
          FROM events),
        st AS (
          SELECT user_id, event_id, ts, value, xs,
                 count(xs) OVER w AS n,
                 sum(xs) OVER w AS s,
                 sum(xs * xs) OVER w AS ss
          FROM b
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)),
        zc AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
                 CAST(n AS BIGINT) AS n_baseline,
                 -- + 0.0 normalizes DuckDB's round(-tiny) = -0.0 to the
                 -- +0.0 Spark's BigDecimal round emits (etl_zscore's
                 -- oracle precedent; one sf0.1 row differed only in
                 -- zero sign)
                 CASE WHEN n >= {ANOM_MIN_PERIODS} THEN
                   round((CAST(xs AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / sqrt((CAST(ss AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(n AS DOUBLE) - 1.0)), 4) + 0.0
                 END AS z
          FROM st)
        SELECT event_id, user_id, ts_ms, value, n_baseline, z,
               abs(z) > {ANOM_THRESHOLD} AS is_anomaly
        FROM zc
    """,
    "agg_corr_matrix": correlation_matrix_sql("lineitem", CORR_COLS, digits=2),
    "agg_source_diversity": """
        WITH per_src AS (
          SELECT lang, source, count(*) AS cnt
          FROM documents GROUP BY lang, source),
        agg AS (
          SELECT lang, count(*) AS n_sources, sum(cnt) AS n_docs,
                 sum(cnt * cnt) AS ss
          FROM per_src GROUP BY lang)
        SELECT lang, CAST(n_sources AS BIGINT) AS n_sources,
               CAST(n_docs AS BIGINT) AS n_docs,
               round(1.0 - CAST(ss AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6) AS gini
        FROM agg
    """,
    "etl_incremental_agg": """
        WITH ev AS (SELECT user_id, value FROM events WHERE user_id IS NOT NULL),
        agg AS (
          SELECT user_id, count(*) AS n_events,
                 sum(CAST(round(value * 10000) AS BIGINT)) AS vsum,
                 max(value) AS max_value
          FROM ev GROUP BY user_id)
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
               round(CAST(vsum AS DOUBLE) / 10000.0, 4) AS sum_value,
               max_value,
               round(CAST(vsum AS DOUBLE) / 10000.0
                     / CAST(n_events AS DOUBLE), 6) AS avg_value
        FROM agg
    """,
    "ts_time_weighted": """
        WITH s AS (
          SELECT user_id,
                 CAST(round(value * 10000.0) AS BIGINT) AS vs,
                 (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                  - epoch_us(ts)) // 1000 AS dt_ms
          FROM events),
        f AS (SELECT user_id, vs, dt_ms FROM s WHERE dt_ms IS NOT NULL)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(dt_ms) AS BIGINT) AS span_ms,
               round(CAST(sum(vs * dt_ms) AS DOUBLE)
                     / CAST(sum(dt_ms) AS DOUBLE) / 10000.0, 6) AS twa
        FROM f GROUP BY user_id
    """,
    "agg_retention_cohorts": f"""
        WITH uw AS (
          SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week
          FROM events WHERE user_id IS NOT NULL),
        cohort AS (SELECT user_id, min(week) AS cohort_week
                   FROM uw GROUP BY user_id)
        SELECT c.cohort_week,
               u.week - c.cohort_week AS week_offset,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users
        FROM uw u JOIN cohort c USING (user_id)
        GROUP BY c.cohort_week, u.week - c.cohort_week
    """,
    "etl_drift_report": f"""
        WITH cutoff AS (
          SELECT quantile_cont(CAST(epoch_us(ts) AS DOUBLE), 0.5) AS cut
          FROM events),
        lab AS (
          SELECT value, event_type,
                 CAST(epoch_us(ts) AS DOUBLE) <= cut AS is_ref
          FROM events, cutoff),
        bounds AS (SELECT {_DRIFT_QS} FROM lab),
        vbin AS (
          SELECT {_DRIFT_BIN} AS bin, is_ref
          FROM lab, bounds WHERE value IS NOT NULL),
        vcnt AS (
          SELECT bin,
                 CAST(coalesce(count(*) FILTER (WHERE is_ref), 0) AS BIGINT) AS rc,
                 CAST(coalesce(count(*) FILTER (WHERE NOT is_ref), 0) AS BIGINT) AS cc
          FROM vbin GROUP BY bin),
        vt AS (SELECT sum(rc) AS nr, sum(cc) AS nc FROM vcnt),
        v AS (
          SELECT 'value' AS feature,
                 CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
                 round(CAST(sum(abs(rc * nc - cc * nr)) AS DOUBLE)
                       / (2.0 * CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)), 6) AS tv
          FROM vcnt, vt GROUP BY nr, nc),
        cbin AS (
          SELECT coalesce(CAST(event_type AS VARCHAR), '__null__') AS bin, is_ref
          FROM lab),
        ccnt AS (
          SELECT bin,
                 CAST(coalesce(count(*) FILTER (WHERE is_ref), 0) AS BIGINT) AS rc,
                 CAST(coalesce(count(*) FILTER (WHERE NOT is_ref), 0) AS BIGINT) AS cc
          FROM cbin GROUP BY bin),
        ct AS (SELECT sum(rc) AS nr, sum(cc) AS nc FROM ccnt),
        cv AS (
          SELECT 'event_type' AS feature,
                 CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
                 round(CAST(sum(abs(rc * nc - cc * nr)) AS DOUBLE)
                       / (2.0 * CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)), 6) AS tv
          FROM ccnt, ct GROUP BY nr, nc)
        SELECT * FROM v UNION ALL SELECT * FROM cv
    """,
    "embedding_centroid_label": f"""
        WITH x AS (
          SELECT label, i AS pos,
                 CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000.0) AS BIGINT)
                   AS xs
          FROM embeddings, range({EMB_DIM}) t(i))
        SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
               CAST(count(*) AS BIGINT) AS n,
               floor(CAST(sum(xs) AS DOUBLE) / 1000000.0
                     / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 AS dim_mean
        FROM x GROUP BY label, pos
    """,
}


# --- event-transition matrix (Markov counts) ------------------------------


def agg_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order transition counts over each user's ordered event
    sequence (prev_type -> type), with per-source probabilities — the
    Markov-chain fit behind session modeling and next-event prediction.
    One keyed window (lag over (ts, event_id)) + one small groupBy;
    probabilities are exact count ratios, one double division."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("__n")
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("__n").alias("__tot"))
    return cnt.join(tot, "prev_type").select(
        "prev_type",
        "event_type",
        F.col("__n").cast("long").alias("n"),
        F.round(F.col("__n").cast("double") / F.col("__tot").cast("double"), 6).alias(
            "p"
        ),
    )


# --- frequent co-purchase pairs ------------------------------------------

PAIR_ORDER_MOD = 4  # sample orders like graph_triangles so pairs stay bounded
PAIR_TOPK = 25


def agg_frequent_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket frequent pairs: top-25 part pairs by co-order
    count.  Canonical a < b self-join keyed on the order id (the basket),
    map-side-combined count, TakeOrderedAndProject top-k — the support
    side of association-rule mining, no global sort."""
    li = (
        t(spark, sf, "lineitem")
        .where(F.col("l_orderkey") % PAIR_ORDER_MOD == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "o").where(F.col("part_a") < F.col("part_b"))
    cnt = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return cnt.orderBy(
        F.col("n_orders").desc(), "part_a", "part_b"
    ).limit(PAIR_TOPK)


# --- exact decimal aggregation -------------------------------------------


def agg_decimal_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Money math on DECIMAL — the type a ledger actually uses: revenue
    per return flag summed exactly (no float accumulation at all; both
    engines' decimal adders are integer-exact, so no round() hedging is
    needed anywhere in this query).  The DECIMAL accumulation stays
    internal; the RESULT columns are scaled BIGINTs (cents / 1e-4
    units) per the house rule — VERDICT r5 item 1 root-caused the r05
    red row to the driver's value-hash canonicalization of
    DECIMAL-typed output columns, not to the values (they agree
    bitwise), so no DECIMAL crosses the hash boundary."""
    li = t(spark, sf, "lineitem")
    d = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("disc_price"),
    )
    return d.groupBy("l_returnflag").agg(
        (F.sum("price").cast("decimal(38,2)") * 100)
        .cast("long")
        .alias("sum_price_cents"),
        (F.sum("disc_price").cast("decimal(38,4)") * 10000)
        .cast("long")
        .alias("sum_disc_price_e4"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES["agg_event_transitions"] = agg_event_transitions
QUERIES["agg_frequent_pairs"] = agg_frequent_pairs
QUERIES["agg_decimal_exact"] = agg_decimal_exact

ORACLES["agg_event_transitions"] = """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events WHERE user_id IS NOT NULL),
    cnt AS (SELECT prev_type, event_type, count(*) AS n FROM seq
            WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
    tot AS (SELECT prev_type, sum(n) AS tot FROM cnt GROUP BY prev_type)
    SELECT c.prev_type, c.event_type, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
    FROM cnt c JOIN tot t USING (prev_type)
"""

ORACLES["agg_frequent_pairs"] = f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey
                FROM lineitem WHERE l_orderkey % {PAIR_ORDER_MOD} = 0),
    pairs AS (SELECT a.part_a, b.part_b
              FROM (SELECT o, l_partkey AS part_a FROM li) a
              JOIN (SELECT o, l_partkey AS part_b FROM li) b USING (o)
              WHERE part_a < part_b)
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b LIMIT {PAIR_TOPK}
"""

ORACLES["agg_decimal_exact"] = """
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) * 100 AS BIGINT)
             AS sum_price_cents,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(38,4)) * 10000 AS BIGINT)
             AS sum_disc_price_e4,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
"""


# --- Pareto concentration --------------------------------------------------


def agg_pareto_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Top-decile concentration per nation: what share of total positive
    account balance the top 10% of customers hold — the 80/20 diagnostic
    for key-skew and revenue concentration.  Keyed rank window (one
    shuffle), exact scaled-long sums, integer ceil for the decile
    cutoff; one double division at the end."""
    c = t(spark, sf, "customer").where(F.col("c_acctbal") > 0)
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    r = c.select(
        "c_nationkey", bal.alias("__bal"), F.row_number().over(w).alias("__rn")
    )
    agg = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("__bal").alias("__total"),
    )
    # integer ceil(n/10): the top decile has at least one member
    cut = (F.col("n_customers") + F.lit(9)) / F.lit(10)
    topk = agg.select(
        "c_nationkey", "n_customers", "__total", F.floor(cut).cast("long").alias("__k")
    )
    top = (
        r.join(F.broadcast(topk.select("c_nationkey", "__k")), "c_nationkey")
        .where(F.col("__rn") <= F.col("__k"))
        .groupBy("c_nationkey")
        .agg(F.sum("__bal").alias("__top"))
    )
    return topk.join(top, "c_nationkey").select(
        "c_nationkey",
        "n_customers",
        F.col("__k").alias("n_top_decile"),
        F.round(F.col("__top").cast("double") / F.col("__total").cast("double"), 6).alias(
            "top_decile_share"
        ),
    )


QUERIES["agg_pareto_concentration"] = agg_pareto_concentration
ORACLES["agg_pareto_concentration"] = """
    WITH c AS (SELECT c_nationkey, c_custkey,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                      row_number() OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal DESC, c_custkey) AS rn
               FROM customer WHERE c_acctbal > 0),
    agg AS (SELECT c_nationkey, count(*) AS n_customers, sum(bal) AS total,
                   (count(*) + 9) // 10 AS k
            FROM c GROUP BY c_nationkey),
    top AS (SELECT c.c_nationkey, sum(c.bal) AS topsum
            FROM c JOIN agg USING (c_nationkey)
            WHERE c.rn <= agg.k GROUP BY c.c_nationkey)
    SELECT a.c_nationkey,
           CAST(a.n_customers AS BIGINT) AS n_customers,
           CAST(a.k AS BIGINT) AS n_top_decile,
           round(CAST(t.topsum AS DOUBLE) / CAST(a.total AS DOUBLE), 6)
             AS top_decile_share
    FROM agg a JOIN top t USING (c_nationkey)
"""


# --- seasonality profile ----------------------------------------------------


def agg_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day x day-of-week activity profile of the event stream —
    the seasonality fingerprint capacity planning and anomaly baselining
    read first.  One map-side date-part projection + one 168-group
    aggregate; value sums exact scaled longs."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.lit(100.0),
                2,
            ).alias("sum_value"),
        )
    )


QUERIES["agg_seasonality"] = agg_seasonality
# Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
ORACLES["agg_seasonality"] = """
    SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS sum_value
    FROM events GROUP BY dayofweek(ts), hour(ts)
"""


# --- Spearman rank correlation ---------------------------------------------


def agg_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Per-returnflag Spearman rho of quantity vs extended price —
    exact doubled-integer tie-average ranks, hi/lo-split integer Pearson
    fold (operators/stats.grouped_spearman)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import grouped_spearman

    return grouped_spearman(
        t(spark, sf, "lineitem"), ["l_returnflag"], x="l_quantity", y="l_extendedprice"
    )


QUERIES["agg_spearman"] = agg_spearman

from image_matadata_batchprocessing_aws_spark.operators.stats import (  # noqa: E402
    grouped_spearman_sql,
)

ORACLES["agg_spearman"] = grouped_spearman_sql(
    "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
)


# --- RFM segmentation --------------------------------------------------------


def agg_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation — recency (last order date), frequency
    (order count), monetary (total spend) — each scored into quartiles
    against the customer population (the classic CRM cut).  One grouped
    aggregate builds the metrics; one 1-row exact-percentile aggregate
    broadcasts the boundaries; scores are map-side comparison sums, the
    same proven shape as etl_quantile_bin."""
    o = t(spark, sf, "orders")
    m = o.groupBy("o_custkey").agg(
        F.max(F.unix_date(F.col("o_orderdate").cast("date"))).cast("long").alias("recency_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("__m"),
    )
    m = m.withColumn("monetary", F.round(F.col("__m").cast("double") / 100.0, 2))
    qs = (0.25, 0.5, 0.75)
    bounds = m.agg(
        *[F.percentile(F.col(c).cast("double"), F.lit(q)).alias(f"__{c}_{i}")
          for c in ("recency_day", "frequency", "monetary") for i, q in enumerate(qs)]
    )
    j = m.crossJoin(F.broadcast(bounds))

    def score(c: str):
        return sum(
            (F.col(c).cast("double") > F.col(f"__{c}_{i}")).cast("int") for i in range(3)
        ).cast("long") + F.lit(1)

    return j.select(
        F.col("o_custkey").alias("c_custkey"),
        "recency_day",
        "frequency",
        "monetary",
        score("recency_day").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"),
    )


QUERIES["agg_rfm_segments"] = agg_rfm_segments
ORACLES["agg_rfm_segments"] = """
    WITH m AS (
      SELECT o_custkey AS c_custkey,
             CAST(max(date_diff('day', DATE '1970-01-01', o_orderdate)) AS BIGINT)
               AS recency_day,
             CAST(count(*) AS BIGINT) AS frequency,
             round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0, 2) AS monetary
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT quantile_cont(CAST(recency_day AS DOUBLE), 0.25) AS r0,
             quantile_cont(CAST(recency_day AS DOUBLE), 0.50) AS r1,
             quantile_cont(CAST(recency_day AS DOUBLE), 0.75) AS r2,
             quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f0,
             quantile_cont(CAST(frequency AS DOUBLE), 0.50) AS f1,
             quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f2,
             quantile_cont(monetary, 0.25) AS m0,
             quantile_cont(monetary, 0.50) AS m1,
             quantile_cont(monetary, 0.75) AS m2
      FROM m)
    SELECT c_custkey, recency_day, frequency, monetary,
           CAST(CAST(recency_day > r0 AS INT) + CAST(recency_day > r1 AS INT)
                + CAST(recency_day > r2 AS INT) + 1 AS BIGINT) AS r_score,
           CAST(CAST(frequency > f0 AS INT) + CAST(frequency > f1 AS INT)
                + CAST(frequency > f2 AS INT) + 1 AS BIGINT) AS f_score,
           CAST(CAST(monetary > m0 AS INT) + CAST(monetary > m1 AS INT)
                + CAST(monetary > m2 AS INT) + 1 AS BIGINT) AS m_score
    FROM m, b
"""
