"""Oracle-ready queries staged during r08 for later registration.

Same discipline as ``queries/r08_queue.py``: the registry drains 50
driver slots per round, so new queries stage here — fully oracled and
exact-verified (``tests/test_r09_queue.py`` at sf0.001,
``tools/check_oracle.py --staged`` at any sf dir) — and register in
r11 per the drain plan in ``queries/__init__.py`` (501 -> 551).
Capped at <= 50 pairs so staging growth stays at the drain rate.

Float-parity rules are the house ones (see ``queries/etl.py``):
computed integers cast to BIGINT both sides; row-level measures move
as scaled BIGINTs (the cents idiom, hi/lo-split when products can
overflow — ``operators/stats._split_sum``); float arithmetic over
small FIXED grids may sum directly and round (the ``eval_fdr_bh``
precedent); higher moments quantize standardized values to a
documented grid so per-row terms stay BIGINT-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERIES: dict = {}
ORACLES: dict = {}


# --- regression / residual diagnostics --------------------------------------


def agg_durbin_watson(spark: SparkSession, sf: str) -> DataFrame:
    """Durbin-Watson autocorrelation diagnostic on the residuals of a
    daily-revenue OLS trend — the standard "is my time-series
    regression lying about its standard errors" check.  Daily revenue
    moves as exact cents BIGINTs; the OLS closes from five exact scalar
    sums cast to double in ONE fixed expression (no float
    accumulation); residuals are then a map-side expression and DW is
    one aggregate over the day-ordered lag.  Scale: everything after
    the first groupBy is per-DAY (calendar-bounded), not per-row."""
    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    mom = day.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
    ).select(
        "n",
        (
            (
                F.col("n").cast("double") * F.col("sdy")
                - F.col("sd").cast("double") * F.col("sy")
            )
            / (
                F.col("n").cast("double") * F.col("sdd")
                - F.col("sd").cast("double") * F.col("sd")
            )
        ).alias("b"),
        (F.col("sy") / F.col("n") ).alias("ybar"),
        (F.col("sd") / F.col("n")).alias("dbar"),
    )
    w = Window.orderBy("d")
    resid = day.crossJoin(F.broadcast(mom)).select(
        "n",
        (
            F.col("y")
            - (F.col("ybar") + F.col("b") * (F.col("d") - F.col("dbar")))
        ).alias("e"),
        F.lag("d").over(w).alias("__pd"),
        "d",
    )
    resid = resid.withColumn(
        "de",
        F.when(
            F.col("__pd").isNotNull(),
            F.col("e") - F.lag("e").over(w),
        ),
    )
    out = resid.groupBy("n").agg(
        F.sum(F.col("e") * F.col("e")).alias("__see"),
        F.sum(F.col("de") * F.col("de")).alias("__sde"),
    )
    return out.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("__sde") / F.col("__see"), 6).alias("dw"),
        F.round(1.0 - (F.col("__sde") / F.col("__see")) / 2.0, 6).alias(
            "rho_approx"
        ),
    )


QUERIES["agg_durbin_watson"] = agg_durbin_watson

ORACLES["agg_durbin_watson"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    mom AS (
      SELECT count(*) AS n, sum(d) AS sd, sum(y) AS sy,
             sum(d * d) AS sdd, sum(d * y) AS sdy
      FROM day),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sdy - CAST(sd AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd) AS b,
             sy / n AS ybar, sd / n AS dbar
      FROM mom),
    resid AS (
      SELECT n, y - (ybar + b * (d - dbar)) AS e,
             lag(d) OVER (ORDER BY d) AS pd,
             (y - (ybar + b * (d - dbar)))
               - lag(y - (ybar + b * (d - dbar))) OVER (ORDER BY d) AS de
      FROM day CROSS JOIN fit)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(sum(CASE WHEN pd IS NOT NULL THEN de * de END)
                 / sum(e * e), 6) AS dw,
           round(1.0 - (sum(CASE WHEN pd IS NOT NULL THEN de * de END)
                 / sum(e * e)) / 2.0, 6) AS rho_approx
    FROM resid GROUP BY n
"""


def agg_poisson_etest(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Poisson rate comparison (orders per active day, odd
    vs even custkey) via the normal-approximation E-test z-score — the
    counting-process twin of the proportions z-test.  Counts and
    exposures are exact BIGINTs; one fixed float expression closes the
    z and the rate ratio.  Scale: two scalar aggregates."""
    o = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 2).alias("variant"),
        F.unix_millis(F.date_trunc("day", "o_orderdate")).alias("day_ms"),
    )
    g = o.groupBy("variant").agg(
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("day_ms").alias("exposure_days"),
    )
    c = F.col
    piv = g.agg(
        F.max(F.when(c("variant") == 0, c("events"))).alias("c0"),
        F.max(F.when(c("variant") == 0, c("exposure_days"))).alias("t0"),
        F.max(F.when(c("variant") == 1, c("events"))).alias("c1"),
        F.max(F.when(c("variant") == 1, c("exposure_days"))).alias("t1"),
    )
    r0 = c("c0") / c("t0")
    r1 = c("c1") / c("t1")
    z = (r1 - r0) / F.sqrt(c("c1") / (c("t1") * c("t1")) + c("c0") / (c("t0") * c("t0")))
    return piv.select(
        c("c0").cast("long").alias("events_ctl"),
        c("t0").cast("long").alias("days_ctl"),
        c("c1").cast("long").alias("events_trt"),
        c("t1").cast("long").alias("days_trt"),
        F.round(r1 / r0, 6).alias("rate_ratio"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 3.29).cast("long").alias("significant"),
    )


QUERIES["agg_poisson_etest"] = agg_poisson_etest

ORACLES["agg_poisson_etest"] = """
    WITH g AS (
      SELECT o_custkey % 2 AS variant, count(*) AS events,
             count(DISTINCT epoch_ms(date_trunc('day', o_orderdate)))
               AS exposure_days
      FROM orders GROUP BY 1),
    piv AS (
      SELECT max(CASE WHEN variant = 0 THEN events END) AS c0,
             max(CASE WHEN variant = 0 THEN exposure_days END) AS t0,
             max(CASE WHEN variant = 1 THEN events END) AS c1,
             max(CASE WHEN variant = 1 THEN exposure_days END) AS t1
      FROM g)
    SELECT CAST(c0 AS BIGINT) AS events_ctl, CAST(t0 AS BIGINT) AS days_ctl,
           CAST(c1 AS BIGINT) AS events_trt, CAST(t1 AS BIGINT) AS days_trt,
           round((c1 / CAST(t1 AS DOUBLE)) / (c0 / CAST(t0 AS DOUBLE)), 6)
             AS rate_ratio,
           round((c1 / CAST(t1 AS DOUBLE) - c0 / CAST(t0 AS DOUBLE))
                 / sqrt(c1 / (CAST(t1 AS DOUBLE) * t1)
                        + c0 / (CAST(t0 AS DOUBLE) * t0)), 6) AS z_score,
           CAST(abs((c1 / CAST(t1 AS DOUBLE) - c0 / CAST(t0 AS DOUBLE))
                 / sqrt(c1 / (CAST(t1 AS DOUBLE) * t1)
                        + c0 / (CAST(t0 AS DOUBLE) * t0))) > 3.29 AS BIGINT)
             AS significant
    FROM piv
"""


def agg_bartlett_test(spark: SparkSession, sf: str) -> DataFrame:
    """Bartlett's test for variance homogeneity of order value across
    the 5 order priorities — the parametric counterpart of the
    registered Levene/Brown-Forsythe tests.  Per-group moments are
    exact cents BIGINTs (hi/lo-split squares, the house overflow
    idiom); the chi-squared and its correction factor close as one
    float expression over the 5-group grid.  Scale: one partial-agg
    groupBy on a 5-value key."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *_split_sum(F.col("cents") * F.col("cents"), "q"),
    )
    # unbiased variance in dollars^2 from exact integer moments
    var = (
        (_split_val("q", 10000.0) - F.col("s") / 100.0 * (F.col("s") / 100.0) / F.col("n"))
        / (F.col("n") - 1)
    )
    per = g.select("o_orderpriority", "n", var.alias("v"))
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("bign"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("__pooled_num"),
        F.sum((F.col("n") - 1) * F.log("v")).alias("__sum_lnv"),
        F.sum(1.0 / (F.col("n") - 1)).alias("__sum_inv"),
    )
    sp2 = F.col("__pooled_num") / (F.col("bign") - F.col("k"))
    chi2 = (F.col("bign") - F.col("k")) * F.log(sp2) - F.col("__sum_lnv")
    corr = 1.0 + (F.col("__sum_inv") - 1.0 / (F.col("bign") - F.col("k"))) / (
        3.0 * (F.col("k") - 1)
    )
    return tot.select(
        F.col("k").cast("long").alias("groups"),
        F.col("bign").cast("long").alias("n_total"),
        F.round(sp2, 4).alias("pooled_var"),
        F.round(chi2 / corr, 6).alias("bartlett_chi2"),
        ((chi2 / corr) > 13.277).cast("long").alias("heteroscedastic"),  # df=4 @ .01
    )


QUERIES["agg_bartlett_test"] = agg_bartlett_test

ORACLES["agg_bartlett_test"] = """
    WITH o AS (
      SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT o_orderpriority, count(*) AS n, sum(cents) AS s,
             sum(cents * cents // 1073741824) AS q_hi,
             sum(cents * cents % 1073741824) AS q_lo
      FROM o GROUP BY 1),
    per AS (
      SELECT n,
             ((CAST(q_hi AS DOUBLE) * 1073741824.0 + CAST(q_lo AS DOUBLE)) / 10000.0
              - s / 100.0 * (s / 100.0) / n) / (n - 1) AS v
      FROM g),
    tot AS (
      SELECT count(*) AS k, sum(n) AS bign,
             sum((n - 1) * v) AS pooled_num,
             sum((n - 1) * ln(v)) AS sum_lnv,
             sum(1.0 / (n - 1)) AS sum_inv
      FROM per)
    SELECT CAST(k AS BIGINT) AS groups, CAST(bign AS BIGINT) AS n_total,
           round(pooled_num / (bign - k), 4) AS pooled_var,
           round(((bign - k) * ln(pooled_num / (bign - k)) - sum_lnv)
                 / (1.0 + (sum_inv - 1.0 / (bign - k)) / (3.0 * (k - 1))), 6)
             AS bartlett_chi2,
           CAST((((bign - k) * ln(pooled_num / (bign - k)) - sum_lnv)
                 / (1.0 + (sum_inv - 1.0 / (bign - k)) / (3.0 * (k - 1))))
                > 13.277 AS BIGINT) AS heteroscedastic
    FROM tot
"""


def agg_morans_i(spark: SparkSession, sf: str) -> DataFrame:
    """Moran's I spatial autocorrelation of nation-level mean account
    balance under a same-region contiguity weight matrix (w_ij = 1 iff
    region(i) = region(j), i != j).  The pair sum over w_ij z_i z_j
    collapses to per-region ``(sum z)^2 - sum z^2`` — NO pair join at
    any scale, the sufficient-statistics discipline.  Scale: one
    groupBy per nation then per region; 25-row closing stage."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    nat = (
        c.groupBy("c_nationkey")
        .agg(
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0
                / F.count(F.lit(1))
            ).alias("m")
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    cen = nat.crossJoin(
        F.broadcast(nat.agg((F.sum("m") / F.count(F.lit(1))).alias("mbar")))
    ).select("n_regionkey", (F.col("m") - F.col("mbar")).alias("z"))
    reg = cen.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    tot = reg.agg(
        F.sum("nr").alias("n"),
        F.sum(F.col("nr") * (F.col("nr") - 1)).alias("sw"),
        F.sum(F.col("sz") * F.col("sz") - F.col("szz")).alias("cross"),
        F.sum("szz").alias("den"),
    )
    i_stat = (F.col("n") / F.col("sw")) * (F.col("cross") / F.col("den"))
    return tot.select(
        F.col("n").cast("long").alias("n_nations"),
        F.col("sw").cast("long").alias("weight_sum"),
        F.round(i_stat, 6).alias("morans_i"),
        F.round(-1.0 / (F.col("n") - 1), 6).alias("expected_i"),
        (i_stat > -1.0 / (F.col("n") - 1)).cast("long").alias("clustered"),
    )


QUERIES["agg_morans_i"] = agg_morans_i

ORACLES["agg_morans_i"] = """
    WITH nat AS (
      SELECT c_nationkey,
             sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / count(*) AS m
      FROM customer GROUP BY 1),
    j AS (
      SELECT n_regionkey, m FROM nat JOIN nation ON c_nationkey = n_nationkey),
    cen AS (
      SELECT n_regionkey, m - (SELECT sum(m) / count(*) FROM j) AS z FROM j),
    reg AS (
      SELECT n_regionkey, count(*) AS nr, sum(z) AS sz, sum(z * z) AS szz
      FROM cen GROUP BY 1),
    tot AS (
      SELECT sum(nr) AS n, sum(nr * (nr - 1)) AS sw,
             sum(sz * sz - szz) AS crs, sum(szz) AS den
      FROM reg)
    SELECT CAST(n AS BIGINT) AS n_nations, CAST(sw AS BIGINT) AS weight_sum,
           round((n / CAST(sw AS DOUBLE)) * (crs / den), 6) AS morans_i,
           round(-1.0 / (n - 1), 6) AS expected_i,
           CAST((n / CAST(sw AS DOUBLE)) * (crs / den) > -1.0 / (n - 1)
                AS BIGINT) AS clustered
    FROM tot
"""


def agg_icc(spark: SparkSession, sf: str) -> DataFrame:
    """Intraclass correlation ICC(1) of order value within customer
    nations, from the one-way random-effects ANOVA decomposition with
    the unbalanced-design group-size correction
    ``n0 = (N - sum(n_i^2)/N) / (a - 1)``.  Between/within sums of
    squares close from exact cents moments (hi/lo-split squares).
    Scale: one partial-agg groupBy on the 25-value nation key."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    g = j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *_split_sum(F.col("cents") * F.col("cents"), "q"),
    )
    # exact total squares: sum the hi/lo INTEGER parts across groups
    # before the one float conversion; the between-groups float sum
    # folds in nation-key order (array_sort) so the 25-term float
    # accumulation is order-identical in both engines
    tot = g.agg(
        F.count(F.lit(1)).alias("a"),
        F.sum("n").alias("bign"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
        F.sum("s").alias("bigs"),
        F.sum("q_hi").alias("q_hi"),
        F.sum("q_lo").alias("q_lo"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("c_nationkey").alias("k"),
                        ((F.col("s") / 100.0) * (F.col("s") / 100.0) / F.col("n")).alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("ssb_raw"),
    ).select(
        "a",
        "bign",
        "snn",
        "bigs",
        "ssb_raw",
        _split_val("q", 10000.0).alias("qq"),
    )
    grand = (F.col("bigs") / 100.0) * (F.col("bigs") / 100.0) / F.col("bign")
    ssb = F.col("ssb_raw") - grand
    ssw = F.col("qq") - F.col("ssb_raw")
    msb = ssb / (F.col("a") - 1)
    msw = ssw / (F.col("bign") - F.col("a"))
    n0 = (F.col("bign") - F.col("snn") / F.col("bign")) / (F.col("a") - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    return tot.select(
        F.col("a").cast("long").alias("groups"),
        F.col("bign").cast("long").alias("n_total"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(n0, 6).alias("n0"),
        F.round(icc, 6).alias("icc1"),
    )


QUERIES["agg_icc"] = agg_icc

ORACLES["agg_icc"] = """
    WITH j AS (
      SELECT c_nationkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey),
    g AS (
      SELECT c_nationkey, count(*) AS n, sum(cents) AS s,
             sum(cents * cents // 1073741824) AS q_hi,
             sum(cents * cents % 1073741824) AS q_lo
      FROM j GROUP BY 1),
    tot AS (
      SELECT count(*) AS a, sum(n) AS bign, sum(n * n) AS snn, sum(s) AS bigs,
             (CAST(sum(q_hi) AS DOUBLE) * 1073741824.0
              + CAST(sum(q_lo) AS DOUBLE)) / 10000.0 AS qq,
             list_reduce(
               list_prepend(0.0, list((s / 100.0) * (s / 100.0) / n
                                      ORDER BY c_nationkey)),
               (a2, b2) -> a2 + b2) AS ssb_raw
      FROM g),
    f AS (
      SELECT a, bign,
             (ssb_raw - (bigs / 100.0) * (bigs / 100.0) / bign) / (a - 1) AS msb,
             (qq - ssb_raw) / (bign - a) AS msw,
             (bign - snn / CAST(bign AS DOUBLE)) / (a - 1) AS n0
      FROM tot)
    SELECT CAST(a AS BIGINT) AS groups, CAST(bign AS BIGINT) AS n_total,
           round(msb, 4) AS ms_between, round(msw, 4) AS ms_within,
           round(n0, 6) AS n0,
           round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc1
    FROM f
"""


def agg_friedman_test(spark: SparkSession, sf: str) -> DataFrame:
    """Friedman rank test for treatment effects across matched blocks
    (blocks = customer nations, treatments = the 5 order priorities,
    response = mean order value) — the nonparametric two-way companion
    of the registered Kruskal-Wallis.  Ranks live on the 25x5 grid
    (never the raw rows); the rank sums are exact integers and the
    statistic closes in one float expression.  Scale: one partial-agg
    groupBy to the grid, then constant-size work."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg((F.sum("cents") / F.count(F.lit(1))).alias("m"))
    )
    wk = Window.partitionBy("c_nationkey").orderBy("m")
    ranked = cell.withColumn("r", F.rank().over(wk))
    rsum = ranked.groupBy("o_orderpriority").agg(
        F.sum("r").alias("rj"), F.count(F.lit(1)).alias("n")
    )
    tot = rsum.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("n"),
        F.sum(F.col("rj") * F.col("rj")).alias("srr"),
    )
    chi2 = (
        12.0 / (F.col("n") * F.col("k") * (F.col("k") + 1)) * F.col("srr")
        - 3.0 * F.col("n") * (F.col("k") + 1)
    )
    return tot.select(
        F.col("n").cast("long").alias("blocks"),
        F.col("k").cast("long").alias("treatments"),
        F.col("srr").cast("long").alias("rank_sq_sum"),
        F.round(chi2, 6).alias("friedman_chi2"),
        (chi2 > 13.277).cast("long").alias("significant"),  # df=4 @ .01
    )


QUERIES["agg_friedman_test"] = agg_friedman_test

ORACLES["agg_friedman_test"] = """
    WITH cell AS (
      SELECT c_nationkey, o_orderpriority,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) AS m
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT c_nationkey, o_orderpriority,
             rank() OVER (PARTITION BY c_nationkey ORDER BY m) AS r
      FROM cell),
    rsum AS (
      SELECT o_orderpriority, sum(r) AS rj, count(*) AS n
      FROM ranked GROUP BY 1),
    tot AS (
      SELECT count(*) AS k, max(n) AS n, sum(rj * rj) AS srr FROM rsum)
    SELECT CAST(n AS BIGINT) AS blocks, CAST(k AS BIGINT) AS treatments,
           CAST(srr AS BIGINT) AS rank_sq_sum,
           round(12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1), 6)
             AS friedman_chi2,
           CAST((12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1)) > 13.277
                AS BIGINT) AS significant
    FROM tot
"""


def agg_cochran_q(spark: SparkSession, sf: str) -> DataFrame:
    """Cochran's Q for k=3 matched binary outcomes per subject
    (subjects = nations; outcomes = urgent-share, big-order-share and
    odd-customer-share each exceeding a fixed threshold) — the binary
    repeated-measures companion of Friedman.  Every comparison is
    integer cross-multiplication (share > p/100 as cnt*100 > p*total),
    so the 0/1 grid is bit-identical across engines; Q closes from
    integer row/column totals.  Scale: one groupBy to 25 subjects."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").alias("u"),
        (F.col("o_totalprice") > 150000).cast("long").alias("b"),
        (F.col("o_custkey") % 2).alias("odd"),
    )
    subj = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("u").alias("cu"),
            F.sum("b").alias("cb"),
            F.sum("odd").alias("co"),
        )
        .select(
            "c_nationkey",
            (F.col("cu") * 100 > F.col("n") * 38).cast("long").alias("x1"),
            (F.col("cb") * 100 > F.col("n") * 30).cast("long").alias("x2"),
            (F.col("co") * 2 > F.col("n")).cast("long").alias("x3"),
        )
    )
    tot = subj.agg(
        F.count(F.lit(1)).alias("n_subj"),
        F.sum("x1").alias("c1"),
        F.sum("x2").alias("c2"),
        F.sum("x3").alias("c3"),
        F.sum(F.col("x1") + F.col("x2") + F.col("x3")).alias("sr"),
        F.sum(
            (F.col("x1") + F.col("x2") + F.col("x3"))
            * (F.col("x1") + F.col("x2") + F.col("x3"))
        ).alias("srr"),
    )
    k = F.lit(3)
    csum = F.col("c1") + F.col("c2") + F.col("c3")
    css = (
        F.col("c1") * F.col("c1")
        + F.col("c2") * F.col("c2")
        + F.col("c3") * F.col("c3")
    )
    q = (
        (k - 1).cast("double")
        * (k * css - csum * csum)
        / (k * F.col("sr") - F.col("srr"))
    )
    return tot.select(
        F.col("n_subj").cast("long").alias("subjects"),
        F.col("c1").cast("long").alias("flag_urgent"),
        F.col("c2").cast("long").alias("flag_big"),
        F.col("c3").cast("long").alias("flag_odd"),
        F.round(q, 6).alias("cochran_q"),
        (q > 9.21).cast("long").alias("significant"),  # df=2 @ .01
    )


QUERIES["agg_cochran_q"] = agg_cochran_q

ORACLES["agg_cochran_q"] = """
    WITH o AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS u,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS b,
             o_custkey % 2 AS odd
      FROM orders),
    subj AS (
      SELECT c_nationkey,
             CAST(sum(u) * 100 > count(*) * 38 AS BIGINT) AS x1,
             CAST(sum(b) * 100 > count(*) * 30 AS BIGINT) AS x2,
             CAST(sum(odd) * 2 > count(*) AS BIGINT) AS x3
      FROM o JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    tot AS (
      SELECT count(*) AS n_subj, sum(x1) AS c1, sum(x2) AS c2, sum(x3) AS c3,
             sum(x1 + x2 + x3) AS sr,
             sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS srr
      FROM subj)
    SELECT CAST(n_subj AS BIGINT) AS subjects,
           CAST(c1 AS BIGINT) AS flag_urgent,
           CAST(c2 AS BIGINT) AS flag_big,
           CAST(c3 AS BIGINT) AS flag_odd,
           round(2.0 * (3 * (c1*c1 + c2*c2 + c3*c3)
                        - (c1 + c2 + c3) * (c1 + c2 + c3))
                 / (3 * sr - srr), 6) AS cochran_q,
           CAST((2.0 * (3 * (c1*c1 + c2*c2 + c3*c3)
                        - (c1 + c2 + c3) * (c1 + c2 + c3))
                 / (3 * sr - srr)) > 9.21 AS BIGINT) AS significant
    FROM tot
"""


def agg_jarque_bera(spark: SparkSession, sf: str) -> DataFrame:
    """Jarque-Bera normality test on order values: skewness and excess
    kurtosis from standardized values QUANTIZED to a 1e-3 grid (the
    scaled-BIGINT-folds discipline — q = round(z*1000) keeps q^3/q^4
    per-row BIGINT-exact, hi/lo-split for the quartic sum, so the
    higher moments are bit-identical across engines; the grid bias is
    O(1e-3), documented).  Two passes: exact cents moments fit the
    scaler; one map-side pass folds the quantized powers."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    mom = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *_split_sum(F.col("cents") * F.col("cents"), "q"),
    ).select(
        "n",
        (F.col("s") / 100.0 / F.col("n")).alias("mu"),
        F.sqrt(
            (
                _split_val("q", 10000.0)
                - F.col("s") / 100.0 * (F.col("s") / 100.0) / F.col("n")
            )
            / F.col("n")
        ).alias("sd"),
    )
    qz = o.crossJoin(F.broadcast(mom)).select(
        "n",
        F.round((F.col("cents") / 100.0 - F.col("mu")) / F.col("sd") * 1000)
        .cast("long")
        .alias("qz"),
    )
    acc = qz.groupBy("n").agg(
        F.sum(F.col("qz") * F.col("qz") * F.col("qz")).alias("s3"),
        *_split_sum(
            F.col("qz") * F.col("qz") * F.col("qz") * F.col("qz"), "s4"
        ),
    )
    skew = F.col("s3") / 1.0e9 / F.col("n")
    kurt = _split_val("s4", 1.0e12) / F.col("n")
    jb = F.col("n") / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    return acc.select(
        F.col("n").cast("long").alias("n"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt - 3.0, 6).alias("excess_kurtosis"),
        F.round(jb, 4).alias("jarque_bera"),
        (jb > 9.21).cast("long").alias("non_normal"),  # df=2 @ .01
    )


QUERIES["agg_jarque_bera"] = agg_jarque_bera

ORACLES["agg_jarque_bera"] = """
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    mom AS (
      SELECT count(*) AS n, sum(cents) / 100.0 / count(*) AS mu,
             sqrt(((CAST(sum(cents * cents // 1073741824) AS DOUBLE) * 1073741824.0
                    + CAST(sum(cents * cents % 1073741824) AS DOUBLE)) / 10000.0
                   - sum(cents) / 100.0 * (sum(cents) / 100.0) / count(*))
                  / count(*)) AS sd
      FROM o),
    qz AS (
      SELECT n, CAST(round((cents / 100.0 - mu) / sd * 1000) AS BIGINT) AS qz
      FROM o CROSS JOIN mom),
    acc AS (
      SELECT n, sum(qz * qz * qz) AS s3,
             sum(qz * qz * qz * qz // 1073741824) AS s4_hi,
             sum(qz * qz * qz * qz % 1073741824) AS s4_lo
      FROM qz GROUP BY n),
    f AS (
      SELECT n, s3 / 1e9 / n AS skew,
             (CAST(s4_hi AS DOUBLE) * 1073741824.0 + CAST(s4_lo AS DOUBLE))
               / 1e12 / n AS kurt
      FROM acc)
    SELECT CAST(n AS BIGINT) AS n, round(skew, 6) AS skewness,
           round(kurt - 3.0, 6) AS excess_kurtosis,
           round(n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 4)
             AS jarque_bera,
           CAST((n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0))
                > 9.21 AS BIGINT) AS non_normal
    FROM f
"""


def agg_bhattacharyya(spark: SparkSession, sf: str) -> DataFrame:
    """Bhattacharyya coefficient and Hellinger distance between the
    order-value distributions of two customer cohorts (odd vs even
    custkey) over a FIXED 12-bin histogram — the bounded-support
    distribution-distance companion of the registered PSI/KS drift
    checks.  Bin masses are exact integer counts; the 12-term sqrt sum
    folds in bin order (ordered-array reduce) so the float
    accumulation is order-identical across engines."""
    o = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 2).alias("variant"),
        F.least(F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(11)).alias(
            "bin"
        ),
    )
    cells = o.groupBy("bin").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    tot = cells.agg(
        F.sum("n0").alias("t0"),
        F.sum("n1").alias("t1"),
        F.count(F.lit(1)).alias("bins"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("bin").alias("k"),
                        F.struct(F.col("n0").alias("a"), F.col("n1").alias("b")).alias(
                            "v"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + F.sqrt(x["v"]["a"].cast("double") * x["v"]["b"].cast("double")),
        ).alias("__sqprod"),
    )
    bc = F.col("__sqprod") / F.sqrt(F.col("t0").cast("double") * F.col("t1"))
    return tot.select(
        F.col("bins").cast("long").alias("bins"),
        F.col("t0").cast("long").alias("n_ctl"),
        F.col("t1").cast("long").alias("n_trt"),
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(F.sqrt(1.0 - bc), 6).alias("hellinger"),
    )


QUERIES["agg_bhattacharyya"] = agg_bhattacharyya

ORACLES["agg_bhattacharyya"] = """
    WITH o AS (
      SELECT o_custkey % 2 AS variant,
             least(CAST(floor(o_totalprice / 50000) AS BIGINT), 11) AS bin
      FROM orders),
    cells AS (
      SELECT bin,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM o GROUP BY 1),
    tot AS (
      SELECT sum(n0) AS t0, sum(n1) AS t1, count(*) AS bins,
             list_reduce(
               list_prepend(0.0,
                 list(sqrt(CAST(n0 AS DOUBLE) * n1) ORDER BY bin)),
               (a, b) -> a + b) AS sqprod
      FROM cells)
    SELECT CAST(bins AS BIGINT) AS bins, CAST(t0 AS BIGINT) AS n_ctl,
           CAST(t1 AS BIGINT) AS n_trt,
           round(sqprod / sqrt(CAST(t0 AS DOUBLE) * t1), 6) AS bhattacharyya,
           round(sqrt(1.0 - sqprod / sqrt(CAST(t0 AS DOUBLE) * t1)), 6)
             AS hellinger
    FROM tot
"""


def agg_permutation_test(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic permutation test for the treatment effect on
    order value: B=64 pseudo-permutations reassign each order's variant
    by md5(orderkey, b), the per-resample mean difference closes from
    exact cents sums, and the p-value is the exceedance fraction —
    Monte-Carlo inference with zero RNG state, rerunnable bit-for-bit
    on any partitioning (the sampling-family discipline).  Scale: the
    explode is B x rows map-side into one partial-agg groupBy(b);
    nothing is ever collected."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 2).alias("variant"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    obs = o.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    obs_piv = obs.agg(
        F.max(F.when(F.col("variant") == 1, F.col("s") / 100.0 / F.col("n"))).alias(
            "m1"
        ),
        F.max(F.when(F.col("variant") == 0, F.col("s") / 100.0 / F.col("n"))).alias(
            "m0"
        ),
    ).select((F.col("m1") - F.col("m0")).alias("obs_diff"))
    perm = o.select(
        "o_orderkey", "cents", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b")
    ).select(
        "b",
        "cents",
        (
            md5_int32(F.concat_ws(":", F.col("o_orderkey"), F.col("b"))) % 2
        ).alias("pv"),
    )
    pg = perm.groupBy("b").agg(
        F.sum(F.when(F.col("pv") == 1, F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("pv") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("pv") == 0, F.col("cents")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("pv") == 0, 1).otherwise(0)).alias("n0"),
    )
    diffs = pg.select(
        (F.col("s1") / 100.0 / F.col("n1") - F.col("s0") / 100.0 / F.col("n0")).alias(
            "d"
        )
    )
    out = diffs.crossJoin(F.broadcast(obs_piv)).agg(
        F.count(F.lit(1)).alias("bb"),
        F.max("obs_diff").alias("obs"),
        F.sum(
            (F.abs(F.col("d")) >= F.abs(F.col("obs_diff"))).cast("long")
        ).alias("ge"),
    )
    return out.select(
        F.round(F.col("obs"), 6).alias("obs_diff"),
        F.col("bb").cast("long").alias("n_resamples"),
        F.col("ge").cast("long").alias("n_exceeding"),
        F.round((1.0 + F.col("ge")) / (F.col("bb") + 1.0), 6).alias("p_value"),
    )


QUERIES["agg_permutation_test"] = agg_permutation_test


def _perm_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    h = md5_int32_sql("o_orderkey || ':' || b")
    return f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey % 2 AS variant,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    obs AS (
      SELECT sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) / 100.0
               / sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
             - sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) / 100.0
               / sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS obs_diff
      FROM o),
    perm AS (
      SELECT b, cents, {h} % 2 AS pv
      FROM o CROSS JOIN (SELECT unnest(range(64)) AS b)),
    pg AS (
      SELECT b,
             sum(CASE WHEN pv = 1 THEN cents ELSE 0 END) AS s1,
             sum(CASE WHEN pv = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN pv = 0 THEN cents ELSE 0 END) AS s0,
             sum(CASE WHEN pv = 0 THEN 1 ELSE 0 END) AS n0
      FROM perm GROUP BY 1),
    diffs AS (
      SELECT s1 / 100.0 / n1 - s0 / 100.0 / n0 AS d FROM pg)
    SELECT round(max(obs_diff), 6) AS obs_diff,
           CAST(count(*) AS BIGINT) AS n_resamples,
           CAST(sum(CASE WHEN abs(d) >= abs(obs_diff) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exceeding,
           round((1.0 + sum(CASE WHEN abs(d) >= abs(obs_diff) THEN 1 ELSE 0 END))
                 / (count(*) + 1.0), 6) AS p_value
    FROM diffs CROSS JOIN obs
"""


ORACLES["agg_permutation_test"] = _perm_oracle()


# --- ETL / ops ---------------------------------------------------------------


def etl_salt_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-salting PLANNER: from the supplier-key histogram of
    lineitem, compute each hot key's salt factor ``ceil(rows / target)``
    for a fixed rows-per-task budget — the executable version of the
    join_salted_skew operator's tuning step (the registered
    agg_key_skew MEASURES skew; this emits the plan a 1000-executor
    job would apply).  Output is the top-20 hottest keys plus their
    factors; the histogram itself is one partial-agg groupBy."""
    target = 200  # rows per salted task (literal budget)
    li = t(spark, sf, "lineitem").select("l_suppkey")
    hist = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("rows"))
    plan = hist.select(
        "l_suppkey",
        "rows",
        F.greatest(F.ceil(F.col("rows") / float(target)), F.lit(1))
        .cast("long")
        .alias("salt_factor"),
        (F.col("rows") > target).cast("long").alias("needs_salt"),
    )
    return (
        plan.orderBy(F.col("rows").desc(), F.col("l_suppkey").asc())
        .limit(20)
        .select(
            F.col("l_suppkey").cast("long").alias("l_suppkey"),
            F.col("rows").cast("long").alias("rows"),
            "salt_factor",
            "needs_salt",
        )
    )


QUERIES["etl_salt_plan"] = etl_salt_plan

ORACLES["etl_salt_plan"] = """
    WITH hist AS (
      SELECT l_suppkey, count(*) AS rows_ FROM lineitem GROUP BY 1)
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
           CAST(rows_ AS BIGINT) AS rows,
           CAST(greatest(ceil(rows_ / 200.0), 1) AS BIGINT) AS salt_factor,
           CAST(rows_ > 200 AS BIGINT) AS needs_salt
    FROM hist ORDER BY rows_ DESC, l_suppkey ASC LIMIT 20
"""


def etl_sentinel_missingness(spark: SparkSession, sf: str) -> DataFrame:
    """Missingness-PATTERN audit: the joint distribution of per-field
    missing indicators (here sentinel-defined: error events carry no
    usable value, high props-k marks a degraded payload, a modular
    user slice is withheld) with each pattern's count and share, plus
    the lift of the pairwise co-missingness over independence — the
    registered etl_null_audit is per-column; real pipelines break on
    CORRELATED missingness.  One groupBy over 8 patterns."""
    e = t(spark, sf, "events").select(
        (F.col("event_type") == "error").cast("long").alias("m_value"),
        (
            F.get_json_object("props", "$.k").cast("long") >= 90
        ).cast("long").alias("m_props"),
        (F.col("user_id") % 17 == 0).cast("long").alias("m_user"),
    )
    pat = e.groupBy("m_value", "m_props", "m_user").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = pat.agg(
        F.sum("n").alias("nt"),
        F.sum(F.col("m_value") * F.col("n")).alias("nv"),
        F.sum(F.col("m_props") * F.col("n")).alias("np"),
        F.sum(F.col("m_value") * F.col("m_props") * F.col("n")).alias("nvp"),
    )
    return (
        pat.crossJoin(F.broadcast(tot))
        .select(
            F.col("m_value").cast("long").alias("m_value"),
            F.col("m_props").cast("long").alias("m_props"),
            F.col("m_user").cast("long").alias("m_user"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("nt"), 6).alias("share"),
            F.round(
                (F.col("nvp") * F.col("nt")).cast("double")
                / (F.col("nv") * F.col("np")),
                6,
            ).alias("value_props_lift"),
        )
        .orderBy("m_value", "m_props", "m_user")
    )


QUERIES["etl_sentinel_missingness"] = etl_sentinel_missingness

ORACLES["etl_sentinel_missingness"] = """
    WITH e AS (
      SELECT CAST(event_type = 'error' AS BIGINT) AS m_value,
             CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
                  AS BIGINT) AS m_props,
             CAST(user_id % 17 = 0 AS BIGINT) AS m_user
      FROM events),
    pat AS (
      SELECT m_value, m_props, m_user, count(*) AS n
      FROM e GROUP BY 1, 2, 3),
    tot AS (
      SELECT sum(n) AS nt, sum(m_value * n) AS nv, sum(m_props * n) AS np,
             sum(m_value * m_props * n) AS nvp
      FROM pat)
    SELECT CAST(m_value AS BIGINT) AS m_value,
           CAST(m_props AS BIGINT) AS m_props,
           CAST(m_user AS BIGINT) AS m_user,
           CAST(n AS BIGINT) AS n,
           round(n / CAST(nt AS DOUBLE), 6) AS share,
           round(CAST(nvp * nt AS DOUBLE) / (nv * np), 6) AS value_props_lift
    FROM pat CROSS JOIN tot
    ORDER BY m_value, m_props, m_user
"""


def etl_type_inference(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic type-inference AUDIT over stringly-typed columns — the
    reference's F9 inference pass re-expressed as a declarative report
    (SURVEY.md keeps runtime schemas explicit by design; this query is
    the profiling step that JUSTIFIES a schema).  Three stringified
    order columns are profiled by REGEX (never try_cast — engines
    disagree on '1.5'::BIGINT coercion): parseable-as-int/double/date
    rates and the inferred type by priority.  Map-side expressions
    into a 3-row aggregate."""
    o = t(spark, sf, "orders")
    cols = [
        ("o_orderkey_str", F.col("o_orderkey").cast("string")),
        ("o_totalprice_str", F.format_string("%.2f", F.col("o_totalprice"))),
        ("o_orderdate_str", F.date_format("o_orderdate", "yyyy-MM-dd")),
    ]
    stacked = None
    for name, expr in cols:
        part = o.select(F.lit(name).alias("column"), expr.alias("v"))
        stacked = part if stacked is None else stacked.unionByName(part)
    flags = stacked.select(
        "column",
        F.col("v").rlike("^-?[0-9]+$").cast("long").alias("is_int"),
        F.col("v").rlike("^-?[0-9]+(\\.[0-9]+)?$").cast("long").alias("is_num"),
        F.col("v")
        .rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
        .cast("long")
        .alias("is_date"),
    )
    g = flags.groupBy("column").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_int").alias("ci"),
        F.sum("is_num").alias("cn"),
        F.sum("is_date").alias("cd"),
    )
    return g.select(
        "column",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("ci") / F.col("n"), 6).alias("int_rate"),
        F.round(F.col("cn") / F.col("n"), 6).alias("numeric_rate"),
        F.round(F.col("cd") / F.col("n"), 6).alias("date_rate"),
        F.when(F.col("ci") == F.col("n"), "BIGINT")
        .when(F.col("cn") == F.col("n"), "DOUBLE")
        .when(F.col("cd") == F.col("n"), "DATE")
        .otherwise("VARCHAR")
        .alias("inferred_type"),
    ).orderBy("column")


QUERIES["etl_type_inference"] = etl_type_inference

ORACLES["etl_type_inference"] = """
    WITH stacked AS (
      SELECT 'o_orderkey_str' AS col_, CAST(o_orderkey AS VARCHAR) AS v
      FROM orders
      UNION ALL
      SELECT 'o_totalprice_str', printf('%.2f', o_totalprice) FROM orders
      UNION ALL
      SELECT 'o_orderdate_str', strftime(o_orderdate, '%Y-%m-%d') FROM orders),
    flags AS (
      SELECT col_,
             CAST(regexp_matches(v, '^-?[0-9]+$') AS BIGINT) AS is_int,
             CAST(regexp_matches(v, '^-?[0-9]+(\\.[0-9]+)?$') AS BIGINT) AS is_num,
             CAST(regexp_matches(v, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') AS BIGINT)
               AS is_date
      FROM stacked),
    g AS (
      SELECT col_, count(*) AS n, sum(is_int) AS ci, sum(is_num) AS cn,
             sum(is_date) AS cd
      FROM flags GROUP BY 1)
    SELECT col_ AS "column", CAST(n AS BIGINT) AS n,
           round(ci / CAST(n AS DOUBLE), 6) AS int_rate,
           round(cn / CAST(n AS DOUBLE), 6) AS numeric_rate,
           round(cd / CAST(n AS DOUBLE), 6) AS date_rate,
           CASE WHEN ci = n THEN 'BIGINT'
                WHEN cn = n THEN 'DOUBLE'
                WHEN cd = n THEN 'DATE'
                ELSE 'VARCHAR' END AS inferred_type
    FROM g ORDER BY col_
"""


def etl_id_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands audit over the event_id sequence: islands of
    consecutive ids via the ``id - row_number()`` grouping trick, gap
    histogram between islands, and the largest islands — the standard
    "did ingestion drop a range" check (the registered ts_gap_stats
    audits TIME gaps; this audits the SEQUENCE).  One window over the
    sorted ids, then a bounded groupBy on island anchors."""
    e = t(spark, sf, "events").select(F.col("event_id").cast("long").alias("id"))
    w = Window.orderBy("id")
    isl = e.withColumn("grp", F.col("id") - F.row_number().over(w))
    islands = isl.groupBy("grp").agg(
        F.count(F.lit(1)).alias("size"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )
    tot = islands.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("size").alias("n_ids"),
        F.max("size").alias("largest_island"),
        F.min("lo").alias("min_id"),
        F.max("hi").alias("max_id"),
    )
    return tot.select(
        F.col("n_islands").cast("long").alias("n_islands"),
        F.col("n_ids").cast("long").alias("n_ids"),
        F.col("largest_island").cast("long").alias("largest_island"),
        (F.col("max_id") - F.col("min_id") + 1 - F.col("n_ids"))
        .cast("long")
        .alias("missing_ids"),
        F.round(
            F.col("n_ids") / (F.col("max_id") - F.col("min_id") + 1.0), 6
        ).alias("density"),
    )


QUERIES["etl_id_islands"] = etl_id_islands

ORACLES["etl_id_islands"] = """
    WITH e AS (SELECT CAST(event_id AS BIGINT) AS id FROM events),
    isl AS (
      SELECT id, id - row_number() OVER (ORDER BY id) AS grp FROM e),
    islands AS (
      SELECT grp, count(*) AS size_, min(id) AS lo, max(id) AS hi
      FROM isl GROUP BY 1),
    tot AS (
      SELECT count(*) AS n_islands, sum(size_) AS n_ids,
             max(size_) AS largest_island, min(lo) AS min_id, max(hi) AS max_id
      FROM islands)
    SELECT CAST(n_islands AS BIGINT) AS n_islands,
           CAST(n_ids AS BIGINT) AS n_ids,
           CAST(largest_island AS BIGINT) AS largest_island,
           CAST(max_id - min_id + 1 - n_ids AS BIGINT) AS missing_ids,
           round(n_ids / (max_id - min_id + 1.0), 6) AS density
    FROM tot
"""


def etl_erasure_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-erasure IMPACT analysis: for a deterministic 5%
    deletion cohort (md5(custkey) % 20 == 0), count the rows each
    table must tombstone when the delete cascades customer -> orders
    -> lineitem — the planning query a GDPR pipeline runs before the
    actual anti-join rewrite (the registered etl_pseudonymize handles
    the keep-side; this prices the delete-side).  Broadcast the cohort
    keys; each count is one semi-joined aggregate."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    c = t(spark, sf, "customer").select("c_custkey")
    cohort = c.where(md5_int32(F.col("c_custkey").cast("string")) % 20 == 0)
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    oc = o.join(F.broadcast(cohort), o.o_custkey == cohort.c_custkey)
    li = t(spark, sf, "lineitem").select("l_orderkey")
    lc = li.join(
        oc.select("o_orderkey").distinct(),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    counts = (
        cohort.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("customer").alias("table"), F.col("n").cast("long").alias("rows_to_erase")
        )
        .unionByName(
            oc.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("orders").alias("table"),
                F.col("n").cast("long").alias("rows_to_erase"),
            )
        )
        .unionByName(
            lc.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("lineitem").alias("table"),
                F.col("n").cast("long").alias("rows_to_erase"),
            )
        )
    )
    return counts.orderBy("table")


QUERIES["etl_erasure_cascade"] = etl_erasure_cascade


def _erasure_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    h = md5_int32_sql("CAST(c_custkey AS VARCHAR)")
    return f"""
    WITH cohort AS (
      SELECT c_custkey FROM customer WHERE {h} % 20 = 0),
    oc AS (
      SELECT o_orderkey FROM orders JOIN cohort ON o_custkey = c_custkey),
    lc AS (
      SELECT l_orderkey FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM oc))
    SELECT 'customer' AS "table",
           (SELECT CAST(count(*) AS BIGINT) FROM cohort) AS rows_to_erase
    UNION ALL
    SELECT 'lineitem', (SELECT CAST(count(*) AS BIGINT) FROM lc)
    UNION ALL
    SELECT 'orders', (SELECT CAST(count(*) AS BIGINT) FROM oc)
    ORDER BY "table"
"""


ORACLES["etl_erasure_cascade"] = _erasure_oracle()


# --- time series -------------------------------------------------------------


def ts_variance_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on daily revenue: VR(q) =
    Var(y_t - y_{t-q}) / (q * Var(y_t - y_{t-1})) for q in {2, 4, 8} —
    the standard random-walk diagnostic.  Differences are exact cents
    BIGINTs via day-ordered lags; all second moments are hi/lo-split
    integer sums, so each VR closes as one float expression.  Scale:
    per-DAY table after the first groupBy; three fixed lags."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    w = Window.orderBy("d")
    rows = []
    for q in (2, 4, 8):
        dq = day.select((F.col("y") - F.lag("y", q).over(w)).alias("z")).where(
            F.col("z").isNotNull()
        )
        d1 = day.select((F.col("y") - F.lag("y", 1).over(w)).alias("z")).where(
            F.col("z").isNotNull()
        )

        def moments(df, tag):
            return df.agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum("z").alias(f"s_{tag}"),
                *_split_sum(F.col("z") * F.col("z"), f"q_{tag}"),
            )

        mq = moments(dq, "q")
        m1 = moments(d1, "o")
        vq = (
            _split_val("q_q", 1.0)
            - F.col("s_q").cast("double") * F.col("s_q") / F.col("n_q")
        ) / (F.col("n_q") - 1)
        v1 = (
            _split_val("q_o", 1.0)
            - F.col("s_o").cast("double") * F.col("s_o") / F.col("n_o")
        ) / (F.col("n_o") - 1)
        rows.append(
            mq.crossJoin(F.broadcast(m1)).select(
                F.lit(q).cast("long").alias("q"),
                F.col("n_q").cast("long").alias("n_diffs"),
                F.round(vq / (q * v1), 6).alias("variance_ratio"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("q")


QUERIES["ts_variance_ratio"] = ts_variance_ratio


def _vr_oracle() -> str:
    parts = []
    for q in (2, 4, 8):
        parts.append(f"""
    SELECT CAST({q} AS BIGINT) AS q,
           (SELECT CAST(count(*) AS BIGINT) FROM dq{q}) AS n_diffs,
           round(
             ((SELECT (CAST(sum(z * z // 1073741824) AS DOUBLE) * 1073741824.0
                       + CAST(sum(z * z % 1073741824) AS DOUBLE)
                       - CAST(sum(z) AS DOUBLE) * sum(z) / count(*))
                      / (count(*) - 1) FROM dq{q})
              / ({q} * (SELECT (CAST(sum(z * z // 1073741824) AS DOUBLE) * 1073741824.0
                        + CAST(sum(z * z % 1073741824) AS DOUBLE)
                        - CAST(sum(z) AS DOUBLE) * sum(z) / count(*))
                       / (count(*) - 1) FROM d1))), 6) AS variance_ratio""")
    sel = "\n    UNION ALL\n".join(parts)
    lags = "\n".join(
        f"    dq{q} AS (SELECT z FROM (SELECT y - lag(y, {q}) OVER (ORDER BY d) AS z"
        f" FROM day) WHERE z IS NOT NULL),"
        for q in (2, 4, 8)
    )
    return f"""
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
{lags}
    d1 AS (SELECT z FROM (SELECT y - lag(y, 1) OVER (ORDER BY d) AS z
           FROM day) WHERE z IS NOT NULL)
{sel}
    ORDER BY q
"""


ORACLES["ts_variance_ratio"] = _vr_oracle()


def ts_adf_score(spark: SparkSession, sf: str) -> DataFrame:
    """Dickey-Fuller unit-root score on daily revenue: the lag-1
    regression dy_t = a + b*y_{t-1} + e closed entirely from exact
    integer sums (cents lags/diffs; hi/lo-split cross moments), with
    the t-statistic of b derived from the same sufficient statistics —
    no float accumulation anywhere, one fixed expression tree.
    b near 0 = unit root (random walk); strongly negative t rejects.
    Scale: per-DAY table; five scalar sums."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    w = Window.orderBy("d")
    pair = day.select(
        F.lag("y", 1).over(w).alias("x"), F.col("y").alias("ycur")
    ).where(F.col("x").isNotNull()).select(
        "x", (F.col("ycur") - F.col("x")).alias("z")
    )
    mom = pair.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("z").alias("sz"),
        *_split_sum(F.col("x") * F.col("x"), "qxx"),
        *_split_sum(F.col("x") * F.col("z"), "qxz"),
        *_split_sum(F.col("z") * F.col("z"), "qzz"),
    )
    n = F.col("n").cast("double")
    sxx = _split_val("qxx", 1.0) - F.col("sx").cast("double") * F.col("sx") / n
    sxz = _split_val("qxz", 1.0) - F.col("sx").cast("double") * F.col("sz") / n
    szz = _split_val("qzz", 1.0) - F.col("sz").cast("double") * F.col("sz") / n
    b = sxz / sxx
    sse = szz - b * sxz
    tstat = b / F.sqrt((sse / (n - 2)) / sxx)
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(b, 6).alias("beta"),
        F.round(tstat, 6).alias("adf_t"),
        (tstat < -3.43).cast("long").alias("stationary"),  # DF 1% critical
    )


QUERIES["ts_adf_score"] = ts_adf_score

ORACLES["ts_adf_score"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    pair AS (
      SELECT x, ycur - x AS z FROM (
        SELECT lag(y, 1) OVER (ORDER BY d) AS x, y AS ycur FROM day)
      WHERE x IS NOT NULL),
    mom AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(z) AS sz,
             sum(x * x // 1073741824) AS qxx_hi, sum(x * x % 1073741824) AS qxx_lo,
             sum(x * z // 1073741824) AS qxz_hi, sum(x * z % 1073741824) AS qxz_lo,
             sum(z * z // 1073741824) AS qzz_hi, sum(z * z % 1073741824) AS qzz_lo
      FROM pair),
    f AS (
      SELECT n,
        (CAST(qxx_hi AS DOUBLE) * 1073741824.0 + qxx_lo)
          - CAST(sx AS DOUBLE) * sx / n AS sxx,
        (CAST(qxz_hi AS DOUBLE) * 1073741824.0 + qxz_lo)
          - CAST(sx AS DOUBLE) * sz / n AS sxz,
        (CAST(qzz_hi AS DOUBLE) * 1073741824.0 + qzz_lo)
          - CAST(sz AS DOUBLE) * sz / n AS szz
      FROM mom),
    g AS (
      SELECT n, sxz / sxx AS b,
             (szz - (sxz / sxx) * sxz) AS sse, sxx
      FROM f)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(b, 6) AS beta,
           round(b / sqrt((sse / (n - 2)) / sxx), 6) AS adf_t,
           CAST(b / sqrt((sse / (n - 2)) / sxx) < -3.43 AS BIGINT) AS stationary
    FROM g
"""


def ts_m4_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling of the daily-revenue series into 32 equal-width
    pixel buckets: per bucket the FIRST, LAST, MIN and MAX points
    (value + day, ties to the earliest day) — the error-free
    aggregation for line-chart rendering at any zoom (Jugel et al.,
    VLDB'14).  One window pass ranks the four roles per bucket; output
    is 32 rows regardless of input size — the definition of a
    scale-bounded visualization query."""
    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    ext = day.crossJoin(
        F.broadcast(day.agg(F.min("d").alias("lo"), F.max("d").alias("hi")))
    ).select(
        "d",
        "y",
        F.least(
            (
                (F.col("d") - F.col("lo"))
                * 32
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("long"),
            F.lit(31),
        ).alias("bucket"),
    )
    wfirst = Window.partitionBy("bucket").orderBy(F.col("d").asc())
    wlast = Window.partitionBy("bucket").orderBy(F.col("d").desc())
    wmin = Window.partitionBy("bucket").orderBy(F.col("y").asc(), F.col("d").asc())
    wmax = Window.partitionBy("bucket").orderBy(F.col("y").desc(), F.col("d").asc())
    ranked = ext.select(
        "bucket",
        "d",
        "y",
        F.row_number().over(wfirst).alias("rf"),
        F.row_number().over(wlast).alias("rl"),
        F.row_number().over(wmin).alias("rn"),
        F.row_number().over(wmax).alias("rx"),
    )
    g = ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max(F.when(F.col("rf") == 1, F.col("d"))).alias("t_first"),
        F.max(F.when(F.col("rf") == 1, F.col("y"))).alias("v_first"),
        F.max(F.when(F.col("rl") == 1, F.col("d"))).alias("t_last"),
        F.max(F.when(F.col("rl") == 1, F.col("y"))).alias("v_last"),
        F.max(F.when(F.col("rn") == 1, F.col("d"))).alias("t_min"),
        F.max(F.when(F.col("rn") == 1, F.col("y"))).alias("v_min"),
        F.max(F.when(F.col("rx") == 1, F.col("d"))).alias("t_max"),
        F.max(F.when(F.col("rx") == 1, F.col("y"))).alias("v_max"),
    )
    return g.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_days").cast("long").alias("n_days"),
        *[
            F.col(c).cast("long").alias(c)
            for c in (
                "t_first",
                "v_first",
                "t_last",
                "v_last",
                "t_min",
                "v_min",
                "t_max",
                "v_max",
            )
        ],
    ).orderBy("bucket")


QUERIES["ts_m4_downsample"] = ts_m4_downsample

ORACLES["ts_m4_downsample"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    ext AS (
      SELECT d, y,
             least(CAST(floor((d - (SELECT min(d) FROM day)) * 32.0
                        / ((SELECT max(d) FROM day) - (SELECT min(d) FROM day) + 1))
                        AS BIGINT), 31) AS bucket
      FROM day),
    ranked AS (
      SELECT bucket, d, y,
             row_number() OVER (PARTITION BY bucket ORDER BY d ASC) AS rf,
             row_number() OVER (PARTITION BY bucket ORDER BY d DESC) AS rl,
             row_number() OVER (PARTITION BY bucket ORDER BY y ASC, d ASC) AS rn,
             row_number() OVER (PARTITION BY bucket ORDER BY y DESC, d ASC) AS rx
      FROM ext)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(CASE WHEN rf = 1 THEN d END) AS BIGINT) AS t_first,
           CAST(max(CASE WHEN rf = 1 THEN y END) AS BIGINT) AS v_first,
           CAST(max(CASE WHEN rl = 1 THEN d END) AS BIGINT) AS t_last,
           CAST(max(CASE WHEN rl = 1 THEN y END) AS BIGINT) AS v_last,
           CAST(max(CASE WHEN rn = 1 THEN d END) AS BIGINT) AS t_min,
           CAST(max(CASE WHEN rn = 1 THEN y END) AS BIGINT) AS v_min,
           CAST(max(CASE WHEN rx = 1 THEN d END) AS BIGINT) AS t_max,
           CAST(max(CASE WHEN rx = 1 THEN y END) AS BIGINT) AS v_max
    FROM ranked GROUP BY bucket ORDER BY bucket
"""


def ts_record_highs(spark: SparkSession, sf: str) -> DataFrame:
    """Running-record audit of daily revenue: the count of record-high
    days against the i.i.d. expectation (~ln n + gamma) — a
    distribution-free trend detector (far more records than H_n means
    genuine growth, the registered Mann-Kendall's cheap cousin).  One
    cumulative-max window; integer comparisons only, float only in the
    closing expectation."""
    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    rec = day.select(
        "d",
        "y",
        (F.col("y") > F.coalesce(F.max("y").over(w), F.lit(-1)))
        .cast("long")
        .alias("is_record"),
    )
    tot = rec.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_record").alias("records"),
        F.max(F.when(F.col("is_record") == 1, F.col("d"))).alias("last_record_day"),
    )
    expected = F.log(F.col("n").cast("double")) + 0.5772156649
    return tot.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("records").cast("long").alias("n_records"),
        F.col("last_record_day").cast("long").alias("last_record_day"),
        F.round(expected, 6).alias("expected_iid"),
        F.round(F.col("records") / expected, 6).alias("record_ratio"),
    )


QUERIES["ts_record_highs"] = ts_record_highs

ORACLES["ts_record_highs"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    rec AS (
      SELECT d, y,
             CAST(y > coalesce(max(y) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  AS BIGINT) AS is_record
      FROM day),
    tot AS (
      SELECT count(*) AS n, sum(is_record) AS records,
             max(CASE WHEN is_record = 1 THEN d END) AS last_record_day
      FROM rec)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(records AS BIGINT) AS n_records,
           CAST(last_record_day AS BIGINT) AS last_record_day,
           round(ln(n) + 0.5772156649, 6) AS expected_iid,
           round(records / (ln(n) + 0.5772156649), 6) AS record_ratio
    FROM tot
"""


def ts_var_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest of a 5% empirical VaR:
    the threshold is the exact k-th smallest daily revenue of the
    FIRST-HALF training window (integer rank on exact cents — no
    percentile interpolation ambiguity), violations are counted over
    the held-out second half, and the POF likelihood ratio closes in
    one ln expression.  The risk-ops twin of the registered
    ts_risk_ratios.  Scale: per-DAY table; two window ranks."""
    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    w = Window.orderBy("d")
    idx = day.select(
        "d", "y", F.row_number().over(w).alias("i")
    ).crossJoin(F.broadcast(day.agg(F.count(F.lit(1)).alias("n"))))
    train = idx.where(F.col("i") * 2 <= F.col("n"))
    k_rank = train.crossJoin(
        F.broadcast(train.agg(F.count(F.lit(1)).alias("m")))
    ).select(
        "y",
        F.row_number()
        .over(Window.orderBy(F.col("y").asc(), F.col("d").asc()))
        .alias("r"),
        F.ceil(F.col("m") * 0.05).alias("k"),
    )
    thresh = k_rank.where(F.col("r") == F.col("k")).select(
        F.col("y").alias("var_cents")
    )
    test = idx.where(F.col("i") * 2 > F.col("n"))
    res = test.crossJoin(F.broadcast(thresh)).agg(
        F.count(F.lit(1)).alias("tt"),
        F.sum((F.col("y") < F.col("var_cents")).cast("long")).alias("x"),
        F.max("var_cents").alias("vc"),
    )
    p = F.lit(0.05)
    tt = F.col("tt").cast("double")
    x = F.col("x").cast("double")
    ll_null = (tt - x) * F.log(1.0 - p) + x * F.log(p)
    ll_alt = F.when(x > 0, x * F.log(x / tt)).otherwise(F.lit(0.0)) + F.when(
        x < tt, (tt - x) * F.log(1.0 - x / tt)
    ).otherwise(F.lit(0.0))
    lr = -2.0 * (ll_null - ll_alt)
    return res.select(
        F.col("tt").cast("long").alias("test_days"),
        F.col("x").cast("long").alias("violations"),
        F.round(F.col("vc") / 100.0, 2).alias("var_threshold"),
        F.round(x / tt, 6).alias("violation_rate"),
        F.round(lr, 6).alias("kupiec_lr"),
        (lr > 6.635).cast("long").alias("reject_var"),  # df=1 @ .01
    )


QUERIES["ts_var_backtest"] = ts_var_backtest

ORACLES["ts_var_backtest"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    idx AS (
      SELECT d, y, row_number() OVER (ORDER BY d) AS i,
             (SELECT count(*) FROM day) AS n
      FROM day),
    train AS (SELECT d, y FROM idx WHERE i * 2 <= n),
    kr AS (
      SELECT y, row_number() OVER (ORDER BY y ASC, d ASC) AS r,
             CAST(ceil((SELECT count(*) FROM train) * 0.05) AS BIGINT) AS k
      FROM train),
    thresh AS (SELECT y AS var_cents FROM kr WHERE r = k),
    test AS (SELECT y FROM idx WHERE i * 2 > n),
    res AS (
      SELECT count(*) AS tt,
             sum(CASE WHEN y < (SELECT var_cents FROM thresh)
                      THEN 1 ELSE 0 END) AS x,
             (SELECT var_cents FROM thresh) AS vc
      FROM test),
    f AS (
      SELECT tt, x, vc,
             -2.0 * (((tt - x) * ln(0.95) + x * ln(0.05))
                     - (CASE WHEN x > 0 THEN x * ln(x / CAST(tt AS DOUBLE))
                             ELSE 0.0 END
                        + CASE WHEN x < tt
                               THEN (tt - x) * ln(1.0 - x / CAST(tt AS DOUBLE))
                               ELSE 0.0 END)) AS lr
      FROM res)
    SELECT CAST(tt AS BIGINT) AS test_days, CAST(x AS BIGINT) AS violations,
           round(vc / 100.0, 2) AS var_threshold,
           round(x / CAST(tt AS DOUBLE), 6) AS violation_rate,
           round(lr, 6) AS kupiec_lr,
           CAST(lr > 6.635 AS BIGINT) AS reject_var
    FROM f
"""


# --- text / LM-data ----------------------------------------------------------


def text_bigram_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Held-out perplexity of an add-k bigram LM: train on even docs,
    score odd docs — the LM-data quality readout behind "did this
    corpus slice get easier or harder" (the registered text_kneser_ney
    fits probabilities; this closes the evaluation loop).  All counts
    are exact integers per bigram TYPE; the log-likelihood folds over
    the ~V^2 type grid, never the raw token stream.  Scale: token
    explode is map-side; everything after is vocabulary-bounded."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.split(F.trim("text"), "\\s+").alias("toks")
    )
    tok = d.select(
        "doc_id", F.posexplode("toks").alias("pos", "w")
    )
    big = tok.alias("a").join(
        tok.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.w").alias("w1"),
        F.col("b.w").alias("w2"),
    )
    train_b = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    train_u = (
        big.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = train_u.agg(F.count(F.lit(1)).alias("v"))
    test = (
        big.where(F.col("doc_id") % 2 == 1)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        test.join(train_b, ["w1", "w2"], "left")
        .join(train_u, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "n",
            (
                (F.coalesce(F.col("c12"), F.lit(0)) + 0.5)
                / (F.coalesce(F.col("c1"), F.lit(0)) + 0.5 * F.col("v"))
            ).alias("p"),
        )
    )
    out = scored.agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.log("p")).alias("__ll"),
    )
    return out.select(
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(-F.col("__ll") / F.col("n_bigrams"), 6).alias("avg_nll"),
        F.round(F.exp(-F.col("__ll") / F.col("n_bigrams")), 4).alias("perplexity"),
    )


QUERIES["text_bigram_perplexity"] = text_bigram_perplexity

ORACLES["text_bigram_perplexity"] = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, pos, toks[pos + 1] AS w
      FROM d, unnest(range(len(toks))) u(pos)),
    big AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    train_b AS (
      SELECT w1, w2, count(*) AS c12 FROM big WHERE doc_id % 2 = 0
      GROUP BY 1, 2),
    train_u AS (
      SELECT w1, count(*) AS c1 FROM big WHERE doc_id % 2 = 0 GROUP BY 1),
    vocab AS (SELECT count(*) AS v FROM train_u),
    test AS (
      SELECT w1, w2, count(*) AS n FROM big WHERE doc_id % 2 = 1
      GROUP BY 1, 2),
    scored AS (
      SELECT t.n,
             (coalesce(tb.c12, 0) + 0.5)
               / (coalesce(tu.c1, 0) + 0.5 * v.v) AS p
      FROM test t
      LEFT JOIN train_b tb ON t.w1 = tb.w1 AND t.w2 = tb.w2
      LEFT JOIN train_u tu ON t.w1 = tu.w1
      CROSS JOIN vocab v),
    out AS (
      SELECT sum(n) AS n_bigrams, sum(n * ln(p)) AS ll FROM scored)
    SELECT CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(-ll / n_bigrams, 6) AS avg_nll,
           round(exp(-ll / n_bigrams), 4) AS perplexity
    FROM out
"""


def text_topk_mass(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k token-frequency mass curve: the share of the corpus
    covered by the k most frequent tokens at k in {1,2,5,10,20,50} —
    the vocabulary-sizing readout behind tokenizer budget decisions
    (the registered text_vocab_growth tracks NEW types; this tracks
    how much mass the head already owns).  Counts and the cumulative
    sum are exact integers; one window over the vocabulary table."""
    d = t(spark, sf, "documents").select(
        F.explode(F.split(F.trim("text"), "\\s+")).alias("w")
    )
    counts = d.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = counts.select(
        "c",
        F.row_number().over(w).alias("k"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).crossJoin(F.broadcast(counts.agg(F.sum("c").alias("total"))))
    ks = [1, 2, 5, 10, 20, 50]
    out = ranked.where(F.col("k").isin(ks)).select(
        F.col("k").cast("long").alias("k"),
        F.col("cum").cast("long").alias("cum_count"),
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
    )
    return out.orderBy("k")


QUERIES["text_topk_mass"] = text_topk_mass

ORACLES["text_topk_mass"] = r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
    counts AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS k,
             sum(c) OVER (ORDER BY c DESC, w ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counts)
    SELECT CAST(k AS BIGINT) AS k, CAST(cum AS BIGINT) AS cum_count,
           round(cum / CAST((SELECT sum(c) FROM counts) AS DOUBLE), 6) AS cum_share
    FROM ranked WHERE k IN (1, 2, 5, 10, 20, 50)
    ORDER BY k
"""


def text_position_bias(spark: SparkSession, sf: str) -> DataFrame:
    """Positional-bias profile of the 10 most frequent tokens: mean
    relative position (0 = doc start, 1 = doc end) and occurrence
    count — boilerplate and template tokens pin to the ends, content
    tokens float near 0.5 (the within-doc companion of the registered
    text_burstiness).  The relative position is a map-side expression;
    one groupBy over the vocabulary."""
    d = t(spark, sf, "documents").select(
        F.split(F.trim("text"), "\\s+").alias("toks")
    ).where(F.size("toks") > 1)
    tok = d.select(
        F.posexplode("toks").alias("pos", "w"),
        (F.size("toks") - 1).alias("last"),
    ).select("w", (F.col("pos") / F.col("last")).alias("relpos"))
    g = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("n"), F.sum("relpos").alias("__sr")
    )
    top = g.orderBy(F.col("n").desc(), F.col("w").asc()).limit(10)
    return top.select(
        "w",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("__sr") / F.col("n"), 6).alias("mean_relpos"),
    ).orderBy(F.col("n").desc(), F.col("w").asc())


QUERIES["text_position_bias"] = text_position_bias

ORACLES["text_position_bias"] = r"""
    WITH d AS (
      SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
    f AS (SELECT toks FROM d WHERE len(toks) > 1),
    tok AS (
      SELECT toks[pos + 1] AS w, pos / CAST(len(toks) - 1 AS DOUBLE) AS relpos
      FROM f, unnest(range(len(toks))) u(pos)),
    g AS (SELECT w, count(*) AS n, sum(relpos) AS sr FROM tok GROUP BY 1)
    SELECT w, CAST(n AS BIGINT) AS n, round(sr / n, 6) AS mean_relpos
    FROM g ORDER BY n DESC, w ASC LIMIT 10
"""


def text_skipgram_cooccur(spark: SparkSession, sf: str) -> DataFrame:
    """Skip-gram co-occurrence table (window = 2, i.e. distance 1 OR 2,
    direction-collapsed): the context statistics word embeddings train
    on, with observed count vs the independence expectation — the
    window-2 generalization of the registered adjacent-only
    text_pmi_bigrams.  Position pairs come from two bounded equi-joins
    on (doc, pos+d); output is the top-20 most over-represented pairs
    among those with >= 50 occurrences."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.split(F.trim("text"), "\\s+").alias("toks")
    )
    tok = d.select("doc_id", F.posexplode("toks").alias("pos", "w"))
    pairs = None
    for dist in (1, 2):
        p = tok.alias("a").join(
            tok.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + dist),
        ).select(
            F.least(F.col("a.w"), F.col("b.w")).alias("w1"),
            F.greatest(F.col("a.w"), F.col("b.w")).alias("w2"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    pg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = pg.agg(F.sum("n").alias("tp"))
    marg = (
        pg.select(F.col("w1").alias("w"), F.col("n"))
        .unionByName(pg.select(F.col("w2").alias("w"), F.col("n")))
        .groupBy("w")
        .agg(F.sum("n").alias("m"))
    )
    m1 = marg.select(F.col("w").alias("w1"), F.col("m").alias("m1"))
    m2 = marg.select(F.col("w").alias("w2"), F.col("m").alias("m2"))
    scored = (
        pg.join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .where(F.col("n") >= 50)
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(
                (F.col("n").cast("double") * F.col("tp"))
                / (F.col("m1").cast("double") * F.col("m2")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "w1", "w2").limit(20)


QUERIES["text_skipgram_cooccur"] = text_skipgram_cooccur

ORACLES["text_skipgram_cooccur"] = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, pos, toks[pos + 1] AS w
      FROM d, unnest(range(len(toks))) u(pos)),
    pairs AS (
      SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      UNION ALL
      SELECT least(a.w, b.w), greatest(a.w, b.w)
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 2),
    pg AS (SELECT w1, w2, count(*) AS n FROM pairs GROUP BY 1, 2),
    tot AS (SELECT sum(n) AS tp FROM pg),
    marg AS (
      SELECT w, sum(n) AS m FROM (
        SELECT w1 AS w, n FROM pg UNION ALL SELECT w2, n FROM pg)
      GROUP BY 1)
    SELECT pg.w1, pg.w2, CAST(pg.n AS BIGINT) AS n,
           round((CAST(pg.n AS DOUBLE) * tot.tp)
                 / (CAST(m1.m AS DOUBLE) * m2.m), 6) AS lift
    FROM pg
    JOIN marg m1 ON pg.w1 = m1.w
    JOIN marg m2 ON pg.w2 = m2.w
    CROSS JOIN tot
    WHERE pg.n >= 50
    ORDER BY lift DESC, pg.w1, pg.w2 LIMIT 20
"""


# --- evaluation / experimentation --------------------------------------------


def eval_tost_equivalence(spark: SparkSession, sf: str) -> DataFrame:
    """TOST equivalence test (two one-sided Welch t's) for the mean
    order value of the two customer cohorts within a +-3000 dollar
    margin — the test that can actually CONCLUDE "no meaningful
    difference", which the registered agg_welch_ttest cannot.  Welch
    pieces close from exact cents moments (hi/lo-split squares); the
    verdict needs BOTH one-sided z's above 1.645."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    margin = 3000.0
    o = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 2).alias("variant"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = o.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *_split_sum(F.col("cents") * F.col("cents"), "q"),
    )
    var = (
        (
            _split_val("q", 10000.0)
            - F.col("s") / 100.0 * (F.col("s") / 100.0) / F.col("n")
        )
        / (F.col("n") - 1)
    )
    per = g.select(
        "variant",
        "n",
        (F.col("s") / 100.0 / F.col("n")).alias("m"),
        var.alias("v"),
    )
    c = F.col
    piv = per.agg(
        F.max(F.when(c("variant") == 0, c("m"))).alias("m0"),
        F.max(F.when(c("variant") == 0, c("v"))).alias("v0"),
        F.max(F.when(c("variant") == 0, c("n"))).alias("n0"),
        F.max(F.when(c("variant") == 1, c("m"))).alias("m1"),
        F.max(F.when(c("variant") == 1, c("v"))).alias("v1"),
        F.max(F.when(c("variant") == 1, c("n"))).alias("n1"),
    )
    diff = c("m1") - c("m0")
    se = F.sqrt(c("v1") / c("n1") + c("v0") / c("n0"))
    t_lo = (diff + margin) / se
    t_hi = (margin - diff) / se
    return piv.select(
        F.round(diff, 4).alias("mean_diff"),
        F.round(se, 4).alias("se"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        ((t_lo > 1.645) & (t_hi > 1.645)).cast("long").alias("equivalent"),
    )


QUERIES["eval_tost_equivalence"] = eval_tost_equivalence

ORACLES["eval_tost_equivalence"] = """
    WITH o AS (
      SELECT o_custkey % 2 AS variant,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT variant, count(*) AS n, sum(cents) AS s,
             sum(cents * cents // 1073741824) AS q_hi,
             sum(cents * cents % 1073741824) AS q_lo
      FROM o GROUP BY 1),
    per AS (
      SELECT variant, n, s / 100.0 / n AS m,
             ((CAST(q_hi AS DOUBLE) * 1073741824.0 + CAST(q_lo AS DOUBLE))
               / 10000.0 - s / 100.0 * (s / 100.0) / n) / (n - 1) AS v
      FROM g),
    piv AS (
      SELECT max(CASE WHEN variant = 0 THEN m END) AS m0,
             max(CASE WHEN variant = 0 THEN v END) AS v0,
             max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 1 THEN m END) AS m1,
             max(CASE WHEN variant = 1 THEN v END) AS v1,
             max(CASE WHEN variant = 1 THEN n END) AS n1
      FROM per),
    f AS (
      SELECT m1 - m0 AS diff, sqrt(v1 / n1 + v0 / n0) AS se FROM piv)
    SELECT round(diff, 4) AS mean_diff, round(se, 4) AS se,
           round((diff + 3000.0) / se, 6) AS t_lower,
           round((3000.0 - diff) / se, 6) AS t_upper,
           CAST((diff + 3000.0) / se > 1.645
                AND (3000.0 - diff) / se > 1.645 AS BIGINT) AS equivalent
    FROM f
"""


def eval_bradley_terry(spark: SparkSession, sf: str) -> DataFrame:
    """Bradley-Terry strength scores for the 5 order priorities from
    pairwise monthly revenue duels (priority i beats j in a
    nation-month when its mean order value is higher) — the preference
    aggregation behind RLHF reward data and leaderboard ratings.  Two
    UNROLLED minorization-maximization iterations from the uniform
    init (each closed-form over the 5x5 integer win matrix) — no
    convergence loop, documented approximation.  Scale: duels live on
    the nation x month x priority grid, never the raw rows."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "mon", "o_orderpriority")
        .agg((F.sum("cents") / F.count(F.lit(1))).alias("m"))
    )
    a, b = cell.alias("a"), cell.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.mon") == F.col("b.mon"))
            & (F.col("a.o_orderpriority") < F.col("b.o_orderpriority")),
        )
        .where(F.col("a.m") != F.col("b.m"))
        .select(
            F.col("a.o_orderpriority").alias("pi"),
            F.col("b.o_orderpriority").alias("pj"),
            (F.col("a.m") > F.col("b.m")).cast("long").alias("i_wins"),
        )
    )
    pair = duels.groupBy("pi", "pj").agg(
        F.sum("i_wins").alias("wij"),
        F.count(F.lit(1)).alias("nij"),
    )
    # symmetric edge list: (model, opponent, wins_of_model, games)
    sym = pair.select(
        F.col("pi").alias("i"), F.col("pj").alias("j"), F.col("wij").alias("w"),
        F.col("nij").alias("g"),
    ).unionByName(
        pair.select(
            F.col("pj").alias("i"),
            F.col("pi").alias("j"),
            (F.col("nij") - F.col("wij")).alias("w"),
            F.col("nij").alias("g"),
        )
    )
    # MM iteration 1 from w=1: w1_i = wins_i / sum_j (g_ij / 2)
    it1 = sym.groupBy("i").agg(
        F.sum("w").alias("wins"),
        F.sum("g").alias("games"),
    ).select(
        "i", "wins", "games", (2.0 * F.col("wins") / F.col("games")).alias("w1")
    )
    # MM iteration 2: w2_i = wins_i / sum_j (g_ij / (w1_i + w1_j))
    e1 = it1.select(F.col("i"), F.col("w1").alias("w1i"), "wins", "games")
    e2 = it1.select(F.col("i").alias("j"), F.col("w1").alias("w1j"))
    it2 = (
        sym.join(e1, "i")
        .join(e2, "j")
        .groupBy("i", "wins", "games")
        .agg(F.sum(F.col("g") / (F.col("w1i") + F.col("w1j"))).alias("__den"))
        .select("i", "wins", "games", (F.col("wins") / F.col("__den")).alias("w2"))
    )
    norm = it2.crossJoin(F.broadcast(it2.agg(F.sum("w2").alias("z"))))
    return norm.select(
        F.col("i").alias("priority"),
        F.col("wins").cast("long").alias("wins"),
        F.col("games").cast("long").alias("games"),
        F.round(F.col("w2") / F.col("z"), 6).alias("bt_score"),
    ).orderBy("priority")


QUERIES["eval_bradley_terry"] = eval_bradley_terry

ORACLES["eval_bradley_terry"] = """
    WITH cell AS (
      SELECT c_nationkey, date_trunc('month', o_orderdate) AS mon,
             o_orderpriority,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) AS m
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3),
    duels AS (
      SELECT a.o_orderpriority AS pi, b.o_orderpriority AS pj,
             CAST(a.m > b.m AS BIGINT) AS i_wins
      FROM cell a JOIN cell b
        ON a.c_nationkey = b.c_nationkey AND a.mon = b.mon
       AND a.o_orderpriority < b.o_orderpriority
      WHERE a.m <> b.m),
    pair AS (
      SELECT pi, pj, sum(i_wins) AS wij, count(*) AS nij
      FROM duels GROUP BY 1, 2),
    sym AS (
      SELECT pi AS i, pj AS j, wij AS w, nij AS g FROM pair
      UNION ALL
      SELECT pj, pi, nij - wij, nij FROM pair),
    it1 AS (
      SELECT i, sum(w) AS wins, sum(g) AS games,
             2.0 * sum(w) / sum(g) AS w1
      FROM sym GROUP BY 1),
    it2 AS (
      SELECT s.i, e1.wins, e1.games,
             e1.wins / sum(s.g / (e1.w1 + e2.w1)) AS w2
      FROM sym s
      JOIN it1 e1 ON s.i = e1.i
      JOIN it1 e2 ON s.j = e2.i
      GROUP BY s.i, e1.wins, e1.games, e1.w1)
    SELECT i AS priority, CAST(wins AS BIGINT) AS wins,
           CAST(games AS BIGINT) AS games,
           round(w2 / (SELECT sum(w2) FROM it2), 6) AS bt_score
    FROM it2 ORDER BY priority
"""


def eval_pass_at_k(spark: SparkSession, sf: str) -> DataFrame:
    """pass@k estimator (Chen et al. 2021): the unbiased
    1 - C(n-c, k)/C(n, k) per problem, averaged — THE code-model eval
    metric, computed here over synthetic problems (nations) and
    samples (a deterministic orderkey slice; success = totalprice over
    150k).  The k-term product folds over an explicit sequence array
    in index order, so the float product is order-identical across
    engines (no ln round-trip).  k in {1, 5, 10}."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").where(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", (F.col("o_totalprice") > 150000).cast("long").alias("ok")
    )
    prob = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("cc"))
    )
    outs = []
    for k in (1, 5, 10):
        scored = prob.where(F.col("n") >= k).select(
            "n",
            "cc",
            F.when(
                F.col("n") - F.col("cc") < k, F.lit(1.0)
            ).otherwise(
                1.0
                - F.aggregate(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    F.lit(1.0),
                    lambda acc, i: acc
                    * (F.col("n") - F.col("cc") - i)
                    / (F.col("n") - i),
                )
            ).alias("p"),
        )
        outs.append(
            scored.agg(
                F.lit(k).cast("long").alias("k"),
                F.count(F.lit(1)).alias("problems"),
                F.round(F.sum("p") / F.count(F.lit(1)), 6).alias("pass_at_k"),
            ).select(
                F.col("k"),
                F.col("problems").cast("long").alias("problems"),
                "pass_at_k",
            )
        )
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionByName(o2)
    return out.orderBy("k")


QUERIES["eval_pass_at_k"] = eval_pass_at_k


def _pass_at_k_oracle() -> str:
    parts = []
    for k in (1, 5, 10):
        parts.append(f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS problems,
           round(sum(CASE WHEN n - cc < {k} THEN 1.0
                     ELSE 1.0 - list_reduce(
                       list_prepend(1.0, list_transform(range({k}),
                         i -> (n - cc - i) / CAST(n - i AS DOUBLE))),
                       (a, b) -> a * b) END) / count(*), 6) AS pass_at_k
    FROM prob WHERE n >= {k}""")
    sel = "\n    UNION ALL\n".join(parts)
    return f"""
    WITH o AS (
      SELECT o_custkey,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS ok
      FROM orders WHERE o_orderkey % 7 = 0),
    prob AS (
      SELECT c_nationkey, count(*) AS n, sum(ok) AS cc
      FROM o JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
{sel}
    ORDER BY k
"""


ORACLES["eval_pass_at_k"] = _pass_at_k_oracle()


def eval_fdr_by(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini-Yekutieli FDR over the same per-nation 2x2
    independence family as the staged Holm query — the
    arbitrary-dependence-robust variant of the registered eval_fdr_bh:
    the BH threshold divides by the harmonic factor c(m) = sum 1/i,
    folded over an explicit ascending sequence so the constant is
    bit-identical across engines.  Window arithmetic rides the 25-row
    test table only."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("urgent"),
        (F.col("o_totalprice") > 150000).cast("int").alias("big"),
    )
    j = c.join(o, c.c_custkey == o.o_custkey)
    cells = j.groupBy("c_nationkey", "big", "urgent").agg(F.count(F.lit(1)).alias("n"))
    rows = cells.groupBy("c_nationkey", "big").agg(F.sum("n").alias("rn"))
    cols = cells.groupBy("c_nationkey", "urgent").agg(F.sum("n").alias("cn"))
    tot = cells.groupBy("c_nationkey").agg(F.sum("n").alias("nt"))
    grid = (
        rows.join(cols, "c_nationkey")
        .join(tot, "c_nationkey")
        .join(cells, ["c_nationkey", "big", "urgent"], "left")
        .fillna(0, subset=["n"])
    )
    e = F.col("rn") * F.col("cn") / F.col("nt")
    chi2 = grid.groupBy("c_nationkey").agg(
        F.sum((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2")
    )
    tests = chi2.select("c_nationkey", F.exp(-F.col("chi2") / 2).alias("p"))
    m_df = tests.agg(
        F.count(F.lit(1)).alias("__m"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(25)),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / i,
        ).alias("__cm"),
    )
    wk = Window.orderBy(F.col("p").asc(), F.col("c_nationkey").asc())
    ranked = tests.crossJoin(F.broadcast(m_df)).withColumn(
        "k", F.row_number().over(wk)
    )
    # BY adjusted p: running min from the tail of m*c(m)*p/k, capped at 1
    stepped = ranked.withColumn(
        "by_p",
        F.least(
            F.lit(1.0),
            F.min(
                F.col("__m") * F.col("__cm") * F.col("p") / F.col("k")
            ).over(wk.rowsBetween(0, Window.unboundedFollowing)),
        ),
    )
    return stepped.select(
        "c_nationkey",
        F.round("p", 9).alias("p_value"),
        F.col("k").cast("long").alias("rank"),
        F.round("by_p", 9).alias("by_p"),
        (F.col("by_p") <= 0.05).alias("rejected"),
    ).orderBy("rank")


QUERIES["eval_fdr_by"] = eval_fdr_by

ORACLES["eval_fdr_by"] = """
    WITH j AS (
      SELECT c_nationkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS urgent,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS big
      FROM orders JOIN customer ON o_custkey = c_custkey),
    cells AS (
      SELECT c_nationkey, big, urgent, count(*) AS n
      FROM j GROUP BY 1, 2, 3),
    rows_ AS (SELECT c_nationkey, big, sum(n) AS rn FROM cells GROUP BY 1, 2),
    cols_ AS (SELECT c_nationkey, urgent, sum(n) AS cn FROM cells GROUP BY 1, 2),
    tot AS (SELECT c_nationkey, sum(n) AS nt FROM cells GROUP BY 1),
    grid AS (
      SELECT r.c_nationkey, r.big, c.urgent, r.rn, c.cn, t.nt,
             coalesce(x.n, 0) AS n
      FROM rows_ r
      JOIN cols_ c USING (c_nationkey)
      JOIN tot t ON r.c_nationkey = t.c_nationkey
      LEFT JOIN cells x ON x.c_nationkey = r.c_nationkey
                       AND x.big = r.big AND x.urgent = c.urgent),
    chi AS (
      SELECT c_nationkey,
             sum((n - rn * cn / CAST(nt AS DOUBLE))
                 * (n - rn * cn / CAST(nt AS DOUBLE))
                 / (rn * cn / CAST(nt AS DOUBLE))) AS chi2
      FROM grid GROUP BY 1),
    tests AS (
      SELECT c_nationkey, exp(-chi2 / 2) AS p FROM chi),
    consts AS (
      SELECT count(*) AS m,
             list_reduce(
               list_prepend(0.0, list_transform(range(1, 26),
                                                i -> 1.0 / i)),
               (a, b) -> a + b) AS cm
      FROM tests),
    ranked AS (
      SELECT c_nationkey, p,
             row_number() OVER (ORDER BY p ASC, c_nationkey ASC) AS k,
             m, cm
      FROM tests CROSS JOIN consts),
    stepped AS (
      SELECT c_nationkey, p, k,
             least(1.0, min(m * cm * p / k) OVER (
               ORDER BY p ASC, c_nationkey ASC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS by_p
      FROM ranked)
    SELECT c_nationkey, round(p, 9) AS p_value, CAST(k AS BIGINT) AS rank,
           round(by_p, 9) AS by_p, by_p <= 0.05 AS rejected
    FROM stepped ORDER BY rank
"""


# --- dedup / search / join utilities -----------------------------------------


def dedup_sorted_neighborhood(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo) for entity
    resolution: sort the corpus by a cheap key (lang, n_chars, doc_id),
    compare each doc only to its next 3 neighbors via window LEADs (no
    self-join at all — the window IS the block), and verify candidates
    with exact token-set Jaccard.  The classic linear-scan alternative
    to LSH blocking; candidates per row are CONSTANT (w-1), so the
    pass is one sort + one map at any scale.  Output: per-lang
    candidate/match/precision stats at Jaccard >= 0.5."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_distinct(F.split(F.trim("text"), "\\s+")).alias("ts"),
    )
    w = Window.orderBy("lang", "n_chars", "doc_id")
    led = d.select(
        "lang",
        "ts",
        *[F.lead("ts", i).over(w).alias(f"t{i}") for i in (1, 2, 3)],
    )
    cand = None
    for i in (1, 2, 3):
        p = led.where(F.col(f"t{i}").isNotNull()).select(
            "lang",
            (
                F.size(F.array_intersect("ts", f"t{i}")).cast("double")
                / F.size(F.array_union("ts", f"t{i}"))
            ).alias("jac"),
        )
        cand = p if cand is None else cand.unionByName(p)
    g = cand.groupBy("lang").agg(
        F.count(F.lit(1)).alias("candidates"),
        F.sum((F.col("jac") >= 0.5).cast("long")).alias("matches"),
    )
    return g.select(
        "lang",
        F.col("candidates").cast("long").alias("candidates"),
        F.col("matches").cast("long").alias("matches"),
        F.round(F.col("matches") / F.col("candidates"), 6).alias("precision"),
    ).orderBy("lang")


QUERIES["dedup_sorted_neighborhood"] = dedup_sorted_neighborhood

ORACLES["dedup_sorted_neighborhood"] = r"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             list_distinct(string_split_regex(trim(text), '\s+')) AS ts
      FROM documents),
    led AS (
      SELECT lang, ts,
             lead(ts, 1) OVER (ORDER BY lang, n_chars, doc_id) AS t1,
             lead(ts, 2) OVER (ORDER BY lang, n_chars, doc_id) AS t2,
             lead(ts, 3) OVER (ORDER BY lang, n_chars, doc_id) AS t3
      FROM d),
    cand AS (
      SELECT lang, len(list_intersect(ts, t1))
               / CAST(len(ts) + len(t1) - len(list_intersect(ts, t1)) AS DOUBLE)
               AS jac
      FROM led WHERE t1 IS NOT NULL
      UNION ALL
      SELECT lang, len(list_intersect(ts, t2))
               / CAST(len(ts) + len(t2) - len(list_intersect(ts, t2)) AS DOUBLE)
      FROM led WHERE t2 IS NOT NULL
      UNION ALL
      SELECT lang, len(list_intersect(ts, t3))
               / CAST(len(ts) + len(t3) - len(list_intersect(ts, t3)) AS DOUBLE)
      FROM led WHERE t3 IS NOT NULL)
    SELECT lang, CAST(count(*) AS BIGINT) AS candidates,
           CAST(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS matches,
           round(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS precision
    FROM cand GROUP BY lang ORDER BY lang
"""


def dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup threshold sweep: exact token-set Jaccard over a
    residue-sampled pair grid, histogrammed at operating thresholds
    {0.3, 0.5, 0.7, 0.9} — the measurement that picks a dedup
    threshold BEFORE committing a full LSH run (the registered
    dedup_lsh_tuning tunes bands for a GIVEN threshold; this prices
    the thresholds themselves).  The grid is the equi-key residue
    join (the r07 lesson), pairs ~ n^2/397 — grow the modulus with
    corpus^2 for a constant sample."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.array_distinct(F.split(F.trim("text"), "\\s+")).alias("ts")
    )
    a, b = d.alias("a"), d.alias("b")
    m = 397
    pairs = a.join(
        b,
        ((m - F.col("a.doc_id") % m) % m == F.col("b.doc_id") % m)
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        (
            F.size(F.array_intersect("a.ts", "b.ts")).cast("double")
            / F.size(F.array_union("a.ts", "b.ts"))
        ).alias("jac")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("pairs"),
        *[
            F.sum((F.col("jac") >= th).cast("long")).alias(f"ge_{int(th*10)}")
            for th in (0.3, 0.5, 0.7, 0.9)
        ],
    )
    rows = []
    for th in (0.3, 0.5, 0.7, 0.9):
        rows.append(
            agg.select(
                F.lit(th).alias("threshold"),
                F.col("pairs").cast("long").alias("sampled_pairs"),
                F.col(f"ge_{int(th*10)}").cast("long").alias("pairs_at_or_above"),
                F.round(F.col(f"ge_{int(th*10)}") / F.col("pairs"), 6).alias(
                    "dup_rate"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("threshold")


QUERIES["dedup_threshold_sweep"] = dedup_threshold_sweep

ORACLES["dedup_threshold_sweep"] = r"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(string_split_regex(trim(text), '\s+')) AS ts
      FROM documents),
    pairs AS (
      SELECT len(list_intersect(a.ts, b.ts))
               / CAST(len(a.ts) + len(b.ts)
                      - len(list_intersect(a.ts, b.ts)) AS DOUBLE) AS jac
      FROM d a JOIN d b
        ON (397 - a.doc_id % 397) % 397 = b.doc_id % 397
       AND a.doc_id < b.doc_id),
    agg AS (
      SELECT count(*) AS pairs,
             sum(CASE WHEN jac >= 0.3 THEN 1 ELSE 0 END) AS ge_3,
             sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS ge_5,
             sum(CASE WHEN jac >= 0.7 THEN 1 ELSE 0 END) AS ge_7,
             sum(CASE WHEN jac >= 0.9 THEN 1 ELSE 0 END) AS ge_9
      FROM pairs)
    SELECT CAST(0.3 AS DOUBLE) AS threshold, CAST(pairs AS BIGINT) AS sampled_pairs,
           CAST(ge_3 AS BIGINT) AS pairs_at_or_above,
           round(ge_3 / CAST(pairs AS DOUBLE), 6) AS dup_rate FROM agg
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), CAST(pairs AS BIGINT), CAST(ge_5 AS BIGINT),
           round(ge_5 / CAST(pairs AS DOUBLE), 6) FROM agg
    UNION ALL
    SELECT CAST(0.7 AS DOUBLE), CAST(pairs AS BIGINT), CAST(ge_7 AS BIGINT),
           round(ge_7 / CAST(pairs AS DOUBLE), 6) FROM agg
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE), CAST(pairs AS BIGINT), CAST(ge_9 AS BIGINT),
           round(ge_9 / CAST(pairs AS DOUBLE), 6) FROM agg
    ORDER BY threshold
"""


def sketch_linear_counting(spark: SparkSession, sf: str) -> DataFrame:
    """Linear (bitmap) counting of distinct tokens: hash each token
    into an m=1024-bit map and estimate distincts as -m*ln(empty/m) —
    the small-cardinality regime where the registered HLL is biased
    (Whang et al. 1990).  The bitmap is a 1024-row groupBy (mergeable
    state, map-side partials); the audit joins the exact distinct
    count for the relative error."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    m = 1024
    tok = t(spark, sf, "documents").select(
        F.explode(F.split(F.trim("text"), "\\s+")).alias("w")
    )
    bits = tok.select((md5_int32(F.col("w")) % m).alias("bit")).distinct()
    truth = tok.agg(F.countDistinct("w").alias("exact"))
    est = bits.agg(F.count(F.lit(1)).alias("bits_set")).crossJoin(
        F.broadcast(truth)
    )
    lc = -float(m) * F.log((F.lit(m) - F.col("bits_set")) / float(m))
    return est.select(
        F.lit(m).cast("long").alias("m_bits"),
        F.col("bits_set").cast("long").alias("bits_set"),
        F.round(lc, 4).alias("lc_estimate"),
        F.col("exact").cast("long").alias("exact_distinct"),
        F.round((lc - F.col("exact")) / F.col("exact"), 6).alias("rel_error"),
    )


QUERIES["sketch_linear_counting"] = sketch_linear_counting


def _lc_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    h = md5_int32_sql("w")
    return rf"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents),
    bits AS (SELECT DISTINCT {h} % 1024 AS bit FROM tok),
    est AS (
      SELECT (SELECT count(*) FROM bits) AS bits_set,
             (SELECT count(DISTINCT w) FROM tok) AS exact)
    SELECT CAST(1024 AS BIGINT) AS m_bits,
           CAST(bits_set AS BIGINT) AS bits_set,
           round(-1024.0 * ln((1024 - bits_set) / 1024.0), 4) AS lc_estimate,
           CAST(exact AS BIGINT) AS exact_distinct,
           round((-1024.0 * ln((1024 - bits_set) / 1024.0) - exact)
                 / exact, 6) AS rel_error
    FROM est
"""


ORACLES["sketch_linear_counting"] = _lc_oracle()


def search_idf_variants(spark: SparkSession, sf: str) -> DataFrame:
    """IDF formulation audit for the 10 highest-df terms: smoothed
    (ln(1+N/df)), probabilistic (ln((N-df+.5)/(df+.5))) and BM25
    (ln(1+(N-df+.5)/(df+.5))) side by side — the probabilistic variant
    goes NEGATIVE for terms in over half the corpus, which silently
    flips ranking signs (the practical reason BM25 wraps it in
    ln(1+x)).  One document-frequency groupBy; floats only in the
    per-term closing expressions."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim("text"), "\\s+"))).alias("w")
    )
    n_docs = t(spark, sf, "documents").agg(F.count(F.lit(1)).alias("n"))
    df_ = d.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    top = df_.orderBy(F.col("df").desc(), F.col("w").asc()).limit(10)
    out = top.crossJoin(F.broadcast(n_docs))
    nn = F.col("n").cast("double")
    dfc = F.col("df").cast("double")
    return out.select(
        "w",
        F.col("df").cast("long").alias("df"),
        F.round(F.log(1.0 + nn / dfc), 6).alias("idf_smooth"),
        F.round(F.log((nn - dfc + 0.5) / (dfc + 0.5)), 6).alias("idf_prob"),
        F.round(F.log(1.0 + (nn - dfc + 0.5) / (dfc + 0.5)), 6).alias("idf_bm25"),
        (F.log((nn - dfc + 0.5) / (dfc + 0.5)) < 0).cast("long").alias(
            "prob_negative"
        ),
    ).orderBy(F.col("df").desc(), F.col("w").asc())


QUERIES["search_idf_variants"] = search_idf_variants

ORACLES["search_idf_variants"] = r"""
    WITH d AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS w
      FROM documents),
    df_ AS (SELECT w, count(*) AS df FROM d GROUP BY 1),
    top AS (SELECT w, df FROM df_ ORDER BY df DESC, w ASC LIMIT 10),
    n_ AS (SELECT count(*) AS n FROM documents)
    SELECT w, CAST(df AS BIGINT) AS df,
           round(ln(1.0 + n / CAST(df AS DOUBLE)), 6) AS idf_smooth,
           round(ln((n - df + 0.5) / (df + 0.5)), 6) AS idf_prob,
           round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 6) AS idf_bm25,
           CAST(ln((n - df + 0.5) / (df + 0.5)) < 0 AS BIGINT) AS prob_negative
    FROM top CROSS JOIN n_
    ORDER BY df DESC, w ASC
"""


def join_band_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Band join: customer x supplier pairs with account balances
    within +-10 dollars, via the bucket trick — equi-join on
    floor(bal/10) after exploding each supplier row into its 3
    adjacent buckets, then the exact band filter.  Catalyst plans a
    partitionable hash join on the bucket key (a naive |a-b|<eps
    predicate would be a NestedLoop over the cross space — the same
    lesson as the residue pair grids).  Output: per-region match
    stats on exact cents."""
    c = t(spark, sf, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cb"),
        "c_nationkey",
    )
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    cr = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "cb", "n_regionkey"
    )
    s = t(spark, sf, "supplier").select(
        F.round(F.col("s_acctbal") * 100).cast("long").alias("sb")
    )
    band = 1000  # +-10 dollars in cents
    sx = s.select(
        "sb",
        F.explode(
            F.array(F.lit(-1), F.lit(0), F.lit(1))
        ).alias("off"),
    ).select("sb", (F.floor(F.col("sb") / band) + F.col("off")).alias("bkt"))
    cx = cr.select("cb", "n_regionkey", F.floor(F.col("cb") / band).alias("bkt"))
    pairs = cx.join(sx, "bkt").where(
        F.abs(F.col("cb") - F.col("sb")) <= band
    )
    g = pairs.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.abs(F.col("cb") - F.col("sb"))).alias("__sad"),
    )
    return g.select(
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.col("__sad") / F.col("n_pairs") / 100.0, 4).alias(
            "mean_abs_diff"
        ),
    ).orderBy("n_regionkey")


QUERIES["join_band_balance"] = join_band_balance

ORACLES["join_band_balance"] = """
    WITH c AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cb, n_regionkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey),
    s AS (SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS sb FROM supplier),
    sx AS (
      SELECT sb, CAST(floor(sb / 1000.0) AS BIGINT) + off AS bkt
      FROM s, unnest([-1, 0, 1]) u(off)),
    cx AS (
      SELECT cb, n_regionkey, CAST(floor(cb / 1000.0) AS BIGINT) AS bkt
      FROM c),
    pairs AS (
      SELECT n_regionkey, abs(cb - sb) AS ad
      FROM cx JOIN sx USING (bkt)
      WHERE abs(cb - sb) <= 1000)
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(ad) / count(*) / 100.0, 4) AS mean_abs_diff
    FROM pairs GROUP BY 1 ORDER BY 1
"""


# --- more experimentation / BI aggregates ------------------------------------


def agg_delta_method(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    order with the USER as the randomization unit) — the closed-form
    companion of the staged agg_ratio_jackknife: clustered ratios need
    var(x) - 2R cov(x,y) + R^2 var(y), not the naive per-row SE.
    Per-user sums are exact cents BIGINTs; all second moments
    hi/lo-split; one fixed float expression closes the CI."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    per = o.groupBy("o_custkey").agg(
        F.sum("cents").alias("x"), F.count(F.lit(1)).alias("y")
    )
    mom = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *_split_sum(F.col("x") * F.col("x"), "qxx"),
        *_split_sum(F.col("x") * F.col("y"), "qxy"),
        F.sum(F.col("y") * F.col("y")).alias("qyy"),
    )
    n = F.col("n").cast("double")
    xbar = F.col("sx") / 100.0 / n
    ybar = F.col("sy") / n
    vx = (_split_val("qxx", 10000.0) - n * xbar * xbar) / (n - 1)
    cxy = (_split_val("qxy", 100.0) - n * xbar * ybar) / (n - 1)
    vy = (F.col("qyy") - n * ybar * ybar) / (n - 1)
    r = xbar / ybar
    var_r = (vx - 2.0 * r * cxy + r * r * vy) / (n * ybar * ybar)
    se = F.sqrt(var_r)
    return mom.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se_delta"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    )


QUERIES["agg_delta_method"] = agg_delta_method

ORACLES["agg_delta_method"] = """
    WITH per AS (
      SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x,
             count(*) AS y
      FROM orders GROUP BY 1),
    mom AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x // 1073741824) AS qxx_hi, sum(x * x % 1073741824) AS qxx_lo,
             sum(x * y // 1073741824) AS qxy_hi, sum(x * y % 1073741824) AS qxy_lo,
             sum(y * y) AS qyy
      FROM per),
    f AS (
      SELECT n, sx / 100.0 / n AS xbar, sy / CAST(n AS DOUBLE) AS ybar,
             ((CAST(qxx_hi AS DOUBLE) * 1073741824.0 + qxx_lo) / 10000.0
              - n * (sx / 100.0 / n) * (sx / 100.0 / n)) / (n - 1) AS vx,
             ((CAST(qxy_hi AS DOUBLE) * 1073741824.0 + qxy_lo) / 100.0
              - n * (sx / 100.0 / n) * (sy / CAST(n AS DOUBLE))) / (n - 1) AS cxy,
             (qyy - n * (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
               / (n - 1) AS vy
      FROM mom),
    g AS (
      SELECT n, xbar / ybar AS r,
             sqrt((vx - 2.0 * (xbar / ybar) * cxy
                   + (xbar / ybar) * (xbar / ybar) * vy)
                  / (n * ybar * ybar)) AS se
      FROM f)
    SELECT CAST(n AS BIGINT) AS n_users, round(r, 6) AS ratio,
           round(se, 6) AS se_delta,
           round(r - 1.96 * se, 6) AS ci_lo,
           round(r + 1.96 * se, 6) AS ci_hi
    FROM g
"""


def agg_covariate_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Standardized-mean-difference balance table between the two
    customer cohorts over three covariates (account balance, order
    count, mean order value) — the FIRST table of any observational
    study (|SMD| < 0.1 = balanced; the registered agg_ipw_estimate
    assumes this check happened).  Per-covariate moments close from
    exact scaled integers; 3 output rows."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    c = t(spark, sf, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 2).alias("variant"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    per = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("rev"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "variant",
            "bal",
            "cnt",
            (F.col("rev") / F.col("cnt")).cast("long").alias("avgp"),
        )
    )
    covs = [("acctbal", "bal", 100.0), ("order_count", "cnt", 1.0),
            ("mean_order_cents", "avgp", 100.0)]
    outs = []
    for name, col, scale in covs:
        g = per.groupBy("variant").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(col).alias("s"),
            *_split_sum(F.col(col) * F.col(col), "q"),
        )
        mean = F.col("s") / scale / F.col("n")
        var = (
            _split_val("q", scale * scale)
            - F.col("s") / scale * (F.col("s") / scale) / F.col("n")
        ) / (F.col("n") - 1)
        p = g.select("variant", mean.alias("m"), var.alias("v"))
        piv = p.agg(
            F.max(F.when(F.col("variant") == 0, F.col("m"))).alias("m0"),
            F.max(F.when(F.col("variant") == 0, F.col("v"))).alias("v0"),
            F.max(F.when(F.col("variant") == 1, F.col("m"))).alias("m1"),
            F.max(F.when(F.col("variant") == 1, F.col("v"))).alias("v1"),
        )
        smd = (F.col("m1") - F.col("m0")) / F.sqrt((F.col("v1") + F.col("v0")) / 2.0)
        outs.append(
            piv.select(
                F.lit(name).alias("covariate"),
                F.round(F.col("m0"), 4).alias("mean_ctl"),
                F.round(F.col("m1"), 4).alias("mean_trt"),
                F.round(smd, 6).alias("smd"),
                (F.abs(smd) < 0.1).cast("long").alias("balanced"),
            )
        )
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionByName(o2)
    return out.orderBy("covariate")


QUERIES["agg_covariate_balance"] = agg_covariate_balance

ORACLES["agg_covariate_balance"] = """
    WITH per AS (
      SELECT c.variant, c.bal, p.cnt, CAST(p.rev // p.cnt AS BIGINT) AS avgp
      FROM (SELECT o_custkey, count(*) AS cnt,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
            FROM orders GROUP BY 1) p
      JOIN (SELECT c_custkey, c_custkey % 2 AS variant,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM customer) c
        ON p.o_custkey = c.c_custkey),
    stat AS (
      SELECT covariate, variant, count(*) AS n, sum(x) AS s,
             sum(x * x // 1073741824) AS q_hi, sum(x * x % 1073741824) AS q_lo,
             max(scale) AS scale
      FROM (
        SELECT 'acctbal' AS covariate, variant, bal AS x, 100.0 AS scale FROM per
        UNION ALL
        SELECT 'order_count', variant, cnt, 1.0 FROM per
        UNION ALL
        SELECT 'mean_order_cents', variant, avgp, 100.0 FROM per)
      GROUP BY 1, 2),
    m AS (
      SELECT covariate, variant, s / scale / n AS m,
             ((CAST(q_hi AS DOUBLE) * 1073741824.0 + q_lo) / (scale * scale)
              - s / scale * (s / scale) / n) / (n - 1) AS v
      FROM stat),
    piv AS (
      SELECT covariate,
             max(CASE WHEN variant = 0 THEN m END) AS m0,
             max(CASE WHEN variant = 0 THEN v END) AS v0,
             max(CASE WHEN variant = 1 THEN m END) AS m1,
             max(CASE WHEN variant = 1 THEN v END) AS v1
      FROM m GROUP BY 1)
    SELECT covariate, round(m0, 4) AS mean_ctl, round(m1, 4) AS mean_trt,
           round((m1 - m0) / sqrt((v1 + v0) / 2.0), 6) AS smd,
           CAST(abs((m1 - m0) / sqrt((v1 + v0) / 2.0)) < 0.1 AS BIGINT)
             AS balanced
    FROM piv ORDER BY covariate
"""


def agg_negbin_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Method-of-moments negative-binomial fit to per-customer order
    counts: r = m^2/(v - m), p = m/v — the parametric successor to
    the registered agg_overdispersion readout (it TELLS you the data
    is overdispersed; this fits the distribution you should use).
    Counts are tiny integers so even squares need no split; one
    groupBy then one scalar aggregate."""
    o = t(spark, sf, "orders").select("o_custkey")
    per = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("k"))
    mom = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s"),
        F.sum(F.col("k") * F.col("k")).alias("q"),
    )
    n = F.col("n").cast("double")
    m = F.col("s") / n
    v = (F.col("q") - n * m * m) / (n - 1)
    r = m * m / (v - m)
    return mom.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(m, 6).alias("mean"),
        F.round(v, 6).alias("variance"),
        F.round(v / m, 6).alias("dispersion"),
        F.round(r, 6).alias("nb_r"),
        F.round(m / v, 6).alias("nb_p"),
        (v > m).cast("long").alias("overdispersed"),
    )


QUERIES["agg_negbin_fit"] = agg_negbin_fit

ORACLES["agg_negbin_fit"] = """
    WITH per AS (
      SELECT o_custkey, count(*) AS k FROM orders GROUP BY 1),
    mom AS (
      SELECT count(*) AS n, sum(k) AS s, sum(k * k) AS q FROM per),
    f AS (
      SELECT n, s / CAST(n AS DOUBLE) AS m,
             (q - n * (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
               / (n - 1) AS v
      FROM mom)
    SELECT CAST(n AS BIGINT) AS n_customers, round(m, 6) AS mean,
           round(v, 6) AS variance, round(v / m, 6) AS dispersion,
           round(m * m / (v - m), 6) AS nb_r,
           round(m / v, 6) AS nb_p,
           CAST(v > m AS BIGINT) AS overdispersed
    FROM f
"""


def agg_gamma_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Method-of-moments gamma fit to order values (shape = m^2/v,
    scale = v/m) — the standard positive-skew revenue model; with the
    staged Jarque-Bera this closes the 'what distribution IS this'
    loop.  Moments from exact cents (hi/lo-split squares)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    mom = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *_split_sum(F.col("cents") * F.col("cents"), "q"),
    )
    n = F.col("n").cast("double")
    m = F.col("s") / 100.0 / n
    v = (_split_val("q", 10000.0) - n * m * m) / (n - 1)
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(m, 4).alias("mean"),
        F.round(v, 4).alias("variance"),
        F.round(m * m / v, 6).alias("gamma_shape"),
        F.round(v / m, 6).alias("gamma_scale"),
        F.round(F.sqrt(v) / m, 6).alias("cv"),
    )


QUERIES["agg_gamma_fit"] = agg_gamma_fit

ORACLES["agg_gamma_fit"] = """
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    mom AS (
      SELECT count(*) AS n, sum(cents) AS s,
             sum(cents * cents // 1073741824) AS q_hi,
             sum(cents * cents % 1073741824) AS q_lo
      FROM o),
    f AS (
      SELECT n, s / 100.0 / n AS m,
             ((CAST(q_hi AS DOUBLE) * 1073741824.0 + q_lo) / 10000.0
              - n * (s / 100.0 / n) * (s / 100.0 / n)) / (n - 1) AS v
      FROM mom)
    SELECT CAST(n AS BIGINT) AS n, round(m, 4) AS mean,
           round(v, 4) AS variance,
           round(m * m / v, 6) AS gamma_shape,
           round(v / m, 6) AS gamma_scale,
           round(sqrt(v) / m, 6) AS cv
    FROM f
"""


def agg_price_volume_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Price-volume-mix revenue bridge between 1996 and 1997 by market
    segment: dR = dQ*P1 (volume) + dP*Q1 (price) + dQ*dP (mix) — the
    BI decomposition every revenue review runs, closed per segment
    from exact cents sums and integer counts on the 5-segment grid."""
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).where(F.col("yr").isin(1996, 1997))
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "yr")
        .agg(F.count(F.lit(1)).alias("q"), F.sum("cents").alias("r"))
    )
    piv = g.groupBy("c_mktsegment").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == 1996, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("yr") == 1997, F.col("q"))).alias("q2"),
        F.max(F.when(F.col("yr") == 1997, F.col("r"))).alias("r2"),
    )
    p1 = F.col("r1") / 100.0 / F.col("q1")
    p2 = F.col("r2") / 100.0 / F.col("q2")
    dq = (F.col("q2") - F.col("q1")).cast("double")
    dp = p2 - p1
    return piv.select(
        "c_mktsegment",
        F.col("q1").cast("long").alias("orders_1996"),
        F.col("q2").cast("long").alias("orders_1997"),
        F.round((F.col("r2") - F.col("r1")) / 100.0, 2).alias("delta_revenue"),
        F.round(dq * p1, 2).alias("volume_effect"),
        F.round(dp * F.col("q1"), 2).alias("price_effect"),
        F.round(dq * dp, 2).alias("mix_effect"),
    ).orderBy("c_mktsegment")


QUERIES["agg_price_volume_mix"] = agg_price_volume_mix

ORACLES["agg_price_volume_mix"] = """
    WITH o AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
    g AS (
      SELECT c_mktsegment, yr, count(*) AS q, sum(cents) AS r
      FROM o JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    piv AS (
      SELECT c_mktsegment,
             max(CASE WHEN yr = 1996 THEN q END) AS q1,
             max(CASE WHEN yr = 1996 THEN r END) AS r1,
             max(CASE WHEN yr = 1997 THEN q END) AS q2,
             max(CASE WHEN yr = 1997 THEN r END) AS r2
      FROM g GROUP BY 1),
    f AS (
      SELECT c_mktsegment, q1, q2, r1, r2,
             r1 / 100.0 / q1 AS p1, r2 / 100.0 / q2 AS p2
      FROM piv)
    SELECT c_mktsegment, CAST(q1 AS BIGINT) AS orders_1996,
           CAST(q2 AS BIGINT) AS orders_1997,
           round((r2 - r1) / 100.0, 2) AS delta_revenue,
           round((q2 - q1) * p1, 2) AS volume_effect,
           round((p2 - p1) * q1, 2) AS price_effect,
           round((q2 - q1) * (p2 - p1), 2) AS mix_effect
    FROM f ORDER BY c_mktsegment
"""


# --- multimodal --------------------------------------------------------------

CLR_N_DOCS = 18
CLR_H, CLR_W = 20, 28


def _clr_entries(spark: SparkSession):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png

    rows = []
    for d in range(CLR_N_DOCS):
        yy, xx = np.mgrid[0:CLR_H, 0:CLR_W]
        r = (xx * 3 + yy * 5 + 11 * d) % 256
        g = (xx * 7 + yy * 2 + 5 * d) % 256
        b = (xx * 5 + yy * 3 + 7 * d) % 256
        img = np.dstack([r, g, b]).astype(np.uint8)
        rows.append((d, f"{d}.png", bytearray(encode_png(img))))
    return spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")


_CLR_GRID = f"""
    d AS (SELECT unnest(range({CLR_N_DOCS})) AS doc_id),
    px AS (
      SELECT doc_id, (x * 3 + y * 5 + 11 * doc_id) % 256 AS r,
             (x * 7 + y * 2 + 5 * doc_id) % 256 AS g,
             (x * 5 + y * 3 + 7 * doc_id) % 256 AS b
      FROM d, unnest(range({CLR_H})) u(y), unnest(range({CLR_W})) v(x))
"""


def multimodal_image_colorfulness(spark: SparkSession, sf: str) -> DataFrame:
    """Hasler-Susstrunk colorfulness metric from REAL decoded pixels:
    M = sqrt(var_rg + var_yb) + 0.3 * sqrt(mu_rg^2 + mu_yb^2) over the
    opponent axes rg = R-G, yb = (R+G)/2 - B — the saturation screen
    an image-curation funnel applies before CLIP budget (grayscale-ish
    images score near 0).  The Arrow stage emits INTEGER sufficient
    statistics (working with 2*yb keeps everything integral); the
    metric closes relationally; the oracle regenerates the same pixels
    arithmetically."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    entries = _clr_entries(spark)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
                u = (r - g).reshape(-1)
                v = (r + g - 2 * b).reshape(-1)  # 2*yb, integral
                out.append(
                    (
                        int(did),
                        int(u.size),
                        int(u.sum()),
                        int((u * u).sum()),
                        int(v.sum()),
                        int((v * v).sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n", "su", "suu", "sv", "svv"]
            )

    s = entries.mapInPandas(
        stats, "doc_id long, n long, su long, suu long, sv long, svv long"
    )
    n = F.col("n").cast("double")
    var_u = F.col("suu") / n - (F.col("su") / n) * (F.col("su") / n)
    var_v = (F.col("svv") / n - (F.col("sv") / n) * (F.col("sv") / n)) / 4.0
    mu_u = F.col("su") / n
    mu_v = F.col("sv") / n / 2.0
    m = F.sqrt(var_u + var_v) + 0.3 * F.sqrt(mu_u * mu_u + mu_v * mu_v)
    return s.select(
        "doc_id",
        F.round(m, 6).alias("colorfulness"),
        F.round(F.sqrt(var_u + var_v), 6).alias("spread"),
        (m > 40.0).cast("long").alias("colorful"),
    ).orderBy("doc_id")


QUERIES["multimodal_image_colorfulness"] = multimodal_image_colorfulness

ORACLES["multimodal_image_colorfulness"] = f"""
    WITH {_CLR_GRID},
    s AS (
      SELECT doc_id, count(*) AS n, sum(r - g) AS su,
             sum((r - g) * (r - g)) AS suu,
             sum(r + g - 2 * b) AS sv,
             sum((r + g - 2 * b) * (r + g - 2 * b)) AS svv
      FROM px GROUP BY 1),
    f AS (
      SELECT doc_id,
             suu / CAST(n AS DOUBLE) - (su / CAST(n AS DOUBLE)) * (su / CAST(n AS DOUBLE)) AS var_u,
             (svv / CAST(n AS DOUBLE) - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE))) / 4.0 AS var_v,
             su / CAST(n AS DOUBLE) AS mu_u,
             sv / CAST(n AS DOUBLE) / 2.0 AS mu_v
      FROM s)
    SELECT doc_id,
           round(sqrt(var_u + var_v)
                 + 0.3 * sqrt(mu_u * mu_u + mu_v * mu_v), 6) AS colorfulness,
           round(sqrt(var_u + var_v), 6) AS spread,
           CAST(sqrt(var_u + var_v)
                + 0.3 * sqrt(mu_u * mu_u + mu_v * mu_v) > 40.0 AS BIGINT)
             AS colorful
    FROM f ORDER BY doc_id
"""


def multimodal_image_palette(spark: SparkSession, sf: str) -> DataFrame:
    """Quantized-palette profile from REAL decoded pixels: distinct
    5-bit RGB cells and the top cell's coverage — the
    synthetic/screenshot screen (tiny palettes = UI captures and
    flats, the registered multimodal_image_dominant_color's
    cardinality companion).  The Arrow stage emits two integers per
    image; the oracle quantizes the same arithmetic pixel grid."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    entries = _clr_entries(spark)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                q = (
                    (img[:, :, 0] // 8) * 1024
                    + (img[:, :, 1] // 8) * 32
                    + img[:, :, 2] // 8
                ).reshape(-1)
                _, counts = np.unique(q, return_counts=True)
                out.append(
                    (int(did), int(q.size), int(counts.size), int(counts.max()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_px", "n_colors", "top_cnt"]
            )

    s = entries.mapInPandas(
        stats, "doc_id long, n_px long, n_colors long, top_cnt long"
    )
    return s.select(
        "doc_id",
        F.col("n_colors").cast("long").alias("n_colors"),
        F.round(F.col("top_cnt") / F.col("n_px"), 6).alias("top_share"),
        (F.col("n_colors") < 64).cast("long").alias("low_palette"),
    ).orderBy("doc_id")


QUERIES["multimodal_image_palette"] = multimodal_image_palette

ORACLES["multimodal_image_palette"] = f"""
    WITH {_CLR_GRID},
    q AS (
      SELECT doc_id, (r // 8) * 1024 + (g // 8) * 32 + (b // 8) AS cell
      FROM px),
    cells AS (
      SELECT doc_id, cell, count(*) AS cnt FROM q GROUP BY 1, 2),
    s AS (
      SELECT doc_id, count(*) AS n_colors, max(cnt) AS top_cnt,
             sum(cnt) AS n_px
      FROM cells GROUP BY 1)
    SELECT doc_id, CAST(n_colors AS BIGINT) AS n_colors,
           round(top_cnt / CAST(n_px AS DOUBLE), 6) AS top_share,
           CAST(n_colors < 64 AS BIGINT) AS low_palette
    FROM s ORDER BY doc_id
"""


MIR_N_DOCS = 16
MIR_H, MIR_W = 18, 24


def multimodal_image_mirror_symmetry(spark: SparkSession, sf: str) -> DataFrame:
    """Horizontal mirror-symmetry score from REAL decoded pixels: the
    mean absolute difference between each pixel and its horizontal
    mirror (0 = perfectly symmetric) — the cheap screen for mirrored
    near-duplicates and synthetic reflections an image dedup pass runs
    before pHash.  Even docs are constructed symmetric, odd docs are
    not; the Arrow stage emits one integer SAD per image; the oracle
    regenerates the pixel arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(MIR_N_DOCS):
        yy, xx = np.mgrid[0:MIR_H, 0:MIR_W]
        if d % 2 == 0:
            xe = np.minimum(xx, MIR_W - 1 - xx)
        else:
            xe = xx
        v = ((xe * 3 + yy * 5 + 11 * d) % 256).astype(np.uint8)
        rows.append((d, f"{d}.png", bytearray(encode_png(np.dstack([v] * 3)))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def sad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content))[:, :, 0].astype(np.int64)
                half = MIR_W // 2
                diff = np.abs(img[:, :half] - img[:, ::-1][:, :half])
                out.append((int(did), int(diff.sum()), int(diff.size)))
            yield pd.DataFrame(out, columns=["doc_id", "sad", "n_px"])

    s = entries.mapInPandas(sad, "doc_id long, sad long, n_px long")
    return s.select(
        "doc_id",
        F.col("sad").cast("long").alias("sad"),
        F.round(F.col("sad") / F.col("n_px"), 6).alias("mean_abs_diff"),
        (F.col("sad") == 0).cast("long").alias("symmetric"),
    ).orderBy("doc_id")


QUERIES["multimodal_image_mirror_symmetry"] = multimodal_image_mirror_symmetry

ORACLES["multimodal_image_mirror_symmetry"] = f"""
    WITH d AS (SELECT unnest(range({MIR_N_DOCS})) AS doc_id),
    px AS (
      SELECT doc_id, y, x,
             ((CASE WHEN doc_id % 2 = 0 THEN least(x, {MIR_W} - 1 - x)
                    ELSE x END) * 3 + y * 5 + 11 * doc_id) % 256 AS v,
             ((CASE WHEN doc_id % 2 = 0
                    THEN least({MIR_W} - 1 - x, x)
                    ELSE {MIR_W} - 1 - x END) * 3 + y * 5 + 11 * doc_id) % 256
               AS vm
      FROM d, unnest(range({MIR_H})) u(y), unnest(range({MIR_W})) w(x)),
    half AS (
      SELECT doc_id, abs(v - vm) AS ad FROM px WHERE x < {MIR_W} // 2),
    s AS (
      SELECT doc_id, sum(ad) AS sad, count(*) AS n_px FROM half GROUP BY 1)
    SELECT doc_id, CAST(sad AS BIGINT) AS sad,
           round(sad / CAST(n_px AS DOUBLE), 6) AS mean_abs_diff,
           CAST(sad = 0 AS BIGINT) AS symmetric
    FROM s ORDER BY doc_id
"""


SNR_N_DOCS = 12
SNR_PERIOD = 100


def multimodal_audio_snr(spark: SparkSession, sf: str) -> DataFrame:
    """Per-recording SNR of REAL-decoded PCM16 WAVs carrying a
    period-100 square wave plus deterministic LCG noise, via the ANOVA
    phase-folding estimator: between-phase variance is signal power,
    within-phase variance is noise power — the speech-corpus admission
    gate next to the registered multimodal_audio_clipping.  The Arrow
    stage emits four exact integers (n, sum, sum-of-squares, phase-sum
    squares; sample counts are multiples of the period so phase counts
    divide exactly); snr_db closes relationally; the oracle
    regenerates the identical sample stream arithmetically."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        decode_wav,
        encode_wav_pcm16,
    )

    P = SNR_PERIOD
    rows = []
    for d in range(SNR_N_DOCS):
        n = 2000 + 400 * (d % 3)  # multiples of the period
        i = np.arange(n, dtype=np.int64)
        sq = np.where((i // (P // 2)) % 2 == 0, 6000 + 500 * d, -(6000 + 500 * d))
        noise = ((i * 1103515245 + 12345 + d * 7919) % 2048) - 1024
        rows.append((d, f"{d}.wav", bytearray(encode_wav_pcm16(sq + noise, 8000))))
    audio = spark.createDataFrame(
        rows, "doc_id long, file_name string, content binary"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                samples, _rate = decode_wav(bytes(content))
                s = np.asarray(samples, dtype=np.int64).reshape(-1)
                n = s.size
                phases = s.reshape(n // P, P)
                sp = phases.sum(axis=0)  # per-phase sums, exact ints
                out.append(
                    (
                        int(did),
                        int(n),
                        int(s.sum()),
                        int((s * s).sum()),
                        int((sp * sp).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "n", "sx", "sxx", "ssp"])

    s = audio.mapInPandas(stats, "doc_id long, n long, sx long, sxx long, ssp long")
    n = F.col("n").cast("double")
    n_per = n / P  # exact: n is a multiple of P
    between = F.col("ssp") / n_per - (F.col("sx") * F.col("sx")) / n
    within = F.col("sxx") - F.col("ssp") / n_per
    snr = 10.0 * F.log10(between / within)
    return s.select(
        "doc_id",
        F.col("n").cast("long").alias("n_samples"),
        F.round(between / n, 4).alias("signal_power"),
        F.round(within / n, 4).alias("noise_power"),
        F.round(snr, 4).alias("snr_db"),
        (snr > 20.0).cast("long").alias("clean"),
    ).orderBy("doc_id")


QUERIES["multimodal_audio_snr"] = multimodal_audio_snr

ORACLES["multimodal_audio_snr"] = f"""
    WITH d AS (SELECT unnest(range({SNR_N_DOCS})) AS doc_id),
    par AS (SELECT doc_id, 2000 + 400 * (doc_id % 3) AS n FROM d),
    samp AS (
      SELECT doc_id, i, i % {SNR_PERIOD} AS phase,
             (CASE WHEN (i // {SNR_PERIOD // 2}) % 2 = 0
                   THEN 6000 + 500 * doc_id
                   ELSE -(6000 + 500 * doc_id) END
              + ((i * 1103515245 + 12345 + doc_id * 7919) % 2048) - 1024) AS x
      FROM par, unnest(range(n)) u(i)),
    ph AS (
      SELECT doc_id, phase, sum(x) AS sp FROM samp GROUP BY 1, 2),
    agg AS (
      SELECT s.doc_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
             (SELECT sum(sp * sp) FROM ph WHERE ph.doc_id = s.doc_id) AS ssp
      FROM samp s GROUP BY 1),
    f AS (
      SELECT doc_id, n,
             ssp / (n / CAST({SNR_PERIOD} AS DOUBLE))
               - CAST(sx AS DOUBLE) * sx / n AS between_,
             sxx - ssp / (n / CAST({SNR_PERIOD} AS DOUBLE)) AS within_
      FROM agg)
    SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
           round(between_ / n, 4) AS signal_power,
           round(within_ / n, 4) AS noise_power,
           round(10.0 * log10(between_ / within_), 4) AS snr_db,
           CAST(10.0 * log10(between_ / within_) > 20.0 AS BIGINT) AS clean
    FROM f ORDER BY doc_id
"""


# --- graph estimators / final batch ------------------------------------------


def graph_wedge_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """Wedge-sampled global clustering coefficient (Seshadhri et al.):
    hash-sample wedges (two edges at a common center), check closure
    only for the sample, and compare against the exact
    3*triangles/wedges — the estimator that makes clustering
    coefficients tractable at 100 TB, audited against truth at test
    scale.  The closure check (the expensive join) touches ONLY
    sampled wedges; sampling is a deterministic md5 predicate, so the
    estimate is rerun-stable."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % JACC_ORDER_MOD == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = a.join(b, "o").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    p1 = adj.select(F.col("v").alias("w"), F.col("n").alias("x"))
    p2 = adj.select(F.col("v").alias("w"), F.col("n").alias("y"))
    wedges = p1.join(p2, "w").where(F.col("x") < F.col("y"))
    # exact: every wedge, closed iff edge (x, y) exists
    closed_all = wedges.join(
        edges, (wedges.x == edges.a) & (wedges.y == edges.b), "left_semi"
    )
    exact = wedges.agg(F.count(F.lit(1)).alias("wedges")).crossJoin(
        closed_all.agg(F.count(F.lit(1)).alias("closed"))
    )
    # sampled: md5(center, x, y) % 37 == 0
    samp = wedges.where(
        md5_int32(F.concat_ws(":", "w", "x", "y")) % 37 == 0
    )
    samp_closed = samp.join(
        edges, (samp.x == edges.a) & (samp.y == edges.b), "left_semi"
    )
    sampled = samp.agg(F.count(F.lit(1)).alias("s_wedges")).crossJoin(
        samp_closed.agg(F.count(F.lit(1)).alias("s_closed"))
    )
    out = exact.crossJoin(sampled)
    c_exact = F.col("closed") / F.col("wedges")
    c_est = F.col("s_closed") / F.col("s_wedges")
    return out.select(
        F.col("wedges").cast("long").alias("wedges"),
        F.col("s_wedges").cast("long").alias("sampled_wedges"),
        F.round(c_exact, 6).alias("clustering_exact"),
        F.round(c_est, 6).alias("clustering_sampled"),
        F.round(F.abs(c_est - c_exact), 6).alias("abs_error"),
    )


QUERIES["graph_wedge_sampling"] = graph_wedge_sampling


def _wedge_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    h = md5_int32_sql(
        "CAST(w AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':' || CAST(y AS VARCHAR)"
    )
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey
                FROM lineitem WHERE l_orderkey % {JACC_ORDER_MOD} = 0),
    edges AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM li a JOIN li b ON a.o = b.o AND a.l_partkey < b.l_partkey),
    adj AS (SELECT a AS v, b AS n FROM edges
            UNION ALL SELECT b, a FROM edges),
    wedges AS (
      SELECT p1.v AS w, p1.n AS x, p2.n AS y
      FROM adj p1 JOIN adj p2 ON p1.v = p2.v AND p1.n < p2.n),
    closed_all AS (
      SELECT * FROM wedges
      WHERE EXISTS (SELECT 1 FROM edges e WHERE e.a = x AND e.b = y)),
    samp AS (SELECT * FROM wedges WHERE {h} % 37 = 0),
    samp_closed AS (
      SELECT * FROM samp
      WHERE EXISTS (SELECT 1 FROM edges e WHERE e.a = x AND e.b = y)),
    agg AS (
      SELECT (SELECT count(*) FROM wedges) AS wedges,
             (SELECT count(*) FROM closed_all) AS closed,
             (SELECT count(*) FROM samp) AS s_wedges,
             (SELECT count(*) FROM samp_closed) AS s_closed)
    SELECT CAST(wedges AS BIGINT) AS wedges,
           CAST(s_wedges AS BIGINT) AS sampled_wedges,
           round(closed / CAST(wedges AS DOUBLE), 6) AS clustering_exact,
           round(s_closed / CAST(s_wedges AS DOUBLE), 6) AS clustering_sampled,
           round(abs(s_closed / CAST(s_wedges AS DOUBLE)
                     - closed / CAST(wedges AS DOUBLE)), 6) AS abs_error
    FROM agg
"""


ORACLES["graph_wedge_sampling"] = _wedge_oracle()


def graph_edge_embeddedness(spark: SparkSession, sf: str) -> DataFrame:
    """Edge-embeddedness histogram: for every co-purchase edge, the
    number of common neighbors of its endpoints — embeddedness 0 marks
    LOCAL BRIDGES (the weak ties information flows across,
    Granovetter), high embeddedness marks redundant intra-community
    edges.  Common neighbors come from the two-hop equi-join meeting
    at the shared neighbor (never all pairs); the histogram is
    cardinality-bounded."""
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % JACC_ORDER_MOD == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = a.join(b, "o").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    p1 = adj.select(F.col("n").alias("w"), F.col("v").alias("x"))
    p2 = adj.select(F.col("n").alias("w"), F.col("v").alias("y"))
    common = (
        p1.join(p2, "w")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("emb"))
    )
    scored = edges.join(
        common, (edges.a == common.x) & (edges.b == common.y), "left"
    ).select(F.coalesce(F.col("emb"), F.lit(0)).alias("emb"))
    hist = scored.groupBy("emb").agg(F.count(F.lit(1)).alias("n_edges"))
    tot = hist.agg(
        F.sum("n_edges").alias("te"),
        F.sum(F.when(F.col("emb") == 0, F.col("n_edges")).otherwise(0)).alias(
            "bridges"
        ),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("emb").cast("long").alias("embeddedness"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.round(F.col("n_edges") / F.col("te"), 6).alias("share"),
            F.col("bridges").cast("long").alias("local_bridges"),
        )
        .orderBy("embeddedness")
        .limit(20)
    )


QUERIES["graph_edge_embeddedness"] = graph_edge_embeddedness


def _emb_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey
                FROM lineitem WHERE l_orderkey % {JACC_ORDER_MOD} = 0),
    edges AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM li a JOIN li b ON a.o = b.o AND a.l_partkey < b.l_partkey),
    adj AS (SELECT a AS v, b AS n FROM edges
            UNION ALL SELECT b, a FROM edges),
    common AS (
      SELECT p1.v AS x, p2.v AS y, count(*) AS emb
      FROM adj p1 JOIN adj p2 ON p1.n = p2.n AND p1.v < p2.v
      GROUP BY 1, 2),
    scored AS (
      SELECT coalesce(c.emb, 0) AS emb
      FROM edges e LEFT JOIN common c ON e.a = c.x AND e.b = c.y),
    hist AS (SELECT emb, count(*) AS n_edges FROM scored GROUP BY 1),
    tot AS (
      SELECT sum(n_edges) AS te,
             sum(CASE WHEN emb = 0 THEN n_edges ELSE 0 END) AS bridges
      FROM hist)
    SELECT CAST(emb AS BIGINT) AS embeddedness,
           CAST(n_edges AS BIGINT) AS n_edges,
           round(n_edges / CAST(te AS DOUBLE), 6) AS share,
           CAST(bridges AS BIGINT) AS local_bridges
    FROM hist CROSS JOIN tot
    ORDER BY emb LIMIT 20
"""


ORACLES["graph_edge_embeddedness"] = _emb_oracle()


def sample_capped_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Availability-capped proportional budget allocation
    (waterfilling): give each source budget proportional to its
    quality weight, capped at its availability, redistributing capped
    surplus — solved in CLOSED FORM by sorting sources by
    availability/weight and picking the prefix where the water level
    lands (one window pass over the 20-source table; no iteration).
    The mixture-construction step between the registered
    sample_source_mixture and an actual token budget."""
    d = t(spark, sf, "documents").select("source", "n_chars")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("avail"),
        (F.sum("n_chars") / F.count(F.lit(1))).alias("wq"),
    )
    tot = src.agg(
        F.sum("avail").alias("corpus"), F.sum("wq").alias("wsum")
    ).select((F.col("corpus") * 0.3).alias("budget"), "wsum")
    w = Window.orderBy((F.col("avail") / F.col("wq")).asc(), F.col("source").asc())
    ranked = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        "wq",
        "budget",
        (F.col("avail") / F.col("wq")).alias("ratio"),
        F.sum("avail").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias(
            "cap_prefix"
        ),
        (
            F.col("wsum")
            - F.sum("wq").over(w.rowsBetween(Window.unboundedPreceding, 0))
            + F.col("wq")
        ).alias("w_suffix"),
        F.lead(F.col("avail") / F.col("wq")).over(w).alias("next_ratio"),
    )
    lam = (F.col("budget") - F.coalesce(F.col("cap_prefix"), F.lit(0.0))) / F.col(
        "w_suffix"
    )
    levels = ranked.select(
        "source",
        "avail",
        "wq",
        lam.alias("lam"),
        ((lam >= F.col("ratio") * 0.0)  # lam always valid lower bound at k=1
         & (F.col("next_ratio").isNull() | (lam <= F.col("next_ratio")))
         & (lam <= F.col("ratio"))).alias("ok_interior"),
        F.col("ratio"),
        F.col("next_ratio"),
    )
    # the water level is the FIRST lam (in ratio order) that is <= the
    # current ratio (every earlier source caps out)
    pick = (
        levels.where(F.col("lam") <= F.col("ratio"))
        .orderBy(F.col("ratio").asc(), F.col("source").asc())
        .limit(1)
        .select(F.col("lam").alias("level"))
    )
    out = src.crossJoin(F.broadcast(pick)).select(
        "source",
        F.col("avail").cast("long").alias("available"),
        F.round(F.col("wq"), 4).alias("weight"),
        F.round(F.least(F.col("avail").cast("double"), F.col("level") * F.col("wq")), 4).alias(
            "allocation"
        ),
        (F.col("avail") <= F.col("level") * F.col("wq")).cast("long").alias(
            "capped"
        ),
    )
    return out.orderBy("source")


QUERIES["sample_capped_allocation"] = sample_capped_allocation

ORACLES["sample_capped_allocation"] = """
    WITH src AS (
      SELECT source, count(*) AS avail,
             sum(n_chars) / count(*) AS wq
      FROM documents GROUP BY 1),
    tot AS (
      SELECT sum(avail) * 0.3 AS budget, sum(wq) AS wsum FROM src),
    ranked AS (
      SELECT source, avail, wq, budget,
             avail / wq AS ratio,
             coalesce(sum(avail) OVER (ORDER BY avail / wq ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS cap_prefix,
             wsum - sum(wq) OVER (ORDER BY avail / wq ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + wq
               AS w_suffix
      FROM src CROSS JOIN tot),
    levels AS (
      SELECT source, ratio, (budget - cap_prefix) / w_suffix AS lam
      FROM ranked),
    pick AS (
      SELECT lam AS level FROM levels WHERE lam <= ratio
      ORDER BY ratio ASC, source ASC LIMIT 1)
    SELECT source, CAST(avail AS BIGINT) AS available,
           round(wq, 4) AS weight,
           round(least(CAST(avail AS DOUBLE), level * wq), 4) AS allocation,
           CAST(avail <= level * wq AS BIGINT) AS capped
    FROM src CROSS JOIN pick
    ORDER BY source
"""


def agg_process_capability(spark: SparkSession, sf: str) -> DataFrame:
    """Process-capability indices Cp / Cpk of lineitem quantity against
    the [1, 50] spec band, per line status — the SPC readout that says
    whether a pipeline stage stays in spec (Cpk < 1 = it ships
    defects).  Quantities are small integers, so moments are exact
    without splitting."""
    li = t(spark, sf, "lineitem").select(
        "l_linestatus", F.col("l_quantity").cast("long").alias("q")
    )
    g = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s") / n
    sd = F.sqrt((F.col("qq") - n * mu * mu) / (n - 1))
    cp = (50.0 - 1.0) / (6.0 * sd)
    cpk = F.least(50.0 - mu, mu - 1.0) / (3.0 * sd)
    return g.select(
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.round(mu, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(cp, 6).alias("cp"),
        F.round(cpk, 6).alias("cpk"),
        (cpk < 1.0).cast("long").alias("ships_defects"),
    ).orderBy("l_linestatus")


QUERIES["agg_process_capability"] = agg_process_capability

ORACLES["agg_process_capability"] = """
    WITH g AS (
      SELECT l_linestatus, count(*) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS s,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS qq
      FROM lineitem GROUP BY 1),
    f AS (
      SELECT l_linestatus, n, s / CAST(n AS DOUBLE) AS mu,
             sqrt((qq - n * (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
                  / (n - 1)) AS sd
      FROM g)
    SELECT l_linestatus, CAST(n AS BIGINT) AS n,
           round(mu, 6) AS mean, round(sd, 6) AS sd,
           round(49.0 / (6.0 * sd), 6) AS cp,
           round(least(50.0 - mu, mu - 1.0) / (3.0 * sd), 6) AS cpk,
           CAST(least(50.0 - mu, mu - 1.0) / (3.0 * sd) < 1.0 AS BIGINT)
             AS ships_defects
    FROM f ORDER BY l_linestatus
"""


def ts_esd_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Generalized ESD outlier sweep (3 unrolled rounds): each round
    standardizes daily revenue against the CURRENT survivor set, emits
    the most extreme day's R statistic, and removes it — the
    multi-outlier-safe generalization of the registered
    agg_grubbs_outlier (which masks when two outliers shadow each
    other).  Each round is one exact-moment aggregate plus one ranked
    pick on the per-day table; rounds are fixed at 3, so the plan is a
    bounded chain, not iteration."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    o = t(spark, sf, "orders").select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / F.lit(86400000))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    day = o.groupBy("d").agg(F.sum("cents").alias("y"))
    survivors = day
    outs = []
    for rnd in (1, 2, 3):
        mom = survivors.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("s"),
            *_split_sum(F.col("y") * F.col("y"), "q"),
        )
        n = F.col("n").cast("double")
        mu = F.col("s") / n
        sd = F.sqrt((_split_val("q", 1.0) - n * mu * mu) / (n - 1))
        scored = survivors.crossJoin(F.broadcast(mom)).select(
            "d",
            "y",
            (F.abs(F.col("y") - mu) / sd).alias("r"),
        )
        top = scored.orderBy(F.col("r").desc(), F.col("d").asc()).limit(1)
        outs.append(
            top.select(
                F.lit(rnd).cast("long").alias("round"),
                F.col("d").cast("long").alias("day"),
                F.round(F.col("y") / 100.0, 2).alias("revenue"),
                F.round(F.col("r"), 6).alias("esd_r"),
            )
        )
        top_d = top.select(F.col("d").alias("dd"))
        survivors = survivors.join(
            F.broadcast(top_d), survivors.d == F.col("dd"), "left_anti"
        )
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionByName(o2)
    return out.orderBy("round")


QUERIES["ts_esd_outliers"] = ts_esd_outliers

ORACLES["ts_esd_outliers"] = """
    WITH day AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) // 86400000 AS BIGINT) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    m1 AS (
      SELECT count(*) AS n, sum(y) / CAST(count(*) AS DOUBLE) AS mu,
             sqrt(((CAST(sum(y * y // 1073741824) AS DOUBLE) * 1073741824.0
                    + sum(y * y % 1073741824))
                   - count(*) * (sum(y) / CAST(count(*) AS DOUBLE))
                     * (sum(y) / CAST(count(*) AS DOUBLE)))
                  / (count(*) - 1)) AS sd
      FROM day),
    t1 AS (
      SELECT d, y, abs(y - mu) / sd AS r FROM day CROSS JOIN m1
      ORDER BY r DESC, d ASC LIMIT 1),
    s2 AS (SELECT * FROM day WHERE d NOT IN (SELECT d FROM t1)),
    m2 AS (
      SELECT count(*) AS n, sum(y) / CAST(count(*) AS DOUBLE) AS mu,
             sqrt(((CAST(sum(y * y // 1073741824) AS DOUBLE) * 1073741824.0
                    + sum(y * y % 1073741824))
                   - count(*) * (sum(y) / CAST(count(*) AS DOUBLE))
                     * (sum(y) / CAST(count(*) AS DOUBLE)))
                  / (count(*) - 1)) AS sd
      FROM s2),
    t2 AS (
      SELECT d, y, abs(y - mu) / sd AS r FROM s2 CROSS JOIN m2
      ORDER BY r DESC, d ASC LIMIT 1),
    s3 AS (SELECT * FROM s2 WHERE d NOT IN (SELECT d FROM t2)),
    m3 AS (
      SELECT count(*) AS n, sum(y) / CAST(count(*) AS DOUBLE) AS mu,
             sqrt(((CAST(sum(y * y // 1073741824) AS DOUBLE) * 1073741824.0
                    + sum(y * y % 1073741824))
                   - count(*) * (sum(y) / CAST(count(*) AS DOUBLE))
                     * (sum(y) / CAST(count(*) AS DOUBLE)))
                  / (count(*) - 1)) AS sd
      FROM s3),
    t3 AS (
      SELECT d, y, abs(y - mu) / sd AS r FROM s3 CROSS JOIN m3
      ORDER BY r DESC, d ASC LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS round, CAST(d AS BIGINT) AS day,
           round(y / 100.0, 2) AS revenue, round(r, 6) AS esd_r FROM t1
    UNION ALL
    SELECT 2, CAST(d AS BIGINT), round(y / 100.0, 2), round(r, 6) FROM t2
    UNION ALL
    SELECT 3, CAST(d AS BIGINT), round(y / 100.0, 2), round(r, 6) FROM t3
    ORDER BY round
"""


def agg_ridge_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Ridge-regularized slope of order value on customer balance at a
    penalty grid {0, 1e4, 1e6}: b = Sxy / (Sxx + lambda) on centered
    exact-cents moments — the shrinkage path the registered
    agg_regression (OLS) sits at the lambda=0 end of.  One moment
    aggregate; three closing rows."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    c = t(spark, sf, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("x")
    )
    o = t(spark, sf, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("y")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    mom = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *_split_sum(F.col("x") * F.col("x"), "qxx"),
        *_split_sum(F.col("x") * F.col("y"), "qxy"),
    )
    n = F.col("n").cast("double")
    sxx = _split_val("qxx", 10000.0) - F.col("sx") / 100.0 * (F.col("sx") / 100.0) / n
    sxy = _split_val("qxy", 10000.0) - F.col("sx") / 100.0 * (F.col("sy") / 100.0) / n
    rows = []
    for lam in (0.0, 1e4, 1e6):
        rows.append(
            mom.select(
                F.lit(lam).alias("lam"),
                F.col("n").cast("long").alias("n"),
                F.round(sxy / (sxx + F.lit(lam)), 8).alias("ridge_slope"),
                F.round(
                    (sxy / (sxx + F.lit(lam))) / (sxy / sxx), 6
                ).alias("shrinkage"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("lam")


QUERIES["agg_ridge_regression"] = agg_ridge_regression

ORACLES["agg_ridge_regression"] = """
    WITH j AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey),
    mom AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x // 1073741824) AS qxx_hi, sum(x * x % 1073741824) AS qxx_lo,
             sum(x * y // 1073741824) AS qxy_hi, sum(x * y % 1073741824) AS qxy_lo
      FROM j),
    f AS (
      SELECT n,
        (CAST(qxx_hi AS DOUBLE) * 1073741824.0 + qxx_lo) / 10000.0
          - sx / 100.0 * (sx / 100.0) / n AS sxx,
        (CAST(qxy_hi AS DOUBLE) * 1073741824.0 + qxy_lo) / 10000.0
          - sx / 100.0 * (sy / 100.0) / n AS sxy
      FROM mom),
    lams AS (SELECT CAST(unnest([0.0, 1e4, 1e6]) AS DOUBLE) AS lam)
    SELECT lam, CAST(n AS BIGINT) AS n,
           round(sxy / (sxx + lam), 8) AS ridge_slope,
           round((sxy / (sxx + lam)) / (sxy / sxx), 6) AS shrinkage
    FROM f CROSS JOIN lams
    ORDER BY lam
"""


def search_wand_bounds(spark: SparkSession, sf: str) -> DataFrame:
    """WAND term upper bounds for a fixed 3-term query: per term the
    max tf*idf any document can contribute, the full-score top-1
    threshold theta, and the share of term-matching documents whose
    upper-bound sum cannot reach theta — i.e. the fraction a
    WAND-style top-1 retrieval SKIPS without scoring (Broder et al.).
    Postings statistics are one groupBy; everything downstream is
    term-count-bounded."""
    terms = ["data", "join", "key"]
    d = t(spark, sf, "documents").select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("w")
    ).where(F.col("w").isin(terms))
    tf = d.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = t(spark, sf, "documents").agg(F.count(F.lit(1)).alias("nd"))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "w", "df", F.log(1.0 + F.col("nd") / F.col("df")).alias("idf")
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        "doc_id", "w", "tf", (F.col("tf") * F.col("idf")).alias("sc")
    )
    ub = scored.groupBy("w").agg(
        F.max("tf").alias("max_tf"), F.max("sc").alias("ub")
    )
    full = scored.groupBy("doc_id").agg(F.sum("sc").alias("score"))
    theta = full.agg(F.max("score").alias("theta"))
    # per doc: sum of UBs of the terms it contains
    doc_ub = (
        scored.join(F.broadcast(ub.select("w", "ub")), "w")
        .groupBy("doc_id")
        .agg(F.sum("ub").alias("ub_sum"))
    )
    prune = doc_ub.crossJoin(F.broadcast(theta)).agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum((F.col("ub_sum") < F.col("theta")).cast("long")).alias("skippable"),
    )
    out = (
        ub.join(F.broadcast(idf.select("w", "df", "idf")), "w")
        .crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(prune))
    )
    return out.select(
        "w",
        F.col("df").cast("long").alias("df"),
        F.col("max_tf").cast("long").alias("max_tf"),
        F.round(F.col("ub"), 6).alias("upper_bound"),
        F.round(F.col("theta"), 6).alias("theta"),
        F.round(F.col("skippable") / F.col("cand"), 6).alias("skippable_share"),
    ).orderBy("w")


QUERIES["search_wand_bounds"] = search_wand_bounds

ORACLES["search_wand_bounds"] = r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents),
    d AS (SELECT doc_id, w FROM tok WHERE w IN ('data', 'join', 'key')),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM d GROUP BY 1, 2),
    idf AS (
      SELECT w, count(*) AS df,
             ln(1.0 + (SELECT count(*) FROM documents)
                / CAST(count(*) AS DOUBLE)) AS idf
      FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf, tf.tf * idf.idf AS sc
      FROM tf JOIN idf USING (w)),
    ub AS (SELECT w, max(tf) AS max_tf, max(sc) AS ub FROM scored GROUP BY 1),
    theta AS (
      SELECT max(score) AS theta FROM (
        SELECT doc_id, sum(sc) AS score FROM scored GROUP BY 1)),
    doc_ub AS (
      SELECT s.doc_id, sum(u.ub) AS ub_sum
      FROM scored s JOIN ub u USING (w) GROUP BY 1),
    prune AS (
      SELECT count(*) AS cand,
             sum(CASE WHEN ub_sum < (SELECT theta FROM theta)
                      THEN 1 ELSE 0 END) AS skippable
      FROM doc_ub)
    SELECT ub.w, CAST(idf.df AS BIGINT) AS df,
           CAST(ub.max_tf AS BIGINT) AS max_tf,
           round(ub.ub, 6) AS upper_bound,
           round((SELECT theta FROM theta), 6) AS theta,
           round(prune.skippable / CAST(prune.cand AS DOUBLE), 6)
             AS skippable_share
    FROM ub JOIN idf USING (w) CROSS JOIN prune
    ORDER BY ub.w
"""


def reco_cold_start(spark: SparkSession, sf: str) -> DataFrame:
    """Cold-start recommendation table: the top-3 parts per market
    segment by distinct buyers, with each part's within-segment
    popularity share — the fallback chain every recommender serves
    before a user has history (the registered reco_item_cooccurrence
    needs an anchor item; this needs nothing).  One aggregation to the
    (segment, part) grid, one window rank; ties break on partkey."""
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "l_partkey", "o_custkey")
    )
    pop = j.groupBy("c_mktsegment", "l_partkey").agg(
        F.countDistinct("o_custkey").alias("buyers")
    )
    seg = pop.groupBy("c_mktsegment").agg(F.sum("buyers").alias("seg_buyers"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("buyers").desc(), F.col("l_partkey").asc()
    )
    ranked = pop.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
    return (
        ranked.join(seg, "c_mktsegment")
        .select(
            "c_mktsegment",
            F.col("rk").cast("long").alias("rank"),
            F.col("l_partkey").cast("long").alias("l_partkey"),
            F.col("buyers").cast("long").alias("buyers"),
            F.round(F.col("buyers") / F.col("seg_buyers"), 6).alias("pop_share"),
        )
        .orderBy("c_mktsegment", "rank")
    )


QUERIES["reco_cold_start"] = reco_cold_start

ORACLES["reco_cold_start"] = """
    WITH j AS (
      SELECT c_mktsegment, l_partkey, o_custkey
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey),
    pop AS (
      SELECT c_mktsegment, l_partkey, count(DISTINCT o_custkey) AS buyers
      FROM j GROUP BY 1, 2),
    seg AS (
      SELECT c_mktsegment, sum(buyers) AS seg_buyers FROM pop GROUP BY 1),
    ranked AS (
      SELECT c_mktsegment, l_partkey, buyers,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY buyers DESC, l_partkey ASC) AS rk
      FROM pop)
    SELECT r.c_mktsegment, CAST(rk AS BIGINT) AS rank,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           CAST(buyers AS BIGINT) AS buyers,
           round(buyers / CAST(seg_buyers AS DOUBLE), 6) AS pop_share
    FROM ranked r JOIN seg s ON r.c_mktsegment = s.c_mktsegment
    WHERE rk <= 3
    ORDER BY r.c_mktsegment, rk
"""
