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
