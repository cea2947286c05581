"""Oracle-ready queries staged during r07 for later registration.

Same discipline as ``queries/r07_queue.py`` was under in r06: the
registry drains 50 driver slots per round, so new queries stage here —
fully oracled and exact-verified (``tests/test_r08_queue.py`` at
sf0.001, ``tools/check_oracle.py --staged`` at any sf dir) — and
register only when the never-driver-checked backlog allows (the r03
lesson: keep registry growth <= window drain rate).  Capped at <= 50
pairs per the drain plan in ``queries/__init__.py``.

Float-parity rules are the house ones (see ``queries/etl.py``):
computed integers cast to BIGINT both sides; row-level measures move
as scaled BIGINTs (the cents idiom, hi/lo-split when products can
overflow — ``operators/stats._split_sum``); float arithmetic over
small FIXED grids (pivoted cells, <= a few dozen terms) may sum
directly and round, the ``eval_fdr_bh`` precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERIES: dict = {}
ORACLES: dict = {}


# --- experimentation / guardrails ------------------------------------------


def stream_cuped_readout(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING CUPED monitor
    (``streaming/stateful.cuped_stream``, VERDICT r6 item 5): theta and
    the covariate mean are PRE-PERIOD statistics (orders before
    1997-01-01), deployed to the live side as constants — the
    ``cusum_stream`` pre-fit-target discipline — so the live readout is
    a map-side adjustment plus one keyed running aggregate whose final
    emission equals THIS query bit-for-bit (stream == batch asserted in
    tests/test_streaming.py).  Fit moments ride the hi/lo-split BIGINT
    sums; the post-period readout is per-variant exact cents sums."""
    o = t(spark, sf, "orders").select("o_custkey", "o_totalprice", "o_orderdate")
    c = t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        (F.col("o_custkey") % 2).alias("variant"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("ys"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("xs"),
        (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).alias("pre"),
    )
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    x, y = F.col("xs"), F.col("ys")
    fit = (
        j.where("pre")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xs").alias("sx"),
            F.sum("ys").alias("sy"),
            *_split_sum(x * x, "qxx"),
            *_split_sum(x * y, "qxy"),
        )
        .select(
            (
                (_split_val("qxy", 10000.0) - F.col("sx") / 100.0 * F.col("sy") / 100.0 / F.col("n"))
                / (_split_val("qxx", 10000.0) - F.col("sx") / 100.0 * F.col("sx") / 100.0 / F.col("n"))
            ).alias("theta"),
            (F.col("sx") / 100.0 / F.col("n")).alias("xbar"),
        )
    )
    post = (
        j.where(~F.col("pre"))
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ys").alias("sy"), F.sum("xs").alias("sx"))
    )
    return (
        post.crossJoin(F.broadcast(fit))
        .select(
            "variant",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sy") / 100.0 / F.col("n"), 6).alias("y_mean"),
            F.round(
                F.col("sy") / 100.0 / F.col("n")
                - F.col("theta") * (F.col("sx") / 100.0 / F.col("n") - F.col("xbar")),
                6,
            ).alias("cuped_mean"),
            F.round(F.col("theta"), 6).alias("theta"),
        )
        .orderBy("variant")
    )


QUERIES["stream_cuped_readout"] = stream_cuped_readout

ORACLES["stream_cuped_readout"] = """
    WITH b AS (
      SELECT o_custkey % 2 AS variant,
             CAST(round(o_totalprice * 100) AS BIGINT) AS ys,
             CAST(round(c_acctbal * 100) AS BIGINT) AS xs,
             o_orderdate < TIMESTAMP '1997-01-01' AS pre
      FROM orders JOIN customer ON o_custkey = c_custkey),
    fitagg AS (
      SELECT count(*) AS n, sum(xs) AS sx, sum(ys) AS sy,
             sum(xs * xs // 1073741824) AS qxx_hi,
             sum(xs * xs % 1073741824) AS qxx_lo,
             sum(xs * ys // 1073741824) AS qxy_hi,
             sum(xs * ys % 1073741824) AS qxy_lo
      FROM b WHERE pre),
    fit AS (
      SELECT
        ((CAST(qxy_hi AS DOUBLE) * 1073741824.0 + CAST(qxy_lo AS DOUBLE)) / 10000.0
          - sx / 100.0 * (sy / 100.0) / n)
        / ((CAST(qxx_hi AS DOUBLE) * 1073741824.0 + CAST(qxx_lo AS DOUBLE)) / 10000.0
          - sx / 100.0 * (sx / 100.0) / n) AS theta,
        sx / 100.0 / n AS xbar
      FROM fitagg),
    post AS (
      SELECT variant, count(*) AS n, sum(ys) AS sy, sum(xs) AS sx
      FROM b WHERE NOT pre GROUP BY 1)
    SELECT variant, CAST(n AS BIGINT) AS n,
           round(sy / 100.0 / n, 6) AS y_mean,
           round(sy / 100.0 / n - theta * (sx / 100.0 / n - xbar), 6) AS cuped_mean,
           round(theta, 6) AS theta
    FROM post CROSS JOIN fit
    ORDER BY variant
"""


def agg_srm_check(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first thing a trustworthy
    experimentation platform checks before reading any metric: a
    chi-squared goodness-of-fit of the 10 hash-variant counts against
    the designed equal split.  The statistic folds to the exact
    integer identity ``chi2 = 10*S2/n - n`` (S2 = sum of squared
    counts), so ONE float expression over two BIGINTs closes it —
    no order-dependent float sum anywhere."""
    v = t(spark, sf, "orders").select((F.col("o_custkey") % 10).alias("variant"))
    cells = v.groupBy("variant").agg(F.count(F.lit(1)).alias("obs"))
    return cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.sum(F.col("obs") * F.col("obs")).alias("__s2"),
        F.count(F.lit(1)).cast("long").alias("k_variants"),
    ).select(
        "n",
        "k_variants",
        F.round(10.0 * F.col("__s2") / F.col("n") - F.col("n"), 6).alias("chi2"),
        # df=9 critical value at p=0.01
        (10.0 * F.col("__s2") / F.col("n") - F.col("n") > 21.666).cast("long").alias(
            "srm_flag"
        ),
    )


QUERIES["agg_srm_check"] = agg_srm_check

ORACLES["agg_srm_check"] = """
    WITH cells AS (
      SELECT o_custkey % 10 AS variant, count(*) AS obs
      FROM orders GROUP BY 1),
    s AS (SELECT sum(obs) AS n, sum(obs * obs) AS s2, count(*) AS k FROM cells)
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_variants,
           round(10.0 * s2 / n - n, 6) AS chi2,
           CAST(10.0 * s2 / n - n > 21.666 AS BIGINT) AS srm_flag
    FROM s
"""


def stream_srm_guardrail(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of a LIVE per-day SRM monitor: daily variant counts
    (odd/even custkey) and the day's chi-squared against the 50/50
    design, ``chi2 = 2*S2/n - n`` from exact integers.  Counts are
    mergeable (sum across micro-batches), so a foreachBatch sink
    keeping (day, variant) counts reproduces this query exactly over
    any stream prefix — the ``stream_lateness_audit`` shape."""
    o = t(spark, sf, "orders").select(
        F.unix_millis(F.date_trunc("day", "o_orderdate")).alias("day_ms"),
        (F.col("o_custkey") % 2).alias("variant"),
    )
    cells = o.groupBy("day_ms", "variant").agg(F.count(F.lit(1)).alias("obs"))
    day = cells.groupBy("day_ms").agg(
        F.sum("obs").cast("long").alias("n"),
        F.sum(F.col("obs") * F.col("obs")).alias("__s2"),
    )
    out = day.select(
        "day_ms",
        "n",
        F.round(2.0 * F.col("__s2") / F.col("n") - F.col("n"), 6).alias("chi2"),
        # df=1 critical value at p=0.001
        (2.0 * F.col("__s2") / F.col("n") - F.col("n") > 10.828).cast("long").alias(
            "srm_flag"
        ),
    )
    return out.orderBy("day_ms")


QUERIES["stream_srm_guardrail"] = stream_srm_guardrail

ORACLES["stream_srm_guardrail"] = """
    WITH cells AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS day_ms,
             o_custkey % 2 AS variant, count(*) AS obs
      FROM orders GROUP BY 1, 2),
    day AS (
      SELECT day_ms, sum(obs) AS n, sum(obs * obs) AS s2
      FROM cells GROUP BY 1)
    SELECT day_ms, CAST(n AS BIGINT) AS n,
           round(2.0 * s2 / n - n, 6) AS chi2,
           CAST(2.0 * s2 / n - n > 10.828 AS BIGINT) AS srm_flag
    FROM day ORDER BY day_ms
"""


def eval_holm_bonferroni(spark: SparkSession, sf: str) -> DataFrame:
    """Holm step-down multiple-testing control over the same per-nation
    independence-test family as the registered ``eval_fdr_bh`` — the
    FWER-controlling counterpart to BH's FDR.  Adjusted p is the
    running max of ``(m-k+1)*p_(k)`` capped at 1 (a cumulative window
    over the m=25-row test table); rejection is the step-down prefix
    rule, all windowed on a table whose size is the number of TESTS,
    never the number of rows."""
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
    # m = number of TESTS (25), computed relationally (broadcast 1-row
    # aggregate) so building the DataFrame stays lazy — ADVICE r7: a
    # construction-time .count() made plan dumps execute a Spark job.
    m_df = tests.agg(F.count(F.lit(1)).alias("__m"))
    wk = Window.orderBy(F.col("p").asc(), F.col("c_nationkey").asc())
    ranked = tests.crossJoin(F.broadcast(m_df)).withColumn(
        "k", F.row_number().over(wk)
    )
    stepped = ranked.withColumn(
        "holm_p",
        F.least(
            F.lit(1.0),
            F.max((F.col("__m") - F.col("k") + 1) * F.col("p")).over(
                wk.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ),
    )
    return stepped.select(
        "c_nationkey",
        F.round("p", 9).alias("p_value"),
        F.col("k").cast("long").alias("rank"),
        F.round("holm_p", 9).alias("holm_p"),
        (F.col("holm_p") <= 0.05).alias("rejected"),
    ).orderBy("rank")


QUERIES["eval_holm_bonferroni"] = eval_holm_bonferroni

ORACLES["eval_holm_bonferroni"] = """
    WITH j AS (
      SELECT c_nationkey,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS big,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END
               AS urgent
      FROM customer JOIN orders ON c_custkey = o_custkey),
    cells AS (SELECT c_nationkey, big, urgent, count(*) AS n
              FROM j GROUP BY 1, 2, 3),
    rows_ AS (SELECT c_nationkey, big, sum(n) AS rn FROM cells GROUP BY 1, 2),
    cols_ AS (SELECT c_nationkey, urgent, sum(n) AS cn FROM cells GROUP BY 1, 2),
    tot AS (SELECT c_nationkey, sum(n) AS nt FROM cells GROUP BY 1),
    grid AS (
      SELECT r.c_nationkey, r.big, c.urgent, r.rn, c.cn, t.nt,
             coalesce(x.n, 0) AS n
      FROM rows_ r
      JOIN cols_ c ON r.c_nationkey = c.c_nationkey
      JOIN tot t ON r.c_nationkey = t.c_nationkey
      LEFT JOIN cells x ON x.c_nationkey = r.c_nationkey
                        AND x.big = r.big AND x.urgent = c.urgent),
    chi AS (
      SELECT c_nationkey,
             sum((n - rn * cn / CAST(nt AS DOUBLE))
                 * (n - rn * cn / CAST(nt AS DOUBLE))
                 / (rn * cn / CAST(nt AS DOUBLE))) AS chi2
      FROM grid GROUP BY 1),
    tests AS (SELECT c_nationkey, exp(-chi2 / 2) AS p FROM chi),
    m AS (SELECT count(*) AS m FROM tests),
    ranked AS (
      SELECT c_nationkey, p,
             row_number() OVER (ORDER BY p ASC, c_nationkey) AS k
      FROM tests),
    stepped AS (
      SELECT c_nationkey, p, k,
             least(1.0, max((m - k + 1) * p)
               OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)) AS holm_p
      FROM ranked CROSS JOIN m)
    SELECT c_nationkey, round(p, 9) AS p_value, CAST(k AS BIGINT) AS rank,
           round(holm_p, 9) AS holm_p, holm_p <= 0.05 AS rejected
    FROM stepped ORDER BY rank
"""


def agg_levene_test(spark: SparkSession, sf: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) homogeneity-of-variance
    test across the 3 return flags — the assumption check the
    registered ANOVA/Welch queries rely on.  Group medians are exact
    low-medians on cents; absolute deviations stay integer cents whose
    squares ride the hi/lo-split sums; the F statistic closes over the
    3 PIVOTED group cells as one fixed expression tree (no
    order-dependent float sum — the ``agg_cuped`` pivot discipline)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")  # Spark returns DOUBLE; the disc median IS a data value
        .alias("med")
    )
    z = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", F.abs(F.col("cents") - F.col("med")).alias("z")
    )
    g = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("sz"),
        *_split_sum(F.col("z") * F.col("z"), "qzz"),
    )
    per = g.select(
        "l_returnflag",
        "n",
        (F.col("sz") / 100.0).alias("szd"),
        _split_val("qzz", 10000.0).alias("qzz"),
    )

    def cell(flag, col):
        return F.max(F.when(F.col("l_returnflag") == flag, F.col(col)))

    piv = per.agg(
        *[cell(f, "n").alias(f"n_{f}") for f in "ANR"],
        *[cell(f, "szd").alias(f"s_{f}") for f in "ANR"],
        *[cell(f, "qzz").alias(f"q_{f}") for f in "ANR"],
    )
    n_tot = F.col("n_A") + F.col("n_N") + F.col("n_R")
    s_tot = F.col("s_A") + F.col("s_N") + F.col("s_R")
    ssb = (
        (F.col("s_A") * F.col("s_A") / F.col("n_A"))
        + (F.col("s_N") * F.col("s_N") / F.col("n_N"))
        + (F.col("s_R") * F.col("s_R") / F.col("n_R"))
        - s_tot * s_tot / n_tot
    )
    ssw = (
        (F.col("q_A") - F.col("s_A") * F.col("s_A") / F.col("n_A"))
        + (F.col("q_N") - F.col("s_N") * F.col("s_N") / F.col("n_N"))
        + (F.col("q_R") - F.col("s_R") * F.col("s_R") / F.col("n_R"))
    )
    fstat = (ssb / 2.0) / (ssw / (n_tot - 3))
    return piv.select(
        n_tot.cast("long").alias("n"),
        F.lit(3).cast("long").alias("k_groups"),
        F.round(fstat, 6).alias("bf_f"),
        (fstat > 4.61).cast("long").alias("heteroscedastic"),  # F(2,inf) @ .01
    )


QUERIES["agg_levene_test"] = agg_levene_test

ORACLES["agg_levene_test"] = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    med AS (
      SELECT l_returnflag,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
      FROM li GROUP BY 1),
    z AS (
      SELECT li.l_returnflag, abs(cents - med) AS z
      FROM li JOIN med ON li.l_returnflag = med.l_returnflag),
    g AS (
      SELECT l_returnflag, count(*) AS n, sum(z) AS sz,
             sum(z * z // 1073741824) AS qzz_hi,
             sum(z * z % 1073741824) AS qzz_lo
      FROM z GROUP BY 1),
    per AS (
      SELECT l_returnflag, n, sz / 100.0 AS szd,
             (CAST(qzz_hi AS DOUBLE) * 1073741824.0 + CAST(qzz_lo AS DOUBLE))
               / 10000.0 AS qzz
      FROM g),
    piv AS (
      SELECT
        max(CASE WHEN l_returnflag = 'A' THEN n END) AS n_a,
        max(CASE WHEN l_returnflag = 'N' THEN n END) AS n_n,
        max(CASE WHEN l_returnflag = 'R' THEN n END) AS n_r,
        max(CASE WHEN l_returnflag = 'A' THEN szd END) AS s_a,
        max(CASE WHEN l_returnflag = 'N' THEN szd END) AS s_n,
        max(CASE WHEN l_returnflag = 'R' THEN szd END) AS s_r,
        max(CASE WHEN l_returnflag = 'A' THEN qzz END) AS q_a,
        max(CASE WHEN l_returnflag = 'N' THEN qzz END) AS q_n,
        max(CASE WHEN l_returnflag = 'R' THEN qzz END) AS q_r
      FROM per),
    f AS (
      SELECT n_a + n_n + n_r AS n,
             ((s_a * s_a / n_a) + (s_n * s_n / n_n) + (s_r * s_r / n_r)
              - (s_a + s_n + s_r) * (s_a + s_n + s_r) / (n_a + n_n + n_r)) / 2.0
             / (((q_a - s_a * s_a / n_a) + (q_n - s_n * s_n / n_n)
                 + (q_r - s_r * s_r / n_r)) / (n_a + n_n + n_r - 3)) AS bf_f
      FROM piv)
    SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_groups,
           round(bf_f, 6) AS bf_f,
           CAST(bf_f > 4.61 AS BIGINT) AS heteroscedastic
    FROM f
"""


def agg_mantel_haenszel(spark: SparkSession, sf: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio across the 5 region strata —
    the stratified-confounding readout (exposure = odd custkey,
    outcome = order over 150k).  Each stratum's 2x2 cells are exact
    BIGINTs pivoted into columns, so the MH numerator/denominator and
    the CMH chi-squared close as one fixed float expression tree over
    5 cells — nothing order-dependent, nothing iterative."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        (F.col("o_custkey") % 2).alias("exposed"),
        (F.col("o_totalprice") > 150000).cast("int").alias("hit"),
    )
    strata = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 1), 1).otherwise(0)).alias("a"),
            F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 0), 1).otherwise(0)).alias("b"),
            F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 1), 1).otherwise(0)).alias("c"),
            F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 0), 1).otherwise(0)).alias("d"),
        )
    )
    nt = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    per = strata.select(
        "n_regionkey",
        (F.col("a") * F.col("d") / nt).alias("num"),
        (F.col("b") * F.col("c") / nt).alias("den"),
        (F.col("a")).cast("double").alias("obs_a"),
        ((F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) / nt).alias("exp_a"),
        (
            (F.col("a") + F.col("b"))
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (nt * nt * (nt - 1))
        ).alias("var_a"),
    )

    def cell(r, col):
        return F.max(F.when(F.col("n_regionkey") == r, F.col(col)))

    piv = per.agg(
        *[cell(r, "num").alias(f"num_{r}") for r in range(5)],
        *[cell(r, "den").alias(f"den_{r}") for r in range(5)],
        *[cell(r, "obs_a").alias(f"oa_{r}") for r in range(5)],
        *[cell(r, "exp_a").alias(f"ea_{r}") for r in range(5)],
        *[cell(r, "var_a").alias(f"va_{r}") for r in range(5)],
    )
    num = sum(F.col(f"num_{r}") for r in range(5))
    den = sum(F.col(f"den_{r}") for r in range(5))
    dev = sum(F.col(f"oa_{r}") for r in range(5)) - sum(
        F.col(f"ea_{r}") for r in range(5)
    )
    var = sum(F.col(f"va_{r}") for r in range(5))
    return piv.select(
        F.round(num / den, 6).alias("mh_odds_ratio"),
        F.round(dev * dev / var, 6).alias("cmh_chi2"),
        (dev * dev / var > 6.635).cast("long").alias("significant"),  # df=1 @ .01
    )


QUERIES["agg_mantel_haenszel"] = agg_mantel_haenszel

ORACLES["agg_mantel_haenszel"] = """
    WITH j AS (
      SELECT n_regionkey,
             o_custkey % 2 AS exposed,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS hit
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    strata AS (
      SELECT n_regionkey,
             sum(CASE WHEN exposed = 1 AND hit = 1 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN exposed = 1 AND hit = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN exposed = 0 AND hit = 1 THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN exposed = 0 AND hit = 0 THEN 1 ELSE 0 END) AS d
      FROM j GROUP BY 1),
    per AS (
      SELECT n_regionkey,
             a * d / CAST(a + b + c + d AS DOUBLE) AS num,
             b * c / CAST(a + b + c + d AS DOUBLE) AS den,
             CAST(a AS DOUBLE) AS oa,
             (a + b) * (a + c) / CAST(a + b + c + d AS DOUBLE) AS ea,
             (a + b) * (c + d) * (a + c) * (b + d)
               / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)
                  * (a + b + c + d - 1)) AS va
      FROM strata),
    piv AS (
      SELECT
        max(CASE WHEN n_regionkey = 0 THEN num END) AS num_0,
        max(CASE WHEN n_regionkey = 1 THEN num END) AS num_1,
        max(CASE WHEN n_regionkey = 2 THEN num END) AS num_2,
        max(CASE WHEN n_regionkey = 3 THEN num END) AS num_3,
        max(CASE WHEN n_regionkey = 4 THEN num END) AS num_4,
        max(CASE WHEN n_regionkey = 0 THEN den END) AS den_0,
        max(CASE WHEN n_regionkey = 1 THEN den END) AS den_1,
        max(CASE WHEN n_regionkey = 2 THEN den END) AS den_2,
        max(CASE WHEN n_regionkey = 3 THEN den END) AS den_3,
        max(CASE WHEN n_regionkey = 4 THEN den END) AS den_4,
        max(CASE WHEN n_regionkey = 0 THEN oa END) AS oa_0,
        max(CASE WHEN n_regionkey = 1 THEN oa END) AS oa_1,
        max(CASE WHEN n_regionkey = 2 THEN oa END) AS oa_2,
        max(CASE WHEN n_regionkey = 3 THEN oa END) AS oa_3,
        max(CASE WHEN n_regionkey = 4 THEN oa END) AS oa_4,
        max(CASE WHEN n_regionkey = 0 THEN ea END) AS ea_0,
        max(CASE WHEN n_regionkey = 1 THEN ea END) AS ea_1,
        max(CASE WHEN n_regionkey = 2 THEN ea END) AS ea_2,
        max(CASE WHEN n_regionkey = 3 THEN ea END) AS ea_3,
        max(CASE WHEN n_regionkey = 4 THEN ea END) AS ea_4,
        max(CASE WHEN n_regionkey = 0 THEN va END) AS va_0,
        max(CASE WHEN n_regionkey = 1 THEN va END) AS va_1,
        max(CASE WHEN n_regionkey = 2 THEN va END) AS va_2,
        max(CASE WHEN n_regionkey = 3 THEN va END) AS va_3,
        max(CASE WHEN n_regionkey = 4 THEN va END) AS va_4
      FROM per),
    f AS (
      SELECT
        (num_0 + num_1 + num_2 + num_3 + num_4)
          / (den_0 + den_1 + den_2 + den_3 + den_4) AS mh_or,
        ((oa_0 + oa_1 + oa_2 + oa_3 + oa_4)
         - (ea_0 + ea_1 + ea_2 + ea_3 + ea_4)) AS dev,
        (va_0 + va_1 + va_2 + va_3 + va_4) AS var
      FROM piv)
    SELECT round(mh_or, 6) AS mh_odds_ratio,
           round(dev * dev / var, 6) AS cmh_chi2,
           CAST(dev * dev / var > 6.635 AS BIGINT) AS significant
    FROM f
"""


def agg_ratio_jackknife(spark: SparkSession, sf: str) -> DataFrame:
    """Delete-one-group jackknife for a RATIO metric (revenue per unit,
    grouped by supplier nation) — the standard variance device for
    metrics that are not row-level means (where the CLT-on-rows CI is
    wrong).  The scale story: the data-sized pass is ONE keyed
    aggregate of exact integer sums; every leave-one-out replicate is
    then CLOSED FORM from the group table (total minus group), so no
    resampling pass ever touches the rows — the reason jackknife beats
    bootstrap at 100 TB.  LOO ratios are DEFINED on the 1e-4 grid
    (``round(r*10000)`` BIGINT) so both engines fold identical
    integers; variance closes from (sum, sum-of-squares)."""
    li = t(spark, sf, "lineitem").select("l_suppkey", "l_extendedprice", "l_quantity")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    g = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sy"),
            F.sum(F.round("l_quantity").cast("long")).alias("sx"),
        )
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("sy").alias("ty"),
        F.sum("sx").alias("tx"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "k",
        "ty",
        "tx",
        F.round(
            (F.col("ty") - F.col("sy")) / 100.0 / (F.col("tx") - F.col("sx")) * 10000
        )
        .cast("long")
        .alias("rj"),
    )
    agg = loo.groupBy("k", "ty", "tx").agg(
        F.sum("rj").alias("srj"), F.sum(F.col("rj") * F.col("rj")).alias("qrj")
    )
    kd = F.col("k").cast("double")
    theta = F.col("ty") / 100.0 / F.col("tx")
    mean_loo = F.col("srj") / 10000.0 / kd
    var_loo = (
        (F.col("qrj") - F.col("srj") * F.col("srj") / kd) / 100000000.0
    ) * (kd - 1) / kd
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.round(theta, 6).alias("theta"),
        F.round(kd * theta - (kd - 1) * mean_loo, 6).alias("theta_jack"),
        F.round(F.sqrt(var_loo), 6).alias("se_jack"),
    )


QUERIES["agg_ratio_jackknife"] = agg_ratio_jackknife

ORACLES["agg_ratio_jackknife"] = """
    WITH g AS (
      SELECT s_nationkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             sum(CAST(round(l_quantity) AS BIGINT)) AS sx
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1),
    tot AS (SELECT count(*) AS k, sum(sy) AS ty, sum(sx) AS tx FROM g),
    loo AS (
      SELECT k, ty, tx,
             CAST(round((ty - sy) / 100.0 / (tx - sx) * 10000) AS BIGINT) AS rj
      FROM g CROSS JOIN tot),
    a AS (
      SELECT k, ty, tx, sum(rj) AS srj, sum(rj * rj) AS qrj
      FROM loo GROUP BY 1, 2, 3)
    SELECT CAST(k AS BIGINT) AS k_groups,
           round(ty / 100.0 / tx, 6) AS theta,
           round(k * (ty / 100.0 / tx) - (k - 1) * (srj / 10000.0 / k), 6)
             AS theta_jack,
           round(sqrt((qrj - srj * srj / CAST(k AS DOUBLE)) / 100000000.0
                      * (k - 1) / k), 6) AS se_jack
    FROM a
"""


def agg_eb_shrinkage(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial method-of-moments) shrinkage of
    per-brand return rates toward the pooled rate — the standard fix
    for small-sample rate league tables (CTR, defect rates).  Brand
    rates are DEFINED on the 1e-6 grid so the MoM prior fits from
    identical integers in both engines; the data-sized pass is one
    keyed count aggregate, the fit is a 25-row fold, the shrink is a
    broadcast map-side expression."""
    li = t(spark, sf, "lineitem").select("l_partkey", "l_returnflag")
    p = t(spark, sf, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("k"),
        )
        .withColumn(
            "rg", F.round(F.col("k") / F.col("n") * 1000000).cast("long")
        )
    )
    fit = g.agg(
        F.count(F.lit(1)).alias("b"),
        F.sum("k").alias("tk"),
        F.sum("n").alias("tn"),
        F.sum("rg").alias("srg"),
        F.sum(F.col("rg") * F.col("rg")).alias("qrg"),
    ).select(
        (F.col("tk") / F.col("tn")).alias("m"),
        (
            (F.col("qrg") - F.col("srg") * F.col("srg") / F.col("b"))
            / (F.col("b") - 1)
            / 1e12
        ).alias("v"),
    ).select(
        "m",
        # prior strength; guard v <= 0 (no between-brand variance)
        F.when(
            F.col("v") > 0, F.col("m") * (1 - F.col("m")) / F.col("v") - 1
        )
        .otherwise(F.lit(1000000.0))
        .alias("s"),
    )
    return (
        g.crossJoin(F.broadcast(fit))
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k_returned"),
            F.round(F.col("k") / F.col("n"), 6).alias("raw_rate"),
            F.round(
                (F.col("k") + F.col("m") * F.col("s")) / (F.col("n") + F.col("s")), 6
            ).alias("shrunk_rate"),
        )
        .orderBy("p_brand")
    )


QUERIES["agg_eb_shrinkage"] = agg_eb_shrinkage

ORACLES["agg_eb_shrinkage"] = """
    WITH g AS (
      SELECT p_brand, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k,
             CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT) AS rg
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1),
    fit0 AS (
      SELECT count(*) AS b, sum(k) AS tk, sum(n) AS tn,
             sum(rg) AS srg, sum(rg * rg) AS qrg
      FROM g),
    fit1 AS (
      SELECT tk / CAST(tn AS DOUBLE) AS m,
             (qrg - srg * srg / CAST(b AS DOUBLE)) / (b - 1) / 1e12 AS v
      FROM fit0),
    fit AS (
      SELECT m,
             CASE WHEN v > 0 THEN m * (1 - m) / v - 1 ELSE 1000000.0 END AS s
      FROM fit1)
    SELECT p_brand, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_returned,
           round(k / CAST(n AS DOUBLE), 6) AS raw_rate,
           round((k + m * s) / (n + s), 6) AS shrunk_rate
    FROM g CROSS JOIN fit
    ORDER BY p_brand
"""


def agg_deming_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Deming (errors-in-variables) regression of extended price on
    quantity — the orthogonal fit for when BOTH variables carry noise,
    closed form from the same five split-BIGINT moments as the
    registered OLS (``operators/stats.grouped_regression`` overflow
    discipline): slope = (syy - sxx + sqrt((syy-sxx)^2 + 4 sxy^2)) /
    (2 sxy) at delta=1."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    li = t(spark, sf, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("xs"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ys"),
    )
    x, y = F.col("xs"), F.col("ys")
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xs").alias("sx"),
        F.sum("ys").alias("sy"),
        *_split_sum(x * x, "qxx"),
        *_split_sum(x * y, "qxy"),
        *_split_sum(y * y, "qyy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx") / 100.0, F.col("sy") / 100.0
    sxx = _split_val("qxx", 10000.0) - sxd * sxd / nd
    sxy = _split_val("qxy", 10000.0) - sxd * syd / nd
    syy = _split_val("qyy", 10000.0) - syd * syd / nd
    slope = (syy - sxx + F.sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy)) / (
        2 * sxy
    )
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("deming_slope"),
        F.round(syd / nd - slope * (sxd / nd), 6).alias("deming_intercept"),
        F.round(sxy / F.sqrt(sxx * syy), 6).alias("pearson_r"),
    )


QUERIES["agg_deming_regression"] = agg_deming_regression

ORACLES["agg_deming_regression"] = """
    WITH b AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS xs,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS ys
      FROM lineitem),
    a AS (
      SELECT count(*) AS n, sum(xs) AS sx, sum(ys) AS sy,
             sum(xs * xs // 1073741824) AS qxx_hi, sum(xs * xs % 1073741824) AS qxx_lo,
             sum(xs * ys // 1073741824) AS qxy_hi, sum(xs * ys % 1073741824) AS qxy_lo,
             sum(ys * ys // 1073741824) AS qyy_hi, sum(ys * ys % 1073741824) AS qyy_lo
      FROM b),
    m AS (
      SELECT n, sx / 100.0 AS sxd, sy / 100.0 AS syd,
             (CAST(qxx_hi AS DOUBLE) * 1073741824.0 + qxx_lo) / 10000.0
               - (sx / 100.0) * (sx / 100.0) / n AS sxx,
             (CAST(qxy_hi AS DOUBLE) * 1073741824.0 + qxy_lo) / 10000.0
               - (sx / 100.0) * (sy / 100.0) / n AS sxy,
             (CAST(qyy_hi AS DOUBLE) * 1073741824.0 + qyy_lo) / 10000.0
               - (sy / 100.0) * (sy / 100.0) / n AS syy
      FROM a),
    s AS (
      SELECT n, sxd, syd, sxx, sxy, syy,
             (syy - sxx + sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy))
               / (2 * sxy) AS slope
      FROM m)
    SELECT CAST(n AS BIGINT) AS n,
           round(slope, 6) AS deming_slope,
           round(syd / n - slope * (sxd / n), 6) AS deming_intercept,
           round(sxy / sqrt(sxx * syy), 6) AS pearson_r
    FROM s
"""


def agg_grubbs_outlier(spark: SparkSession, sf: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate test on customer balances.
    The deviation argmax is EXACT-integer: ``|n*x - sum|`` multiplies
    the mean through by n so the extremum and its tiebreak (larger
    custkey) compare BIGINTs, never floats; the statistic then closes
    from split-BIGINT moments.  One aggregate + one top-1 — nothing
    data-sized moves."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    c = t(spark, sf, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("xs")
    )
    mom = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xs").alias("sx"),
        *_split_sum(F.col("xs") * F.col("xs"), "qxx"),
    )
    dev = (
        c.crossJoin(F.broadcast(mom))
        .select(
            "c_custkey",
            "n",
            "sx",
            "qxx_hi",
            "qxx_lo",
            F.abs(F.col("n") * F.col("xs") - F.col("sx")).alias("devn"),
        )
        .orderBy(F.col("devn").desc(), F.col("c_custkey").desc())
        .limit(1)
    )
    nd = F.col("n").cast("double")
    var = (_split_val("qxx", 10000.0) - (F.col("sx") / 100.0) * (F.col("sx") / 100.0) / nd) / (
        nd - 1
    )
    g = (F.col("devn") / nd / 100.0) / F.sqrt(var)
    return dev.select(
        F.col("n").cast("long").alias("n"),
        F.col("c_custkey").alias("outlier_custkey"),
        F.round(g, 6).alias("g_stat"),
        (g > 4.0).cast("long").alias("outlier_flag"),
    )


QUERIES["agg_grubbs_outlier"] = agg_grubbs_outlier

ORACLES["agg_grubbs_outlier"] = """
    WITH c AS (
      SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS xs
      FROM customer),
    mom AS (
      SELECT count(*) AS n, sum(xs) AS sx,
             sum(xs * xs // 1073741824) AS qxx_hi,
             sum(xs * xs % 1073741824) AS qxx_lo
      FROM c),
    dev AS (
      SELECT c_custkey, n, sx, qxx_hi, qxx_lo,
             abs(n * xs - sx) AS devn
      FROM c CROSS JOIN mom
      ORDER BY devn DESC, c_custkey DESC LIMIT 1),
    s AS (
      SELECT n, c_custkey, devn,
             ((CAST(qxx_hi AS DOUBLE) * 1073741824.0 + qxx_lo) / 10000.0
              - (sx / 100.0) * (sx / 100.0) / n) / (n - 1) AS var
      FROM dev)
    SELECT CAST(n AS BIGINT) AS n, c_custkey AS outlier_custkey,
           round((devn / CAST(n AS DOUBLE) / 100.0) / sqrt(var), 6) AS g_stat,
           CAST((devn / CAST(n AS DOUBLE) / 100.0) / sqrt(var) > 4.0 AS BIGINT)
             AS outlier_flag
    FROM s
"""


def agg_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily-revenue
    direction sequence — the classic check that a KPI's up/down moves
    are not streaky.  Day totals are exact cents; signs, the lag
    comparison, and the run count are integers over the DAY table
    (bounded by the calendar, not the row count); z closes as one
    float expression."""
    day = (
        t(spark, sf, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
    )
    w = Window.orderBy("day")
    sgn = (
        day.withColumn("prev", F.lag("rev").over(w))
        .where(F.col("prev").isNotNull() & (F.col("rev") != F.col("prev")))
        .select((F.col("rev") > F.col("prev")).cast("int").alias("up"))
    )
    w2 = Window.orderBy(F.monotonically_increasing_id())
    # runs = 1 + number of sign changes, computed order-safely by
    # re-deriving the ordered sequence
    seq = (
        day.withColumn("prev", F.lag("rev").over(w))
        .where(F.col("prev").isNotNull() & (F.col("rev") != F.col("prev")))
        .select(
            F.col("day"), (F.col("rev") > F.col("prev")).cast("int").alias("up")
        )
        .withColumn("chg", (F.col("up") != F.lag("up").over(Window.orderBy("day"))).cast("int"))
    )
    a = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("up").alias("npos"),
        (F.sum(F.coalesce(F.col("chg"), F.lit(0))) + 1).alias("runs"),
    )
    nd = F.col("n").cast("double")
    np_, nn = F.col("npos").cast("double"), (F.col("n") - F.col("npos")).cast("double")
    mu = 2 * np_ * nn / nd + 1
    sig2 = 2 * np_ * nn * (2 * np_ * nn - nd) / (nd * nd * (nd - 1))
    z = (F.col("runs") - mu) / F.sqrt(sig2)
    return a.select(
        F.col("npos").cast("long").alias("n_up"),
        (F.col("n") - F.col("npos")).cast("long").alias("n_down"),
        F.col("runs").cast("long").alias("runs"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2.576).cast("long").alias("nonrandom_flag"),
    )


QUERIES["agg_runs_test"] = agg_runs_test

ORACLES["agg_runs_test"] = """
    WITH day AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1),
    seq0 AS (
      SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev
      FROM day),
    seq1 AS (
      SELECT day, CASE WHEN rev > prev THEN 1 ELSE 0 END AS up
      FROM seq0 WHERE prev IS NOT NULL AND rev <> prev),
    seq AS (
      SELECT up,
             CASE WHEN up <> lag(up) OVER (ORDER BY day) THEN 1 ELSE 0 END AS chg
      FROM seq1),
    a AS (
      SELECT count(*) AS n, sum(up) AS npos,
             sum(coalesce(chg, 0)) + 1 AS runs
      FROM seq),
    s AS (
      SELECT n, npos, runs,
             CAST(npos AS DOUBLE) AS np, CAST(n - npos AS DOUBLE) AS nn,
             CAST(n AS DOUBLE) AS nd
      FROM a)
    SELECT CAST(npos AS BIGINT) AS n_up, CAST(n - npos AS BIGINT) AS n_down,
           CAST(runs AS BIGINT) AS runs,
           round((runs - (2 * np * nn / nd + 1))
                 / sqrt(2 * np * nn * (2 * np * nn - nd) / (nd * nd * (nd - 1))),
                 6) AS z,
           CAST(abs((runs - (2 * np * nn / nd + 1))
                 / sqrt(2 * np * nn * (2 * np * nn - nd)
                        / (nd * nd * (nd - 1)))) > 2.576 AS BIGINT)
             AS nonrandom_flag
    FROM s
"""


def agg_tail_dependence(spark: SparkSession, sf: str) -> DataFrame:
    """Upper-tail dependence of order value on customer balance — the
    copula diagnostic Pearson/Kendall miss (does the dependence
    concentrate in the extremes?).  Empirical lambda_U at three
    quantile levels: thresholds are exact disc-percentiles on cents
    (one 1-row fit, broadcast), exceedance counters are one aggregate
    of exact integers, the ratios close per level."""
    o = t(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("xs"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("ys"),
    )
    qs = j.agg(
        *[
            F.expr(f"percentile_disc(0.{q}) WITHIN GROUP (ORDER BY xs)")
            .cast("long")
            .alias(f"qx{q}")
            for q in (90, 95, 99)
        ],
        *[
            F.expr(f"percentile_disc(0.{q}) WITHIN GROUP (ORDER BY ys)")
            .cast("long")
            .alias(f"qy{q}")
            for q in (90, 95, 99)
        ],
    )
    cnt = j.crossJoin(F.broadcast(qs)).agg(
        *[
            F.sum((F.col("xs") > F.col(f"qx{q}")).cast("long")).alias(f"nx{q}")
            for q in (90, 95, 99)
        ],
        *[
            F.sum(
                ((F.col("xs") > F.col(f"qx{q}")) & (F.col("ys") > F.col(f"qy{q}"))).cast(
                    "long"
                )
            ).alias(f"nj{q}")
            for q in (90, 95, 99)
        ],
    )
    return cnt.select(
        *[F.col(f"nx{q}").cast("long").alias(f"n_exceed_{q}") for q in (90, 95, 99)],
        *[
            F.round(F.col(f"nj{q}") / F.col(f"nx{q}"), 6).alias(f"lambda_u_{q}")
            for q in (90, 95, 99)
        ],
    )


QUERIES["agg_tail_dependence"] = agg_tail_dependence

ORACLES["agg_tail_dependence"] = """
    WITH j AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS xs,
             CAST(round(o_totalprice * 100) AS BIGINT) AS ys
      FROM orders JOIN customer ON o_custkey = c_custkey),
    q AS (
      SELECT
        percentile_disc(0.90) WITHIN GROUP (ORDER BY xs) AS qx90,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY xs) AS qx95,
        percentile_disc(0.99) WITHIN GROUP (ORDER BY xs) AS qx99,
        percentile_disc(0.90) WITHIN GROUP (ORDER BY ys) AS qy90,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY ys) AS qy95,
        percentile_disc(0.99) WITHIN GROUP (ORDER BY ys) AS qy99
      FROM j),
    c AS (
      SELECT
        sum(CASE WHEN xs > qx90 THEN 1 ELSE 0 END) AS nx90,
        sum(CASE WHEN xs > qx95 THEN 1 ELSE 0 END) AS nx95,
        sum(CASE WHEN xs > qx99 THEN 1 ELSE 0 END) AS nx99,
        sum(CASE WHEN xs > qx90 AND ys > qy90 THEN 1 ELSE 0 END) AS nj90,
        sum(CASE WHEN xs > qx95 AND ys > qy95 THEN 1 ELSE 0 END) AS nj95,
        sum(CASE WHEN xs > qx99 AND ys > qy99 THEN 1 ELSE 0 END) AS nj99
      FROM j CROSS JOIN q)
    SELECT CAST(nx90 AS BIGINT) AS n_exceed_90,
           CAST(nx95 AS BIGINT) AS n_exceed_95,
           CAST(nx99 AS BIGINT) AS n_exceed_99,
           round(nj90 / CAST(nx90 AS DOUBLE), 6) AS lambda_u_90,
           round(nj95 / CAST(nx95 AS DOUBLE), 6) AS lambda_u_95,
           round(nj99 / CAST(nx99 AS DOUBLE), 6) AS lambda_u_99
    FROM c
"""


def agg_overdispersion(spark: SparkSession, sf: str) -> DataFrame:
    """Overdispersion diagnosis of per-customer order counts against
    the Poisson null (variance == mean) with the method-of-moments
    negative-binomial ``r`` and the zero-inflation readout — the
    pre-modeling sanity check for any count metric.  Zeros are REAL
    (customers left-joined to orders); all moments are exact BIGINTs
    from one keyed count + one fold."""
    c = t(spark, sf, "customer").select("c_custkey")
    o = t(spark, sf, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    a = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
        F.sum((F.col("cnt") == 0).cast("long")).alias("zeros"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1") / nd
    v = (F.col("s2") - F.col("s1") * F.col("s1") / nd) / (nd - 1)
    return a.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(m, 6).alias("mean_orders"),
        F.round(v, 6).alias("var_orders"),
        F.round(v / m, 6).alias("dispersion"),
        F.round(F.when(v > m, m * m / (v - m)), 6).alias("negbin_r"),
        F.round(F.col("zeros") / nd, 6).alias("zero_frac"),
        F.round(F.exp(-m), 6).alias("poisson_zero_frac"),
    )


QUERIES["agg_overdispersion"] = agg_overdispersion

ORACLES["agg_overdispersion"] = """
    WITH o AS (
      SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
    per AS (
      SELECT coalesce(cnt, 0) AS cnt
      FROM customer LEFT JOIN o ON c_custkey = o_custkey),
    a AS (
      SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2,
             sum(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS zeros
      FROM per),
    s AS (
      SELECT n, zeros,
             s1 / CAST(n AS DOUBLE) AS m,
             (s2 - s1 * CAST(s1 AS DOUBLE) / n) / (n - 1) AS v
      FROM a)
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(m, 6) AS mean_orders,
           round(v, 6) AS var_orders,
           round(v / m, 6) AS dispersion,
           round(CASE WHEN v > m THEN m * m / (v - m) END, 6) AS negbin_r,
           round(zeros / CAST(n AS DOUBLE), 6) AS zero_frac,
           round(exp(-m), 6) AS poisson_zero_frac
    FROM s
"""


def agg_best_split(spark: SparkSession, sf: str) -> DataFrame:
    """Optimal decision-stump split of order value against the urgent
    label — weighted-Gini minimization over the $10k-bucket candidate
    grid.  Cumulative class counts ride ONE window over the BUCKET
    table (bounded by the value range, never the row count — the
    ``agg_median_ci`` discipline); the argmin orders by the ROUNDED
    impurity plus the bucket id so ties break identically in both
    engines."""
    o = t(spark, sf, "orders").select(
        (F.round(F.col("o_totalprice") * 100).cast("long") / 1000000)
        .cast("long")
        .alias("bucket"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").alias("pos"),
    )
    b = o.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = b.agg(F.sum("n").alias("tn"), F.sum("p").alias("tp"))
    cum = (
        b.withColumn("nl", F.sum("n").over(w))
        .withColumn("pl", F.sum("p").over(w))
        .crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("tn"))  # a split must leave a right side
    )
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nr = (F.col("tn") - F.col("nl")).cast("double")
    pr = (F.col("tp") - F.col("pl")).cast("double")
    wg = 2.0 * (pl * (nl - pl) / nl + pr * (nr - pr) / nr) / F.col("tn").cast("double")
    base = (
        2.0
        * F.col("tp").cast("double")
        * (F.col("tn") - F.col("tp")).cast("double")
        / F.col("tn").cast("double")
        / F.col("tn").cast("double")
    )
    ranked = cum.select(
        "bucket",
        F.col("nl").cast("long").alias("left_n"),
        (F.col("tn") - F.col("nl")).cast("long").alias("right_n"),
        F.round(wg, 9).alias("__wg9"),
        F.round(wg, 6).alias("split_gini"),
        F.round(base - wg, 6).alias("info_gain"),
    ).orderBy(F.col("__wg9").asc(), F.col("bucket").asc())
    return ranked.limit(1).select(
        (F.col("bucket") * 1000000).alias("split_at_cents"),
        "left_n",
        "right_n",
        "split_gini",
        "info_gain",
    )


QUERIES["agg_best_split"] = agg_best_split

ORACLES["agg_best_split"] = """
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000000 AS bucket,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders),
    b AS (SELECT bucket, count(*) AS n, sum(pos) AS p FROM o GROUP BY 1),
    tot AS (SELECT sum(n) AS tn, sum(p) AS tp FROM b),
    cum AS (
      SELECT bucket,
             sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS nl,
             sum(p) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pl,
             tn, tp
      FROM b CROSS JOIN tot),
    c AS (SELECT * FROM cum WHERE nl < tn),
    g AS (
      SELECT bucket, nl, tn - nl AS nr,
             2.0 * (pl * CAST(nl - pl AS DOUBLE) / nl
                    + (tp - pl) * CAST((tn - nl) - (tp - pl) AS DOUBLE)
                      / (tn - nl)) / tn AS wg,
             2.0 * tp * CAST(tn - tp AS DOUBLE) / tn / tn AS base
      FROM c)
    SELECT CAST(bucket * 1000000 AS BIGINT) AS split_at_cents,
           CAST(nl AS BIGINT) AS left_n,
           CAST(nr AS BIGINT) AS right_n,
           round(wg, 6) AS split_gini,
           round(base - wg, 6) AS info_gain
    FROM g
    ORDER BY round(wg, 9) ASC, bucket ASC
    LIMIT 1
"""


def agg_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-Evidence and Information Value of market segment
    against the big-order outcome — the credit-scoring feature screen.
    Cell counts are exact; WoE is one log per BIN (5 bins); the IV
    total sums the 1e-9-rounded per-bin terms AS INTEGERS so the
    5-term reduction is order-free in both engines."""
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf, "orders").select(
        "o_custkey", (F.col("o_totalprice") > 150000).cast("long").alias("pos")
    )
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("pos").alias("good"), F.sum(1 - F.col("pos")).alias("bad"))
    )
    tot = g.agg(F.sum("good").alias("tg"), F.sum("bad").alias("tb"))
    per = g.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        (F.col("good") + F.col("bad")).cast("long").alias("n"),
        F.col("good").cast("long").alias("n_big"),
        F.log(
            (F.col("good") / F.col("tg")) / (F.col("bad") / F.col("tb"))
        ).alias("__woe"),
        (
            (F.col("good") / F.col("tg") - F.col("bad") / F.col("tb"))
            * F.log((F.col("good") / F.col("tg")) / (F.col("bad") / F.col("tb")))
        ).alias("__iv"),
    )
    ivtot = per.agg(
        (F.sum(F.round(F.col("__iv") * 1e9).cast("long")) / 1e9).alias("iv_total")
    )
    return (
        per.crossJoin(F.broadcast(ivtot))
        .select(
            "c_mktsegment",
            "n",
            "n_big",
            F.round("__woe", 6).alias("woe"),
            F.round("__iv", 6).alias("iv_term"),
            F.round("iv_total", 6).alias("iv_total"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES["agg_woe_iv"] = agg_woe_iv

ORACLES["agg_woe_iv"] = """
    WITH g AS (
      SELECT c_mktsegment,
             sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS good,
             sum(CASE WHEN o_totalprice > 150000 THEN 0 ELSE 1 END) AS bad
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    tot AS (SELECT sum(good) AS tg, sum(bad) AS tb FROM g),
    per AS (
      SELECT c_mktsegment, good + bad AS n, good AS n_big,
             ln((good / CAST(tg AS DOUBLE)) / (bad / CAST(tb AS DOUBLE))) AS woe,
             (good / CAST(tg AS DOUBLE) - bad / CAST(tb AS DOUBLE))
               * ln((good / CAST(tg AS DOUBLE)) / (bad / CAST(tb AS DOUBLE)))
               AS iv
      FROM g CROSS JOIN tot),
    ivt AS (
      SELECT sum(CAST(round(iv * 1e9) AS BIGINT)) / 1e9 AS iv_total FROM per)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n, CAST(n_big AS BIGINT) AS n_big,
           round(woe, 6) AS woe, round(iv, 6) AS iv_term,
           round(iv_total, 6) AS iv_total
    FROM per CROSS JOIN ivt
    ORDER BY c_mktsegment
"""


def agg_concurrency_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Peak open-order concurrency (orders placed but not yet fully
    shipped) — Little's-law-style operational load, computed WITHOUT
    an interval sweep over rows: the interval is o_orderdate -> the
    order's LAST shipment day; daily open/close counts fold map-side,
    the cumulative difference runs over the DAY table (bounded by the
    calendar, not the data — the ``agg_median_ci`` window discipline),
    and the answer is the top-10 peak days with exact integer counts."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    done = (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    iv = o.join(done, o.o_orderkey == done.l_orderkey).select(
        F.unix_millis(F.date_trunc("day", "o_orderdate")).alias("open_ms"),
        F.unix_millis(F.date_trunc("day", "last_ship")).alias("close_ms"),
    )
    ships = iv.groupBy(F.col("open_ms").alias("day_ms")).agg(
        F.count(F.lit(1)).alias("s")
    )
    recvs = iv.groupBy(F.col("close_ms").alias("day_ms")).agg(
        F.count(F.lit(1)).alias("r")
    )
    days = (
        ships.join(recvs, "day_ms", "full")
        .select(
            "day_ms",
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce("r", F.lit(0)).alias("r"),
        )
    )
    w = Window.orderBy("day_ms").rowsBetween(Window.unboundedPreceding, 0)
    transit = days.select(
        "day_ms",
        (F.sum("s").over(w) - F.sum("r").over(w)).cast("long").alias("in_transit"),
    )
    return transit.orderBy(
        F.col("in_transit").desc(), F.col("day_ms").asc()
    ).limit(10)


QUERIES["agg_concurrency_profile"] = agg_concurrency_profile

ORACLES["agg_concurrency_profile"] = """
    WITH iv AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS open_ms,
             CAST(epoch_ms(date_trunc('day', last_ship)) AS BIGINT) AS close_ms
      FROM orders
      JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY 1) d
        ON o_orderkey = l_orderkey),
    s AS (
      SELECT open_ms AS day_ms, count(*) AS s FROM iv GROUP BY 1),
    r AS (
      SELECT close_ms AS day_ms, count(*) AS r FROM iv GROUP BY 1),
    d AS (
      SELECT coalesce(s.day_ms, r.day_ms) AS day_ms,
             coalesce(s.s, 0) AS s, coalesce(r.r, 0) AS r
      FROM s FULL JOIN r ON s.day_ms = r.day_ms),
    tr AS (
      SELECT day_ms,
             CAST(sum(s) OVER (ORDER BY day_ms ROWS UNBOUNDED PRECEDING)
                  - sum(r) OVER (ORDER BY day_ms ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS in_transit
      FROM d)
    SELECT day_ms, in_transit
    FROM tr ORDER BY in_transit DESC, day_ms ASC LIMIT 10
"""


# --- eval / IR --------------------------------------------------------------


def eval_weighted_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-weighted Cohen's kappa between two ordinal raters (the
    priority scale vs fixed value bands) — the agreement metric for
    ORDERED labels the registered unweighted ``eval_kappa`` can't
    grade.  With integer weights |i-j| both the observed disagreement
    and the expected disagreement are EXACT BIGINTs (O_w = sum w*O_ij;
    E_w = sum w*r_i*c_j), so kappa = 1 - n*O_w/E_w closes as one
    division — no per-cell float sum at all."""
    o = t(spark, sf, "orders").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 0)
        .when(F.col("o_orderpriority") == "2-HIGH", 1)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 2)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 3)
        .otherwise(4)
        .alias("ra"),
        F.when(F.col("o_totalprice") < 50000, 0)
        .when(F.col("o_totalprice") < 100000, 1)
        .when(F.col("o_totalprice") < 150000, 2)
        .when(F.col("o_totalprice") < 250000, 3)
        .otherwise(4)
        .alias("rb"),
    )
    cells = o.groupBy("ra", "rb").agg(F.count(F.lit(1)).alias("c"))
    ow = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.abs(F.col("ra") - F.col("rb")) * F.col("c")).alias("ow"),
    )
    rows = cells.groupBy("ra").agg(F.sum("c").alias("ri"))
    cols = cells.groupBy("rb").agg(F.sum("c").alias("cj"))
    ew = rows.crossJoin(cols).agg(
        F.sum(F.abs(F.col("ra") - F.col("rb")) * F.col("ri") * F.col("cj")).alias("ew")
    )
    return ow.crossJoin(ew).select(
        F.col("n").cast("long").alias("n"),
        F.col("ow").cast("long").alias("obs_disagree_w"),
        F.col("ew").cast("long").alias("exp_disagree_w"),
        F.round(1.0 - F.col("n") * F.col("ow") / F.col("ew"), 6).alias("kappa_w"),
    )


QUERIES["eval_weighted_kappa"] = eval_weighted_kappa

ORACLES["eval_weighted_kappa"] = """
    WITH o AS (
      SELECT CASE o_orderpriority
               WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
               WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
               ELSE 4 END AS ra,
             CASE WHEN o_totalprice < 50000 THEN 0
                  WHEN o_totalprice < 100000 THEN 1
                  WHEN o_totalprice < 150000 THEN 2
                  WHEN o_totalprice < 250000 THEN 3
                  ELSE 4 END AS rb
      FROM orders),
    cells AS (SELECT ra, rb, count(*) AS c FROM o GROUP BY 1, 2),
    ow AS (SELECT sum(c) AS n, sum(abs(ra - rb) * c) AS ow FROM cells),
    r AS (SELECT ra, sum(c) AS ri FROM cells GROUP BY 1),
    cc AS (SELECT rb, sum(c) AS cj FROM cells GROUP BY 1),
    ew AS (SELECT sum(abs(ra - rb) * ri * cj) AS ew FROM r CROSS JOIN cc)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ow AS BIGINT) AS obs_disagree_w,
           CAST(ew AS BIGINT) AS exp_disagree_w,
           round(1.0 - n * ow / CAST(ew AS DOUBLE), 6) AS kappa_w
    FROM ow CROSS JOIN ew
"""


def eval_kendalls_w(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's W concordance across three deterministic nation
    rankings (revenue, order count, peak order) — do independent
    league tables agree?  Ranks are integer row_numbers with the
    nationkey tiebreak; W closes from the exact integer rank-sum
    squares: W = (12*S - 3*m^2*n*(n+1)^2) / (m^2*n*(n^2-1))."""
    j = (
        t(spark, sf, "orders")
        .join(
            F.broadcast(t(spark, sf, "customer").select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
            F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mx"),
        )
    )
    parts = []
    for metric in ("rev", "cnt", "mx"):
        w = Window.orderBy(F.col(metric).desc(), F.col("c_nationkey").asc())
        parts.append(j.select("c_nationkey", F.row_number().over(w).alias("rk")))
    ranks = parts[0].unionByName(parts[1]).unionByName(parts[2])
    rsum = ranks.groupBy("c_nationkey").agg(F.sum("rk").alias("r"))
    a = rsum.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("r") * F.col("r")).alias("s")
    )
    n, s = F.col("n"), F.col("s")
    m = F.lit(3)
    wstat = (12.0 * s - 3 * m * m * n * (n + 1) * (n + 1)) / (
        (m * m * n * (n * n - 1)).cast("double")
    )
    return a.select(
        n.cast("long").alias("n_items"),
        F.lit(3).cast("long").alias("m_rankers"),
        s.cast("long").alias("s_rank_sq"),
        F.round(wstat, 6).alias("kendalls_w"),
    )


QUERIES["eval_kendalls_w"] = eval_kendalls_w

ORACLES["eval_kendalls_w"] = """
    WITH g AS (
      SELECT c_nationkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev,
             count(*) AS cnt,
             max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    ranks AS (
      SELECT c_nationkey,
             row_number() OVER (ORDER BY rev DESC, c_nationkey) AS rk FROM g
      UNION ALL
      SELECT c_nationkey,
             row_number() OVER (ORDER BY cnt DESC, c_nationkey) FROM g
      UNION ALL
      SELECT c_nationkey,
             row_number() OVER (ORDER BY mx DESC, c_nationkey) FROM g),
    rsum AS (SELECT c_nationkey, sum(rk) AS r FROM ranks GROUP BY 1),
    a AS (SELECT count(*) AS n, sum(r * r) AS s FROM rsum)
    SELECT CAST(n AS BIGINT) AS n_items, CAST(3 AS BIGINT) AS m_rankers,
           CAST(s AS BIGINT) AS s_rank_sq,
           round((12.0 * s - 3 * 9 * n * (n + 1) * (n + 1))
                 / CAST(9 * n * (n * n - 1) AS DOUBLE), 6) AS kendalls_w
    FROM a
"""


def eval_extraction_f1(spark: SparkSession, sf: str) -> DataFrame:
    """Extraction-system F1 via per-document MULTISET matching: the
    gold extractor ({join, merge, sort} tokens) vs the predicted one
    ({join, merge, scan}); a prediction counts iff the same token was
    extracted from the same doc no more times than gold did (the
    span-eval counting rule, token-granular).  Tokens are filtered to
    the two term sets BEFORE any shuffle (posting-list shape), so the
    matched/precision/recall counters are exact integers."""
    toks = (
        t(spark, sf, "documents")
        .select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .where(F.col("w").isin("join", "merge", "sort", "scan"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gold = F.col("w").isin("join", "merge", "sort")
    pred = F.col("w").isin("join", "merge", "scan")
    a = toks.agg(
        F.sum(F.when(gold, F.col("c")).otherwise(0)).alias("n_gold"),
        F.sum(F.when(pred, F.col("c")).otherwise(0)).alias("n_pred"),
        F.sum(F.when(gold & pred, F.col("c")).otherwise(0)).alias("matched"),
    )
    p = F.col("matched") / F.col("n_pred")
    r = F.col("matched") / F.col("n_gold")
    return a.select(
        F.col("n_gold").cast("long").alias("n_gold"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("matched").cast("long").alias("matched"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(2 * p * r / (p + r), 6).alias("f1"),
    )


QUERIES["eval_extraction_f1"] = eval_extraction_f1

ORACLES["eval_extraction_f1"] = r"""
    WITH toks AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents)
      WHERE w IN ('join', 'merge', 'sort', 'scan')
      GROUP BY 1, 2),
    a AS (
      SELECT
        sum(CASE WHEN w IN ('join','merge','sort') THEN c ELSE 0 END) AS n_gold,
        sum(CASE WHEN w IN ('join','merge','scan') THEN c ELSE 0 END) AS n_pred,
        sum(CASE WHEN w IN ('join','merge') THEN c ELSE 0 END) AS matched
      FROM toks)
    SELECT CAST(n_gold AS BIGINT) AS n_gold,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(matched AS BIGINT) AS matched,
           round(matched / CAST(n_pred AS DOUBLE), 6) AS precision,
           round(matched / CAST(n_gold AS DOUBLE), 6) AS recall,
           round(2 * (matched / CAST(n_pred AS DOUBLE))
                   * (matched / CAST(n_gold AS DOUBLE))
                 / (matched / CAST(n_pred AS DOUBLE)
                    + matched / CAST(n_gold AS DOUBLE)), 6) AS f1
    FROM a
"""


def search_dirichlet_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (mu=2000) for
    the house query {join, spark, vector} — the OTHER classic lexical
    ranker next to the registered BM25 (Zhai & Lafferty 2004).  Unlike
    BM25 a zero-tf document still scores (collection smoothing), so
    the doc x term grid builds from a 3-literal explode LEFT-joined to
    the postings — |q| rows per doc, never vocab-sized; collection
    term stats are a 3-row broadcast."""
    docs = t(spark, sf, "documents").select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("__t"),
    )
    base = docs.select("doc_id", F.size("__t").alias("dl"), F.col("__t"))
    ex = base.select(
        "doc_id", "dl", F.explode_outer("__t").alias("term")
    ).where(F.col("term").isin("join", "spark", "vector"))
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    coll = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    ctot = base.agg(F.sum("dl").alias("ct"))
    grid = base.select(
        "doc_id",
        "dl",
        F.explode(F.array(F.lit("join"), F.lit("spark"), F.lit("vector"))).alias(
            "term"
        ),
    )
    scored = (
        grid.join(tf, ["doc_id", "term"], "left")
        .fillna(0, subset=["tf"])
        .join(F.broadcast(coll), "term")
        .crossJoin(F.broadcast(ctot))
        .select(
            "doc_id",
            F.log(
                (F.col("tf") + 2000.0 * F.col("cf") / F.col("ct"))
                / (F.col("dl") + 2000.0)
            ).alias("__term_ll"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.round(F.sum(F.round(F.col("__term_ll") * 1e9).cast("long")) / 1e9, 4).alias(
            "ql_score"
        )
    )
    return out.orderBy(F.col("ql_score").desc(), "doc_id").limit(20)


QUERIES["search_dirichlet_lm"] = search_dirichlet_lm

ORACLES["search_dirichlet_lm"] = r"""
    WITH base AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS dl,
             string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    ex AS (SELECT doc_id, unnest(t) AS term FROM base),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM ex WHERE term IN ('join', 'spark', 'vector')
      GROUP BY 1, 2),
    coll AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
    ctot AS (SELECT sum(dl) AS ct FROM base),
    grid AS (
      SELECT b.doc_id, b.dl, q.term
      FROM base b CROSS JOIN (VALUES ('join'), ('spark'), ('vector')) q(term)),
    scored AS (
      SELECT g.doc_id,
             ln((coalesce(tf.tf, 0) + 2000.0 * coll.cf / ctot.ct)
                / (g.dl + 2000.0)) AS term_ll
      FROM grid g
      LEFT JOIN tf ON g.doc_id = tf.doc_id AND g.term = tf.term
      JOIN coll ON g.term = coll.term
      CROSS JOIN ctot)
    SELECT doc_id,
           round(sum(CAST(round(term_ll * 1e9) AS BIGINT)) / 1e9, 4) AS ql_score
    FROM scored GROUP BY 1
    ORDER BY ql_score DESC, doc_id LIMIT 20
"""


def search_postings_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Static index-pruning audit: keep only the top-50 postings per
    query term (by tf, doc tiebreak), score the house query with
    tf-idf on BOTH the full and the pruned index, and report recall@10
    of the pruned top list — the measurement that justifies (or
    vetoes) shipping a smaller index.  Postings are query-term-
    filtered before any shuffle; the per-term top-50 window runs over
    posting lists, not the corpus."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("__t")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("nd"))
    ex = docs.select("doc_id", F.explode_outer("__t").alias("term")).where(
        F.col("term").isin("join", "spark", "vector")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    def score(postings):
        sc = (
            postings.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(n_docs))
            .groupBy("doc_id")
            .agg(
                F.round(
                    F.sum(
                        F.round(
                            F.col("tf")
                            * F.log(F.col("nd") / F.col("df"))
                            * 1e9
                        ).cast("long")
                    )
                    / 1e9,
                    4,
                ).alias("s")
            )
        )
        return sc.orderBy(F.col("s").desc(), "doc_id").limit(10)

    wp = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    pruned = tf.withColumn("rk", F.row_number().over(wp)).where(F.col("rk") <= 50)
    full10 = score(tf).select(F.col("doc_id").alias("fd"))
    prun10 = score(pruned.drop("rk")).select(F.col("doc_id").alias("pd"))
    hit = full10.join(prun10, full10.fd == prun10.pd).agg(
        F.count(F.lit(1)).alias("hits")
    )
    sizes = tf.agg(F.count(F.lit(1)).alias("full_postings")).crossJoin(
        pruned.agg(F.count(F.lit(1)).alias("pruned_postings"))
    )
    return hit.crossJoin(sizes).select(
        F.col("full_postings").cast("long").alias("full_postings"),
        F.col("pruned_postings").cast("long").alias("pruned_postings"),
        F.col("hits").cast("long").alias("overlap_at_10"),
        F.round(F.col("hits") / 10.0, 6).alias("recall_at_10"),
    )


QUERIES["search_postings_prune"] = search_postings_prune

ORACLES["search_postings_prune"] = r"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    nd AS (SELECT count(*) AS nd FROM docs),
    ex AS (SELECT doc_id, unnest(t) AS term FROM docs),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM ex WHERE term IN ('join', 'spark', 'vector')
      GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    pruned AS (
      SELECT doc_id, term, tf FROM (
        SELECT doc_id, term, tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id ASC) AS rk
        FROM tf) WHERE rk <= 50),
    fsc AS (
      SELECT tf.doc_id,
             round(sum(CAST(round(tf.tf * ln(nd.nd / CAST(d.df AS DOUBLE)) * 1e9)
                            AS BIGINT)) / 1e9, 4) AS s
      FROM tf JOIN dfreq d USING (term) CROSS JOIN nd
      GROUP BY 1),
    psc AS (
      SELECT p.doc_id,
             round(sum(CAST(round(p.tf * ln(nd.nd / CAST(d.df AS DOUBLE)) * 1e9)
                            AS BIGINT)) / 1e9, 4) AS s
      FROM pruned p JOIN dfreq d USING (term) CROSS JOIN nd
      GROUP BY 1),
    f10 AS (SELECT doc_id FROM fsc ORDER BY s DESC, doc_id LIMIT 10),
    p10 AS (SELECT doc_id FROM psc ORDER BY s DESC, doc_id LIMIT 10),
    hits AS (SELECT count(*) AS hits FROM f10 JOIN p10 USING (doc_id)),
    sizes AS (
      SELECT (SELECT count(*) FROM tf) AS full_postings,
             (SELECT count(*) FROM pruned) AS pruned_postings)
    SELECT CAST(full_postings AS BIGINT) AS full_postings,
           CAST(pruned_postings AS BIGINT) AS pruned_postings,
           CAST(hits AS BIGINT) AS overlap_at_10,
           round(hits / 10.0, 6) AS recall_at_10
    FROM hits CROSS JOIN sizes
"""


# --- text / LM-data ---------------------------------------------------------


def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document 5-gram novelty: the fraction of a doc's distinct
    token 5-grams whose FIRST corpus occurrence (min doc_id) is the doc
    itself — the freshness curve a dedup-aware curation pipeline reads
    before admitting a new source.  Grams build from lead() windows
    bounded per doc; first-occurrence is one keyed min over the gram
    table (grams shuffle, text never does)."""
    toks = t(spark, sf, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ",
                "w",
                F.lead("w", 1).over(wd),
                F.lead("w", 2).over(wd),
                F.lead("w", 3).over(wd),
                F.lead("w", 4).over(wd),
            ).alias("g"),
            F.lead("w", 4).over(wd).alias("__tail"),
        )
        .where(F.col("__tail").isNotNull())
        .select("doc_id", "g")
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
    ).orderBy("doc_id")


QUERIES["text_ngram_novelty"] = text_ngram_novelty

ORACLES["text_ngram_novelty"] = r"""
    WITH toks AS (
      SELECT doc_id, pos, t[pos + 1] AS w,
             CASE WHEN pos + 5 <= len(t)
                  THEN concat_ws(' ', t[pos + 1], t[pos + 2], t[pos + 3],
                                 t[pos + 4], t[pos + 5]) END AS g
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents),
           unnest(range(len(t))) u(pos)),
    grams AS (SELECT DISTINCT doc_id, g FROM toks WHERE g IS NOT NULL),
    first AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY 1),
    per AS (
      SELECT grams.doc_id, count(*) AS n_grams,
             sum(CASE WHEN first_doc = grams.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM grams JOIN first USING (g) GROUP BY 1)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_novel AS BIGINT) AS n_novel,
           round(n_novel / CAST(n_grams AS DOUBLE), 6) AS novelty
    FROM per ORDER BY doc_id
"""


def text_msttr(spark: SparkSession, sf: str) -> DataFrame:
    """Mean segmental type-token ratio per language — lexical diversity
    on FIXED 50-token segments so document length can't confound the
    ratio (the reason raw TTR is useless across mixed-length corpora).
    Ragged tails drop (the standard MSTTR rule); the per-language
    reduction is pure integer sums (sum distinct-counts / 50*segments),
    so one division closes it."""
    toks = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    )
    seg = toks.select(
        "doc_id", "lang", (F.col("pos") / 50).cast("long").alias("seg"), "w"
    )
    per_seg = seg.groupBy("doc_id", "lang", "seg").agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("w").alias("d")
    ).where(F.col("n") == 50)
    out = per_seg.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("d").alias("__sd"),
    )
    return out.select(
        "lang",
        "n_docs",
        "n_segments",
        F.round(F.col("__sd") / (50.0 * F.col("n_segments")), 6).alias("msttr"),
    ).orderBy("lang")


QUERIES["text_msttr"] = text_msttr

ORACLES["text_msttr"] = r"""
    WITH toks AS (
      SELECT doc_id, lang, pos // 50 AS seg, t[pos + 1] AS w
      FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
            FROM documents),
           unnest(range(len(t))) u(pos)),
    per_seg AS (
      SELECT doc_id, lang, seg, count(*) AS n, count(DISTINCT w) AS d
      FROM toks GROUP BY 1, 2, 3
      HAVING count(*) = 50),
    o AS (
      SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_segments,
             sum(d) AS sd
      FROM per_seg GROUP BY 1)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_segments AS BIGINT) AS n_segments,
           round(sd / (50.0 * n_segments), 6) AS msttr
    FROM o ORDER BY lang
"""


def text_kneser_ney(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities for the context
    'join' (absolute discount D=0.75) — the LM-data statistic whose
    continuation counts (distinct LEFT contexts per word) are exactly
    the shuffle-heavy part of n-gram LM estimation at corpus scale.
    Every input is an integer count over the bigram table; the
    interpolation closes as one float expression, top-10 by rounded
    probability with the word tiebreak."""
    toks = t(spark, sf, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select("w", F.lead("w", 1).over(wd).alias("nxt"))
        .where(F.col("nxt").isNotNull())
        .groupBy("w", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = bg.where(F.col("w") == "join").select("nxt", F.col("c").alias("c_vw"))
    c_v = bg.where(F.col("w") == "join").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).alias("n1v")
    )
    cont = bg.groupBy("nxt").agg(F.count(F.lit(1)).alias("n1w"))
    total_types = bg.agg(F.count(F.lit(1)).alias("nbt"))
    out = (
        ctx.join(cont, "nxt")
        .crossJoin(F.broadcast(c_v))
        .crossJoin(F.broadcast(total_types))
        .select(
            F.col("nxt").alias("word"),
            F.col("c_vw").cast("long").alias("c_bigram"),
            F.col("n1w").cast("long").alias("n_left_contexts"),
            F.round(
                F.greatest(F.col("c_vw") - 0.75, F.lit(0.0)) / F.col("cv")
                + 0.75
                * F.col("n1v")
                / F.col("cv")
                * (F.col("n1w") / F.col("nbt")),
                6,
            ).alias("p_kn"),
        )
    )
    return out.orderBy(F.col("p_kn").desc(), F.col("word").asc()).limit(10)


QUERIES["text_kneser_ney"] = text_kneser_ney

ORACLES["text_kneser_ney"] = r"""
    WITH toks AS (
      SELECT doc_id, pos, t[pos + 1] AS w,
             CASE WHEN pos + 2 <= len(t) THEN t[pos + 2] END AS nxt
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents),
           unnest(range(len(t))) u(pos)),
    bg AS (
      SELECT w, nxt, count(*) AS c
      FROM toks WHERE nxt IS NOT NULL GROUP BY 1, 2),
    ctx AS (SELECT nxt, c AS c_vw FROM bg WHERE w = 'join'),
    cv AS (SELECT sum(c) AS cv, count(*) AS n1v FROM bg WHERE w = 'join'),
    cont AS (SELECT nxt, count(*) AS n1w FROM bg GROUP BY 1),
    nbt AS (SELECT count(*) AS nbt FROM bg)
    SELECT ctx.nxt AS word, CAST(c_vw AS BIGINT) AS c_bigram,
           CAST(n1w AS BIGINT) AS n_left_contexts,
           round(greatest(c_vw - 0.75, 0.0) / cv
                 + 0.75 * n1v / CAST(cv AS DOUBLE) * (n1w / CAST(nbt AS DOUBLE)),
                 6) AS p_kn
    FROM ctx JOIN cont ON ctx.nxt = cont.nxt
    CROSS JOIN cv CROSS JOIN nbt
    ORDER BY p_kn DESC, word ASC LIMIT 10
"""


def text_lang_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between language sub-corpora — the
    cross-lingual contamination screen (shared-vocab mass says whether
    a lang-ID split actually separated the corpora).  Distinct
    (lang, token) first (one shuffle on tokens), then the pair join
    runs on the VOCAB grain; the 10 language pairs close from exact
    set sizes."""
    v = (
        t(spark, sf, "documents")
        .select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .distinct()
    )
    sizes = v.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
    a = v.alias("a")
    b = v.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.lang") < F.col("b.lang")))
        .groupBy(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("sz_a").cast("long").alias("vocab_a"),
            F.col("sz_b").cast("long").alias("vocab_b"),
            F.col("inter").cast("long").alias("shared"),
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


QUERIES["text_lang_vocab_overlap"] = text_lang_vocab_overlap

ORACLES["text_lang_vocab_overlap"] = r"""
    WITH v AS (
      SELECT DISTINCT lang, w
      FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents)),
    sizes AS (SELECT lang, count(*) AS sz FROM v GROUP BY 1),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS inter
      FROM v a JOIN v b ON a.w = b.w AND a.lang < b.lang
      GROUP BY 1, 2)
    SELECT lang_a, lang_b,
           CAST(sa.sz AS BIGINT) AS vocab_a,
           CAST(sb.sz AS BIGINT) AS vocab_b,
           CAST(inter AS BIGINT) AS shared,
           round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.lang = lang_a
    JOIN sizes sb ON sb.lang = lang_b
    ORDER BY lang_a, lang_b
"""


def text_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary (k = 10/50/100/500)
    — the tokenizer-budget readout: how much of the corpus does a
    k-word vocab already explain?  One token count, a distributed
    top-(max k) CUT (orderBy + limit — Spark's TakeOrdered, never a
    single-partition sort), THEN the cumulative window over at most
    max(k) rows — so the keyless window is bounded by the ASKED
    budget, not the vocabulary (a 100 TB corpus has a billion-type
    vocab; the question only ever needs its top 500)."""
    cnt = (
        t(spark, sf, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.col("c").desc(), F.col("w").asc()).limit(500)
    wv = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = top.withColumn("rk", F.row_number().over(wv)).withColumn(
        "cum", F.sum("c").over(wv.rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = cnt.agg(F.sum("c").alias("tot"), F.count(F.lit(1)).alias("vocab"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(50), F.lit(100), F.lit(500))).alias("k")
    )
    at = ks.join(
        ranked, ranked.rk == ks.k, "left"
    ).crossJoin(F.broadcast(tot))
    return at.select(
        F.col("k").cast("long").alias("k"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.coalesce(F.col("cum"), F.col("tot")).cast("long").alias("covered"),
        F.col("tot").cast("long").alias("total_tokens"),
        F.round(
            F.coalesce(F.col("cum"), F.col("tot")) / F.col("tot"), 6
        ).alias("coverage"),
    ).orderBy("k")


QUERIES["text_vocab_coverage"] = text_vocab_coverage

ORACLES["text_vocab_coverage"] = r"""
    WITH cnt AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents)
      GROUP BY 1),
    ranked AS (
      SELECT w, c,
             row_number() OVER (ORDER BY c DESC, w ASC) AS rk,
             sum(c) OVER (ORDER BY c DESC, w ASC ROWS UNBOUNDED PRECEDING) AS cum
      FROM cnt),
    tot AS (SELECT sum(c) AS tot, count(*) AS vocab FROM cnt),
    ks AS (SELECT unnest([10, 50, 100, 500]) AS k)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(coalesce(cum, tot) AS BIGINT) AS covered,
           CAST(tot AS BIGINT) AS total_tokens,
           round(coalesce(cum, tot) / CAST(tot AS DOUBLE), 6) AS coverage
    FROM ks LEFT JOIN ranked ON rk = k CROSS JOIN tot
    ORDER BY k
"""


def text_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Confusion matrix of the registered n-gram language-ID heuristic
    (``operators/text.add_lang_id``) against the gold ``lang`` column,
    with overall accuracy — the eval loop closed over an already-
    shipped operator.  The oracle regenerates the predictor from the
    SAME profile dict (the ``text_lang_id`` discipline), so the two
    engines cannot drift."""
    from image_matadata_batchprocessing_aws_spark.operators.text import add_lang_id

    d = add_lang_id(t(spark, sf, "documents")).select("lang", "lang_pred")
    cells = d.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    acc = d.agg(
        (
            F.sum((F.col("lang") == F.col("lang_pred")).cast("long"))
            / F.count(F.lit(1))
        ).alias("accuracy")
    )
    return (
        cells.crossJoin(F.broadcast(acc))
        .select(
            "lang",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.round("accuracy", 6).alias("accuracy"),
        )
        .orderBy("lang", "lang_pred")
    )


QUERIES["text_lang_confusion"] = text_lang_confusion


def _lang_confusion_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.text import _LANG_PROFILES

    arms = []
    for lang, profile in sorted(_LANG_PROFILES.items()):
        score = " + ".join(
            f"(CASE WHEN contains(lt, '{bg}') THEN 1 ELSE 0 END)" for bg in profile
        )
        arms.append(f"SELECT doc_id, '{lang}' AS plang, {score} AS score FROM t")
    union = "\n          UNION ALL ".join(arms)
    return f"""
        WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        s AS ({union}),
        r AS (SELECT doc_id, plang,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, plang DESC) AS rn
              FROM s),
        pred AS (
          SELECT d.doc_id, d.lang, r.plang AS lang_pred
          FROM documents d JOIN r ON d.doc_id = r.doc_id AND r.rn = 1),
        cells AS (
          SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2),
        acc AS (
          SELECT sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS accuracy
          FROM pred)
        SELECT lang, lang_pred, CAST(n AS BIGINT) AS n,
               round(accuracy, 6) AS accuracy
        FROM cells CROSS JOIN acc
        ORDER BY lang, lang_pred
    """


ORACLES["text_lang_confusion"] = _lang_confusion_oracle()


def chunk_semantic_split(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic chunk-boundary detection with no model in the loop:
    50-token segments get signed hashing-trick vectors (the registered
    ``text_hash_embed`` kernel, dim 16), adjacent segments compare by
    cosine, and a boundary fires where the ROUNDED similarity drops
    below 0.3 — the split rule a RAG chunker applies before packing.
    Everything data-sized is one token explode + keyed aggregates; the
    adjacency join runs on the SEGMENT grain (rows/50) with a
    dim-keyed sparse dot (never densify)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    toks = t(spark, sf, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    )
    h = md5_int32("w")
    sparse = (
        toks.select(
            "doc_id",
            (F.col("pos") / 50).cast("long").alias("seg"),
            (h % 16).cast("long").alias("dim"),
            F.when((h / 16).cast("long") % 2 == 0, 1).otherwise(-1).alias("s"),
        )
        .groupBy("doc_id", "seg", "dim")
        .agg(F.sum("s").alias("wt"))
        .where(F.col("wt") != 0)
    )
    norms = sparse.groupBy("doc_id", "seg").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("nrm")
    )
    a, b = sparse.alias("a"), sparse.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.seg") == F.col("a.seg") + 1)
            & (F.col("a.dim") == F.col("b.dim")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.seg").alias("seg"))
        .agg(F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"))
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    pairs = (
        na.join(
            nb,
            (F.col("na.doc_id") == F.col("nb.doc_id"))
            & (F.col("nb.seg") == F.col("na.seg") + 1),
        )
        .select(
            F.col("na.doc_id").alias("doc_id"),
            F.col("na.seg").alias("seg"),
            F.col("na.nrm").alias("nrm_a"),
            F.col("nb.nrm").alias("nrm_b"),
        )
        .join(dots, ["doc_id", "seg"], "left")
        .select(
            "doc_id",
            "seg",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0))
                / F.sqrt(F.col("nrm_a").cast("double") * F.col("nrm_b")),
                6,
            ).alias("sim"),
        )
    )
    segs = norms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segments"))
    per = pairs.groupBy("doc_id").agg(
        F.sum((F.col("sim") < 0.3).cast("long")).alias("n_boundaries"),
        F.min("sim").alias("min_adj_sim"),
    )
    return (
        segs.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_segments").cast("long").alias("n_segments"),
            F.coalesce("n_boundaries", F.lit(0)).cast("long").alias("n_boundaries"),
            F.col("min_adj_sim"),
        )
        .orderBy("doc_id")
    )


QUERIES["chunk_semantic_split"] = chunk_semantic_split


def _semantic_split_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    h = md5_int32_sql("w")
    return rf"""
    WITH tok0 AS (
      SELECT doc_id, pos // 50 AS seg, t[pos + 1] AS w
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents),
           unnest(range(len(t))) u(pos)),
    toks AS (SELECT doc_id, seg, {h} AS h FROM tok0),
    sparse AS (
      SELECT doc_id, seg, h % 16 AS dim,
             sum(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS wt
      FROM toks GROUP BY 1, 2, 3
      HAVING sum(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) != 0),
    norms AS (
      SELECT doc_id, seg, sum(wt * wt) AS nrm FROM sparse GROUP BY 1, 2),
    dots AS (
      SELECT a.doc_id, a.seg, sum(a.wt * b.wt) AS dot
      FROM sparse a JOIN sparse b
        ON a.doc_id = b.doc_id AND b.seg = a.seg + 1 AND a.dim = b.dim
      GROUP BY 1, 2),
    pairs AS (
      SELECT na.doc_id, na.seg,
             round(coalesce(d.dot, 0)
                   / sqrt(CAST(na.nrm AS DOUBLE) * nb.nrm), 6) AS sim
      FROM norms na
      JOIN norms nb ON na.doc_id = nb.doc_id AND nb.seg = na.seg + 1
      LEFT JOIN dots d ON d.doc_id = na.doc_id AND d.seg = na.seg),
    segs AS (SELECT doc_id, count(*) AS n_segments FROM norms GROUP BY 1),
    per AS (
      SELECT doc_id,
             sum(CASE WHEN sim < 0.3 THEN 1 ELSE 0 END) AS n_boundaries,
             min(sim) AS min_adj_sim
      FROM pairs GROUP BY 1)
    SELECT s.doc_id, CAST(n_segments AS BIGINT) AS n_segments,
           CAST(coalesce(n_boundaries, 0) AS BIGINT) AS n_boundaries,
           min_adj_sim
    FROM segs s LEFT JOIN per USING (doc_id)
    ORDER BY s.doc_id
    """


ORACLES["chunk_semantic_split"] = _semantic_split_oracle()


# --- dedup / embedding / reco / graph ---------------------------------------


def dedup_bbit_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """b-bit minhash audit (Li & Konig 2010): keep only the low 2 bits
    of each of 16 minhash slots and compare the corrected estimator
    (E - 1/4)/(3/4) against the full-width slot-match estimator on a
    mod-sampled pair grid -- the measurement that justifies shipping a
    32-bit signature instead of 512 bits.  Delegates to the
    parameterized ``operators/dedup.bbit_minhash_audit`` kernel pinned
    at modulus 97; the modulus (and the corpus^2 scaling rule,
    ``modulus_for_target_pairs``) is an API knob on the operator so the
    100 TB constant-sample-size discipline is executable, not prose
    (VERDICT r7 item 8).  The pair grid stays an equi-key residue hash
    join (never all-pairs); the histogram closes on the exact k/16
    grid with integer sums only."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        bbit_minhash_audit,
    )

    return bbit_minhash_audit(
        t(spark, sf, "documents"), n=3, num_hashes=16, b_bits=2, pair_modulus=97
    )


QUERIES["dedup_bbit_minhash"] = dedup_bbit_minhash


def _bbit_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    a, b = minhash_params(16)
    a_list = "[" + ", ".join(str(v) for v in a) + "]"
    b_list = "[" + ", ".join(str(v) for v in b) + "]"
    hash_sql = (
        f"({a_list}[seed + 1] * ({md5_int32_sql('shingle')} % {MINHASH_PRIME}) "
        f"+ {b_list}[seed + 1]) % {MINHASH_PRIME}"
    )
    return rf"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE CAST([] AS VARCHAR[]) END) AS s
               FROM toks),
        ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0),
        seeds AS (SELECT unnest(range(16)) AS seed),
        mh AS (SELECT doc_id, seed, min({hash_sql}) AS h
               FROM ex CROSS JOIN seeds GROUP BY doc_id, seed),
        sig AS (SELECT doc_id, list(h ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
        pairs AS (
          SELECT
            len(list_filter(range(16),
                            i -> a.sig[i + 1] = b.sig[i + 1])) AS k_full,
            len(list_filter(range(16),
                            i -> (a.sig[i + 1] % 4) = (b.sig[i + 1] % 4)))
              AS k_bbit
          FROM sig a JOIN sig b
            ON a.doc_id < b.doc_id AND (a.doc_id + b.doc_id) % 97 = 0),
        hist AS (
          SELECT k_full, count(*) AS n_pairs, sum(k_bbit) AS skb
          FROM pairs GROUP BY 1)
        SELECT CAST(k_full AS BIGINT) AS k_full,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               round(k_full / 16.0, 6) AS est_full,
               round((skb / CAST(n_pairs AS DOUBLE) / 16.0 - 0.25) / 0.75, 6)
                 AS mean_est_bbit
        FROM hist ORDER BY k_full
    """


ORACLES["dedup_bbit_minhash"] = _bbit_oracle()


def embedding_pair_cosine_hist(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise-cosine distribution of the embedding corpus on a
    mod-sampled pair grid — the isotropy/collapse diagnostic read
    BEFORE trusting any cosine threshold (a collapsed embedder pushes
    the whole histogram toward 1).  The grid is arithmetic-bounded;
    binning happens on the ROUNDED cosine so both engines bin
    identically."""
    from image_matadata_batchprocessing_aws_spark.functions import cosine_sim
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    # equi-key form of (a + b) % 23 == 0 (see dedup_bbit_minhash):
    # hash join on the residue class, residual a < b filter
    cos = a.join(
        b,
        ((23 - F.col("a.vec_id") % 23) % 23 == F.col("b.vec_id") % 23)
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 6).alias("c")
    )
    binned = cos.select(
        F.least(F.lit(9), F.floor(F.col("c") * 10)).cast("long").alias("bin")
    )
    tot = binned.agg(F.count(F.lit(1)).alias("n"))
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("n_pairs") / F.col("n"), 6).alias("share"),
        )
        .orderBy("bin")
    )


QUERIES["embedding_pair_cosine_hist"] = embedding_pair_cosine_hist

ORACLES["embedding_pair_cosine_hist"] = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    cos AS (
      SELECT round(list_cosine_similarity(a.v, b.v), 6) AS c
      FROM e a JOIN e b
        ON a.vec_id < b.vec_id AND (a.vec_id + b.vec_id) % 23 = 0),
    binned AS (
      SELECT least(9, CAST(floor(c * 10) AS BIGINT)) AS bin FROM cos),
    tot AS (SELECT count(*) AS n FROM binned)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
           round(count(*) / CAST(n AS DOUBLE), 6) AS share
    FROM binned CROSS JOIN tot
    GROUP BY bin, n ORDER BY bin
"""


def reco_slope_one(spark: SparkSession, sf: str) -> DataFrame:
    """Slope One item-item deviations (Lemire & Maclachlan 2005) over
    per-customer part-consumption intensities, item universe bounded
    to one brand so the co-rater pair table stays quadratic in a SMALL
    item set (the standard blocking move; cross-brand deviations ride
    the same kernel per block).  Ratings are integer quantity totals,
    so every deviation is an exact integer sum over co-raters divided
    once."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    p = t(spark, sf, "part").where(F.col("p_brand") == "Brand#11").select("p_partkey")
    r = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("rating"))
    )
    a, b = r.alias("a"), r.alias("b")
    dev = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.sum(F.col("a.rating") - F.col("b.rating")).alias("__sdev"),
        )
    )
    return (
        dev.select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.round(F.col("__sdev") / F.col("support"), 6).alias("deviation"),
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(15)
    )


QUERIES["reco_slope_one"] = reco_slope_one

ORACLES["reco_slope_one"] = """
    WITH r AS (
      SELECT o_custkey, l_partkey,
             sum(CAST(round(l_quantity) AS BIGINT)) AS rating
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#11'
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    dev AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS support, sum(a.rating - b.rating) AS sdev
      FROM r a JOIN r b
        ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           round(sdev / CAST(support AS DOUBLE), 6) AS deviation
    FROM dev ORDER BY support DESC, part_a, part_b LIMIT 15
"""


def graph_powerlaw_alpha(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete power-law exponent MLE (Clauset-Shalizi-Newman
    continuous approximation, xmin=1) for the customer-side degree
    distribution of the customer-supplier graph: alpha = 1 + n /
    sum(ln d).  The log-sum folds over the DEGREE-VALUE table (bounded
    by max degree), each term as a 1e-9-grid BIGINT so the reduction
    is order-free in both engines."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    deg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dv = deg.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    a = dv.agg(
        F.sum("c").alias("n"),
        F.max("d").alias("dmax"),
        F.sum(
            F.col("c") * F.round(F.log(F.col("d").cast("double")) * 1e9).cast("long")
        ).alias("__slog"),
    )
    return a.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.lit(1).cast("long").alias("d_min"),
        F.col("dmax").cast("long").alias("d_max"),
        F.round(1.0 + F.col("n") / (F.col("__slog") / 1e9), 6).alias("alpha_mle"),
    )


QUERIES["graph_powerlaw_alpha"] = graph_powerlaw_alpha

ORACLES["graph_powerlaw_alpha"] = """
    WITH deg AS (
      SELECT o_custkey, count(*) AS d FROM (
        SELECT DISTINCT o_custkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      GROUP BY 1),
    dv AS (SELECT d, count(*) AS c FROM deg GROUP BY 1),
    a AS (
      SELECT sum(c) AS n, max(d) AS dmax,
             sum(c * CAST(round(ln(CAST(d AS DOUBLE)) * 1e9) AS BIGINT)) AS slog
      FROM dv)
    SELECT CAST(n AS BIGINT) AS n_nodes, CAST(1 AS BIGINT) AS d_min,
           CAST(dmax AS BIGINT) AS d_max,
           round(1.0 + n / (slog / 1e9), 6) AS alpha_mle
    FROM a
"""


# --- multimodal curation filters --------------------------------------------

PXD_N_DOCS = 21
PXD_GROUPS = 7
PXD_H, PXD_W = 24, 32


def multimodal_pixel_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CONTENT-level exact image dedup: the same pixels encoded through
    DIFFERENT containers (PNG for even doc ids, binary PPM for odd)
    hash identically after REAL decode, so cross-format duplicates
    collapse where byte-level hashing cannot see them.  The Arrow
    stage emits one md5 per decoded RGB buffer (pixels never shuffle);
    the group fold is the registered exact-dedup shape; the oracle is
    closed-form from the doc->group arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    def pixels(g: int) -> "np.ndarray":
        yy, xx = np.mgrid[0:PXD_H, 0:PXD_W]
        v = ((xx * 7 + yy * 13) * (g + 3) + g * 37) % 256
        return np.dstack([v, (v * 2 + g) % 256, (v * 5 + 2 * g) % 256]).astype(
            np.uint8
        )

    rows = []
    for d in range(PXD_N_DOCS):
        img = pixels(d % PXD_GROUPS)
        if d % 2 == 0:
            rows.append((d, f"{d}.png", bytearray(encode_png(img))))
        else:
            header = f"P6\n{PXD_W} {PXD_H}\n255\n".encode()
            rows.append((d, f"{d}.ppm", bytearray(header + img.tobytes())))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content))
                out.append(
                    (
                        int(did),
                        hashlib.md5(np.ascontiguousarray(img).tobytes()).hexdigest(),
                        name.rsplit(".", 1)[1],
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "pixel_md5", "fmt"])

    hashed = entries.mapInPandas(
        phash, "doc_id long, pixel_md5 string, fmt string"
    )
    return (
        hashed.groupBy("pixel_md5")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.count_distinct("fmt").cast("long").alias("n_formats"),
        )
        .select("canonical_id", "n_dups", "n_formats")
        .orderBy("canonical_id")
    )


QUERIES["multimodal_pixel_dedup"] = multimodal_pixel_dedup

ORACLES["multimodal_pixel_dedup"] = f"""
    WITH d AS (SELECT unnest(range({PXD_N_DOCS})) AS doc_id),
    g AS (SELECT doc_id, doc_id % {PXD_GROUPS} AS grp, doc_id % 2 AS parity
          FROM d)
    SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(count(DISTINCT parity) AS BIGINT) AS n_formats
    FROM g GROUP BY grp ORDER BY canonical_id
"""


ENT_N_DOCS = 18
#: even-dimension screens shared with the r07 animation fixtures
ENT_DIMS = [(32, 48), (24, 40), (40, 32), (28, 36), (36, 28), (48, 24)]
_ENT_DIMS_H = " ".join(f"WHEN {i} THEN {h}" for i, (h, _) in enumerate(ENT_DIMS))
_ENT_DIMS_W = " ".join(f"WHEN {i} THEN {w}" for i, (_, w) in enumerate(ENT_DIMS))


def multimodal_image_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram (Shannon) entropy per image — the flat-image screen an
    image-curation funnel applies before spending decode-downstream
    budget (near-zero entropy = synthetic flats/borders).  Decode is
    REAL; the Arrow stage emits exact 256-bin histograms (the
    ``multimodal_otsu`` sufficient-form discipline) and the entropy
    folds per doc from 1e-9-grid integer terms, so the <=256-term
    reduction is order-free in both engines."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(ENT_N_DOCS):
        h, w = ENT_DIMS[d % len(ENT_DIMS)]
        hw = h * w
        l1, l2, l3 = 40 + d % 20, 120 + d % 30, 200 + d % 40
        n1, n2 = hw // 2, hw // 3
        flat = np.empty(hw, np.uint8)
        flat[:n1] = l1
        flat[n1 : n1 + n2] = l2
        flat[n1 + n2 :] = l3
        gray = flat.reshape(h, w)
        rows.append((d, f"{d}.png", bytearray(encode_png(np.dstack([gray] * 3)))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content))[:, :, 0]
                counts = np.bincount(img.reshape(-1), minlength=256)
                for level in np.nonzero(counts)[0]:
                    out.append((int(did), int(level), int(counts[level])))
            yield pd.DataFrame(out, columns=["doc_id", "level", "cnt"])

    h_df = entries.mapInPandas(hist, "doc_id long, level long, cnt long")
    tot = h_df.groupBy("doc_id").agg(F.sum("cnt").alias("W"))
    term = (
        h_df.join(tot, "doc_id")
        .select(
            "doc_id",
            F.round(
                -(F.col("cnt") / F.col("W"))
                * F.log(F.col("cnt") / F.col("W"))
                * 1e9
            )
            .cast("long")
            .alias("__t"),
        )
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_levels"),
            F.round(F.sum("__t") / 1e9, 6).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


QUERIES["multimodal_image_entropy"] = multimodal_image_entropy

ORACLES["multimodal_image_entropy"] = f"""
    WITH d AS (SELECT unnest(range({ENT_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ENT_DIMS)} {_ENT_DIMS_H} END AS h,
             CASE doc_id % {len(ENT_DIMS)} {_ENT_DIMS_W} END AS w
      FROM d),
    hist AS (
      SELECT doc_id, (h * w) // 2 AS cnt, h * w AS hw FROM dims
      UNION ALL
      SELECT doc_id, (h * w) // 3, h * w FROM dims
      UNION ALL
      SELECT doc_id, h * w - (h * w) // 2 - (h * w) // 3, h * w FROM dims),
    term AS (
      SELECT doc_id,
             CAST(round(-(cnt / CAST(hw AS DOUBLE))
                        * ln(cnt / CAST(hw AS DOUBLE)) * 1e9) AS BIGINT) AS t
      FROM hist)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_levels,
           round(sum(t) / 1e9, 6) AS entropy_nats
    FROM term GROUP BY 1 ORDER BY doc_id
"""


GRAY_N_DOCS = 20


def multimodal_grayscale_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Grayscale / near-grayscale detection from REAL decoded pixels —
    the color-space screen (grayscale scans routed to OCR, color
    photos to the vision encoder).  The Arrow stage emits per-image
    integer sufficient statistics (max inter-channel deviation, summed
    per-pixel channel range); the flag is relational; the oracle is
    closed-form from the tint arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    H, W = 20, 28
    rows = []
    for d in range(GRAY_N_DOCS):
        yy, xx = np.mgrid[0:H, 0:W]
        v = ((xx * 3 + yy * 5) + d * 11) % 200
        img = np.dstack([v, v, v]).astype(np.uint8)
        if d % 2 == 1:
            img[:, :, 0] = (v + 1 + d % 49).astype(np.uint8)  # red tint
        rows.append((d, f"{d}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
                rng = img.max(axis=2) - img.min(axis=2)
                out.append(
                    (
                        int(did),
                        int(np.abs(r - g).max()),
                        int(np.abs(r - b).max()),
                        int(rng.sum()),
                        int(img.shape[0] * img.shape[1]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "max_rg", "max_rb", "sum_range", "n_px"],
            )

    s = entries.mapInPandas(
        stats, "doc_id long, max_rg long, max_rb long, sum_range long, n_px long"
    )
    return s.select(
        "doc_id",
        "max_rg",
        "max_rb",
        ((F.col("max_rg") == 0) & (F.col("max_rb") == 0)).cast("long").alias(
            "is_grayscale"
        ),
        F.round(F.col("sum_range") / F.col("n_px"), 6).alias("mean_chan_range"),
    ).orderBy("doc_id")


QUERIES["multimodal_grayscale_detect"] = multimodal_grayscale_detect

ORACLES["multimodal_grayscale_detect"] = f"""
    WITH d AS (SELECT unnest(range({GRAY_N_DOCS})) AS doc_id),
    s AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 1 THEN 1 + doc_id % 49 ELSE 0 END AS tint
      FROM d)
    SELECT doc_id,
           CAST(tint AS BIGINT) AS max_rg,
           CAST(tint AS BIGINT) AS max_rb,
           CAST(CASE WHEN tint = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_grayscale,
           round(CAST(tint AS DOUBLE), 6) AS mean_chan_range
    FROM s ORDER BY doc_id
"""


LB_N_DOCS = 20


def multimodal_letterbox_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Letterbox-bar detection from REAL decoded pixels: count leading
    and trailing all-constant rows (the black bars a video-still crop
    pass removes before feature extraction).  The Arrow stage emits
    the two integers per image; bars are doc_id % 5 rows by
    construction, so the oracle closes from that arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    H, W = 22, 30
    rows = []
    for d in range(LB_N_DOCS):
        k = d % 5
        yy, xx = np.mgrid[0:H, 0:W]
        v = ((xx * 3 + yy * 5) + d * 7) % 199 + 1  # 1..199, varies with x
        img = np.dstack([v, v, v]).astype(np.uint8)
        img[:k, :, :] = 0
        img[H - k or H :, :, :] = 0
        if k:
            img[H - k :, :, :] = 0
        rows.append((d, f"{d}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def bars(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content))
                const = (img.max(axis=(1, 2)) == img.min(axis=(1, 2)))
                top = 0
                while top < len(const) and const[top]:
                    top += 1
                bot = 0
                while bot < len(const) - top and const[len(const) - 1 - bot]:
                    bot += 1
                out.append((int(did), int(len(const)), int(top), int(bot)))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_rows", "top_bars", "bottom_bars"]
            )

    s = entries.mapInPandas(
        bars, "doc_id long, n_rows long, top_bars long, bottom_bars long"
    )
    return s.select(
        "doc_id",
        "n_rows",
        "top_bars",
        "bottom_bars",
        (F.col("n_rows") - F.col("top_bars") - F.col("bottom_bars")).alias(
            "content_rows"
        ),
    ).orderBy("doc_id")


QUERIES["multimodal_letterbox_detect"] = multimodal_letterbox_detect

ORACLES["multimodal_letterbox_detect"] = f"""
    WITH d AS (SELECT unnest(range({LB_N_DOCS})) AS doc_id),
    s AS (SELECT doc_id, doc_id % 5 AS k FROM d)
    SELECT doc_id, CAST(22 AS BIGINT) AS n_rows,
           CAST(k AS BIGINT) AS top_bars, CAST(k AS BIGINT) AS bottom_bars,
           CAST(22 - 2 * k AS BIGINT) AS content_rows
    FROM s ORDER BY doc_id
"""


CLIP_N_DOCS = 16
CLIP_THRESH = 32000


def multimodal_audio_clipping(spark: SparkSession, sf: str) -> DataFrame:
    """Clipping detection on REAL-decoded PCM16 WAVs: exceedance count
    over |s| >= 32000 and the LONGEST clipped run — the audio-quality
    gate before a speech corpus admits a recording.  The Arrow stage
    decodes with the pure RIFF parser and emits three integers per
    blob; the oracle REGENERATES the same deterministic sample stream
    in SQL (unnest(range(n)) + the affine-mod formula) and runs the
    identical islands computation."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        decode_wav,
        encode_wav_pcm16,
    )

    rows = []
    for d in range(CLIP_N_DOCS):
        n = 2000 + 500 * (d % 3)
        s = ((np.arange(n, dtype=np.int64) * (7919 + 2 * d) + d * 104729) % 65536) - 32768
        rows.append((d, f"{d}.wav", bytearray(encode_wav_pcm16(s, 8000))))
    audio = spark.createDataFrame(
        rows, "doc_id long, file_name string, content binary"
    )

    def clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(content))
                s = np.asarray(samples, dtype=np.int64).reshape(-1)
                clipped = np.abs(s) >= CLIP_THRESH
                n_clip = int(clipped.sum())
                max_run = 0
                run = 0
                for c in clipped:
                    run = run + 1 if c else 0
                    if run > max_run:
                        max_run = run
                out.append((int(did), int(s.size), n_clip, max_run))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "n_clipped", "max_run"]
            )

    s = audio.mapInPandas(
        clip, "doc_id long, n_samples long, n_clipped long, max_run long"
    )
    return s.select(
        "doc_id",
        "n_samples",
        "n_clipped",
        F.round(F.col("n_clipped") / F.col("n_samples"), 6).alias("clip_frac"),
        "max_run",
    ).orderBy("doc_id")


QUERIES["multimodal_audio_clipping"] = multimodal_audio_clipping

ORACLES["multimodal_audio_clipping"] = f"""
    WITH d AS (SELECT unnest(range({CLIP_N_DOCS})) AS doc_id),
    meta AS (SELECT doc_id, 2000 + 500 * (doc_id % 3) AS n FROM d),
    samp AS (
      SELECT doc_id, i,
             ((i * (7919 + 2 * doc_id) + doc_id * 104729) % 65536) - 32768 AS s
      FROM meta, unnest(range(n)) u(i)),
    c AS (
      SELECT doc_id, i,
             CASE WHEN abs(s) >= {CLIP_THRESH} THEN 1 ELSE 0 END AS clip
      FROM samp),
    isl AS (
      SELECT doc_id, i, clip,
             i - row_number() OVER (PARTITION BY doc_id, clip ORDER BY i) AS grp
      FROM c),
    runs AS (
      SELECT doc_id, count(*) AS run_len
      FROM isl WHERE clip = 1 GROUP BY doc_id, grp),
    agg AS (
      SELECT c.doc_id,
             count(*) AS n_samples,
             sum(clip) AS n_clipped
      FROM c GROUP BY 1),
    mr AS (SELECT doc_id, max(run_len) AS max_run FROM runs GROUP BY 1)
    SELECT a.doc_id, CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_clipped AS BIGINT) AS n_clipped,
           round(n_clipped / CAST(n_samples AS DOUBLE), 6) AS clip_frac,
           CAST(coalesce(max_run, 0) AS BIGINT) AS max_run
    FROM agg a LEFT JOIN mr ON a.doc_id = mr.doc_id
    ORDER BY a.doc_id
"""


# --- time-series / ops ------------------------------------------------------


def _order_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Per epoch-day exact revenue (whole dollars, BIGINT) from orders —
    the shared integer-first day grid for the r08 ts_* additions.
    Dollars (not cents) keep squared day-over-day changes inside int64
    with ~9x headroom at sf0.1; the split-BIGINT discipline still
    guards the one squared sum below."""
    o = t(spark, sf, "orders")
    return (
        o.select(
            F.unix_millis(F.date_trunc("day", "o_orderdate")).alias("day_ms"),
            F.round("o_totalprice").cast("long").alias("usd"),
        )
        .groupBy("day_ms")
        .agg(F.sum("usd").alias("rev"))
    )


_ORDER_DAILY_SQL = """
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS day_ms,
             sum(CAST(round(o_totalprice) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
"""


def ts_spectral_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Normalized spectral entropy of the daily-revenue periodogram
    (periods 2..14) — one number for 'is there ANY periodic structure'
    (low entropy = concentrated spectrum = strong seasonality), the
    summary the registered per-period ``ts_periodogram`` feeds.
    Powers snap to the 1e-9 grid before normalization, so the 13-term
    entropy fold is order-free integer arithmetic in both engines."""
    import math

    d = _order_daily(spark, sf)
    w = Window.orderBy("day_ms")
    g = d.groupBy().agg(F.count(F.lit(1)).alias("__n"), F.sum("rev").alias("__s"))
    idx = d.withColumn("__t", F.row_number().over(w) - 1).crossJoin(F.broadcast(g))
    centered = idx.select(
        "__t",
        (
            F.col("rev").cast("double")
            - F.col("__s").cast("double") / F.col("__n")
        ).alias("__x"),
    )
    periods = spark.range(2, 15).select(F.col("id").cast("long").alias("period"))
    two_pi = F.lit(2.0 * math.pi)
    terms = centered.crossJoin(F.broadcast(periods)).select(
        "period",
        (F.col("__x") * F.cos(two_pi * F.col("__t") / F.col("period"))).alias("__c"),
        (F.col("__x") * F.sin(two_pi * F.col("__t") / F.col("period"))).alias("__sn"),
    )
    pw = terms.groupBy("period").agg(
        F.round(
            (F.sum("__c") * F.sum("__c") + F.sum("__sn") * F.sum("__sn")) / 1e6
        )
        .cast("long")
        .alias("pw")  # 1e-6-grid of the raw (unnormalized) power
    )
    tot = pw.agg(F.sum("pw").alias("tp"))
    term = pw.crossJoin(F.broadcast(tot)).select(
        "period",
        "pw",
        "tp",
        F.round(
            -(F.col("pw") / F.col("tp")) * F.log(F.col("pw") / F.col("tp")) * 1e9
        )
        .cast("long")
        .alias("__h"),
    )
    best = term.orderBy(F.col("pw").desc(), F.col("period").asc()).limit(1)
    h = term.agg(F.sum("__h").alias("sh"), F.count(F.lit(1)).alias("k"))
    return (
        h.crossJoin(best.select(F.col("period").alias("peak_period")))
        .select(
            F.col("k").cast("long").alias("n_periods"),
            F.round(F.col("sh") / 1e9, 6).alias("spectral_entropy"),
            F.round(F.col("sh") / 1e9 / F.log(F.col("k").cast("double")), 6).alias(
                "normalized_entropy"
            ),
            "peak_period",
        )
    )


QUERIES["ts_spectral_entropy"] = ts_spectral_entropy

ORACLES["ts_spectral_entropy"] = f"""
    WITH d AS ({_ORDER_DAILY_SQL}),
    g AS (SELECT count(*) AS n, sum(rev) AS s FROM d),
    idx AS (
      SELECT row_number() OVER (ORDER BY day_ms) - 1 AS t,
             rev - s / CAST(n AS DOUBLE) AS x
      FROM d CROSS JOIN g),
    periods AS (SELECT unnest(range(2, 15)) AS period),
    terms AS (
      SELECT period,
             x * cos(2 * pi() * t / period) AS c,
             x * sin(2 * pi() * t / period) AS sn
      FROM idx CROSS JOIN periods),
    pw AS (
      SELECT period,
             CAST(round((sum(c) * sum(c) + sum(sn) * sum(sn)) / 1e6) AS BIGINT)
               AS pw
      FROM terms GROUP BY 1),
    tot AS (SELECT sum(pw) AS tp FROM pw),
    term AS (
      SELECT period, pw, tp,
             CAST(round(-(pw / CAST(tp AS DOUBLE))
                        * ln(pw / CAST(tp AS DOUBLE)) * 1e9) AS BIGINT) AS h
      FROM pw CROSS JOIN tot),
    best AS (SELECT period AS peak_period FROM term
             ORDER BY pw DESC, period ASC LIMIT 1),
    agg AS (SELECT sum(h) AS sh, count(*) AS k FROM term)
    SELECT CAST(k AS BIGINT) AS n_periods,
           round(sh / 1e9, 6) AS spectral_entropy,
           round(sh / 1e9 / ln(CAST(k AS DOUBLE)), 6) AS normalized_entropy,
           peak_period
    FROM agg CROSS JOIN best
"""


def ts_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue level (running max minus
    current, in whole dollars) with the peak/trough days — the
    worst-regression readout finance and SLO dashboards share.  One
    cumulative window over the DAY table; every compare is BIGINT;
    ties break on the earlier trough day."""
    d = _order_daily(spark, sf)
    w = Window.orderBy("day_ms").rowsBetween(Window.unboundedPreceding, 0)
    dd = d.select(
        "day_ms",
        "rev",
        F.max("rev").over(w).alias("runmax"),
        (F.max("rev").over(w) - F.col("rev")).alias("dd"),
    )
    worst = dd.orderBy(F.col("dd").desc(), F.col("day_ms").asc()).limit(1)
    return worst.select(
        F.col("day_ms").alias("trough_day_ms"),
        F.col("runmax").cast("long").alias("peak_rev_usd"),
        F.col("rev").cast("long").alias("trough_rev_usd"),
        F.col("dd").cast("long").alias("max_drawdown_usd"),
        F.round(F.col("dd") / F.col("runmax"), 6).alias("drawdown_frac"),
    )


QUERIES["ts_max_drawdown"] = ts_max_drawdown

ORACLES["ts_max_drawdown"] = f"""
    WITH d AS ({_ORDER_DAILY_SQL}),
    dd AS (
      SELECT day_ms, rev,
             max(rev) OVER (ORDER BY day_ms ROWS UNBOUNDED PRECEDING) AS runmax
      FROM d)
    SELECT day_ms AS trough_day_ms,
           CAST(runmax AS BIGINT) AS peak_rev_usd,
           CAST(rev AS BIGINT) AS trough_rev_usd,
           CAST(runmax - rev AS BIGINT) AS max_drawdown_usd,
           round((runmax - rev) / CAST(runmax AS DOUBLE), 6) AS drawdown_frac
    FROM dd ORDER BY runmax - rev DESC, day_ms ASC LIMIT 1
"""


def ts_risk_ratios(spark: SparkSession, sf: str) -> DataFrame:
    """Sharpe- and Sortino-style ratios of day-over-day revenue changes
    — volatility-adjusted trend readouts from exact integer moments
    (split-BIGINT squared sums; downside moments condition on the sign
    of the exact integer change)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        _split_sum,
        _split_val,
    )

    d = _order_daily(spark, sf)
    w = Window.orderBy("day_ms")
    chg = (
        d.withColumn("prev", F.lag("rev").over(w))
        .where(F.col("prev").isNotNull())
        .select((F.col("rev") - F.col("prev")).alias("c"))
    )
    a = chg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        *_split_sum(F.col("c") * F.col("c"), "qcc"),
        F.sum(F.when(F.col("c") < 0, F.col("c")).otherwise(0)).alias("sneg"),
        *_split_sum(
            F.when(F.col("c") < 0, F.col("c") * F.col("c")).otherwise(F.lit(0)),
            "qneg",
        ),
        F.sum((F.col("c") < 0).cast("long")).alias("nneg"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sc") / nd
    var = (_split_val("qcc", 1.0) - F.col("sc") * mean) / (nd - 1)
    dvar = _split_val("qneg", 1.0) / nd  # downside second moment about 0
    return a.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean_chg_usd"),
        F.round(mean / F.sqrt(var), 6).alias("sharpe"),
        F.round(mean / F.sqrt(dvar), 6).alias("sortino"),
        F.col("nneg").cast("long").alias("n_down_days"),
    )


QUERIES["ts_risk_ratios"] = ts_risk_ratios

ORACLES["ts_risk_ratios"] = f"""
    WITH d AS ({_ORDER_DAILY_SQL}),
    chg AS (
      SELECT rev - lag(rev) OVER (ORDER BY day_ms) AS c FROM d
      QUALIFY lag(rev) OVER (ORDER BY day_ms) IS NOT NULL),
    a AS (
      SELECT count(*) AS n, sum(c) AS sc,
             sum(c * c // 1073741824) AS qcc_hi, sum(c * c % 1073741824) AS qcc_lo,
             sum(CASE WHEN c < 0 THEN c ELSE 0 END) AS sneg,
             sum(CASE WHEN c < 0 THEN c * c ELSE 0 END // 1073741824) AS qneg_hi,
             sum(CASE WHEN c < 0 THEN c * c ELSE 0 END % 1073741824) AS qneg_lo,
             sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) AS nneg
      FROM chg),
    s AS (
      SELECT n, sc, nneg,
             sc / CAST(n AS DOUBLE) AS mean,
             ((CAST(qcc_hi AS DOUBLE) * 1073741824.0 + qcc_lo)
              - sc * (sc / CAST(n AS DOUBLE))) / (n - 1) AS var,
             (CAST(qneg_hi AS DOUBLE) * 1073741824.0 + qneg_lo)
               / CAST(n AS DOUBLE) AS dvar
      FROM a)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(mean, 6) AS mean_chg_usd,
           round(mean / sqrt(var), 6) AS sharpe,
           round(mean / sqrt(dvar), 6) AS sortino,
           CAST(nneg AS BIGINT) AS n_down_days
    FROM s
"""


def ts_peaks_prominence(spark: SparkSession, sf: str) -> DataFrame:
    """Local revenue peaks with bounded-frame prominence: a day beats
    its 3 neighbors each side strictly, and prominence is the drop to
    the higher of the two 7-day-side minima — integer-exact peak
    picking (the alert-worthy-spike detector).  Frames are fixed-width
    windows over the day table; edges without full frames drop."""
    d = _order_daily(spark, sf)
    w = Window.orderBy("day_ms")
    lead_lag = d
    for i in range(1, 4):
        lead_lag = lead_lag.withColumn(f"lb{i}", F.lag("rev", i).over(w)).withColumn(
            f"la{i}", F.lead("rev", i).over(w)
        )
    wl = Window.orderBy("day_ms").rowsBetween(-7, -1)
    wr = Window.orderBy("day_ms").rowsBetween(1, 7)
    cand = (
        lead_lag.withColumn("minl", F.min("rev").over(wl))
        .withColumn("minr", F.min("rev").over(wr))
        .withColumn("nl", F.count("rev").over(wl))
        .withColumn("nr", F.count("rev").over(wr))
    )
    is_peak = (
        (F.col("rev") > F.col("lb1")) & (F.col("rev") > F.col("lb2"))
        & (F.col("rev") > F.col("lb3")) & (F.col("rev") > F.col("la1"))
        & (F.col("rev") > F.col("la2")) & (F.col("rev") > F.col("la3"))
    )
    peaks = cand.where(
        is_peak & (F.col("nl") == 7) & (F.col("nr") == 7)
    ).select(
        "day_ms",
        F.col("rev").cast("long").alias("rev_usd"),
        (F.col("rev") - F.greatest("minl", "minr")).cast("long").alias("prominence"),
    )
    return peaks.orderBy(F.col("prominence").desc(), F.col("day_ms").asc()).limit(10)


QUERIES["ts_peaks_prominence"] = ts_peaks_prominence

ORACLES["ts_peaks_prominence"] = f"""
    WITH d AS ({_ORDER_DAILY_SQL}),
    x AS (
      SELECT day_ms, rev,
             lag(rev, 1) OVER w AS lb1, lag(rev, 2) OVER w AS lb2,
             lag(rev, 3) OVER w AS lb3,
             lead(rev, 1) OVER w AS la1, lead(rev, 2) OVER w AS la2,
             lead(rev, 3) OVER w AS la3,
             min(rev) OVER (ORDER BY day_ms
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS minl,
             min(rev) OVER (ORDER BY day_ms
                            ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS minr,
             count(rev) OVER (ORDER BY day_ms
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS nl,
             count(rev) OVER (ORDER BY day_ms
                              ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS nr
      FROM d WINDOW w AS (ORDER BY day_ms))
    SELECT day_ms, CAST(rev AS BIGINT) AS rev_usd,
           CAST(rev - greatest(minl, minr) AS BIGINT) AS prominence
    FROM x
    WHERE rev > lb1 AND rev > lb2 AND rev > lb3
      AND rev > la1 AND rev > la2 AND rev > la3
      AND nl = 7 AND nr = 7
    ORDER BY prominence DESC, day_ms ASC LIMIT 10
"""


def ts_alert_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    """Alert-burst coalescing: revenue days above the exact p90
    threshold are alarms; alarms closer than 7 days merge into one
    burst (gap-and-island on the alarm-day table) and each burst fires
    ONCE with its span and peak — the dedup every paging pipeline
    applies before waking a human.  Threshold is a 1-row broadcast;
    islands are integer day arithmetic."""
    d = _order_daily(spark, sf).withColumn(
        "day_num", (F.col("day_ms") / 86400000).cast("long")
    )
    thr = d.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY rev)")
        .cast("long")
        .alias("thr")
    )
    al = d.crossJoin(F.broadcast(thr)).where(F.col("rev") > F.col("thr"))
    w = Window.orderBy("day_num")
    grp = al.withColumn(
        "new_burst",
        (
            F.coalesce(
                F.col("day_num") - F.lag("day_num").over(w), F.lit(999)
            )
            > 7
        ).cast("long"),
    ).withColumn(
        "burst",
        F.sum("new_burst").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grp.groupBy("burst")
        .agg(
            F.min("day_ms").alias("first_day_ms"),
            F.max("day_ms").alias("last_day_ms"),
            F.count(F.lit(1)).cast("long").alias("n_alarms"),
            F.max("rev").cast("long").alias("peak_rev_usd"),
        )
        .select("first_day_ms", "last_day_ms", "n_alarms", "peak_rev_usd")
        .orderBy("first_day_ms")
    )


QUERIES["ts_alert_coalesce"] = ts_alert_coalesce

ORACLES["ts_alert_coalesce"] = f"""
    WITH d0 AS ({_ORDER_DAILY_SQL}),
    d AS (SELECT day_ms, day_ms // 86400000 AS day_num, rev FROM d0),
    thr AS (SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY rev) AS thr FROM d),
    al AS (SELECT day_ms, day_num, rev FROM d CROSS JOIN thr WHERE rev > thr),
    g AS (
      SELECT day_ms, day_num, rev,
             CASE WHEN coalesce(day_num - lag(day_num) OVER (ORDER BY day_num),
                                999) > 7
                  THEN 1 ELSE 0 END AS new_burst
      FROM al),
    b AS (
      SELECT day_ms, rev,
             sum(new_burst) OVER (ORDER BY day_num ROWS UNBOUNDED PRECEDING)
               AS burst
      FROM g)
    SELECT min(day_ms) AS first_day_ms, max(day_ms) AS last_day_ms,
           CAST(count(*) AS BIGINT) AS n_alarms,
           CAST(max(rev) AS BIGINT) AS peak_rev_usd
    FROM b GROUP BY burst ORDER BY first_day_ms
"""


def etl_t_closeness(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness privacy audit (the step past the registered
    k-anonymity / l-diversity): per market-segment quasi-group, the
    ordered-attribute Earth Mover's Distance between the group's
    account-balance band distribution and the global one — EMD over an
    ordered domain is the mean |cumulative difference|, so 10 fixed
    bands x 5 groups close from exact counts with a 1e-9-grid fold."""
    c = t(spark, sf, "customer").select(
        "c_mktsegment",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.round(F.col("c_acctbal") * 100) + 100000) / 120000
                ).cast("long"),
            ),
        ).alias("band"),
    )
    bands = spark.range(10).select(F.col("id").cast("long").alias("band"))
    segs = c.select("c_mktsegment").distinct()
    grid = segs.crossJoin(F.broadcast(bands))
    gcnt = c.groupBy("c_mktsegment", "band").agg(F.count(F.lit(1)).alias("gn"))
    gtot = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("gt"))
    acnt = c.groupBy("band").agg(F.count(F.lit(1)).alias("an"))
    atot = c.agg(F.count(F.lit(1)).alias("at"))
    full = (
        grid.join(gcnt, ["c_mktsegment", "band"], "left")
        .fillna(0, subset=["gn"])
        .join(F.broadcast(acnt), "band", "left")
        .fillna(0, subset=["an"])
        .join(F.broadcast(gtot), "c_mktsegment")
        .crossJoin(F.broadcast(atot))
    )
    wb = Window.partitionBy("c_mktsegment").orderBy("band").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = full.select(
        "c_mktsegment",
        "band",
        (F.sum("gn").over(wb) / F.col("gt")).alias("cg"),
        (F.sum("an").over(wb) / F.col("at")).alias("ca"),
    )
    term = cum.select(
        "c_mktsegment",
        F.round(F.abs(F.col("cg") - F.col("ca")) * 1e9).cast("long").alias("__t"),
    )
    out = term.groupBy("c_mktsegment").agg(
        F.round(F.sum("__t") / 1e9 / 9.0, 6).alias("t_value")
    )
    return out.select(
        "c_mktsegment", "t_value", (F.col("t_value") > 0.2).alias("violates_t02")
    ).orderBy("c_mktsegment")


QUERIES["etl_t_closeness"] = etl_t_closeness

ORACLES["etl_t_closeness"] = """
    WITH c AS (
      SELECT c_mktsegment,
             least(9, greatest(0,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 120000))
               AS band
      FROM customer),
    bands AS (SELECT unnest(range(10)) AS band),
    segs AS (SELECT DISTINCT c_mktsegment FROM c),
    grid AS (SELECT c_mktsegment, band FROM segs CROSS JOIN bands),
    gcnt AS (SELECT c_mktsegment, band, count(*) AS gn FROM c GROUP BY 1, 2),
    gtot AS (SELECT c_mktsegment, count(*) AS gt FROM c GROUP BY 1),
    acnt AS (SELECT band, count(*) AS an FROM c GROUP BY 1),
    atot AS (SELECT count(*) AS at FROM c),
    fgrid AS (
      SELECT g.c_mktsegment, g.band,
             coalesce(gc.gn, 0) AS gn, coalesce(ac.an, 0) AS an, gt.gt, at.at
      FROM grid g
      LEFT JOIN gcnt gc ON g.c_mktsegment = gc.c_mktsegment AND g.band = gc.band
      LEFT JOIN acnt ac ON g.band = ac.band
      JOIN gtot gt ON g.c_mktsegment = gt.c_mktsegment
      CROSS JOIN atot at),
    cum AS (
      SELECT c_mktsegment, band,
             sum(gn) OVER (PARTITION BY c_mktsegment ORDER BY band
                           ROWS UNBOUNDED PRECEDING) / CAST(gt AS DOUBLE) AS cg,
             sum(an) OVER (PARTITION BY c_mktsegment ORDER BY band
                           ROWS UNBOUNDED PRECEDING) / CAST(at AS DOUBLE) AS ca
      FROM fgrid),
    term AS (
      SELECT c_mktsegment,
             CAST(round(abs(cg - ca) * 1e9) AS BIGINT) AS t
      FROM cum),
    o AS (
      SELECT c_mktsegment, round(sum(t) / 1e9 / 9.0, 6) AS t_value
      FROM term GROUP BY 1)
    SELECT c_mktsegment, t_value, t_value > 0.2 AS violates_t02
    FROM o ORDER BY c_mktsegment
"""


def etl_freshness_slo(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation data-freshness SLO audit: days since each nation's
    last order, measured against the corpus's global max day (the
    as-of point), breach at 30 days — the staleness table every
    ingestion dashboard leads with.  Day arithmetic is exact integer
    epoch-day; the global frontier is a 1-row broadcast."""
    o = t(spark, sf, "orders").select("o_custkey", "o_orderdate")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_nationkey",
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / 86400000)
        .cast("long")
        .alias("day_num"),
    )
    frontier = j.agg(F.max("day_num").alias("asof"))
    per = j.groupBy("c_nationkey").agg(
        F.max("day_num").alias("last_day"), F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per.crossJoin(F.broadcast(frontier))
        .select(
            "c_nationkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.col("last_day") * 86400000).alias("last_day_ms"),
            (F.col("asof") - F.col("last_day")).cast("long").alias("staleness_days"),
            ((F.col("asof") - F.col("last_day")) > 30).alias("slo_breach"),
        )
        .orderBy("c_nationkey")
    )


QUERIES["etl_freshness_slo"] = etl_freshness_slo

ORACLES["etl_freshness_slo"] = """
    WITH j AS (
      SELECT c_nationkey,
             CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) // 86400000
               AS day_num
      FROM orders JOIN customer ON o_custkey = c_custkey),
    f AS (SELECT max(day_num) AS fr_day FROM j),
    per AS (
      SELECT c_nationkey, max(day_num) AS last_day, count(*) AS n_orders
      FROM j GROUP BY 1)
    SELECT c_nationkey, CAST(n_orders AS BIGINT) AS n_orders,
           CAST(last_day * 86400000 AS BIGINT) AS last_day_ms,
           CAST(fr_day - last_day AS BIGINT) AS staleness_days,
           fr_day - last_day > 30 AS slo_breach
    FROM per CROSS JOIN f ORDER BY c_nationkey
"""


def etl_backfill_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Backfill planning: per region, the calendar gaps (missing order
    days) between that region's first and last active day, as ranges —
    the work list an ingestion-recovery job consumes.  Present days
    fold to one row per (region, day); gaps come from one lag window
    over that bounded table; the top-20 longest ranges return."""
    o = t(spark, sf, "orders").select("o_custkey", "o_orderdate")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    days = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_regionkey",
            (F.unix_millis(F.date_trunc("day", "o_orderdate")) / 86400000)
            .cast("long")
            .alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("n_regionkey").orderBy("day_num")
    gaps = (
        days.withColumn("prev", F.lag("day_num").over(w))
        .where(F.col("prev").isNotNull() & (F.col("day_num") - F.col("prev") > 1))
        .select(
            "n_regionkey",
            ((F.col("prev") + 1) * 86400000).alias("gap_start_ms"),
            ((F.col("day_num") - 1) * 86400000).alias("gap_end_ms"),
            (F.col("day_num") - F.col("prev") - 1).cast("long").alias("n_missing_days"),
        )
    )
    return gaps.orderBy(
        F.col("n_missing_days").desc(), "n_regionkey", "gap_start_ms"
    ).limit(20)


QUERIES["etl_backfill_plan"] = etl_backfill_plan

ORACLES["etl_backfill_plan"] = """
    WITH days AS (
      SELECT DISTINCT n_regionkey,
             CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) // 86400000
               AS day_num
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    g AS (
      SELECT n_regionkey, day_num,
             lag(day_num) OVER (PARTITION BY n_regionkey ORDER BY day_num)
               AS prev
      FROM days)
    SELECT n_regionkey,
           CAST((prev + 1) * 86400000 AS BIGINT) AS gap_start_ms,
           CAST((day_num - 1) * 86400000 AS BIGINT) AS gap_end_ms,
           CAST(day_num - prev - 1 AS BIGINT) AS n_missing_days
    FROM g WHERE prev IS NOT NULL AND day_num - prev > 1
    ORDER BY n_missing_days DESC, n_regionkey, gap_start_ms LIMIT 20
"""


# --- final r08 batch: video dup frames, Little's law, Simpson, Gini, color --

VDF_N_DOCS = 10


def _vdf_color(d: int, j: int) -> tuple[int, int, int]:
    # constant across each adjacent pair (j // 2) -> exact duplicates
    g = j // 2
    return ((30 + 17 * d + 40 * g) % 200, (60 + 23 * d + 30 * g) % 200,
            (90 + 31 * d + 20 * g) % 200)


def multimodal_video_dup_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-duplicate-frame rate from REAL MJPEG decode — the
    static-video screen (talking-head/slideshow content dedups to a
    fraction of its frames before the vision encoder sees it).  Frames
    are built in duplicate pairs by construction; equality compares
    decoded pixel sums of CONSECUTIVE sampled frames (identical
    encoder input => identical JPEG => identical decode); the oracle
    recomputes every frame sum through the bitstream-free JPEG
    reference pipeline and runs the same lag compare."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.video import (
        decode_video_frames,
        encode_avi_mjpeg,
    )

    rows = []
    for d in range(VDF_N_DOCS):
        frames = []
        for j in range(6 + d % 4):
            img = np.zeros((8, 8, 3), dtype=np.uint8)
            img[:, :] = _vdf_color(d, j)
            frames.append(img)
        rows.append((d, f"{d}.avi", bytearray(encode_avi_mjpeg(frames, fps=10, quality=80))))
    videos = spark.createDataFrame(
        rows, "doc_id long, file_name string, content binary"
    )
    out = decode_video_frames(
        videos.select("file_name", "content"), every_n=1, max_frames=16,
        normalize=False,
    ).join(videos.select("doc_id", "file_name"), "file_name")
    fsum = F.aggregate(F.col("frame"), F.lit(0.0), lambda a, x: a + x).cast("long")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    per_frame = out.where(F.col("decode_error").isNull()).select(
        "doc_id", "frame_idx", fsum.alias("s")
    )
    lagged = per_frame.withColumn("prev", F.lag("s").over(w))
    return (
        lagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum(
                (F.col("prev").isNotNull() & (F.col("s") == F.col("prev"))).cast(
                    "long"
                )
            ).alias("n_dup_adjacent"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.col("n_dup_adjacent").cast("long").alias("n_dup_adjacent"),
            F.round(F.col("n_dup_adjacent") / (F.col("n_frames") - 1), 6).alias(
                "dup_rate"
            ),
        )
        .orderBy("doc_id")
    )


QUERIES["multimodal_video_dup_frames"] = multimodal_video_dup_frames


def _vdf_oracle() -> str:
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        jpeg_reference_pipeline,
    )

    values = []
    for d in range(VDF_N_DOCS):
        for j in range(6 + d % 4):
            img = np.zeros((8, 8, 3), dtype=np.uint8)
            img[:, :] = _vdf_color(d, j)
            rec = jpeg_reference_pipeline(img, quality=80)
            values.append(f"({d}, {j}, {int(rec.astype(np.int64).sum())})")
    return f"""
        WITH f AS (
          SELECT * FROM (VALUES {", ".join(values)}) t(doc_id, frame_idx, s)),
        l AS (
          SELECT doc_id, s,
                 lag(s) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
          FROM f)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN prev IS NOT NULL AND s = prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_adjacent,
               round(sum(CASE WHEN prev IS NOT NULL AND s = prev
                              THEN 1 ELSE 0 END)
                     / CAST(count(*) - 1 AS DOUBLE), 6) AS dup_rate
        FROM l GROUP BY doc_id ORDER BY doc_id
    """


ORACLES["multimodal_video_dup_frames"] = _vdf_oracle()


def agg_littles_law(spark: SparkSession, sf: str) -> DataFrame:
    """Little's-law operational readout over the open-order intervals
    (placed -> last shipment): arrival rate lambda, mean time-in-system
    W, average load L = lambda*W, and the PEAK concurrency against
    that average (burstiness = how much headroom the pipeline needs
    over steady state).  Every moment is an exact integer day sum; the
    peak rides the same calendar-bounded cumulative sweep as
    ``agg_concurrency_profile``."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    done = (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    iv = o.join(done, o.o_orderkey == done.l_orderkey).select(
        (F.unix_millis(F.date_trunc("day", "o_orderdate")) / 86400000)
        .cast("long")
        .alias("o_day"),
        (F.unix_millis(F.date_trunc("day", "last_ship")) / 86400000)
        .cast("long")
        .alias("c_day"),
    )
    mom = iv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_day") - F.col("o_day")).alias("sdur"),
        F.min("o_day").alias("d0"),
        F.max("c_day").alias("d1"),
    )
    ships = iv.groupBy(F.col("o_day").alias("day")).agg(F.count(F.lit(1)).alias("s"))
    recvs = iv.groupBy(F.col("c_day").alias("day")).agg(F.count(F.lit(1)).alias("r"))
    days = ships.join(recvs, "day", "full").select(
        "day",
        F.coalesce("s", F.lit(0)).alias("s"),
        F.coalesce("r", F.lit(0)).alias("r"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    peak = days.select(
        (F.sum("s").over(w) - F.sum("r").over(w)).alias("tr")
    ).agg(F.max("tr").alias("peak"))
    nd = F.col("n").cast("double")
    span = (F.col("d1") - F.col("d0") + 1).cast("double")
    lam = nd / span
    wd = F.col("sdur") / nd
    return mom.crossJoin(F.broadcast(peak)).select(
        F.col("n").cast("long").alias("n_orders"),
        (F.col("d1") - F.col("d0") + 1).cast("long").alias("span_days"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(wd, 6).alias("w_days"),
        F.round(lam * wd, 6).alias("l_avg"),
        F.col("peak").cast("long").alias("peak_concurrency"),
        F.round(F.col("peak") / (lam * wd), 6).alias("peak_to_avg"),
    )


QUERIES["agg_littles_law"] = agg_littles_law

ORACLES["agg_littles_law"] = """
    WITH iv AS (
      SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) // 86400000
               AS o_day,
             CAST(epoch_ms(date_trunc('day', last_ship)) AS BIGINT) // 86400000
               AS c_day
      FROM orders
      JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY 1) d ON o_orderkey = l_orderkey),
    mom AS (
      SELECT count(*) AS n, sum(c_day - o_day) AS sdur,
             min(o_day) AS d0, max(c_day) AS d1
      FROM iv),
    s AS (SELECT o_day AS day, count(*) AS s FROM iv GROUP BY 1),
    r AS (SELECT c_day AS day, count(*) AS r FROM iv GROUP BY 1),
    days AS (
      SELECT coalesce(s.day, r.day) AS day, coalesce(s.s, 0) AS s,
             coalesce(r.r, 0) AS r
      FROM s FULL JOIN r ON s.day = r.day),
    tr AS (
      SELECT sum(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             - sum(r) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS tr
      FROM days),
    pk AS (SELECT max(tr) AS peak FROM tr)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(d1 - d0 + 1 AS BIGINT) AS span_days,
           round(n / CAST(d1 - d0 + 1 AS DOUBLE), 6) AS lambda_per_day,
           round(sdur / CAST(n AS DOUBLE), 6) AS w_days,
           round((n / CAST(d1 - d0 + 1 AS DOUBLE))
                 * (sdur / CAST(n AS DOUBLE)), 6) AS l_avg,
           CAST(peak AS BIGINT) AS peak_concurrency,
           round(peak / ((n / CAST(d1 - d0 + 1 AS DOUBLE))
                         * (sdur / CAST(n AS DOUBLE))), 6) AS peak_to_avg
    FROM mom CROSS JOIN pk
"""


def agg_simpson_reversal(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson's-paradox screen over the region strata: does the
    pooled exposed-vs-control rate difference (odd custkey, big-order
    outcome) REVERSE sign inside any stratum?  The per-stratum and
    pooled diffs are exact-count ratios; signs compare on the 1e-9
    grid so both engines agree at the boundary."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    o = t(spark, sf, "orders").select(
        "o_custkey",
        (F.col("o_custkey") % 2).alias("exposed"),
        (F.col("o_totalprice") > 150000).cast("long").alias("hit"),
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    strata = j.groupBy("n_regionkey").agg(
        F.sum(F.when(F.col("exposed") == 1, F.col("hit"))).alias("h1"),
        F.sum(F.when(F.col("exposed") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("exposed") == 0, F.col("hit"))).alias("h0"),
        F.sum(F.when(F.col("exposed") == 0, 1).otherwise(0)).alias("n0"),
    )
    pooled = strata.agg(
        F.sum("h1").alias("H1"), F.sum("n1").alias("N1"),
        F.sum("h0").alias("H0"), F.sum("n0").alias("N0"),
    ).select(
        F.round(
            (F.col("H1") / F.col("N1") - F.col("H0") / F.col("N0")) * 1e9
        )
        .cast("long")
        .alias("pdiff9")
    )
    per = strata.select(
        "n_regionkey",
        F.round((F.col("h1") / F.col("n1") - F.col("h0") / F.col("n0")) * 1e9)
        .cast("long")
        .alias("sdiff9"),
    )
    flags = per.crossJoin(F.broadcast(pooled)).select(
        "n_regionkey",
        "sdiff9",
        "pdiff9",
        (F.signum(F.col("sdiff9")) != F.signum(F.col("pdiff9")))
        .cast("long")
        .alias("rev"),
    )
    return flags.agg(
        F.round(F.max("pdiff9") / 1e9, 6).alias("pooled_diff"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("rev").cast("long").alias("n_reversed"),
        (F.sum("rev") > 0).alias("simpson_flag"),
    )


QUERIES["agg_simpson_reversal"] = agg_simpson_reversal

ORACLES["agg_simpson_reversal"] = """
    WITH j AS (
      SELECT n_regionkey, o_custkey % 2 AS exposed,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS hit
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    strata AS (
      SELECT n_regionkey,
             sum(CASE WHEN exposed = 1 THEN hit ELSE 0 END) AS h1,
             sum(CASE WHEN exposed = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN exposed = 0 THEN hit ELSE 0 END) AS h0,
             sum(CASE WHEN exposed = 0 THEN 1 ELSE 0 END) AS n0
      FROM j GROUP BY 1),
    pooled AS (
      SELECT CAST(round((sum(h1) / CAST(sum(n1) AS DOUBLE)
                         - sum(h0) / CAST(sum(n0) AS DOUBLE)) * 1e9) AS BIGINT)
               AS pdiff9
      FROM strata),
    per AS (
      SELECT n_regionkey,
             CAST(round((h1 / CAST(n1 AS DOUBLE)
                         - h0 / CAST(n0 AS DOUBLE)) * 1e9) AS BIGINT) AS sdiff9
      FROM strata),
    flags AS (
      SELECT n_regionkey, sdiff9, pdiff9,
             CASE WHEN sign(sdiff9) <> sign(pdiff9) THEN 1 ELSE 0 END AS rev
      FROM per CROSS JOIN pooled)
    SELECT round(max(pdiff9) / 1e9, 6) AS pooled_diff,
           CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(rev) AS BIGINT) AS n_reversed,
           sum(rev) > 0 AS simpson_flag
    FROM flags
"""


def graph_degree_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of the customer-supplier degree distribution —
    the hub-concentration number next to ``graph_powerlaw_alpha``
    (a load-balancing readout: high Gini = a few customers touch most
    suppliers).  Grouped-data Gini: units inside one degree-value
    group occupy a contiguous rank block, so the rank-weighted sum is
    CLOSED FORM per group (x * (c*r0 + c*(c+1)/2)) and the whole
    statistic folds from the degree-VALUE table with exact BIGINTs."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    deg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dv = deg.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    ranked = dv.withColumn("r0", F.coalesce(F.sum("c").over(w), F.lit(0)))
    a = ranked.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("d") * F.col("c")).alias("tot"),
        F.sum(
            F.col("d")
            * (F.col("c") * F.col("r0") + F.col("c") * (F.col("c") + 1) / 2)
        )
        .cast("long")
        .alias("a"),
    )
    nd, td = F.col("n").cast("double"), F.col("tot").cast("double")
    gini = (2.0 * F.col("a") - (F.col("n") + 1) * td) / (nd * td)
    return a.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.col("tot").cast("long").alias("total_degree"),
        F.round(gini, 6).alias("degree_gini"),
    )


QUERIES["graph_degree_gini"] = graph_degree_gini

ORACLES["graph_degree_gini"] = """
    WITH deg AS (
      SELECT o_custkey, count(*) AS d FROM (
        SELECT DISTINCT o_custkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      GROUP BY 1),
    dv AS (SELECT d, count(*) AS c FROM deg GROUP BY 1),
    ranked AS (
      SELECT d, c,
             coalesce(sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r0
      FROM dv),
    a AS (
      SELECT sum(c) AS n, sum(d * c) AS tot,
             CAST(sum(d * (c * r0 + c * (c + 1) / 2)) AS BIGINT) AS a
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_nodes, CAST(tot AS BIGINT) AS total_degree,
           round((2.0 * a - (n + 1) * tot) / (CAST(n AS DOUBLE) * tot), 6)
             AS degree_gini
    FROM a
"""


DOM_N_DOCS = 18


def multimodal_image_dominant_color(spark: SparkSession, sf: str) -> DataFrame:
    """Dominant gray level and its pixel share from REAL decode — the
    poster-color / background-detection primitive (a one-color-heavy
    image is a logo or a flat, not a photo).  The Arrow stage emits
    exact histograms; the argmax is relational with the smaller-level
    tiebreak; level masses vary per doc so dominance actually moves."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(DOM_N_DOCS):
        h, w = ENT_DIMS[d % len(ENT_DIMS)]
        hw = h * w
        l1, l2, l3 = 30 + d % 25, 110 + d % 35, 190 + d % 45
        n1 = hw * (30 + d % 40) // 100
        n2 = hw * (25 + d % 30) // 100
        flat = np.empty(hw, np.uint8)
        flat[:n1] = l1
        flat[n1 : n1 + n2] = l2
        flat[n1 + n2 :] = l3
        rows.append(
            (d, f"{d}.png", bytearray(encode_png(np.dstack([flat.reshape(h, w)] * 3))))
        )
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, name, content in zip(
                pdf["doc_id"], pdf["entry_name"], pdf["content"]
            ):
                img = _real_decode(name, bytes(content))[:, :, 0]
                counts = np.bincount(img.reshape(-1), minlength=256)
                for level in np.nonzero(counts)[0]:
                    out.append((int(did), int(level), int(counts[level])))
            yield pd.DataFrame(out, columns=["doc_id", "level", "cnt"])

    h_df = entries.mapInPandas(hist, "doc_id long, level long, cnt long")
    tot = h_df.groupBy("doc_id").agg(F.sum("cnt").alias("W"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("level").asc()
    )
    best = (
        h_df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(tot, "doc_id")
    )
    return best.select(
        "doc_id",
        F.col("level").cast("long").alias("dominant_level"),
        F.col("cnt").cast("long").alias("n_px"),
        F.round(F.col("cnt") / F.col("W"), 6).alias("share"),
    ).orderBy("doc_id")


QUERIES["multimodal_image_dominant_color"] = multimodal_image_dominant_color

ORACLES["multimodal_image_dominant_color"] = f"""
    WITH d AS (SELECT unnest(range({DOM_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ENT_DIMS)} {_ENT_DIMS_H} END AS h,
             CASE doc_id % {len(ENT_DIMS)} {_ENT_DIMS_W} END AS w,
             30 + doc_id % 25 AS l1, 110 + doc_id % 35 AS l2,
             190 + doc_id % 45 AS l3
      FROM d),
    hist AS (
      SELECT doc_id, l1 AS level, (h * w) * (30 + doc_id % 40) // 100 AS cnt,
             h * w AS hw
      FROM dims
      UNION ALL
      SELECT doc_id, l2, (h * w) * (25 + doc_id % 30) // 100, h * w FROM dims
      UNION ALL
      SELECT doc_id, l3,
             h * w - (h * w) * (30 + doc_id % 40) // 100
                   - (h * w) * (25 + doc_id % 30) // 100,
             h * w
      FROM dims),
    best AS (
      SELECT doc_id, level, cnt, hw,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, level ASC) AS rn
      FROM hist)
    SELECT doc_id, CAST(level AS BIGINT) AS dominant_level,
           CAST(cnt AS BIGINT) AS n_px,
           round(cnt / CAST(hw AS DOUBLE), 6) AS share
    FROM best WHERE rn = 1 ORDER BY doc_id
"""
