"""Star-schema relational queries (SURVEY section 2.3-2.7 + Stage 2).

The reference has no joins — its image<->metadata pairing is positional
(``train.py:59-64``).  The engine makes joins explicit and exercises the
full relational surface Catalyst provides: broadcast/sort-merge equi
joins, semi/anti, outer+agg, rollup/cube/grouping sets, ranking and
frame windows, set ops, pivot, top-k.

Scale notes: dimension joins (region/nation/customer) broadcast; fact-
fact joins shuffle on the join key with AQE skew splitting; top-k uses
rank-pushdown-friendly window + filter (no global sort of the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t


# --- TPC-H Q1 style pricing summary (grouped agg, 8 aggregates) ----------


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- TPC-H Q3 style: 3-way join + grouped revenue + deterministic top-10 -


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        agg.select(
            "l_orderkey",
            # o_orderdate is TIMESTAMP_NTZ in the parquet; format as a string
            # (tz-free on both engines) instead of epoch math
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_str"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5 style: 6-way join chain, broadcast dims --------------------


def q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf, "nation")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = t(spark, sf, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# --- TPC-H Q6 style: pure filter + agg (pushdown showcase) ---------------


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Single-table filter-aggregate: every predicate pushes to the
    parquet scan (row-group pruning), the agg is one partial/final pair —
    the cheapest possible shape at 100 TB."""
    li = t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
             F.count("*").alias("n_items"))
    )


# --- TPC-H Q17 style: per-key threshold from a self-aggregate ------------


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Lineitems below half their part's average quantity.  The per-part
    averages are a partial/final agg whose output (one row per part) joins
    back shuffle-on-key; no correlated per-row subquery execution."""
    li = t(spark, sf, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    j = li.join(avg_qty, "l_partkey").where(F.col("l_quantity") < F.col("half_avg"))
    return j.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


# --- TPC-H Q4 style: EXISTS decorrelated to a semi-join ------------------


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Orders with at least one late lineitem, counted per priority: the
    EXISTS subquery decorrelates to a left-semi join (shuffle on orderkey,
    no row duplication, no distinct needed), then a tiny grouped count."""
    o = t(spark, sf, "orders")
    late = t(spark, sf, "lineitem").where(F.col("l_shipdate") > F.lit("1996-06-30"))
    sel = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    j = sel.join(late, sel.o_orderkey == late.l_orderkey, "left_semi")
    return j.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- TPC-H Q14 style: conditional aggregation ----------------------------


def q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """Share of revenue from promo-class parts in one month: broadcast
    the part dimension, conditional sum via when() — one scan, one
    broadcast join, one agg."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = t(spark, sf, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_items"),
    )


# --- TPC-H Q13 style: outer join with join-predicate filter + histogram --


def q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution of customers by order count, where the order filter
    lives in the JOIN condition (not WHERE) so zero-order customers
    survive the left outer join.  Two shuffles: outer join on custkey,
    then a tiny count-of-counts agg — the classic double-groupBy shape."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- TPC-H Q19 style: disjunctive multi-clause predicate -----------------


def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue under an OR of three conjunctive brand/size/quantity
    clauses.  The shared ``l_partkey = p_partkey`` equi-condition stays a
    broadcast hash join; the disjunction is a post-join filter Catalyst
    can partially push (common conjuncts factor out), never a
    nested-loop."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# --- TPC-H Q22 style: scalar subquery + anti join ------------------------


def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """Wealthy customers (acctbal above the global positive average — a
    one-row scalar subquery, broadcast) with no *recent* order (anti
    join on custkey), grouped by nation.  Both the scalar stat and the
    grouped output are tiny; the only real shuffle is the anti join."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(F.col("o_orderdate") >= F.lit("1998-06-01"))
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg_bal"))
    rich = c.crossJoin(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("__avg_bal"))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# --- semi / anti joins (EXISTS / NOT EXISTS) -----------------------------


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --- left outer join + per-key agg with null handling --------------------


def join_outer_agg(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
    )


# --- rollup / cube / grouping sets ---------------------------------------


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    path = f"{sf}/lineitem.parquet"
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM parquet.`{path}`
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- distinct aggregates --------------------------------------------------


def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``).  At 100 TB prefer ``approx_percentile``
    (t-digest, single pass, bounded memory); the exact form is the
    correctness anchor."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
    )


def agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ sketch count — engine-specific estimates, so no SQL oracle
    (driver records the weaker rows-only check).  The oracled error-bound
    twin is :func:`agg_approx_bound`."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


APPROX_RSD = 0.05


def agg_approx_bound(spark: SparkSession, sf: str) -> DataFrame:
    """Invariant oracle for the HLL++ sketch: the estimate's value is
    engine-specific, but its CONTRACT — relative error within a few
    standard deviations of the requested rsd — is checkable.  Per group:
    exact distinct count (oracle-recomputable) plus a boolean asserting
    ``|approx - exact| <= 4 * rsd * exact``; the oracle states the bound
    as TRUE, so a driver row turns red if the sketch ever degrades."""
    li = t(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", APPROX_RSD).alias("approx"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    return g.select(
        "l_returnflag",
        F.col("exact_parts").cast("long").alias("exact_parts"),
        (
            F.abs(F.col("approx") - F.col("exact_parts"))
            <= 4 * APPROX_RSD * F.col("exact_parts")
        ).alias("within_bound"),
    )


QAPPROX_ACC = 200


def agg_quantile_bound(spark: SparkSession, sf: str) -> DataFrame:
    """Invariant oracle for the approximate-percentile sketch, same
    pattern as :func:`agg_approx_bound`: the sketch value is
    engine-specific, but percentile_approx's CONTRACT is a rank-error
    guarantee of n/accuracy.  Per group: the exact rank interval of the
    approximate median must intersect [n/2 - n/acc - 1, n/2 + n/acc + 1];
    the oracle states the bound as TRUE plus the (recomputable) group
    size, so a driver row turns red if the sketch ever degrades.

    Two passes: a tiny per-group sketch agg broadcast back onto the
    table, then one exact rank count — the same global-fit-then-apply
    shape as the scalers."""
    li = t(spark, sf, "lineitem")
    fit = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, QAPPROX_ACC).alias("__v"),
        F.count("*").alias("__n"),
    )
    j = li.join(F.broadcast(fit), "l_returnflag")
    ranks = j.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_extendedprice") < F.col("__v"), 1).otherwise(0)).alias(
            "__rank_lo"
        ),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("__v"), 1).otherwise(0)).alias(
            "__rank_hi"
        ),
        F.max("__n").alias("__n"),
    )
    eps = F.col("__n") / QAPPROX_ACC + 1
    return ranks.select(
        "l_returnflag",
        F.col("__n").cast("long").alias("n_rows"),
        (
            (F.col("__rank_lo") <= 0.5 * F.col("__n") + eps)
            & (F.col("__rank_hi") >= 0.5 * F.col("__n") - eps)
        ).alias("within_bound"),
    )


def agg_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation and sample
    covariance of quantity vs extended price — single-pass partial
    aggregation like every moment statistic here; rounded to 4 on both
    engines (the same tolerance class agg_stats' stddev has survived
    three testdata regenerations with)."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.count("*").alias("n"),
    )


def window_cume_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-position windows (cume_dist + percent_rank per
    return flag) — the remaining members of the ranking-window family.
    Both are peer-group semantics, identical across engines; rounded to
    6 so the doubles compare exactly.  Orderkey-sampled so the output
    stays driver-collectable."""
    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


def agg_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group mode (most frequent value) with a deterministic value
    tiebreak: count sub-aggregate + max_by over a (count, value) struct —
    two partial-aggregated shuffles, no window over the raw data.  The
    classic 'most common ship mode per flag' style statistic."""
    li = t(spark, sf, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("__n")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.max(F.struct(F.col("__n"), F.col("l_linestatus"))).alias("__best")
        )
        .select(
            "l_returnflag",
            F.col("__best.l_linestatus").alias("mode_linestatus"),
            F.col("__best.__n").cast("long").alias("mode_count"),
        )
    )


# --- descriptive stats (A2/A3 fit statistics as a query) -----------------


def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.count("*").alias("n"),
    )


# --- windows: ranking, top-k per group, lag/lead, running frames ---------


def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


def window_rank_dense(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


def window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Time-range rolling aggregate (hypertable-rollup shape): per user,
    the sum/count of events in the trailing hour, as a RANGE frame over
    event time.  One shuffle on user_id; frame scan is incremental per
    partition."""
    e = t(spark, sf, "events").withColumn("ts_us", F.unix_micros("ts"))
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_1h"),
    )


# --- global deterministic top-k ------------------------------------------


def sort_topk(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# --- set operations -------------------------------------------------------


def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def set_except(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT (set semantics — distinct first, then subtract): nations
    with positive-balance customers but no negative-balance supplier."""
    c = (
        t(spark, sf, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = (
        t(spark, sf, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    return c.exceptAll(s)


def set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics): per nationkey,
    min(customer multiplicity, supplier multiplicity) copies survive —
    the bag-algebra member the distinct-set ops don't cover.  Plans as
    one aggregation per side + a join, never a row-pairing blowup."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


def set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL (multiset): customer-side multiplicity minus
    supplier-side multiplicity, clamped at zero, per nationkey."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


# --- TPC-H Q7 style: bilateral nation trade volume ------------------------


def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Five-way join (lineitem-orders-customer-supplier-nation x2) with
    a symmetric nation-pair predicate.  Both nation dims broadcast; the
    two fact-side joins shuffle on their keys with AQE skew handling —
    the canonical multi-join shape at 100 TB."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- TPC-H Q10 style: returned-item customer ranking ----------------------


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Top customers by revenue lost to returns: fact joins shuffle on
    keys, nation broadcast, deterministic top-k tiebreak on custkey."""
    li = t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


# --- TPC-H Q18 style: large-volume orders ---------------------------------


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold: the per-order
    quantity sum is a partial/final agg whose survivors (few) semi-join
    restrict the fact scan — never a correlated per-row subquery."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    j = (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        # year() on TIMESTAMP_NTZ is session-timezone-free (an epoch-ms
        # conversion here would shift under the driver's vanilla session)
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("sum_qty", 2).alias("sum_qty"),
    )


# --- TPC-H Q8 style: national market share --------------------------------


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier-nation market share within a region per year: the share
    is a conditional-sum / sum ratio inside one grouped agg — no second
    pass over the join; dims broadcast, one fact shuffle per join key."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    p = t(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    n_c = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_rk")
    )
    r = t(spark, sf, "region").where(F.col("r_name") == "EUROPE").select("r_regionkey")
    n_s = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
    )


# --- TPC-H Q15 style: top supplier by revenue ------------------------------


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers achieving the maximum revenue: revenue per supplier is
    one partial/final agg; the max is a 1-row broadcast joined back —
    the view + subquery of the original, as two aggs and zero windows."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == mx.mr).select(
        "l_suppkey", "total_revenue"
    )
    s = t(spark, sf, "supplier")
    return top.join(s, top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --- TPC-H Q2 style: min-cost supplier per part ---------------------------
#
# The driver's star schema has no partsupp table, so lineitem serves as
# the part-supplier offer relation and the lowest observed
# l_extendedprice per part stands in for min(ps_supplycost).  Same
# decorrelation shape as the original: per-group min + equality
# join-back instead of a correlated subquery per part.


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """min is order-insensitive over raw parquet doubles, so the
    join-back equality is bit-exact cross-engine (no rounding needed —
    unlike avg/sum, min never depends on accumulation order)."""
    p = (
        t(spark, sf, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_brand")
    )
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    offers = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    mn = offers.groupBy("p_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    best = (
        offers.join(
            mn.withColumnRenamed("p_partkey", "mk"),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("p_partkey", "p_brand", "l_suppkey", "min_price")
        .distinct()
    )
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("p_partkey", "p_brand", "s_name", "n_name", "min_price", "s_acctbal")
    )


# --- TPC-H Q9 style: product-type profit by nation and year ---------------
#
# No ps_supplycost in the test data; cost is proxied as
# 0.1 * p_retailprice * l_quantity.  The join tree and the
# groupBy(nation, year) rollup are the original's.


def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        t(spark, sf, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(
        F.round(F.sum(profit), 2).alias("sum_profit"),
        F.count("*").alias("n_items"),
    )


# --- TPC-H Q11 style: important parts by value share ----------------------
#
# No partsupp: part value is sum(l_extendedprice * l_quantity) over
# lineitems supplied from one nation.  The original's HAVING-over-scalar-
# subquery becomes a 1-row broadcast threshold crossJoin — the fact table
# is scanned twice but shuffled only on l_partkey.


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf, "nation").where(F.col("n_name") == "NATION_7")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    contrib = li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey)
    value = contrib.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
    )
    threshold = value.agg((F.sum("part_value") * 0.001).alias("cutoff"))
    return (
        value.crossJoin(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


# --- TPC-H Q16 style: supplier counts per part descriptor -----------------
#
# No partsupp: the distinct (l_partkey, l_suppkey) pairs from lineitem
# are the supplies relation; suppliers with negative account balance
# stand in for the original's complaints-comment exclusion (anti-join).


def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    pairs = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 20)
    )
    bad = t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    j = pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey).join(
        F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


# --- TPC-H Q12 style: late-shipment counts by priority class --------------
#
# The test schema has no l_shipmode / l_commitdate / l_receiptdate, so
# lateness is the order-to-ship delay (l_shipdate vs o_orderdate; median
# delay in the generated data is ~35 days) bucketed into delay classes,
# which also stand in for the original's ship-mode grouping.  The
# high/low priority split is the original's CASE-sum pivot verbatim.
# Instant comparisons against o_orderdate + INTERVAL avoid any
# date-truncation semantics difference between engines.


def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    bucket = (
        F.when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "FAST")
        .when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "NORMAL")
        .otherwise("LATE")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("delay_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


# --- TPC-H Q20 style: dominant suppliers of selected parts ----------------
#
# No partsupp/ps_availqty: the supplies relation is lineitem's
# (part, supplier) shipped volume, and a supplier "dominates" a part
# when their shipped quantity exceeds twice the part's mean
# per-supplier quantity — the original's availqty > 0.5 * sum(qty)
# excess-stock threshold re-expressed over observable data (and stable
# as supplier counts grow, unlike an absolute share cut).  Same shape:
# per-part aggregate, threshold semi-join, supplier/nation join.
# The comparison multiplies exact integer-ish sums cross-wise
# (pair_qty * n_supp > 2 * part_qty) — no division, so engine parity
# can't hinge on float quotients.


def q20_dominant_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part").where(F.col("p_name").like("%red%")).select("p_partkey")
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    red = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pair = red.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("pair_qty"))
    tot = pair.groupBy("l_partkey").agg(
        F.sum("pair_qty").alias("part_qty"), F.count("*").alias("n_supp")
    )
    dominant = (
        pair.join(tot, "l_partkey")
        .where(F.col("pair_qty") * F.col("n_supp") > 2.0 * F.col("part_qty"))
        .select("l_suppkey", "l_partkey")
    )
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    counts = dominant.groupBy("l_suppkey").agg(F.count("*").alias("n_dominated_parts"))
    return (
        counts.join(s, counts.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"), "n_dominated_parts")
    )


# --- TPC-H Q21 style: suppliers who alone held up multi-supplier orders ---
#
# No l_commitdate/l_receiptdate: "kept the order waiting" is shipping
# more than 60 days after the order date.  The original's double
# EXISTS/NOT EXISTS correlation (another supplier in the order; no
# other LATE supplier in the order) collapses into one per-order
# aggregate — distinct suppliers vs distinct late suppliers — then a
# join back to the unique late supplier.  One shuffle on the order key,
# one on the supplier key; no correlated per-row subqueries.


def q21_waiting_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
        F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    blocking = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("late_supp")
    s = t(spark, sf, "supplier")
    return (
        blocking.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(s, F.col("late_supp") == s.s_suppkey)
        .select("s_name", "numwait")
    )


# --- pivot ----------------------------------------------------------------


def pivot_status(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).sum("l_quantity")
    return p.select(
        "l_returnflag",
        F.round(F.col("O"), 2).alias("qty_open"),
        F.round(F.col("F"), 2).alias("qty_finished"),
    )


def agg_skewsafe_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-group distinct counts via the skew-safe two-shuffle
    formulation (operators/skew.skewsafe_count_distinct): dedupe on
    (group, value) first — spread by the value dimension — then count;
    a hot group's value set never lands on one reducer."""
    from image_matadata_batchprocessing_aws_spark.operators.skew import (
        skewsafe_count_distinct,
    )

    li = t(spark, sf, "lineitem")
    return skewsafe_count_distinct(li, ["l_returnflag"], "l_suppkey")


QUERIES = {
    "agg_skewsafe_distinct": agg_skewsafe_distinct,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_share": q14_promo_share,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_orders": q18_large_orders,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q12_late_shipments": q12_late_shipments,
    "q20_dominant_part_suppliers": q20_dominant_part_suppliers,
    "q21_waiting_orders": q21_waiting_orders,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer_agg": join_outer_agg,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_distinct": agg_distinct,
    "agg_percentiles": agg_percentiles,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_bound": agg_approx_bound,
    "agg_quantile_bound": agg_quantile_bound,
    "agg_mode": agg_mode,
    "agg_stats": agg_stats,
    "agg_corr": agg_corr,
    "window_cume_dist": window_cume_dist,
    "window_topk_per_group": window_topk_per_group,
    "window_rank_dense": window_rank_dense,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "window_range_frame": window_range_frame,
    "sort_topk": sort_topk,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
    "set_except_all": set_except_all,
    "pivot_status": pivot_status,
}

ORACLES = {
    "agg_approx_bound": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_skewsafe_distinct": """
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_distinct_l_suppkey
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_quantile_bound": """
        SELECT l_returnflag, count(*) AS n_rows, TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_corr": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "window_cume_dist": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               round(cume_dist() OVER w, 6) AS cd,
               round(percent_rank() OVER w, 6) AS pr
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
    "agg_mode": """
        WITH c AS (SELECT l_returnflag, l_linestatus, count(*) AS n
                   FROM lineitem GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                         ORDER BY n DESC, l_linestatus DESC) AS rn
              FROM c)
        SELECT l_returnflag, l_linestatus AS mode_linestatus,
               CAST(n AS BIGINT) AS mode_count
        FROM r WHERE rn = 1
    """,
    "q12_late_shipments": """
        SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
                    WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
                    ELSE 'LATE' END AS delay_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q20_dominant_part_suppliers": """
        WITH red AS (
          SELECT l_partkey, l_suppkey, l_quantity
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%red%'),
        pair AS (
          SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
          FROM red GROUP BY 1, 2),
        tot AS (
          SELECT l_partkey, sum(pair_qty) AS part_qty, count(*) AS n_supp
          FROM pair GROUP BY 1),
        dominant AS (
          SELECT l_suppkey, pair.l_partkey
          FROM pair JOIN tot ON pair.l_partkey = tot.l_partkey
          WHERE pair_qty * n_supp > 2.0 * part_qty),
        counts AS (
          SELECT l_suppkey, count(*) AS n_dominated_parts
          FROM dominant GROUP BY 1)
        SELECT s_name, n_name AS nation,
               CAST(n_dominated_parts AS BIGINT) AS n_dominated_parts
        FROM counts
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
    """,
    "q21_waiting_orders": """
        WITH j AS (
          SELECT l_orderkey, l_suppkey,
                 (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp,
                 min(CASE WHEN late THEN l_suppkey END) AS late_supp
          FROM j GROUP BY 1),
        blocking AS (
          SELECT late_supp FROM per_order
          WHERE n_supp > 1 AND n_late_supp = 1)
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM blocking JOIN supplier ON late_supp = s_suppkey
        GROUP BY s_name
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
          SELECT p_partkey, p_brand, l_suppkey, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size <= 15 AND p_type = 'SMALL'),
        mn AS (
          SELECT p_partkey AS mk, min(l_extendedprice) AS min_price
          FROM offers GROUP BY 1),
        best AS (
          SELECT DISTINCT p_partkey, p_brand, l_suppkey, min_price
          FROM offers JOIN mn
            ON p_partkey = mk AND l_extendedprice = min_price)
        SELECT p_partkey, p_brand, s_name, n_name, min_price, s_acctbal
        FROM best
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
    """,
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.1), 2) AS sum_profit,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": """
        WITH contrib AS (
          SELECT l_partkey, l_extendedprice * l_quantity AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'),
        value AS (
          SELECT l_partkey, sum(v) AS part_value FROM contrib GROUP BY 1)
        SELECT l_partkey, round(part_value, 2) AS part_value
        FROM value
        WHERE part_value > (SELECT sum(part_value) * 0.001 FROM value)
    """,
    "q16_supplier_part_counts": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 20
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q7_nation_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        SELECT c_custkey, c_name, o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q8_market_share": """
        WITH j AS (
          SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS vol,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
            AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01')
        SELECT CAST(o_year AS BIGINT) AS o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0.0 END)
                     / sum(vol), 4) AS mkt_share,
               count(*) AS n_items
        FROM j GROUP BY 1
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l.l_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > TIMESTAMP '1996-06-30')
        GROUP BY o_orderpriority
    """,
    "q14_promo_share": """
        SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0.0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q17_small_quantity_revenue": """
        WITH a AS (SELECT l_partkey, avg(l_quantity) * 0.5 AS half_avg
                   FROM lineitem GROUP BY l_partkey)
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
        WHERE l.l_quantity < a.half_avg
    """,
    "q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
        GROUP BY c_count
    """,
    "q19_disjunctive_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '1998-06-01')
        GROUP BY c_nationkey
    """,
    "q5_region_revenue": """
        SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_outer_agg": """
        SELECT c.c_custkey,
               count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """,
    "agg_rollup": """
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": """
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "agg_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_stats": """
        SELECT round(avg(l_quantity), 4) AS avg_qty,
               round(stddev_samp(l_quantity), 4) AS std_qty,
               round(min(l_quantity), 2) AS min_qty,
               round(max(l_quantity), 2) AS max_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(stddev_samp(l_extendedprice), 4) AS std_price,
               count(*) AS n
        FROM lineitem
    """,
    "window_topk_per_group": """
        WITH r AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 3
    """,
    "window_rank_dense": """
        SELECT o_orderkey, o_orderpriority,
               CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
        FROM orders
    """,
    "window_lag_lead": """
        SELECT event_id, user_id,
               lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
               lead(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
        FROM events
    """,
    "window_running_sum": """
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        FROM events
    """,
    "window_range_frame": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_events_1h,
               round(sum(value) OVER w, 2) AS sum_value_1h
        FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "sort_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_except": """
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
    """,
    "set_intersect_all": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_except_all": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "pivot_status": """
        SELECT l_returnflag,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_finished
        FROM lineitem GROUP BY l_returnflag
    """,
}


def sql_api_q1(spark: SparkSession, sf: str) -> DataFrame:
    """API-parity proof: TPC-H Q1 written as PLAIN SQL through
    ``spark.sql`` over registered temp views — same Catalyst planner,
    same plan, same answer as the DataFrame formulation
    (q1_pricing_summary).  The oracle is intentionally the identical SQL
    text run on DuckDB: one query string, three engines' worth of
    agreement (Spark SQL, Spark DataFrame, DuckDB)."""
    from image_matadata_batchprocessing_aws_spark.sources.tables import register_views

    register_views(spark, sf)
    return spark.sql(_SQL_API_Q1)


_SQL_API_Q1 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""

QUERIES["sql_api_q1"] = sql_api_q1
ORACLES["sql_api_q1"] = _SQL_API_Q1


def window_nth_value(spark: SparkSession, sf: str) -> DataFrame:
    """The value-picking window functions (first_value / nth_value /
    last_value over the full partition frame) — per user: first, third
    and last event value in time order, attached to every event row.
    Deterministic order via the (ts, event_id) composite; one shuffle on
    the key."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(wf), 2).alias("first_v"),
        F.round(F.nth_value("value", 3).over(wf), 2).alias("third_v"),
        F.round(F.last("value").over(wf), 2).alias("last_v"),
    )


QUERIES["window_nth_value"] = window_nth_value
ORACLES["window_nth_value"] = """
    SELECT event_id, user_id,
           round(first_value(value) OVER w, 2) AS first_v,
           round(nth_value(value, 3) OVER w, 2) AS third_v,
           round(last_value(value) OVER w, 2) AS last_v
    FROM events WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def window_topk_ties(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k WITH TIES (rank() <= k, the SQL 'FETCH FIRST k ROWS WITH
    TIES' semantics) — boundary ties survive, unlike the row_number
    top-k (window_topk_per_group), and the result size is data-dependent
    by design.  Per return flag: every lineitem tying into the top-3
    quantities."""
    li = t(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return (
        li.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("quantity"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


QUERIES["window_topk_ties"] = window_topk_ties
ORACLES["window_topk_ties"] = """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round(l_quantity, 2) AS quantity,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, rank() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_quantity DESC) AS rnk
          FROM lineitem)
    WHERE rnk <= 3
"""


def window_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running COUNT DISTINCT over an expanding window — which neither
    engine supports natively (DISTINCT is banned in window aggregates) —
    via the scalable reformulation: flag each (user, event_type) pair's
    FIRST occurrence with a keyed row_number, then a running sum of the
    flags in event-time order.  Two keyed windows, no quadratic
    re-scan of the frame per row."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = e.withColumn(
        "__new", (F.row_number().over(w_first) == 1).cast("int")
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("__new").over(w_run).cast("long").alias("n_distinct_types_seen"),
    )


QUERIES["window_running_distinct"] = window_running_distinct
ORACLES["window_running_distinct"] = """
    WITH f AS (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS nw
      FROM events WHERE user_id IS NOT NULL)
    SELECT event_id, user_id,
           CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_distinct_types_seen
    FROM f
"""
