"""Statistical model-fitting aggregates (extends SURVEY section 2.4).

The reference's only model fitting is the scikit-learn / torch training
step downstream of the ETL (``train.py:124-141``); these operators are
the aggregation-pushdown versions of the model-prep statistics an LLM /
analytics pipeline computes IN the engine instead of in driver Python:
grouped least-squares fits and percentile-clip (winsorize) outlier
handling.

Cross-engine determinism follows the ``zscore_scale_exact`` playbook
(``operators/scale.py``): quantize inputs to scaled BIGINTs, accumulate
the sufficient statistics as EXACT integer sums (associative, so
partition order / parallelism cannot change a bit), then reconstruct the
fit in double precision with the identical scalar op sequence on both
engines.  Products that can overflow int64 split into high/low 30-bit
halves (``shiftright`` / bitmask) summed separately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TWO30 = 1073741824  # 2^30


def _scaled(col: str, digits: int) -> Column:
    return F.round(F.col(f"`{col}`") * F.lit(float(10**digits))).cast("long")


def _hi(prod: Column) -> Column:
    return F.sum(F.shiftright(prod, 30))


def _lo(prod: Column) -> Column:
    return F.sum(prod.bitwiseAND(F.lit(TWO30 - 1)))


def _recombine(hi: str, lo: str, descale: float) -> Column:
    return (
        F.col(hi).cast("double") * F.lit(float(TWO30)) + F.col(lo).cast("double")
    ) / F.lit(descale)


def grouped_regression(
    df: DataFrame,
    group_by: list[str],
    x: str,
    y: str,
    x_digits: int = 2,
    y_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y = slope*x +
    intercept`` with the coefficient of determination ``r2`` — the
    engine-side replacement for collect-then-sklearn model prep.

    One shuffle (the groupBy), map-side partial aggregation of six
    integer sums; the closed-form solve is a scalar epilogue:

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        r2    = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Sum-of-products overflow: |x_scaled| <= X, |y_scaled| <= Y requires
    ``X*Y*rows_per_group < 2^63`` for Sxy; Sxx/Syy ride the hi/lo
    30-bit split so only the per-row square must fit int64 (|v| < 2^31
    after scaling).  ANSI mode overflows loudly, never silently.

    At 100 TB the shape is unchanged: integer partial aggregates are
    the cheapest distributive aggregate Spark has, and the group count
    (not the row count) bounds the result.  The formula reconstruction
    happens in double on the final 1-row-per-group frame.
    """
    xs, ys = _scaled(x, x_digits), _scaled(y, y_digits)
    agg = df.groupBy(*group_by).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xs).alias("__sx"),
        F.sum(ys).alias("__sy"),
        F.sum(xs * ys).alias("__sxy"),
        _hi(xs * xs).alias("__sxx_hi"),
        _lo(xs * xs).alias("__sxx_lo"),
        _hi(ys * ys).alias("__syy_hi"),
        _lo(ys * ys).alias("__syy_lo"),
    )
    xd, yd = float(10**x_digits), float(10**y_digits)
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double") / F.lit(xd)
    sy = F.col("__sy").cast("double") / F.lit(yd)
    sxy = F.col("__sxy").cast("double") / F.lit(xd * yd)
    sxx = _recombine("__sxx_hi", "__sxx_lo", xd * xd)
    syy = _recombine("__syy_hi", "__syy_lo", yd * yd)
    cov_n = n * sxy - sx * sy  # n^2 * covariance
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    # zero-variance guards: a group whose x (or y) is constant has no
    # defined slope/r2 — emit NULL instead of silent Infinity/NaN from
    # double division (mirrored in grouped_regression_sql)
    slope = F.when(var_x_n != 0, cov_n / var_x_n)
    return agg.select(
        *group_by,
        F.col("__n").alias("n"),
        F.round(slope, round_digits).alias("slope"),
        F.round((sy - slope * sx) / n, round_digits).alias("intercept"),
        F.round(
            F.when(
                (var_x_n != 0) & (var_y_n != 0),
                cov_n * cov_n / (var_x_n * var_y_n),
            ),
            round_digits,
        ).alias("r2"),
    )


def grouped_regression_sql(
    table: str,
    group_by: str,
    x: str,
    y: str,
    x_digits: int = 2,
    y_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`grouped_regression` — the same scaled-long
    sufficient statistics and the same double reconstruction sequence,
    NOT DuckDB's built-in ``regr_slope`` (whose double accumulation
    order need not match Spark's)."""
    xd, yd = float(10**x_digits), float(10**y_digits)
    return f"""
        WITH s AS (
          SELECT {group_by},
                 CAST(round({x} * {xd}) AS BIGINT) AS xs,
                 CAST(round({y} * {yd}) AS BIGINT) AS ys
          FROM {table}),
        a AS (
          SELECT {group_by},
                 count(*) AS n,
                 sum(xs) AS sxr, sum(ys) AS syr, sum(xs * ys) AS sxyr,
                 sum(xs * xs // 1073741824) AS sxx_hi,
                 sum(xs * xs % 1073741824) AS sxx_lo,
                 sum(ys * ys // 1073741824) AS syy_hi,
                 sum(ys * ys % 1073741824) AS syy_lo
          FROM s GROUP BY {group_by}),
        r AS (
          SELECT {group_by}, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(sxr AS DOUBLE) / {xd} AS sx,
                 CAST(syr AS DOUBLE) / {yd} AS sy,
                 CAST(sxyr AS DOUBLE) / {xd * yd} AS sxy,
                 (CAST(sxx_hi AS DOUBLE) * 1073741824.0 + CAST(sxx_lo AS DOUBLE))
                   / {xd * xd} AS sxx,
                 (CAST(syy_hi AS DOUBLE) * 1073741824.0 + CAST(syy_lo AS DOUBLE))
                   / {yd * yd} AS syy
          FROM a)
        SELECT {group_by}, n,
               round(CASE WHEN nd * sxx - sx * sx <> 0 THEN
                     (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END,
                     {round_digits}) AS slope,
               round((sy - (CASE WHEN nd * sxx - sx * sx <> 0 THEN
                     (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END) * sx)
                     / nd, {round_digits}) AS intercept,
               round(CASE WHEN nd * sxx - sx * sx <> 0
                          AND nd * syy - sy * sy <> 0 THEN
                     (nd * sxy - sx * sy) * (nd * sxy - sx * sy)
                     / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) END,
                     {round_digits}) AS r2
        FROM r
    """


def winsorize(
    df: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    suffix: str = "",
) -> DataFrame:
    """Percentile clipping (winsorization): values below the ``lower``
    quantile or above the ``upper`` quantile snap to the boundary —
    the standard heavy-tail tamer applied before scaling/fitting, and
    the global-fit counterpart of the reference's ad-hoc outlier drops.

    Two passes like every scaler in :mod:`operators.scale`: pass 1 is
    one tiny aggregate row of EXACT interpolated percentiles (matches
    DuckDB ``quantile_cont`` bit-for-bit), broadcast via a literal
    crossJoin; pass 2 is a map-side ``least``/``greatest`` — no
    shuffle.  At 100 TB swap ``percentile`` for ``percentile_approx``
    (same two-pass shape, documented rank-error bound).

    NULL inputs stay NULL: Spark's ``greatest``/``least`` skip nulls
    (``greatest(NULL, lo) = lo``), which would silently impute missing
    values to the lower bound — clipping is gated on ``isNotNull`` so
    winsorization never doubles as imputation (pandas/scipy ``clip``
    semantics)."""
    stats = df.agg(
        *[F.percentile(F.col(f"`{c}`"), F.lit(lower)).alias(f"__lo_{c}") for c in cols],
        *[F.percentile(F.col(f"`{c}`"), F.lit(upper)).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        clipped = F.least(
            F.greatest(F.col(f"`{c}`"), F.col(f"__lo_{c}")), F.col(f"__hi_{c}")
        )
        out = out.withColumn(
            c + suffix, F.when(F.col(f"`{c}`").isNotNull(), clipped)
        )
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def histogram_drift(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
    n_bins: int = 10,
) -> DataFrame:
    """Distribution-drift report between a reference window and a
    current window — the data-quality monitor a production feature
    pipeline runs on every ingest.  Per feature: total-variation
    distance ``TV = 0.5 * sum_bins |p_i - q_i|`` over an equal-frequency
    histogram whose BOUNDARIES COME FROM THE REFERENCE period (current
    data is binned against the baseline's deciles, the standard drift
    convention; categorical features bin by value).

    TV instead of PSI/KL on purpose: those need ln(), whose last ulp
    differs across engines and would make the metric
    parallelism-dependent.  TV reduces to EXACT integer arithmetic —
    ``|rc_i * Nc - cc_i * Nr|`` summed as BIGINTs (associative), one
    double division at the end — and is a bounded [0, 1] metric with the
    same "how much did the histogram move" reading.  Requires
    ``count * count < 2^63`` (fine to ~3e9 rows per side; shard the
    windows or sample above that).

    Plan shape: per numeric feature one tiny REF-side percentile row
    (broadcast), then ONE conditional-count groupBy over the unioned
    windows (map-side partials, <= n_bins groups); the TV fold runs on
    the n_bins-row table.  Nothing data-sized ever shuffles."""
    tagged = ref.withColumn("__is_ref", F.lit(True)).unionByName(
        cur.withColumn("__is_ref", F.lit(False))
    )
    outs = []
    for c in numeric_cols:
        qs = [i / n_bins for i in range(1, n_bins)]
        bounds = ref.agg(
            *[
                F.percentile(F.col(f"`{c}`"), F.lit(q)).alias(f"__q{i}")
                for i, q in enumerate(qs)
            ]
        )
        b = tagged.where(F.col(f"`{c}`").isNotNull()).crossJoin(F.broadcast(bounds))
        bin_idx = None
        for i in range(len(qs)):
            above = (F.col(f"`{c}`") > F.col(f"__q{i}")).cast("int")
            bin_idx = above if bin_idx is None else bin_idx + above
        outs.append(
            _tv_fold(
                b.select(bin_idx.alias("__bin"), "__is_ref")
                .groupBy("__bin")
                .agg(*_cond_counts()),
                c,
            )
        )
    for c in categorical_cols:
        b = tagged.select(
            F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("__null__")).alias("__bin"),
            "__is_ref",
        )
        outs.append(_tv_fold(b.groupBy("__bin").agg(*_cond_counts()), c))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def _cond_counts():
    return [
        F.coalesce(F.sum(F.when(F.col("__is_ref"), 1)), F.lit(0)).cast("long").alias("__rc"),
        F.coalesce(F.sum(F.when(~F.col("__is_ref"), 1)), F.lit(0)).cast("long").alias("__cc"),
    ]


def _tv_fold(counts: DataFrame, feature: str) -> DataFrame:
    """(bin, rc, cc) -> one (feature, n_ref, n_cur, tv) row via the
    exact-integer cross-product formula."""
    totals = counts.agg(
        F.sum("__rc").cast("long").alias("__nr"), F.sum("__cc").cast("long").alias("__nc")
    )
    folded = (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(
                F.abs(F.col("__rc") * F.col("__nc") - F.col("__cc") * F.col("__nr"))
            ).alias("__num"),
            F.first("__nr").alias("__nr"),
            F.first("__nc").alias("__nc"),
        )
    )
    return folded.select(
        F.lit(feature).alias("feature"),
        F.col("__nr").alias("n_ref"),
        F.col("__nc").alias("n_cur"),
        F.round(
            F.col("__num").cast("double")
            / (F.lit(2.0) * F.col("__nr").cast("double") * F.col("__nc").cast("double")),
            6,
        ).alias("tv"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson correlation for EVERY pair of ``cols`` from ONE
    single-row aggregate — d columns cost one scan with d + d(d+1)/2
    map-side integer partial sums (count, per-column sums, hi/lo-split
    pairwise products including squares), not d² scans; pair rows unfold
    from the 1-row result with an explode of literal structs.

    Same determinism contract as :func:`grouped_regression`: scaled
    BIGINTs, hi/lo 30-bit product sums, double reconstruction in one
    fixed scalar sequence.  Requires NON-NEGATIVE values (shiftright/
    bitmask splitting is unsigned-style; shift negative columns to a
    baseline first) and per-row products inside int64
    (``(max|x| * 10^digits)^2 < 2^63``)."""
    xs = {c: _scaled(c, digits) for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(xs[c]).alias(f"__s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            prod = xs[a] * xs[b]
            aggs.append(_hi(prod).alias(f"__p_{a}__{b}_hi"))
            aggs.append(_lo(prod).alias(f"__p_{a}__{b}_lo"))
    row = df.agg(*aggs)
    scale = float(10**digits)
    n = F.col("__n").cast("double")

    def s(c):
        return F.col(f"__s_{c}").cast("double") / F.lit(scale)

    def p(a, b):
        return _recombine(f"__p_{a}__{b}_hi", f"__p_{a}__{b}_lo", scale * scale)

    structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            corr = (n * p(a, b) - s(a) * s(b)) / F.sqrt(
                (n * p(a, a) - s(a) * s(a)) * (n * p(b, b) - s(b) * s(b))
            )
            structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(corr, round_digits).alias("corr"),
                )
            )
    return row.select(
        F.col("__n").cast("long").alias("n"), F.explode(F.array(*structs)).alias("__p")
    ).select("__p.col_a", "__p.col_b", "n", "__p.corr")


def correlation_matrix_sql(
    table: str, cols: list[str], digits: int = 2, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`correlation_matrix` — the same scaled-long
    hi/lo sums and reconstruction, NOT the built-in corr()."""
    scale = float(10**digits)
    sel = [f"CAST(round({c} * {scale}) AS BIGINT) AS x_{c}" for c in cols]
    aggs = ["count(*) AS n"] + [f"sum(x_{c}) AS s_{c}" for c in cols]
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(f"sum(x_{a} * x_{b} // 1073741824) AS p_{a}_{b}_hi")
            aggs.append(f"sum(x_{a} * x_{b} % 1073741824) AS p_{a}_{b}_lo")

    def s(c):
        return f"(CAST(s_{c} AS DOUBLE) / {scale})"

    def p(a, b):
        return (
            f"((CAST(p_{a}_{b}_hi AS DOUBLE) * 1073741824.0"
            f" + CAST(p_{a}_{b}_lo AS DOUBLE)) / {scale * scale})"
        )

    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            corr = (
                f"round((nd * {p(a, b)} - {s(a)} * {s(b)})"
                f" / sqrt((nd * {p(a, a)} - {s(a)} * {s(a)})"
                f" * (nd * {p(b, b)} - {s(b)} * {s(b)})), {round_digits})"
            )
            rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n,"
                f" {corr} AS corr FROM a"
            )
    union = "\n        UNION ALL\n        ".join(rows)
    return f"""
        WITH sc AS (SELECT {", ".join(sel)} FROM {table}),
        a AS (SELECT {", ".join(aggs)}, CAST(count(*) AS DOUBLE) AS nd FROM sc)
        {union}
    """


def grouped_spearman(
    df: DataFrame,
    group_by: list[str],
    x: str,
    y: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group SPEARMAN rank correlation — the monotone-relationship
    detector Pearson misses — computed EXACTLY: average-tie ranks are
    carried as doubled integers (2*avg_rank = 2*min_rank + ties - 1,
    always integral), and the Pearson fold over those rank integers uses
    the same hi/lo-split exact sums as :func:`grouped_regression`.  No
    floats until the final reconstruction, so the coefficient is
    bit-identical on any engine/partitioning.

    Shape: two keyed rank windows (one per variable) + one grouped
    integer aggregate.  Doubled ranks are <= 2n per group; the hi/lo
    split keeps sums of their squares exact to ~2^31 rows per group."""
    from pyspark.sql import Window

    def ranked2(col: str, alias: str):
        w = Window.partitionBy(*group_by).orderBy(col)
        min_rank = F.rank().over(w)
        ties = F.count(F.lit(1)).over(Window.partitionBy(*group_by, col))
        return (2 * min_rank + ties - 1).cast("long").alias(alias)

    r = df.select(*group_by, ranked2(x, "__rx"), ranked2(y, "__ry"))
    rx, ry = F.col("__rx"), F.col("__ry")
    agg = r.groupBy(*group_by).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(rx).alias("__sx"),
        F.sum(ry).alias("__sy"),
        _hi(rx * ry).alias("__sxy_hi"),
        _lo(rx * ry).alias("__sxy_lo"),
        _hi(rx * rx).alias("__sxx_hi"),
        _lo(rx * rx).alias("__sxx_lo"),
        _hi(ry * ry).alias("__syy_hi"),
        _lo(ry * ry).alias("__syy_lo"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = _recombine("__sxy_hi", "__sxy_lo", 1.0)
    sxx = _recombine("__sxx_hi", "__sxx_lo", 1.0)
    syy = _recombine("__syy_hi", "__syy_lo", 1.0)
    rho = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        *group_by,
        F.col("__n").cast("long").alias("n"),
        F.round(rho, round_digits).alias("spearman"),
    )


def grouped_spearman_sql(
    table: str, group_by: str, x: str, y: str, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`grouped_spearman` — identical doubled-rank
    construction and hi/lo integer sums (NOT the builtin corr on ranks,
    whose accumulation order is engine-specific)."""
    return f"""
        WITH r AS (
          SELECT {group_by},
                 CAST(2 * rank() OVER (PARTITION BY {group_by} ORDER BY {x})
                      + count(*) OVER (PARTITION BY {group_by}, {x}) - 1
                      AS BIGINT) AS rx,
                 CAST(2 * rank() OVER (PARTITION BY {group_by} ORDER BY {y})
                      + count(*) OVER (PARTITION BY {group_by}, {y}) - 1
                      AS BIGINT) AS ry
          FROM {table}),
        a AS (
          SELECT {group_by}, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
                 sum(rx * ry // 1073741824) AS sxy_hi,
                 sum(rx * ry % 1073741824) AS sxy_lo,
                 sum(rx * rx // 1073741824) AS sxx_hi,
                 sum(rx * rx % 1073741824) AS sxx_lo,
                 sum(ry * ry // 1073741824) AS syy_hi,
                 sum(ry * ry % 1073741824) AS syy_lo
          FROM r GROUP BY {group_by}),
        d AS (
          SELECT {group_by}, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(sxy_hi AS DOUBLE) * 1073741824.0 + CAST(sxy_lo AS DOUBLE) AS sxy,
                 CAST(sxx_hi AS DOUBLE) * 1073741824.0 + CAST(sxx_lo AS DOUBLE) AS sxx,
                 CAST(syy_hi AS DOUBLE) * 1073741824.0 + CAST(syy_lo AS DOUBLE) AS syy
          FROM a)
        SELECT {group_by}, CAST(n AS BIGINT) AS n,
               round((nd * sxy - sxd * syd)
                     / sqrt((nd * sxx - sxd * sxd) * (nd * syy - syd * syd)),
                     {round_digits}) AS spearman
        FROM d
    """


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve (right-censored): at each distinct
    EVENT time ``t``, ``S(t) = prod_{s <= t} (1 - d_s / n_s)`` where
    ``d_s`` counts events at ``s`` and ``n_s`` counts units still at
    risk (duration >= s).  Censored units (``event = 0``) leave the
    risk set without contributing a factor — the standard
    churn/retention estimator.

    Engine-exact plan: per-duration (d, c) counts in ONE groupBy, the
    at-risk count as a reverse running sum over the duration-ordered
    count table (bounded by DISTINCT durations, e.g. days — never unit
    count), and the product in log domain with each ``ln(1 - d/n)``
    quantized to a scaled BIGINT so the running sum is associative and
    partitioning-independent; ``exp`` reconstructs at the end with one
    scalar op on both engines.

    Returns (t, n_risk, n_events, n_censored, survival) for event
    times only, ordered by t; with ``group_cols`` one curve per group
    (cohort comparison), windows partitioned by the group so cohorts
    parallelize."""
    groups = list(group_cols or [])
    per_t = (
        df.groupBy(*groups, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("d"),
            F.sum(F.lit(1) - F.col(event_col).cast("long")).alias("c"),
        )
    )
    w_desc = (
        Window.partitionBy(*groups).orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = per_t.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc))
    # a time where the whole risk set dies (d == n) zeroes the curve —
    # ln(0) is -inf, so that factor rides a separate sticky flag instead
    lnf = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    scaled = at_risk.withColumn(
        "__lnf", F.round(lnf * F.lit(1e9)).cast("long")
    ).withColumn("__zero", (F.col("d") == F.col("n_risk")).cast("int"))
    w_asc = (
        Window.partitionBy(*groups).orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = scaled.withColumn("__lnsum", F.sum("__lnf").over(w_asc)).withColumn(
        "__zeroed", F.max("__zero").over(w_asc)
    )
    surv = F.when(F.col("__zeroed") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("__lnsum").cast("double") / F.lit(1e9))
    )
    return (
        out.where(F.col("d") > 0)
        .select(
            *groups,
            F.col("t"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.round(surv, round_digits).alias("survival"),
        )
        .orderBy(*groups, "t")
    )


def js_mixture_divergence(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    out: str = "js_divergence",
) -> DataFrame:
    """Jensen-Shannon divergence of each group's categorical
    distribution from the corpus-wide distribution — the data-mixture
    diagnostic ("how far does source X's language mix drift from the
    whole corpus?") a pretraining pipeline runs before reweighting.

    ``JS(P_g || Q) = 0.5*KL(P_g||M) + 0.5*KL(Q||M)``, ``M=(P_g+Q)/2``,
    in nats, bounded by ``ln 2``.

    Determinism: every per-category term is quantized to a 1e-9-scaled
    BIGINT before the per-group sum (the house rule — double summation
    order can differ between engines), then one descale + round.
    Zero-probability group cells contribute 0 by the KL convention; the
    corpus side is positive for every category in the grid by
    construction.

    Scale shape: ONE data-sized partial-agg groupBy(group, cat); the
    group totals, category totals and grand total are re-aggregations
    of that cell table (aggregate-sized, never a rescan).  The grid
    join runs on the cell table's own keys — everything after the
    first groupBy is bounded by |groups| x |categories|.
    """
    cell = df.groupBy(group_col, cat_col).agg(F.count("*").alias("__c"))
    gtot = cell.groupBy(group_col).agg(F.sum("__c").alias("__ng"))
    ctot = cell.groupBy(cat_col).agg(F.sum("__c").alias("__nc"))
    tot = cell.agg(F.sum("__c").alias("__n"))
    grid = (
        gtot.crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(tot))
        .join(cell, [group_col, cat_col], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
    )
    p = F.col("__c").cast("double") / F.col("__ng").cast("double")
    q = F.col("__nc").cast("double") / F.col("__n").cast("double")
    m = (p + q) / 2.0
    term = (
        F.when(F.col("__c") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + q * F.log(q / m)
    )
    q9 = F.round(term * 1000000000.0).cast("long")
    agg = grid.groupBy(group_col).agg(
        F.sum(q9).alias("__t9"), F.first("__ng").alias("__ng")
    )
    return agg.select(
        group_col,
        F.col("__ng").cast("long").alias("n_rows"),
        F.round(0.5 * F.col("__t9").cast("double") / 1000000000.0, 6).alias(out),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp-v1",
) -> DataFrame:
    """Per-group counts with Laplace(1/epsilon) noise — the standard
    epsilon-DP release mechanism for counting queries (sensitivity 1),
    with DETERMINISTIC noise: uniform u derives from the house
    md5_int64 of (salt || group key), then the Laplace inverse CDF
    noise = -(1/eps) * sign(u-.5) * ln(1 - 2|u-.5|).  Determinism makes
    the release reproducible AND bit-checkable by the DuckDB twin; a
    production deployment swaps the hash for a secret-seeded PRF —
    the mechanism and plan shape are identical.

    Scale shape: one partial-aggregated groupBy; the noise is a
    map-side expression over the (group-sized) aggregate output.
    Rounded to 6 dp so cross-engine libm ulp differences cannot
    surface."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    keyed = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in group_cols])
    u = md5_int64(keyed) / F.lit(float(1 << 60))  # uniform [0, 1)
    centered = u - F.lit(0.5)
    mag = F.greatest(F.lit(1e-12), 1.0 - 2.0 * F.abs(centered))
    noise = -(1.0 / F.lit(epsilon)) * F.signum(centered) * F.log(mag)
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("true_count")).select(
        *group_cols,
        F.col("true_count").cast("long").alias("true_count"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_by: list[str],
    treat: Column,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group two-sample MANN-WHITNEY U (Wilcoxon rank-sum) with the
    standard tie-corrected normal approximation — the nonparametric A/B
    gate to reach for when values are skewed and a t-test's mean is the
    wrong summary.  ``treat`` is a boolean Column splitting each group
    into treatment (True) vs control.

    Exactness: the rank sum is carried as DOUBLED integers (the
    :func:`grouped_spearman` trick — 2*avg_rank = 2*min_rank + ties - 1
    is always integral) and the tie-correction term sum(t^3 - t) is an
    integer aggregate, so everything before the final double
    reconstruction is bit-exact on any engine/partitioning; the closing
    float arithmetic is textually identical in the SQL twin.

    Shape: one keyed rank window + a (group, value)-grain aggregate +
    the per-group aggregate, all partial-agg-combining.  z is NULL when
    sigma is 0 (every value tied) or a side is empty.

    Returns ``group_by..., n_treat, n_ctrl, u_treat, z``.
    """
    from pyspark.sql import Window

    w_rank = Window.partitionBy(*group_by).orderBy(value_col)
    w_ties = Window.partitionBy(*group_by, value_col)
    r2 = (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1).cast(
        "long"
    )
    ranked = df.select(
        *group_by,
        F.col(value_col).alias("__v"),
        treat.cast("int").alias("__is_t"),
        r2.alias("__r2"),
    )
    per_value = ranked.groupBy(*group_by, "__v").agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum("__is_t").alias("__ta"),
        F.min("__r2").alias("__r2v"),
    )
    t = F.col("__t")
    agg = per_value.groupBy(*group_by).agg(
        F.sum(t).alias("__n"),
        F.sum("__ta").alias("__n1"),
        F.sum(F.col("__ta") * F.col("__r2v")).alias("__sum2_r1"),
        F.sum(t * t * t - t).alias("__tie3"),
    )
    n = F.col("__n").cast("double")
    n1 = F.col("__n1").cast("double")
    n2 = (F.col("__n") - F.col("__n1")).cast("double")
    u1 = (F.col("__sum2_r1") - F.col("__n1") * (F.col("__n1") + 1)).cast(
        "double"
    ) / F.lit(2.0)
    mu = n1 * n2 / F.lit(2.0)
    sigma = F.sqrt(
        n1 * n2 / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("__tie3").cast("double") / (n * (n - F.lit(1.0))))
    )
    z = F.when(sigma != 0, (u1 - mu) / sigma)
    return agg.select(
        *group_by,
        F.col("__n1").cast("long").alias("n_treat"),
        (F.col("__n") - F.col("__n1")).cast("long").alias("n_ctrl"),
        F.round(u1, round_digits).alias("u_treat"),
        F.round(z, round_digits).alias("z"),
    )


def mann_whitney_u_sql(
    table: str,
    group_by: str,
    treat_pred: str,
    value_col: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`mann_whitney_u` — identical doubled-rank
    construction, integer tie term, and textual closing arithmetic."""
    return f"""
        WITH r AS (
          SELECT {group_by}, {value_col} AS v,
                 CAST({treat_pred} AS INT) AS is_t,
                 CAST(2 * rank() OVER (PARTITION BY {group_by} ORDER BY {value_col})
                      + count(*) OVER (PARTITION BY {group_by}, {value_col}) - 1
                      AS BIGINT) AS r2
          FROM {table}),
        pv AS (
          SELECT {group_by}, v, count(*) AS t, sum(is_t) AS ta, min(r2) AS r2v
          FROM r GROUP BY {group_by}, v),
        a AS (
          SELECT {group_by}, sum(t) AS n, sum(ta) AS n1,
                 sum(ta * r2v) AS sum2_r1, sum(t*t*t - t) AS tie3
          FROM pv GROUP BY {group_by}),
        d AS (
          SELECT {group_by}, n, n1,
                 CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
                 CAST(n - n1 AS DOUBLE) AS n2d,
                 CAST(sum2_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
                 CAST(tie3 AS DOUBLE) AS tied
          FROM a)
        SELECT {group_by},
               CAST(n1 AS BIGINT) AS n_treat,
               CAST(n - n1 AS BIGINT) AS n_ctrl,
               round(u1, {round_digits}) AS u_treat,
               round(CASE WHEN sqrt(n1d * n2d / 12.0
                          * ((nd + 1.0) - tied / (nd * (nd - 1.0)))) <> 0
                     THEN (u1 - n1d * n2d / 2.0)
                          / sqrt(n1d * n2d / 12.0
                                 * ((nd + 1.0) - tied / (nd * (nd - 1.0))))
                     END, {round_digits}) AS z
        FROM d
    """


def ks_two_sample(
    df: DataFrame,
    class_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-class two-sample KOLMOGOROV-SMIRNOV statistic: for every
    class ``c``, D = sup_x |F_c(x) - F_rest(x)| against the complement
    of that class — the distribution-drift gate for "did source c's
    quality scores shift vs everyone else" that a corpus pipeline runs
    per source/shard.

    With ties, the sup over the union of jump points is attained at
    some distinct value evaluated AFTER its step, so the exact D needs
    only cumulative counts on the distinct-value grid of the WHOLE
    sample (both ECDFs are flat between union points).  Everything
    stays integer: D's numerator is max |ca*nB - cb*nA| over grid
    points; the single closing division descales it.  Products are
    bounded by N^2, exact in BIGINT up to N ~ 3e9 rows per comparison;
    past that, promote the two products to decimal(38,0) — same plan.

    Shape: a (class, value) count aggregate, a value-grain count
    aggregate, a broadcast k-row class-totals join, one keyed
    cumulative window over the k x V grid, and a k-row final aggregate
    — no all-pairs, no global sort; the grid is value-distinct-sized
    per class, never row-sized.

    Returns ``class_col, n_a, n_b, ks_d`` (one row per class).
    """
    from pyspark.sql import Window

    counts = df.groupBy(class_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    by_value = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__ct"))
    classes = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("__na"))
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    grid = by_value.crossJoin(F.broadcast(classes)).crossJoin(
        F.broadcast(total)
    )
    j = grid.join(counts, [class_col, value_col], "left").withColumn(
        "__c", F.coalesce(F.col("__c"), F.lit(0))
    )
    w = (
        Window.partitionBy(class_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = j.withColumns(
        {
            "__ca": F.sum("__c").over(w).cast("long"),
            "__cu": F.sum("__ct").over(w).cast("long"),
        }
    ).withColumn("__cb", F.col("__cu") - F.col("__ca"))
    gap = F.abs(
        F.col("__ca") * (F.col("__n") - F.col("__na"))
        - F.col("__cb") * F.col("__na")
    )
    return (
        cum.withColumn("__gap", gap)
        .groupBy(class_col, "__na", "__n")
        .agg(F.max("__gap").alias("__dnum"))
        .select(
            class_col,
            F.col("__na").cast("long").alias("n_a"),
            (F.col("__n") - F.col("__na")).cast("long").alias("n_b"),
            F.round(
                F.col("__dnum").cast("double")
                / (
                    F.col("__na").cast("double")
                    * (F.col("__n") - F.col("__na")).cast("double")
                ),
                round_digits,
            ).alias("ks_d"),
        )
    )


def ks_two_sample_sql(
    table: str,
    class_col: str,
    value_col: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`ks_two_sample` — same distinct-value grid,
    integer cumulative gap, single closing division."""
    return f"""
        WITH counts AS (
          SELECT {class_col} AS g, {value_col} AS v, count(*) AS c
          FROM {table} GROUP BY 1, 2),
        by_value AS (
          SELECT {value_col} AS v, count(*) AS ct FROM {table} GROUP BY 1),
        classes AS (
          SELECT {class_col} AS g, count(*) AS na FROM {table} GROUP BY 1),
        total AS (SELECT count(*) AS n FROM {table}),
        grid AS (
          SELECT cl.g, bv.v, bv.ct, cl.na, t.n,
                 coalesce(co.c, 0) AS c
          FROM by_value bv CROSS JOIN classes cl CROSS JOIN total t
          LEFT JOIN counts co ON co.g = cl.g AND co.v = bv.v),
        cum AS (
          SELECT g, na, n,
                 CAST(sum(c) OVER w AS BIGINT) AS ca,
                 CAST(sum(ct) OVER w AS BIGINT) AS cu
          FROM grid
          WINDOW w AS (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT g AS {class_col},
               CAST(na AS BIGINT) AS n_a,
               CAST(n - na AS BIGINT) AS n_b,
               round(CAST(max(abs(ca * (n - na) - (cu - ca) * na)) AS DOUBLE)
                     / (CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)),
                     {round_digits}) AS ks_d
        FROM cum GROUP BY g, na, n
    """


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson CHI-SQUARE test of independence between two categorical
    columns, with the per-cell decomposition a drift dashboard wants:
    observed, expected, and each cell's contribution, plus the total
    statistic and degrees of freedom on every row.

    Exactness: with integer marginals R, C and total N, the textbook
    (O - E)^2 / E rewrites as (O*N - R*C)^2 / (N*R*C) — the numerator
    root is an INTEGER (exact in BIGINT while N^2 fits, i.e. N to
    ~3e9; promote to decimal(38,0) past that), so both engines square
    and divide the same doubles.  Cell contributions quantize to
    scaled BIGINTs before the total sum, making the k-cell reduction
    associative-exact regardless of partitioning.

    Shape: one (row, col) count aggregate; marginals and N are
    broadcast k-row/1-row joins; the closing total runs over an
    unpartitioned window that is BOUNDED by |rows| x |cols| distinct
    cells — category-product-sized, never data-sized.

    Returns ``row_col, col_col, observed, expected, contrib, chi2,
    dof`` (one row per observed cell).
    """
    from pyspark.sql import Window

    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("__o"))
    rmarg = df.groupBy(row_col).agg(F.count(F.lit(1)).alias("__r"))
    cmarg = df.groupBy(col_col).agg(F.count(F.lit(1)).alias("__cc"))
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    j = (
        cells.join(F.broadcast(rmarg), row_col)
        .join(F.broadcast(cmarg), col_col)
        .crossJoin(F.broadcast(tot))
    )
    diff = (F.col("__o") * F.col("__n") - F.col("__r") * F.col("__cc")).cast(
        "double"
    )
    denom = (
        F.col("__n").cast("double")
        * F.col("__r").cast("double")
        * F.col("__cc").cast("double")
    )
    expected = F.col("__r").cast("double") * F.col("__cc").cast("double") / F.col(
        "__n"
    ).cast("double")
    scale = float(10**round_digits)
    withc = j.withColumns(
        {
            "__exp": expected,
            "__contrib_s": F.round(diff * diff / denom * F.lit(scale)).cast(
                "long"
            ),
        }
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nr = F.size(F.collect_set(row_col).over(w_all))
    nc = F.size(F.collect_set(col_col).over(w_all))
    return withc.select(
        row_col,
        col_col,
        F.col("__o").cast("long").alias("observed"),
        F.round(F.col("__exp"), round_digits).alias("expected"),
        F.round(F.col("__contrib_s") / F.lit(scale), round_digits).alias(
            "contrib"
        ),
        F.round(
            (F.sum("__contrib_s").over(w_all) / F.lit(scale)), round_digits
        ).alias("chi2"),
        ((nr - 1) * (nc - 1)).cast("long").alias("dof"),
    )


def chi2_independence_sql(
    table: str,
    row_col: str,
    col_col: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`chi2_independence` — identical integer
    numerator root, double epilogue, and scaled-BIGINT total."""
    scale = float(10**round_digits)
    return f"""
        WITH cells AS (
          SELECT {row_col} AS r, {col_col} AS c, count(*) AS o
          FROM {table} GROUP BY 1, 2),
        rmarg AS (SELECT {row_col} AS r, count(*) AS rr FROM {table} GROUP BY 1),
        cmarg AS (SELECT {col_col} AS c, count(*) AS cc FROM {table} GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM {table}),
        j AS (
          SELECT cells.r, cells.c, o, rr, cc, n,
                 CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE)
                   AS exp,
                 CAST(round(CAST(o * n - rr * cc AS DOUBLE)
                            * CAST(o * n - rr * cc AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(rr AS DOUBLE)
                               * CAST(cc AS DOUBLE)) * {scale}) AS BIGINT)
                   AS contrib_s
          FROM cells JOIN rmarg USING (r) JOIN cmarg USING (c) CROSS JOIN tot),
        dims AS (
          SELECT (SELECT count(*) FROM rmarg) AS nr,
                 (SELECT count(*) FROM cmarg) AS nc)
        SELECT r AS {row_col}, c AS {col_col},
               CAST(o AS BIGINT) AS observed,
               round(exp, {round_digits}) AS expected,
               round(contrib_s / {scale}, {round_digits}) AS contrib,
               round(sum(contrib_s) OVER () / {scale}, {round_digits}) AS chi2,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof
        FROM j CROSS JOIN dims
    """


def welch_t_test(
    df: DataFrame,
    group_by: list[str],
    treat: Column,
    value_col: str,
    value_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group WELCH's unequal-variance t-test — the parametric
    sibling of :func:`mann_whitney_u` for the same A/B split, with the
    Welch-Satterthwaite degrees of freedom so unequal group sizes and
    spreads are handled honestly.

    Sufficient statistics per (group, side) are exact integers: n,
    sum(xs), and sum(xs^2) split into 30-bit halves (the
    :func:`grouped_regression` overflow discipline), all map-side
    combining in ONE keyed aggregate.  The closing mean/variance/t/dof
    arithmetic is a double epilogue textually mirrored in the SQL
    twin.  t and dof are NULL when either side has n < 2 or the
    pooled standard error is 0.

    Returns ``group_by..., n_treat, n_ctrl, mean_treat, mean_ctrl, t,
    dof``.
    """
    side = treat.cast("int")
    xs = _scaled(value_col, value_digits)
    scale = float(10**value_digits)
    agg = (
        df.select(*group_by, side.alias("__is_t"), xs.alias("__xs"))
        .groupBy(*group_by)
        .agg(
            F.sum("__is_t").alias("n1"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__is_t") * F.col("__xs")).alias("s1r"),
            F.sum(F.col("__xs")).alias("sr"),
            F.sum(
                F.col("__is_t")
                * F.shiftright(F.col("__xs") * F.col("__xs"), 30)
            ).alias("q1_hi"),
            F.sum(
                F.col("__is_t")
                * (F.col("__xs") * F.col("__xs")).bitwiseAND(F.lit(TWO30 - 1))
            ).alias("q1_lo"),
            F.sum(F.shiftright(F.col("__xs") * F.col("__xs"), 30)).alias(
                "q_hi"
            ),
            F.sum(
                (F.col("__xs") * F.col("__xs")).bitwiseAND(F.lit(TWO30 - 1))
            ).alias("q_lo"),
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = (F.col("n") - F.col("n1")).cast("double")
    s1 = F.col("s1r").cast("double") / F.lit(scale)
    s2 = (F.col("sr") - F.col("s1r")).cast("double") / F.lit(scale)
    q1 = (
        F.col("q1_hi").cast("double") * F.lit(float(TWO30))
        + F.col("q1_lo").cast("double")
    ) / F.lit(scale * scale)
    q2 = (
        (F.col("q_hi") - F.col("q1_hi")).cast("double") * F.lit(float(TWO30))
        + (F.col("q_lo") - F.col("q1_lo")).cast("double")
    ) / F.lit(scale * scale)
    # CASE-guarded divisions: ANSI mode raises DIVIDE_BY_ZERO on a
    # degenerate (empty/singleton) side, and CaseWhen evaluates
    # branches lazily per row — the documented ANSI-safe pattern.
    ok = (F.col("n1") >= 2) & ((F.col("n") - F.col("n1")) >= 2)
    m1 = F.when(F.col("n1") > 0, s1 / n1d)
    m2 = F.when(F.col("n") - F.col("n1") > 0, s2 / n2d)
    v1 = F.when(ok, (q1 - s1 * s1 / n1d) / (n1d - F.lit(1.0)))
    v2 = F.when(ok, (q2 - s2 * s2 / n2d) / (n2d - F.lit(1.0)))
    se2 = F.when(ok, v1 / n1d + v2 / n2d)
    # NULL se2 (degenerate side) compares to NULL -> filtered by when
    tstat = F.when(se2 > 0, (m1 - m2) / F.sqrt(se2))
    dof = F.when(
        (se2 > 0) & (v1 > 0) & (v2 > 0),
        se2
        * se2
        / (
            (v1 / n1d) * (v1 / n1d) / (n1d - F.lit(1.0))
            + (v2 / n2d) * (v2 / n2d) / (n2d - F.lit(1.0))
        ),
    )
    return agg.select(
        *group_by,
        F.col("n1").cast("long").alias("n_treat"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_ctrl"),
        F.round(m1, round_digits).alias("mean_treat"),
        F.round(m2, round_digits).alias("mean_ctrl"),
        F.round(tstat, round_digits).alias("t"),
        F.round(dof, round_digits).alias("dof"),
    )


def welch_t_test_sql(
    table: str,
    group_by: str,
    treat_pred: str,
    value_col: str,
    value_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`welch_t_test` — identical integer
    sufficient statistics (30-bit-split squares) and double epilogue."""
    scale = float(10**value_digits)
    return f"""
        WITH s AS (
          SELECT {group_by},
                 CAST({treat_pred} AS INT) AS is_t,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS xs
          FROM {table}),
        a AS (
          SELECT {group_by},
                 sum(is_t) AS n1, count(*) AS n,
                 sum(is_t * xs) AS s1r, sum(xs) AS sr,
                 sum(is_t * (xs * xs // 1073741824)) AS q1_hi,
                 sum(is_t * (xs * xs % 1073741824)) AS q1_lo,
                 sum(xs * xs // 1073741824) AS q_hi,
                 sum(xs * xs % 1073741824) AS q_lo
          FROM s GROUP BY {group_by}),
        e AS (
          SELECT {group_by}, n1, n,
                 CAST(n1 AS DOUBLE) AS n1d,
                 CAST(n - n1 AS DOUBLE) AS n2d,
                 CAST(s1r AS DOUBLE) / {scale} AS s1,
                 CAST(sr - s1r AS DOUBLE) / {scale} AS s2,
                 (CAST(q1_hi AS DOUBLE) * 1073741824.0
                  + CAST(q1_lo AS DOUBLE)) / {scale * scale} AS q1,
                 (CAST(q_hi - q1_hi AS DOUBLE) * 1073741824.0
                  + CAST(q_lo - q1_lo AS DOUBLE)) / {scale * scale} AS q2
          FROM a),
        v AS (
          SELECT {group_by}, n1, n, n1d, n2d,
                 s1 / n1d AS m1, s2 / n2d AS m2,
                 (q1 - s1 * s1 / n1d) / (n1d - 1.0) AS v1,
                 (q2 - s2 * s2 / n2d) / (n2d - 1.0) AS v2
          FROM e)
        SELECT {group_by},
               CAST(n1 AS BIGINT) AS n_treat,
               CAST(n - n1 AS BIGINT) AS n_ctrl,
               round(CASE WHEN n1 > 0 THEN m1 END, {round_digits}) AS mean_treat,
               round(CASE WHEN n - n1 > 0 THEN m2 END, {round_digits}) AS mean_ctrl,
               round(CASE WHEN n1 >= 2 AND n - n1 >= 2
                          AND v1 / n1d + v2 / n2d > 0
                     THEN (m1 - m2) / sqrt(v1 / n1d + v2 / n2d) END,
                     {round_digits}) AS t,
               round(CASE WHEN n1 >= 2 AND n - n1 >= 2
                          AND v1 / n1d + v2 / n2d > 0
                          AND v1 > 0 AND v2 > 0
                     THEN (v1 / n1d + v2 / n2d) * (v1 / n1d + v2 / n2d)
                          / ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
                             + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) END,
                     {round_digits}) AS dof
        FROM v
    """


def anova_oneway(
    df: DataFrame,
    class_col: str,
    value_col: str,
    value_digits: int = 2,
    term_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL classes of ``class_col`` —
    the k-group generalization of :func:`welch_t_test` (classic
    equal-variance form): F = (SSB/(k-1)) / (SSW/(N-k)), with eta² =
    SSB/SST as the effect size.

    Two keyed aggregates: per-class integer sufficient statistics
    (n_i, sum, 30-bit-split sum of squares), then a k-row reduction.
    The one non-associative piece — Σ_i S_i²/n_i, a sum of doubles —
    quantizes each class term to a BIGINT scaled by ``10**term_digits``
    first, so the k-row sum is partitioning-independent; the SQL twin
    rounds identically.  Pick term_digits so N * mean^2 * 10^d stays
    under 2^63 (each term is ~n_i * mean_i^2); 2 digits holds to
    ~1e16 in squared value units.  NULL F when k < 2, N <= k, or
    SSW = 0.

    Returns one row: ``k, n, ss_between, ss_within, f_stat, eta_sq``.
    """
    xs = _scaled(value_col, value_digits)
    scale = float(10**value_digits)
    qscale = float(10**term_digits)
    per = df.groupBy(class_col).agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(xs).alias("si"),
        _hi(xs * xs).alias("qi_hi"),
        _lo(xs * xs).alias("qi_lo"),
    )
    term = (
        (F.col("si").cast("double") / F.lit(scale))
        * (F.col("si").cast("double") / F.lit(scale))
        / F.col("ni").cast("double")
    )
    one = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi_hi").alias("q_hi"),
        F.sum("qi_lo").alias("q_lo"),
        F.sum(F.round(term * F.lit(qscale)).cast("long")).alias("bpart_s"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    s = F.col("s").cast("double") / F.lit(scale)
    q = (
        F.col("q_hi").cast("double") * F.lit(float(TWO30))
        + F.col("q_lo").cast("double")
    ) / F.lit(scale * scale)
    grand = s * s / nd
    sst = q - grand
    ssb = F.col("bpart_s").cast("double") / F.lit(qscale) - grand
    ssw = sst - ssb
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
    fstat = F.when(
        ok, (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    )
    eta = F.when(ok & (sst > 0), ssb / sst)
    # ss_* are NOT rounded: at their magnitude (~N * value^2) a
    # double's ulp exceeds 1e-6, so round(x, 6) is not ulp-stable
    # across engines — but the values are bit-deterministic anyway
    # (integer sums -> identical double epilogue).  f/eta are O(1).
    return one.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.round(fstat, round_digits).alias("f_stat"),
        F.round(eta, round_digits).alias("eta_sq"),
    )


def anova_oneway_sql(
    table: str,
    class_col: str,
    value_col: str,
    value_digits: int = 2,
    term_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`anova_oneway` — identical integer
    sufficient statistics and quantized between-group terms."""
    scale = float(10**value_digits)
    qscale = float(10**term_digits)
    return f"""
        WITH s AS (
          SELECT {class_col} AS g,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS xs
          FROM {table}),
        per AS (
          SELECT g, count(*) AS ni, sum(xs) AS si,
                 sum(xs * xs // 1073741824) AS qi_hi,
                 sum(xs * xs % 1073741824) AS qi_lo
          FROM s GROUP BY g),
        one AS (
          SELECT count(*) AS k, sum(ni) AS n, sum(si) AS sv,
                 sum(qi_hi) AS q_hi, sum(qi_lo) AS q_lo,
                 sum(CAST(round((CAST(si AS DOUBLE) / {scale})
                                * (CAST(si AS DOUBLE) / {scale})
                                / CAST(ni AS DOUBLE) * {qscale}) AS BIGINT))
                   AS bpart_s
          FROM per),
        e AS (
          SELECT k, n,
                 CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
                 CAST(sv AS DOUBLE) / {scale} AS sg,
                 (CAST(q_hi AS DOUBLE) * 1073741824.0
                  + CAST(q_lo AS DOUBLE)) / {scale * scale} AS q,
                 CAST(bpart_s AS DOUBLE) / {qscale} AS bpart
          FROM one),
        f AS (
          SELECT k, n, nd, kd,
                 q - sg * sg / nd AS sst,
                 bpart - sg * sg / nd AS ssb,
                 (q - sg * sg / nd) - (bpart - sg * sg / nd) AS ssw
          FROM e)
        SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
               ssb AS ss_between,
               ssw AS ss_within,
               round(CASE WHEN k >= 2 AND n > k AND ssw > 0
                     THEN (ssb / (kd - 1.0)) / (ssw / (nd - kd)) END,
                     {round_digits}) AS f_stat,
               round(CASE WHEN k >= 2 AND n > k AND ssw > 0 AND sst > 0
                     THEN ssb / sst END, {round_digits}) AS eta_sq
        FROM f
    """


def theil_sen_bounded(
    df: DataFrame,
    group_by: str,
    x_ms_col: str,
    y_col: str,
    key_col: str,
    sample_m: int = 40,
    y_digits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """THEIL-SEN robust trend slope per group — median of pairwise
    slopes, the estimator that tolerates ~29% contamination where OLS
    (:func:`grouped_regression`) breaks on one bad batch of points.

    The full estimator is O(n²) pairs; this is the BOUNDED form every
    distributed implementation actually ships: a deterministic md5
    rank picks ``sample_m`` rows per group (stable under reruns and
    partitioning — the :mod:`operators.sampling` discipline), pairs
    are generated within the sample only (≤ m(m-1)/2 per group), and
    the slope median is the exact interpolated percentile DuckDB's
    ``quantile_cont`` reproduces bit-for-bit.  Slopes divide
    scaled-BIGINT deltas, so both engines divide identical integers;
    the per-day rescale and rounding close it out.  Vertical pairs
    (equal x) are excluded, groups with < 2 sampled points emit NULL.

    Shape: one keyed rank window, one m-bounded keyed self-join, one
    keyed aggregate — all partition-parallel; nothing is corpus-sized.
    """
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64
    from pyspark.sql import Window

    scale = float(10**y_digits)
    h = md5_int64(F.concat(F.col(key_col).cast("string"), F.lit("\x1fts")))
    w = Window.partitionBy(group_by).orderBy(h, key_col)
    sampled = (
        df.select(
            group_by,
            F.col(key_col),
            F.col(x_ms_col).cast("long").alias("__x"),
            F.round(F.col(y_col) * F.lit(scale)).cast("long").alias("__y"),
        )
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= sample_m)
    )
    a = sampled.alias("a")
    b = sampled.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{group_by}") == F.col(f"b.{group_by}"))
        & (F.col("a.__rk") < F.col("b.__rk"))
        & (F.col("a.__x") != F.col("b.__x")),
    ).select(
        F.col(f"a.{group_by}").alias(group_by),
        (
            (F.col("b.__y") - F.col("a.__y")).cast("double")
            / (F.col("b.__x") - F.col("a.__x")).cast("double")
        ).alias("__slope_ms"),
    )
    day = 86400000.0
    return (
        pairs.groupBy(group_by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.percentile(F.col("__slope_ms"), F.lit(0.5)).alias("__med"),
        )
        .select(
            group_by,
            "n_pairs",
            F.round(F.col("__med") * F.lit(day) / F.lit(scale), round_digits).alias(
                "slope_per_day"
            ),
        )
    )


def kruskal_wallis(
    df: DataFrame,
    class_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis rank-based one-way test (Kruskal & Wallis 1952) —
    the distribution-free sibling of :func:`anova_oneway` for when the
    normal-residual assumption is off the table: H compares mean ranks
    across the k classes of ``class_col``, with the standard tie
    correction (1 - sum(t^3 - t)/(N^3 - N)).

    Rank arithmetic stays in EXACT integers via DOUBLED midranks
    (2*midrank is always an integer, ties or not): per distinct value,
    mid2 = 2*(rows before it) + (its tie count) + 1 off one cumulative
    window over the DISTINCT-VALUE table.  That table is the only
    single-partition structure, so cardinality of distinct values must
    be bounded (quantize continuous inputs first — same contract as
    ``bottomk_quantiles``); the data-sized work is two keyed hash
    aggregates.  The k-row reduction quantizes each class's
    R_j^2/n_j term to a BIGINT (magnitude ~N^2*n_j ulp > 1 anyway), so
    the final sum is partitioning-independent; H's closing arithmetic
    is the identical scalar sequence on both engines.

    Returns one row: ``k, n, h_stat, h_tie_corrected`` (H NULL when
    k < 2 or every value ties into one group).
    """
    base = df.select(
        F.col(class_col).alias("__g"), F.col(value_col).alias("__v")
    ).where(F.col("__v").isNotNull() & F.col("__g").isNotNull())
    gv = base.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__n_gv"))
    vtab = gv.groupBy("__v").agg(F.sum("__n_gv").alias("__n_v"))
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    vtab = vtab.select(
        "__v",
        "__n_v",
        (
            F.lit(2) * (F.sum("__n_v").over(w) - F.col("__n_v"))
            + F.col("__n_v")
            + F.lit(1)
        ).alias("__mid2"),
    )
    per = (
        gv.join(F.broadcast(vtab.select("__v", "__mid2")), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__n_gv").alias("__n_j"),
            F.sum(F.col("__n_gv") * F.col("__mid2")).alias("__r2_j"),
        )
    )
    # term_j = R_j^2 / n_j with R_j = r2_j / 2; at term magnitude the
    # double's ulp exceeds 1, so the BIGINT quantization is lossless in
    # practice and makes the k-row sum order-free
    rj = F.col("__r2_j").cast("double") / F.lit(2.0)
    term = rj * rj / F.col("__n_j").cast("double")
    kstats = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__n_j").alias("n"),
        F.sum(F.round(term).cast("long")).alias("__term_s"),
    )
    ties = vtab.agg(
        F.sum(
            F.col("__n_v") * F.col("__n_v") * F.col("__n_v") - F.col("__n_v")
        ).alias("__tie_term"),
        F.count(F.lit(1)).alias("__n_distinct"),
    )
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) * F.col("__term_s").cast("double") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("__tie_term").cast("double") / (nd * nd * nd - nd)
    ok = (F.col("k") >= 2) & (F.col("__n_distinct") >= 2)
    return (
        kstats.crossJoin(F.broadcast(ties))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n").cast("long").alias("n"),
            F.round(F.when(ok, h), round_digits).alias("h_stat"),
            F.round(F.when(ok & (corr > 0), h / corr), round_digits).alias(
                "h_tie_corrected"
            ),
        )
    )


def kruskal_wallis_sql(
    table: str,
    class_col: str,
    value_col: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`kruskal_wallis` — identical doubled-midrank
    integers, identical quantized k-row terms, identical epilogue."""
    return f"""
        WITH base AS (
          SELECT {class_col} AS g, {value_col} AS v FROM {table}
          WHERE {value_col} IS NOT NULL AND {class_col} IS NOT NULL),
        gv AS (SELECT g, v, count(*) AS n_gv FROM base GROUP BY g, v),
        vtab AS (
          SELECT v, sum(n_gv) AS n_v,
                 2 * (sum(sum(n_gv)) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - sum(n_gv)) + sum(n_gv) + 1 AS mid2
          FROM gv GROUP BY v),
        per AS (
          SELECT gv.g, sum(gv.n_gv) AS n_j,
                 sum(gv.n_gv * vtab.mid2) AS r2_j
          FROM gv JOIN vtab USING (v) GROUP BY gv.g),
        kstats AS (
          SELECT count(*) AS k, sum(n_j) AS n,
                 sum(CAST(round((CAST(r2_j AS DOUBLE) / 2.0)
                                * (CAST(r2_j AS DOUBLE) / 2.0)
                                / CAST(n_j AS DOUBLE)) AS BIGINT)) AS term_s
          FROM per),
        ties AS (
          SELECT sum(n_v * n_v * n_v - n_v) AS tie_term,
                 count(*) AS n_distinct
          FROM vtab)
        SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
               round(CASE WHEN k >= 2 AND n_distinct >= 2 THEN
                 12.0 * CAST(term_s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                 - 3.0 * (CAST(n AS DOUBLE) + 1.0) END, {round_digits})
                 AS h_stat,
               round(CASE WHEN k >= 2 AND n_distinct >= 2
                          AND 1.0 - CAST(tie_term AS DOUBLE)
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                 * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) > 0
                 THEN (12.0 * CAST(term_s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                 - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                 / (1.0 - CAST(tie_term AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) END,
                 {round_digits}) AS h_tie_corrected
        FROM kstats CROSS JOIN ties
    """


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
    value_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group trimmed mean: drop the floor(n*trim_frac) lowest and
    highest values, average the rest — the robust location estimate
    between the mean (breaks on one outlier) and the median (throws
    away 98% of the data).  Exact cross-engine: values quantize to
    scaled BIGINTs, the kept-range sum is an integer, and rank
    boundaries come from one per-group window (ties rank arbitrarily
    but equal values are interchangeable, so the kept SUM is
    rank-order-independent).

    Returns ``group, n, n_trim_each, trimmed_mean, mean`` (trimmed
    NULL when trimming would drop everything).
    """
    xs = _scaled(value_col, value_digits)
    scale = float(10**value_digits)
    base = df.where(F.col(f"`{value_col}`").isNotNull()).select(
        F.col(group_col).alias("group"), xs.alias(f"__xs_{value_col}")
    )
    w = Window.partitionBy("group").orderBy(F.col(f"__xs_{value_col}").asc())
    ranked = base.select(
        "group",
        f"__xs_{value_col}",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("group")).alias("__n"),
    )
    t_lo = F.floor(F.col("__n").cast("double") * F.lit(trim_frac))
    kept = (F.col("__rn") > t_lo) & (F.col("__rn") <= F.col("__n") - t_lo)
    return (
        ranked.groupBy("group")
        .agg(
            F.max("__n").alias("n"),
            F.max(t_lo).alias("__t"),
            F.sum(F.when(kept, F.col(f"__xs_{value_col}"))).alias("__kept_s"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("__kept_n"),
            F.sum(f"__xs_{value_col}").alias("__all_s"),
        )
        .select(
            "group",
            F.col("n").cast("long").alias("n"),
            F.col("__t").cast("long").alias("n_trim_each"),
            F.round(
                F.when(
                    F.col("__kept_n") > 0,
                    F.col("__kept_s").cast("double")
                    / (F.col("__kept_n").cast("double") * F.lit(scale)),
                ),
                round_digits,
            ).alias("trimmed_mean"),
            F.round(
                F.col("__all_s").cast("double")
                / (F.col("n").cast("double") * F.lit(scale)),
                round_digits,
            ).alias("mean"),
        )
    )


def trimmed_mean_sql(
    table: str,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
    value_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`trimmed_mean`."""
    scale = float(10**value_digits)
    return f"""
        WITH base AS (
          SELECT {group_col} AS grp,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS xs
          FROM {table} WHERE {value_col} IS NOT NULL),
        ranked AS (
          SELECT grp, xs,
                 row_number() OVER (PARTITION BY grp ORDER BY xs ASC) AS rn,
                 count(*) OVER (PARTITION BY grp) AS n
          FROM base),
        agg AS (
          SELECT grp, max(n) AS n,
                 max(CAST(floor(CAST(n AS DOUBLE) * {trim_frac}) AS BIGINT))
                   AS t,
                 sum(CASE WHEN rn > floor(CAST(n AS DOUBLE) * {trim_frac})
                           AND rn <= n - floor(CAST(n AS DOUBLE) * {trim_frac})
                          THEN xs END) AS kept_s,
                 sum(CASE WHEN rn > floor(CAST(n AS DOUBLE) * {trim_frac})
                           AND rn <= n - floor(CAST(n AS DOUBLE) * {trim_frac})
                          THEN 1 ELSE 0 END) AS kept_n,
                 sum(xs) AS all_s
          FROM ranked GROUP BY grp)
        SELECT grp AS "group", CAST(n AS BIGINT) AS n,
               CAST(t AS BIGINT) AS n_trim_each,
               round(CASE WHEN kept_n > 0 THEN
                 CAST(kept_s AS DOUBLE) / (CAST(kept_n AS DOUBLE) * {scale})
                 END, {round_digits}) AS trimmed_mean,
               round(CAST(all_s AS DOUBLE) / (CAST(n AS DOUBLE) * {scale}),
                     {round_digits}) AS mean
        FROM agg
    """


def kendall_tau_bounded(
    df: DataFrame,
    group_by: str,
    x_col: str,
    y_col: str,
    key_col: str,
    sample_m: int = 60,
    x_digits: int = 2,
    y_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """KENDALL's tau-b rank correlation per group — the third member of
    the correlation family (Pearson `agg_corr` measures linearity,
    Spearman `agg_spearman` monotonicity via ranks, tau-b the
    PROBABILITY of concordance, the most outlier-robust and the one
    with a direct betting interpretation), with the tau-b tie
    correction in both margins.

    Same bounded discipline as :func:`theil_sen_bounded`: the full
    statistic is O(n²) pairs, so a deterministic md5 rank picks
    ``sample_m`` rows per group (rerun/partitioning-stable) and pairs
    generate within the sample only.  Concordance tests compare
    scaled-BIGINT signs — pure integer counting — and the closing
    sqrt runs on exact integer operands, so both engines compute the
    identical double.

    Returns ``group, n_pairs, n_concordant, n_discordant, tau_b``
    (NULL tau when either margin is all-ties).
    """
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    xq = F.round(F.col(x_col) * F.lit(float(10**x_digits))).cast("long")
    yq = F.round(F.col(y_col) * F.lit(float(10**y_digits))).cast("long")
    h = md5_int64(F.concat(F.col(key_col).cast("string"), F.lit("\x1fkt")))
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        group_by, F.col(key_col), xq.alias("__x"), yq.alias("__y"), h.alias("__h")
    )
    # rank tie-break extends through the VALUES: a non-unique key_col
    # (duplicate business keys happen) must still sample identically on
    # both engines
    w = Window.partitionBy(group_by).orderBy(
        "__h", key_col, F.col("__x"), F.col("__y")
    )
    sampled = base.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= sample_m
    )
    a, b = sampled.alias("a"), sampled.alias("b")
    dx = F.signum((F.col("b.__x") - F.col("a.__x")).cast("double"))
    dy = F.signum((F.col("b.__y") - F.col("a.__y")).cast("double"))
    pairs = a.join(
        b,
        (F.col(f"a.{group_by}") == F.col(f"b.{group_by}"))
        & (F.col("a.__rk") < F.col("b.__rk")),
    ).select(
        F.col(f"a.{group_by}").alias("group"),
        (dx * dy).cast("long").alias("__s"),
        (dx == 0).cast("long").alias("__tx"),
        (dy == 0).cast("long").alias("__ty"),
    )
    agg = pairs.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__s") > 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("__s") < 0, 1).otherwise(0)).alias("nd"),
        F.sum("__tx").alias("ntx"),
        F.sum("__ty").alias("nty"),
    )
    denom_x = (F.col("n_pairs") - F.col("ntx")).cast("double")
    denom_y = (F.col("n_pairs") - F.col("nty")).cast("double")
    ok = (denom_x > 0) & (denom_y > 0)
    tau = (F.col("nc") - F.col("nd")).cast("double") / F.sqrt(denom_x * denom_y)
    return agg.select(
        "group",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("n_concordant"),
        F.col("nd").cast("long").alias("n_discordant"),
        F.round(F.when(ok, tau), round_digits).alias("tau_b"),
    )


def kendall_tau_bounded_sql(
    table: str,
    group_by: str,
    x_col: str,
    y_col: str,
    key_col: str,
    sample_m: int = 60,
    x_digits: int = 2,
    y_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`kendall_tau_bounded` — identical md5
    sample, integer sign counting, and sqrt operands."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    hx = md5_int64_sql(f"CAST({key_col} AS VARCHAR) || chr(31) || 'kt'")
    return f"""
        WITH base AS (
          SELECT {group_by} AS grp, {key_col} AS k,
                 CAST(round({x_col} * {float(10**x_digits)}) AS BIGINT) AS x,
                 CAST(round({y_col} * {float(10**y_digits)}) AS BIGINT) AS y,
                 {hx} AS h
          FROM {table}
          WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL),
        sampled AS (
          SELECT grp, x, y,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY h, k, x, y) AS rk
          FROM base QUALIFY rk <= {sample_m}),
        pairs AS (
          SELECT a.grp,
                 CAST(sign(CAST(b.x - a.x AS DOUBLE))
                      * sign(CAST(b.y - a.y AS DOUBLE)) AS BIGINT) AS s,
                 CASE WHEN b.x = a.x THEN 1 ELSE 0 END AS tx,
                 CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS ty
          FROM sampled a JOIN sampled b
            ON a.grp = b.grp AND a.rk < b.rk),
        agg AS (
          SELECT grp, count(*) AS n_pairs,
                 sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS nc,
                 sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS nd,
                 sum(tx) AS ntx, sum(ty) AS nty
          FROM pairs GROUP BY grp)
        SELECT grp AS "group",
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(nc AS BIGINT) AS n_concordant,
               CAST(nd AS BIGINT) AS n_discordant,
               round(CASE WHEN n_pairs - ntx > 0 AND n_pairs - nty > 0 THEN
                 CAST(nc - nd AS DOUBLE)
                 / sqrt(CAST(n_pairs - ntx AS DOUBLE)
                        * CAST(n_pairs - nty AS DOUBLE)) END,
                 {round_digits}) AS tau_b
        FROM agg
    """


def shannon_entropy(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    term_digits: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Shannon entropy (bits) and evenness of a categorical
    mix — the log-scale companion of the Gini-impurity diversity
    (`agg_source_diversity`): H = -sum p_i*log2(p_i),
    evenness = H / log2(k).  Entropy separates a 99/1 split from 90/10
    where Gini compresses; evenness normalizes cross-group with
    different category counts.

    Cross-engine: p_i divides exact integers (one correctly-rounded
    double both engines agree on); each p*log2(p) term is quantized to
    a BIGINT at ``term_digits`` before the k-row sum (the PMI-query
    precedent for libm log parity — terms are O(1) so the quantization
    dominates any last-ulp log2 divergence), and the final rounding is
    two digits coarser.
    """
    qscale = float(10**term_digits)
    counts = df.where(F.col(cat_col).isNotNull()).groupBy(
        F.col(group_col).alias("group"), F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__n_c"))
    per = counts.select(
        "group",
        "__n_c",
        F.sum("__n_c").over(Window.partitionBy("group")).alias("__n"),
    )
    p = F.col("__n_c").cast("double") / F.col("__n").cast("double")
    term_q = F.round(p * F.log2(p) * F.lit(qscale)).cast("long")
    agg = per.groupBy("group").agg(
        F.max("__n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(term_q).alias("__h_q"),
    )
    h = -F.col("__h_q").cast("double") / F.lit(qscale)
    return agg.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(h, round_digits).alias("entropy_bits"),
        F.round(
            F.when(F.col("k") > 1, h / F.log2(F.col("k").cast("double"))),
            round_digits,
        ).alias("evenness"),
    )


def shannon_entropy_sql(
    table: str,
    group_col: str,
    cat_col: str,
    term_digits: int = 9,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`shannon_entropy`."""
    qscale = float(10**term_digits)
    return f"""
        WITH counts AS (
          SELECT {group_col} AS grp, {cat_col} AS c, count(*) AS n_c
          FROM {table} WHERE {cat_col} IS NOT NULL GROUP BY 1, 2),
        per AS (
          SELECT grp, n_c, sum(n_c) OVER (PARTITION BY grp) AS n
          FROM counts),
        agg AS (
          SELECT grp, max(n) AS n, count(*) AS k,
                 sum(CAST(round((CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE))
                       * log2(CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE))
                       * {qscale}) AS BIGINT)) AS h_q
          FROM per GROUP BY grp)
        SELECT grp AS "group", CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               round(-CAST(h_q AS DOUBLE) / {qscale}, {round_digits})
                 AS entropy_bits,
               round(CASE WHEN k > 1 THEN
                 (-CAST(h_q AS DOUBLE) / {qscale}) / log2(CAST(k AS DOUBLE))
                 END, {round_digits}) AS evenness
        FROM agg
    """


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    value_col: str,
    value_digits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group GINI COEFFICIENT of a non-negative quantity — the
    full Lorenz-curve inequality number (0 = equal, ->1 = one unit
    holds everything), where `agg_pareto_concentration` reports only
    the top-share point and `agg_source_diversity` the categorical
    impurity.  G = (2*sum(i*x_(i)) / (n*sum(x))) - (n+1)/n over values
    sorted ascending.

    Exact cross-engine: values quantize to scaled BIGINTs, the
    rank-weighted sum is one integer aggregate off one per-group rank
    window (ties rank arbitrarily but any permutation of equal values
    across a rank run leaves sum(i*x_i) unchanged), and the closing
    arithmetic is the identical double sequence.  NULL when the group
    sum is 0.
    """
    xs = _scaled(value_col, value_digits)
    base = df.where(F.col(f"`{value_col}`").isNotNull()).select(
        F.col(group_col).alias("group"), xs.alias("__x")
    )
    w = Window.partitionBy("group").orderBy(F.col("__x").asc())
    ranked = base.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__i") * F.col("__x")).alias("__ws"),
    )
    nd = F.col("n").cast("double")
    g = (
        F.lit(2.0) * F.col("__ws").cast("double") / (nd * F.col("__s").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return agg.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.round(F.when(F.col("__s") > 0, g), round_digits).alias("gini"),
    )


def gini_coefficient_sql(
    table: str,
    group_col: str,
    value_col: str,
    value_digits: int = 2,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`gini_coefficient`."""
    scale = float(10**value_digits)
    return f"""
        WITH base AS (
          SELECT {group_col} AS grp,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS x
          FROM {table} WHERE {value_col} IS NOT NULL),
        ranked AS (
          SELECT grp, x,
                 row_number() OVER (PARTITION BY grp ORDER BY x ASC) AS i
          FROM base),
        agg AS (
          SELECT grp, count(*) AS n, sum(x) AS s, sum(i * x) AS ws
          FROM ranked GROUP BY grp)
        SELECT grp AS "group", CAST(n AS BIGINT) AS n,
               round(CASE WHEN s > 0 THEN
                 2.0 * CAST(ws AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
                 END, {round_digits}) AS gini
        FROM agg
    """


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    term_digits: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """POPULATION STABILITY INDEX between a reference and a current
    sample of ``value_col`` — the credit-risk-standard drift number
    (rule of thumb: <0.1 stable, 0.1-0.25 shifting, >0.25 act)
    alongside the KS/TV/chi2 tests: PSI = sum (p_cur - p_ref) *
    ln(p_cur / p_ref) over bins cut at the REFERENCE deciles (exact
    percentiles), so the reference is uniform by construction and the
    score reads as pure current-side distortion.

    Empty-bin guard: counts are Laplace-smoothed (+1 per bin) — the
    standard way to keep ln finite that is also exactly reproducible
    (no epsilon literals to disagree on).  Each bin's term quantizes
    to a BIGINT at ``term_digits`` before the n_bins-row sum.

    Returns one row: ``n_ref, n_cur, psi`` plus the max single-bin
    contribution and its bin id (where the shift concentrates).
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = ref.agg(
        *[
            F.percentile(F.col(value_col), F.lit(q)).alias(f"__c{i}")
            for i, q in enumerate(qs)
        ]
    )

    def binned(df, name):
        b = F.lit(0)
        for i in range(len(qs)):
            b = b + F.when(F.col(value_col) > F.col(f"__c{i}"), 1).otherwise(0)
        return (
            df.where(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(cuts))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = binned(ref, "__nr")
    c = binned(cur, "__nc")
    bins = r.join(c, "bin", "full").select(
        "bin",
        F.coalesce(F.col("__nr"), F.lit(0)).alias("__nr"),
        F.coalesce(F.col("__nc"), F.lit(0)).alias("__nc"),
    )
    tot = bins.agg(
        F.sum("__nr").alias("__tr"), F.sum("__nc").alias("__tc")
    )
    qscale = float(10**term_digits)
    pr = (F.col("__nr") + F.lit(1)).cast("double") / (
        F.col("__tr") + F.lit(n_bins)
    ).cast("double")
    pc = (F.col("__nc") + F.lit(1)).cast("double") / (
        F.col("__tc") + F.lit(n_bins)
    ).cast("double")
    term = (pc - pr) * F.log(pc / pr)
    per = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "__tr",
        "__tc",
        F.round(term * F.lit(qscale)).cast("long").alias("__tq"),
    )
    agg = per.groupBy().agg(
        F.max("__tr").alias("n_ref"),
        F.max("__tc").alias("n_cur"),
        F.sum("__tq").alias("__psi_q"),
        F.max(F.struct(F.col("__tq"), F.col("bin"))).alias("__worst"),
    )
    return agg.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(F.col("__psi_q").cast("double") / F.lit(qscale), round_digits).alias(
            "psi"
        ),
        F.round(
            F.col("__worst.__tq").cast("double") / F.lit(qscale), round_digits
        ).alias("worst_bin_term"),
        F.col("__worst.bin").cast("long").alias("worst_bin"),
    )


def _split_sum(prod: Column, name: str) -> list[Column]:
    """Sum a per-row BIGINT product as (hi, lo) 30-bit halves — the
    :func:`grouped_regression` overflow discipline (:func:`_hi` /
    :func:`_lo`), packaged with the naming convention
    :func:`_split_val` reads back."""
    return [
        _hi(prod).alias(f"{name}_hi"),
        _lo(prod).alias(f"{name}_lo"),
    ]


def _split_val(name: str, descale: float) -> Column:
    return _recombine(f"{name}_hi", f"{name}_lo", descale)


def tukey_hsd(
    df: DataFrame,
    group_col: str,
    value_col: str,
    value_digits: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Tukey's HSD post-hoc pairwise q statistics after a one-way
    layout: ``q = |m_i - m_j| / sqrt(MSE/2 * (1/n_i + 1/n_j))`` with
    the pooled within-group MSE (the Tukey-Kramer unequal-n form).

    The data-sized pass is ONE keyed aggregate (n, sum, split sum of
    squares per group); the pairwise self-join rides the k-row group
    table — category-bounded, never data-sized.  Reported as q
    statistics (critical values are studentized-range table lookups, a
    presentation concern, not an engine one)."""
    xs = _scaled(value_col, value_digits)
    scale = float(10**value_digits)
    per = (
        df.select(F.col(group_col).alias("grp"), xs.alias("__xs"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__xs").alias("s"),
            *_split_sum(F.col("__xs") * F.col("__xs"), "q"),
        )
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double") / F.lit(scale)
    qd = _split_val("q", scale * scale)
    stats = per.select(
        "grp", "n", sd.alias("sm"), (qd - sd * sd / nd).alias("ss_within")
    )
    mse = stats.agg(
        (
            F.sum("ss_within")
            / (F.sum("n") - F.count(F.lit(1))).cast("double")
        ).alias("__mse"),
        F.count(F.lit(1)).alias("__k"),
        F.sum("n").alias("__nt"),
    )
    a = stats.alias("a")
    b = stats.alias("b")
    pairs = (
        a.join(b, F.col("a.grp") < F.col("b.grp"))
        .crossJoin(F.broadcast(mse))
    )
    m1 = F.col("a.sm") / F.col("a.n").cast("double")
    m2 = F.col("b.sm") / F.col("b.n").cast("double")
    se = F.sqrt(
        F.col("__mse")
        / 2.0
        * (1.0 / F.col("a.n").cast("double") + 1.0 / F.col("b.n").cast("double"))
    )
    return pairs.select(
        F.col("a.grp").alias("group_a"),
        F.col("b.grp").alias("group_b"),
        F.col("a.n").cast("long").alias("n_a"),
        F.col("b.n").cast("long").alias("n_b"),
        F.round(m1, digits).alias("mean_a"),
        F.round(m2, digits).alias("mean_b"),
        F.round(F.abs(m1 - m2) / se, digits).alias("q_stat"),
    ).orderBy("group_a", "group_b")


def cuped_adjust(
    df: DataFrame,
    treat: Column,
    metric_col: str,
    covariate_col: str,
    metric_digits: int = 2,
    cov_digits: int = 2,
    digits: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): regress the
    experiment metric on a pre-period covariate with the GLOBAL
    ``theta = cov(x, y) / var(x)``, report the raw and adjusted
    treatment effects plus the variance-reduction factor ``rho^2``.

    All second moments are split-BIGINT exact (one keyed aggregate per
    side plus one global); the epilogue is a dozen double ops."""
    ys = _scaled(metric_col, metric_digits)
    xs = _scaled(covariate_col, cov_digits)
    ysc, xsc = float(10**metric_digits), float(10**cov_digits)
    base = df.select(
        treat.cast("int").alias("__t"), ys.alias("__ys"), xs.alias("__xs")
    )
    agg = base.groupBy("__t").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__ys").alias("sy"),
        F.sum("__xs").alias("sx"),
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__ys").alias("sy"),
        F.sum("__xs").alias("sx"),
        *_split_sum(F.col("__xs") * F.col("__xs"), "qxx"),
        *_split_sum(F.col("__xs") * F.col("__ys"), "qxy"),
        *_split_sum(F.col("__ys") * F.col("__ys"), "qyy"),
    )
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double") / F.lit(ysc)
    sxd = F.col("sx").cast("double") / F.lit(xsc)
    cov_xy = _split_val("qxy", xsc * ysc) - sxd * syd / nd
    var_x = _split_val("qxx", xsc * xsc) - sxd * sxd / nd
    var_y = _split_val("qyy", ysc * ysc) - syd * syd / nd
    g = glob.select(
        (cov_xy / var_x).alias("__theta"),
        (cov_xy * cov_xy / (var_x * var_y)).alias("__rho2"),
        (sxd / nd).alias("__xbar"),
    )
    wide = (
        agg.crossJoin(F.broadcast(g))
        .select(
            "__t",
            F.col("n").cast("long").alias("n"),
            (F.col("sy").cast("double") / F.lit(ysc) / F.col("n").cast("double")).alias(
                "__my"
            ),
            (F.col("sx").cast("double") / F.lit(xsc) / F.col("n").cast("double")).alias(
                "__mx"
            ),
            "__theta",
            "__rho2",
            "__xbar",
        )
        .groupBy("__theta", "__rho2")
        .agg(
            F.sum(F.when(F.col("__t") == 1, F.col("n"))).alias("n_treat"),
            F.sum(F.when(F.col("__t") == 0, F.col("n"))).alias("n_ctrl"),
            F.sum(F.when(F.col("__t") == 1, F.col("__my"))).alias("my1"),
            F.sum(F.when(F.col("__t") == 0, F.col("__my"))).alias("my0"),
            F.sum(
                F.when(
                    F.col("__t") == 1,
                    F.col("__my") - F.col("__theta") * (F.col("__mx") - F.col("__xbar")),
                )
            ).alias("ma1"),
            F.sum(
                F.when(
                    F.col("__t") == 0,
                    F.col("__my") - F.col("__theta") * (F.col("__mx") - F.col("__xbar")),
                )
            ).alias("ma0"),
        )
    )
    return wide.select(
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        F.round(F.col("__theta"), digits).alias("theta"),
        F.round(F.col("my1") - F.col("my0"), digits).alias("raw_effect"),
        F.round(F.col("ma1") - F.col("ma0"), digits).alias("cuped_effect"),
        F.round(F.col("__rho2"), digits).alias("variance_reduction"),
    )


def diff_in_diff(
    df: DataFrame,
    treat: Column,
    post: Column,
    value_col: str,
    value_digits: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Difference-in-differences from the 2x2 cell means:
    ``DiD = (m_t,post - m_t,pre) - (m_c,post - m_c,pre)`` — exact
    integer cell sums, four double divisions, one subtraction tree."""
    xs = _scaled(value_col, value_digits)
    scale = float(10**value_digits)
    cells = df.select(
        treat.cast("int").alias("__t"), post.cast("int").alias("__p"), xs.alias("__xs")
    ).groupBy("__t", "__p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__xs").alias("s")
    )
    m = F.col("s").cast("double") / F.lit(scale) / F.col("n").cast("double")
    wide = cells.select("__t", "__p", F.col("n").alias("__n"), m.alias("__m")).groupBy().agg(
        F.sum(F.when((F.col("__t") == 1) & (F.col("__p") == 1), F.col("__m"))).alias("m_t_post"),
        F.sum(F.when((F.col("__t") == 1) & (F.col("__p") == 0), F.col("__m"))).alias("m_t_pre"),
        F.sum(F.when((F.col("__t") == 0) & (F.col("__p") == 1), F.col("__m"))).alias("m_c_post"),
        F.sum(F.when((F.col("__t") == 0) & (F.col("__p") == 0), F.col("__m"))).alias("m_c_pre"),
        F.sum(F.when(F.col("__t") == 1, F.col("__n")).otherwise(0)).alias("n_treat"),
        F.sum(F.when(F.col("__t") == 0, F.col("__n")).otherwise(0)).alias("n_ctrl"),
    )
    return wide.select(
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        F.round(F.col("m_t_pre"), digits).alias("m_treat_pre"),
        F.round(F.col("m_t_post"), digits).alias("m_treat_post"),
        F.round(F.col("m_c_pre"), digits).alias("m_ctrl_pre"),
        F.round(F.col("m_c_post"), digits).alias("m_ctrl_post"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            digits,
        ).alias("did"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Mutual information (nats) + normalized MI between two
    categorical columns, from exact joint counts:
    ``MI = sum_ij (n_ij/n) ln(n*n_ij / (n_i*n_j))``,
    ``NMI = MI / sqrt(H_x * H_y)``.

    One data-sized keyed aggregate; the ln epilogue rides the
    category-product-bounded cell table."""
    joint = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__nij"))
    mx = joint.groupBy("__x").agg(F.sum("__nij").alias("__ni"))
    my = joint.groupBy("__y").agg(F.sum("__nij").alias("__nj"))
    tot = joint.agg(F.sum("__nij").alias("__n"))
    cells = (
        joint.join(mx, "__x").join(my, "__y").crossJoin(F.broadcast(tot))
    )
    nd = F.col("__n").cast("double")
    mi_term = (
        F.col("__nij").cast("double")
        / nd
        * F.log(
            nd
            * F.col("__nij").cast("double")
            / (F.col("__ni").cast("double") * F.col("__nj").cast("double"))
        )
    )
    hx_term = -(
        F.col("__nij").cast("double") / nd
    ) * F.log(F.col("__ni").cast("double") / nd)
    hy_term = -(
        F.col("__nij").cast("double") / nd
    ) * F.log(F.col("__nj").cast("double") / nd)
    agg = cells.agg(
        F.first("__n").alias("__nt"),
        F.sum(mi_term).alias("__mi"),
        F.sum(hx_term).alias("__hx"),
        F.sum(hy_term).alias("__hy"),
    )
    return agg.select(
        F.col("__nt").cast("long").alias("n"),
        F.round(F.col("__mi"), digits).alias("mi_nats"),
        F.round(F.col("__hx"), digits).alias("h_x"),
        F.round(F.col("__hy"), digits).alias("h_y"),
        F.round(F.col("__mi") / F.sqrt(F.col("__hx") * F.col("__hy")), digits).alias(
            "nmi"
        ),
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    digits_x: int = 2,
    digits_y: int = 2,
    digits_z: int = 2,
    digits: int = 6,
) -> DataFrame:
    """First-order partial correlation of x and y controlling z:
    ``r_xy.z = (r_xy - r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2))`` —
    all three Pearson terms from ONE pass of split-BIGINT moments."""
    xs = _scaled(x_col, digits_x)
    ys = _scaled(y_col, digits_y)
    zs = _scaled(z_col, digits_z)
    xsc, ysc, zsc = (float(10**d) for d in (digits_x, digits_y, digits_z))
    base = df.select(xs.alias("__x"), ys.alias("__y"), zs.alias("__z"))
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum("__z").alias("sz"),
        *_split_sum(F.col("__x") * F.col("__x"), "qxx"),
        *_split_sum(F.col("__y") * F.col("__y"), "qyy"),
        *_split_sum(F.col("__z") * F.col("__z"), "qzz"),
        *_split_sum(F.col("__x") * F.col("__y"), "qxy"),
        *_split_sum(F.col("__x") * F.col("__z"), "qxz"),
        *_split_sum(F.col("__y") * F.col("__z"), "qyz"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double") / F.lit(xsc)
    syd = F.col("sy").cast("double") / F.lit(ysc)
    szd = F.col("sz").cast("double") / F.lit(zsc)
    cxy = _split_val("qxy", xsc * ysc) - sxd * syd / nd
    cxz = _split_val("qxz", xsc * zsc) - sxd * szd / nd
    cyz = _split_val("qyz", ysc * zsc) - syd * szd / nd
    vx = _split_val("qxx", xsc * xsc) - sxd * sxd / nd
    vy = _split_val("qyy", ysc * ysc) - syd * syd / nd
    vz = _split_val("qzz", zsc * zsc) - szd * szd / nd
    rxy = cxy / F.sqrt(vx * vy)
    rxz = cxz / F.sqrt(vx * vz)
    ryz = cyz / F.sqrt(vy * vz)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(rxy, digits).alias("r_xy"),
        F.round(rxz, digits).alias("r_xz"),
        F.round(ryz, digits).alias("r_yz"),
        F.round(
            (rxy - rxz * ryz)
            / F.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)),
            digits,
        ).alias("r_xy_given_z"),
    )


def sprt_boundary(
    df: DataFrame,
    group_by: list[str],
    order_cols: list[str],
    success: Column,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    digits: int = 6,
) -> DataFrame:
    """Wald's sequential probability ratio test over an ordered
    Bernoulli stream, per group: cumulative log-likelihood ratio
    ``LLR_n = k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0))`` with stopping
    boundaries ``A = ln((1-beta)/alpha)`` (accept H1) and
    ``B = ln(beta/(1-alpha))`` (accept H0); reports the first crossing.

    Determinism: the cumulative k and n are exact window integers, the
    LLR is ``k*c1 + (n-k)*c2`` with two double constants — no floating
    accumulation.  The ordered window is per-group over an inherently
    sequential semantic (the same contract as ``ts_cusum_shift``);
    at 100 TB each group is one decision stream, keyed and bounded."""
    import math

    c1 = math.log(p1 / p0)
    c2 = math.log((1 - p1) / (1 - p0))
    a_bound = math.log((1 - beta) / alpha)
    b_bound = math.log(beta / (1 - alpha))
    w = (
        Window.partitionBy(*group_by)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = df.select(
        *group_by,
        *order_cols,
        success.cast("long").alias("__s"),
    ).select(
        *group_by,
        F.sum("__s").over(w).alias("__k"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    llr = (
        F.col("__k").cast("double") * F.lit(c1)
        + (F.col("__n") - F.col("__k")).cast("double") * F.lit(c2)
    )
    crossed = seq.select(
        *group_by,
        "__n",
        "__k",
        llr.alias("__llr"),
        F.when(llr >= a_bound, F.lit("accept_h1"))
        .when(llr <= b_bound, F.lit("accept_h0"))
        .alias("__dec"),
    ).where(F.col("__dec").isNotNull())
    first = crossed.groupBy(*group_by).agg(
        F.min(F.struct("__n", "__k", "__llr", "__dec")).alias("__f")
    )
    return first.select(
        *group_by,
        F.col("__f.__n").cast("long").alias("n_at_decision"),
        F.col("__f.__k").cast("long").alias("k_at_decision"),
        F.round(F.col("__f.__llr"), digits).alias("llr"),
        F.col("__f.__dec").alias("decision"),
    )
