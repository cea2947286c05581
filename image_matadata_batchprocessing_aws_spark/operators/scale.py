"""Two-pass global scalers (SURVEY A2/A3).

The reference fits StandardScaler per 100k-row chunk
(``Image_Train_Model/read_csv_s3_train.py:107-109``) — different chunks
scaled by different statistics — and MinMaxScaler over the whole matrix at
train time (``train.py:124,127``).  Engine semantics: **global** fit
(pass 1: one tiny aggregate row), then transform (pass 2: map-side only,
statistics broadcast via a literal crossJoin of the 1-row stats frame —
no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zscore_scale(df: DataFrame, cols: list[str], suffix: str = "") -> DataFrame:
    """``(x - mean) / stddev_samp`` per column, globally fit (A3)."""
    stats = df.agg(
        *[F.avg(F.col(f"`{c}`")).alias(f"__mean_{c}") for c in cols],
        *[F.stddev_samp(F.col(f"`{c}`")).alias(f"__std_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c + suffix,
            (F.col(f"`{c}`") - F.col(f"__mean_{c}")) / F.col(f"__std_{c}"),
        )
    return out.drop(*[f"__mean_{c}" for c in cols], *[f"__std_{c}" for c in cols])


def zscore_scale_exact(df: DataFrame, cols: list[str], suffix: str = "") -> DataFrame:
    """Cross-engine-deterministic z-score (A3, oracle-parity variant).

    ``avg``/``stddev_samp`` over doubles are FP-accumulation-order
    dependent: Spark's partial aggregates combine in partition order, so
    the fitted statistics drift by an ulp as parallelism changes — enough
    to flip a ``round(z, 4)`` boundary digit vs DuckDB (round-1 driver
    failure).  This variant computes the sufficient statistics as EXACT
    decimal sums (decimal addition is associative — any accumulation
    order yields the same value), converts once to double, and derives
    mean/std driver-side-free with scalar IEEE ops:

        mean = double(sum_dec) / n
        std  = sqrt((double(sumsq_dec) - double(sum_dec)^2 / n) / (n - 1))

    Identical decimal sums => identical doubles => identical per-row z on
    any engine that follows IEEE-754 (DuckDB does).  The decimal cast per
    row rounds a double to 10 fractional digits — deterministic and
    engine-agnostic; decimal(38,10) leaves 28 integer digits of headroom
    for the sum of squares.
    """
    aggs = []
    for c in cols:
        col = F.col(f"`{c}`")
        aggs += [
            F.sum(col.cast("decimal(38,10)")).alias(f"__s_{c}"),
            F.sum((col * col).cast("decimal(38,10)")).alias(f"__ss_{c}"),
            F.count(col).alias(f"__n_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        s = F.col(f"__s_{c}").cast("double")
        ss = F.col(f"__ss_{c}").cast("double")
        n = F.col(f"__n_{c}").cast("double")
        mean = s / n
        std = F.sqrt((ss - s * s / n) / (n - F.lit(1.0)))
        out = out.withColumn(c + suffix, (F.col(f"`{c}`") - mean) / std)
    return out.drop(
        *[f"__s_{c}" for c in cols],
        *[f"__ss_{c}" for c in cols],
        *[f"__n_{c}" for c in cols],
    )


def robust_scale(df: DataFrame, cols: list[str], suffix: str = "") -> DataFrame:
    """``(x - median) / IQR`` per column, globally fit — the
    outlier-resistant member of the scaler family (a single extreme value
    shifts mean/min/max arbitrarily but not the quartiles).  Uses Spark's
    EXACT interpolated ``percentile`` (matches DuckDB ``quantile_cont``
    bit-for-bit, so fully oracle-able); at 100 TB swap in
    ``percentile_approx`` and accept the documented error bound — the
    two-pass broadcast structure is identical."""
    stats = df.agg(
        *[F.percentile(F.col(f"`{c}`"), F.lit(0.5)).alias(f"__med_{c}") for c in cols],
        *[
            (
                F.percentile(F.col(f"`{c}`"), F.lit(0.75))
                - F.percentile(F.col(f"`{c}`"), F.lit(0.25))
            ).alias(f"__iqr_{c}")
            for c in cols
        ],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c + suffix,
            (F.col(f"`{c}`") - F.col(f"__med_{c}")) / F.col(f"__iqr_{c}"),
        )
    return out.drop(*[f"__med_{c}" for c in cols], *[f"__iqr_{c}" for c in cols])


def minmax_scale(df: DataFrame, cols: list[str], suffix: str = "") -> DataFrame:
    """``(x - min) / (max - min)`` per column, globally fit (A2;
    mirrors ``train.py:124,127``)."""
    stats = df.agg(
        *[F.min(F.col(f"`{c}`")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(f"`{c}`")).alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c + suffix,
            (F.col(f"`{c}`") - F.col(f"__min_{c}"))
            / (F.col(f"__max_{c}") - F.col(f"__min_{c}")),
        )
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
