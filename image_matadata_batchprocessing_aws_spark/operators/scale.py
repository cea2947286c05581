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
