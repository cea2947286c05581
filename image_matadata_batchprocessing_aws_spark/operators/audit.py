"""Null auditing / data-quality gates (SURVEY A6/A7, P5, S12).

The reference logs per-column null counts per chunk
(``Image_Train_Model/read_csv_s3_train.py:86-94,111-116``) and hard-asserts
zero missing on the final table (``:136-139``).  One aggregate computes
every column's null count in a single pass (map-side partials — no extra
scans per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def null_audit(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: per-column null counts (A6)."""
    cols = cols or df.columns
    return df.agg(
        *[
            F.count(F.when(F.col(f"`{c}`").isNull(), F.lit(1))).alias(c)
            for c in cols
        ]
    )


def total_nulls(df: DataFrame, cols: list[str] | None = None) -> int:
    """Total missing cells across columns (driver-side scalar)."""
    cols = cols or df.columns
    row = df.agg(
        F.sum(
            sum((F.col(f"`{c}`").isNull().cast("long") for c in cols), F.lit(0))
        ).alias("total")
    ).collect()[0]
    return int(row["total"] or 0)


def expect_no_nulls(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Quality gate: raise if any nulls remain (A7 — the
    ``assert total_missing == 0`` at ``read_csv_s3_train.py:136-139``)."""
    n = total_nulls(df, cols)
    if n != 0:
        raise AssertionError(f"expect_no_nulls: {n} missing values remain")
    return df


def null_rows(df: DataFrame, col: str) -> DataFrame:
    """P5 — rows where ``col`` is null (``read_csv_s3_train.py:93``)."""
    return df.filter(F.col(f"`{col}`").isNull())


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Privacy audit: quasi-identifier combinations whose group is
    smaller than ``k`` — each returned row is an equivalence class that
    re-identifies its members (k-anonymity, Sweeney 2002).  A release
    gate joins these combos back to suppress or generalize them.

    Scale shape: one partial-agg groupBy on the quasi-identifier tuple;
    the filter keeps only the risky (small!) classes, so the output is
    bounded by the violation count, not the table.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_size"))
        .where(F.col("group_size") < k)
        .select(*quasi_cols, F.col("group_size").cast("long").alias("group_size"))
    )
