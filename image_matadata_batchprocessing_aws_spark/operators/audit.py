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


def expectations_report(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Deequ/Great-Expectations-style constraint suite as ONE aggregate
    pass: each rule contributes a violation-count expression to a single
    ``agg`` (map-side partials, no per-rule scans), then the flat result
    unpivots into a (rule, column, violations, passed) report.

    Rules (tuples):
      ("not_null", col)            — null values
      ("unique", col)              — non-null duplicates (count - distinct)
      ("in_range", col, lo, hi)    — values outside [lo, hi]
      ("in_set", col, values)      — values outside the allowed set
      ("matches", col, regex)      — non-null values not matching
      ("min_rows", n)              — table smaller than n (violations =
                                     shortfall)

    Scale: unique-rules add count_distinct to the same aggregate (one
    expand, still a single job); everything else is a conditional count.
    The report is rule-count sized."""
    exprs = []
    meta = []  # (rule_name, column, kind)
    for i, rule in enumerate(rules):
        kind = rule[0]
        if kind == "not_null":
            _, c = rule
            exprs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"v{i}"))
            meta.append((kind, c))
        elif kind == "unique":
            _, c = rule
            exprs.append(
                (F.count(F.col(c)) - F.count_distinct(F.col(c))).alias(f"v{i}")
            )
            meta.append((kind, c))
        elif kind == "in_range":
            _, c, lo, hi = rule
            exprs.append(
                F.count(
                    F.when((F.col(c) < lo) | (F.col(c) > hi), 1)
                ).alias(f"v{i}")
            )
            meta.append((kind, c))
        elif kind == "in_set":
            _, c, values = rule
            exprs.append(
                F.count(
                    F.when(~F.col(c).isin(list(values)) | F.col(c).isNull(), 1)
                ).alias(f"v{i}")
            )
            meta.append((kind, c))
        elif kind == "matches":
            _, c, pattern = rule
            exprs.append(
                F.count(
                    F.when(F.col(c).isNotNull() & ~F.col(c).rlike(pattern), 1)
                ).alias(f"v{i}")
            )
            meta.append((kind, c))
        elif kind == "min_rows":
            _, n = rule
            exprs.append(
                F.greatest(F.lit(0).cast("long"), F.lit(n) - F.count(F.lit(1)))
                .alias(f"v{i}")
            )
            meta.append((kind, "*"))
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
    flat = df.agg(*exprs)
    stacked = flat.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("rule"),
                        F.lit(c).alias("column"),
                        F.col(f"v{i}").cast("long").alias("violations"),
                    )
                    for i, (k, c) in enumerate(meta)
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule", "r.column", "r.violations",
        (F.col("r.violations") == 0).alias("passed"),
    )
