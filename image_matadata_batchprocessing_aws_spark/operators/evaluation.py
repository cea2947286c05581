"""Model-evaluation aggregates (extends SURVEY section 2.4).

The reference evaluates its trained model with a single rowwise
Euclidean-distance aggregate (``train.py:136-140``); these operators
are the other half of a training pipeline's eval loop, computed IN the
engine over arbitrarily large prediction tables instead of driver-side
numpy: threshold-free ranking quality (ROC AUC via the tie-corrected
Mann-Whitney rank-sum) and probability-calibration diagnostics
(reliability bins / expected calibration error).

Cross-engine determinism: AUC is an EXACT rational in the rank sums —
ranks are integers, tie groups contribute their integer average rank
(``2*rank + ties - 1`` halves, kept doubled so everything stays BIGINT
until one final double division).  Calibration bins quantize the
probability to a bin index with integer flooring; per-bin means are
single double divisions of exact sums.  No floating accumulation
anywhere, so partition order cannot change a bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
    out: str = "auc",
) -> DataFrame:
    """Area under the ROC curve per group, exactly, in two exchanges.

    ``label_col`` must be a 0/1 integer column; higher ``score_col``
    should predict label 1.  Tied scores count half (the standard
    Mann-Whitney tie treatment), so AUC equals the probability a random
    positive outranks a random negative, ties splitting the credit.

    Scale shape: NEVER a row-level rank window (that sorts each whole
    group inside one partition — the keyless-window landmine at 100 TB).
    Instead the data-sized pass is a partial-agg ``groupBy(keys,
    score)`` — map-side combine shrinks it to distinct scores — and the
    prefix-sum window rides the aggregated per-score table, whose
    cardinality is bounded by distinct score values, not row count.
    U-statistic form: ``U2 = sum_s p_s * (2*cumneg_below(s) + n_s)``
    (doubled to stay integral), ``AUC = U2 / (2*P*N)`` — one final
    double division of exact BIGINT sums.  Groups with a single class
    yield NULL rather than a division by zero.
    """
    keys = list(group_by)
    per_score = df.groupBy(*keys, F.col(score_col).alias("__s")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__n"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn("__cumneg", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    agg = cum.groupBy(*keys).agg(
        F.sum(F.col("__p") * (2 * F.col("__cumneg") + F.col("__n"))).alias("__u2"),
        F.sum("__p").alias("n_pos"),
        F.sum("__n").alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u2").cast("double") / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return agg.select(
        *keys,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(auc, 6).alias(out),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] probability column.

    Returns one row per non-empty bin: ``bin`` (0-based), ``n``, the
    mean predicted probability (``confidence``), the empirical positive
    rate (``accuracy``), the signed ``gap`` (confidence - accuracy) and
    the bin's ``weight`` (share of rows) — ``sum(weight * abs(gap))``
    is the expected calibration error, left to the caller so the result
    stays single-grain.

    Scale shape: pure map-side bin assignment then one partial-agg
    groupBy on the bin index; probabilities are quantized to 1e-6
    BIGINTs before summing so the per-bin mean is an exact-integer sum
    divided once.
    """
    p6 = F.round(F.col(prob_col) * 1000000.0).cast("long")
    bin_idx = F.least(F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)).cast("long")
    total = df.agg(F.count("*").alias("__n_total"))
    binned = df.select(
        bin_idx.alias("bin"),
        p6.alias("__p6"),
        F.col(label_col).cast("long").alias("__y"),
    )
    agg = (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("__p6").alias("__sp6"),
            F.sum("__y").alias("__sy"),
        )
        .crossJoin(F.broadcast(total))
    )
    conf = F.col("__sp6").cast("double") / F.col("n").cast("double") / 1000000.0
    acc = F.col("__sy").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.round(conf, 6).alias("confidence"),
        F.round(acc, 6).alias("accuracy"),
        F.round(conf - acc, 6).alias("gap"),
        F.round(F.col("n").cast("double") / F.col("__n_total").cast("double"), 6).alias(
            "weight"
        ),
    )
