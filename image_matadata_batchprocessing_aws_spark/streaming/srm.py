"""Streaming sample-ratio-mismatch (SRM) guardrail.

The first trust check of a live experiment: per (day, variant) arrival
counts against the designed split, kept exactly over an unbounded
stream.  Counts are the simplest mergeable state there is (integer
sums; associative/commutative), so each micro-batch folds into the
carried (day, variant) table and the readout after any stream prefix
equals the batch query over the same rows bit for bit — the staged
``stream_srm_guardrail`` batch twin computes the identical chi-squared
closed form ``k * S2 / n - n`` from the identical integers.

Replay idempotency is structural, the ``streaming/engagement.py`` /
``streaming/ivm.py`` recipe: each epoch writes merged state to its own
``batch_id=<epoch>`` parquet partition with overwrite, and state reads
take the LATEST partition strictly before the current epoch, so
re-running an epoch after a crash reproduces identical state.

Scale notes: state is one row per ACTIVE (day, variant) — bounded by
the calendar times the variant count, NOT by traffic; the per-epoch
merge is one keyed sum whose shuffle key is (day, variant).  At 100 TB
the same keyed state moves into the state store via
``applyInPandasWithState`` (the house pattern in
``streaming/stateful.py``); the parquet-partition form keeps the state
inspectable and the replay contract testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.streaming.sampling import (
    _read_latest_state,
)


def day_variant_counts(events: DataFrame) -> DataFrame:
    """The state grain: (day_ms, variant, obs) with variant = the
    deterministic odd/even user split.  Works identically on a batch
    frame and a micro-batch (one keyed groupBy; map-side partials)."""
    return (
        events.where(F.col("user_id").isNotNull())
        .select(
            F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
            (F.col("user_id") % 2).alias("variant"),
        )
        .groupBy("day_ms", "variant")
        .agg(F.count(F.lit(1)).alias("obs"))
    )


#: Chi-squared critical values at p=0.001 by df=k-1 — so the default
#: breach threshold tracks the variant count instead of silently
#: testing k>2 experiments against the df=1 value (ADVICE r7).
_CHI2_CRIT_P001 = {
    1: 10.828,
    2: 13.816,
    3: 16.266,
    4: 18.467,
    5: 20.515,
    6: 22.458,
    7: 24.322,
    8: 26.124,
    9: 27.877,
}


def srm_readout(
    counts: DataFrame, k: int = 2, crit: float | None = None
) -> DataFrame:
    """Close the guardrail from the state: per-day n, the exact
    ``k*S2/n - n`` chi-squared, and the breach flag.  ``crit`` defaults
    to the df=k-1 critical value at p=0.001 (table above); a k outside
    the table requires an explicit ``crit``.  Pure integer sums until
    one float expression — the ``stream_srm_guardrail`` arithmetic
    exactly."""
    if crit is None:
        if k - 1 not in _CHI2_CRIT_P001:
            raise ValueError(
                f"no built-in p=0.001 critical value for k={k} variants "
                f"(df={k - 1}); pass crit= explicitly"
            )
        crit = _CHI2_CRIT_P001[k - 1]
    day = counts.groupBy("day_ms").agg(
        F.sum("obs").cast("long").alias("n"),
        F.sum(F.col("obs") * F.col("obs")).alias("__s2"),
    )
    chi2 = float(k) * F.col("__s2") / F.col("n") - F.col("n")
    return day.select(
        "day_ms",
        "n",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > crit).cast("long").alias("srm_flag"),
    )


def start_srm_guardrail_sink(
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "srm_guardrail",
):
    """Maintain the exact (day, variant) count state under
    ``{state_dir}/batch_id=<epoch>``; ``srm_readout`` over the latest
    partition is always the live guardrail of everything seen."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        delta = day_variant_counts(df)
        prev = _read_latest_state(spark, state_dir, epoch_id, delta)
        merged = (
            prev.unionByName(delta)
            .groupBy("day_ms", "variant")
            .agg(F.sum("obs").alias("obs"))
        )
        merged.write.mode("overwrite").parquet(f"{state_dir}/batch_id={epoch_id}")

    return (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
