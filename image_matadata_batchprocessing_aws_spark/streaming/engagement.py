"""Streaming engagement panel (mergeable day-bitmap sketch).

The live DAU/MAU/growth dashboard over an UNBOUNDED event stream, kept
exactly: per (calendar month, user) the state is ONE BIGINT whose bit
``d-1`` is set iff the user was active on day-of-month ``d`` — months
have <= 31 days, so the entire month of per-user daily activity
compresses into a single long.  The bitmap is mergeable (``OR`` is
associative/commutative/idempotent), so each micro-batch folds into the
carried state and the panel after any stream prefix equals the batch
query over the same rows bit for bit — the same mergeability argument
as the bottom-k sample (``streaming/sampling.py``), with ``bit_or``
playing the role of min-k.

Every engagement number the batch ``agg_dau_mau`` family reports is a
pure function of this state:

- ``mau``        = rows per month (distinct active users);
- ``n_days``     = ``bit_count(bit_or(day_bits))`` — observed days;
- ``dau_total``  = ``sum(bit_count(day_bits))`` — Σ over days of that
  day's distinct actives (each set bit IS one (user, day) active);
- ``avg_dau``, ``stickiness_permille`` — integer ``div`` closes, the
  ``agg_dau_mau`` arithmetic exactly.

Replay idempotency is structural, same recipe as ``streaming/ivm.py``
and ``streaming/sampling.py``: each epoch writes the merged state to its
own ``batch_id=<epoch>`` partition with overwrite, and state reads take
the LATEST partition strictly before the current epoch, so re-running
an epoch after a crash reproduces identical state.

Scale notes: state is one row per ACTIVE (month, user) — the compressed
exact form (<= 1/31 of the raw (user, day) grain); the per-epoch merge
is one keyed ``bit_or`` groupBy whose shuffle key is (month, user), so
it partitions by user and never concentrates.  At 100 TB the epoch
snapshot write is the cost to watch — production would sink the same
keyed state into Spark's state store via
``applyInPandasWithState`` (the house pattern in
``streaming/stateful.py``); the parquet-partition form here keeps the
state inspectable and the replay contract testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.streaming.sampling import (
    _read_latest_state,
)

#: bit d-1 of the month bitmap <=> active on day-of-month d (1-based)
_DAY_BIT = "shiftleft(CAST(1 AS BIGINT), dayofmonth(ts) - 1)"


def user_day_bits(events: DataFrame) -> DataFrame:
    """The state grain: (month_ms, user_id, day_bits) with one set bit
    per active day-of-month.  Works identically on a batch frame and a
    micro-batch (one keyed groupBy; map-side partial ``bit_or``)."""
    return (
        events.where(F.col("user_id").isNotNull())
        .select(
            F.unix_millis(F.date_trunc("month", "ts")).alias("month_ms"),
            "user_id",
            F.expr(_DAY_BIT).alias("__bit"),
        )
        .groupBy("month_ms", "user_id")
        .agg(F.bit_or("__bit").alias("day_bits"))
    )


def engagement_panel(bits: DataFrame) -> DataFrame:
    """Finish the panel from the state: month-grain MAU / observed days /
    DAU total / avg DAU / stickiness, all in exact integer arithmetic
    (the ``agg_dau_mau`` closing recipe)."""
    return (
        bits.groupBy("month_ms")
        .agg(
            F.count(F.lit(1)).cast("long").alias("mau"),
            F.bit_count(F.bit_or("day_bits")).cast("long").alias("n_days"),
            F.sum(F.bit_count("day_bits")).cast("long").alias("dau_total"),
        )
        .select(
            "month_ms",
            "mau",
            "n_days",
            "dau_total",
            F.expr("dau_total div n_days").cast("long").alias("avg_dau"),
            F.expr("dau_total * 1000 div (n_days * mau)")
            .cast("long")
            .alias("stickiness_permille"),
        )
    )


def start_engagement_panel_sink(
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "engagement_panel",
):
    """Maintain the exact (month, user) day-bitmap state under
    ``{state_dir}/batch_id=<epoch>``; ``engagement_panel`` over the
    latest partition is always the live dashboard of everything seen."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        delta = user_day_bits(df)
        prev = _read_latest_state(spark, state_dir, epoch_id, delta)
        merged = (
            prev.unionByName(delta)
            .groupBy("month_ms", "user_id")
            .agg(F.bit_or("day_bits").alias("day_bits"))
        )
        merged.write.mode("overwrite").parquet(f"{state_dir}/batch_id={epoch_id}")

    return (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
