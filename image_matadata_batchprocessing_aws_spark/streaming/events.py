"""Structured Streaming surface over the events table (SURVEY section 2.9).

The reference is batch-only; its closest streaming analogues are
incremental chunk processing with delete-after-consume (S1/S13) and
resumable part numbering (W2).  This module is the engine extension:
file-replayed ``readStream`` -> watermarked windowed aggregations ->
``foreachBatch`` numbered sink (the A9 batch-counter semantics, made
exactly-once by Spark's epoch id).

The batch twins of every aggregation here live in
``queries/streaming_batch.py`` and are DuckDB-oracle-checked; tests
assert stream-vs-batch equivalence on the same input.

Scale notes: watermarks bound state (late rows beyond the delay are
dropped); session windows use the native ``session_window`` operator so
state merges run in the state store, not the driver; sinks write
partitioned parquet per epoch — no single-writer bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.schemas import EVENTS_SCHEMA


def read_events_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of an events parquet directory.

    Expects microsecond/millisecond timestamps (for the driver's
    nanos-typed table, re-materialize via ``load_table`` + write first —
    see tests).  ``maxFilesPerTrigger`` gives deterministic micro-batch
    replay for tests.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "n", "sum_value")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows (gap-merged in the state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: every (purchase, click) pair by the same
    user where the click happened within ``max_delay`` BEFORE the
    purchase (inclusive) — ad-attribution semantics.

    State is bounded on both sides: each input is watermarked and the
    join condition constrains both event times, so Spark evicts buffered
    rows once the watermark passes ``ts + max_delay`` (without the
    two-sided time-range predicate a stream-stream join must buffer one
    side forever).  ``withWatermark`` is a no-op in batch, so the same
    function is the oracle-checked batch twin (`stream_join_attribution`).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"click_user = user_id AND "
        f"click_ts BETWEEN purchase_ts - INTERVAL {max_delay} AND purchase_ts"
    )
    return p.join(c, cond, "inner").select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_millis("purchase_ts") - F.unix_millis("click_ts")).alias("lag_ms"),
        F.round("value", 2).alias("value"),
    )


def attribution_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream LEFT OUTER attribution: every purchase emits —
    attributed ones paired with their in-window clicks, ORGANIC ones
    (no click within ``max_delay``) null-extended.  The outer side is
    the semantics the inner join can't give: conversion reports need
    the unattributed denominator.

    The streaming subtlety the inner form doesn't have: an unmatched
    purchase can only emit once the joint watermark proves no matching
    click can still arrive, so organic rows trail the data by the
    watermark delay — and a FINITE replay must push the watermark past
    its last purchase (a far-future flush event on BOTH inputs) or the
    tail's organic rows never surface (the stream==batch test
    demonstrates exactly this with a sentinel flush chunk).  Both
    sides stay watermarked and the join condition bounds both event
    times, so state eviction matches the inner form.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"click_user = user_id AND "
        f"click_ts BETWEEN purchase_ts - INTERVAL {max_delay} AND purchase_ts"
    )
    return p.join(c, cond, "leftOuter").select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_millis("purchase_ts") - F.unix_millis("click_ts")).alias("lag_ms"),
        F.round("value", 2).alias("value"),
        F.col("click_id").isNotNull().alias("attributed"),
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    *current* state of the static side (Spark re-evaluates the batch plan
    per trigger, so a dimension backed by a parquet path picks up table
    updates between triggers — no restart).  The dim side is explicitly
    broadcast: stream-side state stays zero, no shuffle of the stream."""
    return stream.join(F.broadcast(dim), key, how)


def dedup_against_corpus(
    stream: DataFrame, corpus: DataFrame, keys: list[str]
) -> DataFrame:
    """Streaming incremental-ingest dedup: drop stream rows whose key
    combination already exists in the settled corpus — the streaming
    half of ``operators.dedup.incremental_dedup_report``'s exact stage.
    A stream-static LEFT ANTI join: the corpus key set broadcasts (it is
    re-read per trigger, so corpus growth between triggers is picked
    up), stream-side state stays zero, and the stream never shuffles.
    At 100 TB the static side should be the corpus's key/hash TABLE
    (content hashes, not text) — distinct-key-sized, not corpus-sized."""
    corpus_keys = corpus.select(*keys).distinct()
    return stream.join(F.broadcast(corpus_keys), keys, "left_anti")


def start_numbered_batch_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "numbered_sink",
):
    """foreachBatch sink mirroring the reference's numbered batch files
    (A9/W2): each micro-batch writes ``batch_id=<epoch>`` parquet,
    idempotent under replay (epoch id is stable, mode=overwrite on the
    epoch's own partition directory)."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def curate_stream(
    stream: DataFrame,
    corpus: DataFrame,
    rate_num: int = 7,
    rate_den: int = 10,
) -> DataFrame:
    """The pretraining-corpus builder as a LIVE pipeline — the streaming
    twin of ``queries.pipeline.pipeline_pretraining_corpus``'s shape:
    quality gate (map-side predicates) -> dedup against the settled
    corpus (stream-static broadcast anti-join, zero stream state) ->
    deterministic hash sampling (md5 rate gate, map-side).  Every stage
    is stateless per micro-batch, so the composition runs under
    ``readStream`` with append output and NO watermark bookkeeping —
    exactly which rows survive is a pure function of the row and the
    corpus, which is what makes the stream==batch equivalence testable
    (and the batch twin oracle-checkable)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    q = stream.where(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > 1.0)
    ).withColumn("hr", F.date_trunc("hour", "ts"))
    d = dedup_against_corpus(q, corpus, ["user_id", "event_type", "hr"])
    return d.where(
        md5_int64(F.col("event_id").cast("string")) % F.lit(rate_den) < F.lit(rate_num)
    )


def event_type_predictor(value_col: str = "value") -> Column:
    """Deterministic stand-in classifier: predict the event type from
    fixed value bands — shared by the live windowed-confusion stream
    and its batch twin so the two can't drift."""
    v = F.col(value_col)
    return (
        F.when(v < 20, "view")
        .when(v < 35, "click")
        .when(v < 60, "signup")
        .when(v < 100, "purchase")
        .otherwise("error")
    )


def windowed_confusion_cells(
    events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-window (pred, truth) confusion CELLS as the single streaming
    aggregation — the stream side of a live model-quality monitor.
    Finishing metrics (per-class P/R/F1) are a cells-sized
    re-aggregation downstream (``evaluation.confusion_metrics``
    grouped by the window), run in foreachBatch or on the sink table.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", width).alias("w"),
            event_type_predictor().alias("pred"),
            F.col("event_type").alias("truth"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "pred",
            "truth",
            "n",
        )
    )
