"""Batching / splitting sinks (SURVEY A9, W2, S4, F6).

The reference emits fixed-size batches with mutable global counters
(200-image ``.pt`` batches, ``process_test_train_Images.py:31,49-56``;
~1 GB CSV parts, ``split and upload/split_image_Script.py:8,39-52``;
10^6-row parts, ``split_csv_script.py:33-40``).  Engine semantics:
batch/part identity is a **deterministic column** (``row_number``-derived),
and physical file sizing is the writer's ``maxRecordsPerFile`` — no
mutable counters, idempotent re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from image_matadata_batchprocessing_aws_spark.functions import approx_row_bytes


def add_batch_id(
    df: DataFrame,
    batch_size: int,
    order_by: str,
    out: str = "batch_id",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """A9/W2 — ``batch_id = floor((row_number - 1) / batch_size)`` over an
    explicit ordering (the reference's global counter, made deterministic).

    Scale: a keyless ``row_number`` serializes through one partition —
    callers on big tables supply ``partition_by`` (batch ids are then
    per-group) or use the sink-level ``maxRecordsPerFile`` path below.
    """
    w = (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()).orderBy(
        F.col(order_by).asc()
    )
    return df.withColumn(out, ((F.row_number().over(w) - 1) / batch_size).cast("long"))


def add_row_bytes(df: DataFrame, out: str = "row_bytes") -> DataFrame:
    """F6 — approximate serialized byte size per row
    (``split_image_Script.py:35``)."""
    return df.withColumn(out, approx_row_bytes(df.columns))


def write_size_split_csv(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    target_bytes_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """S4 — header'd CSV parts bounded by rows or approximate bytes.

    Byte targeting estimates rows/file from a sampled average row size
    (the reference counts exact bytes row-by-row, single-threaded —
    ``split_image_Script.py:27-45``; a sampled estimate parallelizes).
    """
    if target_bytes_per_file is not None and max_records_per_file is None:
        avg = (
            add_row_bytes(df.sample(fraction=0.01, seed=42).limit(10_000))
            .agg(F.avg("row_bytes").alias("b"))
            .collect()[0]["b"]
        )
        avg = avg or 1.0
        max_records_per_file = max(1, int(target_bytes_per_file / avg))
    writer = df.write.mode(mode).option("header", True)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.csv(path)
