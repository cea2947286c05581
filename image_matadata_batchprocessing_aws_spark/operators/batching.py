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

from pyspark.sql import DataFrame, Window, functions as F, types as T

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

    With ``partition_by``, batch ids restart per key group (parallel
    windows).  Keyless, the global numbering runs the two-pass scale path:
    range-repartition on the order key, number rows within each partition,
    then offset by broadcast prefix counts — never a single-partition
    window.
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(F.col(order_by).asc())
        return df.withColumn(out, ((F.row_number().over(w) - 1) / batch_size).cast("long"))
    return _add_batch_id_global(df, batch_size, order_by, out)


def global_row_number(
    df: DataFrame, order_by: list[str], out: str = "row_num"
) -> DataFrame:
    """0-based global row number over an explicit ordering, via the
    ``ffill_partitioned`` pattern: one range shuffle + an O(partitions)
    count collect + one broadcast join.  Equal order keys land in the same
    range partition, so ties resolve within one window — same semantics as
    a keyless global ``row_number`` window, without the serialization
    point (W2 scale path).
    """
    spark = df.sparkSession
    parted = df.repartitionByRange(
        spark.sparkContext.defaultParallelism, *[F.col(c) for c in order_by]
    )
    # materialize BEFORE reading spark_partition_id: range boundaries come
    # from sampling, so the count job and the output job must see one
    # assignment (localCheckpoint: freed on GC, no CacheManager dedup churn)
    parted = parted.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    counts = parted.groupBy("__pid").count().collect()
    counts.sort(key=lambda r: r["__pid"])
    offsets, running = [], 0
    for r in counts:
        offsets.append((r["__pid"], running))
        running += r["count"]
    off_df = spark.createDataFrame(
        offsets,
        schema=T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__off", T.LongType()),
            ]
        ),
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_by])
    return (
        parted.withColumn("__rn", F.row_number().over(w).cast("long"))
        .join(F.broadcast(off_df), "__pid", "left")
        .withColumn(out, F.col("__off") + F.col("__rn") - F.lit(1))
        .drop("__pid", "__rn", "__off")
    )


def _add_batch_id_global(
    df: DataFrame, batch_size: int, order_by: str, out: str
) -> DataFrame:
    numbered = global_row_number(df, [order_by], "__gn")
    return numbered.withColumn(
        out, F.floor(F.col("__gn") / F.lit(batch_size)).cast("long")
    ).drop("__gn")


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
