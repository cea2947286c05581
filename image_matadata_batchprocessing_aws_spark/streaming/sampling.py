"""Streaming deterministic bottom-k sample (mergeable min-k sketch).

A uniform random sample of an UNBOUNDED stream, kept exactly: rank every
row by a keyed 60-bit md5 of its id and keep the k smallest.  Bottom-k
is mergeable — ``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ B)`` — so each
micro-batch folds into the carried k-row state and the result after any
prefix of the stream equals the batch ``ORDER BY hash LIMIT k`` over the
same rows, bit for bit.  (Classic reservoir sampling keeps the same
distribution but is order-dependent and RNG-stateful; the hash-rank form
is the deterministic, replayable variant — same family as the KMV
distinct sketch, which IS this state's cardinality read.)

Replay idempotency is structural, same recipe as ``streaming/ivm.py``:
each epoch writes its k rows to its own ``batch_id=<epoch>`` partition
with overwrite, and state reads take the LATEST partition strictly
before the current epoch, so re-running an epoch after a crash
reproduces the identical sample.

Scale notes: per epoch the work is ``orderBy(h).limit(k)`` over
(k + micro-batch) rows — Spark plans that as TakeOrderedAndProject
(per-partition top-k, then a k-row merge on the driver side of the
exchange), never a full sort.  State is k rows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64


def bottomk_sample(df: DataFrame, k: int, id_col: str = "event_id") -> DataFrame:
    """The batch form: k rows with the smallest keyed md5 rank (ties —
    md5 collisions — broken by the id).  Appends the rank column ``h``."""
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn("h", md5_int64(F.col(id_col).cast("string")))
        .orderBy("h", id_col)
        .limit(k)
    )


def _read_latest_state(
    spark: SparkSession, path: str, before_epoch: int, like: DataFrame
) -> DataFrame:
    """The newest state partition strictly before ``before_epoch``
    (replay safety); an empty typed frame when none exists yet.

    Only the missing-directory case maps to "no state" — corrupt
    footers, permissions, or schema drift must PROPAGATE, or the sink
    would silently reset the carried sample to the current micro-batch
    and break the stream==batch guarantee without an error."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as exc:  # first epoch: no state directory yet
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        return spark.createDataFrame([], like.schema)
    prev = df.where(F.col("batch_id") < before_epoch)
    mx = prev.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if mx is None:
        return spark.createDataFrame([], like.schema)
    return prev.where(F.col("batch_id") == mx).select(*like.columns)


def start_bottomk_sample_sink(
    events: DataFrame,
    k: int,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "event_id",
    cols: tuple[str, ...] = ("event_id", "user_id", "event_type"),
    query_name: str = "bottomk_sample",
):
    """Maintain the exact bottom-k sample of the stream under
    ``{state_dir}/batch_id=<epoch>``; the latest partition is always the
    sample of everything seen so far."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        delta = bottomk_sample(df.select(*cols), k, id_col=id_col)
        prev = _read_latest_state(spark, state_dir, epoch_id, delta)
        merged = prev.unionByName(delta).orderBy("h", id_col).limit(k)
        merged.write.mode("overwrite").parquet(f"{state_dir}/batch_id={epoch_id}")

    return (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
