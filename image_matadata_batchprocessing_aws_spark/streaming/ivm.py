"""Self-maintained stream-stream join via incremental view maintenance.

Spark's native stream-stream join bounds state with watermarks and
drops late rows; some pipelines instead want the UNBOUNDED,
never-drops-a-match join kept as a materialized table (the IVM answer).
This module runs ``maintenance.incremental_join_delta`` inside
``foreachBatch``: the two input streams arrive as ONE tagged union
stream (foreachBatch sees a single micro-batch), each epoch splits it
back into the two deltas, joins each delta against the other side's
ACCUMULATED state, and appends both the join delta and the input deltas
to epoch-partitioned parquet.

Replay idempotency is structural, not best-effort: every write goes to
its epoch's own ``batch_id=<epoch>`` partition with overwrite, and the
state read EXCLUDES partitions >= the current epoch (partition-pruned
filter), so re-running an epoch after a crash reproduces exactly the
same delta — the same recipe as ``events.start_numbered_batch_sink``.

Scale notes: per epoch the work is delta x state (the deltas are
micro-batch sized; state scans prune on ``batch_id``); the two state
tables are never joined to each other.  State grows without bound BY
DESIGN (that is the semantics watermarked joins cannot offer) —
compact it offline with ``maintenance.compact_parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.maintenance import incremental_join_delta


def _read_state(
    spark: SparkSession, path: str, before_epoch: int, like: DataFrame
) -> DataFrame:
    """State accumulated strictly before ``before_epoch`` (replay
    safety); an empty typed frame when no state exists yet."""
    try:
        df = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — first epoch: no state directory yet
        return spark.createDataFrame([], like.schema)
    return df.where(F.col("batch_id") < before_epoch).select(*like.columns)


def start_ivm_join_sink(
    tagged: DataFrame,
    side_col: str,
    a_cols: list[str],
    b_cols: list[str],
    on: list[str],
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "ivm_join",
):
    """Start the self-maintained join over a tagged union stream
    (``side_col`` in {'a','b'}; ``a_cols``/``b_cols`` name each side's
    columns within the union schema, both including the ``on`` keys).
    The materialized join delta of every epoch lands under
    ``{out_dir}/batch_id=<epoch>``; read the whole directory for the
    maintained join."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        d_a = df.where(F.col(side_col) == "a").select(a_cols)
        d_b = df.where(F.col(side_col) == "b").select(b_cols)
        a_old = _read_state(spark, f"{state_dir}/a", epoch_id, d_a)
        b_old = _read_state(spark, f"{state_dir}/b", epoch_id, d_b)
        delta = incremental_join_delta(a_old, d_a, b_old, d_b, on)
        delta.write.mode("overwrite").parquet(f"{out_dir}/batch_id={epoch_id}")
        d_a.write.mode("overwrite").parquet(f"{state_dir}/a/batch_id={epoch_id}")
        d_b.write.mode("overwrite").parquet(f"{state_dir}/b/batch_id={epoch_id}")

    return (
        tagged.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
