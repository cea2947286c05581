"""Streaming near-dup corpus dedup — incremental MinHash ingest as a
live, self-maintaining sink.

``events.dedup_against_corpus`` handles the EXACT-key streaming case
against a static corpus; this module closes the loop for NEAR-dups and
a GROWING corpus: each micro-batch runs the full two-stage
``operators.dedup.incremental_dedup_report`` (exact content-hash exit,
then new-vs-corpus MinHash band join + exact-Jaccard verification)
against the corpus accumulated from every EARLIER epoch's survivors,
then appends this epoch's unique docs to that corpus.  That is the
live form of how pretraining corpora actually ingest: a crawl batch
lands, near-dups against the settled corpus drop, survivors settle.

Replay idempotency is structural (the ``streaming/ivm.py`` recipe):
per-epoch ``batch_id=<epoch>`` overwrite partitions for both report
and corpus state, and the state read EXCLUDES partitions >= the
current epoch, so a crashed epoch re-runs to the identical result.

Scale notes: per epoch the near stage is micro-batch x corpus BANDS
(never corpus x corpus — band entries meet only across sides), and the
exact stage is a hash equi-join that never shuffles text.  The
corpus-side shingle/signature derivation re-runs per epoch here; at
100 TB persist those as band-keyed state tables exactly like the IVF
layout does for vectors (`operators/ivf.py` pattern) and maintain them
incrementally — the sink's survivor partitions already provide the
append stream to do it from.  Stream==batch equivalence (sequential
``incremental_dedup_report`` calls) is tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.dedup import incremental_dedup_report


def _read_corpus_state(
    spark: SparkSession, path: str, before_epoch: int, like: DataFrame
) -> DataFrame:
    """Survivor docs settled strictly before ``before_epoch`` (replay
    safety); an empty typed frame when no corpus exists yet."""
    try:
        df = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — first epoch: no state directory yet
        return spark.createDataFrame([], like.schema)
    return df.where(F.col("batch_id") < before_epoch).select(*like.columns)


def start_near_dedup_sink(
    docs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    query_name: str = "near_dedup",
    **dedup_kwargs,
):
    """Start the self-maintaining near-dedup sink over a document
    stream.  Per epoch: ``{out_dir}/batch_id=<epoch>`` holds the full
    (id, status, match_id) report for that micro-batch;
    ``{state_dir}/batch_id=<epoch>`` holds the docs that entered the
    corpus.  Read all of ``out_dir`` for the ingest ledger, all of
    ``state_dir`` for the deduplicated corpus."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        corpus = _read_corpus_state(spark, state_dir, epoch_id, df)
        report = incremental_dedup_report(
            df,
            corpus,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            **dedup_kwargs,
        )
        report.write.mode("overwrite").parquet(f"{out_dir}/batch_id={epoch_id}")
        survivors = df.join(
            report.where(F.col("status") == "unique").select(id_col),
            id_col,
            "left_semi",
        )
        survivors.write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={epoch_id}"
        )

    return (
        docs.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
