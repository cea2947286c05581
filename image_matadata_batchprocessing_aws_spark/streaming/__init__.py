from image_matadata_batchprocessing_aws_spark.streaming.events import (
    attribution_join,
    attribution_join_outer,
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_within_watermark,
    curate_stream,
    dedup_against_corpus,
    enrich_with_dimension,
    start_numbered_batch_sink,
)
from image_matadata_batchprocessing_aws_spark.streaming.ivm import start_ivm_join_sink
from image_matadata_batchprocessing_aws_spark.streaming.stateful import cusum_stream, running_user_totals

__all__ = [
    "cusum_stream",
    "running_user_totals",
    "attribution_join",
    "attribution_join_outer",
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "curate_stream",
    "dedup_against_corpus",
    "enrich_with_dimension",
    "start_numbered_batch_sink",
    "start_ivm_join_sink",
]
