from image_matadata_batchprocessing_aws_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_within_watermark,
    start_numbered_batch_sink,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "start_numbered_batch_sink",
]
