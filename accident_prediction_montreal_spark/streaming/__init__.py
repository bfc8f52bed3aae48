from accident_prediction_montreal_spark.streaming.windows import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_aggregates,
    dedup_within_watermark,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "dedup_within_watermark",
]
