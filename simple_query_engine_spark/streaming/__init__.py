from simple_query_engine_spark.streaming.windows import (
    run_streaming_tumbling_counts,
    session_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "run_streaming_tumbling_counts",
    "session_window_counts",
    "sliding_window_counts",
    "tumbling_window_counts",
]
