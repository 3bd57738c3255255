from ons_utils_spark.streaming.windows import (
    dedup_events,
    read_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "dedup_events",
    "read_stream",
    "run_available_now",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
