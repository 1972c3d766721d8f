from yelp_etl_spark.streaming.windows import (
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
