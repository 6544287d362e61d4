from bioio_spark.streaming.events import (
    streaming_interval_join,
    read_event_stream,
    streaming_tumbling_counts,
    streaming_session_windows,
    streaming_dedup,
    run_stream_to_memory,
)
from bioio_spark.streaming.stateful import stateful_user_totals

__all__ = [
    "streaming_interval_join",
    "read_event_stream",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_dedup",
    "run_stream_to_memory",
    "stateful_user_totals",
]
