from bioio_spark.streaming.events import (
    streaming_interval_join,
    streaming_interval_join_outer,
    read_event_stream,
    streaming_tumbling_counts,
    streaming_session_windows,
    streaming_dedup,
    run_stream_to_memory,
)
from bioio_spark.streaming.ingest import (
    bounded_stream_partitions,
    read_image_stream,
    streaming_decode_pixels,
    streaming_scene_stats,
)
from bioio_spark.streaming.stateful import stateful_user_totals
from bioio_spark.streaming.sink import (
    idempotent_batch_sink,
    read_batches,
    upsert_batch_sink,
    read_upserted,
)

__all__ = [
    "idempotent_batch_sink",
    "read_batches",
    "upsert_batch_sink",
    "read_upserted",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "read_event_stream",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_dedup",
    "run_stream_to_memory",
    "stateful_user_totals",
    "bounded_stream_partitions",
    "read_image_stream",
    "streaming_decode_pixels",
    "streaming_scene_stats",
]
