"""Structured Streaming extension (SURVEY §2.8: absent in the
reference — its only 'stream' is a chunk generator — exposed here as
the Spark-native scale path over the events table)."""

from magicxml_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    windowed_event_counts,
)
