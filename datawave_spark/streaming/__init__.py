"""Structured Streaming: live ingest + event-time analytics."""

from datawave_spark.streaming.ingest import (  # noqa: F401
    sessionized_counts, stream_ingest, windowed_counts,
)
