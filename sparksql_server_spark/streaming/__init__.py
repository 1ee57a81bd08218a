"""Structured Streaming surface (north-star; the reference is batch-only)."""

from sparksql_server_spark.streaming.events import (  # noqa: F401
    events_stream,
    run_to_memory_sink,
    tumbling_counts,
    user_totals_stateful,
)
