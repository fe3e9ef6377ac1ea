from data_integration_est_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_counts,
    read_event_stream,
    run_to_memory,
    sessionize_stateful,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_event_stream",
    "hourly_counts",
    "run_to_memory",
    "sessionize_stateful",
]
