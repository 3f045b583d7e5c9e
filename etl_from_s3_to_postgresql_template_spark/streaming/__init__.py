from etl_from_s3_to_postgresql_template_spark.streaming.ingest import (
    stream_events,
    run_tumbling_counts_stream,
    run_stateful_user_counts_stream,
)

__all__ = [
    "stream_events",
    "run_tumbling_counts_stream",
    "run_stateful_user_counts_stream",
]
