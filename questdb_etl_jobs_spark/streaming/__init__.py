"""Structured Streaming mode of the pipeline."""

from questdb_etl_jobs_spark.streaming.file_stream import (
    stream_purchases_csv,
    run_stream_to_table,
    tumbling_counts,
    sliding_counts,
    session_counts,
)

__all__ = [
    "stream_purchases_csv",
    "run_stream_to_table",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
