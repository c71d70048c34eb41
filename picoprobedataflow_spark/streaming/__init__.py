"""Structured-streaming ingest pipelines (reference EP1)."""

from picoprobedataflow_spark.streaming.watch import (  # noqa: F401
    file_watch_stream,
    run_ingest_stream,
    windowed_event_rates,
)
