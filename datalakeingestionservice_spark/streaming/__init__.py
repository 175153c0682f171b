"""Structured Streaming slice (SURVEY.md C7).

The reference's only streaming behavior is cron-fired micro-batch ingestion
(`JobSchedulingService.cs:56-66`, one run per 1-2 min). Structured Streaming
generalizes that: `readStream` over the events source, watermarked windowed
aggregations for late data, and a `foreachBatch` sink that reuses the batch
Parquet+CTL writer — every micro-batch commits the same artifacts a cron run
of the reference would.
"""

from datalakeingestionservice_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    session_aggregate,
    start_ingest_stream,
    tumbling_aggregate,
)
from datalakeingestionservice_spark.streaming.interval_join import (
    stream_interval_join,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "stream_interval_join",
    "tumbling_aggregate",
    "session_aggregate",
    "start_ingest_stream",
]
