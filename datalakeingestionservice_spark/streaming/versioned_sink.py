"""Exactly-once streaming sink into a versioned table.

Composes Structured Streaming with the table format (`sinks/versioned.py`):
each micro-batch commits as ONE table version, tagged with its (stream,
epoch). Exactly-once comes from the two layers meeting in the middle:

- the checkpoint replays an epoch after any crash BEFORE the commit landed
  (foreachBatch is at-least-once on its own);
- the epoch tag makes the replayed commit a no-op when the crash happened
  AFTER the commit but before the checkpoint advanced — the classic
  doubly-committed window every idempotent sink must close.

Readers see whole batches or nothing (manifest atomicity), and time travel
doubles as stream audit: `history()` shows exactly which epoch produced
which version. The reference has no streaming path at all (cron micro-batch
re-runs, `src/Worker/Services/JobSchedulingService.cs:24-75`); this is what
its ingestion becomes on a lake engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)


def make_versioned_batch_committer(
    table_root: str, stream_name: str = "stream"
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: append batch as a version, idempotently.

    Exposed separately so the idempotence contract is directly testable
    (calling it twice with the same epoch must commit exactly once).
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = {"stream": stream_name, "epoch": batch_id}
        try:
            table = VersionedTable(spark, table_root)
        except NoSuchVersionError:
            VersionedTable.create(spark, table_root, batch_df, summary=tag)
            return
        for m in table.versions():
            if (
                m.summary.get("stream") == stream_name
                and m.summary.get("epoch") == batch_id
            ):
                return  # epoch already committed; replay after crash
        table.append(batch_df, summary=tag)

    return commit_batch


def start_versioned_append_stream(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    stream_name: str = "stream",
    processing_time: str = "0 seconds",
) -> StreamingQuery:
    """Run a streaming DataFrame into a versioned table, one version per
    micro-batch, exactly-once end to end."""
    return (
        stream_df.writeStream.foreachBatch(
            make_versioned_batch_committer(table_root, stream_name)
        )
        .trigger(processingTime=processing_time)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
