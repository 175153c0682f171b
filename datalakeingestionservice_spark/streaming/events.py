"""Event-stream ingestion: watermarks, windows, sessionization, micro-batch sink.

Batch/stream parity is deliberate: the window expressions here are the same
ones the batch queries q30/q32 verify against DuckDB, so the streaming path's
semantics are pinned by the batch oracle (the standard lambda-architecture
testing trick). State store + watermark handle what the batch engine gets for
free from full data visibility.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from datalakeingestionservice_spark.session import prepare_session
from datalakeingestionservice_spark.sinks.ctl import generate_ctl, write_ctl


def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


#: Default physical schema of the events parquet (current testdata generation:
#: timestamp[us]). ``read_events_stream`` sniffs the actual footer and branches;
#: this constant is the no-files-yet fallback.
EVENTS_SCHEMA = _events_schema(TimestampType())


def _sniff_ts_type(path: str):
    """Inspect one parquet footer under ``path`` to learn how ``ts`` is stored.

    The testdata's encoding has drifted across generations — TIMESTAMP(NANOS)
    (int64), timestamp[us] without isAdjustedToUTC (NTZ), plain TIMESTAMP — and
    a streaming source must declare its schema up front, so sniff rather than
    hard-code. Returns a Spark ``DataType`` for the declared schema plus the
    pyarrow type (for the nanos branch decision).
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    candidates = sorted(
        _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if os.path.isfile(path):
        candidates = [path]
    for file in candidates:
        try:
            field = _pq.read_schema(file).field("ts")
        except Exception:
            continue
        t = field.type
        if str(t).startswith("timestamp"):
            unit = getattr(t, "unit", "us")
            if unit == "ns":
                # Spark reads TIMESTAMP(NANOS) as long under nanosAsLong.
                return LongType(), "ns"
            tz = getattr(t, "tz", None)
            return (TimestampType() if tz else TimestampNTZType()), unit
        if str(t) in ("int64", "long"):
            return LongType(), "ns"
        break
    return TimestampType(), "us"


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (new files = new data).

    At production scale the same code points at a Kafka source — everything
    downstream is source-agnostic DataFrame ops. The ``ts`` column is
    normalized to session-TZ TIMESTAMP whatever the physical encoding
    (nanos-as-long, NTZ micros, or true TIMESTAMP).
    """
    prepare_session(spark)
    ts_type, unit = _sniff_ts_type(path)
    reader = spark.readStream.schema(_events_schema(ts_type))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    if isinstance(ts_type, LongType):
        # Long only arises from TIMESTAMP(NANOS) under nanosAsLong.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_aggregate(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type.

    Same expression as batch query q30 (DuckDB-verified); the watermark bounds
    state: windows older than max(event time) - watermark are finalized and
    dropped, so state size is O(active windows), not O(history).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows per user (`F.session_window` — the native
    stateful operator; batch twin q32 verifies the same session semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def start_ingest_stream(
    events: DataFrame,
    output_dir: str,
    dataset_id: str = "events-stream",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Micro-batch ingest sink: every batch commits parquet + a CTL control
    file — the reference's cron-fired pipeline run (A16-A18), generalized to
    exactly-once micro-batches via checkpointing + foreachBatch."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_path = os.path.join(output_dir, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(batch_path)
        files = sorted(
            os.path.join(batch_path, f)
            for f in os.listdir(batch_path)
            if f.endswith(".parquet")
        )
        rows = batch_df.count()
        record = generate_ctl(
            dataset_id=f"{dataset_id}-{batch_id}",
            source="Stream",
            record_count=rows,
            files=files,
            now=datetime.now(timezone.utc),
        )
        write_ctl(record, os.path.join(batch_path, f"_{record.dataset_name}.ctl"))

    checkpoint = checkpoint_dir or os.path.join(
        output_dir, f"_checkpoint-{uuid.uuid4().hex[:8]}"
    )
    writer = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(commit_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
