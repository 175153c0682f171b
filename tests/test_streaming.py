"""Structured Streaming: batch/stream parity, sessionization, micro-batch sink."""

from __future__ import annotations

import os
import shutil

import pytest

from datalakeingestionservice_spark.queries import QUERIES
from datalakeingestionservice_spark.streaming import (
    read_events_stream,
    session_aggregate,
    start_ingest_stream,
    tumbling_aggregate,
)


@pytest.fixture()
def events_dir(sf_dir, tmp_path):
    """File-source streams want a directory; stage the events parquet into one."""
    d = tmp_path / "events-in"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_tumbling_matches_batch_oracle_query(spark, sf_dir, events_dir, tmp_path):
    """Stream aggregation (availableNow) == the DuckDB-verified batch q30."""
    stream = tumbling_aggregate(read_events_stream(spark, events_dir))
    out = tmp_path / "tumbling-out"
    query = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumbling_test")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    expected = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["q30_events_tumbling_window"].spark_fn(spark, sf_dir).collect()
    }
    # Watermark may hold back only windows newer than max(ts) - watermark;
    # with availableNow over a closed dataset all complete windows emit.
    assert got  # nonempty
    for key, val in got.items():
        assert expected[key] == val
    # Every emitted window is final and correct; coverage is near-total:
    assert len(got) >= len(expected) - 8


def test_stream_sessionization_runs(spark, events_dir, tmp_path):
    stream = session_aggregate(read_events_stream(spark, events_dir))
    query = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("session_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM session_test ORDER BY user_id, session_start"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_stream_ingest_sink_commits_parquet_and_ctl(spark, events_dir, tmp_path):
    out = str(tmp_path / "stream-out")
    events = read_events_stream(spark, events_dir)
    query = start_ingest_stream(
        events, out, dataset_id="ev", available_now=True,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    query.awaitTermination(120)
    batches = [d for d in os.listdir(out) if d.startswith("batch=")]
    assert batches
    batch_dir = os.path.join(out, batches[0])
    parts = [f for f in os.listdir(batch_dir) if f.endswith(".parquet")]
    ctls = [f for f in os.listdir(batch_dir) if f.endswith(".ctl")]
    assert parts and len(ctls) == 1
    header, row = open(os.path.join(batch_dir, ctls[0])).read().strip().split("\n")
    n_rows = int(row.split(",")[0])
    assert n_rows == spark.read.parquet(batch_dir).count()
    assert row.split(",")[5] == "Stream"


def test_stream_static_join_enrichment(spark, sf_dir, events_dir, tmp_path):
    """Stream-static join: each micro-batch joins the latest static dim —
    the streaming lookup-enrichment pattern (reference A22, streaming form)."""
    from pyspark.sql import functions as F

    user_dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).alias("cohort"),
    )
    stream = (
        read_events_stream(spark, events_dir)
        .join(user_dim, "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.cohort: (r.n, r.v) for r in spark.sql("SELECT * FROM enrich_test").collect()}

    from datalakeingestionservice_spark.catalog import table
    batch = (
        table(spark, sf_dir, "events")
        .join(user_dim, "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    expected = {r.cohort: (r.n, r.v) for r in batch.collect()}
    assert got == expected
