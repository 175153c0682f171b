"""applyInPandasWithState: cross-batch dedup keeps state between micro-batches."""

from __future__ import annotations

import os
import shutil

from datalakeingestionservice_spark.streaming import read_events_stream
from datalakeingestionservice_spark.streaming.stateful import dedup_events_stream


def _run_to_parquet(spark, stream_df, out_dir, ckpt):
    def sink(batch_df, batch_id):
        if batch_df.count() > 0:
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_dedup_emits_each_key_once_across_batches(spark, sf_dir, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # State-store partitions dominate wall clock here; 4 is plenty for 5 keys.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        def stream():
            return dedup_events_stream(
                read_events_stream(spark, str(src)).filter("event_id < 300")
            )

        # Batch 1: the events file -> 5 event types -> 5 first-seen rows.
        shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
        _run_to_parquet(spark, stream(), out, ckpt)
        first = spark.read.parquet(out).collect()
        assert len(first) == 5
        assert {r.dedup_key for r in first} == {
            "click", "error", "purchase", "signup", "view",
        }
        for r in first:
            assert r.n_duplicates_in_batch >= 0
            assert r.first_event_id is not None and r.first_ts is not None

        # Batch 2: same data again under a new file name -> every key already
        # in state -> ZERO new emissions (state survived via the checkpoint).
        shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
        _run_to_parquet(spark, stream(), out, ckpt)
        after = spark.read.parquet(out).collect()
        assert len(after) == 5  # unchanged — no re-emissions
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)


def test_stateful_dedup_with_rocksdb_state_store(spark, sf_dir, tmp_path):
    """Same stateful dedup on the RocksDB state store provider — the
    production store for large state (off-heap, incremental checkpoints)."""
    import shutil

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        stream = dedup_events_stream(
            read_events_stream(spark, str(src)).filter("event_id < 300")
        )
        _run_to_parquet(
            spark, stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        rows = spark.read.parquet(str(tmp_path / "out")).collect()
        assert {r.dedup_key for r in rows} == {
            "click", "error", "purchase", "signup", "view",
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
