"""End-to-end incremental pipeline chain on one lake table (NOTES item 5):

    synthetic_events stream
      -> exactly-once versioned SINK (one table version per epoch)
      -> versioned_changes SOURCE (versions as stream offsets)
      -> streaming windowed aggregate -> memory sink

The downstream aggregate must converge to EXACTLY the batch aggregate over
the table snapshot — the lambda-architecture parity check, across two
chained streaming hops and the table format in the middle."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.python_datasource import (
    register as register_synthetic,
)
from datalakeingestionservice_spark.sources.versioned_changes import (
    register as register_changes,
)
from datalakeingestionservice_spark.streaming.versioned_sink import (
    make_versioned_batch_committer,
    start_versioned_append_stream,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_synthetic(spark)
    register_changes(spark)


def _wait(cond, timeout_s=120, every=0.5):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if cond():
            return
        time.sleep(every)
    raise TimeoutError("condition never held")


def test_stream_sink_source_agg_chain(spark, tmp_path):
    root = str(tmp_path / "vt")

    # Hop 1: synthetic feed -> exactly-once versioned sink.
    upstream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .load()
    )
    q1 = start_versioned_append_stream(
        upstream, root, str(tmp_path / "ck_sink"), stream_name="chain"
    )
    try:
        _wait(lambda: _versions_at_least(spark, root, 3))
    finally:
        q1.stop()

    table = VersionedTable(spark, root)
    frozen_version = table.latest_version()

    # Hop 2: change feed -> per-type aggregate, complete mode to memory.
    feed = (
        spark.readStream.format("versioned_changes")
        .option("table_root", root)
        .load()
    )
    agg = feed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("amount"), 2).alias("total"),
    )
    q2 = (
        agg.writeStream.format("memory")
        .queryName("chain_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_agg"))
        .trigger(processingTime="0 seconds")
        .start()
    )

    def batch_state(version=None):
        return {
            (r.event_type, r.n, r.total)
            for r in table.read(version)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("amount"), 2).alias("total"),
            )
            .collect()
        }

    def mem_state():
        return {
            (r.event_type, r.n, r.total)
            for r in spark.sql("SELECT * FROM chain_agg").collect()
        }

    try:
        expected = batch_state(frozen_version)
        _wait(lambda: mem_state() == expected)

        # A NEW commit while the downstream runs becomes its next batch —
        # the chain is live, not a one-shot backfill.
        commit = make_versioned_batch_committer(root, "chain")
        extra = spark.createDataFrame(
            [(10_000, 1, "purchase", 99.5, 0), (10_001, 2, "click", 1.0, 0)],
            "event_id bigint, user_id bigint, event_type string, "
            "amount double, ts_epoch bigint",
        )
        commit(extra, 10_000)  # fresh epoch, appends one version
        expected = batch_state()
        _wait(lambda: mem_state() == expected)
    finally:
        q2.stop()

    assert mem_state() == batch_state()


def _versions_at_least(spark, root, n) -> bool:
    try:
        return VersionedTable(spark, root).latest_version() >= n
    except Exception:
        return False
