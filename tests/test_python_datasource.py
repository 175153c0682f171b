"""Custom Python Data Source (sources/python_datasource.py): batch read,
filter-pushdown partition pruning, streaming offsets/replay, staged writer."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sources.python_datasource import (
    EVENT_TYPES,
    SyntheticEventsReader,
    gen_row,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_count_and_determinism(spark):
    df = _read(spark, n_rows=5000, n_partitions=4)
    assert df.count() == 5000
    a = df.orderBy("event_id").limit(5).collect()
    b = _read(spark, n_rows=5000, n_partitions=4).orderBy("event_id").limit(5).collect()
    assert a == b
    assert [tuple(r) for r in a] == [gen_row(i) for i in range(5)]


def test_batch_read_partition_count_independent_of_results(spark):
    one = _read(spark, n_rows=1000, n_partitions=1).orderBy("event_id").collect()
    many = _read(spark, n_rows=1000, n_partitions=7).orderBy("event_id").collect()
    assert one == many


def test_filter_pushdown_prunes_partitions():
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = SyntheticEventsReader({"n_rows": "10000", "n_partitions": "8"})
    unsupported = list(
        r.pushFilters(
            [GreaterThanOrEqual(("event_id",), 2000), LessThan(("event_id",), 4000)]
        )
    )
    assert unsupported == []
    parts = r.partitions()
    # 8 partitions of 1250 ids; [2000, 4000) touches only 3 of them.
    assert len(parts) == 3
    assert parts[0].start == 2000 and parts[-1].end == 4000


def test_unsupported_filter_stays_with_spark(spark):
    from pyspark.sql.datasource import EqualTo

    r = SyntheticEventsReader({"n_rows": "100", "n_partitions": "2"})
    leftover = list(r.pushFilters([EqualTo(("event_type",), "click")]))
    assert len(leftover) == 1
    # End-to-end the answer is still right (Spark applies it post-scan).
    df = _read(spark, n_rows=1000).filter(F.col("event_type") == "click")
    assert df.count() == 200  # ids % 5 == 0


def test_pushdown_end_to_end_values(spark):
    got = (
        _read(spark, n_rows=10000, n_partitions=8)
        .filter((F.col("event_id") >= 2000) & (F.col("event_id") < 2010))
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [gen_row(i) for i in range(2000, 2010)]


def test_streaming_contiguous_batches_and_stop(spark, tmp_path):
    seen = []

    def sink(df, epoch):
        rows = df.select("event_id").orderBy("event_id").collect()
        seen.append((rows[0].event_id, rows[-1].event_id, len(rows)))

    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 25)
        .load()
        .writeStream.foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 90
    while len(seen) < 3 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert len(seen) >= 3
    # Batches are contiguous 25-row id ranges from 0.
    for i, (lo, hi, n) in enumerate(seen[:3]):
        assert (lo, hi, n) == (i * 25, i * 25 + 24, 25)


def test_stream_reader_replay_between_offsets():
    from datalakeingestionservice_spark.sources.python_datasource import (
        SyntheticEventsStreamReader,
    )

    def rows(batches):
        # The reader is vectorized: it yields Arrow RecordBatches.
        return [
            t
            for b in batches
            for t in zip(*[c.to_pylist() for c in b.columns])
        ]

    r = SyntheticEventsStreamReader({"rows_per_batch": "10"})
    first, off1 = r.read(r.initialOffset())
    assert off1 == {"next": 10}
    replayed = rows(r.readBetweenOffsets({"next": 0}, {"next": 10}))
    assert rows(first) == replayed == [gen_row(i) for i in range(10)]


def test_writer_stages_then_commits(spark, tmp_path):
    out = str(tmp_path / "events_out")
    df = _read(spark, n_rows=100, n_partitions=3)
    df.write.format("synthetic_events").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") for f in files)
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows.extend(json.loads(line) for line in fh)
    assert len(rows) == 100
    assert sorted(r["event_id"] for r in rows) == list(range(100))
    assert {r["event_type"] for r in rows} == set(EVENT_TYPES)


def test_synthetic_feed_n_rows_ceiling_and_uint64_parity():
    """The vectorized reader computes the amount mix in uint64; above
    2**64 // _MIX it would wrap and diverge from gen_row's unbounded
    Python-int math, so __init__ enforces that ceiling — and just below
    it, the numpy batch stays bit-identical to gen_row."""
    import pyarrow as pa  # noqa: F401

    from datalakeingestionservice_spark.sources.python_datasource import (
        _MIX,
        SyntheticEventsReader,
        gen_row,
    )

    ceiling = (1 << 64) // _MIX
    with pytest.raises(ValueError, match="bit-identical"):
        SyntheticEventsReader({"n_rows": str(ceiling + 1)})
    r = SyntheticEventsReader(
        {"n_rows": str(ceiling), "n_partitions": "1"}
    )
    parts = r.partitions()
    part = parts[-1]
    part.start = ceiling - 64  # read only the top slice
    (batch,) = list(r.read(part))
    rows = list(zip(*[c.to_pylist() for c in batch.columns]))
    assert rows == [gen_row(i) for i in range(ceiling - 64, ceiling)]
