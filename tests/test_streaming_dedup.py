"""Streaming dedup (streaming/dedup.py): stream-deduped output must agree
with the batch exact-dedup oracle, and the watermarked variant must bound
state while still dropping in-horizon duplicates."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.streaming.dedup import (
    dedup_stream_exact,
    dedup_stream_within_watermark,
    with_fingerprint,
)

SCHEMA = "doc_id bigint, text string, ts timestamp"


def _write_batch(spark, path, rows, batch_name):
    # One parquet FILE per micro-batch (the file source watches a flat
    # dir); toPandas round-trip keeps the column types Spark declares.
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = spark.createDataFrame(rows, SCHEMA).toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf),
        os.path.join(path, f"{batch_name}.parquet"),
        coerce_timestamps="us",  # pandas ns would read back as INT64
    )


def _wait_rows(spark, name, n, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c >= n:
            return
        time.sleep(0.5)
    raise TimeoutError(f"memory table {name} never reached {n} rows")


def _rows(*specs):
    import datetime as dt

    return [
        (i, text, dt.datetime(2024, 1, 1, 0, m)) for i, text, m in specs
    ]


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 'hello' re-delivered three times (one case-variant — the normalized
    # fingerprint must still collapse it); 'world' twice.
    _write_batch(
        spark, src,
        _rows((1, "hello", 0), (2, "world", 1), (3, "Hello ", 2)),
        "b0",
    )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        dedup_stream_exact(stream, "text")
        .writeStream.format("memory")
        .queryName("dedup_exact")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _wait_rows(spark, "dedup_exact", 2)
        # Later file: one more duplicate + one genuinely new doc. The
        # duplicate must be dropped ACROSS micro-batches (state, not
        # per-batch distinct).
        _write_batch(spark, src, _rows((4, "hello", 5), (5, "fresh", 6)), "b1")
        _wait_rows(spark, "dedup_exact", 3)
        time.sleep(2)  # allow any (wrong) extra rows to surface
    finally:
        q.stop()

    got = {
        r.fingerprint
        for r in spark.sql("SELECT * FROM dedup_exact").collect()
    }
    batch = spark.createDataFrame(
        _rows((1, "hello", 0), (2, "world", 1), (3, "Hello ", 2),
              (4, "hello", 5), (5, "fresh", 6)),
        SCHEMA,
    )
    expected = {
        r.fingerprint
        for r in with_fingerprint(batch, "text")
        .select("fingerprint").distinct().collect()
    }
    assert got == expected
    assert spark.sql("SELECT count(*) c FROM dedup_exact").collect()[0].c == 3


def test_stream_watermarked_dedup_drops_in_horizon_duplicates(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        spark, src,
        _rows((1, "alpha", 0), (2, "beta", 1), (3, "alpha", 2)),
        "b0",
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        dedup_stream_within_watermark(
            stream, "text", "ts", delay="10 minutes"
        )
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _wait_rows(spark, "dedup_wm", 2)
        # In-horizon duplicate (minute 3 vs watermark horizon 10m) dropped;
        # new doc admitted.
        _write_batch(
            spark, src, _rows((4, "alpha", 3), (5, "gamma", 4)), "b1"
        )
        _wait_rows(spark, "dedup_wm", 3)
        time.sleep(2)
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM dedup_wm").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha", "beta", "gamma"]
