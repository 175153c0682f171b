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


def test_stream_stream_join_within_time_bound(spark, sf_dir, events_dir, tmp_path):
    """Stream-stream inner join: each signup joined to purchases by the same
    user within 1h after it — watermarks on BOTH sides bound the join state."""
    from pyspark.sql import functions as F

    base = read_events_stream(spark, events_dir)
    signups = (
        base.filter("event_type = 'signup'")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
            F.col("event_id").alias("s_id"),
        )
        .withWatermark("s_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, events_dir)
        .filter("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.s_id, r.p_id) for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }

    # Batch twin over the same data:
    from datalakeingestionservice_spark.catalog import table
    ev = table(spark, sf_dir, "events")
    s = ev.filter("event_type = 'signup'").selectExpr(
        "user_id s_user", "ts s_ts", "event_id s_id"
    )
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id p_user", "ts p_ts", "event_id p_id"
    )
    expected = {
        (r.s_id, r.p_id)
        for r in s.join(
            p,
            (F.col("s_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids across micro-batch
    retries are suppressed while state stays watermark-bounded."""
    from pyspark.sql import functions as F

    stream = (
        read_events_stream(spark, events_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dropdup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT count(*) n, count(DISTINCT event_id) d FROM dropdup_test"
    ).collect()[0]
    assert rows.n == rows.d  # no duplicate ids emitted
    assert rows.n > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Direct watermark-semantics proof: after the watermark passes a
    window's end, a late event for that window is dropped — its finalized
    aggregate does not change across micro-batches."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datalakeingestionservice_spark.streaming import tumbling_aggregate

    src = tmp_path / "in"
    src.mkdir()

    def write_events(name, rows):
        # Same physical layout as the driver's events table (ns timestamps).
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [10.0] * len(rows),
                "props": ['{"k": 1}'] * len(rows),
            }
        )
        pq.write_table(pa.Table.from_pandas(pdf), str(src / name))

    def run_batch():
        stream = tumbling_aggregate(
            read_events_stream(spark, str(src)),
            window_duration="10 minutes",
            watermark="10 minutes",
        )

        def sink(batch_df, batch_id):
            if batch_df.count() > 0:
                batch_df.write.mode("append").parquet(str(tmp_path / "out"))

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Batch 1: two events in the 10:00 window, then one at 11:00 that pushes
    # the watermark to 10:50 — far past the 10:00 window's end (10:10).
    write_events("b1.parquet", [
        (1, "2024-01-01 10:01:00"),
        (2, "2024-01-01 10:05:00"),
        (3, "2024-01-01 11:00:00"),
    ])
    run_batch()
    finalized = {
        (str(r.window_start), r.n_events)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert ("2024-01-01 10:00:00", 2) in finalized  # window closed with 2 events

    # Batch 2: a LATE event for the closed 10:00 window + a fresh on-time one.
    write_events("b2.parquet", [
        (4, "2024-01-01 10:06:00"),   # late: watermark is already 10:50
        (5, "2024-01-01 12:00:00"),   # advances watermark further
    ])
    run_batch()
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    counts_1000 = [r.n_events for r in rows if str(r.window_start) == "2024-01-01 10:00:00"]
    assert counts_1000 == [2]  # late event DROPPED: no re-emission, no update


def test_max_files_per_trigger_paces_batches(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1: N source files -> N micro-batches (ingest pacing
    under backlog — availableNow drains in bounded batches, not one giant one)."""
    import shutil

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        shutil.copy(f"{sf_dir}/events.parquet", src / f"f{i}.parquet")

    batch_ids = []

    def sink(batch_df, batch_id):
        batch_ids.append((batch_id, batch_df.count()))

    q = (
        read_events_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) == 3
    assert all(n == 1000 for _, n in batch_ids)  # one file per batch


def test_stream_interval_join_matches_batch_oracle_query(
    spark, sf_dir, events_dir, tmp_path
):
    """Stream-stream interval join (watermarked two-stream state) ==
    the DuckDB-verified batch q173, row for row — the E17 parity
    pattern for the join class. Both sides stream from files with
    availableNow, so every attribution pair must emit."""
    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, events_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    ev2 = read_events_stream(spark, events_dir)
    clicks = ev2.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    joined = stream_interval_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_time="p_ts",
        right_time="c_ts",
        lower="-30 minutes",
        upper="0 seconds",
        left_delay="10 minutes",
        right_delay="40 minutes",
    )
    query = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-ij"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ij_test").collect()
    }
    expected = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in QUERIES["q173_interval_join_attribution"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert expected, "parity anchor must be non-empty"
    assert got == expected


def test_stream_interval_join_refuses_colliding_columns(spark):
    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )

    a = spark.createDataFrame([(1, 1.0)], "k bigint, ts double")
    b = spark.createDataFrame([(1, 2.0)], "k bigint, ts double")
    with pytest.raises(ValueError, match="rename"):
        stream_interval_join(
            a, b, ["k"], "ts", "ts", "-1 seconds", "0 seconds"
        )


def test_stream_interval_join_left_outer_parity(
    spark, sf_dir, events_dir, tmp_path
):
    """LEFT OUTER stream-stream interval join: unmatched left rows emit
    with NULL right columns once the watermark passes their interval —
    with availableNow over a closed dataset, every unmatched purchase
    must appear exactly once. Parity: the batch left-outer join."""
    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )
    from pyspark.sql import functions as F

    def sides(reader):
        ev = reader
        p = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        ev2 = (
            read_events_stream(spark, events_dir)
            if reader.isStreaming
            else reader
        )
        c = ev2.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        return p, c

    sp, sc = sides(read_events_stream(spark, events_dir))
    joined = stream_interval_join(
        sp, sc, ["user_id"], "p_ts", "c_ts",
        "-30 minutes", "0 seconds",
        left_delay="10 minutes", right_delay="40 minutes",
        join_type="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_outer_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-ij-outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ij_outer_test").collect()
    }
    from datalakeingestionservice_spark.catalog import Env

    bp, bc = sides(Env(spark, sf_dir).t("events"))
    expected = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in stream_interval_join(
            bp, bc, ["user_id"], "p_ts", "c_ts",
            "-30 minutes", "0 seconds", join_type="left_outer",
        ).collect()
    }
    assert any(c is None for _, _, c in expected)  # unmatched exist
    # Streaming outer-join semantics: an unmatched left row emits its
    # NULL result only once the watermark passes its interval — rows
    # near the stream's END stay in state (the watermark never
    # advances past max event time - delay). So: every emitted row is
    # correct (subset), all MATCHED pairs emit, and the only missing
    # rows are tail unmatched purchases inside the final horizon.
    assert got <= expected
    matched_e = {x for x in expected if x[2] is not None}
    assert {x for x in got if x[2] is not None} == matched_e
    missing = expected - got
    assert all(c is None for _, _, c in missing), missing
    if missing:
        # A left row is declared unmatched only when the RIGHT
        # watermark (max click ts - right_delay) passes its p_ts; any
        # purchase after that horizon legitimately stays in state.
        maxc = bc.agg(F.max("c_ts").alias("mx")).collect()[0].mx
        tail_ids = {
            r.purchase_id
            for r in bp.filter(
                F.col("p_ts")
                >= F.lit(maxc) - F.expr("INTERVAL 40 minutes")
            ).collect()
        }
        assert {p for _, p, _ in missing} <= tail_ids, missing


def _interval_join_sides(spark, events_dir, sf_dir, streaming: bool):
    from datalakeingestionservice_spark.catalog import Env
    from pyspark.sql import functions as F

    def reader():
        if streaming:
            return read_events_stream(spark, events_dir)
        return Env(spark, sf_dir).t("events")

    p = reader().filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = reader().filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return p, c


def test_stream_interval_join_right_outer_parity(
    spark, sf_dir, events_dir, tmp_path
):
    """RIGHT OUTER stream-stream interval join, mirroring the
    left-outer parity test from the other side: unmatched CLICKS emit
    with NULL purchase columns once the LEFT watermark passes their
    interval. Also pins the key-coalesce contract — right-only rows
    must carry their user_id (under a left-alias-only key projection
    they would silently serve NULL keys)."""
    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )
    from pyspark.sql import functions as F

    args = (
        ["user_id"], "p_ts", "c_ts", "-30 minutes", "0 seconds",
    )
    sp, sc = _interval_join_sides(spark, events_dir, sf_dir, True)
    joined = stream_interval_join(
        sp, sc, *args,
        left_delay="10 minutes", right_delay="40 minutes",
        join_type="right_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_router_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-ij-router"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ij_router_test").collect()
    }
    bp, bc = _interval_join_sides(spark, events_dir, sf_dir, False)
    expected = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in stream_interval_join(
            bp, bc, *args, join_type="right_outer"
        ).collect()
    }
    assert any(p is None for _, p, _ in expected)  # unmatched exist
    # the coalesce fix: right-only rows keep their join key
    assert all(u is not None for u, _, _ in expected)
    assert all(u is not None for u, _, _ in got)
    assert got <= expected
    matched_e = {x for x in expected if x[1] is not None}
    assert {x for x in got if x[1] is not None} == matched_e
    missing = expected - got
    assert all(p is None for _, p, _ in missing), missing
    if missing:
        # A right row is declared unmatched only when the GLOBAL
        # watermark — min(max p_ts - left_delay, max c_ts -
        # right_delay), Spark's multiple-watermark policy — passes the
        # end of its match interval (c_ts + 30 minutes, since p in
        # [c_ts, c_ts+30m]); clicks at or after that horizon
        # legitimately stay in state.
        maxp = bp.agg(F.max("p_ts").alias("mx")).collect()[0].mx
        maxc = bc.agg(F.max("c_ts").alias("mx")).collect()[0].mx
        import datetime as _dt

        global_wm = min(
            maxp - _dt.timedelta(minutes=10),
            maxc - _dt.timedelta(minutes=40),
        )
        tail_ids = {
            r.click_id
            for r in bc.filter(
                F.col("c_ts")
                >= F.lit(global_wm) - F.expr("INTERVAL 30 minutes")
            ).collect()
        }
        assert {c for _, _, c in missing} <= tail_ids, missing


def test_stream_interval_join_full_outer_parity(
    spark, sf_dir, events_dir, tmp_path
):
    """FULL OUTER stream-stream interval join: both sides' unmatched
    rows emit null-padded, each gated by the OTHER side's watermark
    horizon — the union of the left-outer and right-outer boundary
    models, with keys coalesced across sides."""
    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )
    from pyspark.sql import functions as F

    args = (
        ["user_id"], "p_ts", "c_ts", "-30 minutes", "0 seconds",
    )
    sp, sc = _interval_join_sides(spark, events_dir, sf_dir, True)
    joined = stream_interval_join(
        sp, sc, *args,
        left_delay="10 minutes", right_delay="40 minutes",
        join_type="full_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_fouter_test")
        .option("checkpointLocation", str(tmp_path / "ckpt-ij-fouter"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ij_fouter_test").collect()
    }
    bp, bc = _interval_join_sides(spark, events_dir, sf_dir, False)
    expected = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in stream_interval_join(
            bp, bc, *args, join_type="full_outer"
        ).collect()
    }
    assert any(p is None for _, p, _ in expected)
    assert any(c is None for _, _, c in expected)
    assert all(u is not None for u, _, _ in expected | got)
    assert got <= expected
    matched_e = {
        x for x in expected if x[1] is not None and x[2] is not None
    }
    assert {
        x for x in got if x[1] is not None and x[2] is not None
    } == matched_e
    missing = expected - got
    assert all(p is None or c is None for _, p, c in missing), missing
    if missing:
        # Same global-watermark model as the one-sided tests: a left
        # row's interval ends at p_ts (upper = 0s), a right row's at
        # c_ts + 30 minutes; either side's null result is withheld
        # while the global watermark hasn't passed that end.
        maxc = bc.agg(F.max("c_ts").alias("mx")).collect()[0].mx
        maxp = bp.agg(F.max("p_ts").alias("mx")).collect()[0].mx
        import datetime as _dt

        global_wm = min(
            maxp - _dt.timedelta(minutes=10),
            maxc - _dt.timedelta(minutes=40),
        )
        tail_p = {
            r.purchase_id
            for r in bp.filter(
                F.col("p_ts") >= F.lit(global_wm)
            ).collect()
        }
        tail_c = {
            r.click_id
            for r in bc.filter(
                F.col("c_ts")
                >= F.lit(global_wm) - F.expr("INTERVAL 30 minutes")
            ).collect()
        }
        for _, p, c in missing:
            if c is None:
                assert p in tail_p, (p, c)
            else:
                assert c in tail_c, (p, c)


def test_stream_interval_join_sentinel_flush_drains_tail(spark, tmp_path):
    """The documented terminal-flush recipe (interval_join.py module
    docstring): OSS Spark has no end-of-stream punctuation, so a
    bounded replay that needs the COMPLETE outer result appends one
    sentinel row per side with event time past max + delay + span —
    the global watermark then passes every real row and the withheld
    outer tail drains. Full-outer output over the real rows equals the
    batch twin EXACTLY (the other parity tests model the tail as
    withheld; this one proves the recipe that drains it)."""
    import datetime as dt

    from datalakeingestionservice_spark.streaming import (
        stream_interval_join,
    )

    def T(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    # p2: unmatched purchase near the stream END (inside the final
    # horizon — withheld without the sentinel); c2: unmatched click
    lrows = [(1, T(10, 0), "p1"), (2, T(11, 59), "p2")]
    rrows = [(1, T(9, 50), "c1"), (3, T(10, 5), "c2")]
    sent_l = (999, T(23, 0), "sentinel_l")
    sent_r = (998, T(23, 0), "sentinel_r")
    lschema = "user_id bigint, p_ts timestamp, purchase_id string"
    rschema = "user_id bigint, c_ts timestamp, click_id string"
    ldir, rdir = str(tmp_path / "ijl"), str(tmp_path / "ijr")
    spark.createDataFrame(lrows + [sent_l], lschema).write.parquet(ldir)
    spark.createDataFrame(rrows + [sent_r], rschema).write.parquet(rdir)

    joined = stream_interval_join(
        spark.readStream.schema(lschema).parquet(ldir),
        spark.readStream.schema(rschema).parquet(rdir),
        ["user_id"], "p_ts", "c_ts", "-30 minutes", "0 seconds",
        left_delay="10 minutes", right_delay="40 minutes",
        join_type="full_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_sentinel")
        .option("checkpointLocation", str(tmp_path / "ck-ij-sent"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ij_sentinel").collect()
        if r.user_id not in (998, 999)  # sentinels excluded
    }
    expected = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in stream_interval_join(
            spark.createDataFrame(lrows, lschema),
            spark.createDataFrame(rrows, rschema),
            ["user_id"], "p_ts", "c_ts",
            "-30 minutes", "0 seconds", join_type="full_outer",
        ).collect()
    }
    assert got == expected  # EXACT parity — nothing withheld
    assert (2, "p2", None) in got  # the tail row actually drained
    assert (3, None, "c2") in got
