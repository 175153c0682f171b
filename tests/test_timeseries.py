"""As-of join, range join, salted aggregation — operator-level edge cases."""

from __future__ import annotations

import datetime as dt

from datalakeingestionservice_spark.operators.timeseries import (
    asof_join,
    range_join_buckets,
    salted_sum,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T10:00:00"), 1),
            ("k", _ts("2024-01-01T10:05:00"), 2),
            ("k", _ts("2024-01-01T09:00:00"), 3),  # before any right row
        ],
        ["key", "ts", "row_id"],
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T09:30:00"), 100.0),
            ("k", _ts("2024-01-01T10:00:00"), 200.0),  # equal ts: included
            ("k", _ts("2024-01-01T10:04:00"), 300.0),
        ],
        ["key", "rts", "rate"],
    )
    out = {
        r.row_id: r.rate
        for r in asof_join(
            left, right, on="key", left_ts="ts", right_ts="rts",
            value_cols=["rate"],
        ).collect()
    }
    assert out == {1: 200.0, 2: 300.0, 3: None}


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01T10:00:00"), 1)], ["key", "ts", "row_id"]
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T09:00:00"), 1.0),
            ("k", _ts("2024-01-01T11:00:00"), 2.0),
        ],
        ["key", "rts", "rate"],
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        value_cols=["rate"], direction="forward",
    ).collect()
    assert out[0].rate == 2.0


def test_asof_keys_are_isolated(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T10:00:00"), 1)], ["key", "ts", "row_id"]
    )
    right = spark.createDataFrame(
        [("b", _ts("2024-01-01T09:00:00"), 9.0)], ["key", "rts", "rate"]
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", value_cols=["rate"]
    ).collect()
    assert out[0].rate is None  # other key's rows never leak


def test_range_join_buckets_exact_boundary(spark):
    a = spark.createDataFrame(
        [("u", 1, _ts("2024-01-01T10:00:00"))], ["user", "id_a", "ts_a"]
    )
    b = spark.createDataFrame(
        [
            ("u", 2, _ts("2024-01-01T10:01:00")),   # exactly 60s: included
            ("u", 3, _ts("2024-01-01T10:01:01")),   # 61s: excluded
            ("u", 4, _ts("2024-01-01T09:59:30")),   # -30s: included
        ],
        ["user", "id_b", "ts_b"],
    )
    got = {
        r.id_b
        for r in range_join_buckets(
            a, b, on="user", left_ts="ts_a", right_ts="ts_b", max_gap_seconds=60
        ).collect()
    }
    assert got == {2, 4}


def test_salted_sum_equals_plain_sum(spark, sf_dir):
    from pyspark.sql import functions as F

    line = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r.l_returnflag: r.total
        for r in line.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"))
        .collect()
    }
    salted = {
        r.l_returnflag: r.total_qty
        for r in salted_sum(
            line, "l_returnflag", "l_quantity", out_col="total_qty"
        ).collect()
    }
    assert salted == plain
