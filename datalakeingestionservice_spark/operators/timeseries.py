"""Time-series operators Spark lacks natively: as-of join, bounded range join,
salted aggregation.

As-of join uses the union-merge trick: tag both sides, union, and carry the
last right-side row forward with a window — one shuffle on (key, ts), no
inequality join, no per-row probing. This is the scalable form (an inequality
theta-join would be a broadcast nested loop).

Range join bins both sides into fixed-width time buckets and equi-joins on
(key, bucket) pairs including neighbors, then applies the exact predicate —
turning an inequality join into a bounded equi-join (the standard trick
DuckDB/Databricks do internally via range-join optimization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'; 'forward' = next right row),
    per key. Left rows keep NULLs when no right row qualifies.

    Implementation: union both sides ordered by (key, ts, side) and propagate
    the last non-null right values with an unbounded-preceding window. Exactly
    one shuffle; skew on hot keys is AQE's problem, not a nested loop's.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        # Right rows sort before left rows at equal ts => right_ts <= left_ts.
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[F.col(f"__f_{c}").alias(c) for c in value_cols],
        )
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs per key with |left_ts - right_ts| <= max_gap.

    Both sides get epoch-bucket ids of width max_gap; a candidate pair's
    buckets differ by at most 1, so the join is an equi-join on
    (key, bucket ± 1) followed by the exact predicate — cost bounded by
    rows-per-bucket, never |L|x|R|.
    """
    bucket_l = (F.unix_micros(F.col(left_ts)) / (max_gap_seconds * 1_000_000)).cast(
        "long"
    )
    bucket_r = (F.unix_micros(F.col(right_ts)) / (max_gap_seconds * 1_000_000)).cast(
        "long"
    )
    l = left.withColumn("__bkt", bucket_l)
    offsets = left.sparkSession.range(-1, 2).select(
        F.col("id").cast("long").alias("__off")
    )
    r = (
        right.withColumn("__bkt0", bucket_r)
        .crossJoin(F.broadcast(offsets))
        .withColumn("__bkt", F.col("__bkt0") + F.col("__off"))
        .drop("__bkt0", "__off")
    )
    exact = (
        F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
        <= max_gap_seconds * 1_000_000
    )
    return l.join(r, [on, "__bkt"]).filter(exact).drop("__bkt")


def salted_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-phase aggregation for skewed keys: pre-aggregate on (key, salt),
    then combine per key. Two small exchanges instead of one straggler task
    holding the hot key's entire volume.

    (Spark's partial aggregation usually covers this; explicit salting is for
    high-cardinality-payload aggregations — e.g. collect_list/distinct-heavy —
    where map-side combine can't compact the hot key.)
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key_col, "__salt").agg(
        F.sum(value_col).alias("__partial")
    )
    return partial.groupBy(key_col).agg(F.sum("__partial").alias(out_col))
