"""Time-series operator queries: as-of join, bounded range join, salted agg.

Operators Spark has no native form for (SURVEY.md C-family extensions),
implemented scale-first in `operators/timeseries.py` and verified here against
DuckDB's native ASOF JOIN / inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.timeseries import (
    asof_join,
    range_join_buckets,
    salted_sum,
)
from datalakeingestionservice_spark.queries.registry import register

#: Deterministic 6-hourly "rate index" per event type over the events month —
#: derived in-query so both engines build the identical right side.
_RATES_SQL_DUCK = """
  SELECT et.event_type AS event_type,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (s.n * 6) HOUR AS rts,
         round(1.0 + ((s.n * 7) % 100) / 100.0, 2) AS rate
  FROM (SELECT unnest(range(0, 124)) AS n) s
  CROSS JOIN (SELECT DISTINCT event_type FROM events) et
"""


def _rates_spark(env: Env) -> DataFrame:
    spark = env.spark
    steps = spark.range(0, 124).select(
        F.timestamp_micros(
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.col("id") * 6 * 3600 * 1_000_000
        ).alias("rts"),
        F.round(1.0 + ((F.col("id") * 7) % 100) / 100.0, 2).alias("rate"),
    )
    types = env.t("events").select("event_type").distinct()
    return types.crossJoin(steps)


# ---------------------------------------------------------------------------
# q38 — as-of join (most recent rate at event time, per event type).
# ---------------------------------------------------------------------------
@register(
    "q38_asof_join",
    headline=True,
    tags=("timeseries", "asof", "join"),
    oracle=f"""
WITH rates AS ({_RATES_SQL_DUCK})
SELECT e.event_type AS event_type,
       count(*) AS n_events,
       round(sum(r.rate), 2) AS rate_sum,
       round(sum(e.value * r.rate), 2) AS weighted_value
FROM events e
ASOF JOIN rates r
  ON e.event_type = r.event_type AND e.ts >= r.rts
GROUP BY e.event_type
ORDER BY event_type
""",
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union-merge (one shuffle on (key, ts), no inequality
    join): each event picks the latest rate with rts <= ts for its type.
    DuckDB's native ASOF JOIN is the oracle."""
    env = Env(spark, sf_dir)
    events = env.t("events").select("event_id", "ts", "event_type", "value")
    rates = _rates_spark(env)
    joined = asof_join(
        events,
        rates,
        on="event_type",
        left_ts="ts",
        right_ts="rts",
        value_cols=["rate"],
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("rate"), 2).alias("rate_sum"),
            F.round(F.sum(F.col("value") * F.col("rate")), 2).alias(
                "weighted_value"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q39 — bounded range join (event pairs within 60s per user).
# ---------------------------------------------------------------------------
@register(
    "q39_range_join",
    tags=("timeseries", "range-join"),
    oracle="""
SELECT a.user_id AS user_id, a.event_id AS event_a, b.event_id AS event_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_micros
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60 * 1000000
ORDER BY user_id, event_a, event_b
""",
)
def q39_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join by epoch bucketing: |ts_a - ts_b| <= 60s pairs become an
    equi-join on (user, bucket±1) + exact filter — no inequality theta-join,
    cost bounded by rows-per-bucket."""
    env = Env(spark, sf_dir)
    events = env.t("events").select("event_id", "ts", "user_id")
    a = events.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("ts").alias("ts_a"),
    )
    b = events.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("ts").alias("ts_b"),
    )
    pairs = range_join_buckets(
        a, b, on="user_id", left_ts="ts_a", right_ts="ts_b", max_gap_seconds=60
    )
    return (
        pairs.filter(F.col("event_a") < F.col("event_b"))
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.unix_micros("ts_b") - F.unix_micros("ts_a")).alias("gap_micros"),
        )
        .orderBy("user_id", "event_a", "event_b")
    )


# ---------------------------------------------------------------------------
# q56 — salted aggregation (skew-resilient two-phase sum).
# ---------------------------------------------------------------------------
@register(
    "q56_salted_aggregation",
    tags=("agg", "skew", "salting"),
    oracle="""
SELECT l_returnflag, sum(l_quantity) AS total_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q56_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase sum == plain sum (l_quantity values are integral, so
    the result is order-independent and exactly equal). 3 hot keys x 16 salts:
    the hot-key pattern for when map-side combine can't compact."""
    env = Env(spark, sf_dir)
    return (
        salted_sum(
            env.t("lineitem"), "l_returnflag", "l_quantity", n_salts=16,
            out_col="total_qty",
        )
        .orderBy("l_returnflag")
    )
