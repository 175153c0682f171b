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
# q72 — gap filling: last observation carried forward (IGNORE NULLS window).
# ---------------------------------------------------------------------------
@register(
    "q72_gap_fill_locf",
    tags=("timeseries", "window", "ignore-nulls"),
    oracle="""
WITH sparse AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
  FROM events
),
filled AS (
  SELECT user_id, event_id,
         purchase_value,
         last_value(purchase_value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_purchase_value
  FROM sparse
)
SELECT user_id,
       count(*) AS n_events,
       count(purchase_value) AS n_purchases,
       round(sum(coalesce(last_purchase_value, 0.0)), 2) AS locf_sum
FROM filled
GROUP BY user_id
ORDER BY user_id
""",
)
def q72_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: sparse purchase values propagated
    over every subsequent event with last_value(... IGNORE NULLS) — the
    canonical time-series gap-fill, one window shuffle."""
    env = Env(spark, sf_dir)
    from pyspark.sql.window import Window

    sparse = env.t("events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.withColumn(
        "last_purchase_value",
        F.last("purchase_value", ignorenulls=True).over(w),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("purchase_value").alias("n_purchases"),
            F.round(
                F.sum(F.coalesce("last_purchase_value", F.lit(0.0))), 2
            ).alias("locf_sum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q73 — edit-distance similarity (levenshtein).
# ---------------------------------------------------------------------------
@register(
    "q73_levenshtein",
    tags=("string", "similarity", "scalar"),
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       levenshtein(a.s_name, b.s_name) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
ORDER BY supp_a, supp_b
""",
)
def q73_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical supplier names by edit distance — the string-similarity
    scalar (exact integer parity across engines). Pairwise here (small dim
    table); at scale the same scalar runs on LSH/blocking candidates only."""
    env = Env(spark, sf_dir)
    supp = env.t("supplier")
    a, b = supp.alias("a"), supp.alias("b")
    dist = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    return (
        a.join(b, F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .filter(dist <= 2)
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            dist.alias("edit_dist"),
        )
        .orderBy("supp_a", "supp_b")
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


# ---------------------------------------------------------------------------
# q173 — interval join (purchase <- click attribution, E100's batch half):
# every (purchase, click) pair per user with the click at most 30 minutes
# BEFORE the purchase. The SAME operator runs as a watermarked stream-stream
# join (streaming/interval_join.py) — the streaming twin is batch-parity
# pinned in tests/test_streaming.py against this DuckDB-verified query.
# ---------------------------------------------------------------------------
@register(
    "q173_interval_join_attribution",
    tags=("timeseries", "join", "interval", "streaming-twin", "events"),
    oracle="""
SELECT p.user_id AS user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(floor(epoch(p.ts - c.ts) / 60) AS BIGINT) AS lag_minutes
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY user_id, purchase_id, click_id
""",
)
def q173_interval_join_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All (purchase, click) attribution pairs: same user, click within
    the 30 minutes before the purchase — `stream_interval_join` in
    batch mode (identical semantics; streaming adds watermarks and
    bounded state). At 100 TB the streaming form is the production
    path: state is O(events-in-window) per side, evicted as the
    opposite watermark passes the interval."""
    from datalakeingestionservice_spark.streaming.interval_join import (
        stream_interval_join,
    )

    env = Env(spark, sf_dir)
    ev = env.t("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
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
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.floor(
            (F.unix_micros("p_ts") - F.unix_micros("c_ts"))
            / 60_000_000
        ).cast("long").alias("lag_minutes"),
    ).orderBy("user_id", "purchase_id", "click_id")
