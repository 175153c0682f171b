"""Event-stream operators, batch-verifiable form (SURVEY.md C7 family).

The reference's only streaming-ish behavior is cron micro-batching
(`JobSchedulingService.cs:56-66`); real windows/watermarks/sessionization don't
exist there. Here each op is written over the `events` table with the same
expressions the Structured Streaming path uses
(`datalakeingestionservice_spark/streaming/`), so the DuckDB oracle verifies
the window semantics and the streaming module reuses them against
`readStream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q30 — tumbling window aggregation (the F.window operator itself).
# ---------------------------------------------------------------------------
@register(
    "q30_events_tumbling_window",
    headline=True,
    tags=("events", "window", "streaming-shape"),
    oracle="""
SELECT make_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def q30_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type — identical expression to the
    streaming job; windows align to epoch so the oracle floors epoch seconds."""
    env = Env(spark, sf_dir)
    return (
        env.t("events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q31 — sliding window.
# ---------------------------------------------------------------------------
@register(
    "q31_events_sliding_window",
    tags=("events", "window", "streaming-shape"),
    oracle="""
WITH offsets AS (SELECT unnest([0, 1800]) AS off),
base AS (
  SELECT make_timestamp(
           (CAST(floor((epoch(ts) - off) / 3600) * 3600 AS BIGINT) + off) * 1000000
         ) AS window_start,
         value
  FROM events CROSS JOIN offsets
)
SELECT window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM base
GROUP BY 1
ORDER BY window_start
""",
)
def q31_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in 2 windows.
    The oracle reproduces Spark's window assignment arithmetic exactly."""
    env = Env(spark, sf_dir)
    return (
        env.t("events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# q32 — sessionization (gap-based), the batch-SQL equivalent of
# F.session_window / applyInPandasWithState.
# ---------------------------------------------------------------------------
@register(
    "q32_events_sessionize",
    headline=True,
    tags=("events", "session", "window", "streaming-shape"),
    oracle="""
WITH seq AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM seq
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q32_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user: lag -> new-session flag -> running sum
    as session id -> per-session aggregates. One shuffle on user_id; both
    window functions share the same sort."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH seq AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        ),
        flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN prev_ts IS NULL
                           OR unix_micros(ts) - unix_micros(prev_ts) > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM seq
        ),
        sess AS (
          SELECT user_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               round(sum(value), 2) AS session_value,
               date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS session_start
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
        """
    )


# ---------------------------------------------------------------------------
# q33 — nested/JSON column access (props).
# ---------------------------------------------------------------------------
@register(
    "q33_events_json_props",
    tags=("events", "json", "nested"),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
ORDER BY k_bucket
""",
)
def q33_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsed via from_json into a typed struct, then bucketed —
    semi-structured columns as first-class citizens."""
    env = Env(spark, sf_dir)
    parsed = env.t("events").withColumn(
        "props_s", F.from_json("props", "k BIGINT")
    )
    return (
        parsed.groupBy((F.col("props_s.k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# q101 — retention cohort matrix.
# ---------------------------------------------------------------------------
@register(
    "q101_retention_cohorts",
    tags=("events", "cohort", "retention", "analytics"),
    oracle="""
WITH cohorts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id AS user_id, c.cohort_week AS cohort_week,
         CAST(date_diff('day', c.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INTEGER)
           AS week_offset
  FROM events e JOIN cohorts c ON e.user_id = c.user_id
  WHERE e.ts >= CAST(c.cohort_week AS TIMESTAMP)
)
SELECT cohort_week, week_offset, count(*) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def q101_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users cohorted by signup week, counted once per
    (cohort, weeks-since-signup) they were active in — the product-analytics
    staple. Two shuffles: cohort min-agg, then the distinct activity count."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH cohorts AS (
          SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT e.user_id, c.cohort_week,
                 CAST(datediff(CAST(date_trunc('week', e.ts) AS DATE),
                               c.cohort_week) / 7 AS INT) AS week_offset
          FROM events e JOIN cohorts c ON e.user_id = c.user_id
          WHERE e.ts >= CAST(c.cohort_week AS TIMESTAMP)
        )
        SELECT cohort_week, week_offset, count(*) AS n_active_users
        FROM activity
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
        """
    )


# ---------------------------------------------------------------------------
# q34 — event funnel: per-user earliest signup -> first purchase conversion.
# ---------------------------------------------------------------------------
@register(
    "q34_events_funnel",
    tags=("events", "join", "funnel"),
    oracle="""
WITH signups AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
purchases AS (
  SELECT e.user_id AS user_id, min(e.ts) AS first_purchase_ts
  FROM events e JOIN signups s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
  GROUP BY e.user_id
)
SELECT count(*) AS n_signup_users,
       count(p.user_id) AS n_converted,
       round(avg(CASE WHEN p.user_id IS NOT NULL
                      THEN (epoch(p.first_purchase_ts) - epoch(s.signup_ts)) / 3600.0
                 END), 2) AS avg_hours_to_convert
FROM signups s LEFT JOIN purchases p ON s.user_id = p.user_id
""",
)
def q34_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase funnel with conversion latency. min-aggregations then
    one small join; scales as two shuffles on user_id."""
    env = Env(spark, sf_dir)
    events = env.t("events")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    joined = signups.join(purchases, "user_id", "left")
    hours = (
        F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
    ) / 3.6e9
    return joined.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_ts").alias("n_converted"),
        F.round(F.avg(hours), 2).alias("avg_hours_to_convert"),
    )
