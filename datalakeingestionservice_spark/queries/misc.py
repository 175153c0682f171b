"""Remaining SQL-surface corners: interval RANGE frames, null-safe semantics,
conditional/boolean aggregates, unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q74 — time-interval RANGE window (rolling 1-hour activity).
# ---------------------------------------------------------------------------
@register(
    "q74_rolling_time_window",
    tags=("window", "range", "timeseries"),
    oracle="""
SELECT user_id, event_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS events_last_hour,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
         AS value_last_hour
FROM events
WHERE user_id < 30
ORDER BY user_id, event_id
""",
)
def q74_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour window via a time-interval RANGE frame — the
    sliding aggregate without self-joins or window explosion."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT user_id, event_id,
               count(*) OVER w AS events_last_hour,
               round(sum(value) OVER w, 2) AS value_last_hour
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
        """
    )


# ---------------------------------------------------------------------------
# q75 — null-safe equality + try_cast + conditional/boolean aggregates.
# ---------------------------------------------------------------------------
@register(
    "q75_null_semantics",
    tags=("null", "scalar", "agg"),
    oracle="""
WITH flagged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status_n,
         TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'oops'
                       ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS maybe_key
  FROM orders WHERE o_orderkey <= 1000
)
SELECT status_n,
       count(*) AS n,
       count(maybe_key) AS n_castable,
       CAST(count_if(maybe_key IS NULL) AS BIGINT) AS n_uncastable,
       bool_and(o_orderkey > 0) AS all_positive,
       bool_or(o_orderkey > 990) AS any_large
FROM flagged JOIN orders USING (o_orderkey)
GROUP BY status_n
ORDER BY status_n NULLS FIRST
""",
)
def q75_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast (error -> NULL, never job failure), grouping by a nullable
    key, count_if / bool_and / bool_or aggregates."""
    env = Env(spark, sf_dir)
    flagged = (
        env.t("orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
            .otherwise(F.col("o_orderstatus"))
            .alias("status_n"),
            F.try_to_number(
                F.when(F.col("o_orderkey") % 5 == 0, F.lit("oops")).otherwise(
                    F.col("o_orderkey").cast("string")
                ),
                F.lit("999999999999"),
            )
            .cast("bigint")
            .alias("maybe_key"),
        )
    )
    return (
        flagged.join(env.t("orders"), "o_orderkey")
        .groupBy("status_n")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("maybe_key").alias("n_castable"),
            F.count_if(F.col("maybe_key").isNull()).alias("n_uncastable"),
            F.bool_and(F.col("o_orderkey") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderkey") > 990).alias("any_large"),
        )
        .orderBy(F.col("status_n").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q105 — top-k WITH TIES (rank cut, not row_number cut).
# ---------------------------------------------------------------------------
@register(
    "q105_topk_with_ties",
    tags=("topk", "rank", "ties"),
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         count(*) AS n_lines,
         rank() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC) AS rnk
  FROM lineitem
  GROUP BY l_returnflag, l_quantity
)
SELECT l_returnflag, CAST(l_quantity AS INTEGER) AS quantity, n_lines,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked
WHERE rnk <= 3
ORDER BY l_returnflag, rnk, quantity
""",
)
def q105_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent quantities per return flag, KEEPING ties: rank()
    cut admits every value tied at the boundary (row_number would drop
    arbitrary tied rows — the subtle top-k correctness difference)."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH ranked AS (
          SELECT l_returnflag, l_quantity,
                 count(*) AS n_lines,
                 rank() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC) AS rnk
          FROM lineitem
          GROUP BY l_returnflag, l_quantity
        )
        SELECT l_returnflag, CAST(l_quantity AS INT) AS quantity, n_lines,
               CAST(rnk AS INT) AS rnk
        FROM ranked
        WHERE rnk <= 3
        ORDER BY l_returnflag, rnk, quantity
        """
    )


# ---------------------------------------------------------------------------
# q102 — inline VALUES lookup table (literal dimension join).
# ---------------------------------------------------------------------------
@register(
    "q102_values_lookup",
    tags=("values", "join", "lookup"),
    oracle="""
SELECT labels.label AS status_label,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total
FROM orders o
JOIN (VALUES ('F', 'Filled'), ('O', 'Open'), ('P', 'Pending'))
     AS labels(code, label)
  ON o.o_orderstatus = labels.code
GROUP BY labels.label
ORDER BY status_label
""",
)
def q102_values_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table as a join dimension — code->label mappings without
    any external table (broadcast by construction; constant-folded literals)."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT labels.label AS status_label,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN (VALUES ('F', 'Filled'), ('O', 'Open'), ('P', 'Pending'))
             AS labels(code, label)
          ON o.o_orderstatus = labels.code
        GROUP BY labels.label
        ORDER BY status_label
        """
    )


# ---------------------------------------------------------------------------
# q103 — null-safe comparison (IS DISTINCT FROM).
# ---------------------------------------------------------------------------
@register(
    "q103_null_safe_compare",
    tags=("null", "semantics", "scalar"),
    oracle="""
WITH pairs AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END AS s1,
         CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderstatus END AS s2
  FROM orders WHERE o_orderkey <= 2000
)
SELECT
  CAST(count_if(s1 IS NOT DISTINCT FROM s2) AS BIGINT) AS null_safe_equal,
  CAST(count_if(s1 = s2) AS BIGINT) AS plain_equal,
  CAST(count_if(s1 IS DISTINCT FROM s2) AS BIGINT) AS null_safe_different,
  count(*) AS n
FROM pairs
""",
)
def q103_null_safe_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM vs plain equality under NULLs: null-safe
    equality treats NULL=NULL as true and NULL=value as false, where `=`
    yields UNKNOWN (dropped by count_if) — the join-key comparison you want
    for nullable CDC keys."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH pairs AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END AS s1,
                 CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderstatus END AS s2
          FROM orders WHERE o_orderkey <= 2000
        )
        SELECT
          count_if(s1 <=> s2) AS null_safe_equal,
          count_if(s1 = s2) AS plain_equal,
          count_if(NOT (s1 <=> s2)) AS null_safe_different,
          count(*) AS n
        FROM pairs
        """
    )


# ---------------------------------------------------------------------------
# q98 — snapshot diff (added / removed / changed rows between table versions).
# ---------------------------------------------------------------------------
@register(
    "q98_snapshot_diff",
    tags=("diff", "cdc", "outer-join"),
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
snap_b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         round(o_totalprice, 2) AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
)
SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            WHEN a.o_orderstatus <> b.o_orderstatus OR a.price <> b.price
              THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n
FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
GROUP BY 1
ORDER BY change_type
""",
)
def q98_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version diff: two snapshots full-outer-joined on the key, rows
    classified added/removed/changed/unchanged — the audit between any two
    ingestion runs (here: a later date window + synthetic status mutations
    play the new version). One shuffle on the key."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH snap_a AS (
          SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ),
        snap_b AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
                 round(o_totalprice, 2) AS price
          FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        )
        SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN b.o_orderkey IS NULL THEN 'removed'
                    WHEN a.o_orderstatus <> b.o_orderstatus OR a.price <> b.price
                      THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               count(*) AS n
        FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
        GROUP BY 1
        ORDER BY change_type
        """
    )


# ---------------------------------------------------------------------------
# q99 — weighted aggregates.
# ---------------------------------------------------------------------------
@register(
    "q99_weighted_metrics",
    tags=("agg", "weighted"),
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS qty_weighted_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS discounted_revenue,
       round(sum(l_quantity), 2) AS total_weight
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q99_weighted_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: sum(w*x)/sum(w) — the weighted-mean
    shape every pricing/quality rollup needs (plain avg() would weight each
    line equally regardless of volume)."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("qty_weighted_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("discounted_revenue"),
            F.round(F.sum("l_quantity"), 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q97 — cumulative distinct count (running COUNT(DISTINCT) via first-seen flags).
# ---------------------------------------------------------------------------
@register(
    "q97_cumulative_distinct",
    tags=("window", "distinct", "composition"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events
  WHERE user_id < 30
)
SELECT user_id, event_id,
       CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM flagged
ORDER BY user_id, event_id
""",
)
def q97_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — unsupported as a window aggregate in Spark —
    composed from primitives: flag each (user, type)'s first occurrence, then
    running-sum the flags. Two window passes, same shuffle key."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                              ORDER BY ts, event_id) = 1
                      THEN 1 ELSE 0 END AS is_first
          FROM events
          WHERE user_id < 30
        )
        SELECT user_id, event_id,
               sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS distinct_types_so_far
        FROM flagged
        ORDER BY user_id, event_id
        """
    )


# ---------------------------------------------------------------------------
# q96 — ratio-to-report (percent of total / percent of group).
# ---------------------------------------------------------------------------
@register(
    "q96_percent_of_total",
    tags=("window", "ratio", "analytics"),
    oracle="""
WITH seg AS (
  SELECT c.c_mktsegment AS segment, n.n_name AS nation,
         sum(o.o_totalprice) AS revenue
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, n.n_name
)
SELECT segment, nation,
       round(revenue, 2) AS revenue,
       round(100.0 * revenue / sum(revenue) OVER (), 4) AS pct_of_total,
       round(100.0 * revenue / sum(revenue) OVER (PARTITION BY segment), 4)
         AS pct_of_segment
FROM seg
ORDER BY segment, nation
""",
)
def q96_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (segment, nation) revenue as a share of the
    grand total (empty OVER()) and of its segment — the BI contribution
    breakdown, two window frames over one aggregated input."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH seg AS (
          SELECT c.c_mktsegment AS segment, n.n_name AS nation,
                 sum(o.o_totalprice) AS revenue
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment, n.n_name
        )
        SELECT segment, nation,
               round(revenue, 2) AS revenue,
               round(100.0 * revenue / sum(revenue) OVER (), 4) AS pct_of_total,
               round(100.0 * revenue / sum(revenue) OVER (PARTITION BY segment), 4)
                 AS pct_of_segment
        FROM seg
        ORDER BY segment, nation
        """
    )


# ---------------------------------------------------------------------------
# q93 — equal-width histogram.
# ---------------------------------------------------------------------------
@register(
    "q93_histogram",
    tags=("histogram", "agg", "analytics"),
    oracle="""
WITH bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
),
binned AS (
  SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS INTEGER), 9)
           AS bin
  FROM orders CROSS JOIN bounds
)
SELECT bin, count(*) AS n
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def q93_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 10-bin histogram: data-derived bounds via a broadcast
    scalar aggregate, binning as pure arithmetic — the distribution profile
    at any scale (two passes: bounds, then counts)."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH bounds AS (
          SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
        ),
        binned AS (
          SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS INT), 9)
                   AS bin
          FROM orders CROSS JOIN bounds
        )
        SELECT bin, count(*) AS n
        FROM binned
        GROUP BY bin
        ORDER BY bin
        """
    )


# ---------------------------------------------------------------------------
# q94 — calendar spine + activity gap detection.
# ---------------------------------------------------------------------------
@register(
    "q94_calendar_gaps",
    tags=("timeseries", "spine", "explode"),
    oracle="""
WITH spine AS (
  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS day
),
activity AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
)
SELECT s.day AS day,
       CASE WHEN a.day IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine s LEFT JOIN activity a ON s.day = a.day
ORDER BY day
""",
)
def q94_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine (sequence + explode) left-joined to observed
    activity days — finds silent days that pure aggregation can't see
    (missing groups don't exist to aggregate). The completeness-check pattern
    for any time-partitioned feed."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH spine AS (
          SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',
                                  INTERVAL 1 DAY)) AS day
        ),
        activity AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
        )
        SELECT s.day AS day,
               CASE WHEN a.day IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM spine s LEFT JOIN activity a ON s.day = a.day
        ORDER BY day
        """
    )


# ---------------------------------------------------------------------------
# q92 — SCD Type 2 history build (validity intervals from change events).
# ---------------------------------------------------------------------------
@register(
    "q92_scd2_intervals",
    tags=("scd2", "window", "cdc"),
    oracle="""
WITH changes AS (
  SELECT user_id, ts, event_type, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
  WHERE event_type IN ('signup', 'purchase') AND user_id < 40
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
         AS valid_to,
       event_type AS state,
       round(value, 2) AS state_value,
       CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
ORDER BY user_id, valid_from
""",
)
def q92_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: change events become half-open
    validity intervals via lead() — open intervals get the sentinel end date
    and an is_current flag. The history-table build every warehouse ingests
    CDC through, one window shuffle."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH changes AS (
          SELECT user_id, ts, event_type, value,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
          FROM events
          WHERE event_type IN ('signup', 'purchase') AND user_id < 40
        )
        SELECT user_id,
               date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS valid_from,
               coalesce(date_format(next_ts, 'yyyy-MM-dd HH:mm:ss'),
                        '9999-12-31 00:00:00') AS valid_to,
               event_type AS state,
               round(value, 2) AS state_value,
               CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
        FROM changes
        ORDER BY user_id, valid_from
        """
    )


# ---------------------------------------------------------------------------
# q91 — aggregate-as-window (per-row group median without collapsing rows).
# ---------------------------------------------------------------------------
@register(
    "q91_median_over_window",
    tags=("window", "percentile", "agg-as-window"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS price,
       round(quantile_disc(o_totalprice, 0.5) OVER (PARTITION BY o_custkey), 2)
         AS cust_median,
       CASE WHEN o_totalprice >= quantile_disc(o_totalprice, 0.5)
                                  OVER (PARTITION BY o_custkey)
            THEN 1 ELSE 0 END AS above_median
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
)
def q91_median_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group medians attached to every row (aggregate used as a window
    function, full-partition frame) — flags orders above their customer's
    median without a groupBy+join round trip. percentile_disc keeps the value
    an actual element, so engines agree exactly."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                     OVER (PARTITION BY o_custkey), 2) AS cust_median,
               CASE WHEN o_totalprice >=
                         percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                         OVER (PARTITION BY o_custkey)
                    THEN 1 ELSE 0 END AS above_median
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# q76 — unpivot (wide -> long).
# ---------------------------------------------------------------------------
@register(
    "q76_unpivot",
    tags=("unpivot", "reshape"),
    oracle="""
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS filled,
         round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_,
         round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS pending
  FROM orders GROUP BY 1
)
SELECT yr, status, total FROM (
  SELECT yr, 'filled' AS status, filled AS total FROM wide
  UNION ALL SELECT yr, 'open_', open_ FROM wide
  UNION ALL SELECT yr, 'pending', pending FROM wide
)
ORDER BY yr, status
""",
)
def q76_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with the native unpivot operator (single pass, no
    N-way self-union)."""
    env = Env(spark, sf_dir)

    def status_sum(status: str) -> F.Column:
        return F.round(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == status, F.col("o_totalprice")
                ).otherwise(0.0)
            ),
            2,
        )

    wide = (
        env.t("orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            status_sum("F").alias("filled"),
            status_sum("O").alias("open_"),
            status_sum("P").alias("pending"),
        )
    )
    return (
        wide.unpivot(
            "yr", ["filled", "open_", "pending"], "status", "total"
        )
        .orderBy("yr", "status")
    )
