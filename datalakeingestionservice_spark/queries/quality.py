"""Data-quality queries: profiling and expectations over the lake tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.quality import (
    Expectation,
    check_expectations,
    check_referential,
    check_unique_key,
    expect_in,
    expect_not_null,
    expect_range,
    profile,
)
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q77 — column profile of lineitem.
# ---------------------------------------------------------------------------
@register(
    "q77_column_profile",
    tags=("quality", "profile"),
    oracle="""
WITH stats AS (
  SELECT count(*) AS n,
         count(*) - count(l_quantity) AS nulls_q, count(DISTINCT l_quantity) AS d_q,
         CAST(min(l_quantity) AS VARCHAR) AS min_q, CAST(max(l_quantity) AS VARCHAR) AS max_q,
         count(*) - count(l_returnflag) AS nulls_f, count(DISTINCT l_returnflag) AS d_f,
         min(l_returnflag) AS min_f, max(l_returnflag) AS max_f,
         count(*) - count(l_orderkey) AS nulls_k, count(DISTINCT l_orderkey) AS d_k,
         CAST(min(l_orderkey) AS VARCHAR) AS min_k, CAST(max(l_orderkey) AS VARCHAR) AS max_k
  FROM lineitem
)
SELECT 'l_quantity' AS "column", n AS n_rows, nulls_q AS n_nulls, d_q AS n_distinct,
       min_q AS min_value, max_q AS max_value FROM stats
UNION ALL
SELECT 'l_returnflag', n, nulls_f, d_f, min_f, max_f FROM stats
UNION ALL
SELECT 'l_orderkey', n, nulls_k, d_k, min_k, max_k FROM stats
ORDER BY "column"
""",
)
def q77_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass profiling (nulls/distincts/min/max per column) — what lands in
    the ingestion run report before any downstream consumer trusts the data."""
    env = Env(spark, sf_dir)
    return profile(
        env.t("lineitem"), ["l_quantity", "l_returnflag", "l_orderkey"]
    ).orderBy("column")


# ---------------------------------------------------------------------------
# q78 — declarative expectations + key/FK audits.
# ---------------------------------------------------------------------------
@register(
    "q78_expectations",
    tags=("quality", "validation"),
    oracle="""
WITH exp AS (
  SELECT count(*) AS n,
         CAST(count_if(NOT (o_totalprice > 0) OR o_totalprice IS NULL) AS BIGINT) AS v_price,
         CAST(count_if(o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL) AS BIGINT) AS v_status,
         CAST(count_if(o_custkey IS NULL) AS BIGINT) AS v_cust
  FROM orders
),
uniq AS (
  SELECT count(*) AS n_keys,
         CAST(count_if(c > 1) AS BIGINT) AS n_duplicate_keys,
         CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT) AS n_excess_rows
  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY o_orderkey)
),
fk AS (
  SELECT (SELECT count(*) FROM lineitem) AS n_child_rows,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphans
)
SELECT 'fk_lineitem_orders' AS check_name, n_child_rows AS n, n_orphans AS violations FROM fk
UNION ALL SELECT 'in(o_orderstatus)', n, v_status FROM exp
UNION ALL SELECT 'not_null(o_custkey)', n, v_cust FROM exp
UNION ALL SELECT 'range(o_totalprice)', n, v_price FROM exp
UNION ALL SELECT 'unique(o_orderkey)', n_keys, n_duplicate_keys FROM uniq
ORDER BY check_name
""",
)
def q78_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations (range / in-set / not-null) + key-uniqueness +
    referential-integrity audits, every check a count in one aggregation pass
    — the contract gate between ingestion and consumers."""
    env = Env(spark, sf_dir)
    orders = env.t("orders")
    line = env.t("lineitem")

    exp = check_expectations(
        orders,
        [
            Expectation("range(o_totalprice)", F.col("o_totalprice") > 0),
            expect_in("o_orderstatus", ["F", "O", "P"]),
            expect_not_null("o_custkey"),
        ],
    ).select(
        F.col("expectation").alias("check_name"),
        F.col("n_rows").alias("n"),
        F.col("n_violations").alias("violations"),
    )
    uniq = check_unique_key(orders, ["o_orderkey"]).select(
        F.lit("unique(o_orderkey)").alias("check_name"),
        F.col("n_keys").alias("n"),
        F.col("n_duplicate_keys").alias("violations"),
    )
    fk = check_referential(line, orders, "l_orderkey", "o_orderkey").select(
        F.lit("fk_lineitem_orders").alias("check_name"),
        F.col("n_child_rows").alias("n"),
        F.col("n_orphans").alias("violations"),
    )
    return exp.unionByName(uniq).unionByName(fk).orderBy("check_name")


# ---------------------------------------------------------------------------
# q120 — winsorized (outlier-clipped) robust statistics per group.
# ---------------------------------------------------------------------------
@register(
    "q120_winsorized_stats",
    tags=("quality", "robust", "winsorize", "percentile"),
    oracle="""
WITH b AS (
  SELECT l_returnflag,
         percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)
           AS lo,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
           AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag AS l_returnflag,
       CAST(sum(CAST(least(greatest(l_extendedprice, lo), hi)
                     AS DECIMAL(18,2))) AS DOUBLE) AS win_sum,
       count(*) AS n_rows,
       count(*) FILTER (WHERE l_extendedprice < lo) AS n_clipped_low,
       count(*) FILTER (WHERE l_extendedprice > hi) AS n_clipped_high,
       round(lo, 2) AS p05,
       round(hi, 2) AS p95
FROM lineitem l JOIN b USING (l_returnflag)
GROUP BY l.l_returnflag, lo, hi
""",
)
def q120_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregates: clip each price to its group's [p05, p95]
    before summing — the robust-statistics step that keeps a handful of
    corrupt outliers from dominating pipeline quality metrics. Two-pass
    shape: tiny per-group bounds (percentile_disc, engine-exact element
    pick) broadcast back onto the fact scan; the clipped sum runs in exact
    DECIMAL then casts once, so accumulation order can't flip the hash.
    Clip counts use count_if == DuckDB's count FILTER."""
    env = Env(spark, sf_dir)
    li = env.t("lineitem")

    bounds = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.sum(clipped.cast("decimal(18,2)"))
            .cast("double")
            .alias("win_sum"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("l_extendedprice") < F.col("lo")).alias(
                "n_clipped_low"
            ),
            F.count_if(F.col("l_extendedprice") > F.col("hi")).alias(
                "n_clipped_high"
            ),
        )
        .select(
            "l_returnflag",
            "win_sum",
            "n_rows",
            "n_clipped_low",
            "n_clipped_high",
            F.round("lo", 2).alias("p05"),
            F.round("hi", 2).alias("p95"),
        )
    )
