"""Join/set-semantics corners: outer joins, NOT IN with NULLs, scalar
subqueries, HAVING, LIMIT/OFFSET — the last rows of the SQL surface grid."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q80 — NOT IN with NULLs (three-valued logic done right).
# ---------------------------------------------------------------------------
@register(
    "q80_not_in_null_semantics",
    tags=("subquery", "null", "semantics"),
    oracle="""
WITH probe AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_nationkey END AS nk
  FROM customer
)
SELECT
  (SELECT count(*) FROM probe WHERE nk NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5))
    AS not_in_clean,
  (SELECT count(*) FROM probe
   WHERE nk NOT IN (SELECT CASE WHEN n_nationkey = 3 THEN NULL ELSE n_nationkey END
                    FROM nation WHERE n_nationkey < 5))
    AS not_in_with_null_rhs,
  (SELECT count(*) FROM probe WHERE nk IS NULL) AS null_probes
""",
)
def q80_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued logic: a NULL on either side makes the predicate
    UNKNOWN (row dropped) — the classic silent-data-loss footgun, verified to
    behave identically in both engines. A NULL in the subquery empties the
    whole result (not_in_with_null_rhs = 0)."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        WITH probe AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_nationkey END AS nk
          FROM customer
        )
        SELECT
          (SELECT count(*) FROM probe
           WHERE nk NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5))
            AS not_in_clean,
          (SELECT count(*) FROM probe
           WHERE nk NOT IN (SELECT CASE WHEN n_nationkey = 3 THEN NULL ELSE n_nationkey END
                            FROM nation WHERE n_nationkey < 5))
            AS not_in_with_null_rhs,
          (SELECT count(*) FROM probe WHERE nk IS NULL) AS null_probes
        """
    )


# ---------------------------------------------------------------------------
# q81 — scalar subqueries in SELECT and WHERE.
# ---------------------------------------------------------------------------
@register(
    "q81_scalar_subquery",
    tags=("subquery", "scalar"),
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS price,
       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS vs_avg
FROM orders
WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_orderkey
""",
)
def q81_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries: computed once, broadcast into both the
    projection and the filter."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice, 2) AS price,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS vs_avg
        FROM orders
        WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# q82 — FULL OUTER + RIGHT joins.
# ---------------------------------------------------------------------------
@register(
    "q82_outer_joins",
    tags=("join", "outer"),
    oracle="""
WITH cust_96 AS (
  SELECT o_custkey, count(*) AS n_96 FROM orders
  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
),
cust_99 AS (
  SELECT o_custkey, count(*) AS n_99 FROM orders
  WHERE year(o_orderdate) = 1999 GROUP BY o_custkey
)
SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
       coalesce(a.n_96, 0) AS n_96,
       coalesce(b.n_99, 0) AS n_99,
       CASE WHEN a.o_custkey IS NULL THEN 'only_99'
            WHEN b.o_custkey IS NULL THEN 'only_96'
            ELSE 'both' END AS presence
FROM cust_96 a FULL OUTER JOIN cust_99 b ON a.o_custkey = b.o_custkey
ORDER BY custkey
""",
)
def q82_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two yearly activity sets, with presence tagging —
    the retention/churn comparison shape."""
    env = Env(spark, sf_dir)
    orders = env.t("orders")

    def year_counts(year: int, out: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = year_counts(1996, "n_96").alias("a")
    b = year_counts(1999, "n_99").alias("b")
    return (
        a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
            F.coalesce(F.col("n_96"), F.lit(0)).alias("n_96"),
            F.coalesce(F.col("n_99"), F.lit(0)).alias("n_99"),
            F.when(F.col("a.o_custkey").isNull(), F.lit("only_99"))
            .when(F.col("b.o_custkey").isNull(), F.lit("only_96"))
            .otherwise(F.lit("both"))
            .alias("presence"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# q83 — HAVING + LIMIT/OFFSET pagination.
# ---------------------------------------------------------------------------
@register(
    "q83_having_limit_offset",
    tags=("having", "limit", "offset"),
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 5
ORDER BY spend DESC, o_custkey
LIMIT 20 OFFSET 10
""",
)
def q83_having_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter + deterministic ORDER BY pagination
    (LIMIT/OFFSET — page 2 of the top-spenders report)."""
    env = Env(spark, sf_dir)
    return (
        env.t("orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 5)
        .orderBy(F.desc("spend"), F.asc("o_custkey"))
        .offset(10)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q106 — salted skew join: identical output to the plain equi-join.
# ---------------------------------------------------------------------------
@register(
    "q106_salted_skew_join",
    tags=("join", "skew", "scale"),
    oracle="""
SELECT s.s_nationkey AS s_nationkey,
       count(*) AS n_lines,
       CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty,
       round(sum(l.l_extendedprice), 2) AS total_price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
ORDER BY s_nationkey
""",
)
def q106_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate join (operators/skew.py): the fact side is salted,
    the supplier side replicated per salt, so one hot l_suppkey spreads over
    n_salts shuffle tasks instead of one straggler. The oracle is the PLAIN
    join — salting must not change a single output row."""
    from datalakeingestionservice_spark.operators.skew import salted_join

    env = Env(spark, sf_dir)
    lineitem = env.t("lineitem").select("l_suppkey", "l_quantity", "l_extendedprice")
    supplier = env.t("supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(lineitem, supplier, on="l_suppkey", n_salts=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("s_nationkey")
    )
