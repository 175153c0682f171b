"""Relational query surface (SURVEY.md section 2B + 2D), executed natively.

The reference ships exactly one SQL artifact (`GetDailyTrades.sql`: projection +
BETWEEN + multi-key ORDER BY) and otherwise delegates arbitrary SELECT surface
to the source RDBMS via stored procedures. This module is that surface —
projections, filters, joins (broadcast/semi/anti), aggregations (plain,
distinct, rollup/cube), windows, set ops, subqueries, top-k, scalar functions —
expressed as lazy DataFrame plans so Catalyst plans them (pushdown, pruning,
join strategy, AQE).

Numeric note: aggregate outputs over doubles are rounded (2 or 4 dp) in BOTH
the Spark plan and the DuckDB oracle so FP summation-order differences between
engines cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1-style pricing summary: the canonical scan+groupBy+agg.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    headline=True,
    tags=("groupby", "agg", "filter"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 2)                                        AS avg_qty,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> hash aggregate. Partial (map-side) aggregation keeps the
    shuffle tiny: 60k rows in, 4 groups out. Survives 100 TB unchanged."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(
                F.sum(_revenue() * (F.lit(1.0) + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — the reference's one shipped query: GetDailyTrades.sql
# (projection B1 + BETWEEN range filter B2 + multi-key sort B3).
# ---------------------------------------------------------------------------
@register(
    "q02_daily_trades",
    headline=True,
    tags=("projection", "filter", "sort"),
    doc="Parity with /root/reference/src/Worker/Datasets/SqlFiles/GetDailyTrades.sql:4-16",
    oracle="""
SELECT l_orderkey * 10 + l_linenumber            AS trade_id,
       CAST(l_shipdate AS DATE)                  AS trade_date,
       l_returnflag || l_linestatus              AS symbol,
       l_quantity                                AS quantity,
       l_extendedprice                           AS price,
       round(l_quantity * l_extendedprice, 2)    AS total_amount,
       CASE WHEN l_discount > 0.05 THEN 'SELL' ELSE 'BUY' END AS trade_type,
       l_suppkey                                 AS account_id
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
ORDER BY trade_date DESC, trade_id
""",
)
def q02_daily_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship ingest extraction, Spark-native: predicate pushes to the
    parquet scan (PushedFilters), projection prunes to 7 columns (ReadSchema)."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit("1997-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("trade_id"),
            F.col("l_shipdate").cast("date").alias("trade_date"),
            F.concat(F.col("l_returnflag"), F.col("l_linestatus")).alias("symbol"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
            F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias(
                "total_amount"
            ),
            F.when(F.col("l_discount") > 0.05, F.lit("SELL"))
            .otherwise(F.lit("BUY"))
            .alias("trade_type"),
            F.col("l_suppkey").alias("account_id"),
        )
        .orderBy(F.desc("trade_date"), F.asc("trade_id"))
    )


# ---------------------------------------------------------------------------
# q03 — TPC-H Q3-style: 3-way join + agg + top-k.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    headline=True,
    tags=("join", "groupby", "topk"),
    oracle="""
SELECT o.o_orderkey AS o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (filtered, small) joins orders joins lineitem. The filtered
    customer side is broadcast-eligible; AQE converts at runtime when small."""
    env = Env(spark, sf_dir)
    cust = env.t("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = env.t("orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    line = env.t("lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(line, line.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS / left-semi join.
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority",
    tags=("semijoin", "groupby"),
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: no row duplication, build side only hashed."""
    env = Env(spark, sf_dir)
    orders = env.t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    big_lines = env.t("lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            big_lines, orders.o_orderkey == big_lines.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — TPC-H Q5-style: 6-way star join + agg.
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    headline=True,
    tags=("join", "broadcast", "groupby"),
    oracle="""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem against 5 dims. region/nation are explicitly
    broadcast (FIXED-size dims — 5 and 25 rows at every scale factor);
    supplier GROWS with scale factor (~1B rows at sf100k), so its hint is
    left to AQE, which broadcasts at runtime whenever the actual size
    permits. The only unavoidable shuffle is customer><orders><lineitem."""
    env = Env(spark, sf_dir)
    region = env.t("region").filter(F.col("r_name") == "ASIA")
    nation = env.t("nation")
    supplier = env.t("supplier")
    customer = env.t("customer")
    orders = env.t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    line = env.t("lineitem")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(line, line.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (line.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# q06 — TPC-H Q6-style: pure pushdown filter + global agg.
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    headline=True,
    tags=("filter", "agg", "pushdown"),
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates push to the parquet reader; the agg is a single
    partial+final sum — the minimal possible plan."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — ranking window functions.
# ---------------------------------------------------------------------------
@register(
    "q07_order_rank",
    tags=("window", "rank"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
QUALIFY rn <= 3
ORDER BY o_custkey, rn
""",
)
def q07_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: one shuffle on o_custkey, sorted
    within partitions; rank/dense_rank/row_number share the same window."""
    env = Env(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        env.t("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# q08 — analytic window functions: running frames + lag.
# ---------------------------------------------------------------------------
@register(
    "q08_running_totals",
    tags=("window", "frame", "lag"),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend,
       round(o_totalprice - lag(o_totalprice, 1, 0.0)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
         AS delta_vs_prev
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, orderdate, o_orderkey
""",
)
def q08_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend + delta-vs-previous per customer; deterministic order
    via (o_orderdate, o_orderkey) so FP accumulation order matches the oracle."""
    env = Env(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        env.t("orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                2,
            ).alias("running_spend"),
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
            ).alias("delta_vs_prev"),
        )
        .orderBy("o_custkey", "orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q09 — set operations.
# ---------------------------------------------------------------------------
@register(
    "q09_set_ops",
    tags=("union", "intersect", "except"),
    oracle="""
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     machinery AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT c_custkey FROM (
  (SELECT c_custkey FROM building UNION SELECT c_custkey FROM machinery)
  INTERSECT
  SELECT c_custkey FROM rich
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_nationkey = 3
) ORDER BY c_custkey
""",
)
def q09_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT on key sets — distinct set semantics."""
    env = Env(spark, sf_dir)
    cust = env.t("customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    nation3 = cust.filter(F.col("c_nationkey") == 3).select("c_custkey")
    return (
        building.union(machinery)
        .distinct()
        .intersect(rich)
        .exceptAll(nation3.distinct())
        .distinct()
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q10 — distinct aggregates.
# ---------------------------------------------------------------------------
@register(
    "q10_distinct_agg",
    tags=("distinct", "groupby"),
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q10_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(distinct) in one agg — Catalyst expands them to a single
    multi-phase aggregate rather than N scans."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q11 — ROLLUP.
# ---------------------------------------------------------------------------
@register(
    "q11_rollup",
    tags=("rollup", "groupby"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag, status), (flag), () — one pass."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q12 — CUBE.
# ---------------------------------------------------------------------------
@register(
    "q12_cube",
    tags=("cube", "groupby"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations of (status, priority)."""
    env = Env(spark, sf_dir)
    return (
        env.t("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q13 — explicit broadcast dimension join (reference A22's intended lookup join).
# ---------------------------------------------------------------------------
@register(
    "q13_broadcast_lookup",
    headline=True,
    tags=("join", "broadcast"),
    doc="The lookup-join the reference intended but left empty "
    "(src/Infrastructure/Transformation/DatasetSpecific/FOCA/ClientDataGPNLookup.cs, 0 bytes).",
    oracle="""
SELECT p.p_brand AS brand, n.n_name AS supp_nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = 'PROMO'
GROUP BY p.p_brand, n.n_name
ORDER BY brand, supp_nation
""",
)
def q13_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact scan enriched by three broadcast dims: zero shuffle until the final
    small aggregation — the scalable form of a row-wise lookup step."""
    env = Env(spark, sf_dir)
    part = env.t("part").filter(F.col("p_type") == "PROMO")
    supp = env.t("supplier")
    nation = env.t("nation")
    line = env.t("lineitem")
    return (
        line.join(F.broadcast(part), line.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), line.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("p_brand").alias("brand"), F.col("n_name").alias("supp_nation")
        )
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("brand", "supp_nation")
    )


# ---------------------------------------------------------------------------
# q14 — anti join.
# ---------------------------------------------------------------------------
@register(
    "q14_customers_without_orders",
    tags=("antijoin",),
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q14_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (customers with no pre-1997 orders)."""
    env = Env(spark, sf_dir)
    cust = env.t("customer")
    orders = (
        env.t("orders")
        .filter(F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q15 — scalar function surface (string/date/math).
# ---------------------------------------------------------------------------
@register(
    "q15_scalar_functions",
    tags=("scalar", "string", "date", "math"),
    oracle="""
SELECT p_partkey,
       upper(p_name)                        AS name_upper,
       substr(p_name, 1, 5)                 AS name_prefix,
       length(p_name)                       AS name_len,
       p_brand || '/' || p_type             AS brand_type,
       round(abs(p_retailprice - 1000.0), 2) AS price_dist,
       CAST(p_size % 7 AS INTEGER)          AS size_mod,
       round(sqrt(CAST(p_size AS DOUBLE)), 4) AS size_sqrt
FROM part
WHERE p_size BETWEEN 10 AND 40
ORDER BY p_partkey
""",
)
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative built-in scalar functions — all JVM-side codegen, no UDFs."""
    env = Env(spark, sf_dir)
    return (
        env.t("part")
        .filter(F.col("p_size").between(10, 40))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dist"),
            (F.col("p_size") % 7).cast("int").alias("size_mod"),
            F.round(F.sqrt(F.col("p_size").cast("double")), 4).alias("size_sqrt"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q16 — date functions.
# ---------------------------------------------------------------------------
@register(
    "q16_date_functions",
    tags=("scalar", "date"),
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER)    AS yr,
       CAST(month(o_orderdate) AS INTEGER)   AS mo,
       round(sum(o_totalprice), 2)           AS total,
       count(*)                              AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1, 2
ORDER BY yr, mo
""",
)
def q16_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + monthly aggregate (the DateFormat step's family)."""
    env = Env(spark, sf_dir)
    return (
        env.t("orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr", "mo")
    )


# ---------------------------------------------------------------------------
# q17 — top-k per group (window + filter).
# ---------------------------------------------------------------------------
@register(
    "q17_topk_per_group",
    tags=("window", "topk"),
    oracle="""
SELECT nation, c_custkey, spend FROM (
  SELECT n.n_name AS nation, c.c_custkey AS c_custkey,
         round(sum(o.o_totalprice), 2) AS spend,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY round(sum(o.o_totalprice), 2) DESC, c.c_custkey) AS rn
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY n.n_name, c.c_custkey
)
WHERE rn <= 5
ORDER BY nation, spend DESC, c_custkey
""",
)
def q17_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 spenders per nation: agg then windowed row_number, rank pruned early."""
    env = Env(spark, sf_dir)
    cust = env.t("customer")
    nation = env.t("nation")
    orders = env.t("orders")
    spend = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("spend"), F.asc("c_custkey"))
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("nation", "c_custkey", "spend")
        .orderBy("nation", F.desc("spend"), "c_custkey")
    )


# ---------------------------------------------------------------------------
# q18 — IN-subquery.
# ---------------------------------------------------------------------------
@register(
    "q18_in_subquery",
    tags=("subquery", "semijoin"),
    oracle="""
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q18_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via the SQL entry point — planned as a left-semi join."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# q19 — conditional aggregation (pivot-style).
# ---------------------------------------------------------------------------
@register(
    "q19_conditional_agg",
    tags=("agg", "case"),
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS filled,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS pending,
       count(*) AS n
FROM orders
GROUP BY 1
ORDER BY yr
""",
)
def q19_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via CASE WHEN sums — one scan, one shuffle."""
    env = Env(spark, sf_dir)

    def status_sum(status: str) -> F.Column:
        return F.round(
            F.sum(
                F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(
                    0.0
                )
            ),
            2,
        )

    return (
        env.t("orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            status_sum("F").alias("filled"),
            status_sum("O").alias("open_"),
            status_sum("P").alias("pending"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# q20 — correlated-aggregate pattern (TPC-H Q17 style).
# ---------------------------------------------------------------------------
@register(
    "q20_small_quantity_revenue",
    tags=("join", "subquery", "agg"),
    oracle="""
WITH part_avg AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part_avg pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < 0.4 * pa.avg_qty
""",
)
def q20_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part average joined back to the fact — the decorrelated form of a
    correlated scalar subquery; shuffle is on l_partkey once, reused."""
    env = Env(spark, sf_dir)
    line = env.t("lineitem")
    part_avg = line.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        line.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q21 — exact percentiles (continuous interpolation) + min/max/stddev.
# ---------------------------------------------------------------------------
@register(
    "q21_quantile_stats",
    tags=("agg", "percentile"),
    oracle="""
SELECT l_returnflag,
       round(quantile_disc(l_extendedprice, 0.5), 2)  AS p50,
       round(quantile_disc(l_extendedprice, 0.95), 2) AS p95,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q21_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles — percentile_disc picks an actual element
    (no interpolation arithmetic), so engines agree bit-for-bit. The
    approximate sketch variant is q22 (rows-only check)."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.expr(
                    "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
                ),
                2,
            ).alias("p50"),
            F.round(
                F.expr(
                    "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
                ),
                2,
            ).alias("p95"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q22 — approximate aggregates (100 TB posture). Sketch OUTPUTS are
# engine-specific (HLL/KLL implementations differ by design), so the query
# returns BOUNDED-ERROR BOOLEANS — |approx − exact| / exact ≤ ε per group,
# with the exact side computed in the same plan — and the oracle computes
# the exact aggregates and asserts TRUE. That turns the former rows-only
# entry into a real value-checked one: a broken sketch (or a silently wrong
# exact baseline) flips a boolean and fails the hash compare.
# ---------------------------------------------------------------------------
@register(
    "q22_approx_aggregates",
    tags=("approx", "sketch"),
    oracle="""
SELECT l_returnflag,
       TRUE AS approx_parts_ok,
       TRUE AS approx_p50_ok,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q22_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd 2%) + percentile_approx
    (KLL-ish, accuracy 1000): the sketches that replace exact
    distinct/percentile at 100 TB, pinned to a 5% relative-error envelope
    against the exact aggregates computed alongside (well above both
    sketches' configured error, so the check is deterministic)."""
    env = Env(spark, sf_dir)
    eps = 0.05
    agg = (
        env.t("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("_acd"),
            F.countDistinct("l_partkey").alias("_cd"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_ap50"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("_p50"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("_acd") - F.col("_cd"))
            <= F.lit(eps) * F.col("_cd")
        ).alias("approx_parts_ok"),
        (
            F.abs(F.col("_ap50") - F.col("_p50"))
            <= F.lit(eps) * F.col("_p50")
        ).alias("approx_p50_ok"),
        "n",
    ).orderBy("l_returnflag")
