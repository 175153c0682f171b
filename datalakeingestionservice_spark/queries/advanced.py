"""Advanced relational surface: pivot, window frames/analytics, array & map
ops, statistical aggregates, ALL-variant set ops, regexp, date arithmetic.

Completes the SURVEY.md section 2D category checklist beyond the basics in
`relational.py` — everything a warehouse stored procedure could have used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q23 — pivot (first-class operator form of q19's manual CASE sums).
# ---------------------------------------------------------------------------
@register(
    "q23_pivot_status_by_year",
    tags=("pivot", "groupby"),
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
FROM orders
GROUP BY 1
ORDER BY yr
""",
)
def q23_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot(values).agg() with explicit pivot values — explicit
    values keep the plan single-pass (no extra distinct scan to discover them)."""
    env = Env(spark, sf_dir)
    return (
        env.t("orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# q24 — analytic window functions + range frame.
# ---------------------------------------------------------------------------
@register(
    "q24_window_analytics",
    tags=("window", "frame", "analytics"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS price,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist()    OVER w, 4) AS cdist,
       round(first_value(o_totalprice) OVER w, 2) AS cheapest,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_cheapest,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                                     RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2)
         AS near_price_sum
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, price, o_orderkey
""",
)
def q24_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first+nth_value / numeric RANGE frame.

    Note the deliberate frame split: ranking funcs use a full-partition ROWS
    frame; the RANGE frame sums only orders within $1000 below current price.
    """
    env = Env(spark, sf_dir)
    base = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # RANGE frames allow only one ordering column; fractional bounds need the
    # SQL form (the DataFrame rangeBetween accepts only integral offsets).
    near_price_sum = F.expr(
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
        " RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2)"
    )
    return (
        env.t("orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.ntile(4).over(base).alias("quartile"),
            F.round(F.percent_rank().over(base), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(base), 4).alias("cdist"),
            F.round(F.first("o_totalprice").over(full), 2).alias("cheapest"),
            F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias(
                "second_cheapest"
            ),
            near_price_sum.alias("near_price_sum"),
        )
        .orderBy("o_custkey", "price", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q25 — array operations over the embedding column.
# ---------------------------------------------------------------------------
@register(
    "q25_array_ops",
    tags=("array", "nested"),
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
       round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_elem,
       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS elem_sum,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       round(CAST(list_sort(embedding)[3] AS DOUBLE), 4) AS third_smallest
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
""",
)
def q25_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """element_at / array_min/max / aggregate / filter / sort_array — the
    higher-order-function surface nested columns need."""
    env = Env(spark, sf_dir)
    return (
        env.t("embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 4).alias(
                "first_elem"
            ),
            F.round(F.array_min("embedding").cast("double"), 4).alias("min_elem"),
            F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                4,
            ).alias("elem_sum"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
            F.round(
                F.element_at(F.sort_array("embedding"), 3).cast("double"), 4
            ).alias("third_smallest"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q26 — map type from JSON + map functions.
# ---------------------------------------------------------------------------
@register(
    "q26_map_ops",
    tags=("map", "json", "nested"),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       count(*) AS n,
       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_key
FROM events
WHERE event_id < 500
GROUP BY 1
ORDER BY k_value
""",
)
def q26_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> MapType -> element_at/map_keys: semi-structured props as a real
    map column (scales to arbitrary keys, unlike fixed-struct from_json)."""
    env = Env(spark, sf_dir)
    parsed = (
        env.t("events")
        .filter(F.col("event_id") < 500)
        .withColumn("props_m", F.from_json("props", "map<string,bigint>"))
    )
    return (
        parsed.groupBy(F.element_at("props_m", "k").alias("k_value"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.array_contains(F.map_keys("props_m"), "k"), 1
                ).otherwise(0)
            ).alias("n_with_key"),
        )
        .orderBy("k_value")
    )


# ---------------------------------------------------------------------------
# q27 — statistical aggregates.
# ---------------------------------------------------------------------------
@register(
    "q27_stats_aggregates",
    tags=("agg", "statistics"),
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_var
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q27_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / stddev_samp / var_samp — one pass, shared moments."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q28 — min_by / max_by (argmin/argmax aggregates).
# ---------------------------------------------------------------------------
@register(
    "q28_argmin_argmax",
    tags=("agg", "argminmax"),
    oracle="""
SELECT o_orderstatus,
       min_by(o_orderkey, o_totalprice) AS cheapest_order,
       max_by(o_orderkey, o_totalprice) AS priciest_order,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q28_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by replace the self-join-on-extreme-value anti-pattern with
    one aggregate pass."""
    env = Env(spark, sf_dir)
    return (
        env.t("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q29 — multiset (ALL) set operations.
# ---------------------------------------------------------------------------
@register(
    "q29_set_ops_all",
    tags=("union", "intersect", "except", "multiset"),
    oracle="""
WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000)
SELECT k, count(*) AS n FROM (
  SELECT k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
  UNION ALL
  SELECT k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
)
GROUP BY k
ORDER BY k
""",
)
def q29_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll / exceptAll keep duplicate multiplicity (multiset
    semantics) — INTERSECT ALL + EXCEPT ALL partitions bag A exactly."""
    env = Env(spark, sf_dir)
    cust = env.t("customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    b = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("k")
    )
    return (
        a.intersectAll(b)
        .unionAll(a.exceptAll(b))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q35 — regexp functions.
# ---------------------------------------------------------------------------
@register(
    "q35_regexp_functions",
    tags=("scalar", "regexp", "string"),
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
       CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END AS well_formed
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
)
def q35_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike on simple (engine-portable)
    patterns."""
    env = Env(spark, sf_dir)
    return (
        env.t("customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_digits"),
            F.regexp_extract("c_name", r"([0-9]+)", 1)
            .cast("bigint")
            .alias("cust_num"),
            F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
            F.when(F.col("c_name").rlike(r"^Customer#[0-9]+$"), 1)
            .otherwise(0)
            .alias("well_formed"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q36 — string padding/manipulation surface.
# ---------------------------------------------------------------------------
@register(
    "q36_string_functions",
    tags=("scalar", "string"),
    oracle="""
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       reverse(p_brand) AS brand_rev,
       translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
       left(p_name, 3) AS name_l3,
       right(p_name, 3) AS name_r3,
       replace(p_type, 'A', '@') AS type_at,
       strpos(p_name, 'a') AS first_a
FROM part
WHERE p_partkey <= 300
ORDER BY p_partkey
""",
)
def q36_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/reverse/translate/left/right/replace/strpos — string surface."""
    env = Env(spark, sf_dir)
    return (
        env.t("part")
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
            F.reverse("p_brand").alias("brand_rev"),
            F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
            F.substring("p_name", 1, 3).alias("name_l3"),
            F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias(
                "name_r3"
            ),
            F.regexp_replace("p_type", "A", "@").alias("type_at"),
            F.instr("p_name", "a").cast("bigint").alias("first_a"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q37 — date arithmetic.
# ---------------------------------------------------------------------------
@register(
    "q37_date_arithmetic",
    tags=("scalar", "date"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(o_orderdate AS DATE) + 30 AS d_plus_30,
       CAST(o_orderdate AS DATE) - 7 AS d_minus_7,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,  -- duckdb Sun=0, Spark Sun=1
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS woy
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
""",
)
def q37_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add/sub, datediff, last_day, quarter trunc, dow/week extraction."""
    env = Env(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return (
        env.t("orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            d.alias("d"),
            F.date_add(d, 30).alias("d_plus_30"),
            F.date_sub(d, 7).alias("d_minus_7"),
            F.datediff(d, F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since_95"),
            F.last_day(d).alias("month_end"),
            F.date_trunc("quarter", "o_orderdate").cast("date").alias(
                "quarter_start"
            ),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.weekofyear(d).cast("int").alias("woy"),
        )
        .orderBy("o_orderkey")
    )
