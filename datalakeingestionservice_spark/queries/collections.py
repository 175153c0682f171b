"""Collection aggregates, grouping sets, positional explode — the remaining
SQL-surface corners (SURVEY.md section 2D: aggregations/set handling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q58 — ordered collection aggregation (collect_list == string_agg).
# ---------------------------------------------------------------------------
@register(
    "q58_collect_agg",
    tags=("agg", "collect", "string-agg"),
    oracle="""
SELECT c_nationkey,
       string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS custkeys,
       count(*) AS n
FROM customer
WHERE c_custkey <= 100
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q58_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list -> array_sort -> array_join: deterministic ordered
    aggregation of values into a delimited string (watch payload size at
    scale — this is the one aggregate partial-agg can't compact, the salted
    pattern's real target)."""
    env = Env(spark, sf_dir)
    return (
        env.t("customer")
        .filter(F.col("c_custkey") <= 100)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("custkeys"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q59 — explicit GROUPING SETS with grouping() markers.
# ---------------------------------------------------------------------------
@register(
    "q59_grouping_sets",
    tags=("grouping-sets", "groupby"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       round(sum(o_totalprice), 2) AS total,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q59_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set combinations (not derivable from rollup/cube)
    with grouping() null-vs-subtotal disambiguation."""
    env = Env(spark, sf_dir)
    return env.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               round(sum(o_totalprice), 2) AS total,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# q66 — positional explode (posexplode / zipped unnest).
# ---------------------------------------------------------------------------
@register(
    "q66_posexplode",
    tags=("array", "explode", "lateral"),
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE doc_id < 20
)
SELECT doc_id,
       unnest(range(1, len(words) + 1)) AS pos,
       unnest(words) AS tok
FROM w
ORDER BY doc_id, pos
""",
)
def q66_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token + 1-based position (DuckDB twin: lockstep unnest of
    the list and its index range). Positional explode is the lateral-view
    workhorse for sequence features."""
    env = Env(spark, sf_dir)
    return (
        env.t("documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        )
        .select(
            "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok"
        )
        .orderBy("doc_id", "pos")
    )
