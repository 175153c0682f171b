"""q100: the reference's own shipped query, executed by this engine, verified.

The exact SELECT from `/root/reference/src/Worker/Datasets/SqlFiles/
GetDailyTrades.sql:4-16` (T-SQL: @params, dbo. schema), translated by the
dialect shim and executed over the Trades compatibility view — the final
parity statement: the reference's one real query artifact runs here and
hash-matches an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalakeingestionservice_spark.catalog import Env, register_compat_views
from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.sources.dialect import tsql_to_spark

#: Verbatim body of the reference's GetDailyTrades.sql (comments dropped).
_REFERENCE_TSQL = """
SELECT
    TradeId,
    TradeDate,
    Symbol,
    Quantity,
    Price,
    TotalAmount,
    TradeType,
    AccountId,
    CreatedAt
FROM dbo.Trades
WHERE TradeDate BETWEEN @StartDate AND @EndDate
ORDER BY TradeDate DESC, TradeId
"""

#: The Trades view definition, restated for the DuckDB side (same derivation
#: as catalog.register_compat_views).
_TRADES_CTE = """
trades_compat AS (
  SELECT l_orderkey * 10 + l_linenumber            AS TradeId,
         l_shipdate + INTERVAL 27 YEAR             AS TradeDate,
         l_returnflag || l_linestatus              AS Symbol,
         l_quantity                                AS Quantity,
         l_extendedprice                           AS Price,
         round(l_quantity * l_extendedprice, 2)    AS TotalAmount,
         CASE WHEN l_discount > 0.05 THEN 'SELL' ELSE 'BUY' END AS TradeType,
         l_suppkey                                 AS AccountId,
         l_shipdate + INTERVAL 27 YEAR             AS CreatedAt
  FROM lineitem
)
"""


@register(
    "q100_reference_query_verbatim",
    tags=("parity", "dialect", "reference"),
    doc="Parity: /root/reference/src/Worker/Datasets/SqlFiles/GetDailyTrades.sql"
    " executed via the T-SQL shim over the Trades compat view.",
    oracle=f"""
WITH {_TRADES_CTE}
SELECT TradeId, CAST(TradeDate AS DATE) AS TradeDate, Symbol, Quantity, Price,
       TotalAmount, TradeType, AccountId, CAST(CreatedAt AS DATE) AS CreatedAt
FROM trades_compat
WHERE TradeDate BETWEEN TIMESTAMP '2024-01-01 00:00:00'
                    AND TIMESTAMP '2024-12-31 00:00:00'
ORDER BY TradeDate DESC, TradeId
""",
)
def q100_reference_query_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's shipped SELECT, dialect-translated and parameter-bound
    exactly as its dataset config would bind them."""
    from pyspark.sql import functions as F

    env = Env(spark, sf_dir)
    register_compat_views(env.spark, sf_dir)
    translated = tsql_to_spark(_REFERENCE_TSQL)
    df = env.spark.sql(
        translated,
        args={"StartDate": "2024-01-01", "EndDate": "2024-12-31"},
    )
    # Timestamps -> dates for a stable cross-engine value compare.
    return df.withColumn("TradeDate", F.col("TradeDate").cast("date")).withColumn(
        "CreatedAt", F.col("CreatedAt").cast("date")
    )
