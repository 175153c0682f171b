"""Lake catalog: the test-data tables as DataFrames / temp views.

The reference has no catalog at all — schema is inferred per run from whatever
the RDBMS returns (`ParquetWriterService.cs:34-38`, see SURVEY.md section 1.3).
Our engine reads lake parquet directly; `spark.read.parquet` recovers the
footer schema and Catalyst gets filter pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.session import prepare_session

#: Driver-generated tables (TESTDATA.md). TPC-H-ish star schema + extension tables.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Event-time columns whose physical parquet encoding has drifted across
#: testdata generations: TIMESTAMP(NANOS) (reads as bigint under
#: ``nanosAsLong``), timestamp[us] without isAdjustedToUTC (reads as
#: TIMESTAMP_NTZ unless ``inferTimestampNTZ.enabled=false``), or plain
#: TIMESTAMP. Normalized to session-TZ TIMESTAMP here, whatever arrives.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table. Plain parquet scan — pushdown/pruning-friendly."""
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in NANOS_TS_COLS.get(name, ()):
        field = dict(zip(df.schema.fieldNames(), df.schema.fields))
        if col not in field:
            continue
        dtype = field[col].dataType.simpleString()
        if dtype == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtype == "timestamp_ntz":  # session TZ is UTC, instant-preserving
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every table as a temp view for the ``spark.sql`` entry point.

    Idempotent per (session, sf_dir): repeat calls for the same lake dir skip
    the re-read of 10 parquet footers (a session-conf tag tracks the dir, so
    switching sf_dir still re-registers).
    """
    prepare_session(spark)
    tag_key = "spark.dlis.registeredViewsDir"
    try:
        if spark.conf.get(tag_key, None) == sf_dir:
            return
    except Exception:
        pass
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.conf.set(tag_key, sf_dir)


def register_compat_views(spark: SparkSession, sf_dir: str) -> None:
    """Reference-schema compatibility views over the lake tables.

    `Trades` realizes FIXTURES.md F1 (the schema the reference's shipped
    GetDailyTrades.sql selects from), derived from lineitem with trade dates
    shifted +27 years so the reference configs' 2024-2025 parameter windows
    select data. Lets reference SQL files run verbatim (via the T-SQL shim).
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW Trades AS
        SELECT l_orderkey * 10 + l_linenumber            AS TradeId,
               l_shipdate + INTERVAL 27 YEARS            AS TradeDate,
               concat(l_returnflag, l_linestatus)        AS Symbol,
               l_quantity                                AS Quantity,
               l_extendedprice                           AS Price,
               round(l_quantity * l_extendedprice, 2)    AS TotalAmount,
               CASE WHEN l_discount > 0.05 THEN 'SELL' ELSE 'BUY' END AS TradeType,
               l_suppkey                                 AS AccountId,
               l_shipdate + INTERVAL 27 YEARS            AS CreatedAt
        FROM lineitem
        """
    )


class Env:
    """Per-query helper handed to query callables: session prep + table access."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = prepare_session(spark)
        self.sf_dir = sf_dir

    def t(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def sql(self, query: str, **kwargs) -> DataFrame:
        register_views(self.spark, self.sf_dir)
        return self.spark.sql(query, **kwargs)
