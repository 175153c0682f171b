"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query at sf0.001; `queries()` exposes
every implemented operator from SURVEY.md section 2 as (spark, sf_dir) ->
DataFrame; `oracle_sql()` gives the DuckDB-verifiable ANSI SQL twin for each
(rows-only ops — LSH models, pandas-UDF decode — are deliberately omitted
there). Implementations live in `datalakeingestionservice_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalakeingestionservice_spark.queries import oracle_sql_map, query_map

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datalakeingestionservice_spark.queries import QUERIES

    return QUERIES["q01_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return oracle_sql_map()
