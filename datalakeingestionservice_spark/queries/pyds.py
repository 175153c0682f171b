"""Custom Python Data Source query (q114): a from-scratch source behind the
value oracle.

The feed is a pure function of event_id (`sources/python_datasource.py`), so
DuckDB can regenerate the identical relation from `range()` — putting a
custom DataSource implementation, its executor-side generation, and its
filter-pushdown partition pruning all under the exact-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.session import prepare_session
from datalakeingestionservice_spark.sources import python_datasource


@register(
    "q114_python_datasource",
    tags=("source", "python-datasource", "pushdown"),
    oracle="""
WITH gen AS (
  SELECT i AS event_id,
         ['click','error','purchase','signup','view'][(i % 5) + 1]
           AS event_type,
         ((i * 2654435761) % 100000) / 100.0 AS amount
  FROM (SELECT unnest(range(0, 100000)) AS i)
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
FROM gen
WHERE event_id >= 20000 AND event_id < 80000
GROUP BY event_type
ORDER BY event_type
""",
)
def q114_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read 100k synthetic events through the custom Python DataSource with a
    pushed event_id range (the reader prunes input partitions wholly outside
    [20000, 80000) at planning time — scan-level pruning for a source that
    has no files), then aggregate per event type. Amounts sum exactly via
    decimal cast; the oracle regenerates the feed from range()."""
    prepare_session(spark)
    python_datasource.register(spark)
    events = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100000)
        .option("n_partitions", 8)
        .load()
    )
    return (
        events.filter(
            (F.col("event_id") >= 20000) & (F.col("event_id") < 80000)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("event_type")
    )
