"""Layout queries (q116): Z-order clustering value-checked cross-engine.

The z-value computation (`operators/layout.py`) is pure integer arithmetic
— equal-width bucketing then bit interleave — so DuckDB can recompute it
bit-identically. q116 clusters lineitem on (l_orderkey, l_partkey), groups
rows into z-cells (the hyper-rectangles files would cover after
`zorder_repartition`) and aggregates per cell; every cell count and sum
matching the oracle proves the Morton curve itself, not just row totals.
The locality/pruning payoff is asserted in pytest (footer-stat file
overlap, `tests/test_layout_zorder.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.layout import (
    int_bucket,
    zvalue,
)
from datalakeingestionservice_spark.queries.registry import register

_BITS = 4  # 16 buckets/dim, z in [0, 256); cells of 16 z-values each


def _morton_sql(b1: str, b2: str, bits: int) -> str:
    """The same interleave `operators/layout.py:zvalue` builds, as SQL:
    bit b of column j lands at position b*2+j."""
    terms = []
    for b in range(bits):
        terms.append(f"((({b1} >> {b}) & 1) << {b * 2})")
        terms.append(f"((({b2} >> {b}) & 1) << {b * 2 + 1})")
    return " + ".join(terms)  # disjoint bit targets: sum == OR


_ORACLE = f"""
WITH r AS (
  SELECT min(l_orderkey) AS lo1, max(l_orderkey) AS hi1,
         min(l_partkey)  AS lo2, max(l_partkey)  AS hi2
  FROM lineitem
),
bk AS (
  SELECT
    least({(1 << _BITS) - 1}, greatest(0,
      ((l_orderkey - lo1) * {1 << _BITS}) // (hi1 - lo1 + 1))) AS b1,
    least({(1 << _BITS) - 1}, greatest(0,
      ((l_partkey - lo2) * {1 << _BITS}) // (hi2 - lo2 + 1))) AS b2,
    l_extendedprice
  FROM lineitem, r
),
zt AS (
  SELECT {_morton_sql('b1', 'b2', _BITS)} AS zv, l_extendedprice FROM bk
)
SELECT zv >> {_BITS} AS z_cell,
       count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM zt
GROUP BY z_cell
"""


@register(
    "q116_zorder_cells",
    tags=("layout", "zorder", "clustering"),
    oracle=_ORACLE,
)
def q116_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_orderkey, l_partkey) and aggregate per
    z-cell. The oracle re-derives every bucket rank and Morton bit in SQL,
    so a single transposed bit anywhere in the curve flips cell membership
    and fails the value hash — the strongest cross-engine check available
    for a layout primitive."""
    env = Env(spark, sf_dir)
    li = env.t("lineitem")

    row = li.agg(
        F.min("l_orderkey").alias("lo1"), F.max("l_orderkey").alias("hi1"),
        F.min("l_partkey").alias("lo2"), F.max("l_partkey").alias("hi2"),
    ).collect()[0]
    b1 = int_bucket(F.col("l_orderkey"), row["lo1"], row["hi1"], _BITS)
    b2 = int_bucket(F.col("l_partkey"), row["lo2"], row["hi2"], _BITS)
    z = zvalue([b1, b2], _BITS)

    return (
        li.withColumn("zv", z)
        .groupBy(F.shiftright(F.col("zv"), _BITS).alias("z_cell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
