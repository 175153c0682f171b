"""Array set operations and bitwise aggregates — final function-surface rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register


# ---------------------------------------------------------------------------
# q86 — array set algebra (union/intersect/except/overlap).
# ---------------------------------------------------------------------------
@register(
    "q86_array_set_ops",
    tags=("array", "set-ops", "nested"),
    oracle="""
WITH toks AS (
  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS t
  FROM documents WHERE doc_id < 40
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.t AS ta, b.t AS tb
  FROM toks a JOIN toks b ON a.doc_id + 1 = b.doc_id
)
SELECT doc_a, doc_b,
       len(list_sort(list_intersect(ta, tb))) AS n_common,
       len(list_sort(list_distinct(list_concat(ta, tb)))) AS n_union,
       len(list_filter(ta, x -> NOT list_contains(tb, x))) AS n_only_a,
       CASE WHEN len(list_intersect(ta, tb)) > 0 THEN 1 ELSE 0 END AS overlaps
FROM pairs
ORDER BY doc_a
""",
)
def q86_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect / array_union / array_except / arrays_overlap on
    consecutive-document token sets — the vocabulary-overlap computation as
    pure array algebra (counts compared; element order is engine-specific)."""
    env = Env(spark, sf_dir)
    toks = (
        env.t("documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.array_sort(F.array_distinct(F.split("text", " "))).alias("t"),
        )
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect("a.t", "b.t")).alias("n_common"),
            F.size(F.array_union("a.t", "b.t")).alias("n_union"),
            F.size(F.array_except("a.t", "b.t")).alias("n_only_a"),
            F.when(F.arrays_overlap("a.t", "b.t"), 1).otherwise(0).alias(
                "overlaps"
            ),
        )
        .orderBy("doc_a")
    )


# ---------------------------------------------------------------------------
# q87 — bitwise aggregates and scalar bit ops.
# ---------------------------------------------------------------------------
@register(
    "q87_bitwise_ops",
    tags=("bitwise", "agg", "scalar"),
    oracle="""
SELECT l_returnflag,
       bit_and(CAST(l_suppkey AS BIGINT)) AS supp_and,
       bit_or(CAST(l_linenumber AS BIGINT)) AS line_or,
       bit_xor(CAST(l_partkey AS BIGINT)) AS part_xor,
       CAST(sum(CAST(l_orderkey AS BIGINT) & 255) AS BIGINT) AS low_byte_sum,
       CAST(sum(CAST(l_orderkey AS BIGINT) >> 8) AS BIGINT) AS high_bits_sum
FROM lineitem
WHERE l_orderkey < 2000
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q87_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor aggregates + `&`/`>>` scalars — the bitmap
    and flag-field toolbox (SimHash/LSH bucketing builds on exactly these)."""
    env = Env(spark, sf_dir)
    return (
        env.t("lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .groupBy("l_returnflag")
        .agg(
            F.bit_and(F.col("l_suppkey").cast("bigint")).alias("supp_and"),
            F.bit_or(F.col("l_linenumber").cast("bigint")).alias("line_or"),
            F.bit_xor(F.col("l_partkey").cast("bigint")).alias("part_xor"),
            F.sum(F.expr("CAST(l_orderkey AS BIGINT) & 255"))
            .cast("bigint")
            .alias("low_byte_sum"),
            F.sum(F.expr("shiftright(CAST(l_orderkey AS BIGINT), 8)"))
            .cast("bigint")
            .alias("high_bits_sum"),
        )
        .orderBy("l_returnflag")
    )
