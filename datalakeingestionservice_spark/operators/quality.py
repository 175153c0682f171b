"""Data-quality operators: column profiling and declarative expectations.

The reference's DataValidationStep checks only column presence (A8). A lake
engine ingesting 100 TB needs the generalization: profile what arrived, and
assert what must hold — null rates, key uniqueness, referential integrity,
value ranges — with violation COUNTS (not row dumps) so the check is one
aggregation pass regardless of scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats table: nulls, distincts, min/max (as strings, so one
    schema covers all column types). One aggregation pass over the data."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__distinct_{c}"),
            # min/max on the native type, cast AFTERWARD (casting first would
            # make numeric extrema lexicographic).
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__distinct_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass(frozen=True)
class Expectation:
    name: str
    #: Boolean Column evaluated per row; violations = rows where it is false.
    predicate: Column


def expect_not_null(column: str) -> Expectation:
    return Expectation(f"not_null({column})", F.col(column).isNotNull())


def expect_range(column: str, lo, hi) -> Expectation:
    return Expectation(
        f"range({column},{lo},{hi})", F.col(column).between(lo, hi)
    )


def expect_in(column: str, values: list) -> Expectation:
    return Expectation(f"in({column})", F.col(column).isin(values))


def expect_matches(column: str, pattern: str) -> Expectation:
    return Expectation(f"matches({column})", F.col(column).rlike(pattern))


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """(expectation, n_rows, n_violations) per expectation — one pass."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in expectations:
        aggs.append(
            F.sum(F.when(~e.predicate | e.predicate.isNull(), 1).otherwise(0)).alias(
                f"__v_{e.name}"
            )
        )
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(e.name).alias("expectation"),
            F.col("__n").alias("n_rows"),
            # Backticks: expectation names may contain dots/parens.
            F.col(f"`__v_{e.name}`").alias("n_violations"),
        )
        for e in expectations
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_unique_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(n_keys, n_duplicate_keys, n_excess_rows): key-uniqueness audit."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_duplicate_keys"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias(
            "n_excess_rows"
        ),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """(n_child_rows, n_orphans): FK integrity via left-anti count."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return child.agg(F.count(F.lit(1)).alias("n_child_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    )
