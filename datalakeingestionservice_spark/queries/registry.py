"""Registry of named queries, each a (Spark impl, DuckDB oracle SQL) pair.

The reference's query surface is opaque SQL text shipped to the source RDBMS
(`SqlServerDataSource.cs:55-62`); our engine executes that surface natively, so
the registry doubles as the machine-checkable operator inventory: one entry per
SURVEY.md section 2 row, verified against DuckDB by the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    #: DuckDB-executable ANSI SQL over the same tables; None => rows-only check
    #: (genuinely non-SQL-expressible ops: LSH models, streaming state, etc.)
    oracle: str | None
    #: Included in bench.py's timed set.
    headline: bool = False
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            headline=headline,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
        )
        return fn

    return deco


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark_fn for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in QUERIES.items() if q.headline}
