"""Source factory + concrete readers (SURVEY.md A1-A6).

``extract(spark, source_cfg, ...)`` resolves the configured source type and
extraction type to a lazy DataFrame:

- Parquet/Csv/Json + Path  -> lake file scan (pushdown/pruning-friendly)
- Sql + Inline/Query       -> spark.sql over registered lake views, with
                              named parameters (the raw-SQL path, A1/A4)
- Sql + StoredProcedure/Package -> named query template (A2/A3 model)
- Jdbc                     -> partitioned JDBC read (live-RDBMS parity; the
                              scale-correct replacement for the reference's
                              full `DataTable.Load`)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalakeingestionservice_spark.config.coercion import coerce_parameters
from datalakeingestionservice_spark.config.models import SourceConfig
from datalakeingestionservice_spark.sources.query_templates import get_query_template


class SourceError(Exception):
    """Unknown source type / bad extraction config (reference throws
    NotSupportedException at `DataSourceFactory.cs:25-26`)."""


SOURCE_REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def register_source(name: str):
    def deco(fn):
        SOURCE_REGISTRY[name.lower()] = fn
        return fn

    return deco


def _sql_args(source: SourceConfig) -> dict:
    args = coerce_parameters(source.parameters or {})
    # Spark named params accept python scalars; dates/datetimes pass through.
    return args


@register_source("parquet")
def read_parquet(spark: SparkSession, source: SourceConfig, **_) -> DataFrame:
    if not source.path:
        raise SourceError("Parquet source requires 'path'")
    return spark.read.parquet(source.path)


@register_source("csv")
def read_csv(spark: SparkSession, source: SourceConfig, **_) -> DataFrame:
    if not source.path:
        raise SourceError("Csv source requires 'path'")
    opts = {"header": "true", "inferSchema": "true"}
    opts.update({k: str(v) for k, v in (source.parameters or {}).items()})
    return spark.read.options(**opts).csv(source.path)


@register_source("json")
def read_json(spark: SparkSession, source: SourceConfig, **_) -> DataFrame:
    if not source.path:
        raise SourceError("Json source requires 'path'")
    return spark.read.json(source.path)


@register_source("sql")
def read_sql(
    spark: SparkSession,
    source: SourceConfig,
    sql_dir: str | None = None,
    dialect: str | None = None,
    **_,
) -> DataFrame:
    """The reference's whole extraction surface, executed natively.

    extraction_type routing mirrors `DataIngestionJob.cs:83-112`:
    Query -> read .sql file; StoredProcedure/Package -> template registry;
    Inline -> SQL text in the config.
    """
    et = (source.extraction_type or "Query").lower()
    if et == "inline":
        sql = source.query
        if not sql:
            raise SourceError("Inline extraction requires 'query' text")
    elif et == "query":
        if source.query:
            sql = source.query
        elif source.sql_file_path:
            path = source.sql_file_path
            if sql_dir and not path.startswith("/"):
                path = f"{sql_dir}/{path}"
            with open(path, encoding="utf-8") as fh:
                sql = fh.read()
        else:
            raise SourceError("Query extraction requires 'query' or 'sqlFilePath'")
    elif et == "storedprocedure":
        if not source.procedure_name:
            raise SourceError("StoredProcedure extraction requires 'procedureName'")
        sql = get_query_template(source.procedure_name)
    elif et == "package":
        if not (source.package_name and source.procedure_name):
            raise SourceError(
                "Package extraction requires 'packageName' and 'procedureName'"
            )
        sql = get_query_template(f"{source.package_name}.{source.procedure_name}")
    else:
        raise SourceError(f"Unknown extractionType: {source.extraction_type!r}")

    if dialect == "tsql" or (source.type or "").lower() == "sqlserver":
        # SqlServer-typed sources carry T-SQL artifacts (@params, dbo., TOP).
        from datalakeingestionservice_spark.sources.dialect import tsql_to_spark

        sql = tsql_to_spark(sql)

    args = _sql_args(source)
    return spark.sql(sql, args=args) if args else spark.sql(sql)


@register_source("jdbc")
def read_jdbc(spark: SparkSession, source: SourceConfig, **_) -> DataFrame:
    """Partitioned JDBC scan — parity for live SqlServer/Oracle sources.

    Where the reference loads the whole result set on one thread
    (`SqlServerDataSource.cs:61-62`), a partitioned JDBC read splits on
    `partitionColumn` bounds so N executors stream N ranges concurrently.
    Requires the JDBC driver jar on the classpath; exercised live against
    embedded Derby (ships in Spark's jars) in tests/test_jdbc.py — dbtable
    scan, database-side query execution, and the partitioned parallel read.
    """
    params = dict(source.parameters or {})
    url = params.pop("url", None) or source.connection_string_key
    if not url:
        raise SourceError("Jdbc source requires 'url' in parameters")
    reader = spark.read.format("jdbc").option("url", url)
    if source.query:
        reader = reader.option("query", source.query)
    elif params.get("dbtable"):
        reader = reader.option("dbtable", params.pop("dbtable"))
    else:
        raise SourceError("Jdbc source requires 'query' or parameters.dbtable")
    for key in ("partitionColumn", "lowerBound", "upperBound", "numPartitions"):
        if key in params:
            reader = reader.option(key, str(params.pop(key)))
    for key, value in params.items():
        reader = reader.option(key, str(value))
    return reader.load()


# Reference parity aliases: "SqlServer"/"Oracle" configs execute through the
# native SQL path (the engine is the executor now — SURVEY.md section 2A).
SOURCE_REGISTRY["sqlserver"] = read_sql
SOURCE_REGISTRY["oracle"] = read_sql


def extract(
    spark: SparkSession, source: SourceConfig, sql_dir: str | None = None
) -> DataFrame:
    """Factory dispatch (A6): case-insensitive type -> reader; unknown -> error."""
    reader = SOURCE_REGISTRY.get((source.type or "").lower())
    if reader is None:
        raise SourceError(
            f"Unsupported source type: {source.type!r} "
            f"(registered: {sorted(SOURCE_REGISTRY)})"
        )
    return reader(spark, source, sql_dir=sql_dir)
