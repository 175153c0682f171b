"""Source layer: type-dispatched readers producing lazy DataFrames.

Reference: `DataSourceFactory.cs:19-27` dispatches "sqlserver"/"oracle" to
ADO.NET readers that fully materialize the result set. Here the factory
dispatches to lazy lake readers (parquet/csv/json), the Spark SQL entry point
(the engine executes the query surface itself — the reference shipped it to the
RDBMS), and an optional JDBC passthrough for parity with live databases.
"""

from datalakeingestionservice_spark.sources.registry import (
    SOURCE_REGISTRY,
    SourceError,
    extract,
    register_source,
)
from datalakeingestionservice_spark.sources.query_templates import (
    QUERY_TEMPLATES,
    register_query_template,
)

__all__ = [
    "SOURCE_REGISTRY",
    "SourceError",
    "extract",
    "register_source",
    "QUERY_TEMPLATES",
    "register_query_template",
]
