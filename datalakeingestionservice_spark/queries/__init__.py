"""Query registry: every operator from SURVEY.md section 2 as a named query.

Each entry pairs a Spark implementation (DataFrame/Spark SQL) with an ANSI-SQL
oracle string executable by DuckDB over the same parquet tables. The driver
compares them at sf0.01 (row count + schema + order-insensitive value hash).
"""

from datalakeingestionservice_spark.queries.registry import (
    QUERIES,
    Query,
    headline_queries,
    oracle_sql_map,
    query_map,
    register,
)

# Importing the modules populates the registry.
from datalakeingestionservice_spark.queries import relational  # noqa: E402,F401
from datalakeingestionservice_spark.queries import advanced as _advanced  # noqa: E402,F401
from datalakeingestionservice_spark.queries import events as _events  # noqa: E402,F401
from datalakeingestionservice_spark.queries import text as _text  # noqa: E402,F401
from datalakeingestionservice_spark.queries import vectors as _vectors  # noqa: E402,F401
from datalakeingestionservice_spark.queries import ingest as _ingest  # noqa: E402,F401
from datalakeingestionservice_spark.queries import timeseries as _timeseries  # noqa: E402,F401
from datalakeingestionservice_spark.queries import collections as _collections  # noqa: E402,F401
from datalakeingestionservice_spark.queries import ml as _ml  # noqa: E402,F401
from datalakeingestionservice_spark.queries import graph as _graph  # noqa: E402,F401
from datalakeingestionservice_spark.queries import misc as _misc  # noqa: E402,F401
from datalakeingestionservice_spark.queries import quality as _quality  # noqa: E402,F401
from datalakeingestionservice_spark.queries import capstone as _capstone  # noqa: E402,F401
from datalakeingestionservice_spark.queries import joins_extra as _joins_extra  # noqa: E402,F401
from datalakeingestionservice_spark.queries import arrays_bits as _arrays_bits  # noqa: E402,F401
from datalakeingestionservice_spark.queries import parity as _parity  # noqa: E402,F401
from datalakeingestionservice_spark.queries import curation as _curation  # noqa: E402,F401
from datalakeingestionservice_spark.queries import lake as _lake  # noqa: E402,F401
from datalakeingestionservice_spark.queries import layout as _layout  # noqa: E402,F401
from datalakeingestionservice_spark.queries import pyds as _pyds  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "Query",
    "register",
    "query_map",
    "oracle_sql_map",
    "headline_queries",
]
