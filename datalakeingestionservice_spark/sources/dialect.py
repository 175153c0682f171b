"""T-SQL -> Spark SQL dialect shim (the subset the reference's artifacts use).

The reference ships raw T-SQL files executed verbatim by SQL Server
(`SqlServerDataSource.cs:47-62`). To run those files natively, the engine
translates the mechanical dialect differences; anything beyond this subset
should be rewritten as a query template instead.

- ``@Param``     -> ``:Param``      (named parameter markers)
- ``dbo.Name``   -> ``Name``        (schema qualifier; lake views are flat)
- ``TOP n``      -> trailing ``LIMIT n``
- ``[Name]``     -> ```Name```      (quoted identifiers)
"""

from __future__ import annotations

import re

_PARAM = re.compile(r"@(\w+)")
_SCHEMA = re.compile(r"\bdbo\.", re.IGNORECASE)
_TOP = re.compile(r"\bSELECT\s+TOP\s+(\d+)\s", re.IGNORECASE)
_BRACKET = re.compile(r"\[([A-Za-z_][\w ]*)\]")


def tsql_to_spark(sql: str) -> str:
    """Translate the supported T-SQL subset to Spark SQL."""
    out = _PARAM.sub(r":\1", sql)
    out = _SCHEMA.sub("", out)
    out = _BRACKET.sub(r"`\1`", out)
    top = _TOP.search(out)
    if top:
        n = top.group(1)
        out = _TOP.sub("SELECT ", out, count=1).rstrip().rstrip(";")
        out = f"{out}\nLIMIT {n}"
    return out
