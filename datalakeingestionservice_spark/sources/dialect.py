"""T-SQL -> Spark SQL dialect shim (the subset the reference's artifacts use).

The reference ships raw T-SQL files executed verbatim by SQL Server
(`SqlServerDataSource.cs:47-62`). To run those files natively, the engine
translates the mechanical dialect differences; anything beyond this subset
should be rewritten as a query template instead.

- ``@Param``     -> ``:Param``      (named parameter markers)
- ``dbo.Name``   -> ``Name``        (schema qualifier; lake views are flat)
- ``TOP n``      -> trailing ``LIMIT n``
- ``[Name]``     -> ```Name```      (quoted identifiers)

Substitutions are token-aware: string literals (``'a@b.com'``, with ``''``
escapes) and comments (``--`` and ``/* */``) pass through untouched, so an
email address or a bracket inside a literal is never rewritten.
"""

from __future__ import annotations

import re

_PARAM = re.compile(r"@(\w+)")
_SCHEMA = re.compile(r"\bdbo\.", re.IGNORECASE)
_TOP = re.compile(r"\bSELECT\s+TOP\s+(\d+)\s", re.IGNORECASE)
_BRACKET = re.compile(r"\[([A-Za-z_][\w ]*)\]")

# Single-quoted literal (with '' escape), line comment, or block comment.
_OPAQUE = re.compile(
    r"'(?:[^']|'')*'"
    r"|--[^\n]*"
    r"|/\*.*?\*/",
    re.DOTALL,
)


def _segments(sql: str):
    """Yield (is_code, start_offset, text) alternating code / opaque spans."""
    last = 0
    for m in _OPAQUE.finditer(sql):
        if m.start() > last:
            yield True, last, sql[last:m.start()]
        yield False, m.start(), m.group(0)
        last = m.end()
    if last < len(sql):
        yield True, last, sql[last:]


def tsql_to_spark(sql: str) -> str:
    """Translate the supported T-SQL subset to Spark SQL."""
    parts = []
    for is_code, _, text in _segments(sql):
        if is_code:
            text = _PARAM.sub(r":\1", text)
            text = _SCHEMA.sub("", text)
            text = _BRACKET.sub(r"`\1`", text)
        parts.append(text)
    out = "".join(parts)

    # TOP n -> trailing LIMIT n (first occurrence, code segments only).
    for is_code, start, text in _segments(out):
        if not is_code:
            continue
        m = _TOP.search(text)
        if m:
            n = m.group(1)
            out = out[: start + m.start()] + "SELECT " + out[start + m.end():]
            out = out.rstrip().rstrip(";") + f"\nLIMIT {n}"
            break
    return out
