"""JSON config value -> typed parameter coercion (SURVEY.md A5).

The reference sniffs string config values int -> long -> decimal -> date ->
bool before binding them as DB parameters (`OracleDynamicParameters.cs:78-134`,
`SqlServerDataSource.cs:96-115`). Here coerced values feed
``spark.sql(sql, args=...)`` named parameters.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

_DATE_FORMATS = (
    "%Y-%m-%d",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    # Microsecond variants: watermarks written by pipeline/incremental.py use
    # '%Y-%m-%d %H:%M:%S.%f', so they must round-trip as typed datetimes.
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S.%f",
)
_BOOL_STRINGS = {"true": True, "false": False}


def coerce_value(value: Any) -> Any:
    """Best-effort typed coercion of a JSON scalar, string-sniffing included."""
    if value is None or isinstance(value, (bool, int, float)):
        return value
    if not isinstance(value, str):
        return value

    text = value.strip()
    lowered = text.lower()
    if lowered in _BOOL_STRINGS:
        return _BOOL_STRINGS[lowered]
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    for fmt in _DATE_FORMATS:
        try:
            parsed = _dt.datetime.strptime(text, fmt)
            if fmt == "%Y-%m-%d":
                return parsed.date()
            return parsed
        except ValueError:
            continue
    return value


def coerce_parameters(params: dict[str, Any]) -> dict[str, Any]:
    return {k: coerce_value(v) for k, v in params.items()}
