"""Local replica of the driver's correctness gate — hardened (round 2).

Runs each registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares:

1. row count
2. column-name sets
3. canonical TYPE FAMILIES per column (Spark dtype vs DuckDB logical type).
   This is the round-2 hardening: the driver's value hash is serialized with
   type information, so a DuckDB HUGEINT (uncast integer ``sum()``) hashes
   differently from Spark's bigint even when every value is numerically equal
   (the q26 round-1 failure). Families: int / hugeint / float / decimal(scale)
   / str / bool / date / ts / bytes / list<...>. hugeint never matches — it is
   always an oracle bug (add ``CAST(... AS BIGINT)``).
4. order-insensitive EXACT value comparison (full float repr — no rounding or
   normalization slack; rounding must happen inside the query on both sides).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import re
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR_DEFAULT = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# Canonical type families.  The driver hashes values WITH their serialized
# type, so int-family vs float-family vs decimal vs hugeint must agree even
# when the numeric values do.  Integer widths are collapsed (both engines
# surface them as plain Python ints); hugeint/int128 never matches anything.
# ---------------------------------------------------------------------------

_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_INTS = {"tinyint", "smallint", "int", "bigint"}


def canon_duck_type(t: str) -> str:
    t = t.strip()
    u = t.upper()
    if u.endswith("[]"):
        return f"list<{canon_duck_type(t[:-2])}>"
    if u in _DUCK_INTS:
        return "int"
    if u == "HUGEINT" or u == "INT128":
        return "hugeint"
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u.startswith("DECIMAL"):
        m = re.search(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", u)
        return f"decimal({m.group(1)})" if m else "decimal(?)"
    if u in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR"):
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "ts"
    if u == "BLOB":
        return "bytes"
    if u.startswith("STRUCT"):
        return "struct"
    if u.startswith("MAP"):
        return "map"
    return u.lower()


def canon_spark_type(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{canon_spark_type(t[6:-1])}>"
    if t in _SPARK_INTS:
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("decimal"):
        m = re.search(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", t)
        return f"decimal({m.group(1)})" if m else "decimal(?)"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t in ("timestamp", "timestamp_ntz"):
        return "ts"
    if t == "binary":
        return "bytes"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t == "void":
        return "null"
    return t


def type_problems(s_dtypes, d_cols, d_types):
    """Compare canonical type families column-by-column (matched by name)."""
    s_map = {name: canon_spark_type(dt) for name, dt in s_dtypes}
    d_map = {name: canon_duck_type(str(dt)) for name, dt in zip(d_cols, d_types)}
    problems = []
    for name in sorted(set(s_map) & set(d_map)):
        sc, dc = s_map[name], d_map[name]
        if dc == "hugeint":
            problems.append(
                f"col {name}: DuckDB HUGEINT (uncast sum()?) vs spark {sc} "
                f"- add CAST(... AS BIGINT) in the oracle"
            )
        elif sc != dc and "null" not in (sc, dc):
            problems.append(f"col {name}: spark {sc} vs duck {dc}")
    return problems


# ---------------------------------------------------------------------------
# Exact value comparison (order-insensitive).  No rounding slack: full float
# repr.  If a query needs rounding for cross-engine stability, it must round
# in BOTH the Spark code and the oracle SQL - same as the driver demands.
# ---------------------------------------------------------------------------

def normalize(value):
    if value is None:
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        if math.isnan(value):
            return "float:nan"
        return f"float:{value!r}"
    if isinstance(value, int):
        return f"int:{value}"
    if isinstance(value, decimal.Decimal):
        return f"dec:{value}"
    if isinstance(value, datetime.datetime):
        return f"ts:{value.isoformat()}"
    if isinstance(value, datetime.date):
        return f"date:{value.isoformat()}"
    if isinstance(value, (bytes, bytearray)):
        return f"bytes:{bytes(value).hex()}"
    if isinstance(value, (list, tuple)):
        return tuple(normalize(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, normalize(v)) for k, v in value.items()))
    return value


def rows_key(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(repr(normalize(row[i])) for i in order) for row in rows
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR_DEFAULT
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.session import build_session

    names = args or list(QUERIES)
    spark = build_session("correctness-check")
    con = duck_connection(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    failed = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            s_dtypes = sdf.dtypes
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failed.append(name)
            continue
        took = time.time() - t0

        if q.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only check) [{took:.1f}s]")
            n_rows_only += 1
            continue

        try:
            rel = con.sql(q.oracle)
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failed.append(name)
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"row count spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        problems.extend(type_problems(s_dtypes, d_cols, d_types))
        if not problems:
            sk = rows_key(s_rows, s_cols)
            dk = rows_key(d_rows, d_cols)
            if sk != dk:
                diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{took:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if failed:
        print("failed: " + " ".join(failed))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
