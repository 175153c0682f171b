"""Local replica of the driver's correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an order-insensitive
value comparison (sorted rows, exact equality after light normalization).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
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


def normalize(value):
    """Comparable scalar: floats -> rounded repr, timestamps -> isoformat."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    if hasattr(value, "isoformat"):
        return value.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return value.hex()
    if isinstance(value, list):
        return tuple(normalize(v) for v in value)
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
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        took = time.time() - t0

        if q.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only check) [{took:.1f}s]")
            n_rows_only += 1
            continue

        try:
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"row count spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            sk = rows_key(s_rows, s_cols)
            dk = rows_key(d_rows, d_cols)
            if sk != dk:
                diffs = [
                    (a, b) for a, b in zip(sk, dk) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{took:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
