"""Sweep EVERY registered query at one SF: time it (count()) and record
plan-shape stats (Exchange / SortMergeJoin / Cartesian / Python-boundary
node counts) into a TSV, so the optimization round can show each operator
was examined and rank the remaining hotspots.

Usage:
    python tools/sweep_all_queries.py [sf_dir] [out_tsv]

One fresh session; queries run in registry order; per-query error
isolation (a failing query records ERROR and the sweep continues).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = (
    ("exchange", r"^\s*\(\d+\)\s+Exchange"),
    ("smj", r"^\s*\(\d+\)\s+SortMergeJoin"),
    ("bhj", r"^\s*\(\d+\)\s+BroadcastHashJoin"),
    ("cartesian", r"^\s*\(\d+\)\s+(CartesianProduct|BroadcastNestedLoopJoin)"),
    ("python", r"^\s*\(\d+\)\s+(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)"),
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_tsv = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_r14.tsv"

    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name, q in QUERIES.items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            df = q.spark_fn(spark, sf_dir)
            build_s = time.perf_counter() - t0
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            t1 = time.perf_counter()
            n = df.count()
            exec_s = time.perf_counter() - t1
            counts = {
                key: sum(1 for ln in plan.splitlines() if re.match(pat, ln))
                for key, pat in NODES
            }
            rows.append(
                (name, round(build_s, 3), round(exec_s, 3), n, counts)
            )
            print(
                f"{name}\tbuild={build_s:.3f}\texec={exec_s:.3f}\trows={n}\t"
                + "\t".join(f"{k}={v}" for k, v in counts.items()),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, {}))
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:300], flush=True)

    with open(out_tsv, "w") as f:
        f.write("query\tbuild_s\texec_s\trows\texchange\tsmj\tbhj\tcartesian\tpython\n")
        for name, b, e, n, c in rows:
            f.write(
                f"{name}\t{b}\t{e}\t{n}\t"
                f"{c.get('exchange','')}\t{c.get('smj','')}\t{c.get('bhj','')}\t"
                f"{c.get('cartesian','')}\t{c.get('python','')}\n"
            )
    print(f"wrote {out_tsv} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
