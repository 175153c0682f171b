"""Benchmark harness: times the headline query set and prints ONE JSON line.

Scale factor dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
parallelism from $SPARK_GRAFT_CPUS (default 32). Each headline query is
executed to completion (count() over the final plan — forces every operator
without driver-side row transfer); wall-clock per query, summed as the metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from datalakeingestionservice_spark.queries import headline_queries
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the session (JVM classloading, codegen cache) outside the timings.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Untimed pass of the first headline query: warms the parquet reader,
    # catalog views, and whole-stage-codegen compiler so the first TIMED query
    # measures its plan, not JVM startup (round-1 q01 was ~2.8 s of warm-up).
    queries = headline_queries()
    first = next(iter(queries.values()))
    first.spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, query in queries.items():
        t0 = time.perf_counter()
        df = query.spark_fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
