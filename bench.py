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
    # Untimed warm-up pass of every headline plan at the smallest SF: warms
    # the parquet reader, catalog views, and each plan's whole-stage-codegen
    # classes (codegen cache is keyed by generated source, which is identical
    # across sf dirs), so TIMED numbers measure plans, not JIT (round-1 q01
    # was ~2.8 s of warm-up; q79 carried ~4 s of codegen).
    # Per-query error isolation throughout: one failing plan must never zero
    # out the whole round's bench signal (round 3 lost all 15 numbers to a
    # single analysis exception raised during warm-up).
    queries = headline_queries()
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for query in queries.values():
        try:
            query.spark_fn(spark, warm_dir).count()
        except Exception:
            pass  # the timed loop records the error

    # Min of two timed runs per query: single-run numbers at this scale carry
    # ±20% scheduler/GC noise, which swamps real plan changes round-to-round.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, query in queries.items():
        best = float("inf")
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                df = query.spark_fn(spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # record, keep benching the rest
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if best != float("inf"):
            timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
