"""One COLD headline-query measurement, driver-protocol-faithful.

Fresh JVM per run: build_session, JVM warm-up, sf0.001 warm pass of the
named queries (bench.py warms every timed plan there), then min-of-2 at
$SPARK_GRAFT_SF_DIR. Query names in $PROBE_QUERIES (comma-separated).
Prints one JSON line. Behavior arms come from env gates (e.g.
DLIS_CC_BROADCAST_HINT) set by the caller.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = os.environ.get(
        "PROBE_QUERIES", "q79_training_data_pipeline"
    ).split(",")

    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-cold-probe-q")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for n in names:
        QUERIES[n].spark_fn(spark, warm_dir).count()

    out: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[n].spark_fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[n] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
