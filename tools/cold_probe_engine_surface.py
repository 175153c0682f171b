"""One COLD engine-surface measurement, driver-protocol-faithful.

Reproduces the slice of bench.py the r14 engine-surface regression lives
in, in a FRESH JVM (run this script once per measurement): build_session,
JVM warm-up, sf0.001 warm pass of q183/q113 (bench.py warms every timed
plan there), then q183 + q113 at $SPARK_GRAFT_SF_DIR min-of-2 and the ivm
slice — printed as one JSON line. Arm selection happens via env vars
(DLIS_IVM_CHECKPOINT_DELTAS / DLIS_COW_OVERLAP_CDF /
DLIS_IVM_SIGNED_DELTA) set by the caller; see tools/ab_cold_engine.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import ivm_slice
    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-cold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = ["q183_materialized_view_sql", "q113_versioned_merge_diff"]
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
    out.update(
        {k: v for k, v in ivm_slice(spark, sf_dir).items()}
    )
    out["arms"] = {  # type: ignore[assignment]
        k: os.environ.get(k, "1")
        for k in (
            "DLIS_IVM_CHECKPOINT_DELTAS",
            "DLIS_COW_OVERLAP_CDF",
            "DLIS_IVM_SIGNED_DELTA",
        )
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
