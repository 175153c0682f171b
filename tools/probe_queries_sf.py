"""Scale probe for registry queries (PERF.md): min-of-2 wall-clock for
the named queries at each given sf dir, one fresh warmed session per
dir. Used for the sf1 -> sf10 decade probes (VERDICT r11 #3): a plan
that is ~10x at 10x volume is linear; a super-linear term gets the
q195 treatment (find the stage, fix, document).

Usage:
  python tools/probe_queries_sf.py q79_training_data_pipeline \
      q195_capstone_v4 -- /tmp/sfscale/sf1 /tmp/sfscale/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main() -> None:
    if "--" not in sys.argv:
        raise SystemExit(__doc__)
    split = sys.argv.index("--")
    names, sf_dirs = sys.argv[1:split], sys.argv[split + 1:]
    for d in sf_dirs:
        if d.startswith("-"):
            raise SystemExit(f"refusing option-like path {d!r}")

    from datalakeingestionservice_spark.queries import QUERIES

    out: dict = {}
    for sf_dir in sf_dirs:
        spark = build_session()
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        res: dict = {}
        for name in names:
            q = QUERIES[name]
            # one untimed warm pass at the smallest driver SF (codegen
            # cache keys on generated source, identical across dirs)
            try:
                q.spark_fn(spark, "/root/testdata/sf0.001").count()
            except Exception:
                pass
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                q.spark_fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            res[name] = round(best, 3)
            print(sf_dir, name, res[name], flush=True)
        out[sf_dir] = res
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
