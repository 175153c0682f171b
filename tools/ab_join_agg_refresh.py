"""Same-session A/B of the join-agg view's fixed-delta refresh:
signed (r14 §4, current) vs netted (pre-r14 path, reproduced exactly by
patching _signed_delta to return _net_delta's rows re-signed).

Alternates arms A/B/A/B... over fresh scenario builds (same scenario as
bench.py's ivm_slice: create tables, bootstrap, ~1% update + ~1% delete,
timed refresh) and prints min/median per arm.
"""
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def run_arm(spark, netted: bool) -> float:
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    tmp = tempfile.mkdtemp(prefix="dlis-ivm-ab-")
    orig = IncrementalJoinAggView._signed_delta
    if netted:
        def _as_netted(self, left, right, l1, r1, l2, r2, out_cols):
            raw = orig(self, left, right, l1, r1, l2, r2, out_cols)
            return (
                raw.groupBy(*out_cols)
                .agg(F.sum("__s").alias("__s"))
                .filter(F.col("__s") != 0)
            )

        IncrementalJoinAggView._signed_delta = _as_netted
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        )
        l = VersionedTable.create(spark, os.path.join(tmp, "o"), orders)
        r = VersionedTable.create(spark, os.path.join(tmp, "c"), cust)
        v = IncrementalJoinAggView(
            spark, l.root, r.root, os.path.join(tmp, "v"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"], sums={"total": "price"},
        )
        v.refresh()
        l.update_where(F.col("k") % 149 == 0, {"price": F.col("price") + 1.0})
        l.delete_where(F.col("k") % 151 == 0)
        t0 = time.perf_counter()
        v.refresh()
        return time.perf_counter() - t0
    finally:
        IncrementalJoinAggView._signed_delta = orig
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (JIT, page cache) — not recorded
    run_arm(spark, netted=True)
    a, b = [], []
    for i in range(ROUNDS):
        b.append(run_arm(spark, netted=True))
        a.append(run_arm(spark, netted=False))
        print(
            f"round {i}: netted={b[-1]:.3f}s signed={a[-1]:.3f}s",
            flush=True,
        )
    print(
        f"netted (before): min={min(b):.3f} median={statistics.median(b):.3f}"
    )
    print(
        f"signed (after):  min={min(a):.3f} median={statistics.median(a):.3f}"
    )


if __name__ == "__main__":
    main()
