"""Capture .explain('formatted') for the join-agg view refresh's delta
aggregation, both forms, into plans/r14/:

- ivm_join_agg_refresh_before.txt — the netted path the refresh used
  before r14 §4: _agg(_net_delta(...), sign=__net) (full-width groupBy
  over every join output column feeding the group aggregation).
- ivm_join_agg_refresh_after.txt — the signed path it uses now:
  _agg(_signed_delta(...), sign=__s).

Mirrors bench.py's ivm_slice scenario (same tables, same fixed delta)
so the plans correspond to the measured numbers.
"""
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    tmp = tempfile.mkdtemp(prefix="dlis-ivm-plan-")
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

        left, right = v._sides()
        l1, r1 = v.last_refreshed_versions()
        l2, r2 = left.latest_version(), right.latest_version()
        out_cols = v._out_cols(left, right)

        nets = v._net_delta(left, right, l1, r1, l2, r2, out_cols)
        before = v._agg(nets, sign=F.col("__net"))
        signed = v._signed_delta(left, right, l1, r1, l2, r2, out_cols)
        after = v._agg(signed, sign=F.col("__s"))

        for name, df in (
            ("ivm_join_agg_refresh_before", before),
            ("ivm_join_agg_refresh_after", after),
        ):
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}.txt")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
