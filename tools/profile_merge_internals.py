"""Time the sub-steps inside VersionedTable.merge during q183's REFRESH."""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

T: dict[str, list[float]] = defaultdict(list)


def wrap_fn(mod, name: str, label: str):
    orig = getattr(mod, name)

    def inner(*a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            T[label].append(time.perf_counter() - t0)

    setattr(mod, name, inner)
    return orig


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datalakeingestionservice_spark.queries.lake import Env
    from datalakeingestionservice_spark.session import build_session
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks import versioned as vmod
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    # DataFrame.localCheckpoint
    orig_lc = DataFrame.localCheckpoint

    def lc(self, eager=True):
        t0 = time.perf_counter()
        out = orig_lc(self, eager)
        T["localCheckpoint"].append(time.perf_counter() - t0)
        return out

    DataFrame.localCheckpoint = lc

    wrap_fn(vmod, "_key_bounds_preds", "key_bounds")
    for meth, label in [
        ("_write_cdf", "write_cdf"),
        ("_write_data_entries", "write_data"),
        ("_commit", "commit"),
    ]:
        orig = getattr(VersionedTable, meth)

        def mk(orig):
            def inner(self, *a, **kw):
                t0 = time.perf_counter()
                try:
                    return orig(self, *a, **kw)
                finally:
                    T[label2].append(time.perf_counter() - t0)

            return inner

        label2 = label
        setattr(VersionedTable, meth, mk(orig))
        # NB label2 closure trick: rebind per loop iteration
        def _fix(label=label, orig=orig):
            def inner(self, *a, **kw):
                t0 = time.perf_counter()
                try:
                    return orig(self, *a, **kw)
                finally:
                    T[label].append(time.perf_counter() - t0)

            return inner

        setattr(VersionedTable, meth, _fix())

    spark = build_session("dlis-profile-merge")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rnd in range(2):
        base = os.path.join(
            tempfile.gettempdir(), f"dlis_mvprof3_{uuid.uuid4().hex}"
        )
        env = Env(spark, sf_dir)
        l = VersionedTable.create(
            spark,
            os.path.join(base, "orders"),
            env.t("orders").select(
                F.col("o_orderkey").alias("k"),
                F.col("o_custkey").alias("ck"),
                F.col("o_totalprice").cast("double").alias("price"),
            ),
        )
        r = VersionedTable.create(
            spark,
            os.path.join(base, "customer"),
            env.t("customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
        )
        tables = {"orders": l, "customer": r}
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW seg_totals LOCATION "
            f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
            "SELECT seg, COUNT(*) AS n_rows, SUM(price) AS total_price "
            "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
            tables,
        )
        execute_sql(
            spark,
            "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
            tables,
        )
        execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
        execute_sql(spark, "DELETE FROM customer WHERE ck % 11 = 3", tables)
        T.clear()
        t0 = time.perf_counter()
        execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_totals", tables)
        wall = time.perf_counter() - t0
        print(f"--- round {rnd}: REFRESH wall {wall:.3f}s ---")
        for label in sorted(T):
            ts = T[label]
            print(
                f"  {label:20s} calls={len(ts):2d} total={sum(ts):7.3f}s"
                f" each={[round(x, 2) for x in ts]}"
            )
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
