"""Decompose q183's REFRESH MATERIALIZED VIEW into its maintenance phases.

Monkey-patches timers around IncrementalJoinView.refresh (inner merge),
IncrementalLeftJoinView._refresh_padded, _OuterJoinAggMixin._refresh_agg,
and VersionedTable.merge / read / changes so the refresh wall-clock
decomposes into phases and the per-merge commit overhead is visible.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PHASE_TIMES: dict[str, list[float]] = defaultdict(list)
CALLS: dict[str, int] = defaultdict(int)
JOB_MARKS: dict[str, int] = {}


def wrap(cls, name: str, label: str, tracker=None):
    orig = getattr(cls, name)

    def inner(self, *a, **kw):
        CALLS[label] += 1
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            PHASE_TIMES[label].append(time.perf_counter() - t0)

    setattr(cls, name, inner)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datalakeingestionservice_spark.queries.lake import Env
    from datalakeingestionservice_spark.session import build_session
    from datalakeingestionservice_spark.sinks import incremental_view as iv
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks import versioned as vmod
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    wrap(iv.IncrementalJoinView, "refresh", "inner_view_refresh")
    wrap(iv.IncrementalLeftJoinView, "_refresh_padded", "padded_refresh")
    wrap(iv._OuterJoinAggMixin, "_refresh_agg", "agg_refresh")
    wrap(vmod.VersionedTable, "merge", "VT.merge")
    wrap(vmod.VersionedTable, "_write_data_entries", "VT._write_data_entries")
    wrap(vmod.VersionedTable, "_commit", "VT._commit")
    wrap(vmod.VersionedTable, "changes", "VT.changes(plan)")

    spark = build_session("dlis-profile-q183r")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tracker = spark.sparkContext.statusTracker()

    rounds = int(os.environ.get("PROFILE_ROUNDS", "2"))
    for rnd in range(rounds):
        PHASE_TIMES.clear()
        CALLS.clear()
        base = os.path.join(
            tempfile.gettempdir(), f"dlis_mvprof2_{uuid.uuid4().hex}"
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
        PHASE_TIMES.clear()
        CALLS.clear()
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_totals", tables)
        wall = time.perf_counter() - t0
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            f"--- round {rnd}: REFRESH wall {wall:.3f}s,"
            f" spark jobs {jobs1 - jobs0} ---"
        )
        for label in sorted(PHASE_TIMES):
            ts = PHASE_TIMES[label]
            print(
                f"  {label:24s} calls={len(ts):2d}"
                f" total={sum(ts):7.3f}s  max={max(ts):6.3f}s"
            )
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
