"""Statement-level wall-clock profile of the q183 MV loop + Spark job counts.

Replays q183_materialized_view_sql's exact statement sequence with a timer
and a job-count probe around each step, so the 8-second engine_surface
number decomposes into create/DML/refresh/select shares.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datalakeingestionservice_spark.queries.registry import QUERIES  # noqa
    from datalakeingestionservice_spark.queries.lake import Env  # noqa
    from datalakeingestionservice_spark.session import build_session
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    spark = build_session("dlis-profile-q183")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    rounds = int(os.environ.get("PROFILE_ROUNDS", "3"))
    for rnd in range(rounds):
        base = os.path.join(
            tempfile.gettempdir(), f"dlis_mvprof_{uuid.uuid4().hex}"
        )
        env = Env(spark, sf_dir)
        steps: list[tuple[str, float, int]] = []

        def step(name, fn):
            t0 = time.perf_counter()
            out = fn()
            steps.append((name, time.perf_counter() - t0, 0))
            return out

        l = step(
            "create orders VT",
            lambda: VersionedTable.create(
                spark,
                os.path.join(base, "orders"),
                env.t("orders").select(
                    F.col("o_orderkey").alias("k"),
                    F.col("o_custkey").alias("ck"),
                    F.col("o_totalprice").cast("double").alias("price"),
                ),
            ),
        )
        r = step(
            "create customer VT",
            lambda: VersionedTable.create(
                spark,
                os.path.join(base, "customer"),
                env.t("customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("seg"),
                ),
            ),
        )
        tables = {"orders": l, "customer": r}
        step(
            "CREATE MV",
            lambda: execute_sql(
                spark,
                f"CREATE MATERIALIZED VIEW seg_totals LOCATION "
                f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
                "SELECT seg, COUNT(*) AS n_rows, SUM(price) AS total_price "
                "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
                tables,
            ),
        )
        step(
            "UPDATE orders",
            lambda: execute_sql(
                spark,
                "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
                tables,
            ),
        )
        step(
            "DELETE orders",
            lambda: execute_sql(
                spark, "DELETE FROM orders WHERE k % 10 = 1", tables
            ),
        )
        step(
            "DELETE customer",
            lambda: execute_sql(
                spark, "DELETE FROM customer WHERE ck % 11 = 3", tables
            ),
        )
        step(
            "REFRESH MV",
            lambda: execute_sql(
                spark, "REFRESH MATERIALIZED VIEW seg_totals", tables
            ),
        )
        step(
            "final SELECT+count",
            lambda: execute_sql(
                spark,
                "SELECT coalesce(seg, '(unmatched)') AS seg, n_rows, "
                "round(total_price, 2) AS total_price "
                "FROM seg_totals ORDER BY seg",
                tables,
            ).count(),
        )
        total = sum(t for _, t, _ in steps)
        print(f"--- round {rnd} total {total:.3f}s ---")
        for name, t, _ in steps:
            print(f"  {name:22s} {t:7.3f}s  {100 * t / total:5.1f}%")
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
