"""Census every driver-side Spark action fired during q183's REFRESH.

Wraps the DataFrame action entry points (collect, count, localCheckpoint,
first/head/take, DataFrameWriter.parquet/save) with a wall-clock timer and
the engine-side caller (file:line) pulled from the stack, so the 60-job
refresh decomposes into "which line of engine code fired which action and
what it cost". Read-only diagnostics; no engine change.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback
import uuid
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# Spark 4: sessions hand out pyspark.sql.classic.dataframe.DataFrame, which
# OVERRIDES the action methods — patching the facade class intercepts nothing.
try:
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # pragma: no cover - Spark 3.x
    from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

ACTIONS: list[tuple[str, str, float]] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "datalakeingestionservice_spark" in fn and "tools" not in fn:
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "<driver>"


def wrap_df(name: str):
    orig = getattr(DataFrame, name)

    def inner(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            ACTIONS.append((name, _caller(), time.perf_counter() - t0))

    setattr(DataFrame, name, inner)


def wrap_writer(name: str):
    orig = getattr(DataFrameWriter, name)

    def inner(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            ACTIONS.append((f"write.{name}", _caller(), time.perf_counter() - t0))

    setattr(DataFrameWriter, name, inner)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in ("collect", "count", "localCheckpoint", "first", "head", "take"):
        wrap_df(name)
    for name in ("parquet", "save"):
        wrap_writer(name)

    from datalakeingestionservice_spark.queries.lake import Env
    from datalakeingestionservice_spark.session import build_session
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    spark = build_session("dlis-census-q183")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rnd in range(2):
        base = os.path.join(
            tempfile.gettempdir(), f"dlis_census_{uuid.uuid4().hex}"
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
        ACTIONS.clear()
        jobs0 = (
            spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        )
        t0 = time.perf_counter()
        execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_totals", tables)
        wall = time.perf_counter() - t0
        jobs1 = (
            spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        )
        print(
            f"--- round {rnd}: REFRESH wall {wall:.3f}s, "
            f"{len(ACTIONS)} actions, {len(jobs1) - len(jobs0)} jobs ---"
        )
        agg: dict[tuple[str, str], list[float]] = defaultdict(list)
        for name, site, dt in ACTIONS:
            agg[(name, site)].append(dt)
        for (name, site), ts in sorted(
            agg.items(), key=lambda kv: -sum(kv[1])
        ):
            print(
                f"  {name:18s} {site:32s} n={len(ts):2d}"
                f" total={sum(ts):6.3f}s each={[round(x, 2) for x in ts]}"
            )
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
