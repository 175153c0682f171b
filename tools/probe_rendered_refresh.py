"""Scale probe for the rendered projection's refresh (PERF.md, r14):
rendered-refresh cost must be ∝ |Δ|, FLAT as the view grows.

r13's verdict flagged the SELECT*-OUTER row-view rendered refresh as
`weak`: it rebuilt affected rows from an unpruned view-sized read() +
gid semi-join — an IO-shaped scale-killer at 100×. r14 rebuilds the
merge input from the state tables' CHANGE ROWS alone (SELECT * deltas
carry the full visible payload; one window over O(|Δ|) rows per feed;
zero state-table reads — spy-pinned in tests/test_matview_rollup.py).
This probe is the wall-clock half of that pin: a FIXED-size delta's
rendered refresh at sf0.1 vs sf1 (10× view volume) should move far
less than 10× — ideally flat.

Per scale: build `orders LEFT JOIN customer` SELECT*-OUTER view +
rendered bootstrap (∝ view, reported for contrast), then 3 rounds of
identical-size DML (200 order updates + 20 customer deletes, fresh
keys each round), each followed by view-state refresh (untimed) and
ONE timed refresh_rendered(). Also probes the AGG pyramid path
(daily revenue) for contrast — its one scan is the groups-sized agg
state, accepted by construction.

Usage: python tools/probe_rendered_refresh.py /root/testdata/sf0.1 /tmp/sfscale/sf1
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.matview import MaterializedView
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    work = tempfile.mkdtemp(prefix="rendprobe_")
    out: dict = {}
    try:
        orders_df = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        cust_df = spark.read.parquet(
            os.path.join(sf_dir, "customer.parquet")
        ).select("c_custkey", "c_name", "c_mktsegment")
        # distinct join-key column names (SELECT * join uses USING)
        orders_df = orders_df.withColumnRenamed("o_custkey", "custkey")
        cust_df = cust_df.withColumnRenamed("c_custkey", "custkey")

        orders = VersionedTable.create(
            spark, os.path.join(work, "orders"), orders_df
        )
        cust = VersionedTable.create(
            spark, os.path.join(work, "cust"), cust_df
        )
        out["orders_rows"] = orders.read().count()

        # ---- SELECT*-OUTER row view ---------------------------------
        view = MaterializedView.create(
            spark,
            os.path.join(work, "outer"),
            "SELECT * FROM orders LEFT JOIN cust USING (custkey)",
            {"orders": orders, "cust": cust},
            primary_key=("o_orderkey", "c_name"),
        )
        t0 = time.time()
        view.ensure_rendered()
        out["outer_bootstrap_s"] = round(time.time() - t0, 3)

        okeys = [
            r[0]
            for r in orders.read()
            .select("o_orderkey")
            .orderBy("o_orderkey")
            .limit(600)
            .collect()
        ]
        ckeys = [
            r[0]
            for r in cust.read()
            .select("custkey")
            .orderBy("custkey")
            .limit(60)
            .collect()
        ]
        times = []
        for i in range(3):
            ob = okeys[i * 200 : (i + 1) * 200]
            cb = ckeys[i * 20 : (i + 1) * 20]
            orders.update_where(
                F.col("o_orderkey").isin(ob),
                {"o_totalprice": F.col("o_totalprice") + 1.0},
            )
            cust.delete_where(F.col("custkey").isin(cb))
            view._view.refresh()  # state current; rendered stale
            t0 = time.time()
            view.refresh_rendered()
            times.append(time.time() - t0)
        out["outer_refresh_min_s"] = round(min(times), 3)
        out["outer_refresh_med_s"] = round(statistics.median(times), 3)

        # ---- AGG pyramid path (contrast: groups-sized scan) ---------
        daily = MaterializedView.create(
            spark,
            os.path.join(work, "daily"),
            "SELECT o_orderdate AS day, COUNT(*) AS n, "
            "SUM(o_totalprice) AS total FROM orders GROUP BY o_orderdate",
            {"orders": orders},
        )
        t0 = time.time()
        daily.ensure_rendered()
        out["agg_bootstrap_s"] = round(time.time() - t0, 3)
        times = []
        for i in range(3):
            ob = okeys[i * 200 : (i + 1) * 200]
            orders.update_where(
                F.col("o_orderkey").isin(ob),
                {"o_totalprice": F.col("o_totalprice") + 1.0},
            )
            daily._view.refresh()
            t0 = time.time()
            daily.refresh_rendered()
            times.append(time.time() - t0)
        out["agg_refresh_min_s"] = round(min(times), 3)
        out["agg_refresh_med_s"] = round(statistics.median(times), 3)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfscale/sf1"]
    spark = build_session()
    results = {}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        results[label] = probe(spark, d)
        print(json.dumps({label: results[label]}), flush=True)
    if len(results) == 2:
        (a, ra), (b, rb) = results.items()
        for k in ("outer_refresh_min_s", "agg_refresh_min_s"):
            if ra[k] > 0:
                print(
                    json.dumps(
                        {f"ratio_{k}": round(rb[k] / ra[k], 2), "volumes": f"{a}->{b}"}
                    )
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
