"""Scale probe for the incremental-view family (PERF.md): refresh
wall-time at sf0.1 vs sf1 with a FIXED-SIZE delta. IVM's promise is
refresh ∝ |Δ| (+ one columnar scan of the other side for the join
delta terms, + files-touched merge) — so a 10× table-volume jump with
the SAME delta should move refresh time far less than 10×.

Per view: bootstrap once (expected ∝ table — reported for contrast),
then 3 rounds of identical-size mutations (500 order updates, 50
customer updates, 20 customer deletes; fresh keys each round), each
followed by one timed refresh(). Reports min/median of the 3.

Usage: python tools/probe_ivm_sf1.py /root/testdata/sf0.1 /tmp/sfscale/sf1
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

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


def probe_join_family(spark, sf_dir: str, results: dict) -> None:
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalFullJoinAggView,
        IncrementalFullJoinView,
        IncrementalJoinAggView,
        IncrementalJoinView,
        IncrementalLeftJoinAggView,
        IncrementalLeftJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    n_orders = orders.count()
    n_cust = customer.count()
    okeys = [
        r.k
        for r in orders.select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(1500)
        .collect()
    ]
    ckeys = [
        r.ck
        for r in customer.select(F.col("c_custkey").alias("ck"))
        .orderBy("ck")
        .limit(260)
        .collect()
    ]

    variants = {
        "join_view_E102": lambda s, lr, rr, vr: IncrementalJoinView(
            s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck"
        ),
        "left_outer_view_E105": lambda s, lr, rr, vr: (
            IncrementalLeftJoinView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck"
            )
        ),
        "join_agg_view_E106": lambda s, lr, rr, vr: (
            IncrementalJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], sums={"total_price": "price"},
            )
        ),
        "full_outer_view_E107": lambda s, lr, rr, vr: (
            IncrementalFullJoinView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck"
            )
        ),
        "left_join_agg_view_E109": lambda s, lr, rr, vr: (
            IncrementalLeftJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], sums={"total_price": "price"},
            )
        ),
        "full_join_agg_view_E109": lambda s, lr, rr, vr: (
            IncrementalFullJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], sums={"total_price": "price"},
            )
        ),
    }
    for name, mk in variants.items():
        base = os.path.join(
            tempfile.gettempdir(), f"ivmprobe_{uuid.uuid4().hex}"
        )
        l = VersionedTable.create(
            spark,
            os.path.join(base, "l"),
            orders.select(
                F.col("o_orderkey").alias("k"),
                F.col("o_custkey").alias("ck"),
                F.col("o_totalprice").cast("double").alias("price"),
            ),
        )
        r = VersionedTable.create(
            spark,
            os.path.join(base, "r"),
            customer.select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
        )
        view = mk(spark, l.root, r.root, os.path.join(base, "v"))
        t0 = time.monotonic()
        view.refresh()
        boot = time.monotonic() - t0

        times = []
        for i in range(3):
            osl = okeys[i * 500 : (i + 1) * 500]
            cupd = ckeys[i * 50 : i * 50 + 50]
            cdel = ckeys[150 + i * 20 : 150 + (i + 1) * 20]
            l.update_where(
                F.col("k").isin(osl), {"price": F.col("price") + 1.0}
            )
            r.update_where(
                F.col("ck").isin(cupd), {"seg": F.lit(f"X{i}")}
            )
            r.delete_where(F.col("ck").isin(cdel))
            t0 = time.monotonic()
            view.refresh()
            times.append(round(time.monotonic() - t0, 3))
        results[name] = {
            "bootstrap_s": round(boot, 3),
            "refresh_s": times,
            "refresh_min_s": min(times),
            "refresh_med_s": round(statistics.median(times), 3),
            "n_orders": n_orders,
            "n_customers": n_cust,
        }
        print(name, results[name], flush=True)
        shutil.rmtree(base, ignore_errors=True)


def probe_new_agg_views(spark, sf_dir: str, results: dict) -> None:
    """Round-11 single-table view classes at fixed delta: distinct
    counts (side-table maintenance), computed-key rollups (bucket
    churn), and the top-k leaderboard (fold-in + endangered rescans)."""
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
        IncrementalTopKView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    okeys = [
        r.k
        for r in orders.select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(1560)
        .collect()
    ]

    def mk_src(tag):
        return VersionedTable.create(
            spark,
            os.path.join(
                tempfile.gettempdir(), f"ivmprobe_{uuid.uuid4().hex}", tag
            ),
            orders.select(
                F.col("o_orderkey").alias("k"),
                F.col("o_custkey").alias("ck"),
                F.col("o_orderdate").alias("dt"),
                F.col("o_orderpriority").alias("prio"),
                F.col("o_totalprice").cast("double").alias("price"),
            ),
        )

    variants = {
        "distinct_agg_view_E113": lambda s, sr, vr: IncrementalAggView(
            s, sr, vr, keys=["ck"],
            sums={"total": "price"}, distincts={"np": "prio"},
        ),
        "computed_key_rollup_E116": lambda s, sr, vr: IncrementalAggView(
            s, sr, vr,
            keys={"mon": "substring(cast(dt as string), 1, 7)"},
            sums={"total": "price"}, maxs={"hi": "price"},
        ),
        "topk_view_E115": lambda s, sr, vr: IncrementalTopKView(
            s, sr, vr, keys=["prio"], order_col="price", k=5, pk="k",
        ),
    }
    for name, mk in variants.items():
        src = mk_src(name)
        view = mk(spark, src.root, src.root + "_v")
        t0 = time.monotonic()
        view.refresh()
        boot = time.monotonic() - t0
        times = []
        for i in range(3):
            upd = okeys[i * 500 : (i + 1) * 500]
            dels = okeys[1500 + i * 20 : 1500 + (i + 1) * 20]
            src.update_where(
                F.col("k").isin(upd),
                {"price": F.col("price") + 1.0},
            )
            src.delete_where(F.col("k").isin(dels))
            t0 = time.monotonic()
            view.refresh()
            times.append(round(time.monotonic() - t0, 3))
        results[name] = {
            "bootstrap_s": round(boot, 3),
            "refresh_s": times,
            "refresh_min_s": min(times),
            "refresh_med_s": round(statistics.median(times), 3),
        }
        print(name, results[name], flush=True)
        shutil.rmtree(os.path.dirname(src.root), ignore_errors=True)


def probe_ivf_index(spark, sf_dir: str, results: dict) -> None:
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.ivf_index import (
        IncrementalIVFIndex,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    n = emb.count()
    keys = [
        r.vec_id
        for r in emb.select("vec_id").orderBy("vec_id").limit(660).collect()
    ]
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    base = os.path.join(
        tempfile.gettempdir(), f"ivfprobe_{uuid.uuid4().hex}"
    )
    src = VersionedTable.create(spark, os.path.join(base, "emb"), emb)
    idx = IncrementalIVFIndex(
        spark, src.root, os.path.join(base, "idx"), centroids
    )
    t0 = time.monotonic()
    idx.refresh()
    boot = time.monotonic() - t0
    times = []
    for i in range(3):
        upd = keys[8 + i * 200 : 8 + i * 200 + 200]
        dels = keys[8 + 600 + i * 15 : 8 + 600 + (i + 1) * 15]
        src.update_where(
            F.col("vec_id").isin(upd),
            {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
        )
        src.delete_where(F.col("vec_id").isin(dels))
        t0 = time.monotonic()
        idx.refresh()
        times.append(round(time.monotonic() - t0, 3))
    results["ivf_index_E110"] = {
        "bootstrap_s": round(boot, 3),
        "refresh_s": times,
        "refresh_min_s": min(times),
        "refresh_med_s": round(statistics.median(times), 3),
        "n_vectors": n,
    }
    print("ivf_index_E110", results["ivf_index_E110"], flush=True)
    shutil.rmtree(base, ignore_errors=True)


def probe_round11b(spark, sf_dir: str, results: dict) -> None:
    """Late round-11 view classes at fixed delta: filtered outer views
    (σ on padded renders + raw-side matched-ness), the computed-key
    rollup over a join, and the composed extremes-over-join (join
    materialized + agg over its state feed)."""
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalComposedJoinAggView,
        IncrementalComposedOuterJoinAggView,
        IncrementalJoinAggView,
        IncrementalLeftJoinAggView,
        IncrementalLeftJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    okeys = [
        r.k
        for r in orders.select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(1500)
        .collect()
    ]
    ckeys = [
        r.ck
        for r in customer.select(F.col("c_custkey").alias("ck"))
        .orderBy("ck")
        .limit(260)
        .collect()
    ]

    variants = {
        "filtered_left_outer_view_E117": lambda s, lr, rr, vr: (
            IncrementalLeftJoinView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                filter="price >= 1000 OR seg = 'BUILDING'",
            )
        ),
        "filtered_left_join_agg_E117": lambda s, lr, rr, vr: (
            IncrementalLeftJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], sums={"total_price": "price"},
                filter="price >= 1000 OR seg = 'BUILDING'",
            )
        ),
        "computed_key_join_rollup_E120": lambda s, lr, rr, vr: (
            IncrementalJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys={
                    "mon": "substring(cast(dt as string), 1, 7)",
                    "seg": "seg",
                },
                sums={"total_price": "price"},
            )
        ),
        "composed_extremes_over_join_E121": lambda s, lr, rr, vr: (
            IncrementalComposedJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], sums={"total_price": "price"},
                mins={"lo": "price"}, maxs={"hi": "price"},
            )
        ),
        "composed_outer_extremes_E126": lambda s, lr, rr, vr: (
            IncrementalComposedOuterJoinAggView(
                s, lr, rr, vr, on=["ck"], left_pk="k", right_pk="ck",
                group_keys=["seg"], join_type="left",
                sums={"total_price": "price"},
                mins={"lo": "price"}, maxs={"hi": "price"},
            )
        ),
    }
    for name, mk in variants.items():
        base = os.path.join(
            tempfile.gettempdir(), f"ivmprobe_{uuid.uuid4().hex}"
        )
        l = VersionedTable.create(
            spark,
            os.path.join(base, "l"),
            orders.select(
                F.col("o_orderkey").alias("k"),
                F.col("o_custkey").alias("ck"),
                F.col("o_orderdate").alias("dt"),
                F.col("o_totalprice").cast("double").alias("price"),
            ),
        )
        r = VersionedTable.create(
            spark,
            os.path.join(base, "r"),
            customer.select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
        )
        view = mk(spark, l.root, r.root, os.path.join(base, "v"))
        t0 = time.monotonic()
        view.refresh()
        boot = time.monotonic() - t0
        times = []
        for i in range(3):
            osl = okeys[i * 500 : (i + 1) * 500]
            cupd = ckeys[i * 50 : i * 50 + 50]
            cdel = ckeys[150 + i * 20 : 150 + (i + 1) * 20]
            l.update_where(
                F.col("k").isin(osl), {"price": F.col("price") + 1.0}
            )
            r.update_where(
                F.col("ck").isin(cupd), {"seg": F.lit(f"X{i}")}
            )
            r.delete_where(F.col("ck").isin(cdel))
            t0 = time.monotonic()
            view.refresh()
            times.append(round(time.monotonic() - t0, 3))
        results[name] = {
            "bootstrap_s": round(boot, 3),
            "refresh_s": times,
            "refresh_min_s": min(times),
            "refresh_med_s": round(statistics.median(times), 3),
        }
        print(name, results[name], flush=True)
        shutil.rmtree(base, ignore_errors=True)


def probe_round12(spark, sf_dir: str, results: dict) -> None:
    """Round-12 state machines at fixed delta: the 3-table chained-join
    MV (E128 — one refresh drains the cascade) and the BM25 index
    (E129 — postings/df/stats merges from the docs feed)."""
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )
    from datalakeingestionservice_spark.sinks.matview import (
        MaterializedView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"r12probe_{uuid.uuid4().hex}"
    )
    orders = spark.read.parquet(
        os.path.join(sf_dir, "orders.parquet")
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    customer = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    ).select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    nation = spark.read.parquet(
        os.path.join(sf_dir, "nation.parquet")
    ).select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nname")
    )
    okeys = [
        r.k for r in orders.select("k").orderBy("k").limit(1600).collect()
    ]
    o = VersionedTable.create(spark, os.path.join(base, "o"), orders)
    c = VersionedTable.create(spark, os.path.join(base, "c"), customer)
    n = VersionedTable.create(spark, os.path.join(base, "n"), nation)
    tables = {"orders": o, "customer": c, "nation": n}
    t0 = time.monotonic()
    mv = MaterializedView.create(
        spark,
        os.path.join(base, "mv"),
        "SELECT nname, seg, COUNT(*) AS n_orders, SUM(price) AS total "
        "FROM orders JOIN customer USING (ck) JOIN nation USING (nk) "
        "GROUP BY nname, seg",
        tables,
        primary_key=("k", "ck", "nk"),
    )
    boot = time.monotonic() - t0
    times = []
    for i in range(3):
        upd = okeys[i * 500 : (i + 1) * 500]
        o.update_where(
            F.col("k").isin(upd), {"price": F.col("price") + 1.0}
        )
        t0 = time.monotonic()
        mv.refresh()
        times.append(round(time.monotonic() - t0, 3))
    results["chain_mv_3table_E128"] = {
        "bootstrap_s": round(boot, 3),
        "refresh_s": times,
        "refresh_min_s": min(times),
        "refresh_med_s": round(statistics.median(times), 3),
    }
    print(
        "chain_mv_3table_E128", results["chain_mv_3table_E128"], flush=True
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    dkeys = [
        r.doc_id
        for r in docs.select("doc_id").orderBy("doc_id").limit(700).collect()
    ]
    dsrc = VersionedTable.create(spark, os.path.join(base, "docs"), docs)
    idx = IncrementalBM25Index(
        spark, dsrc.root, os.path.join(base, "bm25")
    )
    t0 = time.monotonic()
    idx.refresh()
    boot = time.monotonic() - t0
    times = []
    for i in range(3):
        upd = dkeys[i * 200 : i * 200 + 200]
        dels = dkeys[600 + i * 30 : 600 + (i + 1) * 30]
        dsrc.update_where(
            F.col("doc_id").isin(upd),
            {"text": F.concat(F.lit("probe delta tokens "), F.col("text"))},
        )
        dsrc.delete_where(F.col("doc_id").isin(dels))
        t0 = time.monotonic()
        idx.refresh()
        times.append(round(time.monotonic() - t0, 3))
    results["bm25_index_E129"] = {
        "bootstrap_s": round(boot, 3),
        "refresh_s": times,
        "refresh_min_s": min(times),
        "refresh_med_s": round(statistics.median(times), 3),
        "n_docs": dsrc.read().count(),
    }
    print("bm25_index_E129", results["bm25_index_E129"], flush=True)
    shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    out: dict = {}
    for sf_dir in sys.argv[1:]:
        if sf_dir.startswith("-"):
            raise SystemExit(f"refusing option-like path {sf_dir!r}")
        spark = build_session()
        res: dict = {}
        only_new = os.environ.get("PROBE_ONLY_NEW") == "1"
        only_11b = os.environ.get("PROBE_ONLY_11B") == "1"
        only_ivf = os.environ.get("PROBE_ONLY_IVF") == "1"
        only_12 = os.environ.get("PROBE_ONLY_12") == "1"
        if only_11b:
            probe_round11b(spark, sf_dir, res)
        elif only_ivf:
            probe_ivf_index(spark, sf_dir, res)
        elif only_12:
            probe_round12(spark, sf_dir, res)
        else:
            if not only_new:
                probe_join_family(spark, sf_dir, res)
            probe_new_agg_views(spark, sf_dir, res)
            if not only_new:
                probe_ivf_index(spark, sf_dir, res)
            probe_round11b(spark, sf_dir, res)
            probe_round12(spark, sf_dir, res)
        out[sf_dir] = res
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
