"""Benchmark harness: times the headline query set and prints ONE JSON line.

Scale factor dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
parallelism from $SPARK_GRAFT_CPUS (default 32). Each headline query is
executed to completion (count() over the final plan — forces every operator
without driver-side row transfer); wall-clock per query, summed as the metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from datalakeingestionservice_spark.queries import headline_queries
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the session (JVM classloading, codegen cache) outside the timings.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Untimed warm-up pass of every headline plan at the smallest SF: warms
    # the parquet reader, catalog views, and each plan's whole-stage-codegen
    # classes (codegen cache is keyed by generated source, which is identical
    # across sf dirs), so TIMED numbers measure plans, not JIT (round-1 q01
    # was ~2.8 s of warm-up; q79 carried ~4 s of codegen).
    # Per-query error isolation throughout: one failing plan must never zero
    # out the whole round's bench signal (round 3 lost all 15 numbers to a
    # single analysis exception raised during warm-up).
    queries = headline_queries()
    # Second sealed total (VERDICT r11 #5): the r1 headline set stays
    # the untouched continuity anchor, and `engine_surface` adds the
    # slices the engine actually grew — the MV statement loop and the
    # lake DML/time-travel path — so rounds that build IVM/lake no
    # longer look flat. Anchored at the round-12 idle seal (PERF.md).
    from datalakeingestionservice_spark.queries import QUERIES

    es_extra = {
        name: QUERIES[name]
        for name in (
            "q183_materialized_view_sql",
            "q113_versioned_merge_diff",
        )
        if name in QUERIES
    }
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for query in list(queries.values()) + list(es_extra.values()):
        try:
            query.spark_fn(spark, warm_dir).count()
        except Exception:
            pass  # the timed loop records the error

    # Min of two timed runs per query: single-run numbers at this scale carry
    # ±20% scheduler/GC noise, which swamps real plan changes round-to-round.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, query in queries.items():
        best = float("inf")
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                df = query.spark_fn(spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # record, keep benching the rest
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if best != float("inf"):
            timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # Host-load control: a FIXED JVM-side micro-benchmark (constant
    # generated aggregate, no IO, no Python) timed in the same run. Its
    # wall-clock scales with host contention exactly like the headline
    # queries do, so `value_normalized` = total / (control / control_ref)
    # makes round-over-round totals comparable across noisy hosts
    # (round 5's 9.33 s -> 12.9 s drift needed a manual worktree
    # re-bench to explain; this bakes the control in). control_ref is
    # the control's cost on the round-6 reference host.
    control_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 3 + 1)", "avg(id % 97)", "count(if(id % 7 = 0, 1, null))"
        ).collect()
        control_best = min(control_best, time.perf_counter() - t0)
    # Seconds on the round-6 reference host, measured INSIDE a full
    # bench run on an otherwise-idle host (fully JIT-warmed session —
    # an under-warmed calibration reads ~2x higher, a co-loaded host
    # ~25% higher).
    _CONTROL_REF = 0.136
    load_factor = round(control_best / _CONTROL_REF, 3)
    # engine_surface extras: same two-run-min protocol as the headline
    es_timings: dict[str, float] = {}
    for name, query in es_extra.items():
        best = float("inf")
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                query.spark_fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if best != float("inf"):
            es_timings[name] = round(best, 3)
    es_total = round(total + sum(es_timings.values()), 3)

    result = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "host_control_sec": round(control_best, 3),
        "host_load_factor": load_factor,
        "value_normalized": round(total / max(load_factor, 0.01), 3),
        "engine_surface": {
            "metric": "engine_surface_total_wall_clock",
            "value": es_total,
            "extra_queries": es_timings,
            "value_normalized": round(
                es_total / max(load_factor, 0.01), 3
            ),
            "anchor": "r12_idle_seal",
        },
    }
    # Dedup/similarity slice (VERDICT r14 #7): time the snapshot-commit
    # operator queries the r14 round optimized (q88 simhash, q158
    # semantic dedup, q194 semantic decontamination, q51 blocked
    # embedding near-dup) plus the MinHash/winnowing/exact-substring
    # family, so the driver's own protocol can confirm their wins.
    # ADDITIONS-ONLY: reported as a separate slice (like lake/ivm), so
    # the headline total and the engine_surface anchor stay comparable
    # round-over-round. Same two-run-min protocol; these queries aren't
    # in the headline warm pass, so each gets its own sf0.001 warm run
    # first (codegen cache is keyed by generated source).
    dedup_names = [
        "q88_simhash_neardup",
        "q158_semantic_dedup",
        "q194_semantic_decontamination",
        "q51_embedding_neardup",
        "q46_minhash_lsh_neardup",
        "q160_winnow_fingerprint_overlap",
        "q162_exact_substring_spans",
        "q163_exact_substring_scrub",
    ]
    ds_timings: dict[str, float] = {}
    for name in dedup_names:
        if name not in QUERIES:
            continue
        try:
            QUERIES[name].spark_fn(spark, warm_dir).count()
        except Exception:
            pass
        best = float("inf")
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                QUERIES[name].spark_fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if best != float("inf"):
            ds_timings[name] = round(best, 3)
    if ds_timings:
        result["dedup_similarity"] = {
            "metric": "dedup_similarity_total_wall_clock",
            "value": round(sum(ds_timings.values()), 3),
            "queries": ds_timings,
        }
    try:
        result["lake"] = lake_slice(spark, sf_dir)
    except Exception as exc:
        errors["lake"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result["ivm"] = ivm_slice(spark, sf_dir)
    except Exception as exc:
        errors["ivm"] = f"{type(exc).__name__}: {exc}"[:300]
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


def lake_slice(spark, sf_dir: str) -> dict:
    """Versioned-lake operation timings (E6-E11): commit, predicated
    (pruned) read, OPTIMIZE-compact with z-order, change feed. Kept
    OUTSIDE the headline total so `value` stays comparable round-over-
    round; one timed run each — lake ops are IO-bound, not JIT-noisy."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="dlis-lake-bench-")
    root = os.path.join(tmp, "vt")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_shipdate", "l_quantity",
            "l_extendedprice",
        )
        years = [r[0] for r in sorted(
            li.select(F.year("l_shipdate")).distinct().collect()
        )]
        # One commit per ship-year: the small-multi-dir layout every
        # streaming sink produces, and the shape dir-pruning needs.
        t0 = time.perf_counter()
        table = VersionedTable.create(
            spark, root, li.filter(F.year("l_shipdate") == years[0])
        )
        for y in years[1:]:
            table.append(li.filter(F.year("l_shipdate") == y))
        out["commit_per_version"] = round(
            (time.perf_counter() - t0) / len(years), 3
        )

        import datetime as dt

        preds = [("l_shipdate", ">=", dt.date(years[-1], 1, 1))]
        t0 = time.perf_counter()
        n_pruned = table.read(predicates=preds).count()
        out["pruned_read"] = round(time.perf_counter() - t0, 3)
        info = table.prune_info(preds)
        out["dirs_skipped"] = float(info["n_skipped"])

        t0 = time.perf_counter()
        table.compact(num_partitions=8, zorder_by=["l_shipdate"])
        out["compact_zorder"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n_post = table.read(predicates=preds).count()
        out["pruned_read_post_compact"] = round(time.perf_counter() - t0, 3)
        assert n_post == n_pruned, "compact changed predicated results"
        info = table.prune_info(preds)
        out["files_skipped_post_compact"] = float(info["n_files_skipped"])

        t0 = time.perf_counter()
        table.changes(1).count()
        out["change_feed_full_history"] = round(time.perf_counter() - t0, 3)

        # Merge-on-read deferred delete: metadata commit + matched-rows
        # change file, zero data rewrite (vs the COW delete's full
        # rewrite of affected entries).
        t0 = time.perf_counter()
        table.delete_where_deferred(f"year(l_shipdate) = {years[-1]}")
        out["deferred_delete"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        table.read().count()
        out["read_with_deferred_delete"] = round(
            time.perf_counter() - t0, 3
        )

        # Bloom point lookup on a column the layout doesn't cluster:
        # every entry's range envelope matches, only the bloom prunes.
        broot = os.path.join(tmp, "vt_bloom")
        bt = None
        for b in range(4):
            piece = li.filter(F.col("l_orderkey") % 4 == b)
            if bt is None:
                bt = VersionedTable.create(
                    spark, broot, piece, bloom_columns=["l_orderkey"]
                )
            else:
                bt.append(piece)
        probe = int(li.agg(F.max("l_orderkey")).collect()[0][0])
        t0 = time.perf_counter()
        bt.read(predicates=[("l_orderkey", "=", probe)]).count()
        out["bloom_point_lookup"] = round(time.perf_counter() - t0, 3)
        out["bloom_entries_skipped"] = float(
            bt.prune_info([("l_orderkey", "=", probe)])["n_skipped"]
        )

        # Incremental OPTIMIZE: drips compact, the big entry carries.
        bt.compact(num_partitions=4)
        for i in range(3):
            bt.append(li.filter(F.col("l_orderkey") % 999983 == i))
        t0 = time.perf_counter()
        v = bt.compact(small_entry_max_rows=10_000)
        out["incremental_compact"] = round(time.perf_counter() - t0, 3)
        out["incremental_compact_carried"] = float(
            bt.manifest(v).summary.get("n_entries_carried", 0)
        )

        # DataSource writer (df.write.format("versioned")): executor-
        # staged parquet, sessionless zero-copy commit. Timed per
        # operation so the Python-row staging cost is visible next to
        # the API append above.
        from datalakeingestionservice_spark.sources.versioned_batch import (
            register as register_versioned,
        )

        register_versioned(spark)
        # Warm the Python-DataSource worker pool first (one tiny write):
        # the first .save() pays ~4 s of interpreter spin-up that has
        # nothing to do with the writer; every other slice here is
        # likewise measured against a warm session.
        (
            li.limit(10)
            .write.format("versioned")
            .mode("append")
            .option("table_root", os.path.join(tmp, "vt_writer_warm"))
            .save()
        )
        wroot = os.path.join(tmp, "vt_writer")
        t0 = time.perf_counter()
        (
            li.filter(F.year("l_shipdate") == years[0])
            .write.format("versioned")
            .mode("append")
            .option("table_root", wroot)
            .save()
        )
        out["datasource_writer_create"] = round(
            time.perf_counter() - t0, 3
        )
        t0 = time.perf_counter()
        (
            li.filter(F.year("l_shipdate") == years[-1])
            .write.format("versioned")
            .mode("append")
            .option("table_root", wroot)
            .save()
        )
        out["datasource_writer_append"] = round(
            time.perf_counter() - t0, 3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def ivm_slice(spark, sf_dir: str) -> dict:
    """Incremental-view maintenance timings (E102/E106/E111): aggregate-
    over-join MV bootstrap, ONE incremental refresh for a fixed-size
    delta (~1% of orders updated + ~1% deleted), and the full
    join+aggregate recompute for contrast. Kept OUTSIDE the headline
    total like lake_slice. At bench SFs the recompute is small enough
    that fixed per-refresh costs (two merge commits) can dominate — the
    scale argument (refresh ∝ |delta|, near-flat at 10× table volume
    while recompute grows linearly) is measured in
    tools/probe_ivm_sf1.py and sealed in PERF.md."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import VersionedTable

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="dlis-ivm-bench-")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
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
        t0 = time.perf_counter()
        v.refresh()
        out["join_agg_mv_bootstrap"] = round(time.perf_counter() - t0, 3)

        l.update_where(
            F.col("k") % 149 == 0, {"price": F.col("price") + 1.0}
        )
        l.delete_where(F.col("k") % 151 == 0)
        t0 = time.perf_counter()
        v.refresh()
        out["join_agg_mv_refresh_fixed_delta"] = round(
            time.perf_counter() - t0, 3
        )

        t0 = time.perf_counter()
        l.read().join(r.read(), "ck").groupBy("seg").agg(
            F.count(F.lit(1)).alias("n"), F.sum("price").alias("total")
        ).collect()
        out["join_agg_full_recompute"] = round(
            time.perf_counter() - t0, 3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
