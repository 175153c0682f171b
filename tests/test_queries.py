"""Registry integrity + driver-contract smoke tests."""

from __future__ import annotations

import re

from datalakeingestionservice_spark.queries import QUERIES, headline_queries


def test_registry_nonempty_and_documented():
    assert len(QUERIES) >= 40
    for name, q in QUERIES.items():
        assert re.match(r"^q\d+_\w+$", name)
        assert q.doc.strip(), f"{name} lacks a docstring"


def test_headline_set_reasonable():
    names = set(headline_queries())
    assert 8 <= len(names) <= 20
    assert "q01_pricing_summary" in names


def test_driver_contract_shapes():
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    # Every registered query is oracle-backed (q46's native seeded MinHash
    # closed the last rows-only exception in round 7).
    rows_only = set(queries) - set(oracles)
    assert rows_only == set()


def test_entry_returns_rows(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_flagship_query_plan_is_scan_filter_agg(spark, sf_dir):
    plan = (
        QUERIES["q01_pricing_summary"]
        .spark_fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    # Predicate must reach the parquet scan:
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_broadcast_join_in_lookup_plan(spark, sf_dir):
    plan = (
        QUERIES["q13_broadcast_lookup"]
        .spark_fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def _plan(spark, sf_dir, name):
    df = QUERIES[name].spark_fn(spark, sf_dir)
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q50_cosine_topk")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_jaccard_join_not_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q45_ngram_jaccard_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pushdown_reaches_scan_on_flagship_extract(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_daily_trades")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # Column pruning: untouched wide columns never read.
    assert "l_comment" not in plan and "l_tax" not in plan
