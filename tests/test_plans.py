"""Plan-regression tests: the 100 TB-shaped physical plans the headline
queries were tuned to must not silently regress.

Asserted properties (VERDICT r1 item 5):
- filters reach the parquet scan (`PushedFilters` non-empty) where the query
  filters on scannable columns;
- dimension joins broadcast (q03/q05/q13) — a SortMergeJoin on a dim table
  would shuffle the fact side for nothing;
- no CartesianProduct anywhere; BroadcastNestedLoopJoin only in the two
  queries that cross-join a broadcast constant-sized frame (q50's query
  vector, q38's 124-row rate spine);
- q50's top-k compiles to TakeOrderedAndProject (per-partition heap + k-row
  driver merge), never a global Sort;
- every headline plan contains WholeStageCodegen spans — printed as '*(n)'
  in the final adaptive plan — i.e. expressions stayed JVM-side.

Plans are inspected at sf0.001 — plan SHAPE is scale-invariant here because
every broadcast in these queries is statically declared (F.broadcast), not
size-estimated.
"""

from __future__ import annotations

import re

import pytest

from datalakeingestionservice_spark.queries import headline_queries

# Queries allowed to contain BroadcastNestedLoopJoin: cross joins against
# broadcast frames whose size is a small CONSTANT (independent of data scale).
_BNLJ_ALLOWED = {
    "q50_cosine_topk",  # corpus x broadcast(single query vector)
    "q38_asof_join",  # distinct event types x broadcast(124-row rate spine)
}

# (query, minimum number of scans with non-empty PushedFilters).
_PUSHDOWN_EXPECTED = {
    "q01_pricing_summary": 1,  # l_shipdate range predicate
    "q03_shipping_priority": 3,  # c_mktsegment + two date predicates
    "q05_local_supplier_volume": 2,  # region name + order date range
    "q13_broadcast_lookup": 1,
}

_BROADCAST_JOIN_EXPECTED = {
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q13_broadcast_lookup",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    """FINAL adaptive plans: each query is executed so AQE materializes its
    runtime plan (pre-execution strings carry neither the final join strategy
    nor WholeStageCodegen spans)."""
    out = {}
    for name, q in headline_queries().items():
        df = q.spark_fn(spark, sf_dir)
        # collect() (not count()) — count() builds and runs a DIFFERENT plan,
        # leaving this one un-finalized. Output sizes are small at sf0.001.
        df.collect()
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def _pushed_nonempty(plan: str) -> int:
    return sum(
        1
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.strip()
    )


def test_no_cartesian_product(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name


def test_nested_loop_joins_only_on_broadcast_constants(plans):
    for name, plan in plans.items():
        if name in _BNLJ_ALLOWED:
            continue
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_filters_pushed_to_scan(plans):
    for name, n_min in _PUSHDOWN_EXPECTED.items():
        assert _pushed_nonempty(plans[name]) >= n_min, (
            f"{name}: expected >= {n_min} scans with PushedFilters"
        )


def test_q45_scan_filter_on_cached_posting_list(spark, sf_dir, plans):
    """q45's posting list is persisted (it feeds sizes + both self-join
    sides), so the parquet scan lives in the CACHED subtree, not the
    final composed plan. Assert both halves: the final plan serves the
    join from the cache, and the subtree that populates it evaluates
    the too-short-document predicate AT the scan (DataFilters — an
    expression over split(text) can't become a parquet PushedFilter,
    but it must run before the explode multiplies rows)."""
    assert "InMemoryTableScan" in plans["q45_ngram_jaccard_neardup"]
    from datalakeingestionservice_spark.catalog import Env
    from datalakeingestionservice_spark.operators.dedup import (
        word_shingles,
    )

    shingles = word_shingles(
        Env(spark, sf_dir).t("documents"),
        "doc_id",
        "text",
        n=3,
        max_shingle_freq=50,
    )
    subtree = shingles._jdf.queryExecution().executedPlan().toString()
    assert sum(
        1
        for m in re.findall(r"DataFilters: \[([^\]]*)\]", subtree)
        if m.strip()
    ) >= 1, "posting-list subtree lost its scan-level size filter"


def test_dimension_joins_broadcast(plans):
    for name in _BROADCAST_JOIN_EXPECTED:
        plan = plans[name]
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, (
            f"{name}: dimension join regressed to SortMergeJoin"
        )


def test_topk_is_take_ordered_not_global_sort(plans):
    plan = plans["q50_cosine_topk"]
    assert "TakeOrderedAndProject" in plan
    # The only acceptable Sort is none at all: top-k never globally sorts.
    assert "\n+- Sort" not in plan and "Sort [" not in plan.replace(
        "TakeOrderedAndProject", ""
    ), "q50 plan acquired a global sort"


def test_whole_stage_codegen_everywhere(plans):
    for name, plan in plans.items():
        # Codegen spans print as '*(n) Operator' in the simple plan string.
        assert re.search(r"\*\(\d+\)", plan), (
            f"{name}: no WholeStageCodegen span — expressions left the JVM "
            "or fell to interpreted mode"
        )


def test_capstone_self_join_is_not_broadcast(spark, sf_dir, plans):
    """q79's shingle self-join is big-big: statically it must plan as a
    shuffle join (SortMergeJoin/ShuffledHashJoin), NOT a broadcast —
    broadcasting a data-proportional posting list OOMs executors at scale.

    The self-join no longer appears in q79's FINAL composed plan (the pair
    graph is consumed by connected_components during construction and the
    persisted posting subtree hides behind InMemoryTableScan), so assert on
    the jaccard_pairs plan itself. q79's final plan is separately pinned to
    broadcast only the connected-components fast-path output — a relation
    bounded by driver_threshold edges (a constant), not by data size."""
    from datalakeingestionservice_spark.catalog import Env
    from datalakeingestionservice_spark.operators.dedup import (
        jaccard_pairs,
        word_shingles,
    )

    # At toy SF the planner broadcasts the self-join by SIZE ESTIMATE, which
    # is correct and disappears at scale. The property that must hold at any
    # scale is that no side is FORCE-broadcast (hinted): with the auto
    # threshold off, a hint is the only thing that can still broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shingles = word_shingles(
            Env(spark, sf_dir).t("documents"),
            "doc_id",
            "text",
            n=3,
            max_shingle_freq=50,
        )
        pairs = jaccard_pairs(shingles, id_col="doc_id", threshold=0.4)
        static = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # The only allowed forced broadcast is word_shingles' stop-shingle
    # LeftAnti (the df>K heavy-hitter list — ≤ total_shingles/K rows, cut
    # further by the df filter; operators/dedup.py:108). The candidate
    # self-join and the per-doc sizes joins are all Inner and must stay
    # shuffle joins.
    inner_broadcasts = [
        ln
        for ln in static.splitlines()
        if "BroadcastHashJoin" in ln and "Inner" in ln
    ]
    assert not inner_broadcasts, (
        "jaccard self-join carries a FORCED broadcast — at scale this ships "
        f"a data-proportional posting list to every executor: {inner_broadcasts}"
    )
    assert "SortMergeJoin" in static or "ShuffledHashJoin" in static, (
        "jaccard self-join no longer plans as a shuffle join"
    )
    final = plans["q79_training_data_pipeline"]
    for cond in re.findall(r"\(\d+\) BroadcastHashJoin[\s\S]*?Join type: (\w+)", final):
        assert cond in ("LeftAnti", "Inner"), cond
    # Every broadcast build side in the final plan must be the CC fast-path
    # ExistingRDD (bounded), never a parquet- or cache-backed subtree.
    for m in re.finditer(r"\(\d+\) BroadcastExchange", final):
        tail = final[m.end() : m.end() + 400]
        assert "ExistingRDD" in tail, tail
    assert "SortMergeJoin" not in final, (
        "q79 final plan reacquired a sort-merge join on the bounded CC output"
    )
