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


def test_q179_decontamination_invariant(spark, sf_dir):
    """The SEMANTIC promise of the capstone-v3 pipeline, checked
    end-to-end: after decontamination + scrub, NO >=L-token substring
    of any surviving document's final text appears anywhere in the
    held-out split — re-running the cross-corpus span finder over the
    pipeline's OWN OUTPUT must find nothing."""
    import pyspark.sql.functions as F

    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate_spans,
    )
    from datalakeingestionservice_spark.queries.capstone import _Q179_L

    # reproduce the pipeline's final corpus (doc_id, t2) by rebuilding
    # its stages up to the survivors — reuse the registered query's
    # internals via a direct re-run of the stage chain
    from datalakeingestionservice_spark.catalog import Env
    from datalakeingestionservice_spark.operators.dedup import (
        exact_dedup,
        exact_substring_decontaminate,
        exact_substring_scrub,
        fingerprint,
    )
    from datalakeingestionservice_spark.operators.text import (
        lexical_diversity,
        n_tokens,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text").withColumn("__b", b16)
    train = docs.filter(F.col("__b") < 14).drop("__b")
    held = docs.filter(F.col("__b") >= 14)
    quality = (
        train.withColumn("n_tokens", n_tokens("text"))
        .withColumn("diversity", lexical_diversity("text"))
        .filter((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.25))
        .drop("diversity")
    )
    exact_kept = exact_dedup(
        fingerprint(quality, "text"), keys=["fingerprint"], tiebreaker="doc_id"
    ).drop("fingerprint")
    decon = exact_substring_decontaminate(
        exact_kept.select("doc_id", "text"), held, min_len=_Q179_L,
        out_col="t1",
    )
    final = exact_substring_scrub(
        decon.select("doc_id", F.col("t1").alias("text")),
        min_len=_Q179_L,
        out_col="t2",
    ).select("doc_id", F.col("t2").alias("text"))
    # sanity: decontamination actually did something on this data
    assert decon.filter(F.col("n_removed_tokens") > 0).count() > 0
    leaks = exact_substring_decontaminate_spans(
        final, held, min_len=_Q179_L
    )
    assert leaks.count() == 0, leaks.limit(5).collect()
