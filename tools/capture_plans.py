"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
headline set + engine_surface extras). Side-effecting queries (lake DML
loops) execute their statement sequence during construction; the captured
plan is the final returned DataFrame's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q01_pricing_summary",
    "q02_daily_trades",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q13_broadcast_lookup",
    "q30_events_tumbling_window",
    "q32_events_sessionize",
    "q38_asof_join",
    "q41_doc_token_stats",
    "q44_exact_dedup",
    "q45_ngram_jaccard_neardup",
    "q50_cosine_topk",
    "q65_step_chain",
    "q79_training_data_pipeline",
    "q113_versioned_merge_diff",
    "q183_materialized_view_sql",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from datalakeingestionservice_spark.queries import QUERIES
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = QUERIES[name]
        try:
            df = q.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
