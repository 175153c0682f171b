"""Randomized Spark-vs-DuckDB agreement (small in-suite sweep; bigger sweeps
via `python tools/fuzz_correctness.py N SEED`)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_correctness import run_fuzz  # noqa: E402


def test_fuzzed_queries_agree_with_duckdb(spark, sf_dir):
    failures = run_fuzz(n_cases=40, seed=1234, sf_dir=sf_dir, spark=spark,
                        verbose=False)
    assert failures == [], failures[:3]
