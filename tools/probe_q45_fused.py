"""A/B: q45's exact shape (global-distinct posting list, max_shingle_freq=50,
threshold=0.5, persist=True, round+orderBy) with strategy join vs fused.

Usage: python tools/probe_q45_fused.py [sf_dir ...]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def q45_shape(spark, sf_dir: str, strategy: str):
    from datalakeingestionservice_spark.operators.dedup import (
        jaccard_pairs,
        word_shingles,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    shingles = word_shingles(
        docs.select("doc_id", "text"),
        "doc_id",
        "text",
        n=3,
        max_shingle_freq=50,
    )
    pairs = jaccard_pairs(
        shingles, id_col="doc_id", threshold=0.5, persist=True,
        strategy=strategy,
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for sf_dir in sf_dirs:
        ref = None
        for strategy in ("join", "fused", "join", "fused"):
            spark.sparkContext.setJobDescription(f"q45:{strategy}:{sf_dir}")
            t0 = time.perf_counter()
            out = q45_shape(spark, sf_dir, strategy)
            out.write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            rows = [tuple(r) for r in out.collect()]
            spark.catalog.clearCache()
            print(f"{sf_dir} {strategy}: {took:.3f}s rows={len(rows)}", flush=True)
            if ref is None:
                ref = rows
            else:
                assert rows == ref, f"{strategy} diverges"


if __name__ == "__main__":
    main()
