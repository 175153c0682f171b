"""Serving-latency-vs-index-size probe for the maintained indexes
(VERDICT r12 #1 'Done' evidence): at each sf dir, bootstrap the BM25
index twice — bucket(16, term) vs unpartitioned — and the IVF index
twice — cell-partitioned vs unpartitioned — then time the SERVING
calls (min-of-3 warm): a 3-term `rank()` and an n_probe=2 `topk()`.
Also records the plan-time scan/skip leaf counts, the real evidence
that pruned serving reads ~|terms|/buckets (resp. probed cells) of
the index instead of all of it.

Usage: python tools/probe_index_serving.py /tmp/sfscale/sf1 [...]
"""

from __future__ import annotations

import json
import os
import shutil
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
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _timeit(fn, n=3) -> float:
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )
    from datalakeingestionservice_spark.sinks.ivf_index import (
        IncrementalIVFIndex,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    out: dict = {}
    for sf_dir in sys.argv[1:]:
        spark = build_session()
        spark.sparkContext.setLogLevel("ERROR")
        base = os.path.join(
            tempfile.gettempdir(), f"idxserve_{uuid.uuid4().hex}"
        )
        res: dict = {}
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        src = VersionedTable.create(spark, os.path.join(base, "docs"), docs)
        terms = ["spark", "vector", "stream"]
        for label, buckets in (("bm25_bucketed", 16), ("bm25_flat", 0)):
            idx = IncrementalBM25Index(
                spark, src.root, os.path.join(base, label), buckets=buckets
            )
            idx.refresh()
            res[label] = {
                "rank_sec": _timeit(
                    lambda i=idx: i.rank(terms, top_k=20).collect()
                ),
                "prune": {
                    k: v
                    for k, v in idx.serving_prune_info(terms).items()
                    if k.startswith("n_")
                },
            }

        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", "embedding")
        esrc = VersionedTable.create(spark, os.path.join(base, "emb"), emb)
        centroids = (
            emb.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
            .localCheckpoint()
        )
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        ).localCheckpoint()
        for label, part in (("ivf_partitioned", True), ("ivf_flat", False)):
            root = os.path.join(base, label)
            idx = IncrementalIVFIndex(spark, esrc.root, root, centroids)
            if not part:
                # unpartitioned baseline: bootstrap by hand
                VersionedTable.create(
                    spark, root, idx._assign(esrc.read()),
                    summary={"source_version": esrc.latest_version()},
                )
            else:
                idx.refresh()
            res[label] = {
                "topk_sec": _timeit(
                    lambda i=idx: i.topk(q, k=10, n_probe=2).collect()
                ),
                "prune": {
                    k: v
                    for k, v in idx.serving_prune_info(q, 2).items()
                    if k.startswith("n_")
                },
            }
        out[sf_dir] = res
        print(sf_dir, json.dumps(res), flush=True)
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
