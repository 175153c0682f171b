"""COLD-CACHE serving probe (VERDICT r13 #6): the r13 serving-prune
probe pinned files/bytes ∝ probed share with the RATIO flat across
decades, but warm wall-clock stayed ~flat because the toy-scale flat
scan is page-cached — the IO win never showed up in seconds. This
probe drops the OS page cache (sync + /proc/sys/vm/drop_caches)
immediately before ONE timed serving call, after a warm-up run has
JIT-compiled the query path, so the measured difference is the real
IO: a bucketed index reads ~|terms|/buckets of the postings bytes
from disk, the flat index reads all of them.

Usage: python tools/probe_index_serving_cold.py /tmp/sfscale/sf10
(requires root for drop_caches; refuses otherwise)."""

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


def drop_caches() -> None:
    os.sync()
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")


def _java_read_bytes() -> int:
    """Sum of storage-accounted read_bytes across every JVM on the
    box (the pyspark driver+executors share one) — counts ONLY reads
    that actually hit the device, which is exactly the cold-IO
    question page-cached wall-clock can't answer at toy scale."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/io") as f:
                for line in f:
                    if line.startswith("read_bytes:"):
                        total += int(line.split()[1])
        except OSError:
            continue
    return total


def cold_time(fn) -> tuple[float, int]:
    fn()  # warm: JIT + plan caches, NOT the measurement
    drop_caches()
    rb0 = _java_read_bytes()
    t0 = time.monotonic()
    fn()
    dt = round(time.monotonic() - t0, 3)
    return dt, _java_read_bytes() - rb0


def main() -> None:
    if not os.access("/proc/sys/vm/drop_caches", os.W_OK):
        raise SystemExit("needs root (drop_caches not writable)")

    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf10"
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(
        tempfile.gettempdir(), f"idxcold_{uuid.uuid4().hex}"
    )
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        src = VersionedTable.create(
            spark, os.path.join(base, "docs"), docs
        )
        terms = ["spark", "vector", "stream"]
        res: dict = {"sf_dir": sf_dir, "n_docs": docs.count()}
        for label, buckets in (("bm25_bucketed", 16), ("bm25_flat", 0)):
            idx = IncrementalBM25Index(
                spark, src.root, os.path.join(base, label), buckets=buckets
            )
            idx.refresh()
            info = idx.serving_prune_info(terms)
            sec, rb = cold_time(
                lambda i=idx: i.rank(terms, top_k=20).collect()
            )
            res[label] = {
                "cold_rank_sec": sec,
                "cold_disk_read_bytes": rb,
                "prune": {
                    k: v for k, v in info.items() if k.startswith("n_")
                },
            }
        print(json.dumps(res))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
