"""Small-file compaction — lake-table maintenance.

Micro-batch ingestion (the reference's per-cron-fire file, our streaming
foreachBatch commits) accretes small files; scan efficiency at 100 TB needs
~128 MB-1 GB objects. `compact` rewrites a directory into size-targeted files
with the same atomic swap discipline as the upsert operator.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite the parquet directory at `path` into ceil(size/target) files.

    Returns {"files_before", "files_after", "bytes", "compacted"}. No-op (and
    no rewrite cost) when the directory already has fewer than
    `min_files_to_compact` files or is empty.
    """
    files = [
        os.path.join(root, f)
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    if len(files) < min_files_to_compact:
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total_bytes,
            "compacted": False,
        }

    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    staging = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    # repartition (not coalesce): coalesce(1) would also collapse the
    # PARALLELISM of the read; repartition keeps the rewrite distributed.
    df.repartition(n_out).write.mode("overwrite").parquet(staging)

    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.replace(path, backup)
    try:
        os.replace(staging, path)
    except OSError:
        os.replace(backup, path)
        raise
    shutil.rmtree(backup)

    files_after = [
        f
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(files),
        "files_after": len(files_after),
        "bytes": total_bytes,
        "compacted": True,
    }
