"""Copy-on-write upsert/merge for plain-parquet lake tables (SURVEY.md B6).

The reference's raw-SQL detector admits INSERT/UPDATE/DELETE batches
(`SqlServerDataSource.cs:83-90`) — DML it delegates to the RDBMS. A lake
engine without a table format (no Delta/Iceberg jars in this environment)
expresses DML as copy-on-write: read target, apply the merge relationally,
rewrite atomically (staging + rename, same publish discipline as the
ingestion sink).

Semantics (MERGE classic):
- key matches an update row  -> updated columns win (whole-row replace)
- delete=True update rows    -> row removed
- unmatched update rows      -> inserted
- everything else            -> carried over unchanged

At real scale the rewrite cost is bounded by partitioning: partition the
table so updates touch few partitions and rewrite only those (the
`partition_pruning` parameter); table formats buy row-group-level granularity
on top of the same logic.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    partition_filter: Column | None = None,
) -> dict:
    """MERGE `updates` into the parquet table at `target_path`, atomically.

    Returns counts: {"before", "updated", "deleted", "inserted", "after"}.
    `partition_filter` restricts the rewrite to matching rows — rows outside
    the filter are guaranteed untouched and are carried over by reference
    (at scale: only rewrite affected partitions).
    """
    target = spark.read.parquet(target_path)

    if delete_col and delete_col in updates.columns:
        deletes = updates.filter(F.col(delete_col) == True)  # noqa: E712
        upserts = updates.filter(
            (F.col(delete_col).isNull()) | (F.col(delete_col) == False)  # noqa: E712
        ).drop(delete_col)
        deletes = deletes.drop(delete_col)
    else:
        deletes = None
        upserts = updates

    scope = target.filter(partition_filter) if partition_filter is not None else target
    out_of_scope = (
        target.filter(~partition_filter) if partition_filter is not None else None
    )

    keys = [F.col(c) for c in key_cols]
    matched = scope.join(upserts.select(*key_cols), key_cols, "left_semi")
    kept = scope.join(upserts.select(*key_cols), key_cols, "left_anti")
    if deletes is not None:
        kept = kept.join(deletes.select(*key_cols), key_cols, "left_anti")
        n_deleted = scope.join(
            deletes.select(*key_cols), key_cols, "left_semi"
        ).count()
    else:
        n_deleted = 0

    n_before = target.count()
    n_updated = matched.count()
    inserted = upserts.join(scope.select(*key_cols), key_cols, "left_anti")
    n_inserted = inserted.count()

    merged = kept.unionByName(upserts.select(*scope.columns))
    if out_of_scope is not None:
        merged = merged.unionByName(out_of_scope)

    # Copy-on-write commit: write beside, swap atomically, drop the old copy.
    staging = f"{target_path}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{target_path}.__old_{uuid.uuid4().hex[:8]}"
    os.replace(target_path, backup)
    try:
        os.replace(staging, target_path)
    except OSError:
        os.replace(backup, target_path)  # roll back
        raise
    shutil.rmtree(backup)

    n_after = spark.read.parquet(target_path).count()
    return {
        "before": n_before,
        "updated": n_updated,
        "deleted": n_deleted,
        "inserted": n_inserted,
        "after": n_after,
    }
