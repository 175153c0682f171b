"""Bucketed + partitioned table layout (the co-located-join scale path).

At 100 TB the dominant cost of fact-fact joins is the shuffle. Bucketing both
facts by the join key at write time moves that shuffle to ingestion (once),
after which every join/aggregation on the bucket key is exchange-free.
`write_bucketed` + a join proven shuffle-free in tests is the engine's answer
to "is there a shuffle here that becomes the bottleneck at scale?".

Partitioned layout (`partition_by`) is the orthogonal axis: coarse
(low-cardinality, time/date) columns become directories so predicates prune
whole files before any I/O (verified via PartitionFilters in the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist `df` as a bucketed (optionally sorted-within-bucket,
    optionally partitioned) catalog table.

    - `bucket_cols`: the join/aggregation key(s) to co-locate on.
    - `sort_cols`: sorting within buckets additionally removes the sort from
      sort-merge joins (and enables range skipping in parquet row groups).
    - `n_buckets`: choose so each bucket's data per partition fits an executor
      task comfortably (~100-500 MB at scale).
    """
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
