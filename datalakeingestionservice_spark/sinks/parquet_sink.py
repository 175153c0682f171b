"""Parquet sink (SURVEY.md A11) — config-honoring, distributed, single-pass.

The reference declares `compressionCodec` / `rowGroupSize` / `enableStatistics`
config but hardcodes Snappy and one giant row group
(`ParquetWriterService.cs:42-44`); this writer honors them. Row count is
captured with the Observation API during the same write action — no second
scan of the data (the reference counts rows from its in-memory table, which
costs it full materialization instead).

Null semantics: Spark-native nulls end to end. The reference's silent
DBNull -> 0/false/MinValue coercion (`ParquetWriterService.cs:183-263`) is an
intentionally-dropped defect; see SURVEY.md section 1.2.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_CODECS = {
    "snappy": "snappy",
    "gzip": "gzip",
    "zstd": "zstd",
    "lz4": "lz4",
    "uncompressed": "uncompressed",
    "none": "uncompressed",
}


@dataclass
class WriteResult:
    path: str
    rows: int
    files: list[str]
    total_bytes: int


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "Snappy",
    row_group_size: int | None = None,
    enable_statistics: bool = True,
    single_file: bool = False,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> WriteResult:
    """Write `df` to `path`, returning commit metadata for the CTL stage.

    `single_file=True` gives the reference's one-file-per-run layout
    (`coalesce(1)` — correct only for small curated outputs; the default is
    many part-files sized by upstream partitioning). `partition_by` enables
    hive-style partition pruning for downstream readers at scale.
    """
    codec = _CODECS.get(compression.lower())
    if codec is None:
        raise ValueError(
            f"Unsupported compression codec {compression!r}; one of {sorted(_CODECS)}"
        )

    observation = Observation("write_metrics")
    observed = df.observe(observation, F.count(F.lit(1)).alias("rows"))
    if single_file:
        observed = observed.coalesce(1)

    writer = observed.write.mode(mode).option("compression", codec)
    if row_group_size is not None:
        # Spark's parquet block size is bytes; the reference's rowGroupSize is
        # rows. Honor intent: cap rows per row group via the writer's
        # row-group row limit (parquet.block.size stays default).
        writer = writer.option("parquet.page.row.count.limit", str(row_group_size))
        writer = writer.option(
            "parquet.block.row.count.limit", str(row_group_size)
        )
    if not enable_statistics:
        writer = writer.option("parquet.statistics.enabled", "false")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    rows = int(observation.get["rows"])
    if "://" in path:
        listed = _hadoop_list_parquet(df.sparkSession, path)
        files = sorted(p for p, _ in listed)
        total_bytes = sum(size for _, size in listed)
    else:
        files = sorted(
            f
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        )
        total_bytes = sum(os.path.getsize(f) for f in files)
    return WriteResult(path=path, rows=rows, files=files, total_bytes=total_bytes)


def _hadoop_list_parquet(spark, directory: str) -> list[tuple[str, int]]:
    """Recursive (path, size) listing of *.parquet under a Hadoop FS URI —
    the remote twin of the local glob (works for abfss/s3a/hdfs/file)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(directory)
    fs = root.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        if p.endswith(".parquet"):
            out.append((p, int(status.getLen())))
    return out
