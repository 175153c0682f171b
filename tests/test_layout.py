"""Physical-layout guarantees: bucketed co-located joins, partition pruning,
honored parquet options — the plan-level evidence for the 100 TB design."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.bucketing import write_bucketed
from datalakeingestionservice_spark.sinks.parquet_sink import write_parquet


@pytest.fixture(scope="module")
def warehouse_spark(spark):
    """The shared session, with any leftover test tables fully removed.

    (A second build_session can't set its own warehouse dir — getOrCreate
    returns the existing singleton — so clean the default warehouse instead:
    drop the catalog entries AND their directories; a location surviving
    without its catalog entry fails saveAsTable with LOCATION_ALREADY_EXISTS.)
    """
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for table in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    yield spark


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(warehouse_spark, sf_dir):
    spark = warehouse_spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )

    # Disable auto-broadcast so the fact-fact join shape (the 100 TB case,
    # where neither side broadcasts) is what gets planned:
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        joined.collect()
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # Co-located: a real join of two facts, with no shuffle of either side.
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # Same result as the unbucketed join:
    plain = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_partitioned_write_prunes(warehouse_spark, sf_dir, tmp_path):
    spark = warehouse_spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    result = write_parquet(orders, out, partition_by=["order_year"])
    assert result.rows == orders.count()
    # Hive-style directories exist:
    years = [d for d in os.listdir(out) if d.startswith("order_year=")]
    assert len(years) > 3

    read = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = _executed_plan(read)
    assert "PartitionFilters: [isnotnull(order_year" in plan
    # Only the matching partition's files are scanned:
    assert read.count() == orders.filter(F.col("order_year") == 1997).count()


def test_parquet_options_honored(warehouse_spark, sf_dir, tmp_path):
    """The reference declares compressionCodec/rowGroupSize and ignores them
    (ParquetWriterService.cs:42-44); we honor them — verify on disk."""
    import pyarrow.parquet as pq

    spark = warehouse_spark
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "zstd_out")
    write_parquet(df, out, compression="zstd", single_file=True)
    part = glob.glob(f"{out}/*.parquet")[0]
    meta = pq.ParquetFile(part).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"

    with pytest.raises(ValueError, match="Unsupported compression"):
        write_parquet(df, str(tmp_path / "bad"), compression="brotli2")
