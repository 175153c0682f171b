"""Copy-on-write merge/upsert semantics on plain parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.upsert import merge_upsert


def _write_target(spark, path):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["id", "name", "score"],
    ).write.mode("overwrite").parquet(path)


def test_merge_updates_inserts_deletes(spark, tmp_path):
    path = str(tmp_path / "target")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [
            (2, "B2", 21.0, False),   # update
            (5, "e", 50.0, False),    # insert
            (3, None, 0.0, True),     # delete
        ],
        ["id", "name", "score", "is_deleted"],
    )
    stats = merge_upsert(
        spark, path, updates, key_cols=["id"], delete_col="is_deleted"
    )
    assert stats == {
        "before": 4, "updated": 1, "deleted": 1, "inserted": 1, "after": 4,
    }
    rows = {r.id: (r.name, r.score) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 10.0), 2: ("B2", 21.0), 4: ("d", 40.0), 5: ("e", 50.0)}


def test_merge_is_idempotent_for_pure_upserts(spark, tmp_path):
    path = str(tmp_path / "target")
    _write_target(spark, path)
    updates = spark.createDataFrame([(2, "B", 99.0)], ["id", "name", "score"])
    merge_upsert(spark, path, updates, key_cols=["id"])
    merge_upsert(spark, path, updates, key_cols=["id"])  # re-apply
    rows = {r.id: r.score for r in spark.read.parquet(path).collect()}
    assert rows[2] == 99.0 and len(rows) == 4


def test_merge_partition_filter_scopes_rewrite(spark, tmp_path):
    path = str(tmp_path / "target")
    _write_target(spark, path)
    updates = spark.createDataFrame([(1, "A!", 11.0)], ["id", "name", "score"])
    stats = merge_upsert(
        spark, path, updates, key_cols=["id"],
        partition_filter=F.col("id") <= 2,
    )
    assert stats["after"] == 4
    rows = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert rows[1] == "A!" and rows[3] == "c" and rows[4] == "d"


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from datalakeingestionservice_spark.operators.compaction import compact

    path = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(20).write.parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    stats = compact(spark, path, target_file_bytes=10**9)  # everything -> 1 file
    assert stats["compacted"] and stats["files_before"] == 20
    assert stats["files_after"] == 1
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert {r.id for r in after.collect()} == set(range(10_000))

    # Idempotent no-op below the threshold:
    stats2 = compact(spark, path, target_file_bytes=10**9)
    assert not stats2["compacted"] and stats2["files_after"] == 1
