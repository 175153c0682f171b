"""VersionedTable.clone — shallow (hard-link) table cloning: zero data
copy, independent histories, everything the snapshot needs carried."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def test_clone_snapshot_parity_and_divergence(spark, tmp_path):
    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a"), (2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    c = t.clone(dst_root)
    assert c.manifest().summary["cloned_from"] == src_root
    assert c.manifest().summary["source_version"] == 2
    got = {(r.id, r.val) for r in c.read().collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # Diverge both sides; neither sees the other's commits.
    t.append(_df(spark, [(4, "src-only")]))
    c.append(_df(spark, [(5, "dst-only")]))
    assert {r.id for r in t.read().collect()} == {1, 2, 3, 4}
    assert {r.id for r in c.read().collect()} == {1, 2, 3, 5}


def test_clone_is_zero_copy_hard_links(spark, tmp_path):
    import glob

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a")]))
    t.clone(dst_root)
    src_files = sorted(
        glob.glob(os.path.join(src_root, "data", "*", "*.parquet"))
    )
    dst_files = sorted(
        glob.glob(os.path.join(dst_root, "data", "*", "*.parquet"))
    )
    assert src_files and len(src_files) == len(dst_files)
    # Same inodes: the bytes exist once.
    assert {os.stat(f).st_ino for f in src_files} == {
        os.stat(f).st_ino for f in dst_files
    }


def test_clone_survives_source_vacuum_and_deletion(spark, tmp_path):
    """vacuum/rm on the source unlink NAMES; the clone's links keep the
    inodes alive."""
    import shutil

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a"), (2, "b")]))
    c = t.clone(dst_root)
    t.overwrite(_df(spark, [(9, "z")]))
    t.expire_versions(keep_last=1)
    t.vacuum()  # reclaims the original data dir on the SOURCE
    assert {(r.id, r.val) for r in c.read().collect()} == {
        (1, "a"),
        (2, "b"),
    }
    shutil.rmtree(src_root)  # even deleting the source entirely
    assert c.read().count() == 2


def test_clone_carries_partitioning_blooms_and_stats(spark, tmp_path):
    src_root = str(tmp_path / "srcp")
    dst_root = str(tmp_path / "dstp")
    df = spark.range(0, 400).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    t = VersionedTable.create(
        spark, src_root, df, partition_by=["grp"], bloom_columns=["id"]
    )
    c = t.clone(dst_root)
    assert c.partition_by == ("grp",)
    assert c.manifest().bloom_columns == ("id",)
    # Dir-name pruning and per-leaf blooms work immediately on the clone.
    info = c.prune_info([("grp", "=", 1)])
    assert info["n_skipped"] == 3
    info = c.prune_info([("id", "=", 17)])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 3
    # And the clone keeps the hive layout on its own appends.
    c.append(
        spark.range(400, 404).select(
            "id", (F.col("id") % 4).cast("int").alias("grp")
        )
    )
    assert {r.id for r in c.read(predicates=[("grp", "=", 1)]).collect()} == {
        i for i in range(404) if i % 4 == 1
    }


def test_clone_carries_deferred_deletes_and_constraints(spark, tmp_path):
    src_root = str(tmp_path / "srcd")
    dst_root = str(tmp_path / "dstd")
    t = VersionedTable.create(
        spark,
        src_root,
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
        check_constraints={"id_positive": "id > 0"},
    )
    t.delete_where_deferred("id <= 1")
    c = t.clone(dst_root)
    # MoR semantics hold: predicate scoped to the cloned entries; a
    # later clone-side append is immune.
    assert {r.id for r in c.read().collect()} == {2, 3}
    c.append(_df(spark, [(1, "a2")]))
    assert {(r.id, r.val) for r in c.read().collect()} == {
        (2, "b"),
        (3, "c"),
        (1, "a2"),
    }
    # Constraints carried and enforced on the clone.
    with pytest.raises(Exception, match="id_positive"):
        c.append(_df(spark, [(-5, "bad")]))


def test_clone_of_time_travel_version(spark, tmp_path):
    src_root = str(tmp_path / "srct")
    dst_root = str(tmp_path / "dstt")
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    c = t.clone(dst_root, version=2)
    assert {r.id for r in c.read().collect()} == {1, 2}
    assert c.manifest().summary["source_version"] == 2


def test_clone_refuses_existing_table(spark, tmp_path):
    src_root = str(tmp_path / "srcx")
    dst_root = str(tmp_path / "dstx")
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a")]))
    t.clone(dst_root)
    with pytest.raises(ValueError, match="already a versioned table"):
        t.clone(dst_root)
