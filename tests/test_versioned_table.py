"""Versioned table format (sinks/versioned.py): atomic commits, time travel,
optimistic concurrency, copy-on-write DML, expire + vacuum."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConcurrentCommitError,
    NoSuchVersionError,
    VersionedTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def test_create_and_read(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    assert t.latest_version() == 1
    assert {r.id for r in t.read().collect()} == {1, 2}


def test_append_and_time_travel(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    assert t.latest_version() == 3
    assert t.read(version=1).count() == 1
    assert t.read(version=2).count() == 2
    assert {r.id for r in t.read().collect()} == {1, 2, 3}


def test_overwrite_keeps_old_snapshot_readable(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.overwrite(_df(spark, [(9, "z")]))
    assert {r.id for r in t.read().collect()} == {9}
    assert {r.id for r in t.read(version=1).collect()} == {1, 2}


def test_merge_upsert_and_delete(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id bigint, val string, is_delete boolean",
    )
    v = t.merge(updates, ["id"], delete_col="is_delete")
    assert v == 2
    got = {r.id: r.val for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 updated, 4 inserted
    # Parent snapshot untouched.
    assert {r.id for r in t.read(version=1).collect()} == {1, 2, 3}


def test_delete_where(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("id") == 1)
    assert {r.id for r in t.read().collect()} == {2}


def test_history_records_operations(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.overwrite(_df(spark, [(3, "c")]))
    ops = [r.operation for r in t.history().orderBy("version").collect()]
    assert ops == ["create", "append", "overwrite"]


def test_concurrent_commit_conflict_surfaces_on_overwrite(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    # A second handle to the same table commits first.
    other = VersionedTable(spark, root)
    other.append(_df(spark, [(2, "b")]))

    # Simulate stale overwrite: force the parent the writer believes in.
    data_dir = t._write_data(_df(spark, [(9, "z")]))
    with pytest.raises(ConcurrentCommitError):
        t._commit(
            operation="overwrite",
            files=(data_dir,),
            schema_ddl="",
            expected_parent=1,  # stale: version 2 already exists
        )


def test_append_auto_rebases_past_conflict(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    # Another writer lands version 2 between t's read and t's claim; append
    # re-reads the manifest chain and retries, so both rows survive.
    original_latest = t.latest_version

    calls = {"n": 0}

    def racy_latest():
        v = original_latest()
        if calls["n"] == 0:
            calls["n"] += 1
            VersionedTable(spark, root).append(_df(spark, [(2, "b")]))
        return v

    t.latest_version = racy_latest  # type: ignore[method-assign]
    t.append(_df(spark, [(3, "c")]))
    t.latest_version = original_latest  # type: ignore[method-assign]
    assert {r.id for r in t.read().collect()} == {1, 2, 3}
    assert t.latest_version() == 3


def test_vacuum_removes_orphans_keeps_referenced(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    # Orphan: data written but never committed (crashed writer).
    t._write_data(_df(spark, [(99, "x")]))
    removed = t.vacuum()
    assert len(removed) == 1
    assert {r.id for r in t.read().collect()} == {1, 2}
    assert t.read(version=1).count() == 1  # old snapshot intact


def test_expire_then_vacuum_drops_old_data(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.overwrite(_df(spark, [(2, "b")]))
    t.overwrite(_df(spark, [(3, "c")]))
    expired = t.expire_versions(keep_last=1)
    assert expired == [1, 2]
    removed = t.vacuum()
    assert len(removed) == 2  # v1 and v2 data gone, v3 alone remains
    assert {r.id for r in t.read().collect()} == {3}
    with pytest.raises(NoSuchVersionError):
        t.read(version=1)


def test_uncommitted_data_invisible_to_readers(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t._write_data(_df(spark, [(99, "x")]))  # written, not committed
    assert {r.id for r in t.read().collect()} == {1}


def test_open_non_table_raises(spark, tmp_path):
    with pytest.raises(NoSuchVersionError):
        VersionedTable(spark, str(tmp_path / "nope"))
