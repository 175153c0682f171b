"""writeStream.format("versioned") — the format-native streaming writer
(sources/versioned_batch.py VersionedTableStreamWriter): one version per
micro-batch, exactly-once via the shared `_streams/` marker + manifest
tag scan, sessionless commit, partitioned leaf layout."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.python_datasource import (
    register as register_events,
)
from conftest import _ab  # noqa: E402
from datalakeingestionservice_spark.sources.versioned_batch import (
    VersionedTableStreamWriter,
    register as register_versioned,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_events(spark)
    register_versioned(spark)


def _wait_for_versions(spark, root, n, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            t = VersionedTable(spark, root)
            if t.latest_version() >= n:
                return t
        except Exception:
            pass
        time.sleep(0.5)
    raise TimeoutError(f"table at {root} never reached version {n}")


def test_format_stream_writer_one_version_per_epoch(spark, tmp_path):
    root = str(tmp_path / "vt")
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 40)
        .load()
        .writeStream.format("versioned")
        .option("table_root", root)
        .option("stream_name", "w1")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _wait_for_versions(spark, root, 3)
    finally:
        q.stop()
    t = VersionedTable(spark, root)
    versions = t.versions()
    epochs = [m.summary.get("epoch") for m in versions]
    assert epochs == sorted(epochs) and len(set(epochs)) == len(epochs)
    assert all(m.summary.get("stream") == "w1" for m in versions)
    assert all(m.summary.get("staged") is True for m in versions)
    n_versions = len(versions)
    ids = sorted(
        r.event_id for r in t.read(version=n_versions).collect()
    )
    assert ids == list(range(n_versions * 40))


def _schema(ddl: str) -> StructType:
    return StructType.fromDDL(ddl)


def test_stream_commit_replay_is_noop(spark, tmp_path):
    """Unit-level exactly-once: the same epoch committed twice (crash
    replay) lands exactly one version, and the replayed staged file is
    cleaned up."""
    import os

    root = str(tmp_path / "vt")
    schema = _schema("id bigint, v string")
    w = VersionedTableStreamWriter({"table_root": root}, schema)
    m0 = w.write(_ab(schema, [(1, "a"), (2, "b")]))
    w.commit([m0], 0)  # creates the table
    m0r = w.write(_ab(schema, [(1, "a"), (2, "b")]))
    w.commit([m0r], 0)  # replay: no-op, staged file removed
    m1 = w.write(_ab(schema, [(3, "c")]))
    w.commit([m1], 1)
    t = VersionedTable(spark, root)
    assert t.latest_version() == 2
    assert sorted((r.id, r.v) for r in t.read().collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    staged = os.path.join(root, "_staging")
    leftovers = [
        f
        for d in (os.listdir(staged) if os.path.isdir(staged) else [])
        for f in os.listdir(os.path.join(staged, d))
    ]
    assert leftovers == []


def test_stream_replay_after_expiry_marker_protects(spark, tmp_path):
    root = str(tmp_path / "vt")
    schema = _schema("id bigint, v string")
    w = VersionedTableStreamWriter({"table_root": root}, schema)
    for epoch, row in enumerate([(1, "a"), (2, "b"), (3, "c")]):
        w.commit([w.write(_ab(schema, [row]))], epoch)
    t = VersionedTable(spark, root)
    t.expire_versions(keep_last=1)
    t.vacuum()
    # Replays of expired epochs: markers survive expiry, still no-ops.
    for epoch, row in enumerate([(1, "a"), (2, "b"), (3, "c")]):
        w.commit([w.write(_ab(schema, [row]))], epoch)
    assert sorted(
        (r.id, r.v) for r in VersionedTable(spark, root).read().collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    w.commit([w.write(_ab(schema, [(4, "d")]))], 3)  # new epoch still lands
    assert VersionedTable(spark, root).read().count() == 4


def test_stream_empty_batch_advances_marker_only(spark, tmp_path):
    root = str(tmp_path / "vt")
    schema = _schema("id bigint, v string")
    w = VersionedTableStreamWriter({"table_root": root}, schema)
    w.commit([w.write(_ab(schema, [(1, "a")]))], 0)
    v = VersionedTable(spark, root).latest_version()
    w.commit([w.write(_ab(schema, []))], 1)  # empty epoch: marker only
    assert VersionedTable(spark, root).latest_version() == v
    w.commit([w.write(_ab(schema, [(2, "b")]))], 2)
    t = VersionedTable(spark, root)
    assert t.latest_version() == v + 1
    assert t.read().count() == 2


def test_stream_writer_into_partitioned_table(spark, tmp_path):
    """Streaming appends preserve the hive leaf layout and dir-name
    pruning, same as the batch writer."""
    root = str(tmp_path / "vtp")
    VersionedTable.create(
        spark,
        root,
        spark.range(0, 8).select(
            "id", (F.col("id") % 2).cast("int").alias("grp")
        ),
        partition_by=["grp"],
    )
    schema = _schema("id bigint, grp int")
    w = VersionedTableStreamWriter({"table_root": root}, schema)
    w.commit([w.write(_ab(schema, [(100, 0), (101, 1)]))], 0)
    t = VersionedTable(spark, root)
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert got == {(i, i % 2) for i in range(8)} | {(100, 0), (101, 1)}
    info = t.prune_info([("grp", "=", 0)])
    assert info["n_skipped"] >= 2  # grp=1 leaves of both commits
    assert {
        r.id for r in t.read(predicates=[("grp", "=", 0)]).collect()
    } == {0, 2, 4, 6, 100}


def test_format_stream_restart_from_checkpoint_no_duplicates(
    spark, tmp_path
):
    root = str(tmp_path / "vtr")
    ckpt = str(tmp_path / "ckptr")

    def start():
        return (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 40)
            .load()
            .writeStream.format("versioned")
            .option("table_root", root)
            .option("stream_name", "wr")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q1 = start()
    try:
        _wait_for_versions(spark, root, 2)
    finally:
        q1.stop()
    v_before = VersionedTable(spark, root).latest_version()
    q2 = start()
    try:
        _wait_for_versions(spark, root, v_before + 2)
    finally:
        q2.stop()
    ids = [
        r.event_id for r in VersionedTable(spark, root).read().collect()
    ]
    assert len(ids) == len(set(ids)), "duplicate events after restart"
    assert sorted(ids) == list(range(len(ids))), "gap in resumed stream"
