"""Exactly-once streaming into the versioned table
(streaming/versioned_sink.py): one version per epoch, idempotent replay,
checkpoint restart without duplicates."""

from __future__ import annotations

import time

import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.python_datasource import register
from datalakeingestionservice_spark.streaming.versioned_sink import (
    make_versioned_batch_committer,
    start_versioned_append_stream,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _events_stream(spark, rows_per_batch=40):
    return (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", rows_per_batch)
        .load()
    )


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


def test_stream_commits_one_version_per_epoch(spark, tmp_path):
    root = str(tmp_path / "vt")
    q = start_versioned_append_stream(
        _events_stream(spark), root, str(tmp_path / "ckpt"), "s1"
    )
    try:
        t = _wait_for_versions(spark, root, 3)
    finally:
        q.stop()
    versions = VersionedTable(spark, root).versions()
    epochs = [m.summary.get("epoch") for m in versions]
    assert epochs == sorted(epochs)  # one version per epoch, in order
    assert len(set(epochs)) == len(epochs)
    # Contiguous rows, no gaps/dupes: batch k covers ids [40k, 40k+40).
    n_versions = len(versions)
    rows = VersionedTable(spark, root).read(version=n_versions).collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == list(range(n_versions * 40))


def test_committer_is_idempotent_per_epoch(spark, tmp_path):
    root = str(tmp_path / "vt")
    commit = make_versioned_batch_committer(root, "s1")
    batch = spark.createDataFrame([(1, "a")], "id bigint, v string")

    commit(batch, 0)  # creates the table
    commit(batch, 0)  # replay of epoch 0: must be a no-op
    commit(batch, 1)
    commit(batch, 1)  # replay of epoch 1: no-op
    t = VersionedTable(spark, root)
    assert t.latest_version() == 2
    assert t.read().count() == 2  # one row per distinct epoch


def test_replay_after_expiry_no_duplicates(spark, tmp_path):
    """Regression: replay protection scanned `versions()` for the
    (stream, epoch) tag, but `expire_versions()` deletes those manifests —
    a checkpoint replay after retention expiry re-appended a committed
    batch. The per-stream high-water marker in `_streams/` survives
    expiry and closes the window."""
    root = str(tmp_path / "vt")
    commit = make_versioned_batch_committer(root, "s1")
    b0 = spark.createDataFrame([(1, "a")], "id bigint, v string")
    b1 = spark.createDataFrame([(2, "b")], "id bigint, v string")
    b2 = spark.createDataFrame([(3, "c")], "id bigint, v string")
    commit(b0, 0)
    commit(b1, 1)
    commit(b2, 2)

    t = VersionedTable(spark, root)
    t.expire_versions(keep_last=1)  # drops the manifests carrying tags 0,1
    t.vacuum()

    # Crash-recovery replay of already-committed epochs: must be no-ops.
    commit(b0, 0)
    commit(b1, 1)
    commit(b2, 2)
    t = VersionedTable(spark, root)
    rows = t.read().collect()
    assert sorted((r.id, r.v) for r in rows) == [(1, "a"), (2, "b"), (3, "c")]
    # And a genuinely NEW epoch still commits.
    commit(spark.createDataFrame([(4, "d")], "id bigint, v string"), 3)
    assert VersionedTable(spark, root).read().count() == 4


def test_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    q1 = start_versioned_append_stream(
        _events_stream(spark), root, ckpt, "s1"
    )
    try:
        _wait_for_versions(spark, root, 2)
    finally:
        q1.stop()
    v_before = VersionedTable(spark, root).latest_version()

    # Restart from the same checkpoint: offsets resume, epochs continue.
    q2 = start_versioned_append_stream(
        _events_stream(spark), root, ckpt, "s1"
    )
    try:
        _wait_for_versions(spark, root, v_before + 2)
    finally:
        q2.stop()

    t = VersionedTable(spark, root)
    rows = t.read().collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate events after restart"
    assert sorted(ids) == list(range(len(ids))), "gap in resumed stream"


def test_epoch_index_bounds_replay_scan(spark, tmp_path, monkeypatch):
    """The high-water marker stores the VERSION its epoch produced; a
    replay check (crash between commit and marker write) then parses only
    manifests newer than that version — flat in the table's history, not
    O(versions) per micro-batch at high commit rates."""
    from datalakeingestionservice_spark.sinks.versioned import Manifest

    root = str(tmp_path / "vt")
    commit = make_versioned_batch_committer(root, "s1")
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    for e in range(12):
        commit(df, e)  # versions 1..12, marker (11, 12)

    # Crash window: epoch 12's append committed (v13) but the marker write
    # never happened.
    t = VersionedTable(spark, root)
    t.append(df, summary={"stream": "s1", "epoch": 12})

    orig = Manifest.from_json
    calls = {"n": 0}

    def counting(text):
        calls["n"] += 1
        return orig(text)

    monkeypatch.setattr(Manifest, "from_json", staticmethod(counting))
    commit(df, 12)  # checkpoint replay of the crashed epoch
    monkeypatch.undo()

    t = VersionedTable(spark, root)
    assert t.latest_version() == 13  # no duplicate version
    assert t.read().count() == 13
    # The replay parsed ONLY the manifests past the marker's version
    # (v13), not all 13.
    assert calls["n"] <= 2, calls["n"]
    from datalakeingestionservice_spark.streaming.versioned_sink import (
        _read_high_water,
    )

    assert _read_high_water(root, "s1") == (12, 13)  # marker healed


def test_legacy_epoch_only_marker_still_protects(spark, tmp_path):
    """Markers written before the version index carry only the epoch; they
    must keep exactly-once semantics (one full scan, then upgraded)."""
    import os

    from datalakeingestionservice_spark.streaming.versioned_sink import (
        _marker_path,
        _read_high_water,
    )

    root = str(tmp_path / "vt")
    commit = make_versioned_batch_committer(root, "s1")
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    commit(df, 0)
    commit(df, 1)
    # Downgrade the marker to the legacy single-int format.
    with open(_marker_path(root, "s1"), "w") as f:
        f.write("1")
    assert _read_high_water(root, "s1") == (1, 0)
    commit(df, 1)  # replay below the marker: no-op
    assert VersionedTable(spark, root).latest_version() == 2

    # Crash window under a legacy marker: epoch 2 committed, marker stale.
    VersionedTable(spark, root).append(
        df, summary={"stream": "s1", "epoch": 2}
    )
    with open(_marker_path(root, "s1"), "w") as f:
        f.write("1")
    commit(df, 2)  # full scan (version bound 0) finds the tag
    t = VersionedTable(spark, root)
    assert t.latest_version() == 3 and t.read().count() == 3
    assert _read_high_water(root, "s1") == (2, 3)  # upgraded format
    assert os.path.exists(_marker_path(root, "s1"))
