"""Concurrent-DML conflict matrix (Delta's conflict-matrix shape) for
the versioned table: which racing side REBASES and which gets
`ConcurrentCommitError`.

The model under test (pinned, not aspirational):

- APPEND rebases automatically (retry loop): it conflicts with nothing
  logically, so a concurrent commit of ANY kind just moves its parent.
- Snapshot-based DML (merge / delete_where / delete_where_deferred /
  compact / overwrite) is snapshot-isolated: it commits against exactly
  the version it read; any commit landing in between fails it with
  `ConcurrentCommitError` — even when the two ops touch DISJOINT scopes
  (conservative: scope-disjointness is provable only via the same stats
  that pruning uses, and a wrong "disjoint" verdict silently loses
  rows; Delta makes the same choice for logical conflicts it can't
  prove away). The loser re-runs against the new snapshot and wins.

Races are simulated deterministically by pinning `expected_version` (or
by interleaving the ops between read and commit), which exercises the
identical commit-protocol path a wall-clock race hits — the protocol
itself (exactly one winner per version slot) is separately fuzzed by
tests/test_versioned_fuzz.py's racing writers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConcurrentCommitError,
    VersionedTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "vt")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)],
        "id bigint, grp int, val string",
    )
    return VersionedTable.create(
        spark, root, df, partition_by=["grp"]
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "id bigint, grp int, val string")


def test_merge_vs_merge_overlapping_keys(spark, table):
    """Two merges computed against the same snapshot, touching the SAME
    key: first commit wins, second errors, rerun applies last-writer
    semantics on the new snapshot."""
    v0 = table.latest_version()
    table.merge(_upd(spark, [(7, 3, "first")]), ["id"])
    with pytest.raises(ConcurrentCommitError):
        table.merge(
            _upd(spark, [(7, 3, "second")]), ["id"], expected_version=v0
        )
    # Loser re-runs against the current snapshot and wins.
    table.merge(_upd(spark, [(7, 3, "second")]), ["id"])
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (7, "second") in got and (7, "first") not in got
    assert len(got) == 40


def test_merge_vs_merge_disjoint_scopes_still_conflicts(spark, table):
    """Disjoint key ranges (different partitions, provably non-adjacent
    stats) STILL conflict — the conservative documented choice. The
    rerun lands both updates."""
    v0 = table.latest_version()
    table.merge(_upd(spark, [(0, 0, "a")]), ["id"])
    with pytest.raises(ConcurrentCommitError):
        table.merge(
            _upd(spark, [(39, 3, "b")]), ["id"], expected_version=v0
        )
    table.merge(_upd(spark, [(39, 3, "b")]), ["id"])
    got = {(r.id, r.val) for r in table.read().collect()}
    assert {(0, "a"), (39, "b")} <= got and len(got) == 40


def test_merge_vs_compact(spark, table):
    """OPTIMIZE lands while a merge is in flight: the merge computed its
    rewrite plan against pre-compact entries that no longer exist in
    the new snapshot — it must error, never splice stale entries in."""
    v0 = table.latest_version()
    table.compact(num_partitions=1)
    with pytest.raises(ConcurrentCommitError):
        table.merge(
            _upd(spark, [(5, 1, "m")]), ["id"], expected_version=v0
        )
    table.merge(_upd(spark, [(5, 1, "m")]), ["id"])
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (5, "m") in got and len(got) == 40


def test_compact_vs_merge(spark, table):
    """The mirror race: merge lands first, the compact that planned
    against the old snapshot errors (its rewrite would RESURRECT the
    merged-away rows), and a fresh compact preserves the merge."""
    v0 = table.latest_version()
    pm = table.manifest(v0)
    table.merge(_upd(spark, [(6, 2, "merged")]), ["id"])
    # compact() re-reads latest internally, so simulate the stale plan
    # at the protocol layer: a commit against the superseded parent.
    with pytest.raises(ConcurrentCommitError):
        table._commit(
            operation="compact",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=v0,
            stats=dict(pm.stats),
        )
    table.compact(num_partitions=1)
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (6, "merged") in got and len(got) == 40


def test_deferred_delete_vs_merge(spark, table):
    """MoR delete lands first: the stale-pinned merge errors; the rerun
    merges against the MoR snapshot — deleted rows stay deleted unless
    the merge itself re-inserts their keys."""
    v0 = table.latest_version()
    table.delete_where_deferred("id >= 30")
    with pytest.raises(ConcurrentCommitError):
        table.merge(
            _upd(spark, [(10, 2, "x"), (35, 3, "back")]),
            ["id"],
            expected_version=v0,
        )
    table.merge(_upd(spark, [(10, 2, "x"), (35, 3, "back")]), ["id"])
    got = {(r.id, r.val) for r in table.read().collect()}
    ids = {g[0] for g in got}
    assert (10, "x") in got
    assert (35, "back") in got  # merge re-inserted this deleted key
    assert ids == set(range(30)) | {35}


def test_merge_vs_deferred_delete(spark, table):
    """Mirror: merge lands first; a deferred delete whose predicate was
    validated against the old snapshot errors at commit (its entry
    scope list is stale), and the rerun scopes to the new entries."""
    v0 = table.latest_version()
    pm = table.manifest(v0)
    table.merge(_upd(spark, [(3, 3, "m3")]), ["id"])
    with pytest.raises(ConcurrentCommitError):
        table._commit(
            operation="delete_deferred",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=v0,
            stats=dict(pm.stats),
            delete_predicates=(
                {"sql": "id = 0", "entries": list(pm.files)},
            ),
        )
    table.delete_where_deferred("id = 0")
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (3, "m3") in got and 0 not in {g[0] for g in got}
    assert len(got) == 39


def test_append_rebases_through_any_dml(spark, table):
    """APPEND never conflicts: interleave appends with merge, deferred
    delete, and compact — every append lands (rebase loop), and the
    final row set is the serial result."""
    table.merge(_upd(spark, [(1, 1, "m1")]), ["id"])
    table.append(_upd(spark, [(100, 0, "a100")]))
    table.delete_where_deferred("id = 2")
    table.append(_upd(spark, [(101, 1, "a101")]))
    table.compact(num_partitions=1)
    table.append(_upd(spark, [(102, 2, "a102")]))
    got = {(r.id, r.val) for r in table.read().collect()}
    ids = {g[0] for g in got}
    assert {100, 101, 102} <= ids and 2 not in ids
    assert (1, "m1") in got
    assert len(got) == 42  # 40 - 1 deleted + 3 appended


def test_protocol_exactly_one_winner_per_slot(spark, table):
    """Two commits race for the same version slot: exactly one wins,
    the loser sees ConcurrentCommitError and nothing half-lands."""
    v0 = table.latest_version()
    pm = table.manifest(v0)
    table._commit(
        operation="append",
        files=pm.files,
        schema_ddl=pm.schema_ddl,
        expected_parent=v0,
        stats=dict(pm.stats),
    )
    with pytest.raises(ConcurrentCommitError):
        table._commit(
            operation="append",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=v0,
            stats=dict(pm.stats),
        )
    assert table.latest_version() == v0 + 1


def test_update_vs_update_conflicts(spark, table):
    """Two UPDATEs computed against the same snapshot: first wins,
    second errors, rerun applies last-writer on the new snapshot."""
    v0 = table.latest_version()
    table.update_where([("id", "=", 7)], {"val": F.lit("first")})
    with pytest.raises(ConcurrentCommitError):
        table.update_where(
            [("id", "=", 7)], {"val": F.lit("second")},
            expected_version=v0,
        )
    table.update_where([("id", "=", 7)], {"val": F.lit("second")})
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (7, "second") in got and (7, "first") not in got
    assert len(got) == 40


def test_update_vs_merge_disjoint_scopes_still_conflicts(spark, table):
    """Conservative like merge-vs-merge: disjoint partitions still
    conflict; the rerun lands both."""
    v0 = table.latest_version()
    table.merge(_upd(spark, [(0, 0, "merged")]), ["id"])
    with pytest.raises(ConcurrentCommitError):
        table.update_where(
            [("grp", "=", 3)], {"val": F.lit("U")},
            expected_version=v0,
        )
    table.update_where([("grp", "=", 3)], {"val": F.lit("U")})
    got = {(r.id, r.val) for r in table.read().collect()}
    assert (0, "merged") in got
    assert all(v == "U" for i, v in got if i % 4 == 3)


def test_update_vs_compact(spark, table):
    """OPTIMIZE lands mid-update: the update's scoped plan referenced
    pre-compact entries — it must error, then succeed on rerun."""
    v0 = table.latest_version()
    table.compact(num_partitions=1)
    with pytest.raises(ConcurrentCommitError):
        table.update_where(
            [("id", "=", 5)], {"val": F.lit("u")},
            expected_version=v0,
        )
    table.update_where([("id", "=", 5)], {"val": F.lit("u")})
    assert (5, "u") in {
        (r.id, r.val) for r in table.read().collect()
    }
