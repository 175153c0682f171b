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
    entries = t._write_data_entries(_df(spark, [(9, "z")]), ())
    with pytest.raises(ConcurrentCommitError):
        t._commit(
            operation="overwrite",
            files=tuple(entries),
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
    t._write_data_entries(_df(spark, [(99, "x")]), ())
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
    # v1+v2 data dirs AND v2's materialized change dir go; v3 (data + its
    # change dir) alone remains referenced.
    assert len(removed) == 3
    assert {r.id for r in t.read().collect()} == {3}
    with pytest.raises(NoSuchVersionError):
        t.read(version=1)


def test_uncommitted_data_invisible_to_readers(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t._write_data_entries(_df(spark, [(99, "x")]), ())  # not committed
    assert {r.id for r in t.read().collect()} == {1}


def test_open_non_table_raises(spark, tmp_path):
    with pytest.raises(NoSuchVersionError):
        VersionedTable(spark, str(tmp_path / "nope"))


# -- data-skipping stats ----------------------------------------------------


def _ranged(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.lit(tag).alias("val"),
        (F.col("id") * 1.5).alias("score"),
    )


@pytest.fixture()
def banded(spark, root):
    """Three appends with disjoint id bands: [0,10), [10,20), [20,30)."""
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 10, "lo"))
    t.append(_ranged(spark, 10, 20, "mid"))
    t.append(_ranged(spark, 20, 30, "hi"))
    return t


def test_manifest_records_footer_stats(spark, banded):
    m = banded.manifest()
    assert len(m.stats) == 3
    for rel in m.files:
        cols = m.stats[rel]["columns"]
        assert cols["id"]["nulls"] == 0
        assert cols["id"]["max"] - cols["id"]["min"] == 9
        assert m.stats[rel]["rows"] == 10


def test_pruned_read_equals_filter(spark, banded):
    for preds in (
        [("id", ">=", 20)],
        [("id", "<", 10)],
        [("id", "=", 15)],
        [("id", ">", 5), ("id", "<=", 12)],
        [("score", ">=", 30.0)],
        [("val", "=", "mid")],
    ):
        from datalakeingestionservice_spark.sinks.versioned import (
            _predicates_to_column,
        )

        expect = sorted(
            r.id for r in banded.read().filter(
                _predicates_to_column(preds)
            ).collect()
        )
        got = sorted(r.id for r in banded.read(predicates=preds).collect())
        assert got == expect, preds


def test_prune_info_counts(spark, banded):
    info = banded.prune_info([("id", ">=", 20)])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    info = banded.prune_info([("id", "=", 15)])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    info = banded.prune_info([("val", "=", "mid")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    # Contradictory conjunction proves every dir empty.
    info = banded.prune_info([("id", ">", 100)])
    assert info["n_scanned"] == 0 and info["n_skipped"] == 3


def test_all_pruned_returns_empty_with_schema(spark, banded):
    df = banded.read(predicates=[("id", ">", 100)])
    assert df.count() == 0
    assert df.columns == ["id", "val", "score"]


def test_all_null_dir_is_pruned(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a")], "id bigint, v string"),
    )
    t.append(
        spark.createDataFrame([(None, "x"), (None, "y")], "id bigint, v string")
    )
    # No comparison predicate matches NULL, so the all-null dir is skipped.
    info = t.prune_info([("id", ">=", 0)])
    assert info["n_skipped"] == 1
    assert [r.id for r in t.read(predicates=[("id", ">=", 0)]).collect()] == [1]


def test_timestamp_pruning(spark, root):
    import datetime as dt

    def day(d):
        return spark.createDataFrame(
            [(d, dt.datetime(2024, 1, d, 12, 0))], "id int, ts timestamp"
        )

    t = VersionedTable.create(spark, root, day(1))
    t.append(day(2))
    t.append(day(3))
    preds = [("ts", ">=", dt.datetime(2024, 1, 3))]
    assert t.prune_info(preds)["n_skipped"] == 2
    assert [r.id for r in t.read(predicates=preds).collect()] == [3]


def test_date_boundary_pruning_keeps_boundary_day(spark, root):
    """DATE footer stats vs datetime predicate at the exact boundary.

    Regression: `_dir_may_match` compared ISO strings of mixed granularity
    ('1998-12-01' vs '1998-12-01T00:00:00'), pruning the dir whose
    min==max equals the predicate's date — every row of that day silently
    lost on the most common lake predicate ("everything since day X")."""
    import datetime as dt

    def day(d):
        return spark.createDataFrame(
            [(d, dt.date(1998, 12, d))], "id int, d date"
        )

    t = VersionedTable.create(spark, root, day(1))
    t.append(day(2))
    t.append(day(3))
    # datetime predicate at midnight of the stored date: boundary dir must
    # be KEPT (date promotes to its midnight instant).
    preds = [("d", ">=", dt.datetime(1998, 12, 1))]
    assert t.prune_info(preds)["n_skipped"] == 0
    assert sorted(r.id for r in t.read(predicates=preds).collect()) == [1, 2, 3]
    # And pruning still engages when provably out of range.
    preds = [("d", ">", dt.datetime(1998, 12, 2, 0, 0, 1))]
    assert t.prune_info(preds)["n_skipped"] == 2
    assert [r.id for r in t.read(predicates=preds).collect()] == [3]
    # date-typed predicate on the same boundary.
    preds = [("d", "=", dt.date(1998, 12, 2))]
    assert sorted(r.id for r in t.read(predicates=preds).collect()) == [2]


def test_file_level_pruning_survives_compact(spark, banded):
    """`compact()` merges many dirs into ONE dir; without per-file stats
    that coarsened pruning to the whole-dir envelope. The manifest's
    per-file map keeps skipping tight: a z-ordered compact writes files
    with disjoint id ranges, and a selective predicate must skip files
    inside the surviving dir — and produce identical rows."""
    banded.compact(num_partitions=3, zorder_by=["id"])
    preds = [("id", ">=", 20)]
    info = banded.prune_info(preds)
    assert info["n_scanned"] == 1  # single compacted dir survives…
    assert info["n_files_skipped"] >= 1  # …but files inside it are skipped
    assert info["n_files_scanned"] >= 1
    got = sorted(r.id for r in banded.read(predicates=preds).collect())
    assert got == list(range(20, 30))
    # File pruning can prove a dir empty even when its envelope matches:
    # [0,10) and [20,30) files both refute id=15 while the dir spans 0-29.
    preds = [("id", "=", 15)]
    got = sorted(r.id for r in banded.read(predicates=preds).collect())
    assert got == [15]


def test_unknown_column_predicate_keeps_all_dirs(spark, banded):
    # A column with no stats can never prove absence — nothing is pruned.
    info = banded.prune_info([("nope", ">=", 0)])
    assert info["n_skipped"] == 0


def test_merge_refreshes_stats(spark, banded):
    # Key 100 is outside every band [0,30): stats-scoped merge proves no
    # dir can match, carries all three untouched, and writes ONE new dir
    # holding just the insert — stats entries for all four.
    banded.merge(
        spark.createDataFrame(
            [(100, "new", 1.0)], "id bigint, val string, score double"
        ),
        ["id"],
    )
    m = banded.manifest()
    assert len(m.stats) == 4
    assert m.summary["n_dirs_untouched"] == 3
    assert {r.id for r in banded.read().collect()} == set(range(30)) | {100}


def test_scoped_merge_rewrites_only_matching_dirs(spark, banded):
    """Stats-scoped MERGE: updating keys inside one band rewrites that
    band's dir only; the other two ride into the new version untouched
    (same physical dirs), and results equal an unscoped merge."""
    m_before = banded.manifest()
    updates = spark.createDataFrame(
        [(12, "UPDATED", 0.0), (15, "UPDATED", 0.0)],
        "id bigint, val string, score double",
    )
    banded.merge(updates, ["id"])
    m = banded.manifest()
    assert m.summary["n_dirs_untouched"] == 2
    untouched = set(m.files) & set(m_before.files)
    assert len(untouched) == 2  # the [0,10) and [20,30) dirs survive
    got = {(r.id, r.val) for r in banded.read().collect()}
    assert got == (
        {(i, "lo") for i in range(10)}
        | {(i, "mid") for i in range(10, 20) if i not in (12, 15)}
        | {(12, "UPDATED"), (15, "UPDATED")}
        | {(i, "hi") for i in range(20, 30)}
    )
    # Change feed reflects only the touched rows.
    feed = banded.changes(m_before.version, m.version).collect()
    assert {(r.id, r._change_type) for r in feed} == {
        (12, "delete"), (15, "delete"), (12, "insert"), (15, "insert"),
    }
    # Unscoped merge on a fresh handle must give identical content.
    got2 = {(r.id, r.val) for r in banded.read().collect()}
    assert got2 == got


# -- change feed ------------------------------------------------------------


def test_changes_append_fast_path(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b"), (3, "c")]))
    rows = t.changes(1).collect()
    assert {(r.id, r._change_type, r._commit_version) for r in rows} == {
        (2, "insert", 2),
        (3, "insert", 2),
    }


def test_changes_merge_emits_delete_insert_pair(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.merge(_df(spark, [(2, "B"), (9, "z")]), ["id"])
    rows = t.changes(1).collect()
    got = {(r.id, r.val, r._change_type) for r in rows}
    # Update of 2 = delete old + insert new; 9 is a plain insert.
    assert got == {
        (2, "b", "delete"),
        (2, "B", "insert"),
        (9, "z", "insert"),
    }
    assert all(r._commit_version == 2 for r in rows)


def test_changes_delete_where(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("id") == 1)
    rows = t.changes(1).collect()
    assert {(r.id, r._change_type) for r in rows} == {(1, "delete")}


def test_changes_spanning_multiple_versions(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.delete_where(F.col("id") == 1)
    rows = t.changes(1, 3).collect()
    assert {(r.id, r._change_type, r._commit_version) for r in rows} == {
        (2, "insert", 2),
        (1, "delete", 3),
    }
    # Partial ranges slice the same feed.
    assert {r.id for r in t.changes(2, 3).collect()} == {1}


def test_changes_empty_range_keeps_schema(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    df = t.changes(1, 1)
    assert df.count() == 0
    assert df.columns == ["id", "val", "_change_type", "_commit_version"]


def test_changes_rejects_version_zero(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    with pytest.raises(NoSuchVersionError):
        t.changes(0)


# -- schema enforcement + evolution ----------------------------------------


def test_append_schema_mismatch_raises(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        SchemaMismatchError,
    )

    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    with pytest.raises(SchemaMismatchError):
        t.append(spark.createDataFrame([(2, "b", 1.0)],
                                       "id bigint, val string, x double"))
    with pytest.raises(SchemaMismatchError):  # missing column, no evolve
        t.append(spark.createDataFrame([(2,)], "id bigint"))


def test_append_type_conflict_raises_even_with_merge(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        SchemaMismatchError,
    )

    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    with pytest.raises(SchemaMismatchError):
        t.append(
            spark.createDataFrame([(2, 3)], "id bigint, val bigint"),
            merge_schema=True,
        )


def test_merge_schema_evolves_and_old_rows_read_null(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(
        spark.createDataFrame(
            [(2, "b", 9.5)], "id bigint, val string, score double"
        ),
        merge_schema=True,
    )
    got = {(r.id, r.val, r.score) for r in t.read().collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
    assert "score" in t.manifest().schema_ddl
    # Evolution survives later same-schema appends (flag propagates).
    t.append(
        spark.createDataFrame(
            [(3, "c", 1.0)], "id bigint, val string, score double"
        ),
        merge_schema=True,
    )
    assert t.read().count() == 3


def test_subset_schema_append_keeps_missing_column(spark, root):
    """Regression: a merge_schema append MISSING a table column left
    `schema_evolved` unset, so `read()` skipped mergeSchema and could
    adopt the narrow file's schema — silently dropping the column for
    every row in the table."""
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(spark.createDataFrame([(2,)], "id bigint"), merge_schema=True)
    assert t.manifest().summary.get("schema_evolved") is True
    got = {(r.id, r.val) for r in t.read().collect()}
    assert got == {(1, "a"), (2, None)}
    assert t.read().columns == ["id", "val"]


def test_rebase_preserves_concurrent_schema_evolution(spark, root):
    """Regression: the evolved DDL was computed once BEFORE the
    optimistic-retry loop, so an append rebasing past a concurrent
    winner's schema evolution committed a DDL without the winner's new
    column — regressing the table schema."""
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    original_latest = t.latest_version
    calls = {"n": 0}

    def racy_latest():
        v = original_latest()
        if calls["n"] == 0:
            calls["n"] += 1
            # Concurrent winner evolves the schema with column `d`.
            VersionedTable(spark, root).append(
                spark.createDataFrame(
                    [(2, "b", 7.0)], "id bigint, val string, d double"
                ),
                merge_schema=True,
            )
        return v

    t.latest_version = racy_latest  # type: ignore[method-assign]
    # Loser evolves with a DIFFERENT column `c`; rebase must keep both.
    t.append(
        spark.createDataFrame([(3, "c", 11)], "id bigint, val string, c int"),
        merge_schema=True,
    )
    t.latest_version = original_latest  # type: ignore[method-assign]
    ddl = t.manifest().schema_ddl
    assert "d:" in ddl and "c:" in ddl, ddl
    got = {(r.id, r.val, r.d, r.c) for r in t.read().collect()}
    assert got == {
        (1, "a", None, None),
        (2, "b", 7.0, None),
        (3, "c", None, 11),
    }


# -- compaction (OPTIMIZE) --------------------------------------------------


def test_compact_preserves_rows_and_shrinks_dirs(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    for i in range(2, 6):
        t.append(_df(spark, [(i, chr(96 + i))]))
    assert len(t.manifest().files) == 5
    v = t.compact()
    assert t.manifest(v).operation == "compact"
    assert len(t.manifest(v).files) == 1
    assert {r.id for r in t.read().collect()} == {1, 2, 3, 4, 5}
    # Old snapshot still readable (time travel across compaction).
    assert t.read(version=v - 1).count() == 5
    # Data-preserving: the change feed across a compact diffs to empty.
    assert t.changes(v - 1, v).count() == 0


def test_compact_zorder_clusters_files(spark, root):
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
    )
    t = VersionedTable.create(spark, root, grid)
    v = t.compact(num_partitions=4, zorder_by=["x", "y"], bits=5)
    assert t.read(version=v).count() == 1024
    assert t.read(version=v).columns == ["x", "y"]  # __z dropped


def test_compact_resolves_evolved_schema(spark, root):
    """After evolution, compact rewrites every row under the merged schema
    — the mergeSchema read flag is no longer needed and resets."""
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(
        spark.createDataFrame(
            [(2, "b", 1.5)], "id bigint, val string, score double"
        ),
        merge_schema=True,
    )
    assert t.manifest().summary.get("schema_evolved")
    v = t.compact()
    assert not t.manifest(v).summary.get("schema_evolved")
    got = {(r.id, r.score) for r in t.read().collect()}
    assert got == {(1, None), (2, 1.5)}


def test_scoped_merge_nan_key_disables_scoping(spark, root):
    """A NaN in a float merge key poisons every stats comparison; scoping
    must stand down (full rewrite) instead of silently skipping matches."""
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1.0, "a"), (2.0, "b")], "k double, val string"
        ),
    )
    t.append(spark.createDataFrame([(3.0, "c")], "k double, val string"))
    updates = spark.createDataFrame(
        [(1.0, "UPDATED"), (float("nan"), "nanrow")], "k double, val string"
    )
    t.merge(updates, ["k"])
    got = {(r.k, r.val) for r in t.read().filter(~F.isnan("k")).collect()}
    # The finite matched key MUST have been replaced, not duplicated.
    assert got == {(1.0, "UPDATED"), (2.0, "b"), (3.0, "c")}
    assert t.manifest().summary["n_dirs_untouched"] == 0


def test_overwrite_with_incompatible_schema_still_commits(spark, root):
    """Overwrite may REPLACE the schema; when old/new can't union, the
    commit proceeds without change files rather than failing."""
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1, "a")], "id bigint, v string")
    )
    t.overwrite(
        spark.createDataFrame(
            [(1, ["x", "y"])], "id bigint, v array<string>"
        )
    )
    assert t.manifest().schema_ddl.startswith("struct<id:bigint,v:array")
    assert [r.v for r in t.read().collect()] == [["x", "y"]]
    assert "cdf" not in t.manifest().summary  # feed undefined across replace


def test_materialize_changes_opt_out(spark, root):
    """materialize_changes=False skips change-file writes; the batch feed
    falls back to the exceptAll diff and stays correct."""
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"),
        materialize_changes=False,
    )
    t.delete_where(F.col("id") == 1)
    assert "cdf" not in t.manifest().summary
    assert not os.path.isdir(os.path.join(root, "changes")) or not os.listdir(
        os.path.join(root, "changes")
    )
    feed = t.changes(1, 2).collect()
    assert {(r.id, r._change_type) for r in feed} == {(1, "delete")}


def test_overwrite_records_cdf_downgrade_reason(spark, root):
    """A schema-replacement overwrite that can't union records WHY the
    change files were skipped, instead of swallowing every exception."""
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1, "a")], "id bigint, v string")
    )
    t.overwrite(
        spark.createDataFrame([(1, ["x"])], "id bigint, v array<string>")
    )
    s = t.manifest().summary
    assert "cdf" not in s
    assert "not unionable" in s["cdf_skipped"]


def test_merge_with_nondeterministic_updates_is_consistent(spark, root):
    """updates is localCheckpoint-ed before the key-bounds collect, so a
    non-deterministic input (rand()) can't produce rows outside the
    collected bounds whose matches live in dirs classified untouched."""
    t = VersionedTable.create(
        spark, root, _df(spark, [(i, "old") for i in range(1, 26)])
    )
    t.append(_df(spark, [(i, "old") for i in range(26, 51)]))
    # One random key in 1..50, re-evaluating differently per subtree
    # without the checkpoint.
    updates = spark.range(1).select(
        (F.floor(F.rand() * 50) + 1).cast("bigint").alias("id"),
        F.lit("NEW").alias("val"),
    )
    t.merge(updates, ["id"])
    rows = t.read().collect()
    assert {r.id for r in rows} == set(range(1, 51))  # no loss, no dup
    assert sum(1 for r in rows if r.val == "NEW") == 1


def test_merge_expected_version_conflict_surfaces(spark, root):
    """A merge pinned to a stale snapshot fails with ConcurrentCommitError
    instead of silently committing over the interleaved write."""
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    stale = t.latest_version()
    t.append(_df(spark, [(2, "b")]))
    with pytest.raises(ConcurrentCommitError):
        t.merge(
            _df(spark, [(1, "A")]), ["id"], expected_version=stale
        )


def test_predicated_read_conforms_to_evolved_schema(spark, root):
    """Pruning that removes every file carrying an evolved column must not
    change the result schema: the missing column reads as typed NULL."""
    t = VersionedTable.create(
        spark, root, _df(spark, [(i, "a") for i in range(1, 11)])
    )
    t.append(
        spark.createDataFrame(
            [(100, "b", 7.5)], "id bigint, val string, extra double"
        ),
        merge_schema=True,
    )
    df = t.read(predicates=[("id", "<=", 10)])
    assert "extra" in df.columns
    got = df.filter(F.col("extra").isNull()).collect()
    assert {r.id for r in got} == set(range(1, 11))
    # And the predicate can even target the pruned-away column.
    assert t.read(predicates=[("id", "<=", 10)]).filter(
        F.col("extra") > 0
    ).count() == 0


def test_orphan_claim_reclaimed_by_vacuum(spark, root):
    """A writer hard-crashed between claiming a version (conditional-PUT
    create) and publishing the manifest content: readers skip the torn
    manifest, later writers conflict out of that number, and vacuum()
    reclaims the claim past its timeout so the NEXT writer commits it."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _MANIFEST_DIR,
        ConditionalPutCommitProtocol,
        _manifest_name,
    )

    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a")]),
        commit_protocol=ConditionalPutCommitProtocol(),
    )
    t.append(_df(spark, [(2, "b")]))
    # Simulate the crash: the claim for v3 exists with torn (empty) content.
    torn = os.path.join(root, _MANIFEST_DIR, _manifest_name(3))
    with open(torn, "w") as f:
        f.write("")
    # Readers skip the torn claim and see the table as of v2.
    assert t.latest_version() == 2
    assert {r.id for r in t.read().collect()} == {1, 2}
    # A writer cannot commit v3 while the claim is live.
    with pytest.raises(ConcurrentCommitError):
        t.append(_df(spark, [(3, "c")]), max_retries=1)
    # Within the timeout the claim is NOT reclaimed (in-flight writer);
    # the failed append's orphaned data dir is collected as usual.
    assert not any(
        _MANIFEST_DIR in r for r in t.vacuum(claim_timeout_s=3600.0)
    )
    assert os.path.exists(torn)
    # Past the timeout vacuum un-burns the version number...
    reclaimed = t.vacuum(claim_timeout_s=0.0)
    assert any(r.endswith(_manifest_name(3)) for r in reclaimed)
    assert not os.path.exists(torn)
    # ...and the next writer commits exactly that version.
    assert t.append(_df(spark, [(3, "c")])) == 3
    assert {r.id for r in t.read().collect()} == {1, 2, 3}


def test_materialize_changes_backfill_matches_lazy_diff(spark, root):
    """Backfilled change files must replay exactly like the lazy exceptAll
    diff they replace, and a data-preserving legacy commit backfills to
    cdf_empty (no unreadable empty parquet dir)."""
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
        materialize_changes=False,
    )
    t.merge(_df(spark, [(2, "B"), (4, "d")]), ["id"])
    lazy = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in t.changes(1).collect()
    }
    # A no-op merge: upsert a row to its existing value — the exceptAll
    # diff is empty, so backfill records cdf_empty.
    t.merge(_df(spark, [(4, "d")]), ["id"])

    done = t.materialize_changes()
    assert set(done) == {2}
    m2, m3 = t.manifest(2), t.manifest(3)
    assert m2.summary.get("cdf") and not m3.summary.get("cdf")
    assert m3.summary.get("cdf_empty") is True
    # Data entries / schema / version untouched by the manifest rewrite.
    assert m2.operation == "merge" and m2.version == 2

    materialized = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in t.changes(1, 2).collect()
    }
    assert materialized == lazy
    # Vacuum keeps the backfilled change dirs (referenced by manifests).
    t.vacuum()
    assert {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in t.changes(1, 2).collect()
    } == lazy


# -- RESTORE + timestamp time travel ----------------------------------------


def test_restore_rolls_back_as_new_version(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("id") == 1)
    t.append(_df(spark, [(3, "c")]))
    v = t.restore(1)
    assert v == 4  # history moves FORWARD
    assert {r.id for r in t.read().collect()} == {1, 2}
    # The bad versions stay auditable.
    assert {r.id for r in t.read(version=3).collect()} == {2, 3}
    m = t.manifest(4)
    assert m.operation == "restore"
    assert m.summary["restored_version"] == 1
    # Metadata-only: v4 references v1's data entries verbatim.
    assert m.files == t.manifest(1).files
    # The change feed follows the rollback (overwrite-shaped diff).
    feed = t.changes(3, 4)
    got = {(r.id, r._change_type) for r in feed.collect()}
    assert got == {(2, "delete"), (3, "delete"), (1, "insert"), (2, "insert")}
    # Restoring to the current version is refused; vacuum keeps v1 data.
    with pytest.raises(ValueError):
        t.restore(4)
    t.vacuum()
    assert {r.id for r in t.read().collect()} == {1, 2}


def test_restore_after_expiry_raises(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.overwrite(_df(spark, [(2, "b")]))
    t.expire_versions(keep_last=1)
    with pytest.raises(NoSuchVersionError):
        t.restore(1)


def test_version_at_timestamp(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    ts2 = t.manifest(2).committed_at
    assert t.version_at(ts2) == 2
    assert t.version_at("2999-01-01T00:00:00") == 3
    with pytest.raises(NoSuchVersionError):
        t.version_at("1999-01-01T00:00:00")
    assert {
        r.id for r in t.read(version=t.version_at(ts2)).collect()
    } == {1, 2}


# -- CHECK / NOT NULL constraints -------------------------------------------


def test_check_constraints_enforced_on_every_write_path(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        ConstraintViolationError,
    )

    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a")]),
        check_constraints={"id_positive": "id > 0"},
        not_null=["val"],
    )
    assert set(t.check_constraints) == {"id_positive", "val_not_null"}
    # append: bad id and NULL val both rejected, nothing commits.
    with pytest.raises(ConstraintViolationError, match="id_positive"):
        t.append(_df(spark, [(-5, "x")]))
    with pytest.raises(ConstraintViolationError, match="val_not_null"):
        t.append(spark.createDataFrame([(7, None)], "id bigint, val string"))
    assert t.latest_version() == 1
    # merge: new rows gated, valid ones pass.
    with pytest.raises(ConstraintViolationError):
        t.merge(_df(spark, [(-1, "y")]), ["id"])
    t.merge(_df(spark, [(2, "b")]), ["id"])
    # overwrite gated too.
    with pytest.raises(ConstraintViolationError):
        t.overwrite(_df(spark, [(0, "z")]))
    assert {r.id for r in t.read().collect()} == {1, 2}


def test_create_rejects_violating_initial_data(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        VersionedTable.create(
            spark, root, _df(spark, [(1, "a"), (-2, "b")]),
            check_constraints={"id_positive": "id > 0"},
        )


def test_add_drop_check_constraint(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        ConstraintViolationError,
    )

    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (5, "b")]))
    # Current snapshot must satisfy the new constraint.
    with pytest.raises(ConstraintViolationError):
        t.add_check_constraint("id_big", "id > 3")
    v = t.add_check_constraint("id_positive", "id > 0")
    assert t.manifest(v).operation == "add_constraint"
    with pytest.raises(ValueError):
        t.add_check_constraint("id_positive", "id > 0")  # duplicate
    with pytest.raises(ConstraintViolationError):
        t.append(_df(spark, [(-9, "x")]))
    # Metadata-only commit is change-free for the feed.
    assert t.changes(v - 1, v).count() == 0
    t.drop_check_constraint("id_positive")
    t.append(_df(spark, [(-9, "x")]))  # allowed again
    assert {r.id for r in t.read().collect()} == {1, 5, -9}
    # NULL passes a plain CHECK (standard SQL tri-state).
    t2root = root + "_2"
    t2 = VersionedTable.create(
        spark, t2root,
        spark.createDataFrame([(1, "a")], "id bigint, val string"),
        check_constraints={"val_short": "length(val) < 10"},
    )
    t2.append(spark.createDataFrame([(2, None)], "id bigint, val string"))
    assert t2.read().count() == 2


def test_constraints_survive_restore_and_carry_forward(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a")]),
        check_constraints={"id_positive": "id > 0"},
    )
    t.append(_df(spark, [(2, "b")]))
    t.drop_check_constraint("id_positive")
    assert t.check_constraints == {}
    t.restore(2)  # v2 still had the constraint
    assert set(t.check_constraints) == {"id_positive"}


# -- bloom-filter data skipping ---------------------------------------------


def test_bloom_prunes_equality_where_ranges_cannot(spark, root):
    """Four appends whose id SETS are disjoint but whose id RANGES all
    overlap (id % 4 buckets): min/max can never refute an equality lookup,
    the bloom filter refutes 3 of 4 entries."""
    t = None
    for b in range(4):
        df = spark.range(0, 400).filter(F.col("id") % 4 == b).select(
            "id", (F.col("id") * 2).alias("v")
        )
        if t is None:
            t = VersionedTable.create(
                spark, root, df, bloom_columns=["id"]
            )
        else:
            t.append(df)
    # Point lookups land in exactly one bucket-entry.
    for probe in (17, 100, 243, 398):
        info = t.prune_info([("id", "=", probe)])
        assert info["n_scanned"] == 1 and info["n_skipped"] == 3, probe
        got = [r.id for r in t.read(predicates=[("id", "=", probe)]).collect()]
        assert got == [probe]
    # A value NOT in the table prunes everything.
    info = t.prune_info([("id", "=", 401)])
    assert info["n_scanned"] == 0
    assert t.read(predicates=[("id", "=", 401)]).count() == 0
    # Range predicates still use min/max stats unchanged.
    assert t.read(predicates=[("id", ">=", 399)]).count() == 1


def test_bloom_string_column_and_compact_recompute(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "id bigint, name string"
        ),
        bloom_columns=["name"],
    )
    t.append(
        spark.createDataFrame(
            [(3, "gamma"), (4, "delta")], "id bigint, name string"
        )
    )
    info = t.prune_info([("name", "=", "gamma")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 1
    assert {
        r.id for r in t.read(predicates=[("name", "=", "gamma")]).collect()
    } == {3}
    # compact() recomputes the bloom over the merged entry (carried
    # bloom_columns config), so lookups still prune misses.
    t.compact()
    assert t.manifest().bloom_columns == ("name",)
    info = t.prune_info([("name", "=", "nosuch")])
    assert info["n_scanned"] == 0
    assert {
        r.id for r in t.read(predicates=[("name", "=", "delta")]).collect()
    } == {4}


def test_bloom_rejects_unsupported_type(spark, root):
    with pytest.raises(ValueError, match="bloom column"):
        VersionedTable.create(
            spark, root,
            spark.createDataFrame([(1, 1.5)], "id bigint, x double"),
            bloom_columns=["x"],
        )


def test_bloom_null_values_and_merge_interplay(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a"), (2, None)], "id bigint, name string"
        ),
        bloom_columns=["name"],
    )
    # NULLs contribute no positions and a NULL probe never bloom-prunes
    # (equality with NULL matches nothing anyway; read applies the
    # filter).
    assert t.read(predicates=[("name", "=", "a")]).count() == 1
    # DML through merge keeps the feature working on the rewritten entry.
    t.merge(
        spark.createDataFrame([(3, "zeta")], "id bigint, name string"),
        ["id"],
    )
    assert {
        r.id for r in t.read(predicates=[("name", "=", "zeta")]).collect()
    } == {3}
    info = t.prune_info([("name", "=", "missing")])
    assert info["n_scanned"] == 0


def test_per_leaf_blooms_prune_sibling_partitions(spark, root):
    """A PARTITIONED commit gets one bloom PER LEAF: a point lookup on a
    NON-partition column prunes sibling leaves individually (a shared
    per-commit bloom could never refute any of them, since every leaf
    belongs to the same commit)."""
    df = spark.range(0, 400).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    t = VersionedTable.create(
        spark, root, df, partition_by=["grp"], bloom_columns=["id"]
    )
    assert len(t.manifest().files) == 4  # one entry per leaf
    # id=17 lives only in leaf grp=1; the OTHER leaves' blooms refute it
    # even though the predicate says nothing about the partition column.
    for probe in (17, 100, 243, 398):
        info = t.prune_info([("id", "=", probe)])
        assert info["n_scanned"] == 1 and info["n_skipped"] == 3, probe
        got = [
            r.id for r in t.read(predicates=[("id", "=", probe)]).collect()
        ]
        assert got == [probe]
    info = t.prune_info([("id", "=", 401)])
    assert info["n_scanned"] == 0
    # The batch DataSource consumes the same per-leaf blooms via
    # pushFilters.
    from pyspark.sql.datasource import EqualTo

    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableReader,
    )

    rd = VersionedTableReader({"table_root": root})
    list(rd.pushFilters([EqualTo(("id",), 17)]))
    assert len(rd.partitions()) == 1


def test_per_leaf_blooms_null_leaf_and_compact(spark, root):
    """The hive-null leaf carries its own bloom; compact() (which
    rewrites through the partition spec) recomputes per-leaf blooms."""
    rows = [(1, "a", "x"), (2, None, "y"), (3, "a", "z"), (4, "b", "w")]
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(rows, "id bigint, grp string, val string"),
        partition_by=["grp"],
        bloom_columns=["val"],
    )
    # 'y' lives only in the NULL leaf: the other two leaves bloom-prune.
    info = t.prune_info([("val", "=", "y")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    assert {
        r.id for r in t.read(predicates=[("val", "=", "y")]).collect()
    } == {2}
    t.append(
        spark.createDataFrame(
            [(5, "a", "q")], "id bigint, grp string, val string"
        )
    )
    t.compact()
    # Post-compact: one entry per leaf again, blooms still leaf-local.
    info = t.prune_info([("val", "=", "q")])
    assert info["n_skipped"] >= 2
    assert {
        r.id for r in t.read(predicates=[("val", "=", "q")]).collect()
    } == {5}
    info = t.prune_info([("val", "=", "nosuch")])
    assert info["n_scanned"] == 0


# -- incremental OPTIMIZE (small-entry compaction) --------------------------


def test_incremental_compact_rewrites_only_small_entries(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 1000, "big"))
    t.compact()  # one big, well-sized entry
    big_entry = t.manifest().files[0]
    for lo in range(1000, 1030, 10):  # three 10-row drips
        t.append(_ranged(spark, lo, lo + 10, "drip"))
    v = t.compact(small_entry_max_rows=100)
    m = t.manifest(v)
    assert m.operation == "compact"
    assert m.summary["n_entries_compacted"] == 3
    assert m.summary["n_entries_carried"] == 1
    # The big entry rode along untouched; drips merged into ONE new entry.
    assert big_entry in m.files and len(m.files) == 2
    assert t.read().count() == 1030
    assert t.changes(v - 1, v).count() == 0  # data-preserving
    # Carried entry kept its stats (pruning still works on it).
    info = t.prune_info([("id", "<", 100)])
    assert info["n_scanned"] == 1


def test_incremental_compact_noop_below_two_small(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 1000, "big"))
    t.append(_ranged(spark, 1000, 1005, "drip"))
    v0 = t.latest_version()
    assert t.compact(small_entry_max_rows=100) == v0  # 1 small: no gain
    assert t.latest_version() == v0


# -- merge-on-read deferred deletes -----------------------------------------


def test_deferred_delete_filters_without_rewrite(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 100, "a"))
    data_before = t.manifest().files
    v = t.delete_where_deferred("id % 10 = 0")
    m = t.manifest(v)
    assert m.operation == "delete_deferred"
    assert m.files == data_before  # ZERO data rewritten
    got = sorted(r.id for r in t.read().collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # Time travel: the pre-delete snapshot still serves all rows.
    assert t.read(version=v - 1).count() == 100
    # Predicated reads compose with the deferred filter.
    assert sorted(
        r.id for r in t.read(predicates=[("id", "<", 25)]).collect()
    ) == [i for i in range(25) if i % 10 != 0]


def test_deferred_delete_spares_later_appends(spark, root):
    """The predicate is scoped to the entries that existed at delete
    time: rows appended AFTERWARDS match the predicate but must NOT be
    filtered (Iceberg sequence-number semantics)."""
    t = VersionedTable.create(spark, root, _df(spark, [(10, "old")]))
    t.delete_where_deferred("id = 10")
    t.append(_df(spark, [(10, "new"), (11, "x")]))
    got = {(r.id, r.val) for r in t.read().collect()}
    assert got == {(10, "new"), (11, "x")}


def test_deferred_delete_feed_and_stacking(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v2 = t.delete_where_deferred("id = 1")
    v3 = t.delete_where_deferred("id = 3")
    assert {r.id for r in t.read().collect()} == {2}
    feed = {
        (r.id, r._change_type, r._commit_version)
        for r in t.changes(1).collect()
    }
    assert feed == {(1, "delete", v2), (3, "delete", v3)}
    # A no-match deferred delete records cdf_empty, feed stays exact.
    v4 = t.delete_where_deferred("id = 99")
    assert t.manifest(v4).summary.get("cdf_empty") is True
    assert t.changes(v3, v4).count() == 0


def test_rewrite_materializes_and_retires_predicates(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 50, "a"))
    t.delete_where_deferred("id >= 40")
    assert len(t.manifest().delete_predicates) == 1
    t.compact()
    m = t.manifest()
    assert m.operation == "compact"
    assert m.delete_predicates == ()  # retired: deletion materialized
    assert t.read().count() == 40
    # And the feed across the compact is still empty (data-preserving).
    assert t.changes(m.version - 1, m.version).count() == 0


def test_deferred_delete_merge_interplay(spark, root):
    """A scoped merge over a table with a live deferred delete must not
    resurrect deleted rows in carried-forward dirs, and rewritten dirs
    materialize the deletion."""
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 10, "lo"))
    t.append(_ranged(spark, 1000, 1010, "hi"))
    t.delete_where_deferred("id IN (0, 1000)")
    # Merge touches only the hi band (stats-scoped): lo dir carries.
    updates = spark.createDataFrame(
        [(1005, "HI", 9.9)], "id bigint, val string, score double"
    )
    t.merge(updates, ["id"])
    m = t.manifest()
    assert m.summary["n_dirs_untouched"] == 1
    got = sorted(r.id for r in t.read().collect())
    assert got == list(range(1, 10)) + list(range(1001, 1010))
    # The predicate survives (it still scopes the carried lo dir) and
    # a follow-up full rewrite retires it.
    assert len(m.delete_predicates) == 1
    t.compact()
    assert t.manifest().delete_predicates == ()
    assert sorted(r.id for r in t.read().collect()) == got


def test_deferred_delete_invalid_predicate_rejected(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    with pytest.raises(Exception):
        t.delete_where_deferred("nosuchcol = 1")
    assert t.latest_version() == 1  # nothing committed


# -- column mapping: rename / drop as metadata-only commits -----------------


def test_rename_column_zero_rewrite(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    files_before = t.manifest().files
    v = t.rename_column("val", "label")
    m = t.manifest(v)
    assert m.operation == "rename_column"
    assert m.files == files_before  # zero data rewritten
    got = {(r.id, r.label) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b")}
    assert "val" not in t.read().columns
    # Time travel: pre-rename snapshot serves the OLD name.
    assert {(r.id, r.val) for r in t.read(version=1).collect()} == got
    # New appends keep the old PHYSICAL name; reads stay logical.
    t.append(
        spark.createDataFrame([(3, "c")], "id bigint, label string")
    )
    assert {(r.id, r.label) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    # Predicated reads on the new name still prune via physical stats.
    assert {
        r.id for r in t.read(predicates=[("label", "=", "c")]).collect()
    } == {3}
    # Change feed serves pre-rename history under the NEW name.
    feed = {(r.id, r.label, r._change_type) for r in t.changes(0 + 1).collect()}
    assert feed == {(3, "c", "insert")}


def test_rename_column_feed_across_rename(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.merge(_df(spark, [(1, "A"), (2, "b")]), ["id"])  # cdf pre-rename
    t.rename_column("val", "label")
    t.merge(
        spark.createDataFrame([(2, "B")], "id bigint, label string"),
        ["id"],
    )  # cdf post-rename
    feed = {
        (r.id, r.label, r._change_type, r._commit_version)
        for r in t.changes(1).collect()
    }
    assert feed == {
        (1, "a", "delete", 2), (1, "A", "insert", 2), (2, "b", "insert", 2),
        (2, "b", "delete", 4), (2, "B", "insert", 4),
    }


def test_drop_column_and_collision_guard(spark, root):
    t = VersionedTable.create(
        spark, root,
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)],
            "id bigint, val string, score double",
        ),
    )
    v = t.drop_column("score")
    assert t.manifest(v).files == t.manifest(1).files
    assert t.read().columns == ["id", "val"]
    assert t.read(version=1).columns == ["id", "val", "score"]  # travel
    # Re-adding a column named like the retired physical is refused
    # (old files still carry its data).
    from datalakeingestionservice_spark.sinks.versioned import (
        SchemaMismatchError,
    )

    with pytest.raises(SchemaMismatchError, match="collides"):
        t.append(
            spark.createDataFrame(
                [(3, "c", 9.9)], "id bigint, val string, score double"
            ),
            merge_schema=True,
        )
    # A differently-named addition is fine.
    t.append(
        spark.createDataFrame(
            [(3, "c", 9.9)], "id bigint, val string, score2 double"
        ),
        merge_schema=True,
    )
    rows = {r.id: r.score2 for r in t.read().collect()}
    assert rows[3] == 9.9 and rows[1] is None


def test_rename_then_rewrite_and_merge(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.rename_column("val", "label")
    t.merge(
        spark.createDataFrame([(2, "B")], "id bigint, label string"),
        ["id"],
    )
    t.compact()
    assert {(r.id, r.label) for r in t.read().collect()} == {
        (1, "a"), (2, "B")
    }
    # Rename chains: label -> tag; mapping still resolves to the ORIGINAL
    # physical name.
    t.rename_column("label", "tag")
    assert t.manifest().physical_name("tag") == "val"
    assert {(r.id, r.tag) for r in t.read().collect()} == {
        (1, "a"), (2, "B")
    }


def test_rename_validation_and_guards(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a")]),
        check_constraints={"val_nonempty": "length(val) > 0"},
    )
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("val", "label")
    t.drop_check_constraint("val_nonempty")
    t.delete_where_deferred("val = 'zzz'")
    with pytest.raises(ValueError, match="deferred delete"):
        t.rename_column("val", "label")
    t.compact()  # materializes the deferred delete
    t.rename_column("val", "label")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("label", "id")
    with pytest.raises(ValueError, match="partition column"):
        root2 = root + "_p"
        tp = VersionedTable.create(
            spark, root2,
            spark.createDataFrame([(1, "a")], "id bigint, grp string"),
            partition_by=["grp"],
        )
        tp.drop_column("grp")


def test_mapped_table_served_by_batch_source(spark, root):
    """The logical->physical map ships inside each InputPartition, so the
    sessionless workers read file columns under PHYSICAL names and emit
    logical rows — renamed tables work through the format."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableReader,
        register,
    )
    from pyspark.sql.datasource import EqualTo

    register(spark)
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.rename_column("val", "label")
    t.append(spark.createDataFrame([(3, "c")], "id bigint, label string"))
    df = (
        spark.read.format("versioned").option("table_root", root).load()
    )
    assert {(r.id, r.label) for r in df.collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    assert {r.id for r in df.filter("label = 'c'").collect()} == {3}
    # Pushed filters on the logical name prune via the physical stats.
    rd = VersionedTableReader({"table_root": root})
    list(rd.pushFilters([EqualTo(("label",), "c")]))
    assert len(rd.partitions()) == 1


# -- auto-maintenance planner ------------------------------------------------


def test_maintenance_plan_and_run(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 1000, "big"))
    t.compact()
    for lo in (1000, 1010, 1020):
        t.append(_ranged(spark, lo, lo + 10, "drip"))
    plan = t.maintenance_plan(small_entry_max_rows=100)
    assert plan["compact_small_entries"] and plan["n_small_entries"] == 3
    assert not plan["materialize_deletes"]
    out = t.run_maintenance(small_entry_max_rows=100)
    assert "compact_small_entries" in out["executed"]
    assert t.read().count() == 1030
    # Idempotent: nothing due now (big entry + one merged drip entry).
    v = t.latest_version()
    out2 = t.run_maintenance(small_entry_max_rows=100)
    assert t.latest_version() == v
    assert not any(
        e.startswith("compact") for e in out2["executed"]
    )


def test_maintenance_materializes_stacked_deletes(spark, root):
    t = VersionedTable.create(spark, root, _ranged(spark, 0, 100, "a"))
    t.delete_where_deferred("id = 1")
    t.delete_where_deferred("id = 2")
    assert not t.maintenance_plan()["materialize_deletes"]  # below 3
    t.delete_where_deferred("id = 3")
    out = t.run_maintenance()
    assert "compact_full" in out["executed"]
    assert t.manifest().delete_predicates == ()
    assert t.read().count() == 97
