"""EQUALITY DELETES (Iceberg's second delete-file kind) + scan-free
upsert: `delete_keys_deferred` records key VALUES (not coordinates) in a
delete file scoped to the entries that exist now — write cost ∝ |keys|,
ZERO table scan, zero data-file rewrite; `upsert_deferred` composes an
equality-delete file with a postimage append in ONE commit — the pure
streaming-upsert primitive (Flink→Iceberg's upsert mode): position
deletes need the target's coordinates (a scan); equality deletes don't.
Both read surfaces apply them by anti-joining the key columns.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.versioned_batch import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


ROWS = [
    (1, "a", 10.0),
    (2, "a", 20.0),
    (3, "b", 30.0),
    (4, "c", 40.0),
    (5, None, 50.0),
]


def _df(spark, rows, ddl="id bigint, grp string, v double"):
    return spark.createDataFrame(rows, ddl)


def _data_files(root):
    out = set()
    for dirpath, _d, files in os.walk(os.path.join(root, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                out.add(os.path.join(dirpath, fn))
    return out


def test_delete_keys_no_scan_no_rewrite(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before_files = _data_files(root)
    before_entries = set(t.manifest().files)
    v = t.delete_keys_deferred(
        spark.createDataFrame([(1,), (3,)], "id bigint")
    )
    m = t.manifest(v)
    assert before_entries <= set(m.files)
    assert before_files <= _data_files(root)
    eq = [p for p in m.delete_predicates if "eq" in p]
    assert len(eq) == 1 and eq[0]["cols"] == ["id"]
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {(2, "a", 20.0), (4, "c", 40.0), (5, None, 50.0)}
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp, r.v) for r in ds.collect()} == got
    # Pushed filter still exact over eq-deleted entries.
    assert {r.id for r in ds.filter("v >= 30.0").collect()} == {4, 5}


def test_delete_keys_multi_column_and_null_data_rows(spark, root):
    """Multi-column equality keys; data rows with a NULL key column
    never match (SQL equality), so the null-grp row survives a
    (grp, v) delete that lists its v."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(
        spark.createDataFrame(
            [("a", 10.0), ("x", 50.0)], "grp string, v double"
        )
    )
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert got == {(2, "a"), (3, "b"), (4, "c"), (5, None)}


def test_eq_deletes_exact_int64_keys_above_2p53_with_nulls(spark, root):
    """The sessionless reader's equality anti-join must stay EXACT for
    int64 keys above 2^53 even when the key column contains NULLs in
    the data: a pandas round-trip would coerce nullable int64 to
    float64, where 2^53 and 2^53+1 compare equal — silently deleting a
    surviving row (or serving a deleted one). Arrow-native join keeps
    integer identity. (ADVICE r7 #4.)"""
    big = 2**53  # 9007199254740992; +1 is float64-indistinguishable
    rows = [
        (big, "keep", 1.0),
        (big + 1, "delete-me", 2.0),
        (None, "null-key", 3.0),
    ]
    t = VersionedTable.create(spark, root, _df(spark, rows))
    t.delete_keys_deferred(
        spark.createDataFrame([(big + 1,)], "id bigint")
    )
    expect = {(big, "keep"), (None, "null-key")}
    assert {(r.id, r.grp) for r in t.read().collect()} == expect
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp) for r in ds.collect()} == expect


def test_delete_keys_refuses_null_keys(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    with pytest.raises(ValueError, match="NULL"):
        t.delete_keys_deferred(
            spark.createDataFrame([(None,)], "id bigint")
        )


def test_delete_keys_scoping_later_appends_untouched(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    # Re-inserting the SAME key later must survive: the delete is
    # scoped to the entries that existed at its commit.
    t.append(_df(spark, [(2, "z", 99.0)]))
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert (2, "z") in got and (2, "a") not in got
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp) for r in ds.collect()} == got


def test_upsert_deferred_single_commit(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before_files = _data_files(root)
    v0 = t.latest_version()
    v = t.upsert_deferred(
        _df(spark, [(1, "a", 111.0), (7, "d", 70.0)]), ["id"]
    )
    assert v == v0 + 1  # ONE commit for delete-file + postimages
    assert before_files <= _data_files(root)  # zero rewrite
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {
        (1, "a", 111.0),
        (2, "a", 20.0),
        (3, "b", 30.0),
        (4, "c", 40.0),
        (5, None, 50.0),
        (7, "d", 70.0),
    }
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp, r.v) for r in ds.collect()} == got
    # Stacked upserts: the second's delete file scopes over the
    # first's postimage entry too.
    t.upsert_deferred(_df(spark, [(1, "a", 222.0)]), ["id"])
    assert (1, "a", 222.0) in {
        (r.id, r.grp, r.v) for r in t.read().collect()
    }
    assert (1, "a", 111.0) not in {
        (r.id, r.grp, r.v) for r in t.read().collect()
    }


def test_upsert_deferred_change_feed(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), materialize_changes=True
    )
    v = t.upsert_deferred(_df(spark, [(1, "a", 111.0)]), ["id"])
    ch = t.changes(v - 1, v).collect()
    assert {(r._change_type, r.id, r.v) for r in ch} == {
        ("delete", 1, 10.0),
        ("insert", 1, 111.0),
    }


def test_cow_over_equality_deletes_materializes(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(4,)], "id bigint"))
    t.update_where([("id", "=", 1)], {"v": "1.5"})
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, 1.5), (2, 20.0), (3, 30.0), (5, 50.0)}


def test_rename_refuses_with_equality_delete(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(1,)], "id bigint"))
    with pytest.raises(ValueError, match="equality delete"):
        t.rename_column("id", "key")
    t.compact()
    t.rename_column("id", "key")
    assert {r.key for r in t.read().collect()} == {2, 3, 4, 5}


def test_compact_deletes_converts_eq_and_merges_all(spark, root):
    """Equality files CONVERT to coordinates (per-pred scope respected
    during the semi-join), then everything merges into ONE position
    file — eq scope-union on raw key files would be wrong, coordinates
    are hazard-free."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(1,)], "id bigint"))
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    t.update_where_deferred([("id", "=", 3)], {"v": "333.0"})
    t.update_where_deferred([("id", "=", 4)], {"v": "444.0"})
    v = t.compact_deletes()
    m = t.manifest(v)
    kinds = sorted(
        "eq" if "eq" in p else "pos" for p in m.delete_predicates
    )
    assert kinds == ["pos"]  # eq converted, everything in one file
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(3, 333.0), (4, 444.0), (5, 50.0)}
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.v) for r in ds.collect()} == got


def test_compact_deletes_preserves_eq_scope_over_reinsert(spark, root):
    """THE equality-delete hazard: key 2 is deleted, then RE-INSERTED
    (fresh entry, outside the delete's scope). The conversion must not
    widen the key's reach — the re-inserted row survives compaction."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    t.append(_df(spark, [(2, "z", 99.0)]))
    # A second delete whose scope INCLUDES the re-insert entry.
    t.delete_keys_deferred(spark.createDataFrame([(4,)], "id bigint"))
    before = {(r.id, r.grp) for r in t.read().collect()}
    assert (2, "z") in before and (2, "a") not in before
    t.compact_deletes()
    after = {(r.id, r.grp) for r in t.read().collect()}
    assert after == before
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp) for r in ds.collect()} == before


def test_clone_and_vacuum_carry_eq_deletes(spark, root, tmp_path):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    c = t.clone(str(tmp_path / "clone"))
    assert {r.id for r in c.read().collect()} == {1, 3, 4, 5}
    t.compact()
    t.expire_versions(keep_last=1)
    removed = t.vacuum()
    assert any(r.startswith("deletes") for r in removed)
    assert {r.id for r in t.read().collect()} == {1, 3, 4, 5}

def test_lazy_change_feed_over_mor_commits(spark, root):
    """changes() WITHOUT materialization (the lazy snapshot-diff
    fallback) on deferred-delete commits: read(v-1)/read(v) are both
    MoR-aware, so the exceptAll diff sees through position AND equality
    delete files — NOTES r7 candidate #3 pinned."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    v1 = t.latest_version()
    t.delete_keys_deferred(spark.createDataFrame([(4,)], "id bigint"))
    t.upsert_deferred(_df(spark, [(1, "a", 111.0)]), ["id"])
    v3 = t.merge_deferred(_df(spark, [(2, "a", 222.0)]), ["id"])
    ch = t.changes(v1, v3).collect()
    got = {(r._commit_version, r._change_type, r.id, r.v) for r in ch}
    assert got == {
        (v1 + 1, "delete", 4, 40.0),
        (v1 + 2, "delete", 1, 10.0),
        (v1 + 2, "insert", 1, 111.0),
        (v3, "delete", 2, 20.0),
        (v3, "insert", 2, 222.0),
    }

def test_upsert_deferred_delete_keys_one_commit(spark, root):
    """A netted CDC batch (upserts + pure deletes) as ONE commit: the
    equality-delete file carries BOTH key sets; only upserts append
    postimages. Overlapping keys refuse (ambiguous disposition)."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    v0 = t.latest_version()
    v = t.upsert_deferred(
        _df(spark, [(1, "a", 111.0)]),
        ["id"],
        delete_keys=spark.createDataFrame([(3,), (99,)], "id bigint"),
    )
    assert v == v0 + 1
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, 111.0), (2, 20.0), (4, 40.0), (5, 50.0)}
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.v) for r in ds.collect()} == got
    with pytest.raises(ValueError, match="both updates and delete_keys"):
        t.upsert_deferred(
            _df(spark, [(2, "a", 2.0)]),
            ["id"],
            delete_keys=spark.createDataFrame([(2,)], "id bigint"),
        )
    # Delete-only batch: empty updates frame, keys still land.
    t.upsert_deferred(
        spark.createDataFrame([], "id bigint, grp string, v double"),
        ["id"],
        delete_keys=spark.createDataFrame([(4,)], "id bigint"),
    )
    assert {r.id for r in t.read().collect()} == {1, 2, 5}


def test_upsert_deferred_merge_schema_evolves(spark, root):
    """merge_schema=True: the upsert batch widens a type and adds a
    column; survivors (old entries, NEVER rewritten) null-fill the new
    column and upcast at read — both read surfaces agree."""
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS, "id int, grp string, v double")
    )
    before_files = _data_files(root)
    with pytest.raises(Exception):
        t.upsert_deferred(  # refused without the flag
            _df(spark, [(1, "a", 1.0, "x")],
                "id bigint, grp string, v double, note string"),
            ["id"],
        )
    t.upsert_deferred(
        _df(spark, [(1, "a", 111.0, "x")],
            "id bigint, grp string, v double, note string"),
        ["id"],
        merge_schema=True,
    )
    assert before_files <= _data_files(root)
    assert dict(t.read().dtypes)["id"] == "bigint"
    got = {(r.id, r.v, r.note) for r in t.read().collect()}
    assert got == {
        (1, 111.0, "x"),
        (2, 20.0, None),
        (3, 30.0, None),
        (4, 40.0, None),
        (5, 50.0, None),
    }
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.v, r.note) for r in ds.collect()} == got


def test_maintain_deletes_policy_escalation(spark, root):
    """`maintain_deletes` picks the cheapest action that clears the
    breach: no-op under thresholds, delete-file merge past
    max_delete_files (data untouched), full materialization past
    max_deleted_fraction (predicates retired)."""
    t = VersionedTable.create(
        spark, root, _df(spark, [(i, "a", float(i)) for i in range(20)])
    )
    # under both thresholds: pure no-op, not even a commit
    v0 = t.latest_version()
    r = t.maintain_deletes(max_delete_files=8)
    assert r["executed"] == [] and t.latest_version() == v0
    # drip 4 deferred upserts -> 4 equality-delete files
    for i in range(4):
        t.upsert_deferred(_df(spark, [(i, "a", 100.0 + i)]), ["id"])
    st = t.delete_stats()
    assert st["n_delete_files"] == 4
    before_data = _data_files(root)
    r = t.maintain_deletes(max_delete_files=3, max_deleted_fraction=0.9)
    assert r["executed"] == ["compact_deletes"]
    assert _data_files(root) == before_data  # data untouched
    assert t.delete_stats()["n_delete_files"] == 1
    expect = {(i, 100.0 + i) for i in range(4)} | {
        (i, float(i)) for i in range(4, 20)
    }
    assert {(r2.id, r2.v) for r2 in t.read().select("id", "v").collect()} == expect
    # now breach the fraction bar: policy escalates to materialization
    t.delete_keys_deferred(
        spark.createDataFrame([(i,) for i in range(4, 16)], "id bigint")
    )
    r = t.maintain_deletes(max_delete_files=99, max_deleted_fraction=0.3)
    assert r["executed"] == ["compact_materialize"]
    assert t.manifest().delete_predicates == ()
    expect2 = {p for p in expect if not (4 <= p[0] < 16)}
    assert {(r2.id, r2.v) for r2 in t.read().select("id", "v").collect()} == expect2
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .select("id", "v")
    )
    assert {(r2.id, r2.v) for r2 in ds.collect()} == expect2


def test_cdc_committer_runs_maintenance_every_k_epochs(spark, tmp_path):
    """The upsert_deferred CDC committer with maintain_every_epochs
    keeps the replica exact AND the delete-file backlog bounded — the
    Flink->Iceberg upsert+maintenance loop in one knob."""
    from datalakeingestionservice_spark.streaming.cdc_apply import (
        make_cdc_apply_committer,
    )

    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(
        root,
        ["id"],
        mode="upsert_deferred",
        maintain_every_epochs=3,
        maintain_policy={"max_delete_files": 2,
                         "max_deleted_fraction": 0.95},
    )
    ddl = (
        "id bigint, v double, _change_type string, "
        "_commit_version bigint"
    )
    commit(
        spark.createDataFrame(
            [(i, float(i), "insert", 1) for i in range(10)], ddl
        ),
        0,
    )
    for epoch in range(1, 7):
        commit(
            spark.createDataFrame(
                [(epoch % 10, 100.0 + epoch, "insert", epoch + 1)], ddl
            ),
            epoch,
        )
    t = VersionedTable(spark, root)
    # epochs 3 and 6 ran the policy with max_delete_files=2
    assert t.delete_stats()["n_delete_files"] <= 3
    got = {(r.id, r.v) for r in t.read().collect()}
    expect = {(i, float(i)) for i in range(7, 10)} | {(0, 0.0)} | {
        (e % 10, 100.0 + e) for e in range(1, 7)
    }
    assert got == expect
