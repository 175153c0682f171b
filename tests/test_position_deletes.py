"""Merge-on-read UPDATE / MERGE via POSITION DELETES (Iceberg
positional-delete / Delta deletion-vector shape): matched rows'
(file, row-ordinal) coordinates land in a delete file; postimages append;
NO data file is rewritten. Both read surfaces (session `read()` and
`spark.read.format("versioned")`) apply the coordinates; any rewriting
DML or compact() materializes and retires them.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConstraintViolationError,
    VersionedTable,
)
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


def test_update_deferred_no_data_file_rewrite(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before_files = _data_files(root)
    before_entries = set(t.manifest().files)
    v = t.update_where_deferred([("grp", "=", "a")], {"v": "v + 1.0"})
    m = t.manifest(v)
    # Every parent entry survives verbatim — MoR adds, never rewrites.
    assert before_entries <= set(m.files)
    # No pre-existing data file was touched (byte-identity via inode set:
    # nothing removed; only the postimage entry's files are new).
    assert before_files <= _data_files(root)
    # One live position-delete reference.
    pos = [p for p in m.delete_predicates if "pos" in p]
    assert len(pos) == 1 and m.summary["n_position_deletes"] == 2
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {
        (1, "a", 11.0),
        (2, "a", 21.0),
        (3, "b", 30.0),
        (4, "c", 40.0),
        (5, None, 50.0),
    }
    # Predicated read still exact (pruning is delete-safe).
    got2 = {(r.id, r.v) for r in
            t.read(predicates=[("grp", "=", "a")]).collect()}
    assert got2 == {(1, 11.0), (2, 21.0)}


def test_update_deferred_served_by_datasource(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    t.update_where_deferred([("id", "<=", 2)], {"v": F.lit(0.0)})
    df = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    got = {(r.id, r.grp, r.v) for r in df.collect()}
    assert got == {
        (1, "a", 0.0),
        (2, "a", 0.0),
        (3, "b", 30.0),
        (4, "c", 40.0),
        (5, None, 50.0),
    }
    # Pushed filters stay exact on position-deleted files (the executor
    # skips pyarrow dataset filters there; Spark re-applies row-level).
    got3 = {r.id for r in df.filter("v = 0.0").collect()}
    assert got3 == {1, 2}
    # Time travel to the pre-update snapshot ignores the delete file.
    v1 = (
        spark.read.format("versioned")
        .option("table_root", root)
        .option("version", "1")
        .load()
    )
    assert {(r.id, r.v) for r in v1.collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0),
    }


def test_update_deferred_scoping_and_later_appends(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    t.update_where_deferred([("grp", "=", "b")], {"v": "v * 2"})
    # A later append matching the predicate is NEVER filtered (fresh rel
    # outside every delete's scope).
    t.append(_df(spark, [(6, "b", 60.0)]))
    got = {(r.id, r.v) for r in t.read().collect()}
    assert (3, 60.0) in got and (6, 60.0) in got
    # Stacked MoR updates compose (second one hits the postimage entry
    # of the first only via fresh coordinates).
    t.update_where_deferred([("grp", "=", "b")], {"v": "v + 1"})
    got = {(r.id, r.v) for r in t.read().collect()}
    assert (3, 61.0) in got and (6, 61.0) in got
    assert (5, 50.0) in got  # NULL partition untouched


def test_update_deferred_zero_matches_no_commit(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    before = t.latest_version()
    assert (
        t.update_where_deferred([("id", "=", 999)], {"v": "0.0"})
        == before
    )
    assert t.latest_version() == before
    assert not [
        p for p in t.manifest().delete_predicates if "pos" in p
    ]


def test_update_deferred_constraints_and_cdf(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.add_check_constraint("v_pos", "v >= 0")
    before = t.latest_version()
    with pytest.raises(ConstraintViolationError):
        t.update_where_deferred([("id", "=", 1)], {"v": "-5.0"})
    assert t.latest_version() == before
    v = t.update_where_deferred([("id", "=", 1)], {"v": "99.0"})
    ch = t.changes(v - 1, v).collect()
    assert {(r._change_type, r.id, r.v) for r in ch} == {
        ("delete", 1, 10.0),
        ("insert", 1, 99.0),
    }


def test_compact_materializes_and_retires(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    t.update_where_deferred([("grp", "=", "a")], {"v": "0.0"})
    assert any("pos" in p for p in t.manifest().delete_predicates)
    t.compact()
    m = t.manifest()
    assert m.delete_predicates == ()
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, 0.0), (2, 0.0), (3, 30.0), (4, 40.0), (5, 50.0)}
    # After history expiry the orphaned delete file vacuums away.
    t.expire_versions(keep_last=1)
    removed = t.vacuum()
    assert any(r.startswith("deletes") for r in removed)
    assert got == {(r.id, r.v) for r in t.read().collect()}


def test_cow_delete_over_pos_deletes_stays_exact(spark, root):
    """A COW rewrite reads THROUGH the position deletes, so rewritten
    entries materialize them; stale coordinates referencing dead files
    are inert (anti-join never matches)."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.update_where_deferred([("id", "=", 3)], {"v": "333.0"})
    t.delete_where([("id", "=", 1)])
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(2, 20.0), (3, 333.0), (4, 40.0), (5, 50.0)}


def test_merge_deferred_upsert_insert_delete(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before_entries = set(t.manifest().files)
    upd = spark.createDataFrame(
        [
            (2, "a", 222.0, False),   # update
            (7, "d", 70.0, False),    # insert
            (4, "c", 0.0, True),      # delete
        ],
        "id bigint, grp string, v double, _deleted boolean",
    )
    v = t.merge_deferred(upd, ["id"], delete_col="_deleted")
    m = t.manifest(v)
    assert before_entries <= set(m.files)  # zero rewrite
    assert m.summary["n_position_deletes"] == 2  # ids 2 and 4
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {
        (1, "a", 10.0),
        (2, "a", 222.0),
        (3, "b", 30.0),
        (5, None, 50.0),
        (7, "d", 70.0),
    }
    # DataSource agrees.
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp, r.v) for r in ds.collect()} == got
    # Change feed: matched preimages out, upserts in.
    ch = t.changes(v - 1, v).collect()
    assert {(r._change_type, r.id) for r in ch} == {
        ("delete", 2),
        ("delete", 4),
        ("insert", 2),
        ("insert", 7),
    }


def test_merge_deferred_refuses_widening(spark, root):
    from datalakeingestionservice_spark.sinks.versioned import (
        SchemaMismatchError,
    )

    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    wide = spark.createDataFrame(
        [(1, "a", 1.0, "x")],
        "id bigint, grp string, v double, extra string",
    )
    with pytest.raises(SchemaMismatchError):
        t.merge_deferred(wide, ["id"])


def test_rename_column_safe_with_pos_deletes(spark, root):
    """Position deletes reference coordinates, not column names —
    rename is metadata-only and the deletes keep applying."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.update_where_deferred([("id", "=", 1)], {"v": "111.0"})
    t.rename_column("v", "value")
    got = {(r.id, r.value) for r in t.read().collect()}
    assert got == {(1, 111.0), (2, 20.0), (3, 30.0), (4, 40.0),
                   (5, 50.0)}


def test_clone_carries_pos_deletes(spark, root, tmp_path):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.update_where_deferred([("id", "=", 2)], {"v": "0.0"})
    c = t.clone(str(tmp_path / "clone"))
    got = {(r.id, r.v) for r in c.read().collect()}
    assert got == {(1, 10.0), (2, 0.0), (3, 30.0), (4, 40.0), (5, 50.0)}


def test_mixed_sql_and_pos_deferred_deletes(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.delete_where_deferred("id = 5")
    t.update_where_deferred([("id", "=", 1)], {"v": "1.5"})
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(1, 1.5), (2, 20.0), (3, 30.0), (4, 40.0)}
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.v) for r in ds.collect()} == got


def test_pos_deletes_uri_special_partition_values(spark, root):
    """`_metadata.file_path` is a URI: hive dir values with spaces (and
    `%`) arrive percent-encoded, while the sessionless DataSource keys
    coordinates on the PLAIN filesystem relpath. The stored file_rel is
    url-decoded (with `+` kept literal — URI paths leave it unencoded)
    so BOTH read surfaces match. Regression: a space-valued partition's
    deletes were silently unapplied through the DataSource."""
    rows = [
        (1, "NOT SPECIFIED", 10.0),
        (2, "NOT SPECIFIED", 20.0),
        (3, "a+b", 30.0),
        (4, "100%", 40.0),
    ]
    t = VersionedTable.create(
        spark, root, _df(spark, rows), partition_by=["grp"]
    )
    t.update_where_deferred([("id", "<=", 3)], {"v": "0.0"})
    expect = {
        (1, "NOT SPECIFIED", 0.0),
        (2, "NOT SPECIFIED", 0.0),
        (3, "a+b", 0.0),
        (4, "100%", 40.0),
    }
    assert {(r.id, r.grp, r.v) for r in t.read().collect()} == expect
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp, r.v) for r in ds.collect()} == expect


def test_pos_deletes_uri_special_table_root(spark, tmp_path):
    """The TABLE ROOT itself may contain URI-encoded characters (a
    space — '/data/John Doe/lake'): `_metadata.file_path` then encodes
    the root too, so locate() of the plain root over the RAW URI
    returns 0 and the stored coordinates would be offset-garbage that
    the sessionless reader (os.path.relpath, plain) silently never
    matches — deleted rows resurface. The full path is url-decoded
    BEFORE the root is stripped, so both read surfaces agree.
    (ADVICE r7 #2.)"""
    root = str(tmp_path / "John Doe" / "100% lake")
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    t.update_where_deferred([("id", "<=", 2)], {"v": "0.0"})
    t.delete_where_deferred("id = 4")
    expect = {
        (1, "a", 0.0),
        (2, "a", 0.0),
        (3, "b", 30.0),
        (5, None, 50.0),
    }
    assert {(r.id, r.grp, r.v) for r in t.read().collect()} == expect
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.grp, r.v) for r in ds.collect()} == expect


def test_compact_deletes_merges_coordinate_files(spark, root):
    """N streaming-style MoR commits leave N small delete files;
    compact_deletes merges them into ONE without touching a single
    data file — both read surfaces stay exact, time travel still sees
    the old delete files, vacuum collects them after expiry."""
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    for i in (1, 2, 3):
        t.update_where_deferred([("id", "=", i)], {"v": f"{i}00.0"})
    m = t.manifest()
    assert sum(1 for p in m.delete_predicates if "pos" in p) == 3
    data_before = _data_files(root)
    v = t.compact_deletes()
    m2 = t.manifest(v)
    pos = [p for p in m2.delete_predicates if "pos" in p]
    assert len(pos) == 1
    assert m2.summary["n_delete_files_merged"] == 3
    assert m2.summary["n_position_deletes"] == 3
    assert data_before == _data_files(root)  # zero data-file churn
    assert set(m2.files) == set(m.files)
    expect = {
        (1, 100.0), (2, 200.0), (3, 300.0), (4, 40.0), (5, 50.0),
    }
    assert {(r.id, r.v) for r in t.read().collect()} == expect
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert {(r.id, r.v) for r in ds.collect()} == expect
    # Time travel to before the merge still applies the old files.
    assert {(r.id, r.v) for r in t.read(v - 1).collect()} == expect
    # Idempotent: a second call is a no-op, no new version.
    assert t.compact_deletes() == v
    # After expiry, the three retired delete dirs vacuum away; the
    # merged one survives.
    t.expire_versions(keep_last=1)
    removed = t.vacuum()
    assert sum(1 for r in removed if r.startswith("deletes")) == 3
    assert {(r.id, r.v) for r in t.read().collect()} == expect
