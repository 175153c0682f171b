"""df.write.format("versioned") — the DataSource WRITE path
(sources/versioned_batch.py VersionedTableWriter + sinks/versioned.py
append_staged): executor-staged parquet published through the table's
commit protocol, zero-copy for plain appends, falling back to the
rewriting append when the table's physical contract demands it."""

from __future__ import annotations

import datetime as dt
import os
import time
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.versioned_batch import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _write(df, root, mode="append", **opts):
    w = df.write.format("versioned").mode(mode).option("table_root", root)
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


TYPED_DDL = (
    "id bigint, name string, amt decimal(10,2), d date, ts timestamp, "
    "flag boolean, raw binary, tags array<string>"
)
TYPED_ROWS = [
    (1, "a", Decimal("1.50"), dt.date(2024, 1, 1),
     dt.datetime(2024, 1, 1, 10, 30), True, b"\x01\x02", ["x", "y"]),
    (2, None, Decimal("-2.25"), None,
     dt.datetime(2024, 6, 1, 0, 0, 0, 123456), False, None, []),
    (3, "c", None, dt.date(2025, 2, 28), None, None, b"", None),
]


def test_create_on_first_write_full_type_roundtrip(spark, tmp_path):
    root = str(tmp_path / "vw")
    df = spark.createDataFrame(TYPED_ROWS, TYPED_DDL)
    _write(df, root)
    t = VersionedTable(spark, root)
    back = t.read()
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_append_is_zero_copy(spark, tmp_path):
    root = str(tmp_path / "vw")
    t = VersionedTable.create(
        spark, root, spark.range(0, 100).select("id")
    )
    _write(spark.range(100, 200).select("id"), root)
    t2 = VersionedTable(spark, root)
    assert t2.manifest().summary.get("staged") is True  # moved, not rewritten
    assert sorted(r.id for r in t2.read().collect()) == list(range(200))
    # No staging leftovers.
    sdir = os.path.join(root, "_staging")
    assert not os.path.isdir(sdir) or os.listdir(sdir) == []


def test_overwrite_mode(spark, tmp_path):
    root = str(tmp_path / "vw")
    VersionedTable.create(spark, root, spark.range(0, 50).select("id"))
    _write(spark.range(500, 510).select("id"), root, mode="overwrite")
    t = VersionedTable(spark, root)
    assert sorted(r.id for r in t.read().collect()) == list(range(500, 510))
    # History survives: version 1 still reads the original rows.
    assert t.read(1).count() == 50


def test_writer_appends_to_column_mapped_table(spark, tmp_path):
    """The writer serves column-mapped tables: incoming LOGICAL frames
    land as files carrying PHYSICAL names, so old and new files stay
    join-compatible and reads translate uniformly."""
    root2 = str(tmp_path / "vwm2")
    t2 = VersionedTable.create(
        spark, root2, spark.createDataFrame([(1, "a")], "id bigint, v string")
    )
    t2.rename_column("v", "val")
    _write(
        spark.createDataFrame([(2, "b")], "id bigint, val string"),
        root2,
    )
    t = VersionedTable(spark, root2)
    assert t.manifest().summary.get("staged") is True
    assert sorted((r.id, r.val) for r in t.read().collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # The staged file physically carries the OLD (physical) name.
    import pyarrow.parquet as pq

    rel = [e for e in t.manifest().files][-1]
    import glob as _glob

    f = sorted(
        _glob.glob(os.path.join(root2, rel, "*.parquet"))
    )[0]
    assert "v" in pq.read_schema(f).names
    assert "val" not in pq.read_schema(f).names


def test_writer_mapped_partitioned_bloom_table(spark, tmp_path):
    """Mapping composes with partitioning and blooms through the
    writer: renamed partition column writes OLD-physical dir names,
    renamed bloom column folds under the physical stats key, and both
    pruning paths keep working on the logical predicate."""
    root = str(tmp_path / "vwmpb")
    df = spark.range(0, 40).select(
        "id", (F.col("id") % 2).cast("int").alias("grp")
    )
    t = VersionedTable.create(
        spark, root, df, partition_by=["grp"], bloom_columns=["id"]
    )
    t.rename_column("grp", "bucket")
    t.rename_column("id", "doc_id")
    _write(
        spark.range(40, 80).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("int").alias("bucket"),
        ),
        root,
    )
    t = VersionedTable(spark, root)
    assert sorted(r.doc_id for r in t.read().collect()) == list(range(80))
    # Partition pruning on the NEW logical name, across both commits.
    info = t.prune_info([("bucket", "=", 0)])
    assert info["n_skipped"] >= 2
    assert {
        r.doc_id for r in t.read(predicates=[("bucket", "=", 0)]).collect()
    } == {i for i in range(80) if i % 2 == 0}
    # Bloom pruning on the renamed column: 41 is odd -> lives only in
    # the writer-written bucket=1 leaf; the even leaves bloom/dir-prune.
    info = t.prune_info([("doc_id", "=", 41)])
    assert info["n_scanned"] == 1
    # New physical dir names use the OLD physical column name.
    rel = [e for e in t.manifest().files][-1]
    assert "grp=" in rel and "bucket=" not in rel


def test_writer_mapped_merge_schema_collision_guard(spark, tmp_path):
    """Adding a column (merge_schema) whose name collides with a
    retired/renamed physical name must refuse — old files still carry
    data under that physical name."""
    root = str(tmp_path / "vwmc")
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1, "a")], "id bigint, v string")
    )
    t.rename_column("v", "val")
    with pytest.raises(Exception, match="collides"):
        _write(
            spark.createDataFrame(
                [(2, "b", "x")], "id bigint, val string, v string"
            ),
            root,
            merge_schema="true",
        )


def test_writer_appends_to_partitioned_table_with_leaf_layout(
    spark, tmp_path
):
    """Appending to a hive-partitioned table through the writer: tasks
    split rows into `col=value/` leaves themselves, each leaf becomes
    its own manifest entry with part_values, and dir-name pruning works
    across API-written and writer-written commits identically."""
    root = str(tmp_path / "vwp")
    df = spark.range(0, 40).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    t = VersionedTable.create(spark, root, df, partition_by=["grp"])
    _write(
        spark.range(40, 80).select(
            "id", (F.col("id") % 4).cast("int").alias("grp")
        ),
        root,
    )
    t2 = VersionedTable(spark, root)
    assert t2.manifest().summary.get("staged") is True
    assert len(t2.manifest().files) == 8  # 4 leaves x 2 commits
    assert sorted(r.id for r in t2.read().collect()) == list(range(80))
    info = t2.prune_info([("grp", "=", 1)])
    assert info["n_skipped"] >= 6  # 3 other leaves x 2 commits
    assert {
        r.id for r in t2.read(predicates=[("grp", "=", 1)]).collect()
    } == {i for i in range(80) if i % 4 == 1}


def test_writer_creates_partitioned_table_typed_values(spark, tmp_path):
    """create-on-first-write with partition_by: decimal/date/null
    partition values round-trip through the hive dir names (escaping +
    sentinel), read back typed, and prune from dir names."""
    import datetime as dt
    from decimal import Decimal as D

    root = str(tmp_path / "vwcp")
    rows = [
        (1, D("1.50"), dt.date(2024, 1, 1), "a b/c"),
        (2, D("2.25"), None, "plain"),
        (3, None, dt.date(2025, 6, 1), "x=y:z"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, amt decimal(10,2), d date, s string"
    )
    _write(df, root, partition_by="amt,d")
    t = VersionedTable(spark, root)
    assert t.partition_by == ("amt", "d")
    got = {
        (r.id, str(r.amt), r.d, r.s) for r in t.read().collect()
    }
    assert got == {(i, str(a), d, s) for i, a, d, s in rows}
    # Decimal partition pruning works purely from dir names (pyarrow
    # can't even harvest decimal footer stats).
    info = t.prune_info([("amt", "=", D("1.50"))])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    assert {
        r.id
        for r in t.read(predicates=[("amt", "=", D("1.50"))]).collect()
    } == {1}


def test_writer_partitioned_per_leaf_blooms(spark, tmp_path):
    """Writer-built partitioned commits carry PER-LEAF blooms (each
    task folds positions per leaf): a point lookup on a non-partition
    column prunes sibling leaves from a writer-created table."""
    root = str(tmp_path / "vwpb")
    df = spark.range(0, 400).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    _write(df, root, partition_by="grp", bloom_columns="id")
    t = VersionedTable(spark, root)
    for probe in (17, 243):
        info = t.prune_info([("id", "=", probe)])
        assert info["n_scanned"] == 1 and info["n_skipped"] == 3, probe
    info = t.prune_info([("id", "=", 401)])
    assert info["n_scanned"] == 0


def test_writer_create_with_bloom_option_builds_blooms(spark, tmp_path):
    """Blooms survive the sessionless path: tasks fold their rows' bit
    positions, commit ORs them — probes prune exactly like the
    Spark-side aggregate."""
    root = str(tmp_path / "vwc")
    _write(spark.range(0, 40).select("id"), root, bloom_columns="id")
    t = VersionedTable(spark, root)
    assert t.manifest().bloom_columns == ("id",)
    _write(spark.range(100, 140).select("id"), root)
    # id=7 lives only in the first entry; the second bloom-refutes it.
    info = t.prune_info([("id", "=", 7)])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 1
    info = t.prune_info([("id", "=", 999)])
    assert info["n_scanned"] == 0  # absent value prunes everything
    assert sorted(r.id for r in t.read().collect()) == sorted(
        list(range(40)) + list(range(100, 140))
    )


def test_append_staged_fallback_for_partitioned_table(spark, tmp_path):
    """The session API `append_staged` handles what the writer refuses:
    staged flat parquet appends to a hive-partitioned table via ONE
    rewrite, preserving layout + pruning."""
    root = str(tmp_path / "vwfb")
    df = spark.range(0, 40).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    t = VersionedTable.create(spark, root, df, partition_by=["grp"])
    staging = str(tmp_path / "stagefb")
    spark.range(40, 80).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    ).write.parquet(staging)
    t.append_staged(staging)
    assert not os.path.exists(staging)  # consumed either way
    assert sorted(r.id for r in t.read().collect()) == list(range(80))
    info = t.prune_info([("grp", "=", 1)])
    assert info["n_skipped"] >= 6  # 3 other leaves x 2 commits
    assert {
        r.id for r in t.read(predicates=[("grp", "=", 1)]).collect()
    } == {i for i in range(80) if i % 4 == 1}


def test_merge_schema_option(spark, tmp_path):
    root = str(tmp_path / "vwm")
    VersionedTable.create(
        spark, root,
        spark.createDataFrame([(1, "a")], "id bigint, name string"),
    )
    wide = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    )
    with pytest.raises(Exception, match="merge_schema"):
        _write(wide, root)
    _write(wide, root, merge_schema="true")
    t = VersionedTable(spark, root)
    got = {(r.id, r.name, r.score) for r in t.read().collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}


def test_constraints_enforced_through_writer(spark, tmp_path):
    root = str(tmp_path / "vwk")
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "id bigint")
    )
    t.add_check_constraint("id_positive", "id > 0")
    v_before = t.latest_version()
    with pytest.raises(Exception, match="id_positive"):
        _write(spark.createDataFrame([(-5,)], "id bigint"), root)
    assert VersionedTable(spark, root).latest_version() == v_before
    _write(spark.createDataFrame([(7,)], "id bigint"), root)
    assert {r.id for r in VersionedTable(spark, root).read().collect()} == {
        1,
        7,
    }


def test_empty_write_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "vwe")
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "id bigint")
    )
    _write(spark.createDataFrame([], "id bigint"), root)
    assert VersionedTable(spark, root).latest_version() == t.latest_version()


def test_vacuum_reclaims_orphaned_staging(spark, tmp_path):
    root = str(tmp_path / "vws")
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "id bigint")
    )
    orphan = os.path.join(root, "_staging", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"torn")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    reclaimed = t.vacuum(claim_timeout_s=3600)
    assert os.path.join("_staging", "deadbeef") in reclaimed
    assert not os.path.exists(orphan)
    # A FRESH staging dir (in-flight writer) is left alone.
    fresh = os.path.join(root, "_staging", "inflight")
    os.makedirs(fresh)
    t.vacuum(claim_timeout_s=3600)
    assert os.path.exists(fresh)


def test_writer_append_to_merge_on_read_table(spark, tmp_path):
    """A writer append to a table carrying live deferred-delete
    predicates: the new entry is UNSCOPED (fresh rel no predicate
    records), so its rows survive even when they match — and the commit
    carries the predicate set forward for the old entries."""
    root = str(tmp_path / "vwmor")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        ),
    )
    t.delete_where_deferred("id <= 2")
    _write(
        spark.createDataFrame([(2, "b2")], "id bigint, val string"), root
    )
    t = VersionedTable(spark, root)
    assert len(t.manifest().delete_predicates) == 1  # carried forward
    got = {(r.id, r.val) for r in t.read().collect()}
    assert got == {(3, "c"), (2, "b2")}
    # The MoR-serving DataSource read agrees.
    ds = {
        (r.id, r.val)
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .collect()
    }
    assert ds == got


def test_writer_rolls_files_at_rows_per_file(spark, tmp_path):
    """One long task must not produce one unbounded file: rows_per_file
    rolls the staged file, each rolled file gets its own footer stats
    (file-granular pruning), and read parity holds."""
    import glob as _glob

    root = str(tmp_path / "vwr")
    df = spark.range(0, 40).coalesce(1).select("id")  # ONE task
    _write(df, root, rows_per_file="15")
    t = VersionedTable(spark, root)
    rel = t.manifest().files[0]
    files = _glob.glob(os.path.join(root, rel, "*.parquet"))
    assert len(files) == 3  # ceil(40/15)
    assert sorted(r.id for r in t.read().collect()) == list(range(40))
    # Per-file stats landed for every rolled file.
    fstats = t.manifest().stats[rel]["files"]
    assert len(fstats) == 3
    assert sum(f["rows"] for f in fstats.values()) == 40


def test_writer_overwrite_feed_is_deferred_not_lost(spark, tmp_path):
    """A writer overwrite is a feed-less COW commit, NOT an undefined
    one: batch changes() diffs it lazily, and materialize_changes()
    backfills the change files for the streaming source (cdf_skipped
    would have blocked the backfill)."""
    root = str(tmp_path / "vwof")
    VersionedTable.create(
        spark, root,
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"),
    )
    _write(
        spark.createDataFrame([(2, "b"), (3, "c")], "id bigint, v string"),
        root,
        mode="overwrite",
    )
    t = VersionedTable(spark, root)
    assert "cdf_skipped" not in t.manifest().summary
    feed = {
        (r.id, r.v, r._change_type) for r in t.changes(1, 2).collect()
    }
    assert feed == {(1, "a", "delete"), (3, "c", "insert")}
    done = t.materialize_changes()
    assert set(done) == {2}
    assert t.manifest(2).summary.get("cdf")
    # Post-backfill feed identical.
    assert {
        (r.id, r.v, r._change_type) for r in t.changes(1, 2).collect()
    } == feed


def test_writer_overwrite_partitioned_table(spark, tmp_path):
    """Writer overwrite on a hive-partitioned table replaces the
    snapshot under the SAME spec: new leaf entries, pruning intact."""
    root = str(tmp_path / "vwop")
    t = VersionedTable.create(
        spark,
        root,
        spark.range(0, 20).select(
            "id", (F.col("id") % 2).cast("int").alias("grp")
        ),
        partition_by=["grp"],
    )
    _write(
        spark.range(100, 110).select(
            "id", (F.col("id") % 2).cast("int").alias("grp")
        ),
        root,
        mode="overwrite",
    )
    t = VersionedTable(spark, root)
    assert sorted(r.id for r in t.read().collect()) == list(range(100, 110))
    assert t.read(1).count() == 20  # history survives
    info = t.prune_info([("grp", "=", 0)])
    assert info["n_skipped"] >= 1
    assert {
        r.id for r in t.read(predicates=[("grp", "=", 0)]).collect()
    } == {i for i in range(100, 110) if i % 2 == 0}


def test_commit_publishes_only_listed_files(spark, tmp_path):
    """A failed-then-retried (or speculatively-executed) task attempt
    leaves its completed files in the SHARED staging dir. Commit must
    publish exactly the files the surviving commit messages list —
    renaming the whole staging dir would silently commit the losing
    attempt's duplicate rows alongside the winner's."""
    from conftest import _ab
    from pyspark.sql.types import StructType

    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableWriter,
    )

    root = str(tmp_path / "vwretry")
    schema = StructType.fromDDL("id bigint, v string")
    w = VersionedTableWriter({"table_root": root}, schema, overwrite=False)
    # "Losing" attempt: finished its file, but Spark discarded its
    # commit message (task retry / speculation).
    w.write(_ab(schema, [(900, "dup"), (901, "dup")]))
    winning = w.write(_ab(schema, [(1, "a"), (2, "b")]))
    w.commit([winning])
    t = VersionedTable(spark, root)
    assert sorted((r.id, r.v) for r in t.read().collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # The losing attempt's bytes are gone with the staging dir.
    sdir = os.path.join(root, "_staging")
    assert not os.path.isdir(sdir) or os.listdir(sdir) == []


def test_empty_overwrite_truncates(spark, tmp_path):
    """Spark/Delta overwrite semantics: an overwrite with zero rows
    REPLACES the snapshot (truncate), unlike an empty append (no-op)."""
    root = str(tmp_path / "vweot")
    VersionedTable.create(
        spark, root, spark.createDataFrame([(1,), (2,)], "id bigint")
    )
    _write(spark.createDataFrame([], "id bigint"), root, mode="overwrite")
    t = VersionedTable(spark, root)
    assert t.read().count() == 0
    assert t.read(1).count() == 2  # time travel still sees the old rows


def test_empty_overwrite_creates_empty_table(spark, tmp_path):
    root = str(tmp_path / "vweoc")
    _write(spark.createDataFrame([], "id bigint"), root, mode="overwrite")
    t = VersionedTable(spark, root)
    assert t.read().count() == 0
    assert t.read().schema.simpleString() == "struct<id:bigint>"
    # And the created (empty) table accepts ordinary appends.
    _write(spark.createDataFrame([(5,)], "id bigint"), root)
    assert [r.id for r in VersionedTable(spark, root).read().collect()] == [5]


def test_constraint_on_absent_column_null_passes(spark, tmp_path):
    """A CHECK referencing a table column the merge_schema append
    doesn't carry evaluates with that column NULL -> passes (SQL CHECK
    semantics), instead of KeyError-ing executor-side."""
    root = str(tmp_path / "vwcabs")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame([(1, 10)], "id bigint, score int"),
    )
    t.add_check_constraint("score_pos", "score > 0")
    _write(
        spark.createDataFrame([(2, "x")], "id bigint, extra string"),
        root,
        merge_schema="true",
    )
    got = {
        (r.id, r.score)
        for r in VersionedTable(spark, root).read().collect()
    }
    assert got == {(1, 10), (2, None)}
    # The constraint still bites when the column IS present.
    with pytest.raises(Exception, match="score_pos"):
        _write(
            spark.createDataFrame([(3, -4)], "id bigint, score int"), root
        )


def test_rowgroup_envelopes_prune_disjoint_files(spark, tmp_path):
    """Row-group-granular skipping (round 6): a file whose FILE-level
    envelope matches a predicate is still skipped at planning when every
    one of its row-group envelopes refutes it (clustered files holding
    disjoint ranges — the z-order/sorted-write shape). The manifest
    carries per-group envelopes harvested in the same footer pass."""
    from conftest import _ab
    from pyspark.sql.types import StructType

    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableWriter,
    )

    root = str(tmp_path / "vwrg")
    schema = StructType.fromDDL("id bigint")
    w = VersionedTableWriter({"table_root": root}, schema, overwrite=False)
    # Two exact 64k batches -> the writer's row-group buffer flushes at
    # each -> ONE file, TWO row groups: [0..65535] and [131072..196607].
    b1 = next(_ab(schema, [(i,) for i in range(65536)]))
    b2 = next(_ab(schema, [(i,) for i in range(131072, 196608)]))
    w.commit([w.write(iter([b1, b2]))])
    t = VersionedTable(spark, root)
    (stats,) = t.manifest().stats.values()
    (fs,) = stats["files"].values()
    assert [rg["rows"] for rg in fs["rgs"]] == [65536, 65536]
    # Probe INSIDE the file envelope but inside the inter-group gap:
    # file [0, 196607] matches, both groups refute -> file skipped.
    info = t.prune_info([("id", "=", 100000)])
    assert info["n_files_skipped"] == 1 and info["n_files_scanned"] == 0
    assert t.read(predicates=[("id", "=", 100000)]).count() == 0
    # A probe inside group 2 keeps the file and reports the skipped
    # group at row-group granularity.
    info2 = t.prune_info([("id", "=", 140000)])
    assert info2["n_files_scanned"] == 1
    assert info2["n_rowgroups_skipped"] == 1
    assert info2["n_rowgroups_scanned"] == 1
    assert t.read(predicates=[("id", "=", 140000)]).count() == 1
    # And through the batch DataSource (same _file_may_match path).
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert ds.filter("id = 100000").count() == 0
    assert ds.filter("id = 140000").count() == 1


def test_widened_constraints_compile_through_writer(spark, tmp_path):
    """Round-6 predicate widening reaches the writer's CHECK compiler:
    LIKE and arithmetic constraints that previously refused with 'write
    via the VersionedTable API' now enforce executor-side."""
    root = str(tmp_path / "vwlike")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "ord-1", 10)], "id bigint, code string, qty int"
        ),
    )
    t.add_check_constraint("code_shape", "code LIKE 'ord-%'")
    t.add_check_constraint("qty_even_bound", "qty * 2 <= 100")
    _write(
        spark.createDataFrame(
            [(2, "ord-2", 50)], "id bigint, code string, qty int"
        ),
        root,
    )
    with pytest.raises(Exception, match="code_shape"):
        _write(
            spark.createDataFrame(
                [(3, "bad-3", 1)], "id bigint, code string, qty int"
            ),
            root,
        )
    with pytest.raises(Exception, match="qty_even_bound"):
        _write(
            spark.createDataFrame(
                [(4, "ord-4", 51)], "id bigint, code string, qty int"
            ),
            root,
        )
    assert {
        r.id for r in VersionedTable(spark, root).read().collect()
    } == {1, 2}


def test_struct_and_map_columns_roundtrip_through_writer(spark, tmp_path):
    """Nested types (struct/map/array-of-struct) write through the
    Arrow DataSource writer and read back vectorized through the batch
    DataSource — bit-identical to the session read."""
    root = str(tmp_path / "vwnested")
    ddl = (
        "id bigint, st struct<x:int,y:string>, "
        "mp map<string,bigint>, arr array<struct<a:int>>"
    )
    rows = [
        (1, (7, "u"), {"k1": 10, "k2": 20}, [(1,), (2,)]),
        (2, (None, "v"), {}, []),
        (3, None, None, None),
    ]
    df = spark.createDataFrame(rows, ddl)
    _write(df, root)
    t = VersionedTable(spark, root)
    back = t.read()
    assert back.schema == df.schema
    canon = lambda frame: sorted(  # noqa: E731
        (
            r.id,
            (r.st.x, r.st.y) if r.st is not None else None,
            sorted(r.mp.items()) if r.mp is not None else None,
            [a.a for a in r.arr] if r.arr is not None else None,
        )
        for r in frame.collect()
    )
    assert canon(back) == canon(df)
    ds = (
        spark.read.format("versioned").option("table_root", root).load()
    )
    assert ds.schema == df.schema
    assert canon(ds) == canon(df)
    # A CHECK on a struct field enforces through the writer too.
    t.add_check_constraint("x_small", "st.x < 100")
    _write(
        spark.createDataFrame(
            [(4, (50, "w"), None, None)], ddl
        ),
        root,
    )
    with pytest.raises(Exception, match="x_small"):
        _write(
            spark.createDataFrame([(5, (500, "z"), None, None)], ddl),
            root,
        )
    assert VersionedTable(spark, root).read().count() == 4
