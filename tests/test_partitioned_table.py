"""Hive-style partitioned layout for the versioned table
(sinks/versioned.py `partition_by`): col=value/ leaf dirs as manifest
entries, partition pruning from dir NAMES (zero footer-stat involvement —
works even for types pyarrow can't harvest stats for, like decimal),
partition-aligned merge scoping, and layout preservation through every DML
operation."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    VersionedTable,
    _parse_part_path,
    _typed_part_value,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "pt")


SCHEMA = "id bigint, grp string, d date, amt decimal(10,2)"


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, g, dt.date.fromisoformat(d) if d else None,
             Decimal(a) if a else None)
            for i, g, d, a in rows
        ],
        SCHEMA,
    )


BASE = [
    (1, "a", "2020-01-01", "1.50"),
    (2, "a", "2020-01-02", "2.25"),
    (3, "b", "2020-01-01", "9.99"),
    (4, "b", None, "0.01"),
    (5, "c", "2020-01-03", None),
]


def _rows(t, predicates=None):
    return sorted(
        (r.id, r.grp, r.d, r.amt)
        for r in t.read(predicates=predicates).collect()
    )


def test_roundtrip_equals_unpartitioned(spark, root, tmp_path):
    """Same rows, same schema, same column order — partitioning is purely
    a physical layout choice (including NULL partition values via the
    hive sentinel)."""
    df = _df(spark, BASE)
    t = VersionedTable.create(spark, root, df, partition_by=["grp", "d"])
    u = VersionedTable.create(
        spark, str(tmp_path / "flat"), df
    )
    assert t.read().schema == u.read().schema
    assert _rows(t) == _rows(u)
    # Leaf entries carry their parsed values.
    m = t.manifest()
    assert m.partition_by == ("grp", "d")
    assert all("grp=" in rel for rel in m.files)
    pv = [m.stats[rel]["part_values"] for rel in m.files]
    assert {tuple(sorted(v.items())) for v in pv} == {
        (("d", "2020-01-01"), ("grp", "a")),
        (("d", "2020-01-02"), ("grp", "a")),
        (("d", "2020-01-01"), ("grp", "b")),
        (("d", None), ("grp", "b")),
        (("d", "2020-01-03"), ("grp", "c")),
    }


def test_partition_pruning_from_dir_names(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["grp"]
    )
    info = t.prune_info([("grp", "=", "a")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    assert _rows(t, [("grp", "=", "a")]) == _rows(t)[0:2]
    # Range ops prune too.
    info = t.prune_info([("grp", ">", "b")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2


def test_decimal_partition_prunes_without_stats(spark, root):
    """The headline case dir-name pruning exists for: pyarrow raises
    harvesting decimal footer stats, so a decimal column is UNPRUNABLE by
    stats — but as a partition column the dir name proves its value."""
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["amt"]
    )
    m = t.manifest()
    # Prove stats really are absent for the partition column…
    assert all(
        "amt" not in m.stats[rel].get("columns", {}) for rel in m.files
    )
    # …yet pruning is exact.
    info = t.prune_info([("amt", "=", Decimal("9.99"))])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 4
    got = _rows(t, [("amt", "=", Decimal("9.99"))])
    assert [r[0] for r in got] == [3]
    lo = t.prune_info([("amt", "<", Decimal("2.00"))])
    assert lo["n_scanned"] == 2 and lo["n_skipped"] == 3  # 1.50 and 0.01


def test_null_partition_refutes_comparisons(spark, root):
    """A hive-null leaf matches NO comparison predicate (SQL NULL
    semantics) and is pruned; the rows still read back as NULL."""
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["d"]
    )
    info = t.prune_info([("d", ">=", dt.date(2019, 1, 1))])
    assert info["n_skipped"] == 1  # the d=__HIVE_DEFAULT_PARTITION__ leaf
    assert 4 not in [r[0] for r in _rows(t, [("d", ">=", dt.date(2019, 1, 1))])]
    assert [r[0] for r in _rows(t) if r[2] is None] == [4]


def test_date_partition_datetime_predicate_promotes(spark, root):
    """date-typed partition vs datetime predicate: the date side promotes
    to midnight (SQL semantics) instead of raising or mispruning."""
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["d"]
    )
    preds = [("d", ">=", dt.datetime(2020, 1, 2, 0, 0, 0))]
    info = t.prune_info(preds)
    assert info["n_scanned"] == 2  # 01-02 and 01-03
    assert {r[0] for r in _rows(t, preds)} == {2, 5}


def test_dml_preserves_layout_and_merge_aligns_with_partitions(
    spark, root
):
    """append/merge/delete keep writing hive leaves; a merge whose keys
    lead with the partition column rewrites ONLY the matching partition —
    every other leaf is carried forward physically untouched."""
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["grp"]
    )
    t.append(_df(spark, [(6, "d", "2020-01-04", "4.00")]))
    before = {
        rel: os.path.getmtime(os.path.join(root, rel))
        for rel in t.manifest().files
    }
    n_leaves = len(before)
    assert n_leaves == 4  # a, b, c + appended d

    upd = _df(spark, [(3, "b", "2020-01-01", "99.99")])
    t.merge(upd, ["grp", "id"])
    m = t.manifest()
    assert m.summary["n_dirs_untouched"] == n_leaves - 1
    # Untouched leaves are the SAME paths, not rewrites.
    carried = [rel for rel in m.files if rel in before]
    assert len(carried) == n_leaves - 1
    for rel in carried:
        assert os.path.getmtime(os.path.join(root, rel)) == before[rel]
    # New data landed as a partition leaf of a fresh uuid dir.
    new = [rel for rel in m.files if rel not in before]
    assert new and all("grp=" in rel for rel in new)
    got = {r.id: r.amt for r in t.read().collect()}
    assert got[3] == Decimal("99.99") and len(got) == 6

    t.delete_where(F.col("grp") == "c")
    assert {r.grp for r in t.read().collect()} == {"a", "b", "d"}


def test_schema_evolution_on_partitioned_table(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["grp"]
    )
    evolved = spark.createDataFrame(
        [(7, "a", dt.date(2021, 1, 1), Decimal("5.00"), "extra")],
        SCHEMA + ", note string",
    )
    t.append(evolved, merge_schema=True)
    df = t.read()
    assert "note" in df.columns
    notes = {r.id: r.note for r in df.collect()}
    assert notes[7] == "extra" and notes[1] is None
    # Pruning that removes the evolved leaf keeps the evolved schema.
    pruned = t.read(predicates=[("grp", "=", "b")])
    assert "note" in pruned.columns


def test_time_travel_and_compact_preserve_partitioning(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["grp"]
    )
    v1 = t.latest_version()
    t.append(_df(spark, [(6, "a", "2020-02-01", "7.77")]))
    t.compact(zorder_by=["id"])
    assert len(_rows(t)) == 6
    assert len(t.read(version=v1).collect()) == 5
    # Compact rewrote into hive leaves again; pruning still exact.
    m = t.manifest()
    assert all("grp=" in rel for rel in m.files)
    info = t.prune_info([("grp", "=", "a")])
    assert info["n_skipped"] == len(m.files) - 1


def test_changes_and_stream_serve_partition_columns(spark, root):
    """The change feed (batch and streaming reader) recovers partition
    column VALUES even though the parquet files omit them."""
    from datalakeingestionservice_spark.sources.versioned_changes import (
        VersionedChangesStreamReader,
    )

    t = VersionedTable.create(
        spark, root, _df(spark, BASE[:2]), partition_by=["grp", "amt"]
    )
    t.append(_df(spark, [(8, "z", "2022-05-05", "3.33")]))
    feed = t.changes(1).collect()
    assert {(r.id, r.grp, r.amt) for r in feed} == {
        (8, "z", Decimal("3.33")),
    }
    reader = VersionedChangesStreamReader({"table_root": root})
    parts = reader.partitions(
        {"version": 0}, {"version": t.latest_version()}
    )
    rows = []
    for p in parts:
        for item in reader.read(p):
            if hasattr(item, "num_rows"):  # vectorized: RecordBatch
                cols = [
                    item.column(i).to_pylist()
                    for i in range(item.num_columns)
                ]
                rows.extend(zip(*cols))
            else:  # fallback path: plain tuples
                rows.append(item)
    # Row tuple = data columns in schema order + (_change_type, version).
    by_id = {row[0]: row for row in rows}
    assert by_id[8][1] == "z" and by_id[8][3] == Decimal("3.33")
    assert by_id[1][1] == "a" and by_id[1][3] == Decimal("1.50")


def test_vacuum_keeps_partially_referenced_dirs(spark, root):
    """After a scoped merge carries some leaves of an old uuid dir
    forward, expire+vacuum must NOT delete that dir while any surviving
    manifest references any leaf inside it."""
    t = VersionedTable.create(
        spark, root, _df(spark, BASE), partition_by=["grp"]
    )
    t.merge(_df(spark, [(3, "b", "2020-01-01", "50.00")]), ["grp", "id"])
    t.expire_versions(keep_last=1)
    t.vacuum()
    # Carried-forward leaves (grp=a, grp=c) still live in the ORIGINAL
    # uuid dir; reads must survive the vacuum.
    assert len(_rows(t)) == 5
    assert {r.grp for r in t.read().collect()} == {"a", "b", "c"}


def test_partition_path_parsing_helpers():
    assert _parse_part_path("grp=a/d=2020-01-01") == {
        "grp": "a",
        "d": "2020-01-01",
    }
    assert _parse_part_path("x=__HIVE_DEFAULT_PARTITION__") == {"x": None}
    assert _parse_part_path("s=a%20b%2Fc") == {"s": "a b/c"}
    assert _typed_part_value("1.50", "decimal(10,2)") == Decimal("1.50")
    assert _typed_part_value("42", "bigint") == 42
    assert _typed_part_value("2020-01-01", "date") == dt.date(2020, 1, 1)
    assert _typed_part_value("true", "boolean") is True
    assert _typed_part_value(None, "bigint") is None


def test_invalid_partition_spec_rejected(spark, root):
    df = _df(spark, BASE)
    with pytest.raises(ValueError, match="not in schema"):
        VersionedTable.create(spark, root, df, partition_by=["nope"])
    with pytest.raises(ValueError, match="every column"):
        VersionedTable.create(
            spark, root, df, partition_by=["id", "grp", "d", "amt"]
        )


# -- file-granular scoped merge ---------------------------------------------


def _per_year_files_df(spark):
    """One dir, one FILE per year band: 5 explicit parallelize slices
    (partition i = year i) — deterministic file/key ranges. (A union of
    coalesce(1) pieces does NOT work: Catalyst collapses it back to one
    partition.)"""
    rows = [
        (y * 100 + i, y, (y * 100 + i) * 2)
        for y in range(5)
        for i in range(10)
    ]
    rdd = spark.sparkContext.parallelize(rows, 5)
    return spark.createDataFrame(rdd, "id bigint, yr bigint, val bigint")


def test_file_granular_merge_carries_refuted_files(spark, root):
    """A merge whose keys hit ONE file of a multi-file dir rewrites only
    that file; the others become file entries carried byte-identical."""
    t = VersionedTable.create(spark, root, _per_year_files_df(spark))
    m1 = t.manifest()
    assert len(m1.files) == 1
    fmap = m1.stats[m1.files[0]]["files"]
    assert len(fmap) == 5
    mtimes = {
        fn: os.path.getmtime(os.path.join(root, m1.files[0], fn))
        for fn in fmap
    }

    upd = spark.createDataFrame(
        [(405, 4, 9999)], "id bigint, yr bigint, val bigint"
    )
    t.merge(upd, ["id"])
    m2 = t.manifest()
    s = m2.summary
    assert s["n_dirs_untouched"] == 0
    assert s["n_files_untouched"] == 4
    carried = [rel for rel in m2.files if rel.endswith(".parquet")]
    assert len(carried) == 4
    for rel in carried:
        fn = os.path.basename(rel)
        assert os.path.getmtime(os.path.join(root, rel)) == mtimes[fn]
    # Values: one row updated, everything else intact.
    got = {r.id: r.val for r in t.read().collect()}
    assert got[405] == 9999 and got[404] == 808 and len(got) == 50
    # Predicated reads and later merges work over file entries too.
    assert t.read(predicates=[("id", "<", 100)]).count() == 10
    t.merge(
        spark.createDataFrame(
            [(103, 1, 7)], "id bigint, yr bigint, val bigint"
        ),
        ["id"],
    )
    got2 = {r.id: r.val for r in t.read().collect()}
    assert got2[103] == 7 and got2[405] == 9999 and len(got2) == 50


def test_file_granular_merge_all_files_refuted_is_untouched(spark, root):
    """If the dir envelope matches but EVERY file refutes, the entry is
    reclassified untouched — no read, no rewrite."""
    # Two files: [0,10) and [500,510); envelope [0,510) matches key 200.
    rows = [(i, "x") for i in range(10)] + [
        (i, "x") for i in range(500, 510)
    ]
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 2), "id bigint, v string"
        ),
    )
    t.append(
        spark.createDataFrame([(200, "mid")], "id bigint, v string")
    )
    t.merge(
        spark.createDataFrame([(200, "MID")], "id bigint, v string"),
        ["id"],
    )
    s = t.manifest().summary
    assert s["n_dirs_untouched"] == 1  # the two-file dir, via its files
    got = {r.id: r.v for r in t.read().collect()}
    assert got[200] == "MID" and got[0] == "x" and len(got) == 21


def test_file_entries_survive_compact_and_vacuum(spark, root):
    t = VersionedTable.create(spark, root, _per_year_files_df(spark))
    t.merge(
        spark.createDataFrame(
            [(101, 1, 5)], "id bigint, yr bigint, val bigint"
        ),
        ["id"],
    )
    assert t.manifest().summary["n_files_untouched"] == 4
    t.expire_versions(keep_last=1)
    t.vacuum()  # carried files keep their uuid dir alive
    assert t.read().count() == 50
    t.compact(num_partitions=2)  # defragments file entries
    m = t.manifest()
    assert not any(rel.endswith(".parquet") for rel in m.files)
    t.expire_versions(keep_last=1)
    t.vacuum()
    assert t.read().count() == 50


# -- partition evolution (Iceberg spec-change shape) -------------------------


def test_partition_evolution_unpartitioned_to_partitioned(spark, tmp_path):
    from decimal import Decimal

    root = str(tmp_path / "pe1")
    rows1 = [(1, "a", Decimal("1.00")), (2, "b", Decimal("2.00"))]
    t = VersionedTable.create(
        spark, root,
        spark.createDataFrame(rows1, "id bigint, grp string, amt decimal(10,2)"),
    )
    v = t.set_partition_spec(["grp"])
    assert t.manifest(v).operation == "set_partition_spec"
    assert t.partition_by == ("grp",)
    # New writes lay out hive-style; old entry stays plain. Both read.
    t.append(
        spark.createDataFrame(
            [(3, "a", Decimal("3.00"))],
            "id bigint, grp string, amt decimal(10,2)",
        )
    )
    got = {(r.id, r.grp, str(r.amt)) for r in t.read().collect()}
    assert got == {(1, "a", "1.00"), (2, "b", "2.00"), (3, "a", "3.00")}
    m = t.manifest()
    leafy = [r for r in m.files if "grp=" in r]
    assert len(leafy) == 1  # only the post-evolution append
    # The new leaf prunes by dir NAME; the old entry prunes by stats.
    info = t.prune_info([("grp", "=", "b")])
    assert info["n_skipped"] >= 1
    assert {r.id for r in t.read(predicates=[("grp", "=", "a")]).collect()} == {1, 3}
    # Time travel to the pre-evolution version still works.
    assert t.read(version=1).count() == 2


def test_partition_evolution_away_keeps_old_leaves_readable(spark, tmp_path):
    root = str(tmp_path / "pe2")
    t = VersionedTable.create(
        spark, root,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id bigint, grp string"
        ),
        partition_by=["grp"],
    )
    v = t.set_partition_spec([])
    t.append(spark.createDataFrame([(3, "c")], "id bigint, grp string"))
    # Old hive leaves still recover grp from dir names; the new entry is
    # plain — values must survive the mixed layout.
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # Pruning on the OLD leaves still uses their dir names (type-exact).
    info = t.prune_info([("grp", "=", "a")], version=v)
    assert info["n_skipped"] == 1
    # compact() migrates wholesale to the current (un)spec.
    t.compact()
    assert not any("grp=" in r for r in t.manifest().files)
    assert {(r.id, r.grp) for r in t.read().collect()} == got


def test_partition_evolution_respec_and_feed(spark, tmp_path):
    root = str(tmp_path / "pe3")
    t = VersionedTable.create(
        spark, root,
        spark.createDataFrame(
            [(1, "a", 2024), (2, "b", 2025)], "id bigint, grp string, yr int"
        ),
        partition_by=["grp"],
    )
    t.set_partition_spec(["yr"])
    t.append(
        spark.createDataFrame([(3, "c", 2025)], "id bigint, grp string, yr int")
    )
    # Mixed specs: grp= leaves and yr= leaves coexist; both recover.
    got = {(r.id, r.grp, r.yr) for r in t.read().collect()}
    assert got == {(1, "a", 2024), (2, "b", 2025), (3, "c", 2025)}
    # Pruning works per-entry on EACH spec's column.
    assert t.read(predicates=[("yr", "=", 2024)]).count() == 1
    assert t.read(predicates=[("grp", "=", "c")]).count() == 1
    # Change feed serves the mixed history (spec commit itself is empty).
    feed = t.changes(1)
    assert {(r.id, r._change_type) for r in feed.collect()} == {(3, "insert")}
    # Merge after respec scopes by the entries' own values.
    t.merge(
        spark.createDataFrame([(2, "B", 2025)], "id bigint, grp string, yr int"),
        ["id"],
    )
    assert {(r.id, r.grp) for r in t.read().collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }


def test_partition_evolution_validation(spark, tmp_path):
    root = str(tmp_path / "pe4")
    t = VersionedTable.create(
        spark, root,
        spark.createDataFrame([(1, "a")], "id bigint, grp string"),
        partition_by=["grp"],
    )
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_spec(["nope"])
    with pytest.raises(ValueError, match="already"):
        t.set_partition_spec(["grp"])
    with pytest.raises(ValueError, match="every column"):
        t.set_partition_spec(["grp", "id"])


def test_predicate_scoped_compact(spark, tmp_path):
    """OPTIMIZE WHERE (round 6): compact(where=[...]) rewrites only the
    entries whose stats/partition values may match; everything provably
    outside the predicate carries forward physically untouched."""
    import datetime as dt

    import pyspark.sql.functions as F

    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    root = str(tmp_path / "vtow")
    rows = [
        (i, dt.date(2024, 1 + (i % 3), 1 + i % 5), f"v{i}")
        for i in range(30)
    ]
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(rows, "id bigint, d date, val string"),
        partition_by=["month(d)"],
    )
    # Drip three more commits into the March leaf only.
    for k in range(3):
        t.append(
            spark.createDataFrame(
                [(100 + k, dt.date(2024, 3, 10 + k), f"m{k}")],
                "id bigint, d date, val string",
            )
        )
    pm = t.manifest()
    march_entries = [
        rel
        for rel in pm.files
        if pm.stats[rel]["part_values"].get("d_month") == "2024-03"
    ]
    other_entries = [
        rel for rel in pm.files if rel not in march_entries
    ]
    assert len(march_entries) == 4  # create leaf + 3 drips
    v = t.compact(where=[("d", ">=", dt.date(2024, 3, 1))])
    m2 = t.manifest(v)
    assert m2.summary["n_entries_compacted"] == 4
    assert m2.summary["n_entries_carried"] == len(other_entries)
    # Carried entries are byte-identical rels; March is now one leaf.
    assert set(other_entries) <= set(m2.files)
    new_march = [
        rel
        for rel in m2.files
        if m2.stats[rel]["part_values"].get("d_month") == "2024-03"
    ]
    assert len(new_march) == 1 and not set(new_march) & set(
        march_entries
    )
    # Rows preserved exactly; the feed skips the compact commit.
    got = {(r.id, r.val) for r in t.read().collect()}
    assert len(got) == 33 and (102, "m2") in got
    assert t.changes(v - 1, v).count() == 0
    # A no-op scope (nothing matches twice over) returns the version.
    assert t.compact(where=[("d", ">=", dt.date(2030, 1, 1))]) == v
