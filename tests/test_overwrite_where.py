"""overwrite_where (Delta's replaceWhere) and overwrite_partitions
(dynamic partition overwrite): atomically replace a region's contents,
stats-scoped, with the rest of the table carried byte-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConcurrentCommitError,
    SchemaMismatchError,
    VersionedTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, rows, ddl="id bigint, grp string, v double"):
    return spark.createDataFrame(rows, ddl)


ROWS = [
    (1, "a", 10.0),
    (2, "a", 20.0),
    (3, "b", 30.0),
    (4, "c", 40.0),
    (5, None, 50.0),
]


def test_replace_where_swaps_region_atomically(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before = t.manifest()
    v = t.overwrite_where(
        _df(spark, [(10, "a", 1.0), (11, "a", 2.0), (12, "a", 3.0)]),
        [("grp", "=", "a")],
    )
    m = t.manifest(v)
    assert m.operation == "overwrite_where"
    # b, c, and the null leaf carried byte-identically.
    assert m.summary["n_dirs_untouched"] == 3
    assert len(set(before.files) & set(m.files)) == 3
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert got == {
        (10, "a"), (11, "a"), (12, "a"),
        (3, "b"), (4, "c"), (5, None),
    }
    # Old snapshot intact.
    assert t.read(v - 1).count() == 5


def test_replace_where_refuses_rows_outside_region(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    with pytest.raises(ValueError, match="outside the replaced region"):
        t.overwrite_where(
            _df(spark, [(10, "b", 1.0)]), [("grp", "=", "a")]
        )
    # NULL-predicate rows count as outside (TRUE-only).
    with pytest.raises(ValueError, match="outside the replaced region"):
        t.overwrite_where(
            _df(spark, [(10, None, 1.0)]), [("grp", "=", "a")]
        )
    assert t.latest_version() == 1


def test_replace_where_range_predicate_keeps_survivors(spark, root):
    """An unpartitioned table: the envelope-matched entry rewrites its
    SURVIVING rows alongside the new data — nothing outside the region
    is lost."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.overwrite_where(
        _df(spark, [(20, "z", 15.0)]),
        [("v", ">=", 10.0), ("v", "<", 30.0)],
    )
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(20, 15.0), (3, 30.0), (4, 40.0), (5, 50.0)}


def test_replace_where_change_feed_replays(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        _df(spark, ROWS),
        partition_by=["grp"],
        materialize_changes=True,
    )
    v = t.overwrite_where(
        _df(spark, [(10, "b", 99.0)]), [("grp", "=", "b")]
    )
    ch = t.changes(v - 1, v)
    dels = {(r.id,) for r in ch.filter("_change_type = 'delete'").collect()}
    ins = {(r.id,) for r in ch.filter("_change_type = 'insert'").collect()}
    assert dels == {(3,)} and ins == {(10,)}


def test_replace_where_snapshot_isolated(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    v0 = t.latest_version()
    t.append(_df(spark, [(6, "a", 60.0)]))
    with pytest.raises(ConcurrentCommitError):
        t.overwrite_where(
            _df(spark, [(10, "a", 1.0)]),
            [("grp", "=", "a")],
            expected_version=v0,
        )
    t.overwrite_where(_df(spark, [(10, "a", 1.0)]), [("grp", "=", "a")])
    assert {
        r.id for r in t.read(predicates=[("grp", "=", "a")]).collect()
    } == {10}


def test_dynamic_partition_overwrite(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before = t.manifest()
    v = t.overwrite_partitions(
        _df(spark, [(10, "a", 1.0), (11, "c", 2.0), (12, "d", 3.0)])
    )
    m = t.manifest(v)
    # b + null carried; a and c replaced; d is brand new.
    assert m.summary["n_dirs_untouched"] == 2
    assert m.summary["n_partitions_replaced"] == 3
    assert len(set(before.files) & set(m.files)) == 2
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert got == {
        (10, "a"), (11, "c"), (12, "d"), (3, "b"), (5, None),
    }


def test_dynamic_overwrite_null_partition_replaces(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    t.overwrite_partitions(_df(spark, [(10, None, 1.0)]))
    got = {(r.id, r.grp) for r in t.read().collect()}
    assert (10, None) in got and (5, None) not in got
    assert len(got) == 5


def test_dynamic_overwrite_enforces_schema(spark, root):
    """overwrite_partitions validates + casts the frame against the
    manifest schema like append/overwrite_where do: a narrower frame
    casts up, a retyped or extra-column frame refuses — it must never
    write data files inconsistent with the manifest schema."""
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    # Narrow (int id, float v) casts up to the table's bigint/double.
    t.overwrite_partitions(
        spark.createDataFrame(
            [(100, "a", 7.5)], "id int, grp string, v float"
        )
    )
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert (100, "a", 7.5) in got and (1, "a", 10.0) not in got
    assert dict(t.read().dtypes)["id"] == "bigint"
    # Extra column refuses (no silent drop, no inconsistent files).
    with pytest.raises(SchemaMismatchError):
        t.overwrite_partitions(
            spark.createDataFrame(
                [(1, "a", 1.0, "x")],
                "id bigint, grp string, v double, extra string",
            )
        )
    # Incompatibly retyped column refuses.
    with pytest.raises(SchemaMismatchError):
        t.overwrite_partitions(
            spark.createDataFrame(
                [(1, "a", "oops")], "id bigint, grp string, v string"
            )
        )


def test_dynamic_overwrite_refuses_unpartitioned(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    with pytest.raises(ValueError, match="partitioned table"):
        t.overwrite_partitions(_df(spark, [(1, "a", 1.0)]))


def _dated(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, d string"
    ).select("id", F.col("d").cast("date").alias("d"))


def test_dynamic_overwrite_transform_spec(spark, root):
    """Hidden partitioning + dynamic overwrite: the replaced leaves
    derive from the incoming frame's TRANSFORM values — no alias
    columns in user code (Iceberg's behavior)."""
    t = VersionedTable.create(
        spark,
        root,
        _dated(
            spark,
            [
                (1, "2024-01-05"), (2, "2024-01-20"),
                (3, "2024-02-10"), (4, "2024-03-01"),
            ],
        ),
        partition_by=["month(d)"],
    )
    before = set(t.manifest().files)
    v = t.overwrite_partitions(
        _dated(spark, [(30, "2024-02-02"), (31, "2024-02-28")])
    )
    m = t.manifest(v)
    assert m.summary["n_partitions_replaced"] == 1
    # Jan and Mar leaves carried byte-identically.
    assert len(before & set(m.files)) == 2
    got = {(r.id, str(r.d)) for r in t.read().collect()}
    assert got == {
        (1, "2024-01-05"), (2, "2024-01-20"),
        (30, "2024-02-02"), (31, "2024-02-28"),
        (4, "2024-03-01"),
    }


def test_dynamic_overwrite_bucket_spec(spark, root):
    """bucket(N, id): final state = old rows whose bucket is NOT among
    the incoming rows' buckets, plus the incoming rows — verified
    against the engine's own bucket assignment."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
    )

    old = [(i, "x", float(i)) for i in range(20)]
    t = VersionedTable.create(
        spark, root, _df(spark, old), partition_by=["bucket(4, id)"]
    )
    new = [(100, "n", 1.0), (101, "n", 2.0)]
    t.overwrite_partitions(_df(spark, new))
    bucket_of = {
        r.id: r.b
        for r in _df(spark, old + new)
        .select("id", _transform_expr("bucket", 4, "id", "bigint").alias("b"))
        .collect()
    }
    new_buckets = {bucket_of[100], bucket_of[101]}
    want = {
        (i, g, v)
        for i, g, v in old
        if bucket_of[i] not in new_buckets
    } | set(new)
    assert {(r.id, r.grp, r.v) for r in t.read().collect()} == want


def test_dynamic_overwrite_mixed_identity_transform(spark, root):
    df0 = spark.createDataFrame(
        [
            (1, "a", "2024-01-05"), (2, "a", "2024-02-05"),
            (3, "b", "2024-01-05"),
        ],
        "id bigint, grp string, d string",
    ).select("id", "grp", F.col("d").cast("date").alias("d"))
    t = VersionedTable.create(
        spark, root, df0, partition_by=["grp", "month(d)"]
    )
    repl = spark.createDataFrame(
        [(10, "a", "2024-01-20")], "id bigint, grp string, d string"
    ).select("id", "grp", F.col("d").cast("date").alias("d"))
    t.overwrite_partitions(repl)
    got = {(r.id, r.grp, str(r.d)) for r in t.read().collect()}
    assert got == {
        (10, "a", "2024-01-20"),   # replaced (a, 2024-01)
        (2, "a", "2024-02-05"),
        (3, "b", "2024-01-05"),
    }


def test_dynamic_overwrite_spec_evolution_refuses_then_compact(
    spark, root
):
    t = VersionedTable.create(
        spark,
        root,
        _df(spark, [(i, "x", float(i)) for i in range(8)]),
        partition_by=["bucket(4, id)"],
    )
    t.set_partition_spec(["bucket(8, id)"])
    # Old-modulus leaves are uncomparable under the new spec.
    with pytest.raises(ValueError, match="different partition spec"):
        t.overwrite_partitions(_df(spark, [(100, "n", 1.0)]))
    t.compact()
    t.overwrite_partitions(_df(spark, [(100, "n", 1.0)]))
    assert (100, "n", 1.0) in {
        (r.id, r.grp, r.v) for r in t.read().collect()
    }


def test_dynamic_overwrite_feed_and_mv(spark, root):
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )

    rows = [r for r in ROWS if r[1] is not None]
    t = VersionedTable.create(
        spark,
        root,
        _df(spark, rows),
        partition_by=["grp"],
        materialize_changes=True,
    )
    mv = IncrementalAggView(
        spark, root, root + "_mv", ["grp"], {"sv": "v"}
    )
    mv.refresh()
    t.overwrite_partitions(
        _df(spark, [(10, "a", 100.0), (11, "d", 1.0)])
    )
    mv.refresh()
    got = {tuple(r) for r in mv.read().collect()}
    want = {
        tuple(r)
        for r in t.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == want
