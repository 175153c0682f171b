"""Batch DataSource over the versioned table (sources/versioned_batch.py):
spark.read.format("versioned") with planner-integrated filter pushdown,
time travel options, hive partition recovery, and exact results."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.versioned_batch import (
    VersionedTableReader,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _banded(spark, root):
    t = None
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 100).select(
            "id", (F.col("id") * 2).alias("v")
        )
        if t is None:
            t = VersionedTable.create(spark, root, df)
        else:
            t.append(df)
    return t


def _load(spark, root, **opts):
    r = spark.read.format("versioned").option("table_root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_format_read_matches_table_read(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = _banded(spark, root)
    df = _load(spark, root)
    assert df.count() == 300
    assert sorted(r.id for r in df.collect()) == sorted(
        r.id for r in t.read().collect()
    )


def test_filter_pushdown_prunes_partitions(spark, tmp_path):
    root = str(tmp_path / "vt")
    _banded(spark, root)
    # Planner path: results exact under a pushed filter.
    got = sorted(
        r.id
        for r in _load(spark, root).filter("id >= 250 AND v < 540").collect()
    )
    assert got == list(range(250, 270))
    # Reader-level proof: the pushed filter shrinks partitions 3 -> 1.
    rd = VersionedTableReader({"table_root": root})
    assert len(rd.partitions()) == 3
    rd2 = VersionedTableReader({"table_root": root})
    from pyspark.sql.datasource import GreaterThanOrEqual

    leftover = list(rd2.pushFilters([GreaterThanOrEqual(("id",), 250)]))
    assert len(leftover) == 1  # conservative: Spark re-applies row-level
    assert len(rd2.partitions()) == 1


def test_time_travel_options(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = _banded(spark, root)
    assert _load(spark, root, version="1").count() == 100
    ts2 = t.manifest(2).committed_at
    assert _load(spark, root, timestamp=ts2).count() == 200


def test_partitioned_and_decimal_roundtrip(spark, tmp_path):
    root = str(tmp_path / "vtp")
    rows = [
        (1, "a", Decimal("1.50")),
        (2, "b", Decimal("2.25")),
        (3, "a", Decimal("3.00")),
    ]
    VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            rows, "id bigint, grp string, amt decimal(10,2)"
        ),
        partition_by=["grp"],
    )
    df = _load(spark, root)
    got = {(r.id, r.grp, str(r.amt)) for r in df.collect()}
    assert got == {(i, g, str(a)) for i, g, a in rows}
    # Partition-column filter prunes from dir names through the same path.
    assert {r.id for r in df.filter("grp = 'a'").collect()} == {1, 3}


def test_deferred_delete_served_with_scoping(spark, tmp_path):
    """Merge-on-read tables are SERVED: the compilable predicate subset
    evaluates executor-side via pyarrow, scoped to the entries recorded
    at delete time — a later append matching the predicate survives."""
    root = str(tmp_path / "vtd")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        ),
    )
    t.delete_where_deferred("id <= 2")
    # Re-append an id the predicate matches: fresh entry, never filtered.
    t.append(spark.createDataFrame([(2, "b2")], "id bigint, val string"))
    got = {(r.id, r.val) for r in _load(spark, root).collect()}
    want = {(r.id, r.val) for r in t.read().collect()}
    assert got == want == {(3, "c"), (2, "b2")}


def test_deferred_delete_stacking_and_null_semantics(spark, tmp_path):
    """Stacked predicates compose; a NULL predicate result deletes the
    row (Spark's filter(~pred) drops NULL), and IS NULL works."""
    root = str(tmp_path / "vtn")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)],
            "id bigint, v double",
        ),
    )
    t.delete_where_deferred("v < 20.0")  # deletes id=1 AND id=2 (NULL)
    t.delete_where_deferred("id = 4")
    got = {(r.id, r.v) for r in _load(spark, root).collect()}
    want = {(r.id, r.v) for r in t.read().collect()}
    assert got == want == {(3, 30.0)}


def test_deferred_delete_pushdown_composes(spark, tmp_path):
    """A pushed Catalyst filter AND a deferred delete both apply."""
    root = str(tmp_path / "vtc")
    t = _banded(spark, root)
    t.delete_where_deferred("v >= 400")  # ids >= 200 gone
    df = _load(spark, root).filter("id >= 150")
    assert sorted(r.id for r in df.collect()) == list(range(150, 200))


def test_unsupported_deferred_predicate_refused(spark, tmp_path):
    root = str(tmp_path / "vtu")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a")], "id bigint, val string"),
    )
    # round 6 widened the subset twice (length/LIKE/arith, then
    # concat/substring/coalesce), so the canonical refusal predicate
    # moved to a still-unsupported function.
    t.delete_where_deferred("regexp_like(val, 'a')")
    with pytest.raises(Exception, match="outside the compilable subset"):
        VersionedTableReader({"table_root": root})
    # compact() materializes and re-enables the source.
    t.compact()
    assert _load(spark, root).count() == 0


def test_batch_source_after_partition_evolution(spark, tmp_path):
    """Old-spec leaves must type their partition fills from the FULL
    schema (regression: typing from the current spec only filled an
    evolved-away int partition column as a string)."""
    root = str(tmp_path / "vtpe")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, 2024), (2, 2025)], "id bigint, yr int"
        ),
        partition_by=["yr"],
    )
    t.set_partition_spec([])
    t.append(spark.createDataFrame([(3, 2026)], "id bigint, yr int"))
    df = _load(spark, root)
    got = {(r.id, r.yr) for r in df.collect()}
    assert got == {(1, 2024), (2, 2025), (3, 2026)}
    # Pruning on the old-spec column stays type-exact.
    assert {r.id for r in df.filter("yr = 2024").collect()} == {1}
    rd = VersionedTableReader({"table_root": root})
    from pyspark.sql.datasource import EqualTo

    list(rd.pushFilters([EqualTo(("yr",), 2024)]))
    assert len(rd.partitions()) <= 2  # the 2025 leaf pruned by dir name


def test_register_table_view_pure_sql(spark, tmp_path):
    """SELECT over the temp view plans through the DataSource (pruning,
    MoR, time travel) from pure SQL text."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register_table_view,
    )

    root = str(tmp_path / "vtv")
    t = _banded(spark, root)
    t.delete_where_deferred("id >= 290")
    register_table_view(spark, "vt_sqlview", root)
    got = spark.sql(
        "SELECT count(*) AS n, sum(v) AS sv FROM vt_sqlview "
        "WHERE id >= 250"
    ).collect()[0]
    assert got.n == 40 and got.sv == sum(2 * i for i in range(250, 290))
    register_table_view(spark, "vt_sqlview_v1", root, version=1)
    assert spark.sql(
        "SELECT count(*) AS n FROM vt_sqlview_v1"
    ).collect()[0].n == 100


def test_case_and_null_safe_deferred_predicates_served(
    spark, tmp_path
):
    """Pass-4/5 predicate forms (<=> and CASE WHEN) recorded as
    deferred deletes serve merge-on-read through the batch DataSource
    with Spark-identical results."""
    root = str(tmp_path / "vtc45")
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [
                (1, "a", 10.0),
                (2, None, 20.0),
                (3, "b", None),
                (4, "a", 40.0),
            ],
            "id bigint, grp string, v double",
        ),
    )
    t.delete_where_deferred("grp <=> 'b'")
    t.delete_where_deferred(
        "CASE WHEN v IS NULL THEN 0.0 ELSE v END >= 40"
    )
    got = {(r.id,) for r in _load(spark, root).collect()}
    want = {(r.id,) for r in t.read().collect()}
    assert got == want == {(1,), (2,)}
