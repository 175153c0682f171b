"""Schema TYPE WIDENING (Delta's type-widening shape): merge_schema
appends may widen a column along the safe promotion chains —
tinyint→smallint→int→bigint, float→double, decimal(p,s)→decimal(p',s)
— old files keep their narrow physical type and the explicit read
schema upcasts them in the parquet reader; narrower incoming columns
cast up before writing (files stay homogeneous, DDL unchanged).
"""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    SchemaMismatchError,
    VersionedTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def test_widening_append_evolves_ddl_and_reads_exact(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, 1.5, Decimal("1.25"))],
            "x int, y float, z decimal(5,2)",
        ),
    )
    t.append(
        spark.createDataFrame(
            [(3_000_000_000, 2.5, Decimal("1234567890.12"))],
            "x bigint, y double, z decimal(14,2)",
        ),
        merge_schema=True,
    )
    ddl = t.manifest().schema_ddl
    assert "x:bigint" in ddl and "y:double" in ddl
    assert "decimal(14,2)" in ddl
    got = sorted(
        (r.x, r.y, str(r.z)) for r in t.read().collect()
    )
    assert got == [
        (1, 1.5, "1.25"),
        (3_000_000_000, 2.5, "1234567890.12"),
    ]
    # Time travel still reads the narrow snapshot exactly.
    assert [r.x for r in t.read(1).collect()] == [1]


def test_widening_requires_merge_schema(spark, root):
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "x int")
    )
    with pytest.raises(SchemaMismatchError, match="widens"):
        t.append(spark.createDataFrame([(2,)], "x bigint"))
    # Incompatible retype refuses even WITH merge_schema.
    with pytest.raises(SchemaMismatchError):
        t.append(
            spark.createDataFrame([("s",)], "x string"),
            merge_schema=True,
        )
    # Different decimal SCALE is not on the chain.
    t2 = VersionedTable.create(
        spark,
        root + "2",
        spark.createDataFrame([(Decimal("1.25"),)], "z decimal(5,2)"),
    )
    with pytest.raises(SchemaMismatchError):
        t2.append(
            spark.createDataFrame(
                [(Decimal("1.253"),)], "z decimal(6,3)"
            ),
            merge_schema=True,
        )


def test_narrower_append_casts_up_silently(spark, root):
    """A narrow append needs NO merge_schema flag: values cast up at
    write, the DDL is untouched, and the new files are physically wide
    (homogeneous with the table)."""
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "x bigint")
    )
    t.append(spark.createDataFrame([(2,)], "x int"))
    assert t.manifest().schema_ddl == t.manifest(1).schema_ddl
    assert sorted(r.x for r in t.read().collect()) == [1, 2]


def test_widened_column_pruning_and_dml(spark, root):
    """Stats pruning, predicated reads, scoped DML, and compact all
    work across the mixed-width file generations."""
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "x int, val string"
        ),
    )
    t.append(
        spark.createDataFrame(
            [(3_000_000_000 + i, f"w{i}") for i in range(10)],
            "x bigint, val string",
        ),
        merge_schema=True,
    )
    assert (
        t.read(predicates=[("x", ">=", 3_000_000_000)]).count() == 10
    )
    info = t.prune_info([("x", "<", 100)])
    assert info["n_skipped"] >= 1  # the wide entry refutes via stats
    t.update_where([("x", "=", 5)], {"val": F.lit("U")})
    assert {
        r.val for r in t.read(predicates=[("x", "=", 5)]).collect()
    } == {"U"}
    t.delete_where([("x", ">=", 3_000_000_005)])
    assert t.read().count() == 15
    t.compact(num_partitions=1)
    assert t.read().count() == 15
    assert sorted(r.x for r in t.read().collect())[-1] == 3_000_000_004


def test_widening_through_changes_and_mv(spark, root):
    """The change feed crosses the widening (pre-widening change files
    conform-cast up) and the incremental MV stays equal to a full
    recompute."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )

    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id bigint, grp string, v int"
        ),
        materialize_changes=True,
    )
    mv = IncrementalAggView(
        spark, root, root + "_mv", ["grp"], {"sv": "v"}
    )
    mv.refresh()
    t.merge(
        spark.createDataFrame(
            [(1, "a", 11)], "id bigint, grp string, v int"
        ),
        ["id"],
    )  # narrow-era change file
    t.append(
        spark.createDataFrame(
            [(3, "a", 5_000_000_000)], "id bigint, grp string, v bigint"
        ),
        merge_schema=True,
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


def test_widening_on_partitioned_table(spark, root):
    """Identity-partitioned table widens its DATA column; hive leaves
    with mixed-width files read exactly, partition pruning intact."""
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "x int, grp string"
        ),
        partition_by=["grp"],
    )
    t.append(
        spark.createDataFrame(
            [(4_000_000_000, "a")], "x bigint, grp string"
        ),
        merge_schema=True,
    )
    got = {
        (r.x, r.grp)
        for r in t.read(predicates=[("grp", "=", "a")]).collect()
    }
    assert got == {(1, "a"), (4_000_000_000, "a")}
    info = t.prune_info([("grp", "=", "b")])
    assert info["n_skipped"] >= 1


def test_widening_through_batch_datasource(spark, root):
    """The vectorized DataSource read path casts narrow file columns to
    the pinned wide arrow type."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    t = VersionedTable.create(
        spark, root, spark.createDataFrame([(1, 1.5)], "x int, y float")
    )
    t.append(
        spark.createDataFrame(
            [(6_000_000_000, 3.25)], "x bigint, y double"
        ),
        merge_schema=True,
    )
    got = sorted(
        (r.x, r.y)
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .collect()
    )
    assert got == [(1, 1.5), (6_000_000_000, 3.25)]
    # Pushed filter over the widened column still serves exactly.
    assert (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .filter("x > 100")
        .count()
        == 1
    )


def test_datasource_writer_casts_narrow_append_up(spark, root):
    """The sessionless Arrow writer accepts a NARROWER frame
    (Delta-writer behavior): the task schema normalizes up to the table
    type, batches cast, files land homogeneous, DDL untouched."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(3_000_000_000, Decimal("1.25"))],
            "x bigint, z decimal(14,2)",
        ),
    )
    (
        spark.createDataFrame(
            [(7, Decimal("2.50"))], "x int, z decimal(5,2)"
        )
        .write.format("versioned")
        .mode("append")
        .option("table_root", root)
        .save()
    )
    assert t.manifest().schema_ddl == t.manifest(1).schema_ddl
    got = sorted((r.x, str(r.z)) for r in t.read().collect())
    assert got == [(7, "2.50"), (3_000_000_000, "1.25")]


def test_datasource_writer_widens_with_merge_schema(spark, root):
    """The sessionless writer evolves the table type for a WIDER frame
    under merge_schema (the commit worker widens the manifest DDL
    textually — no SparkSession needed): old narrow files upcast
    through both readers, new files land at the wide type."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, Decimal("1.25"))], "x int, z decimal(5,2)"
        ),
    )
    (
        spark.createDataFrame(
            [(3_000_000_000, Decimal("123456789012.50"))],
            "x bigint, z decimal(14,2)",
        )
        .write.format("versioned")
        .mode("append")
        .option("table_root", root)
        .option("merge_schema", "true")
        .save()
    )
    m = t.manifest()
    assert m.schema_ddl == "struct<x:bigint,z:decimal(14,2)>"
    assert m.summary.get("schema_evolved") is True
    expect = [(1, "1.25"), (3_000_000_000, "123456789012.50")]
    assert sorted((r.x, str(r.z)) for r in t.read().collect()) == expect
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    assert sorted((r.x, str(r.z)) for r in ds.collect()) == expect
    # A widening append may ALSO add a column in the same commit.
    (
        spark.createDataFrame(
            [(5, Decimal("2.00"), "n")],
            "x bigint, z decimal(14,2), note string",
        )
        .write.format("versioned")
        .mode("append")
        .option("table_root", root)
        .option("merge_schema", "true")
        .save()
    )
    assert (
        t.manifest().schema_ddl
        == "struct<x:bigint,z:decimal(14,2),note:string>"
    )
    assert {(r.x, r.note) for r in t.read().collect()} == {
        (1, None), (3_000_000_000, None), (5, "n"),
    }


def test_datasource_writer_widening_needs_merge_schema(spark, root):
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    VersionedTable.create(
        spark, root, spark.createDataFrame([(1,)], "x int")
    )
    with pytest.raises(Exception, match="merge_schema=True"):
        (
            spark.createDataFrame([(3_000_000_000,)], "x bigint")
            .write.format("versioned")
            .mode("append")
            .option("table_root", root)
            .save()
        )
    # Off-chain retype refuses even WITH merge_schema.
    with pytest.raises(Exception, match="table has int"):
        (
            spark.createDataFrame([("s",)], "x string")
            .write.format("versioned")
            .mode("append")
            .option("table_root", root)
            .option("merge_schema", "true")
            .save()
        )
