"""sinks/sql_dml.py: the DML-statement front door over lake tables.

The reference runs raw SQL DML against its RDBMS; execute_dml routes the
same statements to native engine ops — scoped triple compilation when
the WHERE is a simple conjunction, SQL TRUE-only semantics everywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.sql_dml import (
    UnsupportedStatementError,
    execute_dml,
    execute_sql,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "b", 30.0),
            (4, None, 40.0),
        ],
        "id bigint, grp string, v double",
    )
    return VersionedTable.create(
        spark, str(tmp_path / "vt"), df, partition_by=["grp"]
    )


def test_update_statement_scoped(spark, table):
    before = table.manifest()
    v = execute_dml(
        spark,
        "UPDATE t SET v = v + 1 WHERE grp = 'a'",
        {"t": table},
    )
    m = table.manifest(v)
    # Triple compilation -> partition-scoped rewrite (b + null carried).
    assert m.summary["n_dirs_untouched"] == 2
    assert len(set(before.files) & set(m.files)) == 2
    got = {(r.id, r.v) for r in table.read().collect()}
    assert got == {(1, 11.0), (2, 21.0), (3, 30.0), (4, 40.0)}


def test_update_statement_complex_where_falls_back(spark, table):
    execute_dml(
        spark,
        "UPDATE t SET grp = 'x' WHERE grp IS NULL OR v >= 40",
        {"t": table},
    )
    got = {(r.id, r.grp) for r in table.read().collect()}
    assert got == {(1, "a"), (2, "a"), (3, "b"), (4, "x")}


def test_update_without_where_hits_every_row(spark, table):
    execute_dml(spark, "UPDATE t SET v = 0", {"t": table})
    assert {r.v for r in table.read().collect()} == {0.0}


def test_delete_statement_true_only_semantics(spark, table):
    """`DELETE ... WHERE grp != 'a'` must KEEP the NULL-grp row (SQL
    semantics) even on the fallback Column path."""
    execute_dml(
        spark, "DELETE FROM t WHERE grp != 'a'", {"t": table}
    )
    assert {r.id for r in table.read().collect()} == {1, 2, 4}


def test_delete_statement_scoped_triples(spark, table):
    before = table.manifest()
    v = execute_dml(
        spark, "DELETE FROM t WHERE grp = 'b'", {"t": table}
    )
    m = table.manifest(v)
    assert m.summary["n_dirs_untouched"] == 2
    assert len(set(before.files) & set(m.files)) == 2
    assert {r.id for r in table.read().collect()} == {1, 2, 4}


def test_bare_delete_truncates(spark, table):
    execute_dml(spark, "DELETE FROM t", {"t": table})
    assert table.read().count() == 0
    # Old snapshot still readable (it is a versioned commit, not an rm).
    assert table.read(1).count() == 4


def test_insert_values(spark, table):
    execute_dml(
        spark,
        "INSERT INTO t VALUES (5, 'c', 50.0), (6, 'c', 60.0)",
        {"t": table},
    )
    assert table.read().count() == 6
    assert {
        r.id for r in table.read(predicates=[("grp", "=", "c")]).collect()
    } == {5, 6}


def test_insert_with_column_list_null_fills(spark, table):
    execute_dml(
        spark, "INSERT INTO t (id, v) VALUES (7, 70.5)", {"t": table}
    )
    row = table.read().filter("id = 7").collect()[0]
    assert (row.id, row.grp, row.v) == (7, None, 70.5)


def test_insert_select_from_view(spark, table):
    spark.createDataFrame(
        [(8, "d", 80.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("staging_rows")
    execute_dml(
        spark,
        "INSERT INTO t SELECT id, grp, v FROM staging_rows",
        {"t": table},
    )
    assert table.read().filter("id = 8").count() == 1


def test_insert_casts_to_table_types(spark, table):
    """INSERT VALUES with int literals into a double column casts."""
    execute_dml(
        spark, "INSERT INTO t VALUES (9, 'e', 90)", {"t": table}
    )
    row = table.read().filter("id = 9").collect()[0]
    assert row.v == 90.0 and isinstance(row.v, float)


def test_statement_with_string_containing_where(spark, table):
    execute_dml(
        spark,
        "UPDATE t SET grp = 'WHERE am I' WHERE id = 3",
        {"t": table},
    )
    assert {
        r.grp for r in table.read().filter("id = 3").collect()
    } == {"WHERE am I"}


def test_unsupported_statements_refuse(spark, table):
    for bad in (
        "MERGE INTO t USING s ON t.id = s.id",
        "DROP TABLE t CASCADE",  # bare DROP TABLE deregisters (r8)
        "CREATE VIEW v AS SELECT 1",
        "SELECT * FROM t",
        "UPDATE nope SET v = 1",
        "INSERT INTO t GARBAGE",
        "UPDATE t SET WHERE id = 1",
    ):
        with pytest.raises(UnsupportedStatementError):
            execute_dml(spark, bad, {"t": table})


def test_roots_accepted_in_table_map(spark, table):
    v = execute_dml(
        spark,
        "DELETE FROM trades WHERE id = 1",
        {"trades": table.root},
    )
    assert v == 2
    assert {r.id for r in table.read().collect()} == {2, 3, 4}


def test_merge_statement_full_form(spark, table):
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_merge,
    )

    spark.createDataFrame(
        [(2, "a", 99.0, False), (5, "c", 50.0, False), (3, "b", 0.0, True)],
        "id bigint, grp string, v double, deleted boolean",
    ).createOrReplaceTempView("merge_src")
    execute_merge(
        spark,
        """MERGE INTO t USING merge_src AS s ON t.id = s.id
           WHEN MATCHED AND s.deleted THEN DELETE
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"t": table},
    )
    got = {(r.id, r.v) for r in table.read().collect()}
    # 2 updated, 3 deleted, 5 inserted, 1/4 untouched.
    assert got == {(1, 10.0), (2, 99.0), (4, 40.0), (5, 50.0)}


def test_merge_statement_without_delete_clause(spark, table):
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_merge,
    )

    spark.createDataFrame(
        [(1, "a", -1.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("merge_src2")
    execute_merge(
        spark,
        "MERGE INTO t AS tgt USING merge_src2 src ON tgt.id = src.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": table},
    )
    assert (1, -1.0) in {(r.id, r.v) for r in table.read().collect()}
    assert table.read().count() == 4


def test_merge_statement_subset_refusals(spark, table):
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_merge,
    )

    spark.createDataFrame(
        [(1, "a", 1.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("merge_src3")
    for bad in (
        # column-level assignment
        "MERGE INTO t USING merge_src3 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
        # inequality ON
        "MERGE INTO t USING merge_src3 s ON t.id > s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        # cross-named ON columns
        "MERGE INTO t USING merge_src3 s ON t.id = s.grp "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        # missing INSERT arm
        "MERGE INTO t USING merge_src3 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET *",
        # unconditioned DELETE
        "MERGE INTO t USING merge_src3 s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    ):
        with pytest.raises(UnsupportedStatementError):
            execute_merge(spark, bad, {"t": table})


def test_merge_unconsumed_when_clause_refuses(spark, table):
    """Every WHEN clause must be RECOGNIZED, not merely the recognized
    ones executed: `WHEN NOT MATCHED BY SOURCE THEN DELETE` is outside
    the subset and must refuse — silently dropping it would run the
    statement as a plain upsert and lose the delete semantics."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_merge,
    )

    spark.createDataFrame(
        [(1, "a", 1.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("merge_src4")
    before = table.latest_version()
    with pytest.raises(UnsupportedStatementError, match="recognized"):
        execute_merge(
            spark,
            "MERGE INTO t USING merge_src4 s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
            {"t": table},
        )
    # Refused BEFORE committing anything.
    assert table.latest_version() == before
    # A condition containing extra WHENs (CASE WHEN) also refuses rather
    # than being reinterpreted.
    with pytest.raises(UnsupportedStatementError):
        execute_merge(
            spark,
            "MERGE INTO t USING merge_src4 s ON t.id = s.id "
            "WHEN MATCHED AND CASE WHEN s.v > 0 THEN true END "
            "THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": table},
        )


def test_insert_overwrite_unpartitioned_truncates_and_loads(
    spark, tmp_path
):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "flat"),
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, grp string, v double"
        ),
    )
    execute_dml(
        spark,
        "INSERT OVERWRITE flat VALUES (9, 'z', 9.0)",
        {"flat": t},
    )
    assert {(r.id, r.grp) for r in t.read().collect()} == {(9, "z")}
    assert t.read(1).count() == 2  # time travel intact


def test_insert_overwrite_partitioned_is_dynamic(spark, table):
    """INSERT OVERWRITE on a partitioned table replaces exactly the
    partitions present in the result set."""
    spark.createDataFrame(
        [(10, "a", 1.0), (11, "zz", 2.0)],
        "id bigint, grp string, v double",
    ).createOrReplaceTempView("ow_src")
    execute_dml(
        spark,
        "INSERT OVERWRITE t SELECT id, grp, v FROM ow_src",
        {"t": table},
    )
    got = {(r.id, r.grp) for r in table.read().collect()}
    # 'a' replaced (ids 1,2 gone), 'zz' added, b + null carried.
    assert got == {
        (10, "a"), (11, "zz"), (3, "b"), (4, None),
    }


def test_replace_where_statement(spark, table):
    spark.createDataFrame(
        [(10, "a", 1.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("rw_src")
    before = table.manifest()
    v = execute_dml(
        spark,
        "INSERT INTO t REPLACE WHERE grp = 'a' "
        "SELECT id, grp, v FROM rw_src",
        {"t": table},
    )
    m = table.manifest(v)
    assert m.operation == "overwrite_where"
    assert m.summary["n_dirs_untouched"] == 2
    assert len(set(before.files) & set(m.files)) == 2
    got = {(r.id, r.grp) for r in table.read().collect()}
    assert got == {(10, "a"), (3, "b"), (4, None)}


def test_replace_where_statement_refusals(spark, table):
    # Rows outside the region refuse (from overwrite_where).
    spark.createDataFrame(
        [(10, "b", 1.0)], "id bigint, grp string, v double"
    ).createOrReplaceTempView("rw_bad")
    with pytest.raises(ValueError, match="outside the replaced region"):
        execute_dml(
            spark,
            "INSERT INTO t REPLACE WHERE grp = 'a' "
            "SELECT id, grp, v FROM rw_bad",
            {"t": table},
        )
    # Non-triple region predicate refuses driver-side.
    with pytest.raises(
        UnsupportedStatementError, match="REPLACE WHERE"
    ):
        execute_dml(
            spark,
            "INSERT INTO t REPLACE WHERE grp IS NULL "
            "SELECT id, grp, v FROM rw_bad",
            {"t": table},
        )


def test_create_table_as_select_and_drop(spark, tmp_path):
    """CTAS through the front door: the SELECT resolves through
    execute_select (time travel included), the result becomes v1 of a
    new versioned table registered under the statement name; DROP TABLE
    deregisters the NAME only — data is never deleted."""
    import os

    src = VersionedTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(10)],
            "k bigint, g string, v double",
        ),
    )
    tables = {"src": src}
    loc = str(tmp_path / "agg")
    v = execute_sql(
        spark,
        f"CREATE TABLE agg USING versioned LOCATION '{loc}' "
        "PARTITIONED BY (g) "
        "AS SELECT g, CAST(sum(v) AS DOUBLE) AS s FROM src GROUP BY g",
        tables,
    )
    assert v == 1 and "agg" in tables
    assert tables["agg"].partition_by == ("g",)
    got = execute_sql(
        spark, "SELECT g, s FROM agg ORDER BY g", tables
    ).collect()
    assert [(r.g, r.s) for r in got] == [("a", 20.0), ("b", 25.0)]
    # CTAS sources compose with time travel
    src.append(
        spark.createDataFrame(
            [(100, "a", 1.0)], "k bigint, g string, v double"
        )
    )
    execute_sql(
        spark,
        f"CREATE TABLE snap USING versioned LOCATION "
        f"'{tmp_path / 'snap'}' AS SELECT * FROM src VERSION AS OF 1",
        tables,
    )
    assert (
        execute_sql(
            spark, "SELECT count(*) AS n FROM snap", tables
        ).collect()[0].n
        == 10
    )
    # refusals: duplicate name, occupied location
    with pytest.raises(UnsupportedStatementError, match="already regi"):
        execute_sql(
            spark,
            f"CREATE TABLE agg USING versioned LOCATION "
            f"'{tmp_path / 'x'}' AS SELECT 1 AS a",
            tables,
        )
    with pytest.raises(UnsupportedStatementError, match="already holds"):
        execute_sql(
            spark,
            f"CREATE TABLE dup USING versioned LOCATION '{loc}' "
            "AS SELECT 1 AS a",
            tables,
        )
    # DROP = deregistration only
    execute_sql(spark, "DROP TABLE agg", tables)
    assert "agg" not in tables
    assert os.path.isdir(os.path.join(loc, "_manifests"))
    with pytest.raises(UnsupportedStatementError, match="unknown table"):
        execute_sql(spark, "DROP TABLE agg", tables)


def test_ctas_over_table_changes(spark, tmp_path):
    """Statement composition: CTAS materializing a change feed — the
    CDC-to-table idiom in two statements."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double"),
    )
    tables = {"t": t}
    execute_sql(spark, "UPDATE t SET v = v + 1.0 WHERE k = 1", tables)
    execute_sql(
        spark,
        f"CREATE TABLE feed USING versioned LOCATION "
        f"'{tmp_path / 'feed'}' AS "
        "SELECT k, v, _change_type, _commit_version "
        "FROM table_changes('t', 1)",
        tables,
    )
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in execute_sql(
            spark, "SELECT * FROM feed", tables
        ).collect()
    )
    assert got == [(1, 10.0, "delete"), (1, 11.0, "insert")]
