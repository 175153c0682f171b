"""SQL SELECT front door with Delta-style time travel
(`sinks/sql_dml.py` `execute_select` / `execute_sql`): ship SELECT text
at registered versioned tables; each FROM/JOIN reference resolves to a
MoR-served snapshot read, `VERSION AS OF` / `TIMESTAMP AS OF` pin
per-reference snapshots, the original name survives as an alias so
qualified column references and cross-version self-joins work verbatim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.sql_dml import (
    UnsupportedStatementError,
    execute_select,
    execute_sql,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def t(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id bigint, grp string, v double",
    )
    return VersionedTable.create(spark, str(tmp_path / "t"), df)


def test_plain_select(spark, t):
    got = execute_select(
        spark,
        "SELECT grp, sum(v) AS s FROM t GROUP BY grp ORDER BY grp",
        {"t": t},
    ).collect()
    assert [(r.grp, r.s) for r in got] == [("a", 30.0), ("b", 30.0)]


def test_version_as_of(spark, t):
    t.append(
        spark.createDataFrame([(4, "c", 40.0)], "id bigint, grp string, v double")
    )
    v1 = execute_select(
        spark, "SELECT count(*) AS n FROM t VERSION AS OF 1", {"t": t}
    ).collect()[0].n
    v2 = execute_select(
        spark, "SELECT count(*) AS n FROM t", {"t": t}
    ).collect()[0].n
    assert (v1, v2) == (3, 4)


def test_timestamp_as_of(spark, t):
    ts1 = t.manifest(1).committed_at
    t.append(
        spark.createDataFrame([(4, "c", 40.0)], "id bigint, grp string, v double")
    )
    n = execute_select(
        spark,
        f"SELECT count(*) AS n FROM t TIMESTAMP AS OF '{ts1}'",
        {"t": t},
    ).collect()[0].n
    assert n == 3


def test_cross_version_self_join(spark, t):
    """Old and new snapshots of the SAME table join in one statement —
    the per-reference pinning Delta/Iceberg users expect."""
    t.update_where([("id", "=", 1)], {"v": "111.0"})
    got = execute_select(
        spark,
        "SELECT cur.id, cur.v AS v_now, old.v AS v_then "
        "FROM t cur JOIN t VERSION AS OF 1 AS old ON cur.id = old.id "
        "WHERE cur.v <> old.v",
        {"t": t},
    ).collect()
    assert [(r.id, r.v_now, r.v_then) for r in got] == [(1, 111.0, 10.0)]


def test_literal_containing_from_ref_not_rewritten(spark, t):
    """A quoted literal containing 'FROM <registered-name>' must pass
    through VERBATIM — the reference-rewrite runs over a masked copy of
    the statement, so quoted text can never be mistaken for a table
    reference. (ADVICE r7 #3.)"""
    got = execute_select(
        spark,
        "SELECT id, 'FROM t' AS note FROM t WHERE grp = 'a' "
        "ORDER BY id",
        {"t": t},
    ).collect()
    assert [(r.id, r.note) for r in got] == [
        (1, "FROM t"), (2, "FROM t"),
    ]
    # ... and in WHERE position, where corruption would change rows
    n = execute_select(
        spark,
        "SELECT count(*) AS n FROM t WHERE grp <> 'JOIN t'",
        {"t": t},
    ).collect()[0].n
    assert n == 3


def test_comment_containing_ref_not_rewritten_but_timestamp_still_read(
    spark, t
):
    """Comments are masked too; a quoted TIMESTAMP AS OF value (itself
    a literal the mask blanks) is still recovered exactly from the
    original text via match spans."""
    ts1 = t.manifest(1).committed_at
    t.append(
        spark.createDataFrame(
            [(4, "c", 40.0)], "id bigint, grp string, v double"
        )
    )
    n = execute_select(
        spark,
        "SELECT count(*) AS n -- not a ref: FROM t\n"
        f"FROM t TIMESTAMP AS OF '{ts1}' /* JOIN t */",
        {"t": t},
    ).collect()[0].n
    assert n == 3


def test_qualified_refs_and_where_not_swallowed(spark, t):
    # `WHERE` directly after the ref must not parse as an alias; the
    # table name stays usable as a qualifier.
    got = execute_select(
        spark,
        "SELECT t.id FROM t WHERE t.grp = 'b'",
        {"t": t},
    ).collect()
    assert [r.id for r in got] == [3]


def test_mor_deletes_served(spark, t):
    t.delete_where_deferred("grp = 'a'")
    t.update_where_deferred([("id", "=", 3)], {"v": "333.0"})
    got = execute_select(
        spark, "SELECT id, v FROM t ORDER BY id", {"t": t}
    ).collect()
    assert [(r.id, r.v) for r in got] == [(3, 333.0)]


def test_cte_and_registered_view_mix(spark, t):
    got = execute_select(
        spark,
        "WITH big AS (SELECT * FROM t WHERE v >= 20.0) "
        "SELECT count(*) AS n FROM big",
        {"t": t},
    ).collect()[0].n
    assert got == 2


def test_execute_sql_dispatch(spark, t):
    v = execute_sql(
        spark, "UPDATE t SET v = v + 1.0 WHERE grp = 'a'", {"t": t}
    )
    assert isinstance(v, int) and v == 2
    df = execute_sql(spark, "SELECT sum(v) AS s FROM t", {"t": t})
    assert df.collect()[0].s == 62.0


def test_non_select_refuses(spark, t):
    with pytest.raises(UnsupportedStatementError):
        execute_select(spark, "DROP TABLE t", {"t": t})


def test_unregistered_name_fails_loudly(spark, t):
    # A name outside `tables` is not rewritten; Spark resolution raises
    # (refusal, never a silently-wrong result).
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        execute_select(spark, "SELECT * FROM nope", {"t": t})


def test_no_view_leak(spark, t):
    before = {v.name for v in spark.catalog.listTables()}
    execute_select(spark, "SELECT count(*) AS n FROM t", {"t": t}).collect()
    after = {v.name for v in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("__vt_")}


def test_no_view_leak_on_mid_rewrite_failure(spark, t):
    """ADVICE r8: a reference that fails resolution AFTER earlier
    references already materialized views (first ref valid, second ref
    names an unknown branch/version) must not leak those views."""
    before = {v.name for v in spark.catalog.listTables()}
    for bad in (
        "SELECT * FROM t AS x JOIN t BRANCH 'nope' AS y ON x.id = y.id",
        "SELECT * FROM t AS x JOIN t VERSION AS OF 99 AS y ON x.id = y.id",
        "SELECT * FROM t AS x JOIN t TAG 'nope' AS y ON x.id = y.id",
    ):
        with pytest.raises(Exception):
            execute_select(spark, bad, {"t": t})
    after = {v.name for v in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("__vt")}


def test_optimize_and_vacuum_statements(spark, t):
    # Fragment the table, then OPTIMIZE via statement.
    t.append(
        spark.createDataFrame([(4, "c", 40.0)], "id bigint, grp string, v double")
    )
    n_entries = len(t.manifest().files)
    v = execute_sql(spark, "OPTIMIZE t", {"t": t})
    assert len(t.manifest(v).files) < n_entries
    assert t.read().count() == 4
    # OPTIMIZE WHERE must triple-compile.
    from datalakeingestionservice_spark.sinks.sql_dml import (
        UnsupportedStatementError,
        execute_dml,
    )

    with pytest.raises(UnsupportedStatementError, match="OPTIMIZE WHERE"):
        execute_dml(spark, "OPTIMIZE t WHERE id % 2 = 0", {"t": t})
    # VACUUM RETAIN expires history then collects.
    before = t.latest_version()
    execute_sql(spark, "VACUUM t RETAIN 1 VERSIONS", {"t": t})
    assert t.latest_version() == before
    with pytest.raises(Exception):
        t.read(1)  # expired


def test_optimize_zorder_statement(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(200)],
        "a bigint, b bigint, v double",
    )
    t = VersionedTable.create(spark, str(tmp_path / "z"), df)
    v = execute_sql(
        spark, "OPTIMIZE z ZORDER BY (a, b)", {"z": t}
    )
    assert t.manifest(v).operation == "compact"
    assert t.read().count() == 200


def test_describe_history_statement(spark, t):
    t.append(
        spark.createDataFrame(
            [(4, "c", 40.0)], "id bigint, grp string, v double"
        )
    )
    rows = execute_sql(spark, "DESCRIBE HISTORY t", {"t": t}).collect()
    # Newest-first, full log.
    assert [r.version for r in rows] == [2, 1]
    assert rows[0].operation == "append"
    assert rows[1].operation == "create"
    limited = execute_sql(
        spark, "DESC HISTORY t LIMIT 1", {"t": t}
    ).collect()
    assert [r.version for r in limited] == [2]


def test_describe_detail_statement(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id bigint, grp string, v double"
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "d"), df, partition_by=["grp"]
    )
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    r = execute_sql(spark, "DESCRIBE DETAIL d", {"d": t}).collect()
    assert len(r) == 1
    r = r[0]
    assert r.format == "versioned"
    assert r.location == t.root
    assert r.version == t.latest_version()
    assert r.partition_columns == ["grp"]
    assert r.num_equality_delete_files == 1
    assert r.num_position_delete_files == 0
    assert "id" in r.schema_ddl
    with pytest.raises(UnsupportedStatementError, match="no LIMIT"):
        execute_sql(spark, "DESCRIBE DETAIL d LIMIT 2", {"d": t})


def test_describe_unknown_refuses(spark, t):
    with pytest.raises(UnsupportedStatementError):
        execute_sql(spark, "DESCRIBE EXTENDED t", {"t": t})
    with pytest.raises(UnsupportedStatementError, match="unknown table"):
        execute_sql(spark, "DESCRIBE HISTORY nope", {"t": t})


def test_restore_statement(spark, t):
    t.append(
        spark.createDataFrame(
            [(4, "c", 40.0)], "id bigint, grp string, v double"
        )
    )
    ts1 = t.manifest(1).committed_at
    v = execute_sql(spark, "RESTORE TABLE t TO VERSION AS OF 1", {"t": t})
    assert v == 3 and t.read().count() == 3
    # Undone versions stay time-travelable.
    assert t.read(2).count() == 4
    v = execute_sql(
        spark, f"RESTORE t TO TIMESTAMP AS OF '{ts1}'", {"t": t}
    )
    assert t.read().count() == 3
    with pytest.raises(UnsupportedStatementError):
        execute_sql(spark, "RESTORE TABLE t", {"t": t})


def test_alter_table_statements(spark, t):
    from datalakeingestionservice_spark.sinks.sql_dml import execute_dml

    execute_dml(
        spark, "ALTER TABLE t RENAME COLUMN v TO amount", {"t": t}
    )
    assert "amount" in t.read().columns and "v" not in t.read().columns
    execute_dml(
        spark,
        "ALTER TABLE t ADD CONSTRAINT amt_pos CHECK (amount > 0)",
        {"t": t},
    )
    with pytest.raises(Exception, match="amt_pos"):
        t.append(
            spark.createDataFrame(
                [(9, "z", -1.0)], "id bigint, grp string, amount double"
            )
        )
    execute_dml(
        spark, "ALTER TABLE t DROP CONSTRAINT amt_pos", {"t": t}
    )
    t.append(
        spark.createDataFrame(
            [(9, "z", -1.0)], "id bigint, grp string, amount double"
        )
    )
    execute_dml(spark, "ALTER TABLE t DROP COLUMN grp", {"t": t})
    assert set(t.read().columns) == {"id", "amount"}
    with pytest.raises(UnsupportedStatementError, match="ALTER TABLE subset"):
        execute_dml(
            spark, "ALTER TABLE t SET TBLPROPERTIES ('a'='b')", {"t": t}
        )


def test_table_changes_tvf(spark, t):
    """`table_changes('t', v1 [, v2])` in FROM/JOIN position routes to
    `changes()` verbatim (exclusive of v1, inclusive of v2) and the
    view composes with joins, aliases, and the rest of the statement."""
    t.update_where([("id", "=", 1)], {"v": "111.0"})  # v2
    t.delete_where([("id", "=", 2)])  # v3
    got = execute_select(
        spark,
        "SELECT _commit_version AS cv, _change_type AS ct, id "
        "FROM table_changes('t', 1) ORDER BY cv, ct, id",
        {"t": t},
    ).collect()
    assert [(r.cv, r.ct, r.id) for r in got] == [
        (2, "delete", 1),
        (2, "insert", 1),
        (3, "delete", 2),
    ]
    # bounded range + alias + join back to the current snapshot
    got = execute_select(
        spark,
        "SELECT c.id, cur.v FROM table_changes('t', 1, 2) c "
        "JOIN t cur ON c.id = cur.id "
        "WHERE c._change_type = 'insert'",
        {"t": t},
    ).collect()
    assert [(r.id, r.v) for r in got] == [(1, 111.0)]


def test_table_changes_literal_not_rewritten(spark, t):
    """A quoted literal containing table_changes(...) is opaque to the
    rewrite — refuse-never-reinterpret extends to the TVF pass."""
    n = execute_select(
        spark,
        "SELECT count(*) AS n FROM t "
        "WHERE grp <> \"table_changes('t', 1)\"",
        {"t": t},
    ).collect()[0].n
    assert n == 3


def test_table_changes_refusals(spark, t):
    for bad in (
        "SELECT * FROM table_changes(t, 1)",  # unquoted name
        "SELECT * FROM table_changes('t', '2024-01-01')",  # non-int
        "SELECT * FROM table_changes('t')",  # missing version
    ):
        with pytest.raises(UnsupportedStatementError):
            execute_select(spark, bad, {"t": t})
    with pytest.raises(UnsupportedStatementError, match="unknown table"):
        execute_select(
            spark, "SELECT * FROM table_changes('nope', 1)", {"t": t}
        )
    # refusal leaves no helper views behind
    assert not [
        v for v in spark.catalog.listTables() if v.name.startswith("__vt")
    ]
