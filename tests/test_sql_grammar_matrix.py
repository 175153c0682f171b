"""Front-door statement grammar MATRIX (VERDICT r9 #7): every documented
statement form and every documented refusal of `sinks/sql_dml.py`, in one
table-driven sweep — so future grammar growth can't silently drop a form
or a refusal path. Each case runs against a FRESH table; ok-cases verify
an observable effect, refuse-cases verify the exception AND that the
table did not move (refuse-never-reinterpret).

Forms covered: UPDATE (triple/expr/no-WHERE/multi-assign), DELETE
(where/truncate), INSERT (VALUES/column-list/SELECT), INSERT OVERWRITE,
REPLACE WHERE, MERGE (upsert + flag-guarded DELETE), OPTIMIZE
([WHERE] [ZORDER BY]), VACUUM [RETAIN], RESTORE (VERSION/TIMESTAMP),
ALTER TABLE (rename/drop/add column [DEFAULT], SET/DROP DEFAULT,
ADD/DROP CONSTRAINT, CREATE/DROP/PUBLISH BRANCH, CREATE/DROP TAG),
CTAS [PARTITIONED BY], DROP TABLE, SELECT/WITH (+ VERSION/TIMESTAMP AS
OF, BRANCH, TAG, table_changes TVF), DESCRIBE HISTORY/DETAIL.
"""

from __future__ import annotations

import os

import pytest

from datalakeingestionservice_spark.sinks.sql_dml import (
    UnsupportedStatementError,
    execute_sql,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _mk(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")],
            "k bigint, v double, s string",
        ),
    )
    return {"t": t}


def _rows(tables, name="t"):
    return {
        (r.k, r.v, r.s)
        for r in tables[name].read().select("k", "v", "s").collect()
    }


# -- setup helpers (each itself goes through the front door where a
#    statement form exists; native APIs only where none does) --------------

def _setup_v2(spark, tables, tmp_path):
    execute_sql(spark, "UPDATE t SET v = 5.0 WHERE k = 1", tables)


def _setup_branch(spark, tables, tmp_path):
    execute_sql(spark, "ALTER TABLE t CREATE BRANCH dev", tables)


def _setup_branch_ahead(spark, tables, tmp_path):
    # no statement form writes to a table branch; use the native API
    b = tables["t"].create_branch("dev")
    b.append(
        spark.createDataFrame([(9, 9.0, "z")], "k bigint, v double, s string")
    )


def _setup_tag(spark, tables, tmp_path):
    execute_sql(spark, "ALTER TABLE t CREATE TAG rel", tables)


def _setup_default(spark, tables, tmp_path):
    execute_sql(spark, "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'dd'", tables)


def _setup_constraint(spark, tables, tmp_path):
    execute_sql(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)", tables)


def _setup_ctas(spark, tables, tmp_path):
    execute_sql(
        spark,
        f"CREATE TABLE m USING VERSIONED LOCATION "
        f"'{tmp_path / 'm'}' AS SELECT k, v FROM t",
        tables,
    )


def _setup_merge_views(spark, tables, tmp_path):
    spark.createDataFrame(
        [(2, 20.0, "B"), (4, 4.0, "d")], "k bigint, v double, s string"
    ).createOrReplaceTempView("msrc")
    spark.createDataFrame(
        [(2, 0.0, "x", True), (5, 5.0, "e", False)],
        "k bigint, v double, s string, dflag boolean",
    ).createOrReplaceTempView("mdel")


def _setup_star(spark, tables, tmp_path):
    tables["f"] = VersionedTable.create(
        spark,
        str(tmp_path / "gf"),
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 10)], "fk bigint, ck bigint"
        ),
    )
    tables["customer"] = VersionedTable.create(
        spark,
        str(tmp_path / "gc"),
        spark.createDataFrame(
            [(10, 100), (20, 200)], "ck bigint, nk bigint"
        ),
    )
    tables["nation"] = VersionedTable.create(
        spark,
        str(tmp_path / "gn"),
        spark.createDataFrame(
            [(100, "US"), (200, "DE")], "nk bigint, nname string"
        ),
    )


def _setup_sidx(spark, tables, tmp_path):
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX six ON t (k, s) "
        f"LOCATION '{tmp_path / 'gsix'}'",
        tables,
    )


# -- the matrix -------------------------------------------------------------
# (id, setup, sql, expect, check) — expect: "ok" | exception class;
# check(result, tables) runs for ok-cases.

CASES = [
    # --- UPDATE family
    ("update_triple", None, "UPDATE t SET v = 0.5 WHERE k = 1", "ok",
     lambda r, tb: (1, 0.5, "a") in _rows(tb)),
    ("update_expr_fallback", None,
     "UPDATE t SET v = v + 1 WHERE s LIKE 'a%'", "ok",
     lambda r, tb: (1, 2.0, "a") in _rows(tb)),
    ("update_all_rows", None, "UPDATE t SET v = 9.0", "ok",
     lambda r, tb: {x[1] for x in _rows(tb)} == {9.0}),
    ("update_multi_assign", None,
     "UPDATE t SET v = 1.5, s = 'z' WHERE k = 2", "ok",
     lambda r, tb: (2, 1.5, "z") in _rows(tb)),
    # --- DELETE family
    ("delete_where", None, "DELETE FROM t WHERE k = 1", "ok",
     lambda r, tb: {x[0] for x in _rows(tb)} == {2, 3}),
    ("delete_truncate", None, "DELETE FROM t", "ok",
     lambda r, tb: tb["t"].read().count() == 0),
    # --- INSERT family
    ("insert_values", None,
     "INSERT INTO t VALUES (10, 1.5, 'x'), (11, 2.5, 'y')", "ok",
     lambda r, tb: {10, 11} <= {x[0] for x in _rows(tb)}),
    ("insert_column_list", None,
     "INSERT INTO t (k, s) VALUES (12, 'z')", "ok",
     lambda r, tb: (12, None, "z") in _rows(tb)),
    ("insert_select", None, "INSERT INTO t SELECT 13, 3.5, 'w'", "ok",
     lambda r, tb: (13, 3.5, "w") in _rows(tb)),
    ("insert_fills_write_default", _setup_default,
     "INSERT INTO t (k, v) VALUES (14, 4.5)", "ok",
     lambda r, tb: (14, 4.5, "dd") in _rows(tb)),
    ("insert_overwrite_values", None,
     "INSERT OVERWRITE t VALUES (1, 1.0, 'only')", "ok",
     lambda r, tb: _rows(tb) == {(1, 1.0, "only")}),
    ("insert_overwrite_table_kw", None,
     "INSERT OVERWRITE TABLE t SELECT 2, 2.0, 'o2'", "ok",
     lambda r, tb: _rows(tb) == {(2, 2.0, "o2")}),
    ("replace_where", None,
     "INSERT INTO t REPLACE WHERE k >= 3 VALUES (7, 7.0, 'r')", "ok",
     lambda r, tb: _rows(tb)
     == {(1, 1.0, "a"), (2, 2.0, "b"), (7, 7.0, "r")}),
    # --- MERGE family
    ("merge_upsert", _setup_merge_views,
     "MERGE INTO t USING msrc AS s ON t.k = s.k "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT *", "ok",
     lambda r, tb: {(2, 20.0, "B"), (4, 4.0, "d")} <= _rows(tb)),
    ("merge_delete_flag", _setup_merge_views,
     "MERGE INTO t USING mdel AS s ON t.k = s.k "
     "WHEN MATCHED AND s.dflag THEN DELETE "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT *", "ok",
     lambda r, tb: 2 not in {x[0] for x in _rows(tb)}
     and 5 in {x[0] for x in _rows(tb)}),
    # --- maintenance
    ("optimize", _setup_v2, "OPTIMIZE t", "ok", None),
    ("optimize_where_zorder", _setup_v2,
     "OPTIMIZE t WHERE k >= 1 ZORDER BY (k)", "ok", None),
    ("vacuum", _setup_v2, "VACUUM t", "ok", None),
    ("vacuum_retain", _setup_v2, "VACUUM t RETAIN 5 VERSIONS", "ok", None),
    # --- RESTORE
    ("restore_version", _setup_v2, "RESTORE t TO VERSION AS OF 1", "ok",
     lambda r, tb: (1, 1.0, "a") in _rows(tb)),
    ("restore_timestamp", _setup_v2,
     lambda tmp, tb: "RESTORE TABLE t TO TIMESTAMP AS OF "
     f"'{tb['t'].manifest(1).committed_at}'", "ok",
     lambda r, tb: (1, 1.0, "a") in _rows(tb)),
    # --- ALTER TABLE column/metadata family
    ("alter_rename_column", None,
     "ALTER TABLE t RENAME COLUMN s TO s2", "ok",
     lambda r, tb: "s2" in tb["t"].read().columns),
    ("alter_drop_column", None, "ALTER TABLE t DROP COLUMN s", "ok",
     lambda r, tb: "s" not in tb["t"].read().columns),
    ("alter_add_column", None, "ALTER TABLE t ADD COLUMN n INT", "ok",
     lambda r, tb: {x.n for x in tb["t"].read().collect()} == {None}),
    ("alter_add_column_default", None,
     "ALTER TABLE t ADD COLUMN tag STRING DEFAULT 'x'", "ok",
     lambda r, tb: {x.tag for x in tb["t"].read().collect()} == {"x"}),
    ("alter_add_column_decimal_default", None,
     "ALTER TABLE t ADD COLUMN d DECIMAL(5,2) DEFAULT 1.25", "ok",
     lambda r, tb: {str(x.d) for x in tb["t"].read().collect()}
     == {"1.25"}),
    ("alter_set_default", None,
     "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'dd'", "ok", None),
    ("alter_drop_default", _setup_default,
     "ALTER TABLE t ALTER COLUMN s DROP DEFAULT", "ok", None),
    ("alter_add_constraint", None,
     "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)", "ok", None),
    ("alter_drop_constraint", _setup_constraint,
     "ALTER TABLE t DROP CONSTRAINT pos", "ok", None),
    # --- branch/tag lifecycle
    ("alter_create_branch", None,
     "ALTER TABLE t CREATE BRANCH dev", "ok",
     lambda r, tb: "dev" in tb["t"].list_branches()),
    ("alter_create_branch_asof", _setup_v2,
     "ALTER TABLE t CREATE BRANCH old AS OF VERSION 1", "ok",
     lambda r, tb: (1, 1.0, "a")
     in {(x.k, x.v, x.s) for x in tb["t"].branch("old").read().collect()}),
    ("alter_drop_branch", _setup_branch,
     "ALTER TABLE t DROP BRANCH dev", "ok",
     lambda r, tb: tb["t"].list_branches() == {}),
    ("alter_publish_branch", _setup_branch_ahead,
     "ALTER TABLE t PUBLISH BRANCH dev", "ok",
     lambda r, tb: (9, 9.0, "z") in _rows(tb)),
    ("alter_create_tag", None, "ALTER TABLE t CREATE TAG rel", "ok",
     lambda r, tb: tb["t"].tag_version("rel") == 1),
    ("alter_create_tag_asof", _setup_v2,
     "ALTER TABLE t CREATE TAG rel AS OF VERSION 1", "ok",
     lambda r, tb: tb["t"].tag_version("rel") == 1),
    ("alter_drop_tag", _setup_tag, "ALTER TABLE t DROP TAG rel", "ok",
     None),
    # --- CTAS / DROP TABLE
    ("ctas", None,
     lambda tmp, tb: f"CREATE TABLE m USING VERSIONED LOCATION "
     f"'{tmp / 'm'}' AS SELECT k, v FROM t", "ok",
     lambda r, tb: tb["m"].read().count() == 3),
    ("ctas_partitioned", None,
     lambda tmp, tb: f"CREATE TABLE m USING VERSIONED LOCATION "
     f"'{tmp / 'm'}' PARTITIONED BY (s) AS SELECT k, v, s FROM t", "ok",
     lambda r, tb: tb["m"].partition_by == ("s",)),
    ("drop_table", _setup_ctas, "DROP TABLE m", "ok",
     lambda r, tb: "m" not in tb),
    # --- SELECT / WITH front door
    ("select_plain", None, "SELECT k, v FROM t ORDER BY k", "ok",
     lambda r, tb: [x.k for x in r.collect()] == [1, 2, 3]),
    ("select_with_cte", None,
     "WITH c AS (SELECT k FROM t) SELECT count(*) AS n FROM c", "ok",
     lambda r, tb: r.collect()[0].n == 3),
    ("select_version_asof", _setup_v2,
     "SELECT v FROM t VERSION AS OF 1 WHERE k = 1", "ok",
     lambda r, tb: r.collect()[0].v == 1.0),
    ("select_timestamp_asof", _setup_v2,
     "SELECT v FROM t TIMESTAMP AS OF '2999-01-01T00:00:00' WHERE k = 1",
     "ok", lambda r, tb: r.collect()[0].v == 5.0),
    ("select_branch", _setup_branch_ahead,
     "SELECT count(*) AS n FROM t BRANCH 'dev'", "ok",
     lambda r, tb: r.collect()[0].n == 4),
    ("select_tag", _setup_tag, "SELECT count(*) AS n FROM t TAG 'rel'",
     "ok", lambda r, tb: r.collect()[0].n == 3),
    ("select_tvf", _setup_v2,
     "SELECT count(*) AS n FROM table_changes('t', 1)", "ok",
     lambda r, tb: r.collect()[0].n == 2),  # update = delete + insert
    ("select_tvf_range", _setup_v2,
     "SELECT count(*) AS n FROM table_changes('t', 1, 2)", "ok",
     lambda r, tb: r.collect()[0].n == 2),
    # --- DESCRIBE
    ("describe_history", _setup_v2, "DESCRIBE HISTORY t", "ok",
     lambda r, tb: r.count() == 2),
    ("describe_history_limit", _setup_v2, "DESC HISTORY t LIMIT 1", "ok",
     lambda r, tb: r.count() == 1),
    ("describe_detail", None, "DESCRIBE DETAIL t", "ok",
     lambda r, tb: r.collect()[0].num_entries >= 1),
    # --- EXPLAIN
    ("explain_select", None, "EXPLAIN SELECT k FROM t WHERE k = 1", "ok",
     lambda r, tb: "Physical Plan" in r.collect()[0].plan),
    ("explain_formatted_time_travel", _setup_v2,
     "EXPLAIN FORMATTED SELECT v FROM t VERSION AS OF 1", "ok",
     lambda r, tb: "(1) Scan" in r.collect()[0].plan
     or "Physical Plan" in r.collect()[0].plan),
    ("refuse_explain_dml", None, "EXPLAIN UPDATE t SET v = 1.0",
     UnsupportedStatementError, None),
    # --- documented refusals (refuse-never-reinterpret: the exception
    #     fires AND the table does not move — checked for every case)
    ("refuse_unknown_statement", None, "TRUNCATE TABLE t",
     UnsupportedStatementError, None),
    ("refuse_grant", None, "GRANT SELECT ON t TO someone",
     UnsupportedStatementError, None),
    ("refuse_multi_statement", None,
     "UPDATE t SET v = 1.0; DELETE FROM t", Exception, None),
    ("refuse_update_without_set", None, "UPDATE t WHERE k = 1",
     UnsupportedStatementError, None),
    ("refuse_unknown_table", None, "DELETE FROM nope WHERE k = 1",
     UnsupportedStatementError, None),
    ("refuse_insert_unknown_column", None,
     "INSERT INTO t (k, zz) VALUES (1, 2)", UnsupportedStatementError,
     None),
    ("refuse_insert_arity", None, "INSERT INTO t (k) VALUES (1, 2)",
     UnsupportedStatementError, None),
    ("refuse_insert_body", None, "INSERT INTO t TABLE x",
     UnsupportedStatementError, None),
    ("refuse_replace_where_complex", None,
     "INSERT INTO t REPLACE WHERE k % 2 = 0 VALUES (1, 1.0, 'a')",
     UnsupportedStatementError, None),
    ("refuse_optimize_where_complex", None,
     "OPTIMIZE t WHERE k % 2 = 0", UnsupportedStatementError, None),
    ("refuse_merge_mismatched_on", _setup_merge_views,
     "MERGE INTO t USING msrc AS s ON t.k = s.v "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT *", UnsupportedStatementError, None),
    ("refuse_merge_missing_insert", _setup_merge_views,
     "MERGE INTO t USING msrc AS s ON t.k = s.k "
     "WHEN MATCHED THEN UPDATE SET *", UnsupportedStatementError, None),
    ("refuse_merge_by_source", _setup_merge_views,
     "MERGE INTO t USING msrc AS s ON t.k = s.k "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT * "
     "WHEN NOT MATCHED BY SOURCE THEN DELETE",
     UnsupportedStatementError, None),
    ("refuse_merge_column_level_set", _setup_merge_views,
     "MERGE INTO t USING msrc AS s ON t.k = s.k "
     "WHEN MATCHED THEN UPDATE SET v = 1.0 "
     "WHEN NOT MATCHED THEN INSERT *", UnsupportedStatementError, None),
    ("refuse_alter_out_of_subset", None,
     "ALTER TABLE t SET TBLPROPERTIES ('a' = 'b')",
     UnsupportedStatementError, None),
    ("refuse_add_column_expr_default", None,
     "ALTER TABLE t ADD COLUMN c INT DEFAULT current_date()",
     ValueError, None),
    ("refuse_add_column_mismatched_default", None,
     "ALTER TABLE t ADD COLUMN c INT DEFAULT 2.5", ValueError, None),
    ("refuse_ctas_registered_name", None,
     lambda tmp, tb: f"CREATE TABLE t USING VERSIONED LOCATION "
     f"'{tmp / 'x'}' AS SELECT 1 AS a", UnsupportedStatementError, None),
    ("refuse_drop_unknown_table", None, "DROP TABLE nope",
     UnsupportedStatementError, None),
    ("refuse_tvf_unquoted_name", None,
     "SELECT * FROM table_changes(t, 1)", UnsupportedStatementError,
     None),
    ("refuse_tvf_unknown_name", None,
     "SELECT * FROM table_changes('nope', 1)",
     UnsupportedStatementError, None),
    ("refuse_restore_missing_asof", None, "RESTORE t TO VERSION 3",
     UnsupportedStatementError, None),
    ("refuse_vacuum_bad_retain", None, "VACUUM t RETAIN five VERSIONS",
     UnsupportedStatementError, None),
    # --- chained-join MV family (r12)
    ("create_chain_mv", _setup_star,
     lambda tmp, tb: f"CREATE MATERIALIZED VIEW rollx LOCATION "
     f"'{tmp / 'rollx'}' PRIMARY KEY (fk, ck, nk) AS "
     "SELECT nname, COUNT(*) AS n FROM f JOIN customer USING (ck) "
     "JOIN nation USING (nk) GROUP BY nname", "ok",
     lambda r, tb: {(x.nname, x.n) for x in tb["rollx"].read().collect()}
     == {("US", 2), ("DE", 1)}),
    ("create_chain_mv_outer_final", _setup_star,
     lambda tmp, tb: f"CREATE MATERIALIZED VIEW rollof LOCATION "
     f"'{tmp / 'rollof'}' PRIMARY KEY (fk, ck, nk) AS "
     "SELECT * FROM f JOIN customer USING (ck) "
     "LEFT JOIN nation USING (nk)", "ok", None),
    ("refuse_chain_nonfinal_outer", _setup_star,
     lambda tmp, tb: f"CREATE MATERIALIZED VIEW bad LOCATION "
     f"'{tmp / 'bad'}' PRIMARY KEY (fk, ck, nk) AS "
     "SELECT * FROM f LEFT JOIN customer USING (ck) "
     "JOIN nation USING (nk)", ValueError, None),
    ("refuse_chain_pk_arity", _setup_star,
     lambda tmp, tb: f"CREATE MATERIALIZED VIEW bad LOCATION "
     f"'{tmp / 'bad'}' PRIMARY KEY (fk, ck) AS "
     "SELECT * FROM f JOIN customer USING (ck) "
     "JOIN nation USING (nk)", ValueError, None),
    # --- SEARCH INDEX family (r12)
    ("search_statement", _setup_sidx, "SEARCH six FOR 'b c' TOP 5",
     "ok",
     lambda r, tb: {x.k for x in r.collect()} == {2, 3}),
    ("search_require_all", _setup_sidx,
     "SEARCH six FOR 'b c' TOP 5 REQUIRE ALL", "ok",
     lambda r, tb: r.count() == 0),
    ("describe_search_index", _setup_sidx,
     "DESCRIBE SEARCH INDEX six", "ok",
     lambda r, tb: r.collect()[0].n_docs == 3),
    ("refresh_search_index", _setup_sidx, "REFRESH SEARCH INDEX six",
     "ok", None),
    ("drop_search_index", _setup_sidx, "DROP SEARCH INDEX six", "ok",
     lambda r, tb: "six" not in tb),
    ("refuse_search_no_terms", _setup_sidx, "SEARCH six FOR ''",
     UnsupportedStatementError, None),
    ("refuse_search_unknown", None, "SEARCH nope FOR 'a'",
     UnsupportedStatementError, None),
    ("refuse_search_on_table", None, "SEARCH t FOR 'a'",
     UnsupportedStatementError, None),
    # --- search_index TVF + BUCKETS clause (r13)
    ("create_sidx_buckets",
     None,
     lambda tmp, tb: f"CREATE SEARCH INDEX sb ON t (k, s) "
     f"LOCATION '{tmp / 'gsb'}' BUCKETS 4", "ok",
     lambda r, tb: tb["sb"].buckets == 4),
    ("search_index_tvf", _setup_sidx,
     "SELECT t.k, t.s, h.score FROM search_index('six', 'b c', 5) h "
     "JOIN t ON h.k = t.k ORDER BY t.k", "ok",
     lambda r, tb: {x.k for x in r.collect()} == {2, 3}),
    ("search_index_tvf_where", _setup_sidx,
     "SELECT k FROM search_index('six', 'b c') WHERE score > 100",
     "ok", lambda r, tb: r.count() == 0),
    ("refuse_search_index_tvf_expr_arg", _setup_sidx,
     "SELECT * FROM search_index('six', concat('a', 'b'))",
     UnsupportedStatementError, None),
    ("refuse_search_index_tvf_no_terms", _setup_sidx,
     "SELECT * FROM search_index('six', '')",
     UnsupportedStatementError, None),
    ("refuse_search_index_tvf_unknown", None,
     "SELECT * FROM search_index('nope', 'a')",
     UnsupportedStatementError, None),
    # --- positional phrase search (r13)
    ("create_sidx_positions",
     None,
     lambda tmp, tb: f"CREATE SEARCH INDEX sp ON t (k, s) "
     f"LOCATION '{tmp / 'gsp'}' BUCKETS 4 WITH POSITIONS", "ok",
     lambda r, tb: tb["sp"].positions is True),
    ("search_phrase_statement",
     lambda spark, tb, tmp: execute_sql(
         spark,
         f"CREATE SEARCH INDEX sp ON t (k, s) "
         f"LOCATION '{tmp / 'gsp2'}' WITH POSITIONS",
         tb,
     ),
     "SEARCH sp FOR '\"b\"' TOP 5", "ok",
     lambda r, tb: {x.k for x in r.collect()} == {2}),
    ("refuse_phrase_without_positions", _setup_sidx,
     "SEARCH six FOR '\"b c\"'", ValueError, None),
    ("refuse_mixed_bag_and_phrase",
     lambda spark, tb, tmp: execute_sql(
         spark,
         f"CREATE SEARCH INDEX sp ON t (k, s) "
         f"LOCATION '{tmp / 'gsp3'}' WITH POSITIONS",
         tb,
     ),
     "SEARCH sp FOR 'a \"b c\"'", UnsupportedStatementError, None),
    # --- ALTER SEARCH INDEX ... REBUILD (r14: legacy-layout migration)
    ("alter_sidx_rebuild_buckets", _setup_sidx,
     "ALTER SEARCH INDEX six REBUILD BUCKETS 8", "ok",
     lambda r, tb: tb["six"].buckets == 8),
    ("alter_sidx_rebuild_adds_positions", _setup_sidx,
     "ALTER SEARCH INDEX six REBUILD WITH POSITIONS", "ok",
     lambda r, tb: tb["six"].positions is True),
    ("search_after_rebuild",
     lambda spark, tb, tmp: (
         _setup_sidx(spark, tb, tmp),
         execute_sql(
             spark, "ALTER SEARCH INDEX six REBUILD BUCKETS 8", tb
         ),
     ),
     "SEARCH six FOR 'b c' TOP 5", "ok",
     lambda r, tb: {x.k for x in r.collect()} == {2, 3}),
    ("refuse_rebuild_unknown_index", None,
     "ALTER SEARCH INDEX nope REBUILD", UnsupportedStatementError,
     None),
]


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0] for c in CASES]
)
def test_statement_grammar_matrix(spark, tmp_path, case):
    name, setup, sql, expect, check = case
    tables = _mk(spark, tmp_path)
    if setup is not None:
        setup(spark, tables, tmp_path)
    if callable(sql):
        sql = sql(tmp_path, tables)
    if expect == "ok":
        result = execute_sql(spark, sql, tables)
        if hasattr(result, "collect"):
            result.collect()
        if check is not None:
            assert check(result, tables), name
    else:
        before = (tables["t"].latest_version(), _rows(tables))
        with pytest.raises(expect):
            r = execute_sql(spark, sql, tables)
            if hasattr(r, "collect"):
                r.collect()
        after = (tables["t"].latest_version(), _rows(tables))
        assert after == before, f"{name}: refusal moved the table"
