"""DEFAULT values on ADD COLUMN (`VersionedTable.add_column`,
Iceberg-v3 initial-default shape): entries live at add time read the
default wherever the column is physically absent; stored values (even
NULL) and post-add subset appends keep the NULL posture. The precedence
is pinned on BOTH read surfaces (session reads and the sessionless
DataSource), across the change feed, compaction, rename/drop, branches,
and the SQL statement form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _df(spark, rows, schema="k bigint, v double"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def t(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(i, float(i)) for i in range(5)]),
    )


def _session_read(t):
    return {r.k: r for r in t.read().collect()}


def _sessionless_read(spark, t):
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    return {
        r.k: r
        for r in spark.read.format("versioned")
        .option("table_root", t.root)
        .load()
        .collect()
    }


def test_initial_default_both_surfaces_and_time_travel(spark, t):
    v = t.add_column("region", "string", default="'unassigned'")
    assert v == 2
    t.append(
        _df(
            spark,
            [(10, 10.0, "emea"), (11, 11.0, "apac")],
            "k bigint, v double, region string",
        )
    )
    for got in (_session_read(t), _sessionless_read(spark, t)):
        assert all(got[k].region == "unassigned" for k in range(5))
        assert got[10].region == "emea" and got[11].region == "apac"
    # time travel below the add: the column does not exist
    assert "region" not in t.read(1).columns


def test_precedence_stored_null_and_subset_append(spark, t):
    """Precedence spec: (1) physically present wins, even when NULL;
    (2) absent + scoped entry -> default; (3) absent + post-add entry
    (merge_schema subset append) -> NULL — initial default, not a
    write default."""
    t.add_column("region", "string", default="'unassigned'")
    # (1) explicitly stored NULL survives as NULL
    t.append(
        _df(
            spark,
            [(20, 20.0, None)],
            "k bigint, v double, region string",
        )
    )
    # (3) subset append omits the column entirely (file lacks it)
    t.append(_df(spark, [(30, 30.0)]), merge_schema=True)
    for got in (_session_read(t), _sessionless_read(spark, t)):
        assert got[0].region == "unassigned"  # (2) backfilled history
        assert got[20].region is None, "stored NULL must win"
        assert got[30].region is None, "post-add absence is NULL"


def test_non_literal_defaults_refuse(spark, t):
    for bad in ("current_date()", "1 + 1", "k", "(SELECT 1)", "now()"):
        with pytest.raises(ValueError, match="literal"):
            t.add_column("c", "int", default=bad)
    # literal that can't cast to the type refuses too
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("c", "int", default="'abc'")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("k", "int")


def test_typed_defaults(spark, t):
    t.add_column("n", "bigint", default="7")
    t.add_column("flag", "boolean", default="TRUE")
    t.add_column("d", "date", default="DATE '2024-01-31'")
    t.add_column("note", "string", default="'it''s fine'")
    t.add_column("plain", "int")  # no default -> NULL
    import datetime as dt

    for got in (_session_read(t), _sessionless_read(spark, t)):
        r = got[0]
        assert r.n == 7 and r.flag is True
        assert r.d == dt.date(2024, 1, 31)
        assert r.note == "it's fine"
        assert r.plain is None


def test_compaction_materializes_defaults(spark, t):
    t.add_column("region", "string", default="'unassigned'")
    t.append(
        _df(
            spark,
            [(10, 10.0, "emea")],
            "k bigint, v double, region string",
        )
    )
    before = sorted(
        (r.k, r.region) for r in t.read().collect()
    )
    t.compact()
    # rewritten entries leave the default's scope — values must have
    # been materialized into the new files, reads identical
    assert sorted((r.k, r.region) for r in t.read().collect()) == before
    m = t.manifest()
    assert all(
        not any(
            f.replace("\\", "/") == e or f.startswith(e.rstrip("/") + "/")
            for e in m.column_defaults["region"]["entries"]
        )
        for f in m.files
    ), "compacted entries must be out of the default's scope"
    assert _sessionless_read(spark, t)[0].region == "unassigned"


def test_change_feed_serves_defaults_for_pre_add_commits(spark, t):
    """Pieces drawn from commits BEFORE the add read the default in
    the conformed feed — replaying the feed reconstructs the final
    snapshots."""
    t.append(_df(spark, [(10, 10.0)]))  # v2, pre-add
    t.add_column("region", "string", default="'unassigned'")  # v3
    t.delete_where([("k", "=", 10)])  # v4, post-add cdf
    rows = t.changes(1).collect()
    by = {(r.k, r._change_type): r for r in rows}
    assert by[(10, "insert")].region == "unassigned"  # pre-add append
    assert by[(10, "delete")].region == "unassigned"  # post-add cdf
    assert by[(10, "insert")]._commit_version == 2


def test_rename_and_drop_follow_the_default(spark, t):
    t.add_column("region", "string", default="'unassigned'")
    t.rename_column("region", "zone")
    assert _session_read(t)[0].zone == "unassigned"
    assert "zone" in t.manifest().column_defaults
    assert "region" not in t.manifest().column_defaults
    t.drop_column("zone")
    assert t.manifest().column_defaults == {}


def test_branch_publish_carries_defaults(spark, t):
    t.add_column("region", "string", default="'unassigned'")
    b = t.create_branch("wip")
    b.append(
        _df(
            spark,
            [(50, 50.0, "emea")],
            "k bigint, v double, region string",
        )
    )
    t.publish_branch("wip")
    got = _session_read(t)
    assert got[0].region == "unassigned" and got[50].region == "emea"
    assert t.manifest().column_defaults["region"]["since_version"] == 2


def test_restore_rolls_defaults_back(spark, t):
    t.add_column("region", "string", default="'unassigned'")
    t.drop_column("region")
    assert t.manifest().column_defaults == {}
    t.restore(2)  # back to the defaulted world
    assert "region" in t.manifest().column_defaults
    assert _session_read(t)[0].region == "unassigned"


def test_write_default_fills_omitted_columns(spark, t):
    """WRITE defaults (ALTER COLUMN ... SET DEFAULT): an append that
    OMITS the column stores the literal (no merge_schema needed); a
    present column is never touched — explicit NULL stays NULL; the
    stored values serve on both read surfaces with no read-side
    machinery (they are real file bytes)."""
    t.add_column("region", "string")  # plain evolution, no initial dflt
    t.set_column_default("region", "'filled'")
    t.append(_df(spark, [(50, 50.0)]))  # omits region entirely
    t.append(
        _df(
            spark,
            [(51, 51.0, None), (52, 52.0, "emea")],
            "k bigint, v double, region string",
        )
    )
    for got in (_session_read(t), _sessionless_read(spark, t)):
        assert got[50].region == "filled"
        assert got[51].region is None, "explicit NULL must win"
        assert got[52].region == "emea"
        assert got[0].region is None  # pre-add history: no initial dflt
    # drop: the omission goes back to refusing without merge_schema
    t.drop_column_default("region")
    import pytest as _pt

    with _pt.raises(Exception, match="merge_schema"):
        t.append(_df(spark, [(60, 60.0)]))
    with _pt.raises(ValueError, match="no write default"):
        t.drop_column_default("region")
    with _pt.raises(ValueError, match="no column"):
        t.set_column_default("zz", "1")
    with _pt.raises(ValueError, match="literal"):
        t.set_column_default("region", "now()")
    with _pt.raises(ValueError, match="does not cast"):
        t.set_column_default("v", "'abc'")


def test_write_default_insert_statement_and_orthogonality(spark, t):
    """INSERT with a column list fills write defaults for omitted
    columns (NULL otherwise); initial and write defaults on ONE column
    with different literals coexist: old absent files read the initial
    default, new omitting writes store the write default."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    tables = {"t": t}
    execute_sql(
        spark,
        "ALTER TABLE t ADD COLUMN region STRING DEFAULT 'old-world'",
        tables,
    )
    execute_sql(
        spark,
        "ALTER TABLE t ALTER COLUMN region SET DEFAULT 'new-world'",
        tables,
    )
    execute_sql(
        spark, "INSERT INTO t (k, v) VALUES (70, 70.0)", tables
    )
    got = _session_read(t)
    assert got[0].region == "old-world"  # initial default: history
    assert got[70].region == "new-world"  # write default: stored
    assert _sessionless_read(spark, t)[70].region == "new-world"
    # the write default is real bytes: dropping it never unfills
    execute_sql(
        spark, "ALTER TABLE t ALTER COLUMN region DROP DEFAULT", tables
    )
    assert _session_read(t)[70].region == "new-world"


def test_write_default_datasource_writer_fills_omission(spark, t):
    """The sessionless DataSource writer fills omitted write-defaulted
    columns with typed constants, matching the session append — real
    file bytes, typed exactly (decimal/date/bool included)."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    t.add_column("region", "string")
    t.set_column_default("region", "'filled'")
    t.add_column("score", "decimal(6,2)")
    t.set_column_default("score", "1.25")
    import datetime as dt

    t.add_column("since", "date")
    t.set_column_default("since", "DATE '2024-01-31'")
    (
        _df(spark, [(80, 80.0)])  # omits all three defaulted columns
        .write.format("versioned")
        .mode("append")
        .option("table_root", t.root)
        .save()
    )
    from decimal import Decimal

    for got in (_session_read(t), _sessionless_read(spark, t)):
        r = got[80]
        assert r.region == "filled"
        assert r.score == Decimal("1.25")
        assert r.since == dt.date(2024, 1, 31)
        assert got[0].region is None  # pre-add rows: no initial dflt
    # including the column stores the explicit value, default untouched
    (
        _df(
            spark,
            [(81, 81.0, "apac")],
            "k bigint, v double, region string",
        )
        .write.format("versioned")
        .mode("append")
        .option("table_root", t.root)
        .save()
    )
    assert _session_read(t)[81].region == "apac"
    assert _session_read(t)[81].score == Decimal("1.25")  # still filled


def test_write_default_lifecycle_interplay(spark, t):
    """Write defaults ride the metadata lifecycle: rename re-keys,
    drop removes, restore rolls back, branch publish carries."""
    t.add_column("region", "string")
    t.set_column_default("region", "'x'")
    t.rename_column("region", "zone")
    assert t.manifest().write_defaults == {"zone": "'x'"}
    t.append(_df(spark, [(90, 90.0)]))
    assert _session_read(t)[90].zone == "x"
    b = t.create_branch("wip")
    b.append(_df(spark, [(91, 91.0)]))  # fill works on the branch too
    t.publish_branch("wip")
    assert _session_read(t)[91].zone == "x"
    v_with = t.latest_version()
    t.drop_column("zone")
    assert t.manifest().write_defaults == {}
    t.restore(v_with)
    assert t.manifest().write_defaults == {"zone": "'x'"}


def test_add_column_sql_statement(spark, t):
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    tables = {"t": t}
    v = execute_sql(
        spark,
        "ALTER TABLE t ADD COLUMN region STRING DEFAULT 'unassigned'",
        tables,
    )
    assert v == 2
    assert execute_sql(
        spark, "ALTER TABLE t ADD COLUMN score DECIMAL(6,2) DEFAULT 1.25",
        tables,
    ) == 3
    rows = execute_select(
        spark,
        "SELECT region, CAST(sum(score) AS DOUBLE) AS s, "
        "count(*) AS n FROM t GROUP BY region",
        tables,
    ).collect()
    assert len(rows) == 1
    assert rows[0].region == "unassigned"
    assert rows[0].n == 5 and abs(rows[0].s - 6.25) < 1e-9
    with pytest.raises(ValueError, match="literal"):
        execute_sql(
            spark,
            "ALTER TABLE t ADD COLUMN bad INT DEFAULT current_date()",
            tables,
        )


def test_two_evaluator_literal_mismatch_refused(spark, t):
    """ADVICE r9 medium: a literal only the session cast can evaluate
    (INT DEFAULT 2.5 truncates to 2 in-session; the sessionless
    parser's int('2.5') raises) must refuse at DDL time — otherwise
    every sessionless read crashes later while session reads silently
    serve the truncated value. Same guard on write defaults."""
    with pytest.raises(ValueError, match="sessionless|does not cast"):
        t.add_column("n", "int", default="2.5")
    with pytest.raises(ValueError, match="sessionless|does not cast"):
        t.set_column_default("k", "2.5")
    with pytest.raises(ValueError, match="sessionless|does not cast"):
        t.add_column("d", "date", default="DATE '2024-7-4'")
    # canonical text forms still pass, and serve on both surfaces
    t.add_column("n", "int", default="7")
    t.add_column("d", "date", default="DATE '2024-07-04'")
    t.set_column_default("v", "2.5")  # double: both evaluators agree
    import datetime

    for got in (_session_read(t), _sessionless_read(spark, t)):
        assert got[0].n == 7
        assert got[0].d == datetime.date(2024, 7, 4)
