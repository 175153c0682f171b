"""SQL materialized views (sinks/matview.py + the sql_dml statements):
grammar acceptance/refusals, lifecycle (create/refresh/drop/reopen),
model equivalence vs a full recompute per kind, and front-door SELECT
integration."""

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.matview import (
    MaterializedView,
    MaterializedViewError,
    parse_mv_body,
)
from datalakeingestionservice_spark.sinks.sql_dml import (
    UnsupportedStatementError,
    execute_sql,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def env(spark, tmp_path):
    l = VersionedTable.create(
        spark,
        str(tmp_path / "orders"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0), (4, 10, 4.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "cust"),
        spark.createDataFrame(
            [(10, "a"), (20, "b"), (77, "w")], "ck bigint, seg string"
        ),
    )
    return l, r, {"orders": l, "customer": r}


class TestGrammar:
    def test_parse_kinds(self):
        s = parse_mv_body(
            "SELECT ck, COUNT(*) AS n, SUM(price) AS t, MIN(price) AS lo,"
            " MAX(price) AS hi FROM orders GROUP BY ck",
            None,
        )
        assert s["kind"] == "agg" and s["keys"] == ["ck"]
        assert s["sums"] == {"t": "price"} and s["mins"] == {"lo": "price"}

        s = parse_mv_body(
            "SELECT * FROM orders LEFT OUTER JOIN customer USING (ck)",
            ("k", "ck"),
        )
        assert s["kind"] == "join" and s["join_type"] == "left"

        s = parse_mv_body(
            "SELECT seg, COUNT(*) AS n FROM orders FULL JOIN customer"
            " USING (ck) GROUP BY seg",
            ("k", "ck"),
        )
        assert s["kind"] == "join_agg" and s["join_type"] == "full"

    @pytest.mark.parametrize(
        "body,pk,msg",
        [
            ("SELECT ck, COUNT(*) AS n FROM orders", None, "GROUP BY"),
            (
                "SELECT ck FROM orders GROUP BY ck",
                None,
                "without aggregates",
            ),
            (
                "SELECT ck, COUNT(k) AS n FROM orders GROUP BY ck",
                None,
                "COUNT",
            ),
            (
                "SELECT * FROM orders JOIN customer ON orders.ck ="
                " customer.ck",
                ("k", "ck"),
                "USING",
            ),
            (
                "SELECT * FROM orders JOIN customer USING (ck)",
                None,
                "PRIMARY KEY",
            ),
            (
                "SELECT k FROM orders JOIN customer USING (ck)",
                ("k", "ck"),
                "SELECT \\*",
            ),
            (
                "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
                ("k", "ck"),
                "PRIMARY KEY applies to join",
            ),
            (
                "SELECT seg, COUNT(*) AS n FROM orders GROUP BY ck",
                None,
                "must equal",
            ),
            # HAVING resolves against SELECT output aliases at parse
            # time (ADVICE r11): an un-aliased aggregate or unknown
            # column must fail CREATE, not every later read().
            (
                "SELECT ck, SUM(price) AS t FROM orders GROUP BY ck "
                "HAVING count(*) > 1",
                None,
                "alias the aggregate",
            ),
            (
                "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck "
                "HAVING m > 1",
                None,
                "not a SELECT",
            ),
            (
                "SELECT seg, COUNT(*) AS n FROM orders JOIN customer "
                "USING (ck) GROUP BY seg HAVING sum(price) > 3",
                ("k", "ck"),
                "alias the aggregate",
            ),
        ],
    )
    def test_refusals(self, body, pk, msg):
        with pytest.raises(MaterializedViewError, match=msg):
            parse_mv_body(body, pk)

    def test_extremes_over_inner_join_parse_to_composed(self):
        """MIN/MAX/COUNT(DISTINCT)/AVG over an INNER join parse to the
        composed (materialize-the-join) spec instead of refusing (r11)."""
        s = parse_mv_body(
            "SELECT seg, COUNT(*) AS n, MIN(price) AS lo, "
            "AVG(price) AS ap, COUNT(DISTINCT price) AS np "
            "FROM orders JOIN customer USING (ck) GROUP BY seg",
            ("k", "ck"),
        )
        assert s["kind"] == "join_agg" and s["materialize_join"]
        assert s["mins"] == {"lo": "price"}
        assert s["avgs"] == {"ap": "price"}
        assert s["distincts"] == {"np": "price"}
        # ... and over OUTER joins too (rendered composition, r11)
        so = parse_mv_body(
            "SELECT seg, MIN(price) AS lo FROM orders LEFT JOIN"
            " customer USING (ck) GROUP BY seg",
            ("k", "ck"),
        )
        assert so["kind"] == "join_agg" and so["materialize_join"]
        assert so["join_type"] == "left"

    def test_where_over_outer_join_parses(self):
        """WHERE over an OUTER join is maintainable (r11): padded
        membership derives from the raw other side and the predicate
        applies to the null-padded render."""
        s = parse_mv_body(
            "SELECT seg, COUNT(*) AS n FROM orders LEFT JOIN"
            " customer USING (ck) WHERE price > 1 GROUP BY seg",
            ("k", "ck"),
        )
        assert s["kind"] == "join_agg"
        assert s["join_type"] == "left"
        assert s["filter"] == "price > 1"
        s2 = parse_mv_body(
            "SELECT * FROM orders FULL JOIN customer USING (ck) "
            "WHERE price > 1",
            ("k", "ck"),
        )
        assert s2["kind"] == "join"
        assert s2["join_type"] == "full"
        assert s2["filter"] == "price > 1"


class TestLifecycle:
    def test_agg_mv_tracks_recompute_and_reopens(self, spark, tmp_path, env):
        l, r, tables = env
        root = str(tmp_path / "mv_agg")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW by_ck LOCATION '{root}' AS "
            "SELECT ck, COUNT(*) AS n, SUM(price) AS total, "
            "MIN(price) AS lo, MAX(price) AS hi FROM orders GROUP BY ck",
            tables,
        )

        def expect():
            return {
                (x.ck, x.n, x.total, x.lo, x.hi)
                for x in l.read()
                .groupBy("ck")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price").alias("total"),
                    F.min("price").alias("lo"),
                    F.max("price").alias("hi"),
                )
                .collect()
            }

        def got(ts):
            return {
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM by_ck", ts
                ).collect()
            }

        assert got(tables) == expect()
        # DML at the statement surface, incl. a delete AT an extreme
        execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
        execute_sql(spark, "INSERT INTO orders VALUES (5, 20, 0.5)", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW by_ck", tables)
        assert got(tables) == expect()
        # reopen from disk in a fresh registration (root, not instance)
        t2 = {"orders": l, "by_ck": root}
        execute_sql(spark, "UPDATE orders SET price = price + 1", t2)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW by_ck", t2)
        assert got(t2) == expect()
        # drop deregisters only; the state survives re-registration
        execute_sql(spark, "DROP MATERIALIZED VIEW by_ck", t2)
        assert "by_ck" not in t2
        assert MaterializedView.exists(root)

    def test_outer_join_agg_mv_and_select_join(self, spark, tmp_path, env):
        l, r, tables = env
        root = str(tmp_path / "mv_oagg")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW seg_totals LOCATION '{root}' "
            "PRIMARY KEY (k, ck) AS "
            "SELECT seg, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
            tables,
        )
        execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_totals", tables)
        expect = {
            (x.seg, x.n, x.total)
            for x in l.read()
            .join(r.read(), "ck", "left")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price").alias("total"),
            )
            .collect()
        }
        got = {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM seg_totals", tables
            ).collect()
        }
        assert got == expect
        assert any(s is None for s, _, _ in got)  # padded group present
        # the MV joins a SOURCE table in one front-door SELECT
        joined = execute_sql(
            spark,
            "SELECT c.seg AS seg, v.n AS n FROM customer c "
            "JOIN seg_totals v ON c.seg = v.seg",
            tables,
        ).collect()
        assert {(x.seg, x.n) for x in joined} == {
            (s, n) for s, n, _ in got if s is not None
        }

    def test_join_view_mv(self, spark, tmp_path, env):
        l, r, tables = env
        root = str(tmp_path / "mv_join")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW oj LOCATION '{root}' "
            "PRIMARY KEY (k, ck) AS "
            "SELECT * FROM orders FULL JOIN customer USING (ck)",
            tables,
        )
        execute_sql(spark, "DELETE FROM orders WHERE ck = 10", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW oj", tables)
        expect = {
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "full").collect()
        }
        got = {
            (x.k, x.ck, x.price, x.seg)
            for x in execute_sql(
                spark, "SELECT * FROM oj", tables
            ).collect()
        }
        assert got == expect
        assert (None, 10, None, "a") in got  # re-padded right row

    def test_statement_refusals(self, spark, tmp_path, env):
        l, r, tables = env
        root = str(tmp_path / "mv_ref")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW m LOCATION '{root}' AS "
            "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
            tables,
        )
        with pytest.raises(UnsupportedStatementError, match="read-only"):
            execute_sql(spark, "UPDATE m SET n = 1", tables)
        with pytest.raises(UnsupportedStatementError, match="current state"):
            execute_sql(spark, "SELECT * FROM m VERSION AS OF 1", tables)
        with pytest.raises(
            UnsupportedStatementError, match="already registered"
        ):
            execute_sql(
                spark,
                f"CREATE MATERIALIZED VIEW m LOCATION '{root}2' AS "
                "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
                tables,
            )
        with pytest.raises(
            UnsupportedStatementError, match="not a materialized view"
        ):
            execute_sql(
                spark, "REFRESH MATERIALIZED VIEW orders", tables
            )
        with pytest.raises(MaterializedViewError, match="already holds"):
            execute_sql(
                spark,
                f"CREATE MATERIALIZED VIEW m2 LOCATION '{root}' AS "
                "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
                tables,
            )


def test_mv_statements_refuse_in_scripts(spark, tmp_path, env):
    from datalakeingestionservice_spark.sinks.sql_dml import execute_script

    class _FakeCatalog:
        def staged_transaction(self):
            raise AssertionError("must refuse before opening a txn")

    for stmt in (
        "CREATE MATERIALIZED VIEW v LOCATION '/x' AS SELECT ck,"
        " COUNT(*) AS n FROM orders GROUP BY ck",
        "REFRESH MATERIALIZED VIEW v",
        "DROP MATERIALIZED VIEW v",
        "ALTER MATERIALIZED VIEW v START CONTINUOUS REFRESH "
        "CHECKPOINT '/x/ck'",
        "ALTER MATERIALIZED VIEW v STOP CONTINUOUS REFRESH",
    ):
        with pytest.raises(UnsupportedStatementError, match="script"):
            execute_script(spark, [stmt], _FakeCatalog())


class TestFilteredViews:
    """WHERE where selection commutes with the deltas: the filtered
    view equals a filter-then-aggregate recompute after every mutation
    round — including rows CROSSING the predicate boundary via UPDATE
    (enter/leave the view without insert/delete), NULL predicate rows
    (excluded, SQL WHERE semantics), and a filtered min/max rescan."""

    def test_filtered_agg_view_tracks_recompute(self, spark, tmp_path, env):
        l, r, tables = env
        root = str(tmp_path / "mv_filt")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW big LOCATION '{root}' AS "
            "SELECT ck, COUNT(*) AS n, SUM(price) AS total, "
            "MAX(price) AS hi FROM orders WHERE price >= 2 GROUP BY ck",
            tables,
        )

        def expect():
            return {
                (x.ck, x.n, x.total, x.hi)
                for x in l.read()
                .filter(F.col("price") >= 2)
                .groupBy("ck")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price").alias("total"),
                    F.max("price").alias("hi"),
                )
                .collect()
            }

        def got():
            return {
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM big", tables
                ).collect()
            }

        assert got() == expect()
        # k=1 (price 1.0) ENTERS the view via update; k=4 (price 4.0,
        # the ck=10 max) LEAVES it the same way — no insert/delete
        execute_sql(
            spark, "UPDATE orders SET price = 9.0 WHERE k = 1", tables
        )
        execute_sql(
            spark, "UPDATE orders SET price = 0.5 WHERE k = 4", tables
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW big", tables)
        assert got() == expect()
        # delete AT the filtered max: the endangered rescan must apply
        # the same predicate (an unfiltered rescan would resurrect a
        # sub-threshold price as the new max)
        execute_sql(spark, "DELETE FROM orders WHERE k = 1", tables)
        execute_sql(
            spark, "INSERT INTO orders VALUES (6, 10, 1.5)", tables
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW big", tables)
        assert got() == expect()

    def test_filtered_join_agg_view_tracks_recompute(
        self, spark, tmp_path, env
    ):
        l, r, tables = env
        root = str(tmp_path / "mv_fja")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW segbig LOCATION '{root}' "
            "PRIMARY KEY (k, ck) AS "
            "SELECT seg, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders JOIN customer USING (ck) "
            "WHERE price >= 2 GROUP BY seg",
            tables,
        )

        def expect():
            return {
                (x.seg, x.n, x.total)
                for x in l.read()
                .join(r.read(), "ck")
                .filter(F.col("price") >= 2)
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price").alias("total"),
                )
                .collect()
            }

        def got():
            return {
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM segbig", tables
                ).collect()
            }

        assert got() == expect()
        # boundary crossings from BOTH feeds + a group emptying out
        execute_sql(
            spark, "UPDATE orders SET price = 0.1 WHERE ck = 20", tables
        )
        execute_sql(
            spark, "UPDATE orders SET price = 8.0 WHERE k = 1", tables
        )
        execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW segbig", tables)
        assert got() == expect()

    def test_filtered_outer_join_view_tracks_recompute(
        self, spark, tmp_path, env
    ):
        """WHERE over a LEFT OUTER join at the statement surface (r11):
        SQL applies the predicate AFTER null-padding — an unmatched
        order passes only if its padded render does (seg IS NULL
        there), and a matched order whose row fails σ yields nothing,
        not a padded row."""
        l, r, tables = env
        root = str(tmp_path / "mv_fo")
        pred = "price >= 2 OR seg = 'w'"
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW fo LOCATION '{root}' "
            "PRIMARY KEY (k, ck) AS "
            "SELECT * FROM orders LEFT JOIN customer USING (ck) "
            f"WHERE {pred}",
            tables,
        )

        def expect():
            return {
                (x.k, x.ck, x.price, x.seg)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .filter(F.coalesce(F.expr(pred), F.lit(False)))
                .collect()
            }

        def got():
            return {
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM fo", tables
                ).collect()
            }

        assert got() == expect()
        # customer 10 dies: order 1 (1.0) pads but fails σ — vanishes;
        # order 4 (4.0) pads and stays; then order 1 crosses the
        # boundary WHILE padded and must appear as a padded row
        execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW fo", tables)
        assert got() == expect()
        execute_sql(
            spark, "UPDATE orders SET price = 2.5 WHERE k = 1", tables
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW fo", tables)
        g = got()
        assert g == expect()
        assert (1, 10, 2.5, None) in g  # σ-passing padded row

    def test_filtered_join_view_null_predicate_rows(
        self, spark, tmp_path, env
    ):
        """NULL predicate rows are excluded (WHERE semantics), and the
        filtered SELECT * join view tracks the recompute."""
        l, r, tables = env
        execute_sql(
            spark,
            "INSERT INTO orders VALUES (7, 20, NULL)",
            tables,
        )
        root = str(tmp_path / "mv_fj")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW fj LOCATION '{root}' "
            "PRIMARY KEY (k, ck) AS "
            "SELECT * FROM orders JOIN customer USING (ck) "
            "WHERE price < 3",
            tables,
        )

        def expect():
            return {
                (x.k, x.ck, x.price, x.seg)
                for x in l.read()
                .join(r.read(), "ck")
                .filter(F.col("price") < 3)
                .collect()
            }

        def got():
            return {
                (x.k, x.ck, x.price, x.seg)
                for x in execute_sql(
                    spark, "SELECT * FROM fj", tables
                ).collect()
            }

        assert got() == expect()
        assert all(k != 7 for k, _, _, _ in got())  # NULL price out
        execute_sql(
            spark, "UPDATE orders SET price = 2.5 WHERE k = 7", tables
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW fj", tables)
        assert got() == expect()
        assert any(k == 7 for k, _, _, _ in got())  # entered the view


def test_describe_materialized_view(spark, tmp_path, env):
    l, r, tables = env
    root = str(tmp_path / "mv_desc")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW d LOCATION '{root}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n FROM orders JOIN customer "
        "USING (ck) WHERE price >= 2 GROUP BY seg",
        tables,
    )
    row = execute_sql(
        spark, "DESCRIBE MATERIALIZED VIEW d", tables
    ).collect()[0]
    assert row.kind == "join_agg" and row.join_type == "inner"
    assert row.filter == "price >= 2"
    assert row.location == root and row.state_version >= 1
    assert "left_root" in row.sources
    with pytest.raises(UnsupportedStatementError):
        execute_sql(spark, "DESCRIBE MATERIALIZED VIEW orders", tables)


def test_count_distinct_mv(spark, tmp_path, env):
    """COUNT(DISTINCT expr) at the statement surface: maintained via
    the (keys, value) side state; refuses over joins with the
    composition pointer."""
    l, r, tables = env
    root = str(tmp_path / "mv_dist")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW per_cust LOCATION '{root}' AS "
        "SELECT ck, COUNT(*) AS n, COUNT(DISTINCT price) AS n_prices "
        "FROM orders GROUP BY ck",
        tables,
    )
    execute_sql(spark, "INSERT INTO orders VALUES (8, 10, 1.0)", tables)
    execute_sql(spark, "INSERT INTO orders VALUES (9, 10, 6.0)", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW per_cust", tables)
    expect = {
        (x.ck, x.n, x.n_prices)
        for x in l.read()
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("price").alias("n_prices"),
        )
        .collect()
    }
    got = {
        tuple(x)
        for x in execute_sql(
            spark, "SELECT * FROM per_cust", tables
        ).collect()
    }
    assert got == expect
    assert (10, 4, 3) in got  # prices 1.0(x2), 4.0, 6.0
    # COUNT(DISTINCT) over an INNER join auto-composes (r11): the join
    # materializes under the view root and the multiplicity side state
    # consumes its change feed
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW xj LOCATION '{root}2' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(DISTINCT price) AS np FROM orders "
        "JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k = 8", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW xj", tables)
    expect_j = {
        (x.seg, x.np)
        for x in l.read()
        .join(r.read(), "ck")
        .groupBy("seg")
        .agg(F.countDistinct("price").alias("np"))
        .collect()
    }
    got_j = {
        tuple(x)
        for x in execute_sql(spark, "SELECT * FROM xj", tables).collect()
    }
    assert got_j == expect_j


def test_mv_chain_min_over_join_via_sql(spark, tmp_path, env):
    """The documented composition for extremes over a join, entirely at
    the statement surface: a SELECT * join MV materializes the join;
    its state table registers as a source; a second MV maintains
    MIN/MAX over it. DML on the base tables propagates through both
    REFRESHes."""
    l, r, tables = env
    jroot = str(tmp_path / "mvc_join")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW oj LOCATION '{jroot}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT * FROM orders JOIN customer USING (ck)",
        tables,
    )
    # the join MV's state table is a versioned table — register it
    import os

    tables["oj_state"] = os.path.join(jroot, "state")
    aroot = str(tmp_path / "mvc_agg")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_extremes LOCATION '{aroot}' AS "
        "SELECT seg, COUNT(*) AS n, MIN(price) AS lo, MAX(price) AS hi "
        "FROM oj_state GROUP BY seg",
        tables,
    )

    def expect():
        return {
            (x.seg, x.n, x.lo, x.hi)
            for x in l.read()
            .join(r.read(), "ck")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("price").alias("lo"),
                F.max("price").alias("hi"),
            )
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM seg_extremes", tables
            ).collect()
        }

    assert got() == expect()
    # delete AT the max of segment 'a' (k=4, price 4.0) — propagates
    # through the join MV's change feed into the agg MV's endangered
    # rescan (which reads the join STATE, not the base tables)
    execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW oj", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_extremes", tables)
    assert got() == expect()


def test_computed_group_key_mv(spark, tmp_path):
    """Computed group keys (the time-bucketed-rollup shape): the alias
    expression projects onto snapshot, feed, and rescans alike, so an
    UPDATE that moves a row BETWEEN buckets maintains both groups; the
    endangered min/max rescan works without stats bounds (no source
    column to bound)."""
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    src = VersionedTable.create(
        spark,
        str(tmp_path / "ksrc"),
        spark.createDataFrame(
            [
                (1, "2024-01-03", 10.0),
                (2, "2024-01-20", 20.0),
                (3, "2024-02-07", 30.0),
                (4, "2024-02-28", 40.0),
            ],
            "id bigint, dt string, amt double",
        ),
    )
    tables = {"t": src}
    root = str(tmp_path / "kmv")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW monthly LOCATION '{root}' AS "
        "SELECT substring(dt, 1, 7) AS month, COUNT(*) AS n, "
        "SUM(amt) AS total, MAX(amt) AS hi FROM t GROUP BY month",
        tables,
    )

    def expect():
        return {
            (x.month, x.n, x.total, x.hi)
            for x in src.read()
            .groupBy(F.substring("dt", 1, 7).alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amt").alias("total"),
                F.max("amt").alias("hi"),
            )
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM monthly", tables
            ).collect()
        }

    assert got() == expect()
    assert ("2024-01", 2, 30.0, 20.0) in got()
    # a row MOVES buckets; a bucket's max dies (endangered rescan with
    # a computed key — semi-join only, no stats bounds)
    execute_sql(
        spark, "UPDATE t SET dt = '2024-02-15' WHERE id = 2", tables
    )
    execute_sql(spark, "DELETE FROM t WHERE id = 4", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW monthly", tables)
    assert got() == expect()
    assert ("2024-01", 1, 10.0, 10.0) in got()
    assert ("2024-02", 2, 50.0, 30.0) in got()
    # GROUP BY may also name the verbatim expression
    from datalakeingestionservice_spark.sinks.matview import parse_mv_body

    s = parse_mv_body(
        "SELECT substring(dt, 1, 7) AS month, COUNT(*) AS n FROM t "
        "GROUP BY substring(dt, 1, 7)",
        None,
    )
    assert s["keys"] == {"month": "substring(dt, 1, 7)"}
    # computed keys over joins parse to a key-expr dict (r11)
    sj = parse_mv_body(
        "SELECT substring(dt, 1, 7) AS month, COUNT(*) AS n "
        "FROM t JOIN u USING (id) GROUP BY month",
        ("id", "id"),
    )
    assert sj["kind"] == "join_agg"
    assert sj["group_keys"] == {"month": "substring(dt, 1, 7)"}
    # a malformed aggregate cannot be reinterpreted as a key
    with pytest.raises(MaterializedViewError, match="refuse"):
        parse_mv_body(
            "SELECT SUM(amt) blah AS t2, COUNT(*) AS n FROM t "
            "GROUP BY t2",
            None,
        )


def test_mv_over_mv_cascade(spark, tmp_path, env):
    """MV-over-MV as a FIRST-CLASS source (r11): the aggregate MV's
    FROM names the join MV directly — its state table resolves as the
    source, the dependency persists in _mv.json, and one
    REFRESH ... CASCADE statement drains base → join view → agg view.
    MIN over a join is maintainable through the chain."""
    import os

    l, r, tables = env
    jroot, aroot = str(tmp_path / "cj"), str(tmp_path / "ca")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW oj LOCATION '{jroot}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT * FROM orders JOIN customer USING (ck)",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_lo LOCATION '{aroot}' AS "
        "SELECT seg, COUNT(*) AS n, MIN(price) AS lo FROM oj "
        "GROUP BY seg",
        tables,
    )

    def expect():
        return {
            (x.seg, x.n, x.lo)
            for x in l.read()
            .join(r.read(), "ck")
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"), F.min("price").alias("lo"))
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM seg_lo", tables
            ).collect()
        }

    assert got() == expect()
    row = execute_sql(
        spark, "DESCRIBE MATERIALIZED VIEW seg_lo", tables
    ).collect()[0]
    assert "oj" in row.depends_on and jroot in row.depends_on

    # DML on both bases; a PLAIN refresh must NOT see it (the upstream
    # state table hasn't moved), CASCADE must drain the whole chain —
    # including a delete AT a group's min (endangered rescan reads the
    # join MV's state, not the raw sources)
    stale = got()
    execute_sql(
        spark, "UPDATE orders SET price = 0.5 WHERE k = 2", tables
    )
    execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck = 20", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_lo", tables)
    assert got() == stale
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_lo CASCADE", tables
    )
    assert got() == expect()

    # reopen from disk in a fresh context: the persisted deps carry
    # the upstream roots, so CASCADE works with nothing registered
    execute_sql(
        spark, "INSERT INTO orders VALUES (9, 10, 0.25)", tables
    )
    mv = MaterializedView.open(spark, aroot)
    mv.refresh(cascade=True)
    assert got() == expect()
    assert ("a", 2, 0.25) in got()  # k=1 (1.0) + new k=9 (0.25)


def test_mv_over_mv_upstream_kinds(spark, tmp_path, env):
    """OUTER views refuse as upstreams (padded rows spread across side
    tables and group under NULL keys); aggregate views NOW feed
    downstream views through their rendered projection (r13 — the
    rollup-pyramid mechanism, model-equivalence in
    tests/test_matview_rollup.py)."""
    l, r, tables = env
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW agg_up LOCATION "
        f"'{tmp_path / 'au'}' AS "
        "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW outer_up LOCATION "
        f"'{tmp_path / 'ou'}' PRIMARY KEY (k, ck) AS "
        "SELECT * FROM orders LEFT JOIN customer USING (ck)",
        tables,
    )
    # SELECT * OUTER upstream: an AGGREGATE downstream is served from
    # the null-safe rendered join-row projection (r13 completion)
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW over_outer LOCATION "
        f"'{tmp_path / 'x_outer'}' AS "
        "SELECT seg, COUNT(*) AS n FROM outer_up GROUP BY seg",
        tables,
    )
    execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW over_outer CASCADE", tables
    )
    got_o = sorted(
        ((x.seg or "~"), x.n)
        for x in execute_sql(
            spark, "SELECT * FROM over_outer", tables
        ).collect()
    )
    exp_o = sorted(
        ((x.seg or "~"), x.n)
        for x in l.read()
        .join(r.read(), "ck", "left")
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got_o == exp_o
    # ... but a JOIN downstream over one refuses (NULL-able pks)
    with pytest.raises(MaterializedViewError, match="null-safe"):
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW xj LOCATION "
            f"'{tmp_path / 'xj'}' PRIMARY KEY (k, ck) AS "
            "SELECT * FROM outer_up JOIN customer USING (ck)",
            tables,
        )
    # aggregate upstream: accepted, served from rendered/
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW over_agg LOCATION "
        f"'{tmp_path / 'x_agg'}' AS "
        "SELECT COUNT(*) AS customers, SUM(n) AS orders, ck "
        "FROM agg_up GROUP BY ck",
        tables,
    )
    got = {
        (x.ck, x.customers, x.orders)
        for x in execute_sql(
            spark, "SELECT * FROM over_agg", tables
        ).collect()
    }
    exp = {
        (x.ck, 1, x.n)
        for x in l.read()
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_composed_extremes_over_join_mv(spark, tmp_path, env):
    """Extremes + moments over an INNER join in ONE statement (r11):
    the composed class materializes the join under the view root and
    an aggregate view maintains MIN/MAX/AVG over its state feed —
    deletes AT a group extreme rescan the join STATE table, never the
    raw sources; reopen-from-disk refreshes the whole composition."""
    l, r, tables = env
    root = str(tmp_path / "mv_comp")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_x LOCATION '{root}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n, SUM(price) AS total, "
        "MIN(price) AS lo, MAX(price) AS hi, AVG(price) AS ap "
        "FROM orders JOIN customer USING (ck) GROUP BY seg",
        tables,
    )

    def expect():
        return {
            (x.seg, x.n, x.total, x.lo, x.hi, round(x.ap, 6))
            for x in l.read()
            .join(r.read(), "ck")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price").alias("total"),
                F.min("price").alias("lo"),
                F.max("price").alias("hi"),
                F.avg("price").alias("ap"),
            )
            .collect()
        }

    def got():
        return {
            (x.seg, x.n, x.total, x.lo, x.hi, round(x.ap, 6))
            for x in execute_sql(
                spark, "SELECT * FROM seg_x", tables
            ).collect()
        }

    assert got() == expect()
    # delete AT the 'a' group's max (k=4, price 4.0) and move its min
    execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
    execute_sql(
        spark, "UPDATE orders SET price = 9.5 WHERE k = 1", tables
    )
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_x", tables)
    assert got() == expect()
    assert ("a", 1, 9.5, 9.5, 9.5, 9.5) in got()

    # reopen from disk: the persisted spec rebuilds the composition
    execute_sql(spark, "INSERT INTO orders VALUES (6, 20, 0.5)", tables)
    mv = MaterializedView.open(spark, root)
    mv.refresh()
    assert got() == expect()
    assert ("b", 2, 2.5, 0.5, 2.0, 1.25) in got()


def test_having_in_mv_definition(spark, tmp_path, env):
    """HAVING in the MV body (r11): a read-time filter over the
    MAINTAINED groups referencing the SELECT's output aliases — state
    keeps every group, so a group crossing the HAVING boundary
    appears/disappears with zero state churn."""
    l, r, tables = env
    root = str(tmp_path / "mv_hav")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW busy LOCATION '{root}' AS "
        "SELECT ck, COUNT(*) AS n, SUM(price) AS total "
        "FROM orders GROUP BY ck HAVING n >= 2",
        tables,
    )

    def expect():
        return {
            (x.ck, x.n, x.total)
            for x in l.read()
            .groupBy("ck")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("total"))
            .filter(F.col("n") >= 2)
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM busy", tables
            ).collect()
        }

    assert got() == expect()
    assert got() == {(10, 2, 5.0)}  # only ck=10 has >= 2 orders
    # cross the boundary both ways: ck=20 climbs to 2, ck=10 drops to 1
    execute_sql(spark, "INSERT INTO orders VALUES (7, 20, 9.0)", tables)
    execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW busy", tables)
    assert got() == expect()
    assert got() == {(20, 2, 11.0)}
    # reopen from disk keeps the HAVING
    mv = MaterializedView.open(spark, root)
    assert {tuple(x) for x in mv.read().collect()} == expect()
    # HAVING without aggregates refuses
    with pytest.raises(MaterializedViewError, match="HAVING needs"):
        parse_mv_body(
            "SELECT * FROM orders JOIN customer USING (ck) HAVING ck > 1",
            ("k", "ck"),
        )
    # HAVING over a join aggregate parses and carries into the spec
    sj = parse_mv_body(
        "SELECT seg, COUNT(*) AS n FROM orders JOIN customer "
        "USING (ck) WHERE price >= 2 GROUP BY seg HAVING n >= 3",
        ("k", "ck"),
    )
    assert sj["having"] == "n >= 3" and sj["filter"] == "price >= 2"
    # scalar functions over output aliases stay legal in HAVING; only
    # aggregate calls (evaluated pre-alias) are refused at parse time
    ok = parse_mv_body(
        "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck "
        "HAVING abs(n) > 1 AND n IS NOT NULL",
        None,
    )
    assert ok["having"].startswith("abs(n)")


def test_composed_extremes_over_outer_join_mv(spark, tmp_path, env):
    """Extremes over a LEFT OUTER join in ONE statement (r11): the
    rendered-outer composition behind the grammar — padded rows group
    under the NULL seg key, pad transitions move a group's extremes,
    and the endangered rescans read the rendered relation."""
    l, r, tables = env
    root = str(tmp_path / "mv_ox")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_ox LOCATION '{root}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n, MIN(price) AS lo, MAX(price) AS hi "
        "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
        tables,
    )

    def expect():
        return {
            (x.seg, x.n, x.lo, x.hi)
            for x in l.read()
            .join(r.read(), "ck", "left")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("price").alias("lo"),
                F.max("price").alias("hi"),
            )
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM seg_ox", tables
            ).collect()
        }

    assert got() == expect()
    assert (None, 1, 3.0, 3.0) in got()  # k=3 padded -> NULL group
    # customer 10 dies: the 'a' group's min AND max (1.0, 4.0) pad
    # into the NULL group; then delete at the NULL group's new max
    execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_ox", tables)
    assert got() == expect()
    assert (None, 3, 1.0, 4.0) in got()
    execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_ox", tables)
    assert got() == expect()
    assert (None, 2, 1.0, 3.0) in got()
    # reopen from disk rebuilds the whole composition
    mv = MaterializedView.open(spark, root)
    execute_sql(spark, "INSERT INTO orders VALUES (9, 20, 0.25)", tables)
    mv.refresh()
    assert got() == expect()
    assert ("b", 2, 0.25, 2.0) in got()


def test_where_plus_extremes_over_outer_join_mv(spark, tmp_path, env):
    """WHERE + MIN/MAX over a LEFT OUTER join in ONE statement: E117's
    filtered padded machinery feeds E126's rendered relation — the
    rendered rows are σ(outer join), so the aggregate is the filtered
    outer-join aggregate. Boundary crossings while padded included."""
    l, r, tables = env
    root = str(tmp_path / "mv_fox")
    pred = "price >= 2 OR seg = 'w'"
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW fox LOCATION '{root}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n, MIN(price) AS lo, MAX(price) AS hi "
        f"FROM orders LEFT JOIN customer USING (ck) WHERE {pred} "
        "GROUP BY seg",
        tables,
    )

    def expect():
        return {
            (x.seg, x.n, x.lo, x.hi)
            for x in l.read()
            .join(r.read(), "ck", "left")
            .filter(F.coalesce(F.expr(pred), F.lit(False)))
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("price").alias("lo"),
                F.max("price").alias("hi"),
            )
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM fox", tables
            ).collect()
        }

    assert got() == expect()
    # customer 10 dies: order 1 (1.0) pads but FAILS the predicate —
    # vanishes; order 4 (4.0) pads into the NULL group as its extreme;
    # then order 1 crosses the boundary WHILE padded (appears)
    execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW fox", tables)
    assert got() == expect()
    assert (None, 2, 3.0, 4.0) in got()  # k=3, k=4; k=1 filtered out
    execute_sql(
        spark, "UPDATE orders SET price = 2.5 WHERE k = 1", tables
    )
    execute_sql(spark, "REFRESH MATERIALIZED VIEW fox", tables)
    assert got() == expect()
    assert (None, 3, 2.5, 4.0) in got()  # k=1 entered, new NULL-min


def test_continuous_refresh_statements(spark, tmp_path, env):
    """ALTER MATERIALIZED VIEW ... START/STOP CONTINUOUS REFRESH (r11):
    streaming handles are PROCESS state (a handle dies with the
    session — checkpoints make a later START resume), so the
    statements manage a per-process registry: START begins both
    source-feed streams and refuses a double start; STOP stops them
    and refuses when nothing runs; DROP refuses while streams run."""
    import time

    l, r, tables = env
    root = str(tmp_path / "mv_cr")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW live LOCATION '{root}' "
        "PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n, SUM(price) AS total "
        "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    n = execute_sql(
        spark,
        f"ALTER MATERIALIZED VIEW live START CONTINUOUS REFRESH "
        f"CHECKPOINT '{tmp_path / 'crck'}'",
        tables,
    )
    assert n == 2  # both source feeds
    try:
        with pytest.raises(UnsupportedStatementError, match="already"):
            execute_sql(
                spark,
                f"ALTER MATERIALIZED VIEW live START CONTINUOUS "
                f"REFRESH CHECKPOINT '{tmp_path / 'crck2'}'",
                tables,
            )
        with pytest.raises(UnsupportedStatementError, match="STOP"):
            execute_sql(
                spark, "DROP MATERIALIZED VIEW live", tables
            )
        # DML through the front door converges WITHOUT a REFRESH
        execute_sql(
            spark, "DELETE FROM customer WHERE ck = 10", tables
        )
        execute_sql(
            spark, "INSERT INTO orders VALUES (6, 20, 7.0)", tables
        )

        def expect():
            return {
                (x.seg, x.n, x.total)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price").alias("total"),
                )
                .collect()
            }

        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            got = {
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM live", tables
                ).collect()
            }
            if got == expect():
                break
            time.sleep(2)
        assert got == expect()
        assert (None, 3, 8.0) in got  # k=1, k=4 joined k=3 padded
    finally:
        assert (
            execute_sql(
                spark,
                "ALTER MATERIALIZED VIEW live STOP CONTINUOUS REFRESH",
                tables,
            )
            == 2
        )
    with pytest.raises(UnsupportedStatementError, match="not running"):
        execute_sql(
            spark,
            "ALTER MATERIALIZED VIEW live STOP CONTINUOUS REFRESH",
            tables,
        )
    # with the streams stopped, DROP works
    execute_sql(spark, "DROP MATERIALIZED VIEW live", tables)
    assert "live" not in tables


def test_cr_registry_prunes_dead_handles(spark, tmp_path, env):
    """ADVICE r11: a continuous-refresh stream that terminated on its
    own (exception in foreachBatch) leaves a stale registry entry;
    START and DROP must treat all-dead handles as not-running (prune
    on consultation), not block behind a STOP for streams that no
    longer exist."""
    import os

    from datalakeingestionservice_spark.sinks import sql_dml

    l, r, tables = env
    root = str(tmp_path / "mv_dead")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW zomb LOCATION '{root}' AS "
        "SELECT ck, COUNT(*) AS n FROM orders GROUP BY ck",
        tables,
    )

    class _Dead:
        isActive = False

    rp = os.path.realpath(root)
    sql_dml._CR_REGISTRY[rp] = (_Dead(), _Dead())
    # START prunes the dead entry and begins fresh streams
    n = execute_sql(
        spark,
        f"ALTER MATERIALIZED VIEW zomb START CONTINUOUS REFRESH "
        f"CHECKPOINT '{tmp_path / 'zck'}'",
        tables,
    )
    assert n >= 1
    # live streams still block DROP (unchanged behavior)
    with pytest.raises(UnsupportedStatementError, match="STOP"):
        execute_sql(spark, "DROP MATERIALIZED VIEW zomb", tables)
    execute_sql(
        spark,
        "ALTER MATERIALIZED VIEW zomb STOP CONTINUOUS REFRESH",
        tables,
    )
    # DROP with only a dead entry proceeds and clears the registry
    sql_dml._CR_REGISTRY[rp] = (_Dead(),)
    execute_sql(spark, "DROP MATERIALIZED VIEW zomb", tables)
    assert rp not in sql_dml._CR_REGISTRY


@pytest.fixture()
def env3(spark, tmp_path):
    """Three-table star: orders (fact) -> customer -> nation."""
    o = VersionedTable.create(
        spark,
        str(tmp_path / "orders3"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0), (4, 10, 4.0),
             (5, 30, 5.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    c = VersionedTable.create(
        spark,
        str(tmp_path / "cust3"),
        spark.createDataFrame(
            [(10, "a", 100), (20, "b", 200), (30, "a", 200),
             (77, "w", 100)],
            "ck bigint, seg string, nk bigint",
        ),
    )
    n = VersionedTable.create(
        spark,
        str(tmp_path / "nation3"),
        spark.createDataFrame(
            [(100, "US"), (200, "DE")], "nk bigint, nname string"
        ),
    )
    return o, c, n, {"orders": o, "customer": c, "nation": n}


class TestJoinChain:
    """Chained (3+ table) join MVs (r12): cascaded INNER join views —
    the intermediate state tables feed the next stage's change feed."""

    def test_chain_parses(self):
        s = parse_mv_body(
            "SELECT nname, seg, COUNT(*) AS n, SUM(price) AS t "
            "FROM orders JOIN customer USING (ck) "
            "JOIN nation USING (nk) GROUP BY nname, seg",
            ("k", "ck", "nk"),
        )
        assert s["kind"] == "join_chain_agg"
        assert s["tables"] == ["orders", "customer", "nation"]
        assert s["ons"] == [["ck"], ["nk"]]
        assert s["pks"] == ["k", "ck", "nk"]
        s2 = parse_mv_body(
            "SELECT * FROM orders JOIN customer USING (ck) "
            "JOIN nation USING (nk)",
            ("k", "ck", "nk"),
        )
        assert s2["kind"] == "join_chain"
        # extremes over the chain -> composed final stage
        s3 = parse_mv_body(
            "SELECT nname, MIN(price) AS lo FROM orders "
            "JOIN customer USING (ck) JOIN nation USING (nk) "
            "GROUP BY nname",
            ("k", "ck", "nk"),
        )
        assert s3["kind"] == "join_chain_agg" and s3["materialize_join"]

    @pytest.mark.parametrize(
        "body,pk,msg",
        [
            (
                "SELECT * FROM orders LEFT JOIN customer USING (ck) "
                "JOIN nation USING (nk)",
                ("k", "ck", "nk"),
                "FINAL join",
            ),
            (
                "SELECT * FROM orders JOIN customer USING (ck) "
                "FULL JOIN nation USING (nk) JOIN region USING (rk)",
                ("k", "ck", "nk", "rk"),
                "FINAL join",
            ),
            (
                "SELECT * FROM orders JOIN customer USING (ck) "
                "JOIN nation USING (nk)",
                ("k", "ck"),
                "ONE pk per table",
            ),
            (
                "SELECT * FROM orders JOIN customer USING (ck) "
                "JOIN nation USING (nk)",
                None,
                "ONE pk per table",
            ),
            (
                "SELECT nname FROM orders JOIN customer USING (ck) "
                "JOIN nation USING (nk)",
                ("k", "ck", "nk"),
                "SELECT \\*",
            ),
            # a single join given 3 pks must refuse, not ignore one
            (
                "SELECT * FROM orders JOIN customer USING (ck)",
                ("k", "ck", "nk"),
                "exactly two",
            ),
        ],
    )
    def test_chain_refusals(self, body, pk, msg):
        with pytest.raises(MaterializedViewError, match=msg):
            parse_mv_body(body, pk)

    def _expect(self, o, c, n):
        return sorted(
            (x.nname, x.seg, x.n, x.total)
            for x in o.read()
            .join(c.read(), "ck")
            .join(n.read(), "nk")
            .groupBy("nname", "seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price").alias("total"),
            )
            .collect()
        )

    def test_chain_agg_tracks_recompute_all_feeds(
        self, spark, tmp_path, env3
    ):
        o, c, n, tables = env3
        root = str(tmp_path / "mv_chain")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW rollup LOCATION '{root}' "
            "PRIMARY KEY (k, ck, nk) AS "
            "SELECT nname, seg, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders JOIN customer USING (ck) "
            "JOIN nation USING (nk) GROUP BY nname, seg",
            tables,
        )

        def got():
            return sorted(
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM rollup", tables
                ).collect()
            )

        assert got() == self._expect(o, c, n)
        # DML on EVERY feed, one statement each:
        # fact insert + delete, MIDDLE-table delete (cascades both
        # ways: orders of ck=10 leave AND nation US count drops),
        # dim rename (moves whole groups to a new key)
        execute_sql(spark, "INSERT INTO orders VALUES (6, 30, 9.0)", tables)
        execute_sql(spark, "DELETE FROM orders WHERE k = 2", tables)
        execute_sql(spark, "DELETE FROM customer WHERE ck = 10", tables)
        execute_sql(
            spark,
            "UPDATE nation SET nname = 'DE2' WHERE nk = 200",
            tables,
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW rollup", tables)
        assert got() == self._expect(o, c, n)
        assert all(x[0] != "US" or x[1] != "a" for x in got())
        # reopen from disk rebuilds the whole cascade
        mv = MaterializedView.open(spark, root)
        assert (
            sorted(tuple(x) for x in mv.read().collect())
            == self._expect(o, c, n)
        )
        # DESCRIBE surfaces the chain roots
        d = execute_sql(
            spark, "DESCRIBE MATERIALIZED VIEW rollup", tables
        ).collect()[0]
        assert d.kind == "join_chain_agg"
        assert "table_roots" in d.sources

    def test_chain_select_star_and_where(self, spark, tmp_path, env3):
        o, c, n, tables = env3
        root = str(tmp_path / "mv_chainw")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW wide LOCATION '{root}' "
            "PRIMARY KEY (k, ck, nk) AS "
            "SELECT * FROM orders JOIN customer USING (ck) "
            "JOIN nation USING (nk) WHERE price > 1.5",
            tables,
        )

        def expect():
            out = (
                o.read()
                .join(c.read(), "ck")
                .join(n.read(), "nk")
                .filter(F.col("price") > 1.5)
            )
            return sorted(map(tuple, out.select(
                "k", "ck", "nk", "price", "seg", "nname"
            ).collect()))

        def got():
            return sorted(
                tuple(x)
                for x in execute_sql(
                    spark,
                    "SELECT k, ck, nk, price, seg, nname FROM wide",
                    tables,
                ).collect()
            )

        assert got() == expect()
        # a row crossing the σ boundary via UPDATE (1.0 -> 2.0)
        execute_sql(
            spark, "UPDATE orders SET price = 2.0 WHERE k = 1", tables
        )
        execute_sql(spark, "DELETE FROM nation WHERE nk = 200", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW wide", tables)
        assert got() == expect()

    def test_chain_extremes_composed_final_stage(
        self, spark, tmp_path, env3
    ):
        o, c, n, tables = env3
        root = str(tmp_path / "mv_chainx")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW ext LOCATION '{root}' "
            "PRIMARY KEY (k, ck, nk) AS "
            "SELECT nname, MIN(price) AS lo, MAX(price) AS hi, "
            "COUNT(DISTINCT seg) AS ns FROM orders "
            "JOIN customer USING (ck) JOIN nation USING (nk) "
            "GROUP BY nname",
            tables,
        )

        def expect():
            return sorted(
                (x.nname, x.lo, x.hi, x.ns)
                for x in o.read()
                .join(c.read(), "ck")
                .join(n.read(), "nk")
                .groupBy("nname")
                .agg(
                    F.min("price").alias("lo"),
                    F.max("price").alias("hi"),
                    F.countDistinct("seg").alias("ns"),
                )
                .collect()
            )

        def got():
            return sorted(
                tuple(x)
                for x in execute_sql(
                    spark, "SELECT * FROM ext", tables
                ).collect()
            )

        assert got() == expect()
        # delete AT the US minimum (k=1, 1.0) -> endangered rescan
        # reads the materialized chain join, never the raw bases
        execute_sql(spark, "DELETE FROM orders WHERE k = 1", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW ext", tables)
        assert got() == expect()

    def test_four_table_chain(self, spark, tmp_path, env3):
        o, c, n, tables = env3
        r = VersionedTable.create(
            spark,
            str(tmp_path / "region3"),
            spark.createDataFrame(
                [(100, "AMER"), (200, "EMEA")], "nk bigint, rname string"
            ),
        )
        # region keyed by nk here purely to exercise a 3-hop chain
        tables = dict(tables, region=r)
        root = str(tmp_path / "mv_chain4")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW four LOCATION '{root}' "
            "PRIMARY KEY (k, ck, nk, nk) AS "
            "SELECT rname, COUNT(*) AS n FROM orders "
            "JOIN customer USING (ck) JOIN nation USING (nk) "
            "JOIN region USING (nk) GROUP BY rname",
            tables,
        )
        execute_sql(spark, "DELETE FROM customer WHERE ck = 20", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW four", tables)
        got = sorted(
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM four", tables
            ).collect()
        )
        exp = sorted(
            (x.rname, x.n)
            for x in o.read()
            .join(c.read(), "ck")
            .join(n.read(), "nk")
            .join(r.read(), "nk")
            .groupBy("rname")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert got == exp

    def test_chain_as_mv_upstream(self, spark, tmp_path, env3):
        """A SELECT * chain view qualifies as an MV-over-MV upstream
        (its final state table IS its visible rows)."""
        o, c, n, tables = env3
        root = str(tmp_path / "mv_chainup")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW wide3 LOCATION '{root}' "
            "PRIMARY KEY (k, ck, nk) AS "
            "SELECT * FROM orders JOIN customer USING (ck) "
            "JOIN nation USING (nk)",
            tables,
        )
        root2 = str(tmp_path / "mv_over_chain")
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW per_nation LOCATION '{root2}' AS "
            "SELECT nname, MIN(price) AS lo FROM wide3 GROUP BY nname",
            tables,
        )
        execute_sql(spark, "DELETE FROM orders WHERE k = 1", tables)
        execute_sql(
            spark, "REFRESH MATERIALIZED VIEW per_nation CASCADE", tables
        )
        got = sorted(
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM per_nation", tables
            ).collect()
        )
        exp = sorted(
            (x.nname, x.lo)
            for x in o.read()
            .join(c.read(), "ck")
            .join(n.read(), "nk")
            .groupBy("nname")
            .agg(F.min("price").alias("lo"))
            .collect()
        )
        assert got == exp


def test_chain_having_and_continuous_refresh(spark, tmp_path, env3):
    """HAVING over a chain aggregate (read-time group filter) and the
    chain's continuous refresh: one stream per BASE feed, any commit
    drains the whole cascade without a REFRESH statement."""
    import time

    o, c, n, tables = env3
    root = str(tmp_path / "mv_chaincr")
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW busy3 LOCATION '{root}' "
        "PRIMARY KEY (k, ck, nk) AS "
        "SELECT nname, COUNT(*) AS cnt, SUM(price) AS total "
        "FROM orders JOIN customer USING (ck) "
        "JOIN nation USING (nk) GROUP BY nname HAVING cnt >= 2",
        tables,
    )

    def expect():
        return {
            (x.nname, x.cnt, x.total)
            for x in o.read()
            .join(c.read(), "ck")
            .join(n.read(), "nk")
            .groupBy("nname")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("price").alias("total"),
            )
            .filter(F.col("cnt") >= 2)
            .collect()
        }

    def got():
        return {
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM busy3", tables
            ).collect()
        }

    assert got() == expect()
    nstreams = execute_sql(
        spark,
        f"ALTER MATERIALIZED VIEW busy3 START CONTINUOUS REFRESH "
        f"CHECKPOINT '{tmp_path / 'crk3'}'",
        tables,
    )
    assert nstreams == 3  # one per base feed
    try:
        # DML on the middle and last feeds only — the chain must still
        # drain end-to-end from those triggers
        execute_sql(spark, "DELETE FROM customer WHERE ck = 20", tables)
        execute_sql(
            spark,
            "UPDATE nation SET nname = 'US2' WHERE nk = 100",
            tables,
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if got() == expect():
                break
            time.sleep(2)
        assert got() == expect()
    finally:
        assert (
            execute_sql(
                spark,
                "ALTER MATERIALIZED VIEW busy3 STOP CONTINUOUS REFRESH",
                tables,
            )
            == 3
        )


class TestOuterFinalChain:
    """Chains whose FINAL join is OUTER (r12): the last intermediate
    synthesizes a single pk (__lk) so the outer padded machinery has a
    row identity; unmatched intermediate rows null-pad the last dim."""

    def test_parse(self):
        s = parse_mv_body(
            "SELECT * FROM orders JOIN customer USING (ck) "
            "LEFT JOIN nation USING (nk)",
            ("k", "ck", "nk"),
        )
        assert s["kind"] == "join_chain"
        assert s["last_join_type"] == "left"
        s2 = parse_mv_body(
            "SELECT nname, COUNT(*) AS n FROM orders "
            "JOIN customer USING (ck) FULL OUTER JOIN nation "
            "USING (nk) GROUP BY nname",
            ("k", "ck", "nk"),
        )
        assert s2["kind"] == "join_chain_agg"
        assert s2["last_join_type"] == "full"

    def _env(self, spark, tmp_path):
        o = VersionedTable.create(
            spark, str(tmp_path / "o_of"),
            spark.createDataFrame(
                [(1, 10, 1.0), (2, 20, 2.0), (3, 10, 3.0), (4, 30, 4.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        c = VersionedTable.create(
            spark, str(tmp_path / "c_of"),
            spark.createDataFrame(
                # nk=300 has NO nation row -> those joined rows pad
                [(10, "a", 100), (20, "b", 200), (30, "c", 300)],
                "ck bigint, seg string, nk bigint",
            ),
        )
        n = VersionedTable.create(
            spark, str(tmp_path / "n_of"),
            spark.createDataFrame(
                [(100, "US"), (200, "DE"), (999, "XX")],
                "nk bigint, nname string",
            ),
        )
        return o, c, n, {"orders": o, "customer": c, "nation": n}

    def test_left_final_select_star_tracks_recompute(
        self, spark, tmp_path
    ):
        o, c, n, tables = self._env(spark, tmp_path)
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW wof LOCATION "
            f"'{tmp_path / 'mv_of'}' PRIMARY KEY (k, ck, nk) AS "
            "SELECT * FROM orders JOIN customer USING (ck) "
            "LEFT JOIN nation USING (nk)",
            tables,
        )

        def expect():
            df = (
                o.read()
                .join(c.read(), "ck")
                .join(n.read(), "nk", "left")
            )
            return sorted(
                map(tuple, df.select(
                    "k", "ck", "nk", "price", "seg", "nname"
                ).collect())
            )

        def got():
            out = execute_sql(spark, "SELECT * FROM wof", tables)
            assert "__lk" not in out.columns  # internal pk stays hidden
            return sorted(
                tuple(x)
                for x in out.select(
                    "k", "ck", "nk", "price", "seg", "nname"
                ).collect()
            )

        assert got() == expect()
        assert any(x[5] is None for x in got())  # nk=300 padded
        # transitions on every feed: pad->match (nation 300 appears),
        # match->pad (nation 100 dies), fact + middle-table churn
        execute_sql(spark, "INSERT INTO nation VALUES (300, 'BR')", tables)
        execute_sql(spark, "DELETE FROM nation WHERE nk = 100", tables)
        execute_sql(spark, "INSERT INTO orders VALUES (5, 20, 9.0)", tables)
        execute_sql(spark, "DELETE FROM customer WHERE ck = 20", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW wof", tables)
        assert got() == expect()

    def test_full_final_agg_tracks_recompute(self, spark, tmp_path):
        o, c, n, tables = self._env(spark, tmp_path)
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW fof LOCATION "
            f"'{tmp_path / 'mv_ff'}' PRIMARY KEY (k, ck, nk) AS "
            "SELECT nname, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders JOIN customer USING (ck) "
            "FULL JOIN nation USING (nk) GROUP BY nname",
            tables,
        )

        def expect():
            return sorted(
                ((x.nname or "~"), x.n, x.total)
                for x in o.read()
                .join(c.read(), "ck")
                .join(n.read(), "nk", "full")
                .groupBy("nname")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price").alias("total"),
                )
                .collect()
            )

        def got():
            return sorted(
                ((x.nname or "~"), x.n, x.total)
                for x in execute_sql(
                    spark, "SELECT * FROM fof", tables
                ).collect()
            )

        assert got() == expect()
        # XX (999) rides as a right-padded group; NULL group holds the
        # nk=300 rows. Mutate all three feeds and both padded sets.
        execute_sql(spark, "DELETE FROM nation WHERE nk = 999", tables)
        execute_sql(spark, "INSERT INTO nation VALUES (300, 'BR')", tables)
        execute_sql(
            spark, "UPDATE orders SET price = 7.5 WHERE k = 1", tables
        )
        execute_sql(spark, "REFRESH MATERIALIZED VIEW fof", tables)
        assert got() == expect()

    def test_left_final_extremes_composed(self, spark, tmp_path):
        o, c, n, tables = self._env(spark, tmp_path)
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW xof LOCATION "
            f"'{tmp_path / 'mv_xf'}' PRIMARY KEY (k, ck, nk) AS "
            "SELECT nname, MIN(price) AS lo, MAX(price) AS hi "
            "FROM orders JOIN customer USING (ck) "
            "LEFT JOIN nation USING (nk) GROUP BY nname",
            tables,
        )

        def expect():
            return sorted(
                ((x.nname or "~"), x.lo, x.hi)
                for x in o.read()
                .join(c.read(), "ck")
                .join(n.read(), "nk", "left")
                .groupBy("nname")
                .agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
                .collect()
            )

        def got():
            return sorted(
                ((x.nname or "~"), x.lo, x.hi)
                for x in execute_sql(
                    spark, "SELECT * FROM xof", tables
                ).collect()
            )

        assert got() == expect()
        # delete AT the NULL group's extreme (k=4 is its only row:
        # group death), and AT the US minimum (k=1) -> endangered rescan
        execute_sql(spark, "DELETE FROM orders WHERE k = 4", tables)
        execute_sql(spark, "DELETE FROM orders WHERE k = 1", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW xof", tables)
        assert got() == expect()
        # reopen from disk rebuilds the synth-pk cascade
        mv = MaterializedView.open(spark, str(tmp_path / "mv_xf"))
        assert sorted(
            ((x.nname or "~"), x.lo, x.hi) for x in mv.read().collect()
        ) == expect()

    def test_outer_final_chain_as_upstream(self, spark, tmp_path):
        """r13 completion: an outer-final chain feeds a downstream
        aggregate through its rendered join-row projection (keyed by
        the synthesized __lk + last pk); the padded NULL-dim rows roll
        up as their own group."""
        o, c, n, tables = self._env(spark, tmp_path)
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW upof LOCATION "
            f"'{tmp_path / 'mv_up'}' PRIMARY KEY (k, ck, nk) AS "
            "SELECT * FROM orders JOIN customer USING (ck) "
            "LEFT JOIN nation USING (nk)",
            tables,
        )
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW over LOCATION "
            f"'{tmp_path / 'mv_over'}' AS "
            "SELECT nname, COUNT(*) AS n FROM upof GROUP BY nname",
            tables,
        )
        execute_sql(spark, "DELETE FROM nation WHERE nk = 100", tables)
        execute_sql(
            spark, "REFRESH MATERIALIZED VIEW over CASCADE", tables
        )
        got = sorted(
            ((x.nname or "~"), x.n)
            for x in execute_sql(
                spark, "SELECT * FROM over", tables
            ).collect()
        )
        exp = sorted(
            ((x.nname or "~"), x.n)
            for x in o.read()
            .join(c.read(), "ck")
            .join(n.read(), "nk", "left")
            .groupBy("nname")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert got == exp
