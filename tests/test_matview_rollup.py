"""Aggregate views as MV-over-MV upstreams (rollup pyramids, r13):
an aggregate view's STATE table keeps hidden accumulators (`_n`,
`_nn_*`, `__ac_*`) and applies HAVING/aliases at read — so a
downstream view consumes the RENDERED projection instead: `rendered/`
under the upstream root holds exactly the upstream's SQL-visible rows,
maintained from the agg state's CDC (affected groups re-rendered,
vanished / HAVING-crossing groups merge-deleted). Every level of a
`base → daily → monthly → yearly` pyramid must equal the full
recompute through arbitrary DML with ONE cascade refresh, and the
upstream's internals (`_nn_*`, `__gid`, `__d_*`) must never leak into
the rendered table or the downstream's read."""

import os

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.matview import (
    MaterializedView,
    MaterializedViewError,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


ROWS = [
    (f"2024-{m:02d}-{d:02d}", i, float((i * 3) % 11), f"g{i % 3}")
    for i, (m, d) in enumerate(
        [(mm, dd) for mm in (1, 2, 3) for dd in (1, 2, 15, 28)] * 3
    )
]


@pytest.fixture()
def src(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            ROWS, "day string, id bigint, amt double, grp string"
        ),
    )


def _mk_pyramid(spark, tmp_path, src, having=None):
    daily = MaterializedView.create(
        spark,
        str(tmp_path / "daily"),
        "SELECT day, COUNT(*) AS n, SUM(amt) AS total FROM t GROUP BY day"
        + (f" HAVING {having}" if having else ""),
        {"t": src},
    )
    monthly = MaterializedView.create(
        spark,
        str(tmp_path / "monthly"),
        "SELECT substr(day, 1, 7) AS month, SUM(n) AS n, "
        "SUM(total) AS total FROM daily GROUP BY month",
        {"daily": daily},
    )
    return daily, monthly


def _monthly_expect(src, having=None):
    day = (
        src.read()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total"))
    )
    if having:
        day = day.filter(F.expr(having))
    return sorted(
        (r.month, r.n, r.total)
        for r in day.groupBy(F.substring("day", 1, 7).alias("month"))
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .collect()
    )


def _monthly_got(monthly):
    return sorted(
        (r.month, r.n, r.total) for r in monthly.read().collect()
    )


def test_pyramid_tracks_recompute_through_dml(spark, tmp_path, src):
    daily, monthly = _mk_pyramid(spark, tmp_path, src)
    assert _monthly_got(monthly) == _monthly_expect(src)
    # insert a new month, update amounts, delete a day, then a GROUP
    # CROSSING MONTHS: move a row's day from March to January
    src.append(
        spark.createDataFrame(
            [("2024-04-01", 999, 5.0, "g0")],
            "day string, id bigint, amt double, grp string",
        )
    )
    src.update_where(F.col("id") % 5 == 0, {"amt": F.col("amt") + 10.0})
    src.delete_where(F.col("day") == "2024-02-15")
    src.update_where(
        F.col("day") == "2024-03-28", {"day": F.lit("2024-01-28")}
    )
    monthly.refresh(cascade=True)
    assert _monthly_got(monthly) == _monthly_expect(src)
    # a whole month leaves both levels
    src.delete_where(F.substring("day", 1, 7) == "2024-04")
    monthly.refresh(cascade=True)
    assert _monthly_got(monthly) == _monthly_expect(src)


def test_no_internal_columns_leak(spark, tmp_path, src):
    daily, monthly = _mk_pyramid(spark, tmp_path, src)
    src.update_where(F.col("id") == 1, {"amt": F.lit(100.0)})
    monthly.refresh(cascade=True)
    rendered = VersionedTable(spark, daily.rendered_root()).read()
    for cols in (rendered.columns, monthly.read().columns):
        bad = [
            c for c in cols if c.startswith("_nn_") or c.startswith("__")
            or c == "_n"
        ]
        assert not bad, cols
    # rendered rows ARE the upstream's visible rows
    assert sorted(map(tuple, rendered.collect())) == sorted(
        map(tuple, daily.read().collect())
    )


def test_having_boundary_crossing_propagates(spark, tmp_path, src):
    daily, monthly = _mk_pyramid(spark, tmp_path, src, having="n >= 3")
    assert _monthly_got(monthly) == _monthly_expect(src, having="n >= 3")
    # push a day ACROSS the HAVING boundary both ways
    src.append(
        spark.createDataFrame(
            [("2024-01-01", 500 + i, 1.0, "g1") for i in range(2)],
            "day string, id bigint, amt double, grp string",
        )
    )
    src.delete_where(
        (F.col("day") == "2024-02-01") & (F.col("id") % 2 == 0)
    )
    monthly.refresh(cascade=True)
    assert _monthly_got(monthly) == _monthly_expect(src, having="n >= 3")


def test_three_level_pyramid_one_cascade(spark, tmp_path, src):
    daily, monthly = _mk_pyramid(spark, tmp_path, src)
    yearly = MaterializedView.create(
        spark,
        str(tmp_path / "yearly"),
        "SELECT substr(month, 1, 4) AS year, SUM(n) AS n, "
        "SUM(total) AS total FROM monthly GROUP BY year",
        {"monthly": monthly},
    )
    src.update_where(F.col("id") % 4 == 1, {"amt": F.lit(50.0)})
    src.append(
        spark.createDataFrame(
            [("2025-01-01", 777, 2.5, "g2")],
            "day string, id bigint, amt double, grp string",
        )
    )
    yearly.refresh(cascade=True)
    exp = sorted(
        (r.year, r.n, r.total)
        for r in src.read()
        .groupBy(F.substring("day", 1, 4).alias("year"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total"))
        .collect()
    )
    got = sorted(
        (r.year, r.n, r.total) for r in yearly.read().collect()
    )
    assert got == exp


def test_refresh_through_reopened_handle_keeps_rendered_fresh(
    spark, tmp_path, src
):
    daily, monthly = _mk_pyramid(spark, tmp_path, src)
    src.update_where(F.col("id") == 2, {"amt": F.lit(99.0)})
    # refresh the UPSTREAM through a handle opened from disk — the
    # persisted "rendered" flag must keep rendered/ lockstep
    MaterializedView.open(spark, daily.root).refresh()
    monthly.refresh()  # downstream only; upstream already refreshed
    assert _monthly_got(monthly) == _monthly_expect(src)


def test_min_max_avg_distinct_upstream_renders(spark, tmp_path, src):
    daily = MaterializedView.create(
        spark,
        str(tmp_path / "daily"),
        "SELECT day, COUNT(*) AS n, MIN(amt) AS lo, MAX(amt) AS hi, "
        "AVG(amt) AS mean, COUNT(DISTINCT grp) AS groups "
        "FROM t GROUP BY day",
        {"t": src},
    )
    monthly = MaterializedView.create(
        spark,
        str(tmp_path / "monthly"),
        "SELECT substr(day, 1, 7) AS month, MIN(lo) AS lo, "
        "MAX(hi) AS hi, SUM(n) AS n FROM daily GROUP BY month",
        {"daily": daily},
    )
    # deletes at stored extremes (endangered rescans) + distinct churn
    src.delete_where(F.col("amt") == 0.0)
    src.update_where(F.col("id") % 6 == 2, {"grp": F.lit("g9")})
    monthly.refresh(cascade=True)
    exp_day = (
        src.read()
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
            F.avg("amt").alias("mean"),
            F.countDistinct("grp").alias("groups"),
        )
    )
    rendered = VersionedTable(spark, daily.rendered_root()).read()
    assert sorted(
        (r.day, r.n, r.lo, r.hi, r.mean, r.groups)
        for r in rendered.collect()
    ) == sorted(
        (r.day, r.n, r.lo, r.hi, r.mean, r.groups)
        for r in exp_day.collect()
    )
    exp = sorted(
        (r.month, r.lo, r.hi, r.n)
        for r in exp_day.groupBy(
            F.substring("day", 1, 7).alias("month")
        )
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum("n").alias("n"),
        )
        .collect()
    )
    got = sorted(
        (r.month, r.lo, r.hi, r.n) for r in monthly.read().collect()
    )
    assert got == exp


def test_inner_join_agg_upstream(spark, tmp_path, spark_tmp_factory=None):
    left = VersionedTable.create(
        spark,
        str(tmp_path / "l"),
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(40)],
            "lid bigint, k bigint, v double",
        ),
    )
    right = VersionedTable.create(
        spark,
        str(tmp_path / "r"),
        spark.createDataFrame(
            [(100 + k, k, f"seg{k % 2}") for k in range(4)],
            "rid bigint, k bigint, seg string",
        ),
    )
    per_seg = MaterializedView.create(
        spark,
        str(tmp_path / "per_seg"),
        "SELECT seg, COUNT(*) AS n, SUM(v) AS sv "
        "FROM l JOIN r USING (k) GROUP BY seg",
        {"l": left, "r": right},
        primary_key=("lid", "rid"),
    )
    rollup = MaterializedView.create(
        spark,
        str(tmp_path / "rollup"),
        "SELECT seg, COUNT(*) AS segs, SUM(sv) AS sv FROM per_seg "
        "GROUP BY seg",
        {"per_seg": per_seg},
    )
    left.update_where(F.col("lid") % 3 == 0, {"v": F.col("v") + 5.0})
    right.delete_where(F.col("k") == 3)
    rollup.refresh(cascade=True)
    exp_seg = (
        left.read()
        .join(right.read(), "k")
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    got = sorted(
        (r.seg, r.segs, r.sv) for r in rollup.read().collect()
    )
    exp = sorted((r.seg, 1, r.sv) for r in exp_seg.collect())
    assert got == exp


def test_outer_star_upstream_serves_agg_refuses_join(
    spark, tmp_path, src
):
    other = VersionedTable.create(
        spark,
        str(tmp_path / "o"),
        spark.createDataFrame(
            [("2024-01-01", 1)], "day string, flag bigint"
        ),
    )
    outer = MaterializedView.create(
        spark,
        str(tmp_path / "outer"),
        "SELECT * FROM t LEFT JOIN o USING (day)",
        {"t": src, "o": other},
        primary_key=("id", "flag"),
    )
    # aggregate downstream: served from the rendered join-row table
    down = MaterializedView.create(
        spark,
        str(tmp_path / "down"),
        "SELECT flag, COUNT(*) AS n FROM outer GROUP BY flag",
        {"outer": outer},
    )
    src.delete_where(F.col("day") == "2024-01-01")
    down.refresh(cascade=True)
    exp = sorted(
        ((r.flag if r.flag is not None else -1), r.n)
        for r in src.read()
        .join(other.read(), "day", "left")
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted(
        ((r.flag if r.flag is not None else -1), r.n)
        for r in down.read().collect()
    )
    assert got == exp
    # a JOIN downstream over one refuses (padded NULL-able pks)
    with pytest.raises(MaterializedViewError, match="null-safe"):
        MaterializedView.create(
            spark,
            str(tmp_path / "bad"),
            "SELECT * FROM outer JOIN o USING (day)",
            {"outer": outer, "o": other},
            primary_key=("id", "flag"),
        )


def test_sum_alias_named_n_maintains(spark, tmp_path, src):
    # regression for the count-delta alias collision: a user sum alias
    # literally named "n" used to collide with the internal "__d_n"
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        "SELECT grp, SUM(id) AS n FROM t GROUP BY grp",
        {"t": src},
    )
    src.update_where(F.col("id") % 2 == 0, {"id": F.col("id") + 1000})
    mv.refresh()
    exp = sorted(
        (r.grp, r.n)
        for r in src.read()
        .groupBy("grp")
        .agg(F.sum("id").alias("n"))
        .collect()
    )
    assert sorted((r.grp, r.n) for r in mv.read().collect()) == exp


def test_pyramid_through_sql_statements(spark, tmp_path, src):
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    tables = {"t": src}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW daily LOCATION "
        f"'{tmp_path / 'daily'}' AS SELECT day, COUNT(*) AS n, "
        f"SUM(amt) AS total FROM t GROUP BY day",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW monthly LOCATION "
        f"'{tmp_path / 'monthly'}' AS SELECT substr(day, 1, 7) AS "
        f"month, SUM(n) AS n, SUM(total) AS total FROM daily "
        f"GROUP BY month",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE t SET amt = amt + 3.0 WHERE id % 4 = 2",
        tables,
    )
    execute_sql(spark, "DELETE FROM t WHERE day = '2024-03-15'", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW monthly CASCADE", tables)
    got = sorted(
        (r.month, r.n, r.total)
        for r in execute_sql(
            spark, "SELECT * FROM monthly", tables
        ).collect()
    )
    assert got == _monthly_expect(src)


class TestOuterAggUpstream:
    """r13 completion: OUTER-join AGGREGATE views feed downstream views
    too — their rendered projection keys by the hidden null-safe
    ``__gid`` (padded rows group under NULL keys), and the downstream
    single-table aggregate is built null-safe so NULL groups combine
    instead of duplicating. SELECT * outer views still refuse; a JOIN
    downstream over an outer-agg upstream refuses (NULL pks)."""

    def _env(self, spark, tmp_path):
        o = VersionedTable.create(
            spark,
            str(tmp_path / "o"),
            spark.createDataFrame(
                [(k, 10 * (k % 4), float(k)) for k in range(1, 21)],
                "k bigint, ck bigint, price double",
            ),
        )
        c = VersionedTable.create(
            spark,
            str(tmp_path / "c"),
            spark.createDataFrame(
                [(10, "alpha"), (20, "beta")], "ck bigint, seg string"
            ),
        )
        return o, c

    def _expect(self, o, c):
        j = o.read().join(c.read(), "ck", "left")
        d = (
            j.groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price").alias("total"),
            )
            .groupBy(F.substring("seg", 1, 1).alias("s1"))
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )
        return sorted(
            ((r.s1 or "~"), r.n, r.total) for r in d.collect()
        )

    def test_outer_agg_rollup_through_pad_transitions(
        self, spark, tmp_path
    ):
        o, c = self._env(spark, tmp_path)
        up = MaterializedView.create(
            spark,
            str(tmp_path / "up"),
            "SELECT seg, COUNT(*) AS n, SUM(price) AS total "
            "FROM o LEFT JOIN c USING (ck) GROUP BY seg",
            {"o": o, "c": c},
            primary_key=("k", "ck"),
        )
        down = MaterializedView.create(
            spark,
            str(tmp_path / "down"),
            "SELECT substr(seg, 1, 1) AS s1, SUM(n) AS n, "
            "SUM(total) AS total FROM up GROUP BY s1",
            {"up": up},
        )

        def got():
            return sorted(
                ((r.s1 or "~"), r.n, r.total)
                for r in down.read().collect()
            )

        assert got() == self._expect(o, c)
        # pad->match (new dim row claims the ck=0 padded group),
        # match->pad (dim deletion pads a whole segment), value churn
        c.append(
            spark.createDataFrame([(0, "gamma")], "ck bigint, seg string")
        )
        c.delete_where(F.col("ck") == 20)
        o.update_where(
            F.col("k") % 3 == 0, {"price": F.col("price") + 100.0}
        )
        down.refresh(cascade=True)
        assert got() == self._expect(o, c)
        # the NULL group flows as its own rollup bucket; the rendered
        # table carries ONLY the documented __gid merge key beyond the
        # visible rows, and nothing internal reaches the downstream read
        assert "~" in {x[0] for x in got()}
        rend_cols = set(
            VersionedTable(spark, up.rendered_root()).read().columns
        )
        assert rend_cols == {"seg", "n", "total", "__gid"}, rend_cols
        assert set(down.read().columns) == {"s1", "n", "total"}

    def test_composed_outer_extremes_upstream(self, spark, tmp_path):
        o, c = self._env(spark, tmp_path)
        up = MaterializedView.create(
            spark,
            str(tmp_path / "up"),
            "SELECT seg, MIN(price) AS lo, MAX(price) AS hi "
            "FROM o LEFT JOIN c USING (ck) GROUP BY seg",
            {"o": o, "c": c},
            primary_key=("k", "ck"),
        )
        down = MaterializedView.create(
            spark,
            str(tmp_path / "down"),
            "SELECT COUNT(*) AS segs, MIN(lo) AS lo, MAX(hi) AS hi, "
            "seg FROM up GROUP BY seg",
            {"up": up},
        )
        # delete AT the padded group's max (endangered rescan upstream)
        o.delete_where(F.col("price") == 19.0)
        o.update_where(F.col("k") == 2, {"price": F.lit(0.5)})
        down.refresh(cascade=True)
        exp = sorted(
            ((r.seg or "~"), 1, r.lo, r.hi)
            for r in o.read()
            .join(c.read(), "ck", "left")
            .groupBy("seg")
            .agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
            .collect()
        )
        got = sorted(
            ((r.seg or "~"), r.segs, r.lo, r.hi)
            for r in down.read().collect()
        )
        assert got == exp

    def test_join_downstream_over_outer_agg_refuses(
        self, spark, tmp_path
    ):
        o, c = self._env(spark, tmp_path)
        up = MaterializedView.create(
            spark,
            str(tmp_path / "up"),
            "SELECT seg, COUNT(*) AS n FROM o LEFT JOIN c USING (ck) "
            "GROUP BY seg",
            {"o": o, "c": c},
            primary_key=("k", "ck"),
        )
        dim = VersionedTable.create(
            spark,
            str(tmp_path / "dim"),
            spark.createDataFrame(
                [("alpha", 1)], "seg string, rank bigint"
            ),
        )
        with pytest.raises(
            MaterializedViewError, match="NULL group keys"
        ):
            MaterializedView.create(
                spark,
                str(tmp_path / "bad"),
                "SELECT * FROM up JOIN dim USING (seg)",
                {"up": up, "dim": dim},
                primary_key=("seg", "rank"),
            )


class TestRenderedScanBound:
    """r14: the rendered projection's refresh must be O(affected), not
    O(view). For SELECT * OUTER row-view upstreams the incremental
    path builds the merge input from the state tables' CHANGE ROWS
    alone (SELECT * deltas carry the full visible payload) — a 1-row
    DML refresh performs ZERO VersionedTable.read() calls; only
    version-bounded changes() windows. For aggregate upstreams the
    read() scan is the agg STATE (groups-sized, bounded by key
    cardinality) — acceptable by construction, docstring-audited."""

    def _outer_env(self, spark, tmp_path):
        left = VersionedTable.create(
            spark,
            str(tmp_path / "l"),
            spark.createDataFrame(
                [(i, f"d{i % 4}", float(i)) for i in range(40)],
                "lid bigint, dk string, v double",
            ),
        )
        right = VersionedTable.create(
            spark,
            str(tmp_path / "r"),
            spark.createDataFrame(
                [(j, f"d{j}") for j in range(3)],
                "rid bigint, dk string",
            ),
        )
        outer = MaterializedView.create(
            spark,
            str(tmp_path / "outer"),
            "SELECT * FROM l LEFT JOIN r USING (dk)",
            {"l": left, "r": right},
            primary_key=("lid", "rid"),
        )
        outer.ensure_rendered()
        return left, right, outer

    def _expect(self, left, right):
        return sorted(
            map(
                tuple,
                left.read()
                .join(right.read(), "dk", "left")
                .select("dk", "lid", "v", "rid")
                .collect(),
            )
        )

    def _got(self, spark, outer):
        return sorted(
            map(
                tuple,
                VersionedTable(spark, outer.rendered_root())
                .read()
                .select("dk", "lid", "v", "rid")
                .collect(),
            )
        )

    def test_one_row_dml_reads_no_state_table(
        self, spark, tmp_path, monkeypatch
    ):
        left, right, outer = self._outer_env(spark, tmp_path)
        left.append(
            spark.createDataFrame(
                [(999, "d1", 9.5)], "lid bigint, dk string, v double"
            )
        )
        outer._view.refresh()  # state tables current; rendered stale

        reads: list[str] = []
        changes: list[str] = []
        orig_read = VersionedTable.read
        orig_changes = VersionedTable.changes

        def spy_read(self, *a, **kw):
            reads.append(self.root)
            return orig_read(self, *a, **kw)

        def spy_changes(self, *a, **kw):
            changes.append(self.root)
            return orig_changes(self, *a, **kw)

        monkeypatch.setattr(VersionedTable, "read", spy_read)
        monkeypatch.setattr(VersionedTable, "changes", spy_changes)
        outer.refresh_rendered()
        monkeypatch.undo()

        # ZERO full reads anywhere — not the state tables, not the
        # base tables, not the rendered table itself (merge is MoR)
        assert reads == [], reads
        # the input really was the change feeds
        assert changes, "incremental path must consume changes()"
        assert self._got(spark, outer) == self._expect(left, right)

    def test_pad_match_transition_through_change_rows(
        self, spark, tmp_path, monkeypatch
    ):
        """pad→match and match→pad transitions arrive as cross-table
        delete+insert pairs; the change-rows-only path must render
        both directions without a state scan."""
        left, right, outer = self._outer_env(spark, tmp_path)
        # d3 rows are padded (no right match): give them a match
        right.append(
            spark.createDataFrame([(7, "d3")], "rid bigint, dk string")
        )
        # and un-match d0 rows: drop their right row
        right.delete_where(F.col("rid") == 0)
        outer._view.refresh()

        reads: list[str] = []
        orig_read = VersionedTable.read

        def spy_read(self, *a, **kw):
            reads.append(self.root)
            return orig_read(self, *a, **kw)

        monkeypatch.setattr(VersionedTable, "read", spy_read)
        outer.refresh_rendered()
        monkeypatch.undo()

        assert reads == [], reads
        assert self._got(spark, outer) == self._expect(left, right)

    def test_update_in_place_final_image_wins(
        self, spark, tmp_path, monkeypatch
    ):
        """an UPDATE is delete(old)+insert(new) in ONE commit with the
        same gid — the per-feed final image must pick the new image,
        and repeated updates across commits must pick the latest."""
        left, right, outer = self._outer_env(spark, tmp_path)
        left.update_where(F.col("lid") == 5, {"v": F.lit(50.0)})
        left.update_where(F.col("lid") == 5, {"v": F.lit(500.0)})
        outer._view.refresh()

        reads: list[str] = []
        orig_read = VersionedTable.read

        def spy_read(self, *a, **kw):
            reads.append(self.root)
            return orig_read(self, *a, **kw)

        monkeypatch.setattr(VersionedTable, "read", spy_read)
        outer.refresh_rendered()
        monkeypatch.undo()

        assert reads == [], reads
        got = self._got(spark, outer)
        assert got == self._expect(left, right)
        assert [t for t in got if t[1] == 5][0][2] == 500.0
