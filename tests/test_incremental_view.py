"""Incremental aggregate materialized views (sinks/incremental_view.py):
delta maintenance from the change feed must always equal a full recompute,
through appends, merges (updates), deletes, group births and group deaths,
crash-replayed refreshes, and random DML sequences."""

from __future__ import annotations

import random
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.incremental_view import (
    IncrementalAggView,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

SCHEMA = "id bigint, grp string, amt decimal(10,2)"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, g, Decimal(a)) for i, g, a in rows], SCHEMA
    )


def _recompute(t):
    return {
        (r.grp, r.n, str(r.total))
        for r in t.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total"))
        .collect()
    }


def _view_state(view):
    return {
        (r.grp, r._n, str(r.total)) for r in view.read().collect()
    }


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "view")


def test_first_refresh_materializes_full_aggregate(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "1.00"), (2, "a", "2.00"), (3, "b", "5.00")]),
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    assert view.refresh() == 1
    assert _view_state(view) == _recompute(t)
    assert view.last_refreshed_version() == 1


def test_delta_refresh_matches_recompute(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root, _df(spark, [(1, "a", "1.00"), (2, "b", "2.00")])
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()

    # Append (existing + brand-new group), update via merge, delete.
    t.append(_df(spark, [(3, "a", "3.50"), (4, "c", "7.00")]))
    t.merge(_df(spark, [(1, "a", "10.00")]), ["id"])  # update 1.00 -> 10.00
    t.delete_where(F.col("grp") == "b")  # group death
    assert view.refresh() == t.latest_version()
    assert _view_state(view) == _recompute(t)
    # Group 'b' must have LEFT the view, not linger at count 0.
    assert all(g != "b" for g, _, _ in _view_state(view))


def test_refresh_is_idempotent(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(spark, src_root, _df(spark, [(1, "a", "1.00")]))
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()
    t.append(_df(spark, [(2, "a", "2.00")]))
    assert view.refresh() == 2
    assert view.refresh() is None  # crash-replay: nothing new, no change
    assert view.refresh() is None
    assert _view_state(view) == _recompute(t)
    # View history shows exactly 2 source marks (no empty commits).
    marks = [
        m.summary.get("source_version")
        for m in VersionedTable(spark, view_root).versions()
    ]
    assert marks == [1, 2]


def test_expression_sums(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "2.00"), (2, "a", "3.00"), (3, "b", "4.00")]),
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"],
        {"doubled": "amt * 2", "cnt_hi": "CAST(amt > 2.50 AS INT)"},
    )
    view.refresh()
    t.append(_df(spark, [(4, "b", "1.00")]))
    t.delete_where(F.col("id") == 1)
    view.refresh()
    got = {
        (r.grp, r._n, str(r.doubled), r.cnt_hi)
        for r in view.read().collect()
    }
    assert got == {("a", 1, "6.00", 1), ("b", 2, "10.00", 1)}


@pytest.mark.parametrize("seed", [11, 47])
def test_random_dml_view_always_matches_recompute(spark, roots, seed):
    """Model-based: after EVERY refresh across a random DML sequence the
    incremental state must equal the from-scratch aggregate."""
    src_root, view_root = roots
    rng = random.Random(seed)
    next_id = 10

    def fresh(n):
        nonlocal next_id
        out = [
            (next_id + i, rng.choice("abcd"), f"{rng.randint(1, 999)}.25")
            for i in range(n)
        ]
        next_id += n
        return out

    t = VersionedTable.create(spark, src_root, _df(spark, fresh(4)))
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()
    for _ in range(5):
        op = rng.choice(["append", "merge", "delete"])
        if op == "append":
            t.append(_df(spark, fresh(rng.randint(1, 3))))
        elif op == "merge":
            ids = [r.id for r in t.read().select("id").collect()]
            pick = rng.sample(ids, min(2, len(ids)))
            t.merge(
                _df(
                    spark,
                    [(i, rng.choice("abcd"), "50.50") for i in pick],
                ),
                ["id"],
            )
        else:
            m = rng.randint(2, 4)
            t.delete_where(F.col("id") % m == 0)
        if rng.random() < 0.7:  # sometimes skip: multi-version catch-up
            view.refresh()
    view.refresh()
    assert _view_state(view) == _recompute(t), f"seed {seed}"


def test_continuous_refresh_follows_source_dml(spark, roots):
    """The change stream triggers refreshes: appends, merges, and deletes
    on the source flow into the view without manual refresh calls."""
    import time

    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root, _df(spark, [(1, "a", "1.00"), (2, "b", "2.00")])
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()

    import tempfile

    ck = tempfile.mkdtemp(prefix="dlis_mv_ck_")
    q = view.start_continuous_refresh(ck)

    def wait_match(timeout_s=90):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                if _view_state(view) == _recompute(t):
                    return True
            except Exception:
                pass
            time.sleep(0.5)
        return False

    try:
        t.append(_df(spark, [(3, "a", "3.00"), (4, "c", "4.00")]))
        assert wait_match(), "append did not reach the view"
        t.merge(_df(spark, [(1, "a", "10.00")]), ["id"])
        t.delete_where(F.col("grp") == "b")
        assert wait_match(), "merge/delete did not reach the view"
    finally:
        q.stop()
    assert _view_state(view) == _recompute(t)


def test_all_null_sum_group_renders_null_like_recompute(spark, roots):
    """A group whose sum expression is all-NULL must show sum NULL (what a
    full recompute yields), not 0 — including after deletes remove the
    last non-null contribution."""
    src_root, view_root = roots
    rows = [(1, "a", Decimal("5.00")), (2, "b", None), (3, "b", None)]
    t = VersionedTable.create(
        spark, src_root, spark.createDataFrame(rows, SCHEMA)
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()
    got = {(r.grp, r._n, r.total) for r in view.read().collect()}
    assert got == {("a", 1, Decimal("5.00")), ("b", 2, None)}

    # Delete the only non-null 'a' row but keep the group alive with a
    # NULL-valued row: its sum must BECOME NULL, matching the recompute.
    t.append(spark.createDataFrame([(4, "a", None)], SCHEMA))
    t.delete_where(F.col("id") == 1)
    view.refresh()
    assert _view_state(view) == _recompute(t)
    got = {(r.grp, r._n, r.total) for r in view.read().collect()}
    assert got == {("a", 1, None), ("b", 2, None)}


def test_concurrent_refresh_applies_delta_exactly_once(
    spark, roots, monkeypatch
):
    """Two refreshes racing from the same high-water mark must not both
    apply the delta: the state merge is pinned to the view version the
    refresh read, so the loser conflicts and retries into a no-op."""
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root, _df(spark, [(1, "a", "10.00"), (2, "b", "5.00")])
    )
    view = IncrementalAggView(
        spark, src_root, view_root, keys=["grp"], sums={"total": "amt"}
    )
    view.refresh()
    t.append(_df(spark, [(3, "a", "2.50")]))

    real_merge = VersionedTable.merge
    raced = {}

    def racing_merge(self, *a, **kw):
        if not raced.get("done"):
            raced["done"] = True
            # A competing refresh completes BEFORE this merge commits.
            IncrementalAggView(
                spark,
                src_root,
                view_root,
                keys=["grp"],
                sums={"total": "amt"},
            ).refresh()
        return real_merge(self, *a, **kw)

    monkeypatch.setattr(VersionedTable, "merge", racing_merge)
    view.refresh()
    monkeypatch.undo()
    assert _view_state(view) == _recompute(t)  # NOT double-applied


# -- min/max with per-group partial rebuild ---------------------------------


def _recompute_mm(t):
    return {
        (r.grp, r.n, str(r.total), str(r.lo), str(r.hi))
        for r in t.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amt").alias("total"),
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
        )
        .collect()
    }


def _mm_view(spark, src_root, view_root):
    return IncrementalAggView(
        spark,
        src_root,
        view_root,
        ["grp"],
        sums={"total": "amt"},
        mins={"lo": "amt"},
        maxs={"hi": "amt"},
    )


def _view_state_mm(view):
    return {
        (r.grp, r._n, str(r.total), str(r.lo), str(r.hi))
        for r in view.read().collect()
    }


def test_minmax_insert_only_folds_in(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "5.00"), (2, "a", "2.00"), (3, "b", "7.00")]),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    # New lower min + higher max + brand-new group: pure insert folding.
    t.append(_df(spark, [(4, "a", "1.00"), (5, "a", "9.00"), (6, "c", "3.00")]))
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    # No delete happened, so no rescan must have occurred.
    vt = VersionedTable(spark, view_root)
    assert vt.manifest().summary.get("minmax_rescan_groups") == 0


def test_minmax_delete_of_extreme_rescans_only_that_group(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(
            spark,
            [
                (1, "a", "1.00"), (2, "a", "5.00"), (3, "a", "9.00"),
                (6, "a", "7.00"),
                (4, "b", "2.00"), (5, "b", "6.00"),
            ],
        ),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    # Delete group a's current min: endangered -> rescan of group a only.
    t.delete_where(F.col("id") == 1)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    vt = VersionedTable(spark, view_root)
    assert vt.manifest().summary.get("minmax_rescan_groups") == 1
    # Delete a NON-extreme row (7.00 sits strictly inside [5, 9]): no
    # rescan at all.
    t.delete_where(F.col("id") == 6)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    assert (
        VersionedTable(spark, view_root)
        .manifest()
        .summary.get("minmax_rescan_groups")
        == 0
    )


def test_minmax_tie_at_extreme_survives_partial_delete(spark, roots):
    """Two rows tie at the min; deleting one must keep the extreme (the
    rescan decides — multiplicity is not tracked)."""
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "1.00"), (2, "a", "1.00"), (3, "a", "4.00")]),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    t.delete_where(F.col("id") == 1)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)  # lo still 1.00


def test_minmax_update_moves_extreme_both_ways(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "1.00"), (2, "a", "5.00")]),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    # Update the min row UP (extreme leaves) and the max row DOWN.
    t.merge(_df(spark, [(1, "a", "3.00"), (2, "a", "2.50")]), ["id"])
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)


def test_minmax_group_death_and_rebirth(spark, roots):
    src_root, view_root = roots
    t = VersionedTable.create(
        spark, src_root,
        _df(spark, [(1, "a", "1.00"), (2, "b", "2.00")]),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    t.delete_where(F.col("grp") == "a")
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    t.append(_df(spark, [(3, "a", "8.00")]))
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)


def test_minmax_all_null_group_renders_null(spark, roots):
    src_root, view_root = roots
    rows = [(1, "a", None), (2, "a", None), (3, "b", Decimal("2.00"))]
    t = VersionedTable.create(
        spark, src_root,
        spark.createDataFrame(rows, SCHEMA),
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    # NULL-valued delete never endangers (min/max ignore NULLs).
    t.delete_where(F.col("id") == 1)
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    assert (
        VersionedTable(spark, view_root)
        .manifest()
        .summary.get("minmax_rescan_groups")
        == 0
    )


@pytest.mark.parametrize("seed", [11, 12])
def test_minmax_random_dml_matches_recompute(spark, roots, seed):
    src_root, view_root = roots
    rng = random.Random(seed)
    next_id = 10

    def fresh(n):
        nonlocal next_id
        out = [
            (next_id + i, rng.choice("abc"), f"{rng.randint(1, 99)}.25")
            for i in range(n)
        ]
        next_id += n
        return out

    t = VersionedTable.create(spark, src_root, _df(spark, fresh(5)))
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    for _ in range(5):
        op = rng.choice(["append", "merge", "delete"])
        if op == "append":
            t.append(_df(spark, fresh(rng.randint(1, 3))))
        elif op == "merge":
            ids = [r.id for r in t.read().select("id").collect()]
            pick = rng.sample(ids, min(2, len(ids)))
            t.merge(
                _df(
                    spark,
                    [
                        (i, rng.choice("abc"), f"{rng.randint(1, 99)}.50")
                        for i in pick
                    ],
                ),
                ["id"],
            )
        else:
            m = rng.randint(2, 4)
            t.delete_where(F.col("id") % m == 0)
        if rng.random() < 0.7:
            view.refresh()
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t), f"seed {seed}"


def test_minmax_rescan_prunes_partitioned_source(spark, roots):
    """Source laid out hive-style by the view key: an endangered-group
    rescan reads ONLY that group's partition — the commit summary records
    the other partitions as skipped (per-group, not per-table, rescans)."""
    src_root, view_root = roots
    rows = [
        (i, g, f"{v}.00")
        for g, vals in (
            ("a", [1, 5, 9]), ("b", [2, 6]), ("c", [3, 7]), ("d", [4, 8]),
        )
        for i, v in [(ord(g) * 100 + j, v) for j, v in enumerate(vals)]
    ]
    t = VersionedTable.create(
        spark, src_root, _df(spark, rows), partition_by=["grp"]
    )
    view = _mm_view(spark, src_root, view_root)
    view.refresh()
    # Kill group b's max (its extreme) -> rescan endangered group b only.
    t.delete_where((F.col("grp") == "b") & (F.col("amt") == 6.00))
    view.refresh()
    assert _view_state_mm(view) == _recompute_mm(t)
    s = VersionedTable(spark, view_root).manifest().summary
    assert s.get("minmax_rescan_groups") == 1
    assert s.get("minmax_rescan_dirs_skipped", 0) > 0


def test_view_over_hidden_partitioned_and_bucketed_source(spark, roots):
    """Round 6: the incremental MV machinery composes with transform
    partition layouts — the CDF the refresh consumes is layout-agnostic,
    and the view must track DML on a hidden-bucket-partitioned source
    exactly like a flat one."""
    src_root, view_root = roots
    t = VersionedTable.create(
        spark,
        src_root,
        _df(
            spark,
            [(1, "a", "1.00"), (2, "a", "2.00"), (3, "b", "5.00"),
             (4, "c", "7.00")],
        ),
        partition_by=["bucket(4, id)"],
        materialize_changes=True,
    )
    view = IncrementalAggView(
        spark, src_root, view_root, ["grp"], {"total": "amt"}
    )
    view.refresh()
    assert _view_state(view) == _recompute(t)
    t.append(_df(spark, [(5, "b", "3.00"), (6, "d", "9.00")]))
    t.merge(_df(spark, [(1, "a", "10.00")]), ["id"])
    t.delete_where(F.col("grp") == "c")
    view.refresh()
    assert _view_state(view) == _recompute(t)


class TestIncrementalJoinView:
    def _mk(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / "l"),
            spark.createDataFrame(
                [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0), (4, 30, 4.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / "r"),
            spark.createDataFrame(
                [(10, "a"), (20, "b"), (40, "d")],
                "ck bigint, seg string",
            ),
        )
        v = IncrementalJoinView(
            spark,
            l.root,
            r.root,
            str(tmp_path / "v"),
            on=["ck"],
            left_pk="k",
            right_pk="ck",
        )
        return l, r, v

    def _full(self, l, r):
        from collections import Counter

        return Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck").collect()
        )

    def _view(self, v):
        from collections import Counter

        return Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )

    def test_join_view_tracks_full_recompute(self, spark, tmp_path):
        """The delta algebra equals the full recompute after EVERY
        mutation round: left inserts/deletes/updates, right updates
        and deletes (removing a customer drops all its join rows),
        both sides changing in one refresh, and a pure payload update
        (delete+insert same pk pair) landing as an update."""
        import pyspark.sql.functions as F

        l, r, v = self._mk(spark, tmp_path)
        assert v.refresh() == (1, 1)  # initial materialize
        assert self._view(v) == self._full(l, r)

        # round 1: left-only churn — update, delete, insert
        l.update_where(F.col("k") == 1, {"price": F.lit(99.0)})
        l.delete_where([("k", "=", 2)])
        l.append(
            spark.createDataFrame(
                [(5, 20, 5.0), (6, 40, 6.0)],
                "k bigint, ck bigint, price double",
            )
        )
        assert v.refresh() == (4, 1)
        assert self._view(v) == self._full(l, r)

        # round 2: right-only churn — payload update + customer delete
        r.update_where(F.col("ck") == 10, {"seg": F.lit("A2")})
        r.delete_where([("ck", "=", 20)])
        assert v.refresh() == (4, 3)
        assert self._view(v) == self._full(l, r)

        # round 3: BOTH sides in one refresh, incl. same-key churn
        l.update_where(F.col("ck") == 40, {"price": F.lit(0.5)})
        l.append(
            spark.createDataFrame(
                [(7, 10, 7.0)], "k bigint, ck bigint, price double"
            )
        )
        r.update_where(F.col("ck") == 40, {"seg": F.lit("D2")})
        r.append(
            spark.createDataFrame([(20, "b2")], "ck bigint, seg string")
        )
        assert v.refresh() == (6, 5)
        assert self._view(v) == self._full(l, r)

        # idempotent: nothing new
        assert v.refresh() is None
        # marks recorded
        assert v.last_refreshed_versions() == (6, 5)

    def test_join_view_refuses_colliding_columns(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / "cl"),
            spark.createDataFrame([(1, 10, "x")], "k bigint, ck bigint, seg string"),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / "cr"),
            spark.createDataFrame([(10, "y")], "ck bigint, seg string"),
        )
        v = IncrementalJoinView(
            spark, l.root, r.root, str(tmp_path / "cv"),
            on=["ck"], left_pk="k", right_pk="ck",
        )
        with pytest.raises(ValueError, match="rename"):
            v.refresh()


def test_join_view_continuous_refresh(spark, tmp_path):
    """Both sides' change streams trigger idempotent refreshes; DML on
    EITHER side converges the view without a manual refresh call."""
    import time

    import pyspark.sql.functions as F

    from collections import Counter

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "sl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0)], "k bigint, ck bigint, price double"
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "sr"),
        spark.createDataFrame([(10, "a"), (20, "b")], "ck bigint, seg string"),
    )
    v = IncrementalJoinView(
        spark, l.root, r.root, str(tmp_path / "sv"),
        on=["ck"], left_pk="k", right_pk="ck",
    )
    v.refresh()
    qs = v.start_continuous_refresh(str(tmp_path / "ck"))
    try:
        l.append(
            spark.createDataFrame(
                [(3, 10, 3.0)], "k bigint, ck bigint, price double"
            )
        )
        r.update_where(F.col("ck") == 20, {"seg": F.lit("B2")})
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck").collect()
        )
        deadline = time.time() + 90
        got = None
        while time.time() < deadline:
            got = Counter(
                (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
            )
            if got == expected:
                break
            time.sleep(2)
        assert got == expected
    finally:
        for q in qs:
            q.stop()


class TestIncrementalLeftJoinView:
    def _mk(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / "ol"),
            spark.createDataFrame(
                [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0)],  # 99: no match
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / "or"),
            spark.createDataFrame(
                [(10, "a"), (20, "b")], "ck bigint, seg string"
            ),
        )
        v = IncrementalLeftJoinView(
            spark, l.root, r.root, str(tmp_path / "ov"),
            on=["ck"], left_pk="k", right_pk="ck",
        )
        return l, r, v

    def _full(self, l, r):
        from collections import Counter

        return Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "left").collect()
        )

    def _view(self, v):
        from collections import Counter

        return Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )

    def test_outer_view_tracks_full_recompute(self, spark, tmp_path):
        """Padded-set TRANSITIONS both directions: a right delete that
        removes a left row's last match INSERTS the padded row; a
        first match DELETES it; plus plain churn on both sides."""
        import pyspark.sql.functions as F

        l, r, v = self._mk(spark, tmp_path)
        assert v.refresh() == (1, 1)
        assert self._view(v) == self._full(l, r)  # k=3 padded

        # 0 -> matched: customer 99 appears; matched -> 0: customer 10 dies
        r.append(
            spark.createDataFrame([(99, "z")], "ck bigint, seg string")
        )
        r.delete_where([("ck", "=", 10)])
        assert v.refresh() == (1, 3)
        assert self._view(v) == self._full(l, r)

        # left churn: new unmatched left, delete a padded left,
        # update a matched left's payload
        l.append(
            spark.createDataFrame(
                [(4, 77, 4.0)], "k bigint, ck bigint, price double"
            )
        )
        l.delete_where([("k", "=", 1)])  # was padded after ck10 died
        l.update_where(F.col("k") == 2, {"price": F.lit(22.0)})
        assert v.refresh() == (4, 3)
        assert self._view(v) == self._full(l, r)

        # key REPOINT: left row 4 moves from unmatched 77 to matched 20
        l.update_where(F.col("k") == 4, {"ck": F.lit(20)})
        assert v.refresh() == (5, 3)
        assert self._view(v) == self._full(l, r)

        assert v.refresh() is None  # idempotent


def test_join_agg_view_tracks_full_recompute(spark, tmp_path):
    """Aggregate-over-join IVM: the composed delta (join nets -> signed
    counting aggregate) equals a full join+aggregate recompute after
    every mutation round, including groups that appear, empty out, and
    come back; NULL sum inputs ride the non-null counters."""
    import pyspark.sql.functions as F

    from collections import Counter

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "jl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 10, None), (3, 20, 3.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "jr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")], "ck bigint, seg string"
        ),
    )
    v = IncrementalJoinAggView(
        spark, l.root, r.root, str(tmp_path / "jv"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"], sums={"total": "price"},
    )

    def full():
        rows = (
            l.read().join(r.read(), "ck")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("price").alias("total"),
            )
            .collect()
        )
        return Counter((x.seg, x._n, x.total) for x in rows)

    def view():
        return Counter((x.seg, x._n, x.total) for x in v.read().collect())

    assert v.refresh() == (1, 1)
    assert view() == full()

    # group 'b' empties out (delete its only join row)
    l.delete_where([("k", "=", 3)])
    # 'a' gains a real value where a NULL lived, plus churn
    l.update_where(F.col("k") == 2, {"price": F.lit(2.0)})
    assert v.refresh() == (3, 1)
    assert view() == full()

    # 'b' comes back via the right side; both sides in one refresh
    l.append(
        spark.createDataFrame(
            [(4, 20, 4.0), (5, 30, None)],
            "k bigint, ck bigint, price double",
        )
    )
    r.append(spark.createDataFrame([(30, "c")], "ck bigint, seg string"))
    assert v.refresh() == (4, 2)
    assert view() == full()
    # group 'c' exists with an all-NULL sum -> total must read as NULL
    assert [x for x in view() if x[0] == "c"][0][2] is None

    assert v.refresh() is None


def test_join_agg_delta_aggregates_signed_rows_one_exchange(
    spark, tmp_path
):
    """r14 §4 pin: the join-agg refresh folds the RAW signed delta
    (±1 rows) straight into the group aggregation — the full-width
    netting groupBy (one extra exchange over every join output column)
    must not reappear, and a pure-churn update (row rewritten with
    identical values, whose signed rows cancel) must still refresh to
    the recompute."""
    import pyspark.sql.functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "sl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "sr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")], "ck bigint, seg string"
        ),
    )
    v = IncrementalJoinAggView(
        spark, l.root, r.root, str(tmp_path / "sv"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"], sums={"total": "price"},
    )
    v.refresh()
    # pure churn (k=1 rewritten identically) + a real change (k=3)
    l.update_where(F.col("k") == 1, {"price": F.lit(1.0)})
    l.update_where(F.col("k") == 3, {"price": F.lit(30.0)})

    left, right = v._sides()
    l1, r1 = v.last_refreshed_versions()
    l2, r2 = left.latest_version(), right.latest_version()
    out_cols = v._out_cols(left, right)
    signed = v._signed_delta(left, right, l1, r1, l2, r2, out_cols)
    delta = v._agg(signed, sign=F.col("__s"))
    plan = delta._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles == 1, f"expected ONE group-key exchange:\n{plan}"
    assert "__net" not in plan  # the netting step must be gone

    v.refresh()
    got = {
        (x.seg, x._n, x.total)
        for x in v.read().select("seg", "_n", "total").collect()
    }
    want = {
        (x.seg, x._n, x.total)
        for x in l.read()
        .join(r.read(), "ck")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("price").alias("total"),
        )
        .collect()
    }
    assert got == want


def test_full_outer_join_view_tracks_full_recompute(spark, tmp_path):
    """FULL OUTER IVM: both padded sets transition independently —
    unmatched customers appear right-padded, gaining their first order
    unpads them, losing their last order re-pads them; symmetric for
    unmatched orders."""
    import pyspark.sql.functions as F

    from collections import Counter

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalFullJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "fl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 99, 2.0)],  # 99: no customer
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "fr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")],  # 20: no orders yet
            "ck bigint, seg string",
        ),
    )
    v = IncrementalFullJoinView(
        spark, l.root, r.root, str(tmp_path / "fv"),
        on=["ck"], left_pk="k", right_pk="ck",
    )

    def full():
        return Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "full").collect()
        )

    def view():
        return Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )

    assert v.refresh() == (1, 1)
    assert view() == full()  # k=2 left-padded, ck=20 right-padded

    # ck=20 gains its first order (unpads right); customer 99 appears
    # (unpads left); customer 10 dies (its order 1 becomes left-padded,
    # and 10 must NOT reappear right-padded — it's gone)
    l.append(
        spark.createDataFrame(
            [(3, 20, 3.0)], "k bigint, ck bigint, price double"
        )
    )
    r.append(spark.createDataFrame([(99, "z")], "ck bigint, seg string"))
    r.delete_where([("ck", "=", 10)])
    assert v.refresh() == (2, 3)
    assert view() == full()

    # ck=20 loses its only order -> right-pads again
    l.delete_where([("k", "=", 3)])
    assert v.refresh() == (3, 3)
    assert view() == full()

    assert v.refresh() is None


def test_left_outer_view_continuous_refresh(spark, tmp_path):
    """The outer views inherit start_continuous_refresh: the overridden
    refresh() maintains the padded set too, so a right delete that
    orphans a left row converges to a null-padded row with no manual
    refresh call."""
    import time

    import pyspark.sql.functions as F

    from collections import Counter

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalLeftJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "cl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "cr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")], "ck bigint, seg string"
        ),
    )
    v = IncrementalLeftJoinView(
        spark, l.root, r.root, str(tmp_path / "cv"),
        on=["ck"], left_pk="k", right_pk="ck",
    )
    v.refresh()
    qs = v.start_continuous_refresh(str(tmp_path / "ck"))
    try:
        r.delete_where([("ck", "=", 10)])  # orphans order k=1
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "left").collect()
        )
        deadline = time.time() + 90
        got = None
        while time.time() < deadline:
            got = Counter(
                (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
            )
            if got == expected:
                break
            time.sleep(2)
        assert got == expected
        assert (1, 10, 1.0, None) in got  # the padded transition landed
    finally:
        for q in qs:
            q.stop()


def test_agg_view_over_join_view_minmax(spark, tmp_path):
    """The documented route for extremes over a join (E106 points
    here): an IncrementalAggView whose SOURCE is an
    IncrementalJoinView's state table — the join view's merges
    materialize change files, so the agg view's counting/endangered
    machinery maintains min/max through a delete AT the extreme with
    only the endangered group rescanned (from the view, not the
    sources). Chain refresh: join first, then agg."""
    import pyspark.sql.functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
        IncrementalJoinView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "ml"),
        spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, 9.0), (3, 20, 3.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "mr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")], "ck bigint, seg string"
        ),
    )
    jv = IncrementalJoinView(
        spark, l.root, r.root, str(tmp_path / "mj"),
        on=["ck"], left_pk="k", right_pk="ck",
    )
    jv.refresh()
    av = IncrementalAggView(
        spark,
        source_root=str(tmp_path / "mj"),
        view_root=str(tmp_path / "ma"),
        keys=["seg"],
        sums={"total": "price"},
        mins={"min_price": "price"},
        maxs={"max_price": "price"},
    )
    av.refresh()

    def expect():
        return {
            x.seg: (x._n, x.total, x.min_price, x.max_price)
            for x in l.read()
            .join(r.read(), "ck")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("price").alias("total"),
                F.min("price").alias("min_price"),
                F.max("price").alias("max_price"),
            )
            .collect()
        }

    def got():
        return {
            x.seg: (x._n, x.total, x.min_price, x.max_price)
            for x in av.read().collect()
        }

    assert got() == expect()
    # delete AT the max of group 'a' (the endangered path) and churn 'b'
    l.delete_where([("k", "=", 2)])
    l.append(
        spark.createDataFrame(
            [(4, 20, 1.0)], "k bigint, ck bigint, price double"
        )
    )
    jv.refresh()
    av.refresh()
    assert got() == expect()
    # group empties entirely: delete b's rows -> group leaves the view
    l.delete_where(F.col("ck") == 20)
    jv.refresh()
    av.refresh()
    assert got() == expect()
    assert set(got()) == {"a"}


def _mk_outer_pair(spark, tmp_path, prefix):
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / f"{prefix}l"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0)],  # 99: no match
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / f"{prefix}r"),
        spark.createDataFrame(
            [(10, "a"), (20, "b"), (77, "w")],  # 77: no orders
            "ck bigint, seg string",
        ),
    )
    return l, r


class TestOuterViewCrashRepair:
    """First-materialization crash windows: a death AFTER the inner
    create but BEFORE a padded/rpadded create must be repaired by the
    next refresh (bootstrap the missing table at the inner's marks),
    never raise forever."""

    def test_left_view_repairs_missing_padded_table(self, spark, tmp_path):
        from collections import Counter

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinView,
            IncrementalLeftJoinView,
        )

        l, r = _mk_outer_pair(spark, tmp_path, "lp")
        root = str(tmp_path / "lpv")
        # simulate the crash: ONLY the inner view exists under the root
        import os

        IncrementalJoinView(
            spark, l.root, r.root, os.path.join(root, "inner"),
            on=["ck"], left_pk="k", right_pk="ck",
        ).refresh()
        # sources move on before the repairing refresh
        l.append(
            spark.createDataFrame(
                [(4, 55, 4.0)], "k bigint, ck bigint, price double"
            )
        )
        v = IncrementalLeftJoinView(
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        )
        assert v.refresh() == (2, 1)  # repaired AND caught up
        got = Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "left").collect()
        )
        assert got == expected
        assert (4, 55, 4.0, None) in got  # post-crash row padded too

    def test_full_view_repairs_missing_rpadded_table(self, spark, tmp_path):
        from collections import Counter

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalFullJoinView,
            IncrementalLeftJoinView,
        )

        l, r = _mk_outer_pair(spark, tmp_path, "fp")
        root = str(tmp_path / "fpv")
        # crash window: inner + left-padded landed, rpadded never did
        IncrementalLeftJoinView(
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        ).refresh()
        v = IncrementalFullJoinView(
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        )
        assert v.refresh() == (1, 1)
        got = Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "full").collect()
        )
        assert got == expected
        assert (None, 77, None, "w") in got  # rpadded repaired


class TestOuterViewConcurrentPadded:
    """The padded/rpadded merges pin their expected version and RETRY
    on concurrent commits — a racing refresh (the two continuous
    streams both firing) serializes instead of raising out of a
    micro-batch."""

    def test_padded_merge_retries_on_concurrent_commit(
        self, spark, tmp_path, monkeypatch
    ):
        from collections import Counter

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l, r = _mk_outer_pair(spark, tmp_path, "rp")
        root = str(tmp_path / "rpv")
        mk = lambda: IncrementalLeftJoinView(  # noqa: E731
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        )
        v, v2 = mk(), mk()
        v.refresh()
        r.delete_where([("ck", "=", 10)])  # orphans k=1: padded delta

        orig = IncrementalLeftJoinView._apply_padded
        calls = {"n": 0}

        def racing(self, left, right, pl1, pr1, l2, r2, expected_version):
            calls["n"] += 1
            if calls["n"] == 1:
                v2.refresh()  # the race WINNER lands first
            return orig(
                self, left, right, pl1, pr1, l2, r2, expected_version
            )

        monkeypatch.setattr(
            IncrementalLeftJoinView, "_apply_padded", racing
        )
        pv_before = VersionedTable(spark, v.padded_root).latest_version()
        assert v.refresh() == (1, 2)  # loser retried, found it current
        assert calls["n"] == 2  # loser's attempt + winner's apply
        # exactly ONE padded commit landed (no double-apply)
        assert (
            VersionedTable(spark, v.padded_root).latest_version()
            == pv_before + 1
        )
        got = Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "left").collect()
        )
        assert got == expected
        assert (1, 10, 1.0, None) in got

    def test_rpadded_merge_retries_on_concurrent_commit(
        self, spark, tmp_path, monkeypatch
    ):
        from collections import Counter

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalFullJoinView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l, r = _mk_outer_pair(spark, tmp_path, "rq")
        root = str(tmp_path / "rqv")
        mk = lambda: IncrementalFullJoinView(  # noqa: E731
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        )
        v, v2 = mk(), mk()
        v.refresh()
        l.delete_where([("k", "=", 2)])  # ck=20 loses its only order

        orig = IncrementalFullJoinView._apply_rpadded
        calls = {"n": 0}

        def racing(self, left, right, pl1, pr1, l2, r2, expected_version):
            calls["n"] += 1
            if calls["n"] == 1:
                v2.refresh()
            return orig(
                self, left, right, pl1, pr1, l2, r2, expected_version
            )

        monkeypatch.setattr(
            IncrementalFullJoinView, "_apply_rpadded", racing
        )
        rv_before = VersionedTable(spark, v.rpadded_root).latest_version()
        assert v.refresh() == (2, 1)
        assert calls["n"] == 2
        assert (
            VersionedTable(spark, v.rpadded_root).latest_version()
            == rv_before + 1
        )
        got = Counter(
            (x.k, x.ck, x.price, x.seg) for x in v.read().collect()
        )
        expected = Counter(
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", "full").collect()
        )
        assert got == expected
        assert (None, 20, None, "b") in got  # re-padded right row


class TestOuterJoinAggViews:
    """Aggregate IVM over OUTER joins: the group state must equal a
    full outer-join + aggregate recompute after every mutation round —
    including pad/unpad transitions changing a group's contribution,
    a group whose ONLY rows are padded (NULL key group), and a sum
    over the padded side rendering NULL like the recompute."""

    def _mk(self, spark, tmp_path, prefix):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}l"),
            spark.createDataFrame(
                # ck=99 matches no customer: its group is padded-only
                [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0), (4, 10, 4.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}r"),
            spark.createDataFrame(
                # ck=77 has no orders (right-padded under full outer)
                [(10, "a", 5.0), (20, "b", 6.0), (77, "w", 7.0)],
                "ck bigint, seg string, bal double",
            ),
        )
        return l, r

    def _mutation_rounds(self, spark, l, r):
        import pyspark.sql.functions as F

        yield  # round 0: initial state
        # pad: customer 10 dies (orders 1 and 4 move to the NULL group)
        r.delete_where([("ck", "=", 10)])
        yield
        # unpad: customer 99 appears (order 3 leaves the NULL group);
        # plus left churn into and out of groups
        r.append(
            spark.createDataFrame(
                [(99, "z", 8.0)], "ck bigint, seg string, bal double"
            )
        )
        l.update_where(F.col("k") == 2, {"price": F.lit(22.0)})
        l.append(
            spark.createDataFrame(
                [(5, 77, 5.0), (6, 404, 6.0)],
                "k bigint, ck bigint, price double",
            )
        )
        yield
        # delete a padded-only group's last row; repoint a key
        l.delete_where([("k", "=", 6)])
        l.update_where(F.col("k") == 3, {"ck": F.lit(20)})
        yield

    def test_left_join_agg_view_tracks_recompute(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinAggView,
        )

        l, r = self._mk(spark, tmp_path, "la")
        v = IncrementalLeftJoinAggView(
            spark, l.root, r.root, str(tmp_path / "lav"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"],
            sums={"total_price": "price", "total_bal": "bal"},
        )

        def expect():
            return {
                (x.seg): (x._n, x.total_price, x.total_bal)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total_price"),
                    F.sum("bal").alias("total_bal"),
                )
                .collect()
            }

        def got():
            return {
                (x.seg): (x._n, x.total_price, x.total_bal)
                for x in v.read().collect()
            }

        for _ in self._mutation_rounds(spark, l, r):
            v.refresh()
            e = expect()
            assert got() == e
        # the NULL group existed during the run and total_bal rendered
        # NULL there (every contributing bal was a padded NULL)
        assert None in got()
        assert got()[None][2] is None
        assert v.refresh() is not None or True  # idempotent smoke
        assert got() == expect()

    def test_full_join_agg_view_tracks_recompute(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalFullJoinAggView,
        )

        l, r = self._mk(spark, tmp_path, "fa")
        v = IncrementalFullJoinAggView(
            spark, l.root, r.root, str(tmp_path / "fav"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"],
            sums={"total_price": "price", "total_bal": "bal"},
        )

        def expect():
            return {
                (x.seg): (x._n, x.total_price, x.total_bal)
                for x in l.read()
                .join(r.read(), "ck", "full")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total_price"),
                    F.sum("bal").alias("total_bal"),
                )
                .collect()
            }

        def got():
            return {
                (x.seg): (x._n, x.total_price, x.total_bal)
                for x in v.read().collect()
            }

        for _ in self._mutation_rounds(spark, l, r):
            v.refresh()
            assert got() == expect()
        # right-padded-only group: customer 'w' (ck=77) gains orders
        # mid-run; at the start it must appear with NULL price sum
        assert got() == expect()

    def test_full_join_agg_right_padded_group_transitions(
        self, spark, tmp_path
    ):
        """A right-padded-only group's full lifecycle: present with
        count 1 and NULL left sum, unpads when an order arrives, pads
        back when the order dies."""
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalFullJoinAggView,
        )

        l, r = self._mk(spark, tmp_path, "rt")
        v = IncrementalFullJoinAggView(
            spark, l.root, r.root, str(tmp_path / "rtv"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"], sums={"total_price": "price"},
        )
        v.refresh()
        got = {x.seg: (x._n, x.total_price) for x in v.read().collect()}
        assert got["w"] == (1, None)  # right-padded only

        l.append(
            spark.createDataFrame(
                [(9, 77, 9.5)], "k bigint, ck bigint, price double"
            )
        )
        v.refresh()
        got = {x.seg: (x._n, x.total_price) for x in v.read().collect()}
        assert got["w"] == (1, 9.5)  # unpadded: matched row replaces pad

        l.delete_where([("k", "=", 9)])
        v.refresh()
        got = {x.seg: (x._n, x.total_price) for x in v.read().collect()}
        assert got["w"] == (1, None)  # padded back

    def test_agg_crash_repair_missing_agg_table(self, spark, tmp_path):
        """A death between the outer-state creates and the agg create
        is repaired by the next refresh (bootstrap from the current
        state snapshots)."""
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinAggView,
            IncrementalLeftJoinView,
        )

        l, r = self._mk(spark, tmp_path, "cr")
        root = str(tmp_path / "crv")
        # simulate: the outer view landed, the agg table never did
        IncrementalLeftJoinView(
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
        ).refresh()
        v = IncrementalLeftJoinAggView(
            spark, l.root, r.root, root,
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"], sums={"total_price": "price"},
        )
        v.refresh()
        expect = {
            x.seg: (x._n, x.total_price)
            for x in l.read()
            .join(r.read(), "ck", "left")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("price").alias("total_price"),
            )
            .collect()
        }
        assert {
            x.seg: (x._n, x.total_price) for x in v.read().collect()
        } == expect


class TestDistinctCounts:
    """COUNT(DISTINCT) via auxiliary (keys, value) multiplicity state:
    the view equals a full recompute after churn that exercises the
    cases plain counting gets wrong — deleting ONE of two occurrences
    (distinct count must hold), deleting the LAST occurrence (must
    drop), NULL values ignored, and values moving between groups."""

    def test_distinct_view_tracks_recompute(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalAggView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        src = VersionedTable.create(
            spark,
            str(tmp_path / "dsrc"),
            spark.createDataFrame(
                [
                    (1, "a", "x"),
                    (2, "a", "x"),  # x twice in group a
                    (3, "a", "y"),
                    (4, "b", "x"),
                    (5, "b", None),  # NULL ignored by COUNT(DISTINCT)
                ],
                "id bigint, grp string, val string",
            ),
        )
        v = IncrementalAggView(
            spark,
            src.root,
            str(tmp_path / "dview"),
            keys=["grp"],
            distincts={"n_vals": "val"},
        )

        def expect():
            return {
                (x.grp, x._n, x.n_vals)
                for x in src.read()
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.countDistinct("val").alias("n_vals"),
                )
                .collect()
            }

        def got():
            return {
                (x.grp, x._n, x.n_vals) for x in v.read().collect()
            }

        v.refresh()
        assert got() == expect()
        assert ("b", 2, 1) in got()  # NULL ignored

        # delete ONE of two x's in a: distinct count must NOT move
        src.delete_where([("id", "=", 2)])
        v.refresh()
        assert got() == expect()
        assert ("a", 2, 2) in got()

        # delete the LAST x in a: now it must move
        src.delete_where([("id", "=", 1)])
        v.refresh()
        assert got() == expect()
        assert ("a", 1, 1) in got()

        # a value MOVES groups via update; a NULL becomes a value
        src.update_where(F.col("id") == 4, {"grp": F.lit("a")})
        src.update_where(F.col("id") == 5, {"val": F.lit("z")})
        v.refresh()
        assert got() == expect()

        # group emptying removes it from the view entirely
        src.delete_where(F.col("grp") == "a")
        v.refresh()
        assert got() == expect()
        assert {g for g, _, _ in got()} == {"b"}
        assert v.refresh() is None  # idempotent

    def test_distinct_with_filter_and_sums(self, spark, tmp_path):
        """distincts compose with filter= and sums= in one view; the
        side table sees only predicate-passing rows."""
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalAggView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        src = VersionedTable.create(
            spark,
            str(tmp_path / "fsrc"),
            spark.createDataFrame(
                [
                    (1, "a", "x", 5.0),
                    (2, "a", "y", 1.0),  # filtered out
                    (3, "b", "x", 9.0),
                ],
                "id bigint, grp string, val string, amt double",
            ),
        )
        v = IncrementalAggView(
            spark,
            src.root,
            str(tmp_path / "fview"),
            keys=["grp"],
            sums={"total": "amt"},
            distincts={"n_vals": "val"},
            filter="amt >= 2",
        )

        def expect():
            return {
                (x.grp, x.n_vals, x.total)
                for x in src.read()
                .filter(F.col("amt") >= 2)
                .groupBy("grp")
                .agg(
                    F.countDistinct("val").alias("n_vals"),
                    F.sum("amt").alias("total"),
                )
                .collect()
            }

        def got():
            return {
                (x.grp, x.n_vals, x.total) for x in v.read().collect()
            }

        v.refresh()
        assert got() == expect()
        assert ("a", 1, 5.0) in got()  # y filtered out of the count
        # y crosses the boundary INTO the view
        src.update_where(F.col("id") == 2, {"amt": F.lit(3.0)})
        v.refresh()
        assert got() == expect()
        assert ("a", 2, 8.0) in got()


def test_avg_stddev_variance_view_tracks_recompute(spark, tmp_path):
    """AVG / sample VARIANCE / sample STDDEV maintained through their
    sufficient statistics (Σx, Σx², non-null counts): equal to a full
    recompute (within FP tolerance) after churn, NULL below minimum
    support (avg: n=0, var/std: n<2), NULL inputs excluded."""
    import math

    import pyspark.sql.functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    src = VersionedTable.create(
        spark,
        str(tmp_path / "vsrc"),
        spark.createDataFrame(
            [
                (1, "a", 1.0),
                (2, "a", 3.0),
                (3, "a", None),  # NULL excluded from all three
                (4, "b", 7.0),  # single row: var/std NULL, avg 7.0
            ],
            "id bigint, grp string, x double",
        ),
    )
    v = IncrementalAggView(
        spark,
        src.root,
        str(tmp_path / "vview"),
        keys=["grp"],
        avgs={"avg_x": "x"},
        stddevs={"std_x": "x"},
        variances={"var_x": "x"},
    )

    def expect():
        return {
            x.grp: (x.avg_x, x.std_x, x.var_x)
            for x in src.read()
            .groupBy("grp")
            .agg(
                F.avg("x").alias("avg_x"),
                F.stddev_samp("x").alias("std_x"),
                F.var_samp("x").alias("var_x"),
            )
            .collect()
        }

    def got():
        return {
            x.grp: (x.avg_x, x.std_x, x.var_x)
            for x in v.read().collect()
        }

    def close(a, b):
        if a is None or b is None:
            return a is None and b is None
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)

    def assert_matches():
        g, e = got(), expect()
        assert set(g) == set(e)
        for k in e:
            assert all(close(x, y) for x, y in zip(g[k], e[k])), (
                k, g[k], e[k],
            )

    v.refresh()
    assert_matches()
    assert got()["b"] == (7.0, None, None)  # below var support

    # churn: b gains support; a loses a value then gains NULLs
    src.append(
        spark.createDataFrame(
            [(5, "b", 9.0), (6, "b", 11.0), (7, "a", None)],
            "id bigint, grp string, x double",
        )
    )
    src.delete_where([("id", "=", 1)])
    v.refresh()
    assert_matches()
    assert got()["a"] == (3.0, None, None)  # back to single support

    # update moves a value (delete+insert through the feed)
    src.update_where(F.col("id") == 4, {"x": F.lit(100.0)})
    v.refresh()
    assert_matches()
    assert v.refresh() is None


class TestTopKView:
    """Top-k per group: model equivalence vs a row_number recompute
    across the three delta cases — insert-only fold-in (NO source
    rescan, pinned via the commit summary), a delete inside the stored
    top-k (endangered rescan of that group only), and a delete below
    the stored k-th (provably irrelevant)."""

    def _mk(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalTopKView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        rows = [
            (i, "a" if i % 2 == 0 else "b", float(i))
            for i in range(1, 13)
        ]
        src = VersionedTable.create(
            spark,
            str(tmp_path / "tsrc"),
            spark.createDataFrame(rows, "id bigint, grp string, score double"),
        )
        v = IncrementalTopKView(
            spark,
            src.root,
            str(tmp_path / "tview"),
            keys=["grp"],
            order_col="score",
            k=3,
            pk="id",
        )
        return src, v

    def _expect(self, src, k=3):
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        w = Window.partitionBy("grp").orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        return {
            (x.id, x.grp, x.score)
            for x in src.read()
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
            .collect()
        }

    def _got(self, v):
        return {(x.id, x.grp, x.score) for x in v.read().collect()}

    def _last_rescans(self, v):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        t = VersionedTable(v.spark, v.view_root)
        return t.versions()[-1].summary.get("topk_rescan_groups")

    def test_topk_view_tracks_recompute(self, spark, tmp_path):
        import pyspark.sql.functions as F

        src, v = self._mk(spark, tmp_path)
        v.refresh()
        assert self._got(v) == self._expect(src)

        # insert-only: one row enters a's top-3, one lands below —
        # fold-in path, ZERO rescans
        src.append(
            spark.createDataFrame(
                [(100, "a", 11.5), (101, "a", 0.5)],
                "id bigint, grp string, score double",
            )
        )
        assert v.refresh() == 2
        assert self._got(v) == self._expect(src)
        assert self._last_rescans(v) == 0
        assert (100, "a", 11.5) in self._got(v)

        # delete INSIDE a's stored top-3: endangered, exactly 1 group
        # rescans; b untouched
        src.delete_where([("id", "=", 12)])  # a's max
        v.refresh()
        assert self._got(v) == self._expect(src)
        assert self._last_rescans(v) == 1

        # delete BELOW the stored k-th: irrelevant, zero rescans
        src.delete_where([("id", "=", 101)])  # a's floor row
        v.refresh()
        assert self._got(v) == self._expect(src)
        assert self._last_rescans(v) == 0

        # update moves a row's score (delete+insert through the feed):
        # old row was in b's top-3 -> endangered rescan of b
        src.update_where(F.col("id") == 11, {"score": F.lit(0.1)})
        v.refresh()
        assert self._got(v) == self._expect(src)

        # key repoint: b's current top row moves to group a
        src.update_where(F.col("id") == 9, {"grp": F.lit("a")})
        v.refresh()
        assert self._got(v) == self._expect(src)
        assert v.refresh() is None  # idempotent

    def test_topk_group_smaller_than_k_and_death(self, spark, tmp_path):
        import pyspark.sql.functions as F

        src, v = self._mk(spark, tmp_path)
        v.refresh()
        # shrink group b below k, then empty it entirely
        src.delete_where(
            (F.col("grp") == "b") & (F.col("score") < 9)
        )
        v.refresh()
        assert self._got(v) == self._expect(src)
        src.delete_where(F.col("grp") == "b")
        v.refresh()
        assert self._got(v) == self._expect(src)
        assert all(g == "a" for _, g, _ in self._got(v))
        # rebirth
        src.append(
            spark.createDataFrame(
                [(200, "b", 5.0)], "id bigint, grp string, score double"
            )
        )
        v.refresh()
        assert self._got(v) == self._expect(src)
        assert (200, "b", 5.0) in self._got(v)

    def test_topk_ascending(self, spark, tmp_path):
        """ascending=True maintains the BOTTOM-k (cheapest-k shape)."""
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalTopKView,
        )

        src, _ = self._mk(spark, tmp_path)
        v = IncrementalTopKView(
            spark,
            src.root,
            str(tmp_path / "tview_asc"),
            keys=["grp"],
            order_col="score",
            k=2,
            pk="id",
            ascending=True,
        )
        v.refresh()
        src.delete_where([("id", "=", 1)])  # b's min
        src.append(
            spark.createDataFrame(
                [(300, "a", -1.0)], "id bigint, grp string, score double"
            )
        )
        v.refresh()
        w = Window.partitionBy("grp").orderBy(
            F.col("score").asc(), F.col("id").asc()
        )
        expect = {
            (x.id, x.grp, x.score)
            for x in src.read()
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= 2)
            .drop("__rk")
            .collect()
        }
        assert self._got(v) == expect


class TestFilteredOuterJoinViews:
    """σ over OUTER joins with SQL's WHERE-after-padding semantics:
    the filtered view equals filter(outer-join recompute) after every
    mutation round — including rows CROSSING the predicate boundary
    via UPDATE while padded, pad/unpad transitions, and unmatched rows
    whose padded render FAILS the predicate (they must vanish, not
    pad: the filtered inner state can't witness matched-ness, so the
    padded machinery tests against the raw other side)."""

    PRED = "price >= 2.0 OR seg = 'w'"

    def _mk(self, spark, tmp_path, prefix):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}l"),
            spark.createDataFrame(
                # k=1: matched, fails pred; k=3: unmatched, passes on
                # the padded render; k=4: matched, passes
                [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0), (4, 10, 4.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}r"),
            spark.createDataFrame(
                # ck=77 'w': unmatched right whose padded render PASSES
                # (price NULL but seg='w'); ck=20 'b' would FAIL padded
                [(10, "a", 5.0), (20, "b", 6.0), (77, "w", 7.0)],
                "ck bigint, seg string, bal double",
            ),
        )
        return l, r

    def _mutations(self, spark, l, r):
        import pyspark.sql.functions as F

        yield  # round 0: bootstrap (incl. σ on both padded renders)
        # customer 10 dies: order 1 (price 1.0) pads but FAILS σ on the
        # padded render -> vanishes; order 4 (4.0) pads and stays
        r.delete_where([("ck", "=", 10)])
        yield
        # boundary crossing WHILE padded: k=1 climbs over 2.0 (appears
        # as a padded row with no pad/unpad transition), k=4 drops
        # under it (padded row leaves)
        l.update_where(F.col("k") == 1, {"price": F.lit(2.5)})
        l.update_where(F.col("k") == 4, {"price": F.lit(0.5)})
        yield
        # unpad via seg='w' (passes σ regardless of price): order 3
        # moves from left-padded to matched; right side churns
        r.append(
            spark.createDataFrame(
                [(99, "w", 8.0)], "ck bigint, seg string, bal double"
            )
        )
        yield
        # matched row deleted; right row whose padded render fails σ
        # becomes unmatched (full-outer must drop it, not pad it)
        l.delete_where([("k", "=", 2)])
        yield

    def _expect(self, l, r, how):
        from collections import Counter

        import pyspark.sql.functions as F

        return Counter(
            (x.k, x.ck, x.price, x.seg, x.bal)
            for x in l.read()
            .join(r.read(), "ck", how)
            .filter(F.coalesce(F.expr(self.PRED), F.lit(False)))
            .collect()
        )

    def _got(self, v):
        from collections import Counter

        return Counter(
            (x.k, x.ck, x.price, x.seg, x.bal)
            for x in v.read().collect()
        )

    def test_filtered_left_outer_tracks_recompute(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinView,
        )

        l, r = self._mk(spark, tmp_path, "fl")
        v = IncrementalLeftJoinView(
            spark, l.root, r.root, str(tmp_path / "flv"),
            on=["ck"], left_pk="k", right_pk="ck", filter=self.PRED,
        )
        saw_padded = False
        for _ in self._mutations(spark, l, r):
            v.refresh()
            got = self._got(v)
            assert got == self._expect(l, r, "left")
            saw_padded = saw_padded or any(
                seg is None for (_, _, _, seg, _) in got
            )
        assert saw_padded  # σ-passing padded rows actually occurred
        assert v.refresh() is None  # idempotent

    def test_filtered_full_outer_tracks_recompute(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalFullJoinView,
        )

        l, r = self._mk(spark, tmp_path, "ff")
        v = IncrementalFullJoinView(
            spark, l.root, r.root, str(tmp_path / "ffv"),
            on=["ck"], left_pk="k", right_pk="ck", filter=self.PRED,
        )
        saw_rpad = False
        for _ in self._mutations(spark, l, r):
            v.refresh()
            got = self._got(v)
            assert got == self._expect(l, r, "full")
            saw_rpad = saw_rpad or any(
                k is None for (k, _, _, _, _) in got
            )
        # ck=77 'w' rode as a σ-passing right-padded row; ck=20 'b'
        # became unmatched in the last round and must NOT have padded
        assert saw_rpad
        final = self._got(v)
        assert not any(seg == "b" for (_, _, _, seg, _) in final)

    def test_filtered_left_join_agg_tracks_recompute(self, spark, tmp_path):
        """The agg-over-outer composition inherits the filter through
        the state tables' own CDC — group totals equal a filtered
        outer-join + aggregate recompute every round."""
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinAggView,
        )

        l, r = self._mk(spark, tmp_path, "fa")
        v = IncrementalLeftJoinAggView(
            spark, l.root, r.root, str(tmp_path / "fav"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"], sums={"total_price": "price"},
            filter=self.PRED,
        )

        def expect():
            return {
                x.seg: (x._n, x.total_price)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .filter(F.coalesce(F.expr(self.PRED), F.lit(False)))
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total_price"),
                )
                .collect()
            }

        for _ in self._mutations(spark, l, r):
            v.refresh()
            assert {
                x.seg: (x._n, x.total_price)
                for x in v.read().collect()
            } == expect()


class TestComputedKeysOverJoins:
    """Computed group keys over JOIN aggregate views (r11): the key
    expression projects onto the bootstrap join, every netted delta,
    and every padded render before grouping — bucket-crossing updates
    maintain both buckets, and a key expression over the missing side
    of an outer join lands padded rows in the NULL bucket, exactly
    like the recompute."""

    def _mk(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / "ckl"),
            spark.createDataFrame(
                [
                    (1, 10, "2024-01-03", 10.0),
                    (2, 20, "2024-01-20", 20.0),
                    (3, 99, "2024-02-07", 30.0),  # unmatched
                    (4, 10, "2024-02-28", 40.0),
                ],
                "k bigint, ck bigint, dt string, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / "ckr"),
            spark.createDataFrame(
                [(10, "a"), (20, "b")], "ck bigint, seg string"
            ),
        )
        return l, r

    def _mutate(self, spark, l, r):
        import pyspark.sql.functions as F

        yield
        # bucket crossing: k=2 moves 2024-01 -> 2024-02
        l.update_where(F.col("k") == 2, {"dt": F.lit("2024-02-15")})
        yield
        # pad/unpad churn: customer 10 dies (k=1, k=4 pad), 99 appears
        r.delete_where([("ck", "=", 10)])
        r.append(
            spark.createDataFrame([(99, "z")], "ck bigint, seg string")
        )
        yield
        l.delete_where([("k", "=", 4)])
        yield

    def test_inner_join_agg_computed_key_tracks_recompute(
        self, spark, tmp_path
    ):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinAggView,
        )

        l, r = self._mk(spark, tmp_path)
        v = IncrementalJoinAggView(
            spark, l.root, r.root, str(tmp_path / "ckv"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys={"mon": "substring(dt, 1, 7)", "seg": "seg"},
            sums={"total": "price"},
        )

        def expect():
            return {
                (x.mon, x.seg, x._n, x.total)
                for x in l.read()
                .join(r.read(), "ck")
                .groupBy(
                    F.substring("dt", 1, 7).alias("mon"), "seg"
                )
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total"),
                )
                .collect()
            }

        for _ in self._mutate(spark, l, r):
            v.refresh()
            got = {
                (x.mon, x.seg, x._n, x.total)
                for x in v.read().collect()
            }
            assert got == expect()

    def test_left_outer_agg_computed_key_on_right_column(
        self, spark, tmp_path
    ):
        """Key expression over the RIGHT side: padded rows bucket
        under NULL (upper(NULL) is NULL), transitioning with pad/unpad."""
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalLeftJoinAggView,
        )

        l, r = self._mk(spark, tmp_path)
        v = IncrementalLeftJoinAggView(
            spark, l.root, r.root, str(tmp_path / "ckov"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys={"seg_u": "upper(seg)"},
            sums={"total": "price"},
        )
        saw_null_bucket = False
        for _ in self._mutate(spark, l, r):
            v.refresh()
            got = {
                (x.seg_u, x._n, x.total)
                for x in v.read().collect()
            }
            expect = {
                (x.seg_u, x._n, x.total)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .groupBy(F.upper("seg").alias("seg_u"))
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total"),
                )
                .collect()
            }
            assert got == expect
            saw_null_bucket = saw_null_bucket or any(
                s is None for s, _, _ in got
            )
        assert saw_null_bucket  # padded rows actually hit NULL bucket


class TestNullSafeKeyedAggView:
    """`null_safe_keys=True`: NULL group keys are first-class — state
    keyed by the hidden __gid, delta/state joins and the endangered
    rescans gid-based, distinct side tables gid-merged. The NULL group
    must behave exactly like any other through every aggregate kind."""

    def _mk(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        return VersionedTable.create(
            spark,
            str(tmp_path / "nssrc"),
            spark.createDataFrame(
                [
                    (1, "a", "x", 5.0),
                    (2, "a", "y", 1.0),
                    (3, None, "x", 7.0),   # NULL group
                    (4, None, "y", 3.0),
                    (5, "b", None, 2.0),
                ],
                "id bigint, grp string, val string, x double",
            ),
        )

    def test_null_group_tracks_recompute_all_aggregates(
        self, spark, tmp_path
    ):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalAggView,
        )

        src = self._mk(spark, tmp_path)
        v = IncrementalAggView(
            spark, src.root, str(tmp_path / "nsv"),
            keys=["grp"],
            sums={"sx": "x"}, mins={"lo": "x"}, maxs={"hi": "x"},
            distincts={"nv": "val"}, avgs={"ax": "x"},
            null_safe_keys=True,
        )

        def expect():
            return {
                x.grp: (x._n, x.sx, x.lo, x.hi, x.nv,
                        None if x.ax is None else round(x.ax, 9))
                for x in src.read()
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("x").alias("sx"),
                    F.min("x").alias("lo"),
                    F.max("x").alias("hi"),
                    F.countDistinct("val").alias("nv"),
                    F.avg("x").alias("ax"),
                )
                .collect()
            }

        def got():
            return {
                x.grp: (x._n, x.sx, x.lo, x.hi, x.nv,
                        None if x.ax is None else round(x.ax, 9))
                for x in v.read()
                .select("grp", "_n", "sx", "lo", "hi", "nv", "ax")
                .collect()
            }

        v.refresh()
        assert got() == expect()
        assert None in got()  # the NULL group exists and is singular

        # delete AT the NULL group's max (7.0) — its endangered rescan
        # must find the group despite NULL never equality-matching
        src.delete_where([("id", "=", 3)])
        v.refresh()
        assert got() == expect()
        assert got()[None] == (1, 3.0, 3.0, 3.0, 1, 3.0)

        # distinct churn inside the NULL group + more rows joining it
        src.append(
            spark.createDataFrame(
                [(6, None, "y", 9.0), (7, None, "z", 0.5)],
                "id bigint, grp string, val string, x double",
            )
        )
        v.refresh()
        assert got() == expect()
        assert got()[None][4] == 2  # distinct vals y, z

        # the NULL group dies entirely, then is reborn
        src.delete_where(F.col("grp").isNull())
        v.refresh()
        assert got() == expect()
        assert None not in got()
        src.append(
            spark.createDataFrame(
                [(8, None, "w", 4.0)],
                "id bigint, grp string, val string, x double",
            )
        )
        v.refresh()
        assert got() == expect()
        assert got()[None] == (1, 4.0, 4.0, 4.0, 1, 4.0)


class TestComposedOuterJoinAggView:
    """Extremes/distinct/moments over OUTER joins via the rendered
    composition: outer state tables -> one rendered relation (__rk
    keyed) -> null-safe aggregate. Must equal a full outer-join +
    aggregate recompute after every round — pad/unpad transitions AT
    group extremes, NULL groups (padded rows), and both padded sides
    under full outer."""

    def _mk(self, spark, tmp_path, prefix):
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}l"),
            spark.createDataFrame(
                [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0), (4, 10, 4.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark,
            str(tmp_path / f"{prefix}r"),
            spark.createDataFrame(
                [(10, "a"), (20, "b"), (77, "w")], "ck bigint, seg string"
            ),
        )
        return l, r

    def _mutations(self, spark, l, r):
        import pyspark.sql.functions as F

        yield  # bootstrap: k=3 left-padded; ck=77 right-padded (full)
        # pad AT the 'a' group's extremes: customer 10 dies — orders
        # 1 and 4 (the group's min and max) move to the NULL group
        r.delete_where([("ck", "=", 10)])
        yield
        # unpad: 99 appears (order 3 joins 'z'); delete at an extreme
        r.append(
            spark.createDataFrame([(99, "z")], "ck bigint, seg string")
        )
        l.delete_where([("k", "=", 4)])  # NULL group's max dies
        yield
        # update moves a value across its group's extreme; key repoint
        l.update_where(F.col("k") == 2, {"price": F.lit(0.5)})
        l.update_where(F.col("k") == 1, {"ck": F.lit(20)})
        yield

    def _check(self, spark, tmp_path, join_type, how, prefix):
        import pyspark.sql.functions as F

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalComposedOuterJoinAggView,
        )

        l, r = self._mk(spark, tmp_path, prefix)
        v = IncrementalComposedOuterJoinAggView(
            spark, l.root, r.root, str(tmp_path / f"{prefix}v"),
            on=["ck"], left_pk="k", right_pk="ck",
            group_keys=["seg"], join_type=join_type,
            sums={"total": "price"}, mins={"lo": "price"},
            maxs={"hi": "price"}, distincts={"nk": "k"},
            avgs={"ap": "price"},
        )
        saw_null_group = False
        for _ in self._mutations(spark, l, r):
            v.refresh()
            got = {
                x.seg: (x._n, x.total, x.lo, x.hi, x.nk,
                        None if x.ap is None else round(x.ap, 9))
                for x in v.read()
                .select("seg", "_n", "total", "lo", "hi", "nk", "ap")
                .collect()
            }
            expect = {
                x.seg: (x._n, x.total, x.lo, x.hi, x.nk,
                        None if x.ap is None else round(x.ap, 9))
                for x in l.read()
                .join(r.read(), "ck", how)
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("price").alias("total"),
                    F.min("price").alias("lo"),
                    F.max("price").alias("hi"),
                    F.countDistinct("k").alias("nk"),
                    F.avg("price").alias("ap"),
                )
                .collect()
            }
            assert got == expect, (join_type, got, expect)
            saw_null_group = saw_null_group or None in got
        assert saw_null_group  # padded rows actually grouped under NULL
        # rendered relation equals the outer join itself
        got_rows = {
            (x.k, x.ck, x.price, x.seg)
            for x in v.read_join().collect()
        }
        exp_rows = {
            (x.k, x.ck, x.price, x.seg)
            for x in l.read().join(r.read(), "ck", how).collect()
        }
        assert got_rows == exp_rows

    def test_left_outer_extremes_track_recompute(self, spark, tmp_path):
        self._check(spark, tmp_path, "left", "left", "col")

    def test_full_outer_extremes_track_recompute(self, spark, tmp_path):
        self._check(spark, tmp_path, "full", "full", "cof")


def test_composed_outer_continuous_refresh(spark, tmp_path):
    """Continuous refresh for the rendered-outer composition: both
    base feeds trigger the three-stage refresh (outer state → rendered
    → null-safe agg); pad transitions and extreme churn converge to
    the recompute without a manual refresh."""
    import time
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalComposedOuterJoinAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    l = VersionedTable.create(
        spark,
        str(tmp_path / "crl"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    r = VersionedTable.create(
        spark,
        str(tmp_path / "crr"),
        spark.createDataFrame(
            [(10, "a"), (20, "b")], "ck bigint, seg string"
        ),
    )
    v = IncrementalComposedOuterJoinAggView(
        spark, l.root, r.root, str(tmp_path / "crv"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"], join_type="left",
        mins={"lo": "price"}, maxs={"hi": "price"},
    )
    v.refresh()
    qs = v.start_continuous_refresh(str(tmp_path / "crck"))
    try:
        # pad AT the 'a' extremes + new unmatched row, via the FEEDS
        r.delete_where([("ck", "=", 10)])
        l.append(
            spark.createDataFrame(
                [(4, 77, 0.5)], "k bigint, ck bigint, price double"
            )
        )

        def expect():
            return {
                x.seg: (x._n, x.lo, x.hi)
                for x in l.read()
                .join(r.read(), "ck", "left")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.min("price").alias("lo"),
                    F.max("price").alias("hi"),
                )
                .collect()
            }

        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            try:
                got = {
                    x.seg: (x._n, x.lo, x.hi)
                    for x in v.read()
                    .select("seg", "_n", "lo", "hi")
                    .collect()
                }
            except Exception:
                got = None
            if got == expect():
                break
            time.sleep(2)
        assert got == expect()
        assert got[None] == (3, 0.5, 3.0)  # k=1,3,4 padded
    finally:
        for q in qs:
            q.stop()


def test_gid_encoding_is_session_timezone_independent(spark, tmp_path):
    """ADVICE r11 (medium): __gid is a to_json render of the group-key
    struct, and to_json formats TIMESTAMP keys using
    spark.sql.session.timeZone unless pinned — a refresh run from a
    session configured with a different timezone must merge into the
    SAME groups, never strand/duplicate state rows (state persists on
    disk and MaterializedView.open supports fresh sessions)."""
    import datetime

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    utc = datetime.timezone.utc
    ts1 = datetime.datetime(2026, 3, 1, 12, 30, tzinfo=utc)
    ts2 = datetime.datetime(2026, 6, 1, 0, 0, tzinfo=utc)
    src = VersionedTable.create(
        spark, str(tmp_path / "tzsrc"),
        spark.createDataFrame(
            [(1, ts1, 2.0), (2, ts1, 3.0), (3, ts2, 5.0)],
            "id bigint, ts timestamp, x double",
        ),
    )
    v = IncrementalAggView(
        spark, src.root, str(tmp_path / "tzv"),
        keys=["ts"], sums={"sx": "x"}, null_safe_keys=True,
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        v.refresh()
        # the second refresh runs under a DIFFERENT session timezone;
        # its delta hits the ts1 group already in state — the gid
        # render must be identical or the merge silently duplicates
        spark.conf.set(
            "spark.sql.session.timeZone", "America/Los_Angeles"
        )
        src.append(
            spark.createDataFrame(
                [(4, ts1, 10.0)], "id bigint, ts timestamp, x double"
            )
        )
        v.refresh()
        got = sorted(
            (x.ts.replace(tzinfo=None), x._n, x.sx)
            for x in v.read().collect()
        )
        exp = sorted(
            (x.ts.replace(tzinfo=None), x._n, x.sx)
            for x in src.read()
            .groupBy("ts")
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("x").alias("sx"))
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert got == exp
    assert len(got) == 2  # ts1 merged into ONE group, not stranded


class TestSourceSchemaEvolution:
    """VERDICT r11 #4 — defined behavior when a SOURCE evolves under an
    active view: aggregate-state views CONVERGE (their deltas project
    only the referenced expressions; widened inputs fold through the
    state-type cast), full-row join views REFUSE LOUDLY with the
    rebuild recipe (silently dropping a new column would diverge from
    a recompute; silently evolving would change the view's schema
    under readers)."""

    def test_agg_view_converges_through_add_and_widen(
        self, spark, tmp_path
    ):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalAggView,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        src = VersionedTable.create(
            spark, str(tmp_path / "s"),
            spark.createDataFrame(
                [(1, 7, 2), (2, 8, 3)], "id bigint, grp int, x int"
            ),
        )
        v = IncrementalAggView(
            spark, src.root, str(tmp_path / "v"), ["grp"], {"sx": "x"}
        )
        v.refresh()
        # unrelated ADD COLUMN + widen BOTH the key and the summed col
        src.add_column("extra", "string", default="'d'")
        src.append(
            spark.createDataFrame(
                [(3, 7, 10, "w")],
                "id bigint, grp bigint, x bigint, extra string",
            ),
            merge_schema=True,
        )
        src.delete_where(F.col("id") == 2)
        v.refresh()
        got = sorted((x.grp, x._n, x.sx) for x in v.read().collect())
        exp = sorted(
            (x.grp, x._n, x.sx)
            for x in src.read()
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("x").alias("sx"))
            .collect()
        )
        assert got == exp

    def test_join_view_refuses_with_recipe_then_rebuilds(
        self, spark, tmp_path
    ):
        import shutil

        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinView,
            SchemaDriftError,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark, str(tmp_path / "l"),
            spark.createDataFrame(
                [(1, 10, 1.0)], "k bigint, ck bigint, price double"
            ),
        )
        r = VersionedTable.create(
            spark, str(tmp_path / "r"),
            spark.createDataFrame([(10, "a")], "ck bigint, seg string"),
        )
        vroot = str(tmp_path / "v")
        v = IncrementalJoinView(
            spark, l.root, r.root, vroot,
            on=["ck"], left_pk="k", right_pk="ck",
        )
        v.refresh()
        l.add_column("note", "string")
        l.append(
            spark.createDataFrame(
                [(2, 10, 5.0, "n")],
                "k bigint, ck bigint, price double, note string",
            )
        )
        with pytest.raises(SchemaDriftError, match="rebuild"):
            v.refresh()
        # idempotent no-op windows stay quiet (nothing new -> no check)
        # ... and the documented recipe works: drop the root, rebuild
        shutil.rmtree(vroot)
        v.refresh()
        assert v.read().columns == ["k", "ck", "price", "note", "seg"]
        assert v.read().count() == 2

    def test_join_view_refuses_on_retype(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.incremental_view import (
            IncrementalJoinView,
            SchemaDriftError,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark, str(tmp_path / "l"),
            spark.createDataFrame(
                [(1, 10, 2)], "k bigint, ck bigint, qty int"
            ),
        )
        r = VersionedTable.create(
            spark, str(tmp_path / "r"),
            spark.createDataFrame([(10, "a")], "ck bigint, seg string"),
        )
        v = IncrementalJoinView(
            spark, l.root, r.root, str(tmp_path / "v"),
            on=["ck"], left_pk="k", right_pk="ck",
        )
        v.refresh()
        l.append(
            spark.createDataFrame(
                [(2, 10, 9)], "k bigint, ck bigint, qty bigint"
            ),
            merge_schema=True,
        )
        with pytest.raises(SchemaDriftError, match="retyped=\\['qty'\\]"):
            v.refresh()

    def test_mv_statement_surface_behavior(self, spark, tmp_path):
        """The statement surface inherits both postures: REFRESH of a
        join MV over an evolved source raises the drift error; an agg
        MV converges."""
        from datalakeingestionservice_spark.sinks.incremental_view import (
            SchemaDriftError,
        )
        from datalakeingestionservice_spark.sinks.sql_dml import (
            execute_sql,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        l = VersionedTable.create(
            spark, str(tmp_path / "orders"),
            spark.createDataFrame(
                [(1, 10, 1.0), (2, 20, 2.0)],
                "k bigint, ck bigint, price double",
            ),
        )
        r = VersionedTable.create(
            spark, str(tmp_path / "cust"),
            spark.createDataFrame(
                [(10, "a"), (20, "b")], "ck bigint, seg string"
            ),
        )
        tables = {"orders": l, "customer": r}
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW jv LOCATION "
            f"'{tmp_path / 'mvj'}' PRIMARY KEY (k, ck) AS "
            "SELECT * FROM orders JOIN customer USING (ck)",
            tables,
        )
        execute_sql(
            spark,
            f"CREATE MATERIALIZED VIEW av LOCATION "
            f"'{tmp_path / 'mva'}' AS "
            "SELECT ck, SUM(price) AS t FROM orders GROUP BY ck",
            tables,
        )
        l.add_column("note", "string")
        execute_sql(
            spark, "INSERT INTO orders VALUES (3, 10, 5.0, 'x')", tables
        )
        with pytest.raises(SchemaDriftError):
            execute_sql(spark, "REFRESH MATERIALIZED VIEW jv", tables)
        execute_sql(spark, "REFRESH MATERIALIZED VIEW av", tables)
        got = sorted(
            tuple(x)
            for x in execute_sql(
                spark, "SELECT * FROM av", tables
            ).collect()
        )
        assert got == [(10, 6.0), (20, 2.0)]
