"""VersionedTable.update_where (COW UPDATE, Delta's UPDATE...WHERE) and
the stats-scoped triple form of delete_where.

Semantics pinned here:
- UPDATE matches TRUE rows only (NULL predicate rows stay unchanged,
  SQL UPDATE semantics); the match decision is made on PRE-update
  values even when an assignment rewrites a predicate column.
- Triple-form delete_where deletes exactly what read(predicates=)
  selects (TRUE-only), unlike the Column form's filter(~pred) which
  also drops NULL rows.
- Both scoped forms carry provably-unmatched entries byte-identical.
- The change feed encodes an update as delete(preimage) +
  insert(postimage) — the MERGE encoding, so replays need nothing new.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConstraintViolationError,
    VersionedTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, rows, ddl="id bigint, grp string, v double"):
    return spark.createDataFrame(rows, ddl)


ROWS = [
    (1, "a", 1.0),
    (2, "a", 2.0),
    (3, "b", 3.0),
    (4, "b", 4.0),
    (5, None, 5.0),
]


def test_update_where_column_form_parity(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    v = t.update_where(F.col("grp") == "a", {"v": F.col("v") * 10})
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {
        (1, "a", 10.0), (2, "a", 20.0), (3, "b", 3.0),
        (4, "b", 4.0), (5, None, 5.0),
    }
    # NULL-predicate row (grp NULL -> NULL match) stayed unchanged.
    assert t.manifest(v).operation == "update"
    # Time travel: the parent snapshot is untouched.
    assert {r.v for r in t.read(v - 1).collect()} == {
        1.0, 2.0, 3.0, 4.0, 5.0
    }


def test_update_where_sql_string_assignments(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.update_where(
        F.col("id") <= 2, {"v": "v + 0.5", "grp": "upper(grp)"}
    )
    got = {(r.id, r.grp, r.v) for r in t.read().collect()}
    assert got == {
        (1, "A", 1.5), (2, "A", 2.5), (3, "b", 3.0),
        (4, "b", 4.0), (5, None, 5.0),
    }


def test_update_where_assignment_casts_to_column_type(spark, root):
    """Assignments cast to the EXISTING column type — an UPDATE never
    widens the schema (int literal into a double column stays
    double)."""
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    t.update_where(F.col("id") == 3, {"v": F.lit(7)})
    m = t.manifest()
    assert "v:double" in m.schema_ddl.replace(" ", "")
    assert {r.v for r in t.read().filter("id = 3").collect()} == {7.0}


def test_update_on_predicate_column_uses_preimage_match(spark, root):
    """`UPDATE ... SET grp='b' WHERE grp='a'` must not re-match the
    rewritten rows (or emit postimages selected by post-update
    values)."""
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), materialize_changes=True
    )
    v = t.update_where(F.col("grp") == "a", {"grp": F.lit("b")})
    got = sorted(
        (r.grp or "") for r in t.read().collect()
    )
    assert got == ["", "b", "b", "b", "b"]
    ch = t.changes(v - 1, v)
    pre = {
        (r.id, r.grp)
        for r in ch.filter("_change_type = 'delete'").collect()
    }
    post = {
        (r.id, r.grp)
        for r in ch.filter("_change_type = 'insert'").collect()
    }
    assert pre == {(1, "a"), (2, "a")}
    assert post == {(1, "b"), (2, "b")}


def test_update_where_triple_form_scopes_partitions(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before = t.manifest()
    v = t.update_where([("grp", "=", "a")], {"v": F.col("v") + 100})
    m = t.manifest(v)
    # The b-leaf and the null-leaf carried forward byte-identically.
    carried = set(before.files) & set(m.files)
    assert len(carried) == 2
    assert m.summary["n_dirs_untouched"] == 2
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {
        (1, 101.0), (2, 102.0), (3, 3.0), (4, 4.0), (5, 5.0)
    }


def test_update_where_constraint_violation_aborts(spark, root):
    t = VersionedTable.create(
        spark,
        root,
        _df(spark, ROWS),
        check_constraints={"v_pos": "v > 0"},
    )
    parent = t.latest_version()
    with pytest.raises(ConstraintViolationError):
        t.update_where(F.col("id") == 1, {"v": F.lit(-1.0)})
    assert t.latest_version() == parent
    # Non-matching rows never re-validate: an update elsewhere passes.
    t.update_where(F.col("id") == 2, {"v": F.lit(9.0)})


def test_update_where_unknown_column_refuses(spark, root):
    t = VersionedTable.create(spark, root, _df(spark, ROWS))
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where(F.col("id") == 1, {"nope": F.lit(1)})


def test_update_cdf_feeds_incremental_view(spark, root):
    """An update's delete+insert CDF pair replays exactly through the
    counting-algorithm MV — sum shifts by the delta, count is stable."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )

    rows = [r for r in ROWS if r[1] is not None]  # MV keys are non-null
    t = VersionedTable.create(
        spark, root, _df(spark, rows), materialize_changes=True
    )
    mv = IncrementalAggView(
        spark, root, root + "_mv", ["grp"], {"sv": "v"}
    )
    mv.refresh()
    t.update_where(F.col("grp") == "b", {"v": F.col("v") + 1.0})
    mv.refresh()
    got = {tuple(r) for r in mv.read().collect()}
    full = {
        tuple(r)
        for r in t.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("v").alias("sv"),
        )
        .collect()
    }
    assert got == full


def test_delete_where_triple_form_scoped_and_true_only(spark, root):
    t = VersionedTable.create(
        spark, root, _df(spark, ROWS), partition_by=["grp"]
    )
    before = t.manifest()
    v = t.delete_where([("grp", "=", "a")])
    m = t.manifest(v)
    assert m.summary["n_dirs_untouched"] == 2
    assert len(set(before.files) & set(m.files)) == 2
    # TRUE-only: the NULL-grp row SURVIVES a triple-form delete (the
    # Column form filter(~pred) would have dropped it).
    assert {r.id for r in t.read().collect()} == {3, 4, 5}
    # And it deletes exactly what read(predicates=) selected.
    assert t.read(predicates=[("grp", "=", "a")]).count() == 0


def test_delete_where_triple_matches_predicated_read(spark, root):
    rows = [(i, "g" + str(i % 3), float(i)) for i in range(30)]
    t = VersionedTable.create(spark, root, _df(spark, rows))
    want_deleted = t.read(
        predicates=[("id", ">=", 10), ("id", "<", 20)]
    ).count()
    assert want_deleted == 10
    t.delete_where([("id", ">=", 10), ("id", "<", 20)])
    assert t.read().count() == 30 - want_deleted
    assert (
        t.read(predicates=[("id", ">=", 10), ("id", "<", 20)]).count()
        == 0
    )


def test_scoped_update_after_spec_evolution(spark, root):
    """Spec snapshots make the scoped UPDATE exact across a bucket
    respec: only the (<=2) leaves that can hold the key rewrite."""
    rows = [(i, "g", float(i)) for i in range(64)]
    t = VersionedTable.create(
        spark, root, _df(spark, rows), partition_by=["bucket(4, id)"]
    )
    t.set_partition_spec(["bucket(8, id)"])
    t.append(
        _df(spark, [(i, "g", float(i)) for i in range(64, 128)])
    )
    n_entries = len(t.manifest().files)
    v = t.update_where([("id", "=", 10)], {"v": F.lit(-10.0)})
    m = t.manifest(v)
    assert m.summary["n_dirs_untouched"] >= n_entries - 2
    assert {
        r.v for r in t.read(predicates=[("id", "=", 10)]).collect()
    } == {-10.0}
    assert t.read().count() == 128
