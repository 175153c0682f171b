"""Catalog-level atomic multi-table transactions (`sinks/multi_table.py`):
one catalog commit swaps every table pin atomically, so a reader that
resolves versions through the catalog can never observe a partial
cross-table transaction — and catalog time travel is a consistent
snapshot of the WHOLE table set.
"""

from __future__ import annotations

import threading

import pytest

from datalakeingestionservice_spark.sinks.multi_table import (
    CatalogConflictError,
    NoSuchTableError,
    TableCatalog,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


@pytest.fixture()
def cat(spark, tmp_path):
    a = VersionedTable.create(
        spark,
        str(tmp_path / "a"),
        _df(spark, [(i, float(i)) for i in range(10)]),
    )
    b = VersionedTable.create(spark, str(tmp_path / "b"), _df(spark, [(0, 0.0)]))
    return TableCatalog.create(
        spark, str(tmp_path / "cat"), {"a": a, "b": b}
    )


def test_atomic_move_and_time_travel(spark, cat):
    moved = cat.table("a").read().filter("k < 5")
    with cat.transaction() as txn:
        txn["b"].append(moved)
        txn["a"].delete_where([("k", "<", 5)])
    assert cat.latest_version() == 2
    assert cat.read("a").count() == 5 and cat.read("b").count() == 6
    # cross-table time travel: catalog v1 is the whole pre-move world
    assert cat.read("a", catalog_version=1).count() == 10
    assert cat.read("b", catalog_version=1).count() == 1
    # the conservation invariant holds at EVERY catalog version — the
    # property a partial transaction would break
    for cv in (1, 2):
        n = cat.sql(
            "SELECT (SELECT count(*) FROM a) + (SELECT count(*) FROM b) "
            "AS n",
            cv,
        ).collect()[0].n
        assert n == 11, (cv, n)


def test_failed_transaction_moves_nothing(spark, cat):
    """A table commit inside a failed transaction becomes an unpinned
    orphan version: visible by direct table time travel, NEVER through
    the catalog."""
    with pytest.raises(RuntimeError):
        with cat.transaction() as txn:
            txn["b"].append(_df(spark, [(99, 9.9)]))
            raise RuntimeError("boom")
    assert cat.latest_version() == 1
    assert cat.read("b").count() == 1  # catalog reader: old world
    assert cat.table("b").read().count() == 2  # orphan exists on the table
    # next successful transaction absorbs the table head into its pin
    with cat.transaction() as txn:
        txn["a"].append(_df(spark, [(50, 5.0)]))
    assert cat.read("a").count() == 11


def test_conflicting_transactions_refuse(spark, cat, tmp_path):
    t1 = cat.transaction()
    t1.__enter__()
    t1["a"].append(_df(spark, [(100, 1.0)]))
    # another committer moves the catalog head first
    cat.add_table(
        "c",
        VersionedTable.create(
            spark, str(tmp_path / "c"), _df(spark, [(1, 1.0)])
        ),
    )
    with pytest.raises(CatalogConflictError):
        t1.__exit__(None, None, None)
    # the loser's table version is an unpinned orphan
    assert cat.table_version("a") == 1
    assert cat.table("a").latest_version() == 2


def test_racing_transactions_exactly_one_wins(spark, cat):
    outcomes = {}
    barrier = threading.Barrier(2)

    def attempt(tag, key):
        txn = cat.transaction()
        txn.__enter__()
        txn["b"].append(_df(spark, [(key, float(key))]))
        barrier.wait()
        try:
            txn.__exit__(None, None, None)
            outcomes[tag] = "win"
        except CatalogConflictError:
            outcomes[tag] = "lose"

    threads = [
        threading.Thread(target=attempt, args=(t, k))
        for t, k in (("x", 500), ("y", 600))
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(outcomes.values()) == ["lose", "win"], outcomes
    # NOTE: both appends hit table b (table-level serialization is the
    # table's own protocol); the catalog pin records whatever head the
    # WINNER saw at exit — one commit, consistent either way.
    assert cat.latest_version() == 2


def test_table_set_evolution_and_refusals(spark, cat, tmp_path):
    c = VersionedTable.create(
        spark, str(tmp_path / "c"), _df(spark, [(1, 1.0)])
    )
    v = cat.add_table("c", c)
    assert v == 2 and cat.read("c").count() == 1
    with pytest.raises(ValueError, match="already registered"):
        cat.add_table("c", c)
    assert cat.remove_table("c") == 3
    with pytest.raises(NoSuchTableError):
        cat.read("c")
    with pytest.raises(NoSuchTableError):
        cat.read("zz")
    with pytest.raises(NoSuchTableError):
        with cat.transaction() as txn:
            txn["zz"]
    # removal is a catalog commit: time travel still resolves c at v2
    assert cat.read("c", catalog_version=2).count() == 1


def test_catalog_sql_drops_views(spark, cat):
    cat.sql("SELECT count(*) FROM a").collect()
    names = {t.name for t in spark.catalog.listTables()}
    assert "a" not in names and "b" not in names


def test_create_on_existing_catalog_refuses(spark, cat):
    with pytest.raises(ValueError, match="already a table catalog"):
        TableCatalog.create(spark, cat.root, {})
