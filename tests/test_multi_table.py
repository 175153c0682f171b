"""Catalog-level atomic multi-table transactions (`sinks/multi_table.py`):
one catalog commit swaps every table pin atomically, so a reader that
resolves versions through the catalog can never observe a partial
cross-table transaction — and catalog time travel is a consistent
snapshot of the WHOLE table set.
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
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


@pytest.mark.parametrize("seed", [11, 47])
def test_catalog_random_transaction_sequence_matches_model(
    spark, tmp_path, seed
):
    """Model fuzz for the catalog: a random interleave of multi-table
    transactions, FAILED transactions (must move nothing), direct
    to-table writes (absorbed by the next transaction — the documented
    Nessie posture), and table-set evolution. Every catalog version's
    per-table snapshot must equal the model at that version — the
    invariant a partial cross-table commit would break."""
    import random

    from collections import Counter

    rng = random.Random(seed)
    names = ["a", "b"]
    tables = {
        n: VersionedTable.create(
            spark, str(tmp_path / n), _df(spark, [(i, float(i)) for i in range(3)])
        )
        for n in names
    }
    cat = TableCatalog.create(spark, str(tmp_path / "cat"), tables)
    base = {n: Counter((i, float(i)) for i in range(3)) for n in names}
    history = [None, {n: Counter(c) for n, c in base.items()}]
    model = {n: Counter(c) for n, c in base.items()}
    pending: dict[str, Counter] = {}  # direct writes awaiting absorption
    next_k = 100

    def fresh(n_rows):
        nonlocal next_k
        rows = [(next_k + i, float(next_k + i)) for i in range(n_rows)]
        next_k += n_rows
        return rows

    for step in range(8):
        # Lake-branch arms run DETERMINISTICALLY (the draw may never
        # hit them for fixed seeds): whole-lake isolation of staged
        # work on a catalog branch, then publish-or-drop.
        if step in (2, 6):
            op = "lake_branch"
        else:
            op = rng.choice(
                ["txn", "txn", "txn", "failed_txn", "direct",
                 "staged_veto"]
            )
        if op == "lake_branch":
            bname = f"lb{step}"
            dev = cat.create_branch(bname)
            touched = rng.sample(names, rng.randint(1, 2))
            staged = {n: Counter(model[n]) for n in names}
            for n in touched:
                rows = fresh(rng.randint(1, 2))
                with dev.staged_transaction() as txn:
                    txn[n].append(_df(spark, rows))
                staged[n].update(rows)
            # WHOLE-LAKE isolation mid-branch: catalog-main reads are
            # the model (staged work invisible; pending direct writes
            # are invisible to catalog readers anyway), and the branch
            # reads resolve the staged world through its branch pins.
            for n in names:
                got = Counter(
                    (r.k, r.v) for r in cat.read(n).collect()
                )
                assert got == model[n], (step, n, "main leaked")
                gotb = Counter(
                    (r.k, r.v) for r in dev.read(n).collect()
                )
                assert gotb == staged[n], (step, n, "branch wrong")
            # publish only when no touched table has pending direct
            # writes (they moved the table main past the fork — the
            # table-level claim makes the publish refuse, by design)
            if rng.random() < 0.6 and not any(
                n in pending for n in touched
            ):
                cat.publish_branch(bname)
                cat.drop_branch(bname)
                model = staged
                history.append(
                    {n: Counter(c) for n, c in model.items()}
                )
            else:
                heads = {
                    m: tables[m].latest_version() for m in names
                }
                cat.drop_branch(bname)
                # abandoning the lake branch leaves NOTHING: no table
                # main moved, no staged table branch survives
                assert {
                    m: tables[m].latest_version() for m in names
                } == heads
                assert all(
                    tables[m].list_branches() == {} for m in names
                )
            continue
        if op == "staged_veto":
            # staged groups that abort must leave NOTHING anywhere —
            # no catalog version, no table version, no pending orphan.
            n = rng.choice(names)
            heads = {m: tables[m].latest_version() for m in names}
            with pytest.raises(RuntimeError):
                with cat.staged_transaction() as txn:
                    txn[n].append(_df(spark, fresh(1)))
                    raise RuntimeError("audit veto")
            assert {m: tables[m].latest_version() for m in names} == heads
            assert all(tables[m].list_branches() == {} for m in names)
            continue  # no catalog version, no model change
        if op == "direct":
            # invisible to catalog readers until a txn touches the table
            n = rng.choice(names)
            rows = fresh(rng.randint(1, 2))
            tables[n].append(_df(spark, rows))
            pending.setdefault(n, Counter()).update(rows)
            continue  # no catalog version
        if op == "failed_txn":
            n = rng.choice(names)
            rows = fresh(1)
            with pytest.raises(RuntimeError):
                with cat.transaction() as txn:
                    txn[n].append(_df(spark, rows))
                    raise RuntimeError("boom")
            pending.setdefault(n, Counter()).update(rows)  # orphan
            continue  # no catalog version
        touched = rng.sample(names, rng.randint(1, 2))
        staged = {}
        # plain and STAGED transactions must be model-indistinguishable
        # on success; staged ones cannot absorb pending direct writes
        # (they fork at the PIN and publish refuses if a main moved), so
        # only use them when nothing is pending on the touched tables.
        use_staged = rng.random() < 0.4 and not any(
            n in pending for n in touched
        )
        ctx = (
            cat.staged_transaction() if use_staged else cat.transaction()
        )
        with ctx as txn:
            for n in touched:
                m = Counter(model[n])
                m.update(pending.pop(n, Counter()))  # absorb
                kind = rng.choice(["append", "delete", "overwrite"])
                if kind == "append":
                    rows = fresh(rng.randint(1, 2))
                    txn[n].append(_df(spark, rows))
                    m.update(rows)
                elif kind == "delete":
                    mod = rng.randint(2, 3)
                    txn[n].delete_where(F.col("k") % mod == 0)
                    for key in [k for k in list(m) if k[0] % mod == 0]:
                        del m[key]
                else:
                    rows = fresh(rng.randint(1, 2))
                    txn[n].overwrite(_df(spark, rows))
                    m = Counter(rows)
                staged[n] = m
        model = {**{n: Counter(c) for n, c in model.items()}, **staged}
        history.append({n: Counter(c) for n, c in model.items()})

    assert cat.latest_version() == len(history) - 1
    for cv in range(1, len(history)):
        for n in names:
            got = Counter(
                (r.k, r.v) for r in cat.read(n, catalog_version=cv).collect()
            )
            assert got == history[cv][n], (cv, n, seed)


def test_staged_transaction_wap(spark, cat):
    """Catalog-level write-audit-publish: writes stage on per-txn
    branches (NOTHING on any main — not even orphans), the audit sees
    the staged cross-table world and can veto by raising, success
    publishes every branch and swaps the pin once."""
    # veto path: zero trace anywhere
    with pytest.raises(ValueError, match="audit"):
        with cat.staged_transaction() as txn:
            txn["b"].append(_df(spark, [(7, -1.0)]))
            n_bad = txn.sql(
                "SELECT count(*) AS n FROM b WHERE v < 0"
            ).collect()[0].n
            assert n_bad == 1  # staged view sees the batch
            raise ValueError("audit failed")
    for name in ("a", "b"):
        assert cat.table(name).latest_version() == 1  # no orphans
        assert cat.table(name).list_branches() == {}
    # success path: cross-table move audited on the staged world
    with cat.staged_transaction() as txn:
        txn["b"].append(cat.read("a").filter("k < 3"))
        txn["a"].delete_where([("k", "<", 3)])
        n = txn.sql(
            "SELECT (SELECT count(*) FROM a) + "
            "(SELECT count(*) FROM b) AS n"
        ).collect()[0].n
        assert n == 11  # conservation holds in the staged world
    assert cat.latest_version() == 2
    assert cat.read("a").count() == 7 and cat.read("b").count() == 4
    assert cat.table("a").list_branches() == {}


def test_staged_transaction_conflict_drops_branches(spark, cat):
    """A direct writer moving a main mid-staged-txn makes the publish
    refuse (fast-forward divergence): branches are dropped, the pin
    never moves, staged rows never surface."""
    txn = cat.staged_transaction()
    txn.__enter__()
    txn["a"].append(_df(spark, [(100, 1.0)]))
    cat.table("a").append(_df(spark, [(200, 2.0)]))  # concurrent
    with pytest.raises(CatalogConflictError):
        txn.__exit__(None, None, None)
    assert cat.table("a").list_branches() == {}
    assert cat.read("a").filter("k = 100").count() == 0
    assert cat.table_version("a") == 1


def test_branch_staged_txn_never_touches_table_mains(spark, cat):
    """THE leak scenario (ADVICE r8 medium): staged work on a catalog
    branch must never reach the shared table-main heads before the
    catalog branch publishes — otherwise a later plain transaction on
    catalog MAIN pins t.latest_version() (the absorb posture) and the
    unpublished lake-branch rows silently surface in catalog-main
    reads."""
    dev = cat.create_branch("dev")
    with dev.staged_transaction() as txn:
        txn["b"].append(_df(spark, [(777, 7.0)]))
    # table mains did not move: staged work lives on a table BRANCH,
    # pinned by the catalog branch as a (root, version, branch, base)
    # coordinate
    assert cat.table("b").latest_version() == 1
    assert "branch" in dev.pins()["b"]
    assert dev.pins()["b"]["base"] == 1
    assert dev.read("b").filter("k = 777").count() == 1
    # the absorb scenario: a plain txn on catalog MAIN touching b must
    # NOT pick up the branch's staged rows
    with cat.transaction() as txn:
        txn["b"].append(_df(spark, [(1, 1.0)]))
    assert cat.read("b").filter("k = 777").count() == 0
    # ...and the branch's publish now refuses on b's divergence
    # (main moved past the fork) instead of silently composing
    with pytest.raises(CatalogConflictError):
        cat.publish_branch("dev")
    assert cat.read("b").filter("k = 777").count() == 0
    cat.drop_branch("dev")
    # drop reclaimed the staged table branch refs
    assert cat.table("b").list_branches() == {}


def test_branch_staged_abort_leaves_nothing_anywhere(spark, cat):
    """An aborted staged transaction on a catalog branch leaves NOTHING:
    no table-main version, no table branch, no catalog-branch commit."""
    dev = cat.create_branch("dev")
    with pytest.raises(RuntimeError):
        with dev.staged_transaction() as txn:
            txn["a"].append(_df(spark, [(900, 9.0)]))
            raise RuntimeError("veto")
    assert cat.table("a").latest_version() == 1
    assert cat.table("a").list_branches() == {}
    assert dev.latest_version() == 1  # no branch commit either
    # the branch still works after the abort: staged txns compose
    with dev.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(901, 9.1)]))
    with dev.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(902, 9.2)]))
    assert dev.read("a").count() == 12
    assert cat.table("a").latest_version() == 1  # still untouched
    assert cat.publish_branch("dev") == 2
    assert cat.read("a").count() == 12
    # staged table branches SURVIVE the publish (the catalog branch's
    # own history still resolves through them — mirror of table WAP:
    # the ref survives publish, drop it separately)...
    assert len(cat.table("a").list_branches()) == 2
    assert dev.read("a", catalog_version=2).count() == 11
    # ...and catalog drop_branch reclaims them all
    cat.drop_branch("dev")
    assert cat.table("a").list_branches() == {}


def test_two_lake_branches_same_table_stay_isolated(spark, cat):
    """Two catalog branches staging on the SAME table never compose:
    each stages on its own table branches forked at its own pins."""
    d1, d2 = cat.create_branch("d1"), cat.create_branch("d2")
    with d1.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(111, 1.0)]))
    with d2.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(222, 2.0)]))
    assert d1.read("a").filter("k = 222").count() == 0
    assert d2.read("a").filter("k = 111").count() == 0
    assert cat.read("a").count() == 10
    # first publish wins; the second refuses on catalog divergence
    cat.publish_branch("d1")
    with pytest.raises(CatalogConflictError):
        cat.publish_branch("d2")
    assert cat.read("a").filter("k = 111").count() == 1
    assert cat.read("a").filter("k = 222").count() == 0
    cat.drop_branch("d1")
    cat.drop_branch("d2")
    assert cat.table("a").list_branches() == {}


def test_branch_pinned_catalog_time_travel(spark, cat):
    """Cross-table time travel on a catalog BRANCH resolves every pin
    — branch coordinates included — to one consistent staged world."""
    dev = cat.create_branch("dev")
    with dev.staged_transaction() as txn:
        txn["b"].append(dev.read("a").filter("k < 3"))
        txn["a"].delete_where([("k", "<", 3)])
    with dev.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(55, 5.5)]))
    # conservation at every branch version (the staged worlds)
    for cv, want in ((1, 11), (2, 11), (3, 12)):
        n = (
            dev.sql(
                "SELECT (SELECT count(*) FROM a) + "
                "(SELECT count(*) FROM b) AS n",
                cv,
            )
            .collect()[0]
            .n
        )
        assert n == want, (cv, n)


def test_catalog_tags_whole_lake_refs(spark, cat):
    """Catalog tags: immutable named refs over the whole lake — a tag
    resolves to one consistent cross-table snapshot by name; re-tag
    refuses; branch handles refuse tag admin; drop frees the name."""
    with cat.transaction() as txn:
        txn["b"].append(cat.read("a").filter("k < 4"))
        txn["a"].delete_where([("k", "<", 4)])
    v = cat.create_tag("pre-move", 1)
    assert v == 1
    assert cat.create_tag("post-move") == 2  # defaults to latest
    assert cat.list_tags() == {"post-move": 2, "pre-move": 1}
    # the tagged snapshot is the consistent pre-move world
    tv = cat.tag_version("pre-move")
    assert cat.read("a", catalog_version=tv).count() == 10
    assert cat.read("b", catalog_version=tv).count() == 1
    n = (
        cat.sql(
            "SELECT (SELECT count(*) FROM a) + "
            "(SELECT count(*) FROM b) AS n",
            cat.tag_version("post-move"),
        )
        .collect()[0]
        .n
    )
    assert n == 11
    # immutability + refusals
    with pytest.raises(ValueError, match="drop_tag first"):
        cat.create_tag("pre-move", 2)
    with pytest.raises(ValueError, match="MAIN"):
        cat.create_branch("d").create_tag("x")
    cat.drop_branch("d")
    from datalakeingestionservice_spark.sinks.versioned import (
        NoSuchVersionError,
    )

    with pytest.raises(NoSuchVersionError, match="no catalog tag"):
        cat.tag_version("nope")
    cat.drop_tag("pre-move")
    assert cat.list_tags() == {"post-move": 2}
    with pytest.raises(NoSuchVersionError):
        cat.drop_tag("pre-move")
    # a dropped name can be re-tagged (now at a different version)
    assert cat.create_tag("pre-move", 2) == 2


def test_catalog_sql_preserves_user_temp_views(spark, cat):
    """ADVICE r8: cat.sql materializes views named exactly the table
    names — a pre-existing user temp view with the same name must
    survive (restored, not destroyed)."""
    spark.range(3).createOrReplaceTempView("a")
    try:
        n = cat.sql("SELECT count(*) AS n FROM a").collect()[0].n
        assert n == 10  # the statement saw the CATALOG's a
        assert spark.table("a").count() == 3  # user view restored
        # same guarantee on the staged-transaction audit surface
        with cat.staged_transaction() as txn:
            txn["b"].append(_df(spark, [(5, 5.0)]))
            assert (
                txn.sql("SELECT count(*) AS n FROM a").collect()[0].n
                == 10
            )
        assert spark.table("a").count() == 3
    finally:
        spark.catalog.dropTempView("a")


def test_create_race_maps_to_clear_error(spark, cat, monkeypatch):
    """ADVICE r8: a TableCatalog.create that loses the v1 claim race
    (both racers pass the emptiness probe) surfaces a clear ValueError,
    not a raw ConcurrentCommitError."""
    from datalakeingestionservice_spark.sinks.versioned import (
        NoSuchVersionError,
    )

    # simulate the loser: the emptiness probe passes (catalog looked
    # empty), then the real v1 publish hits the winner's claim
    monkeypatch.setattr(
        TableCatalog,
        "latest_version",
        lambda self: (_ for _ in ()).throw(NoSuchVersionError("empty")),
    )
    with pytest.raises(ValueError, match="created concurrently"):
        TableCatalog.create(spark, cat.root, {})


def test_catalog_branches_whole_lake(spark, cat):
    """Catalog-level refs (the Nessie model): a branch of the WHOLE
    catalog runs its own transactions — main readers see nothing —
    and one publish fast-forwards the entire staged lake state."""
    dev = cat.create_branch("dev")
    # plain transactions refuse on a branch handle (they write on
    # shared table-main heads and would compose across lake branches);
    # staged transactions fork at the branch pin: isolate-or-refuse.
    with pytest.raises(ValueError, match="staged_transaction"):
        dev.transaction()
    with dev.staged_transaction() as txn:
        txn["b"].append(cat.read("a").filter("k < 2"))
        txn["a"].delete_where([("k", "<", 2)])
    with dev.staged_transaction() as txn:
        txn["a"].append(_df(spark, [(99, 9.0)]))
    # two branch commits; catalog main untouched (whole lake isolated)
    assert dev.latest_version() == 3 and cat.latest_version() == 1
    assert cat.read("a").count() == 10 and cat.read("b").count() == 1
    assert dev.read("a").count() == 9 and dev.read("b").count() == 3
    assert cat.list_branches() == {"dev": {"head": 3, "base": 1}}
    v = cat.publish_branch("dev")
    assert v == 2
    assert cat.manifest()["operation"] == "publish_branch"
    assert cat.read("a").count() == 9 and cat.read("b").count() == 3
    # divergence: main moves past the fork -> refuse, nothing applied
    dev2 = cat.create_branch("dev2")
    with dev2.staged_transaction() as txn:
        txn["b"].append(_df(spark, [(7, 7.0)]))
    with cat.transaction() as txn:
        txn["a"].append(_df(spark, [(500, 5.0)]))
    with pytest.raises(CatalogConflictError, match="fast-forward"):
        cat.publish_branch("dev2")
    assert cat.read("b").filter("k = 7").count() == 0
    cat.drop_branch("dev2")
    # guardrails
    with pytest.raises(ValueError, match="MAIN"):
        dev.create_branch("x")
    with pytest.raises(ValueError, match="nothing to publish"):
        cat.create_branch("empty") and cat.publish_branch("empty")


@pytest.mark.parametrize("seed", [7, 23])
def test_catalog_branch_fuzz_direct_write_and_publish_races(
    spark, tmp_path, seed
):
    """Catalog-SCALE fuzz arm (VERDICT r9 #4): one random schedule
    interleaving {staged txn on a catalog branch, DIRECT table write,
    publish_branch, drop_branch, plain txn}, with BOTH divergence-
    refusal paths exercised deterministically per seed:

    - FAST-FORWARD refusal: catalog main moved past the branch base
      (a plain txn ran after the fork) — publish refuses before
      touching any table.
    - TABLE-DIVERGENCE refusal: a direct writer moved a touched
      table's main past the staged fork — the table-level claim
      refuses, and tables iterated earlier that attempt may land
      published-but-UNPINNED (main advanced, catalog pin unchanged —
      the documented posture). The model reconciles each touched main
      against its only two legal states and verifies catalog-main
      readers saw NOTHING either way.

    Every catalog version's per-table snapshot must equal the model at
    that version, after every step and in the final time-travel replay.
    """
    import random
    from collections import Counter

    rng = random.Random(seed)
    names = ["a", "b"]
    tables = {
        n: VersionedTable.create(
            spark,
            str(tmp_path / n),
            _df(spark, [(i, float(i)) for i in range(3)]),
        )
        for n in names
    }
    cat = TableCatalog.create(spark, str(tmp_path / "cat"), tables)
    model = {n: Counter((i, float(i)) for i in range(3)) for n in names}
    mains = {n: Counter(c) for n, c in model.items()}
    tbl_epoch = {n: 0 for n in names}   # bumps on every table-MAIN commit
    pin_epoch = {n: 0 for n in names}   # epoch of the version each pin names
    history = [None, {n: Counter(c) for n, c in model.items()}]
    refusals = Counter()
    branch = None  # {'name','dev','base_cv','staged','fork_pin','touched','commits'}
    next_k = 100
    n_branch = 0

    def fresh(n_rows):
        nonlocal next_k
        rows = [(next_k + i, float(next_k + i)) for i in range(n_rows)]
        next_k += n_rows
        return rows

    def do_create():
        nonlocal branch, n_branch
        n_branch += 1
        name = f"fz{n_branch}"
        branch = {
            "name": name,
            "dev": cat.create_branch(name),
            "base_cv": cat.latest_version(),
            "staged": {n: Counter(model[n]) for n in names},
            "fork_pin": dict(pin_epoch),
            "touched": set(),
            "commits": 0,
        }

    def do_staged_txn():
        touched = rng.sample(names, rng.randint(1, 2))
        with branch["dev"].staged_transaction() as txn:
            for n in touched:
                m = branch["staged"][n]
                if rng.random() < 0.25 and m:
                    mod = rng.randint(2, 3)
                    txn[n].delete_where(F.col("k") % mod == 0)
                    for key in [k for k in list(m) if k[0] % mod == 0]:
                        del m[key]
                else:
                    rows = fresh(rng.randint(1, 2))
                    txn[n].append(_df(spark, rows))
                    m.update(rows)
        branch["touched"].update(touched)
        branch["commits"] += 1

    def do_direct(force_touched=False):
        pool = (
            sorted(branch["touched"])
            if force_touched and branch and branch["touched"]
            else names
        )
        n = rng.choice(pool)
        rows = fresh(rng.randint(1, 2))
        tables[n].append(_df(spark, rows))
        mains[n].update(rows)
        tbl_epoch[n] += 1

    def do_plain_txn():
        touched = rng.sample(names, rng.randint(1, 2))
        with cat.transaction() as txn:
            for n in touched:
                m = Counter(mains[n])  # plain txns fork at MAIN: absorb
                rows = fresh(rng.randint(1, 2))
                txn[n].append(_df(spark, rows))
                m.update(rows)
                model[n] = m
                mains[n] = Counter(m)
                tbl_epoch[n] += 1
                pin_epoch[n] = tbl_epoch[n]
        history.append({n: Counter(c) for n, c in model.items()})

    def do_publish():
        nonlocal branch, model
        b = branch
        if cat.latest_version() != b["base_cv"]:
            with pytest.raises(CatalogConflictError, match="fast-forward"):
                cat.publish_branch(b["name"])
            refusals["fast_forward"] += 1
            return  # branch stays open; nothing anywhere changed
        diverged = {
            n for n in b["touched"] if tbl_epoch[n] != b["fork_pin"][n]
        }
        if diverged:
            with pytest.raises(CatalogConflictError, match="diverged"):
                cat.publish_branch(b["name"])
            refusals["divergence"] += 1
            # Touched mains are each in exactly one of two legal
            # states: untouched-by-publish (still `mains`) or
            # published-but-unpinned (the staged content). Reconcile
            # the model's MAIN view from observation; catalog pins
            # must be byte-for-byte unmoved (checked in the step
            # verify below).
            for n in sorted(b["touched"]):
                got = Counter(
                    (r.k, r.v) for r in tables[n].read().collect()
                )
                assert got in (mains[n], b["staged"][n]), (n, seed)
                if got != mains[n]:
                    mains[n] = got
                    tbl_epoch[n] += 1
            return
        cat.publish_branch(b["name"])
        for n in b["touched"]:
            model[n] = Counter(b["staged"][n])
            mains[n] = Counter(b["staged"][n])
            tbl_epoch[n] += 1
            pin_epoch[n] = tbl_epoch[n]
        history.append({n: Counter(c) for n, c in model.items()})
        cat.drop_branch(b["name"])
        branch = None

    def do_drop():
        nonlocal branch
        cat.drop_branch(branch["name"])
        assert all(tables[m].list_branches() == {} for m in names)
        branch = None

    for step in range(20):
        # Deterministic arms 0-9 pin both refusal paths and a guaranteed
        # success; 10-19 are random draws over the full op set.
        if step == 0 or step == 5:
            do_create()
        elif step == 1 or step == 6:
            do_staged_txn()
        elif step == 2:
            do_direct(force_touched=True)  # seed table divergence
        elif step == 7:
            do_plain_txn()  # move catalog main past the fork
        elif step == 3 or step == 8:
            do_publish()  # -> divergence (3) / fast-forward (8) refusal
        elif step == 4 or step == 9:
            do_drop()
        elif branch is None:
            op = rng.choice(["create", "create", "direct", "plain"])
            if op == "create":
                do_create()
            elif op == "direct":
                do_direct()
            else:
                do_plain_txn()
        else:
            op = rng.choice(
                ["staged", "staged", "direct", "plain", "publish", "drop"]
            )
            if op == "staged":
                do_staged_txn()
            elif op == "direct":
                do_direct()
            elif op == "plain":
                do_plain_txn()
            elif op == "publish":
                if branch["commits"] == 0:
                    with pytest.raises(ValueError, match="nothing to publish"):
                        cat.publish_branch(branch["name"])
                    refusals["empty"] += 1
                else:
                    do_publish()
            else:
                do_drop()
        # Step invariant: catalog-main readers see exactly the model
        # (no staged/direct/partially-published leak), branch readers
        # see exactly the staged world.
        for n in names:
            got = Counter((r.k, r.v) for r in cat.read(n).collect())
            assert got == model[n], (step, n, seed, "main leaked")
            if branch is not None:
                gotb = Counter(
                    (r.k, r.v)
                    for r in branch["dev"].read(n).collect()
                )
                assert gotb == branch["staged"][n], (step, n, seed)

    # the schedule must have exercised BOTH refusal paths
    assert refusals["divergence"] >= 1, refusals
    assert refusals["fast_forward"] >= 1, refusals

    # deterministic tail: sync pins, then a clean branch publish SUCCEEDS
    if branch is not None:
        do_drop()
    do_plain_txn()  # absorbs all pending direct rows; pins == mains
    do_create()
    do_staged_txn()
    pre = len(history)
    do_publish()
    assert len(history) == pre + 1, "tail publish must succeed"

    # full time-travel replay against the model
    assert cat.latest_version() == len(history) - 1
    for cv in range(1, len(history)):
        for n in names:
            got = Counter(
                (r.k, r.v)
                for r in cat.read(n, catalog_version=cv).collect()
            )
            assert got == history[cv][n], (cv, n, seed)


class TestExecuteScript:
    def test_script_atomic_and_reads_staged(self, spark, cat):
        """A statement script is ONE atomic unit: DML stages on
        per-txn branches, a later SELECT sees earlier statements'
        staged writes, and one pin swap publishes everything."""
        from datalakeingestionservice_spark.sinks.sql_dml import (
            execute_script,
        )

        v0 = cat.latest_version()
        res = execute_script(
            spark,
            [
                "INSERT INTO a VALUES (100, 1.5)",
                "UPDATE b SET v = 9.0 WHERE k = 0",
                "SELECT count(*) AS n FROM a WHERE k = 100",
                "SELECT v FROM b WHERE k = 0",
            ],
            cat,
        )
        assert res[2][0].n == 1  # staged write visible mid-script
        assert res[3][0].v == 9.0
        assert cat.latest_version() == v0 + 1  # ONE catalog commit
        assert {r.k for r in cat.read("a").collect()} >= {100}
        assert cat.read("b").collect()[0].v == 9.0

    def test_script_failure_rolls_back_everything(self, spark, cat):
        from datalakeingestionservice_spark.sinks.sql_dml import (
            UnsupportedStatementError,
            execute_script,
        )

        v0 = cat.latest_version()
        heads = {
            n: cat.pins()[n]["version"] for n in ("a", "b")
        }
        with pytest.raises(UnsupportedStatementError):
            execute_script(
                spark,
                [
                    "INSERT INTO a VALUES (200, 2.5)",
                    "TRUNCATE TABLE b",  # refused mid-script
                ],
                cat,
            )
        assert cat.latest_version() == v0
        assert {n: cat.pins()[n]["version"] for n in ("a", "b")} == heads
        assert 200 not in {r.k for r in cat.read("a").collect()}
        # staged branches reclaimed: no table branch residue
        from datalakeingestionservice_spark.sinks.versioned import (
            VersionedTable,
        )

        for n in ("a", "b"):
            t = VersionedTable(spark, cat.pins()[n]["root"])
            assert t.list_branches() == {}

    def test_script_refuses_table_set_evolution(self, spark, cat, tmp_path):
        from datalakeingestionservice_spark.sinks.sql_dml import (
            UnsupportedStatementError,
            execute_script,
        )

        v0 = cat.latest_version()
        with pytest.raises(UnsupportedStatementError, match="evolution"):
            execute_script(
                spark,
                [
                    "INSERT INTO a VALUES (300, 3.5)",
                    f"CREATE TABLE x USING VERSIONED LOCATION "
                    f"'{tmp_path / 'x'}' AS SELECT 1 AS a",
                ],
                cat,
            )
        # refused BEFORE any statement ran: no commit, no insert
        assert cat.latest_version() == v0
        assert 300 not in {r.k for r in cat.read("a").collect()}


def test_execute_script_audit_veto_and_pass(spark, cat):
    """The script's WAP audit: the callback sees the staged cross-table
    world and a raise vetoes everything; a passing audit publishes."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_script,
    )

    v0 = cat.latest_version()

    def too_many(txn):
        n = txn.sql("SELECT count(*) AS n FROM a").collect()[0].n
        if n > 3:
            raise ValueError("audit: table a grew past 3 rows")

    with pytest.raises(ValueError, match="audit"):
        execute_script(
            spark,
            ["INSERT INTO a VALUES (400, 4.5)"],  # a has 10 rows: veto
            cat,
            audit=too_many,
        )
    assert cat.latest_version() == v0
    assert 400 not in {r.k for r in cat.read("a").collect()}

    def fine(txn):
        assert txn.sql("SELECT count(*) AS n FROM b").collect()[0].n >= 1

    execute_script(
        spark, ["INSERT INTO b VALUES (401, 4.5)"], cat, audit=fine
    )
    assert 401 in {r.k for r in cat.read("b").collect()}


def test_execute_script_select_row_cap(spark, cat):
    """The driver-side materialization cap (foot-gun guard): a script
    SELECT past `max_result_rows` refuses AND rolls the whole script
    back (no table moved, no catalog commit); at or under the cap the
    rows come through; the probe never collects more than cap+1 rows."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        UnsupportedStatementError,
        execute_script,
    )

    v0 = cat.latest_version()
    with pytest.raises(UnsupportedStatementError, match="max_result_rows|rows"):
        execute_script(
            spark,
            [
                "INSERT INTO a VALUES (500, 5.0)",
                "SELECT * FROM a",  # a holds >3 rows
            ],
            cat,
            max_result_rows=3,
        )
    assert cat.latest_version() == v0  # total rollback
    assert 500 not in {r.k for r in cat.read("a").collect()}

    res = execute_script(
        spark,
        ["SELECT k FROM a ORDER BY k LIMIT 3"],
        cat,
        max_result_rows=3,
    )
    assert len(res[0]) == 3
