"""Branches (named refs) + write-audit-publish on the versioned table.

A branch is a SEPARATE manifest chain under `_manifests/branches/<name>/`
seeded with a checkpoint of the branch-point version, sharing the table's
data space: creation is O(one manifest), every DML works on the branch
handle unchanged, main never sees branch commits, `publish_branch` is one
atomic squash commit through the version-claim protocol (divergence can
only refuse, never half-apply), and `cherry_pick` applies a single
file-delta commit selectively. Iceberg branch / Nessie ref / Delta
shallow-clone-WAP territory, built on the engine's own commit protocol.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    BranchExistsError,
    ConcurrentCommitError,
    ConstraintViolationError,
    NoSuchBranchError,
    VersionedTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, g string, v double")


@pytest.fixture()
def t(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(10)]),
    )


def _data_dirs(t):
    return set(os.listdir(os.path.join(t.root, "data")))


def test_branch_isolation_and_publish(spark, t):
    b = t.create_branch("audit")
    b.append(_df(spark, [(100, "x", 1.0), (101, "x", 2.0)]))
    # isolation both ways
    assert t.read().count() == 10
    assert b.read().count() == 12
    assert t.latest_version() == 1 and b.latest_version() == 2
    # branch handles report their ref
    assert b.branch_name == "audit" and t.branch_name is None
    assert t.list_branches() == {"audit": {"head": 2, "base": 1}}
    v = t.publish_branch("audit")
    assert v == 2
    m = t.manifest()
    assert m.operation == "publish_branch"
    assert m.summary["branch"] == "audit"
    assert m.summary["squashed_operations"] == ["append"]
    assert t.read().count() == 12
    # the feed across the publish is the branch's net effect
    got = sorted((r.k, r._change_type) for r in t.changes(1, 2).collect())
    assert got == [(100, "insert"), (101, "insert")]
    # branch ref survives publish; drop is explicit
    t.drop_branch("audit")
    assert t.list_branches() == {}


def test_branch_multi_commit_squash(spark, t):
    """Several branch commits (including COW DML) publish as ONE main
    commit whose state equals the branch head exactly."""
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))
    b.update_where([("k", "=", 100)], {"v": "42.0"})
    b.delete_where([("k", "=", 0)])
    head_rows = {(r.k, r.v) for r in b.read().collect()}
    v = t.publish_branch("wip")
    assert v == 2
    assert {(r.k, r.v) for r in t.read().collect()} == head_rows
    assert t.manifest().summary["squashed_operations"] == [
        "append",
        "update",
        "delete",
    ]
    # squash-of-many carries no cdf marker; the feed falls back to the
    # snapshot diff and still reports the NET change
    ch = {(r.k, r._change_type) for r in t.changes(1, 2).collect()}
    assert (100, "insert") in ch and (0, "delete") in ch
    assert (100, "delete") not in ch  # intermediate v=1.0 never visible


def test_publish_divergence_refuses(spark, t):
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))
    t.append(_df(spark, [(200, "y", 2.0)]))  # main moves past the fork
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        t.publish_branch("wip")
    assert t.read().filter("k = 100").count() == 0  # nothing half-applied
    # empty branch has nothing to publish
    t.create_branch("empty")
    with pytest.raises(ValueError, match="nothing to publish"):
        t.publish_branch("empty")


def test_write_audit_publish_cycle(spark, tmp_path):
    """The WAP loop: a bad batch dies on the branch (constraint caught at
    branch-append time, main readers never see it); the good batch
    audits green and publishes atomically."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(1, "a", 1.0)]),
        check_constraints={"v_pos": "v > 0"},
    )
    bad = t.create_branch("staging")
    with pytest.raises(ConstraintViolationError):
        bad.append(_df(spark, [(2, "b", -5.0)]))
    assert t.read().count() == 1 and bad.read().count() == 1
    t.drop_branch("staging")
    good = t.create_branch("staging")
    good.append(_df(spark, [(2, "b", 5.0)]))
    # audit: any query over the branch handle
    assert good.read().agg(F.min("v")).collect()[0][0] > 0
    t.publish_branch("staging")
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_cherry_pick_selective(spark, t):
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))  # v2: not picked
    b.append(_df(spark, [(200, "y", 2.0)]))  # v3: picked
    v = t.cherry_pick("wip", 3)
    assert v == 2 and t.manifest().operation == "cherry_pick"
    assert {r.k for r in t.read().filter("k >= 100").collect()} == {200}
    # picked entry's stats came along: an equality read on k prunes
    info = t.prune_info([("k", "=", 200)])
    assert info["n_skipped"] > 0 and info["n_scanned"] >= 1
    # the branch commit's materialized feed serves the main commit too
    got = sorted((r.k, r._change_type) for r in t.changes(1, 2).collect())
    assert got == [(200, "insert")]


def test_cherry_pick_refusals(spark, t):
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))  # v2 file-delta
    b.rename_column("g", "grp")  # v3 schema change
    b.delete_where([("k", "=", 100)])  # v4 rewrites v2's entry
    with pytest.raises(ValueError, match="column mapping|schema"):
        t.cherry_pick("wip", 3)
    with pytest.raises(ValueError, match="branch base"):
        t.cherry_pick("wip", 1)
    # v4 removes an entry that was never on main
    with pytest.raises(ConcurrentCommitError, match="no longer live"):
        t.cherry_pick("wip", 4)
    # picking v2 twice: second apply clashes on the added entry
    t.cherry_pick("wip", 2)
    with pytest.raises(ConcurrentCommitError, match="already live"):
        t.cherry_pick("wip", 2)


def test_branch_time_travel_and_restore(spark, t):
    t.append(_df(spark, [(50, "m", 5.0)]))  # main v2
    b = t.create_branch("wip", from_version=1)  # fork BELOW main head
    b.append(_df(spark, [(100, "x", 1.0)]))
    assert b.read(1).count() == 10  # base checkpoint readable
    assert b.read().count() == 11  # fork excludes main v2
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("wip")  # main moved past the v1 fork point
    # restore ON the branch is branch-local
    b.restore(1)
    assert b.read().count() == 10
    assert t.read().count() == 11  # main: 10 + (50)


def test_vacuum_protects_branches(spark, t):
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))
    before = _data_dirs(t)
    assert t.vacuum(claim_timeout_s=None) == []
    assert _data_dirs(t) == before
    assert b.read().count() == 11  # branch still serves after vacuum
    t.drop_branch("wip")
    removed = t.vacuum(claim_timeout_s=None)
    assert len(removed) == 1  # the branch-only data dir is now an orphan
    assert t.read().count() == 10


def test_branch_handle_guardrails(spark, t):
    b = t.create_branch("wip")
    with pytest.raises(ValueError, match="MAIN"):
        b.vacuum()
    with pytest.raises(ValueError, match="MAIN"):
        b.create_branch("nested")
    with pytest.raises(ValueError, match="MAIN"):
        b.drop_branch("wip")
    with pytest.raises(ValueError, match="MAIN"):
        b.publish_branch("wip")
    with pytest.raises(NoSuchBranchError):
        t.branch("nope")
    with pytest.raises(BranchExistsError):
        t.create_branch("wip")
    with pytest.raises(ValueError, match="name"):
        t.create_branch("bad/name")


def test_branch_datasource_read(spark, t):
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    b = t.create_branch("wip")
    b.append(_df(spark, [(100, "x", 1.0)]))
    def reader():
        return spark.read.format("versioned").option("table_root", t.root)

    assert reader().option("branch", "wip").load().count() == 11
    assert reader().load().count() == 10  # main unaffected
    assert (
        reader()
        .option("branch", "wip")
        .option("version", "1")
        .load()
        .count()
        == 10
    )
    with pytest.raises(Exception, match="no branch"):
        reader().option("branch", "zz").load().count()
    # ADVICE r8: branch + tag refuse (a tag names a MAIN version —
    # resolving its number inside the branch chain could serve silent
    # wrong data); matches the SQL front door's one-of grammar
    t.create_tag("rel", 1)
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            reader()
            .option("branch", "wip")
            .option("tag", "rel")
            .load()
            .count()
        )


def test_branch_sql_statements(spark, t):
    """The whole WAP lifecycle as SQL text: CREATE BRANCH, branch
    reads (`FROM t BRANCH 'name'`, version pins, joins against main),
    PUBLISH BRANCH, DROP BRANCH."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        UnsupportedStatementError,
        execute_select,
        execute_sql,
    )

    tables = {"t": t}
    assert execute_sql(
        spark, "ALTER TABLE t CREATE BRANCH staging", tables
    ) == 1
    b = t.branch("staging")
    b.append(_df(spark, [(100, "x", 1.0)]))
    n_b = execute_select(
        spark, "SELECT count(*) AS n FROM t BRANCH 'staging'", tables
    ).collect()[0].n
    n_m = execute_select(
        spark, "SELECT count(*) AS n FROM t", tables
    ).collect()[0].n
    assert (n_b, n_m) == (11, 10)
    # branch + version pin, and a branch-vs-main anti-join
    assert (
        execute_select(
            spark,
            "SELECT count(*) AS n FROM t BRANCH 'staging' "
            "VERSION AS OF 1",
            tables,
        ).collect()[0].n
        == 10
    )
    only = execute_select(
        spark,
        "SELECT b.k FROM t BRANCH 'staging' AS b "
        "LEFT ANTI JOIN t ON b.k = t.k",
        tables,
    ).collect()
    assert [r.k for r in only] == [100]
    assert execute_sql(
        spark, "ALTER TABLE t PUBLISH BRANCH staging", tables
    ) == 2
    assert t.read().count() == 11
    execute_sql(spark, "ALTER TABLE t DROP BRANCH staging", tables)
    assert t.list_branches() == {}
    # refusal shapes
    with pytest.raises(UnsupportedStatementError, match="BRANCH"):
        execute_sql(spark, "ALTER TABLE t CREATE BRANCH a/b", tables)
    with pytest.raises(NoSuchBranchError):
        execute_select(
            spark, "SELECT * FROM t BRANCH 'zzz'", tables
        )
    # AS OF VERSION pins the fork point
    execute_sql(
        spark, "ALTER TABLE t CREATE BRANCH old AS OF VERSION 1", tables
    )
    assert (
        execute_select(
            spark, "SELECT count(*) AS n FROM t BRANCH 'old'", tables
        ).collect()[0].n
        == 10
    )


def test_racing_publishes_exactly_one_wins(spark, t):
    """Two branches fork at the same base; both try to fast-forward.
    The version claim on base+1 serializes them: exactly one publish
    commits, the loser refuses with ConcurrentCommitError, and main's
    state is exactly the winner's branch head — never a mix."""
    import threading

    for name, key in (("left", 100), ("right", 200)):
        b = t.create_branch(name)
        b.append(_df(spark, [(key, "x", float(key))]))
    outcomes = {}
    barrier = threading.Barrier(2)

    def attempt(name):
        barrier.wait()
        try:
            outcomes[name] = ("win", t.publish_branch(name))
        except ConcurrentCommitError:
            outcomes[name] = ("lose", None)

    threads = [
        threading.Thread(target=attempt, args=(n,))
        for n in ("left", "right")
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    kinds = sorted(k for k, _ in outcomes.values())
    assert kinds == ["lose", "win"], outcomes
    winner = next(n for n, (k, _) in outcomes.items() if k == "win")
    winner_key = 100 if winner == "left" else 200
    loser_key = 300 - winner_key
    got = {r.k for r in t.read().filter("k >= 100").collect()}
    assert got == {winner_key}, (winner, got)
    assert t.read().filter(f"k = {loser_key}").count() == 0


def test_tags_lifecycle(spark, t):
    """Immutable named refs: create/resolve/read via every surface,
    retention pinning, and the refusal matrix (re-tag, unknown,
    branch-handle admin)."""
    from datalakeingestionservice_spark.sinks.versioned import (
        NoSuchTagError,
        TagExistsError,
    )
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    t.append(_df(spark, [(100, "x", 1.0)]))  # v2
    tables = {"t": t}
    assert execute_sql(
        spark, "ALTER TABLE t CREATE TAG rel-1 AS OF VERSION 1", tables
    ) == 1
    t.create_tag("head")  # defaults to latest (v2)
    assert t.list_tags() == {"head": 2, "rel-1": 1}
    t.append(_df(spark, [(200, "y", 2.0)]))  # v3
    # all three read surfaces resolve the tag
    assert t.read(t.tag_version("rel-1")).count() == 10
    assert (
        execute_select(
            spark, "SELECT count(*) AS n FROM t TAG 'rel-1'", tables
        ).collect()[0].n
        == 10
    )
    assert (
        spark.read.format("versioned")
        .option("table_root", t.root)
        .option("tag", "rel-1")
        .load()
        .count()
        == 10
    )
    # a tagged version is a retention pin
    with pytest.raises(ValueError, match="tagged version"):
        t.expire_versions(keep_last=1)
    # immutable: re-tagging refuses
    with pytest.raises(TagExistsError):
        t.create_tag("rel-1", version=3)
    execute_sql(spark, "ALTER TABLE t DROP TAG rel-1", tables)
    t.drop_tag("head")
    assert t.expire_versions(keep_last=1) == [1, 2]
    with pytest.raises(NoSuchTagError):
        t.tag_version("rel-1")
    with pytest.raises(ValueError, match="MAIN"):
        t.create_branch("b1").create_tag("x")


def test_datasource_writer_refuses_branch_target(spark, t):
    """A 'branch write' silently landing on main would be the exact
    wrong-target hazard refs exist to prevent — the sessionless writer
    refuses branch/tag options loudly."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    df = _df(spark, [(999, "z", 9.0)])
    with pytest.raises(Exception, match="MAIN only"):
        (
            df.write.format("versioned")
            .mode("append")
            .option("table_root", t.root)
            .option("branch", "wip")
            .save()
        )
    assert t.read().filter("k = 999").count() == 0
