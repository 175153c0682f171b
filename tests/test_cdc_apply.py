"""streaming/cdc_apply.py: maintain a replica from a change-feed stream.

The headline invariant: after draining the feed, `replica == source`
EXACTLY, for any DML mix on the source — the packaged form of Delta's
foreachBatch+MERGE CDC idiom, under the append sink's exactly-once
machinery.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.streaming.cdc_apply import (
    make_cdc_apply_committer,
    net_changes,
    start_cdc_apply_stream,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from datalakeingestionservice_spark.sources.versioned_changes import (
        register,
    )

    register(spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _snap(t):
    from collections import Counter

    return Counter(tuple(r) for r in t.read().collect())


def _wait_until(fn, timeout_s=90):
    deadline = time.time() + timeout_s
    last = None
    while time.time() < deadline:
        last = fn()
        if last:
            return
        time.sleep(0.5)
    raise TimeoutError(f"condition never held (last={last})")


def test_net_changes_reduces_to_final_disposition(spark):
    rows = [
        # key 1: inserted v1, updated v2 (delete+insert pair) -> final
        # image is the v2 insert.
        (1, "a", "insert", 1),
        (1, "a", "delete", 2),
        (1, "A", "insert", 2),
        # key 2: inserted v1, deleted v3 -> final disposition delete.
        (2, "b", "insert", 1),
        (2, "b", "delete", 3),
        # key 3: plain insert.
        (3, "c", "insert", 3),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, val string, _change_type string, "
        "_commit_version bigint"
    )
    got = {
        (r.id, r.val, r._cdc_delete)
        for r in net_changes(df, ["id"]).collect()
    }
    assert got == {
        (1, "A", False),
        (2, "b", True),
        (3, "c", False),
    }


def test_committer_is_epoch_idempotent(spark, tmp_path):
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(root, ["id"])
    batch = spark.createDataFrame(
        [(1, "a", "insert", 1), (2, "b", "insert", 1)],
        "id bigint, val string, _change_type string, "
        "_commit_version bigint",
    )
    commit(batch, 0)
    commit(batch, 0)  # replayed epoch: must not double-apply
    t = VersionedTable(spark, root)
    assert t.latest_version() == 1
    assert _snap(t) == {(1, "a"): 1, (2, "b"): 1}
    # Next epoch merges (update + delete + insert in one batch).
    commit(
        spark.createDataFrame(
            [
                (1, "a", "delete", 2),
                (1, "A", "insert", 2),
                (2, "b", "delete", 2),
                (3, "c", "insert", 2),
            ],
            "id bigint, val string, _change_type string, "
            "_commit_version bigint",
        ),
        1,
    )
    assert _snap(t) == {(1, "A"): 1, (3, "c"): 1}


def test_replica_tracks_source_through_dml_mix(spark, tmp_path):
    """The e2e chain: source versioned table -> versioned_changes
    stream -> CDC apply -> replica equals source after EVERY drained
    phase, across append / merge / UPDATE / scoped delete /
    replaceWhere."""
    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ck")
    src = VersionedTable.create(
        spark,
        src_root,
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
        materialize_changes=True,
    )
    feed = (
        spark.readStream.format("versioned_changes")
        .option("table_root", src_root)
        .load()
    )
    q = start_cdc_apply_stream(feed, rep_root, ["id"], ckpt)
    try:
        _wait_until(
            lambda: _try_snap(spark, rep_root) == _snap(src)
        )
        # Phase 2: a mix of every DML shape.
        src.append(_df(spark, [(4, "d")]))
        src.merge(_df(spark, [(2, "B"), (5, "e")]), ["id"])
        src.update_where([("id", "=", 1)], {"val": F.lit("A")})
        src.delete_where([("id", "=", 3)])
        _wait_until(
            lambda: _try_snap(spark, rep_root) == _snap(src)
        )
        # Phase 3: replaceWhere region swap.
        src.overwrite_where(
            _df(spark, [(10, "z")]), [("val", "=", "z")]
        )
        src.overwrite_where(
            _df(spark, [(20, "B")]), [("val", "=", "B")]
        )
        _wait_until(
            lambda: _try_snap(spark, rep_root) == _snap(src)
        )
    finally:
        q.stop()
    assert _snap(VersionedTable(spark, rep_root)) == _snap(src)
    # The replica's history shows one MERGE version per applied epoch,
    # each tagged with its (stream, epoch).
    rep = VersionedTable(spark, rep_root)
    tags = [
        m.summary.get("stream") for m in rep.versions()
    ]
    assert all(s == "cdc" for s in tags)


def _try_snap(spark, root):
    from collections import Counter

    try:
        t = VersionedTable(spark, root)
        return Counter(tuple(r) for r in t.read().collect())
    except Exception:
        return None


def test_epoch_gap_refuses(spark, tmp_path):
    """A forward epoch JUMP (fresh checkpoint against an old marker, or
    a manual driver skipping batches) must fail loudly — silently
    applying would lose the skipped feed batches forever."""
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(root, ["id"])
    batch = spark.createDataFrame(
        [(1, "a", "insert", 1)],
        "id bigint, val string, _change_type string, "
        "_commit_version bigint",
    )
    commit(batch, 0)
    with pytest.raises(ValueError, match="epoch gap"):
        commit(batch, 2)
    # The next sequential epoch still applies.
    commit(batch, 1)
    assert VersionedTable(spark, root).latest_version() == 2


def test_replica_follows_source_type_widening_and_added_column(
    spark, tmp_path
):
    """SCHEMA EVOLUTION e2e: the source widens `n` (int -> bigint) and
    later gains a column mid-run. Each evolution fails the pinned
    stream fast ("restart the stream"); a restarted query re-pins the
    evolved schema, resumes from the checkpoint, and the committer's
    merge(merge_schema=True) evolves the REPLICA in the same commit —
    replica == source again with zero manual steps."""
    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ck")
    src = VersionedTable.create(
        spark,
        src_root,
        spark.createDataFrame([(1, 10), (2, 20)], "id bigint, n int"),
        materialize_changes=True,
    )

    def start():
        feed = (
            spark.readStream.format("versioned_changes")
            .option("table_root", src_root)
            .load()
        )
        return start_cdc_apply_stream(feed, rep_root, ["id"], ckpt)

    q = start()
    try:
        _wait_until(lambda: _try_snap(spark, rep_root) == _snap(src))
        # WIDEN: int -> bigint, with a value only bigint can hold.
        src.append(
            spark.createDataFrame(
                [(3, 3_000_000_000)], "id bigint, n bigint"
            ),
            merge_schema=True,
        )
        _wait_until(lambda: q.exception() is not None)
        assert "restart the stream" in str(q.exception())
    finally:
        q.stop()
    q = start()
    try:
        _wait_until(lambda: _try_snap(spark, rep_root) == _snap(src))
        rep = VersionedTable(spark, rep_root)
        assert "n:bigint" in rep.manifest().schema_ddl
        # ADD a column in a later commit.
        src.append(
            spark.createDataFrame(
                [(4, 40, "x")], "id bigint, n bigint, tag string"
            ),
            merge_schema=True,
        )
        _wait_until(lambda: q.exception() is not None)
    finally:
        q.stop()
    q = start()
    try:
        _wait_until(lambda: _try_snap(spark, rep_root) == _snap(src))
    finally:
        q.stop()
    rep = VersionedTable(spark, rep_root)
    assert "tag:string" in rep.manifest().schema_ddl
    assert _snap(rep) == _snap(src)


def test_rename_shaped_feed_refuses_then_rename_converges(
    spark, tmp_path
):
    """A feed that simultaneously ADDS a column and LACKS one of the
    replica's is a source RENAME in disguise — applying it as evolution
    would fork the replica, so the committer refuses with the recovery
    recipe; `rename_column` on the replica (metadata-only) makes the
    next attempt converge."""
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(root, ["id"])
    commit(
        spark.createDataFrame(
            [(1, "a", "insert", 1)],
            "id bigint, val string, _change_type string, "
            "_commit_version bigint",
        ),
        0,
    )
    renamed = spark.createDataFrame(
        [(2, "b", "insert", 2)],
        "id bigint, label string, _change_type string, "
        "_commit_version bigint",
    )
    with pytest.raises(ValueError, match="RENAME"):
        commit(renamed, 1)
    VersionedTable(spark, root).rename_column("val", "label")
    commit(renamed, 1)
    got = {(r.id, r.label) for r in
           VersionedTable(spark, root).read().collect()}
    assert got == {(1, "a"), (2, "b")}


def test_drop_shaped_feed_refuses_then_drop_converges(spark, tmp_path):
    """A feed that merely LACKS a replica column (the shape a source
    DROP COLUMN produces after stream restart) must refuse loudly: a
    merge_schema apply would null-fill the column on matched keys while
    unmatched keys keep stale values — a silent replica fork. The
    recipe (`drop_column` on the replica) makes the next attempt
    converge. (ADVICE r7 #1.)"""
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(root, ["id"])
    commit(
        spark.createDataFrame(
            [(1, "a", 10, "insert", 1), (2, "b", 20, "insert", 1)],
            "id bigint, val string, extra int, _change_type string, "
            "_commit_version bigint",
        ),
        0,
    )
    dropped = spark.createDataFrame(
        [(1, "A", "insert", 2), (3, "c", "insert", 2)],
        "id bigint, val string, _change_type string, "
        "_commit_version bigint",
    )
    with pytest.raises(ValueError, match="DROP COLUMN"):
        commit(dropped, 1)
    # the refusal left no partial commit
    assert _snap(VersionedTable(spark, root)) == {
        (1, "a", 10): 1, (2, "b", 20): 1,
    }
    VersionedTable(spark, root).drop_column("extra")
    commit(dropped, 1)
    got = {(r.id, r.val) for r in
           VersionedTable(spark, root).read().collect()}
    assert got == {(1, "A"), (2, "b"), (3, "c")}


def test_drop_shaped_feed_refuses_in_mor_mode(spark, tmp_path):
    """Same guard on the upsert_deferred (merge-on-read) path."""
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(
        root, ["id"], mode="upsert_deferred"
    )
    commit(
        spark.createDataFrame(
            [(1, "a", 10, "insert", 1)],
            "id bigint, val string, extra int, _change_type string, "
            "_commit_version bigint",
        ),
        0,
    )
    dropped = spark.createDataFrame(
        [(1, "A", "insert", 2)],
        "id bigint, val string, _change_type string, "
        "_commit_version bigint",
    )
    with pytest.raises(ValueError, match="drop_column"):
        commit(dropped, 1)


def _data_files(root):
    import os

    out = set()
    for dirpath, _d, files in os.walk(os.path.join(root, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                out.add(os.path.join(dirpath, fn))
    return out


def test_mor_committer_scan_free_and_idempotent(spark, tmp_path):
    """mode='upsert_deferred': each netted epoch lands as ONE
    equality-delete file + postimage appends — the replica's existing
    data files are NEVER rewritten (per-epoch cost ∝ |batch|, the
    Flink→Iceberg upsert-mode posture) — under the same epoch
    idempotence as COW merge."""
    root = str(tmp_path / "replica")
    commit = make_cdc_apply_committer(
        root, ["id"], mode="upsert_deferred"
    )
    ddl = (
        "id bigint, val string, _change_type string, "
        "_commit_version bigint"
    )
    commit(
        spark.createDataFrame(
            [(1, "a", "insert", 1), (2, "b", "insert", 1)], ddl
        ),
        0,
    )
    t = VersionedTable(spark, root)
    files_v1 = _data_files(root)
    batch = spark.createDataFrame(
        [
            (1, "a", "delete", 2),
            (1, "A", "insert", 2),  # update pair
            (2, "b", "delete", 2),  # pure delete
            (3, "c", "insert", 2),  # pure insert
        ],
        ddl,
    )
    commit(batch, 1)
    commit(batch, 1)  # replayed epoch: must not double-apply
    assert _snap(t) == {(1, "A"): 1, (3, "c"): 1}
    m = t.manifest()
    assert m.operation == "upsert_deferred"
    assert files_v1 <= _data_files(root)  # zero rewrite
    assert sum(1 for p in m.delete_predicates if "eq" in p) == 1
    # Maintenance converges MoR state without changing the data.
    t.compact_deletes()
    assert _snap(t) == {(1, "A"): 1, (3, "c"): 1}
    # Epoch markers unchanged: a replay after maintenance still no-ops.
    commit(batch, 1)
    assert _snap(t) == {(1, "A"): 1, (3, "c"): 1}


def test_mor_stream_e2e_tracks_source(spark, tmp_path):
    """Live-stream twin of the DML-mix e2e in MoR mode: replica equals
    source after every drained phase, with `upsert_deferred` commits
    and no replica data-file rewrites between maintenance runs."""
    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ck")
    src = VersionedTable.create(
        spark,
        src_root,
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
        materialize_changes=True,
    )
    feed = (
        spark.readStream.format("versioned_changes")
        .option("table_root", src_root)
        .load()
    )
    q = start_cdc_apply_stream(
        feed, rep_root, ["id"], ckpt, mode="upsert_deferred"
    )
    try:
        _wait_until(lambda: _try_snap(spark, rep_root) == _snap(src))
        src.append(_df(spark, [(4, "d")]))
        src.merge(_df(spark, [(2, "B"), (5, "e")]), ["id"])
        src.delete_where([("id", "=", 3)])
        _wait_until(lambda: _try_snap(spark, rep_root) == _snap(src))
    finally:
        q.stop()
    rep = VersionedTable(spark, rep_root)
    assert _snap(rep) == _snap(src)
    ops = {m.operation for m in rep.versions() if m.version > 1}
    assert ops <= {"upsert_deferred"}
    # compact_deletes retires the per-epoch delete files, state intact.
    rep.compact_deletes()
    assert _snap(rep) == _snap(src)
