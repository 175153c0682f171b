"""Sharded checkpoints (the Iceberg manifest-LIST shape) — VERDICT r8
item #3, the last O(live-entries) metadata write: a full checkpoint of a
large table stores its ordered entry list as content-addressed
_CHUNK_SIZE-entry slices under `_manifests/chunks/`, rewritten only when
their content changes. Appends extend the tail, so periodic-checkpoint
bytes are proportional to CHANGED slices, not to the table; branch seeds
reuse the shared chunk store; vacuum reclaims unreferenced slices; a
missing referenced slice raises loudly.
"""

from __future__ import annotations

import json
import os

import pytest

import datalakeingestionservice_spark.sinks.versioned as V
from datalakeingestionservice_spark.sinks.versioned import (
    _CHECKPOINT_INTERVAL,
    _CHUNKS_SUBDIR,
    _MANIFEST_DIR,
    VersionedTable,
    _manifest_name,
    load_all_manifests,
    load_manifest_at,
)


@pytest.fixture(autouse=True)
def _small_shards(monkeypatch):
    """Shard aggressively so a ~30-entry test table exercises the
    production shape (default thresholds need 200+ entries)."""
    monkeypatch.setattr(V, "_SHARD_MIN_ENTRIES", 8)
    monkeypatch.setattr(V, "_CHUNK_SIZE", 4)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v double")


def _mfile(root, v):
    return os.path.join(root, _MANIFEST_DIR, _manifest_name(v))


def _raw(root, v):
    with open(_mfile(root, v)) as f:
        return json.load(f)


def _chunk_files(root):
    cdir = os.path.join(root, _MANIFEST_DIR, _CHUNKS_SUBDIR)
    if not os.path.isdir(cdir):
        return set()
    return {n for n in os.listdir(cdir) if n.startswith("c-")}


def test_checkpoint_bytes_proportional_to_changed_slices(spark, tmp_path):
    """THE gate, extended through checkpoint boundaries: the bytes a
    CHECKPOINT writes (skeleton + newly created chunk files) must stay
    flat as the table grows — unchanged slices are never rewritten."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    new_chunks_per_ckpt = {}
    before = _chunk_files(root)
    for i in range(1, 33):  # versions 2..33; checkpoints at 10/20/30
        v = t.append(_df(spark, [(i, float(i))]))
        if v % _CHECKPOINT_INTERVAL == 0:
            after = _chunk_files(root)
            new_chunks_per_ckpt[v] = {
                "new": len(after - before),
                "skeleton": os.path.getsize(_mfile(root, v)),
                "shared": len(after & before),
            }
            before = after
    ck = new_chunks_per_ckpt
    # sharded form in force: no inline entry list at any checkpoint
    for v in (10, 20, 30):
        d = _raw(root, v)
        assert "chunks" in d and "files" not in d, v
    # bytes ∝ change: each checkpoint materializes at most the slices
    # the last interval touched (interval appends / chunk size, +1 for
    # the partial tail), NOT the whole table
    bound = _CHECKPOINT_INTERVAL // 4 + 2
    assert all(c["new"] <= bound for c in ck.values()), ck
    # ...and later checkpoints REUSE earlier ones' slices
    assert ck[20]["shared"] >= 1 and ck[30]["shared"] >= 2, ck
    # the skeleton grows only by chunk NAMES (~bytes), never entries
    assert ck[30]["skeleton"] <= ck[10]["skeleton"] + 1200, ck
    # reconstruction stays exact everywhere, both loaders
    mdir = os.path.join(root, _MANIFEST_DIR)
    forward = {m.version: m for m in load_all_manifests(mdir)}
    for v, fm in forward.items():
        assert load_manifest_at(mdir, v) == fm, v
    assert t.read(10).count() == 10
    assert t.read(25).count() == 25
    assert t.read().count() == 33


def test_sharded_reads_both_surfaces_and_dml(spark, tmp_path):
    """Snapshot reads, time travel, DML, and the sessionless DataSource
    all resolve through chunked checkpoints transparently."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 12):
        t.append(_df(spark, [(i, float(i))]))
    assert "chunks" in _raw(root, 10)
    t.delete_where([("id", "=", 3)])
    got = sorted(
        r.id
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .collect()
    )
    assert got == [i for i in range(12) if i != 3]
    assert t.read(10).count() == 10  # time travel through the shard


def test_branch_seed_reuses_shared_chunks(spark, tmp_path):
    """Branch creation at a checkpointed version writes ZERO new chunk
    files (the seed references main's slices); at a delta head it
    writes at most the changed tail — never O(live entries)."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 11):
        t.append(_df(spark, [(i, float(i))]))
    before = _chunk_files(root)
    b = t.create_branch("at-ckpt", from_version=10)
    assert _chunk_files(root) == before  # full reuse
    bdir = os.path.join(
        root, _MANIFEST_DIR, "branches", "at-ckpt", _manifest_name(10)
    )
    with open(bdir) as f:
        d = json.load(f)
    assert "chunks" in d and "files" not in d
    assert b.read().count() == 10  # v10 = create + appends 1..9
    # a couple more commits, branch from the delta head: only the tail
    # slice differs from the v10 checkpoint
    t.append(_df(spark, [(20, 20.0)]))
    t.append(_df(spark, [(21, 21.0)]))
    before = _chunk_files(root)
    b2 = t.create_branch("at-delta")
    assert len(_chunk_files(root) - before) <= 2
    assert b2.read().count() == 13
    # branch commits keep working; publish round-trips
    b2.append(_df(spark, [(30, 30.0)]))
    t.publish_branch("at-delta")
    assert t.read().count() == 14


def test_vacuum_reclaims_unreferenced_chunks_only(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 23):
        t.append(_df(spark, [(i, float(i))]))
    assert len(_chunk_files(root)) > 0
    # drop everything before v21: the v10/v20 checkpoints vanish, their
    # slices lose their last reference (v21+ are deltas onto v20... so
    # expire materializes v21 as a fresh sharded checkpoint first)
    t.expire_versions(keep_last=3)
    removed = t.vacuum(claim_timeout_s=0)
    assert any(_CHUNKS_SUBDIR in r for r in removed), removed
    # the survivors' slices are untouched: reads stay exact
    t2 = VersionedTable(spark, root)
    assert t2.read().count() == 23
    assert t2.read(21).count() == 21
    # an orphan chunk (crashed writer's write-ahead slice) goes too
    cdir = os.path.join(root, _MANIFEST_DIR, _CHUNKS_SUBDIR)
    orphan = os.path.join(cdir, "c-deadbeefdeadbeef.json")
    with open(orphan, "w") as f:
        f.write('{"files": [], "stats": {}}')
    assert any(
        "c-deadbeefdeadbeef" in r for r in t.vacuum(claim_timeout_s=0)
    )
    # with reclamation disabled, chunks are never touched
    assert t.vacuum(claim_timeout_s=None) == []


def test_missing_referenced_chunk_raises_loudly(spark, tmp_path):
    """A slice referenced by a live checkpoint can only be absent under
    corruption — reads must refuse, never serve a silently shorter
    table."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 11):
        t.append(_df(spark, [(i, float(i))]))
    d = _raw(root, 10)
    victim = os.path.join(
        root, _MANIFEST_DIR, _CHUNKS_SUBDIR, d["chunks"][0]
    )
    os.remove(victim)
    fresh = VersionedTable(spark, root)  # no manifest cache
    with pytest.raises(OSError):
        fresh.read(10).count()


def test_annotation_preserves_sharded_form(spark, tmp_path):
    """materialize_changes annotates a committed version's summary in
    place; on a sharded checkpoint the annotation must keep the chunk
    references (not balloon back to an inline O(table) snapshot)."""
    root = str(tmp_path / "vt")
    VersionedTable.create(
        spark, root, _df(spark, [(0, 0.0)]), materialize_changes=False
    )
    t = VersionedTable(spark, root, materialize_changes=False)
    for i in range(1, 10):
        t.append(_df(spark, [(i, float(i))]))
    t.delete_where([("id", "=", 1)])  # v11... make v10 the delete
    # force the rewrite-bearing commit AT the checkpoint version: v10
    # was the 10th commit above — verify which version is sharded
    sharded = [
        v
        for v in range(1, t.latest_version() + 1)
        if "chunks" in _raw(root, v)
    ]
    assert sharded, "no sharded checkpoint materialized"
    t2 = VersionedTable(spark, root)
    t2.materialize_changes()
    for v in sharded:
        assert "chunks" in _raw(root, v), v
    assert t2.read().count() == 9


def test_chunk_reuse_refreshes_mtime(spark, tmp_path):
    """Reusing an existing content-addressed chunk is a write-ahead
    CLAIM exactly like a fresh write: its mtime must refresh so
    vacuum's age guard covers reused slices too (ADVICE r9 TOCTOU —
    an orphaned chunk being re-adopted must not be reclaimed between
    the existence check and the version claim)."""
    import time

    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 11):
        t.append(_df(spark, [(i, float(i))]))
    cdir = os.path.join(root, _MANIFEST_DIR, _CHUNKS_SUBDIR)
    old = time.time() - 10_000
    for n in os.listdir(cdir):
        os.utime(os.path.join(cdir, n), (old, old))
    # the v20 checkpoint reuses the stable head slices of v10 —
    # reuse must bump their mtimes back under any claim timeout
    for i in range(11, 21):
        t.append(_df(spark, [(i, float(i))]))
    d = _raw(root, 20)
    now = time.time()
    ages = {
        n: now - os.path.getmtime(os.path.join(cdir, n))
        for n in d["chunks"]
    }
    assert all(a < 5_000 for a in ages.values()), ages


def test_default_scope_shards_through_chunk_store(spark, tmp_path):
    """`add_column(default=)` scopes O(live-entries-at-add-time) rels;
    above the shard threshold that list must ride the chunk store —
    written ONCE, referenced by name from every later checkpoint — not
    re-inline in each skeleton/branch seed (ADVICE r9 low)."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, 0.0)]))
    for i in range(1, 9):
        t.append(_df(spark, [(i, float(i))]))
    t.add_column("r", "string", default="'x'")  # v10 = checkpoint
    d = _raw(root, 10)
    spec = d["column_defaults"]["r"]
    assert "entries" not in spec and "entries_chunk" in spec, spec
    cpath = os.path.join(
        root, _MANIFEST_DIR, _CHUNKS_SUBDIR, spec["entries_chunk"]
    )
    assert os.path.exists(cpath)
    # load round-trips the full scope
    mdir = os.path.join(root, _MANIFEST_DIR)
    m = load_manifest_at(mdir, 10)
    assert len(m.column_defaults["r"]["entries"]) == 9
    assert load_all_manifests(mdir)[-1] == m
    # ... and the next checkpoint references the SAME immutable chunk
    for i in range(20, 30):
        t.append(
            spark.createDataFrame(
                [(i, float(i), "y")], "id bigint, v double, r string"
            )
        )
    d20 = _raw(root, 20)
    assert d20["column_defaults"]["r"]["entries_chunk"] == spec[
        "entries_chunk"
    ]
    # both read surfaces serve the default through the sharded scope
    fresh = VersionedTable(spark, root)
    got = {r.id: r.r for r in fresh.read().collect()}
    assert all(got[i] == "x" for i in range(9)), got
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    sl = {
        r.id: r.r
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .collect()
    }
    assert all(sl[i] == "x" for i in range(9)), sl
    # vacuum keeps the referenced scope chunk
    t.vacuum(claim_timeout_s=0)
    assert os.path.exists(cpath)
