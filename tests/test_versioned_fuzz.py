"""Model-based fuzz of the versioned table: random commit sequences
(append / merge / delete / overwrite / compact) are mirrored into a plain
in-memory multiset model; after every commit, every snapshot must equal the
model's history, and the change feed applied to snapshot v-1 must
reproduce snapshot v. Catches protocol bugs no single-scenario test can
(stats carried stale across ops, change feed off-by-one, compaction
altering rows, time travel drift)."""

from __future__ import annotations

import random
from collections import Counter

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    ConditionalPutCommitProtocol,
    HardLinkCommitProtocol,
    VersionedTable,
)

ROWS = "id bigint, val string"

#: Both commit primitives must satisfy the identical protocol contract —
#: the whole fuzz matrix runs once per implementation.
PROTOCOLS = [HardLinkCommitProtocol, ConditionalPutCommitProtocol]


def _df(spark, rows):
    return spark.createDataFrame(list(rows), ROWS)


def _snapshot_counter(t, version):
    return Counter(
        (r.id, r.val) for r in t.read(version=version).collect()
    )


def _apply_feed(base: Counter, feed_rows) -> Counter:
    out = Counter(base)
    for r in feed_rows:
        key = (r.id, r.val)
        if r._change_type == "insert":
            out[key] += 1
        else:
            out[key] -= 1
            if out[key] == 0:
                del out[key]
    return out


@pytest.mark.parametrize(
    "spec",
    [None, ["bucket(3, id)"]],
    ids=["flat", "hidden-bucket"],
)
@pytest.mark.parametrize("protocol", PROTOCOLS, ids=lambda p: p.__name__)
@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_commit_sequence_matches_model(
    spark, tmp_path, seed, protocol, spec
):
    rng = random.Random(seed)
    next_id = 100

    def fresh_rows(n):
        nonlocal next_id
        out = [(next_id + i, rng.choice("abcde")) for i in range(n)]
        next_id += n
        return out

    initial = fresh_rows(rng.randint(1, 5))
    t = VersionedTable.create(
        spark,
        str(tmp_path / "vt"),
        _df(spark, initial),
        commit_protocol=protocol(),
        partition_by=spec,
    )
    history = [None, Counter(initial)]  # model per version (1-indexed)
    expired: set[int] = set()  # versions dropped by expire_versions

    for step in range(9):
        model = Counter(history[-1])
        ops = [
            "append", "narrow_append", "merge", "delete", "overwrite",
            "compact", "deferred_delete", "restore",
            "incremental_compact", "writer_append", "update",
            "scoped_delete", "replace_where", "update_deferred",
            "merge_deferred", "delete_keys", "upsert_deferred",
            "branch_publish", "branch_pick",
            "tag_expire", "branch_vacuum",
        ]
        if spec:
            ops.append("dynamic_overwrite")
        # The retention arms run DETERMINISTICALLY mid-sequence (every
        # seed, every protocol, every spec) — tag-pin-blocks-expire and
        # branch-manifest reference counting must be asserted inside
        # every random history, not left to the draw; the other steps
        # stay random.
        if step == 4:
            op = "tag_expire"
        elif step == 7:
            op = "branch_vacuum"
        else:
            op = rng.choice(ops)
        if op == "append":
            rows = fresh_rows(rng.randint(1, 4))
            t.append(_df(spark, rows))
            model.update(rows)
        elif op == "writer_append":
            # The DataSource writer's sessionless zero-copy commit must
            # be indistinguishable from a regular append under the full
            # random history (time travel, change feed, MoR scoping).
            from datalakeingestionservice_spark.sources.versioned_batch import (  # noqa: E501
                register,
            )

            register(spark)
            rows = fresh_rows(rng.randint(1, 4))
            (
                _df(spark, rows)
                .write.format("versioned")
                .mode("append")
                .option("table_root", t.root)
                .save()
            )
            model.update(rows)
        elif op == "narrow_append":
            # Subset-schema append (id only, merge_schema): the missing
            # `val` column must read back as NULL for the new rows and
            # keep its values for every pre-existing row.
            rows = fresh_rows(rng.randint(1, 3))
            t.append(
                spark.createDataFrame(
                    [(i,) for i, _ in rows], "id bigint"
                ),
                merge_schema=True,
            )
            model.update((i, None) for i, _ in rows)
        elif op == "merge":
            # Update some existing ids, insert some fresh ones.
            existing = sorted({k[0] for k in model})
            upd_ids = rng.sample(existing, min(2, len(existing)))
            updates = [(i, rng.choice("xyz")) for i in upd_ids]
            updates += fresh_rows(rng.randint(0, 2))
            t.merge(_df(spark, updates), ["id"])
            for k in [k for k in list(model) if k[0] in upd_ids]:
                del model[k]
            model.update(updates)
        elif op == "delete":
            m = rng.randint(2, 4)
            t.delete_where(F.col("id") % m == 0)
            for k in [k for k in list(model) if k[0] % m == 0]:
                del model[k]
        elif op == "scoped_delete":
            # Triple form: stats-scoped COW delete of an id range —
            # deletes exactly what read(predicates=) selects.
            ids = sorted({k[0] for k in model})
            if not ids:
                rows = fresh_rows(1)
                t.append(_df(spark, rows))
                model.update(rows)
            else:
                lo = rng.choice(ids)
                hi = lo + rng.randint(0, 5)
                t.delete_where([("id", ">=", lo), ("id", "<=", hi)])
                for k in [k for k in list(model) if lo <= k[0] <= hi]:
                    del model[k]
        elif op == "replace_where":
            # Delta replaceWhere: the id range's contents are replaced
            # atomically by the given rows (possibly none — a pure
            # scoped delete); rows must live inside the region.
            ids = sorted({k[0] for k in model})
            if not ids:
                rows = fresh_rows(1)
                t.append(_df(spark, rows))
                model.update(rows)
            else:
                lo = rng.choice(ids)
                hi = lo + rng.randint(0, 3)
                repl = [
                    (i, "R")
                    for i in range(lo, hi + 1)
                    if rng.random() < 0.7
                ]
                t.overwrite_where(
                    _df(spark, repl),
                    [("id", ">=", lo), ("id", "<=", hi)],
                )
                for k in [k for k in list(model) if lo <= k[0] <= hi]:
                    del model[k]
                model.update(repl)
        elif op == "update":
            # COW UPDATE: set val on a random id range (TRUE-only match;
            # NULL vals from narrow appends keep their NULL id rows
            # matched by the id predicate and updated like any other).
            ids = sorted({k[0] for k in model})
            if not ids:
                rows = fresh_rows(1)
                t.append(_df(spark, rows))
                model.update(rows)
            else:
                lo = rng.choice(ids)
                hi = lo + rng.randint(0, 4)
                newval = rng.choice("UVW")
                t.update_where(
                    [("id", ">=", lo), ("id", "<=", hi)],
                    {"val": F.lit(newval)},
                )
                moved = [k for k in list(model) if lo <= k[0] <= hi]
                for k in moved:
                    cnt = model.pop(k)
                    model[(k[0], newval)] += cnt
        elif op == "update_deferred":
            # MoR UPDATE via position deletes: same visible semantics as
            # the COW update (the model can't tell them apart — that IS
            # the invariant), zero data-file rewrite underneath.
            ids = sorted({k[0] for k in model})
            if not ids:
                rows = fresh_rows(1)
                t.append(_df(spark, rows))
                model.update(rows)
            else:
                lo = rng.choice(ids)
                hi = lo + rng.randint(0, 4)
                newval = rng.choice("UVW")
                t.update_where_deferred(
                    [("id", ">=", lo), ("id", "<=", hi)],
                    {"val": F.lit(newval)},
                )
                moved = [k for k in list(model) if lo <= k[0] <= hi]
                for k in moved:
                    cnt = model.pop(k)
                    model[(k[0], newval)] += cnt
        elif op == "merge_deferred":
            # MoR MERGE: matched keys position-deleted, upserts
            # appended — model-identical to the COW merge.
            existing = sorted({k[0] for k in model})
            upd_ids = rng.sample(existing, min(2, len(existing)))
            updates = [(i, rng.choice("xyz")) for i in upd_ids]
            updates += fresh_rows(rng.randint(1, 2))
            t.merge_deferred(_df(spark, updates), ["id"])
            for k in [k for k in list(model) if k[0] in upd_ids]:
                del model[k]
            model.update(updates)
        elif op == "delete_keys":
            # Equality deletes: key VALUES, zero scan; rows present now
            # with those ids vanish (scope = today's entries).
            ids = sorted({k[0] for k in model})
            if not ids:
                rows = fresh_rows(1)
                t.append(_df(spark, rows))
                model.update(rows)
            else:
                pick = rng.sample(ids, min(2, len(ids)))
                t.delete_keys_deferred(
                    spark.createDataFrame(
                        [(i,) for i in pick], "id bigint"
                    )
                )
                for k in [k for k in list(model) if k[0] in pick]:
                    del model[k]
        elif op == "upsert_deferred":
            # Scan-free upsert: eq-delete file + postimage append in
            # one commit — model-identical to merge without deletes.
            existing = sorted({k[0] for k in model})
            upd_ids = rng.sample(existing, min(2, len(existing)))
            updates = [(i, rng.choice("xyz")) for i in upd_ids]
            updates += fresh_rows(rng.randint(1, 2))
            t.upsert_deferred(_df(spark, updates), ["id"])
            for k in [k for k in list(model) if k[0] in upd_ids]:
                del model[k]
            model.update(updates)
        elif op == "dynamic_overwrite":
            # Hidden-bucket dynamic overwrite: every old row whose
            # bucket(3, id) collides with an incoming row's bucket is
            # replaced; the model recomputes buckets with the engine's
            # own Python twin.
            from datalakeingestionservice_spark.sinks.versioned import (
                _transform_py,
            )

            rows = fresh_rows(rng.randint(1, 3))
            t.overwrite_partitions(_df(spark, rows))
            hit = {
                _transform_py("bucket", 3, i, "bigint")
                for i, _ in rows
            }
            for k in [
                k
                for k in list(model)
                if _transform_py("bucket", 3, k[0], "bigint") in hit
            ]:
                del model[k]
            model.update(rows)
        elif op == "branch_publish":
            # WAP under random history: 1-2 commits land on a branch
            # (main's snapshot and model are untouched in between), then
            # ONE squash publish moves main — the published state must
            # equal the branch head, and the feed must replay the NET
            # change. The branch is dropped after; its already-published
            # data dirs stay referenced by main.
            bname = f"fz{len(history)}"
            b = t.create_branch(bname)
            rows = fresh_rows(rng.randint(1, 3))
            b.append(_df(spark, rows))
            staged = Counter(model)
            staged.update(rows)
            if rng.random() < 0.5:
                ids = sorted({k[0] for k in staged})
                lo = rng.choice(ids)
                hi = lo + rng.randint(0, 4)
                newval = rng.choice("UVW")
                b.update_where(
                    [("id", ">=", lo), ("id", "<=", hi)],
                    {"val": F.lit(newval)},
                )
                for k in [k for k in list(staged) if lo <= k[0] <= hi]:
                    cnt = staged.pop(k)
                    staged[(k[0], newval)] += cnt
            assert _snapshot_counter(t, t.latest_version()) == model, (
                "main must not see unpublished branch commits"
            )
            t.publish_branch(bname)
            t.drop_branch(bname)
            model = staged
        elif op == "branch_pick":
            # Selective publish: two appends stage on a branch, only the
            # SECOND is cherry-picked onto main (one main commit); the
            # unpicked rows must never appear in any main snapshot.
            bname = f"fz{len(history)}"
            b = t.create_branch(bname)
            unpicked = fresh_rows(rng.randint(1, 2))
            b.append(_df(spark, unpicked))
            picked = fresh_rows(rng.randint(1, 2))
            b.append(_df(spark, picked))
            t.cherry_pick(bname, b.latest_version())
            t.drop_branch(bname)
            model.update(picked)
        elif op == "overwrite":
            rows = fresh_rows(rng.randint(1, 3))
            t.overwrite(_df(spark, rows))
            model = Counter(rows)
        elif op == "deferred_delete":
            # Merge-on-read: rows PRESENT now that match the predicate
            # vanish; rows appended later stay, even if they match (the
            # predicate is scoped to today's entries) — the model's
            # per-version semantics capture exactly that.
            m = rng.randint(2, 4)
            t.delete_where_deferred(f"id % {m} = 0")
            for k in [k for k in list(model) if k[0] % m == 0]:
                del model[k]
        elif op == "restore":
            # Expired versions are gone: restoring to one must refuse,
            # so the model only ever restores to a SURVIVING version.
            candidates = [
                v for v in range(1, len(history) - 1) if v not in expired
            ]
            if not candidates:
                t.compact(num_partitions=1)
            else:
                target = rng.choice(candidates + [len(history) - 1])
                if target == len(history) - 1:
                    t.compact(num_partitions=1)  # restore-to-self refused
                else:
                    t.restore(target)
                    model = Counter(history[target])
        elif op == "tag_expire":
            # Retention interplay (VERDICT r8 #5): a tag is a retention
            # PIN — expire_versions targeting a tagged version refuses
            # MID-SEQUENCE, nothing is dropped; after drop_tag the same
            # expire succeeds, the expired snapshots are gone, every
            # surviving snapshot still matches its model, and vacuum
            # reclaims the now-unreferenced dirs without touching them.
            live = [m.version for m in t.versions()]
            if len(live) < 2:
                continue  # nothing expirable yet; no commit, no model
            doomed = live[0]
            tname = f"pin{len(history)}"
            t.create_tag(tname, doomed)
            with pytest.raises(ValueError, match="tagged"):
                t.expire_versions(keep_last=len(live) - 1)
            # the refusal dropped NOTHING: the tagged snapshot reads
            assert _snapshot_counter(t, doomed) == history[doomed]
            t.drop_tag(tname)
            assert t.expire_versions(keep_last=len(live) - 1) == [doomed]
            expired.add(doomed)
            t.vacuum()
            assert (
                _snapshot_counter(t, t.latest_version()) == model
            ), "vacuum after expire must not touch referenced data"
            continue  # no commit: history unchanged
        elif op == "branch_vacuum":
            # Branch-manifest reference counting: while a branch lives,
            # vacuum must keep its (branch-only) data dirs; after
            # drop_branch the same vacuum reclaims them — and neither
            # pass may disturb main's snapshots.
            bname = f"vz{len(history)}"
            b = t.create_branch(bname)
            rows = fresh_rows(rng.randint(1, 2))
            b.append(_df(spark, rows))
            staged = Counter(model)
            staged.update(rows)
            t.vacuum()
            assert (
                _snapshot_counter(b, b.latest_version()) == staged
            ), "vacuum must count branch manifests as references"
            assert _snapshot_counter(t, t.latest_version()) == model
            t.drop_branch(bname)
            t.vacuum()
            assert _snapshot_counter(t, t.latest_version()) == model
            continue  # no main commit: history unchanged
        elif op == "incremental_compact":
            v_before = t.latest_version()
            if t.compact(small_entry_max_rows=3) == v_before:
                continue  # no-op: nothing committed, model unchanged
        else:
            t.compact(num_partitions=rng.randint(1, 2))
        history.append(model)

    latest = t.latest_version()
    assert latest == len(history) - 1
    # Every SURVIVING snapshot equals the model at that version (time
    # travel holds through the full random history, including across
    # compactions and expirations); expired versions refuse loudly.
    from datalakeingestionservice_spark.sinks.versioned import (
        NoSuchVersionError,
    )

    for v in range(1, latest + 1):
        if v in expired:
            with pytest.raises(NoSuchVersionError):
                t.read(version=v).collect()
            continue
        assert _snapshot_counter(t, v) == history[v], f"v{v} seed{seed}"
    # Change-feed consistency: feed(v-1 -> v) replays each transition
    # (pairs touching an expired version can no longer be served).
    for v in range(2, latest + 1):
        if v in expired or (v - 1) in expired:
            continue
        feed = t.changes(v - 1, v).collect()
        assert _apply_feed(history[v - 1], feed) == history[v], (
            f"feed v{v - 1}->v{v} seed{seed}"
        )


@pytest.mark.parametrize("protocol", PROTOCOLS, ids=lambda p: p.__name__)
def test_protocol_exactly_one_racing_writer_wins(tmp_path, protocol):
    """The commit-primitive contract, exercised directly and under real
    thread contention: for each claimed path, exactly one publish
    succeeds and every loser gets ConcurrentCommitError."""
    import threading

    from datalakeingestionservice_spark.sinks.versioned import (
        ConcurrentCommitError,
    )

    path = str(tmp_path / "v00000001.json")
    outcomes = []
    lock = threading.Lock()
    barrier = threading.Barrier(8)

    def attempt(i):
        p = protocol()
        barrier.wait()
        try:
            p.publish(path, f'{{"writer": {i}}}')
            result = ("win", i)
        except ConcurrentCommitError:
            result = ("lose", i)
        with lock:
            outcomes.append(result)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    wins = [i for kind, i in outcomes if kind == "win"]
    assert len(wins) == 1, outcomes
    with open(path) as f:
        assert f.read() == f'{{"writer": {wins[0]}}}'


@pytest.mark.parametrize("protocol", PROTOCOLS, ids=lambda p: p.__name__)
def test_protocol_rejects_existing_path_sequentially(tmp_path, protocol):
    from datalakeingestionservice_spark.sinks.versioned import (
        ConcurrentCommitError,
    )

    p = protocol()
    path = str(tmp_path / "v00000002.json")
    p.publish(path, "first")
    with pytest.raises(ConcurrentCommitError):
        p.publish(path, "second")
    with open(path) as f:
        assert f.read() == "first"
