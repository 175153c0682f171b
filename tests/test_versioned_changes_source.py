"""Streaming change-feed source (sources/versioned_changes.py): table
versions as stream offsets, live appends picked up mid-stream, append-only
contract enforced."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable
from datalakeingestionservice_spark.sources.versioned_changes import (
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _start(spark, root, name, ckpt, **opts):
    reader = spark.readStream.format("versioned_changes").option(
        "table_root", root
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )


def _wait_count(spark, name, n, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c >= n:
            return
        time.sleep(0.5)
    raise TimeoutError(f"memory table {name} never reached {n} rows")


def test_stream_reads_history_and_live_appends(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))

    q = _start(spark, root, "feed1", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed1", 2)
        # A commit landing WHILE the stream runs becomes the next batch.
        t.append(_df(spark, [(3, "c"), (4, "d")]))
        _wait_count(spark, "feed1", 4)
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM feed1").collect()
    got = {(r.id, r.val, r._commit_version) for r in rows}
    assert got == {(1, "a", 1), (2, "b", 2), (3, "c", 3), (4, "d", 3)}


def test_start_version_skips_history(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))

    q = _start(
        spark, root, "feed2", str(tmp_path / "ck"), start_version="1"
    )
    try:
        _wait_count(spark, "feed2", 1)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM feed2").collect()
    assert {(r.id, r._commit_version) for r in rows} == {(2, 2)}


def test_parameterized_types_stream(spark, tmp_path):
    """Regression: `_ddl_field_names` tracked only `<>` depth, so a
    `decimal(10,2)` column split at its comma into a phantom column `2)`
    and every micro-batch died in `pq.read_table(columns=...)`. Any table
    with decimal/varchar(n) — i.e. most real ones — could not stream."""
    from decimal import Decimal

    root = str(tmp_path / "vt")
    rows = [(1, Decimal("10.50"), "a"), (2, Decimal("7.25"), "b")]
    schema = "id bigint, amount decimal(10,2), val string"
    t = VersionedTable.create(spark, root, spark.createDataFrame(rows, schema))

    q = _start(spark, root, "feed_dec", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed_dec", 2)
        t.append(spark.createDataFrame([(3, Decimal("1.00"), "c")], schema))
        _wait_count(spark, "feed_dec", 3)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM feed_dec").collect()
    assert {(r.id, str(r.amount), r.val, r._commit_version) for r in rows} == {
        (1, "10.50", "a", 1),
        (2, "7.25", "b", 1),
        (3, "1.00", "c", 2),
    }


def test_copy_on_write_commit_streams_with_change_types(spark, tmp_path):
    """COW commits stream from their materialized change dirs: the DELETE
    arrives as a feed row with _change_type='delete', a MERGE update as a
    delete+insert pair — full DML history, no snapshot diff."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("id") == 1)
    t.merge(_df(spark, [(2, "B"), (3, "c")]), ["id"])

    q = _start(spark, root, "feed3", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed3", 5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM feed3").collect()
    got = {(r.id, r.val, r._change_type, r._commit_version) for r in rows}
    assert got == {
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (1, "a", "delete", 2),
        (2, "b", "delete", 3),  # merge preimage
        (2, "B", "insert", 3),  # merge postimage
        (3, "c", "insert", 3),
    } - set()  # (5 waited; 6th lands with the same batch)
    assert len(got) == 6


def test_legacy_cow_commit_without_change_files_fails_stream(
    spark, tmp_path
):
    """Tables written before CDF materialization (manifest lacks the
    'cdf' summary key) still fail fast with a pointer at the batch feed."""
    import json

    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("id") == 1)
    # Simulate a legacy manifest: strip the cdf reference from v2.
    mpath = os.path.join(root, "_manifests", "v00000002.json")
    m = json.load(open(mpath))
    m["summary"].pop("cdf", None)
    with open(mpath, "w") as f:
        json.dump(m, f)

    q = _start(spark, root, "feed3b", str(tmp_path / "ck"))
    deadline = time.time() + 90
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive, "stream should fail on a legacy COW commit"
    assert "materialized change files" in str(q.exception())


def test_sink_to_source_chain(spark, tmp_path):
    """Close the loop: a table written by the exactly-once streaming SINK
    is consumed incrementally by this SOURCE — the Delta-style pattern of
    chained incremental pipelines, on our own format."""
    from datalakeingestionservice_spark.streaming.versioned_sink import (
        make_versioned_batch_committer,
    )

    root = str(tmp_path / "vt")
    commit = make_versioned_batch_committer(root, "up")
    commit(_df(spark, [(1, "a")]), 0)
    commit(_df(spark, [(2, "b")]), 1)

    q = _start(spark, root, "feed4", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed4", 2)
        commit(_df(spark, [(3, "c")]), 2)
        _wait_count(spark, "feed4", 3)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM feed4").collect()
    assert {(r.id, r._commit_version) for r in rows} == {
        (1, 1), (2, 2), (3, 3)
    }


def test_schema_evolution_after_stream_start_fails_fast(spark, tmp_path):
    """Columns added to the source while the stream runs must not be
    silently dropped: planning the evolved version raises an explicit
    restart-the-stream error. History BEFORE the pin with a narrower
    schema still serves (missing columns read as None)."""
    from datalakeingestionservice_spark.sources.versioned_changes import (
        VersionedChangesStreamReader,
    )

    root = str(tmp_path / "evo")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.append(
        spark.createDataFrame(
            [(2, "b", 1.5)], "id bigint, val string, extra double"
        ),
        merge_schema=True,
    )
    # Reader pinned AFTER the evolution serves the whole history.
    reader = VersionedChangesStreamReader({"table_root": root})
    parts = reader.partitions({"version": 0}, {"version": t.latest_version()})
    assert len(parts) == 2
    # Evolution AFTER the pin fails the batch with the restart error.
    t.append(
        spark.createDataFrame(
            [(3, "c", 2.5, True)],
            "id bigint, val string, extra double, flag boolean",
        ),
        merge_schema=True,
    )
    with pytest.raises(ValueError, match="restart the stream"):
        reader.partitions({"version": 0}, {"version": t.latest_version()})


def test_backfill_makes_legacy_table_streamable(spark, tmp_path):
    """A table written with materialize_changes=False (or before CDF
    materialization existed) can't stream its COW commits; after
    VersionedTable.materialize_changes() backfills the change files, the
    streaming source serves the FULL history, identical to the batch
    changes() feed."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a"), (2, "b")]),
        materialize_changes=False,
    )
    t.delete_where(F.col("id") == 1)
    t.merge(_df(spark, [(2, "B"), (3, "c")]), ["id"])
    t.append(_df(spark, [(4, "d")]))

    # Before the backfill the stream fails fast on the first COW commit.
    q = _start(spark, root, "feed_bf0", str(tmp_path / "ck0"))
    deadline = time.time() + 90
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive
    assert "materialize_changes" in str(q.exception())

    done = t.materialize_changes()
    assert set(done) == {2, 3}  # delete + merge; append needs no cdf
    # Idempotent: a second pass finds nothing to do.
    assert t.materialize_changes() == {}

    batch = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in t.changes(1).collect()
    }
    q = _start(
        spark, root, "feed_bf", str(tmp_path / "ck1"), start_version="1"
    )
    try:
        _wait_count(spark, "feed_bf", len(batch))
    finally:
        q.stop()
    streamed = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM feed_bf").collect()
    }
    assert streamed == batch
    assert (2, "b", "delete", 3) in streamed  # merge preimage made it


def test_max_versions_per_batch_limits_batch_span(spark, tmp_path):
    """Admission control for backfills: with max_versions_per_batch=2, a
    6-version history drains in micro-batches spanning at most 2 versions
    each, and every row still arrives exactly once."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(0, "v1")]))
    for i in range(1, 6):
        t.append(_df(spark, [(i, f"v{i + 1}")]))

    spans = []
    seen = []

    def on_batch(df, _bid):
        rows = df.collect()
        if rows:
            vs = {r._commit_version for r in rows}
            spans.append(len(vs))
            seen.extend((r.id, r._commit_version) for r in rows)

    q = (
        spark.readStream.format("versioned_changes")
        .option("table_root", root)
        .option("max_versions_per_batch", "2")
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while len(seen) < 6 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(seen) == [(i, i + 1) for i in range(6)]
    assert spans and max(spans) <= 2
    assert len(spans) >= 3  # the 6-version history took >= 3 batches


def test_round5_dml_commits_stream(spark, tmp_path):
    """Deferred deletes and RESTORE stream through their materialized
    change files; constraint add/drop commits are change-free and skip."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    t.delete_where_deferred("id = 1")           # v2: cdf (1 delete)
    t.add_check_constraint("id_pos", "id > 0")  # v3: cdf_empty
    t.restore(1)                                # v4: cdf (delete 2 + ins 1,2)

    q = _start(spark, root, "feed_r5", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed_r5", 6)
    finally:
        q.stop()
    got = {
        (r.id, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM feed_r5").collect()
    }
    assert got == {
        (1, "insert", 1), (2, "insert", 1),
        (1, "delete", 2),
        (2, "delete", 4), (1, "insert", 4), (2, "insert", 4),
    }


def test_mapped_table_streams_logical_columns(spark, tmp_path):
    """A table renamed BEFORE the stream starts serves its whole history
    (physical-named files, logical output) including pre-rename change
    files and hive leaves."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(spark, root, _df(spark, [(1, "a")]))
    t.merge(_df(spark, [(1, "A"), (2, "b")]), ["id"])  # cdf pre-rename
    t.rename_column("val", "label")
    t.append(spark.createDataFrame([(3, "c")], "id bigint, label string"))

    q = _start(spark, root, "feed_map", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed_map", 5)
    finally:
        q.stop()
    got = {
        (r.id, r.label, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM feed_map").collect()
    }
    assert got == {
        (1, "a", "insert", 1),
        (1, "a", "delete", 2),
        (1, "A", "insert", 2),
        (2, "b", "insert", 2),
        (3, "c", "insert", 4),
    }


def test_update_where_commits_stream(spark, tmp_path):
    """An update_where commit streams as its delete(preimage) +
    insert(postimage) pair via the materialized change file — the MERGE
    encoding, so the stream source needs nothing new; a scoped
    triple-form delete streams its TRUE-only matched rows."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    )
    import pyspark.sql.functions as F

    t.update_where([("id", "=", 2)], {"val": F.lit("B")})  # v2
    t.delete_where([("id", "=", 3)])                       # v3

    q = _start(spark, root, "feed_upd", str(tmp_path / "ck"))
    try:
        _wait_count(spark, "feed_upd", 6)
    finally:
        q.stop()
    got = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM feed_upd").collect()
    }
    assert got == {
        (1, "a", "insert", 1), (2, "b", "insert", 1),
        (3, "c", "insert", 1),
        (2, "b", "delete", 2), (2, "B", "insert", 2),
        (3, "c", "delete", 3),
    }


def test_mor_commits_stream_and_backfill(spark, tmp_path):
    """Deferred/MoR DML through the STREAMING feed: with
    materialize_changes on, upsert_deferred / delete_keys_deferred
    commits stream their eager change files like any COW commit; a
    feed-less MoR commit refuses loudly and materialize_changes()
    backfills it via the MoR-aware snapshot diff."""
    root = str(tmp_path / "vt")
    t = VersionedTable.create(
        spark, root, _df(spark, [(1, "a"), (2, "b")]),
        materialize_changes=True,
    )
    t.upsert_deferred(_df(spark, [(1, "A"), (3, "c")]), ["id"])
    t.delete_keys_deferred(spark.createDataFrame([(2,)], "id bigint"))
    batch = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in t.changes(1).collect()
    }
    assert (1, "a", "delete", 2) in batch  # MoR preimage materialized
    assert (2, "b", "delete", 3) in batch
    q = _start(
        spark, root, "feed_mor", str(tmp_path / "ck"), start_version="1"
    )
    try:
        _wait_count(spark, "feed_mor", len(batch))
    finally:
        q.stop()
    streamed = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM feed_mor").collect()
    }
    assert streamed == batch

    # Feed-less MoR commit: stream refuses with the recipe, backfill
    # (MoR-aware read diff) makes it streamable.
    root2 = str(tmp_path / "vt2")
    t2 = VersionedTable.create(
        spark, root2, _df(spark, [(1, "a"), (2, "b")]),
        materialize_changes=False,
    )
    t2.upsert_deferred(_df(spark, [(2, "B")]), ["id"])
    q = _start(spark, root2, "feed_mor0", str(tmp_path / "ck2"))
    deadline = time.time() + 90
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive
    assert "materialize_changes" in str(q.exception())
    assert set(t2.materialize_changes()) == {2}
    got = {
        (r.id, r.val, r._change_type)
        for r in t2.changes(1).collect()
    }
    assert got == {(2, "b", "delete"), (2, "B", "insert")}


def test_scrub_overwrite_delta_replay(spark, tmp_path):
    """Lake-surface curation loop (q171's invariants, pinned small):
    scrub -> DataSource OVERWRITE -> change feed serves ONLY the docs
    the scrub touched (unchanged docs cancel in the snapshot diff), and
    replaying the delta onto v1 reproduces v2 exactly."""
    from collections import Counter

    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )
    import pyspark.sql.functions as F

    register(spark)
    dup = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            ("a", dup + " tail one"),
            ("b", dup + " tail two"),
            ("c", "entirely unique words in this one here now"),
        ],
        "doc_id string, text string",
    )
    root = str(tmp_path / "corpus")
    VersionedTable.create(spark, root, docs)
    corpus = (
        spark.read.format("versioned").option("table_root", root).load()
    )
    scrubbed = exact_substring_scrub(corpus, min_len=12).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    scrubbed.write.format("versioned").mode("overwrite").option(
        "table_root", root
    ).save()
    t = VersionedTable(spark, root)
    delta = t.changes(1).collect()
    # only a and b changed; c cancels in the diff
    assert {r.doc_id for r in delta} == {"a", "b"}
    by_type = Counter(r._change_type for r in delta)
    assert by_type == {"delete": 2, "insert": 2}
    # replay: v1 minus deletes plus inserts == v2, byte for byte
    v1 = Counter((r.doc_id, r.text) for r in t.read(1).collect())
    for r in delta:
        if r._change_type == "delete":
            v1[(r.doc_id, r.text)] -= 1
        else:
            v1[(r.doc_id, r.text)] += 1
    v1 = Counter({k: n for k, n in v1.items() if n})
    v2 = Counter((r.doc_id, r.text) for r in t.read(2).collect())
    assert v1 == v2
