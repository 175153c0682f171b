"""IncrementalIVFIndex: CDC-maintained IVF assignment table.

Pins the two claims that make it an INDEX and not a cache: (1) model
equivalence — after any DML mix, the maintained assignment equals a
full `ivf_assign` recompute over the current source, and probe search
over it equals the same search over the recompute; (2) delta-sized
refresh — an incremental refresh never reads the source table's data
snapshot (only its change feed), so cost is ∝ |Δ|, never corpus size.
"""

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.similarity import ivf_assign
from datalakeingestionservice_spark.sinks.ivf_index import (
    IncrementalIVFIndex,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _vec(seed: int, dim: int = 8) -> list[float]:
    state = seed * 2654435761 % 2**32 + 1
    out = []
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % 2147483648
        out.append(round((state / 2147483648.0) * 2.0 - 1.0, 6))
    return out


@pytest.fixture()
def corpus(spark, tmp_path):
    rows = [(i, _vec(i)) for i in range(40)]
    src = VersionedTable.create(
        spark,
        str(tmp_path / "emb"),
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"),
    )
    centroids = spark.createDataFrame(
        [(i, _vec(1000 + i)) for i in range(4)],
        "cid bigint, cv array<float>",
    )
    return src, centroids


def _snap(df):
    return {
        (r.vec_id, r.cid, round(r.cos_sim, 6)) for r in df.collect()
    }


def test_index_tracks_full_recompute(spark, tmp_path, corpus):
    src, centroids = corpus
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "idx"), centroids
    )
    assert idx.refresh() == 1  # bootstrap

    def recompute():
        return _snap(ivf_assign(src.read(), centroids))

    assert _snap(idx.read()) == recompute()

    # round 1: deletes + inserts
    src.delete_where(F.col("vec_id") % 7 == 3)
    src.append(
        spark.createDataFrame(
            [(100 + i, _vec(500 + i)) for i in range(5)],
            "vec_id bigint, embedding array<float>",
        )
    )
    assert idx.refresh() == 3
    assert _snap(idx.read()) == recompute()

    # round 2: update moves vectors (reassignments must land);
    # insert-then-delete within the window must net to nothing
    src.update_where(
        F.col("vec_id") % 5 == 1,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(
        spark.createDataFrame(
            [(999, _vec(42))], "vec_id bigint, embedding array<float>"
        )
    )
    src.delete_where([("vec_id", "=", 999)])
    assert idx.refresh() == 6
    assert _snap(idx.read()) == recompute()
    assert idx.refresh() is None  # idempotent


def test_incremental_refresh_never_reads_source_snapshot(
    spark, tmp_path, corpus, monkeypatch
):
    """The delta-size pin: after bootstrap, refresh() derives its merge
    input from the CHANGE FEED only — VersionedTable.read is never
    invoked against the source root (the index's own state read for the
    merge is allowed; that's |index|, not |corpus| x rescan)."""
    src, centroids = corpus
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "idx2"), centroids
    )
    idx.refresh()

    src.delete_where(F.col("vec_id") % 11 == 2)
    src.append(
        spark.createDataFrame(
            [(200, _vec(7))], "vec_id bigint, embedding array<float>"
        )
    )

    reads: list[str] = []
    orig = VersionedTable.read

    def spying_read(self, *a, **kw):
        reads.append(self.root)
        return orig(self, *a, **kw)

    monkeypatch.setattr(VersionedTable, "read", spying_read)
    assert idx.refresh() == 3
    assert src.root not in reads, reads


def test_probe_search_matches_recompute_path(spark, tmp_path, corpus):
    """topk over the maintained index == the q89-shaped search over a
    full assignment recompute (same cells, same ranking, same ties)."""
    src, centroids = corpus
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "idx3"), centroids
    )
    idx.refresh()
    src.delete_where(F.col("vec_id") % 7 == 3)
    src.update_where(
        F.col("vec_id") % 5 == 1,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    idx.refresh()

    q = spark.createDataFrame([(_vec(0),)], "qv array<float>")
    got = [
        (r.vec_id, r.cell, r.cos_sim)
        for r in idx.topk(q, k=5, n_probe=2, exclude_ids=[0]).collect()
    ]

    from datalakeingestionservice_spark.operators.similarity import cosine

    assigned = ivf_assign(src.read(), centroids)
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .orderBy(F.desc(cosine("cv", "qv")), F.asc("cid"))
        .limit(2)
        .select("cid")
    )
    expected = [
        (r.vec_id, r.cell, r.cos_sim)
        for r in assigned.join(F.broadcast(probe_cells), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.col("cid").alias("cell"),
            F.round(cosine("embedding", "qv"), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
        .collect()
    ]
    assert got == expected
    assert len(got) == 5


def test_index_continuous_refresh(spark, tmp_path, corpus):
    """The source's change stream keeps the index fresh with no manual
    refresh: DML converges the assignment table automatically."""
    import time

    src, centroids = corpus
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "idx4"), centroids
    )
    idx.refresh()
    q = idx.start_continuous_refresh(str(tmp_path / "ck4"))
    try:
        src.delete_where(F.col("vec_id") % 9 == 4)
        src.append(
            spark.createDataFrame(
                [(300, _vec(33))], "vec_id bigint, embedding array<float>"
            )
        )
        expected = _snap(ivf_assign(src.read(), centroids))
        deadline = time.time() + 90
        got = None
        while time.time() < deadline:
            got = _snap(idx.read())
            if got == expected:
                break
            time.sleep(2)
        assert got == expected
    finally:
        q.stop()
