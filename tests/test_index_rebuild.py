"""`ALTER SEARCH INDEX ... REBUILD` + the IVF Python twin (r14):
legacy-layout indexes (pre-r13 bucketing / cell partitioning, or
positionless) migrate IN PLACE into the pruned-serving layout —
re-bootstrapped at the index's preserved high-water mark and swapped
atomically, so REBUILD is a layout change, never a freshness change.
Pins: prune facts appear after rebuild, the mark survives, serving
parity holds before/after, a later refresh drains from the same
place, and a mid-flight refresh refuses."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.text import bm25_rank
from datalakeingestionservice_spark.sinks.bm25_index import (
    IncrementalBM25Index,
)
from datalakeingestionservice_spark.sinks.ivf_index import (
    IncrementalIVFIndex,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

DOCS = [
    (i, f"word{i % 13} word{i % 7} shared fox token{i}")
    for i in range(1, 41)
]


@pytest.fixture()
def corpus(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "docs"),
        spark.createDataFrame(DOCS, "doc_id bigint, text string"),
    )


def _pairs(df):
    return [tuple(r) for r in df.collect()]


def _legacy_bm25(spark, tmp_path, corpus):
    return IncrementalBM25Index.create(
        spark,
        str(tmp_path / "idx"),
        corpus.root,
        id_col="doc_id",
        text_col="text",
        buckets=0,
    )


def test_bm25_rebuild_migrates_legacy_layout(spark, tmp_path, corpus):
    idx = _legacy_bm25(spark, tmp_path, corpus)
    # legacy serving: nothing to prune — the whole postings scan
    assert idx.serving_prune_info(["fox"])["n_skipped"] == 0
    corpus.append(
        spark.createDataFrame(
            [(99, "fresh fox facts")], "doc_id bigint, text string"
        )
    )
    corpus.delete_where(F.col("doc_id") == 7)
    idx.refresh()
    hv = idx.last_refreshed_version()

    got = idx.rebuild()
    assert got == hv
    # layout migrated, spec rewritten, mark preserved
    assert idx.buckets == 16
    with open(os.path.join(idx.index_root, "_bm25.json")) as f:
        assert json.load(f)["buckets"] == 16
    assert idx.last_refreshed_version() == hv
    # q202-style prune facts now hold on the migrated index
    info = idx.serving_prune_info(["fox"])
    assert info["n_skipped"] > info["n_scanned"] > 0
    # serving parity, and a reopened handle sees the new layout
    reopened = IncrementalBM25Index.open(spark, idx.index_root)
    assert reopened.buckets == 16
    for handle in (idx, reopened):
        assert _pairs(handle.rank(["fox", "word3"])) == _pairs(
            bm25_rank(corpus.read(), ["fox", "word3"])
        )
    # staging dirs are gone
    assert not os.path.exists(os.path.join(idx.index_root, ".rebuild"))
    assert not os.path.exists(
        os.path.join(idx.index_root, ".rebuild-old")
    )
    # the next refresh drains NEW changes only and stays correct
    corpus.update_where(
        F.col("doc_id") == 3, {"text": F.lit("entirely new fox words")}
    )
    assert idx.refresh() == corpus.latest_version()
    assert _pairs(idx.rank(["fox"])) == _pairs(
        bm25_rank(corpus.read(), ["fox"])
    )


def test_bm25_rebuild_is_not_a_freshness_change(
    spark, tmp_path, corpus
):
    idx = _legacy_bm25(spark, tmp_path, corpus)
    hv = idx.last_refreshed_version()
    # source moves PAST the index; rebuild must NOT pick that up
    corpus.append(
        spark.createDataFrame(
            [(100, "undrained delta")], "doc_id bigint, text string"
        )
    )
    assert idx.rebuild() == hv
    assert idx.last_refreshed_version() == hv
    # the undrained doc is invisible until an explicit refresh
    assert not [
        r for r in idx.rank(["undrained"]).collect()
    ], "rebuild leaked an undrained source change"
    idx.refresh()
    assert [r.doc_id for r in idx.rank(["undrained"]).collect()] == [100]


def test_bm25_rebuild_adds_positions(spark, tmp_path, corpus):
    idx = _legacy_bm25(spark, tmp_path, corpus)
    with pytest.raises(ValueError, match="without positions"):
        idx.rank(["shared"], phrase=["shared", "fox"])
    idx.rebuild(positions=True)
    assert idx.positions is True
    with open(os.path.join(idx.index_root, "_bm25.json")) as f:
        assert json.load(f)["positions"] is True
    got = _pairs(idx.rank(["shared"], phrase=["shared", "fox"]))
    exp = _pairs(
        bm25_rank(corpus.read(), ["shared"], phrase=["shared", "fox"])
    )
    assert got == exp and got


def test_bm25_rebuild_refuses_midflight_refresh(
    spark, tmp_path, corpus
):
    idx = _legacy_bm25(spark, tmp_path, corpus)
    corpus.append(
        spark.createDataFrame(
            [(101, "more fox")], "doc_id bigint, text string"
        )
    )
    # simulate a crash between the three state merges: postings move,
    # terms/stats do not — marks disagree
    source = VersionedTable(spark, corpus.root)
    idx._refresh_postings(source, source.latest_version(), 0)
    with pytest.raises(ValueError, match="mid-flight"):
        idx.rebuild()
    # refresh converges the marks; rebuild then proceeds
    idx.refresh()
    idx.rebuild()
    assert idx.serving_prune_info(["fox"])["n_skipped"] > 0


def _unit(v):
    import math

    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_ivf_rebuild_migrates_legacy_layout(spark, tmp_path):
    import random

    rng = random.Random(7)
    cents = [
        (c, _unit([1.0 if d == c else 0.05 for d in range(4)]))
        for c in range(4)
    ]
    rows = [
        (
            i,
            _unit(
                [
                    b + rng.uniform(-0.02, 0.02)
                    for b in cents[i % 4][1]
                ]
            ),
        )
        for i in range(120)
    ]
    src = VersionedTable.create(
        spark,
        str(tmp_path / "emb"),
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
    )
    centroids = spark.createDataFrame(cents, "cid int, cv array<double>")
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "ivf"), centroids
    )
    # simulate a pre-r13 index: assignment table WITHOUT cell
    # partitioning (what refresh() used to create)
    VersionedTable.create(
        spark,
        idx.index_root,
        idx._assign(src.read()),
        summary={"source_version": src.latest_version()},
    )
    q = spark.createDataFrame(
        [(_unit([1.0, 0.1, 0.05, 0.05]),)], "qv array<double>"
    )
    assert idx.serving_prune_info(q, n_probe=2)["n_skipped"] == 0
    hv = idx.last_refreshed_version()
    before = sorted(_pairs(idx.topk(q, k=5)))

    assert idx.rebuild() == hv
    assert idx.last_refreshed_version() == hv
    info = idx.serving_prune_info(q, n_probe=2)
    assert info["n_scanned"] == 2 and info["n_skipped"] == 2
    assert sorted(_pairs(idx.topk(q, k=5))) == before
    # later refresh drains from the preserved mark
    src.delete_where(F.col("vec_id") < 4)
    assert idx.refresh() == src.latest_version()
    assert not [
        r for r in idx.read().filter(F.col("vec_id") < 4).collect()
    ]
