"""Maintained-index SERVING must prune like an index, not scan like a
table (VERDICT r12 #1): the BM25 postings/terms tables are laid out
`bucket(N, term)` and the IVF assignment identity-partitioned by cell,
so a SEARCH / probe query derives LEAF pruning from its term list /
probed cells at plan time — query cost ∝ terms·(index/buckets) and
∝ probed cells, never index size. Results must stay byte-identical to
the unpruned scan + filter (pruning is never load-bearing for
correctness), including for legacy unpartitioned indexes.

Also pins the `("col", "in", [..])` predicate op these serving paths
plan with: a disjunction of equalities that prunes an entry only when
EVERY value is refuted (partition dirs, bloom filters, footer stats,
and transform-derived bucket aliases all participate).
"""

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


# -- the "in" predicate op ----------------------------------------------------
def _mk_bucketed(spark, root, n=200, buckets=8):
    rows = [(i, f"k{i % 40}", i * 10) for i in range(n)]
    return VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(rows, "id bigint, k string, v bigint"),
        partition_by=[f"bucket({buckets}, k)"],
    )


def test_in_predicate_equals_filter_and_prunes(spark, tmp_path):
    t = _mk_bucketed(spark, str(tmp_path / "t"))
    vals = ["k3", "k17"]
    got = sorted(
        (r.id, r.k, r.v)
        for r in t.read(predicates=[("k", "in", vals)]).collect()
    )
    exp = sorted(
        (r.id, r.k, r.v)
        for r in t.read().filter(F.col("k").isin(vals)).collect()
    )
    assert got == exp and len(got) == 10
    info = t.prune_info([("k", "in", vals)])
    # ≤8 bucket leaves; 2 values hash to at most 2 of them
    assert info["n_scanned"] <= 2
    assert info["n_skipped"] >= 5


def test_in_predicate_empty_list_matches_nothing(spark, tmp_path):
    t = _mk_bucketed(spark, str(tmp_path / "e"), n=40)
    assert t.read(predicates=[("k", "in", [])]).count() == 0
    info = t.prune_info([("k", "in", [])])
    assert info["n_scanned"] == 0  # IN () provably matches no row


def test_in_predicate_on_bloom_column(spark, tmp_path):
    rows = [(i, i * 3) for i in range(100)]
    t = VersionedTable.create(
        spark,
        str(tmp_path / "b"),
        spark.createDataFrame(rows, "id bigint, v bigint"),
        bloom_columns=["id"],
    )
    # values provably absent: the bloom refutes every one -> skipped
    info = t.prune_info([("id", "in", [100000, 100001])])
    assert info["n_scanned"] == 0
    # one present value keeps the entry (disjunction semantics)
    info = t.prune_info([("id", "in", [100000, 7])])
    assert info["n_scanned"] >= 1
    got = sorted(
        r.id for r in t.read(predicates=[("id", "in", [7, 9])]).collect()
    )
    assert got == [7, 9]


# -- BM25 serving pruning -----------------------------------------------------
DOCS = [
    (i, txt)
    for i, txt in enumerate(
        [
            "the quick brown fox jumps over the lazy dog",
            "a quick brown dog chases a slow red fox",
            "lazy rivers and lazy days in the summer sun",
            "spark engines shuffle partitions across executors",
            "postings lists and document frequencies for ranking",
            "vectors centroids and cells for nearest neighbors",
            "red sun over brown hills and quiet rivers",
            "executors spill to disk when partitions exceed memory",
            "ranking functions score documents against query terms",
            "neighbors in the same cell share a coarse centroid",
        ],
        start=1,
    )
]


@pytest.fixture()
def corpus(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "docs"),
        spark.createDataFrame(DOCS, "doc_id bigint, text string"),
    )


def _pairs(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_bm25_search_prunes_to_term_buckets(spark, tmp_path, corpus):
    idx = IncrementalBM25Index.create(
        spark,
        str(tmp_path / "idx"),
        corpus.root,
        id_col="doc_id",
        text_col="text",
        buckets=16,
    )
    # serving parity first: pruned read == full recompute
    for terms in (["fox"], ["lazy", "sun"], ["partitions", "ranking"]):
        assert _pairs(idx.rank(terms)) == _pairs(
            bm25_rank(corpus.read(), terms)
        )
    # plan-time evidence: a 1-term SEARCH scans only its bucket's
    # leaves; the rest of the postings are skipped BEFORE the scan
    info = idx.serving_prune_info(["fox"])
    assert info["n_scanned"] <= 2
    assert info["n_skipped"] >= 8
    assert info["n_scanned"] + info["n_skipped"] >= 10
    # 3 terms scan at most 3 buckets' leaves
    info3 = idx.serving_prune_info(["fox", "lazy", "partitions"])
    assert info3["n_scanned"] <= 3
    assert info3["n_skipped"] >= 6


def test_bm25_pruning_survives_incremental_refresh(
    spark, tmp_path, corpus
):
    idx = IncrementalBM25Index.create(
        spark,
        str(tmp_path / "idx"),
        corpus.root,
        id_col="doc_id",
        text_col="text",
        buckets=16,
    )
    corpus.append(
        spark.createDataFrame(
            [(11, "fresh fox facts for the index")],
            "doc_id bigint, text string",
        )
    )
    corpus.update_where(
        F.col("doc_id") == 3, {"text": F.lit("lazy fox everywhere")}
    )
    corpus.delete_where(F.col("doc_id") == 7)
    idx.refresh()
    for terms in (["fox"], ["lazy", "rivers"], ["fox", "facts"]):
        assert _pairs(idx.rank(terms)) == _pairs(
            bm25_rank(corpus.read(), terms)
        )
    # merge commits keep the bucket layout: still leaf-pruned
    info = idx.serving_prune_info(["fox"])
    assert info["n_skipped"] >= info["n_scanned"]
    assert info["n_skipped"] >= 5


def test_bm25_legacy_unpartitioned_index_still_serves(
    spark, tmp_path, corpus
):
    # indexes created before bucketing (spec file without "buckets")
    # open as buckets=0 and keep exact serving parity — pruning is an
    # optimization, never a correctness dependency
    root = str(tmp_path / "idx0")
    idx = IncrementalBM25Index.create(
        spark,
        root,
        corpus.root,
        id_col="doc_id",
        text_col="text",
        buckets=0,
    )
    spec_path = os.path.join(root, "_bm25.json")
    with open(spec_path) as f:
        spec = json.load(f)
    assert spec["buckets"] == 0
    del spec["buckets"]  # simulate a pre-bucketing spec file
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    reopened = IncrementalBM25Index.open(spark, root)
    assert reopened.buckets == 0
    assert _pairs(reopened.rank(["fox", "lazy"])) == _pairs(
        bm25_rank(corpus.read(), ["fox", "lazy"])
    )


def test_create_search_index_buckets_clause(spark, tmp_path, corpus):
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    tables = {"documents": corpus}
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX ft ON documents (doc_id, text) "
        f"LOCATION '{tmp_path / 'ft'}' BUCKETS 8",
        tables,
    )
    idx = tables["ft"]
    assert idx.buckets == 8
    hits = execute_sql(spark, "SEARCH ft FOR 'fox lazy' TOP 5", tables)
    assert _pairs(hits) == _pairs(
        bm25_rank(corpus.read(), ["fox", "lazy"], top_k=5)
    )
    desc = execute_sql(spark, "DESCRIBE SEARCH INDEX ft", tables)
    row = desc.collect()[0]
    assert row.buckets == 8
    info = idx.serving_prune_info(["fox"])
    assert info["n_skipped"] >= 1


# -- IVF serving pruning ------------------------------------------------------
def _unit(v):
    import math

    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_ivf_topk_prunes_to_probed_cells(spark, tmp_path):
    import random

    rng = random.Random(13)
    cents = [
        (c, _unit([1.0 if d == c else 0.05 for d in range(4)]))
        for c in range(4)
    ]
    rows = []
    for i in range(160):
        c = i % 4
        base = cents[c][1]
        rows.append(
            (
                i,
                _unit(
                    [b + rng.uniform(-0.02, 0.02) for b in base]
                ),
            )
        )
    src = VersionedTable.create(
        spark,
        str(tmp_path / "emb"),
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
    )
    centroids = spark.createDataFrame(
        cents, "cid int, cv array<double>"
    )
    idx = IncrementalIVFIndex(
        spark, src.root, str(tmp_path / "ivf"), centroids
    )
    idx.refresh()
    q = spark.createDataFrame(
        [(_unit([1.0, 0.1, 0.05, 0.05]),)], "qv array<double>"
    )
    # plan-time evidence: 2 probed cells -> 2 leaves scanned, 2 skipped
    info = idx.serving_prune_info(q, n_probe=2)
    assert info["n_scanned"] == 2
    assert info["n_skipped"] == 2
    # parity: pruned probe == filtering the full assignment scan
    got = [(r.vec_id, r.cell, r.cos_sim) for r in idx.topk(q, k=5).collect()]
    full = idx.read()
    from datalakeingestionservice_spark.operators.similarity import cosine

    cells = idx._probe_cells(q, 2, "qv")
    exp = [
        (r.vec_id, r.cid, r.cos_sim)
        for r in (
            full.filter(F.col("cid").isin(cells))
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                "cid",
                F.round(cosine("embedding", "qv"), 4).alias("cos_sim"),
            )
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(5)
            .collect()
        )
    ]
    assert got == exp
    # incremental refresh keeps the layout: merge, re-check pruning
    src.append(
        spark.createDataFrame(
            [(1000, _unit([0.9, 0.2, 0.1, 0.1]))],
            "vec_id bigint, embedding array<double>",
        )
    )
    idx.refresh()
    info2 = idx.serving_prune_info(q, n_probe=1)
    assert info2["n_skipped"] >= info2["n_scanned"]
    # post-merge parity: pruned probe == full-scan filter, and the
    # appended vector is in the maintained cell-0 state it probes
    cells1 = idx._probe_cells(q, 1, "qv")
    got2 = [r.vec_id for r in idx.topk(q, k=200, n_probe=1).collect()]
    exp2 = [
        r.vec_id
        for r in idx.read()
        .filter(F.col("cid").isin(cells1))
        .select("vec_id")
        .collect()
    ]
    assert sorted(got2) == sorted(exp2)
    assert 1000 in got2
