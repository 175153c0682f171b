"""Incremental BM25 index (sinks/bm25_index.py): maintained-index
ranking must equal the full-recompute ranker through inserts, updates
(term sets changing), deletes, and crash-interrupted refreshes — and
an incremental refresh must never read the source snapshot (only its
change feed), so cost is ∝ |Δ|, never corpus size."""

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.text import (
    bm25_rank,
    bm25_tokens,
)
from datalakeingestionservice_spark.sinks.bm25_index import (
    IncrementalBM25Index,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog"),
    (3, "lazy rivers and lazy days in the sun"),
    (4, "FOX! Fox? fox... and more Fox"),
    (5, ""),  # zero-token doc: counts in N, holds no postings
    (6, "completely unrelated words about spark engines"),
    (7, "dogs and foxes are not the same as dog and fox"),
]


@pytest.fixture()
def corpus(spark, tmp_path):
    return VersionedTable.create(
        spark,
        str(tmp_path / "docs"),
        spark.createDataFrame(DOCS, "doc_id bigint, text string"),
    )


def _rank_pairs(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _assert_matches_recompute(idx, src, terms, **kw):
    got = _rank_pairs(idx.rank(terms, **kw))
    exp = _rank_pairs(bm25_rank(src.read(), terms, **kw))
    assert got == exp, (terms, kw, got, exp)


def test_bootstrap_matches_recompute(spark, tmp_path, corpus):
    idx = IncrementalBM25Index(
        spark, corpus.root, str(tmp_path / "idx")
    )
    assert idx.refresh() == 1
    for terms in (["fox"], ["quick", "fox"], ["lazy", "dog", "spark"]):
        _assert_matches_recompute(idx, corpus, terms)
    _assert_matches_recompute(
        idx, corpus, ["lazy", "dog"], require_all=True
    )
    # absent term contributes nothing, exactly like the recompute
    _assert_matches_recompute(idx, corpus, ["fox", "zebra"])
    assert idx.rank(["zebra"]).count() == 0


def test_dml_tracks_recompute(spark, tmp_path, corpus):
    idx = IncrementalBM25Index(
        spark, corpus.root, str(tmp_path / "idx")
    )
    idx.refresh()
    # insert (new terms + df bumps), update REPLACING the term set
    # (old postings must unwind from the old text carried by the
    # feed), update to EMPTY (dl -> 0, all postings leave, N stays),
    # delete (df decrements; terms hitting df=0 leave)
    corpus.append(
        spark.createDataFrame(
            [(8, "fox and dog together again")],
            "doc_id bigint, text string",
        )
    )
    corpus.update_where(
        F.col("doc_id") == 3, {"text": F.lit("lazy fox everywhere")}
    )
    corpus.update_where(F.col("doc_id") == 4, {"text": F.lit("")})
    corpus.delete_where(F.col("doc_id") == 6)
    assert idx.refresh() == corpus.latest_version()
    for terms in (
        ["quick", "fox"],
        ["lazy", "dog", "spark"],
        ["engines"],  # only doc 6 had it: df hit 0
        ["fox", "dog"],
    ):
        _assert_matches_recompute(idx, corpus, terms)
    _assert_matches_recompute(
        idx, corpus, ["fox", "dog"], require_all=True
    )
    # maintained term stats == recompute
    got = sorted(
        (r.term, r.df)
        for r in VersionedTable(spark, idx.terms_root).read().collect()
    )
    exp = sorted(
        (r.term, r.df)
        for r in corpus.read()
        .select(
            F.explode(F.array_distinct(bm25_tokens("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    assert got == exp
    # maintained corpus stats == recompute (zero-token docs in N)
    st = VersionedTable(spark, idx.stats_root).read().collect()[0]
    assert st.n_docs == corpus.read().count()
    assert st.sum_dl == (
        corpus.read()
        .agg(F.coalesce(F.sum(F.size(bm25_tokens("text"))), F.lit(0)))
        .collect()[0][0]
    )
    # idempotent: nothing new -> no-op
    assert idx.refresh() is None


def test_refresh_never_reads_source_snapshot(
    spark, tmp_path, corpus, monkeypatch
):
    """The spy pin (E110's pattern): after bootstrap, refresh()
    consumes ONLY the change feed — VersionedTable.read on the source
    root would mean a corpus rescan at 100 TB."""
    idx = IncrementalBM25Index(
        spark, corpus.root, str(tmp_path / "idx")
    )
    idx.refresh()
    corpus.append(
        spark.createDataFrame(
            [(9, "brand new fox text")], "doc_id bigint, text string"
        )
    )
    corpus.delete_where(F.col("doc_id") == 2)

    reads: list[str] = []
    orig = VersionedTable.read

    def spying_read(self, *a, **kw):
        reads.append(self.root)
        return orig(self, *a, **kw)

    monkeypatch.setattr(VersionedTable, "read", spying_read)
    assert idx.refresh() == 3
    assert corpus.root not in reads, reads
    monkeypatch.undo()
    _assert_matches_recompute(idx, corpus, ["fox", "quick"])


def test_crash_between_merges_self_repairs(spark, tmp_path, corpus):
    """Each state table stamps its OWN source_version mark: a crash
    after the postings merge but before terms/stats leaves a rerun
    that re-derives ONLY the missing tables' windows."""
    idx = IncrementalBM25Index(
        spark, corpus.root, str(tmp_path / "idx")
    )
    idx.refresh()
    corpus.update_where(
        F.col("doc_id") == 1, {"text": F.lit("entirely new words")}
    )
    corpus.append(
        spark.createDataFrame(
            [(10, "more fox content")], "doc_id bigint, text string"
        )
    )
    latest = corpus.latest_version()

    # simulate the crash: postings advance, terms/stats do not
    source = VersionedTable(spark, corpus.root)
    idx._refresh_postings(source, latest, 3)
    assert idx._mark(idx._table(idx.postings_root)) == latest
    assert idx._mark(idx._table(idx.terms_root)) < latest
    assert idx.last_refreshed_version() < latest

    # the rerun repairs the stale tables and converges
    assert idx.refresh() == latest
    assert idx.last_refreshed_version() == latest
    for terms in (["fox"], ["entirely", "words"], ["quick", "dog"]):
        _assert_matches_recompute(idx, corpus, terms)


def test_continuous_refresh_converges(spark, tmp_path, corpus):
    import time

    idx = IncrementalBM25Index(
        spark, corpus.root, str(tmp_path / "idx")
    )
    idx.refresh()
    q = idx.start_continuous_refresh(str(tmp_path / "ck"))
    try:
        corpus.append(
            spark.createDataFrame(
                [(11, "streaming fox arrives")],
                "doc_id bigint, text string",
            )
        )
        corpus.delete_where(F.col("doc_id") == 3)
        deadline = time.time() + 120
        target = corpus.latest_version()
        while time.time() < deadline:
            if idx.last_refreshed_version() == target:
                break
            time.sleep(2)
        assert idx.last_refreshed_version() == target
        _assert_matches_recompute(idx, corpus, ["fox", "lazy"])
    finally:
        q.stop()


def test_search_index_statements(spark, tmp_path, corpus):
    """The statement surface (r12): CREATE/REFRESH/DROP SEARCH INDEX,
    SEARCH ... FOR ... [TOP k] [REQUIRE ALL], ALTER ... START/STOP
    CONTINUOUS REFRESH — refuse-never-reinterpret like the MV family,
    with reopen-by-path via the persisted _bm25.json."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        UnsupportedStatementError,
        execute_sql,
    )

    tables = {"docs": corpus}
    root = str(tmp_path / "sidx")
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX dix ON docs (doc_id, text) "
        f"LOCATION '{root}'",
        tables,
    )
    got = _rank_pairs(execute_sql(spark, "SEARCH dix FOR 'fox dog' TOP 5", tables))
    assert got == _rank_pairs(bm25_rank(corpus.read(), ["fox", "dog"], top_k=5))
    # DML through the front door, one REFRESH statement
    execute_sql(
        spark, "INSERT INTO docs VALUES (30, 'fox fox dog')", tables
    )
    execute_sql(spark, "DELETE FROM docs WHERE doc_id = 2", tables)
    execute_sql(spark, "REFRESH SEARCH INDEX dix", tables)
    got = _rank_pairs(
        execute_sql(
            spark, "SEARCH dix FOR 'fox dog' TOP 5 REQUIRE ALL", tables
        )
    )
    assert got == _rank_pairs(
        bm25_rank(corpus.read(), ["fox", "dog"], top_k=5, require_all=True)
    )
    # reopen from disk in a fresh registration (path, not object)
    t2 = {"docs": corpus, "dix": root}
    got2 = _rank_pairs(execute_sql(spark, "SEARCH dix FOR 'lazy'", t2))
    assert got2 == _rank_pairs(bm25_rank(corpus.read(), ["lazy"]))
    # refusal matrix
    with pytest.raises(UnsupportedStatementError, match="at least one"):
        execute_sql(spark, "SEARCH dix FOR ''", tables)
    with pytest.raises(UnsupportedStatementError, match="already"):
        execute_sql(
            spark,
            f"CREATE SEARCH INDEX dix ON docs (doc_id, text) "
            f"LOCATION '{tmp_path / 'other'}'",
            tables,
        )
    with pytest.raises(UnsupportedStatementError, match="unknown search"):
        execute_sql(spark, "SEARCH nope FOR 'a'", tables)
    with pytest.raises(UnsupportedStatementError, match="not a search"):
        execute_sql(spark, "SEARCH docs FOR 'a'", tables)
    with pytest.raises(UnsupportedStatementError, match="CHECKPOINT"):
        execute_sql(
            spark, "ALTER SEARCH INDEX dix START CONTINUOUS REFRESH",
            tables,
        )
    # CR lifecycle: START blocks DROP, STOP releases it
    execute_sql(
        spark,
        f"ALTER SEARCH INDEX dix START CONTINUOUS REFRESH "
        f"CHECKPOINT '{tmp_path / 'sck'}'",
        tables,
    )
    with pytest.raises(UnsupportedStatementError, match="STOP"):
        execute_sql(spark, "DROP SEARCH INDEX dix", tables)
    with pytest.raises(UnsupportedStatementError, match="already runs"):
        execute_sql(
            spark,
            f"ALTER SEARCH INDEX dix START CONTINUOUS REFRESH "
            f"CHECKPOINT '{tmp_path / 'sck2'}'",
            tables,
        )
    execute_sql(
        spark, "ALTER SEARCH INDEX dix STOP CONTINUOUS REFRESH", tables
    )
    execute_sql(spark, "DROP SEARCH INDEX dix", tables)
    assert "dix" not in tables
    with pytest.raises(UnsupportedStatementError, match="not running"):
        execute_sql(
            spark, "ALTER SEARCH INDEX dix STOP CONTINUOUS REFRESH", t2
        )


def test_describe_search_index(spark, tmp_path, corpus):
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    tables = {"docs": corpus}
    root = str(tmp_path / "dsidx")
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX dix ON docs (doc_id, text) "
        f"LOCATION '{root}'",
        tables,
    )
    d = execute_sql(spark, "DESCRIBE SEARCH INDEX dix", tables).collect()[0]
    assert d.name == "dix" and d.location == root
    assert (d.id_col, d.text_col) == ("doc_id", "text")
    assert d.source_version == 1
    assert d.n_docs == len(DOCS)
    exp_terms = (
        corpus.read()
        .select(F.explode(F.array_distinct(bm25_tokens("text"))).alias("t"))
        .select("t").distinct().count()
    )
    assert d.n_terms == exp_terms


class TestPositionalPhrase:
    """r13: positional postings make phrase queries index-servable.
    Parity target is bm25_rank(phrase=) — scoring stays per-term BM25,
    the phrase is a consecutive-tokens constraint over the normalized
    stream — through inserts/updates/deletes; an index built WITHOUT
    positions refuses with the rebuild recipe."""

    PDOCS = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "brown quick the: fox! sleeps"),       # terms, no phrase
        (3, "I saw a quick brown fox and a quick brown cat"),
        (4, "quick... brown? fox — punctuation can't break adjacency"),
        (5, "quick brown"),                        # prefix only
        (6, "brown fox quick brown fox"),          # repeats
    ]

    def _mk(self, spark, tmp_path, positions=True):
        src = VersionedTable.create(
            spark,
            str(tmp_path / "pdocs"),
            spark.createDataFrame(self.PDOCS, "doc_id bigint, text string"),
        )
        idx = IncrementalBM25Index(
            spark, src.root, str(tmp_path / "pidx"), positions=positions
        )
        idx.refresh()
        return src, idx

    def _parity(self, idx, src, phrase):
        got = [
            (r.doc_id, r.score)
            for r in idx.rank(
                list(dict.fromkeys(phrase)), phrase=phrase
            ).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in bm25_rank(
                src.read(), list(dict.fromkeys(phrase)), phrase=phrase
            ).collect()
        ]
        assert got == exp, (phrase, got, exp)
        return got

    def test_phrase_matches_recompute(self, spark, tmp_path):
        src, idx = self._mk(spark, tmp_path)
        hits = self._parity(idx, src, ["quick", "brown", "fox"])
        # doc 6's tail "... quick brown fox" matches too
        assert {d for d, _ in hits} == {1, 3, 4, 6}
        self._parity(idx, src, ["brown", "fox"])
        self._parity(idx, src, ["lazy", "dog"])
        # phrase with a repeated term
        self._parity(idx, src, ["brown", "fox", "quick"])
        # absent phrase -> empty, absent term -> empty
        assert idx.rank(
            ["fox", "sleeps"], phrase=["fox", "sleeps"]
        ).count() == 1  # doc 2: "fox! sleeps" normalizes adjacent
        assert idx.rank(["zebra"], phrase=["zebra"]).count() == 0

    def test_phrase_tracks_dml(self, spark, tmp_path):
        src, idx = self._mk(spark, tmp_path)
        src.append(
            spark.createDataFrame(
                [(7, "a brand new quick brown fox appears")],
                "doc_id bigint, text string",
            )
        )
        src.update_where(
            F.col("doc_id") == 1,
            {"text": F.lit("the fox is quick but not brown")},
        )
        src.delete_where(F.col("doc_id") == 3)
        idx.refresh()
        hits = self._parity(idx, src, ["quick", "brown", "fox"])
        assert {d for d, _ in hits} == {4, 6, 7}

    def test_without_positions_refuses(self, spark, tmp_path):
        src, idx = self._mk(spark, tmp_path, positions=False)
        with pytest.raises(ValueError, match="WITH POSITIONS"):
            idx.rank(["quick", "brown"], phrase=["quick", "brown"])

    def test_statement_surface_phrase(self, spark, tmp_path):
        from datalakeingestionservice_spark.sinks.sql_dml import (
            UnsupportedStatementError,
            execute_sql,
        )

        src = VersionedTable.create(
            spark,
            str(tmp_path / "sdocs"),
            spark.createDataFrame(self.PDOCS, "doc_id bigint, text string"),
        )
        tables = {"docs": src}
        execute_sql(
            spark,
            f"CREATE SEARCH INDEX pf ON docs (doc_id, text) LOCATION "
            f"'{tmp_path / 'pf'}' BUCKETS 8 WITH POSITIONS",
            tables,
        )
        got = [
            (r.doc_id, r.score)
            for r in execute_sql(
                spark, "SEARCH pf FOR '\"quick brown fox\"' TOP 10", tables
            ).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in bm25_rank(
                src.read(),
                ["quick", "brown", "fox"],
                phrase=["quick", "brown", "fox"],
                top_k=10,
            ).collect()
        ]
        assert got == exp
        desc = execute_sql(spark, "DESCRIBE SEARCH INDEX pf", tables)
        assert desc.collect()[0].positions is True
        # mixed bag+phrase refuses; phrase on a positionless index
        # refuses with the recipe
        with pytest.raises(UnsupportedStatementError, match="mixed"):
            execute_sql(spark, "SEARCH pf FOR 'fox \"quick brown\"'", tables)
        execute_sql(
            spark,
            f"CREATE SEARCH INDEX np ON docs (doc_id, text) LOCATION "
            f"'{tmp_path / 'np'}'",
            tables,
        )
        with pytest.raises(ValueError, match="WITH POSITIONS"):
            execute_sql(spark, "SEARCH np FOR '\"quick brown\"'", tables)
