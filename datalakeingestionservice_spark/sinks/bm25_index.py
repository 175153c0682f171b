"""Incrementally-maintained BM25 full-text index over a versioned
documents table's change feed — the text twin of the IVF vector index
(`sinks/bm25_index.py` ↔ `sinks/ivf_index.py`): `bm25_rank`
(operators/text.py) recomputes corpus statistics per query, which is
the right shape for ad-hoc bags of terms but not for a 100 TB corpus
under streaming ingest — there, per-term document frequencies and
per-doc lengths must be MAINTAINED state, refreshed ∝ |Δ|.

Three versioned state tables under the index root:

- ``postings/`` — one row per (term, doc_id): term frequency plus the
  doc's token length DENORMALIZED onto every posting (an update
  rewrites all of a doc's postings anyway, and carrying dl here means
  query-time scoring needs NO doc-length join — the only shuffle a
  query pays is the per-doc score aggregation over candidate rows).
- ``terms/`` — one row per term: document frequency, maintained by the
  counting algorithm (df hits 0 → the term row leaves).
- ``stats/`` — ONE row: corpus doc count and summed token length
  (avgdl = sum_dl / n_docs at read time; zero-token docs count in N
  and contribute dl=0, exactly like the full recompute's AVG).

Refresh nets the change feed per (doc_id, text) — an update's
delete+insert pair survives as one −1 row (the OLD text) and one +1
row (the NEW text), so the old text needs no index lookup: the feed
itself carries it. New postings come from tokenizing net inserts; stale
postings are the old text's terms anti-joined against the new ones;
df deltas are the signed DISTINCT (term, doc) contributions summed per
term; corpus stats deltas are two scalar sums. Every piece is ∝ the
changed docs — the refresh never reads the source snapshot after
bootstrap (spy-pinned in tests/test_bm25_index.py) and never rescans
postings (the df merge joins the delta's terms only).

Each state table stamps its OWN ``source_version`` mark, so a crash
between the three merges self-repairs: the rerun recomputes each
table's delta from that table's own window (same staged-marks contract
as the outer-join view family in `incremental_view.py`).

Tokenization is :func:`operators.text.bm25_tokens` — the SAME
expression `bm25_rank` uses, so maintained-index ranking and the
full-recompute ranker can never diverge on normalization.

Reference anchor: the reference re-extracts whole result sets per
scheduled run (`src/Worker/Services/JobSchedulingService.cs:24-75`);
this is the full-text-search twin of that pipeline made incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.text import bm25_tokens
from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)


_SPEC_FILE = "_bm25.json"


class IncrementalBM25Index:
    """Maintained postings + term stats + corpus stats for Okapi BM25
    serving over `source_root`'s change feed.

    Phrase queries are servable only from an index built with
    ``positions=True`` (postings then carry each term's sorted token
    offsets; adjacency = intersecting shifted offset arrays — the
    classic positional-postings phrase check). An index built without
    positions refuses `phrase=` with the recipe; the
    :func:`operators.text.bm25_rank` recompute path always serves it.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_root: str,
        index_root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        buckets: int = 16,
        positions: bool = False,
    ):
        import os

        self.spark = spark
        self.source_root = source_root
        self.index_root = index_root
        self.id_col = id_col
        self.text_col = text_col
        #: opt-in POSITIONAL postings: each (term, doc) row also keeps
        #: the sorted token offsets of the term, making phrase queries
        #: index-servable (adjacency = intersect of shifted position
        #: arrays). Off by default — positions multiply postings bytes
        #: by ~the average tf and most corpora never phrase-search.
        self.positions = bool(positions)
        #: postings/ and terms/ are laid out `bucket(buckets, term)`
        #: (hidden partitioning): a SEARCH derives leaf pruning from its
        #: term list, so serving scans ~len(terms)/buckets of the index
        #: instead of all of it. 0 = unpartitioned (legacy indexes).
        self.buckets = buckets
        self.postings_root = os.path.join(index_root, "postings")
        self.terms_root = os.path.join(index_root, "terms")
        self.stats_root = os.path.join(index_root, "stats")

    def _term_spec(self) -> list[str] | None:
        return (
            [f"bucket({self.buckets}, term)"] if self.buckets else None
        )

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        index_root: str,
        source_root: str,
        id_col: str,
        text_col: str,
        name: str | None = None,
        buckets: int = 16,
        positions: bool = False,
    ) -> "IncrementalBM25Index":
        """Bootstrap the index and persist its spec (`_bm25.json`) at
        the index root, so :meth:`open` rebuilds it in a fresh session
        — the same reopen contract as MaterializedView."""
        import json
        import os

        if os.path.exists(os.path.join(index_root, _SPEC_FILE)):
            raise ValueError(
                f"{index_root}: already holds a search index; open() "
                "or REFRESH it instead"
            )
        if buckets < 0:
            raise ValueError("buckets must be >= 0 (0 = unpartitioned)")
        idx = cls(
            spark, source_root, index_root,
            id_col=id_col, text_col=text_col, buckets=buckets,
            positions=positions,
        )
        idx.refresh()
        os.makedirs(index_root, exist_ok=True)
        spec = {
            "source_root": source_root,
            "id_col": id_col,
            "text_col": text_col,
            "buckets": buckets,
            "positions": bool(positions),
        }
        if name:
            spec["name"] = name
        tmp = os.path.join(index_root, _SPEC_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(spec, f, indent=1)
        os.replace(tmp, os.path.join(index_root, _SPEC_FILE))
        return idx

    @classmethod
    def open(
        cls, spark: SparkSession, index_root: str
    ) -> "IncrementalBM25Index":
        import json
        import os

        path = os.path.join(index_root, _SPEC_FILE)
        if not os.path.exists(path):
            raise ValueError(
                f"{index_root}: no search index here "
                f"({_SPEC_FILE} missing)"
            )
        with open(path) as f:
            spec = json.load(f)
        return cls(
            spark,
            spec["source_root"],
            index_root,
            id_col=spec["id_col"],
            text_col=spec["text_col"],
            # legacy spec files (pre-bucketing) opened unpartitioned:
            # their state tables were created without a spec, and the
            # layout is fixed at bootstrap
            buckets=spec.get("buckets", 0),
            positions=spec.get("positions", False),
        )

    @staticmethod
    def exists(root) -> bool:
        import os

        return isinstance(root, str) and os.path.exists(
            os.path.join(root, _SPEC_FILE)
        )

    def rebuild(
        self,
        buckets: int | None = None,
        positions: bool | None = None,
    ) -> int:
        """Re-bootstrap the index into a (new) physical layout and swap
        it in — the migration path for legacy indexes created before
        term-bucketing (r13) or without positions: they serve with a
        corpus-sized scan / refuse phrases until re-laid-out, and the
        only alternative used to be DROP + CREATE (losing the high-water
        mark and the registered spec).

        `buckets=None` keeps the current layout EXCEPT a legacy
        `buckets=0` index, which migrates to the default 16 (migrating
        is the statement's point); `positions=None` keeps the current
        setting. The new state tables bootstrap from the source AT THE
        INDEX'S CURRENT HIGH-WATER MARK (`source.read(mark)`), so the
        rebuilt index reflects exactly what the old one did and the
        next refresh() drains from the same place — REBUILD is a
        layout change, never a freshness change.

        Refuses when the three state tables' marks disagree (a refresh
        is mid-flight or crashed between merges — refresh() first to
        converge). Single-writer like compact: the swap is three
        directory renames + a spec rewrite; a crash mid-swap leaves
        each table internally consistent at the same mark (reads are
        manifest-driven, pruning is layout-derived per table), and
        re-running REBUILD completes the migration. Returns the
        preserved high-water mark."""
        import json
        import os
        import shutil

        roots = (self.postings_root, self.terms_root, self.stats_root)
        marks = [self._mark(self._table(r)) for r in roots]
        if any(m is None for m in marks):
            raise ValueError(
                f"{self.index_root}: index not materialized; "
                "refresh() first"
            )
        if len(set(marks)) != 1:
            raise ValueError(
                f"{self.index_root}: state tables disagree on their "
                f"source_version marks {marks} — a refresh is "
                "mid-flight (or crashed between merges); REFRESH "
                "first, then REBUILD"
            )
        hv = marks[0]
        new_buckets = (
            (self.buckets or 16) if buckets is None else buckets
        )
        if new_buckets < 0:
            raise ValueError("buckets must be >= 0 (0 = unpartitioned)")
        new_positions = (
            self.positions if positions is None else bool(positions)
        )
        stage_root = os.path.join(self.index_root, ".rebuild")
        shutil.rmtree(stage_root, ignore_errors=True)  # crashed prior
        staged = IncrementalBM25Index(
            self.spark,
            self.source_root,
            stage_root,
            id_col=self.id_col,
            text_col=self.text_col,
            buckets=new_buckets,
            positions=new_positions,
        )
        source = VersionedTable(self.spark, self.source_root)
        # bootstrap pinned at hv — NOT latest — so the mark survives
        staged._refresh_postings(source, hv, 0)
        staged._refresh_terms(source, hv, 0)
        staged._refresh_stats(source, hv, 0)
        old_root = os.path.join(self.index_root, ".rebuild-old")
        shutil.rmtree(old_root, ignore_errors=True)
        os.makedirs(old_root)
        for cur, new in (
            (self.postings_root, staged.postings_root),
            (self.terms_root, staged.terms_root),
            (self.stats_root, staged.stats_root),
        ):
            os.rename(cur, os.path.join(old_root, os.path.basename(cur)))
            os.rename(new, cur)
        self.buckets = new_buckets
        self.positions = new_positions
        spec_path = os.path.join(self.index_root, _SPEC_FILE)
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                spec = json.load(f)
            spec["buckets"] = new_buckets
            spec["positions"] = new_positions
            tmp = spec_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(spec, f, indent=1)
            os.replace(tmp, spec_path)
        shutil.rmtree(old_root, ignore_errors=True)
        shutil.rmtree(stage_root, ignore_errors=True)
        return hv

    # -- state access -------------------------------------------------------
    # The three state tables have NO change-feed consumers (the index
    # consumes the SOURCE's feed; nothing consumes the index's), so
    # they skip CDF materialization — Delta makes CDF opt-in for the
    # same reason: a feed nobody reads is a snapshot-sized extra write
    # per commit. At sf1 this halves the bootstrap write volume.
    def _table(self, root: str) -> VersionedTable | None:
        try:
            return VersionedTable(
                self.spark, root, materialize_changes=False
            )
        except NoSuchVersionError:
            return None

    @staticmethod
    def _mark(t: VersionedTable | None) -> int | None:
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "source_version" in m.summary:
                return m.summary["source_version"]
        return None

    def last_refreshed_version(self) -> int | None:
        """The source version ALL THREE state tables reflect (the min
        of the per-table marks), or None before the first refresh."""
        marks = [
            self._mark(self._table(r))
            for r in (self.postings_root, self.terms_root, self.stats_root)
        ]
        if any(m is None for m in marks):
            return None
        return min(marks)

    def read_postings(self) -> DataFrame:
        t = self._table(self.postings_root)
        if t is None:
            raise NoSuchVersionError(
                f"{self.postings_root}: index not materialized; "
                "call refresh()"
            )
        return t.read()

    # -- tokenized projections ------------------------------------------------
    def _doc_terms(self, docs: DataFrame) -> DataFrame:
        """(term, doc_id, tf, dl) per distinct term of each doc. One
        explode + one (term, doc)-keyed aggregation over CHANGED docs
        only; docs with zero tokens yield no rows (explode drops empty
        arrays), exactly as they hold no postings.

        The token array is PRE-PROJECTED into its own column before
        size/explode: Catalyst does not common-subexpression the
        tokenizer across the generator boundary, so inlining
        ``size(bm25_tokens(text))`` next to ``explode(bm25_tokens(
        text))`` re-tokenizes the WHOLE document per emitted token —
        O(len²) per doc (measured 40 s -> 3.5 s at 50k docs).

        With positions enabled, posexplode carries each token's offset
        in the normalized stream and the posting keeps the SORTED
        offset array — the adjacency evidence phrase serving needs."""
        base = docs.select(
            F.col(self.id_col),
            bm25_tokens(self.text_col).alias("__t"),
        )
        if self.positions:
            return (
                base.select(
                    F.col(self.id_col),
                    F.size("__t").alias("dl"),
                    F.posexplode("__t").alias("__p", "term"),
                )
                .groupBy("term", self.id_col)
                .agg(
                    F.count(F.lit(1)).alias("tf"),
                    F.max("dl").alias("dl"),
                    F.sort_array(F.collect_list("__p")).alias("pos"),
                )
            )
        return (
            base.select(
                F.col(self.id_col),
                F.size("__t").alias("dl"),
                F.explode("__t").alias("term"),
            )
            .groupBy("term", self.id_col)
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.max("dl").alias("dl"),
            )
        )

    def _doc_scalars(self, docs: DataFrame, sign) -> DataFrame:
        """Signed (n, dl) contributions per changed doc row."""
        return docs.select(
            sign.alias("__s"),
            (sign * F.size(bm25_tokens(self.text_col))).alias("__sdl"),
        )

    # -- maintenance ----------------------------------------------------------
    def refresh(self, max_retries: int = 3) -> int | None:
        """Bring all three state tables to the source's latest version.
        Returns that version, or None if nothing new anywhere."""
        source = VersionedTable(self.spark, self.source_root)
        latest = source.latest_version()
        done = self.last_refreshed_version()
        if done is not None and latest <= done:
            return None  # idempotent
        self._refresh_postings(source, latest, max_retries)
        self._refresh_terms(source, latest, max_retries)
        self._refresh_stats(source, latest, max_retries)
        return latest

    def _nets(self, source: VersionedTable, a: int, b: int) -> DataFrame:
        """Signed net per (doc_id, text): +1 rows are current texts to
        index, −1 rows are OLD texts whose postings/df must unwind —
        update churn at the same text cancels to nothing."""
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        return (
            source.changes(a, b)
            .select(self.id_col, self.text_col, sign.alias("__s"))
            .groupBy(self.id_col, self.text_col)
            .agg(F.sum("__s").alias("__net"))
            .filter(F.col("__net") != 0)
        )

    def _refresh_postings(self, source, latest, max_retries) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        t = self._table(self.postings_root)
        if t is None:
            VersionedTable.create(
                self.spark,
                self.postings_root,
                self._doc_terms(source.read(latest)),
                summary={"source_version": latest},
                materialize_changes=False,
                # serving-side pruning: SEARCH term equality derives
                # leaf pruning from the bucket dirs (hidden
                # partitioning), so a query scans ~|terms|/buckets of
                # the postings instead of the whole index; optimized
                # write keeps it ONE file per bucket per commit (a
                # 32-task write would otherwise fragment 32× and the
                # per-file opens eat the pruning win)
                partition_by=self._term_spec(),
                optimize_write=bool(self.buckets),
            )
            return
        for _ in range(max_retries + 1):
            last = self._mark(t)
            if last is None:
                raise NoSuchVersionError(
                    f"{self.postings_root}: no source_version mark"
                )
            if latest <= last:
                return
            v = t.latest_version()
            nets = self._nets(source, last, latest)
            ups = self._doc_terms(
                nets.filter(F.col("__net") > 0).select(
                    self.id_col, self.text_col
                )
            ).withColumn("__is_delete", F.lit(False))
            old = self._doc_terms(
                nets.filter(F.col("__net") < 0).select(
                    self.id_col, self.text_col
                )
            ).select("term", self.id_col)
            dels = (
                old.join(
                    ups.select("term", self.id_col),
                    ["term", self.id_col],
                    "left_anti",
                )
                .withColumn("tf", F.lit(None).cast("long"))
                .withColumn("dl", F.lit(None).cast("long"))
                .withColumn("__is_delete", F.lit(True))
            )
            if self.positions:
                dels = dels.withColumn(
                    "pos", F.lit(None).cast("array<int>")
                ).select(*ups.columns)
            try:
                t.merge(
                    ups.unionByName(dels),
                    ["term", self.id_col],
                    delete_col="__is_delete",
                    summary={"source_version": latest},
                    expected_version=v,
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.postings_root}: merge lost {max_retries + 1} races"
        )

    def _refresh_terms(self, source, latest, max_retries) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        t = self._table(self.terms_root)
        if t is None:
            # bootstrap from the postings just materialized: df = how
            # many postings rows carry the term (postings are distinct
            # per (term, doc) by construction)
            VersionedTable.create(
                self.spark,
                self.terms_root,
                self.read_postings()
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("df")),
                summary={"source_version": self._mark(
                    self._table(self.postings_root)
                )},
                materialize_changes=False,
                partition_by=self._term_spec(),
                optimize_write=bool(self.buckets),
            )
            return
        for _ in range(max_retries + 1):
            last = self._mark(t)
            if last is None:
                raise NoSuchVersionError(
                    f"{self.terms_root}: no source_version mark"
                )
            if latest <= last:
                return
            v = t.latest_version()
            nets = self._nets(source, last, latest)
            contrib = None
            for s, pred in ((1, F.col("__net") > 0), (-1, F.col("__net") < 0)):
                piece = (
                    self._doc_terms(
                        nets.filter(pred).select(self.id_col, self.text_col)
                    )
                    .select("term", self.id_col)
                    .withColumn("__s", F.lit(s))
                )
                contrib = piece if contrib is None else contrib.unionByName(
                    piece
                )
            ddf = (
                contrib.groupBy("term")
                .agg(F.sum("__s").alias("__d"))
                .filter(F.col("__d") != 0)
            )
            state = t.read(v)
            combined = (
                ddf.join(state, "term", "left")
                .select(
                    "term",
                    (
                        F.coalesce(F.col("df"), F.lit(0)) + F.col("__d")
                    ).alias("df"),
                )
                .withColumn("__is_delete", F.col("df") == 0)
            )
            try:
                t.merge(
                    combined,
                    ["term"],
                    delete_col="__is_delete",
                    summary={"source_version": latest},
                    expected_version=v,
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.terms_root}: merge lost {max_retries + 1} races"
        )

    def _refresh_stats(self, source, latest, max_retries) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        t = self._table(self.stats_root)
        if t is None:
            snap = source.read(latest)
            VersionedTable.create(
                self.spark,
                self.stats_root,
                snap.agg(
                    F.lit(0).alias("__k"),
                    F.count(F.lit(1)).alias("n_docs"),
                    F.coalesce(
                        F.sum(F.size(bm25_tokens(self.text_col))), F.lit(0)
                    ).alias("sum_dl"),
                ).select("__k", "n_docs", "sum_dl"),
                summary={"source_version": latest},
                materialize_changes=False,
            )
            return
        for _ in range(max_retries + 1):
            last = self._mark(t)
            if last is None:
                raise NoSuchVersionError(
                    f"{self.stats_root}: no source_version mark"
                )
            if latest <= last:
                return
            v = t.latest_version()
            nets = self._nets(source, last, latest)
            delta = nets.agg(
                F.coalesce(F.sum("__net"), F.lit(0)).alias("__dn"),
                F.coalesce(
                    F.sum(
                        F.col("__net")
                        * F.size(bm25_tokens(self.text_col))
                    ),
                    F.lit(0),
                ).alias("__ddl"),
            )
            state = t.read(v)
            combined = state.crossJoin(F.broadcast(delta)).select(
                "__k",
                (F.col("n_docs") + F.col("__dn")).alias("n_docs"),
                (F.col("sum_dl") + F.col("__ddl")).alias("sum_dl"),
            )
            try:
                t.merge(
                    combined,
                    ["__k"],
                    summary={"source_version": latest},
                    expected_version=v,
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.stats_root}: merge lost {max_retries + 1} races"
        )

    def start_continuous_refresh(
        self,
        checkpoint_dir: str,
        processing_time: str = "0 seconds",
    ):
        """The source's change stream triggers one idempotent
        `refresh()` per micro-batch (marks are the truth — replayed or
        coalesced batches can never double-apply)."""
        from datalakeingestionservice_spark.sources.versioned_changes import (
            register,
        )

        register(self.spark)
        feed = (
            self.spark.readStream.format("versioned_changes")
            .option("table_root", self.source_root)
            .load()
        )

        def _on_batch(batch_df, batch_id: int) -> None:
            self.refresh()

        return (
            feed.writeStream.foreachBatch(_on_batch)
            .trigger(processingTime=processing_time)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    # -- serving --------------------------------------------------------------
    def rank(
        self,
        query_terms: list[str],
        k1: float = 1.2,
        b: float = 0.75,
        top_k: int = 20,
        require_all: bool = False,
        phrase: list[str] | None = None,
    ) -> DataFrame:
        """Okapi BM25 ranking served from the MAINTAINED state —
        same formula, same Lucene idf, same 4dp-then-rank ordering as
        :func:`operators.text.bm25_rank`, but the corpus statistics
        come from the index: the only corpus-shaped work is the
        postings scan FILTERED to the query terms (term-pruned at the
        source) and one per-doc aggregation over candidate rows.
        Returns (id, score) like the recompute path.

        The postings/terms reads go through `read(predicates=[("term",
        "in", terms)])`: on a bucketed index the term list derives
        bucket-dir pruning at PLAN time (plus bloom/footer-stat file
        pruning), so the scan is ~|terms|/buckets of the index — the
        query-side twin of refresh ∝ |Δ|. `read(predicates=)` also
        applies the same row filter, so results are identical to the
        unpruned read + isin.

        `phrase=[t1, t2, ...]` (positional indexes only) constrains
        hits to docs containing the terms CONSECUTIVELY in the
        normalized token stream — scoring stays per-term BM25 exactly
        like `bm25_rank(phrase=)`. Adjacency is position algebra over
        the maintained offsets: fold array_intersect over each phrase
        term's offsets shifted left by its phrase position; a
        non-empty result IS a phrase occurrence. The phrase terms join
        the pruned read, so the extra cost is ∝ their postings."""
        terms = list(dict.fromkeys(query_terms))
        if phrase and not self.positions:
            raise ValueError(
                "this index was built without positions — phrase "
                "queries are not index-servable; CREATE the index "
                "WITH POSITIONS (rebuild) or use the bm25_rank "
                "recompute path"
            )
        read_terms = list(dict.fromkeys([*terms, *(phrase or [])]))
        preds = [("term", "in", read_terms)]
        tstats = VersionedTable(self.spark, self.terms_root).read(
            predicates=preds
        )
        stats1 = (
            VersionedTable(self.spark, self.stats_root)
            .read()
            .select(
                F.col("n_docs"),
                (
                    F.col("sum_dl").cast("double") / F.col("n_docs")
                ).alias("avgdl"),
            )
        )
        t = self._table(self.postings_root)
        if t is None:
            raise NoSuchVersionError(
                f"{self.postings_root}: index not materialized; "
                "call refresh()"
            )
        pruned = t.read(predicates=preds)
        # scoring uses the QUERY terms only (tstats carries the same
        # pruned superset, so restrict both sides identically)
        cand = pruned.filter(F.col("term").isin(terms))
        tstats = tstats.filter(F.col("term").isin(terms))
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        tf = F.col("tf").cast("double")
        score_t = idf * (
            (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        scored = (
            cand.join(F.broadcast(tstats), "term")
            .crossJoin(F.broadcast(stats1))
            .select(F.col(self.id_col), score_t.alias("__st"))
        )
        agg = scored.groupBy(self.id_col).agg(
            F.sum("__st").alias("__raw"),
            F.count(F.lit(1)).alias("__nt"),
        )
        if require_all:
            agg = agg.filter(F.col("__nt") == len(terms))
        if phrase:
            # positional phrase check: per doc, map term -> offsets of
            # the phrase terms; occurrence positions = fold of
            # array_intersect(pm[t_j] shifted left by j). A phrase term
            # absent from the doc yields a NULL map entry, the fold
            # goes NULL, size(NULL) > 0 is false — exactly "no match".
            pterms = list(dict.fromkeys(phrase))
            pm = (
                pruned.filter(F.col("term").isin(pterms))
                .groupBy(self.id_col)
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("term", "pos"))
                    ).alias("__pm")
                )
            )
            def _shifted(tm: str, j: int):
                # NB single-arg lambda only: a second (defaulted)
                # parameter makes PySpark pick transform's
                # (element, index) variant — the bm25_rank gotcha.
                # Closing over the helper's own j binding is safe.
                return F.transform(
                    F.col("__pm")[tm], lambda x: x - F.lit(j)
                )

            occ = None
            for j, tm in enumerate(phrase):
                shifted = _shifted(tm, j)
                occ = shifted if occ is None else F.array_intersect(
                    occ, shifted
                )
            phrase_docs = pm.filter(F.size(occ) > 0).select(self.id_col)
            agg = agg.join(phrase_docs, self.id_col, "leftsemi")
        return (
            agg.select(
                F.col(self.id_col),
                F.round(F.col("__raw"), 4).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col(self.id_col))
            .limit(top_k)
        )

    def serving_prune_info(self, query_terms: list[str]) -> dict:
        """What a `rank(query_terms)` would scan vs skip in the
        postings table — the plan-time evidence that serving prunes
        (`VersionedTable.prune_info` over the same predicate `rank`
        plans with)."""
        t = self._table(self.postings_root)
        if t is None:
            raise NoSuchVersionError(
                f"{self.postings_root}: index not materialized; "
                "call refresh()"
            )
        return t.prune_info(
            [("term", "in", list(dict.fromkeys(query_terms)))]
        )
