"""Incrementally-maintained IVF ANN index over a versioned embeddings
table's change feed — the composition a mutating 100 TB vector corpus
needs: the coarse-quantization assignment table ``(vec_id, embedding,
cid, cos_sim)`` is a materialized view of :func:`ivf_assign`
(operators/similarity.py), kept fresh by CDC instead of corpus rescans.

Refresh cost is ∝ |Δ| — the change feed's rows net per id (an update's
delete+insert pair collapses to one reassignment), ONLY the net
inserts run the broadcast-centroid argmin (|Δ| × k candidate rows,
map-side combined), and one pk merge applies upserts + deletes to the
index state. The index never rescans the corpus after bootstrap; a
search then probes cells of the MAINTAINED index exactly like q89's
full-recompute path (rank centroids against the query, equi-join the
top cells, exact-rank within).

Centroids are the caller's fixed small frame (broadcast everywhere) —
IVF retraining is a rebuild by design, exactly like FAISS: drop the
index root and re-bootstrap. The refresh high-water mark rides in the
index table's commit summary (idempotent, crash-safe, concurrent-safe
via expected_version + retry), same contract as the incremental view
family in `incremental_view.py`.

Reference anchor: the reference re-extracts whole result sets per
scheduled run (`src/Worker/Services/JobSchedulingService.cs:24-75`);
this is the vector-index twin of that pipeline made incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.similarity import (
    cosine,
    ivf_assign,
)
from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)


class IncrementalIVFIndex:
    """A versioned IVF assignment table maintained from `source_root`'s
    change feed.

    Parameters
    ----------
    centroids: small (centroid_id_col, centroid_vec_col) frame, fixed
        for the index's lifetime (broadcast at every assignment and
        probe). Changing centroids means a rebuild — use a new
        `index_root`.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_root: str,
        index_root: str,
        centroids: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centroid_id_col: str = "cid",
        centroid_vec_col: str = "cv",
    ):
        self.spark = spark
        self.source_root = source_root
        self.index_root = index_root
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.centroid_id_col = centroid_id_col
        self.centroid_vec_col = centroid_vec_col

    # -- state access -------------------------------------------------------
    def _index_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.index_root)
        except NoSuchVersionError:
            return None

    def last_refreshed_version(self) -> int | None:
        t = self._index_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "source_version" in m.summary:
                return m.summary["source_version"]
        return None

    def read(self) -> DataFrame:
        """The maintained assignment: (id, vec, cid, cos_sim)."""
        t = self._index_table()
        if t is None:
            raise NoSuchVersionError(
                f"{self.index_root}: index not materialized; call refresh()"
            )
        return t.read()

    # -- maintenance --------------------------------------------------------
    def _assign(self, rows: DataFrame) -> DataFrame:
        return ivf_assign(
            rows,
            self.centroids,
            id_col=self.id_col,
            vec_col=self.vec_col,
            centroid_id_col=self.centroid_id_col,
            centroid_vec_col=self.centroid_vec_col,
        )

    def refresh(self, max_retries: int = 3) -> int | None:
        """Bring the index to the source's latest version. First call
        assigns the full snapshot; later calls net the change feed per
        id (delete −1 / insert +1 on the full row, so update churn
        cancels), assign ONLY the net-new rows against the broadcast
        centroids, and apply one pk merge — never a corpus rescan.
        Returns the source version now reflected (None if nothing
        new)."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        source = VersionedTable(self.spark, self.source_root)
        latest = source.latest_version()
        t = self._index_table()
        if t is None:
            VersionedTable.create(
                self.spark,
                self.index_root,
                self._assign(source.read(latest)),
                summary={"source_version": latest},
                # identity-partition by cell: a probe search prunes to
                # its n_probe leaf dirs at PLAN time instead of
                # scanning every assignment file (cells ≈ sqrt(corpus),
                # so leaves stay coarse enough to not fragment writes)
                partition_by=[self.centroid_id_col],
                # one file per cell per commit (optimized write) — the
                # pruned probe read pays per-file opens otherwise
                optimize_write=True,
            )
            return latest

        last = self.last_refreshed_version()
        if last is None:
            raise NoSuchVersionError(
                f"{self.index_root}: no source_version mark in history"
            )
        if latest <= last:
            return None  # idempotent
        index_version = t.latest_version()

        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        nets = (
            source.changes(last, latest)
            .groupBy(self.id_col, self.vec_col)
            .agg(F.sum(sign).alias("__net"))
            .filter(F.col("__net") != 0)
        )
        ups = self._assign(
            nets.filter(F.col("__net") > 0).select(
                self.id_col, self.vec_col
            )
        ).withColumn("__is_delete", F.lit(False))
        # ids whose only net effect is removal (no replacement row)
        idx_types = {
            f.name: f.dataType
            for f in ups.schema.fields
            if f.name != "__is_delete"
        }
        dels = (
            nets.filter(F.col("__net") < 0)
            .select(self.id_col)
            .join(ups.select(self.id_col), self.id_col, "left_anti")
            .select(
                *[
                    F.col(self.id_col).alias(c)
                    if c == self.id_col
                    else F.lit(None).cast(typ).alias(c)
                    for c, typ in idx_types.items()
                ]
            )
            .withColumn("__is_delete", F.lit(True))
        )
        try:
            t.merge(
                ups.unionByName(dels),
                [self.id_col],
                delete_col="__is_delete",
                summary={"source_version": latest},
                expected_version=index_version,
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            return self.refresh(max_retries=max_retries - 1)
        return latest

    def rebuild(self) -> int:
        """Re-bootstrap the assignment table into the current physical
        layout (cell-identity partitioning + optimized write) and swap
        it in — the migration path for legacy indexes created before
        cell partitioning (r13), which serve probe reads with a
        corpus-sized scan until re-laid-out. The BM25 twin is
        :meth:`IncrementalBM25Index.rebuild`.

        Re-assigns the source snapshot AT THE INDEX'S CURRENT
        HIGH-WATER MARK (`source.read(mark)`) against the same
        broadcast centroids, so the rebuilt index reflects exactly
        what the old one did and the next refresh() drains from the
        same place — a layout change, never a freshness change (and
        never a centroid change: new centroids mean a new index root,
        per the class contract). Single-writer like compact; the swap
        is two directory renames, and a crashed swap re-runs to
        completion. Returns the preserved high-water mark."""
        import os
        import shutil

        if self._index_table() is None:
            raise NoSuchVersionError(
                f"{self.index_root}: index not materialized; "
                "call refresh()"
            )
        hv = self.last_refreshed_version()
        if hv is None:
            raise NoSuchVersionError(
                f"{self.index_root}: no source_version mark in history"
            )
        source = VersionedTable(self.spark, self.source_root)
        stage = self.index_root.rstrip("/") + ".rebuild"
        shutil.rmtree(stage, ignore_errors=True)  # crashed prior run
        VersionedTable.create(
            self.spark,
            stage,
            self._assign(source.read(hv)),
            summary={"source_version": hv},
            partition_by=[self.centroid_id_col],
            optimize_write=True,
        )
        old = self.index_root.rstrip("/") + ".rebuild-old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.index_root, old)
        os.rename(stage, self.index_root)
        shutil.rmtree(old, ignore_errors=True)
        return hv

    def start_continuous_refresh(
        self,
        checkpoint_dir: str,
        processing_time: str = "0 seconds",
    ):
        """Keep the index fresh CONTINUOUSLY: the source's change
        stream (versions as offsets) triggers one idempotent
        `refresh()` per micro-batch — the same trigger-not-data posture
        as the incremental view family (the high-water mark, not the
        stream offset, is the source of truth, so replayed or coalesced
        micro-batches can never double-apply)."""
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

    # -- serving ------------------------------------------------------------
    def _probe_cells(
        self, query: DataFrame, n_probe: int, query_vec_col: str
    ) -> list:
        """The n_probe cell ids nearest the query — ranked over the
        caller's fixed small centroid frame (ties on cid)."""
        return [
            r[0]
            for r in (
                self.centroids.crossJoin(F.broadcast(query))
                .orderBy(
                    F.desc(cosine(self.centroid_vec_col, query_vec_col)),
                    F.asc(self.centroid_id_col),
                )
                .limit(n_probe)
                .select(self.centroid_id_col)
                .collect()
            )
        ]

    def serving_prune_info(
        self,
        query: DataFrame,
        n_probe: int = 2,
        query_vec_col: str = "qv",
    ) -> dict:
        """What a `topk(query, n_probe=...)` would scan vs skip in the
        assignment table — plan-time evidence that a probe search
        prunes to its cells' leaves."""
        t = self._index_table()
        if t is None:
            raise NoSuchVersionError(
                f"{self.index_root}: index not materialized; "
                "call refresh()"
            )
        cells = self._probe_cells(query, n_probe, query_vec_col)
        return t.prune_info(
            [(self.centroid_id_col, "in", cells)]
        )

    def topk(
        self,
        query: DataFrame,
        k: int = 10,
        n_probe: int = 2,
        query_vec_col: str = "qv",
        exclude_ids: list | None = None,
        round_dp: int = 4,
    ) -> DataFrame:
        """IVF probe search over the MAINTAINED index (q89's query path
        without the assignment recompute): rank centroids against the
        (single-row, broadcast) query, equi-join the top `n_probe`
        cells of the index, exact-rank within. Returns
        (id, cell, cos_sim) — cosine rounded to `round_dp`, ties on id.
        Cost ∝ rows in the probed cells, never corpus size: the probed
        cell ids (an n_probe-sized list from the always-small centroid
        frame — a constant-size collect, never data-sized) drive a
        `read(predicates=[(cid, "in", cells)])`, so the cid-partitioned
        index prunes to the probed LEAF DIRS at plan time instead of
        filtering a full scan."""
        cells = self._probe_cells(query, n_probe, query_vec_col)
        t = self._index_table()
        if t is None:
            raise NoSuchVersionError(
                f"{self.index_root}: index not materialized; "
                "call refresh()"
            )
        cand = t.read(
            predicates=[(self.centroid_id_col, "in", cells)]
        )
        if exclude_ids:
            cand = cand.filter(~F.col(self.id_col).isin(exclude_ids))
        return (
            cand.crossJoin(F.broadcast(query))
            .select(
                self.id_col,
                F.col(self.centroid_id_col).alias("cell"),
                F.round(
                    cosine(self.vec_col, query_vec_col), round_dp
                ).alias("cos_sim"),
            )
            .orderBy(F.desc("cos_sim"), F.asc(self.id_col))
            .limit(k)
        )
