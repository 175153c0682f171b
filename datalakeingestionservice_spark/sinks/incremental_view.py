"""Incrementally-maintained aggregate materialized views over the change feed.

A grouped-aggregate view (`SELECT keys, count(*), sum(expr)… GROUP BY keys`)
over a versioned table is refreshed WITHOUT rescanning the source: the view
consumes `VersionedTable.changes(last_refreshed, latest)` — inserts count +1,
deletes count −1 — aggregates JUST the changed rows into per-key deltas, and
merges the deltas into its own versioned state table. Classic incremental
view maintenance (Gupta & Mumick's counting algorithm) re-expressed as two
Catalyst plans:

- delta plan: one shuffle over the CHANGED rows only (groupBy keys on the
  feed), independent of source size — at 100 TB a refresh costs what the
  commits since last refresh cost, not what the table costs;
- apply plan: copy-on-write merge bounded by |view| = number of groups,
  which is the small side by construction.

Only self-maintainable aggregates are offered: count and sum (avg = sum /
count at read time). min/max are NOT — a delete of the current extreme
forces a per-group rescan, which is exactly the full recompute this class
exists to avoid; use a scheduled full rebuild for those.

The refresh high-water mark (`source_version`) rides in the view table's
commit summary, so refresh is idempotent: re-running after a crash sees the
mark and re-applies nothing. The view is itself a versioned table — time
travel over VIEW versions shows the aggregate history for free.

Reference semantics anchor: the reference recomputes its extraction
aggregates from scratch each scheduled run
(`src/Worker/Services/JobSchedulingService.cs:24-75` re-executes the full
query per cron fire); this is the lake-native incremental replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)

_COUNT_COL = "_n"


class IncrementalAggView:
    """A count/sum GROUP BY view over a source :class:`VersionedTable`,
    maintained from its change feed.

    Parameters
    ----------
    keys: grouping columns (must exist in the source schema). Values must
        be NON-NULL: key matching uses SQL-MERGE equality semantics (same
        as Delta Lake MERGE), under which NULL keys never match and would
        duplicate instead of combining.
    sums: {output_column: source_expression} summed per group. Expressions
        are SQL strings over source columns (e.g. ``"l_quantity"`` or
        ``"l_extendedprice * (1 - l_discount)"``). Use exact types
        (decimal/int) when bit-identical parity with a full recompute
        matters — float addition order differs between the incremental and
        recompute paths.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_root: str,
        view_root: str,
        keys: list[str],
        sums: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.source_root = source_root
        self.view_root = view_root
        self.keys = list(keys)
        self.sums = dict(sums or {})
        reserved = {_COUNT_COL} | {f"_nn_{c}" for c in self.sums}
        if reserved & (set(self.sums) | set(self.keys)):
            raise ValueError(
                f"reserved column names: {sorted(reserved)} (count and "
                "per-sum non-null counters)"
            )

    # -- state access -------------------------------------------------------
    def _view_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.view_root)
        except NoSuchVersionError:
            return None

    def last_refreshed_version(self) -> int | None:
        """Source version the view state reflects, or None before the
        first refresh."""
        table = self._view_table()
        if table is None:
            return None
        for m in reversed(table.versions()):
            if "source_version" in m.summary:
                return m.summary["source_version"]
        return None

    def read(self) -> DataFrame:
        """Current view state: keys, per-group count, per-group sums.

        Sums whose non-null counter is zero render as SQL NULL (exactly
        what a full `sum()` recompute yields for an all-NULL group); the
        internal `_nn_*` counters are not exposed."""
        table = self._view_table()
        if table is None:
            raise NoSuchVersionError(
                f"{self.view_root}: view not materialized; call refresh()"
            )
        state = table.read()
        types = {f.name: f.dataType for f in state.schema.fields}
        return state.select(
            *self.keys,
            F.col(_COUNT_COL),
            *[
                F.when(
                    F.col(f"_nn_{c}") == 0, F.lit(None).cast(types[c])
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in self.sums
            ],
        )

    # -- maintenance --------------------------------------------------------
    def _aggregate(self, rows: DataFrame, sign=None) -> DataFrame:
        """Group `rows` into view STATE shape; with `sign` (+1/-1 column)
        the aggregates become signed deltas.

        Each sum is stored as a NULL-free accumulator plus a non-null
        contribution counter `_nn_<col>`: SQL `sum()` is NULL when every
        input is NULL, and plain `coalesce(acc, 0)` arithmetic would turn
        that NULL into 0 — diverging from the full recompute the view
        promises to equal. `read()` renders NULL back whenever the counter
        is zero."""
        weight = sign if sign is not None else F.lit(1)
        aggs = [F.sum(weight).alias(_COUNT_COL)]
        for out, expr in self.sums.items():
            e = F.expr(expr)
            aggs.append(F.coalesce(F.sum(e * weight), F.lit(0)).alias(out))
            aggs.append(
                F.coalesce(
                    F.sum(e.isNotNull().cast("long") * weight), F.lit(0)
                ).alias(f"_nn_{out}")
            )
        return rows.groupBy(*self.keys).agg(*aggs)

    def refresh(self, max_retries: int = 3) -> int | None:
        """Bring the view up to the source's latest version.

        First call materializes from a full snapshot aggregate; later
        calls apply change-feed deltas only. Returns the source version
        the view now reflects (None only if nothing new).

        Safe under CONCURRENT refreshes (e.g. a manual refresh racing
        start_continuous_refresh): the state merge commits against the
        exact view version this refresh read its state from
        (`expected_version`), so two refreshes that both saw the same
        high-water mark cannot both apply the same delta — the loser
        gets ConcurrentCommitError and retries from the new mark (where
        it normally finds nothing left to do)."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        source = VersionedTable(self.spark, self.source_root)
        latest = source.latest_version()
        table = self._view_table()

        if table is None:
            state = self._aggregate(source.read(latest))
            VersionedTable.create(
                self.spark,
                self.view_root,
                state,
                summary={"source_version": latest},
            )
            return latest

        last = self.last_refreshed_version()
        if last is None:  # view table exists but was never stamped
            raise NoSuchVersionError(
                f"{self.view_root}: no source_version mark in history"
            )
        if latest <= last:
            return None  # idempotent: nothing new (crash-replay safe)
        view_version = table.latest_version()

        feed = source.changes(last, latest)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = self._aggregate(feed, sign=sign)

        state = table.read(view_version)
        accs = list(self.sums) + [f"_nn_{c}" for c in self.sums]
        d = delta.select(
            *self.keys,
            F.col(_COUNT_COL).alias("__d_n"),
            *[F.col(c).alias(f"__d_{c}") for c in accs],
        )
        # Affected keys only: delta drives the join, state supplies the
        # old totals (left join keeps brand-new groups).
        combined = d.join(state, self.keys, "left").select(
            *self.keys,
            (
                F.coalesce(F.col(_COUNT_COL), F.lit(0)) + F.col("__d_n")
            ).alias(_COUNT_COL),
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                ).alias(c)
                for c in accs
            ],
        )
        # Pin every column to the STATE's existing type: old+delta
        # arithmetic widens decimals each refresh, and a type that drifts
        # per-commit both breaks schema stability and defeats the scoped
        # merge. Sums stay in-range by construction (they equal the full
        # recompute, which fit the initial sum type).
        state_types = {f.name: f.dataType for f in state.schema.fields}
        combined = combined.select(
            *[
                F.col(c.name).cast(state_types[c.name]).alias(c.name)
                if c.name in state_types
                and c.dataType != state_types[c.name]
                else F.col(c.name)
                for c in combined.schema.fields
            ]
        )
        # Groups whose count hits 0 leave the view (counting algorithm).
        upserts = combined.withColumn(
            "__is_delete", F.col(_COUNT_COL) == 0
        )
        try:
            table.merge(
                upserts,
                self.keys,
                delete_col="__is_delete",
                summary={"source_version": latest},
                expected_version=view_version,
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            # Another refresh advanced the view while this one computed
            # its delta; recompute from the NEW mark (usually a no-op).
            return self.refresh(max_retries=max_retries - 1)
        return latest

    def start_continuous_refresh(
        self,
        checkpoint_dir: str,
        processing_time: str = "0 seconds",
    ):
        """Keep the view fresh CONTINUOUSLY: the source's change stream
        (versions as offsets) triggers one idempotent `refresh()` per
        micro-batch of new commits.

        The stream is purely a TRIGGER — refresh() reads the batch change
        feed itself from its own high-water mark, so a replayed or
        coalesced micro-batch can never double-apply (the mark, not the
        stream offset, is the source of truth). Copy-on-write commits
        stream too (materialized change files), so DML on the source
        refreshes the view, not just appends."""
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
