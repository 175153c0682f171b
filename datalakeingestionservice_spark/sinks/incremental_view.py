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

count and sum are fully self-maintainable (avg = sum / count at read
time). min/max are maintained with a PARTIAL-REBUILD escape hatch:
inserts fold in as least/greatest (self-maintainable), and only a delete
that provably ties-or-beats a group's stored extreme marks THAT group
endangered — endangered groups alone are rescanned from the source, via a
key-bounded predicated read (partition/stats pruning engages when the
source is laid out by the view keys) plus a broadcast semi-join on the
exact endangered keys. Refresh cost stays ∝ changed rows + data of
endangered groups, never ∝ table size.

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


def _delta_checkpoints_enabled() -> bool:
    import os as _os

    return _os.environ.get("DLIS_IVM_CHECKPOINT_DELTAS", "1") != "0"


def _materialize_delta(df: DataFrame) -> DataFrame:
    """Collapse a multi-consumer delta-sized plan with an eager
    localCheckpoint (guide §3.3/§5) — or pass it through untouched when
    ``DLIS_IVM_CHECKPOINT_DELTAS=0``.

    The checkpoint trades ONE extra up-front job (materialize |Δ| rows
    to executor-local storage) for every later consumer reading rows
    instead of re-running the delta subtree (change-feed scans + base-
    side joins). At cluster scale the subtree dominates and the
    checkpoint wins; on a latency-bound local run with a tiny Δ the
    extra job round-trip can exceed the recompute (the r14→r15
    cold-protocol A/B measures exactly this). The env knob keeps the
    setting parameterised instead of tuned to either environment.

    Durability: localCheckpoint blocks live on executor-local storage —
    an executor loss mid-refresh fails the statement (retry, never
    wrongness; commits are atomic and refreshes idempotent from marks).
    """
    if not _delta_checkpoints_enabled():
        return df
    return df.localCheckpoint(eager=True)


class SchemaDriftError(RuntimeError):
    """A source table's schema evolved under an active FULL-ROW join
    view (columns added/removed/retyped since the state materialized).
    Aggregate-state views CONVERGE through source evolution (their
    deltas project only the referenced expressions, and widened inputs
    fold through the state-type cast — pinned by tests), but a join
    view's state IS the row set: silently dropping a new column would
    diverge from a recompute, and silently evolving the state would
    change the view's schema under readers. Refuse with the recipe
    instead."""


# Options for every to_json-rendered merge key (__gid / __rk). The render
# must be session-independent: to_json formats timestamps using
# spark.sql.session.timeZone by default, so a refresh run from a session
# configured with a different timezone would render a DIFFERENT gid for
# the same group and silently strand/duplicate state rows. Pinning the
# timezone and timestamp format makes the encoding stable across sessions
# (state persists on disk and MaterializedView.open supports fresh
# sessions).
_GID_JSON_OPTS = {
    "ignoreNullFields": "false",
    "timeZone": "UTC",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


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
    mins / maxs: {output_column: source_expression} tracked as per-group
        extremes. Inserts fold in via least/greatest; a delete at the
        stored extreme triggers a rescan of ONLY that group (see module
        docstring). min/max ignore NULLs, exactly like SQL aggregates.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_root: str,
        view_root: str,
        keys: list[str] | dict[str, str],
        sums: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
        filter: str | None = None,
        distincts: dict[str, str] | None = None,
        avgs: dict[str, str] | None = None,
        stddevs: dict[str, str] | None = None,
        variances: dict[str, str] | None = None,
        null_safe_keys: bool = False,
    ):
        self.spark = spark
        self.source_root = source_root
        self.view_root = view_root
        #: NULL group keys are a contract violation under the default
        #: keying (SQL-MERGE equality never matches NULL — a NULL group
        #: would duplicate instead of combining). `null_safe_keys=True`
        #: keys the state by a hidden ``__gid`` column — the JSON
        #: encoding of the group-key struct with null fields KEPT (the
        #: outer-agg mixin's encoding) — while the real keys ride as
        #: payload; delta/state joins, the endangered-rescan semi-join,
        #: and the distinct side tables all key by gid. Needed when the
        #: source is an OUTER join's rendered rows (padded rows group
        #: under NULL keys); costs one string column of state.
        self._null_safe = bool(null_safe_keys)
        #: keys: a list of source COLUMN names, or {alias: expr} for
        #: COMPUTED group keys (the time-bucketed-rollup shape:
        #: {"day": "date_trunc('day', ts)"}). A computed key is a
        #: deterministic row expression, so it distributes over the
        #: change feed exactly like a column — maintenance projects the
        #: alias onto the snapshot, the feed, and the rescans before
        #: grouping. Stats-pruned endangered rescans engage only for
        #: plain-column keys (a computed value can't bound a source
        #: column); computed-key rescans fall back to the exact
        #: semi-join alone.
        if isinstance(keys, dict):
            self._key_exprs = dict(keys)
        else:
            self._key_exprs = {k: k for k in keys}
        self.keys = list(self._key_exprs)
        self.sums = dict(sums or {})
        #: AVG / sample VARIANCE / sample STDDEV are self-maintainable
        #: through their sufficient statistics: avg = Σx / n_nonnull,
        #: var = (Σx² − (Σx)²/n) / (n−1), std = sqrt(var). Each entry
        #: rides HIDDEN sum accumulators (`__ac_*` / `__vs_*`+`__vq_*`)
        #: maintained exactly like user sums (per-sum non-null
        #: counters included) and renders the ratio at read time —
        #: NULL below the minimum support (n=0 for avg, n<2 for
        #: var/std), like the SQL aggregates. The Σx² path carries the
        #: textbook subtractive-cancellation caveat for enormous means;
        #: at parity-check precision (rounded output) it matches a full
        #: recompute.
        self._avgs = dict(avgs or {})
        self._variances: dict[str, tuple[str, str]] = {
            **{c: ("var", e) for c, e in (variances or {}).items()},
            **{c: ("std", e) for c, e in (stddevs or {}).items()},
        }
        for out, e in self._avgs.items():
            self.sums[f"__ac_{out}"] = e
        for out, (_, e) in self._variances.items():
            self.sums[f"__vs_{out}"] = e
            self.sums[f"__vq_{out}"] = f"({e}) * ({e})"
        #: {output_column: source_expression} counted DISTINCT per
        #: group. COUNT(DISTINCT e) is the textbook not-self-
        #: maintainable aggregate — a delete alone can't tell whether
        #: it removed the LAST occurrence of a value — so each entry
        #: keeps AUXILIARY STATE: a side table at (keys, value) grain
        #: whose _n is the value's multiplicity, maintained by the same
        #: counting algorithm; the distinct count is a read-time
        #: aggregate over that state (bounded by #distinct values, not
        #: table size). NULL values are ignored, exactly like SQL.
        self.distincts = dict(distincts or {})
        #: optional SQL predicate over source columns — the view is
        #: the aggregate of σ_filter(source). Selection commutes with
        #: the counting delta algebra (a changed row affects the view
        #: iff it satisfies the predicate), so maintenance just filters
        #: the snapshot, the change feed, and the endangered rescans
        #: with the SAME deterministic predicate. SQL semantics: only
        #: TRUE rows pass (NULL excluded, like WHERE).
        self.filter = filter
        #: output col -> ("min" | "max", source expression)
        self._minmax: dict[str, tuple[str, str]] = {
            **{c: ("min", e) for c, e in (mins or {}).items()},
            **{c: ("max", e) for c, e in (maxs or {}).items()},
        }
        user_outputs = [
            *(sums or {}),
            *(mins or {}),
            *(maxs or {}),
            *self.distincts,
            *self._avgs,
            *self._variances,
        ]
        if len(set(user_outputs)) != len(user_outputs):
            raise ValueError(
                "aggregate output columns must be distinct"
            )
        if any(c.startswith("__") for c in user_outputs):
            raise ValueError(
                "output names starting with '__' are reserved for "
                "internal accumulators"
            )
        reserved = {_COUNT_COL, "__val", "__gid"} | {
            f"_nn_{c}" for c in self.sums
        }
        if reserved & (set(user_outputs) | set(self.keys)):
            raise ValueError(
                f"reserved column names: {sorted(reserved)} (count and "
                "per-sum non-null counters)"
            )

    def _gid(self, df: DataFrame) -> DataFrame:
        """Attach the null-safe group id (JSON of the key struct with
        null fields kept) — only meaningful under `null_safe_keys`."""
        return df.withColumn(
            "__gid",
            F.to_json(
                F.struct(*[F.col(k) for k in self.keys]),
                _GID_JSON_OPTS,
            ),
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

    def _distinct_root(self, col: str) -> str:
        return f"{self.view_root.rstrip('/')}__distinct_{col}"

    def read(self) -> DataFrame:
        """Current view state: keys, per-group count, per-group sums,
        min/max, distinct counts.

        Sums whose non-null counter is zero render as SQL NULL (exactly
        what a full `sum()` recompute yields for an all-NULL group); the
        internal `_nn_*` counters are not exposed. Distinct counts are
        a read-time aggregate over the (keys, value) side state —
        groups whose values are all NULL read 0, like COUNT(DISTINCT)."""
        table = self._view_table()
        if table is None:
            raise NoSuchVersionError(
                f"{self.view_root}: view not materialized; call refresh()"
            )
        state = table.read()
        types = {f.name: f.dataType for f in state.schema.fields}

        def avg_render(out_name: str):
            acc, nn = f"__ac_{out_name}", f"_nn___ac_{out_name}"
            return (
                F.when(F.col(nn) == 0, F.lit(None).cast("double"))
                .otherwise(F.col(acc).cast("double") / F.col(nn))
                .alias(out_name)
            )

        def var_render(out_name: str, fn: str):
            s, q = f"__vs_{out_name}", f"__vq_{out_name}"
            nn = f"_nn___vs_{out_name}"
            var = (
                F.col(q).cast("double")
                - F.col(s).cast("double") * F.col(s).cast("double")
                / F.col(nn)
            ) / (F.col(nn) - 1)
            var = F.greatest(var, F.lit(0.0))  # FP guard at var ~ 0
            expr = F.sqrt(var) if fn == "std" else var
            return (
                F.when(F.col(nn) < 2, F.lit(None).cast("double"))
                .otherwise(expr)
                .alias(out_name)
            )

        out = state.select(
            *self.keys,
            F.col(_COUNT_COL),
            *[
                F.when(
                    F.col(f"_nn_{c}") == 0, F.lit(None).cast(types[c])
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in self.sums
                if not c.startswith("__")
            ],
            # min/max carry SQL NULL naturally (all-NULL group => NULL
            # extreme) — no counter needed.
            *[F.col(c) for c in self._minmax],
            *[avg_render(c) for c in self._avgs],
            *[var_render(c, fn) for c, (fn, _) in self._variances.items()],
        )
        for col in self.distincts:
            side = VersionedTable(
                self.spark, self._distinct_root(col)
            ).read()
            if self._null_safe:
                # join the per-group counts on the group gid (NULL keys
                # never equality-match) — recomputed on both sides
                counts = (
                    self._gid(side)
                    .groupBy("__gid")
                    .agg(F.count(F.lit(1)).cast("long").alias(col))
                )
                out = (
                    self._gid(out)
                    .join(counts, "__gid", "left")
                    .drop("__gid")
                )
            else:
                counts = side.groupBy(*self.keys).agg(
                    F.count(F.lit(1)).cast("long").alias(col)
                )
                out = out.join(counts, self.keys, "left")
            out = out.withColumn(
                col, F.coalesce(F.col(col), F.lit(0).cast("long"))
            )
        return out

    # -- maintenance --------------------------------------------------------
    def _sigma(self, rows: DataFrame) -> DataFrame:
        """Apply the view's selection predicate (WHERE semantics: TRUE
        rows only) AND project computed group-key aliases — identically
        to snapshots, change feeds, and rescans, which is what makes
        both commute with the deltas."""
        if self.filter is not None:
            rows = rows.filter(
                F.coalesce(F.expr(self.filter), F.lit(False))
            )
        for alias, expr in self._key_exprs.items():
            if alias != expr:
                rows = rows.withColumn(alias, F.expr(expr))
        return rows

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
        for out, (fn, expr) in self._minmax.items():
            e = F.expr(expr)
            if sign is None:
                aggs.append(getattr(F, fn)(e).alias(out))
            else:
                # Deltas can't be signed for extremes; split by change
                # type in the SAME single shuffle: inserted extremes fold
                # in as least/greatest, deleted extremes only FLAG danger
                # (min of deleted values for a min col — a delete
                # endangers the stored extreme iff it ties or beats it).
                is_ins = F.col("_change_type") == "insert"
                aggs.append(
                    getattr(F, fn)(F.when(is_ins, e)).alias(f"__ins_{out}")
                )
                aggs.append(
                    getattr(F, fn)(F.when(~is_ins, e)).alias(f"__del_{out}")
                )
        out = rows.groupBy(*self.keys).agg(*aggs)
        return self._gid(out) if self._null_safe else out

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
            state = self._aggregate(self._sigma(source.read(latest)))
            VersionedTable.create(
                self.spark,
                self.view_root,
                state,
                summary={"source_version": latest},
                optimize_write=True,
            )
            self._refresh_distincts(source, latest, max_retries)
            return latest

        last = self.last_refreshed_version()
        if last is None:  # view table exists but was never stamped
            raise NoSuchVersionError(
                f"{self.view_root}: no source_version mark in history"
            )
        if latest <= last:
            # Idempotent: nothing new for the MAIN state — but a crash
            # between the main merge and a distinct side merge leaves
            # the side lagging, so drain those unconditionally.
            self._refresh_distincts(source, latest, max_retries)
            return None
        view_version = table.latest_version()

        feed = self._sigma(source.changes(last, latest))
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = self._aggregate(feed, sign=sign)

        state = table.read(view_version)
        accs = list(self.sums) + [f"_nn_{c}" for c in self.sums]
        mk = ["__gid"] if self._null_safe else self.keys
        d = delta.select(
            *self.keys,
            *(["__gid"] if self._null_safe else []),
            F.col(_COUNT_COL).alias(f"__d_{_COUNT_COL}"),
            *[F.col(c).alias(f"__d_{c}") for c in accs],
            *[
                F.col(f"__{side}_{c}")
                for c in self._minmax
                for side in ("ins", "del")
            ],
        )

        def provisional(c: str, fn: str):
            # least/greatest skip NULLs: a new group takes the inserted
            # extreme, an all-NULL insert batch keeps the stored one.
            combine = F.least if fn == "min" else F.greatest
            return combine(F.col(c), F.col(f"__ins_{c}"))

        def endangered(c: str, fn: str):
            # A delete endangers a stored extreme iff it ties or beats it
            # (multiplicity is not tracked, so a tie MAY have removed the
            # last row at the extreme — rescan decides).
            cmp = (
                F.col(f"__del_{c}") <= F.col(c)
                if fn == "min"
                else F.col(f"__del_{c}") >= F.col(c)
            )
            return F.col(c).isNotNull() & F.col(f"__del_{c}").isNotNull() & cmp

        danger = F.lit(False)
        for c, (fn, _) in self._minmax.items():
            danger = danger | endangered(c, fn)
        # Affected keys only: delta drives the join, state supplies the
        # old totals (left join keeps brand-new groups). Null-safe mode
        # joins on the gid (NULL keys never equality-match) and takes
        # the state's columns WITHOUT its key payload (d carries them).
        state_j = (
            state.drop(*self.keys) if self._null_safe else state
        )
        combined = d.join(state_j, mk, "left").select(
            *self.keys,
            *(["__gid"] if self._null_safe else []),
            (
                F.coalesce(F.col(_COUNT_COL), F.lit(0)) + F.col(f"__d_{_COUNT_COL}")
            ).alias(_COUNT_COL),
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                ).alias(c)
                for c in accs
            ],
            *[
                provisional(c, fn).alias(c)
                for c, (fn, _) in self._minmax.items()
            ],
            *([danger.alias("__endangered")] if self._minmax else []),
        )
        rescan_summary = {}
        if self._minmax:
            combined = self._patch_endangered(
                combined, source, latest, rescan_summary
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
                if c.name in state_types  # drop __endangered et al.
            ]
        )
        # Groups whose count hits 0 leave the view (counting algorithm).
        upserts = combined.withColumn(
            "__is_delete", F.col(_COUNT_COL) == 0
        )
        try:
            table.merge(
                upserts,
                mk,
                delete_col="__is_delete",
                summary={"source_version": latest, **rescan_summary},
                expected_version=view_version,
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            # Another refresh advanced the view while this one computed
            # its delta; recompute from the NEW mark (usually a no-op).
            return self.refresh(max_retries=max_retries - 1)
        self._refresh_distincts(source, latest, max_retries)
        return latest

    def _refresh_distincts(
        self, source: VersionedTable, latest: int, max_retries: int
    ) -> None:
        """Bring each COUNT(DISTINCT) side table to `latest`: the
        counting algorithm at (keys, value) grain. Each side table
        stamps its own high-water mark, so a crash between the main
        merge and a side merge self-repairs (the lagging table drains
        its own window next refresh); concurrent merges pin the side
        version and retry."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))

        def dgid(df: DataFrame) -> DataFrame:
            # null-safe merge key for the side state: JSON over the
            # group keys AND the value (keys may be NULL; __val is not)
            return df.withColumn(
                "__gid",
                F.to_json(
                    F.struct(
                        *[F.col(k) for k in self.keys], F.col("__val")
                    ),
                    _GID_JSON_OPTS,
                ),
            )

        for col, expr in self.distincts.items():
            root = self._distinct_root(col)
            try:
                t = VersionedTable(self.spark, root)
            except NoSuchVersionError:
                t = None
            if t is None:
                snap = self._sigma(source.read(latest))
                state = (
                    snap.withColumn("__val", F.expr(expr))
                    .filter(F.col("__val").isNotNull())
                    .groupBy(*self.keys, "__val")
                    .agg(F.count(F.lit(1)).alias(_COUNT_COL))
                )
                if self._null_safe:
                    state = dgid(state)
                VersionedTable.create(
                    self.spark,
                    root,
                    state,
                    summary={"source_version": latest},
                    optimize_write=True,
                )
                continue
            for _ in range(max_retries + 1):
                tv = t.latest_version()
                last = None
                for mm in reversed(t.versions()):
                    if "source_version" in mm.summary:
                        last = mm.summary["source_version"]
                        break
                if last is None:
                    raise NoSuchVersionError(
                        f"{root}: no source_version mark in history"
                    )
                if latest <= last:
                    break  # side table already current
                cols = [*self.keys, "__val"]
                mk = ["__gid"] if self._null_safe else cols
                delta = (
                    self._sigma(source.changes(last, latest))
                    .withColumn("__val", F.expr(expr))
                    .filter(F.col("__val").isNotNull())
                    .groupBy(*cols)
                    .agg(F.sum(sign).alias("__d"))
                )
                if self._null_safe:
                    delta = dgid(delta)
                    state = t.read(tv).select("__gid", _COUNT_COL)
                else:
                    state = t.read(tv).select(*cols, _COUNT_COL)
                combined = delta.join(state, mk, "left").select(
                    *cols,
                    *(["__gid"] if self._null_safe else []),
                    (
                        F.coalesce(F.col(_COUNT_COL), F.lit(0))
                        + F.col("__d")
                    )
                    .cast("long")
                    .alias(_COUNT_COL),
                )
                upserts = combined.withColumn(
                    "__is_delete", F.col(_COUNT_COL) == 0
                )
                try:
                    t.merge(
                        upserts,
                        mk,
                        delete_col="__is_delete",
                        summary={"source_version": latest},
                        expected_version=tv,
                    )
                    break
                except ConcurrentCommitError:
                    continue
            else:
                raise ConcurrentCommitError(
                    f"{root}: distinct merge lost {max_retries + 1} "
                    "consecutive version races"
                )

    def _patch_endangered(
        self,
        combined: DataFrame,
        source: VersionedTable,
        latest: int,
        rescan_summary: dict,
    ) -> DataFrame:
        """Replace provisional min/max of ENDANGERED groups (a delete tied
        or beat the stored extreme) with values rescanned from the source
        — only those groups, never the table.

        The rescan read is bounded two ways: a predicated `read` on the
        endangered keys' min/max per key column (engages partition-name /
        footer-stat dir+file pruning — lay the source out by the view keys
        and the rescan touches only their partitions) and a broadcast
        semi-join on the exact keys. The endangered key set is collected
        driver-side; it is bounded by the number of GROUPS the refresh
        batch deleted from, which is delta-scale, not table-scale."""
        combined = combined.localCheckpoint(eager=True)  # evaluated 2-3x
        ek_rows = (
            combined.filter(F.col("__endangered"))
            .select(*self.keys)
            .distinct()
            .collect()
        )
        rescan_summary["minmax_rescan_groups"] = len(ek_rows)
        if not ek_rows:
            return combined.drop("__endangered")

        bounds: list[tuple] = []
        for i, k in enumerate(self.keys):
            if self._key_exprs[k] != k:
                continue  # computed key: no source column to bound
            vals = [r[i] for r in ek_rows if r[i] is not None]
            if len(vals) == len(ek_rows):
                try:
                    bounds += [(k, ">=", min(vals)), (k, "<=", max(vals))]
                except TypeError:
                    pass  # unorderable key type: no range bound for it
        if bounds:
            info = source.prune_info(bounds, latest)
            rescan_summary["minmax_rescan_dirs_scanned"] = info["n_scanned"]
            rescan_summary["minmax_rescan_dirs_skipped"] = info["n_skipped"]
        keys_df = self.spark.createDataFrame(
            ek_rows, combined.select(*self.keys).schema
        )
        src_rows = self._sigma(
            source.read(latest, predicates=bounds or None)
        )
        rs_aggs = [
            getattr(F, fn)(F.expr(expr)).alias(f"__rs_{c}")
            for c, (fn, expr) in self._minmax.items()
        ]
        if self._null_safe:
            # NULL keys never equality-match: semi-join and group on the
            # gid computed over the SOURCE rows (endangered NULL groups
            # must rescan too)
            rescan = (
                self._gid(src_rows)
                .join(
                    F.broadcast(
                        self._gid(keys_df).select("__gid").distinct()
                    ),
                    "__gid",
                    "leftsemi",
                )
                .groupBy("__gid")
                .agg(*rs_aggs)
            )
            join_on = ["__gid"]
        else:
            rescan = (
                src_rows.join(F.broadcast(keys_df), self.keys, "leftsemi")
                .groupBy(*self.keys)
                .agg(*rs_aggs)
            )
            join_on = self.keys
        # A count-0 group has no rescan row (nothing left to aggregate);
        # its NULL patch is irrelevant — the merge deletes the group.
        patched = combined.join(rescan, join_on, "left").select(
            *[
                c
                for c in combined.columns
                if c != "__endangered" and c not in self._minmax
            ],
            *[
                F.when(F.col("__endangered"), F.col(f"__rs_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in self._minmax
            ],
        )
        return patched

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


class IncrementalJoinView:
    """Incrementally-maintained INNER equi-join materialized view over
    TWO versioned tables' change feeds — the JOIN half of Gupta &
    Mumick's delta rules (:class:`IncrementalAggView` is the Σ half):

        J = L ⋈ R        ΔJ = ΔL ⋈ R@r_old  ∪  L@l_new ⋈ ΔR

    evaluated as SIGNED multisets (insert +1 / delete −1). Using the
    OLD right snapshot in the first term and the NEW left snapshot in
    the second counts every changed pair exactly once — an update that
    touches both sides nets out the intermediate (new-left, old-right)
    pair with equal and opposite signs. Refresh cost is
    |Δ| ⋈ (other side) per term — never |L|×|R|, never a view rescan.

    Join rows are identified by ``(left_pk, right_pk)`` — each side's
    primary key, UNIQUE per side by contract (the realistic case for
    CDC-maintained tables; non-unique pks would make net effects
    exceed ±1 and the state merge refuses on duplicate keys rather
    than corrupting the view). Net effects apply as ONE state-table
    merge: net>0 rows upsert, net<0-only pairs delete — and a pure
    payload change (delete old row + insert new row, same pk pair)
    lands as a plain update.

    Non-key column names must be disjoint across the two sides (rename
    before constructing). The refresh high-water marks
    (``left_version``/``right_version``) ride in the view table's
    commit summary: refresh is idempotent and safe under concurrent
    refreshes (the merge pins ``expected_version``; a loser retries
    from the new marks, where it finds nothing to do)."""

    def __init__(
        self,
        spark: SparkSession,
        left_root: str,
        right_root: str,
        view_root: str,
        on: list[str],
        left_pk: str | list[str],
        right_pk: str,
        filter: str | None = None,
        synth_pk: str | None = None,
    ):
        self.spark = spark
        self.left_root = left_root
        self.right_root = right_root
        self.view_root = view_root
        self.on = list(on)
        self.left_pk = left_pk
        #: when set, the state carries an EXTRA column `synth_pk` — the
        #: timezone-pinned JSON render of the row's pk tuple — giving
        #: downstream consumers that need a SINGLE pk column (the outer
        #: padded machinery) a stable identity for composite-pk rows.
        #: Purely derived (a projection of the pk columns), computed
        #: identically on the bootstrap and every delta upsert.
        self.synth_pk = synth_pk
        #: the left side may be identified by a COMPOSITE key (a list):
        #: that's how chained joins cascade — the intermediate join
        #: view's rows are identified by the accumulated pk columns of
        #: every table joined so far, so the next stage treats that
        #: state table as a source whose "pk" is the whole tuple. The
        #: OUTER variants require a single left pk (their padded-set
        #: bookkeeping selects it as one column).
        self._left_pks = (
            [left_pk] if isinstance(left_pk, str) else list(left_pk)
        )
        self.right_pk = right_pk
        #: optional SQL predicate over the JOINED row (any output
        #: column): the view is σ_filter(L ⋈ R). Selection commutes
        #: with the signed join delta (σ(ΔJ) = Δ(σJ) for a
        #: row-deterministic predicate), so maintenance filters the
        #: bootstrap join and each delta term identically. The OUTER
        #: variants support it too, with the SQL posture (WHERE applies
        #: AFTER null-padding): their padded membership cannot come
        #: from the filtered inner state (a left row whose matches all
        #: fail the predicate yields NO row, not a padded row), so with
        #: a filter set they derive matched-ness from the raw other
        #: side's join keys and apply σ to the null-padded render —
        #: see :meth:`IncrementalLeftJoinView._sigma_padded`.
        self.filter = filter

    def _sides(self) -> tuple[VersionedTable, VersionedTable]:
        return (
            VersionedTable(self.spark, self.left_root),
            VersionedTable(self.spark, self.right_root),
        )

    def _view_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.view_root)
        except NoSuchVersionError:
            return None

    def last_refreshed_versions(self) -> tuple[int, int] | None:
        """(left_version, right_version) the view reflects, or None
        before the first refresh."""
        table = self._view_table()
        if table is None:
            return None
        for m in reversed(table.versions()):
            if "left_version" in m.summary:
                return (
                    m.summary["left_version"],
                    m.summary["right_version"],
                )
        return None

    def read(self) -> DataFrame:
        table = self._view_table()
        if table is None:
            raise NoSuchVersionError(
                f"{self.view_root}: view not materialized; call refresh()"
            )
        return table.read()

    def _out_cols(
        self, left: VersionedTable, right: VersionedTable
    ) -> list[str]:
        from pyspark.sql.types import StructType

        lcols = [
            f.name
            for f in StructType.fromDDL(left.manifest().schema_ddl).fields
        ]
        rcols = [
            f.name
            for f in StructType.fromDDL(right.manifest().schema_ddl).fields
        ]
        overlap = (set(lcols) & set(rcols)) - set(self.on)
        if overlap:
            raise ValueError(
                f"non-key columns {sorted(overlap)} exist on both "
                "sides; rename before constructing the view"
            )
        if self.synth_pk and self.synth_pk in set(lcols) | set(rcols):
            raise ValueError(
                f"synth_pk {self.synth_pk!r} collides with a source "
                "column"
            )
        return lcols + [c for c in rcols if c not in self.on]

    def _synth(self, rows: DataFrame) -> DataFrame:
        if not self.synth_pk:
            return rows
        pks = list(dict.fromkeys([*self._left_pks, self.right_pk]))
        return rows.withColumn(
            self.synth_pk,
            F.to_json(
                F.struct(*[F.col(c) for c in pks]), _GID_JSON_OPTS
            ),
        )

    def _sigma(self, rows: DataFrame) -> DataFrame:
        """Apply the view's selection predicate (WHERE semantics) —
        identically to the bootstrap join and every delta term."""
        if self.filter is None:
            return rows
        return rows.filter(
            F.coalesce(F.expr(self.filter), F.lit(False))
        )

    def _check_schema_drift(
        self, table: VersionedTable, out_cols: list[str], left, right
    ) -> None:
        """Refuse a refresh whose source schemas no longer match the
        materialized state (VERDICT r11 #4): added columns, removed
        columns, or retyped columns since the view materialized. The
        recipe is in the message; aggregate-state views skip this
        (their refresh only projects the referenced expressions)."""
        from pyspark.sql.types import StructType

        state = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromDDL(table.manifest().schema_ddl).fields
        }
        src = {}
        for side in (left, right):
            for f in StructType.fromDDL(
                side.manifest().schema_ddl
            ).fields:
                src.setdefault(f.name, f.dataType.simpleString())
        added = sorted(c for c in out_cols if c not in state)
        removed = sorted(
            c
            for c in state
            if c not in out_cols and c != self.synth_pk
        )
        retyped = sorted(
            c
            for c in out_cols
            if c in state and src.get(c) != state[c]
        )
        if added or removed or retyped:
            raise SchemaDriftError(
                f"{self.view_root}: source schema evolved under this "
                f"join view (added={added}, removed={removed}, "
                f"retyped={retyped}). A full-row join view cannot "
                "silently converge: rebuild it (drop the view root and "
                "refresh — one bootstrap join), or keep writing the "
                "sources with the view-era schema. Aggregate views "
                "over these sources converge without a rebuild."
            )

    def _signed_delta(
        self, left, right, l1, r1, l2, r2, out_cols
    ) -> DataFrame:
        """The join delta as raw signed FULL ROWS:
        ΔJ = ΔL⋈R@r1 ∪ L@l2⋈ΔR with __s = insert=+1/delete=−1, NOT yet
        netted — consumers that are linear in the sign (the aggregate-
        over-join composition) fold the signs directly without paying
        the net step's full-width shuffle."""
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        pieces: list[DataFrame] = []
        if l2 > l1:
            dl = left.changes(l1, l2).withColumn("__s", sign)
            pieces.append(
                self._sigma(
                    dl.join(right.read(r1), self.on)
                ).select(*out_cols, "__s")
            )
        if r2 > r1:
            dr = right.changes(r1, r2).withColumn("__s", sign)
            pieces.append(
                self._sigma(
                    left.read(l2).join(dr, self.on)
                ).select(*out_cols, "__s")
            )
        delta = pieces[0]
        for p in pieces[1:]:
            delta = delta.unionByName(p)
        return delta

    def _net_delta(
        self, left, right, l1, r1, l2, r2, out_cols
    ) -> DataFrame:
        """The join delta as netted signed FULL ROWS (__net ≠ 0):
        :meth:`_signed_delta` grouped by every output column so update
        churn cancels exactly — the form the row-level join-view apply
        needs (it must know WHICH rows change)."""
        return (
            self._signed_delta(left, right, l1, r1, l2, r2, out_cols)
            .groupBy(*out_cols)
            .agg(F.sum("__s").alias("__net"))
            .filter(F.col("__net") != 0)
        )

    def refresh(self, max_retries: int = 3) -> tuple[int, int] | None:
        """Bring the view up to both sources' latest versions. First
        call materializes the full join; later calls apply the two
        delta terms only. Returns the (left, right) versions the view
        now reflects, or None if nothing new."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        left, right = self._sides()
        l2, r2 = left.latest_version(), right.latest_version()
        table = self._view_table()
        out_cols = self._out_cols(left, right)

        if table is None:
            state = self._synth(
                self._sigma(
                    left.read(l2).join(right.read(r2), self.on)
                ).select(*out_cols)
            )
            VersionedTable.create(
                self.spark,
                self.view_root,
                state,
                summary={"left_version": l2, "right_version": r2},
                optimize_write=True,
            )
            return (l2, r2)

        marks = self.last_refreshed_versions()
        if marks is None:
            raise NoSuchVersionError(
                f"{self.view_root}: no version marks in history"
            )
        l1, r1 = marks
        if l2 <= l1 and r2 <= r1:
            return None  # idempotent: nothing new
        self._check_schema_drift(table, out_cols, left, right)
        view_version = table.latest_version()

        # Materialize the netted delta ONCE: `nets` feeds three consumers
        # (ups, dels' filter, dels' anti-join probe), and each reference
        # re-embeds the two join-delta terms — full base-side scans — into
        # the merge's updates plan (measured: 8 Exchanges, every input
        # scanned 3× in one action before this). The set is O(|Δ|), so one
        # bounded localCheckpoint collapses the updates plan to trivial
        # filters over a checkpointed input (guide §3.3).
        # Durability + cost trade documented at _materialize_delta.
        nets = _materialize_delta(
            self._synth(
                self._net_delta(left, right, l1, r1, l2, r2, out_cols)
            )
        )
        pks = list(dict.fromkeys([*self._left_pks, self.right_pk]))
        ups = nets.filter(F.col("__net") > 0).drop("__net").withColumn(
            "__is_delete", F.lit(False)
        )
        dels = (
            nets.filter(F.col("__net") < 0)
            .drop("__net")
            .join(ups.select(*pks), pks, "left_anti")
            .withColumn("__is_delete", F.lit(True))
        )
        try:
            table.merge(
                ups.unionByName(dels),
                pks,
                delete_col="__is_delete",
                summary={"left_version": l2, "right_version": r2},
                expected_version=view_version,
                # updates is filters + one anti-join over the
                # checkpointed `nets` — already deterministic and
                # cheap to re-evaluate; merge's own checkpoint would
                # be a second materialization of the same delta.
                updates_materialized=_delta_checkpoints_enabled(),
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            return self.refresh(max_retries=max_retries - 1)
        return (l2, r2)

    def start_continuous_refresh(
        self,
        checkpoint_dir: str,
        processing_time: str = "0 seconds",
    ) -> tuple:
        """Keep the join view fresh CONTINUOUSLY: each side's change
        stream (versions as offsets) triggers one idempotent
        `refresh()` per micro-batch — same trigger-not-data posture as
        :meth:`IncrementalAggView.start_continuous_refresh` (the marks,
        not the stream offsets, are the source of truth, so replayed or
        coalesced micro-batches can never double-apply; a refresh fired
        by one side simply also drains the other). Returns both
        StreamingQuery handles."""
        import os as _os

        from datalakeingestionservice_spark.sources.versioned_changes import (
            register,
        )

        register(self.spark)
        queries = []
        for tag, root in (
            ("l", self.left_root),
            ("r", self.right_root),
        ):
            feed = (
                self.spark.readStream.format("versioned_changes")
                .option("table_root", root)
                .load()
            )

            def _on_batch(batch_df, batch_id: int) -> None:
                self.refresh()

            queries.append(
                feed.writeStream.foreachBatch(_on_batch)
                .trigger(processingTime=processing_time)
                .option(
                    "checkpointLocation",
                    _os.path.join(checkpoint_dir, tag),
                )
                .start()
            )
        return tuple(queries)


class IncrementalLeftJoinView(IncrementalJoinView):
    """LEFT OUTER incrementally-maintained join view — the outer-join
    IVM extension on top of :class:`IncrementalJoinView`: unmatched
    left rows appear null-padded, and the padded set TRANSITIONS as
    deltas land (a right delete that removes a left row's last match
    must INSERT the padded row; a first match must DELETE it).

    State is TWO versioned tables under `view_root`: `inner/` is
    exactly the inner-join view (same delta algebra), `padded/` holds
    the LEFT columns of currently-unmatched live left rows. The padded
    maintenance is delta-scoped: only lefts touched by ΔL or whose join
    key appears in ΔR are re-examined (their match status comes from a
    semi-join of the refreshed inner state — or, when a ``filter`` is
    set, from the raw right side's join keys, because the inner state
    is then σ-filtered and can no longer witness matched-ness; the
    predicate applies to the null-padded render, which is SQL's
    WHERE-after-padding), never a left-table rescan.
    Each table stamps its own (left_version, right_version) marks, so a
    crash between the two merges repairs itself: the lagging table
    re-derives its delta from the change feeds (deterministic) while
    the current one is a no-op. First materialization is crash-safe
    too — a death between the inner create and the padded create is
    repaired by the next refresh finishing the padded bootstrap. The
    padded merge pins its expected version and retries on concurrent
    commits, so two racing refreshes (e.g. the two continuous-refresh
    streams) serialize instead of killing a micro-batch."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, filter=None):
        import os as _os

        if not isinstance(left_pk, str):
            raise ValueError(
                "outer join views need a SINGLE left pk column (the "
                "padded-set bookkeeping selects it); composite pks are "
                "an inner-chain feature"
            )
        super().__init__(
            spark, left_root, right_root,
            _os.path.join(view_root, "inner"),
            on, left_pk, right_pk, filter=filter,
        )
        self.outer_root = view_root
        self.padded_root = _os.path.join(view_root, "padded")

    def _sigma_padded(self, rows: DataFrame, other) -> DataFrame:
        """σ_filter over the null-padded render of unmatched rows —
        SQL applies WHERE AFTER padding, so an unmatched row belongs
        to the padded state only if the predicate holds with the
        `other` side's non-key columns NULL (a predicate that needs
        the other side excludes every padded row, exactly like a full
        recompute). Input carries one side's columns; output is the
        pred-passing subset, same shape."""
        if self.filter is None:
            return rows
        from pyspark.sql.types import StructType

        types = {
            f.name: f.dataType
            for f in StructType.fromDDL(other.manifest().schema_ddl).fields
        }
        cols = [c for c in types if c not in self.on]
        ext = rows.select(
            "*", *[F.lit(None).cast(types[c]).alias(c) for c in cols]
        )
        return self._sigma(ext).select(*rows.columns)

    def _padded_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.padded_root)
        except NoSuchVersionError:
            return None

    def _padded_marks(self) -> tuple[int, int] | None:
        t = self._padded_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "left_version" in m.summary:
                return (
                    m.summary["left_version"],
                    m.summary["right_version"],
                )
        return None

    def read(self) -> DataFrame:
        from pyspark.sql.types import StructType

        inner = super().read()
        padded = self._padded_table()
        if padded is None:
            raise NoSuchVersionError(
                f"{self.outer_root}: view not materialized; call refresh()"
            )
        _, right = self._sides()
        rtypes = {
            f.name: f.dataType
            for f in StructType.fromDDL(right.manifest().schema_ddl).fields
        }
        rcols = [c for c in rtypes if c not in self.on]
        ext = padded.read().select(
            "*",
            *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
        )
        return inner.unionByName(ext.select(*inner.columns))

    def _bootstrap_padded(self, left) -> tuple[int, int]:
        """Initial padded derivation at the INNER view's current marks:
        live lefts left-anti the inner state's left pks. Called on first
        materialization AND as the crash-repair path — a death between
        the inner create and the padded create leaves the inner present
        without a padded twin, and every refresh must be able to finish
        the job rather than raise forever."""
        im = self.last_refreshed_versions()
        if self.filter is None:
            lefts = (
                self._view_table().read().select(self.left_pk).distinct()
            )
            pad0 = left.read(im[0]).join(lefts, self.left_pk, "left_anti")
        else:
            # the inner state is σ-filtered — matched-ness must come
            # from the raw right side's join keys, and the predicate
            # applies to the null-padded render (WHERE-after-padding)
            _, right = self._sides()
            rkeys = right.read(im[1]).select(*self.on).distinct()
            pad0 = self._sigma_padded(
                left.read(im[0]).join(rkeys, self.on, "left_anti"), right
            )
        VersionedTable.create(
            self.spark,
            self.padded_root,
            pad0,
            summary={"left_version": im[0], "right_version": im[1]},
            optimize_write=True,
        )
        return im

    def refresh(self, max_retries: int = 3) -> tuple[int, int] | None:
        left, right = self._sides()
        l2, r2 = left.latest_version(), right.latest_version()

        if self._view_table() is None:
            inner_marks = super().refresh()  # materializes inner
            self._bootstrap_padded(left)
            return inner_marks

        # inner first (its marks drive the padded repair window)
        inner_res = super().refresh(max_retries=max_retries)
        if self._padded_table() is None:
            # crash repair: inner landed, padded create never did
            return self._bootstrap_padded(left)
        pm = self._padded_marks()
        if pm is not None and l2 <= pm[0] and r2 <= pm[1]:
            return inner_res  # padded already current
        self._refresh_padded(left, right, l2, r2, max_retries)
        return (l2, r2)

    def _refresh_padded(
        self, left, right, l2, r2, max_retries: int
    ) -> None:
        """Bring the padded table to (l2, r2), retrying on concurrent
        commits: the merge pins the padded version the delta was
        computed against, so a racing refresh (e.g. the two independent
        continuous-refresh streams) makes the loser re-read the marks —
        where it normally finds the winner already covered the window."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        for _ in range(max_retries + 1):
            pv = self._padded_table().latest_version()
            pm = self._padded_marks()
            if pm is None:
                raise NoSuchVersionError(
                    f"{self.padded_root}: no version marks in history"
                )
            pl1, pr1 = pm
            if l2 <= pl1 and r2 <= pr1:
                return  # padded already current
            try:
                self._apply_padded(left, right, pl1, pr1, l2, r2, pv)
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.padded_root}: padded merge lost {max_retries + 1} "
            "consecutive version races"
        )

    def _apply_padded(
        self, left, right, pl1, pr1, l2, r2, expected_version: int
    ) -> None:
        """Re-derive padded membership for every AFFECTED left row:
        those in ΔL plus those whose join key appears in ΔR. The merge
        pins the padded version the caller read its marks at — a
        concurrent padded merge raises ConcurrentCommitError to the
        caller's retry loop instead of silently interleaving."""
        padded = self._padded_table()
        L2 = left.read(l2)
        pieces = []
        if l2 > pl1:
            pieces.append(
                left.changes(pl1, l2).select(self.left_pk).distinct()
            )
        if r2 > pr1:
            dr_keys = (
                right.changes(pr1, r2).select(*self.on).distinct()
            )
            pieces.append(
                L2.join(dr_keys, self.on).select(self.left_pk).distinct()
            )
        affected = pieces[0]
        for p in pieces[1:]:
            affected = affected.unionByName(p)
        # Materialize the two delta-sized intermediates ONCE. `affected`
        # is referenced by three consumers and `pad_rows` by two, and each
        # reference re-embeds its whole subtree (change-feed scans, the
        # L2 semi-join, the inner-state semi-join) into the merge's
        # updates plan: measured at sf0.1, the un-materialized updates
        # plan carried 36 Exchanges and scanned the left base table 14
        # times inside one action (guide §3.3 — materialize a reused
        # intermediate to truncate the plan). Both sets are O(|Δ|), so
        # the localCheckpoint costs one bounded write each and the
        # updates plan collapses to a union of two checkpointed inputs;
        # the left table is scanned twice per padded refresh (once per
        # checkpoint), never per-reference. Cost trade + durability:
        # see _materialize_delta.
        affected = _materialize_delta(affected.distinct())

        live_aff = L2.join(affected, self.left_pk, "leftsemi")
        if self.filter is None:
            matched = (
                self._view_table()
                .read()
                .join(affected, self.left_pk, "leftsemi")
                .select(self.left_pk)
                .distinct()
            )
            pad_rows = live_aff.join(matched, self.left_pk, "left_anti")
        else:
            # filtered view: the inner state can't witness matched-ness
            # (rows failing σ are absent from it) — test against the
            # raw right keys, then σ over the null-padded render; an
            # unmatched row failing σ-on-padded drops out of pad_rows
            # and therefore lands in dels below. The raw key read is
            # BOUNDED to the affected keys (semi-join, delta-scoped —
            # ADVICE r11): only keys the affected left rows carry can
            # change matched-ness, so the distinct shuffle moves
            # O(affected) keys, never the whole right side.
            aff_on = live_aff.select(*self.on).distinct()
            rkeys = (
                right.read(r2)
                .select(*self.on)
                .join(aff_on, self.on, "leftsemi")
                .distinct()
            )
            pad_rows = self._sigma_padded(
                live_aff.join(rkeys, self.on, "left_anti"), right
            )
        pad_rows = _materialize_delta(pad_rows)
        dels = (
            affected.join(
                pad_rows.select(self.left_pk), self.left_pk, "left_anti"
            )
        )
        # delete-flagged rows only contribute their key to the merge;
        # pad their payload columns with typed NULLs
        lcols = [f for f in L2.schema.fields]
        dels_full = dels.select(
            *[
                F.col(self.left_pk).alias(f.name)
                if f.name == self.left_pk
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in lcols
            ]
        )
        updates = pad_rows.withColumn(
            "__is_delete", F.lit(False)
        ).unionByName(dels_full.withColumn("__is_delete", F.lit(True)))
        padded.merge(
            updates,
            [self.left_pk],
            delete_col="__is_delete",
            summary={"left_version": l2, "right_version": r2},
            expected_version=expected_version,
            # pad_rows and affected are checkpointed above; updates is
            # a union of projections/anti-joins over them — merge's own
            # checkpoint would re-materialize the same delta.
            updates_materialized=_delta_checkpoints_enabled(),
        )


class IncrementalJoinAggView(IncrementalJoinView):
    """Aggregate OVER a join, incrementally maintained — the classic
    select-project-join-aggregate IVM composition: E102's join delta
    rules feed E13's counting algorithm in ONE refresh, maintaining

        SELECT group_keys, count(*), sum(expr)… FROM L JOIN R GROUP BY …

    without materializing the join itself. The raw signed join rows
    (:meth:`IncrementalJoinView._signed_delta`) aggregate with their
    signs into per-group deltas (one shuffle over CHANGED join rows —
    the aggregation is linear in the sign, so the netting groupBy the
    row-level view needs would be a second, full-width shuffle whose
    only consumer is this sum), which
    merge into the group-state table exactly like the single-table agg
    view: counts add, NULL-free sum accumulators ride per-sum non-null
    counters, groups hitting count 0 leave. Extremes (min/max) need the
    partial-rebuild machinery and a materialized join to rescan — use
    :class:`IncrementalAggView` over an :class:`IncrementalJoinView`
    for those; this class keeps the join un-materialized, the right
    trade when the aggregate is the only consumer."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, group_keys, sums=None, filter=None):
        super().__init__(
            spark, left_root, right_root, view_root, on, left_pk,
            right_pk, filter=filter,
        )
        #: group_keys: join-output COLUMN names, or {alias: expr} for
        #: COMPUTED group keys (time-bucketed rollups over a join:
        #: {"mon": "substring(dt, 1, 7)"}). A computed key is a
        #: deterministic expression over the joined row, so it
        #: distributes over the signed join delta exactly like a
        #: column — the aggregation step projects the alias onto the
        #: bootstrap join and every netted delta before grouping.
        if isinstance(group_keys, dict):
            self._gk_exprs = dict(group_keys)
        else:
            self._gk_exprs = {k: k for k in group_keys}
        self.group_keys = list(self._gk_exprs)
        self.sums = dict(sums or {})
        reserved = {_COUNT_COL} | {f"_nn_{c}" for c in self.sums}
        if reserved & (set(self.sums) | set(self.group_keys)):
            raise ValueError(f"reserved column names: {sorted(reserved)}")

    def _project_group_keys(self, rows: DataFrame) -> DataFrame:
        """Project computed group-key aliases onto joined rows —
        identically for the bootstrap join and every delta term, which
        is what makes the computed key commute with the delta algebra."""
        for alias, expr in self._gk_exprs.items():
            if alias != expr:
                rows = rows.withColumn(alias, F.expr(expr))
        return rows

    def _agg(self, rows: DataFrame, sign=None) -> DataFrame:
        rows = self._project_group_keys(rows)
        weight = sign if sign is not None else F.lit(1)
        aggs = [F.sum(weight).alias(_COUNT_COL)]
        for out, expr in self.sums.items():
            e = F.expr(expr)
            aggs.append(
                F.coalesce(F.sum(e * weight), F.lit(0)).alias(out)
            )
            aggs.append(
                F.coalesce(
                    F.sum(e.isNotNull().cast("long") * weight), F.lit(0)
                ).alias(f"_nn_{out}")
            )
        return rows.groupBy(*self.group_keys).agg(*aggs)

    def read(self) -> DataFrame:
        table = self._view_table()
        if table is None:
            raise NoSuchVersionError(
                f"{self.view_root}: view not materialized; call refresh()"
            )
        state = table.read()
        types = {f.name: f.dataType for f in state.schema.fields}
        return state.select(
            *self.group_keys,
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

    def refresh(self, max_retries: int = 3) -> tuple[int, int] | None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        left, right = self._sides()
        l2, r2 = left.latest_version(), right.latest_version()
        table = self._view_table()
        out_cols = self._out_cols(left, right)

        if table is None:
            state = self._agg(
                self._sigma(
                    left.read(l2).join(right.read(r2), self.on)
                ).select(*out_cols)
            )
            VersionedTable.create(
                self.spark,
                self.view_root,
                state,
                summary={"left_version": l2, "right_version": r2},
                optimize_write=True,
            )
            return (l2, r2)

        marks = self.last_refreshed_versions()
        if marks is None:
            raise NoSuchVersionError(
                f"{self.view_root}: no version marks in history"
            )
        l1, r1 = marks
        if l2 <= l1 and r2 <= r1:
            return None
        view_version = table.latest_version()

        # The aggregation is LINEAR in the row sign, so it folds the raw
        # signed delta directly: netting first (groupBy over every output
        # column) would add a full-width exchange whose only consumer is
        # this sum — sum(e·__s) over raw rows == sum(e·__net) over netted
        # rows. One shuffle (by group keys, map-side partial agg) instead
        # of two. DLIS_IVM_SIGNED_DELTA=0 restores the netted form for
        # A/B measurement (value-identical by linearity).
        import os as _os

        if _os.environ.get("DLIS_IVM_SIGNED_DELTA", "1") == "0":
            netted = self._net_delta(
                left, right, l1, r1, l2, r2, out_cols
            )
            delta = self._agg(netted, sign=F.col("__net"))
        else:
            signed = self._signed_delta(
                left, right, l1, r1, l2, r2, out_cols
            )
            delta = self._agg(signed, sign=F.col("__s"))

        state = table.read(view_version)
        accs = list(self.sums) + [f"_nn_{c}" for c in self.sums]
        d = delta.select(
            *self.group_keys,
            F.col(_COUNT_COL).alias(f"__d_{_COUNT_COL}"),
            *[F.col(c).alias(f"__d_{c}") for c in accs],
        )
        combined = d.join(state, self.group_keys, "left").select(
            *self.group_keys,
            (
                F.coalesce(F.col(_COUNT_COL), F.lit(0)) + F.col(f"__d_{_COUNT_COL}")
            ).alias(_COUNT_COL),
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                ).alias(c)
                for c in accs
            ],
        )
        state_types = {f.name: f.dataType for f in state.schema.fields}
        combined = combined.select(
            *[
                F.col(c.name).cast(state_types[c.name]).alias(c.name)
                if c.dataType != state_types[c.name]
                else F.col(c.name)
                for c in combined.schema.fields
            ]
        )
        upserts = combined.withColumn(
            "__is_delete", F.col(_COUNT_COL) == 0
        )
        try:
            table.merge(
                upserts,
                self.group_keys,
                delete_col="__is_delete",
                summary={"left_version": l2, "right_version": r2},
                expected_version=view_version,
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            return self.refresh(max_retries=max_retries - 1)
        return (l2, r2)


class IncrementalFullJoinView(IncrementalLeftJoinView):
    """FULL OUTER incrementally-maintained join view: E105's padded
    machinery on BOTH sides — unmatched left rows ride with null right
    columns AND unmatched right rows ride with null left columns, each
    padded set transitioning as deltas land. State adds a third table
    (`rpadded/`, right columns of unmatched live rights) whose
    maintenance mirrors the left one symmetrically: affected rights =
    ΔR ∪ rights whose key ∈ ΔL, match status from one semi-join of the
    refreshed inner state. All three tables stamp marks; a crash
    between merges self-repairs (each lagging table re-derives from
    the deterministic change feeds)."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, filter=None):
        import os as _os

        super().__init__(
            spark, left_root, right_root, view_root, on, left_pk,
            right_pk, filter=filter,
        )
        self.rpadded_root = _os.path.join(view_root, "rpadded")

    def _rpadded_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.rpadded_root)
        except NoSuchVersionError:
            return None

    def _rpadded_marks(self) -> tuple[int, int] | None:
        t = self._rpadded_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "left_version" in m.summary:
                return (
                    m.summary["left_version"],
                    m.summary["right_version"],
                )
        return None

    def read(self) -> DataFrame:
        from pyspark.sql.types import StructType

        both = super().read()  # inner ∪ left-padded
        rpadded = self._rpadded_table()
        if rpadded is None:
            raise NoSuchVersionError(
                f"{self.outer_root}: view not materialized; call refresh()"
            )
        left, _ = self._sides()
        ltypes = {
            f.name: f.dataType
            for f in StructType.fromDDL(left.manifest().schema_ddl).fields
        }
        lcols = [c for c in ltypes if c not in self.on]
        ext = rpadded.read().select(
            "*",
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        )
        return both.unionByName(ext.select(*both.columns))

    def _bootstrap_rpadded(self, right) -> tuple[int, int]:
        """Initial right-padded derivation at the inner view's current
        marks — first materialization and crash repair (death between
        the left-padded create and this one), mirroring
        :meth:`IncrementalLeftJoinView._bootstrap_padded`."""
        im = self.last_refreshed_versions()
        if self.filter is None:
            rights = (
                self._view_table().read().select(self.right_pk).distinct()
            )
            rpad0 = right.read(im[1]).join(
                rights, self.right_pk, "left_anti"
            )
        else:
            left, _ = self._sides()
            lkeys = left.read(im[0]).select(*self.on).distinct()
            rpad0 = self._sigma_padded(
                right.read(im[1]).join(lkeys, self.on, "left_anti"), left
            )
        VersionedTable.create(
            self.spark,
            self.rpadded_root,
            rpad0,
            summary={"left_version": im[0], "right_version": im[1]},
            optimize_write=True,
        )
        return im

    def refresh(self, max_retries: int = 3) -> tuple[int, int] | None:
        left, right = self._sides()
        l2, r2 = left.latest_version(), right.latest_version()
        first = self._view_table() is None
        res = super().refresh(max_retries=max_retries)
        if first or self._rpadded_table() is None:
            self._bootstrap_rpadded(right)
            return res if first else self.last_refreshed_versions()
        rm = self._rpadded_marks()
        if rm is not None and l2 <= rm[0] and r2 <= rm[1]:
            return res  # rpadded already current
        self._refresh_rpadded(left, right, l2, r2, max_retries)
        return (l2, r2)

    def _refresh_rpadded(
        self, left, right, l2, r2, max_retries: int
    ) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        for _ in range(max_retries + 1):
            rv = self._rpadded_table().latest_version()
            rm = self._rpadded_marks()
            if rm is None:
                raise NoSuchVersionError(
                    f"{self.rpadded_root}: no version marks in history"
                )
            rl1, rr1 = rm
            if l2 <= rl1 and r2 <= rr1:
                return
            try:
                self._apply_rpadded(left, right, rl1, rr1, l2, r2, rv)
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.rpadded_root}: rpadded merge lost {max_retries + 1} "
            "consecutive version races"
        )

    def _apply_rpadded(
        self, left, right, pl1, pr1, l2, r2, expected_version: int
    ) -> None:
        rpadded = self._rpadded_table()
        R2 = right.read(r2)
        pieces = []
        if r2 > pr1:
            pieces.append(
                right.changes(pr1, r2).select(self.right_pk).distinct()
            )
        if l2 > pl1:
            dl_keys = left.changes(pl1, l2).select(*self.on).distinct()
            pieces.append(
                R2.join(dl_keys, self.on).select(self.right_pk).distinct()
            )
        affected = pieces[0]
        for p in pieces[1:]:
            affected = affected.unionByName(p)
        affected = affected.distinct()

        live_aff = R2.join(affected, self.right_pk, "leftsemi")
        if self.filter is None:
            matched = (
                self._view_table()
                .read()
                .join(affected, self.right_pk, "leftsemi")
                .select(self.right_pk)
                .distinct()
            )
            pad_rows = live_aff.join(matched, self.right_pk, "left_anti")
        else:
            # bounded as in _apply_padded: only affected-row keys matter
            aff_on = live_aff.select(*self.on).distinct()
            lkeys = (
                left.read(l2)
                .select(*self.on)
                .join(aff_on, self.on, "leftsemi")
                .distinct()
            )
            pad_rows = self._sigma_padded(
                live_aff.join(lkeys, self.on, "left_anti"), left
            )
        dels = affected.join(
            pad_rows.select(self.right_pk), self.right_pk, "left_anti"
        )
        rcols = [f for f in R2.schema.fields]
        dels_full = dels.select(
            *[
                F.col(self.right_pk).alias(f.name)
                if f.name == self.right_pk
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in rcols
            ]
        )
        updates = pad_rows.withColumn(
            "__is_delete", F.lit(False)
        ).unionByName(dels_full.withColumn("__is_delete", F.lit(True)))
        rpadded.merge(
            updates,
            [self.right_pk],
            delete_col="__is_delete",
            summary={"left_version": l2, "right_version": r2},
            expected_version=expected_version,
        )


class _OuterJoinAggMixin:
    """Aggregate IVM over an OUTER join — count/sum per group over the
    outer view's ROWS (inner matches ∪ null-padded unmatched rows),
    maintained incrementally: the group state consumes the change feeds
    of the outer view's OWN state tables (inner / padded / rpadded),
    so a padded-set TRANSITION (a row moving between matched and
    null-padded) reaches the aggregate as its natural delete+insert
    pair of signed rows — exactly the pad/unpad signed emissions the
    outer-join delta rules require, with no extra algebra: the state
    tables' merges already materialize full-row CDC.

    NULL group keys are first-class (the padded rows' natural group
    when grouping by the other side's columns): SQL-MERGE key equality
    can't match NULLs, so the group state is keyed by ``__gid`` — the
    JSON encoding of the group-key struct with null fields kept —
    while the real key columns ride as payload. count/sum only (avg =
    sum/count at read time); extremes need endangered-group rescans of
    the outer result — materialize the outer view and recompute
    extremes over it, or keep them on the inner via
    :class:`IncrementalAggView` over the join view's state table.

    Refresh cost: ∝ |state-table changes| (one shuffle over changed
    rows) + |touched groups| merge — never an outer-join rescan.
    Crash-safe like the rest of the family: the agg table stamps the
    state-table versions it reflects; a death before the agg merge is
    repaired by the next refresh draining the same feeds."""

    def _init_agg(self, view_root, group_keys, sums) -> None:
        import os as _os

        self.agg_root = _os.path.join(view_root, "agg")
        # list of join-output columns, or {alias: expr} computed keys
        # (projected onto every padded render before grouping — a key
        # expression over the missing side's columns lands in the NULL
        # group, exactly like the recompute)
        if isinstance(group_keys, dict):
            self._gk_exprs = dict(group_keys)
        else:
            self._gk_exprs = {k: k for k in group_keys}
        self.group_keys = list(self._gk_exprs)
        self.sums = dict(sums or {})
        reserved = (
            {_COUNT_COL, "__gid", "__s"}
            | {f"_nn_{c}" for c in self.sums}
        )
        if reserved & (set(self.sums) | set(self.group_keys)):
            raise ValueError(f"reserved column names: {sorted(reserved)}")

    def _agg_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.agg_root)
        except NoSuchVersionError:
            return None

    def _outer_parts(self):
        """[(mark_name, VersionedTable, padder)] — one entry per state
        table of the outer view; padder(df, extra) projects the table's
        rows to the outer row shape (typed NULLs for the missing
        side), carrying `extra` columns through."""
        from pyspark.sql.types import StructType

        left, right = self._sides()
        types = {
            f.name: f.dataType
            for f in StructType.fromDDL(left.manifest().schema_ddl).fields
        }
        types.update(
            (f.name, f.dataType)
            for f in StructType.fromDDL(right.manifest().schema_ddl).fields
        )
        out_cols = self._out_cols(left, right)

        def padder(df: DataFrame, extra: tuple = ()) -> DataFrame:
            return df.select(
                *[
                    F.col(c)
                    if c in df.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in out_cols
                ],
                *extra,
            )

        missing = {
            k for k in self.group_keys if self._gk_exprs[k] == k
        } - set(out_cols)
        if missing:
            raise ValueError(
                f"group keys {sorted(missing)} not in the outer join's "
                f"output columns {out_cols}"
            )
        parts = [
            ("inner", self._view_table(), padder),
            ("padded", self._padded_table(), padder),
        ]
        if hasattr(self, "_rpadded_table"):
            parts.append(("rpadded", self._rpadded_table(), padder))
        return parts

    def _agg_rows(self, rows: DataFrame, sign=None) -> DataFrame:
        for alias, expr in self._gk_exprs.items():
            if alias != expr:
                rows = rows.withColumn(alias, F.expr(expr))
        weight = sign if sign is not None else F.lit(1)
        aggs = [F.sum(weight).alias(_COUNT_COL)]
        for out, expr in self.sums.items():
            e = F.expr(expr)
            aggs.append(
                F.coalesce(F.sum(e * weight), F.lit(0)).alias(out)
            )
            aggs.append(
                F.coalesce(
                    F.sum(e.isNotNull().cast("long") * weight), F.lit(0)
                ).alias(f"_nn_{out}")
            )
        return (
            rows.groupBy(*self.group_keys)
            .agg(*aggs)
            .withColumn(
                "__gid",
                F.to_json(
                    F.struct(*[F.col(k) for k in self.group_keys]),
                    _GID_JSON_OPTS,
                ),
            )
        )

    def _agg_marks(self) -> dict | None:
        t = self._agg_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "inner_version" in m.summary:
                return {
                    k: v
                    for k, v in m.summary.items()
                    if k.endswith("_version")
                }
        return None

    def refresh(self, max_retries: int = 3):
        res = super().refresh(max_retries=max_retries)
        self._refresh_agg(max_retries)
        return res

    def _refresh_agg(self, max_retries: int) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        parts = self._outer_parts()
        latest = {name: t.latest_version() for name, t, _ in parts}
        marks_new = {f"{n}_version": v for n, v in latest.items()}
        at = self._agg_table()
        if at is None:
            snap = None
            for name, t, padder in parts:
                piece = padder(t.read(latest[name]))
                snap = piece if snap is None else snap.unionByName(piece)
            VersionedTable.create(
                self.spark,
                self.agg_root,
                self._agg_rows(snap),
                summary=marks_new,
                optimize_write=True,
            )
            return

        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        accs = list(self.sums) + [f"_nn_{c}" for c in self.sums]
        for _ in range(max_retries + 1):
            av = at.latest_version()
            marks = self._agg_marks()
            if marks is None:
                raise NoSuchVersionError(
                    f"{self.agg_root}: no version marks in history"
                )
            feeds = None
            for name, t, padder in parts:
                m = marks.get(f"{name}_version", 0)
                if latest[name] > m:
                    ch = padder(
                        t.changes(m, latest[name]).withColumn("__s", sign),
                        extra=("__s",),
                    )
                    feeds = ch if feeds is None else feeds.unionByName(ch)
            if feeds is None:
                return  # agg already current
            delta = self._agg_rows(feeds, sign=F.col("__s"))

            state = at.read(av)
            d = delta.select(
                "__gid",
                *self.group_keys,
                F.col(_COUNT_COL).alias(f"__d_{_COUNT_COL}"),
                *[F.col(c).alias(f"__d_{c}") for c in accs],
            )
            s = state.select("__gid", _COUNT_COL, *accs)
            combined = d.join(s, "__gid", "left").select(
                "__gid",
                *self.group_keys,
                (
                    F.coalesce(F.col(_COUNT_COL), F.lit(0))
                    + F.col(f"__d_{_COUNT_COL}")
                ).alias(_COUNT_COL),
                *[
                    (
                        F.coalesce(F.col(c), F.lit(0))
                        + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                    ).alias(c)
                    for c in accs
                ],
            )
            state_types = {
                f.name: f.dataType for f in state.schema.fields
            }
            combined = combined.select(
                *[
                    F.col(c.name).cast(state_types[c.name]).alias(c.name)
                    if c.dataType != state_types[c.name]
                    else F.col(c.name)
                    for c in combined.schema.fields
                ]
            )
            upserts = combined.withColumn(
                "__is_delete", F.col(_COUNT_COL) == 0
            )
            try:
                at.merge(
                    upserts,
                    ["__gid"],
                    delete_col="__is_delete",
                    summary=marks_new,
                    expected_version=av,
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.agg_root}: agg merge lost {max_retries + 1} "
            "consecutive version races"
        )

    def read(self) -> DataFrame:
        """The maintained aggregate: group keys (NULL group included),
        per-group count, per-group sums (NULL when every contributing
        input was NULL, exactly like a full recompute)."""
        table = self._agg_table()
        if table is None:
            raise NoSuchVersionError(
                f"{self.agg_root}: view not materialized; call refresh()"
            )
        state = table.read()
        types = {f.name: f.dataType for f in state.schema.fields}
        return state.select(
            *self.group_keys,
            F.col(_COUNT_COL),
            *[
                F.when(F.col(f"_nn_{c}") == 0, F.lit(None).cast(types[c]))
                .otherwise(F.col(c))
                .alias(c)
                for c in self.sums
            ],
        )

    def read_join(self) -> DataFrame:
        """The underlying outer-join rows (the parent view's read)."""
        return super().read()


class IncrementalLeftJoinAggView(
    _OuterJoinAggMixin, IncrementalLeftJoinView
):
    """count/sum GROUP BY over ``L LEFT OUTER JOIN R``, incrementally
    maintained — E106's composition extended to the outer join: padded
    transitions (a row moving between matched and null-padded changes
    its group's contribution) reach the aggregate as the padded state
    table's own CDC delete+insert pairs. See :class:`_OuterJoinAggMixin`
    for the algebra and the NULL-group key encoding."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, group_keys, sums=None, filter=None):
        super().__init__(
            spark, left_root, right_root, view_root, on, left_pk,
            right_pk, filter=filter,
        )
        self._init_agg(view_root, group_keys, sums)


class IncrementalFullJoinAggView(
    _OuterJoinAggMixin, IncrementalFullJoinView
):
    """count/sum GROUP BY over ``L FULL OUTER JOIN R``, incrementally
    maintained from all three state-table feeds (inner, padded,
    rpadded) — both sides' pad/unpad transitions flow into the group
    state as signed rows."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, group_keys, sums=None, filter=None):
        super().__init__(
            spark, left_root, right_root, view_root, on, left_pk,
            right_pk, filter=filter,
        )
        self._init_agg(view_root, group_keys, sums)


class IncrementalComposedJoinAggView:
    """MIN/MAX/COUNT(DISTINCT)/AVG/VARIANCE over an INNER join,
    maintained by AUTO-COMPOSING the two existing halves: an
    :class:`IncrementalJoinView` materializes the join rows under
    ``view_root/join`` (its state table IS the joined relation), and an
    :class:`IncrementalAggView` — which supports extremes, distinct
    counts, and moments natively — maintains the aggregate over that
    state table's change feed under ``view_root/state``. One refresh
    drains both in order; endangered-extreme rescans read the join
    STATE table, never the raw sources.

    This is the documented composition for aggregates that aren't
    self-maintainable over an un-materialized join (a deleted per-group
    minimum needs the surviving join rows to rescan), made a single
    object so the MV statement surface can accept ``MIN(price)`` over a
    join directly instead of refusing with instructions. The honest
    cost vs :class:`IncrementalJoinAggView` (count/sum only, join never
    materialized): state includes the full join rows — which is exactly
    what the rescan requires.

    Computed group keys and a WHERE filter compose through: the filter
    rides the join view (σ before materialization), the key expressions
    ride the agg view (projected onto the state feed before grouping)."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, group_keys, sums=None, mins=None,
                 maxs=None, distincts=None, avgs=None, stddevs=None,
                 variances=None, filter=None):
        import os as _os

        self.spark = spark
        self.view_root = view_root
        self.join = IncrementalJoinView(
            spark, left_root, right_root,
            _os.path.join(view_root, "join"),
            on, left_pk, right_pk, filter=filter,
        )
        self.agg = IncrementalAggView(
            spark,
            self.join.view_root,
            _os.path.join(view_root, "state"),
            keys=group_keys,
            sums=sums, mins=mins, maxs=maxs,
            distincts=distincts, avgs=avgs,
            stddevs=stddevs, variances=variances,
        )

    def refresh(self, max_retries: int = 3):
        """Drain base tables → join state → aggregate state."""
        res = self.join.refresh(max_retries=max_retries)
        self.agg.refresh(max_retries=max_retries)
        return res

    def read(self) -> DataFrame:
        return self.agg.read()

    def read_join(self) -> DataFrame:
        """The materialized join rows (the inner half's state)."""
        return self.join.read()

    def start_continuous_refresh(self, checkpoint_dir: str, **kw):
        """Both base feeds trigger the composed refresh (the marks are
        the truth, so coalesced or replayed batches can't double-apply)."""
        import os as _os

        from datalakeingestionservice_spark.sources.versioned_changes import (
            register,
        )

        register(self.spark)
        queries = []
        for tag, root in (
            ("l", self.join.left_root),
            ("r", self.join.right_root),
        ):
            feed = (
                self.spark.readStream.format("versioned_changes")
                .option("table_root", root)
                .load()
            )

            def _on_batch(batch_df, batch_id: int) -> None:
                self.refresh()

            queries.append(
                feed.writeStream.foreachBatch(_on_batch)
                .trigger(
                    processingTime=kw.get("processing_time", "0 seconds")
                )
                .option(
                    "checkpointLocation",
                    _os.path.join(checkpoint_dir, tag),
                )
                .start()
            )
        return tuple(queries)


class IncrementalComposedOuterJoinAggView:
    """MIN/MAX/COUNT(DISTINCT)/AVG/VARIANCE over an OUTER join — the
    composition that closes the family: the outer view's SQL-visible
    rows live across two-three state tables (inner + padded renders),
    so this class maintains a RENDERED table — every outer row as one
    versioned relation, keyed by ``__rk`` (JSON of the (left_pk,
    right_pk) pair with nulls kept: inner rows are (l, r), left-padded
    (l, null), right-padded (null, r) — unique across all three parts
    by construction) — merged from the state tables' own CDC exactly
    like the outer-agg mixin consumes them, then an
    :class:`IncrementalAggView` with ``null_safe_keys=True`` (padded
    rows group under NULL keys) maintains the aggregate over the
    rendered table's change feed. Pad/unpad transitions arrive as the
    natural delete+insert pair (the two rows differ in ``__rk``).

    One refresh drains base tables → outer state tables → rendered →
    aggregate. Endangered-extreme rescans read the RENDERED table (the
    outer join's rows), never the raw sources. Refresh cost: outer
    maintenance + |state-table changes| netted into one ``__rk`` merge
    + the agg's delta — never an outer-join rescan. The honest cost vs
    the count/sum-only outer agg (E109, no materialization): the
    rendered rows — exactly what the rescans need."""

    def __init__(self, spark, left_root, right_root, view_root, on,
                 left_pk, right_pk, group_keys, join_type="left",
                 sums=None, mins=None, maxs=None, distincts=None,
                 avgs=None, stddevs=None, variances=None, filter=None):
        import os as _os

        self.spark = spark
        self.view_root = view_root
        cls = {
            "left": IncrementalLeftJoinView,
            "full": IncrementalFullJoinView,
        }[join_type]
        self.outer = cls(
            spark, left_root, right_root,
            _os.path.join(view_root, "outer"),
            on, left_pk, right_pk, filter=filter,
        )
        self.rendered_root = _os.path.join(view_root, "rendered")
        self.agg = IncrementalAggView(
            spark,
            self.rendered_root,
            _os.path.join(view_root, "state"),
            keys=group_keys,
            sums=sums, mins=mins, maxs=maxs,
            distincts=distincts, avgs=avgs,
            stddevs=stddevs, variances=variances,
            null_safe_keys=True,
        )

    # -- rendered-table maintenance ------------------------------------------
    def _parts(self):
        """[(mark name, state table, padder)] — the outer view's state
        tables with a projector to the full outer row shape (typed
        NULLs for the missing side), the outer-agg mixin's recipe."""
        from pyspark.sql.types import StructType

        v = self.outer
        left, right = v._sides()
        types = {
            f.name: f.dataType
            for f in StructType.fromDDL(left.manifest().schema_ddl).fields
        }
        types.update(
            (f.name, f.dataType)
            for f in StructType.fromDDL(right.manifest().schema_ddl).fields
        )
        out_cols = v._out_cols(left, right)

        def padder(df: DataFrame, extra: tuple = ()) -> DataFrame:
            return df.select(
                *[
                    F.col(c)
                    if c in df.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in out_cols
                ],
                *extra,
            )

        parts = [
            ("inner", v._view_table(), padder),
            ("padded", v._padded_table(), padder),
        ]
        if hasattr(v, "_rpadded_table"):
            parts.append(("rpadded", v._rpadded_table(), padder))
        return parts, out_cols

    def _rk(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__rk",
            F.to_json(
                F.struct(
                    F.col(self.outer.left_pk), F.col(self.outer.right_pk)
                ),
                _GID_JSON_OPTS,
            ),
        )

    def _rendered_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.rendered_root)
        except NoSuchVersionError:
            return None

    def _rendered_marks(self) -> dict | None:
        t = self._rendered_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "inner_version" in m.summary:
                return {
                    k: v
                    for k, v in m.summary.items()
                    if k.endswith("_version")
                }
        return None

    def _refresh_rendered(self, max_retries: int) -> None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        parts, out_cols = self._parts()
        latest = {name: t.latest_version() for name, t, _ in parts}
        marks_new = {f"{n}_version": v for n, v in latest.items()}
        rt = self._rendered_table()
        if rt is None:
            snap = None
            for name, t, padder in parts:
                piece = padder(t.read(latest[name]))
                snap = piece if snap is None else snap.unionByName(piece)
            VersionedTable.create(
                self.spark,
                self.rendered_root,
                self._rk(snap),
                summary=marks_new,
                optimize_write=True,
            )
            return

        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        for _ in range(max_retries + 1):
            rv = rt.latest_version()
            marks = self._rendered_marks()
            if marks is None:
                raise NoSuchVersionError(
                    f"{self.rendered_root}: no version marks in history"
                )
            feeds = None
            for name, t, padder in parts:
                m = marks.get(f"{name}_version", 0)
                if latest[name] > m:
                    ch = padder(
                        t.changes(m, latest[name]).withColumn("__s", sign),
                        extra=("__s",),
                    )
                    feeds = ch if feeds is None else feeds.unionByName(ch)
            if feeds is None:
                return  # rendered already current
            nets = (
                self._rk(feeds)
                .groupBy(*out_cols, "__rk")
                .agg(F.sum("__s").alias("__net"))
                .filter(F.col("__net") != 0)
            )
            ups = (
                nets.filter(F.col("__net") > 0)
                .drop("__net")
                .withColumn("__is_delete", F.lit(False))
            )
            dels = (
                nets.filter(F.col("__net") < 0)
                .drop("__net")
                .join(ups.select("__rk"), ["__rk"], "left_anti")
                .withColumn("__is_delete", F.lit(True))
            )
            try:
                rt.merge(
                    ups.unionByName(dels),
                    ["__rk"],
                    delete_col="__is_delete",
                    summary=marks_new,
                    expected_version=rv,
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"{self.rendered_root}: rendered merge lost "
            f"{max_retries + 1} consecutive version races"
        )

    # -- operations ------------------------------------------------------------
    def refresh(self, max_retries: int = 3):
        """Drain base tables → outer state → rendered rows → aggregate."""
        res = self.outer.refresh(max_retries=max_retries)
        self._refresh_rendered(max_retries)
        self.agg.refresh(max_retries=max_retries)
        return res

    def read(self) -> DataFrame:
        return self.agg.read()

    def read_join(self) -> DataFrame:
        """The rendered outer rows (one relation, __rk hidden)."""
        t = self._rendered_table()
        if t is None:
            raise NoSuchVersionError(
                f"{self.rendered_root}: not materialized; call refresh()"
            )
        return t.read().drop("__rk")

    def start_continuous_refresh(self, checkpoint_dir: str, **kw):
        import os as _os

        from datalakeingestionservice_spark.sources.versioned_changes import (
            register,
        )

        register(self.spark)
        queries = []
        for tag, root in (
            ("l", self.outer.left_root),
            ("r", self.outer.right_root),
        ):
            feed = (
                self.spark.readStream.format("versioned_changes")
                .option("table_root", root)
                .load()
            )

            def _on_batch(batch_df, batch_id: int) -> None:
                self.refresh()

            queries.append(
                feed.writeStream.foreachBatch(_on_batch)
                .trigger(
                    processingTime=kw.get("processing_time", "0 seconds")
                )
                .option(
                    "checkpointLocation",
                    _os.path.join(checkpoint_dir, tag),
                )
                .start()
            )
        return tuple(queries)


class IncrementalTopKView:
    """Top-k rows PER GROUP (the leaderboard view), incrementally
    maintained — min/max's partial-rebuild idea extended k-deep: the
    state holds each group's current top-k rows (ranked by
    ``order_col`` with pk tie-break, descending by default), and a
    refresh recomputes ONLY the groups the change feed touched.

    Delta rules per touched group:

    - inserts alone fold in WITHOUT a source read: the new top-k is a
      re-rank of (stored top-k ∪ inserted rows) — correct because a
      row outside the old top-k can't enter the new one when nothing
      left;
    - any delete of a row INSIDE the stored top-k ENDANGERS the group
      (its k+1-th row was never stored) → that group alone rescans
      from the source via a broadcast semi-join on the endangered
      keys; a delete below the stored k-th is provably irrelevant and
      costs nothing;
    - updates ride the feed as delete+insert and land in whichever
      case their old row was in.

    Refresh cost: ∝ |Δ| + (endangered groups' source rows); never a
    table rescan, never a global sort — the per-group rank is a
    window over touched groups only. Rows are identified by ``pk``
    (unique per source row) for the state merge; marks/idempotency/
    concurrency follow the family contract."""

    def __init__(
        self,
        spark: SparkSession,
        source_root: str,
        view_root: str,
        keys: list[str],
        order_col: str,
        k: int,
        pk: str,
        ascending: bool = False,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.spark = spark
        self.source_root = source_root
        self.view_root = view_root
        self.keys = list(keys)
        self.order_col = order_col
        self.k = int(k)
        self.pk = pk
        self.ascending = ascending

    # -- state access -------------------------------------------------------
    def _view_table(self) -> VersionedTable | None:
        try:
            return VersionedTable(self.spark, self.view_root)
        except NoSuchVersionError:
            return None

    def last_refreshed_version(self) -> int | None:
        t = self._view_table()
        if t is None:
            return None
        for m in reversed(t.versions()):
            if "source_version" in m.summary:
                return m.summary["source_version"]
        return None

    def read(self) -> DataFrame:
        t = self._view_table()
        if t is None:
            raise NoSuchVersionError(
                f"{self.view_root}: view not materialized; call refresh()"
            )
        return t.read()

    # -- maintenance --------------------------------------------------------
    def _order(self):
        c = F.col(self.order_col)
        return [
            c.asc() if self.ascending else c.desc(),
            F.col(self.pk).asc(),
        ]

    def _topk(self, rows: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(*self.keys).orderBy(*self._order())
        return (
            rows.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.k)
            .drop("__rk")
        )

    def refresh(self, max_retries: int = 3) -> int | None:
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        source = VersionedTable(self.spark, self.source_root)
        latest = source.latest_version()
        t = self._view_table()
        if t is None:
            VersionedTable.create(
                self.spark,
                self.view_root,
                self._topk(source.read(latest)),
                summary={"source_version": latest},
                optimize_write=True,
            )
            return latest

        last = self.last_refreshed_version()
        if last is None:
            raise NoSuchVersionError(
                f"{self.view_root}: no source_version mark in history"
            )
        if latest <= last:
            return None  # idempotent
        view_version = t.latest_version()
        state = t.read(view_version)

        feed = source.changes(last, latest)
        ins = feed.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
        del_pks = feed.filter(F.col("_change_type") == "delete").select(
            self.pk, *self.keys
        )
        # endangered groups: a delete hit a row currently IN the state
        endangered = (
            del_pks.join(
                state.select(self.pk), self.pk, "leftsemi"
            )
            .select(*self.keys)
            .distinct()
        )
        # fold-in groups: touched by inserts, NOT endangered
        ins_groups = ins.select(*self.keys).distinct()
        fold_groups = ins_groups.join(
            endangered, self.keys, "left_anti"
        )

        # endangered groups rescan from source — those groups only,
        # via a broadcast semi-join on the exact keys (collected:
        # bounded by groups-with-deletes-in-topk, delta-scale)
        e_rows = endangered.collect()
        pieces = []
        if e_rows:
            keys_df = self.spark.createDataFrame(
                e_rows, endangered.schema
            )
            rescan = source.read(latest).join(
                F.broadcast(keys_df), self.keys, "leftsemi"
            )
            pieces.append(self._topk(rescan))
        # fold-in: re-rank stored state ∪ inserts of those groups
        folded = (
            state.join(fold_groups, self.keys, "leftsemi")
            .unionByName(
                ins.join(fold_groups, self.keys, "leftsemi").select(
                    *state.columns
                )
            )
        )
        pieces.append(self._topk(folded))
        new_top = pieces[0]
        for p in pieces[1:]:
            new_top = new_top.unionByName(p)

        touched = endangered.unionByName(fold_groups).distinct()
        # rows of touched groups that fell out of (or left) the top-k
        dels = (
            state.join(touched, self.keys, "leftsemi")
            .join(new_top.select(self.pk), self.pk, "left_anti")
            .select(self.pk, *[c for c in state.columns if c != self.pk])
        )
        pk_cols = [self.pk]
        updates = new_top.withColumn(
            "__is_delete", F.lit(False)
        ).unionByName(dels.withColumn("__is_delete", F.lit(True)))
        try:
            t.merge(
                updates,
                pk_cols,
                delete_col="__is_delete",
                summary={
                    "source_version": latest,
                    "topk_rescan_groups": len(e_rows),
                },
                expected_version=view_version,
            )
        except ConcurrentCommitError:
            if max_retries <= 0:
                raise
            return self.refresh(max_retries=max_retries - 1)
        return latest

    def start_continuous_refresh(
        self,
        checkpoint_dir: str,
        processing_time: str = "0 seconds",
    ):
        """Change-stream trigger, marks are the source of truth —
        family contract (see IncrementalAggView)."""
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
