"""Batch Python DataSource over the versioned table: `spark.read.format(
"versioned")` with PLANNER-INTEGRATED pruning.

`VersionedTable.read(predicates=...)` prunes when the caller passes
predicates explicitly; this source closes the loop with Spark's own filter
pushdown: Catalyst hands the reader its `Filter`s via `pushFilters`, the
reader maps the comparison subset onto the manifest's partition-name /
bloom / min-max stats and plans ONE input partition per surviving entry
(or per surviving FILE, using the per-file stats) — so a plain

    spark.read.format("versioned").option("table_root", root).load()
         .filter("l_shipdate >= '1998-01-01'")

skips data the same way the explicit API does, with zero predicate
plumbing in user code, and works from pure SQL over a temp view. Filters
are reported as NOT fully handled (pruning is conservative, entry-level),
so Spark re-applies them row-level — results are always exact.

Time travel rides on options: `version` (int) or `timestamp` (ISO; largest
version committed at-or-before); `branch` (name) serves a named ref's
manifest chain instead of main — the WAP audit read, composable with
`version`/`timestamp` within the branch. Executors read the selected
parquet directly with pyarrow (same path as the streaming change source),
with hive partition values injected from the manifest driver-side.

Merge-on-read tables are served: live deferred-delete predicates in the
compilable subset (comparisons, AND/OR/NOT, IS NULL, IN, BETWEEN —
`sources/sql_predicates.py`) are compiled driver-side to a serializable
AST and evaluated executor-side with pyarrow.compute under SQL
three-valued logic, scoped to exactly the entries each predicate recorded
(later appends are never filtered). A predicate outside the subset is
refused driver-side with a pointer — `VersionedTable.read()` always
works, and `compact()` materializes the deletes and lifts the refusal.

Reference anchor: the reference reads its sources through a factory of
connector classes (`src/Infrastructure/DataExtraction/DataSourceFactory.cs:16-34`);
a Spark DataSource is the lake-native "new source kind" with planner
cooperation instead of hand-rolled readers.
"""

from __future__ import annotations

import glob
import os
import re
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from datalakeingestionservice_spark.sinks.versioned import (
    _MANIFEST_DIR,
    Manifest,
    NoSuchVersionError,
    _default_fill_text,
    _entry_may_match,
    _file_may_match,
    _typed_part_value,
)
from datalakeingestionservice_spark.sources.sql_predicates import (
    UnsupportedPredicateError,
    compile_predicate,
    keep_mask,
)
from datalakeingestionservice_spark.sources.versioned_changes import (
    _ddl_field_names,
    _ddl_field_types,
    _ddl_fields,
)

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _load_manifest(root: str, options: dict) -> Manifest:
    from datalakeingestionservice_spark.sinks.versioned import (
        load_all_manifests,
    )

    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        raise NoSuchVersionError(f"{root} is not a versioned table")
    if options.get("branch") and options.get("tag"):
        # A tag names a MAIN version; resolving that number inside a
        # branch's chain could serve a branch-local snapshot with the
        # same number but different content — silent wrong data. Match
        # the SQL front door's one-of-BRANCH/TAG grammar and the
        # writer's refusal posture: refuse, never reinterpret.
        raise ValueError(
            f"{root}: options 'branch' and 'tag' are mutually "
            "exclusive (a tag pins a main version; it cannot be "
            "resolved inside a branch's chain)"
        )
    if options.get("branch"):
        from datalakeingestionservice_spark.sinks.versioned import (
            _BRANCHES_SUBDIR,
            _branch_names,
        )

        branch = str(options["branch"])
        mdir = os.path.join(mdir, _BRANCHES_SUBDIR, branch)
        if not os.path.isdir(mdir):
            raise NoSuchVersionError(
                f"{root}: no branch {branch!r} "
                f"(existing: {_branch_names(root)})"
            )
    # Forward-pass loader reconstructs delta-encoded versions (torn
    # claims skipped) — the same storage layer the session class uses.
    manifests = load_all_manifests(mdir)
    if not manifests:
        raise NoSuchVersionError(f"{root}: no committed versions")
    if options.get("tag"):
        from datalakeingestionservice_spark.sinks.versioned import (
            NoSuchTagError,
            _tag_versions,
        )

        tag = str(options["tag"])
        tags = _tag_versions(root)
        if tag not in tags:
            raise NoSuchTagError(
                f"{root}: no tag {tag!r} (existing: {sorted(tags)})"
            )
        options = {**options, "version": str(tags[tag])}
    if options.get("version"):
        want = int(options["version"])
        for m in manifests:
            if m.version == want:
                return m
        raise NoSuchVersionError(f"{root}: no version {want}")
    if options.get("timestamp"):
        import datetime as _dt

        ts = _dt.datetime.fromisoformat(options["timestamp"])
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        best = None
        for m in manifests:
            if _dt.datetime.fromisoformat(m.committed_at) <= ts:
                best = m
        if best is None:
            raise NoSuchVersionError(
                f"{root}: no version committed at or before {ts}"
            )
        return best
    return manifests[-1]


def _arrow_type_from_simple(s: str):
    """Spark simpleString -> the arrow type Spark's own parquet writes
    produce for it (sessionless text mapping — no StructType). None for
    types the vectorized path doesn't cover (caller falls back to
    row-at-a-time yield)."""
    import pyarrow as pa

    flat = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if s in flat:
        return flat[s]
    if s.startswith(("varchar", "char")):
        return pa.string()
    if s.startswith("decimal"):
        try:
            p, sc = s[s.index("(") + 1 : s.rindex(")")].split(",")
            return pa.decimal128(int(p), int(sc))
        except (ValueError, IndexError):
            return None
    if s.startswith("array<") and s.endswith(">"):
        inner = _arrow_type_from_simple(s[6:-1])
        return pa.list_(inner) if inner is not None else None
    if s.startswith("struct<") and s.endswith(">"):
        from datalakeingestionservice_spark.sources.sql_predicates import (
            _split_top,
        )

        fields = []
        for part in _split_top(s[len("struct<"):-1]):
            name, _, t = part.partition(":")
            it = _arrow_type_from_simple(t)
            if it is None:
                return None
            fields.append(pa.field(name, it))
        return pa.struct(fields)
    if s.startswith("map<") and s.endswith(">"):
        from datalakeingestionservice_spark.sources.sql_predicates import (
            _split_top,
        )

        parts = _split_top(s[len("map<"):-1])
        if len(parts) != 2:
            return None
        kt, vt = (_arrow_type_from_simple(p2) for p2 in parts)
        return pa.map_(kt, vt) if kt is not None and vt is not None else None
    return None


class _EntryPartition(InputPartition):
    def __init__(
        self,
        paths,
        columns,
        physical,
        part_fill,
        preds=None,
        types=None,
        filters=None,
        pos_dirs=None,
        root=None,
        eq_dels=None,
    ):
        self.paths = paths  # absolute parquet file or dir paths
        self.columns = columns  # logical output order
        self.physical = physical  # same order, file-side names
        self.part_fill = part_fill or {}  # keyed by LOGICAL name
        self.preds = preds or []  # compiled deferred-delete ASTs
        self.types = types or []  # simpleString per logical column
        #: Pushed (physical col, op, value) comparisons safe to hand to
        #: pyarrow as dataset filters (row-group pruning + early row
        #: drop); Spark re-applies them anyway, and arrow-vs-Spark
        #: comparison parity for this subset is pinned by
        #: tests/test_sql_predicates.py.
        self.filters = filters or []
        #: Absolute position-delete parquet dirs scoped to this entry
        #: (merge-on-read position deletes) + table root, needed to
        #: compute each data file's root-relative coordinate key.
        self.pos_dirs = pos_dirs or []
        self.root = root
        #: Equality deletes scoped to this entry: (abs parquet dir,
        #: key-column tuple) pairs, applied as a key anti-join.
        self.eq_dels = eq_dels or []


class VersionedTableReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["table_root"]
        self.m = _load_manifest(self.root, options)
        self._columns = _ddl_field_names(self.m.schema_ddl)
        self._types = _ddl_field_types(self.m.schema_ddl)
        # Merge-on-read: compile each live deferred-delete predicate
        # driver-side (logical column names — the executor builds the
        # LOGICAL table before filtering, so column mapping needs no
        # extra translation here). Outside the subset -> documented
        # refusal, never a wrong answer.
        self._mor: list[tuple[list, tuple[str, ...]]] = []
        #: Position deletes: (delete-dir rel, scoped entry rels) — no
        #: compilation needed, coordinates are engine-neutral.
        self._mor_pos: list[tuple[str, tuple[str, ...]]] = []
        #: Equality deletes: (delete-dir rel, key cols, scoped entry
        #: rels) — applied executor-side as a key anti-join.
        self._mor_eq: list[tuple[str, tuple[str, ...], tuple[str, ...]]] = []
        for p in self.m.delete_predicates:
            if "pos" in p:
                self._mor_pos.append(
                    (
                        p["pos"],
                        tuple(
                            e.replace(os.sep, "/")
                            for e in p["entries"]
                        ),
                    )
                )
                continue
            if "eq" in p:
                self._mor_eq.append(
                    (
                        p["eq"],
                        tuple(p["cols"]),
                        tuple(
                            e.replace(os.sep, "/")
                            for e in p["entries"]
                        ),
                    )
                )
                continue
            try:
                ast = compile_predicate(p["sql"], self._types)
            except UnsupportedPredicateError as e:
                raise ValueError(
                    f"{self.root} carries a merge-on-read delete "
                    f"predicate outside the compilable subset "
                    f"({p['sql']!r}: {e}); read via "
                    "VersionedTable.read() or materialize it with "
                    "compact()"
                ) from e
            self._mor.append(
                (
                    ast,
                    tuple(
                        e.replace(os.sep, "/") for e in p["entries"]
                    ),
                )
            )
        # Column mapping: files/stats/partition dirs use PHYSICAL names;
        # the planner sees logical ones. The logical->physical list ships
        # to executors in each InputPartition.
        cmap = self.m.column_mapping.get("map", {})
        self._physical = [cmap.get(c, c) for c in self._columns]
        self._fwd = {
            c: p for c, p in zip(self._columns, self._physical) if c != p
        }
        self._preds: list[tuple] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Collect the comparison subset for manifest-level pruning.
        EVERY filter is yielded back as unhandled: entry-level stats can
        only prove absence, not membership, so Spark must re-apply the
        predicates row-level (exactness over double-filtering cost)."""
        for f in filters:
            op = _OPS.get(type(f))
            if (
                op is not None
                and len(f.attribute) == 1
                and f.value is not None
            ):
                self._preds.append((f.attribute[0], op, f.value))
            yield f

    def partitions(self) -> list[InputPartition]:
        # Type partition values from the FULL schema, not the current
        # spec: after partition evolution, old-spec leaves carry
        # part_values for columns outside m.partition_by, and typing them
        # as strings would both weaken pruning and inject wrongly-typed
        # fill values. Stats/part_values are keyed PHYSICAL.
        from datalakeingestionservice_spark.sinks.versioned import (
            _entry_derived_preds,
            _entry_specs,
            _spec_alias_types,
        )

        back = {p: c for c, p in self._fwd.items()}
        part_types = {
            self._fwd.get(c, c): t for c, t in self._types.items()
        }
        # Hidden partitioning: transform aliases get dir-value types and
        # pushed source-column predicates derive alias predicates. Alias
        # types union current + historical + per-entry-snapshot specs.
        part_types.update(
            _spec_alias_types(
                self.m.partition_by, self._fwd, self._types,
                self.m.past_specs + _entry_specs(self.m.stats),
            )
        )
        base_preds = [
            (self._fwd.get(c, c), op, v) for c, op, v in self._preds
        ]
        derive_cache: dict = {}

        def mor_for(rel: str) -> list[list]:
            """Deferred-delete ASTs scoped to this entry: a predicate
            applies iff its recorded rel equals the entry or is an
            ancestor (covers partition leaves and file entries carried
            forward by a scoped merge) — same rule as
            VersionedTable._scan_entries."""
            r = rel.replace(os.sep, "/")
            return [
                ast
                for ast, entries in self._mor
                if any(
                    r == pr or r.startswith(pr.rstrip("/") + "/")
                    for pr in entries
                )
            ]

        def pos_for(rel: str) -> list[str]:
            """Position-delete dirs scoped to this entry (same ancestor
            rule); absolute paths for the executor."""
            r = rel.replace(os.sep, "/")
            return [
                os.path.join(self.root, drel)
                for drel, entries in self._mor_pos
                if any(
                    r == pr or r.startswith(pr.rstrip("/") + "/")
                    for pr in entries
                )
            ]

        def eq_for(rel: str) -> list[tuple[str, tuple[str, ...]]]:
            """Equality-delete (abs dir, key cols) pairs scoped to this
            entry (same ancestor rule)."""
            r = rel.replace(os.sep, "/")
            return [
                (os.path.join(self.root, drel), cols)
                for drel, cols, entries in self._mor_eq
                if any(
                    r == pr or r.startswith(pr.rstrip("/") + "/")
                    for pr in entries
                )
            ]

        # Pushed filters safe to hand pyarrow as dataset filters (row-
        # group pruning + early row drop, physical names): plain-typed
        # comparisons only — arrow/Spark comparison parity for these is
        # pinned by the sql_predicates battery; Spark re-applies every
        # filter row-level regardless.
        import datetime as _dt

        scan_filters = [
            (c, op, v)
            for c, op, v in base_preds
            if (
                isinstance(v, (int, str, float, _dt.date))
                and not isinstance(v, bool)
                and not isinstance(v, _dt.datetime)
            )
        ]
        col_types = [self._types[c] for c in self._columns]
        parts: list[_EntryPartition] = []
        for rel in self.m.files:
            stats = self.m.stats.get(rel, {})
            # Per-entry derivation: an entry with a spec snapshot gets
            # transform-alias predicates derived from EXACTLY its own
            # spec (exact across partition/param evolution); legacy
            # entries use the union/ambiguity-excluded derivation.
            # Derived alias predicates never reach scan_filters — alias
            # columns are dir-only, and the executor reader drops
            # filters on columns absent from the file anyway.
            preds = (
                _entry_derived_preds(
                    base_preds, stats, self.m.partition_by, self._fwd,
                    self._types, self.m.past_specs, derive_cache,
                )
                or []
            )
            if preds and not _entry_may_match(stats, preds, part_types):
                continue
            raw_pv = stats.get("part_values")
            fill = (
                {
                    back.get(c, c): _typed_part_value(
                        raw, part_types.get(c, "string")
                    )
                    for c, raw in raw_pv.items()
                }
                if raw_pv
                else None
            )
            # Initial defaults (add_column): entries scoped by a
            # default ride the SAME fill path as hive partition values
            # — the executor fills only when the column is physically
            # absent from the file, which is exactly the initial-
            # default precedence (stored values, even NULL, win).
            if self.m.column_defaults:
                r = rel.replace(os.sep, "/")
                dfl = {}
                for col, spec in self.m.column_defaults.items():
                    if any(
                        r == e or r.startswith(e.rstrip("/") + "/")
                        for e in spec["entries"]
                    ):
                        txt = _default_fill_text(spec["default"])
                        if txt is not None:
                            dfl[col] = _typed_part_value(
                                txt, self._types.get(col, "string")
                            )
                if dfl:
                    fill = {**(fill or {}), **dfl}
            abs_entry = os.path.join(self.root, rel)
            fmap = stats.get("files")
            if preds and fmap:
                keep = [
                    fn
                    for fn, fs in sorted(fmap.items())
                    if _file_may_match(fs, preds)
                ]
                if len(keep) < len(fmap):
                    if keep:
                        parts.append(
                            _EntryPartition(
                                [
                                    os.path.join(abs_entry, fn)
                                    for fn in keep
                                ],
                                self._columns,
                                self._physical,
                                fill,
                                mor_for(rel),
                                col_types,
                                scan_filters,
                                pos_for(rel),
                                self.root,
                                eq_for(rel),
                            )
                        )
                    continue
            parts.append(
                _EntryPartition(
                    [abs_entry],
                    self._columns,
                    self._physical,
                    fill,
                    mor_for(rel),
                    col_types,
                    scan_filters,
                    pos_for(rel),
                    self.root,
                    eq_for(rel),
                )
            )
        if not parts:
            # Everything pruned: Spark still needs >= 1 input partition;
            # an empty path list yields zero rows with the full schema.
            parts.append(
                _EntryPartition(
                    [], self._columns, self._physical, None, [],
                    col_types, [],
                )
            )
        return parts

    def read(self, partition: _EntryPartition) -> Iterator:
        # Executor-side: straight pyarrow scan, schema-evolution tolerant
        # (files predating an added column yield None), hive partition
        # values injected from the manifest, physical->logical handled by
        # reading file columns under their PHYSICAL names and emitting in
        # logical order. Deferred-delete predicates (if any apply to this
        # entry) filter the LOGICAL table with Kleene three-valued masks
        # before rows are emitted — arrow's filter drops NULL-mask rows,
        # matching Spark's `filter(~expr(pred))` exactly.
        #
        # VECTORIZED by default: when every column's type maps to arrow,
        # the logical table is yielded as RecordBatches (Spark ingests
        # them Arrow-to-Arrow — no per-row Python); pushed comparison
        # filters additionally reach pyarrow as dataset filters, pruning
        # row groups and dropping rows before they ever materialize.
        # Unmappable types fall back to row-at-a-time tuples.
        import pyarrow as pa
        import pyarrow.parquet as pq

        files: list[str] = []
        for p in partition.paths:
            if os.path.isdir(p):
                files.extend(
                    sorted(glob.glob(os.path.join(p, "*.parquet")))
                )
            else:
                files.append(p)
        fill = partition.part_fill
        pairs = list(zip(partition.columns, partition.physical))
        atypes = [
            _arrow_type_from_simple(t) for t in partition.types
        ] or [None] * len(pairs)
        vectorized = len(atypes) == len(pairs) and all(
            t is not None for t in atypes
        )
        # Merge-on-read POSITION deletes: load the scoped delete dirs'
        # (file_rel, pos) coordinates once per partition; each data
        # file's deleted ordinals become a boolean keep-mask. A file
        # with deletions must be read WITHOUT pushed dataset filters
        # (positions index the raw file rows; Spark re-applies every
        # filter row-level anyway).
        pos_tab = None
        if partition.pos_dirs:
            dparts = []
            for d in partition.pos_dirs:
                for fdel in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                    dparts.append(
                        pq.read_table(fdel, columns=["file_rel", "pos"])
                    )
            if dparts:
                pos_tab = pa.concat_tables(dparts)
        # Equality-delete key sets, loaded ONCE per partition: (logical
        # key cols, deduped ARROW key table) per scoped delete file.
        # Kept arrow-native end to end: a pandas round-trip would turn
        # an int64 key column containing NULLs into float64, and float
        # comparison of keys above 2^53 can wrongly match (row silently
        # deleted) or miss (deleted row served) — the session reader's
        # left_anti join is exact, so this side must be too.
        eq_sets = []
        for eq_dir, eq_cols in partition.eq_dels:
            efs = sorted(glob.glob(os.path.join(eq_dir, "*.parquet")))
            if not efs:
                continue
            del_tab = pa.concat_tables(
                [pq.read_table(f, columns=list(eq_cols)) for f in efs]
            )
            if del_tab.num_rows:
                eq_sets.append(
                    (
                        list(eq_cols),
                        del_tab.group_by(list(eq_cols)).aggregate([]),
                    )
                )
        for path in files:
            deleted_pos = None
            if pos_tab is not None:
                import pyarrow.compute as pc

                rel = os.path.relpath(path, partition.root).replace(
                    os.sep, "/"
                )
                hits = pos_tab.filter(
                    pc.equal(pos_tab.column("file_rel"), rel)
                )
                if hits.num_rows:
                    deleted_pos = hits.column("pos").to_pylist()
            available = set(pq.read_schema(path).names)
            want = [p for _, p in pairs if p in available]
            filters = [
                (c, "==" if op == "=" else op, v)
                for c, op, v in partition.filters
                if c in available
            ] or None
            if deleted_pos is not None:
                filters = None
            try:
                raw = pq.read_table(path, columns=want, filters=filters)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # A filter pyarrow can't evaluate on this file's
                # physical type: read unfiltered (Spark re-applies).
                raw = pq.read_table(path, columns=want)
            n = raw.num_rows
            cols = {}
            for i, (c, p) in enumerate(pairs):
                target = atypes[i] if vectorized else None
                if p in available:
                    col = raw.column(p)
                    if target is not None and col.type != target:
                        col = col.cast(target)
                    cols[c] = col
                elif fill.get(c) is not None:
                    cols[c] = pa.array([fill[c]] * n, type=target)
                else:
                    cols[c] = pa.nulls(n, type=target)
            logical = pa.table(cols)
            if deleted_pos is not None:
                import numpy as np

                keep = np.ones(n, dtype=bool)
                live = [int(x) for x in deleted_pos if 0 <= int(x) < n]
                if live:
                    keep[np.array(live, dtype=np.int64)] = False
                logical = logical.filter(pa.array(keep))
            # Merge-on-read EQUALITY deletes: anti-join the key values
            # (loaded once per partition, above). `logical` always
            # carries every table column (the reader does not prune
            # columns), so key columns are present; rows with a NULL
            # key value never match (SQL join semantics — Acero's
            # hash join never pairs a null key). Arrow-native left-semi
            # join against a row-index column, so int64 keys stay
            # exact (no pandas float64 coercion of nullable ints).
            for eq_cols, del_tabk in eq_sets:
                if not logical.num_rows:
                    break
                import numpy as np

                keys = logical.select(eq_cols)
                del_cast = pa.table(
                    {
                        c: del_tabk.column(c).cast(
                            keys.schema.field(c).type
                        )
                        for c in eq_cols
                    }
                )
                idx = keys.append_column(
                    "__row",
                    pa.array(
                        np.arange(logical.num_rows), type=pa.int64()
                    ),
                )
                hit = idx.join(
                    del_cast, keys=eq_cols, join_type="left semi"
                )
                if hit.num_rows:
                    keepm = np.ones(logical.num_rows, dtype=bool)
                    keepm[hit.column("__row").to_numpy()] = False
                    logical = logical.filter(pa.array(keepm))
            if partition.preds:
                mask = keep_mask(partition.preds, logical)
                if mask is not None:
                    logical = logical.filter(mask)
            if vectorized:
                yield from logical.to_batches()
            else:
                pys = [
                    logical.column(i).to_pylist()
                    for i in range(logical.num_columns)
                ]
                yield from zip(*pys)


def _arrow_type_for(dt):
    """Spark DataType -> the arrow type whose parquet encoding Spark
    reads back as the SAME Spark type (TimestampType must carry
    tz='UTC' so parquet gets isAdjustedToUTC and round-trips as
    timestamp, not timestamp_ntz; session tz is normalized to UTC by
    prepare_session, so the naive datetimes Spark hands the writer ARE
    UTC wall times)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type_for(dt.elementType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [
                pa.field(f.name, _arrow_type_for(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.MapType):
        return pa.map_(
            _arrow_type_for(dt.keyType), _arrow_type_for(dt.valueType)
        )
    raise ValueError(
        f"unsupported column type for the versioned writer: "
        f"{dt.simpleString()}"
    )


def _spark_type_from_simple(s: str):
    """Spark DataType for the widening-eligible simpleStrings only
    (ints, float/double, decimal) — None otherwise."""
    import re as _re

    from pyspark.sql import types as T

    plain = {
        "tinyint": T.ByteType, "smallint": T.ShortType,
        "int": T.IntegerType, "bigint": T.LongType,
        "float": T.FloatType, "double": T.DoubleType,
    }
    if s in plain:
        return plain[s]()
    mm = _re.match(r"decimal\((\d+),\s*(\d+)\)", s)
    if mm:
        return T.DecimalType(int(mm.group(1)), int(mm.group(2)))
    return None


def _datatype_from_simple(s: str):
    """Spark DataType from a simpleString, SESSIONLESS (StructType.
    fromDDL needs an active session, which Python DataSource workers
    don't have) — atomic types only, the set a literal write default
    can type. None for anything else (caller refuses)."""
    from pyspark.sql import types as T

    flat = {
        "tinyint": T.ByteType(),
        "smallint": T.ShortType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "binary": T.BinaryType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }
    if s in flat:
        return flat[s]
    md = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", s)
    if md:
        return T.DecimalType(int(md.group(1)), int(md.group(2)))
    return None


def _normalize_narrow_columns(schema, table_ddl: str):
    """Replace incoming column types that are NARROWER than the table's
    (safe promotion chains) with the table type; anything else passes
    through untouched for `_evolved_ddl_text` to adjudicate."""
    from pyspark.sql.types import StructField, StructType

    from datalakeingestionservice_spark.sinks.versioned import (
        _widened_simple,
    )
    from datalakeingestionservice_spark.sources.versioned_changes import (
        _ddl_field_types,
    )

    ttypes = _ddl_field_types(table_ddl)
    out = []
    changed = False
    for f in schema.fields:
        ts = ttypes.get(f.name)
        fs = f.dataType.simpleString()
        if ts is not None and ts != fs and _widened_simple(ts, fs) == ts:
            dt = _spark_type_from_simple(ts)
            if dt is not None:
                out.append(StructField(f.name, dt, True))
                changed = True
                continue
        out.append(f)
    return StructType(out) if changed else schema


def _evolved_ddl_text(schema, merge_schema: bool, table_ddl: str) -> str:
    """Sessionless twin of `VersionedTable._evolved_schema_ddl`: the
    writer's commit worker has no SparkContext, so `fromDDL` is
    unavailable — but the manifest's `struct<...>` simpleString is
    byte-splicable, and type equality on simpleStrings equals DataType
    equality for every type the writer supports.

    Type differences on the SAFE promotion chains (`_widened_simple`:
    int chain, float→double, decimal precision at fixed scale) follow
    the session append's rules: a WIDER incoming column evolves the
    table type under merge_schema=True (Delta's type widening — old
    files keep their narrow physical type; both readers upcast), a
    NARROWER incoming column is accepted against the existing type
    (covers a concurrent widening committed mid-write: the staged
    files are narrower than the new table type, which the evolved
    marker already handles). Off-chain differences raise."""
    from datalakeingestionservice_spark.sinks.versioned import (
        SchemaMismatchError,
        _widened_simple,
    )

    tnames = _ddl_field_names(table_ddl)
    ttypes = _ddl_field_types(table_ddl)
    inc = {f.name: f.dataType.simpleString() for f in schema.fields}
    widened: dict[str, str] = {}
    for fname, ft in inc.items():
        if fname in ttypes and ttypes[fname] != ft:
            w = _widened_simple(ttypes[fname], ft)
            if w is None:
                raise SchemaMismatchError(
                    f"column {fname!r}: table has {ttypes[fname]}, "
                    f"append has {ft}"
                )
            if w != ttypes[fname]:
                if not merge_schema:
                    raise SchemaMismatchError(
                        f"column {fname!r}: append widens "
                        f"{ttypes[fname]} to {w}; pass "
                        "merge_schema=True to evolve the type"
                    )
                widened[fname] = w
    added = [f for f in schema.fields if f.name not in ttypes]
    missing = [n for n in tnames if n not in inc]
    if not merge_schema and (added or missing):
        raise SchemaMismatchError(
            f"append schema {schema.simpleString()} != table schema "
            f"{table_ddl}; pass merge_schema=True to evolve"
        )
    if not added and not widened:
        return table_ddl
    rebuilt = [
        f"{tok.split(':', 1)[0]}:"
        f"{widened.get(tok.split(':', 1)[0], tok.split(':', 1)[1])}"
        for tok in _ddl_fields(table_ddl)
    ]
    rebuilt += [
        f"{f.name}:{f.dataType.simpleString()}" for f in added
    ]
    return "struct<" + ",".join(rebuilt) + ">"


def _part_segment(col: str, v) -> str:
    """One `col=value` hive path segment, escaped the way Spark's
    partition discovery (and `_parse_part_path`) unescape it, with
    value strings formatted so `_typed_part_value` and a Spark
    string-cast both round-trip them."""
    import datetime as _dt
    from urllib.parse import quote

    from datalakeingestionservice_spark.sinks.versioned import _HIVE_NULL

    if v is None:
        return f"{col}={_HIVE_NULL}"
    if isinstance(v, bool):
        s = "true" if v else "false"
    elif isinstance(v, _dt.datetime):
        s = v.isoformat(sep=" ")
    elif isinstance(v, _dt.date):
        s = v.isoformat()
    else:
        s = str(v)
    return f"{col}={quote(s, safe='')}"


class _StagedWrite(WriterCommitMessage):
    def __init__(
        self, n_rows: int, blooms: dict, files: list[str], staging: str
    ):
        self.n_rows = n_rows
        #: {leaf rel ('' for unpartitioned): {col: b64 bitmap}} folded
        #: by this task.
        self.blooms = blooms
        #: Staged file paths relative to `staging` (leaf prefix
        #: included) — BOTH commits move exactly these, so completed
        #: files from a failed-then-retried or speculatively-executed
        #: task attempt (same shared staging dir, different task uuid)
        #: can never be published alongside the winning attempt's.
        self.files = files
        #: Absolute staging dir the TASK wrote into. The streaming
        #: commit runner deserializes a SEPARATE writer instance (its
        #: own staging uuid), so the task's dir must travel in the
        #: message.
        self.staging = staging


class VersionedTableWriter(DataSourceArrowWriter):
    """`df.write.format("versioned").mode("append"|"overwrite")` —
    executor tasks receive Arrow RecordBatches (`DataSourceArrowWriter`:
    Spark ships columnar batches, zero Python row handling), stage
    parquet under `<root>/_staging/<uuid>` and `commit()` publishes
    through the table's own commit protocol. EVERY phase of the Python
    DataSource write API runs in sessionless Python workers (Spark
    executes even the driver-side commit in a separate interpreter, no
    SparkSession), so the whole path is pure Python + pyarrow:

    - schema validation reuses the table's own append rules on the
      writer's StructType (merge_schema option = Delta-style evolution);
    - CHECK constraints compile through `sql_predicates` and are
      enforced ON THE EXECUTORS against each Arrow batch BEFORE any
      bytes hit disk (a violation fails the task, Spark aborts the job,
      `abort()` removes the staging dir — nothing to clean);
    - bloom-configured tables keep their blooms: each task folds its
      rows' bit positions into per-column bitmaps shipped in its commit
      message, and `commit()` ORs them — identical bitmaps to the
      Spark-side aggregate, no second scan;
    - append is ZERO-COPY: the staged dir moves into `data/`, stats
      harvested from footers; concurrent commits rebase exactly like
      `VersionedTable.append`;
    - overwrite replaces the snapshot; its change feed is DEFERRED, not
      lost (a sessionless worker cannot materialize the snapshot-sized
      diff at commit): the batch `changes()` computes the diff lazily,
      and `materialize_changes()` backfills the change files so the
      STREAMING source serves the version too — or use
      `VersionedTable.overwrite` for commit-time materialization;
    - table absent -> the write CREATES it (`partition_by` and
      `bloom_columns` options honored).

    Hive-partitioned and column-mapped tables are served natively
    (leaf splitting / physical names happen in the tasks). An
    orphaned staging dir from a hard crash is invisible to readers and
    reclaimed by `vacuum()`."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        import uuid as _uuid

        from datalakeingestionservice_spark.sinks.versioned import (
            _BLOOM_TYPES,
            _log_to_phys,
        )
        from datalakeingestionservice_spark.sources.sql_predicates import (
            compile_predicate,
        )

        if "table_root" not in options:
            raise ValueError(
                "the versioned writer needs .option(\"table_root\", ...): "
                "Spark's Python DataSource API does not forward catalog-"
                "table OPTIONS/LOCATION to writers, so SQL INSERT INTO a "
                "CREATE TABLE ... USING versioned table cannot reach the "
                "table root; write via df.write.format(\"versioned\") "
                "(reads work from SQL over a temp view)"
            )
        if options.get("branch") or options.get("tag"):
            # A writer that silently landed a "branch write" on main
            # would be exactly the wrong-target hazard refs exist to
            # prevent; the sessionless commit worker has no branch
            # machinery, so refuse rather than reinterpret.
            raise ValueError(
                "the versioned writer commits to MAIN only; to write to "
                "a branch use the session API "
                "(VersionedTable.branch(name).append(...)); tags are "
                "immutable and never a write target"
            )
        self.root = options["table_root"]
        self.overwrite = overwrite
        self.merge_schema = (
            str(options.get("merge_schema", "false")).lower() == "true"
        )
        #: Roll staged files at this many rows so one long task never
        #: produces an unboundedly large parquet file (~400 MB at
        #: ~100 B/row with the default).
        self.rows_per_file = int(options.get("rows_per_file", 4_000_000))
        if self.rows_per_file <= 0:
            raise ValueError("rows_per_file must be positive")
        self.staging = os.path.join(
            self.root, "_staging", _uuid.uuid4().hex
        )
        try:
            m = _load_manifest(self.root, {})
        except NoSuchVersionError:
            m = None
        if m is not None:
            # Columns NARROWER than the table's type (int into bigint,
            # decimal(12,2) into (18,2)) are accepted Delta-writer
            # style: the task schema is normalized UP to the table type
            # here, and write()'s existing cast-to-canonical-aschema
            # upcasts each incoming RecordBatch — files land
            # homogeneous, the DDL is untouched. WIDER incoming columns
            # still refuse at commit (`_evolved_ddl_text`): evolving the
            # table type needs the session API's append(merge_schema=).
            schema = _normalize_narrow_columns(schema, m.schema_ddl)
            # WRITE defaults (ALTER COLUMN ... SET DEFAULT): omitted
            # defaulted columns are FILLED, matching the session
            # append — the task schema extends with the missing
            # columns and each incoming batch gains typed CONSTANT
            # arrays before hitting disk (the literal grammar is
            # exactly what `_typed_part_value` types, so no SQL
            # evaluator is needed in the zero-copy path). Real file
            # bytes: downstream reads need no machinery, and CHECK
            # constraints evaluate on the filled values.
            from pyspark.sql.types import StructField, StructType

            from datalakeingestionservice_spark.sinks.versioned import (
                _default_fill_text as _dft,
            )

            from datalakeingestionservice_spark.sources.versioned_changes import (  # noqa: E501
                _ddl_field_types as _ddl_types_of,
            )

            self.default_pad: list[tuple[str, object]] = []
            have = {f.name for f in schema.fields}
            ttypes_all = _ddl_types_of(m.schema_ddl)
            for c in sorted(m.write_defaults):
                if c in have or c not in ttypes_all:
                    continue
                ts = ttypes_all[c]
                dt = _datatype_from_simple(ts)
                if dt is None:
                    # Literal defaults only exist on atomic types; an
                    # unparseable type here would be corruption —
                    # refuse rather than write a wrongly-typed column.
                    raise ValueError(
                        f"column {c!r} carries a write default but "
                        f"its type {ts!r} is outside the sessionless "
                        "writer's atomic set; include the column or "
                        "write via the VersionedTable session API"
                    )
                txt = _dft(m.write_defaults[c])
                self.default_pad.append(
                    (
                        c,
                        None
                        if txt is None
                        else _typed_part_value(txt, ts),
                    )
                )
                schema = StructType(
                    schema.fields + [StructField(c, dt, True)]
                )
        self.schema_json = schema.json()
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        if m is None:
            # Spec entries may be transforms ('year(ts)'); validated as
            # a spec below, not as plain column names. Split on commas
            # OUTSIDE parens so 'bucket(4, id)' survives.
            raw_pb = str(options.get("partition_by", ""))
            self.partition_by, depth, tok = [], 0, []
            for ch in raw_pb:
                depth += ch == "("
                depth -= ch == ")"
                if ch == "," and depth == 0:
                    if "".join(tok).strip():
                        self.partition_by.append("".join(tok).strip())
                    tok = []
                else:
                    tok.append(ch)
            if "".join(tok).strip():
                self.partition_by.append("".join(tok).strip())
            self.bloom_columns = [
                c
                for c in str(options.get("bloom_columns", "")).split(",")
                if c
            ]
            for c in self.bloom_columns:
                if types.get(c) not in _BLOOM_TYPES:
                    raise ValueError(
                        f"bloom column {c!r} must be one of "
                        f"{_BLOOM_TYPES}, got {types.get(c)}"
                    )
            self.constraints: dict[str, list] = {}
            self.constraint_pad: list[str] = []
            self.mapping: dict = {}
            self.default_pad: list[tuple[str, object]] = []
        else:
            self.partition_by = list(m.partition_by)
            # Column mapping: the writer's incoming frame and all
            # validation are LOGICAL; data files, partition dir names,
            # and bloom stats keys are PHYSICAL — the mapping snapshot
            # travels to executors and a mapping change during the
            # write fails the commit (stale physical names must never
            # land).
            self.mapping = {
                "map": dict(m.column_mapping.get("map", {})),
                "retired": list(m.column_mapping.get("retired", ())),
            } if m.column_mapping else {}
            self.bloom_columns = list(m.bloom_columns)
            # Compile CHECK constraints now (fail fast driver-side);
            # executors evaluate them per batch. Table columns absent
            # from the incoming frame stay NULL -> CHECK passes (SQL
            # NULL semantics), so compile against the TABLE's types.
            from datalakeingestionservice_spark.sources.versioned_changes import (  # noqa: E501
                _ddl_field_types,
            )

            ttypes = {**_ddl_field_types(m.schema_ddl), **types}
            self.constraints = {}
            for name, expr in m.constraints.items():
                try:
                    self.constraints[name] = compile_predicate(
                        expr, ttypes
                    )
                except Exception as e:
                    raise ValueError(
                        f"CHECK constraint {name!r} ({expr}) is outside "
                        f"the writer's compilable subset ({e}); write "
                        "via the VersionedTable API"
                    ) from e
            # Table columns a constraint references that the incoming
            # frame doesn't carry (merge_schema append): executors pad
            # them with null columns so the CHECK evaluates under SQL
            # NULL semantics (NULL passes) instead of KeyError-ing.
            from datalakeingestionservice_spark.sources.sql_predicates import (  # noqa: E501
                columns_of,
            )

            refd: set[str] = set()
            for ast in self.constraints.values():
                refd |= columns_of(ast)
            self.constraint_pad = sorted(refd - set(types))
        self.constraint_exprs = dict(m.constraints) if m else {}
        self.phys_map = _log_to_phys(self.mapping)
        #: Physical bloom keys — what the manifest stats and the probe
        #: side use.
        self.bloom_phys = [
            self.phys_map.get(c, c) for c in self.bloom_columns
        ]
        # Parsed partition spec: (fn, param, logical source col) —
        # identity entries drop the column from files; transform entries
        # (hidden partitioning) keep it and compute the alias dir value
        # in Python per row.
        from datalakeingestionservice_spark.sinks.versioned import (
            _parse_spec_entry,
            _validate_spec,
        )

        if m is None:
            _validate_spec(tuple(self.partition_by), types)
        self.spec = [
            _parse_spec_entry(e) for e in self.partition_by
        ]
        identity_srcs = {
            col for fn, _, col in self.spec if fn == "identity"
        }
        if identity_srcs and not (set(types) - identity_srcs):
            raise ValueError(
                "every column is a partition column; hive files would "
                "carry no data columns"
            )
        #: Source simpleString per spec entry (transform math needs it).
        self.spec_types = [
            types.get(col, "") for _fn, _p, col in self.spec
        ]

    def write(self, iterator) -> _StagedWrite:
        """Arrow-native task body: each incoming `pyarrow.RecordBatch`
        is cast to the table's file schema, CHECK-validated, split into
        hive leaves by DICTIONARY-ENCODING the computed leaf path (the
        per-row work is all pyarrow kernels; Python runs only once per
        DISTINCT partition value to format dir segments / hash
        transform buckets), and appended to rolling parquet writers.
        Bloom bitmaps hash each distinct value once, at task end."""
        import datetime as _dt
        import json
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.types import StructType as _St

        from datalakeingestionservice_spark.sinks.versioned import (
            _bloom_from_positions,
            _bloom_positions_py,
            _transform_alias,
            _transform_py,
        )
        from datalakeingestionservice_spark.sources.sql_predicates import (
            evaluate,
        )

        schema = _St.fromJson(json.loads(self.schema_json))
        names = schema.fieldNames()
        aschema = pa.schema(
            [
                pa.field(f.name, _arrow_type_for(f.dataType), f.nullable)
                for f in schema.fields
            ]
        )
        # Spec entries -> (dir col name, source col index, transform fn,
        # param, source type). Identity drops its column from the files;
        # transforms (hidden partitioning) keep it.
        seg_plan = []
        identity_srcs = set()
        for (fn, param, col), st in zip(self.spec, self.spec_types):
            pcol = self.phys_map.get(col, col)
            idx = names.index(col) if col in names else None
            if fn == "identity":
                identity_srcs.add(col)
                seg_plan.append((pcol, idx, None, None, st))
            else:
                seg_plan.append(
                    (_transform_alias(fn, pcol), idx, fn, param, st)
                )
        # Hive layout drops only IDENTITY partition columns from the
        # files. Files, dir names, and bloom keys carry PHYSICAL names.
        data_idx = [
            i
            for i, nm in enumerate(names)
            if nm not in identity_srcs
        ]
        dschema = pa.schema(
            [
                pa.field(
                    self.phys_map.get(names[i], names[i]),
                    aschema.field(i).type,
                    aschema.field(i).nullable,
                )
                for i in data_idx
            ]
        )
        bloom_idx = [
            (self.phys_map.get(c, c), names.index(c))
            for c in self.bloom_columns
            if c in names
        ]
        #: {(leaf, phys col): set of distinct non-null values seen} —
        #: hashed to bit positions ONCE per value at task end.
        values: dict[tuple[str, str], set] = {}
        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        uid = _uuid.uuid4().hex
        #: {leaf: [open writer | None, rows in current file, file seq]}
        state: dict[str, list] = {}
        #: {leaf: [tables, buffered rows]} — Spark ships ~10k-row Arrow
        #: batches; writing each straight through would produce tiny
        #: parquet row groups, so per-leaf buffers coalesce to ~64k-row
        #: groups before touching the ParquetWriter.
        buffers: dict[str, list] = {}
        _RG_ROWS = 1 << 16
        staged_files: list[str] = []
        n = 0

        def seg_array(tbl, dir_col, idx, fn, param, styp):
            """Per-row `col=value` path segments for one spec entry —
            vectorized: dictionary-encode the source column, format (and
            transform) each DISTINCT value once in Python, take() the
            segments back out. Falls back to per-row Python only if the
            column type defies dictionary encoding."""
            null_seg = _part_segment(dir_col, None)
            if idx is None:
                return pa.array([null_seg] * tbl.num_rows, pa.string())
            arr = tbl.column(idx).combine_chunks()

            def py_val(v):
                # Arrow hands tz-aware datetimes for timestamp-tz
                # columns; Spark Rows handed naive UTC wall times, and
                # dir names / `_parse_part_path` expect the latter.
                if (
                    v is not None
                    and isinstance(v, _dt.datetime)
                    and v.tzinfo is not None
                ):
                    v = v.replace(tzinfo=None)
                return v if fn is None else _transform_py(
                    fn, param, v, styp
                )
            try:
                enc = pc.dictionary_encode(arr)
            except pa.lib.ArrowException:
                enc = None
            if enc is None:
                return pa.array(
                    [
                        _part_segment(dir_col, py_val(v))
                        for v in arr.to_pylist()
                    ],
                    pa.string(),
                )
            segs = pa.array(
                [
                    _part_segment(dir_col, py_val(v))
                    for v in enc.dictionary.to_pylist()
                ],
                pa.string(),
            )
            if len(segs) == 0:
                return pa.array([null_seg] * tbl.num_rows, pa.string())
            return pc.fill_null(pc.take(segs, enc.indices), null_seg)

        def buffer_leaf(leaf: str, dtbl):
            b = buffers.setdefault(leaf, [[], 0])
            b[0].append(dtbl)
            b[1] += dtbl.num_rows
            if b[1] >= _RG_ROWS:
                flush_leaf(leaf)

        def flush_leaf(leaf: str):
            b = buffers.get(leaf)
            if not b or not b[0]:
                return
            tbl = (
                pa.concat_tables(b[0]) if len(b[0]) > 1 else b[0][0]
            ).combine_chunks()
            b[0].clear()
            b[1] = 0
            write_leaf(leaf, tbl)

        def write_leaf(leaf: str, dtbl):
            st = state.setdefault(leaf, [None, 0, 0])
            start = 0
            while start < dtbl.num_rows:
                if st[0] is None:
                    d = (
                        os.path.join(
                            self.staging, leaf.replace("/", os.sep)
                        )
                        if leaf
                        else self.staging
                    )
                    os.makedirs(d, exist_ok=True)
                    fname = f"part-{pid:05d}-{st[2]:04d}-{uid}.parquet"
                    st[0] = pq.ParquetWriter(
                        os.path.join(d, fname), dschema
                    )
                    staged_files.append(
                        f"{leaf}/{fname}" if leaf else fname
                    )
                # Roll files so one long task can't produce an
                # unboundedly large parquet file: each file takes at
                # most its remaining row capacity per write.
                take = min(
                    dtbl.num_rows - start, self.rows_per_file - st[1]
                )
                st[0].write_table(dtbl.slice(start, take))
                st[1] += take
                start += take
                if st[1] >= self.rows_per_file:
                    st[0].close()
                    st[0], st[1] = None, 0
                    st[2] += 1

        def handle(tbl):
            if tbl.num_rows == 0:
                return
            # Constraints BEFORE bytes hit disk: standard SQL CHECK —
            # only a row evaluating FALSE violates (NULL passes).
            # Evaluated on the FULL row (partition columns included);
            # constraint-referenced table columns the incoming frame
            # lacks (merge_schema) are padded with nulls — `evaluate`
            # treats null-typed columns as NULL everywhere, so such a
            # CHECK passes per SQL semantics.
            if self.constraints:
                full = tbl
                for cname in self.constraint_pad:
                    full = full.append_column(
                        cname, pa.nulls(tbl.num_rows)
                    )
                for cname, ast in self.constraints.items():
                    bad = pc.equal(evaluate(ast, full), False)
                    if pc.any(bad).as_py():
                        i = bad.to_pylist().index(True)
                        raise ValueError(
                            f"CHECK constraint {cname!r} violated, e.g. "
                            f"by row {full.slice(i, 1).to_pylist()[0]}"
                        )

            def record(leaf: str, sub):
                for c, i in bloom_idx:
                    u = pc.unique(pc.drop_null(sub.column(i)))
                    values.setdefault((leaf, c), set()).update(
                        u.to_pylist()
                    )
                buffer_leaf(
                    leaf,
                    pa.table(
                        [sub.column(i) for i in data_idx], schema=dschema
                    ),
                )

            if not seg_plan:
                record("", tbl)
                return
            segs = [seg_array(tbl, *entry) for entry in seg_plan]
            leaf_arr = (
                segs[0]
                if len(segs) == 1
                else pc.binary_join_element_wise(*segs, "/")
            )
            enc = pc.dictionary_encode(leaf_arr)
            for di, leaf in enumerate(enc.dictionary.to_pylist()):
                record(leaf, tbl.filter(pc.equal(enc.indices, di)))

        # WRITE-default fill: incoming batches carry the FRAME's
        # columns; the task schema was extended with the omitted
        # defaulted columns, which append here as typed constants —
        # per batch, before constraints and partitioning see the rows.
        pad = getattr(self, "default_pad", [])
        frame_aschema = (
            pa.schema(list(aschema)[: len(aschema) - len(pad)])
            if pad
            else aschema
        )
        for batch in iterator:
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            if tbl.schema != frame_aschema:
                tbl = tbl.cast(frame_aschema)
            for c, v in pad:
                ft = aschema.field(c)
                tbl = tbl.append_column(
                    ft,
                    pa.nulls(tbl.num_rows, type=ft.type)
                    if v is None
                    else pa.array([v] * tbl.num_rows, type=ft.type),
                )
            n += tbl.num_rows
            handle(tbl)
        for leaf in list(buffers):
            flush_leaf(leaf)
        for st in state.values():
            if st[0] is not None:
                st[0].close()
        blooms: dict[str, dict] = {}
        for (leaf, c), vals in values.items():
            pos: set[int] = set()
            for v in vals:
                pos.update(_bloom_positions_py(v))
            blooms.setdefault(leaf, {})[c] = _bloom_from_positions(pos)
        return _StagedWrite(n, blooms, staged_files, self.staging)

    # -- sessionless commit ---------------------------------------------

    def _bloom_stats(self, messages, leaf: str) -> dict:
        """OR one leaf's per-task bitmaps into its manifest bloom metas
        ({} when no task saw a non-null value in that leaf — absent
        blooms simply don't prune, always safe)."""
        from datalakeingestionservice_spark.sinks.versioned import (
            _union_blooms,
        )

        out = {}
        for c in self.bloom_phys:
            metas = [
                {"b64": m.blooms[leaf][c]}
                for m in messages
                if m is not None and c in m.blooms.get(leaf, {})
            ]
            if metas:
                out[c] = _union_blooms(metas)
        return out

    def _entries_for(self, rel: str, messages) -> dict[str, dict]:
        """{manifest entry rel: stats} for the moved data dir — one
        entry for a flat commit, one per hive leaf for a partitioned
        one (same shape `_write_data_entries` produces)."""
        from datalakeingestionservice_spark.sinks.versioned import (
            _collect_dir_stats,
            _parse_part_path,
        )

        abs_dir = os.path.join(self.root, rel)
        if not self.partition_by:
            st = _collect_dir_stats(abs_dir)
            blooms = self._bloom_stats(messages, "")
            if blooms:
                st["bloom"] = blooms
            return {rel: st}
        entries: dict[str, dict] = {}
        for dirpath, _dirs, files in sorted(os.walk(abs_dir)):
            if not any(f.endswith(".parquet") for f in files):
                continue
            sub = os.path.relpath(dirpath, abs_dir)
            st = _collect_dir_stats(dirpath)
            st["part_values"] = _parse_part_path(sub)
            st["spec"] = list(self.partition_by)
            blooms = self._bloom_stats(
                messages, sub.replace(os.sep, "/")
            )
            if blooms:
                st["bloom"] = blooms
            entries[os.path.join(rel, sub)] = st
        return entries

    def commit(self, messages: list[_StagedWrite]) -> None:
        import json
        import shutil
        from pyspark.sql.types import StructType as _St

        from datalakeingestionservice_spark.sinks.versioned import (
            _DATA_DIR,
            ConcurrentCommitError,
            VersionedTable,
        )

        msgs = [m for m in messages if m is not None]
        total = sum(m.n_rows for m in msgs)
        # The staging dirs the TASKS wrote into travel in the messages
        # (the commit phase may deserialize a separate writer instance
        # with its own uuid); all of them are vacuumed on exit.
        stagings = {m.staging for m in msgs} | {self.staging}
        try:
            if total == 0 and not self.overwrite:
                return  # an all-empty APPEND commits nothing
            schema = _St.fromJson(json.loads(self.schema_json))
            exists = os.path.isdir(
                os.path.join(self.root, _MANIFEST_DIR)
            )
            if not exists:
                os.makedirs(
                    os.path.join(self.root, _MANIFEST_DIR), exist_ok=True
                )
            t = VersionedTable(None, self.root)  # metadata-only handle
            if exists and not self.overwrite:
                # Validate the schema against the CURRENT table before
                # moving anything, so the common failure (mismatch) is
                # clean; the retry loop re-validates per parent.
                _evolved_ddl_text(
                    schema, self.merge_schema, t.manifest().schema_ddl
                )
            if total:
                rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
                os.makedirs(
                    os.path.join(self.root, _DATA_DIR), exist_ok=True
                )
                # Move EXACTLY the files the surviving commit messages
                # list — completed files from a failed-then-retried or
                # speculatively-executed task attempt share the staging
                # dir and must never be published alongside the winning
                # attempt's (they'd silently commit duplicate rows).
                self._move_listed(msgs, os.path.join(self.root, rel))
                entries = self._entries_for(rel, msgs)
            else:
                # Empty OVERWRITE truncates (Spark/Delta overwrite
                # semantics replace the snapshot even with zero rows),
                # and creates an empty table when absent.
                entries = {}
            if not exists:
                t._commit(
                    operation="create",
                    files=tuple(entries),
                    schema_ddl=schema.simpleString(),
                    expected_parent=0,
                    summary={"staged": True},
                    stats=entries,
                    partition_by=tuple(self.partition_by),
                    constraints={},
                    bloom_columns=tuple(self.bloom_columns),
                    delete_predicates=(),
                    column_mapping={},
                )
                return
            if self.overwrite:
                attempt = 0
                while True:
                    parent = t.latest_version()
                    self._check_contract(t.manifest(parent))
                    try:
                        # Overwrite REPLACES the snapshot: the new
                        # schema stands on its own (homogeneous files,
                        # no evolved flag), like
                        # VersionedTable.overwrite with an incompatible
                        # replacement schema.
                        # No cdf marker: the version is a feed-less COW
                        # commit — batch changes() diffs it lazily and
                        # materialize_changes() backfills it for the
                        # streaming source (cdf_skipped would wrongly
                        # mark the feed as UNDEFINED and block the
                        # backfill).
                        t._commit(
                            operation="overwrite",
                            files=tuple(entries),
                            schema_ddl=schema.simpleString(),
                            expected_parent=parent,
                            summary={"staged": True},
                            stats=dict(entries),
                        )
                        return
                    except ConcurrentCommitError:
                        attempt += 1
                        if attempt > 3:
                            raise
            self._append_entries(t, schema, entries, {})
        finally:
            for d in stagings:
                shutil.rmtree(d, ignore_errors=True)

    def _check_contract(self, pm) -> None:
        """The table may have changed shape since planning; a writer
        that validated against a stale contract must fail, not commit
        around it."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
            _log_to_phys,
        )

        if tuple(pm.partition_by) != tuple(self.partition_by):
            raise ConcurrentCommitError(
                "the partition spec changed during the write; re-run "
                "the write"
            )
        if _log_to_phys(pm.column_mapping) != _log_to_phys(
            self.mapping
        ) or sorted(pm.column_mapping.get("retired", ())) != sorted(
            self.mapping.get("retired", ())
        ):
            raise ConcurrentCommitError(
                "the column mapping changed during the write (rename/"
                "drop); the staged files carry stale physical names — "
                "re-run the write"
            )
        if pm.constraints != self.constraint_exprs:
            raise ConcurrentCommitError(
                "table constraints changed during the write; re-run "
                "the write"
            )

    def _append_entries(
        self, t, schema, entries: dict, extra_summary: dict
    ) -> int:
        """Rebase-retrying append commit of pre-moved entries (shared by
        the batch and stream writers)."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
        )

        attempt = 0
        while True:
            parent = t.latest_version()
            pm = t.manifest(parent)
            self._check_contract(pm)
            ddl = _evolved_ddl_text(
                schema, self.merge_schema, pm.schema_ddl
            )
            if ddl != pm.schema_ddl and self.mapping:
                # A NEW logical column becomes its own physical name;
                # it must not collide with a retired physical (dropped
                # column's data lingers in old files) or another
                # column's physical name — same guard as append().
                from datalakeingestionservice_spark.sinks.versioned import (  # noqa: E501
                    SchemaMismatchError,
                )

                old_names = set(_ddl_field_names(pm.schema_ddl))
                used_phys = set(
                    self.mapping.get("retired", ())
                ) | set(self.mapping.get("map", {}).values())
                for f in schema.fields:
                    if f.name not in old_names and f.name in used_phys:
                        raise SchemaMismatchError(
                            f"column name {f.name!r} collides with a "
                            "physical column of a dropped/renamed "
                            "column; choose another name"
                        )
            evolved = (
                bool(pm.summary.get("schema_evolved"))
                or ddl != pm.schema_ddl
                or schema.simpleString() != ddl
            )
            try:
                return t._commit(
                    operation="append",
                    files=pm.files + tuple(entries),
                    schema_ddl=ddl,
                    expected_parent=parent,
                    summary={
                        "staged": True,
                        **({"schema_evolved": True} if evolved else {}),
                        **extra_summary,
                    },
                    stats={**pm.stats, **entries},
                )
            except ConcurrentCommitError:
                attempt += 1
                if attempt > 3:
                    raise

    def _move_listed(self, msgs: list[_StagedWrite], dst: str) -> None:
        """Move exactly the staged files the commit messages list into
        `dst`, preserving leaf sub-paths — never a whole staging dir
        (stray files from losing task attempts must stay behind)."""
        for m in msgs:
            for rf in m.files:
                src = os.path.join(m.staging, rf.replace("/", os.sep))
                d = os.path.join(dst, rf.replace("/", os.sep))
                os.makedirs(os.path.dirname(d), exist_ok=True)
                os.rename(src, d)

    def abort(self, messages: list[_StagedWrite]) -> None:
        import shutil

        for d in {
            m.staging for m in messages if m is not None
        } | {self.staging}:
            shutil.rmtree(d, ignore_errors=True)


class VersionedTableStreamWriter(
    VersionedTableWriter, DataSourceStreamArrowWriter
):
    """`df.writeStream.format("versioned")` — EXACTLY-ONCE streaming
    appends, one table version per micro-batch, fully sessionless.

    Shares the batch writer's task staging (leaf splitting, per-leaf
    blooms, executor-side constraint checks); per micro-batch `commit`
    moves exactly the files its commit messages list (micro-batches of a
    query never overlap, and a restart makes a fresh writer + staging
    dir, so strays are impossible; orphans from a hard crash go to
    `vacuum()`).

    Exactly-once reuses the versioned sink's layered replay protection
    (`streaming/versioned_sink.py` — all pure file ops, so it works
    here): the durable `_streams/<name>` high-water marker skips
    replayed epochs at or below it even after `expire_versions`, and a
    manifest tag scan bounded by the marker's version index catches the
    crash-between-commit-and-marker window. `stream_name` option keys
    the marker (one per checkpoint lineage); an EMPTY micro-batch
    advances the marker without committing a version."""

    def __init__(self, options: dict, schema: StructType):
        super().__init__(options, schema, overwrite=False)
        self.stream_name = str(options.get("stream_name", "ds_stream"))

    def commit(  # type: ignore[override]
        self, messages: list[_StagedWrite | None], batchId: int
    ) -> None:
        import json

        from pyspark.sql.types import StructType as _St

        from datalakeingestionservice_spark.sinks.versioned import (
            _DATA_DIR,
            VersionedTable,
        )
        from datalakeingestionservice_spark.streaming.versioned_sink import (
            _find_epoch_version,
            _read_high_water,
            _write_high_water,
        )

        msgs = [m for m in messages if m is not None]
        total = sum(m.n_rows for m in msgs)
        hw = _read_high_water(self.root, self.stream_name)
        if hw is not None and batchId <= hw[0]:
            self._remove_listed(msgs)
            return  # epoch already committed (replay after crash)
        exists = os.path.isdir(os.path.join(self.root, _MANIFEST_DIR))
        if exists:
            # Crash-between-commit-and-marker window: the tag scan is
            # bounded by the marker's version index (normally 0-1
            # manifests read).
            v = _find_epoch_version(
                self.root,
                self.stream_name,
                batchId,
                hw[1] if hw is not None else 0,
            )
            if v is not None:
                _write_high_water(self.root, self.stream_name, batchId, v)
                self._remove_listed(msgs)
                return
        if total == 0:
            # Advance the marker so a replayed empty epoch stays cheap;
            # no version is committed for an empty micro-batch.
            latest = (
                VersionedTable(None, self.root).latest_version()
                if exists
                else 0
            )
            _write_high_water(
                self.root, self.stream_name, batchId, latest
            )
            return
        schema = _St.fromJson(json.loads(self.schema_json))
        if not exists:
            os.makedirs(
                os.path.join(self.root, _MANIFEST_DIR), exist_ok=True
            )
        t = VersionedTable(None, self.root)  # metadata-only handle
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        dst = os.path.join(self.root, rel)
        os.makedirs(os.path.join(self.root, _DATA_DIR), exist_ok=True)
        self._move_listed(msgs, dst)
        entries = self._entries_for(rel, msgs)
        tag = {"stream": self.stream_name, "epoch": batchId}
        if not exists:
            t._commit(
                operation="create",
                files=tuple(entries),
                schema_ddl=schema.simpleString(),
                expected_parent=0,
                summary={"staged": True, **tag},
                stats=entries,
                partition_by=tuple(self.partition_by),
                constraints={},
                bloom_columns=tuple(self.bloom_columns),
                delete_predicates=(),
                column_mapping={},
            )
            version = 1
        else:
            version = self._append_entries(t, schema, entries, tag)
        _write_high_water(self.root, self.stream_name, batchId, version)

    def _remove_listed(self, msgs: list[_StagedWrite]) -> None:
        for m in msgs:
            for rf in m.files:
                try:
                    os.remove(
                        os.path.join(m.staging, rf.replace("/", os.sep))
                    )
                except OSError:
                    pass

    def abort(  # type: ignore[override]
        self, messages: list[_StagedWrite | None], batchId: int
    ) -> None:
        self._remove_listed([m for m in messages if m is not None])


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned"

    def schema(self) -> str:
        m = _load_manifest(self.options["table_root"], self.options)
        return m.schema_ddl

    def reader(self, schema: StructType) -> VersionedTableReader:
        return VersionedTableReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return VersionedTableWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "the versioned stream writer is append-only; use "
                "outputMode('append')"
            )
        return VersionedTableStreamWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent registration with a session."""
    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception:
        pass  # already registered


def register_table_view(
    spark,
    name: str,
    root: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> None:
    """Expose a versioned table (optionally time-traveled) to PURE SQL
    as a temp view: `SELECT ... FROM <name>` plans through the
    DataSource — Catalyst filter pushdown, manifest pruning, vectorized
    Arrow reads, merge-on-read deletes all engage from SQL text.

    (Writes cannot ride a view; `INSERT INTO` a `CREATE TABLE ... USING
    versioned` catalog table is unreachable too — Spark's Python
    DataSource API forwards no catalog-table OPTIONS/LOCATION to
    writers — so SQL-driven pipelines write via
    `df.write.format("versioned")` on the SELECT's result.)"""
    register(spark)
    r = spark.read.format("versioned").option("table_root", root)
    if version is not None:
        r = r.option("version", str(version))
    if timestamp is not None:
        r = r.option("timestamp", timestamp)
    r.load().createOrReplaceTempView(name)
