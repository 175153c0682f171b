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
version committed at-or-before). Executors read the selected parquet
directly with pyarrow (same path as the streaming change source), with
hive partition values injected from the manifest driver-side.

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
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from datalakeingestionservice_spark.sinks.versioned import (
    _MANIFEST_DIR,
    Manifest,
    NoSuchVersionError,
    _dir_may_match,
    _entry_may_match,
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
)

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _load_manifest(root: str, options: dict) -> Manifest:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        raise NoSuchVersionError(f"{root} is not a versioned table")
    manifests = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("v") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    manifests.append(Manifest.from_json(f.read()))
            except (ValueError, KeyError):
                continue  # torn claim
    if not manifests:
        raise NoSuchVersionError(f"{root}: no committed versions")
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


class _EntryPartition(InputPartition):
    def __init__(self, paths, columns, physical, part_fill, preds=None):
        self.paths = paths  # absolute parquet file or dir paths
        self.columns = columns  # logical output order
        self.physical = physical  # same order, file-side names
        self.part_fill = part_fill or {}  # keyed by LOGICAL name
        self.preds = preds or []  # compiled deferred-delete ASTs


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
        for p in self.m.delete_predicates:
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
        back = {p: c for c, p in self._fwd.items()}
        part_types = {
            self._fwd.get(c, c): t for c, t in self._types.items()
        }
        preds = [
            (self._fwd.get(c, c), op, v) for c, op, v in self._preds
        ]

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

        parts: list[_EntryPartition] = []
        for rel in self.m.files:
            stats = self.m.stats.get(rel, {})
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
            abs_entry = os.path.join(self.root, rel)
            fmap = stats.get("files")
            if preds and fmap:
                keep = [
                    fn
                    for fn, fs in sorted(fmap.items())
                    if _dir_may_match(fs, preds)
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
                )
            )
        return parts

    def read(self, partition: _EntryPartition) -> Iterator[tuple]:
        # Executor-side: straight pyarrow scan, schema-evolution tolerant
        # (files predating an added column yield None), hive partition
        # values injected from the manifest, physical->logical handled by
        # reading file columns under their PHYSICAL names and emitting in
        # logical order. Deferred-delete predicates (if any apply to this
        # entry) filter the LOGICAL table with Kleene three-valued masks
        # before rows are emitted — arrow's filter drops NULL-mask rows,
        # matching Spark's `filter(~expr(pred))` exactly.
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
        for path in files:
            available = set(pq.read_schema(path).names)
            want = [p for _, p in pairs if p in available]
            raw = pq.read_table(path, columns=want)
            n = raw.num_rows
            cols = {}
            for c, p in pairs:
                if p in available:
                    cols[c] = raw.column(p)
                elif fill.get(c) is not None:
                    cols[c] = pa.array([fill[c]] * n)
                else:
                    cols[c] = pa.nulls(n)
            logical = pa.table(cols)
            if partition.preds:
                mask = keep_mask(partition.preds, logical)
                if mask is not None:
                    logical = logical.filter(mask)
            pys = [
                logical.column(i).to_pylist()
                for i in range(logical.num_columns)
            ]
            yield from zip(*pys)


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned"

    def schema(self) -> str:
        m = _load_manifest(self.options["table_root"], self.options)
        return m.schema_ddl

    def reader(self, schema: StructType) -> VersionedTableReader:
        return VersionedTableReader(self.options)


def register(spark) -> None:
    """Idempotent registration with a session."""
    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception:
        pass  # already registered
