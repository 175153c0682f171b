"""Streaming change-feed source over the versioned table.

`spark.readStream.format("versioned_changes")` turns the table format
(`sinks/versioned.py`) into a Structured Streaming source: the stream
OFFSET IS THE TABLE VERSION. Each micro-batch covers the versions committed
since the last batch, planned as one input partition per added data dir —
executors read the parquet directly (pyarrow), the driver only lists
manifests. Appends are therefore served at scan speed with zero diff
computation, and checkpoint recovery is exact because versions are
immutable: replaying (v_a, v_b] always yields the same rows.

Together with `streaming/versioned_sink.py` this closes the loop — one
versioned table can be the exactly-once SINK of one stream and the SOURCE
of the next, which is how incremental pipelines chain on Delta/Iceberg.
Copy-on-write commits (merge/delete/overwrite) are served from their
MATERIALIZED change dirs (written at commit time, `sinks/versioned.py`
`_write_cdf`), so full DML history streams — rows carry `_change_type`
('insert' | 'delete'); data-preserving commits (compact) are skipped.
Legacy COW commits lacking change files (tables written before
materialization) are rejected with a clear error pointing at the batch
`VersionedTable.changes()` fallback.

Reference: its only incremental story is re-running extractions on a cron
(`src/Worker/Services/JobSchedulingService.cs:24-75`).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from datalakeingestionservice_spark.sinks.versioned import (
    _MANIFEST_DIR,
    Manifest,
    NoSuchVersionError,
    _typed_part_value,
)

VERSION_COL = "_commit_version"
CHANGE_TYPE_COL = "_change_type"


def _manifests(root: str) -> list[Manifest]:
    from datalakeingestionservice_spark.sinks.versioned import (
        load_all_manifests,
    )

    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        raise NoSuchVersionError(f"{root} is not a versioned table")
    # Delta-aware forward pass (same storage layer as the session
    # class); torn claims are skipped.
    return load_all_manifests(mdir)


class _DirPartition(InputPartition):
    def __init__(
        self,
        abs_dir: str,
        version: int,
        columns: list[str],
        change_type: str | None = "insert",
        part_fill: dict | None = None,
        physical: list[str] | None = None,
        types: list[str] | None = None,
    ):
        self.abs_dir = abs_dir
        self.version = version
        self.columns = columns
        #: Constant for append data dirs ('insert'); None for materialized
        #: change dirs, whose files carry their own `_change_type` column.
        self.change_type = change_type
        #: Hive-partitioned leaf dirs: {col: typed value} for the
        #: partition columns, which live in the DIR NAME, not the files.
        #: Keyed by LOGICAL name.
        self.part_fill = part_fill or {}
        #: File-side names per column (column mapping); defaults to the
        #: logical names.
        self.physical = physical or columns
        #: simpleString type per column (the PINNED stream schema) —
        #: drives the vectorized Arrow-batch yield.
        self.types = types or []


class VersionedChangesStreamReader(DataSourceStreamReader):
    """Offset = {"version": last fully-consumed table version}."""

    def __init__(self, options: dict):
        self.root = options["table_root"]
        # start_version: consume changes AFTER this version (0 = include
        # the initial create commit).
        self.start_version = int(options.get("start_version", 0))
        # Admission control for backfills (Delta's maxFilesPerTrigger
        # shape): cap how many table versions one micro-batch may span.
        # 0 = unlimited. The cap needs the stream's current position,
        # which must survive both the runner process lifecycle (Spark
        # calls latestOffset BEFORE initialOffset) and checkpoint
        # restarts — so it lives in a tiny cursor file under the table's
        # `_streams/`, keyed by `stream_id` (default 'default'; give
        # concurrent capped streams distinct ids). The cursor only ever
        # RAISES the reported offset floor, so a stale file can reduce
        # throttling but can never hand Spark an offset behind its
        # checkpoint (no replays, no regression).
        self.max_versions_per_batch = int(
            options.get("max_versions_per_batch", 0)
        )
        self._cursor_path = os.path.join(
            self.root,
            "_streams",
            f".rate_cursor_{options.get('stream_id', 'default')}",
        )
        # The stream's output schema is PINNED at start (Structured
        # Streaming cannot change a query's schema mid-run); partitions()
        # re-checks the source DDL and fails fast if it evolved, instead
        # of silently dropping the new columns from every micro-batch.
        pinned = _manifests(self.root)[-1]
        self._schema_ddl = pinned.schema_ddl
        self._pinned_version = pinned.version
        self._columns = _ddl_field_names(self._schema_ddl)
        # Column mapping (renamed columns): files carry PHYSICAL names;
        # the stream emits logical ones. The list rides to executors in
        # each partition. A rename AFTER the stream started changes the
        # source DDL, which the schema-evolution fail-fast below already
        # turns into an explicit restart error.
        cmap = pinned.column_mapping.get("map", {})
        self._physical = [cmap.get(c, c) for c in self._columns]
        ptypes = _ddl_field_types(self._schema_ddl)
        self._col_types = [ptypes[c] for c in self._columns]

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def _read_cursor(self) -> int:
        try:
            with open(self._cursor_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return self.start_version

    def _write_cursor(self, version: int) -> None:
        import uuid as _uuid

        d = os.path.dirname(self._cursor_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{_uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._cursor_path)

    def latestOffset(self) -> dict:
        ms = _manifests(self.root)
        latest = ms[-1].version if ms else self.start_version
        if self.max_versions_per_batch > 0:
            cursor = self._read_cursor()
            latest = max(
                min(latest, cursor + self.max_versions_per_batch),
                cursor,
            )
        return {"version": latest}

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        if self.max_versions_per_batch > 0:
            # The planned batch's end IS the stream position; persisting
            # it keeps the cap correct across runner restarts (monotone:
            # never write a lower value).
            if end["version"] > self._read_cursor():
                self._write_cursor(end["version"])
        ms = {m.version: m for m in _manifests(self.root)}
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            cur = ms[v]
            if (
                v > self._pinned_version
                and cur.schema_ddl != self._schema_ddl
            ):
                # Versions BEFORE the pin may carry a narrower schema —
                # read() yields None for their missing columns, same as
                # the batch mergeSchema path. Only evolution AFTER the
                # pin is unservable without a restart.
                raise ValueError(
                    f"source table schema evolved at version {v} "
                    f"(stream pinned {self._schema_ddl!r}, table now "
                    f"{cur.schema_ddl!r}); restart the stream to pick "
                    "up the evolved schema"
                )
            if cur.operation in ("append", "create"):
                prev_files = ms[v - 1].files if v - 1 in ms else ()
                types = _ddl_field_types(cur.schema_ddl)
                # part_values are keyed PHYSICAL; fills key LOGICAL.
                back = {
                    p: c
                    for c, p in zip(self._columns, self._physical)
                    if c != p
                }
                for rel in cur.files:
                    if rel not in prev_files:
                        raw_pv = cur.stats.get(rel, {}).get(
                            "part_values"
                        )
                        fill = (
                            {
                                back.get(c, c): _typed_part_value(
                                    raw,
                                    types.get(back.get(c, c), "string"),
                                )
                                for c, raw in raw_pv.items()
                            }
                            if raw_pv
                            else None
                        )
                        parts.append(
                            _DirPartition(
                                os.path.join(self.root, rel),
                                v,
                                self._columns,
                                part_fill=fill,
                                physical=self._physical,
                                types=self._col_types,
                            )
                        )
            elif cur.summary.get("cdf_empty"):
                continue  # data-preserving commit (compact): no rows
            elif cur.summary.get("cdf"):
                parts.append(
                    _DirPartition(
                        os.path.join(self.root, cur.summary["cdf"]),
                        v,
                        self._columns,
                        change_type=None,  # column lives in the files
                        physical=self._physical,
                        types=self._col_types,
                    )
                )
            else:
                raise ValueError(
                    f"version {v} is a {cur.operation!r} commit without "
                    "materialized change files (table written before "
                    "CDF materialization, or deferred/MoR DML on a "
                    "table created without materialize_changes=True); "
                    "backfill with VersionedTable.materialize_changes() "
                    "or use the batch VersionedTable.changes() for "
                    "this range"
                )
        return parts

    def read(self, partition: _DirPartition) -> Iterator:
        # Executor-side: straight pyarrow scan of one immutable dir.
        # VECTORIZED when every column type maps to arrow (same text
        # mapping as the batch source): the logical table — file columns
        # under physical names cast to the pinned types, hive partition
        # constants, evolution NULLs, plus the constant `_change_type` /
        # `_commit_version` columns — yields as RecordBatches, no
        # per-row Python. Unmappable types fall back to tuples.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from datalakeingestionservice_spark.sources.versioned_batch import (
            _arrow_type_from_simple,
        )

        pairs = list(zip(partition.columns, partition.physical))
        atypes = [
            _arrow_type_from_simple(t) for t in partition.types
        ] or [None] * len(pairs)
        vectorized = len(atypes) == len(pairs) and all(
            t is not None for t in atypes
        )
        fill = partition.part_fill
        for path in sorted(
            glob.glob(os.path.join(partition.abs_dir, "*.parquet"))
        ):
            # Tolerate schema evolution: files predating an added column
            # yield None for it (same as the batch reader's mergeSchema).
            # Files carry PHYSICAL names; rows emit in LOGICAL order.
            available = set(pq.read_schema(path).names)
            want = [p for _, p in pairs if p in available]
            ctype_from_file = (
                partition.change_type is None
                and CHANGE_TYPE_COL in available
            )
            table = pq.read_table(
                path,
                columns=want + ([CHANGE_TYPE_COL] if ctype_from_file else []),
            )
            n = table.num_rows
            if vectorized:
                cols = {}
                for i, (c, p) in enumerate(pairs):
                    target = atypes[i]
                    if p in available:
                        col = table.column(p)
                        if col.type != target:
                            col = col.cast(target)
                        cols[c] = col
                    elif fill.get(c) is not None:
                        cols[c] = pa.array([fill[c]] * n, type=target)
                    else:
                        cols[c] = pa.nulls(n, type=target)
                if ctype_from_file:
                    ct = table.column(CHANGE_TYPE_COL)
                    if ct.type != pa.string():
                        ct = ct.cast(pa.string())
                    cols[CHANGE_TYPE_COL] = ct
                else:
                    cols[CHANGE_TYPE_COL] = pa.array(
                        [partition.change_type or "insert"] * n,
                        type=pa.string(),
                    )
                cols[VERSION_COL] = pa.array(
                    [partition.version] * n, type=pa.int64()
                )
                yield from pa.table(cols).to_batches()
                continue
            for row in table.to_pylist():
                yield tuple(
                    row.get(p, fill.get(c))
                    if p in available
                    else fill.get(c)
                    for c, p in pairs
                ) + (
                    row[CHANGE_TYPE_COL]
                    if ctype_from_file
                    else (partition.change_type or "insert"),
                    partition.version,
                )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: versions are immutable


def _ddl_fields(ddl: str) -> list[str]:
    """Top-level `name:type` tokens of a `struct<...>` simpleString —
    parsed textually because DataSource methods run in sessionless Python
    workers where StructType.fromDDL can't be used."""
    inner = ddl[len("struct<"):-1]
    names, depth, token = [], 0, []
    for ch in inner:
        # Depth covers BOTH nesting syntaxes: `<>` (struct/array/map) and
        # `()` (parameterized types — decimal(10,2), varchar(n), char(n)).
        # Tracking only `<>` split `decimal(10,2)` at its comma, yielding a
        # phantom column `2)` that failed every micro-batch read.
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            names.append("".join(token))
            token = []
        else:
            token.append(ch)
    if token:
        names.append("".join(token))
    return names


def _ddl_field_names(ddl: str) -> list[str]:
    return [t.split(":", 1)[0] for t in _ddl_fields(ddl)]


def _ddl_field_types(ddl: str) -> dict[str, str]:
    return {
        t.split(":", 1)[0]: t.split(":", 1)[1] for t in _ddl_fields(ddl)
    }


def _table_schema_ddl(root: str) -> str:
    ms = _manifests(root)
    if not ms:
        raise NoSuchVersionError(f"{root}: no committed versions")
    # "struct<...>": splice the change-type + version columns in.
    base = ms[-1].schema_ddl
    return base[:-1] + f",{CHANGE_TYPE_COL}:string,{VERSION_COL}:bigint>"


class VersionedChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self) -> str:
        return _table_schema_ddl(self.options["table_root"])

    def streamReader(
        self, schema: StructType
    ) -> VersionedChangesStreamReader:
        return VersionedChangesStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration with a session."""
    try:
        spark.dataSource.register(VersionedChangesDataSource)
    except Exception:
        pass  # already registered
