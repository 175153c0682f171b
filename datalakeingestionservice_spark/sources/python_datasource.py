"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference's source layer is a factory over RDBMS connectors
(`src/Infrastructure/DataExtraction/DataSourceFactory.cs:16-34`); the
Spark-native equivalent of "add a new source kind" is a DataSource
implementation the engine plans like any other relation. This module ships
one: a deterministic synthetic event feed with

- a BATCH reader that splits the row range into `n_partitions` input
  partitions (executor-parallel generation, nothing on the driver) and
  implements `pushFilters` — range predicates on `event_id` prune entire
  partitions at planning time, the same scan-level pruning a parquet source
  gets from row-group stats;
- a STREAMING reader (`SimpleDataSourceStreamReader`) whose offset is the
  row counter: every microbatch is a contiguous id range, replayable between
  offsets, so exactly-once sinks recover deterministically;
- a WRITER that stages one file per task and publishes on commit — the
  task-attempt/commit protocol of the API, mirroring the staging + atomic
  rename discipline of `sinks/publish.py`.

Rows are a pure function of the event id (Knuth multiplicative hash), so any
slice of the feed is reproducible on any cluster — which is what lets
q114 put a custom source behind the DuckDB value oracle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

#: Knuth's multiplicative hash constant — spreads amounts deterministically.
_MIX = 2654435761

SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, "
    "amount double, ts_epoch bigint"
)


def gen_row(i: int) -> tuple:
    """The whole feed in one pure function: row = f(event_id)."""
    return (
        i,
        i % 1000,
        EVENT_TYPES[i % 5],
        ((i * _MIX) % 100000) / 100.0,
        1704067200 + i,  # 2024-01-01T00:00:00Z + i seconds
    )


#: Above this id the uint64 mix product would wrap and diverge from
#: gen_row's unbounded Python-int math.
_ID_CEILING = (1 << 64) // _MIX


def _vector_batch(lo: int, hi: int):
    """[lo, hi) of the feed as ONE Arrow RecordBatch — numpy array math,
    bit-identical to gen_row for every id below `_ID_CEILING` (the mix
    product runs in uint64; both readers enforce the ceiling). Shared by
    the batch reader and the streaming reader. None when empty."""
    import numpy as np
    import pyarrow as pa

    if hi > _ID_CEILING:
        raise ValueError(
            f"event ids must stay below {_ID_CEILING} to keep the "
            "vectorized feed bit-identical to gen_row"
        )
    i = np.arange(lo, hi, dtype=np.int64)
    if len(i) == 0:
        return None
    mix = (i.astype(np.uint64) * np.uint64(_MIX)) % np.uint64(100000)
    return pa.record_batch(
        {
            "event_id": pa.array(i, pa.int64()),
            "user_id": pa.array(i % 1000, pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[i % 5], pa.string()
            ),
            "amount": pa.array(
                mix.astype(np.int64) / 100.0, pa.float64()
            ),
            "ts_epoch": pa.array(1704067200 + i, pa.int64()),
        }
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        # Above this id the vectorized reader's uint64 mix product would
        # wrap and diverge from gen_row's unbounded Python-int math.
        if self.n_rows > _ID_CEILING:
            raise ValueError(
                f"n_rows must be <= {_ID_CEILING} to keep the "
                "vectorized feed bit-identical to gen_row"
            )
        self.n_partitions = int(options.get("n_partitions", 4))
        # Range bounds tightened by pushed filters on event_id.
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb range predicates on event_id; everything else stays with
        Spark. Accepted filters shrink [lo, hi), and partitions() then skips
        id ranges that cannot match — source-level partition pruning."""
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "event_id" and isinstance(f, GreaterThan):
                self.lo = max(self.lo, f.value + 1)
            elif col == "event_id" and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, f.value)
            elif col == "event_id" and isinstance(f, LessThan):
                self.hi = min(self.hi, f.value)
            elif col == "event_id" and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, f.value + 1)
            else:
                yield f  # unsupported -> Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_partitions))
        parts = []
        for start in range(0, self.n_rows, step):
            end = min(start + step, self.n_rows)
            # Prune partitions fully outside the pushed range.
            if end <= self.lo or start >= self.hi:
                continue
            parts.append(_RangePartition(max(start, self.lo), min(end, self.hi)))
        return parts

    def read(self, partition: _RangePartition) -> Iterator:
        # Vectorized: the feed is a pure function of event_id, so the
        # whole partition computes as numpy array math and yields ONE
        # Arrow batch — Spark ingests it Arrow-to-Arrow, no per-row
        # Python (`_vector_batch`, shared with the streaming reader).
        b = _vector_batch(partition.start, partition.end)
        if b is not None:
            yield b


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Microbatch reader: offset = next unread event id. Contiguous id
    ranges per batch; `readBetweenOffsets` regenerates any range exactly,
    so checkpoint recovery replays identical data."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator, dict]:
        lo = start["next"]
        hi = lo + self.rows_per_batch
        # Vectorized like the batch reader: one Arrow RecordBatch per
        # micro-batch (`_vector_batch`). A LIST, not a generator: Spark's
        # prefetch cache copy.copy()s the returned iterator and
        # generators are not copyable.
        b = _vector_batch(lo, hi)
        return ([b] if b is not None else []), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator:
        # This path (checkpoint replay) REQUIRES an iterator, unlike read()
        # whose result must be copyable — asymmetric but enforced by Spark.
        b = _vector_batch(start["next"], end["next"])
        return iter([b] if b is not None else [])


class _FileCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class SyntheticEventsWriter(DataSourceWriter):
    """Task-staged JSONL writer: each task writes to a staging name; commit
    renames every staged file into place, abort removes them — run-level
    atomicity via the API's commit protocol (same discipline as
    `sinks/publish.py`, one layer lower)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        task = TaskContext.get()
        pid = task.partitionId() if task else 0
        staged = os.path.join(
            self.path, f".staged-{pid}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(staged, n)

    def commit(self, messages: list[_FileCommit]) -> None:
        import os

        for m in messages:
            final = m.staged_path.replace(".staged-", "part-")
            os.rename(m.staged_path, final)

    def abort(self, messages: list[_FileCommit]) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` after registration via
    `spark.dataSource.register(SyntheticEventsDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return SyntheticEventsWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the data source with a session."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # conf locked by session owner
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass  # already registered
