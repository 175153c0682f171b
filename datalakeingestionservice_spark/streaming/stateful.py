"""Custom stateful streaming operator: cross-batch deduplication by key.

`applyInPandasWithState` is Spark's arbitrary-stateful-processing hook (the
generalization the reference's cron micro-batches can't express at all): per
group, a pandas function sees the batch's rows plus a persistent state handle.

This operator emits only first-seen keys across the whole stream, with a state
TTL so the seen-set doesn't grow unboundedly (the watermark analog for state).
At 100 TB-scale streams, dedup state is the canonical stateful workload; the
same pattern implements sessionization variants, rate limiting, and CDC
upserts.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Output: the first occurrence of each key.
DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("dedup_key", StringType()),
        StructField("first_event_id", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("n_duplicates_in_batch", LongType()),
    ]
)

#: State per key: just a seen marker + first metadata.
DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_event_id", LongType()),
        StructField("seen_count", LongType()),
    ]
)


def dedup_events_stream(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    ts_col: str = "ts",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit one row per never-before-seen key; suppress all later occurrences.

    State: (first_event_id, seen_count) per key. Grouping keys the shuffle;
    state lives in the state store keyed by the group, checkpoint-durable,
    recovered on restart.

    `state_ttl_ms` bounds state growth on unbounded key spaces via
    processing-time timeouts. Leave it None for bounded key spaces and for
    `availableNow` backfills — with a TTL set, Spark keeps scheduling
    timeout-handling micro-batches after the data is exhausted, so a
    run-to-completion trigger never completes.
    """
    ttl = state_ttl_ms

    def process(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([id_col])
        n_rows = len(batch)
        if state.exists:
            (first_id, seen) = state.get
            state.update((int(first_id), int(seen) + n_rows))
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            return  # key already emitted; suppress duplicates
        first = batch.iloc[0]
        state.update((int(first[id_col]), n_rows))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "dedup_key": [key[0]],
                "first_event_id": [int(first[id_col])],
                "first_ts": [first[ts_col]],
                "n_duplicates_in_batch": [n_rows - 1],
            }
        )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            process,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
