"""Stream-stream INTERVAL JOIN (Spark Structured Streaming's two-stream
join class, watermark-bounded state): for each left event, every right
event with the same keys whose event time falls in
[left_time + lower, left_time + upper].

This is the attribution/correlation shape (purchase <- click within 30
minutes, alert <- metric spike within a window) as a STREAMING operator:
both sides carry watermarks, and the time-range condition is what lets
Spark bound the join state — each side's buffered rows are evicted once
the other side's watermark passes the interval, so state is
O(rows-in-window), never O(stream). Without the range condition a
stream-stream join buffers both streams forever; building the condition
wrong (or forgetting a watermark) is the classic silent-OOM — this
operator owns that contract.

The SAME function works on batch frames (watermarks skipped, identical
join semantics), so the streaming twin is batch-parity-testable against
the DuckDB-verified q173 — the E17 pattern.

Terminal flush (investigated, round 11): under OUTER join types the
null-padded result for an unmatched row is emitted only once the GLOBAL
watermark (min over both sides) passes the row's match horizon. Spark's
watermark is max(event time) − delay and there is no end-of-stream
punctuation in OSS Structured Streaming (SPARK-24634 class of asks) —
`Trigger.AvailableNow` drains the data and runs a final no-data batch
(watermark advances to max − delay), but rows inside the last horizon
stay withheld by design, exactly as they would mid-stream. So a bounded
replay that must emit the complete outer result has two sanctioned
paths: (a) append one sentinel row per side with event time ≥ max +
delay + span before the run (pushes the watermark past every real row),
or (b) run the batch twin over the same frames — this module is the
same function either way. The streaming parity tests model the withheld
tail explicitly with the global-watermark boundary.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
    join_type: str = "inner",
) -> DataFrame:
    """Join right events into left events per `keys` where
    `right_time` is within [left_time + lower, left_time + upper]
    (interval strings, e.g. lower="-30 minutes", upper="0 seconds" =
    right event at most 30 minutes BEFORE the left event).

    Streaming inputs get watermarks (`left_delay`/`right_delay` — the
    lateness each side tolerates; Spark combines them with the range
    condition to bound state). Non-key column names must be disjoint
    across the two sides — a silent positional disambiguation would be
    the wrong kind of convenient; rename before joining."""
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename them before the join (keys are equated and "
            "deduplicated, everything else must be disjoint)"
        )
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"join key(s) {missing} absent from a side")
    l = (
        left.withWatermark(left_time, left_delay)
        if left.isStreaming
        else left
    )
    r = (
        right.withWatermark(right_time, right_delay)
        if right.isStreaming
        else right
    )
    # Explicit side aliases, never l[k]/r[k] column references: when
    # both sides derive from the SAME base frame (a batch self-join,
    # e.g. purchases vs clicks of one events table), Spark dedups the
    # join's attribute ids and frame-indexed references resolve
    # ambiguously — an outer join can then silently serve the null
    # side's key. Alias-qualified names are unambiguous by
    # construction.
    la, ra = "__ij_l", "__ij_r"
    l, r = l.alias(la), r.alias(ra)
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"{la}.{k}") == F.col(f"{ra}.{k}") for k in keys],
    )
    cond = (
        cond
        & (
            F.col(f"{ra}.{right_time}")
            >= F.col(f"{la}.{left_time}") + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"{ra}.{right_time}")
            <= F.col(f"{la}.{left_time}") + F.expr(f"INTERVAL {upper}")
        )
    )
    # Join keys coalesce across the two aliases: under right/full outer
    # a right-only row carries its keys on the RIGHT alias only (the
    # left alias is all-NULL) — taking keys from the left side alone
    # would silently serve NULL keys for those rows.
    return l.join(r, cond, join_type).select(
        *[
            F.coalesce(F.col(f"{la}.{c}"), F.col(f"{ra}.{c}")).alias(c)
            if c in keys
            else F.col(f"{la}.{c}")
            for c in left.columns
        ],
        *[
            F.col(f"{ra}.{c}")
            for c in right.columns
            if c not in keys
        ],
    )
