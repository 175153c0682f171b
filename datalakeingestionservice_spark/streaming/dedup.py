"""Streaming deduplication: the streaming-ingest twin of the batch exact
dedup (`operators/dedup.py`, q44).

A training-data firehose re-delivers content — at-least-once sources,
crawler revisits, mirrored feeds — so dedup must happen ON INGEST, before
duplicates hit the lake. Two native Structured Streaming shapes:

- `dedup_stream_exact`: `dropDuplicates` on the content fingerprint —
  state holds every key seen since the stream began (exact forever, state
  grows with distinct keys; right when the key space is bounded, e.g.
  an id column).
- `dedup_stream_within_watermark`: `dropDuplicatesWithinWatermark` — state
  is bounded by the watermark horizon: a duplicate arriving within the
  delay window is dropped, older re-deliveries pass through. This is the
  100 TB posture: at-least-once delivery duplicates cluster in time
  (retries, replays), so a horizon of hours bounds state at
  O(keys per horizon) regardless of corpus size.

Both keep the deterministic fingerprint of the batch path (sha256 over
normalized text), so stream-deduped and batch-deduped corpora agree — the
parity the tests pin.

Reference: no streaming path exists; its dedup story is a unique index in
the target RDBMS (`src/Infrastructure/Persistence/*`), which the lake has
no server to enforce — this operator is the replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_fingerprint(
    df: DataFrame, text_col: str, out_col: str = "fingerprint"
) -> DataFrame:
    """THE batch fingerprint (`operators/dedup.py:fingerprint`), re-exported
    under the streaming vocabulary — one expression, one definition, so
    stream and batch can never drift apart."""
    from datalakeingestionservice_spark.operators.dedup import fingerprint

    return fingerprint(df, text_col, out_col)


def dedup_stream_exact(
    stream: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> DataFrame:
    """Drop duplicate content for the stream's whole lifetime.

    State = one entry per distinct fingerprint (unbounded over time; use
    the watermarked variant when the feed is endless)."""
    df = with_fingerprint(stream, text_col)
    return df.dropDuplicates((key_cols or []) + ["fingerprint"])


def dedup_stream_within_watermark(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    delay: str = "1 hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Drop duplicates arriving within the watermark horizon.

    State is bounded: entries older than max(event time) − `delay` are
    evicted. Duplicates separated by more than the horizon pass through —
    pair with a batch `exact_dedup` compaction for the long tail."""
    df = with_fingerprint(stream.withWatermark(ts_col, delay), text_col)
    return df.dropDuplicatesWithinWatermark(
        (key_cols or []) + ["fingerprint"]
    )
