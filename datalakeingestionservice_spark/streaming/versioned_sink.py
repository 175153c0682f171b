"""Exactly-once streaming sink into a versioned table.

Composes Structured Streaming with the table format (`sinks/versioned.py`):
each micro-batch commits as ONE table version, tagged with its (stream,
epoch). Exactly-once comes from the two layers meeting in the middle:

- the checkpoint replays an epoch after any crash BEFORE the commit landed
  (foreachBatch is at-least-once on its own);
- the epoch tag makes the replayed commit a no-op when the crash happened
  AFTER the commit but before the checkpoint advanced — the classic
  doubly-committed window every idempotent sink must close.

Readers see whole batches or nothing (manifest atomicity), and time travel
doubles as stream audit: `history()` shows exactly which epoch produced
which version. The reference has no streaming path at all (cron micro-batch
re-runs, `src/Worker/Services/JobSchedulingService.cs:24-75`); this is what
its ingestion becomes on a lake engine.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)

#: Per-stream high-water epoch markers live here, OUTSIDE the expirable
#: manifests — `expire_versions()` deletes old manifests (and with them the
#: (stream, epoch) tags), so a checkpoint replay after expiry would re-append
#: a committed batch if the manifest scan were the only replay protection.
_STREAMS_DIR = "_streams"


def _marker_path(table_root: str, stream_name: str) -> str:
    return os.path.join(table_root, _STREAMS_DIR, stream_name)


def _read_high_water(
    table_root: str, stream_name: str
) -> tuple[int, int] | None:
    """(last committed epoch, table version that commit produced).

    The version is the INDEX that keeps replay checks O(1): an epoch above
    the marker can only have committed AFTER the marker's version (epochs
    are monotonic per checkpoint), so the tag scan reads just the
    manifests newer than it — normally zero or one — instead of the whole
    version history. Markers written before the index existed carry only
    the epoch; they read as version 0, i.e. one full scan, after which the
    next marker write upgrades them."""
    try:
        with open(_marker_path(table_root, stream_name)) as f:
            parts = f.read().split()
        return int(parts[0]), (int(parts[1]) if len(parts) > 1 else 0)
    except (OSError, ValueError, IndexError):
        return None


def _write_high_water(
    table_root: str, stream_name: str, epoch: int, version: int
) -> None:
    """Atomic (temp + rename) so readers never see a torn marker."""
    d = os.path.join(table_root, _STREAMS_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{stream_name}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{epoch} {version}")
    os.replace(tmp, _marker_path(table_root, stream_name))


def _find_epoch_version(
    table_root: str, stream_name: str, epoch: int, after_version: int
) -> int | None:
    """Version carrying this (stream, epoch) tag among manifests NEWER
    than `after_version`, else None. Reads only those manifests — the
    marker's version bound makes this O(commits since the last marker
    write), not O(table history), at high commit rates."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _MANIFEST_DIR,
        _manifest_name,
        _parse_version_file,
    )

    mdir = os.path.join(table_root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    floor = _manifest_name(after_version)
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        if name <= floor:
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                d = _parse_version_file(f.read())
        except (OSError, ValueError, KeyError):
            continue  # torn claim; not a committed version
        # Raw-dict probe: version + summary are present in BOTH the
        # full-snapshot and delta encodings, so no reconstruction of
        # the entry list is needed for the marker search.
        summary = d.get("summary", {})
        if (
            summary.get("stream") == stream_name
            and summary.get("epoch") == epoch
        ):
            return d["version"]
    return None


def make_versioned_batch_committer(
    table_root: str, stream_name: str = "stream"
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: append batch as a version, idempotently.

    Exposed separately so the idempotence contract is directly testable
    (calling it twice with the same epoch must commit exactly once).

    Replay protection is layered: the durable high-water marker (survives
    `expire_versions`; Structured Streaming epochs are monotonic per
    checkpoint) plus a manifest-tag scan (covers a crash after commit but
    before the marker write). `stream_name` identifies a checkpoint
    lineage — reusing a name with a FRESH checkpoint (epochs restarting at
    0) requires a new name or clearing `_streams/<name>`.
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = {"stream": stream_name, "epoch": batch_id}
        high_water = _read_high_water(table_root, stream_name)
        if high_water is not None and batch_id <= high_water[0]:
            return  # epoch already committed; replay after crash/expiry
        try:
            table = VersionedTable(spark, table_root)
        except NoSuchVersionError:
            VersionedTable.create(spark, table_root, batch_df, summary=tag)
            _write_high_water(table_root, stream_name, batch_id, 1)
            return
        # Tag scan bounded by the marker's version index: only manifests
        # committed after it can carry a not-yet-marked epoch, so the
        # common replay path (crash between commit and marker write)
        # inspects one manifest, flat in the table's version count.
        after_v = high_water[1] if high_water is not None else 0
        version = _find_epoch_version(
            table_root, stream_name, batch_id, after_v
        )
        if version is None:
            version = table.append(batch_df, summary=tag)
        # Heal the marker either way: a crash between commit and marker
        # write leaves the tag as the only record of this epoch.
        _write_high_water(table_root, stream_name, batch_id, version)

    return commit_batch


def start_versioned_append_stream(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    stream_name: str = "stream",
    processing_time: str = "0 seconds",
) -> StreamingQuery:
    """Run a streaming DataFrame into a versioned table, one version per
    micro-batch, exactly-once end to end."""
    return (
        stream_df.writeStream.foreachBatch(
            make_versioned_batch_committer(table_root, stream_name)
        )
        .trigger(processingTime=processing_time)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
