"""CDC APPLY: stream a table's change feed into another versioned table.

The missing half of the change-data-capture story: the batch+streaming
`versioned_changes` source EMITS a table's history as delete/insert rows;
this module CONSUMES such a feed and maintains a key-addressed replica —
Delta's canonical `foreachBatch` + `MERGE` idiom, packaged with the same
exactly-once machinery as the append sink (`streaming/versioned_sink.py`):
per-stream high-water epoch markers that survive `expire_versions`, plus
a version-bounded manifest-tag scan for the crash-between-commit-and-
marker window.

A micro-batch may carry MANY events per key (an update is its
delete(preimage)+insert(postimage) pair; several commits can land in one
batch), so the batch first NETS to each key's final disposition —
latest `_commit_version` wins, insert beats delete within one commit
(that pair IS an update) — and then applies as ONE `merge`: upserts for
keys whose final event is an insert, deletes for keys whose final event
is a delete. Replaying the feed from any point is therefore idempotent
at the row level on top of the epoch-level exactly-once.

Keys must be non-NULL (SQL MERGE equality semantics — the same contract
as `IncrementalAggView`). The result: `replica == source` after every
drained batch, for any DML mix on the source (append / merge / UPDATE /
COW+scoped delete / replaceWhere / restore), which the e2e test asserts
literally.

Reference anchor: the reference re-extracts FULL tables on a cron
(`src/Worker/Services/JobSchedulingService.cs:24-75`); CDC apply is what
that sync becomes when the source can enumerate its own changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datalakeingestionservice_spark.sinks.versioned import (
    NoSuchVersionError,
    VersionedTable,
)
from datalakeingestionservice_spark.streaming.versioned_sink import (
    _find_epoch_version,
    _read_high_water,
    _write_high_water,
)

_DELETE_FLAG = "_cdc_delete"


def net_changes(batch_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reduce a change-feed batch to one row per key: the key's FINAL
    disposition. Ordering: `_commit_version` descending, and within one
    commit an insert outranks a delete (a same-version delete+insert
    pair is an update — the insert is the final image). Returns the data
    columns plus a boolean `_cdc_delete`."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_commit_version").desc(),
        F.when(F.col("_change_type") == "insert", 1)
        .otherwise(0)
        .desc(),
    )
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(_DELETE_FLAG, F.col("_change_type") == "delete")
        .drop("_change_type", "_commit_version")
    )


def make_cdc_apply_committer(
    table_root: str,
    key_cols: list[str],
    stream_name: str = "cdc",
    schema_evolution: bool = True,
    mode: str = "merge",
    maintain_every_epochs: int | None = None,
    maintain_policy: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: net the batch, MERGE it into the
    replica, idempotently at epoch granularity (same layered replay
    protection as `make_versioned_batch_committer` — durable high-water
    marker + version-bounded manifest-tag scan).

    MODE — how each netted batch lands on the replica:

    - ``"merge"`` (default): copy-on-write :meth:`VersionedTable.merge`
      — matched data files rewrite; reads stay anti-join-free.
    - ``"upsert_deferred"``: MERGE-ON-READ — ONE equality-delete file
      (the batch's upsert keys + delete keys, scoped to today's
      entries) plus postimage appends, in one atomic commit
      (:meth:`VersionedTable.upsert_deferred`). The replica is NEVER
      scanned: per-epoch write cost is ∝ |batch| regardless of replica
      size — the Flink→Iceberg upsert-mode shape, the only sustainable
      posture when the replica is 100 TB and epochs are seconds apart.
      Reads pay a key anti-join until `compact_deletes()` (coordinates)
      or `compact()` (materialize) runs; schedule either as the
      maintenance half of the pipeline.

    SCHEMA EVOLUTION (`schema_evolution`, default on): when the source
    widens a column type or adds a column, the `versioned_changes`
    stream fails fast at the evolving version ("restart the stream");
    on restart the re-pinned feed carries the evolved schema and the
    batch applies with `merge(merge_schema=True)` — the replica widens
    or gains the column in the same commit, so it keeps converging with
    zero manual steps. A batch that simultaneously ADDS a column and
    LACKS one the replica has is refused — that shape is almost always
    a source RENAME, which a feed cannot distinguish from drop+add;
    applying it as evolution would silently fork the replica (old
    column frozen, new column null for unmatched keys). Run
    `VersionedTable.rename_column` on the replica (metadata-only,
    coordinates and data untouched) and restart, or use a fresh
    stream_name for a full resync.

    MAINTENANCE (`maintain_every_epochs`): with `mode="upsert_deferred"`
    every epoch adds one small equality-delete file, and reads pay one
    anti-join per live file — unbounded backlog means unbounded read
    tax. Setting K runs :meth:`VersionedTable.maintain_deletes` (with
    `maintain_policy` kwargs) after every Kth epoch's commit: the
    threshold policy merges delete files (cheap, data untouched) or
    materializes past the deleted-fraction bar, so the replica stays
    read-serviceable without an external scheduler. The maintenance
    commit is data-preserving (`cdf_empty`), so downstream feed
    consumers skip it; a replayed epoch re-runs the policy, which
    no-ops on a maintained table."""
    if mode not in ("merge", "upsert_deferred"):
        raise ValueError(
            f"mode must be 'merge' or 'upsert_deferred', got {mode!r}"
        )
    if maintain_every_epochs is not None and maintain_every_epochs < 1:
        raise ValueError("maintain_every_epochs must be >= 1")

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = {"stream": stream_name, "epoch": batch_id}
        high_water = _read_high_water(table_root, stream_name)
        if high_water is not None and batch_id <= high_water[0]:
            return  # epoch already applied
        if high_water is not None and batch_id > high_water[0] + 1:
            # Structured Streaming epochs are strictly sequential per
            # checkpoint; a forward JUMP means feed batches between the
            # marker and this epoch were never applied (fresh checkpoint
            # against an old marker, or a manual driver skipping) —
            # silently applying would lose those changes forever.
            raise ValueError(
                f"{table_root}/{stream_name}: epoch gap — last applied "
                f"{high_water[0]}, got {batch_id}; replay the feed from "
                f"epoch {high_water[0] + 1} or use a fresh stream_name"
            )
        net = net_changes(batch_df, key_cols)
        try:
            table = VersionedTable(spark, table_root)
        except NoSuchVersionError:
            # First batch bootstraps the replica from its net inserts
            # (a key whose final disposition is delete simply never
            # lands — it isn't in the replica to begin with).
            first = net.filter(~F.col(_DELETE_FLAG)).drop(_DELETE_FLAG)
            VersionedTable.create(spark, table_root, first, summary=tag)
            _write_high_water(table_root, stream_name, batch_id, 1)
            return
        after_v = high_water[1] if high_water is not None else 0
        version = _find_epoch_version(
            table_root, stream_name, batch_id, after_v
        )
        if version is None:
            if schema_evolution:
                from pyspark.sql.types import StructType

                rep_cols = set(
                    StructType.fromDDL(
                        table.manifest().schema_ddl
                    ).fieldNames()
                )
                feed_cols = {
                    c for c in net.columns if c != _DELETE_FLAG
                }
                if (feed_cols - rep_cols) and (rep_cols - feed_cols):
                    raise ValueError(
                        f"{table_root}/{stream_name}: feed adds "
                        f"{sorted(feed_cols - rep_cols)} and lacks "
                        f"{sorted(rep_cols - feed_cols)} — this shape "
                        "is a source RENAME a change feed cannot "
                        "distinguish from drop+add; rename_column the "
                        "replica to match and restart, or use a fresh "
                        "stream_name for a full resync"
                    )
                if rep_cols - feed_cols:
                    # A feed that merely LACKS replica columns is the
                    # shape a source DROP COLUMN produces after stream
                    # restart. Applying it with merge_schema would
                    # null-fill the missing column on every MATCHED key
                    # while unmatched keys keep stale values — a silent
                    # replica fork. Refuse with the recovery recipe
                    # instead (pre-guard behavior was a loud merge
                    # refusal; the guard must not be weaker).
                    raise ValueError(
                        f"{table_root}/{stream_name}: feed lacks replica "
                        f"columns {sorted(rep_cols - feed_cols)} — the "
                        "shape a source DROP COLUMN produces; applying "
                        "it would null-fill matched rows while unmatched "
                        "rows keep stale values (silent fork). Run "
                        "VersionedTable.drop_column on the replica for "
                        "each dropped column and restart, or use a "
                        "fresh stream_name for a full resync"
                    )
            if mode == "upsert_deferred":
                version = table.upsert_deferred(
                    net.filter(~F.col(_DELETE_FLAG)).drop(_DELETE_FLAG),
                    key_cols,
                    delete_keys=net.filter(F.col(_DELETE_FLAG)).select(
                        *key_cols
                    ),
                    summary=tag,
                    merge_schema=schema_evolution,
                )
            else:
                version = table.merge(
                    net,
                    key_cols,
                    delete_col=_DELETE_FLAG,
                    summary=tag,
                    merge_schema=schema_evolution,
                )
        _write_high_water(table_root, stream_name, batch_id, version)
        if (
            maintain_every_epochs is not None
            and batch_id % maintain_every_epochs == 0
        ):
            table.maintain_deletes(**(maintain_policy or {}))

    return commit_batch


def start_cdc_apply_stream(
    changes_df: DataFrame,
    table_root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    stream_name: str = "cdc",
    processing_time: str = "0 seconds",
    mode: str = "merge",
) -> StreamingQuery:
    """Maintain a replica table from a change-feed stream (typically
    `spark.readStream.format("versioned_changes")` on the source), one
    commit per micro-batch (COW MERGE, or scan-free MoR with
    `mode="upsert_deferred"`), exactly-once end to end."""
    return (
        changes_df.writeStream.foreachBatch(
            make_cdc_apply_committer(
                table_root, key_cols, stream_name, mode=mode
            )
        )
        .trigger(processingTime=processing_time)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
