"""SparkSession factory and runtime tuning.

The reference is a single-process, fully-materialized in-memory pipeline
(`src/Core/Pipeline/DataPipeline.cs:20-63` executes everything on one thread and
`SqlServerDataSource.cs:61-62` loads the entire result set into a DataTable).
Here the SparkSession IS the execution engine, so scalability posture is set in
one place:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — the knob that makes one config survive 1000x data.
- `spark.sql.shuffle.partitions` sized for the local[N] test rig; at cluster
  scale AQE's coalescing makes the static value a ceiling, not a tuning burden.
- Arrow enabled so any unavoidable Python boundary (pandas UDFs in the
  multimodal/similarity operators) is vectorized, never row-at-a-time.
- Session timezone pinned to UTC so timestamp semantics are reproducible across
  driver environments (and match the DuckDB correctness oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that must be set before the JVM starts.
BUILD_TIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB splits at scale
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}

#: Confs safe to (re)apply on an already-running session. The correctness/bench
#: driver hands us ITS session, so every entry point routes through
#: ``prepare_session`` to guarantee these regardless of who built the session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # The driver-generated events table carries TIMESTAMP(NANOS) parquet, which
    # Spark's reader rejects by default; read as long and convert in catalog.table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet timestamp[us] without isAdjustedToUTC would otherwise surface as
    # TIMESTAMP_NTZ, breaking unix_micros()/window() call sites that expect
    # TIMESTAMP. With the session TZ pinned to UTC the instant semantics are
    # identical; catalog.table keeps an NTZ->TIMESTAMP cast as defense in depth
    # for sessions whose owner locked this conf.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Python DataSource readers implementing pushFilters error out unless
    # pushdown is explicitly enabled (sources/python_datasource.py).
    "spark.sql.python.filterPushdown.enabled": "true",
    # Deeply-composed pipelines (q179: two gram passes + fuzzy +
    # components in ONE plan) have plan TREES whose default rendering
    # (maxPlanStringLength ~2^31) materializes a multi-hundred-MB string
    # inside explainString — enough to OOM an externally-owned 1 GB
    # driver heap during plain execution (the SQL-execution event
    # renders the plan). 1 MiB keeps every diagnostic readable and
    # bounds the rendering cost; execution is unaffected.
    "spark.sql.maxPlanStringLength": "1048576",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs idempotently; safe on externally-owned sessions."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf locked by owner
            pass
    return spark


def build_session(
    app_name: str = "dlis-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a session with the engine's scale posture applied."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in {**BUILD_TIME_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(key, value)
    return prepare_session(builder.getOrCreate())
