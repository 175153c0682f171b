"""Custom Python Data Source query (q114): a from-scratch source behind the
value oracle.

The feed is a pure function of event_id (`sources/python_datasource.py`), so
DuckDB can regenerate the identical relation from `range()` — putting a
custom DataSource implementation, its executor-side generation, and its
filter-pushdown partition pruning all under the exact-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.session import prepare_session
from datalakeingestionservice_spark.sources import python_datasource


@register(
    "q114_python_datasource",
    tags=("source", "python-datasource", "pushdown"),
    oracle="""
WITH gen AS (
  SELECT i AS event_id,
         ['click','error','purchase','signup','view'][(i % 5) + 1]
           AS event_type,
         ((i * 2654435761) % 100000) / 100.0 AS amount
  FROM (SELECT unnest(range(0, 100000)) AS i)
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
FROM gen
WHERE event_id >= 20000 AND event_id < 80000
GROUP BY event_type
ORDER BY event_type
""",
)
def q114_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read 100k synthetic events through the custom Python DataSource with a
    pushed event_id range (the reader prunes input partitions wholly outside
    [20000, 80000) at planning time — scan-level pruning for a source that
    has no files), then aggregate per event type. Amounts sum exactly via
    decimal cast; the oracle regenerates the feed from range()."""
    prepare_session(spark)
    python_datasource.register(spark)
    events = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100000)
        .option("n_partitions", 8)
        .load()
    )
    return (
        events.filter(
            (F.col("event_id") >= 20000) & (F.col("event_id") < 80000)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("event_type")
    )


@register(
    "q136_stream_writer_exactly_once",
    tags=("lake", "streaming", "writer", "exactly-once"),
    oracle="""
WITH gen AS (
  SELECT i AS event_id,
         ['click','error','purchase','signup','view'][(i % 5) + 1]
           AS event_type,
         ((i * 2654435761) % 100000) / 100.0 AS amount
  FROM (SELECT unnest(range(0, 50000)) AS i)
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
       TRUE AS exactly_once_ok
FROM gen
GROUP BY event_type
ORDER BY event_type
""",
)
def q136_stream_writer_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The format-native streaming writer under the value oracle
    (`sources/versioned_batch.py` VersionedTableStreamWriter): five
    epochs of the deterministic synthetic feed commit one table version
    each, with epoch 2 COMMITTED TWICE (the crash-replay scenario every
    checkpointed sink must survive) — the `_streams/` high-water marker
    makes the replay a no-op, asserted as `exactly_once_ok` (exactly 5
    versions, no duplicate rows possible if the aggregate matches).
    Reading back through `spark.read.format("versioned")` and
    aggregating must equal DuckDB's regeneration of the feed from
    `range()` — a duplicated or dropped epoch shifts every count and
    sum. This is the end-to-end lake-streaming contract at 100 TB: any
    micro-batch may be replayed after a crash, and the table must not
    notice."""
    import os
    import tempfile
    import uuid

    from pyspark.sql.types import StructType

    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )
    from datalakeingestionservice_spark.sources.python_datasource import (
        SCHEMA_DDL,
        gen_row,
    )
    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableStreamWriter,
        register as register_versioned,
    )

    prepare_session(spark)
    register_versioned(spark)
    root = os.path.join(
        tempfile.gettempdir(), f"dlis_swq_{uuid.uuid4().hex}"
    )
    schema = StructType.fromDDL(SCHEMA_DDL)
    w = VersionedTableStreamWriter(
        {"table_root": root, "stream_name": "q136"}, schema
    )
    import pyarrow as pa

    from datalakeingestionservice_spark.sources.versioned_batch import (
        _arrow_type_for,
    )

    aschema = pa.schema(
        [
            pa.field(f.name, _arrow_type_for(f.dataType), f.nullable)
            for f in schema.fields
        ]
    )
    per_epoch = 10_000
    for epoch in range(5):
        rows = [
            gen_row(i)
            for i in range(epoch * per_epoch, (epoch + 1) * per_epoch)
        ]
        # The writer is Arrow-native (DataSourceStreamArrowWriter):
        # tasks receive RecordBatches, exactly as Spark ships them.
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(
                    [r[i] for r in rows], type=aschema.field(i).type
                )
                for i in range(len(aschema))
            ],
            schema=aschema,
        )
        w.commit([w.write(iter([batch]))], epoch)
        if epoch == 2:  # crash replay: same epoch, fresh staged file
            w.commit([w.write(iter([batch]))], epoch)
    exactly_once = VersionedTable(spark, root).latest_version() == 5
    df = (
        spark.read.format("versioned").option("table_root", root).load()
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .withColumn("exactly_once_ok", F.lit(bool(exactly_once)))
        .orderBy("event_type")
    )
