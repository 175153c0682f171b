"""Multi-dataset composition: dataset B ingests dataset A's published output
(the bronze -> silver medallion hop), driven purely by configs."""

from __future__ import annotations

import os

from datalakeingestionservice_spark.catalog import register_views
from datalakeingestionservice_spark.config.models import (
    DatasetConfiguration,
    ParquetConfig,
    SourceConfig,
    TransformationConfig,
    UploadConfig,
)
from datalakeingestionservice_spark.pipeline import run_dataset
from datalakeingestionservice_spark.pipeline.scheduler import JobScheduler


def test_downstream_dataset_reads_upstream_output(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    lake = str(tmp_path / "lake")

    bronze = DatasetConfiguration(
        dataset_id="bronze-trades",
        source=SourceConfig(
            type="Sql",
            extraction_type="StoredProcedure",
            procedure_name="dbo.sp_GetDailyTrades",
            parameters={"StartDate": "1997-01-01", "EndDate": "1997-06-30"},
        ),
        parquet=ParquetConfig(file_name_pattern="bronze.parquet"),
        upload=UploadConfig(
            provider="FileSystem", base_path=lake, relative_path="bronze/",
            overwrite_existing=True,
        ),
    )
    r1 = run_dataset(spark, bronze, environment="Production")
    assert r1.success and r1.rows > 0

    silver = DatasetConfiguration(
        dataset_id="silver-trades",
        source=SourceConfig(type="Parquet", extraction_type="Path",
                            path=r1.output_dir),
        transformations=[
            TransformationConfig(
                type="DataMasking", order=1,
                config={"columns": ["account_id"], "mode": "hash"},
            ),
            TransformationConfig(
                type="ColumnMapping", order=2,
                config={"mappings": {"trade_id": "id"}},
            ),
        ],
        parquet=ParquetConfig(file_name_pattern="silver.parquet"),
        upload=UploadConfig(
            provider="FileSystem", base_path=lake, relative_path="silver/",
            overwrite_existing=True,
        ),
    )
    r2 = run_dataset(spark, silver, environment="Production")
    assert r2.success
    assert r2.rows == r1.rows  # row-preserving hop

    out = spark.read.parquet(r2.output_dir)
    assert "id" in out.columns
    masked = out.select("account_id").first().account_id
    assert len(masked) == 64  # sha256 pseudonym

    # Both CTLs exist -> each hop independently auditable.
    assert os.path.exists(r1.ctl_path) and os.path.exists(r2.ctl_path)


def test_scheduler_orders_dag_by_cron(spark):
    """Upstream on a tighter cron than downstream: the driver loop fires them
    independently; non-overlap per dataset is the engine's guarantee, DAG
    sequencing is the scheduler configuration's."""
    fired = []
    sched = JobScheduler()
    sched.add("bronze", "0 */10 * * * ?", lambda: fired.append("bronze"))
    sched.add("silver", "0 5/10 * * * ?", lambda: fired.append("silver"))
    from datetime import datetime

    for minute, expect in [(10, ["bronze"]), (15, ["silver"]), (20, ["bronze"])]:
        got = sched.run_pending(datetime(2026, 1, 1, 9, minute, 0))
        assert got == expect
    assert fired == ["bronze", "silver", "bronze"]


def test_concurrent_dataset_runs_are_isolated(spark, sf_dir, tmp_path):
    """Three datasets ingesting concurrently on one session (Spark schedules
    jobs from multiple threads): outputs, CTLs, and row counts must not
    cross-contaminate — the reference's concurrent-across-datasets model."""
    import threading

    register_views(spark, sf_dir)
    results = {}

    def make_cfg(ds_id, status):
        return DatasetConfiguration(
            dataset_id=ds_id,
            source=SourceConfig(
                type="Sql", extraction_type="Inline",
                query=f"SELECT o_orderkey, o_totalprice FROM orders "
                      f"WHERE o_orderstatus = '{status}'",
            ),
            parquet=ParquetConfig(file_name_pattern=f"{ds_id}.parquet"),
            upload=UploadConfig(
                provider="FileSystem", base_path=str(tmp_path / "lake"),
                relative_path=f"{ds_id}/", overwrite_existing=True,
            ),
        )

    def run(ds_id, status):
        results[ds_id] = run_dataset(
            spark, make_cfg(ds_id, status), environment="Production"
        )

    threads = [
        threading.Thread(target=run, args=(f"ds-{s}", s)) for s in "FOP"
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    expected = {
        s: spark.sql(
            f"SELECT count(*) n FROM orders WHERE o_orderstatus = '{s}'"
        ).collect()[0].n
        for s in "FOP"
    }
    for s in "FOP":
        r = results[f"ds-{s}"]
        assert r.success, [e.message for e in r.errors]
        assert r.rows == expected[s]
        assert spark.read.parquet(r.output_dir).count() == expected[s]
