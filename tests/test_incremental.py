"""High-watermark incremental ingestion: advance on success, no-op when drained."""

from __future__ import annotations

import pytest

from datalakeingestionservice_spark.catalog import register_views
from datalakeingestionservice_spark.config.models import (
    DatasetConfiguration,
    SourceConfig,
)
from datalakeingestionservice_spark.pipeline.incremental import (
    WatermarkStore,
    run_incremental,
)
from datalakeingestionservice_spark.sources.query_templates import (
    register_query_template,
)


@pytest.fixture()
def incr_config(tmp_path):
    register_query_template(
        "dbo.sp_GetNewEvents",
        """
        SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
        FROM events
        WHERE ts > CAST(:Watermark AS TIMESTAMP)
        ORDER BY ts, event_id
        """,
    )
    return DatasetConfiguration(
        dataset_id="events-incr",
        source=SourceConfig(
            type="Sql",
            extraction_type="StoredProcedure",
            procedure_name="dbo.sp_GetNewEvents",
        ),
        upload=__import__(
            "datalakeingestionservice_spark.config.models",
            fromlist=["UploadConfig"],
        ).UploadConfig(
            provider="FileSystem",
            base_path=str(tmp_path / "lake"),
            relative_path="events/",
            overwrite_existing=True,
        ),
    )


def test_incremental_advances_then_drains(spark, sf_dir, tmp_path, incr_config):
    register_views(spark, sf_dir)
    store = WatermarkStore(str(tmp_path / "wm.json"))

    # Run 1: everything after the initial epoch watermark.
    r1 = run_incremental(
        spark, incr_config, store, watermark_col="ts",
        staging_root=str(tmp_path / "stage"),
    )
    assert r1.result.success and r1.result.rows > 0
    assert r1.new_watermark > r1.previous_watermark
    assert store.get("events-incr") == r1.new_watermark

    # Run 2: watermark is at max(ts) -> zero new rows, watermark unchanged.
    r2 = run_incremental(
        spark, incr_config, store, watermark_col="ts",
        staging_root=str(tmp_path / "stage"),
    )
    assert r2.result.success
    assert r2.result.rows == 0
    assert r2.new_watermark == r1.new_watermark

    # Mid-stream watermark: only later rows extracted.
    store.set("events-incr", "2024-01-20 00:00:00")
    r3 = run_incremental(
        spark, incr_config, store, watermark_col="ts",
        staging_root=str(tmp_path / "stage"),
    )
    assert r3.result.success
    assert 0 < r3.result.rows < r1.result.rows

    # The shared config is never mutated: binding happens on a per-run copy.
    assert "Watermark" not in (incr_config.source.parameters or {})


def test_watermark_microseconds_coerce_roundtrip():
    """Advanced watermarks ('%Y-%m-%d %H:%M:%S.%f') parse as typed datetimes,
    not raw strings relying on Spark's implicit cast."""
    import datetime as dt

    from datalakeingestionservice_spark.config.coercion import coerce_value

    v = coerce_value("2024-01-20 10:30:00.123456")
    assert isinstance(v, dt.datetime)
    assert v.microsecond == 123456
