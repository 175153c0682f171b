"""Parity proof: the reference's own shipped dataset-*.json files drive this
engine unmodified (only paths/env overridden — the reference itself overrides
those per deployment too)."""

from __future__ import annotations

import os

import pytest

from datalakeingestionservice_spark.catalog import register_views
from datalakeingestionservice_spark.config.loader import load_dataset_configs
from datalakeingestionservice_spark.pipeline import run_dataset

REFERENCE_DATASETS = "/root/reference/src/Worker/Datasets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATASETS),
    reason="reference repo not present",
)


@pytest.fixture(scope="module")
def reference_configs():
    configs = load_dataset_configs(REFERENCE_DATASETS)
    assert "hr-employees-oracle" in configs
    assert "Trades-daily-sqlserver" in configs
    return configs


def test_reference_hr_oracle_config_runs(spark, sf_dir, tmp_path, reference_configs):
    """dataset-hr-oracle.json: Package extraction (HR_PKG.GET_EMPLOYEE_DATA),
    DataCleansing + DataValidation (requiredColumns EMPLOYEE_ID/EMAIL/
    HIRE_DATE, validateEmail) — end to end."""
    register_views(spark, sf_dir)
    cfg = reference_configs["hr-employees-oracle"]
    cfg.upload.base_path = str(tmp_path / "lake")
    cfg.upload.local_copy_path = str(tmp_path / "archive")  # was a C:\ path

    result = run_dataset(spark, cfg, environment="Production")
    assert result.success, [(e.stage, e.message) for e in result.errors]
    assert result.rows > 0

    out = spark.read.parquet(result.output_dir)
    assert "EMPLOYEE_ID" in out.columns
    assert "EMAIL_valid" in out.columns  # validateEmail implemented (ref TODO)
    assert "hr/employees" in result.output_dir
    # keepLocalCopy honored:
    assert os.path.isdir(str(tmp_path / "archive"))


def test_reference_trades_config_runs(spark, sf_dir, tmp_path, reference_configs):
    """dataset-sales-sqlserver.json: StoredProcedure extraction
    (dbo.sp_GetDailyTrades) with date params, no transformations."""
    register_views(spark, sf_dir)
    cfg = reference_configs["Trades-daily-sqlserver"]
    cfg.upload.base_path = str(tmp_path / "lake")
    # Reference params span 2024-2025; lake trade_dates are 1995-2001:
    cfg.source.parameters = {"StartDate": "1996-01-01", "EndDate": "1999-12-31"}

    result = run_dataset(spark, cfg, environment="Production")
    assert result.success, [(e.stage, e.message) for e in result.errors]
    assert result.rows > 0
    out = spark.read.parquet(result.output_dir)
    assert "trade_id" in out.columns
    assert os.path.basename(result.output_dir).startswith("Trades_")


def test_reference_cron_expressions_parse(reference_configs):
    from datalakeingestionservice_spark.pipeline.scheduler import CronSchedule

    for cfg in reference_configs.values():
        if cfg.cron_expression:
            CronSchedule(cfg.cron_expression)  # must not raise


def test_reference_sql_file_runs_verbatim(spark, sf_dir, tmp_path, reference_configs):
    """dataset-trades-query.json + its GetDailyTrades.sql T-SQL file run
    as shipped: @params and dbo. schema handled by the dialect shim, the
    Trades compat view satisfies the schema, the config's own 2024-2025
    parameter window selects data."""
    from datalakeingestionservice_spark.catalog import register_compat_views

    register_compat_views(spark, sf_dir)
    cfg = reference_configs["trades-daily-query"]
    cfg.upload.base_path = str(tmp_path / "lake")

    result = run_dataset(
        spark, cfg, environment="Production",
        sql_dir=os.path.join(REFERENCE_DATASETS, "SqlFiles"),
    )
    assert result.success, [(e.stage, e.message) for e in result.errors]
    assert result.rows > 0
    out = spark.read.parquet(result.output_dir)
    assert out.columns == [
        "TradeId", "TradeDate", "Symbol", "Quantity", "Price",
        "TotalAmount", "TradeType", "AccountId", "CreatedAt",
    ]
