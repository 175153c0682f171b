"""Source factory dispatch + extraction-type routing (SURVEY.md A1-A6)."""

from __future__ import annotations

import pytest

from datalakeingestionservice_spark.catalog import register_views
from datalakeingestionservice_spark.config.models import SourceConfig
from datalakeingestionservice_spark.sources import SourceError, extract
from datalakeingestionservice_spark.sources.query_templates import (
    get_query_template,
    register_query_template,
)


def test_parquet_source(spark, sf_dir):
    src = SourceConfig(type="Parquet", path=f"{sf_dir}/nation.parquet")
    assert extract(spark, src).count() > 0


def test_inline_sql_with_named_params(spark, sf_dir):
    register_views(spark, sf_dir)
    src = SourceConfig(
        type="Sql",
        extraction_type="Inline",
        query="SELECT count(*) AS n FROM nation WHERE n_nationkey < :k",
        parameters={"k": "5"},  # string -> int coercion (A5)
    )
    assert extract(spark, src).collect()[0].n == 5


def test_stored_procedure_template(spark, sf_dir):
    register_views(spark, sf_dir)
    src = SourceConfig(
        type="SqlServer",  # reference alias -> native SQL path
        extraction_type="StoredProcedure",
        procedure_name="dbo.sp_GetDailyTrades",
        parameters={"StartDate": "1997-01-01", "EndDate": "1997-12-31"},
    )
    df = extract(spark, src)
    assert "trade_id" in df.columns
    assert df.count() > 0


def test_package_template_case_insensitive(spark, sf_dir):
    register_views(spark, sf_dir)
    src = SourceConfig(
        type="Oracle",
        extraction_type="Package",
        package_name="hr_pkg",
        procedure_name="get_employee_data",
        parameters={"p_department_id": "0", "p_active_only": "Y"},
    )
    df = extract(spark, src)
    assert df.columns[0] == "EMPLOYEE_ID"
    assert df.count() > 0


def test_sql_file_extraction(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    (tmp_path / "q.sql").write_text("SELECT r_name FROM region ORDER BY r_name")
    src = SourceConfig(type="Sql", extraction_type="Query", sql_file_path="q.sql")
    df = extract(spark, src, sql_dir=str(tmp_path))
    assert df.count() > 0


def test_unknown_type_and_missing_template_raise(spark):
    with pytest.raises(SourceError, match="Unsupported source type"):
        extract(spark, SourceConfig(type="Mongo"))
    with pytest.raises(KeyError, match="no query template"):
        get_query_template("dbo.sp_Missing")


def test_register_custom_template(spark, sf_dir):
    register_views(spark, sf_dir)
    register_query_template("dbo.sp_RegionCount", "SELECT count(*) AS n FROM region")
    src = SourceConfig(
        type="Sql", extraction_type="StoredProcedure",
        procedure_name="DBO.SP_REGIONCOUNT",
    )
    assert extract(spark, src).collect()[0].n > 0


def test_csv_source_roundtrip(spark, tmp_path):
    (tmp_path / "data.csv").write_text("id,name\n1,alpha\n2,beta\n")
    src = SourceConfig(type="Csv", path=str(tmp_path / "data.csv"))
    rows = {r.id: r.name for r in extract(spark, src).collect()}
    assert rows == {1: "alpha", 2: "beta"}


def test_json_source_roundtrip(spark, tmp_path):
    (tmp_path / "data.json").write_text(
        '{"id": 1, "v": 1.5}\n{"id": 2, "v": 2.5}\n'
    )
    src = SourceConfig(type="Json", path=str(tmp_path / "data.json"))
    rows = {r.id: r.v for r in extract(spark, src).collect()}
    assert rows == {1: 1.5, 2: 2.5}


def test_jdbc_source_requires_url(spark):
    with pytest.raises(SourceError, match="url"):
        extract(spark, SourceConfig(type="Jdbc", parameters={}))


def test_tsql_dialect_shim():
    from datalakeingestionservice_spark.sources.dialect import tsql_to_spark

    out = tsql_to_spark(
        "SELECT TOP 5 [Trade Id], Price FROM dbo.Trades "
        "WHERE TradeDate BETWEEN @StartDate AND @EndDate"
    )
    assert ":StartDate" in out and ":EndDate" in out and "@" not in out
    assert "dbo." not in out
    assert "`Trade Id`" in out
    assert out.rstrip().endswith("LIMIT 5")
    assert "TOP" not in out.upper().replace("LIMIT", "")
