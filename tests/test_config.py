"""Config layer: JSON contract parity, coercion sniffing, vault resolution."""

from __future__ import annotations

import json
import os
from datetime import date, datetime

import pytest

from datalakeingestionservice_spark.config import (
    DatasetConfiguration,
    coerce_value,
    load_dataset_configs,
)
from datalakeingestionservice_spark.config.vault import (
    CachingResolver,
    StaticSecretProvider,
    resolve_placeholders,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_dataset_fixture_parses():
    cfg = DatasetConfiguration.from_dict(
        json.load(open(os.path.join(FIXTURES, "dataset-trades-lake.json")))
    )
    assert cfg.dataset_id == "trades-lake"
    assert cfg.cron_expression == "0 */2 * * * ?"
    assert cfg.source.extraction_type == "StoredProcedure"
    assert cfg.source.procedure_name == "dbo.sp_GetDailyTrades"
    assert cfg.source.parameters["StartDate"] == "1997-01-01"
    assert [t.type for t in cfg.transformations] == [
        "ColumnMapping",
        "DataCleansing",
        "DataMasking",
    ]
    assert cfg.parquet.row_group_size == 10000
    assert cfg.parquet.single_file is True
    assert cfg.upload.relative_path == "trades/daily/"
    assert cfg.upload.overwrite_existing is True


def test_reference_shaped_config_parses():
    """A config with the reference's exact key layout (hr-oracle shape)."""
    cfg = DatasetConfiguration.from_dict(
        {
            "datasetId": "hr",
            "source": {
                "type": "Oracle",
                "connectionStringKey": "HROracleDB",
                "extractionType": "Package",
                "packageName": "HR_PKG",
                "procedureName": "GET_EMPLOYEE_DATA",
                "parameters": {"p_department_id": "0"},
            },
            "upload": {
                "provider": "FileSystem",
                "fileSystemConfig": {"basePath": "/x", "relativePath": "hr/"},
                "keepLocalCopy": True,
                "localCopyPath": "C:\\archive",
            },
        }
    )
    assert cfg.source.package_name == "HR_PKG"
    assert cfg.upload.base_path == "/x"
    assert cfg.upload.keep_local_copy is True


def test_loader_skips_malformed(tmp_path):
    (tmp_path / "dataset-good.json").write_text('{"datasetId": "good"}')
    (tmp_path / "dataset-bad.json").write_text("{nope")
    (tmp_path / "unrelated.json").write_text('{"datasetId": "ignored"}')
    configs = load_dataset_configs(str(tmp_path))
    assert set(configs) == {"good"}


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("42", 42),
        ("-3", -3),
        ("4.5", 4.5),
        ("true", True),
        ("False", False),
        ("2024-01-02", date(2024, 1, 2)),
        ("2024-01-02T03:04:05", datetime(2024, 1, 2, 3, 4, 5)),
        ("plain text", "plain text"),
        (7, 7),
        (None, None),
    ],
)
def test_coercion_sniffing(raw, expected):
    assert coerce_value(raw) == expected


def test_vault_resolution_and_cache():
    provider = StaticSecretProvider({"db/pass": "s3cret", "db/user": "svc"})
    out = resolve_placeholders(
        "Server=x;User={vault:db/user};Password={vault:db/pass}", provider
    )
    assert out == "Server=x;User=svc;Password=s3cret"

    calls = []

    def counting(path):
        calls.append(path)
        return "v"

    resolver = CachingResolver(counting, ttl_seconds=300)
    resolver.resolve("{vault:a} {vault:a} {vault:a}")
    assert calls == ["a"]  # cached after first fetch

    with pytest.raises(KeyError, match="missing/path"):
        resolve_placeholders("{vault:missing/path}", provider)
