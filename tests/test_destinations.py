"""Destination dispatch (A14/A15): provider -> base URI resolution."""

from __future__ import annotations

import pytest

from datalakeingestionservice_spark.config.models import UploadConfig
from datalakeingestionservice_spark.sinks.destinations import (
    DestinationError,
    is_remote,
    resolve_destination,
)


def test_filesystem_resolution():
    up = UploadConfig(provider="FileSystem", base_path="/lake", relative_path="hr\\emp/")
    assert resolve_destination(up) == "/lake/hr/emp"
    assert not is_remote("/lake/hr/emp")


def test_azure_blob_resolution():
    up = UploadConfig(
        provider="AzureBlob",
        base_path="myaccount",
        relative_path="hr/employees",
        container="datalake",
    )
    uri = resolve_destination(up)
    assert uri == "abfss://datalake@myaccount.dfs.core.windows.net/hr/employees"
    assert is_remote(uri)


def test_azure_blob_requires_container():
    up = UploadConfig(provider="azureblob", base_path="acct")
    with pytest.raises(DestinationError, match="container"):
        resolve_destination(up)


def test_s3_resolution_and_unknown_provider():
    up = UploadConfig(provider="S3", base_path="my-bucket", relative_path="x/y")
    assert resolve_destination(up) == "s3a://my-bucket/x/y"
    with pytest.raises(DestinationError, match="Unsupported upload provider"):
        resolve_destination(UploadConfig(provider="Gcs"))
