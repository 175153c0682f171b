"""Destination/provider dispatch (SURVEY.md A13-A15).

Reference: `UploadProviderFactory.cs:26-34` dispatches "filesystem" /
"azureblob" (case-insensitive, unknown -> error). Lake-native equivalents:

- FileSystem  -> local staging + atomic rename (`publish.py`)
- AzureBlob   -> an `abfss://container@account.dfs.core.windows.net/...` base
  path; Spark writes through hadoop-azure directly, so "upload" is just the
  write destination — there is no post-hoc byte copy stage. Resolving the URI
  and validating config is engine work; the hadoop-azure jars + credentials
  are deployment concerns (not installable here, so URI construction is
  tested, live writes are not).
- S3 -> `s3a://bucket/...`, same story.
"""

from __future__ import annotations

from collections.abc import Callable

from datalakeingestionservice_spark.config.models import UploadConfig


class DestinationError(Exception):
    """Unknown provider (reference throws NotSupportedException)."""


def _filesystem_base(upload: UploadConfig) -> str:
    base = upload.base_path or "/tmp/dlis-output"
    rel = (upload.relative_path or "").strip("/").replace("\\", "/")
    return f"{base.rstrip('/')}/{rel}" if rel else base


def _azure_blob_base(upload: UploadConfig) -> str:
    if not upload.container:
        raise DestinationError(
            "AzureBlob provider requires azureBlobConfig.container"
        )
    account = upload.base_path  # storage account name rides in basePath
    if not account:
        raise DestinationError(
            "AzureBlob provider requires a storage account (basePath)"
        )
    rel = (upload.relative_path or "").strip("/").replace("\\", "/")
    uri = f"abfss://{upload.container}@{account}.dfs.core.windows.net"
    return f"{uri}/{rel}" if rel else uri


def _s3_base(upload: UploadConfig) -> str:
    if not upload.base_path:
        raise DestinationError("S3 provider requires a bucket (basePath)")
    rel = (upload.relative_path or "").strip("/")
    uri = f"s3a://{upload.base_path.strip('/')}"
    return f"{uri}/{rel}" if rel else uri


def _hadoop_base(upload: UploadConfig) -> str:
    """Generic Hadoop-FS destination: basePath is a full URI of any scheme
    Spark's Hadoop conf knows (hdfs://, file://, gs://, ...)."""
    if "://" not in (upload.base_path or ""):
        raise DestinationError(
            "Hadoop provider requires a full URI basePath (scheme://...)"
        )
    rel = (upload.relative_path or "").strip("/").replace("\\", "/")
    base = upload.base_path.rstrip("/")
    return f"{base}/{rel}" if rel else base


DESTINATION_REGISTRY: dict[str, Callable[[UploadConfig], str]] = {
    "filesystem": _filesystem_base,
    "azureblob": _azure_blob_base,
    "s3": _s3_base,
    "hadoop": _hadoop_base,
}


def resolve_destination(upload: UploadConfig) -> str:
    """Provider name -> base URI for the dataset's outputs. Case-insensitive
    dispatch, unknown provider -> error (reference contract)."""
    provider = (upload.provider or "FileSystem").lower()
    resolver = DESTINATION_REGISTRY.get(provider)
    if resolver is None:
        raise DestinationError(
            f"Unsupported upload provider: {upload.provider!r} "
            f"(registered: {sorted(DESTINATION_REGISTRY)})"
        )
    return resolver(upload)


def is_remote(base_uri: str) -> bool:
    return "://" in base_uri
