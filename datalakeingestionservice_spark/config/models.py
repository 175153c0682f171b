"""Dataclasses mirroring the reference's dataset JSON contract.

Field names match `src/Core/Models/DatasetConfiguration.cs:5-106` and the
shipped `src/Worker/Datasets/dataset-*.json` files key-for-key (camelCase in
JSON, snake_case here), so reference configs parse unmodified. Unknown keys are
ignored (the reference's case-insensitive binder does the same).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


def _get(d: dict, key: str, default=None):
    """Case-insensitive key lookup (reference binder is case-insensitive)."""
    if key in d:
        return d[key]
    lowered = {k.lower(): v for k, v in d.items()}
    return lowered.get(key.lower(), default)


@dataclass
class SourceConfig:
    #: "SqlServer" | "Oracle" (reference) | "Parquet" | "Csv" | "Json" | "Sql"
    #: (engine-native lake sources).
    type: str = "Parquet"
    connection_string_key: str | None = None
    #: "Query" (read SQL file) | "StoredProcedure" | "Package" — reference
    #: extraction types (`DataIngestionJob.cs:83-112`); engine adds "Path"
    #: (direct lake path) and "Inline" (SQL text in config).
    extraction_type: str = "Query"
    query: str | None = None
    sql_file_path: str | None = None
    package_name: str | None = None
    procedure_name: str | None = None
    #: Lake path (engine extension) for Path extraction.
    path: str | None = None
    parameters: dict[str, Any] = field(default_factory=dict)
    command_timeout: int = 600

    @classmethod
    def from_dict(cls, d: dict) -> "SourceConfig":
        return cls(
            type=_get(d, "type", "Parquet"),
            connection_string_key=_get(d, "connectionStringKey"),
            extraction_type=_get(d, "extractionType", "Query"),
            query=_get(d, "query"),
            sql_file_path=_get(d, "sqlFilePath"),
            package_name=_get(d, "packageName"),
            procedure_name=_get(d, "procedureName"),
            path=_get(d, "path"),
            parameters=_get(d, "parameters", {}) or {},
            command_timeout=int(_get(d, "commandTimeout", 600)),
        )


@dataclass
class TransformationConfig:
    type: str
    enabled: bool = True
    order: int = 0
    environments: list[str] = field(default_factory=list)
    config: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "TransformationConfig":
        return cls(
            type=_get(d, "type", ""),
            enabled=bool(_get(d, "enabled", True)),
            order=int(_get(d, "order", 0)),
            environments=list(_get(d, "environments", []) or []),
            config=_get(d, "config", {}) or {},
        )


@dataclass
class ParquetConfig:
    file_name_pattern: str = "{datasetId}_{date:yyyyMMdd}_{time:HHmmss}.parquet"
    #: Honored here (the reference declares these but hardcodes Snappy + one
    #: row group — `ParquetWriterService.cs:42-44`).
    compression_codec: str = "Snappy"
    row_group_size: int = 5000
    enable_statistics: bool = True
    #: Engine extensions for scale:
    partition_by: list[str] = field(default_factory=list)
    single_file: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "ParquetConfig":
        return cls(
            file_name_pattern=_get(
                d, "fileNamePattern", "{datasetId}_{date:yyyyMMdd}_{time:HHmmss}.parquet"
            ),
            compression_codec=_get(d, "compressionCodec", "Snappy"),
            row_group_size=int(_get(d, "rowGroupSize", 5000)),
            enable_statistics=bool(_get(d, "enableStatistics", True)),
            partition_by=list(_get(d, "partitionBy", []) or []),
            single_file=bool(_get(d, "singleFile", False)),
        )


@dataclass
class UploadConfig:
    provider: str = "FileSystem"
    base_path: str = ""
    relative_path: str = ""
    overwrite_existing: bool = False
    enable_retry: bool = True
    max_retries: int = 3
    keep_local_copy: bool = False
    local_copy_path: str | None = None
    #: AzureBlob provider fields (`AzureBlobStorageProvider.cs:21-56`).
    container: str | None = None
    connection_string_key: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "UploadConfig":
        fs = _get(d, "fileSystemConfig", {}) or {}
        blob = _get(d, "azureBlobConfig", {}) or {}
        return cls(
            provider=_get(d, "provider", "FileSystem"),
            base_path=_get(fs, "basePath", "") or _get(d, "basePath", "") or "",
            relative_path=_get(fs, "relativePath", "")
            or _get(d, "relativePath", "")
            or "",
            overwrite_existing=bool(_get(d, "overwriteExisting", False)),
            enable_retry=bool(_get(d, "enableRetry", True)),
            max_retries=int(_get(d, "maxRetries", 3)),
            keep_local_copy=bool(_get(d, "keepLocalCopy", False)),
            local_copy_path=_get(d, "localCopyPath"),
            container=_get(blob, "container"),
            connection_string_key=_get(blob, "connectionStringKey"),
        )


@dataclass
class DatasetConfiguration:
    dataset_id: str
    name: str = ""
    description: str = ""
    enabled: bool = True
    cron_expression: str | None = None
    source: SourceConfig = field(default_factory=SourceConfig)
    transformations: list[TransformationConfig] = field(default_factory=list)
    parquet: ParquetConfig = field(default_factory=ParquetConfig)
    upload: UploadConfig = field(default_factory=UploadConfig)
    notifications: dict[str, Any] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "DatasetConfiguration":
        dataset_id = _get(d, "datasetId") or _get(d, "id")
        if not dataset_id:
            raise ValueError("dataset config missing 'datasetId'")
        return cls(
            dataset_id=dataset_id,
            name=_get(d, "name", ""),
            description=_get(d, "description", ""),
            enabled=bool(_get(d, "enabled", True)),
            cron_expression=_get(d, "cronExpression"),
            source=SourceConfig.from_dict(_get(d, "source", {}) or {}),
            transformations=[
                TransformationConfig.from_dict(t)
                for t in (_get(d, "transformations", []) or [])
            ],
            parquet=ParquetConfig.from_dict(_get(d, "parquet", {}) or {}),
            upload=UploadConfig.from_dict(_get(d, "upload", {}) or {}),
            notifications=_get(d, "notifications", {}) or {},
            metadata=_get(d, "metadata", {}) or {},
        )
