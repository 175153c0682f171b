"""Configuration layer: the reference's dataset JSON contract, unmodified.

Reference model: `src/Core/Models/DatasetConfiguration.cs:5-106`; loader:
`src/Infrastructure/Services/DatasetConfigurationService.cs:22-76`. Keeping the
same JSON keys means reference `dataset-*.json` files drive this engine as-is.
"""

from datalakeingestionservice_spark.config.models import (
    DatasetConfiguration,
    ParquetConfig,
    SourceConfig,
    TransformationConfig,
    UploadConfig,
)
from datalakeingestionservice_spark.config.loader import (
    load_dataset_configs,
    load_dataset_file,
)
from datalakeingestionservice_spark.config.coercion import coerce_value
from datalakeingestionservice_spark.config.vault import resolve_placeholders

__all__ = [
    "DatasetConfiguration",
    "SourceConfig",
    "TransformationConfig",
    "ParquetConfig",
    "UploadConfig",
    "load_dataset_configs",
    "load_dataset_file",
    "coerce_value",
    "resolve_placeholders",
]
