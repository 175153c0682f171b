"""Pipeline context, error model, and metrics (SURVEY.md A16).

Mirrors the reference's `PipelineContext` (metadata + payload + severity-tagged
error list, `PipelineContext.cs:10-43`) and `StageMetrics`
(`BasePipelineHandler.cs:86-94`) — with the `DataTable` payload replaced by a
lazy DataFrame and byte buffers replaced by committed file paths.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from datalakeingestionservice_spark.config.models import DatasetConfiguration


class ErrorSeverity(enum.Enum):
    WARNING = "Warning"
    ERROR = "Error"
    CRITICAL = "Critical"


@dataclass
class PipelineError:
    stage: str
    severity: ErrorSeverity
    message: str
    exception: Exception | None = None


@dataclass
class StageMetrics:
    stage: str
    duration_seconds: float
    rows: int | None = None
    bytes: int | None = None


@dataclass
class PipelineContext:
    config: DatasetConfiguration
    environment: str = "Development"
    df: DataFrame | None = None
    metadata: dict[str, Any] = field(default_factory=dict)
    errors: list[PipelineError] = field(default_factory=list)
    metrics: list[StageMetrics] = field(default_factory=list)
    output_dir: str | None = None
    ctl_path: str | None = None

    def add_error(
        self,
        stage: str,
        severity: ErrorSeverity,
        message: str,
        exception: Exception | None = None,
    ) -> None:
        self.errors.append(PipelineError(stage, severity, message, exception))

    @property
    def has_critical(self) -> bool:
        return any(e.severity is ErrorSeverity.CRITICAL for e in self.errors)


@dataclass
class PipelineResult:
    success: bool
    dataset_id: str
    output_dir: str | None
    ctl_path: str | None
    rows: int | None
    errors: list[PipelineError]
    metrics: list[StageMetrics]

    @property
    def duration_seconds(self) -> float:
        return round(sum(m.duration_seconds for m in self.metrics), 3)
