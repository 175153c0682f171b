"""Pipeline layer: context, stage chain, transformation fold, job runner.

Reference: 5-stage chain-of-responsibility Extraction -> Transformation ->
Parquet -> CTL -> Upload with Critical-error short-circuit and per-stage
metrics (`DataPipeline.cs:20-63`, `BasePipelineHandler.cs:24-94`). Here the
first three "stages" build ONE lazy Catalyst plan; execution happens once at
the sink. Stage boundaries survive as error attribution + metrics scopes.
"""

from datalakeingestionservice_spark.pipeline.context import (
    ErrorSeverity,
    PipelineContext,
    PipelineError,
    PipelineResult,
    StageMetrics,
)
from datalakeingestionservice_spark.pipeline.transform import apply_transformations
from datalakeingestionservice_spark.pipeline.runner import run_dataset

__all__ = [
    "ErrorSeverity",
    "PipelineContext",
    "PipelineError",
    "PipelineResult",
    "StageMetrics",
    "apply_transformations",
    "run_dataset",
]
