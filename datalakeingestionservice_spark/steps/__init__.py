"""Transformation-step registry (reference A9/A10, Spark-first).

The reference discovers `ITransformationStep` implementations by reflection and
registers them by class name minus the `Step` suffix
(`src/Infrastructure/Transformation/TransformationStepFactory.cs:30-129`). Here
a decorator registry maps the same names (so reference dataset JSON files run
unmodified) to classes exposing ``apply(df) -> DataFrame``. Steps are pure,
lazy DataFrame -> DataFrame transforms: no copies (DataFrames are immutable —
the reference's defensive `data.Copy()` at `TransformationEngine.cs:26` has no
analogue), no actions, so the whole chain stays one Catalyst plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

STEP_REGISTRY: dict[str, type] = {}


class StepError(Exception):
    """Raised when a step cannot be built or applied."""


def register_step(name: str) -> Callable[[type], type]:
    """Register a step class under the reference's config `type` name."""

    def deco(cls: type) -> type:
        STEP_REGISTRY[name] = cls
        return cls

    return deco


def create_step(name: str, config: dict | None = None):
    """Factory: config `type` name -> step instance (reference
    `TransformationStepFactory.cs:39-70`; unknown name -> error, same contract)."""
    try:
        cls = STEP_REGISTRY[name]
    except KeyError:
        raise StepError(
            f"Unknown transformation step: {name!r}. "
            f"Registered: {sorted(STEP_REGISTRY)}"
        ) from None
    return cls(config or {})


class BaseStep:
    """A step holds its JSON config dict and transforms a DataFrame lazily."""

    def __init__(self, config: dict):
        self.config = config or {}

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


# Populate the registry.
from datalakeingestionservice_spark.steps import common  # noqa: E402,F401

__all__ = [
    "STEP_REGISTRY",
    "register_step",
    "create_step",
    "BaseStep",
    "StepError",
]
