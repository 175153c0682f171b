"""Transformation fold with environment gating (SURVEY.md A9).

Reference: `TransformationEngine.cs:21-69` — enabled steps sorted by `order`,
each gated on the current environment (case-insensitive; empty list = always),
folded sequentially over the table. Here the fold composes lazy DataFrame
transforms into one plan; there is no per-step materialization or defensive
copy (DataFrames are immutable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from datalakeingestionservice_spark.config.models import TransformationConfig
from datalakeingestionservice_spark.steps import create_step


def step_applies(cfg: TransformationConfig, environment: str) -> bool:
    """Env gate (`TransformationEngine.cs:58-69`): empty list = all envs."""
    if not cfg.enabled:
        return False
    if not cfg.environments:
        return True
    return environment.lower() in (e.lower() for e in cfg.environments)


def apply_transformations(
    df: DataFrame,
    transformations: list[TransformationConfig],
    environment: str = "Development",
) -> DataFrame:
    """Fold enabled, env-applicable steps in `order` over the DataFrame."""
    applicable = sorted(
        (t for t in transformations if step_applies(t, environment)),
        key=lambda t: t.order,
    )
    for cfg in applicable:
        step = create_step(cfg.type, cfg.config)
        df = step.apply(df)
    return df
