"""Incremental (high-watermark) ingestion.

The reference re-extracts whatever its static StartDate/EndDate params say on
every cron fire (`dataset-sales-sqlserver.json:13-16`) — incremental state is
manual. This module closes that: a durable per-dataset watermark store feeds
the extraction query's named parameter, and a successful publish advances the
watermark to max(watermark_col) of the rows actually committed — so crash
before publish means the next run re-extracts (at-least-once, CTL marks
completeness), and an empty increment publishes nothing and keeps the
watermark.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, replace
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.config.models import DatasetConfiguration
from datalakeingestionservice_spark.pipeline.context import PipelineResult
from datalakeingestionservice_spark.pipeline.runner import run_dataset


class WatermarkStore:
    """Durable per-dataset watermark values (JSON file; swap for a table in
    prod — the interface is three methods)."""

    def __init__(self, path: str):
        self._path = path

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path, encoding="utf-8") as fh:
            return json.load(fh)

    def get(self, dataset_id: str, default: Any = None) -> Any:
        return self._load().get(dataset_id, default)

    def set(self, dataset_id: str, value: Any) -> None:
        state = self._load()
        state[dataset_id] = value
        tmp = self._path + ".tmp"
        os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._path)


@dataclass
class IncrementalResult:
    result: PipelineResult
    previous_watermark: Any
    new_watermark: Any


def run_incremental(
    spark: SparkSession,
    config: DatasetConfiguration,
    store: WatermarkStore,
    watermark_col: str,
    watermark_param: str = "Watermark",
    initial_watermark: Any = "1970-01-01 00:00:00",
    environment: str = "Development",
    **run_kwargs,
) -> IncrementalResult:
    """One incremental run: bind the stored watermark as the extraction
    parameter, ingest, then advance the watermark from the committed output."""
    previous = store.get(config.dataset_id, initial_watermark)
    # Bind the watermark on a per-run copy: the shared DatasetConfiguration
    # (often reused across cron fires and datasets) is never mutated.
    bound = replace(
        config,
        source=replace(
            config.source,
            parameters={
                **(config.source.parameters or {}),
                watermark_param: previous,
            },
        ),
    )
    result = run_dataset(spark, bound, environment=environment, **run_kwargs)

    new_watermark = previous
    if result.success and result.rows and result.output_dir:
        committed_max = (
            spark.read.parquet(result.output_dir)
            .agg(F.max(watermark_col).alias("wm"))
            .collect()[0]
            .wm
        )
        if committed_max is not None:
            new_watermark = (
                committed_max.strftime("%Y-%m-%d %H:%M:%S.%f")
                if hasattr(committed_max, "strftime")
                else committed_max
            )
            store.set(config.dataset_id, new_watermark)
    return IncrementalResult(
        result=result, previous_watermark=previous, new_watermark=new_watermark
    )
