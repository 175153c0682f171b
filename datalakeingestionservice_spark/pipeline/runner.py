"""Dataset job runner — the engine's `run_dataset` entry point (SURVEY.md A16/A17).

Stage flow (reference `DataPipeline.cs:20-26` chain, Spark-first):

  extract (lazy) -> transform (lazy) -> write parquet (THE action)
  -> CTL from commit metadata -> atomic publish

Extraction/transformation failures are plan-construction failures (cheap,
immediate); execution failures surface at the write. Critical errors
short-circuit the remaining stages (`BasePipelineHandler.cs:27-36` contract).

The 0-row edge the reference fumbles (writes nothing, then the upload stage
fails with "No Parquet data" — `ParquetWriterService.cs:24-28`,
`UploadHandler.cs:24-32`) is resolved deliberately: an empty result still
commits a valid empty parquet file + a CTL with RecordCount=0.
"""

from __future__ import annotations

import logging
import os
import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from datalakeingestionservice_spark.config.models import DatasetConfiguration
from datalakeingestionservice_spark.pipeline.context import (
    ErrorSeverity,
    PipelineContext,
    PipelineResult,
    StageMetrics,
)
from datalakeingestionservice_spark.pipeline.transform import apply_transformations
from datalakeingestionservice_spark.session import prepare_session
from datalakeingestionservice_spark.sinks.ctl import (
    combined_checksum_distributed,
    generate_ctl,
    write_ctl,
    write_ctl_hadoop,
)
from datalakeingestionservice_spark.sinks.destinations import (
    DestinationError,
    is_remote,
    resolve_destination,
)
from datalakeingestionservice_spark.sinks.parquet_sink import write_parquet
from datalakeingestionservice_spark.sinks.publish import (
    publish_directory,
    with_retry,
)
from datalakeingestionservice_spark.sources.registry import extract

logger = logging.getLogger(__name__)


def render_file_name(pattern: str, dataset_id: str, now: datetime) -> str:
    """`{datasetId}` + `{date:...}`/`{time:...}` tokens
    (`DataIngestionJob.cs:161-169`); .NET-style yyyyMMdd/HHmmss only."""
    out = pattern.replace("{datasetId}", dataset_id)
    out = out.replace("{date:yyyyMMdd}", now.strftime("%Y%m%d"))
    out = out.replace("{time:HHmmss}", now.strftime("%H%M%S"))
    return out


def run_dataset(
    spark: SparkSession,
    config: DatasetConfiguration,
    environment: str = "Development",
    sql_dir: str | None = None,
    staging_root: str | None = None,
    now: datetime | None = None,
) -> PipelineResult:
    """Execute one dataset ingestion end-to-end. Returns a result object; never
    raises for stage failures (they land in `result.errors`, reference
    contract)."""
    prepare_session(spark)
    ctx = PipelineContext(config=config, environment=environment)
    now = now or datetime.now(timezone.utc)

    # --- stage 1+2: build the lazy plan (extract + transform) ----------------
    t0 = time.perf_counter()
    try:
        df = extract(spark, config.source, sql_dir=sql_dir)
        df = apply_transformations(df, config.transformations, environment)
        ctx.df = df
    except Exception as exc:
        ctx.add_error("Extraction", ErrorSeverity.CRITICAL, str(exc), exc)
    ctx.metrics.append(StageMetrics("PlanBuild", time.perf_counter() - t0))

    rows = None
    remote = False
    staging = None
    if not ctx.has_critical:
        # --- stage 3: the single action — write parquet ----------------------
        # Local destinations stage + atomically rename; remote (abfss/s3a/...)
        # destinations are written directly — object stores have no atomic
        # rename, the committer provides task-level atomicity and the CTL file
        # marks run-level completion (readers gate on its presence).
        try:
            base = resolve_destination(config.upload)
        except DestinationError as exc:
            ctx.add_error("Upload", ErrorSeverity.CRITICAL, str(exc), exc)
            base = None
    if not ctx.has_critical:
        remote = is_remote(base)
        file_name = render_file_name(
            config.parquet.file_name_pattern, config.dataset_id, now
        ).removesuffix(".parquet")
        if remote:
            final_dir = f"{base.rstrip('/')}/{file_name}"
            staging = final_dir  # direct write
        else:
            final_dir = os.path.join(base, file_name)
            staging = os.path.join(
                staging_root or os.path.join(config.upload.base_path or base, ".staging"),
                f"{config.dataset_id}-{uuid.uuid4().hex[:8]}",
            )
        t0 = time.perf_counter()
        try:
            write_mode = "overwrite"
            if remote and not config.upload.overwrite_existing:
                write_mode = "errorifexists"
            write_result = write_parquet(
                ctx.df,
                staging,
                compression=config.parquet.compression_codec,
                row_group_size=config.parquet.row_group_size,
                enable_statistics=config.parquet.enable_statistics,
                single_file=config.parquet.single_file,
                partition_by=config.parquet.partition_by or None,
                mode=write_mode,
            )
            rows = write_result.rows
            ctx.metrics.append(
                StageMetrics(
                    "ParquetWrite",
                    time.perf_counter() - t0,
                    rows=write_result.rows,
                    bytes=write_result.total_bytes,
                )
            )
        except Exception as exc:
            ctx.add_error("ParquetGeneration", ErrorSeverity.CRITICAL, str(exc), exc)
            ctx.metrics.append(StageMetrics("ParquetWrite", time.perf_counter() - t0))

    if not ctx.has_critical:
        # --- stage 4: CTL from commit metadata -------------------------------
        t0 = time.perf_counter()
        try:
            checksum = None
            if remote:
                # Executors hash the committed files; bytes never hit the driver.
                checksum = combined_checksum_distributed(
                    spark, write_result.files
                )
            record = generate_ctl(
                dataset_id=config.dataset_id,
                source=config.source.type,
                record_count=write_result.rows,
                files=write_result.files,
                now=now,
                checksum=checksum,
            )
            # Underscore prefix: Spark/Hadoop readers ignore `_*` files, so the
            # control file can live beside the part-files it describes.
            if remote:
                ctx.ctl_path = write_ctl_hadoop(
                    spark,
                    record,
                    f"{staging.rstrip('/')}/_{record.dataset_name}.ctl",
                )
            else:
                ctx.ctl_path = write_ctl(
                    record, os.path.join(staging, f"_{record.dataset_name}.ctl")
                )
        except Exception as exc:
            ctx.add_error("CtlGeneration", ErrorSeverity.CRITICAL, str(exc), exc)
        ctx.metrics.append(StageMetrics("CtlGeneration", time.perf_counter() - t0))

    if not ctx.has_critical:
        # --- stage 5: atomic publish (local only; remote wrote in place and
        # the CTL's existence is the completion marker) ------------------------
        t0 = time.perf_counter()
        if remote:
            ctx.output_dir = final_dir
        else:
            try:
                publish = lambda: publish_directory(  # noqa: E731
                    staging,
                    final_dir,
                    overwrite=config.upload.overwrite_existing,
                    keep_local_copy=config.upload.keep_local_copy,
                    local_copy_path=config.upload.local_copy_path,
                )
                if config.upload.enable_retry:
                    published = with_retry(
                        publish, max_retries=config.upload.max_retries
                    )
                else:
                    published = publish()
                ctx.output_dir = published
                ctx.ctl_path = os.path.join(
                    published, os.path.basename(ctx.ctl_path)
                )
            except Exception as exc:
                ctx.add_error("Upload", ErrorSeverity.CRITICAL, str(exc), exc)
        ctx.metrics.append(StageMetrics("Publish", time.perf_counter() - t0))

    if not ctx.has_critical and ctx.output_dir and not remote:
        # Run report beside the data (reference analog: notifications payload +
        # job metadata). JSON, `_`-prefixed so table readers skip it.
        try:
            import json

            report = {
                "datasetId": config.dataset_id,
                "environment": environment,
                "rows": rows,
                "success": True,
                "startedAt": now.strftime("%Y-%m-%dT%H:%M:%S"),
                "stages": [
                    {
                        "stage": m.stage,
                        "durationSeconds": round(m.duration_seconds, 3),
                        "rows": m.rows,
                        "bytes": m.bytes,
                    }
                    for m in ctx.metrics
                ],
            }
            with open(
                os.path.join(ctx.output_dir, "_run_report.json"),
                "w",
                encoding="utf-8",
            ) as fh:
                json.dump(report, fh, indent=2)
        except OSError as exc:  # non-fatal, like keepLocalCopy
            logger.warning("run report write failed (non-fatal): %s", exc)

    success = not ctx.has_critical
    if not success and staging and not remote and os.path.isdir(staging):
        # Failed run: remove staging residue (reference cleans its temp file
        # on failure too — FileSystemUploadProvider.cs:99-104).
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    if not success:
        logger.error(
            "dataset %s failed: %s",
            config.dataset_id,
            [(e.stage, e.message) for e in ctx.errors],
        )
    return PipelineResult(
        success=success,
        dataset_id=config.dataset_id,
        output_dir=ctx.output_dir,
        ctl_path=ctx.ctl_path if success else None,
        rows=rows,
        errors=ctx.errors,
        metrics=ctx.metrics,
    )
