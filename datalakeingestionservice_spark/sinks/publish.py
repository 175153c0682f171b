"""Atomic publish + destination dispatch (SURVEY.md A13-A15).

Reference behavior: write to temp then atomic move
(`FileSystemUploadProvider.cs:78-106`), dual Parquet+CTL upload with optional
non-fatal local copy (`UploadHandler.cs:52-163`), provider dispatch
(`UploadProviderFactory.cs:26-34`). Spark equivalent: the job writes to a
staging directory; publish is a directory rename into the final location —
task-level atomicity comes free from Spark's FileOutputCommitter, run-level
atomicity from the rename here. Cloud destinations (abfss://, s3a://) are
direct `df.write` targets via their Hadoop filesystems — no separate upload
stage exists in a lake-native engine.
"""

from __future__ import annotations

import logging
import os
import shutil

logger = logging.getLogger(__name__)


class PublishError(Exception):
    pass


def with_retry(fn, max_retries: int = 3, backoff_seconds: float = 0.5):
    """Bounded-retry wrapper for transient destination failures.

    The reference declares `enableRetry`/`maxRetries` config but ships no
    retry loop (SURVEY.md section 4.1); here the declared contract is honored.
    Retries only OSError-family failures (transient I/O); logic errors
    (PublishError on existing destination) fail immediately.
    """
    import time

    attempt = 0
    while True:
        try:
            return fn()
        except OSError as exc:
            attempt += 1
            if attempt > max_retries:
                raise
            logger.warning(
                "publish attempt %d/%d failed (%s); retrying",
                attempt, max_retries, exc,
            )
            time.sleep(backoff_seconds * (2 ** (attempt - 1)))


def publish_directory(
    staging_dir: str,
    final_dir: str,
    overwrite: bool = False,
    keep_local_copy: bool = False,
    local_copy_path: str | None = None,
) -> str:
    """Atomically move a completed staging directory into its final location."""
    if not os.path.isdir(staging_dir):
        raise PublishError(f"staging directory missing: {staging_dir}")
    if os.path.exists(final_dir):
        if not overwrite:
            raise PublishError(
                f"destination exists and overwriteExisting is false: {final_dir}"
            )
        shutil.rmtree(final_dir)
    os.makedirs(os.path.dirname(final_dir) or ".", exist_ok=True)
    os.replace(staging_dir, final_dir)

    if keep_local_copy and local_copy_path:
        # Non-fatal by contract (`UploadHandler.cs:131-163`).
        try:
            os.makedirs(local_copy_path, exist_ok=True)
            dest = os.path.join(local_copy_path, os.path.basename(final_dir))
            if os.path.exists(dest):
                shutil.rmtree(dest)
            shutil.copytree(final_dir, dest)
        except OSError as exc:
            logger.warning("keepLocalCopy failed (non-fatal): %s", exc)
    return final_dir
