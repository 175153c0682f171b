"""Dataset config discovery (SURVEY.md A19).

Globs ``dataset-*.json`` under a directory; malformed files are logged and
skipped, never fatal (`DatasetConfigurationService.cs:34-62` does the same).
"""

from __future__ import annotations

import glob
import json
import logging
import os

from datalakeingestionservice_spark.config.models import DatasetConfiguration

logger = logging.getLogger(__name__)


def load_dataset_file(path: str) -> DatasetConfiguration:
    with open(path, encoding="utf-8") as fh:
        return DatasetConfiguration.from_dict(json.load(fh))


def load_dataset_configs(config_dir: str) -> dict[str, DatasetConfiguration]:
    """All parseable dataset configs in the directory, keyed by dataset_id."""
    configs: dict[str, DatasetConfiguration] = {}
    for path in sorted(glob.glob(os.path.join(config_dir, "dataset-*.json"))):
        try:
            cfg = load_dataset_file(path)
        except Exception as exc:  # bad file: log & skip, keep loading others
            logger.warning("skipping malformed dataset config %s: %s", path, exc)
            continue
        configs[cfg.dataset_id] = cfg
    return configs


def get_dataset_config(config_dir: str, dataset_id: str) -> DatasetConfiguration:
    configs = load_dataset_configs(config_dir)
    try:
        return configs[dataset_id]
    except KeyError:
        raise KeyError(
            f"dataset {dataset_id!r} not found in {config_dir} "
            f"(available: {sorted(configs)})"
        ) from None
