"""CLI: the engine's service face (reference: a Windows service host; here a
command-line driver suitable for cron/Airflow wrapping).

  python -m datalakeingestionservice_spark list --config-dir DIR
  python -m datalakeingestionservice_spark run --config-dir DIR --dataset ID \
      [--environment Production] [--sf-dir /root/testdata/sf0.01]
  python -m datalakeingestionservice_spark schedule --config-dir DIR \
      [--iterations N]   # cron loop over enabled datasets
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from datetime import datetime


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="datalakeingestionservice_spark")
    sub = p.add_subparsers(dest="command", required=True)

    listp = sub.add_parser("list", help="list dataset configs")
    listp.add_argument("--config-dir", required=True)

    runp = sub.add_parser("run", help="run one dataset ingestion")
    runp.add_argument("--config-dir", required=True)
    runp.add_argument("--dataset", required=True)
    runp.add_argument("--environment", default="Development")
    runp.add_argument("--sf-dir", default=None, help="lake dir to register as views")

    schedp = sub.add_parser("schedule", help="cron loop over enabled datasets")
    schedp.add_argument("--config-dir", required=True)
    schedp.add_argument("--environment", default="Development")
    schedp.add_argument("--sf-dir", default=None)
    schedp.add_argument("--iterations", type=int, default=0, help="0 = forever")
    schedp.add_argument("--tick-seconds", type=float, default=1.0)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from datalakeingestionservice_spark.config.loader import load_dataset_configs

    configs = load_dataset_configs(args.config_dir)

    if args.command == "list":
        for cfg in configs.values():
            print(
                json.dumps(
                    {
                        "datasetId": cfg.dataset_id,
                        "enabled": cfg.enabled,
                        "cron": cfg.cron_expression,
                        "source": cfg.source.type,
                        "extraction": cfg.source.extraction_type,
                    }
                )
            )
        return 0

    from datalakeingestionservice_spark.catalog import register_views
    from datalakeingestionservice_spark.pipeline import run_dataset
    from datalakeingestionservice_spark.session import build_session

    spark = build_session("dlis-cli")
    spark.sparkContext.setLogLevel("WARN")
    if args.sf_dir:
        register_views(spark, args.sf_dir)

    if args.command == "run":
        if args.dataset not in configs:
            print(f"unknown dataset {args.dataset!r}; have {sorted(configs)}",
                  file=sys.stderr)
            return 2
        result = run_dataset(
            spark, configs[args.dataset], environment=args.environment,
            sql_dir=args.config_dir,
        )
        print(
            json.dumps(
                {
                    "dataset": result.dataset_id,
                    "success": result.success,
                    "rows": result.rows,
                    "outputDir": result.output_dir,
                    "ctl": result.ctl_path,
                    "durationSeconds": result.duration_seconds,
                    "errors": [
                        {"stage": e.stage, "severity": e.severity.value,
                         "message": e.message}
                        for e in result.errors
                    ],
                }
            )
        )
        return 0 if result.success else 1

    # schedule: the reference's Quartz worker loop (A17/A18).
    from datalakeingestionservice_spark.pipeline.scheduler import JobScheduler

    scheduler = JobScheduler()
    for cfg in configs.values():
        if not (cfg.enabled and cfg.cron_expression):
            continue

        def make_run(c):
            return lambda: run_dataset(
                spark, c, environment=args.environment, sql_dir=args.config_dir
            )

        scheduler.add(cfg.dataset_id, cfg.cron_expression, make_run(cfg))

    ticks = 0
    while args.iterations == 0 or ticks < args.iterations:
        fired = scheduler.run_pending(datetime.now())
        for dataset_id in fired:
            print(json.dumps({"fired": dataset_id, "at": datetime.now().isoformat()}))
        time.sleep(args.tick_seconds)
        ticks += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
