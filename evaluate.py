#!/usr/bin/env python
"""Evaluate rendered covers with WPD / RGC / IPE (CLI surface mirrors the
reference evaluate.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from etude_tpu.config import load_config
from etude_tpu.evaluation.reporting import ReportGenerator
from etude_tpu.evaluation.runner import EvaluationRunner
from etude_tpu.utils.logger import logger


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Evaluate generated covers")
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--metrics", nargs="+", default=["wpd", "rgc", "ipe"],
                        choices=["wpd", "rgc", "ipe"])
    parser.add_argument("--versions", nargs="+", default=None)
    parser.add_argument("--output-csv", type=str, default=None)
    parser.add_argument("--no-report", action="store_true")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    runner = EvaluationRunner(config)
    df = runner.run(versions=args.versions, metrics=args.metrics)
    if df.empty:
        logger.warn("evaluation produced no results")
        return 1

    csv_path = args.output_csv or (
        Path(config.paths.eval_output_dir) / config.eval.report_csv_filename
    )
    Path(csv_path).parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(csv_path, index=False)
    logger.success(f"results written to {csv_path}")

    if not args.no_report:
        ReportGenerator(dict(config.eval.versions)).print_summary(df)
    return 0


if __name__ == "__main__":
    sys.exit(main())
