"""Evaluation reporting (reference surface: etude/evaluation/reporting.py):
per-metric describe tables and a combined mean table printed via the logger."""

from __future__ import annotations

from typing import Dict, Optional

import pandas as pd

from ..utils.logger import logger


class ReportGenerator:
    def __init__(self, version_labels: Optional[Dict[str, str]] = None):
        self.version_labels = version_labels or {}

    def print_summary(self, df: pd.DataFrame) -> Optional[pd.DataFrame]:
        if df.empty:
            logger.warn("no evaluation results to report")
            return None

        metric_cols = [c for c in ("wpd", "rgc", "ipe") if c in df.columns]
        for metric in metric_cols:
            logger.stage(f"{metric.upper()} summary")
            table = (
                df.groupby("version")[metric]
                .describe()[["count", "mean", "std", "min", "50%", "max"]]
                .rename(index=self.version_labels)
            )
            for line in table.round(4).to_string().splitlines():
                logger.info(line)

        logger.stage("Combined means")
        combined = (
            df.groupby("version")[metric_cols].mean()
            .rename(index=self.version_labels)
        )
        for line in combined.round(4).to_string().splitlines():
            logger.info(line)
        return combined
