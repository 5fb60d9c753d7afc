"""Evaluation runner (reference surface: etude/evaluation/runner.py).

Iterates the evaluation corpus (metadata.json listing song directories) ×
configured versions, computing WPD (audio alignment, cache-first via
wp.json), RGC and IPE per rendered MIDI/JSON. Returns a pandas DataFrame of
rows {song, version, metric, score}.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import pandas as pd

from ..config.schema import EtudeConfig
from ..data.aligner import AudioAligner
from ..utils.logger import logger
from .metrics import IPECalculator, RGCCalculator, WPDCalculator


class EvaluationRunner:
    def __init__(self, config: EtudeConfig):
        self.config = config
        self.eval_dir = Path(config.eval.eval_dir)
        self.metadata_path = Path(config.eval.metadata_path)
        self.versions = dict(config.eval.versions)
        m = config.eval.metrics
        self.wpd = WPDCalculator(
            subsample_step=m.wpd_subsample_step, trim_seconds=m.wpd_trim_seconds
        )
        self.rgc = RGCCalculator(top_k=m.rgc_top_k)
        self.ipe = IPECalculator(n_gram=m.ipe_n_gram, n_clusters=m.ipe_n_clusters)
        self.aligner = AudioAligner()

    def _load_metadata(self) -> List[Dict]:
        if not self.metadata_path.exists():
            logger.error(f"metadata not found: {self.metadata_path}")
            return []
        with open(self.metadata_path, "r", encoding="utf-8") as f:
            return json.load(f)

    def run(
        self,
        versions: Optional[Sequence[str]] = None,
        metrics: Sequence[str] = ("wpd", "rgc", "ipe"),
    ) -> pd.DataFrame:
        songs = self._load_metadata()
        versions = list(versions) if versions else list(self.versions.keys())
        rows = []

        for meta in songs:
            # Reference metadata.json entries use "dir_name" (docs/songs).
            song_id = (meta.get("dir_name") or meta.get("id")
                       or meta.get("song_id") or meta.get("name"))
            song_dir = self.eval_dir / str(song_id)
            if not song_dir.exists():
                continue
            for version in versions:
                row = {"song": str(song_id), "version": version}
                if "wpd" in metrics:
                    row["wpd"] = self._compute_wpd(song_dir, version)
                for name, calc in (("rgc", self.rgc), ("ipe", self.ipe)):
                    if name not in metrics:
                        continue
                    row[name] = self._compute_notes_metric(song_dir, version, calc,
                                                           f"{name}_score")
                rows.append(row)

        return pd.DataFrame(rows)

    # ---- per-metric helpers -------------------------------------------
    def _compute_wpd(self, song_dir: Path, version: str) -> Optional[float]:
        origin = song_dir / "origin.wav"
        cover_audio = song_dir / f"{version}.wav"
        try:
            align = self.aligner.align(origin, cover_audio, song_dir)
            if align is None:
                # Cache-only fallback: the reference corpus ships wp.json.
                align = self.aligner._load_from_cache(song_dir, version)
            if align is None:
                return None
            result = self.wpd.calculate(align)
            return result.get("wpd_score")
        except Exception as exc:
            logger.debug(f"WPD failed for {song_dir.name}/{version}: {exc}")
            return None

    def _compute_notes_metric(self, song_dir: Path, version: str, calc,
                              key: str) -> Optional[float]:
        for suffix in (".mid", ".json"):
            path = song_dir / f"{version}{suffix}"
            if path.exists():
                result = calc.calculate(path)
                if key in result:
                    return result[key]
                logger.debug(
                    f"{key} failed for {song_dir.name}/{version}: "
                    f"{result.get('error')}"
                )
                return None
        return None
