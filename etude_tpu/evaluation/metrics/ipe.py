"""IOI Pattern Entropy (reference: etude/evaluation/metrics/ipe.py).

Clips IOIs to [min_ioi, max_ioi], K-Means-quantizes the log-IOIs into
symbols (fixed seed for determinism), and scores the Shannon entropy of the
n-gram distribution. Higher = less predictable rhythm.
"""

from __future__ import annotations

import warnings
from collections import Counter
from pathlib import Path

import numpy as np

from .base_metric import get_onsets_from_file


class IPECalculator:
    def __init__(
        self,
        n_gram: int = 8,
        n_clusters: int = 8,
        min_ioi: float = 0.0625,
        max_ioi: float = 4.0,
        **_,
    ):
        self.n_gram = n_gram
        self.n_clusters = n_clusters
        self.min_ioi = min_ioi
        self.max_ioi = max_ioi

    def _quantize(self, iois: np.ndarray) -> np.ndarray:
        from sklearn.cluster import KMeans
        from sklearn.exceptions import ConvergenceWarning

        log_ioi = np.log(iois).reshape(-1, 1)
        k = min(self.n_clusters, len(np.unique(log_ioi)))
        if k < 2:
            return np.array([])
        with warnings.catch_warnings():
            warnings.filterwarnings("ignore", category=ConvergenceWarning)
            km = KMeans(n_clusters=k, random_state=42, n_init="auto").fit(log_ioi)
        return km.labels_

    def calculate(self, file_path: Path) -> dict:
        onsets = get_onsets_from_file(file_path)
        if len(onsets) < 2:
            return {"error": "not enough onsets"}
        iois = np.clip(np.diff(onsets), self.min_ioi, self.max_ioi)
        symbols = self._quantize(iois)
        if symbols.size == 0:
            return {"error": "could not quantize IOIs"}
        if len(symbols) < self.n_gram:
            return {"ipe_score": 0.0}
        ngrams = [
            tuple(symbols[i:i + self.n_gram])
            for i in range(len(symbols) - self.n_gram + 1)
        ]
        counts = Counter(ngrams)
        total = len(ngrams)
        entropy = -sum(
            (c / total) * np.log2(c / total) for c in counts.values()
        )
        return {"ipe_score": float(entropy)}
