"""Per-bar attribute-prompt prediction from the condition (source) bar.

The reference serves with USER attribute bins (polyphony / rhythm / sustain
∈ {0,1,2}, overlap default 2 — reference infer.py:271-299), and its
published covers (etude_d) were generated with per-song prompts that are
not recorded anywhere. Serving with constant default bins therefore loses
half the distillation fidelity (free-running onset match 0.439 constant
vs 0.857 with per-bar oracle bins — VERDICT r3 #3): the attribute channel
carries real information about what the target should look like given the
source bar.

This module learns that channel: a per-attribute softmax regression from
hand-crafted source-bar features to the target's attribute bin, trained on
the distillation corpus (scripts/train_attr_prior.py), with the SAME
dataset-global bin edges training used. At inference the predictor supplies
per-bar bins (argmax or temperature-sampled), replacing the constant
defaults — conditioning the decoder the way the training distribution
actually conditioned it.

Reference analog: attributes are per-bar inputs of the decoder
(etude/models/etude_decoder.py:209-343); the reference has no predictor —
this is a capability the TPU build adds to close its own default-mode gap.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

# Attribute order here matches dataset.MODEL_ATTRIBUTES naming.
ATTR_NAMES = (
    "relative_polyphony",
    "relative_rhythmic_intensity",
    "relative_note_sustain",
    "pitch_overlap_ratio",
)
NAME_TO_KEY = {
    "relative_polyphony": "polyphony_bin",
    "relative_rhythmic_intensity": "rhythm_intensity_bin",
    "relative_note_sustain": "sustain_bin",
    "pitch_overlap_ratio": "pitch_overlap_bin",
}
N_BINS = 3
N_FEATURES = 10


def bar_feature_vector(
    feats: Dict[str, Any], bar_idx: int, n_bars: int
) -> np.ndarray:
    """Source-bar features → [N_FEATURES] f32 (feats from
    data.dataset.extract_bar_features)."""
    notes = feats["note_count"]
    poss = feats["pos_event_count"]
    dur = feats["total_duration_in_16ths"]
    pitches = [p for ps in feats["notes_by_position"].values() for p in ps]
    pitch_arr = np.asarray(pitches, np.float32) if pitches else np.zeros(1)
    frac = bar_idx / max(n_bars - 1, 1)
    return np.asarray([
        1.0,
        np.log1p(notes),
        np.log1p(poss),
        notes / max(poss, 1),
        dur / max(notes, 1) / 8.0,
        (pitch_arr.max() - pitch_arr.min()) / 48.0 if pitches else 0.0,
        pitch_arr.mean() / 64.0 - 1.0 if pitches else 0.0,
        len({int(p) % 12 for p in pitches}) / 12.0,
        frac,
        np.sin(np.pi * frac),
    ], np.float32)


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


class AttrPrior:
    """Per-attribute softmax regression over standardized bar features."""

    def __init__(self, weights: Dict[str, np.ndarray],
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None):
        self.weights = weights  # name → [N_FEATURES, N_BINS]
        self.mean = mean if mean is not None else np.zeros(N_FEATURES, np.float32)
        self.std = std if std is not None else np.ones(N_FEATURES, np.float32)

    def _norm(self, X: np.ndarray) -> np.ndarray:
        return (X - self.mean) / self.std

    # ------------------------------------------------------------- train
    @classmethod
    def fit(
        cls,
        X: np.ndarray,                 # [N, N_FEATURES]
        y: Dict[str, np.ndarray],      # name → [N] int bins
        steps: int = 4000,
        lr: float = 1.0,
        l2: float = 1e-5,
        seed: int = 0,
    ) -> "AttrPrior":
        # Standardize (keeping the bias column constant): a fixed lr on the
        # raw feature scales oscillates and lands BELOW the majority-class
        # baseline.
        mean = X.mean(axis=0).astype(np.float32)
        std = np.maximum(X.std(axis=0), 1e-6).astype(np.float32)
        mean[0], std[0] = 0.0, 1.0  # bias feature stays 1
        Xn = (X - mean) / std

        rng = np.random.default_rng(seed)
        weights = {}
        for name in ATTR_NAMES:
            W = 0.01 * rng.standard_normal((X.shape[1], N_BINS)).astype(
                np.float64)
            t = y[name]
            onehot = np.eye(N_BINS)[t]
            for i in range(steps):
                p = _softmax(Xn @ W)
                grad = Xn.T @ (p - onehot) / len(Xn) + l2 * W
                W -= lr * (1.0 - i / steps) * grad  # linear decay
            weights[name] = W.astype(np.float32)
        return cls(weights, mean, std)

    # ----------------------------------------------------------- predict
    def probs(self, X: np.ndarray) -> Dict[str, np.ndarray]:
        Xn = self._norm(X)
        return {n: _softmax(Xn @ W) for n, W in self.weights.items()}

    def predict_bins(
        self,
        bars: Sequence[Sequence[int]],
        vocab,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> List[Dict[str, int]]:
        """Per-bar engine-attr dicts for a song's source bars; greedy at
        temperature 0, categorical-sampled otherwise."""
        from ..data.dataset import extract_bar_features

        rng = np.random.default_rng(seed)
        X = np.stack([
            bar_feature_vector(
                extract_bar_features(bar, vocab), i, len(bars)
            )
            for i, bar in enumerate(bars)
        ])
        all_probs = self.probs(X)
        out: List[Dict[str, int]] = []
        for i in range(len(bars)):
            attrs = {}
            for name in ATTR_NAMES:
                p = all_probs[name][i]
                if temperature > 0:
                    logp = np.log(np.maximum(p, 1e-9)) / temperature
                    p = _softmax(logp[None])[0]
                    b = int(rng.choice(N_BINS, p=p))
                else:
                    b = int(np.argmax(p))
                attrs[NAME_TO_KEY[name]] = b
            out.append(attrs)
        return out

    def accuracy(self, X: np.ndarray, y: Dict[str, np.ndarray]) -> Dict[str, float]:
        Xn = self._norm(X)
        return {
            n: float((np.argmax(Xn @ W, axis=1) == y[n]).mean())
            for n, W in self.weights.items()
        }

    # --------------------------------------------------------------- io
    def save(self, path: Union[str, Path], meta: Optional[Dict] = None) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez(path / "weights.npz", __mean__=self.mean, __std__=self.std,
                 **self.weights)
        if meta is not None:
            with open(path / "meta.json", "w", encoding="utf-8") as f:
                json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, path: Union[str, Path]) -> "AttrPrior":
        with np.load(Path(path) / "weights.npz") as z:
            weights = {k: z[k] for k in z.files
                       if not k.startswith("__")}
            mean = z["__mean__"] if "__mean__" in z.files else None
            std = z["__std__"] if "__std__" in z.files else None
            return cls(weights, mean, std)
