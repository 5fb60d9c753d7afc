"""Stage-2 part 2: beat/downbeat detection.

Orchestration parity with the reference BeatDetector
(etude/data/beat_detector.py): one Beat-Transformer forward over the
separated-stem features, sigmoid beat/downbeat activations, then DBN
decoding (beat tracker on the beat activation; downbeat tracker on
[max(beat − downbeat, 0), downbeat]) and JSON output {beat_pred,
downbeat_pred}. The DBN is the framework's own implementation (ops/dbn.py) —
no native madmom dependency.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import BeatDetectorConfig
from ..models.beat_transformer import (
    BeatTransformerConfig,
    forward,
    init_params,
)
from ..ops.dbn import DBNBeatTracker, DBNDownBeatTracker
from ..utils.logger import logger


@functools.partial(jax.jit, static_argnames=("config",))
def _beat_activations_jit(params, config: BeatTransformerConfig, features):
    """One program for the whole activation pass; f16 on the wire."""
    logits, _ = forward(params, config, features[None])
    return jax.nn.sigmoid(logits[0]).astype(jnp.float16)


def beat_model_config_from(config: BeatDetectorConfig) -> BeatTransformerConfig:
    m = config.model
    return BeatTransformerConfig(
        attn_len=m.attn_len, instr=m.instr, ntoken=m.ntoken, dmodel=m.dmodel,
        nhead=m.nhead, d_hid=m.d_hid, nlayers=m.nlayers,
    )


class BeatDetector:
    """Separated-stem features → beat/downbeat timestamps."""

    def __init__(
        self,
        config: BeatDetectorConfig,
        model_path: Optional[Union[str, Path]] = None,
        params=None,
    ):
        self.config = config
        self.model_config = beat_model_config_from(config)

        if params is not None:
            self.params = params
        elif model_path is not None and Path(model_path).exists() and (
            Path(model_path).suffix in (".pth", ".pt")
        ):
            # Reference torch checkpoint: trained WITH the head-7 key-slice
            # bug, so flip the compat flag for exact behavioral parity.
            from ..utils.torch_port import load_torch_beat_checkpoint

            import dataclasses as _dc

            self.model_config = _dc.replace(
                self.model_config, compat_head7_bug=True
            )
            self.params = load_torch_beat_checkpoint(
                model_path, self.model_config
            )
            logger.info(f"reference torch checkpoint ported from {model_path}")
        elif model_path is not None and Path(model_path).exists():
            from ..utils.training import load_params_only

            # eval_shape: template only — skip the random-init device upload.
            abstract = jax.eval_shape(lambda: init_params(self.model_config, seed=0))
            self.params = load_params_only(model_path, abstract)
            logger.debug(f"beat model weights loaded from {model_path}")
        else:
            if model_path is not None:
                logger.warn(
                    f"beat model checkpoint {model_path} not found; "
                    "using random initialization"
                )
            self.params = init_params(self.model_config, seed=0)

        fps = 44100 / config.fps_divisor
        self.beat_tracker = DBNBeatTracker(
            min_bpm=config.min_bpm, max_bpm=config.max_bpm, fps=fps,
            threshold=config.threshold,
        )
        self.downbeat_tracker = DBNDownBeatTracker(
            beats_per_bar=tuple(config.beats_per_bar),
            min_bpm=config.min_bpm, max_bpm=config.max_bpm, fps=fps,
            threshold=config.threshold,
        )

    def activations(self, features: np.ndarray) -> np.ndarray:
        """[instr, T, mel] features → sigmoid activations [T, 2].

        T is padded to a bucket (silence = −80 dB) so song lengths share one
        compiled program; activations are trimmed back to the true length.
        """
        bucket = 2048
        T = features.shape[1]
        target = max(-(-T // bucket) * bucket, bucket)
        feats = jnp.asarray(features)
        if target > T:
            feats = jnp.pad(
                feats, ((0, 0), (0, target - T), (0, 0)),
                constant_values=-80.0,
            )
        act = _beat_activations_jit(self.params, self.model_config, feats)
        return np.asarray(act, np.float32)[:T]

    def detect(
        self,
        features_or_path: Union[np.ndarray, str, Path],
        output_json_path: Optional[Union[str, Path]] = None,
        cleanup_input: bool = True,
        timer=None,
    ) -> Dict:
        """Features (array or .npy path) → {beat_pred, downbeat_pred}."""
        from ..utils.profiling import maybe_span

        input_file = None
        if isinstance(features_or_path, (str, Path)):
            input_file = Path(features_or_path)
            features = np.load(input_file).astype(np.float32)
        elif isinstance(features_or_path, np.ndarray):
            features = features_or_path.astype(np.float32)
        else:
            # Device-resident features (in-process stage handoff).
            features = features_or_path

        with maybe_span(timer, "beat: forward"):
            act = self.activations(features)
        beat_act, down_act = act[:, 0], act[:, 1]

        with maybe_span(timer, "beat: DBN decode"):
            applied = None
            beats = self.beat_tracker(beat_act)
            if self.config.octave_disambiguation:
                from ..ops.beat_octave import disambiguate_octave

                beats, applied = disambiguate_octave(
                    np.asarray(beats, float), beat_act,
                    fps=44100 / self.config.fps_divisor,
                    min_bpm=self.config.min_bpm,
                    max_bpm=self.config.max_bpm,
                )
                if applied:
                    logger.debug(f"beat octave corrected: {applied}")
            combined = np.stack(
                [np.maximum(beat_act - down_act, 0.0), down_act], axis=-1
            )
            downbeat_events = self.downbeat_tracker(combined)
        downbeats = (
            downbeat_events[downbeat_events[:, 1] == 1][:, 0]
            if downbeat_events.size else np.empty(0)
        )
        if applied and len(downbeats) and len(beats):
            # The downbeat tracker decoded the ORIGINAL activations; after
            # an octave correction its grid can disagree with the corrected
            # beats by a tempo octave. Snap each downbeat to the nearest
            # corrected beat so downbeats stay a subset of the beat grid.
            beats_arr = np.asarray(beats, float)
            idx = np.abs(
                beats_arr[None, :] - np.asarray(downbeats, float)[:, None]
            ).argmin(axis=1)
            downbeats = np.unique(beats_arr[idx])

        results = {
            "beat_pred": np.asarray(beats, float).tolist(),
            "downbeat_pred": np.asarray(downbeats, float).tolist(),
        }
        if output_json_path is not None:
            output_json_path = Path(output_json_path)
            output_json_path.parent.mkdir(parents=True, exist_ok=True)
            with open(output_json_path, "w", encoding="utf-8") as f:
                json.dump(results, f, indent=4)
        if cleanup_input and input_file is not None and input_file.exists():
            input_file.unlink()
        return results
