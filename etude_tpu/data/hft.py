"""HFT-preset transcription for dataset preparation (piano covers → notes).

Reference counterpart: etude/models/hft_transformer.py — the same AMT model
family run with the HFT hyperparameters (128-frame segments, min_value −80,
onset threshold 0.75) and an overlapping-stride inference mode that keeps
only the central n_stride frames of every segment (finer temporal context at
segment boundaries, reference _transcript_stride:282-441).

TPU-first: all overlapping segments are batched through one jit-compiled
model call instead of the reference's serial per-segment loop; the central-
window stitching is a reshape.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import HFTConfig
from ..models.amt import AMTConfig, init_params
from ..ops.mel import log_mel_spectrogram
from ..ops.peakpick import activations_to_notes
from ..utils.audio import decode_audio
from ..utils.logger import logger
from ..utils.midi import write_midi
from .extractor import _transcribe_batch, widen_maps


def hft_amt_config(config: HFTConfig) -> AMTConfig:
    return AMTConfig(
        n_margin=config.input.margin_b,
        n_frame=config.input.num_frame,
        n_bin=config.feature.n_bins,
        n_note=config.midi.num_note,
        n_velocity=config.midi.num_velocity,
    )


class HFT_Transformer:
    """Cover-audio → ground-truth note transcription with stride stitching."""

    def __init__(
        self,
        config: HFTConfig,
        model_path: Optional[Union[str, Path]] = None,
        params=None,
        segment_batch: int = 16,
    ):
        self.config = config
        self.amt_config = hft_amt_config(config)
        self.segment_batch = segment_batch
        if params is not None:
            self.params = params
        elif model_path is not None and Path(model_path).exists() and (
            Path(model_path).suffix in (".pth", ".pt", ".pkl")
        ):
            # Reference checkpoint (state dict or the pickled-whole-model
            # latest.pkl format, hft_transformer.py:26-33).
            from ..utils.torch_port import load_torch_amt_checkpoint

            self.params = load_torch_amt_checkpoint(model_path, self.amt_config)
            logger.info(f"reference torch checkpoint ported from {model_path}")
        elif model_path is not None and Path(model_path).exists():
            from ..utils.training import load_params_only

            abstract = init_params(self.amt_config, seed=0)
            self.params = load_params_only(model_path, abstract)
        else:
            if model_path is not None:
                logger.warn(
                    f"hft checkpoint {model_path} not found; using random "
                    "initialization"
                )
            self.params = init_params(self.amt_config, seed=0)

    def _wav2feature(self, audio_path: Union[str, Path]) -> np.ndarray:
        fc = self.config.feature
        wave, _ = decode_audio(audio_path, target_sr=fc.sr, mono=True)
        return np.asarray(log_mel_spectrogram(
            jnp.asarray(wave, jnp.float32),
            sr=fc.sr, n_fft=fc.fft_bins, hop=fc.hop_sample,
            win_length=fc.window_length, n_mels=fc.mel_bins,
            log_offset=fc.log_offset,
        ))

    def _transcript_stride(self, feature: np.ndarray) -> Dict[str, np.ndarray]:
        """Overlapping-stride transcription keeping each segment's center.

        Segment k's input window starts at k·stride in the (margin+offset)-
        padded feature; output frames [offset, offset+stride) of its
        num_frame predictions map exactly onto original frames
        [k·stride, (k+1)·stride).
        """
        ic = self.config.input
        stride = self.config.infer.n_stride
        num_frame = ic.num_frame
        offset = (num_frame - stride) // 2
        n_bin = self.amt_config.n_bin
        T = feature.shape[0]

        n_chunks = max(int(np.ceil(T / stride)), 1)
        front = ic.margin_b + offset
        back = (
            n_chunks * stride - T            # stride padding
            + (num_frame - offset - stride)  # rest of the final window
            + ic.margin_f
        )
        padded = np.full((front + T + back, n_bin), ic.min_value, np.float32)
        padded[front:front + T] = feature

        win = ic.margin_b + num_frame + ic.margin_f
        segs = np.stack([
            padded[k * stride: k * stride + win].T for k in range(n_chunks)
        ])

        B = self.segment_batch
        n_pad = (-n_chunks) % B
        if n_pad:
            segs = np.concatenate([
                segs,
                np.full((n_pad, *segs.shape[1:]), ic.min_value, np.float32),
            ])

        chunks = []
        for i in range(0, segs.shape[0], B):
            out = _transcribe_batch(
                self.params, self.amt_config, jnp.asarray(segs[i:i + B]),
                branches=("time",),
            )
            chunks.append(jax.tree.map(np.asarray, out))
        maps = widen_maps(chunks)

        # Keep the central [offset, offset+stride) of each segment.
        out = {}
        for key, v in maps.items():
            center = v[:, offset:offset + stride]          # [chunks(+pad), stride, ...]
            out[key] = center.reshape(-1, *v.shape[2:])[:T]
        return out

    def transcribe(
        self,
        input_wav_path: Union[str, Path],
        output_json_path: Union[str, Path],
        output_midi_path: Optional[Union[str, Path]] = None,
    ):
        feature = self._wav2feature(input_wav_path)
        maps = self._transcript_stride(feature)
        ic = self.config.infer
        hop_sec = self.config.feature.hop_sample / self.config.feature.sr
        notes = activations_to_notes(
            maps["onset_time"], maps["offset_time"], maps["mpe_time"],
            maps["velocity_time"],
            hop_sec=hop_sec,
            note_min=self.config.midi.note_min,
            thred_onset=ic.thred_onset,
            thred_offset=ic.thred_offset,
            thred_mpe=ic.thred_mpe,
        )
        output_json_path = Path(output_json_path)
        output_json_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_json_path, "w", encoding="utf-8") as f:
            json.dump(
                [{k: n[k] for k in ("onset", "offset", "pitch", "velocity")}
                 for n in notes],
                f, ensure_ascii=False, indent=2,
            )
        if output_midi_path:
            write_midi(notes, output_midi_path)
        logger.debug(f"transcribed {len(notes)} notes → {output_json_path}")
        return notes
