"""Stage-1 Extract: audio → note events via the hFT transcription model.

Pipeline parity with the reference extractor (etude/data/extractor.py):
log-mel frontend → margin-padded fixed-length segments → model heads →
peak-picked notes → JSON/MIDI, with the same thresholds and min-duration
filter (etude/config/schema.py ExtractorInferConfig).

TPU-first: the mel frontend is one on-device program (ops/mel.py); ALL
segments of a song run as batched forwards of a single jit-compiled model
call (the reference loops batch-1 segments serially, etude/data/extractor.py:227);
velocity argmax happens on device so only [T, 88] maps come back to host.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import ExtractorConfig
from ..models.amt import AMTConfig, forward, init_params
from ..ops.mel import log_mel_spectrogram
from ..ops.peakpick import activations_to_notes
from ..utils.audio import decode_audio
from ..utils.logger import logger
from ..utils.midi import write_midi


def amt_config_from(config: ExtractorConfig, n_frame: Optional[int] = None) -> AMTConfig:
    if config.input.margin_b != config.input.margin_f:
        # The segment windows are built as margin_b + frames + margin_b; an
        # asymmetric config would silently gather past the window end
        # (clamped indices duplicating the final row) instead of erroring.
        raise ValueError(
            f"asymmetric margins unsupported: margin_b={config.input.margin_b} "
            f"!= margin_f={config.input.margin_f}"
        )
    return AMTConfig(
        n_margin=config.input.margin_b,
        n_frame=n_frame or config.input.num_frame,
        n_bin=config.feature.n_bins,
        cnn_channel=config.model.cnn_channel,
        cnn_kernel=config.model.cnn_kernel,
        hid_dim=config.model.transformer_hid_dim,
        encoder_n_layer=config.model.encoder_n_layer,
        encoder_n_head=config.model.encoder_n_head,
        decoder_n_layer=config.model.decoder_n_layer,
        decoder_n_head=config.model.decoder_n_head,
        pf_dim=config.model.transformer_pf_dim,
        n_note=config.midi.num_note,
        n_velocity=config.midi.num_velocity,
    )


@functools.partial(jax.jit, static_argnames=("config", "branches", "batch"))
def _transcribe_group(
    params, config: AMTConfig, feat_window: jnp.ndarray,
    branches: tuple = ("time",), batch: int = 4,
):
    """Transcribe one group of `batch` consecutive segments from a FIXED-size
    device window [margin_b + batch*n_frame + margin_f, n_bin] — the input
    shape is independent of song length, so this compiles exactly once.
    """
    win = 2 * config.n_margin + config.n_frame
    starts = jnp.arange(batch, dtype=jnp.int32) * config.n_frame
    idx = starts[:, None] + jnp.arange(win)[None, :]
    spec = jnp.transpose(feat_window[idx], (0, 2, 1))  # [B, n_bin, win]
    return _transcribe_batch_impl(params, config, spec, branches)


def _transcribe_batch_impl(params, config, spec, branches):
    out = forward(params, config, spec)
    result = {}
    for branch in branches:
        for head in ("onset", "offset", "mpe"):
            # Ship LOGIT-space values in f16, not sigmoids: f16 sigmoids
            # saturate to exactly 1.0 from ~0.9995, and the peak picker's
            # plateau rule turns those exact ties into duplicate onsets.
            # Inverting the (f32) sigmoid on device keeps the wire at f16
            # while the host recovers f32-grade distinct values. The clip
            # bounds mirror f32 sigmoid saturation (|x| ≥ 18 → p rounds to
            # 0/1 in f32 anyway, exactly like the reference's f32 heads).
            p = out[f"{head}_{branch}"]
            lp = jnp.clip(jnp.log(p) - jnp.log1p(-p), -18.0, 18.0)
            result[f"{head}_{branch}"] = lp.astype(jnp.float16)
        result[f"velocity_{branch}"] = jnp.argmax(
            out[f"velocity_{branch}"], axis=-1
        ).astype(jnp.uint8)
    return result


@functools.partial(
    jax.jit, static_argnames=("config", "branches", "batch", "n_groups")
)
def _transcribe_groups(params, config: AMTConfig, feat_padded: jnp.ndarray,
                       branches: tuple, batch: int, n_groups: int):
    """ALL groups of a song in ONE program: `lax.map` over group windows of
    the margin-padded feature map. One dispatch + one stacked download per
    song instead of one per group — per-dispatch tunnel latency is the
    dominant extract cost under service load, not device FLOPs. Compiled per
    (batch, n_groups) where n_groups is bucketed by the caller."""
    win_total = 2 * config.n_margin + batch * config.n_frame
    win = 2 * config.n_margin + config.n_frame
    starts = jnp.arange(batch, dtype=jnp.int32) * config.n_frame
    idx = starts[:, None] + jnp.arange(win)[None, :]

    def body(g):
        feat_window = jax.lax.dynamic_slice(
            feat_padded, (g * batch * config.n_frame, 0),
            (win_total, feat_padded.shape[1]),
        )
        spec = jnp.transpose(feat_window[idx], (0, 2, 1))  # [B, n_bin, win]
        return _transcribe_batch_impl(params, config, spec, branches)

    return jax.lax.map(body, jnp.arange(n_groups, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("config", "branches"))
def _transcribe_batch(params, config: AMTConfig, spec: jnp.ndarray,
                      branches: tuple = ("freq", "time")):
    """[B, n_bin, margin+T+margin] → activation maps + on-device velocity
    argmax. Head activations travel as f16 LOGITS and velocities as uint8
    (host transfer is a bottleneck on tunneled chips); widen with
    `widen_maps`. `branches` limits output to the head set the caller
    actually uses."""
    return _transcribe_batch_impl(params, config, spec, branches)


def widen_maps(chunks) -> Dict[str, np.ndarray]:
    """Concatenate per-group device outputs and widen the wire format:
    f16 logits → f32 sigmoid activations, uint8 velocities → int32."""
    maps = {}
    for k in chunks[0]:
        v = np.concatenate([c[k] for c in chunks], axis=0)
        if k.startswith("velocity"):
            maps[k] = v.astype(np.int32)
        else:
            x = v.astype(np.float32)
            maps[k] = 1.0 / (1.0 + np.exp(-x))
    return maps


class AMTAPC_Extractor:
    """Audio → notes transcription pipeline."""

    def __init__(
        self,
        config: ExtractorConfig,
        model_path: Optional[Union[str, Path]] = None,
        params=None,
        segment_batch: Optional[int] = None,
    ):
        self.config = config
        self.amt_config = amt_config_from(config)
        self.segment_batch = segment_batch or config.infer.segment_batch

        if params is not None:
            self.params = params
        elif model_path is not None and Path(model_path).exists() and (
            Path(model_path).suffix in (".pth", ".pt", ".pkl")
        ):
            # Reference torch checkpoint (state dict or pickled whole model).
            from ..utils.torch_port import load_torch_amt_checkpoint

            self.params = load_torch_amt_checkpoint(model_path, self.amt_config)
            logger.info(f"reference torch checkpoint ported from {model_path}")
        elif model_path is not None and Path(model_path).exists():
            from ..utils.training import load_params_only

            # eval_shape: template only — skip the random-init device upload.
            abstract = jax.eval_shape(lambda: init_params(self.amt_config, seed=0))
            self.params = load_params_only(model_path, abstract)
            logger.debug(f"extractor weights loaded from {model_path}")
        else:
            if model_path is not None:
                logger.warn(
                    f"extractor checkpoint {model_path} not found; "
                    "using random initialization"
                )
            self.params = init_params(self.amt_config, seed=0)

    # ---- steps ---------------------------------------------------------
    def _wav2feature(self, audio_path: Union[str, Path],
                     return_device: bool = False, wave_sr=None):
        fc = self.config.feature
        if wave_sr is not None:
            from ..utils.audio import resample_audio

            wave, native_sr = wave_sr
            if native_sr != fc.sr:
                wave = resample_audio(wave, native_sr, fc.sr)
        else:
            wave, _ = decode_audio(audio_path, target_sr=fc.sr, mono=True)
        logmel = log_mel_spectrogram(
            jnp.asarray(wave, jnp.float32),
            sr=fc.sr, n_fft=fc.fft_bins, hop=fc.hop_sample,
            win_length=fc.window_length, n_mels=fc.mel_bins,
            log_offset=fc.log_offset,
        )
        if return_device:
            return logmel
        return np.asarray(logmel)  # [n_frames, n_mels]

    def _segment(self, feature: np.ndarray) -> Tuple[np.ndarray, int]:
        """[T, n_bin] → ([n_segments, n_bin, margin+num_frame+margin], T)."""
        ic = self.config.input
        n_frame, n_bin = self.amt_config.n_frame, self.amt_config.n_bin
        T = feature.shape[0]
        n_seg = max(int(np.ceil(T / n_frame)), 1)
        padded_T = n_seg * n_frame
        full = np.full(
            (ic.margin_b + padded_T + ic.margin_f, n_bin),
            ic.min_value, dtype=np.float32,
        )
        full[ic.margin_b:ic.margin_b + T] = feature
        segs = np.stack([
            full[i * n_frame: i * n_frame + ic.margin_b + n_frame + ic.margin_f].T
            for i in range(n_seg)
        ])
        return segs, T

    def _transcript(self, feature,
                    branches: tuple = ("time",)) -> Dict[str, np.ndarray]:
        """Run every segment through the model (batched) and stitch maps.

        Accepts a host array or a device-resident feature map; segments are
        gathered ON DEVICE from a margin-padded copy, so the mel output never
        round-trips through the host. Each group is dynamic-sliced to a
        FIXED-size window before the jitted model call, so one program serves
        every song length."""
        ic = self.config.input
        n_frame = self.amt_config.n_frame
        T = int(feature.shape[0])
        n_seg = max(-(-T // n_frame), 1)
        B = self.segment_batch
        n_groups = -(-n_seg // B)
        # Bucket the group count so song lengths share compiled programs
        # (padding groups are min_value fill; their outputs are trimmed).
        n_groups_bucket = next(
            (b for b in (1, 2, 4, 8, 16, 32) if n_groups <= b),
            -(-n_groups // 32) * 32,
        )

        # Margin-padded device copy covering all (batch-padded) segments.
        total = ic.margin_b + n_groups_bucket * B * n_frame + ic.margin_f
        feat_dev = jnp.asarray(feature, jnp.float32)
        pad_back = total - ic.margin_b - T
        feat_padded = jnp.pad(
            feat_dev, ((ic.margin_b, pad_back), (0, 0)),
            constant_values=ic.min_value,
        )

        # ONE device program for all groups; stacked tree comes back in a
        # single transfer (f16 logits / uint8 velocities on the wire).
        stacked = jax.tree.map(
            np.asarray,
            _transcribe_groups(
                self.params, self.amt_config, feat_padded,
                branches=branches, batch=B, n_groups=n_groups_bucket,
            ),
        )
        chunks = [
            jax.tree.map(lambda v: v.reshape(-1, *v.shape[2:]), stacked)
        ]

        # f16-logit/uint8 on the wire; widen on host.
        maps = widen_maps(chunks)
        # [n_seg(+group-pad), n_frame, 88] → [n_seg * n_frame, 88]. The
        # reference peak-picks the activations PADDED to the segment
        # boundary, not trimmed to T (etude/data/extractor.py:210-248):
        # the last note's fallback offset and tail-boundary peak decisions
        # depend on it, so only the group-batch padding is trimmed here.
        n_frame = self.amt_config.n_frame
        t_pad = n_seg * n_frame
        return {
            k: v.reshape(-1, *v.shape[2:])[:t_pad] for k, v in maps.items()
        }

    def _mpe2note(self, maps: Dict[str, np.ndarray], branch: str = "time"):
        ic = self.config.infer
        hop_sec = self.config.feature.hop_sample / self.config.feature.sr
        return activations_to_notes(
            maps[f"onset_{branch}"], maps[f"offset_{branch}"],
            maps[f"mpe_{branch}"], maps[f"velocity_{branch}"],
            hop_sec=hop_sec,
            note_min=self.config.midi.note_min,
            thred_onset=ic.onset_threshold,
            thred_offset=ic.offset_threshold,
            thred_mpe=ic.frame_threshold,
        )

    # ---- public API ----------------------------------------------------
    def extract(
        self,
        audio_path: Union[str, Path],
        output_json_path: Union[str, Path],
        output_midi_path: Optional[Union[str, Path]] = None,
        timer=None,
        wave_sr=None,
    ):
        """Transcribe audio; write note JSON (and optional MIDI)."""
        from ..utils.profiling import maybe_span

        with maybe_span(timer, "extract: wav→mel"):
            feature = self._wav2feature(
                audio_path, return_device=True, wave_sr=wave_sr
            )
        with maybe_span(timer, "extract: hFT forward"):
            maps = self._transcript(feature)
        # Inference uses the refined time-branch (B) heads, like the
        # reference (etude/data/extractor.py:161).
        with maybe_span(timer, "extract: peak picking"):
            notes = self._mpe2note(maps, branch="time")

        min_dur = self.config.infer.min_duration
        filtered = [
            {k: n[k] for k in ("onset", "offset", "pitch", "velocity")}
            for n in notes if n["offset"] - n["onset"] >= min_dur
        ]
        output_json_path = Path(output_json_path)
        output_json_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_json_path, "w", encoding="utf-8") as f:
            json.dump(filtered, f, ensure_ascii=False, indent=2)
        logger.debug(f"extracted {len(filtered)} notes → {output_json_path}")

        if output_midi_path:
            write_midi(
                [n for n in notes if n["offset"] - n["onset"] >= min_dur],
                output_midi_path,
            )
        return filtered
