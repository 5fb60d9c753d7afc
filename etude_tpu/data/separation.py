"""Stage-2 part 1: in-process source separation → beat-tracking features.

Replaces the reference's subprocess contract (infer.py:113-141 launching
scripts/run_separation.py in a separate env, handing back sep.npy) with one
on-device XLA program: STFT (n_fft 4096, hop 1024 @ 44.1 kHz) → U-Net ratio
masks → per-stem masked power → 128-bin slaney-mel (30–11000 Hz), then a
host-side power→dB conversion (ref = per-stem max, top_db 80). Output
features keep the reference's (5, time, 128) .npy contract so downstream
beat detection is unchanged.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.separator import SeparatorConfig, forward, init_params
from ..ops.mel import mel_filterbank
from ..utils.audio import decode_audio
from ..utils.logger import logger

SEP_SR = 44100
SEP_N_FFT = 4096
SEP_HOP = 1024
SEP_MELS = 128
SEP_FMIN = 30.0
SEP_FMAX = 11000.0
FRAME_BUCKET = 2048


@jax.jit
def _power_to_db_jit(mel_power, true_frames_mask):
    """librosa power_to_db(ref=per-stem max, top_db 80) on device.

    true_frames_mask [T] excludes padded frames from the per-stem max."""
    amin = 1e-10
    S = jnp.maximum(mel_power, 0.0)
    masked = jnp.where(true_frames_mask[None, :, None], S, 0.0)
    ref = jnp.maximum(masked.max(axis=(1, 2), keepdims=True), amin)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(ref)
    peak = jnp.where(true_frames_mask[None, :, None], log_spec, -jnp.inf).max(
        axis=(1, 2), keepdims=True
    )
    return jnp.maximum(log_spec, peak - 80.0)


@functools.partial(jax.jit, static_argnames=("config",))
def _separate_mel_jit(params, config: SeparatorConfig, wave, true_frames,
                      cos_m, sin_m, fb):
    """wave [N] (host reflect-padded) → per-stem mel power [stems, T, 128].

    int16 waves are accepted and scaled on device (exactly the host's
    PCM/32768 conversion) — halves the host→HBM transfer, the dominant
    structuralize cost on a tunneled chip."""
    if wave.dtype == jnp.int16:
        wave = wave.astype(jnp.float32) / 32768.0
    n_frames = 1 + (wave.shape[0] - SEP_N_FFT) // SEP_HOP
    idx = jnp.arange(SEP_N_FFT)[None, :] + SEP_HOP * jnp.arange(n_frames)[:, None]
    frames = wave[idx]
    n = np.arange(SEP_N_FFT)
    window = jnp.asarray(
        (0.5 * (1.0 - np.cos(2 * np.pi * n / SEP_N_FFT))).astype(np.float32)
    )
    from ..ops.mel import frame_power_spectrum

    power_spec = frame_power_spectrum(frames * window[None, :], cos_m, sin_m)
    mag = jnp.sqrt(jnp.maximum(power_spec, 0.0))  # [T, F]

    # The mask net is trained on RMS-normalized log1p magnitudes
    # (scripts/train_aux_synthetic.py); serving must match. RMS is taken
    # over the true (un-padded) frames only; the masks then apply to the
    # UN-normalized magnitudes (ratio masks are scale-free).
    frame_ok = (jnp.arange(n_frames) < true_frames)[:, None]
    rms = jnp.sqrt(
        jnp.sum(jnp.where(frame_ok, mag, 0.0) ** 2)
        / jnp.maximum(jnp.sum(frame_ok) * mag.shape[1], 1)
    )
    mag_in = mag / jnp.maximum(rms, 1e-6)

    masks = forward(params, config, jnp.log1p(mag_in)[None])[0]  # [S, T, F]
    stem_power = (masks * mag[None]) ** 2
    return jnp.einsum("stf,fm->stm", stem_power, fb)


@functools.partial(jax.jit, static_argnames=("n_stems",))
def _mix_mel_jit(wave, cos_m, sin_m, fb, n_stems: int):
    """Separator BYPASS: the raw mix's mel power tiled into every stem slot.

    Ablation probe for how much source separation buys the beat tracker on
    a given corpus (reference analog: its README warns beat quality is
    separation-sensitive, README.md:83-84)."""
    n_frames = 1 + (wave.shape[0] - SEP_N_FFT) // SEP_HOP
    idx = jnp.arange(SEP_N_FFT)[None, :] + SEP_HOP * jnp.arange(n_frames)[:, None]
    frames = wave[idx]
    n = np.arange(SEP_N_FFT)
    window = jnp.asarray(
        (0.5 * (1.0 - np.cos(2 * np.pi * n / SEP_N_FFT))).astype(np.float32)
    )
    from ..ops.mel import frame_power_spectrum

    power_spec = frame_power_spectrum(frames * window[None, :], cos_m, sin_m)
    mel = jnp.einsum("tf,fm->tm", power_spec, fb)
    return jnp.broadcast_to(mel[None], (n_stems, *mel.shape))


@functools.lru_cache(maxsize=1)
def _sep_fb_device():
    return jax.device_put(mel_filterbank(
        SEP_SR, SEP_N_FFT, SEP_MELS, fmin=SEP_FMIN, fmax=SEP_FMAX,
        norm="slaney", mel_scale="slaney",
    ))


def pad_bucket_wave(wave: np.ndarray):
    """Host reflect-pad + frame-count bucketing for the separation STFT.

    Returns (padded [N] f32, true_frames). The reflect pad reproduces
    torch/librosa center semantics for the true frames; zero-padding to a
    FRAME_BUCKET multiple bounds recompiles."""
    true_frames = 1 + len(wave) // SEP_HOP
    from ..ops.mel import reflect_pad_host

    padded = reflect_pad_host(wave, SEP_N_FFT // 2)
    bucket_frames = int(np.ceil(true_frames / FRAME_BUCKET) * FRAME_BUCKET)
    target_len = (bucket_frames - 1) * SEP_HOP + SEP_N_FFT
    padded = np.pad(padded, (0, max(0, target_len - len(padded))))[:target_len]
    return padded, true_frames


def _separate_mel(params, config: SeparatorConfig, wave: jnp.ndarray,
                  true_frames: int):
    from ..ops.mel import dft_matrices

    cos_m, sin_m = dft_matrices(SEP_N_FFT)
    return _separate_mel_jit(
        params, config, wave, jnp.int32(true_frames), cos_m, sin_m,
        _sep_fb_device(),
    )


def power_to_db(S: np.ndarray, top_db: float = 80.0, amin: float = 1e-10) -> np.ndarray:
    """librosa.power_to_db(ref=np.max) semantics per input array."""
    ref = max(float(S.max()), amin)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(ref)
    return np.maximum(log_spec, log_spec.max() - top_db)


class SourceSeparator:
    """Audio → (num_stems, time, 128) dB-mel features for beat tracking."""

    def __init__(
        self,
        model_path: Optional[Union[str, Path]] = None,
        params=None,
        config: Optional[SeparatorConfig] = None,
        bypass: bool = False,
    ):
        """bypass=True skips the mask net and tiles the mix's mel into every
        stem slot (separation ablation; no weights are loaded)."""
        self.config = config or SeparatorConfig()
        self.bypass = bypass
        if bypass:
            self.params = None
            return
        if params is not None:
            self.params = params
        elif model_path is not None and Path(model_path).exists():
            from ..utils.training import load_params_only

            # eval_shape: template only — skip the random-init device upload.
            abstract = jax.eval_shape(lambda: init_params(self.config, seed=0))
            self.params = load_params_only(model_path, abstract)
            logger.debug(f"separator weights loaded from {model_path}")
        else:
            if model_path is not None:
                logger.warn(
                    f"separator checkpoint {model_path} not found; "
                    "using random initialization"
                )
            self.params = init_params(self.config, seed=0)

    def separate_features(
        self,
        audio_path: Union[str, Path],
        output_npy_path: Optional[Union[str, Path]] = None,
        return_device: bool = False,
        timer=None,
        wave_sr=None,
    ):
        """Audio → dB-mel features (5, time, 128).

        return_device=True hands back the device-resident array (the beat
        detector consumes it directly — no host round trip of ~50 MB).
        """
        from ..utils.profiling import maybe_span

        with maybe_span(timer, "sep: wav decode"):
            if wave_sr is not None:
                from ..utils.audio import resample_audio

                wave, native_sr = wave_sr
                if native_sr != SEP_SR:
                    wave = resample_audio(wave, native_sr, SEP_SR)
            else:
                wave, _ = decode_audio(audio_path, target_sr=SEP_SR, mono=True)
        padded, true_frames = pad_bucket_wave(wave)

        # Ship int16 when the padded wave is exactly int16 PCM / 32768 (true
        # for WAV input that was not resampled): the device rescale
        # reproduces the host conversion bit-exactly at half the bytes.
        scaled = padded * 32768.0
        as_i16 = scaled.astype(np.int16)
        if np.array_equal(as_i16.astype(np.float32), scaled):
            padded = as_i16

        with maybe_span(timer, "sep: forward"):
            if self.bypass:
                from ..ops.mel import dft_matrices

                cos_m, sin_m = dft_matrices(SEP_N_FFT)
                mel_power = _mix_mel_jit(
                    jnp.asarray(padded, jnp.float32), cos_m, sin_m,
                    _sep_fb_device(), self.config.num_stems,
                )
            else:
                mel_power = _separate_mel(
                    self.params, self.config, jnp.asarray(padded),
                    true_frames,
                )
            mask = (jnp.arange(mel_power.shape[1]) < true_frames)
            features_dev = _power_to_db_jit(mel_power, mask)[:, :true_frames]
            if timer is not None:  # attribute device time to this span
                features_dev.block_until_ready()

        if output_npy_path is not None:
            output_npy_path = Path(output_npy_path)
            output_npy_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(output_npy_path, np.asarray(features_dev, np.float32))
            logger.debug(f"separation features saved → {output_npy_path}")
        if return_device:
            return features_dev
        return np.asarray(features_dev, np.float32)
