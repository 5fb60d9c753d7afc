"""Log-mel spectrogram frontend as a jit-compiled XLA graph.

Replaces the reference's torchaudio MelSpectrogram call (reference:
etude/data/extractor.py:186-197 — n_fft 2048, hop 256, 256 mels, HTK mel
scale with slaney filter normalization, centered reflect padding, power
spectrum, log(x + 1e-8)). The whole frontend — framing, windowed rFFT, mel
projection (one MXU matmul), log — runs on device in a single program; the
waveform is the only host→HBM transfer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def hz_to_mel_slaney(f):
    """Slaney mel scale (librosa default): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    logstep = np.log(6.4) / 27.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mel)
    return mel


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    norm: str = "slaney",
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank [n_fft//2 + 1, n_mels].

    mel_scale="htk" + norm="slaney" matches torchaudio's MelSpectrogram
    (extractor frontend); mel_scale="slaney" matches librosa.filters.mel
    defaults (separation features, reference scripts/run_separation.py:166).
    """
    fmax = fmax if fmax is not None else sr / 2.0
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    if mel_scale == "htk":
        mel_pts = np.linspace(hz_to_mel_htk(fmin), hz_to_mel_htk(fmax), n_mels + 2)
        f_pts = mel_to_hz_htk(mel_pts)
    else:
        mel_pts = np.linspace(
            hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2
        )
        f_pts = mel_to_hz_slaney(mel_pts)

    slopes = f_pts[None, :] - freqs[:, None]  # [n_freqs, n_mels + 2]
    denom_down = f_pts[1:-1] - f_pts[:-2]
    denom_up = f_pts[2:] - f_pts[1:-1]
    down = -slopes[:, :-2] / np.maximum(denom_down, 1e-10)
    up = slopes[:, 2:] / np.maximum(denom_up, 1e-10)
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def _hann_window(win_length: int) -> np.ndarray:
    # Periodic Hann (torch.hann_window default).
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


@functools.lru_cache(maxsize=4)
def dft_matrices(n_fft: int):
    """Real-DFT basis [n_fft, n_fft//2+1] (cos, sin) as DEVICE arrays.

    XLA's TPU FFT lowers catastrophically on this stack (minutes-long
    compiles); an explicit DFT as two MXU matmuls is fast and exact for the
    frame sizes used here (2048/4096). The matrices are placed on device once
    and threaded into jitted programs as arguments — embedding them as HLO
    constants bloats compiles.
    """
    k = np.arange(n_fft)
    freqs = np.arange(n_fft // 2 + 1)
    angle = -2.0 * np.pi * np.outer(k, freqs) / n_fft
    return (
        jax.device_put(np.cos(angle).astype(np.float32)),
        jax.device_put(np.sin(angle).astype(np.float32)),
    )


def reflect_pad_host(wave: np.ndarray, pad: int) -> np.ndarray:
    """np.pad(mode='reflect') with a zero-pad fallback for signals shorter
    than the pad width (reflect requires pad <= len - 1)."""
    if len(wave) > pad:
        return np.pad(wave, pad, mode="reflect")
    return np.pad(wave, pad, mode="constant")


def frame_power_spectrum(
    frames: jnp.ndarray, cos_m: jnp.ndarray, sin_m: jnp.ndarray
) -> jnp.ndarray:
    """|rDFT(frames)|² via matmul DFT: [T, n_fft] → [T, n_fft//2+1]."""
    re = frames @ cos_m
    im = frames @ sin_m
    return re * re + im * im


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "win_length", "log_offset", "center"),
)
def _log_mel_jit(
    wave, cos_m, sin_m, fb, *, n_fft, hop, win_length, log_offset, center
):
    if center:
        pad = n_fft // 2
        wave = jnp.pad(wave, pad, mode="reflect")

    n_frames = 1 + (wave.shape[0] - n_fft) // hop
    # Frame via gather: [n_frames, n_fft].
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = wave[idx]

    window = jnp.asarray(_hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, :]

    power = frame_power_spectrum(frames, cos_m, sin_m)
    mel = power @ fb  # MXU matmul
    return jnp.log(mel + log_offset)


@functools.lru_cache(maxsize=8)
def _mel_fb_device(sr, n_fft, n_mels, fmin, fmax):
    return jax.device_put(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))


# Waveform lengths are bucketed to this many frames so different song
# lengths share compiled programs (remote compiles are expensive).
FRAME_BUCKET = 2048


def log_mel_spectrogram(
    wave,
    *,
    sr: int = 16000,
    n_fft: int = 2048,
    hop: int = 256,
    win_length: int = 2048,
    n_mels: int = 256,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    log_offset: float = 1e-8,
    center: bool = True,
    bucket_frames: int = FRAME_BUCKET,
) -> jnp.ndarray:
    """waveform [T] → log-mel [n_frames, n_mels] on device.

    Centered reflect padding is applied on host BEFORE the frame-count
    bucketing zero-pad, so every true frame (including the song tail) sees
    the reflected signal; the bucket zeros lie entirely beyond the trimmed
    output. One compiled program per frame bucket.
    """
    cos_m, sin_m = dft_matrices(n_fft)
    fb = _mel_fb_device(sr, n_fft, n_mels, fmin, fmax)

    wave_np = np.asarray(wave, np.float32)
    n = len(wave_np)
    if center:
        wave_np = reflect_pad_host(wave_np, n_fft // 2)
        true_frames = n // hop + 1
    else:
        true_frames = 1 + max(n - n_fft, 0) // hop
    if bucket_frames:
        target_frames = -(-true_frames // bucket_frames) * bucket_frames
    else:
        target_frames = true_frames
    target_len = (target_frames - 1) * hop + n_fft
    wave_np = np.pad(wave_np, (0, max(0, target_len - len(wave_np))))[:target_len]

    out = _log_mel_jit(
        jnp.asarray(wave_np), cos_m, sin_m, fb,
        n_fft=n_fft, hop=hop, win_length=win_length,
        log_offset=log_offset, center=False,
    )
    return out[:true_frames]


def log_mel_spectrogram_host(
    wave: np.ndarray,
    *,
    sr: int = 16000,
    n_fft: int = 2048,
    hop: int = 256,
    win_length: int = 2048,
    n_mels: int = 256,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    log_offset: float = 1e-8,
    center: bool = True,
) -> np.ndarray:
    """Pure-numpy log-mel with identical semantics to log_mel_spectrogram.

    For host-side data generation (training batch pipelines): computing the
    mel of every synthetic example on the accelerator would serialize the
    prefetch thread on device round trips — on a remote-tunneled chip each
    one costs ~100 ms, dominating the train step itself.
    """
    wave_np = np.asarray(wave, np.float32)
    if center:
        wave_np = reflect_pad_host(wave_np, n_fft // 2)
    n_frames = 1 + max(len(wave_np) - n_fft, 0) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = wave_np[idx]

    window = _hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    spec = np.fft.rfft(frames * window[None, :], axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    return np.log(power @ fb + log_offset)


def wav_to_logmel(wave: np.ndarray, feature_cfg) -> np.ndarray:
    """Convenience wrapper using an ExtractorFeatureConfig."""
    out = log_mel_spectrogram(
        jnp.asarray(wave, jnp.float32),
        sr=feature_cfg.sr,
        n_fft=feature_cfg.fft_bins,
        hop=feature_cfg.hop_sample,
        win_length=feature_cfg.window_length,
        n_mels=feature_cfg.mel_bins,
        log_offset=feature_cfg.log_offset,
    )
    return np.asarray(out)
