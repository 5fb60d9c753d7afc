"""Chroma and chroma-onset features for audio-to-audio alignment.

Functional replacement for the reference's synctoolbox feature stack
(etude/data/aligner.py:82-96: pitch→chroma, quantized chroma, DLNCO onset
features): an STFT-based semitone filterbank (MIDI pitches 24–107, tuning-
adjustable) folded into 12 pitch classes, log-compressed and ℓ2-normalized;
onset features are per-chroma half-wave-rectified energy differences with an
exponential decay kernel (a DLNCO-style decaying onset representation).
Everything runs as one jit program on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

ALIGN_SR = 22050
ALIGN_FEATURE_RATE = 50  # Hz
_N_FFT = 4096
_PITCH_LO, _PITCH_HI = 24, 108


def _pitch_filterbank(sr: int, n_fft: int, tuning_cents: float = 0.0) -> np.ndarray:
    """[n_bins, n_pitches] triangular filters centered on MIDI pitches."""
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins)
    pitches = np.arange(_PITCH_LO, _PITCH_HI)
    centers = 440.0 * 2 ** ((pitches - 69 + tuning_cents / 100.0) / 12.0)
    lo = centers * 2 ** (-0.5 / 12)
    hi = centers * 2 ** (0.5 / 12)
    up = (freqs[:, None] - lo[None]) / np.maximum(centers - lo, 1e-9)[None]
    down = (hi[None] - freqs[:, None]) / np.maximum(hi - centers, 1e-9)[None]
    fb = np.clip(np.minimum(up, down), 0.0, 1.0)
    # Normalize each filter to unit area so low pitches (few bins) keep weight.
    fb /= np.maximum(fb.sum(axis=0, keepdims=True), 1e-9)
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sr", "feature_rate"))
def _chroma_core(wave: jnp.ndarray, fb: jnp.ndarray, cos_m, sin_m,
                 sr: int, feature_rate: int):
    hop = sr // feature_rate
    w = wave  # host reflect-padded by the wrapper
    n_frames = 1 + (w.shape[0] - _N_FFT) // hop
    idx = jnp.arange(_N_FFT)[None, :] + hop * jnp.arange(n_frames)[:, None]
    n = np.arange(_N_FFT)
    window = jnp.asarray(
        (0.5 * (1 - np.cos(2 * np.pi * n / _N_FFT))).astype(np.float32)
    )
    from .mel import frame_power_spectrum

    power = frame_power_spectrum(w[idx] * window[None], cos_m, sin_m)  # [T, bins]
    pitch_energy = power @ fb                       # [T, 84]

    chroma = pitch_energy.reshape(n_frames, -1, 12).sum(axis=1)  # [T, 12]
    chroma = jnp.log1p(100.0 * chroma)
    norm = jnp.linalg.norm(chroma, axis=1, keepdims=True)
    chroma_n = chroma / jnp.maximum(norm, 1e-6)

    # Onset features: half-wave rectified temporal difference per pitch class,
    # locally normalized, convolved with a decaying kernel.
    diff = jnp.maximum(chroma[1:] - chroma[:-1], 0.0)
    diff = jnp.concatenate([jnp.zeros((1, 12)), diff], axis=0)
    local = jnp.max(diff, axis=1, keepdims=True)
    diff_n = diff / jnp.maximum(local, 1e-6) * jnp.minimum(local, 1.0)
    decay = jnp.asarray((0.9 ** np.arange(10)).astype(np.float32))
    onset = jnp.stack([
        jnp.convolve(diff_n[:, c], decay)[:n_frames] for c in range(12)
    ], axis=1)
    onset = onset / jnp.maximum(
        jnp.linalg.norm(onset, axis=1, keepdims=True), 1e-6
    ) * (jnp.linalg.norm(onset, axis=1, keepdims=True) > 1e-3)
    return chroma_n, onset


def chroma_features(
    wave: np.ndarray,
    sr: int = ALIGN_SR,
    feature_rate: int = ALIGN_FEATURE_RATE,
    tuning_cents: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """waveform → (chroma [T, 12], onset [T, 12]) at feature_rate Hz."""
    from .mel import dft_matrices

    fb_pitch = _pitch_filterbank(sr, _N_FFT, tuning_cents)
    cos_m, sin_m = dft_matrices(_N_FFT)

    # Host reflect pad, then bucket the frame count so different song
    # lengths share programs and tail frames keep center semantics.
    hop = sr // feature_rate
    n = len(wave)
    true_frames = n // hop + 1
    from .mel import reflect_pad_host
    padded = reflect_pad_host(np.asarray(wave, np.float32), _N_FFT // 2)
    bucket = 2048
    target_frames = -(-true_frames // bucket) * bucket
    target_len = (target_frames - 1) * hop + _N_FFT
    padded = np.pad(padded, (0, max(0, target_len - len(padded))))[:target_len]

    chroma, onset = _chroma_core(
        jnp.asarray(padded), jnp.asarray(fb_pitch), cos_m, sin_m,
        sr, feature_rate
    )
    return np.asarray(chroma)[:true_frames], np.asarray(onset)[:true_frames]


def estimate_tuning(wave: np.ndarray, sr: int = ALIGN_SR) -> float:
    """Tuning deviation in cents via chroma energy over a ±50-cent sweep."""
    best, best_energy = 0.0, -1.0
    for cents in np.arange(-50, 50, 10.0):
        fb = _pitch_filterbank(sr, _N_FFT, cents)
        # Single coarse frame: average spectrum of the middle of the signal.
        mid = wave[len(wave) // 4: len(wave) // 4 + sr * 4]
        if len(mid) < _N_FFT:
            mid = np.pad(wave, (0, max(0, _N_FFT - len(wave))))
        spec = np.abs(np.fft.rfft(mid[:_N_FFT] * np.hanning(_N_FFT))) ** 2
        energy = float((spec @ fb).max())
        if energy > best_energy:
            best, best_energy = cents, energy
    return best


def optimal_chroma_shift(chroma_a: np.ndarray, chroma_b: np.ndarray) -> int:
    """Cyclic shift of b maximizing average-chroma similarity with a
    (synctoolbox compute_optimal_chroma_shift equivalent on mean CENS)."""
    mean_a = chroma_a.mean(axis=0)
    mean_b = chroma_b.mean(axis=0)
    sims = [float(mean_a @ np.roll(mean_b, s)) for s in range(12)]
    return int(np.argmax(sims))
