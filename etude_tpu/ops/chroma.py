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


def _cens_like(chroma: np.ndarray, smooth: int = 21, down: int = 5
               ) -> np.ndarray:
    """Coarse CENS-style features: moving-average smoothing, downsampling,
    L2 normalization — the representation synctoolbox's shift search runs
    its per-shift DTWs on."""
    kernel = np.ones(smooth, np.float32) / smooth
    sm = np.stack([
        np.convolve(chroma[:, c], kernel, mode="same") for c in range(12)
    ], axis=1)
    sm = sm[::down]
    norm = np.linalg.norm(sm, axis=1, keepdims=True)
    return sm / np.maximum(norm, 1e-9)


def _dtw_cost_numpy(sim: np.ndarray) -> float:
    """Normalized DTW cost over a (1 − similarity) matrix with the MrMsDTW
    step set {(1,0), (0,1), (1,1)} and weights {1.5, 1.5, 2.0} — row-wise
    vectorized numpy DP (host-side; called 12 times by the shift search).

    The horizontal recurrence out[j] = min(base[j], out[j-1] + w·c[j]) is a
    min-plus prefix scan: with S = cumsum(w·c),
    out[j] = S[j] + cummin(base − S)[j] — exact and fully vectorized."""
    cost = (1.0 - sim).astype(np.float32)
    N, M = cost.shape
    INF = np.float32(1e30)

    S = np.cumsum(1.5 * cost[0])
    prev = cost[0, 0] + S - S[0]           # first row: horizontal chain only
    for i in range(1, N):
        steps_v = prev + 1.5 * cost[i]                    # from (i-1, j)
        steps_d = np.empty(M, np.float32)
        steps_d[0] = INF
        steps_d[1:] = prev[:-1] + 2.0 * cost[i, 1:]       # from (i-1, j-1)
        base = np.minimum(steps_v, steps_d)
        S = np.cumsum(1.5 * cost[i])
        prev = S + np.minimum.accumulate(base - S)
    return float(prev[-1]) / (N + M)


def optimal_chroma_shift(chroma_a: np.ndarray, chroma_b: np.ndarray) -> int:
    """Cyclic shift of b minimizing the coarse-CENS DTW cost against a —
    the synctoolbox compute_optimal_chroma_shift semantics. (A mean-chroma
    correlation is not robust: songs with flat pitch-class profiles can tie
    within noise and mis-key the whole alignment.)"""
    a = _cens_like(np.asarray(chroma_a, np.float32))
    b = _cens_like(np.asarray(chroma_b, np.float32))
    # Bound the per-shift DTW to ~600x600 for speed; the key decision is
    # global, so extra downsampling does not change the argmin.
    extra = max(int(np.ceil(max(a.shape[0], b.shape[0]) / 600)), 1)
    a, b = a[::extra], b[::extra]
    costs = []
    for s in range(12):
        sim = a @ np.roll(b, s, axis=1).T
        costs.append(_dtw_cost_numpy(sim))
    return int(np.argmin(costs))
