"""Host-side audio I/O and DSP utilities.

The environment has no librosa/torchaudio/ffmpeg; the framework owns WAV
loading, resampling and loudness analysis. Semantics match the reference's
use of librosa (etude/utils/preprocess.py:116-152 volume contour; librosa
defaults: float32 waveform in [-1, 1], mono mixdown, centered RMS frames).
"""

from __future__ import annotations

import json
import subprocess
import shutil
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

from .logger import logger


def load_wav(
    path: Union[str, Path],
    target_sr: Optional[int] = None,
    mono: bool = True,
) -> Tuple[np.ndarray, int]:
    """Load a WAV file → (float32 waveform in [-1, 1], sample_rate).

    Integer PCM is scaled by its dtype range; optional mono mixdown and
    polyphase resampling to target_sr.
    """
    path = Path(path)
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wave = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wave = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wave = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wave = data.astype(np.float32)

    if mono and wave.ndim > 1:
        wave = wave.mean(axis=1)

    if target_sr is not None and target_sr != sr:
        wave = resample_audio(wave, sr, target_sr)
        sr = target_sr
    return wave, sr


_POLY_FILTER_CACHE: dict = {}


def _polyphase_filter(up: int, down: int):
    """(hp_rev [up, K] f32, n_pre_remove) replicating scipy's
    resample_poly(window=('kaiser', 5.0)) filter design and output framing.

    The Kaiser-windowed sinc, the DC normalization, the `up` gain, the
    pre-pad that centers output samples, and the trim offset follow scipy's
    `_design_resample_poly` / `resample_poly` exactly, so the native path
    is numerically the scipy path (same taps, f32 accumulation).
    """
    key = (up, down)
    cached = _POLY_FILTER_CACHE.get(key)
    if cached is not None:
        return cached
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    numtaps = 2 * half_len + 1
    m = np.arange(numtaps, dtype=np.float64) - half_len
    h = f_c * np.sinc(f_c * m) * np.kaiser(numtaps, 5.0)
    h /= h.sum()          # firwin(scale=True): unity DC gain
    h *= up               # resample_poly gain compensation
    n_pre_pad = down - half_len % down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // down
    K = -(-len(h) // up)
    hp = np.zeros((up, K), np.float32)
    flat = np.zeros(K * up, np.float64)
    flat[: len(h)] = h
    hp[:, :] = flat.reshape(K, up).T.astype(np.float32)
    hp_rev = np.ascontiguousarray(hp[:, ::-1])
    _POLY_FILTER_CACHE[key] = (hp_rev, n_pre_remove)
    return hp_rev, n_pre_remove


def resample_audio(wave: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (host-side; the mel frontend consumes the result).

    Hot path on serving latency (extract's 44.1→16 kHz leg alone is ~1.4 s
    of scipy time for a 3-minute song): a threaded C++ polyphase kernel
    (native/resample_fir.cc) evaluates scipy's exact filter; scipy remains
    the fallback when the native build is unavailable.
    """
    if orig_sr == target_sr:
        return wave
    # Both paths filter in f32 (the native kernel is f32-only); casting up
    # front keeps the scipy fallback numerically identical for f64 input.
    wave = np.asarray(wave, np.float32)
    g = np.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    if wave.ndim == 1:
        try:
            from ..native import upfirdn_poly_native

            hp_rev, n_pre_remove = _polyphase_filter(up, down)
            n = wave.shape[0] * up
            n_out = n // down + bool(n % down)
            return upfirdn_poly_native(
                hp_rev, np.ascontiguousarray(wave, np.float32),
                down, n_pre_remove, n_out,
            )
        except (RuntimeError, OSError):
            pass
    return resample_poly(wave, up, down).astype(np.float32)


def save_wav(path: Union[str, Path], wave: np.ndarray, sr: int) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    clipped = np.clip(wave, -1.0, 1.0)
    wavfile.write(path, sr, (clipped * 32767.0).astype(np.int16))


def decode_audio(
    path: Union[str, Path], target_sr: Optional[int] = None, mono: bool = True
) -> Tuple[np.ndarray, int]:
    """Decode any audio container to a waveform.

    WAV is read natively; other formats go through ffmpeg when present
    (gated: a clear error otherwise, since this image ships no codecs).
    """
    path = Path(path)
    if path.suffix.lower() == ".wav":
        return load_wav(path, target_sr=target_sr, mono=mono)
    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg:
        raise RuntimeError(
            f"cannot decode {path.suffix} audio: ffmpeg not available; "
            "provide WAV input"
        )
    sr = target_sr or 44100
    cmd = [
        ffmpeg, "-v", "error", "-i", str(path),
        "-f", "f32le", "-acodec", "pcm_f32le",
        "-ac", "1" if mono else "2", "-ar", str(sr), "-",
    ]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    wave = np.frombuffer(raw, dtype=np.float32)
    if not mono:
        wave = wave.reshape(-1, 2)
    return wave, sr


def analyze_volume(
    audio_path: Union[str, Path],
    sr: int = 22050,
    resolution: int = 20,
    wave_sr: Optional[Tuple[np.ndarray, int]] = None,
) -> np.ndarray:
    """Normalized [0, 1] RMS loudness contour at `resolution` Hz.

    Frame length is 2 hops with centered (zero-padded) frames, matching the
    reference's librosa RMS call. `wave_sr=(wave, native_sr)` reuses an
    already-decoded waveform (the pipeline reads origin.wav once and shares
    it across extract/volume/separation) — same resample path as decoding
    from the file, so results are identical.
    """
    if wave_sr is not None:
        wave, native_sr = wave_sr
        wave = resample_audio(wave, native_sr, sr) if native_sr != sr else wave
    else:
        wave, _ = decode_audio(audio_path, target_sr=sr, mono=True)
    hop = sr // resolution
    frame = hop * 2
    padded = np.pad(wave, frame // 2)
    n_frames = 1 + (len(padded) - frame) // hop if len(padded) >= frame else 0
    if n_frames <= 0:
        return np.zeros(0, np.float32)
    # O(N) via a cumulative sum of squares (the [n_frames, frame] gather is
    # a 10x-the-signal copy on long songs).
    csum = np.concatenate(([0.0], np.cumsum(padded.astype(np.float64) ** 2)))
    starts = hop * np.arange(n_frames)
    rms = np.sqrt((csum[starts + frame] - csum[starts]) / frame)
    lo, hi = rms.min(), rms.max()
    if hi > lo:
        return ((rms - lo) / (hi - lo)).astype(np.float32)
    return np.zeros_like(rms, dtype=np.float32)


def save_volume_map(volume_map: np.ndarray, output_path: Union[str, Path]) -> None:
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(np.asarray(volume_map, dtype=float).tolist(), f)
