import numpy as np
import pytest

from etude_tpu.data.aligner import AudioAligner
from etude_tpu.ops.chroma import chroma_features, optimal_chroma_shift
from etude_tpu.ops.dtw import dtw_path
from etude_tpu.utils.audio import save_wav


def _tone_sequence(pitches, sr=22050, note_sec=0.4):
    out = []
    for p in pitches:
        f = 440.0 * 2 ** ((p - 69) / 12)
        t = np.arange(int(sr * note_sec)) / sr
        env = np.minimum(1, 10 * t) * np.exp(-2 * t)
        out.append(0.5 * env * np.sin(2 * np.pi * f * t))
    return np.concatenate(out).astype(np.float32)


def test_chroma_identifies_pitch_class():
    wave = _tone_sequence([60, 60, 60])  # C4
    chroma, onset = chroma_features(wave)
    assert chroma.shape[1] == 12 and onset.shape == chroma.shape
    mean = chroma.mean(axis=0)
    assert int(np.argmax(mean)) == 0  # pitch class C
    # Onsets roughly at the three note starts (0.0, 0.4, 0.8 s → frames 0/20/40).
    energy = onset.sum(axis=1)
    assert energy[18:24].max() > energy[8:16].max()


def test_optimal_chroma_shift_detects_transposition():
    a = _tone_sequence([60, 64, 67] * 3)
    b = _tone_sequence([63, 67, 70] * 3)  # +3 semitones
    ca, _ = chroma_features(a)
    cb, _ = chroma_features(b)
    shift = optimal_chroma_shift(ca, cb)
    # Rolling b's chroma by +? should align C with D#: shift of -3 mod 12 = 9.
    assert shift in (9,)


def test_dtw_identity_alignment():
    rng = np.random.default_rng(0)
    chroma = rng.uniform(size=(50, 12)).astype(np.float32)
    chroma /= np.linalg.norm(chroma, axis=1, keepdims=True)
    onset = np.zeros_like(chroma)
    wp = dtw_path(chroma, onset, chroma, onset)
    # Identical sequences → diagonal path.
    np.testing.assert_array_equal(wp[0], wp[1])
    assert wp[0][0] == 0 and wp[0][-1] == 49


def test_dtw_tempo_ratio():
    """Sequence B is A at half speed: the path slope is ~2."""
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(40, 12)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = np.repeat(a, 2, axis=0)
    onset_a, onset_b = np.zeros_like(a), np.zeros_like(b)
    wp = dtw_path(a, onset_a, b, onset_b)
    slope = np.polyfit(wp[0], wp[1], 1)[0]
    assert slope == pytest.approx(2.0, abs=0.2)
    # Strictly monotonic (step set has no horizontal/vertical moves).
    assert np.all(np.diff(wp[0]) >= 1)
    assert np.all(np.diff(wp[1]) >= 1)


def test_aligner_end_to_end_and_cache(tmp_path):
    sr = 22050
    origin = _tone_sequence([60, 62, 64, 65, 67, 69, 71, 72], sr=sr)
    cover = _tone_sequence([60, 62, 64, 65, 67, 69, 71, 72], sr=sr, note_sec=0.5)
    save_wav(tmp_path / "origin.wav", origin, sr)
    save_wav(tmp_path / "cover.wav", cover, sr)

    aligner = AudioAligner()
    result = aligner.align(tmp_path / "origin.wav", tmp_path / "cover.wav", tmp_path)
    assert result is not None
    wp = result["wp"]
    assert wp.shape[0] == 2
    # Cover is 1.25x slower → origin-vs-cover slope ≈ 0.8.
    slope = np.polyfit(wp[0], wp[1], 1)[0]
    assert slope == pytest.approx(0.8, abs=0.15)
    assert result["pitch_shift"] == 0

    # Cache round trip: second call loads from wp.json without audio files.
    assert (tmp_path / "wp.json").exists()
    (tmp_path / "origin.wav").unlink()
    cached = aligner.align(tmp_path / "origin.wav", tmp_path / "cover.wav", tmp_path)
    assert cached is not None
    np.testing.assert_array_equal(cached["wp"], wp)
