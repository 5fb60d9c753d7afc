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


# ===================================================== multi-resolution DTW
def _smooth_features(T, d=12, seed=3, step=6):
    """Slowly varying ℓ2-normalized features (chroma-like, DTW-friendly)."""
    rng = np.random.default_rng(seed)
    anchors = rng.uniform(0.1, 1.0, size=(T // step + 2, d))
    x = np.stack([
        np.interp(np.arange(T), np.arange(len(anchors)) * step, anchors[:, j])
        for j in range(d)
    ], axis=1).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_mrms_matches_full_dtw():
    """Coarse-to-fine banded DTW finds (near-)identical paths to the full
    DTW on a warped sequence pair."""
    from etude_tpu.ops.dtw import mrms_dtw_path

    a = _smooth_features(300)
    # b = a time-warped with a smooth nonlinear map (stretch 1.0-1.6x).
    t = np.arange(300)
    warp = np.cumsum(1.0 + 0.6 * np.sin(np.pi * t / 300) ** 2)
    warp = (warp / warp[-1] * 449).astype(int)
    b = a[np.searchsorted(warp, np.arange(450), "left").clip(0, 299)]
    oa, ob = np.zeros_like(a), np.zeros_like(b)

    wp_full = dtw_path(a, oa, b, ob)
    wp_mr = mrms_dtw_path(a, oa, b, ob, levels=(4, 1), band=40)

    # Compare as functions i→j: max deviation a few frames.
    j_full = np.interp(np.arange(300), wp_full[0], wp_full[1])
    j_mr = np.interp(np.arange(300), wp_mr[0], wp_mr[1])
    assert np.abs(j_full - j_mr).max() <= 4.0
    assert wp_mr[0][0] == 0 and wp_mr[1][0] == 0
    assert wp_mr[0][-1] == 299 and wp_mr[1][-1] == 449


def test_banded_native_matches_numpy():
    from etude_tpu.native import load_dtw_band_library
    from etude_tpu.ops.dtw import (
        _banded_cost,
        _dtw_band_numpy,
        dtw_path_banded,
    )

    if load_dtw_band_library() is None:
        pytest.skip("native toolchain unavailable")

    a = _smooth_features(120, seed=7)
    b = np.repeat(a, 2, axis=0)[::3]  # length 80, warped
    oa, ob = np.zeros_like(a), np.zeros_like(b)
    centers = np.linspace(0, 79, 120).round().astype(np.int64)
    centers[0] = min(centers[0], 12)
    centers[-1] = max(centers[-1], 79 - 12)

    cost = _banded_cost(a, oa, b, ob, centers, 12, 0.5)
    codes_np, final_np = _dtw_band_numpy(cost, 80, centers)

    from etude_tpu.native import dtw_band_native

    codes_nat, final_nat = dtw_band_native(cost, 80, centers)
    assert final_np == pytest.approx(final_nat, rel=1e-6)
    np.testing.assert_array_equal(codes_np, codes_nat)

    wp = dtw_path_banded(a, oa, b, ob, centers, 12)
    assert wp[0][-1] == 119 and wp[1][-1] == 79


def test_alignment_full_stack_synthetic_warp(tmp_path):
    """End-to-end chroma→DTW validation on REAL musical material with a KNOWN
    warp: render a corpus MIDI slice, time-stretch by resampling, and check
    the recovered path against the exact linear time map (no wp.json cache
    involved). Also checks transposition recovery."""
    from pathlib import Path

    from etude_tpu.data.synthetic import render_piano
    from etude_tpu.utils.midi import read_midi_notes

    ref_midi = Path("/root/reference/docs/songs/CPOP01/human.mid")
    if ref_midi.exists():
        notes = [n for n in read_midi_notes(ref_midi) if n["onset"] < 20.0]
    else:  # fall back to a synthetic note list
        from etude_tpu.data.synthetic import synth_piano_notes

        notes = synth_piano_notes(np.random.default_rng(0), 20.0)
    assert len(notes) > 10

    sr = 22050
    origin = render_piano(notes, 21.0, sr=sr)
    # Cover: same performance 25% slower and transposed +2 semitones.
    stretch = 1.25
    cover_notes = [
        {"onset": n["onset"] * stretch, "offset": n["offset"] * stretch,
         "pitch": min(n["pitch"] + 2, 108), "velocity": n["velocity"]}
        for n in notes
    ]
    cover = render_piano(cover_notes, 21.0 * stretch, sr=sr)

    aligner = AudioAligner()
    result = aligner.compute_warping_path(origin, cover)
    # pitch_shift is the semitone shift that maps the COVER back onto the
    # ORIGIN's key (reference formula, aligner.py:122-124): cover +2 → −2.
    assert result["pitch_shift"] == -2

    wp = np.asarray(result["wp"], float)
    # wp rows are (cover, origin): origin time must track cover/stretch.
    mid = (wp[0] > 50) & (wp[0] < wp[0][-1] - 50)  # ignore silent edges
    deviation = wp[1][mid] - wp[0][mid] / stretch
    assert np.abs(np.median(deviation)) < 10  # < 0.2 s at 50 Hz
    slope = np.polyfit(wp[0][mid], wp[1][mid], 1)[0]
    assert abs(slope - 1.0 / stretch) < 0.04


def test_mrms_path_used_for_long_songs(monkeypatch):
    """compute_warping_path routes large problems through mrms_dtw_path."""
    import etude_tpu.data.aligner as al

    calls = {}

    def fake_mrms(*args, **kwargs):
        calls["mrms"] = True
        n, m = args[0].shape[0], args[2].shape[0]
        return np.stack([np.arange(min(n, m))] * 2)

    monkeypatch.setattr(al, "mrms_dtw_path", fake_mrms)
    monkeypatch.setattr(al, "_FULL_DTW_MAX_CELLS", 10)

    a = AudioAligner()
    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.1, 22050 * 3).astype(np.float32)
    a.compute_warping_path(wave, wave)
    assert calls.get("mrms")
