"""Tempo-octave disambiguation (ops/beat_octave.py).

Synthetic activation curves with known true beats: gaussian bumps at the
true beat times, near-zero elsewhere. The pass must recover the true
octave from half-/double-time DBN outputs and must NOT touch a correct
output, an ambiguous one, or one whose corrected tempo would leave the
DBN's own BPM band.
"""

import numpy as np
import pytest

from etude_tpu.ops.beat_octave import disambiguate_octave

FPS = 44100 / 1024


def make_activation(true_beats, horizon_s, fps=FPS, width_s=0.03):
    t = np.arange(int(horizon_s * fps)) / fps
    act = np.zeros_like(t)
    for b in true_beats:
        act += np.exp(-0.5 * ((t - b) / width_s) ** 2)
    return np.clip(act, 0.0, 1.0).astype(np.float32)


def test_half_time_corrected_to_double():
    # True beats at 120 BPM; DBN locked to 60-BPM half time.
    true = np.arange(0.25, 60.0, 0.5)
    act = make_activation(true, 60.0)
    est = true[::2]
    fixed, applied = disambiguate_octave(est, act, FPS)
    assert applied == "double"
    # Every recovered beat lands on a true beat (within 30 ms).
    d = np.min(np.abs(fixed[:, None] - true[None, :]), axis=1)
    assert float(d.max()) < 0.03


def test_double_time_corrected_to_half():
    # True beats at 100 BPM; DBN emitted 200-BPM double time.
    true = np.arange(0.3, 60.0, 0.6)
    act = make_activation(true, 60.0)
    mids = true[:-1] + np.diff(true) / 2
    est = np.sort(np.concatenate([true, mids]))
    fixed, applied = disambiguate_octave(est, act, FPS)
    assert applied in ("half_even", "half_odd")
    d = np.min(np.abs(fixed[:, None] - true[None, :]), axis=1)
    assert float(d.max()) < 0.03
    assert abs(len(fixed) - len(true)) <= 1


def test_half_phase_choice():
    # Double-time estimate whose EVEN slots are the off-beats: the odd
    # phase must win.
    true = np.arange(0.3, 60.0, 0.6)
    act = make_activation(true, 60.0)
    mids = true + 0.3
    est = np.sort(np.concatenate([true, mids]))  # starts on an off-beat? no:
    # est[0]=0.3 (true), so even slots are true beats here; shift by one to
    # force the odd phase.
    est = np.concatenate([[0.05], est])
    fixed, applied = disambiguate_octave(est, act, FPS)
    assert applied in ("half_even", "half_odd")
    d = np.min(np.abs(fixed[:, None] - true[None, :]), axis=1)
    assert float(np.median(d)) < 0.03


def test_correct_output_untouched():
    true = np.arange(0.25, 60.0, 0.5)
    act = make_activation(true, 60.0)
    fixed, applied = disambiguate_octave(true.copy(), act, FPS)
    assert applied is None
    np.testing.assert_allclose(fixed, true)


def test_bpm_band_respected():
    # True beats at 280 BPM (above max_bpm): the double candidate that
    # would match them is out of band, so the half-time estimate stays.
    true = np.arange(0.2, 30.0, 60.0 / 280)
    act = make_activation(true, 30.0, width_s=0.02)
    est = true[::2]  # 140 BPM, in band
    fixed, applied = disambiguate_octave(est, act, FPS, max_bpm=250.0)
    assert applied is None
    np.testing.assert_allclose(fixed, est)


def test_flat_activation_no_switch():
    # No beat information in the activation: keep the DBN output.
    est = np.arange(0.25, 60.0, 0.5)
    act = np.full(int(60 * FPS), 0.3, np.float32)
    fixed, applied = disambiguate_octave(est, act, FPS)
    assert applied is None


def test_short_inputs_passthrough():
    est = np.array([0.5, 1.0, 1.5])
    act = np.zeros(100, np.float32)
    fixed, applied = disambiguate_octave(est, act, FPS)
    assert applied is None and len(fixed) == 3


def test_detector_config_flag_wiring():
    from etude_tpu.config.schema import BeatDetectorConfig

    cfg = BeatDetectorConfig()
    assert cfg.octave_disambiguation is False  # default off until validated
    assert BeatDetectorConfig(octave_disambiguation=True).octave_disambiguation
