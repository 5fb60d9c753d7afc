import numpy as np
import pytest

from etude_tpu.ops.peakpick import _next_below, activations_to_notes, detect_peaks

HOP = 0.016


def test_detect_simple_peak():
    act = np.array([0.1, 0.3, 0.9, 0.3, 0.1], np.float32)
    locs, times = detect_peaks(act, 0.5, HOP)
    np.testing.assert_array_equal(locs, [2])
    # Symmetric neighbors → no interpolation shift.
    assert times[0] == pytest.approx(2 * HOP)


def test_detect_below_threshold_ignored():
    act = np.array([0.1, 0.4, 0.1], np.float32)
    locs, _ = detect_peaks(act, 0.5, HOP)
    assert len(locs) == 0


def test_detect_plateau_counts_fully():
    """All frames of a maximal plateau are peaks (reference scan semantics)."""
    act = np.array([0.1, 0.8, 0.8, 0.8, 0.1], np.float32)
    locs, _ = detect_peaks(act, 0.5, HOP)
    np.testing.assert_array_equal(locs, [1, 2, 3])


def test_detect_boundary_peak():
    act = np.array([0.9, 0.3, 0.1], np.float32)
    locs, times = detect_peaks(act, 0.5, HOP)
    np.testing.assert_array_equal(locs, [0])
    assert times[0] == 0.0


def test_interpolation_shifts_toward_heavier_neighbor():
    # Left neighbor larger → time shifts earlier.
    act = np.array([0.1, 0.6, 0.9, 0.2, 0.1], np.float32)
    locs, times = detect_peaks(act, 0.5, HOP)
    assert times[0] < locs[0] * HOP
    # Right neighbor larger → time shifts later.
    act = np.array([0.1, 0.2, 0.9, 0.6, 0.1], np.float32)
    locs, times = detect_peaks(act, 0.5, HOP)
    assert times[0] > locs[0] * HOP


def test_next_below():
    mask = np.array([False, False, True, False, True])
    np.testing.assert_array_equal(_next_below(mask), [2, 2, 2, 4, 4])


def _maps(T=40, pitch_col=0, n_note=3):
    onset = np.zeros((T, n_note), np.float32)
    offset = np.zeros((T, n_note), np.float32)
    mpe = np.zeros((T, n_note), np.float32)
    vel = np.full((T, n_note), 64, np.int32)
    return onset, offset, mpe, vel


def test_single_note_with_mpe_offset():
    onset, offset, mpe, vel = _maps()
    onset[5, 0] = 0.9
    mpe[5:15, 0] = 0.9   # frame activity ends at frame 15
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP, note_min=21)
    assert len(notes) == 1
    n = notes[0]
    assert n["pitch"] == 21
    assert n["onset"] == pytest.approx(5 * HOP)
    assert n["offset"] == pytest.approx(15 * HOP)
    assert n["velocity"] == 64


def test_offset_policy_shorter():
    onset, offset, mpe, vel = _maps()
    onset[5, 0] = 0.9
    offset[10, 0] = 0.9   # offset head says frame 10
    mpe[5:20, 0] = 0.9    # MPE says frame 20
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP)
    assert notes[0]["offset"] == pytest.approx(10 * HOP)  # shorter wins

    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP,
                                 mode_offset="longer")
    assert notes[0]["offset"] == pytest.approx(20 * HOP)


def test_no_offset_no_mpe_extends_to_next_onset():
    onset, offset, mpe, vel = _maps()
    onset[5, 0] = 0.9
    onset[20, 0] = 0.9
    mpe[:, 0] = 0.9  # never drops below threshold
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP)
    assert len(notes) == 2
    assert notes[0]["offset"] == pytest.approx(20 * HOP)


def test_zero_velocity_dropped():
    onset, offset, mpe, vel = _maps()
    onset[5, 0] = 0.9
    vel[5, 0] = 0
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP)
    assert notes == []


def test_overlapping_same_pitch_truncated():
    onset, offset, mpe, vel = _maps()
    onset[5, 0] = 0.9
    onset[10, 0] = 0.9
    offset[30, 0] = 0.9  # both notes would end at frame 30
    mpe[:, 0] = 0.9
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP)
    assert len(notes) == 2
    # First note truncated to the second onset.
    assert notes[0]["offset"] == pytest.approx(notes[1]["onset"])


def test_notes_sorted_and_multi_pitch():
    onset, offset, mpe, vel = _maps()
    onset[10, 2] = 0.9
    onset[5, 0] = 0.9
    mpe[:, :] = 0.9
    notes = activations_to_notes(onset, offset, mpe, vel, hop_sec=HOP, note_min=21)
    assert [n["pitch"] for n in notes] == [21, 23]
    assert notes[0]["onset"] < notes[1]["onset"]
