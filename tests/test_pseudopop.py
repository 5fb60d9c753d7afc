"""Pseudo-pop stem renderers + distill grid-variant augmentations.

Covers etude_tpu/data/synthetic.py's audio-domain stem renderers (separator
validation corpus, scripts/eval_separator_pseudopop.py) and
scripts/distill_dataset.py's exact grid-variant augmentations
(phase-shifted bars, double-time re-grid).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from etude_tpu.data.synthetic import (  # noqa: E402
    render_bass,
    render_drums,
    render_pad,
    render_vocal,
)

SR = 44100


def _onset_energy(wave: np.ndarray, t: float, win: float = 0.03) -> float:
    i0 = int((t - win) * SR)
    i1 = int((t + win) * SR)
    seg = wave[max(i0, 0):max(i1, 0)]
    return float(np.sqrt((seg ** 2).mean())) if len(seg) else 0.0


class TestStemRenderers:
    def test_drums_energy_on_beats(self):
        beats = np.arange(0.5, 7.5, 0.5)
        downs = beats[::4]
        wave = render_drums(beats, downs, 8.0, sr=SR, seed=0)
        on = np.mean([_onset_energy(wave, b + 0.015) for b in beats])
        off = np.mean([_onset_energy(wave, b + 0.26, win=0.02)
                       for b in beats[:-1]])
        assert on > 2.0 * off, (on, off)

    @pytest.mark.parametrize("render", [render_vocal, render_bass, render_pad])
    def test_tonal_stems_finite_and_voiced(self, render):
        notes = [{"onset": 0.2, "offset": 1.2, "pitch": 60, "velocity": 90},
                 {"onset": 1.4, "offset": 2.2, "pitch": 67, "velocity": 80}]
        wave = render(notes, 3.0, sr=SR)
        assert np.isfinite(wave).all()
        assert _onset_energy(wave, 0.7) > 10 * _onset_energy(wave, 2.7)

    def test_vocal_formant_envelope(self):
        # A high note's low harmonics near the 500 Hz formant should carry
        # more energy than the same harmonic count does in render_pad's
        # 1/h rolloff at high frequency.
        notes = [{"onset": 0.0, "offset": 1.0, "pitch": 69, "velocity": 100}]
        wave = render_vocal(notes, 1.0, sr=SR)
        spec = np.abs(np.fft.rfft(wave[: SR]))
        freqs = np.fft.rfftfreq(SR, 1 / SR)
        near_formant = spec[(freqs > 350) & (freqs < 700)].max()
        high = spec[(freqs > 3000) & (freqs < 6000)].max()
        assert near_formant > high


class TestPseudoPopAssembly:
    def test_build_stems_contract(self):
        from eval_separator_pseudopop import STEM_NAMES, build_stems

        rng = np.random.default_rng(0)
        notes = []
        t = 0.0
        while t < 10.0:
            notes.append({"onset": t, "offset": t + 0.4,
                          "pitch": int(rng.integers(48, 84)),
                          "velocity": 90})
            t += 0.25
        tempo = [{"bpm": 120.0, "time_sig": 4,
                  "downbeats": [i * 2.0 for i in range(6)]}]
        mix, stems, beats = build_stems(notes, tempo, 10.0, SR, seed=0)
        assert set(stems) == set(STEM_NAMES)
        assert np.abs(mix).max() <= 1.0
        n = len(mix)
        assert all(len(stems[k]) == n for k in STEM_NAMES)
        assert len(beats) >= 18  # 120 bpm over 10 s minus tail

    def test_module_build_stems_gain_drop_and_jitter_labels(self):
        from etude_tpu.data.pseudopop import MIX_GAINS, STEM_NAMES, build_stems

        beats = np.arange(8) * 0.5
        downs = beats[::4]
        notes = [{"onset": 0.1 + i * 0.45, "offset": 0.5 + i * 0.45,
                  "pitch": 60 + (i % 5) * 3, "velocity": 90}
                 for i in range(10)]
        mix, stems, b = build_stems(notes, beats, downs, 4.0, SR, seed=3)
        # int16-quantized serving mixture; gain-scaled stems reconstruct it.
        q = mix * 32767.0
        assert np.allclose(q, np.round(q), atol=1e-3)
        pre = sum(stems[k] for k in STEM_NAMES)
        assert np.abs(pre - mix).max() < 1.0 / 32767.0 + 1e-6
        # A zero gain drops the stem entirely.
        _, stems0, _ = build_stems(notes, beats, downs, 4.0, SR, 3,
                                   gains={**MIX_GAINS, "drums": 0.0})
        assert np.abs(stems0["drums"]).max() == 0.0
        # Drum humanization jitters audio anchors, never the labels.
        _, _, b_j = build_stems(notes, beats, downs, 4.0, SR, 3,
                                drum_jitter=0.01)
        assert np.array_equal(b_j, beats)

    def test_renderer_edge_onsets_clip_not_wrap(self):
        from etude_tpu.data.synthetic import render_drums, render_piano

        # Onset past the buffer end: silently dropped (used to crash).
        w = render_piano([{"onset": 4.5, "offset": 5.0, "pitch": 60,
                           "velocity": 90}], 4.0)
        assert np.abs(w).max() == 0.0
        # Jittered hit just before t=0: clipped, not wrapped to the tail.
        w = render_drums(np.array([-0.005, 0.5]), np.array([-0.005]), 2.0,
                         sr=SR, seed=1)
        assert np.abs(w[-2000:]).max() < 1e-6
        assert np.abs(w).max() > 0.0

    def test_si_sdr_scale_invariance(self):
        from eval_separator_pseudopop import si_sdr

        rng = np.random.default_rng(1)
        ref = np.abs(rng.standard_normal((40, 16))).astype(np.float32)
        est = ref + 0.1 * np.abs(rng.standard_normal(ref.shape))
        assert si_sdr(ref, ref) > 60.0
        assert abs(si_sdr(3.0 * est, ref) - si_sdr(est, ref)) < 1e-6


class TestGridVariantAugmentations:
    def _notes_on_grid(self, bpm=120.0, bars=4, time_sig=4):
        beat = 60.0 / bpm
        notes = []
        for b in range(bars * time_sig * 2):  # eighth-note melody
            t = b * beat / 2
            notes.append({"onset": t, "offset": t + beat / 2,
                          "pitch": 60 + (b % 12), "velocity": 80})
        tempo = [{"bpm": bpm, "time_sig": time_sig,
                  "downbeats": [i * time_sig * beat for i in range(bars)]}]
        return notes, tempo

    def test_phase_shift_moves_downbeats_only(self):
        from distill_dataset import _phase_shift_tempo

        _, tempo = self._notes_on_grid()
        shifted = _phase_shift_tempo(tempo, 1)
        beat = 60.0 / tempo[0]["bpm"]
        np.testing.assert_allclose(
            np.asarray(shifted[0]["downbeats"]),
            np.asarray(tempo[0]["downbeats"]) + beat,
        )
        assert shifted[0]["bpm"] == tempo[0]["bpm"]

    def test_double_time_doubles_bars(self):
        from distill_dataset import _double_time_tempo

        _, tempo = self._notes_on_grid()
        doubled = _double_time_tempo(tempo)
        assert doubled[0]["bpm"] == 2 * tempo[0]["bpm"]
        assert len(doubled[0]["downbeats"]) == 2 * len(tempo[0]["downbeats"])
        # Old downbeats all survive at even positions.
        np.testing.assert_allclose(doubled[0]["downbeats"][::2],
                                   tempo[0]["downbeats"])

    @pytest.mark.parametrize("variant", ["phase", "double"])
    def test_variant_encodings_round_trip_to_same_notes(self, variant):
        """Grid variants are EXACT: decoding the variant encoding returns
        the original grid-quantized notes (same onsets/pitches)."""
        from distill_dataset import _double_time_tempo, _phase_shift_tempo

        from etude_tpu.data.tokenizer import TinyREMITokenizer

        notes, tempo = self._notes_on_grid()
        vtempo = (_phase_shift_tempo(tempo, 1) if variant == "phase"
                  else _double_time_tempo(tempo))
        events = TinyREMITokenizer(tempo_data=vtempo).encode(notes)
        decoded = TinyREMITokenizer(tempo_data=vtempo).decode_to_notes(events)
        got = sorted((round(n["onset"], 3), n["pitch"]) for n in decoded)
        want = sorted((round(n["onset"], 3), n["pitch"]) for n in notes)
        assert got == want
