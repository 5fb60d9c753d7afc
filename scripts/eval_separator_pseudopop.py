#!/usr/bin/env python
"""Separator validation on pseudo-pop mixtures (VERDICT r3 #7).

The separator's only quality number so far came from self-generated
harmonic magnitude tracks (synthetic SDR 12.2 dB). This script faces it
with something closer to a real pop record, in the AUDIO domain:

  held-out corpus MIDI (eval split, snap-gated grid)
    → five audio stems: formant-vocal lead (top line +12), the piano
      cover itself, a sustained chord pad ('guitar' slot), a bass root
      line, and synthetic drums riding the song's KNOWN beat grid
      (etude_tpu/data/synthetic.py pseudo-pop renderers)
    → time-domain mix at 44.1 kHz (int16-quantized, the serving chain)
    → the trained separator → per-stem mel-magnitude SI-SDR vs the
      isolated stems' own mel transforms
    → downstream: beat F on the mixture, separator vs bypass, vs the
      known grid — the number the reference README says separation is
      there to protect (README.md:83-84).

SI-SDR (scale-invariant, mel-magnitude domain) is used because the
separator's output is ratio-masked mix power — absolute scale is not
comparable to an isolated stem render.

Reference analog: scripts/run_separation.py:144-183 (Spleeter/Demucs on
real mixtures); no real stem data ships in this image, so corpus-derived
pseudo-pop is the strongest available realism test.

Usage: python scripts/eval_separator_pseudopop.py [--songs 8] [--seconds 60]
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.pseudopop import (  # noqa: E402
    STEM_NAMES,
    build_stems as _build_stems,
)
from etude_tpu.data.synthetic import beat_f_measure  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from validate_beat_corpus import grid_beat_times, snap_gated_song  # noqa: E402


def build_stems(notes, tempo, dur: float, sr: int, seed: int):
    beats = grid_beat_times(tempo, dur)
    downs = np.asarray(
        [t for r in tempo for t in r["downbeats"] if t < dur], float)
    return _build_stems(notes, beats, downs, dur, sr, seed)


def mel_mag(wave: np.ndarray) -> np.ndarray:
    """[T_true, 128] mel magnitude of a raw wave via the separation
    transform (mix path, 1 stem)."""
    import jax.numpy as jnp

    from etude_tpu.data.separation import (
        SEP_N_FFT, _mix_mel_jit, _sep_fb_device, pad_bucket_wave,
    )
    from etude_tpu.ops.mel import dft_matrices

    padded, true_frames = pad_bucket_wave(wave)
    cos_m, sin_m = dft_matrices(SEP_N_FFT)
    power = _mix_mel_jit(jnp.asarray(padded, jnp.float32), cos_m, sin_m,
                         _sep_fb_device(), 1)[0]
    return np.sqrt(np.maximum(np.asarray(power, np.float32), 0.0))[:true_frames]


def si_sdr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SDR (dB) between flattened nonneg magnitude grids."""
    e, r = est.ravel().astype(np.float64), ref.ravel().astype(np.float64)
    alpha = float(np.dot(e, r) / max(np.dot(r, r), eps))
    num = np.sum((alpha * r) ** 2)
    den = np.sum((e - alpha * r) ** 2)
    return float(10.0 * np.log10((num + eps) / (den + eps)))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=60.0)
    parser.add_argument("--snap-gate", type=float, default=0.02)
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--sr", type=int, default=44100)
    parser.add_argument("--out", default=None, help="write JSON summary here")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from etude_tpu.config.schema import BeatDetectorConfig
    from etude_tpu.data.beat_detector import BeatDetector
    from etude_tpu.data.corpus_render import corpus_song_dirs, split_songs
    from etude_tpu.data.separation import (
        SourceSeparator, _separate_mel, pad_bucket_wave,
    )

    separator = SourceSeparator(
        model_path=REPO / "checkpoints" / "separator" / "latest.ckpt")
    bypass = SourceSeparator(bypass=True)
    detector = BeatDetector(
        BeatDetectorConfig(),
        model_path=REPO / "checkpoints" / "beat_detector" / "latest.ckpt")

    _, eval_dirs = split_songs(corpus_song_dirs(Path(args.corpus)))
    rows = []
    for d in eval_dirs:
        if len(rows) >= args.songs:
            break
        gated = snap_gated_song(d / "etude_d.mid", args.seconds,
                                args.snap_gate)
        if gated is None:
            continue
        notes, tempo, _snap = gated
        dur = min(max(n["offset"] for n in notes) + 0.5, args.seconds)
        mix, stems, beats = build_stems(notes, tempo, dur, args.sr,
                                        seed=len(rows))

        padded, true_frames = pad_bucket_wave(mix)
        est_power = np.asarray(_separate_mel(
            separator.params, separator.config, jnp.asarray(padded),
            true_frames), np.float32)[:, :true_frames]
        est_mag = np.sqrt(np.maximum(est_power, 0.0))
        sdrs = {}
        for si, name in enumerate(STEM_NAMES):
            ref = mel_mag(stems[name])
            sdrs[name] = round(si_sdr(est_mag[si], ref), 2)
        # Baseline every stem estimator must beat: the raw mix in the slot.
        mix_mag_grid = mel_mag(mix)
        base = {name: round(si_sdr(mix_mag_grid, mel_mag(stems[name])), 2)
                for name in STEM_NAMES}

        # Downstream: beat F with separation vs bypass.
        f_by_path = {}
        for label, sep in (("sep", separator), ("bypass", bypass)):
            feats = sep.separate_features(None, wave_sr=(mix, args.sr),
                                          return_device=True)
            pred = detector.detect(feats, cleanup_input=False)
            est_beats = np.asarray(pred["beat_pred"], float)
            f_by_path[label] = round(beat_f_measure(est_beats, beats), 4)

        row = {"song": d.name, "dur_s": round(dur, 1), "si_sdr": sdrs,
               "si_sdr_mix_baseline": base,
               "beat_f_sep": f_by_path["sep"],
               "beat_f_bypass": f_by_path["bypass"]}
        rows.append(row)
        logger.info(
            f"{d.name}: SI-SDR " +
            " ".join(f"{k}={sdrs[k]:+.1f}" for k in STEM_NAMES) +
            f" | beat F sep {row['beat_f_sep']:.3f} "
            f"vs bypass {row['beat_f_bypass']:.3f}")

    if not rows:
        logger.error("no snap-gated eval songs")
        return 1
    summary = {
        "songs": rows,
        "mean_si_sdr": {
            k: round(float(np.mean([r["si_sdr"][k] for r in rows])), 2)
            for k in STEM_NAMES},
        "mean_si_sdr_mix_baseline": {
            k: round(float(np.mean([r["si_sdr_mix_baseline"][k]
                                    for r in rows])), 2)
            for k in STEM_NAMES},
        "mean_beat_f_sep": round(
            float(np.mean([r["beat_f_sep"] for r in rows])), 4),
        "mean_beat_f_bypass": round(
            float(np.mean([r["beat_f_bypass"] for r in rows])), 4),
    }
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
