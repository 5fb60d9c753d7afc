#!/usr/bin/env python
"""Beat-tracking F-measure on rendered corpus music (vs synthetic scenes).

The beat stack's only quality number so far came from held-out synthetic
scenes (checkpoints/beat_detector metadata, F 0.96). This script measures
the FULL structuralize chain — render → separation features → Beat-
Transformer → DBN — on real corpus songs (docs/songs), using etude_d.mid:
the reference decoder's output is quantized to a beat grid by construction,
so when its onsets snap tightly to an inferred constant-tempo grid (snap
deviation < --snap-gate seconds), that grid's beat times are trustworthy
ground truth for the rendered audio.

Reference analog: the Beat-Transformer + madmom DBN chain the reference
runs on real mixes (etude/data/beat_detector.py:99-144); its README warns
beat quality is separation-sensitive (README.md:83-84).

Usage: python scripts/validate_beat_corpus.py [--songs 10] [--seconds 180]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.synthetic import beat_f_measure, render_piano  # noqa: E402
from etude_tpu.utils.audio import save_wav  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from distill_dataset import estimate_tempo_grid, grid_fit_score  # noqa: E402


def grid_beat_times(tempo, horizon: float) -> np.ndarray:
    beats = []
    for region in tempo:
        beat = 60.0 / region["bpm"]
        downbeats = list(region["downbeats"])
        if not downbeats:
            continue
        end = downbeats[-1] + beat * region["time_sig"]
        t = downbeats[0]
        while t < min(end, horizon):
            beats.append(t)
            t += beat
    return np.asarray(beats)


def snap_gated_song(mid: Path, seconds: float, snap_gate: float):
    """MIDI → (notes, tempo grid) when the song's onsets snap to a constant
    grid tightly enough for that grid to serve as beat ground truth; None
    otherwise."""
    if not mid.exists():
        return None
    notes = [n for n in read_midi_notes(mid) if n["onset"] < seconds]
    if len(notes) < 64:
        return None
    tempo = estimate_tempo_grid(notes)
    snap = grid_fit_score(notes, tempo) if tempo else np.inf
    if not np.isfinite(snap) or snap > snap_gate:
        return None
    return notes, tempo, float(snap)


def score_song(separator, detector, notes, tempo, wav=Path("/tmp/beat_validate.wav")):
    """Render → serving features → beat forward → DBN → F vs grid beats.

    Returns (row dict, est beat times) or None when the grid is too short.
    """
    horizon = max(n["offset"] for n in notes)
    save_wav(wav, render_piano(notes, horizon + 1.0, sr=44100), 44100)
    features = separator.separate_features(wav, return_device=True)
    pred = detector.detect(features, cleanup_input=False)
    est = np.asarray(pred["beat_pred"], float)
    ref = grid_beat_times(tempo, horizon)
    if len(ref) < 8:
        return None
    f = beat_f_measure(est, ref)
    # The DBN may lock to half/double time legitimately; also score the
    # standard double/half-tempo references and report the best (the
    # common "beat F-measure with octave tolerance" diagnostic).
    f_half = beat_f_measure(est, ref[::2])
    ref_dbl = np.sort(np.concatenate([ref, ref[:-1] + np.diff(ref) / 2]))
    f_dbl = beat_f_measure(est, ref_dbl)
    return {
        "beat_f": round(f, 4),
        "beat_f_octave": round(max(f, f_half, f_dbl), 4),
        "n_est": len(est), "n_ref": len(ref),
    }


def validate(separator, detector, song_dirs, n_songs: int, seconds: float,
             snap_gate: float, version: str = "etude_d"):
    rows, skipped = [], 0
    for d in song_dirs:
        if len(rows) >= n_songs:
            break
        gated = snap_gated_song(d / f"{version}.mid", seconds, snap_gate)
        if gated is None:
            skipped += 1
            continue
        notes, tempo, snap = gated
        row = score_song(separator, detector, notes, tempo)
        if row is None:
            continue
        row.update({"song": d.name, "snap_dev_s": round(snap, 4)})
        rows.append(row)
        logger.info(f"{d.name}: beat F {row['beat_f']:.3f} (octave-tolerant "
                    f"{row['beat_f_octave']:.3f}, {row['n_est']} est vs "
                    f"{row['n_ref']} ref beats)")
    return {
        "songs": rows,
        "snap_gated_out": skipped,
        "mean_beat_f": round(float(np.mean([r["beat_f"] for r in rows])), 4)
        if rows else None,
        "mean_beat_f_octave": round(
            float(np.mean([r["beat_f_octave"] for r in rows])), 4
        ) if rows else None,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", type=int, default=10)
    parser.add_argument("--seconds", type=float, default=180.0)
    parser.add_argument("--snap-gate", type=float, default=0.02,
                        help="max mean onset-to-grid deviation (s) for a "
                             "song's grid to count as ground truth")
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--held-out-only", action="store_true",
                        help="score only the corpus_render eval split (songs "
                             "never used for fine-tuning)")
    parser.add_argument("--no-separator", action="store_true",
                        help="ablation: tile the raw mix's mel into every "
                             "stem slot instead of separating")
    parser.add_argument("--octave-disambiguation", action="store_true",
                        help="enable the DBN tempo-octave correction pass "
                             "(ops/beat_octave.py)")
    args = parser.parse_args(argv)

    from etude_tpu.config.schema import BeatDetectorConfig
    from etude_tpu.data.beat_detector import BeatDetector
    from etude_tpu.data.separation import SourceSeparator

    separator = SourceSeparator(
        model_path=REPO / "checkpoints" / "separator" / "latest.ckpt",
        bypass=args.no_separator,
    )
    detector = BeatDetector(
        BeatDetectorConfig(octave_disambiguation=args.octave_disambiguation),
        model_path=REPO / "checkpoints" / "beat_detector" / "latest.ckpt",
    )

    dirs = sorted(p for p in Path(args.corpus).iterdir() if p.is_dir())
    if args.held_out_only:
        from etude_tpu.data.corpus_render import corpus_song_dirs, split_songs

        _, dirs = split_songs(corpus_song_dirs(Path(args.corpus)))
    summary = validate(separator, detector, dirs, args.songs, args.seconds,
                       args.snap_gate)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
