#!/usr/bin/env python
"""WPD through the FULL audio path on corpus songs, vs the shipped caches.

The evaluation corpus (docs/songs) ships per-song `wp.json` warping-path
caches computed by the reference from the real origin/cover recordings
(etude/data/aligner.py:135-173); the corpus does not ship the audio itself.
This script closes the aligner's last untested path — tuning estimation →
chroma/DLNCO features → key-shift search → MrMsDTW — at full-song scale by
rendering the two corpus MIDI versions that live on the two timelines:

    origin proxy = render(etude_e.mid)   extractor output, ORIGIN timeline
    cover        = render(human.mid)     human performance, COVER timeline

The underlying cover↔origin time correspondence is the same mapping the
reference aligned from real audio, so the audio-path WPD should land near
the cached-path WPD (identical would be surprising: piano renders vs real
pop mixes are different signals; what must hold is agreement within the
WPD scale that separates corpus versions, ~0.1).

Usage: python scripts/validate_wpd_audio_path.py [--songs N] [--seconds S]
Writes a JSON summary to stdout; intended to be recorded in PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.aligner import AudioAligner  # noqa: E402
from etude_tpu.data.corpus_render import corpus_song_dirs  # noqa: E402
from etude_tpu.data.synthetic import render_piano  # noqa: E402
from etude_tpu.evaluation.metrics.wpd import WPDCalculator  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", type=int, default=6)
    parser.add_argument("--seconds", type=float, default=None,
                        help="truncate songs for speed; default full length")
    args = parser.parse_args(argv)

    aligner = AudioAligner()
    wpd = WPDCalculator()
    rows = []
    for d in corpus_song_dirs():
        if len(rows) >= args.songs:
            break
        if not (d / "etude_e.mid").exists() or not (d / "wp.json").exists():
            continue
        cached = aligner._load_from_cache(d, "human")
        if cached is None:
            continue
        cached_wpd = wpd.calculate(cached).get("wpd_score")
        if cached_wpd is None:
            continue

        origin_notes = read_midi_notes(d / "etude_e.mid")
        cover_notes = read_midi_notes(d / "human.mid")
        if args.seconds:
            origin_notes = [n for n in origin_notes if n["onset"] < args.seconds]
            cover_notes = [n for n in cover_notes if n["onset"] < args.seconds]
        dur_o = max(n["offset"] for n in origin_notes) + 0.5
        dur_c = max(n["offset"] for n in cover_notes) + 0.5

        t0 = time.time()
        origin = render_piano(origin_notes, dur_o, sr=aligner.fs)
        cover = render_piano(cover_notes, dur_c, sr=aligner.fs)
        render_s = time.time() - t0

        t0 = time.time()
        result = aligner.compute_warping_path(origin, cover)
        align_s = time.time() - t0
        audio_wpd = wpd.calculate(result).get("wpd_score")

        rows.append({
            "song": d.name,
            "wpd_audio_path": None if audio_wpd is None else round(audio_wpd, 4),
            "wpd_cached": round(cached_wpd, 4),
            "delta": None if audio_wpd is None else round(
                abs(audio_wpd - cached_wpd), 4
            ),
            "pitch_shift": result.get("pitch_shift"),
            "origin_seconds": round(dur_o, 1),
            "align_seconds": round(align_s, 1),
            "render_seconds": round(render_s, 1),
        })
        logger.info(
            f"{d.name}: audio-path WPD {audio_wpd} vs cached {cached_wpd} "
            f"(align {align_s:.0f}s)"
        )

    deltas = [r["delta"] for r in rows if r["delta"] is not None]
    summary = {
        "songs": rows,
        "mean_abs_delta": round(float(np.mean(deltas)), 4) if deltas else None,
        "max_abs_delta": round(float(np.max(deltas)), 4) if deltas else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
