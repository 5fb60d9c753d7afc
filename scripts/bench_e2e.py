#!/usr/bin/env python
"""North-star benchmark: full audio→MIDI of a 4-minute song on one chip.

Renders a real corpus MIDI (docs/songs human performance) to a 4-minute
44.1 kHz piano WAV with the in-repo additive synth, then runs the ACTUAL
infer.py pipeline (trained checkpoints, concurrent Extract/Structuralize,
streaming decoder) twice — cold (jit compiles) and warm (steady state).
Target: warm < 10 s (BASELINE.md).

Usage: python scripts/bench_e2e.py [--seconds 240] [--song CPOP01]
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this
# process: jax freezes the compilation-cache default at import time, so
# the same setdefault in etude_tpu.__init__ is a no-op for scripts that
# import jax first (100-900 s recompiles per program on the hosted TPU).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def render_song(out_path: Path, seconds: float, song: str) -> int:
    from etude_tpu.data.synthetic import render_piano, synth_piano_notes
    from etude_tpu.utils.audio import save_wav
    from etude_tpu.utils.midi import read_midi_notes

    midi = Path("/root/reference/docs/songs") / song / "human.mid"
    if midi.exists():
        notes = [n for n in read_midi_notes(midi) if n["onset"] < seconds - 2]
    else:
        notes = synth_piano_notes(np.random.default_rng(0), seconds - 2)
    wave = render_piano(notes, seconds, sr=44100)
    save_wav(out_path, wave, 44100)
    return len(notes)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=240.0)
    parser.add_argument("--song", default="CPOP01")
    parser.add_argument("--work", default="/tmp/etude_e2e")
    parser.add_argument("--engine", default="stream",
                        choices=["stream", "rebuild"])
    parser.add_argument("--runs", type=int, default=1,
                        help="number of warm runs (multi-run controlled "
                             "measurement; warm = min, all runs recorded)")
    args = parser.parse_args(argv)

    work = Path(args.work)
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)

    t0 = time.perf_counter()
    n_notes = render_song(work / "song.wav", args.seconds, args.song)
    print(f"rendered {args.song}: {n_notes} notes, "
          f"{args.seconds:.0f}s ({time.perf_counter() - t0:.1f}s)")

    from etude_tpu.config import load_config
    from infer import InferencePipeline

    cfg = load_config(None, overrides={
        "paths": {
            "infer_output_dir": str(work / "out"),
            "extractor_model": str(REPO / "checkpoints/extractor/latest.ckpt"),
            "beat_detector_model": str(
                REPO / "checkpoints/beat_detector/latest.ckpt"),
            "separator_model": str(REPO / "checkpoints/separator/latest.ckpt"),
            "decoder_model": str(REPO / "checkpoints/decoder/latest.ckpt"),
            "decoder_config": str(
                REPO / "checkpoints/decoder/etude_decoder_config.json"),
            "decoder_vocab": str(REPO / "checkpoints/decoder/vocab.json"),
        },
        "decoder": {"temperature": 0.0},
    })
    attrs = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
             "sustain_bin": 1, "pitch_overlap_bin": 2}

    results = {}
    labels = ["cold"] + [f"warm{i+1}" if args.runs > 1 else "warm"
                         for i in range(args.runs)]
    for label in labels:
        pipeline = InferencePipeline(cfg, allow_random_weights=True,
                                     engine_kind=args.engine)
        t0 = time.perf_counter()
        pipeline.run(str(work / "song.wav"), attrs,
                     final_filename=f"bench_{label}")
        dt = time.perf_counter() - t0
        results[label] = {
            "seconds": round(dt, 2),
            "stages": {k: round(v, 2)
                       for k, v in pipeline.timer.summary().items()},
        }
        print(f"[{label}] end-to-end {dt:.2f}s")
    if args.runs > 1:
        warms = [results[l]["seconds"] for l in labels[1:]]
        # steady state = best observed (tunnel service load varies
        # several-fold between minutes; ROADMAP "Infrastructure")
        results["warm"] = results[labels[1 + warms.index(min(warms))]]
        results["warm_runs_seconds"] = warms

    # Fidelity: extract-stage onset F1 against the known rendered notes
    # (BASELINE.md tracked metric "onset F1").
    extract_json = work / "out" / "temp" / "extract.json"
    if extract_json.exists():
        from etude_tpu.evaluation.metrics.onset_f1 import onset_f1
        from etude_tpu.utils.midi import read_midi_notes

        ref_midi = Path("/root/reference/docs/songs") / args.song / "human.mid"
        if ref_midi.exists():
            ref_notes = [n for n in read_midi_notes(ref_midi)
                         if n["onset"] < args.seconds - 2]
            # Same horizon cutoff on both sides: estimates in the un-rendered
            # final 2 s would otherwise count as false positives.
            est_notes = [n for n in json.loads(extract_json.read_text())
                         if n["onset"] < args.seconds - 2]
            results["extract_onset_f1"] = round(
                onset_f1(ref_notes, est_notes)["f1"], 4
            )

    results["target_seconds"] = 10.0
    results["song_seconds"] = args.seconds
    results["engine"] = args.engine
    results["songs_per_min_per_chip"] = round(
        60.0 / results["warm"]["seconds"], 3
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
