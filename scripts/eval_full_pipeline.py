#!/usr/bin/env python
"""Full-pipeline corpus evaluation (BASELINE config #5): run the COMPLETE
audio→MIDI serving path over reference-corpus songs and report RGC/IPE of
the generated covers next to the corpus versions.

Per song: render the corpus `human.mid` performance to a 44.1 kHz piano wav
(the corpus ships MIDI, not the original recordings — the render is the
audio stand-in, as in scripts/bench_e2e.py), then run the ACTUAL
InferencePipeline — extract (hFT), structuralize (separation + beat grid),
decode (streaming engine, default attributes) — and score the output MIDI
with the repo's RGC/IPE calculators. The report prints "ours" as an extra
row against the Table-I versions measured on the same songs.

Usage: python scripts/eval_full_pipeline.py [--songs 20] [--seconds 180]
           [--engine stream] [--out /tmp/etude_fullpipe]
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this process.
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

CORPUS = Path("/root/reference/docs/songs")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", type=int, default=20)
    parser.add_argument("--seconds", type=float, default=180.0)
    parser.add_argument("--engine", default="stream",
                        choices=["stream", "rebuild"])
    parser.add_argument("--out", default="/tmp/etude_fullpipe")
    parser.add_argument("--versions", nargs="+",
                        default=["human", "etude_d_d", "etude_d"])
    args = parser.parse_args(argv)

    from etude_tpu.config import load_config
    from etude_tpu.data.synthetic import render_piano
    from etude_tpu.evaluation.metrics import IPECalculator, RGCCalculator
    from etude_tpu.utils.audio import save_wav
    from etude_tpu.utils.logger import logger
    from etude_tpu.utils.midi import read_midi_notes
    from infer import InferencePipeline

    songs = sorted(
        d.name for d in CORPUS.iterdir()
        if d.is_dir() and (d / "human.mid").exists()
    )[: args.songs]
    if not songs:
        logger.error(f"no corpus songs under {CORPUS}")
        return 1

    out = Path(args.out)
    rgc = RGCCalculator(top_k=8)
    ipe = IPECalculator(n_gram=8, n_clusters=16)
    attrs = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
             "sustain_bin": 1, "pitch_overlap_bin": 2}

    rows = []
    for i, song in enumerate(songs):
        work = out / song
        if work.exists():
            shutil.rmtree(work)
        work.mkdir(parents=True)
        notes = [n for n in read_midi_notes(CORPUS / song / "human.mid")
                 if n["onset"] < args.seconds - 2]
        wave = render_piano(notes, args.seconds, sr=44100)
        save_wav(work / "song.wav", wave, 44100)

        cfg = load_config(None, overrides={
            "paths": {"infer_output_dir": str(work / "out")},
        })
        pipeline = InferencePipeline(cfg, engine_kind=args.engine)
        t0 = time.perf_counter()
        pipeline.run(str(work / "song.wav"), attrs, final_filename="ours")
        wall = time.perf_counter() - t0

        ours = work / "out" / "ours.mid"
        row = {"song": song, "wall_s": round(wall, 2)}
        row["rgc_ours"] = rgc.calculate(ours).get("rgc_score")
        row["ipe_ours"] = ipe.calculate(ours).get("ipe_score")
        row["n_notes"] = len(read_midi_notes(ours))
        for v in args.versions:
            mid = CORPUS / song / f"{v}.mid"
            if mid.exists():
                row[f"rgc_{v}"] = rgc.calculate(mid).get("rgc_score")
                row[f"ipe_{v}"] = ipe.calculate(mid).get("ipe_score")
        rows.append(row)
        def fmt(v, spec):  # metric .get() returns None on degenerate MIDIs
            return format(v, spec) if v is not None else "n/a"

        logger.info(
            f"[{i + 1}/{len(songs)}] {song}: {wall:.1f}s, "
            f"{row['n_notes']} notes, rgc {fmt(row['rgc_ours'], '.4f')} "
            f"ipe {fmt(row['ipe_ours'], '.2f')}"
        )

    def mean(key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        return round(float(np.mean(vals)), 4) if vals else None

    summary = {
        "songs": len(rows),
        "song_seconds": args.seconds,
        "engine": args.engine,
        "mean_wall_s": mean("wall_s"),
        "rgc": {"ours": mean("rgc_ours"),
                **{v: mean(f"rgc_{v}") for v in args.versions}},
        "ipe": {"ours": mean("ipe_ours"),
                **{v: mean(f"ipe_{v}") for v in args.versions}},
        "rows": rows,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
